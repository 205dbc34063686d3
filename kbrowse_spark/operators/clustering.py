"""Iterative clustering over the embeddings table: Lloyd's k-means,
the canonical Spark iterative-algorithm shape.

The reference engine has no iterative operators at all (its loop is a
Kafka poll, `/root/reference/src/kbrowse/kafka.clj:61-123`); k-means is
declared in SURVEY §2c's LLM-extension surface as the training step
behind IVF coarse quantization (`operators/knn.py::ann_ivf_label` uses
the label column as a stand-in cell id — this operator is how those
cells are actually built).

Determinism contract (the oracle hash-compares against DuckDB): all
arithmetic is fixed-point integer — embeddings quantize to
``round(x * 1024)`` longs, squared distances are exact BIGINT sums,
and centroid updates floor-divide exact integer sums — so every
iteration is bit-identical across engines and across partition orders.
Ties (equal distance to two centroids) break to the smaller centroid
id on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load

_K = 4
_ITERS = 3
_SCALE = 1024
_DIM = 64


def _lloyd_cte_prefix() -> str:
    """Shared DuckDB CTE chain for the clustering family: the same
    fixed-point Lloyd's iterations as chained CTEs over the long
    (vec_id, dim, v) form.  Ends with cent{_ITERS} (the trained
    centroids) and a{_ITERS+1} (the final assignment) in scope, so
    both the k-means readout and the IVF probe query build on it."""
    parts = [
        f"""
    WITH pts AS (
      SELECT vec_id,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))) AS v
      FROM embeddings
    ),
    cent0 AS (
      SELECT dense_rank() OVER (ORDER BY vec_id) - 1 AS cid, dim, v
      FROM pts
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_K})
    )"""
    ]
    for t in range(1, _ITERS + 2):
        parts.append(
            f""",
    d{t} AS (
      SELECT p.vec_id, c.cid, SUM((p.v - c.v) * (p.v - c.v)) AS dist
      FROM pts p JOIN cent{t - 1} c USING (dim)
      GROUP BY p.vec_id, c.cid
    ),
    a{t} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d{t})
      WHERE rn = 1
    )"""
        )
        if t <= _ITERS:
            parts.append(
                f""",
    cent{t} AS (
      SELECT cid, dim,
             CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
      FROM a{t} JOIN pts USING (vec_id)
      GROUP BY cid, dim
    )"""
            )
    return "".join(parts)


def _oracle_sql() -> str:
    return (
        _lloyd_cte_prefix()
        + f"""
    SELECT vec_id, CAST(cid AS INT) AS cluster_id,
           -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas renders
           -- as float64; the gate hash-compares against Spark's int64.
           CAST(dist AS BIGINT) AS sq_dist
    FROM a{_ITERS + 1}
    ORDER BY vec_id
    """
    )


@register(
    "kmeans_lloyd",
    _oracle_sql(),
    "clustering",
    "iterative",
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 3 update iterations) over the embeddings,
    fixed-point-deterministic, initialized from the k smallest vec_ids.

    Scale posture — the canonical distributed-k-means plan:

    * Points never move: each iteration is ONE map-side-combined
      aggregate producing k×(dim+1) longs per partition (the per-cluster
      per-dimension sums + counts); the only thing crossing the wire is
      that k×65-long state, not data.
    * Centroids ride to executors as broadcast literals folded into the
      distance expression (k×dim ints ≈ 1 KB) — no join, no shuffle of
      the corpus, whole-stage codegen end to end.
    * The quantized point table is cached once and reused by every
      iteration (at 100 TB: a serialized-storage-level persist or a
      pre-quantized table).
    * Collecting k aggregate rows per iteration to the driver is the
      correct driver-side footprint for iterative ML on Spark (k rows,
      not the corpus) — same shape MLlib's KMeans uses internally.

    Integer fixed-point arithmetic (scale 1024) keeps every distance
    and centroid bit-identical to the DuckDB oracle regardless of
    partitioning or summation order; distance ties break to the
    smaller centroid id in both engines.
    """
    pts, centroids = _lloyd_state(spark, sf_dir)
    return (
        _assign(pts, centroids)
        .select("vec_id", "cluster_id", "sq_dist")
        .orderBy("vec_id")
    )


def _sq_dist_cols(col: str, cents: list[tuple[int, list[int]]]):
    """One exact-integer squared-distance expression per centroid,
    the centroid riding along as a broadcast array literal.

    Built as ONE sql expression string per centroid (r15): the
    Column-API form issued k x dim F.lit() py4j round trips per
    builder call (512+ driver calls for the IVF family — measured as
    plan-CONSTRUCTION time on every ann_ivf_* / kmeans run); the
    parser builds the identical resolved expression in one call."""
    return [
        F.expr(
            f"aggregate(zip_with({col},"
            f" array({','.join(str(c) for c in vec)}),"
            " (x, c) -> (x - c) * (x - c)),"
            " CAST(0 AS BIGINT), (acc, y) -> acc + y)"
        )
        for _, vec in cents
    ]


def _assign(pts: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest-centroid assignment, ties to the smaller cid
    (array_position's first match over the cid-ascending list)."""
    cid_arr = F.array(*[F.lit(cid) for cid, _ in cents])
    return (
        pts.withColumn("dist_arr", F.array(*_sq_dist_cols("q", cents)))
        .withColumn("sq_dist", F.array_min("dist_arr"))
        .withColumn(
            "cluster_id",
            F.element_at(
                cid_arr, F.array_position("dist_arr", F.col("sq_dist")).cast("int")
            ).cast("int"),
        )
    )


def _lloyd_state(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Run the _ITERS Lloyd updates and return (quantized point table,
    trained centroid literals).  The per-iteration driver footprint is
    k aggregate rows — the correct iterative-ML shape on Spark.  Both
    the point table AND the trained centroids go through the cache
    registry: the centroids are a pure deterministic function of the
    read-only fixtures, so queries sharing the model (kmeans_lloyd's
    readout, ann_ivf_kmeans's quantizer) train once per session."""
    from kbrowse_spark.functions.cache_registry import cached, cached_value

    emb = load(spark, sf_dir, "embeddings")
    pts = cached(
        spark,
        sf_dir,
        "kmeans_pts",
        lambda: emb.select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))"
            ).alias("q"),
        ),
    )

    def train() -> list[tuple[int, list[int]]]:
        init = pts.orderBy("vec_id").limit(_K).collect()
        # (cid, centroid-vector) pairs, cid-ascending — array_position's
        # first-match tie-break therefore lands on the smallest cid.
        centroids: list[tuple[int, list[int]]] = [
            (i, [int(v) for v in row.q]) for i, row in enumerate(init)
        ]

        for _ in range(_ITERS):
            sums = (
                _assign(pts, centroids)
                .groupBy("cluster_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(F.col("q")[d]).alias(f"s{d}") for d in range(_DIM)],
                )
                .collect()
            )
            # floor of the exact rational sum/n == floor of the IEEE
            # double division the oracle does (sums << 2^53, see module
            # docstring).
            centroids = sorted(
                (
                    int(row.cluster_id),
                    [int(row[f"s{d}"]) // int(row.n) for d in range(_DIM)],
                )
                for row in sums
            )
        return centroids

    return pts, cached_value(spark, sf_dir, "kmeans_centroids", train)


_NQ = 8  # bounded query block: vec_id < _NQ
_NPROBE = 2
_TOPK = 3


def _ivf_cte_chain() -> str:
    """Lloyd training + IVF probe/re-rank CTEs through `ranked` — the
    ONE SQL definition of the IVF retrieval, shared by the
    ann_ivf_kmeans readout and the recall audit's oracle."""
    t = _ITERS
    return (
        _lloyd_cte_prefix()
        + f""",
    qp AS (
      SELECT vec_id AS qid, dim, v FROM pts WHERE vec_id < {_NQ}),
    qd AS (
      SELECT q.qid, c.cid, SUM((q.v - c.v) * (q.v - c.v)) AS cdist
      FROM qp q JOIN cent{t} c USING (dim)
      GROUP BY q.qid, c.cid),
    probe AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY cdist, cid) AS rn
        FROM qd)
      WHERE rn <= {_NPROBE}),
    cand AS (
      SELECT p.qid, a.vec_id, a.cid FROM probe p JOIN a{t + 1} a USING (cid)
      WHERE a.vec_id <> p.qid),
    pair AS (
      SELECT c.qid, c.vec_id, c.cid,
             SUM((q.v - x.v) * (q.v - x.v)) AS sq_dist
      FROM cand c
      JOIN qp q ON q.qid = c.qid
      JOIN pts x ON x.vec_id = c.vec_id AND x.dim = q.dim
      GROUP BY c.qid, c.vec_id, c.cid),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY sq_dist, vec_id) AS rn
      FROM pair)"""
    )


def _ivf_oracle_sql() -> str:
    return (
        _ivf_cte_chain()
        + f"""
    SELECT qid, CAST(rn AS INT) AS rn, vec_id,
           CAST(cid AS INT) AS cluster_id,
           CAST(sq_dist AS BIGINT) AS sq_dist
    FROM ranked WHERE rn <= {_TOPK}
    ORDER BY qid, rn
    """
    )


@register(
    "ann_ivf_kmeans",
    _ivf_oracle_sql(),
    "knn",
    "clustering",
    "iterative",
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a LEARNED coarse quantizer: the k-means centroids
    trained by the shared Lloyd chain become the IVF cells
    (``ann_ivf_label`` uses the label column as a stand-in cell id —
    this is the real thing, closing that gap).  Each query vector
    probes its nprobe=2 nearest cells and is exactly re-ranked against
    only the vectors assigned there; top-3 per query by fixed-point
    squared distance, all arithmetic exact BIGINT so the chained-CTE
    oracle hash-matches bit-for-bit.

    Scale posture: centroid training is the kmeans_lloyd shape (k
    aggregate rows to the driver per iteration); cell assignment and
    query→cell probing both fold the k×dim centroid literals into the
    plan as broadcast arrays (no join for quantization); the probe
    table (queries × nprobe, a bounded lookup batch by design) joins
    the assigned corpus on cell id — at 100 TB with cell id as a
    partition column that join partition-prunes to ~nprobe/k of the
    corpus, which is the entire point of IVF.  The quantized point
    table is the same shared cache kmeans_lloyd uses, so the two
    queries train once.
    """
    return (
        _ivf_topk(spark, sf_dir)
        .select("qid", "rn", "vec_id", "cluster_id", "sq_dist")
        .orderBy("qid", "rn")
    )


def _ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, rn, vec_id, cluster_id, sq_dist) IVF top-k rows — the ONE
    Spark definition of the IVF retrieval (trained quantizer, nprobe
    cell probe, exact re-rank), factored from ann_ivf_kmeans so the
    recall audit scores exactly what the retrieval query returns."""
    from pyspark.sql import Window as W

    pts, centroids = _lloyd_state(spark, sf_dir)

    qdf = pts.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    probe_structs = F.array(
        *[
            F.struct(d.alias("cdist"), F.lit(cid).alias("cid"))
            for d, (cid, _) in zip(_sq_dist_cols("qq", centroids), centroids)
        ]
    )
    probes = (
        qdf.withColumn("pr", F.slice(F.array_sort(probe_structs), 1, _NPROBE))
        .select("qid", "qq", F.explode("pr").alias("p"))
        .select("qid", "qq", F.col("p.cid").alias("cell"))
    )

    asg = _assign(pts, centroids).select("vec_id", "q", "cluster_id")
    pair_dist = F.aggregate(
        F.zip_with(F.col("q"), F.col("qq"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, y: acc + y,
    )
    cand = (
        asg.join(F.broadcast(probes), F.col("cluster_id") == F.col("cell"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "cluster_id", pair_dist.alias("sq_dist"))
    )
    w = W.partitionBy("qid").orderBy("sq_dist", "vec_id")
    return cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _TOPK
    )


# ---------------------------------------------------------------------------
# Batch perceptron: the supervised counterpart to the Lloyd loop
# ---------------------------------------------------------------------------

_P_EPOCHS = 3


def _perceptron_cte_prefix() -> str:
    """DuckDB CTE chain replaying the batch-perceptron epochs over the
    long (vec_id, y, dim, v) form: m{t} margins under w{t-1}/b{t-1},
    upd{t} summed updates over the misclassified set, w{t}/b{t} the
    new weights.  Margin-0 counts as misclassified (epoch 1 therefore
    updates on every row — the standard zero-init batch rule)."""
    parts = [
        f"""
    WITH pts AS (
      SELECT vec_id,
             CASE WHEN label % 2 = 0 THEN 1 ELSE -1 END AS y,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))) AS v
      FROM embeddings
    ),
    w0 AS (SELECT DISTINCT dim, CAST(0 AS BIGINT) AS w FROM pts),
    b0 AS (SELECT CAST(0 AS BIGINT) AS b)"""
    ]
    for t in range(1, _P_EPOCHS + 2):
        parts.append(
            f""",
    m{t} AS (
      SELECT p.vec_id, MIN(p.y) AS y,
             CAST(SUM(p.v * w.w) + MIN(b.b) AS BIGINT) AS margin
      FROM pts p JOIN w{t - 1} w USING (dim) CROSS JOIN b{t - 1} b
      GROUP BY p.vec_id
    )"""
        )
        if t <= _P_EPOCHS:
            parts.append(
                f""",
    upd{t} AS (
      SELECT p.dim, CAST(SUM(p.y * p.v) AS BIGINT) AS dw
      FROM pts p JOIN m{t} m
        ON m.vec_id = p.vec_id AND m.y * m.margin <= 0
      GROUP BY p.dim
    ),
    w{t} AS (
      SELECT w.dim, w.w + COALESCE(u.dw, 0) AS w
      FROM w{t - 1} w LEFT JOIN upd{t} u USING (dim)
    ),
    b{t} AS (
      SELECT b.b + COALESCE(
               (SELECT CAST(SUM(m.y) AS BIGINT) FROM m{t} m
                WHERE m.y * m.margin <= 0), 0) AS b
      FROM b{t - 1} b
    )"""
            )
    return "".join(parts)


def _perceptron_oracle_sql() -> str:
    t = _P_EPOCHS + 1
    return (
        _perceptron_cte_prefix()
        + f"""
    SELECT vec_id,
           CAST(y AS INT) AS y_true,
           CAST(margin AS BIGINT) AS margin,
           CAST(CASE WHEN margin > 0 THEN 1 ELSE -1 END AS INT) AS y_pred,
           CAST(CASE WHEN y * margin > 0 THEN 1 ELSE 0 END AS INT) AS correct
    FROM m{t}
    ORDER BY vec_id
    """
    )


@register(
    "perceptron_train_batch",
    _perceptron_oracle_sql(),
    "ml",
    "iterative",
)
def perceptron_train_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch perceptron (3 epochs, zero init) predicting
    label parity from the quantized embedding — the SUPERVISED
    distributed-training loop beside ``kmeans_lloyd``'s unsupervised
    one, and the same canonical Spark iterative-ML shape:

    * Each epoch is ONE map-side-combined aggregate over the corpus:
      the (dim+1)-long summed update ``(sum_mis y*q[d], sum_mis y)``
      over the misclassified set.  Only that dim+1-long state crosses
      the wire and reaches the driver — never rows.
    * Weights ride back to executors as broadcast literals folded into
      the margin expression (zip_with dot product, whole-stage
      codegen) — no join, no shuffle of the corpus.
    * The quantized point table is cached once across epochs (and
      across the session via the cache registry).

    The BATCH update rule (sum over the full misclassified set, then
    one weight step per epoch) — not the sequential online rule — is
    what makes the model partition-order-independent and therefore
    deterministic on a cluster; margin 0 counts as misclassified, so
    the zero-init first epoch updates on every row.  All arithmetic is
    exact int64 (quantized features x integer weights); at extreme
    corpus sizes the summed update grows with n — swap in the mean
    update (floor-divided, the kmeans_lloyd trick) past ~1e9 rows to
    keep margins inside int64.

    Whether label parity is LEARNABLE from the embeddings is
    irrelevant here: the contract under test is the trainer mechanics
    (margins, update set, weight trajectory), which the chained-CTE
    oracle replays epoch-by-epoch bit-for-bit.  Model quality gates
    belong to evaluation harnesses, not the engine.

    Reference has no ML operators (SURVEY §2c extension).
    """
    from kbrowse_spark.functions.cache_registry import cached

    emb = load(spark, sf_dir, "embeddings")
    pts = cached(
        spark,
        sf_dir,
        "perceptron_pts",
        lambda: emb.select(
            "vec_id",
            F.expr(
                "CAST(CASE WHEN label % 2 = 0 THEN 1 ELSE -1 END AS BIGINT)"
            ).alias("y"),
            F.expr(
                f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))"
            ).alias("q"),
        ),
    )

    def margin_col(w: list[int], b: int):
        return F.aggregate(
            F.zip_with(
                F.col("q"),
                F.array(*[F.lit(int(x)) for x in w]),
                lambda x, wi: x * wi,
            ),
            F.lit(int(b)).cast("long"),
            lambda acc, y: acc + y,
        )

    w = [0] * _DIM
    b = 0
    for _ in range(_P_EPOCHS):
        # Epoch aggregate at (dim) grain via posexplode (r14): the
        # previous 65-column aggregate (one SUM per dimension) made
        # each epoch's plan 65 aggregate buffers wide — per-iteration
        # analysis + codegen dominated wall time at every SF (the data
        # work is one cached-table pass either way).  posexplode +
        # groupBy(dim) computes the identical sums with a 2-column
        # aggregate over 64 groups (map-side-combined, 64 rows cross
        # the wire); int64 addition is order-independent, so the
        # collected values are bit-identical.
        rows = (
            pts.withColumn("m", margin_col(w, b))
            .filter(F.col("y") * F.col("m") <= 0)
            .select("y", F.posexplode("q").alias("d", "qd"))
            .groupBy("d")
            .agg(
                F.sum(F.col("y") * F.col("qd")).alias("s"),
                F.sum("y").alias("sy"),
            )
            .collect()
        )
        for r in rows:
            w[int(r["d"])] += int(r["s"])
        # sum(y) over the misclassified set is the same value in every
        # dim group (each mis row contributes its y once per dim).
        b = b + (int(rows[0]["sy"]) if rows else 0)

    m = F.col("m")
    return (
        pts.withColumn("m", margin_col(w, b))
        .select(
            "vec_id",
            F.col("y").cast("int").alias("y_true"),
            m.cast("long").alias("margin"),
            F.when(m > 0, 1).otherwise(-1).cast("int").alias("y_pred"),
            F.when(F.col("y") * m > 0, 1).otherwise(0).cast("int").alias("correct"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Power iteration: top principal direction, covariance-free
# ---------------------------------------------------------------------------

_PI_ITERS = 3


def _pca_oracle_sql() -> str:
    parts = [
        f"""
    WITH pts AS (
      SELECT vec_id,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))) AS v
      FROM embeddings
    ),
    v0 AS (
      SELECT dim, CAST(CASE WHEN dim = 1 THEN {_SCALE} ELSE 0 END AS BIGINT) AS v
      FROM (SELECT DISTINCT dim FROM pts)
    )"""
    ]
    for t in range(1, _PI_ITERS + 1):
        parts.append(
            f""",
    u{t} AS (
      SELECT p.vec_id, CAST(SUM(p.v * vv.v) AS BIGINT) AS u
      FROM pts p JOIN v{t - 1} vv USING (dim)
      GROUP BY p.vec_id
    ),
    w{t} AS (
      SELECT p.dim, CAST(SUM(p.v * u.u) AS BIGINT) AS w
      FROM pts p JOIN u{t} u USING (vec_id)
      GROUP BY p.dim
    ),
    m{t} AS (SELECT GREATEST(CAST(MAX(ABS(w)) AS BIGINT), 1) AS mx FROM w{t}),
    v{t} AS (
      SELECT dim,
             CAST(floor(CAST(w AS DOUBLE) * {_SCALE}.0 / CAST(mx AS DOUBLE))
                  AS BIGINT) AS v
      FROM w{t} CROSS JOIN m{t}
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(dim - 1 AS INT) AS dim, v AS v_q,
           CAST(v AS DOUBLE) / {_SCALE}.0 AS loading
    FROM v{_PI_ITERS}
    ORDER BY dim
    """
    )
    return "".join(parts)


@register(
    "pca_power_topvec",
    _pca_oracle_sql(),
    "ml",
    "iterative",
)
def pca_power_topvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the quantized embeddings by
    covariance-free POWER ITERATION (3 rounds from e_0): each round is
    ``w = X'(Xv)`` computed as two in-plan steps — the per-row dot
    ``u = q . v`` with v riding as a broadcast literal, then ONE
    map-side-combined aggregate producing the d-long ``w`` — followed
    by an integer renormalization ``v' = floor(w * scale / max|w|)``.

    The third iterative-ML loop beside ``kmeans_lloyd`` and
    ``perceptron_train_batch``, and the same scale contract: the
    corpus is touched once per iteration by a combinable aggregate,
    only d longs reach the driver, and the d x d covariance matrix is
    NEVER materialized (X'(Xv) needs two passes over rows, not d^2
    memory) — the standard trick for tall-skinny PCA.

    Determinism: q and w are exact int64; the renormalization is one
    double multiply + divide + floor whose operand ORDER is identical
    in both engines (w may exceed 2^53 — nearest-double conversion is
    deterministic, so identical op order keeps every bit equal).
    Uncentered by design (top singular vector of X, not of X - mean;
    centering adds one exact-integer pass via n-scaled sums).  At
    ~3e7+ rows the int64 ``w`` sum needs a per-shard pre-rescale —
    noted, not needed at any tested SF.

    Sign/convergence: the trajectory from the FIXED start e_0 is the
    verified contract (the chained-CTE oracle replays it); eigenvector
    quality gates belong to evaluation, not the engine.

    Reference has no ML operators (SURVEY §2c extension).
    """
    import math

    from kbrowse_spark.functions.cache_registry import cached

    emb = load(spark, sf_dir, "embeddings")
    pts = cached(
        spark,
        sf_dir,
        "kmeans_pts",
        lambda: emb.select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))"
            ).alias("q"),
        ),
    )

    def dot_v(v: list[int]):
        return F.aggregate(
            F.zip_with(
                F.col("q"),
                F.array(*[F.lit(int(x)) for x in v]),
                lambda x, vi: x * vi,
            ),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        )

    v = [_SCALE] + [0] * (_DIM - 1)
    for _ in range(_PI_ITERS):
        # w = X'(Xv) at (dim) grain via posexplode (r14): the previous
        # 64-column aggregate (one SUM per dimension) made each
        # iteration's plan 64 aggregate buffers wide — per-iteration
        # analysis + codegen dominated wall time (2000 cached rows; the
        # data work is negligible).  posexplode + groupBy(dim) computes
        # the identical sums with a 1-column aggregate over 64 groups;
        # int64 addition is order-independent, so w is bit-identical.
        rows = (
            pts.withColumn("u", dot_v(v))
            .select("u", F.posexplode("q").alias("d", "qd"))
            .groupBy("d")
            .agg(F.sum(F.col("qd") * F.col("u")).alias("w"))
            .collect()
        )
        w = [0] * _DIM
        for r in rows:
            w[int(r["d"])] = int(r["w"])
        mx = max(max(abs(x) for x in w), 1)
        # Mirrors the oracle's floor((w AS DOUBLE) * SCALE.0 / mx) —
        # Python floats ARE IEEE doubles, same op order, same bits.
        v = [int(math.floor(float(x) * float(_SCALE) / float(mx))) for x in w]

    vec = spark.createDataFrame(
        [(d, v[d]) for d in range(_DIM)], ["dim", "v_q"]
    )
    return vec.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("v_q").cast("long").alias("v_q"),
        (F.col("v_q").cast("double") / F.lit(float(_SCALE))).alias("loading"),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# Incremental IVF maintenance: assign a new batch to the trained cells
# ---------------------------------------------------------------------------

# New-batch convention mirrors dedup's incremental family
# (dedup.py::_INC_NEW_SQL uses doc_id % 10 = 0).
_IVF_NEW_SQL = "vec_id % 10 = 0"


def _ivf_inc_oracle_sql() -> str:
    t = _ITERS
    return (
        _lloyd_cte_prefix()
        + f""",
    newd AS (
      SELECT p.vec_id, c.cid, SUM((p.v - c.v) * (p.v - c.v)) AS dist
      FROM pts p JOIN cent{t} c USING (dim)
      WHERE {_IVF_NEW_SQL.replace("vec_id", "p.vec_id")}
      GROUP BY p.vec_id, c.cid),
    newa AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM newd)
      WHERE rn = 1),
    basesz AS (
      SELECT cid, COUNT(*) AS cell_base_n
      FROM a{t + 1}
      WHERE NOT ({_IVF_NEW_SQL})
      GROUP BY cid)
    SELECT n.vec_id, CAST(n.cid AS INT) AS cluster_id,
           CAST(n.dist AS BIGINT) AS sq_dist,
           CAST(COALESCE(b.cell_base_n, 0) AS BIGINT) AS cell_base_n
    FROM newa n LEFT JOIN basesz b USING (cid)
    ORDER BY n.vec_id
    """
    )


@register(
    "ann_ivf_incremental_assign",
    _ivf_inc_oracle_sql(),
    "knn",
    "incremental",
)
def ann_ivf_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance: assign ONLY the new ingest
    batch (``vec_id % 10 = 0``, mirroring the dedup incremental
    family's convention) to the ALREADY-TRAINED coarse quantizer, and
    report each new vector's cell, exact fixed-point distance, and the
    cell's base occupancy — the record an index maintainer appends per
    ingest.

    This is the ANN counterpart of ``dedup_incremental_minhash``: the
    standing structure (trained centroids; at 100 TB a few KB of
    metadata next to the cell-partitioned corpus) is NOT retrained per
    batch — the batch-sized work is one narrow scan of the new slice
    with the k x dim centroid literals folded into the projection, no
    join, no shuffle of the base corpus.  The base-occupancy readout
    is one combinable aggregate over the base slice (in production: a
    maintained per-cell count, not a rescan); re-clustering triggers
    (occupancy drift) hang off exactly this output.  Training rides
    the session-wide Lloyd memo, so kmeans_lloyd / ann_ivf_kmeans /
    this query train ONCE.

    Reference has no ML/ANN operators (SURVEY §2c extension).
    """
    pts, centroids = _lloyd_state(spark, sf_dir)
    new = pts.filter(F.expr(_IVF_NEW_SQL))
    base = pts.filter(~F.expr(_IVF_NEW_SQL))
    newa = _assign(new, centroids).select("vec_id", "cluster_id", "sq_dist")
    basesz = (
        _assign(base, centroids)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cell_base_n"))
    )
    return (
        newa.join(F.broadcast(basesz), "cluster_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            "sq_dist",
            F.coalesce(F.col("cell_base_n"), F.lit(0).cast("long")).alias(
                "cell_base_n"
            ),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Histogram-based decision-stump split finding (the GBDT inner loop)
# ---------------------------------------------------------------------------

_STUMP_BINS = 64
_STUMP_DOMAIN = 110016  # l_extendedprice upper bound, 64 * 1719
_STUMP_BINW = _STUMP_DOMAIN // _STUMP_BINS

# Split score = sum_l^2/n_l + sum_r^2/n_r (variance reduction up to the
# constant SS_total - S^2/N).  Generated ONCE and compiled by both
# engines from the same text, so the IEEE op sequence is identical
# (the _det3 rule: entries are exact integers; only identical op ORDER
# keeps engines bit-equal once products pass 2^53).
_STUMP_SCORE = (
    "(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) / CAST(nl AS DOUBLE)"
    " + (CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) / CAST(nr AS DOUBLE)"
)


@register(
    "decision_stump_histogram",
    f"""
    WITH pts AS (
      SELECT CAST(FLOOR(l_extendedprice) AS BIGINT) // {_STUMP_BINW} AS bin,
             CAST(FLOOR(l_quantity) AS BIGINT) AS y
      FROM lineitem),
    h AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS sy
          FROM pts GROUP BY bin),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(sy) AS BIGINT) AS st
            FROM h),
    cand AS (
      SELECT bin,
             CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS nl,
             CAST(COALESCE(SUM(sy) OVER w, 0) AS BIGINT) AS sl
      FROM h
      WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING)),
    scored AS (
      SELECT c.bin, c.nl, t.nt - c.nl AS nr, c.sl, t.st - c.sl AS sr
      FROM cand c CROSS JOIN tot t
      WHERE c.nl > 0 AND t.nt - c.nl > 0)
    SELECT bin AS split_bin,
           CAST(bin * {_STUMP_BINW} AS BIGINT) AS split_price,
           nl AS n_left, nr AS n_right, sl AS sum_left, sr AS sum_right,
           {_STUMP_SCORE} AS score
    FROM scored
    ORDER BY score DESC, split_bin
    """,
    "ml",
)
def decision_stump_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based decision-stump split finding — the inner loop of
    distributed gradient-boosted trees (LightGBM/XGBoost hist mode):
    bin the feature, build one (count, sum-label) histogram in a single
    map-side-combinable aggregate, then score EVERY candidate split
    from cumulative histogram sums — the corpus is scanned once no
    matter how many splits are evaluated.  Feature: l_extendedprice in
    {bins} fixed-width bins; label: l_quantity; score: the variance-
    reduction surrogate sum_l^2/n_l + sum_r^2/n_r.

    Determinism: bins are FLOOR + integer division over a fixed domain
    (no data-dependent quantiles, no float compare); cumulative sums
    are exact int64; the score double is compiled by both engines from
    the same expression text (`_STUMP_SCORE`, the _det3 rule) so the
    ORDER BY ranks identically bit-for-bit.

    Scale posture: one linear scan into a {bins}-row histogram
    (map-side combine makes the shuffle {bins} rows per task); the
    split-scoring window runs over the DOMAIN-BOUNDED bin table —
    constant-size as data grows, the same allow-listed shape as
    order_stat_bucket_select.  A full GBDT layer is this plan per
    (feature, tree-node) — all independent histogram aggregates over
    the same scan, exactly how hist-mode boosting distributes.

    Reference has no ML operators (SURVEY §2c extension).
    """
    li = load(spark, sf_dir, "lineitem")
    pts = li.select(
        F.expr(
            f"CAST(FLOOR(l_extendedprice) AS BIGINT) DIV {_STUMP_BINW}"
        ).alias("bin"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("y"),
    )
    h = pts.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    tot = h.agg(
        F.sum("n").cast("long").alias("nt"), F.sum("sy").cast("long").alias("st")
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cand = h.select(
        "bin",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("nl"),
        F.coalesce(F.sum("sy").over(w), F.lit(0)).cast("long").alias("sl"),
    )
    scored = (
        cand.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "nl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            "sl",
            (F.col("st") - F.col("sl")).alias("sr"),
        )
        .filter((F.col("nl") > 0) & (F.col("nr") > 0))
    )
    return (
        scored.withColumn("score", F.expr(_STUMP_SCORE))
        .select(
            F.col("bin").alias("split_bin"),
            (F.col("bin") * _STUMP_BINW).cast("long").alias("split_price"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.col("sl").alias("sum_left"),
            F.col("sr").alias("sum_right"),
            "score",
        )
        .orderBy(F.col("score").desc(), "split_bin")
    )


decision_stump_histogram.__doc__ = decision_stump_histogram.__doc__.format(
    bins=_STUMP_BINS
)


# ---------------------------------------------------------------------------
# k-center greedy coreset selection (farthest-point traversal)
# ---------------------------------------------------------------------------

_KC_K = 8  # coreset size


def _kcenter_oracle() -> str:
    parts = [
        """
    WITH p AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings),
    c0 AS (SELECT vec_id, x, y FROM p
           WHERE vec_id = (SELECT MIN(vec_id) FROM p)),
    m1 AS (SELECT p.vec_id, p.x, p.y,
                  (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y)
                    AS mind
           FROM p CROSS JOIN c0 c)"""
    ]
    for r in range(1, _KC_K):
        parts.append(
            f""",
    c{r} AS (SELECT vec_id, x, y, mind FROM m{r}
             ORDER BY mind DESC, vec_id LIMIT 1),
    m{r + 1} AS (
      SELECT m.vec_id, m.x, m.y,
             LEAST(m.mind, (m.x - c.x) * (m.x - c.x)
                           + (m.y - c.y) * (m.y - c.y)) AS mind
      FROM m{r} m CROSS JOIN c{r} c)"""
        )
    sel = [
        "SELECT CAST(0 AS BIGINT) AS round, vec_id,"
        " CAST(0.0 AS DOUBLE) AS radius2 FROM c0"
    ]
    for r in range(1, _KC_K):
        sel.append(f"SELECT CAST({r} AS BIGINT), vec_id, mind FROM c{r}")
    parts.append("\n    " + "\n    UNION ALL\n    ".join(sel))
    parts.append("\n    ORDER BY round")
    return "".join(parts)


@register("coreset_kcenter_greedy", _kcenter_oracle(), "clustering")
def coreset_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy coreset selection (farthest-point traversal,
    Gonzalez 1985; the CRAIG/coreset data-selection baseline): seed
    with the minimum vec_id, then {k}-1 times pick the point FARTHEST
    from the chosen set (max over points of min over centers, ties to
    the smaller vec_id) over the embedding's first two dimensions.
    Emits (round, vec_id, radius2): radius2 at selection is the
    2-approximation bound on the optimal k-center radius, and its
    non-increasing sequence is the coverage curve a training-data
    selector reads to choose k.

    Scale posture: the point table is scanned once per round with an
    in-row LEAST update against the single new center (a 1-row
    broadcast literal — no re-scan of all centers, the incremental
    form), and the per-round argmax is one ORDER BY ... LIMIT 1 over
    a combinable TopK (never a full sort at the executor); driver
    state is the k-row center list (the kmeans_lloyd k-row-state
    pattern).  Rounds are k-1 fixed.  Distances are identical IEEE
    expressions in both engines — hash-safe doubles (the
    spatial_grid_epsilon_join dist2 contract).

    Reference has no data-selection tooling (SURVEY §2c extension;
    joins mix_*/sample_* in the training-mix family and shares the
    farthest-point geometry with the ANN/kmeans stack).
    """
    from kbrowse_spark.functions.cache_registry import cached

    def build_pts():
        return load(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.expr("CAST(embedding[0] AS DOUBLE)").alias("x"),
            F.expr("CAST(embedding[1] AS DOUBLE)").alias("y"),
        )

    pts = cached(spark, sf_dir, "kcenter_pts", build_pts)
    c0 = (
        pts.orderBy("vec_id")
        .limit(1)
        .collect()[0]
    )
    centers = [(0, int(c0.vec_id), 0.0)]
    cur = pts.select(
        "vec_id",
        "x",
        "y",
        F.expr(
            f"(x - {c0.x!r}) * (x - {c0.x!r})"
            f" + (y - {c0.y!r}) * (y - {c0.y!r})"
        ).alias("mind"),
    )
    for r in range(1, _KC_K):
        nxt = cur.orderBy(F.col("mind").desc(), "vec_id").limit(1).collect()[
            0
        ]
        centers.append((r, int(nxt.vec_id), float(nxt.mind)))
        cur = cur.select(
            "vec_id",
            "x",
            "y",
            F.least(
                F.col("mind"),
                F.expr(
                    f"(x - {nxt.x!r}) * (x - {nxt.x!r})"
                    f" + (y - {nxt.y!r}) * (y - {nxt.y!r})"
                ),
            ).alias("mind"),
        )
    return spark.createDataFrame(
        centers, "round long, vec_id long, radius2 double"
    ).orderBy("round")


coreset_kcenter_greedy.__doc__ = coreset_kcenter_greedy.__doc__.format(
    k=_KC_K
)


# ---------------------------------------------------------------------------
# IVF recall audit: ANN top-k vs exhaustive exact top-k
# ---------------------------------------------------------------------------


def _ivf_recall_oracle() -> str:
    return (
        _ivf_cte_chain()
        + f""",
    ivf AS (SELECT qid, vec_id, sq_dist FROM ranked
            WHERE rn <= {_TOPK}),
    expair AS (
      SELECT q.qid, x.vec_id, SUM((q.v - x.v) * (q.v - x.v)) AS sq_dist
      FROM qp q JOIN pts x ON x.dim = q.dim AND x.vec_id <> q.qid
      GROUP BY q.qid, x.vec_id),
    exact AS (
      SELECT qid, vec_id, sq_dist FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY sq_dist, vec_id) AS rn
        FROM expair) WHERE rn <= {_TOPK})
    SELECT e.qid,
           CAST({_TOPK} AS INT) AS k,
           CAST(COUNT(i.vec_id) AS BIGINT) AS n_hits,
           CAST(1000000 * COUNT(i.vec_id) // {_TOPK} AS BIGINT)
             AS recall_ppm,
           CAST(SUM(e.sq_dist) AS BIGINT) AS exact_dist_sum,
           CAST((SELECT SUM(v.sq_dist) FROM ivf v WHERE v.qid = e.qid)
                AS BIGINT) AS ivf_dist_sum
    FROM exact e LEFT JOIN ivf i
      ON e.qid = i.qid AND e.vec_id = i.vec_id
    GROUP BY e.qid
    ORDER BY e.qid
    """
    )


@register("ann_ivf_recall_audit", _ivf_recall_oracle(), "clustering", "knn")
def ann_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the IVF retrieval against the exhaustive exact
    top-{k} — THE acceptance metric for any ANN index (an index whose
    recall is unmeasured is a bug generator, not an optimization).
    Scores EXACTLY what ann_ivf_kmeans returns (shared _ivf_topk /
    _ivf_cte_chain — one definition of the retrieval in each engine)
    against a brute-force scan over all points for the same bounded
    query block; reports per-query hit count, recall, and the
    distance-sum gap (ivf_dist_sum >= exact_dist_sum ALWAYS — the
    IVF result can only be farther; pinned by the invariant test,
    with equality exactly when recall is 100%... and the converse
    direction checked too: equal sums with tie-free distances imply
    identical sets).

    Scale posture: the exact side is one corpus scan with the
    query block broadcast (the knn_bruteforce shape — the audit is
    run on a SAMPLED query block by design, which is how production
    ANN recall is measured); the IVF side reuses the retrieval's own
    cached plan.  Everything integer-exact.

    Reference has no vector tooling (SURVEY §2c extension; the QA
    counterpart to ann_ivf_kmeans, as minhash_estimate_error_audit
    is to the LSH sketch).
    """
    from pyspark.sql import Window as W

    ivf = _ivf_topk(spark, sf_dir).select("qid", "vec_id", "sq_dist")
    pts, _ = _lloyd_state(spark, sf_dir)
    qdf = pts.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    pair_dist = F.aggregate(
        F.zip_with(F.col("q"), F.col("qq"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, y: acc + y,
    )
    expair = (
        pts.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", pair_dist.alias("sq_dist"))
    )
    w = W.partitionBy("qid").orderBy("sq_dist", "vec_id")
    exact = (
        expair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("qid", "vec_id", "sq_dist")
    )
    iv = ivf.select(
        F.col("qid").alias("iqid"),
        F.col("vec_id").alias("ivid"),
        F.col("sq_dist").alias("isd"),
    )
    ivf_sums = iv.groupBy("iqid").agg(
        F.sum("isd").cast("long").alias("ivf_dist_sum")
    )
    return (
        exact.join(
            iv,
            (exact["qid"] == iv["iqid"]) & (exact["vec_id"] == iv["ivid"]),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("ivid").cast("long").alias("n_hits"),
            F.sum(exact["sq_dist"]).cast("long").alias("exact_dist_sum"),
        )
        # LEFT join: a query whose nprobe cells held no candidate
        # (recall 0 — the exact case the audit exists to expose) must
        # still appear, with n_hits=0 and NULL ivf_dist_sum, exactly
        # as the oracle's correlated scalar subquery reports it.  An
        # inner join would silently drop it from one engine only.
        .join(
            ivf_sums, F.col("qid") == ivf_sums["iqid"], "left"
        )
        .select(
            "qid",
            F.lit(_TOPK).cast("int").alias("k"),
            "n_hits",
            F.expr(
                f"CAST(1000000 * n_hits DIV {_TOPK} AS BIGINT)"
            ).alias("recall_ppm"),
            "exact_dist_sum",
            "ivf_dist_sum",
        )
        .orderBy("qid")
    )


ann_ivf_recall_audit.__doc__ = ann_ivf_recall_audit.__doc__.format(k=_TOPK)


# ---------------------------------------------------------------------------
# Incremental IVF index add: delta batch under the frozen quantizer
# ---------------------------------------------------------------------------

_IA_MOD = 10  # delta batch: vec_id % 10 == 0 (the newly arriving 10%)


def _ivf_add_oracle() -> str:
    t = _ITERS + 1
    return (
        _lloyd_cte_prefix()
        + f"""
    SELECT CAST(cid AS INT) AS cluster_id,
           CAST(COUNT(*) FILTER (vec_id % {_IA_MOD} != 0) AS BIGINT)
             AS n_base,
           CAST(COUNT(*) FILTER (vec_id % {_IA_MOD} = 0) AS BIGINT)
             AS n_delta,
           CAST(1000000 * COUNT(*) FILTER (vec_id % {_IA_MOD} = 0)
                // COUNT(*) AS BIGINT) AS occ_delta_ppm,
           CAST(COALESCE(SUM(dist) FILTER (vec_id % {_IA_MOD} != 0), 0)
                // GREATEST(COUNT(*) FILTER (vec_id % {_IA_MOD} != 0), 1)
                AS BIGINT) AS mean_dist_base,
           CAST(COALESCE(SUM(dist) FILTER (vec_id % {_IA_MOD} = 0), 0)
                // GREATEST(COUNT(*) FILTER (vec_id % {_IA_MOD} = 0), 1)
                AS BIGINT) AS mean_dist_delta
    FROM a{t}
    GROUP BY cid
    ORDER BY cluster_id
    """
    )


@register(
    "ann_ivf_incremental_add",
    _ivf_add_oracle(),
    "clustering",
    "knn",
)
def ann_ivf_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the ANN counterpart of
    dedup_incremental_minhash: a newly arriving delta batch (vec_id %
    {m} == 0) is assigned POINTWISE under the FROZEN production
    quantizer (the session's trained Lloyd centroids — broadcast
    literals, no join, no retraining), and the inverted lists update
    by pure append.  The audit is the cell-grain maintenance readout
    an index owner watches: per cell, base vs delta occupancy (and
    the delta share in ppm) plus mean quantization distortion of base
    vs delta — a delta whose distortion or occupancy profile drifts
    from the base is the RETRAIN trigger (the quantizer no longer
    represents the arriving distribution); for stationary arrivals
    the two profiles agree, which is what this fixture reads.

    Scale posture: assignment is the kmeans_lloyd shape — centroid
    literals fold into the distance expression, one map-side-combined
    cell-grain aggregate; the only thing that ever runs per ingest in
    production is the DELTA's scan + this k-row readout (base stats
    are carried forward, exactly like ivm_zonemap_refresh's
    append-only merge).  All arithmetic integer-exact.

    Reference has no vector tooling (SURVEY §2c extension; completes
    the IVF family's lifecycle: train -> retrieve -> recall-audit ->
    stream-probe -> MAINTAIN).
    """
    pts, centroids = _lloyd_state(spark, sf_dir)
    asg = _assign(pts, centroids).select("vec_id", "cluster_id", "sq_dist")
    is_delta = (F.col("vec_id") % _IA_MOD == 0).cast("long")
    return (
        asg.groupBy("cluster_id")
        .agg(
            F.sum(1 - is_delta).cast("long").alias("n_base"),
            F.sum(is_delta).cast("long").alias("n_delta"),
            F.sum(F.col("sq_dist") * (1 - is_delta))
            .cast("long")
            .alias("ds_b"),
            F.sum(F.col("sq_dist") * is_delta).cast("long").alias("ds_d"),
        )
        .select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            "n_base",
            "n_delta",
            F.expr(
                "CAST(1000000 * n_delta DIV (n_base + n_delta) AS BIGINT)"
            ).alias("occ_delta_ppm"),
            F.expr(
                "CAST(ds_b DIV GREATEST(n_base, 1) AS BIGINT)"
            ).alias("mean_dist_base"),
            F.expr(
                "CAST(ds_d DIV GREATEST(n_delta, 1) AS BIGINT)"
            ).alias("mean_dist_delta"),
        )
        .orderBy("cluster_id")
    )


ann_ivf_incremental_add.__doc__ = ann_ivf_incremental_add.__doc__.format(
    m=_IA_MOD
)

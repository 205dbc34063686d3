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


def _oracle_sql() -> str:
    """Generate the DuckDB oracle: the same fixed-point Lloyd's
    iterations as chained CTEs over the long (vec_id, dim, v) form."""
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
    parts.append(
        f"""
    SELECT vec_id, CAST(cid AS INT) AS cluster_id,
           -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas renders
           -- as float64; the gate hash-compares against Spark's int64.
           CAST(dist AS BIGINT) AS sq_dist
    FROM a{_ITERS + 1}
    ORDER BY vec_id
    """
    )
    return "".join(parts)


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

    init = pts.orderBy("vec_id").limit(_K).collect()
    # (cid, centroid-vector) pairs, cid-ascending — array_position's
    # first-match tie-break therefore lands on the smallest cid.
    centroids: list[tuple[int, list[int]]] = [
        (i, [int(v) for v in row.q]) for i, row in enumerate(init)
    ]

    def assign(cents: list[tuple[int, list[int]]]) -> DataFrame:
        dist_cols = [
            F.aggregate(
                F.zip_with(
                    F.col("q"),
                    F.array(*[F.lit(c) for c in vec]),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0).cast("long"),
                lambda acc, y: acc + y,
            )
            for _, vec in cents
        ]
        cid_arr = F.array(*[F.lit(cid) for cid, _ in cents])
        return (
            pts.withColumn("dist_arr", F.array(*dist_cols))
            .withColumn("sq_dist", F.array_min("dist_arr"))
            .withColumn(
                "cluster_id",
                F.element_at(
                    cid_arr, F.array_position("dist_arr", F.col("sq_dist")).cast("int")
                ).cast("int"),
            )
        )

    for _ in range(_ITERS):
        sums = (
            assign(centroids)
            .groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("q")[d]).alias(f"s{d}") for d in range(_DIM)],
            )
            .collect()
        )
        # floor of the exact rational sum/n == floor of the IEEE double
        # division the oracle does (sums << 2^53, see module docstring).
        centroids = sorted(
            (
                int(row.cluster_id),
                [int(row[f"s{d}"]) // int(row.n) for d in range(_DIM)],
            )
            for row in sums
        )

    return assign(centroids).select("vec_id", "cluster_id", "sq_dist").orderBy("vec_id")

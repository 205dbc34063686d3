"""UDF surface (SURVEY §2c): pandas UDAF (GROUPED_AGG), Python UDTF,
applyInPandas grouped-map, and array-function breadth.

Every Python function here is defined inside its builder (pickled by
value) so external drivers work without this package on executors'
paths.  Python-side arithmetic sticks to integers/ranks — exact and
order-independent — so the DuckDB oracle matches bit-for-bit; float
reductions in numpy (pairwise summation) would not.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load

# Cogroup key coarsening for cogroup_asof_attribution (r14): caps
# FlatMapCoGroupsInPandas invocations (each pays an Arrow round trip)
# independent of user-key cardinality.  Sized so every local core gets
# work; at cluster scale this would derive from executor parallelism —
# results are bucket-invariant (per-user logic is exact inside any
# bucketing), so the value is a pure performance knob.
_COGROUP_BUCKETS = 64


@register(
    "udaf_sum_squares",
    """
    SELECT event_type,
           CAST(SUM(k * k) AS BIGINT) AS sum_k_sq,
           COUNT(*) AS n
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
    "udf",
)
def udaf_sum_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF (GROUPED_AGG): integer sum of squares per group —
    Arrow-batched, exact (int64), combinable with other aggregates in
    the same groupBy."""
    # GROUPED_AGG type-hint form: Series -> scalar.  The float carries
    # an exact integer (k^2 sums stay far below 2^53), cast back to
    # long for the declared schema.
    @F.pandas_udf("double")
    def sum_squares(s: pd.Series) -> float:
        return float((s.astype("int64") ** 2).sum())

    # GROUPED_AGG pandas UDFs can't mix with JVM aggregates in one agg,
    # so the row count is a pandas aggregate too.
    @F.pandas_udf("double")
    def n_rows(s: pd.Series) -> float:
        return float(len(s))

    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            sum_squares(F.col("k")).cast("long").alias("sum_k_sq"),
            n_rows(F.col("k")).cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "udtf_tokenize",
    """
    SELECT doc_id, CAST(pos AS INT) AS pos, token
    FROM (
      SELECT doc_id, unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 20)
    ORDER BY doc_id, pos
    """,
    "udf",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one row per token with position,
    lateral-joined per document — the UDTF form of a tokenizer."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            # Oracle parity: split('') yields one empty token (as
            # DuckDB's string_split does); only NULL yields no rows.
            if text is not None:
                for i, tok in enumerate(text.split(" "), start=1):
                    yield i, tok

    spark.udtf.register("kb_tokenize", Tokenize)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("kb_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token
        FROM kb_udtf_docs, LATERAL kb_tokenize(text) t
        ORDER BY doc_id, pos
        """
    )


@register(
    "applyinpandas_rank",
    """
    SELECT event_id, event_type,
           RANK() OVER (PARTITION BY event_type ORDER BY value) AS value_rank
    FROM events
    ORDER BY event_type, value_rank, event_id
    """,
    "udf",
)
def applyinpandas_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-group rank computed in pandas
    (method='min' == SQL RANK) — the grouped-map pattern for per-key
    Python transforms that don't fit an aggregate."""


    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["value_rank"] = pdf["value"].rank(method="min").astype("int64")
        return pdf[["event_id", "event_type", "value_rank"]]

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = ev.groupBy("event_type").applyInPandas(
        rank_group, schema="event_id long, event_type string, value_rank long"
    )
    return out.orderBy("event_type", "value_rank", "event_id")


@register(
    "array_functions_embeddings",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_elem,
           list_max(embedding) AS max_elem,
           list_min(embedding) AS min_elem,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           list_sort(embedding)[1] AS sorted_first,
           list_contains(embedding, list_max(embedding)) AS has_max
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
    "scalar",
)
def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth over array<float>: size/element_at/
    min/max/filter/sort/contains — all JVM-side higher-order funcs."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.array_max("embedding").alias("max_elem"),
        F.array_min("embedding").alias("min_elem"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.element_at(F.array_sort("embedding"), 1).alias("sorted_first"),
        F.array_contains("embedding", F.array_max("embedding")).alias("has_max"),
    ).orderBy("vec_id")


@register(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "agg",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via Spark SQL."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("kb_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               COUNT(*) AS n
        FROM kb_gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@register(
    "cogroup_asof_attribution",
    """
    WITH v AS (SELECT user_id, ts AS v_ts, event_id AS view_id
               FROM events WHERE event_type = 'view'),
    p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id
          FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT p.purchase_id, p.user_id, v.view_id,
             epoch_us(p.p_ts) - epoch_us(v.v_ts) AS gap_us,
             row_number() OVER (PARTITION BY p.purchase_id
                                ORDER BY v.v_ts DESC, v.view_id DESC) AS rn
      FROM p LEFT JOIN v
        ON v.user_id = p.user_id AND v.v_ts <= p.p_ts)
    SELECT purchase_id, user_id, view_id, gap_us
    FROM j WHERE rn = 1 OR rn IS NULL
    ORDER BY purchase_id
    """,
    "udf",
    "join",
)
def cogroup_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map applyInPandas: per-user purchase→last-prior-view
    attribution via `groupBy().cogroup().applyInPandas` — the two-table
    per-key Python transform (pandas merge_asof class of logic) that
    neither a grouped map over one table nor a plain join expresses.

    The cogroup key is a bounded HASH BUCKET of user_id, not the raw
    user (r14, guide §4.3): FlatMapCoGroupsInPandas pays a per-group
    Arrow round trip (two input frames + one output frame built per
    invocation, ~10 ms each), and with per-user groups the fixture's
    1,500 users ran as ~1,500 serial invocations after AQE coalesced
    the tiny exchange — 14.8 s of pure per-group machinery.  Bucketing
    caps invocations at _COGROUP_BUCKETS regardless of user count and
    the per-user as-of is vectorized ACROSS users inside the bucket:
    both sides concatenated, lexsorted by (user, ts, kind, event_id)
    with views before purchases on timestamp ties (v_ts <= p_ts is
    inclusive), then one `np.maximum.accumulate` forward-fill of the
    last view position — a purchase's candidate is valid iff it shares
    the purchase's user_id (the sort is user-major, so a stale
    candidate can only belong to an earlier user).  Ties on v_ts pick
    max view_id because ascending event_id order puts it last, and the
    position fill keeps the max.  All comparisons and the gap are
    int64 microseconds — exact cross-engine (the fixture's timestamps
    carry no sub-µs).

    Scale posture: state per task is one bucket of users' events
    (corpus/_COGROUP_BUCKETS), the shuffle is the same single
    co-partitioned exchange a join would pay, and Python is invoked
    O(buckets) times with O(n log n) vectorized work inside — per-user
    Python costs, the actual 100 TB killer here, are gone.
    """
    import numpy as np

    def attribute(purchases: pd.DataFrame, views: pd.DataFrame) -> pd.DataFrame:
        if purchases.empty:
            return pd.DataFrame(
                {"purchase_id": [], "user_id": [], "view_id": [], "gap_us": []}
            ).astype(
                {"purchase_id": "int64", "user_id": "int64",
                 "view_id": "float64", "gap_us": "float64"}
            )
        p_user = purchases["user_id"].to_numpy(dtype=np.int64)
        p_us = purchases["ts"].astype("int64").to_numpy() // 1000
        p_id = purchases["event_id"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"purchase_id": p_id, "user_id": p_user})
        if views.empty:
            out["view_id"] = np.nan
            out["gap_us"] = np.nan
            return out
        v_user = views["user_id"].to_numpy(dtype=np.int64)
        v_us = views["ts"].astype("int64").to_numpy() // 1000
        v_id = views["event_id"].to_numpy(dtype=np.int64)
        nv, npu = len(v_id), len(p_id)
        user = np.concatenate([v_user, p_user])
        ts = np.concatenate([v_us, p_us])
        ids = np.concatenate([v_id, p_id])
        # kind 0 = view, 1 = purchase: views sort first on ts ties so an
        # equal-timestamp view is visible to the purchase (inclusive <=).
        kind = np.concatenate(
            [np.zeros(nv, dtype=np.int8), np.ones(npu, dtype=np.int8)]
        )
        order = np.lexsort((ids, kind, ts, user))
        # Last view position so far in sort order; ascending event_id on
        # (user, ts) ties means the fill lands on the max view_id.
        is_view = kind[order] == 0
        fill = np.maximum.accumulate(
            np.where(is_view, np.arange(nv + npu), -1)
        )
        # Map back: for each purchase (in p_id order) find its sorted slot.
        sorted_pos = np.empty(nv + npu, dtype=np.int64)
        sorted_pos[order] = np.arange(nv + npu)
        p_slot = sorted_pos[nv:]
        cand = fill[p_slot]
        su, sts, sid = user[order], ts[order], ids[order]
        hit = (cand >= 0) & (su[np.maximum(cand, 0)] == p_user)
        safe = np.maximum(cand, 0)
        out["view_id"] = np.where(hit, sid[safe], np.nan)
        out["gap_us"] = np.where(hit, p_us - sts[safe], np.nan)
        return out

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    bkt = F.pmod(F.xxhash64(F.col("user_id")), F.lit(_COGROUP_BUCKETS)).alias("bkt")
    purchases = ev.filter(F.col("event_type") == "purchase").select("*", bkt)
    views = ev.filter(F.col("event_type") == "view").select("*", bkt)
    out = (
        purchases.groupBy("bkt")
        .cogroup(views.groupBy("bkt"))
        .applyInPandas(
            attribute,
            schema="purchase_id long, user_id long, view_id long, gap_us long",
        )
    )
    return out.orderBy("purchase_id")


@register(
    "maparrow_fixed_dot",
    """
    SELECT vec_id,
           CAST(list_sum(list_transform(generate_series(1, len(embedding)),
             i -> CAST(floor(CAST(embedding[i] AS DOUBLE)
                             * CAST(embedding[i] AS DOUBLE) * 1e15) AS BIGINT)))
             AS BIGINT) AS self_dot
    FROM embeddings
    ORDER BY vec_id
    """,
    "udf",
)
def maparrow_fixed_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy UDF tier below pandas — Arrow
    RecordBatches in, RecordBatches out, no pandas conversion at all.
    Computes each embedding's fixed-point self-dot (the norm² the knn
    family uses) with one vectorized numpy pass per batch:
    list-array offsets drive a segment-reduce over the flat values
    buffer — no per-row Python, no per-list object allocation.

    Same determinism contract as operators/knn.py::_spark_dot: each
    product floors to an integer number of 1e-15 units, summed as
    int64 — bit-identical to the DuckDB oracle regardless of batch or
    partition boundaries.

    Scale posture: narrow (no shuffle except the display sort), and
    the fastest possible Python hot path — Arrow buffers are handed to
    numpy without copying; use this tier when even pandas Series
    overhead matters (pure numeric kernels over array columns).
    """

    def selfdot(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("vec_id")
            emb = batch.column("embedding")
            offsets = emb.offsets.to_numpy(zero_copy_only=False)
            values = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
            units = np.floor(values * values * 1e15).astype(np.int64)
            sums = np.add.reduceat(units, offsets[:-1])
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(sums, type=pa.int64())],
                names=["vec_id", "self_dot"],
            )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(selfdot, schema="vec_id long, self_dot long").orderBy(
        "vec_id"
    )


@register(
    "arrowgroup_centroids",
    """
    WITH pts AS (
      SELECT label,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT))) AS v
      FROM embeddings),
    c AS (
      SELECT label, dim,
             CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv,
             COUNT(*) AS n
      FROM pts GROUP BY label, dim)
    SELECT CAST(label AS INT) AS label,
           CAST(MAX(n) AS BIGINT) AS n_vectors,
           array_to_string(list(cv ORDER BY dim), ',') AS centroid_csv
    FROM c
    GROUP BY label
    ORDER BY label
    """,
    "udf",
    "clustering",
)
def arrowgroup_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupedData.applyInArrow (Spark 4): the grouped-map tier of the
    zero-copy Arrow UDF surface — each group arrives as ONE pyarrow
    Table, no pandas conversion.  Computes per-label fixed-point
    centroids (the per-cell codebook update step of IVF/k-means, cf.
    ``kmeans_lloyd``) with a single numpy pass per group: the list
    array's flat values buffer reshapes to (n, dim), quantizes with
    half-away-from-zero rounding (matching Spark/DuckDB ``round``),
    and floor-divides exact int64 column sums.

    Determinism: integer sums are order-independent; floor of the
    int64 sum / count equals the oracle's floor(double division) while
    |sum| < 2^53 (|q| <= 2048, so that holds beyond 10^9 rows/cell).

    Scale posture: ONE shuffle on the group key, then each cell
    reduces locally in vectorized numpy — the Arrow-native analogue of
    the SQL groupBy the oracle runs; use this tier when the per-group
    kernel outgrows SQL (whitening, PCA steps, covariance) but the
    grouping is still Spark's job.  Output is one row per cell
    (centroid as CSV — the gate requires scalar columns).
    """
    import numpy as np
    import pyarrow as pa

    def centroid(table: pa.Table) -> pa.Table:
        t = table.combine_chunks()
        label = t.column("label")[0].as_py()
        emb = t.column("embedding")
        chunk = emb.chunk(0) if isinstance(emb, pa.ChunkedArray) else emb
        # flatten() (not .values) honors any slice offset on the array
        values = chunk.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(t)
        dim = values.size // n
        x = values.reshape(n, dim) * 1024.0
        q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
        cent = q.sum(axis=0) // np.int64(n)
        csv = ",".join(str(int(v)) for v in cent)
        return pa.table(
            {
                "label": pa.array([label], type=pa.int32()),
                "n_vectors": pa.array([n], type=pa.int64()),
                "centroid_csv": pa.array([csv], type=pa.string()),
            }
        )

    emb = load(spark, sf_dir, "embeddings").select("label", "embedding")
    return (
        emb.groupBy("label")
        .applyInArrow(
            centroid, schema="label int, n_vectors long, centroid_csv string"
        )
        .orderBy("label")
    )


@register(
    "arrowcogroup_user_activity",
    """
    WITH e AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY user_id),
    o AS (SELECT c_custkey AS user_id, CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE c_custkey <= 150 GROUP BY c_custkey)
    SELECT COALESCE(e.user_id, o.user_id) AS user_id,
           CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(CASE WHEN COALESCE(e.n_events, 0) = 0 THEN 0.0
                     ELSE CAST(COALESCE(o.n_orders, 0) AS DOUBLE)
                          / e.n_events END AS DOUBLE) AS orders_per_event
    FROM e FULL OUTER JOIN o USING (user_id)
    WHERE COALESCE(e.user_id, o.user_id) <= 150
    ORDER BY user_id
    """,
    "udf",
    "join",
)
def arrowcogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInArrow (Spark 4): the two-table-per-key member
    of the Arrow UDF matrix — for every user key, BOTH groups (their
    events and their orders) arrive as pyarrow Tables in one call, so
    cross-source per-entity logic needs no join materialization in
    Python.  Here the kernel is a per-user activity reconciliation
    (event count, order count, orders-per-event) whose oracle is the
    equivalent FULL OUTER JOIN of two aggregates; either side may be
    empty for a key, the cogroup analogue of outer-join semantics.

    Scale shape: one shuffle per input on the cogroup key, then local
    per-key kernels; the ratio is a single IEEE division of two exact
    counts.  Restricted to user_id <= 150 (the fixture's customer key
    overlap) to keep the demo output bounded.
    """
    import pyarrow as pa

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 150)
        .select("user_id")
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 150)
    od = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(F.col("c_custkey").alias("user_id"))
    )

    def stats(left: pa.Table, right: pa.Table) -> pa.Table:
        n_events = left.num_rows
        n_orders = right.num_rows
        src = left if n_events else right
        uid = src.column("user_id")[0].as_py()
        ratio = 0.0 if n_events == 0 else float(n_orders) / float(n_events)
        return pa.table(
            {
                "user_id": pa.array([uid], type=pa.int64()),
                "n_events": pa.array([n_events], type=pa.int64()),
                "n_orders": pa.array([n_orders], type=pa.int64()),
                "orders_per_event": pa.array([ratio], type=pa.float64()),
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInArrow(
            stats,
            schema=(
                "user_id long, n_events long, n_orders long,"
                " orders_per_event double"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "udtf_analyze_ngrams",
    """
    SELECT doc_id, CAST(pos AS INT) AS pos, w1, w2
    FROM (
      SELECT doc_id,
             unnest(generate_series(1, len(string_split(text, ' ')) - 1)) AS pos,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 1),
               i -> string_split(text, ' ')[i])) AS w1,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 1),
               i -> string_split(text, ' ')[i+1])) AS w2
      FROM documents WHERE doc_id < 20)
    ORDER BY doc_id, pos
    """,
    "udf",
)
def udtf_analyze_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze`` protocol): the
    output schema is computed at plan time from a literal argument —
    ``kb_ngrams(text, n)`` emits columns w1..wN for the requested
    n-gram width, which a static ``returnType`` cannot express.  The
    catalog query pins n=2 so a plain SQL oracle exists; the analyze
    path itself (schema derived from the constant, non-constant n
    rejected) is what's under test.

    Scale posture: same as any UDTF — per-row Python is the slow path
    by contract (the tokenize/shingle JVM expressions are the 100 TB
    route); this exists to verify the API surface, bounded here to a
    doc_id slice.
    """
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import IntegerType, StringType, StructType

    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int):
                raise Exception("n must be a constant integer")
            st = StructType().add("pos", IntegerType())
            for i in range(1, n.value + 1):
                st = st.add(f"w{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            if text is None:
                return
            ws = text.split(" ")
            for p in range(len(ws) - n + 1):
                yield (p + 1, *ws[p : p + n])

    spark.udtf.register("kb_ngrams", udtf(NGrams))
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("kb_udtf_ngram_docs")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.w1, t.w2
        FROM kb_udtf_ngram_docs, LATERAL kb_ngrams(text, 2) t
        ORDER BY doc_id, pos
        """
    )


# ---------------------------------------------------------------------------
# SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN)
# ---------------------------------------------------------------------------


@register(
    "sql_udf_length_class",
    """
    WITH tagged AS (
      SELECT lang,
             CASE WHEN n_chars < 200 THEN 'short'
                  WHEN n_chars < 400 THEN 'medium'
                  ELSE 'long' END AS len_class,
             n_chars
      FROM documents)
    SELECT lang, len_class,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM tagged
    GROUP BY lang, len_class
    ORDER BY lang, len_class
    """,
    "udf",
)
def sql_udf_length_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 `CREATE FUNCTION ... RETURN
    <expr>`): the declarative UDF surface — the function body is a SQL
    expression Catalyst INLINES into the plan, so unlike a Python UDF
    it costs nothing (whole-stage codegen sees straight CASE logic; no
    serialization boundary, no BatchEvalPython).  This is the right
    tool for shared business logic like classification ladders, and
    the catalog pins that the engine supports it end-to-end.

    Scale posture: identical to writing the CASE inline — one narrow
    scan + one map-side-combinable aggregate.
    """
    from kbrowse_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION kb_len_class(n INT)
        RETURNS STRING
        RETURN CASE WHEN n < 200 THEN 'short'
                    WHEN n < 400 THEN 'medium'
                    ELSE 'long' END
        """
    )
    return spark.sql(
        """
        SELECT lang, kb_len_class(n_chars) AS len_class,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang, kb_len_class(n_chars)
        ORDER BY lang, len_class
        """
    )

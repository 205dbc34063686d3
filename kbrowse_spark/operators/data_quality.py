"""Data-quality constraint checking (Deequ/dbt-test style): declared
expectations over the warehouse — primary-key uniqueness, referential
integrity, accepted values, ranges, null rates, partition completeness
— evaluated in bulk and emitted as a constraint report table.

This is the operational layer a 100 TB ingest pipeline runs after
every load: one pass per table computes ALL of that table's row-level
checks (a single conditional aggregation — adding a check adds an
expression, not a scan), plus one distinct-aggregate for key
uniqueness and one anti-join per foreign key.

All counts are exact integers; the report is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.functions.cache_registry import cached
from kbrowse_spark.sources.tables import load

_ACCEPTED_STATUS = ("F", "O", "P")


@register(
    "data_quality_report",
    f"""
    WITH orders_scan AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS pk_dup,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS null_cust,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN
                        {_ACCEPTED_STATUS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS bad_status,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bad_price
      FROM orders),
    li_fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_li,
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphan
      FROM lineitem l LEFT JOIN orders o
        ON o.o_orderkey = l.l_orderkey),
    ev_hours AS (
      SELECT CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
               AS present,
             CAST((epoch(date_trunc('hour', MAX(ts)))
                   - epoch(date_trunc('hour', MIN(ts)))) // 3600 + 1
                  AS BIGINT) AS expected
      FROM events),
    checks AS (
      SELECT 'orders_pk_unique' AS check_name, pk_dup AS n_violations,
             n_total FROM orders_scan
      UNION ALL
      SELECT 'orders_custkey_not_null', null_cust, n_total
      FROM orders_scan
      UNION ALL
      SELECT 'orders_status_accepted', bad_status, n_total
      FROM orders_scan
      UNION ALL
      SELECT 'orders_totalprice_positive', bad_price, n_total
      FROM orders_scan
      UNION ALL
      SELECT 'lineitem_fk_orders', n_orphan, n_li FROM li_fk
      UNION ALL
      SELECT 'events_hourly_complete', expected - present, expected
      FROM ev_hours)
    SELECT check_name, n_violations, n_total,
           CAST(n_violations = 0 AS INT) AS ok
    FROM checks
    ORDER BY check_name
    """,
    "quality",
    "pipeline",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk constraint validation over the warehouse, one report row
    per declared check: orders primary-key uniqueness, custkey
    completeness, accepted status values, positive totals, lineitem ->
    orders referential integrity, and events hourly-partition
    completeness (no missing ingest hours between min and max).

    Scale posture: the four orders row-checks share ONE conditional
    aggregation pass (count-distinct rides the same shuffle); the FK
    check is one LEFT join + null-flag aggregate — total AND orphan
    counts from a single scan, no second pass and no 1-row cross join
    (sound because the key side is PK-unique, which the report itself
    asserts); the completeness check is a 1-row min/max/distinct
    aggregate.  Each check's cost is one expression, not one scan:
    adding the next constraint is free.
    """
    o = load(spark, sf_dir, "orders")
    orders_scan = o.agg(
        F.count(F.lit(1)).alias("n_total"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dup"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("null_cust"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*_ACCEPTED_STATUS), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("bad_price"),
    )
    li = load(spark, sf_dir, "lineitem")
    orphans = li.join(
        o.select("o_orderkey"),
        li["l_orderkey"] == o["o_orderkey"],
        "left",
    ).agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("n_orphan"),
    )
    ev = load(spark, sf_dir, "events")
    hours = ev.agg(
        F.countDistinct(F.date_trunc("hour", "ts")).alias("present"),
        (
            (
                F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
            )
            / 3600
            + 1
        )
        .cast("long")
        .alias("expected"),
    )

    def row(name: str, viol, total) -> DataFrame:
        return F.lit(name).alias("check_name"), viol.cast("long").alias(
            "n_violations"
        ), total.cast("long").alias("n_total")

    checks = (
        orders_scan.select(*row("orders_pk_unique", F.col("pk_dup"), F.col("n_total")))
        .unionAll(
            orders_scan.select(
                *row("orders_custkey_not_null", F.col("null_cust"), F.col("n_total"))
            )
        )
        .unionAll(
            orders_scan.select(
                *row("orders_status_accepted", F.col("bad_status"), F.col("n_total"))
            )
        )
        .unionAll(
            orders_scan.select(
                *row(
                    "orders_totalprice_positive",
                    F.col("bad_price"),
                    F.col("n_total"),
                )
            )
        )
        .unionAll(
            orphans.select(
                *row("lineitem_fk_orders", F.col("n_orphan"), F.col("n_li"))
            )
        )
        .unionAll(
            hours.select(
                *row(
                    "events_hourly_complete",
                    F.col("expected") - F.col("present"),
                    F.col("expected"),
                )
            )
        )
    )
    return checks.select(
        "check_name",
        "n_violations",
        "n_total",
        (F.col("n_violations") == 0).cast("int").alias("ok"),
    ).orderBy("check_name")


# ---------------------------------------------------------------------------
# Column profiling
# ---------------------------------------------------------------------------


@register(
    "column_profile_orders",
    """
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(o_custkey) AS BIGINT) AS nn_cust,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
             CAST(MIN(o_custkey) AS VARCHAR) AS mn_cust,
             CAST(MAX(o_custkey) AS VARCHAR) AS mx_cust,
             CAST(COUNT(o_orderstatus) AS BIGINT) AS nn_status,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
             CAST(MIN(o_orderstatus) AS VARCHAR) AS mn_status,
             CAST(MAX(o_orderstatus) AS VARCHAR) AS mx_status,
             CAST(COUNT(o_orderdate) AS BIGINT) AS nn_date,
             CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd_date,
             CAST(MIN(o_orderdate) AS VARCHAR) AS mn_date,
             CAST(MAX(o_orderdate) AS VARCHAR) AS mx_date,
             CAST(COUNT(o_totalprice) AS BIGINT) AS nn_price,
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd_price,
             CAST(MIN(CAST(floor(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
               AS mn_price,
             CAST(MAX(CAST(floor(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
               AS mx_price
      FROM orders),
    p AS (
      SELECT 'o_custkey' AS column_name, n, n - nn_cust AS n_null,
             nd_cust AS n_distinct, mn_cust AS min_value,
             mx_cust AS max_value FROM a
      UNION ALL
      SELECT 'o_orderstatus', n, n - nn_status, nd_status, mn_status,
             mx_status FROM a
      UNION ALL
      SELECT 'o_orderdate', n, n - nn_date, nd_date, mn_date, mx_date
      FROM a
      UNION ALL
      SELECT 'o_totalprice_cents', n, n - nn_price, nd_price, mn_price,
             mx_price FROM a)
    SELECT * FROM p ORDER BY column_name
    """,
    "quality",
)
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling at scale (the `DESCRIBE`/Deequ-profile shape):
    per column — row count, null count, exact distinct count, min and
    max (stringified for a uniform report schema; the price column
    profiles in integer cents so min/max are exact).

    Scale posture: ALL columns profile in ONE aggregate pass — the
    multi-distinct aggregate compiles to Spark's Expand (one replicated
    stream per distinct column) which is the standard exact-profile
    cost; swap COUNT(DISTINCT) for approx_count_distinct when estimates
    suffice and the pass becomes a plain single-stream aggregate.  The
    report pivot unions 1-row projections of that single aggregate —
    no re-scan per column.
    """
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    a = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").cast("string").alias("mn_status"),
        F.max("o_orderstatus").cast("string").alias("mx_status"),
        F.count("o_orderdate").alias("nn_date"),
        F.countDistinct("o_orderdate").alias("nd_date"),
        F.min("o_orderdate").cast("string").alias("mn_date"),
        F.max("o_orderdate").cast("string").alias("mx_date"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min(cents).cast("string").alias("mn_price"),
        F.max(cents).cast("string").alias("mx_price"),
    )

    def prof(colname: str, suffix: str):
        return a.select(
            F.lit(colname).alias("column_name"),
            F.col("n"),
            (F.col("n") - F.col(f"nn_{suffix}")).alias("n_null"),
            F.col(f"nd_{suffix}").alias("n_distinct"),
            F.col(f"mn_{suffix}").alias("min_value"),
            F.col(f"mx_{suffix}").alias("max_value"),
        )

    return (
        prof("o_custkey", "cust")
        .unionAll(prof("o_orderstatus", "status"))
        .unionAll(prof("o_orderdate", "date"))
        .unionAll(prof("o_totalprice_cents", "price"))
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_K = 5  # the usual "hide in a crowd of k" threshold
_KANON_CHARS_BUCKET = 100  # n_chars quantized to 100-char buckets


@register(
    "kanonymity_report",
    f"""
    WITH q AS (
      SELECT lang, source,
             CAST(n_chars AS BIGINT) // {_KANON_CHARS_BUCKET} AS len_bucket
      FROM documents),
    groups AS (
      SELECT lang, source, len_bucket, CAST(COUNT(*) AS BIGINT) AS grp_n
      FROM q GROUP BY 1, 2, 3)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp_n) AS BIGINT) AS n_rows,
           CAST(MIN(grp_n) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN grp_n < {_KANON_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_groups_below_k,
           CAST(SUM(CASE WHEN grp_n < {_KANON_K} THEN grp_n ELSE 0 END)
                AS BIGINT) AS n_rows_suppressed,
           CAST(SUM(CASE WHEN grp_n < {_KANON_K} THEN grp_n ELSE 0 END)
                AS DOUBLE) / SUM(grp_n) AS suppression_rate
    FROM groups
    GROUP BY lang
    ORDER BY lang
    """,
    "quality",
    "pipeline",
)
def kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    length bucket): a released training corpus leaks re-identification
    risk through exactly these low-cardinality joins, and the standard
    mitigation is to SUPPRESS rows whose quasi-identifier group has
    fewer than k members.  Reports, per language: group count, minimum
    group size (the k the data actually achieves), and how many
    rows/groups suppression at k={_KANON_K} would cost — the
    governance-side counterpart of text_scrub_pii.

    Scale posture: two map-side-combinable aggregates (corpus -> group
    grain -> language grain); no window, no join.  The only float is
    one division per output row over exact integer sums.
    """
    d = load(spark, sf_dir, "documents")
    groups = (
        d.select(
            "lang",
            "source",
            F.expr(
                f"CAST(n_chars AS BIGINT) div {_KANON_CHARS_BUCKET}"
            ).alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).alias("grp_n"))
    )
    below = F.when(F.col("grp_n") < _KANON_K, F.col("grp_n")).otherwise(0)
    return (
        groups.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("grp_n").alias("n_rows"),
            F.min("grp_n").alias("min_group_size"),
            F.sum(
                F.when(F.col("grp_n") < _KANON_K, 1).otherwise(0)
            ).alias("n_groups_below_k"),
            F.sum(below).alias("n_rows_suppressed"),
        )
        .select(
            "lang",
            "n_groups",
            "n_rows",
            "min_group_size",
            "n_groups_below_k",
            "n_rows_suppressed",
            (
                F.col("n_rows_suppressed").cast("double") / F.col("n_rows")
            ).alias("suppression_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding profile
# ---------------------------------------------------------------------------

_DIM_SCALE = 1_000_000


@register(
    "embedding_dim_profile",
    f"""
    WITH pos AS (
      SELECT embedding,
             unnest(generate_series(1, len(embedding))) AS dim
      FROM embeddings)
    SELECT CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(embedding[dim]) AS DOUBLE) AS min_v,
           CAST(MAX(embedding[dim]) AS DOUBLE) AS max_v,
           CAST(SUM(CAST(floor(CAST(embedding[dim] AS DOUBLE)
                               * {_DIM_SCALE}) AS BIGINT)) AS BIGINT)
             AS sum_fp,
           CAST(SUM(CASE WHEN embedding[dim] >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nonneg
    FROM pos
    GROUP BY dim
    ORDER BY dim
    """,
    "knn",
    "quality",
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding column: min/max, a
    fixed-point sum (mean = sum_fp/n/1e6), and the sign balance — the
    drift/health check an embedding pipeline runs before trusting a
    vector index (a dead dimension, an exploding scale, or a sign
    collapse shows up here first).

    Determinism: comparisons (min/max) move float VALUES untouched
    (float32 -> float64 widening is exact); the only arithmetic
    aggregate is an integer sum of floor(v * 1e6) — both engines widen
    the float32 identically, multiply once in double, floor toward
    -inf, and sum exact BIGINTs, so even the reduction order cannot
    introduce drift.

    Scale posture: posexplode fans each vector into dim rows BUT the
    aggregate is map-side combinable at dim grain (64 groups), so each
    input split reduces to 64 partial rows before the shuffle — the
    explode never hits the exchange.
    """
    e = load(spark, sf_dir, "embeddings")
    pos = e.select(F.posexplode("embedding").alias("pos", "v"))
    vd = F.col("v").cast("double")
    return (
        pos.select((F.col("pos") + 1).cast("int").alias("dim"), vd.alias("v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum(F.floor(F.col("v") * _DIM_SCALE).cast("long"))
            .cast("long")
            .alias("sum_fp"),
            F.sum(F.when(F.col("v") >= 0, 1).otherwise(0))
            .cast("long")
            .alias("n_nonneg"),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Shuffle-skew planner over a prospective join/shuffle key
# ---------------------------------------------------------------------------

_SKEW_PARTS = 32  # simulated shuffle partition count


@register(
    "shuffle_skew_planner",
    f"""
    WITH keyed AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {_SKEW_PARTS} AS bucket
      FROM events),
    per_key AS (
      SELECT bucket, user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM keyed GROUP BY 1, 2),
    per_bucket AS (
      SELECT bucket,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM per_key GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM per_bucket),
    top_key AS (
      SELECT bucket, user_id AS hot_key, n AS hot_key_rows
      FROM (SELECT bucket, user_id, n,
                   ROW_NUMBER() OVER (PARTITION BY bucket
                     ORDER BY n DESC, user_id DESC) AS rn
            FROM per_key)
      WHERE rn = 1),
    spine AS (
      SELECT unnest(generate_series(0, {_SKEW_PARTS} - 1)) AS bucket)
    SELECT CAST(s.bucket AS BIGINT) AS bucket,
           COALESCE(b.n_rows, 0) AS n_rows,
           COALESCE(b.n_keys, 0) AS n_keys,
           t.hot_key,
           COALESCE(t.hot_key_rows, 0) AS hot_key_rows,
           CAST(GREATEST(1, (COALESCE(b.n_rows, 0) * {_SKEW_PARTS})
                            // tot.total) AS BIGINT) AS salt_factor
    FROM spine s
    LEFT JOIN per_bucket b ON b.bucket = s.bucket
    LEFT JOIN top_key t ON t.bucket = s.bucket
    CROSS JOIN tot
    ORDER BY s.bucket
    """,
    "quality",
    "agg",
)
def shuffle_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew planner: before running a big join/aggregation on a
    key, simulate its hash partitioning and report each partition's row
    count, key count, hottest key, and a recommended salt factor
    (partitions holding k times the average need ~k-way salting) — the
    diagnostic that decides between plain shuffle, AQE skew-join, and
    manual salting (join_salted_skew in this catalog is the treatment;
    this operator is the diagnosis).

    Buckets use the engine-portable md5 idiom rather than Spark's
    internal Murmur3 so the oracle reproduces them exactly; the skew
    PROFILE (counts per uniform hash bucket) is partitioner-agnostic.

    Scale posture: per-key then per-bucket map-side-combinable
    aggregates; the hot-key window is partitioned by bucket over the
    KEY-grain aggregate, never raw rows; the 1-row total attaches
    broadcast.  A generated bucket spine guarantees the output is
    exactly one row per simulated partition, INCLUDING empty ones
    (hot_key NULL, counts 0) — the full partition map, not just the
    observed one.
    """
    ev = load(spark, sf_dir, "events")
    bucket = F.expr(
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
        f" AS BIGINT) % {_SKEW_PARTS}"
    )
    per_key = (
        ev.select("user_id", bucket.alias("bucket"))
        .groupBy("bucket", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_bucket = per_key.groupBy("bucket").agg(
        F.sum("n").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    tot = per_bucket.agg(F.sum("n_rows").alias("total"))
    from pyspark.sql import Window as W

    top_key = (
        per_key.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("bucket").orderBy(
                    F.col("n").desc(), F.col("user_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("bucket").alias("tb"),
            F.col("user_id").alias("hot_key"),
            F.col("n").alias("hot_key_rows"),
        )
    )
    # Bucket SPINE: empty partitions must appear as zero rows — a
    # report derived only from observed keys understates skew exactly
    # when it is worst (many empty partitions).
    spine = spark.range(_SKEW_PARTS).select(F.col("id").alias("bucket"))
    return (
        spine.join(per_bucket, "bucket", "left")
        .join(top_key, spine.bucket == top_key.tb, "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
            F.coalesce(F.col("n_keys"), F.lit(0)).alias("n_keys"),
            "hot_key",
            F.coalesce(F.col("hot_key_rows"), F.lit(0)).alias(
                "hot_key_rows"
            ),
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"(coalesce(n_rows, 0) * {_SKEW_PARTS}) div total"
                ),
            ).alias("salt_factor"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Join-size profiler: exact output cardinality BEFORE running the join
# ---------------------------------------------------------------------------


@register(
    "join_size_profiler",
    """
    WITH l AS (
      SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS a
      FROM orders GROUP BY 1),
    r AS (
      SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS b
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT l.k, l.a, r.b, l.a * r.b AS contrib
      FROM l JOIN r ON l.k = r.k)
    SELECT CAST((SELECT SUM(a) FROM l) AS BIGINT) AS n_left,
           CAST((SELECT SUM(b) FROM r) AS BIGINT) AS n_right,
           CAST((SELECT COUNT(*) FROM l) AS BIGINT) AS n_left_keys,
           CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_right_keys,
           CAST(COUNT(*) AS BIGINT) AS n_common_keys,
           CAST(SUM(contrib) AS BIGINT) AS join_output_rows,
           CAST(MAX(contrib) AS BIGINT) AS max_key_contrib
    FROM j
    """,
    "quality",
    "agg",
)
def join_size_profiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality WITHOUT running the join:
    |A join B on k| = sum over common keys of a_k * b_k, from the two
    key-grain count tables — plus the max single-key contribution (the
    number that predicts a hot task).  With the shuffle_skew_planner
    this completes the pre-flight kit: size the output, find the hot
    keys, pick plain shuffle / broadcast / salting BEFORE paying for a
    misplanned join.  (orders x lineitem on orderkey here; the pattern
    is key-agnostic.)

    Scale posture: two map-side-combinable key-grain aggregates and a
    key-grain join — the profile costs one aggregation pass per side,
    never the join's output volume (exactly why it is worth running
    first: profiling a 10^12-row join output costs ~10^7 key rows).
    All counts are exact BIGINTs; no estimation error to reason about
    at these magnitudes (a_k*b_k <= 9e18 holds until a single key
    carries ~3e9 rows on both sides).
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    l_cnt = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("a")
    )
    r_cnt = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("b")
    )
    l_tot = l_cnt.agg(
        F.sum("a").alias("n_left"), F.count(F.lit(1)).alias("n_left_keys")
    )
    r_tot = r_cnt.agg(
        F.sum("b").alias("n_right"), F.count(F.lit(1)).alias("n_right_keys")
    )
    j = l_cnt.join(r_cnt, "k").select(
        (F.col("a") * F.col("b")).alias("contrib")
    )
    prof = j.agg(
        F.count(F.lit(1)).alias("n_common_keys"),
        F.sum("contrib").cast("long").alias("join_output_rows"),
        F.max("contrib").cast("long").alias("max_key_contrib"),
    )
    return (
        prof.crossJoin(F.broadcast(l_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            F.col("n_left").cast("long").alias("n_left"),
            F.col("n_right").cast("long").alias("n_right"),
            "n_left_keys",
            "n_right_keys",
            "n_common_keys",
            "join_output_rows",
            "max_key_contrib",
        )
    )


# ---------------------------------------------------------------------------
# Sampled join-size estimation (F2 / self-join moment, key-hash sampling)
# ---------------------------------------------------------------------------

_JSE_RATES = [2, 4, 8, 16]


@register(
    "join_size_estimate_sample",
    f"""
    WITH c AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c,
             ('0x' || substr(md5(l_partkey::VARCHAR), 1, 8))::BIGINT AS h
      FROM lineitem GROUP BY l_partkey),
    s AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS exact_size,
             {", ".join(
                 f"CAST({r} * SUM(CASE WHEN h % {r} = 0 THEN c * c END)"
                 f" AS BIGINT) AS est_{r}" for r in _JSE_RATES)}
      FROM c)
    SELECT * FROM (
      {" UNION ALL ".join(
          f'''SELECT {r} AS rate_denom, est_{r} AS estimated,
                     exact_size AS exact,
                     CAST((est_{r} - exact_size) * 1000000 // exact_size
                          AS BIGINT) AS err_ppm
              FROM s''' for r in _JSE_RATES)})
    ORDER BY rate_denom
    """,
    "quality",
    "pipeline",
)
def join_size_estimate_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-output cardinality ESTIMATION by key-hash sampling — the
    optimizer-statistics move for when even the exact key-grain
    profile (``join_size_profiler``) is too expensive: hash every join
    key once, keep only keys whose hash lands in a 1/r residue class,
    sum the sampled keys' contribution, scale by r.  Because the
    sample is a deterministic function of the KEY (not the row), both
    sides of a join agree on membership — the property that makes
    correlated key-sampling an unbiased join-size estimator where
    row-Bernoulli sampling is biased (AMS/end-biased sampling
    literature).  Output: the self-join moment SUM(c_k^2) of
    lineitem.l_partkey estimated at rates 1/2..1/16 against the exact
    value, with signed ppm error — the convergence readout a planner
    consults before picking shuffle vs broadcast vs salting.

    Determinism: the md5-prefix hash and every arithmetic step are
    exact integers in both engines; all four estimates ride ONE
    conditional aggregate over the key-grain count table.

    Scale posture: one map-side-combinable key-grain aggregate, then a
    1-row readout — at 100 TB the sampled variant aggregates only the
    1/r keys it keeps (push the residue filter below the groupBy),
    trading variance for a r-times-smaller shuffle; the rate ladder
    here quantifies exactly that trade.
    """
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).withColumn(
        "h",
        F.expr(
            "CAST(conv(substr(md5(CAST(k AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT)"
        ),
    )
    aggs = [F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_size")]
    for r in _JSE_RATES:
        aggs.append(
            (
                F.lit(r)
                * F.sum(
                    F.when(F.col("h") % r == 0, F.col("c") * F.col("c"))
                )
            )
            .cast("long")
            .alias(f"est_{r}")
        )
    s = c.agg(*aggs)
    stack_args = ", ".join(
        f"{r}, est_{r}" for r in _JSE_RATES
    )
    return (
        s.selectExpr(
            "exact_size",
            f"stack({len(_JSE_RATES)}, {stack_args}) AS (rate_denom, estimated)",
        )
        .selectExpr(
            "rate_denom",
            "estimated",
            "exact_size AS exact",
            "CAST((estimated - exact_size) * 1000000 DIV exact_size"
            " AS BIGINT) AS err_ppm",
        )
        .orderBy("rate_denom")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_KA_BAL_BUCKET = 2000  # acctbal coarsened to $2000 buckets
_KA_CANDIDATES = (2, 5, 10)


@register(
    "kanonymity_audit",
    f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(c_acctbal AS BIGINT) // {_KA_BAL_BUCKET} AS bal_b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM customer GROUP BY c_nationkey, c_mktsegment, bal_b),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_groups FROM g)
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(ANY_VALUE(t.n_groups) AS BIGINT) AS n_groups_total,
           CAST(SUM(CASE WHEN g.c < k.k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below,
           CAST(SUM(CASE WHEN g.c < k.k THEN g.c ELSE 0 END) AS BIGINT)
             AS n_rows_suppressed,
           CAST(1000000 * SUM(CASE WHEN g.c < k.k THEN g.c ELSE 0 END)
                // ANY_VALUE(t.n) AS BIGINT) AS suppressed_ppm
    FROM g CROSS JOIN tot t
    CROSS JOIN (SELECT unnest([{", ".join(map(str, _KA_CANDIDATES))}]) AS k) k
    GROUP BY k.k
    ORDER BY k
    """,
    "data_quality",
    "governance",
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the
    quasi-identifier (nation, market segment, account-balance bucket
    of ${bal}): for each candidate k in {cands}, how many
    quasi-identifier groups fall below k and how many rows a
    suppress-below-k release policy would redact — the
    re-identification-risk table a privacy review needs BEFORE
    publishing an extract (a group of size 1 IS an individual).
    Completes the governance family next to takedown_propagation
    (that one erases known ids; this one measures whether the
    remaining columns still single people out).  Measured sf0.01:
    556 groups, sizes 1-11; suppression cost 7.7% of rows at k=2,
    75.7% at k=5, 98.5% at k=10 — the coarsen-or-suppress trade made
    visible.

    Exact integers end-to-end (balance coarsening by integer
    division, ppm by integer floor division).

    Scale posture: one map-side-combinable group-by at
    quasi-identifier grain; the audit re-aggregates the GROUP-grain
    table (556 rows at sf0.01, bounded by the QI domain) against a
    3-row literal k table + a 1-row total attach — nothing row-grain
    after the first aggregate.

    Reference has no governance operators (SURVEY §2c extension).
    """
    c = load(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.expr(f"CAST(c_acctbal AS BIGINT) DIV {_KA_BAL_BUCKET}").alias(
            "bal_b"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = F.broadcast(
        g.agg(
            F.sum("c").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
        )
    )
    ks = F.broadcast(
        spark.createDataFrame([(k,) for k in _KA_CANDIDATES], "k long")
    )
    return (
        g.crossJoin(tot)
        .crossJoin(ks)
        .groupBy("k")
        .agg(
            F.first("n_groups").alias("n_groups_total"),
            F.sum((F.col("c") < F.col("k")).cast("long")).alias(
                "n_groups_below"
            ),
            F.sum(F.when(F.col("c") < F.col("k"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_rows_suppressed"),
            F.first("n").alias("n"),
        )
        .select(
            "k",
            "n_groups_total",
            "n_groups_below",
            "n_rows_suppressed",
            F.expr(
                "CAST(1000000 * n_rows_suppressed DIV n AS BIGINT)"
            ).alias("suppressed_ppm"),
        )
        .orderBy("k")
    )


kanonymity_audit.__doc__ = kanonymity_audit.__doc__.format(
    bal=_KA_BAL_BUCKET, cands=set(_KA_CANDIDATES)
)


# ---------------------------------------------------------------------------
# Shuffle-key skew diagnosis (salting recommendation table)
# ---------------------------------------------------------------------------

_SKEW_PARTS = 32  # target partition count the salt factor is sized for


@register(
    "skew_key_diagnosis",
    f"""
    WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
    bi AS (
      SELECT ws[i] || ' ' || ws[i + 1] AS w
      FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d)),
    f AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM f)
    SELECT CAST(length(bin(c)) AS BIGINT) AS msb,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(1000000 * SUM(c) // ANY_VALUE(t) AS BIGINT)
             AS rows_share_ppm,
           CAST(MAX(c) AS BIGINT) AS max_freq,
           CAST(GREATEST((MAX(c) * {_SKEW_PARTS} + ANY_VALUE(t) - 1)
                         // ANY_VALUE(t), 1) AS BIGINT) AS salt_factor
    FROM f CROSS JOIN tot
    GROUP BY msb
    ORDER BY msb
    """,
    "data_quality",
    "ops",
)
def skew_key_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew histogram over the bigram key (the shingle
    shuffle key the dedup/similarity family groups and joins on):
    keys bucketed by frequency magnitude (msb = bit length of the
    count — length(bin(c)), exact integer, no log2), per-bucket key
    and row counts, row share, hottest key, and the SALT FACTOR a
    {p}-partition shuffle needs so that bucket's hottest key stays
    under 1/{p} of the data (ceil(max_freq * {p} / total), exact
    ceiling division) — the diagnosis that decides between plain
    hash partitioning, AQE skew splits, and explicit key salting
    BEFORE a 100 TB shuffle is launched.

    Scale posture: one map-side-combinable key-grain count, then all
    re-aggregation at KEY grain (vocabulary-bounded, not corpus), a
    1-row total attach, and a <=64-row magnitude-bucket readout.
    Production points it at any join/group key by swapping the first
    CTE; the plan shape is key-cardinality-bounded throughout.

    Reference has no ops-planning audits (SURVEY §2c extension;
    complements stream_watermark_lateness_audit on the batch side).
    """
    d = load(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("ws")
    )
    # Guard the degenerate single-word doc: Spark's sequence(0, -1)
    # yields a DESCENDING [0, -1] (DuckDB's generate_series is empty),
    # which would fabricate null bigrams — emit an empty array instead.
    bi = d.select(
        F.expr(
            "explode(CASE WHEN size(ws) >= 2 THEN"
            " transform(sequence(0, size(ws) - 2),"
            " i -> concat(ws[i], ' ', ws[i + 1]))"
            " ELSE array() END)"
        ).alias("w")
    )
    f = bi.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = F.broadcast(f.agg(F.sum("c").cast("long").alias("t")))
    return (
        f.crossJoin(tot)
        .groupBy(F.expr("CAST(length(bin(c)) AS BIGINT)").alias("msb"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("c").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("max_freq"),
            F.first("t").alias("t"),
        )
        .select(
            "msb",
            "n_keys",
            "n_rows",
            F.expr("CAST(1000000 * n_rows DIV t AS BIGINT)").alias(
                "rows_share_ppm"
            ),
            "max_freq",
            F.expr(
                f"CAST(GREATEST((max_freq * {_SKEW_PARTS} + t - 1) DIV t,"
                " 1) AS BIGINT)"
            ).alias("salt_factor"),
        )
        .orderBy("msb")
    )


skew_key_diagnosis.__doc__ = skew_key_diagnosis.__doc__.format(
    p=_SKEW_PARTS
)


# ---------------------------------------------------------------------------
# Skew-key salting APPLIED: before/after partition-balance measurement
# ---------------------------------------------------------------------------

# Both engines compute partition ids from the same 60-bit md5 prefix,
# so the "shuffle" is replayed as plain arithmetic and the balance
# tables hash-compare exactly.
_SALT_H_SPARK = "CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
_SALT_H_DUCK = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _salt_apply_oracle() -> str:
    h = _SALT_H_DUCK.format
    p = _SKEW_PARTS
    return f"""
    WITH occ AS (
      SELECT doc_id, i, ws[i] AS w
      FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents))),
    f AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM f),
    sf AS (
      SELECT w, c, GREATEST((c * {p} + t - 1) // t, 1) AS sfac
      FROM f CROSS JOIN tot),
    placed AS (
      SELECT o.w, s.sfac,
             {h(x="o.w")} % {p} AS pid_u,
             {h(x=("o.w || '#' || CAST(" + h(x="CAST(o.doc_id AS VARCHAR)"
                   " || ':' || CAST(o.i AS VARCHAR)") + " % s.sfac"
                   " AS VARCHAR)"))} % {p} AS pid_s
      FROM occ o JOIN sf s USING (w)),
    loads AS (
      SELECT 'salted' AS variant, pid_s AS pid,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM placed GROUP BY pid_s
      UNION ALL
      SELECT 'unsalted', pid_u, CAST(COUNT(*) AS BIGINT)
      FROM placed GROUP BY pid_u),
    nsalt AS (SELECT CAST(COUNT(*) AS BIGINT) AS k
              FROM sf WHERE sfac > 1)
    SELECT variant,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_parts_used,
           CAST(MAX(n) AS BIGINT) AS max_part_rows,
           CAST(1000000 * MAX(n) * {p} // SUM(n) AS BIGINT)
             AS max_load_ppm,
           CAST(CASE WHEN variant = 'salted'
                     THEN (SELECT k FROM nsalt) ELSE 0 END AS BIGINT)
             AS n_keys_salted
    FROM loads GROUP BY variant
    ORDER BY variant
    """


@register(
    "skew_salt_apply",
    _salt_apply_oracle(),
    "data_quality",
    "ops",
)
def skew_salt_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skew_key_diagnosis's TREATMENT arm, closing the diagnose→treat
    loop: the per-key salt factor the diagnosis formula prescribes
    (ceil(c x {p} / total), floor 1 — hot keys split, cold keys keep
    factor 1 so no extra shuffle keys are minted for the long tail)
    is APPLIED to the unigram token occurrence stream — the
    vocabulary / inverted-index shuffle key, whose head words really
    do exceed the 1/{p} hot-key bound at every SF (Zipf), unlike the
    diagnosis's longer-tailed bigram grain — and the
    before/after partition balance is measured on identical
    deterministic placement arithmetic in both engines: unsalted
    partition = H(key) mod {p}; salted partition =
    H(key # H(row) mod salt_factor) mod {p} with H a 60-bit md5
    prefix.  Output is the 2-row balance table — rows, partitions
    actually used, hottest-partition rows, and max-load ppm
    (1e6 x max x {p} / total; 1e6 = perfectly level) — plus how many
    keys were salted.  The invariant the operator exists to show:
    salted max_load_ppm <= unsalted max_load_ppm, with row counts
    conserved (salting relocates, never drops).

    Scale posture: the occurrence scan is one pass; the per-key count
    table is vocabulary-bounded and broadcast onto the stream (the
    production pattern: the salt-factor dim rides with the small side
    of the skewed join, and the probe side salts by an in-row hash —
    no extra shuffle beyond the one being fixed); balance readout
    aggregates at partition grain ({p} rows).  This is the explicit
    counterpart to AQE's runtime skew split: AQE rescues a skewed
    SORT-merge join after the fact, while pre-salting fixes hash
    aggregation and co-group shapes AQE cannot touch.

    Reference has no ops-planning tooling (SURVEY §2c extension;
    pairs with skew_key_diagnosis the way ivm_zonemap_refresh pairs
    with export_zonemap_prune).
    """
    p = _SKEW_PARTS
    h = _SALT_H_SPARK.format
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # Spread the explode + per-occurrence md5 work off the single
        # input split (r14; the poisson_bootstrap_ci fan-out pattern).
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("doc_id")
        )
        .select("doc_id", F.split("text", " ").alias("ws"))
    )
    occ = d.select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(1, size(ws)),"
            " i -> struct(i AS i, ws[i - 1] AS w)))"
        ).alias("x"),
    ).select("doc_id", F.col("x.i").alias("i"), F.col("x.w").alias("w"))
    # One materialization of the occurrence stream (r14): the
    # frequency aggregate, and the placement scan below all read the
    # same lazily-checkpointed blocks instead of re-running the
    # scan+explode per consumer (occurrence grain — the same
    # local[]/bench posture as the graph checkpoints).
    occ = occ.localCheckpoint(eager=False)
    f = occ.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = F.broadcast(f.agg(F.sum("c").cast("long").alias("t")))
    sf_dim = F.broadcast(
        f.crossJoin(tot).select(
            "w",
            F.expr(
                f"GREATEST((c * {p} + t - 1) DIV t, 1)"
            ).alias("sfac"),
        )
    )
    row_key = "concat(CAST(doc_id AS STRING), ':', CAST(i AS STRING))"
    salt = f"{h(x=row_key)} % sfac"
    salted_key = f"concat(w, '#', CAST({salt} AS STRING))"
    placed = occ.join(sf_dim, "w").select(
        "w",
        "sfac",
        F.expr(f"{h(x='w')} % {p}").alias("pid_u"),
        F.expr(f"{h(x=salted_key)} % {p}").alias("pid_s"),
    )
    # Both placement variants counted in ONE pass over the placed
    # stream (r14): exploding each row into its (variant, pid) pair
    # rows feeds a single map-side-combinable aggregate — the
    # union-of-groupBys form ran the scan+join+md5 subtree once per
    # variant.
    loads = (
        placed.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("salted").alias("variant"),
                        F.col("pid_s").alias("pid"),
                    ),
                    F.struct(
                        F.lit("unsalted").alias("variant"),
                        F.col("pid_u").alias("pid"),
                    ),
                )
            ).alias("vp")
        )
        .select("vp.variant", "vp.pid")
        .groupBy("variant", "pid")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    nsalt = F.broadcast(
        sf_dim.filter(F.col("sfac") > 1).agg(
            F.count(F.lit(1)).cast("long").alias("k")
        )
    )
    return (
        loads.groupBy("variant")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_parts_used"),
            F.max("n").cast("long").alias("max_part_rows"),
        )
        .crossJoin(nsalt)
        .select(
            "variant",
            "n_rows",
            "n_parts_used",
            "max_part_rows",
            F.expr(
                f"CAST(1000000 * max_part_rows * {p} DIV n_rows AS BIGINT)"
            ).alias("max_load_ppm"),
            F.expr(
                "CAST(CASE WHEN variant = 'salted' THEN k ELSE 0 END"
                " AS BIGINT)"
            ).alias("n_keys_salted"),
        )
        .orderBy("variant")
    )


skew_salt_apply.__doc__ = skew_salt_apply.__doc__.format(p=_SKEW_PARTS)


# ---------------------------------------------------------------------------
# l-diversity audit over quasi-identifiers (sensitive-value diversity)
# ---------------------------------------------------------------------------

_LD_BAL_BUCKET = 2000  # same coarsening as kanonymity_audit
_LD_CANDIDATES = (2, 3, 5)


@register(
    "ldiversity_audit",
    f"""
    WITH g AS (
      SELECT c_nationkey,
             CAST(c_acctbal AS BIGINT) // {_LD_BAL_BUCKET} AS bal_b,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div,
             CAST(MAX(seg_c) AS BIGINT) AS top_seg_c
      FROM (
        SELECT c_nationkey, c_acctbal, c_mktsegment,
               COUNT(*) OVER (PARTITION BY c_nationkey,
                              CAST(c_acctbal AS BIGINT) // {_LD_BAL_BUCKET},
                              c_mktsegment) AS seg_c
        FROM customer)
      GROUP BY c_nationkey, bal_b),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_groups FROM g)
    SELECT CAST(l.l AS BIGINT) AS l,
           CAST(ANY_VALUE(t.n_groups) AS BIGINT) AS n_groups_total,
           CAST(SUM(CASE WHEN g.l_div < l.l THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_below,
           CAST(SUM(CASE WHEN g.l_div < l.l THEN g.c ELSE 0 END)
                AS BIGINT) AS n_rows_at_risk,
           CAST(1000000 * SUM(CASE WHEN g.l_div < l.l THEN g.c ELSE 0 END)
                // ANY_VALUE(t.n) AS BIGINT) AS at_risk_ppm,
           CAST(SUM(CASE WHEN 1000000 * g.top_seg_c // g.c > 900000
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_skewed
    FROM g CROSS JOIN tot t
    CROSS JOIN (SELECT unnest([{", ".join(map(str, _LD_CANDIDATES))}]) AS l) l
    GROUP BY l.l
    ORDER BY l
    """,
    "data_quality",
    "governance",
)
def ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the customer table: k-anonymity
    (kanonymity_audit) certifies GROUP SIZE, but a size-10 group
    whose members all share one market segment still leaks the
    sensitive attribute — l-diversity requires every quasi-identifier
    group (nation, ${bal} balance bucket) to contain at least l
    DISTINCT sensitive values (Machanavajjhala et al. 2007).  For
    each candidate l in {cands}: groups below l, rows in those
    groups, and (skew diagnostic) groups where one segment holds
    >90% of members — the recursive-(c,l)-diversity smell that
    distinct-count l-diversity alone misses.

    Scale posture: one (QI, sensitive)-grain window for the top
    segment share rides the same hash partitioning as the QI
    aggregate; the candidate fan-out is a 3-row broadcast dim over
    the GROUP-grain table (bounded by QI domain, not corpus rows).
    Exact integers end-to-end.

    Reference has no governance tooling (SURVEY §2c extension;
    extends kanonymity_audit with the sensitive-attribute axis).
    """
    from pyspark.sql import Window as W

    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.expr(f"CAST(c_acctbal AS BIGINT) DIV {_LD_BAL_BUCKET}").alias(
            "bal_b"
        ),
        "c_mktsegment",
    )
    seg_w = W.partitionBy("c_nationkey", "bal_b", "c_mktsegment")
    g = (
        c.withColumn("seg_c", F.count(F.lit(1)).over(seg_w))
        .groupBy("c_nationkey", "bal_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.countDistinct("c_mktsegment").cast("long").alias("l_div"),
            F.max("seg_c").cast("long").alias("top_seg_c"),
        )
    )
    tot = g.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    ls = F.explode(
        F.array(*[F.lit(v) for v in _LD_CANDIDATES])
    ).alias("l")
    lv = g.sparkSession.range(1).select(ls)
    return (
        g.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(lv))
        .groupBy("l")
        .agg(
            F.first("n_groups").cast("long").alias("n_groups_total"),
            F.sum(
                F.when(F.col("l_div") < F.col("l"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_groups_below"),
            F.sum(
                F.when(F.col("l_div") < F.col("l"), F.col("c")).otherwise(0)
            )
            .cast("long")
            .alias("n_rows_at_risk"),
            F.expr(
                "CAST(1000000 * SUM(CASE WHEN l_div < l THEN c ELSE 0 END)"
                " DIV FIRST(n) AS BIGINT)"
            ).alias("at_risk_ppm"),
            F.sum(
                F.when(
                    F.expr("1000000 * top_seg_c DIV c > 900000"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_groups_skewed"),
        )
        .select(
            F.col("l").cast("long"),
            "n_groups_total",
            "n_groups_below",
            "n_rows_at_risk",
            "at_risk_ppm",
            "n_groups_skewed",
        )
        .orderBy("l")
    )


ldiversity_audit.__doc__ = ldiversity_audit.__doc__.format(
    bal=_LD_BAL_BUCKET, cands=_LD_CANDIDATES
)


# ---------------------------------------------------------------------------
# Disparate-impact (80% rule) fairness audit
# ---------------------------------------------------------------------------

_DI_BAL_THRESHOLD = 8000  # "selected" = account balance above this
_DI_RULE_PPM = 800_000  # the four-fifths rule


@register(
    "fairness_disparate_impact",
    f"""
    WITH g AS (
      SELECT c_mktsegment AS grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c_acctbal > {_DI_BAL_THRESHOLD}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_sel
      FROM customer GROUP BY c_mktsegment),
    ref AS (
      SELECT n AS n_ref, n_sel AS sel_ref, grp AS ref_grp
      FROM g ORDER BY CAST(1000000 AS HUGEINT) * n_sel // n DESC, grp
      LIMIT 1)
    SELECT g.grp AS segment, g.n, g.n_sel,
           CAST(CAST(1000000 AS HUGEINT) * g.n_sel // g.n AS BIGINT)
             AS rate_ppm,
           r.ref_grp AS reference_segment,
           CAST(CAST(1000000 AS HUGEINT) * g.n_sel * r.n_ref
                // (CAST(g.n AS HUGEINT) * r.sel_ref) AS BIGINT)
             AS di_ratio_ppm,
           CAST(CAST(1000000 AS HUGEINT) * g.n_sel * r.n_ref
                // (CAST(g.n AS HUGEINT) * r.sel_ref)
                < {_DI_RULE_PPM} AS INT) AS below_four_fifths
    FROM g CROSS JOIN ref r
    ORDER BY segment
    """,
    "data_quality",
    "governance",
)
def fairness_disparate_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disparate-impact audit (the EEOC four-fifths rule): per market
    segment, the selection rate of the acctbal > ${t} outcome and its
    exact ratio to the HIGHEST-rate group — a group whose ratio falls
    below 80% is adverse-impact flagged.  The ratio is computed
    cross-multiplied (1e6 * sel_g * n_ref DIV (n_g * sel_ref)), never
    as a ratio of rounded rates, so the flag is exact; the products
    leave int64 around 30M rows/group and are therefore carried in
    128-bit arithmetic (HUGEINT / the semdedup DECIMAL contract).
    sf0.01: rates 16.9-21.8%, MACHINERY at 0.774 of AUTOMOBILE —
    below the rule, so the flag genuinely fires on the fixture.

    Scale posture: one combinable group aggregate; the reference
    group is a 1-row broadcast attach (ties broken by segment name
    for determinism).

    Reference has no governance tooling (SURVEY §2c extension; joins
    kanonymity_audit / ldiversity_audit — size, diversity, and now
    outcome-rate equity).
    """
    g = load(spark, sf_dir, "customer").groupBy(
        F.col("c_mktsegment").alias("grp")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("c_acctbal") > _DI_BAL_THRESHOLD, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_sel"),
    )
    ref = (
        g.orderBy(
            F.expr(
                "CAST(1000000 AS DECIMAL(38,0)) * n_sel DIV n"
            ).desc(),
            "grp",
        )
        .limit(1)
        .select(
            F.col("n").alias("n_ref"),
            F.col("n_sel").alias("sel_ref"),
            F.col("grp").alias("ref_grp"),
        )
    )
    di = (
        "CAST(1000000 AS DECIMAL(38,0)) * n_sel * n_ref"
        " DIV (CAST(n AS DECIMAL(38,0)) * sel_ref)"
    )
    return (
        g.crossJoin(F.broadcast(ref))
        .select(
            F.col("grp").alias("segment"),
            "n",
            "n_sel",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * n_sel DIV n"
                " AS BIGINT)"
            ).alias("rate_ppm"),
            F.col("ref_grp").alias("reference_segment"),
            F.expr(f"CAST({di} AS BIGINT)").alias("di_ratio_ppm"),
            F.expr(f"CAST({di} < {_DI_RULE_PPM} AS INT)").alias(
                "below_four_fifths"
            ),
        )
        .orderBy("segment")
    )


fairness_disparate_impact.__doc__ = fairness_disparate_impact.__doc__.format(
    t=_DI_BAL_THRESHOLD
)


# ---------------------------------------------------------------------------
# Deletion-propagation audit (right-to-erasure cascade verification)
# ---------------------------------------------------------------------------

_DEL_MOD = 97  # erasure cohort: c_custkey % 97 == 0


@register(
    "deletion_propagation_audit",
    f"""
    WITH vic AS (SELECT c_custkey FROM customer
                 WHERE c_custkey % {_DEL_MOD} = 0),
    vo AS (SELECT o_orderkey, o_custkey FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM vic)),
    vl AS (SELECT l_orderkey FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM vo)),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer),
    no_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vic),
    nvo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vo),
    nvl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vl)
    SELECT * FROM (
      SELECT 'cascade' AS strategy, 'customer' AS tbl,
             (SELECT n FROM nc) AS n_before,
             (SELECT n FROM nv) AS n_deleted,
             (SELECT n FROM nc) - (SELECT n FROM nv) AS n_after,
             CAST(0 AS BIGINT) AS n_dangling_refs
      UNION ALL
      SELECT 'cascade', 'orders', (SELECT n FROM no_),
             (SELECT n FROM nvo),
             (SELECT n FROM no_) - (SELECT n FROM nvo), 0
      UNION ALL
      SELECT 'cascade', 'lineitem', (SELECT n FROM nl),
             (SELECT n FROM nvl),
             (SELECT n FROM nl) - (SELECT n FROM nvl), 0
      UNION ALL
      SELECT 'direct_only', 'customer', (SELECT n FROM nc),
             (SELECT n FROM nv),
             (SELECT n FROM nc) - (SELECT n FROM nv), 0
      UNION ALL
      SELECT 'direct_only', 'orders', (SELECT n FROM no_), 0,
             (SELECT n FROM no_), (SELECT n FROM nvo)
      UNION ALL
      SELECT 'direct_only', 'lineitem', (SELECT n FROM nl), 0,
             (SELECT n FROM nl), 0)
    ORDER BY strategy, tbl
    """,
    "data_quality",
    "governance",
)
def deletion_propagation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Right-to-erasure cascade verification: for a deterministic
    erasure cohort (c_custkey % {m} == 0), the per-table deletion
    ledger under BOTH strategies a compliance review compares —
    `direct_only` (delete the subject rows, leave derived tables) vs
    `cascade` (propagate through the FK graph customer -> orders ->
    lineitem).  n_dangling_refs is the audit's verdict column: rows
    whose FK target no longer exists after the strategy runs —
    direct_only leaves every victim order dangling (the subject's
    data is still reconstructible from the fact tables: a compliance
    FAILURE the ledger makes visible), cascade leaves zero at every
    level.  lineitem never dangles under direct_only because its
    parent orders survive — dangling is a one-hop property, which is
    exactly why erasure must walk the FK graph transitively rather
    than check references once.

    Scale posture: the victim cohort broadcasts as a join probe down
    the FK chain (the decontaminate_benchmark shape), and each fact
    table's (total, victims) pair comes from ONE conditional aggregate
    over it — count(*) alongside a count of the broadcast-join
    membership flag — so the audit is three 1-row driver actions, one
    per fact table, each map-side combinable with no fact shuffle.
    The two victim dims (cohort keys, victim order keys) are
    registry-cached so each builds exactly once; in total customer and
    orders are scanned twice each (ledger aggregate + dim build) and
    lineitem once.  In production the same plan emits the deletion
    manifests (export_manifest_checksums grain) instead of counts.

    Reference has no governance tooling (SURVEY §2c extension; joins
    kanonymity_audit / ldiversity_audit in the governance family).
    """
    vic = cached(
        spark,
        sf_dir,
        "deletion_audit_vic",
        lambda: load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % _DEL_MOD == 0)
        .select("c_custkey"),
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # One conditional aggregate per fact table: count(*) + victim
    # membership in the same pass (r11 ADVICE — the earlier six
    # .count() actions rescanned customer/orders and rebuilt the
    # semi-join chains).  Victim flags come from a LEFT join against
    # the broadcast dim (both dims are unique-keyed, so no fanout) and
    # count(non-null) is the semi-join cardinality.
    crow = (
        load(spark, sf_dir, "customer")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("c_custkey") % _DEL_MOD == 0, 1))
            .cast("long")
            .alias("nv"),
        )
        .first()
    )
    nc, nv = crow["n"], crow["nv"]
    orow = (
        o.join(F.broadcast(vic), o["o_custkey"] == vic["c_custkey"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("c_custkey").cast("long").alias("nv"),
        )
        .first()
    )
    no, nvo = orow["n"], orow["nv"]
    vo_keys = cached(
        spark,
        sf_dir,
        "deletion_audit_vo_keys",
        lambda: o.join(
            F.broadcast(vic), o["o_custkey"] == vic["c_custkey"], "left_semi"
        ).select("o_orderkey"),
    )
    lrow = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .join(
            F.broadcast(vo_keys),
            F.col("l_orderkey") == vo_keys["o_orderkey"],
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("o_orderkey").cast("long").alias("nv"),
        )
        .first()
    )
    nl, nvl = lrow["n"], lrow["nv"]
    rows = [
        ("cascade", "customer", nc, nv, nc - nv, 0),
        ("cascade", "lineitem", nl, nvl, nl - nvl, 0),
        ("cascade", "orders", no, nvo, no - nvo, 0),
        ("direct_only", "customer", nc, nv, nc - nv, 0),
        ("direct_only", "lineitem", nl, 0, nl, 0),
        ("direct_only", "orders", no, 0, no, nvo),
    ]
    return spark.createDataFrame(
        rows,
        "strategy string, tbl string, n_before long, n_deleted long,"
        " n_after long, n_dangling_refs long",
    ).orderBy("strategy", "tbl")


deletion_propagation_audit.__doc__ = deletion_propagation_audit.__doc__.format(
    m=_DEL_MOD
)


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality ledger (per-rule pass rates)
# ---------------------------------------------------------------------------

# (rule_id, description) — the document-level heuristics of the Gopher
# corpus-filtering recipe (Rae et al. 2021, table A1 shape), evaluated
# as EXACT integer rational comparisons so both engines agree bit-for-
# bit (no float threshold ever materializes):
#   wc_bounds      50 <= n_words <= 100000
#   mean_wordlen   3 <= sum_len/n_words <= 10   (3n <= sum <= 10n)
#   symbol_ratio   (n_hash + n_ellipsis) / n_words <= 0.1
#   bullet_lines   lines starting with -/* <= 90%  (kept docs: <= 90%)
#   ellipsis_lines lines ending with ... <= 30%
#   alpha_words    words containing a letter >= 80%
#   stopwords      >= 2 distinct of the 8 Gopher stop words
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_RULES = (
    "wc_bounds",
    "mean_wordlen",
    "symbol_ratio",
    "bullet_lines",
    "ellipsis_lines",
    "alpha_words",
    "stopwords",
)


def _gopher_oracle() -> str:
    stop_hits = " + ".join(
        f"CASE WHEN list_contains(words, '{s}') THEN 1 ELSE 0 END"
        for s in _GOPHER_STOPS
    )
    branches = " UNION ALL ".join(
        f"SELECT '{r}' AS rule, n_docs, p{i} AS n_pass FROM agg"
        for i, r in enumerate(_GOPHER_RULES)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'),
                         t -> t <> '') AS words,
             string_split(text, chr(10)) AS lines,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) // 3
               AS n_ell
      FROM documents),
    feat AS (
      SELECT doc_id,
             len(words) AS nw,
             CAST(list_sum(list_transform(words, w -> length(w)))
                  AS BIGINT) AS sumlen,
             n_hash + n_ell AS nsym,
             len(lines) AS nl,
             len(list_filter(lines,
                 l -> starts_with(l, '-') OR starts_with(l, '*')))
               AS n_bullet,
             len(list_filter(lines, l -> suffix(l, '...'))) AS n_ellend,
             len(list_filter(words,
                 w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha,
             {stop_hits} AS n_stops
      FROM toks),
    agg AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN nw >= 50 AND nw <= 100000 THEN 1 ELSE 0 END)
             AS BIGINT) AS p0,
        CAST(SUM(CASE WHEN nw > 0 AND 3 * nw <= sumlen
                       AND sumlen <= 10 * nw THEN 1 ELSE 0 END)
             AS BIGINT) AS p1,
        CAST(SUM(CASE WHEN nw > 0 AND 10 * nsym <= nw THEN 1 ELSE 0 END)
             AS BIGINT) AS p2,
        CAST(SUM(CASE WHEN 10 * n_bullet <= 9 * nl THEN 1 ELSE 0 END)
             AS BIGINT) AS p3,
        CAST(SUM(CASE WHEN 10 * n_ellend <= 3 * nl THEN 1 ELSE 0 END)
             AS BIGINT) AS p4,
        CAST(SUM(CASE WHEN nw > 0 AND 5 * n_alpha >= 4 * nw
                      THEN 1 ELSE 0 END) AS BIGINT) AS p5,
        CAST(SUM(CASE WHEN n_stops >= 2 THEN 1 ELSE 0 END)
             AS BIGINT) AS p6
      FROM feat)
    SELECT rule, n_docs, n_pass,
           CAST(1000000 * n_pass // n_docs AS BIGINT) AS pass_ppm
    FROM ({branches})
    ORDER BY rule
    """


@register(
    "quality_gopher_rules",
    _gopher_oracle(),
    "data_quality",
    "quality",
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality LEDGER: the seven document-level
    heuristics of the public Gopher corpus-filtering recipe (word-count
    bounds, mean word length, symbol-to-word ratio, bullet-line and
    ellipsis-line shares, alphabetic-word share, stop-word presence),
    each reported as a per-rule pass count + pass rate over the corpus
    — the dashboard a data-curation run reads BEFORE picking thresholds
    (text_quality_score composes signals per doc; this operator audits
    the rule set itself, rule by rule).

    Determinism across engines: every threshold is evaluated as an
    EXACT integer rational comparison (3n <= sumlen <= 10n, 10*sym <=
    words, 10*bullets <= 9*lines, 5*alpha >= 4*words) so no float
    ratio ever materializes; words split on runs of whitespace with
    empties dropped (identical regex class both engines), lines on
    chr(10), ellipses counted by non-overlapping '...' replacement.

    Scale posture: ONE corpus scan — all per-doc features are narrow
    codegen projections (no explode: word stats come from aggregate/
    filter over the split array in-row), all seven rule flags collapse
    in one map-side-combinable aggregate, and the 7-row ledger is a
    stack over that 1-row aggregate.  No join, no shuffle beyond the
    final 1-row exchange.

    Reference has no corpus-quality tooling (SURVEY §2c extension;
    joins text_quality_score / quality_repetition_signals /
    quality_classifier_logit in the quality family).
    """
    d = load(spark, sf_dir, "documents")
    words = "filter(split(text, '\\\\s+'), t -> t != '')"
    lines = "split(text, '\\n')"
    stop_hits = " + ".join(
        f"IF(array_contains(words, '{s}'), 1, 0)" for s in _GOPHER_STOPS
    )
    feat = d.select(
        F.expr(words).alias("words"),
        F.expr(lines).alias("lines"),
        (
            F.length("text") - F.length(F.expr("replace(text, '#', '')"))
        ).alias("n_hash"),
        F.expr(
            "CAST((length(text) - length(replace(text, '...', ''))) / 3"
            " AS BIGINT)"
        ).alias("n_ell"),
    ).select(
        F.expr("size(words)").cast("long").alias("nw"),
        F.expr(
            "aggregate(words, CAST(0 AS BIGINT),"
            " (acc, w) -> acc + length(w))"
        ).alias("sumlen"),
        (F.col("n_hash") + F.col("n_ell")).cast("long").alias("nsym"),
        F.expr("size(lines)").cast("long").alias("nl"),
        F.expr(
            "size(filter(lines, l -> startswith(l, '-')"
            " OR startswith(l, '*')))"
        )
        .cast("long")
        .alias("n_bullet"),
        F.expr("size(filter(lines, l -> endswith(l, '...')))")
        .cast("long")
        .alias("n_ellend"),
        F.expr("size(filter(words, w -> w rlike '[a-zA-Z]'))")
        .cast("long")
        .alias("n_alpha"),
        F.expr(stop_hits).cast("long").alias("n_stops"),
    )
    agg = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.expr("IF(nw >= 50 AND nw <= 100000, 1, 0)"))
        .cast("long")
        .alias("p0"),
        F.sum(F.expr("IF(nw > 0 AND 3 * nw <= sumlen AND sumlen <= 10 * nw, 1, 0)"))
        .cast("long")
        .alias("p1"),
        F.sum(F.expr("IF(nw > 0 AND 10 * nsym <= nw, 1, 0)"))
        .cast("long")
        .alias("p2"),
        F.sum(F.expr("IF(10 * n_bullet <= 9 * nl, 1, 0)"))
        .cast("long")
        .alias("p3"),
        F.sum(F.expr("IF(10 * n_ellend <= 3 * nl, 1, 0)"))
        .cast("long")
        .alias("p4"),
        F.sum(F.expr("IF(nw > 0 AND 5 * n_alpha >= 4 * nw, 1, 0)"))
        .cast("long")
        .alias("p5"),
        F.sum(F.expr("IF(n_stops >= 2, 1, 0)")).cast("long").alias("p6"),
    )
    stack_args = ", ".join(
        f"'{r}', p{i}" for i, r in enumerate(_GOPHER_RULES)
    )
    return (
        agg.selectExpr(
            "n_docs",
            f"stack({len(_GOPHER_RULES)}, {stack_args}) AS (rule, n_pass)",
        )
        .select(
            "rule",
            "n_docs",
            "n_pass",
            F.expr("CAST(1000000 * n_pass DIV n_docs AS BIGINT)").alias(
                "pass_ppm"
            ),
        )
        .orderBy("rule")
    )

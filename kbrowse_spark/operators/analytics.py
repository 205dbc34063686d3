"""Event-analytics operators: funnel conversion, retention cohorts,
time-series gap filling (SURVEY §2c extension surface — the classic
product-analytics trio over the events stream).

All three are single-key-shuffle plans (user_id or event_type) with
exact-integer outputs — no floats feed an ORDER BY, ratios are one IEEE
division of two exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load

# ---------------------------------------------------------------------------
# Funnel conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    """
    WITH staged AS (
      SELECT user_id, event_type, ts, event_id,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_view
      FROM events),
    quald AS (
      SELECT user_id, event_type, ts, event_id, prior_view,
             CASE WHEN event_type = 'click' AND prior_view IS NOT NULL
                  THEN ts END AS qual_click_ts
      FROM staged),
    quald2 AS (
      SELECT *,
             min(qual_click_ts)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prior_qual_click
      FROM quald),
    per_user AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             max(CASE WHEN qual_click_ts IS NOT NULL THEN 1 ELSE 0 END) AS s2,
             max(CASE WHEN event_type = 'purchase'
                       AND prior_qual_click IS NOT NULL
                      THEN 1 ELSE 0 END) AS s3
      FROM quald2 GROUP BY user_id)
    SELECT stage, n_users FROM (
      SELECT 1 AS ord, 'view' AS stage,
             CAST(SUM(s1) AS BIGINT) AS n_users FROM per_user
      UNION ALL
      SELECT 2, 'view>click', CAST(SUM(s2) AS BIGINT) FROM per_user
      UNION ALL
      SELECT 3, 'view>click>purchase', CAST(SUM(s3) AS BIGINT) FROM per_user)
    ORDER BY ord
    """,
    "analytics",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: how many users complete view -> click ->
    purchase IN ORDER (a click only counts after a strictly-earlier
    view; a purchase only after such a click).

    Expressed as cumulative-window minima over each user's event
    sequence — ONE shuffle on user_id serves all three window passes
    and the per-user rollup (same-key windows share the exchange), vs
    the naive 3-way self-join.  Event order is (ts, event_id) — the
    deterministic tiebreak pinned in both engines.

    Scale posture: one hash exchange on user_id (the natural key, high
    cardinality, no skew), windows stream within each partition, final
    stage counts are a 3-row aggregate.  At 100 TB: one shuffle of the
    events table, nothing else.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    prior = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = ev.withColumn(
        "prior_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(prior),
    ).withColumn(
        "qual_click_ts",
        F.when(
            (F.col("event_type") == "click") & F.col("prior_view").isNotNull(),
            F.col("ts"),
        ),
    )
    staged = staged.withColumn(
        "prior_qual_click", F.min("qual_click_ts").over(prior)
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("s1"),
        F.max(
            F.when(F.col("qual_click_ts").isNotNull(), 1).otherwise(0)
        ).alias("s2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("prior_qual_click").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("s3"),
    )
    totals = per_user.agg(
        F.sum("s1").alias("n1"), F.sum("s2").alias("n2"), F.sum("s3").alias("n3")
    )
    return (
        totals.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("ord"),
                        F.lit("view").alias("stage"),
                        F.col("n1").alias("n_users"),
                    ),
                    F.struct(
                        F.lit(2).alias("ord"),
                        F.lit("view>click").alias("stage"),
                        F.col("n2").alias("n_users"),
                    ),
                    F.struct(
                        F.lit(3).alias("ord"),
                        F.lit("view>click>purchase").alias("stage"),
                        F.col("n3").alias("n_users"),
                    ),
                )
            ).alias("r")
        )
        .select("r.stage", "r.n_users")
        .orderBy("r.ord")
        .select("stage", "n_users")
    )


# ---------------------------------------------------------------------------
# Retention cohorts
# ---------------------------------------------------------------------------

_RETENTION_MAX_OFFSET = 7


@register(
    "retention_cohorts",
    f"""
    WITH first_day AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day
      FROM events)
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cohort_day, active_day) AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity JOIN first_day USING (user_id)
    WHERE date_diff('day', cohort_day, active_day)
          BETWEEN 0 AND {_RETENTION_MAX_OFFSET}
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "analytics",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort analysis: users cohorted by first-activity day;
    for each cohort, how many are active again N days later (N <= 7) —
    the table behind every retention curve.

    Scale posture: cohort assignment and the user-day activity grid are
    both user_id-keyed aggregates, and the join re-uses the same key —
    one partitioning serves all three stages (Catalyst reuses the
    exchange).  The activity DISTINCT collapses each user's events to
    at most days×1 rows map-side before any shuffle.
    """
    ev = load(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("active_day")
    ).distinct()
    off = F.datediff(F.col("active_day"), F.col("cohort_day"))
    return (
        activity.join(first_day, "user_id")
        .filter((off >= 0) & (off <= _RETENTION_MAX_OFFSET))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            off.cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Time-series gap fill (dense hourly grid + zero-fill + LOCF)
# ---------------------------------------------------------------------------


@register(
    "timeseries_gap_fill",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events),
    grid AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    dense AS (SELECT hour, event_type FROM grid CROSS JOIN types),
    hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2)
    SELECT strftime(d.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           d.event_type AS event_type,
           COALESCE(h.n, 0) AS n,
           last_value(h.cents IGNORE NULLS)
             OVER (PARTITION BY d.event_type ORDER BY d.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cents_locf
    FROM dense d LEFT JOIN hourly h
      ON d.hour = h.hour AND d.event_type = h.event_type
    ORDER BY hour, event_type
    """,
    "analytics",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling over an hourly time grid: densify (every hour ×
    every event type, even silent ones), zero-fill counts, and
    forward-fill (LOCF) the last observed hourly cents sum — the
    resampling step every hypertable/monitoring pipeline needs before
    charting or windowed comparison.

    The dense grid is generated from a 1-row bounds aggregate
    (sequence + explode — never a driver-side loop) crossed with the
    observed type dimension (broadcast).  LOCF is `last(col, ignore
    nulls)` over an event_type-partitioned window.

    Scale posture: hourly pre-aggregation shrinks the fact table to
    grid size BEFORE the join (map-side combined); the grid side is
    hours×types (tiny at any horizon — a decade of hours × 1e3 types
    ≈ 1e8 rows worst case, still shardable by the same window key).
    The LOCF window shuffles grid-sized data once on event_type.
    """
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        F.explode(
            F.expr("sequence(h0, h1, interval 1 hour)")
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    dense = grid.crossJoin(F.broadcast(types))
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    locf = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        dense.join(hourly, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            F.last("cents", ignorenulls=True).over(locf).alias("cents_locf"),
        )
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "cents_locf",
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# Robust outlier detection: median absolute deviation (MAD)
# ---------------------------------------------------------------------------


@register(
    "anomaly_mad_outliers",
    """
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    med AS (
      SELECT event_type, quantile_cont(cents, 0.5) AS med
      FROM c GROUP BY event_type),
    dev AS (
      SELECT c.event_type, c.cents, m.med,
             ABS(c.cents - m.med) AS adev
      FROM c JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(d.med) AS DOUBLE) AS med_cents,
           CAST(MAX(ma.mad) AS DOUBLE) AS mad_cents,
           CAST(SUM(CASE WHEN d.adev > 3 * ma.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(MAX(d.adev) AS DOUBLE) AS max_abs_dev
    FROM dev d JOIN mad ma USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    "analytics",
    "agg",
)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection via median absolute
    deviation: values more than 3 MADs from their group median are
    outliers — the monitoring primitive that, unlike mean/stddev
    z-scores, does not let the outliers inflate their own threshold.

    Exactness: values quantize to integer cents; exact medians with
    linear interpolation land on representable halves/quarters, so the
    3*MAD comparison is bit-identical across engines.  Two aggregate
    passes (median, then MAD over deviations) with the small per-group
    medians broadcast back — groups are event_type-cardinality, so the
    joins are broadcast hash joins.

    Scale posture: exact percentile buffers each group's values — fine
    for low-cardinality monitoring groups; at raw 100 TB granularity
    swap `percentile` for `approx_percentile` (rank-bounded, see
    approx_percentile_prices) with the identical plan shape.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5D)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("med").cast("double").alias("med_cents"),
            F.max("mad").cast("double").alias("mad_cents"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.max("adev").cast("double").alias("max_abs_dev"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Percentile winsorization (feature clipping)
# ---------------------------------------------------------------------------


@register(
    "winsorize_value_clip",
    """
    WITH c AS (
      SELECT event_id, event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    h AS (SELECT event_type, cents, COUNT(*) AS cnt
          FROM c GROUP BY event_type, cents),
    cum AS (
      SELECT event_type, cents,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumn,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM h),
    cuts AS (
      SELECT event_type,
             MIN(CASE WHEN cumn >= (5 * n + 99) // 100 THEN cents END)
               AS lo_cents,
             MIN(CASE WHEN cumn >= (95 * n + 99) // 100 THEN cents END)
               AS hi_cents
      FROM cum GROUP BY event_type)
    SELECT c.event_id AS event_id, c.event_type AS event_type,
           c.cents AS cents, k.lo_cents AS lo_cents, k.hi_cents AS hi_cents,
           LEAST(GREATEST(c.cents, k.lo_cents), k.hi_cents) AS clipped_cents,
           CAST(c.cents < k.lo_cents OR c.cents > k.hi_cents AS INT)
             AS was_clipped
    FROM c JOIN cuts k USING (event_type)
    ORDER BY event_id
    """,
    "analytics",
    "agg",
)
def winsorize_value_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group percentile winsorization: clip each event's value into
    its event_type's [P5, P95] band — the outlier-clamping step of
    feature normalization (reward clipping, label smoothing, metric
    de-spiking) that keeps heavy tails from dominating sums.

    The percentile cut is an exact order statistic computed WITHOUT a
    per-group sort of the raw rows: values quantize to integer cents
    (bounded domain), so the cut falls out of a (event_type, cents)
    histogram aggregate plus a cumulative window whose partition size
    is bounded by the VALUE DOMAIN (<= 49k distinct cents here), not
    the corpus.  Rank thresholds use pure integer arithmetic
    (``(5*n+99) div 100`` = ceil(5n/100)) so both engines agree without
    any floating-point quantile math.

    Scale posture: two corpus scans (histogram, then clip), both
    map-side-combinable; the per-type cuts are a handful of rows
    broadcast back.  The same decomposition backs
    quantile_prune_quality — this is its per-GROUP generalization.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    h = ev.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "cents",
        F.sum("cnt").over(w_cum).alias("cumn"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    cuts = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cumn") >= F.expr("(5 * n + 99) div 100"), F.col("cents"))
        ).alias("lo_cents"),
        F.min(
            F.when(F.col("cumn") >= F.expr("(95 * n + 99) div 100"), F.col("cents"))
        ).alias("hi_cents"),
    )
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .select(
            "event_id",
            "event_type",
            "cents",
            "lo_cents",
            "hi_cents",
            F.least(
                F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents")
            ).alias("clipped_cents"),
            (
                (F.col("cents") < F.col("lo_cents"))
                | (F.col("cents") > F.col("hi_cents"))
            )
            .cast("int")
            .alias("was_clipped"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment metric
# ---------------------------------------------------------------------------

_CUPED_CUTOFF = "2024-01-15"


@register(
    "cuped_adjusted_metric",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOFF}'
                      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x_cents,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUTOFF}'
                      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y_cents
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x_cents) AS HUGEINT) AS sx,
             CAST(SUM(y_cents) AS HUGEINT) AS sy,
             SUM(CAST(x_cents * x_cents AS HUGEINT)) AS sxx,
             SUM(CAST(x_cents * y_cents AS HUGEINT)) AS sxy
      FROM per_user),
    theta_t AS (
      SELECT n, sx,
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) AS theta
      FROM stats)
    SELECT p.user_id AS user_id, p.x_cents AS x_cents, p.y_cents AS y_cents,
           t.theta AS theta,
           CAST(p.y_cents AS DOUBLE) / 100 - t.theta *
             (CAST(p.x_cents AS DOUBLE) / 100
              - CAST(t.sx AS DOUBLE) / t.n / 100) AS y_adj
    FROM per_user p CROSS JOIN theta_t t
    ORDER BY user_id
    """,
    "analytics",
    "agg",
)
def cuped_adjusted_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, "Improving the
    Sensitivity of Online Controlled Experiments"): adjust each user's
    post-period metric by theta x (pre-period covariate - mean), where
    theta = cov(x,y)/var(x) — the standard trick that shrinks
    experiment metric variance using pre-experiment behavior, cutting
    required sample sizes severalfold.

    All moments accumulate EXACTLY: per-user pre/post sums in integer
    cents, the cross/auto products summed in 128-bit-capable arithmetic
    (Spark DECIMAL(38,0), DuckDB HUGEINT — per-user products fit int64,
    but n*Sxy at corpus scale does not, the SemDeDup overflow lesson).
    theta and the adjustment are then IEEE doubles over identical
    expression trees, so both engines agree bit-for-bit.

    Scale posture: one user-keyed aggregate (map-side combinable), a
    1-row moments aggregate, and a broadcast 1-row theta attach — the
    corpus is scanned once and shuffled once at user grain.  No window
    over raw events.
    """
    cutoff = F.lit(_CUPED_CUTOFF).cast("timestamp")
    cents = F.floor(F.col("value") * 100).cast("long")
    per_user = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(F.lit(0)))
            .cast("long")
            .alias("x_cents"),
            F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(F.lit(0)))
            .cast("long")
            .alias("y_cents"),
        )
    )
    stats = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_cents").cast("decimal(38,0)").alias("sx"),
        F.sum("y_cents").cast("decimal(38,0)").alias("sy"),
        F.sum(
            (F.col("x_cents") * F.col("x_cents")).cast("decimal(38,0)")
        ).alias("sxx"),
        F.sum(
            (F.col("x_cents") * F.col("y_cents")).cast("decimal(38,0)")
        ).alias("sxy"),
    )
    theta_t = stats.select(
        "n",
        "sx",
        (
            (
                F.col("n").cast("decimal(38,0)") * F.col("sxy")
                - F.col("sx") * F.col("sy")
            ).cast("double")
            / (
                F.col("n").cast("decimal(38,0)") * F.col("sxx")
                - F.col("sx") * F.col("sx")
            ).cast("double")
        ).alias("theta"),
    )
    return (
        per_user.crossJoin(F.broadcast(theta_t))
        .select(
            "user_id",
            "x_cents",
            "y_cents",
            "theta",
            (
                F.col("y_cents").cast("double") / 100
                - F.col("theta")
                * (
                    F.col("x_cents").cast("double") / 100
                    - F.col("sx").cast("double") / F.col("n") / 100
                )
            ).alias("y_adj"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov)
# ---------------------------------------------------------------------------


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    counts AS (
      SELECT prev AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL
      GROUP BY prev, event_type)
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM counts
    ORDER BY from_type, to_type
    """,
    "analytics",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the behavioral model
    behind funnel anomaly detection and session simulation.

    Scale posture: the only event-grain operation is the per-user LAG
    (one shuffle at user grain, same partitioning as sessionization —
    at 100 TB this rides an already user-bucketed layout for free);
    the transition counts partial-aggregate map-side, and the
    normalizing window runs over the |types|^2-row matrix, not the
    corpus.  The probability is a single IEEE division of two exact
    integers.
    """
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev"),
    )
    counts = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("from_type"))
        ).alias("p"),
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# DAU / trailing-7-day WAU / stickiness
# ---------------------------------------------------------------------------


@register(
    "dau_wau_stickiness",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
            FROM du GROUP BY day),
    contrib AS (
      SELECT day + CAST(i AS INTEGER) AS tday, user_id
      FROM du, (SELECT unnest(generate_series(0, 6)) AS i)),
    wau AS (SELECT tday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM contrib GROUP BY tday)
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau AS dau,
           w.wau AS wau,
           CAST(d.dau AS DOUBLE) / w.wau AS stickiness
    FROM dau d JOIN wau w ON w.tday = d.day
    ORDER BY day
    """,
    "analytics",
    "agg",
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness: daily active users, TRAILING-7-day weekly
    active users, and DAU/WAU per day — the standard product-health
    ratio.  WAU is an EXACT sliding distinct count, which no windowed
    SUM can produce (users active on several days must count once).

    The exact-sliding-distinct trick: dedup to (day, user) grain first,
    then each active day CONTRIBUTES the user to the 7 target days it
    falls within (a bounded 7x explode of the day-grain table — NOT of
    raw events), and a plain COUNT(DISTINCT) per target day finishes.
    At 100 TB the (day, user) dedup is the only event-grain pass;
    everything after runs on |days| x |users| rows at most.  (The
    approximate alternative at extreme cardinality is the HLL-sketch
    rollup, `sketch_hll_rollup_merge`.)

    Stickiness is one IEEE division of two exact counts.
    """
    du = (
        load(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
        "user_id",
    ).select(F.date_add("day", F.col("i")).alias("tday"), "user_id")
    wau = contrib.groupBy("tday").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, dau["day"] == wau["tday"])
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Exact percentile bands per group (P50 / P95 / P99)
# ---------------------------------------------------------------------------


@register(
    "latency_percentile_bands",
    """
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    h AS (SELECT event_type, cents, COUNT(*) AS cnt
          FROM c GROUP BY event_type, cents),
    cum AS (
      SELECT event_type, cents,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumn,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM h)
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           MIN(CASE WHEN cumn >= (50 * n + 99) // 100 THEN cents END)
             AS p50_cents,
           MIN(CASE WHEN cumn >= (95 * n + 99) // 100 THEN cents END)
             AS p95_cents,
           MIN(CASE WHEN cumn >= (99 * n + 99) // 100 THEN cents END)
             AS p99_cents
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
    "analytics",
    "agg",
)
def latency_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring percentile bands: EXACT P50/P95/P99 per group as
    order statistics — the SLO dashboard numbers — without sorting raw
    rows: the winsorize/quantile-prune histogram-rank decomposition
    (values quantize to a bounded integer domain; the cumulative
    window runs over the per-group HISTOGRAM, value-domain-bounded,
    not the corpus).  Rank thresholds are ceil(p*n/100) in pure
    integer arithmetic.

    Scale posture: one map-side-combined histogram aggregate over the
    corpus, then windows over <= |group| x |domain| rows.  Exact
    percentiles at 100 TB are normally "impossible" because of the
    sort; bounded-domain metrics (cents, micros, ms) make them a
    two-aggregate plan.  Unbounded-domain metrics fall back to
    `approx_percentile_prices`' sketch.
    """
    c = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    h = c.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select(
        "event_type",
        "cents",
        F.sum("cnt").over(w_cum).alias("cumn"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )

    def pct(p: int):
        return F.min(
            F.when(
                F.col("cumn") >= F.expr(f"({p} * n + 99) div 100"),
                F.col("cents"),
            )
        ).alias(f"p{p}_cents")

    return (
        cum.groupBy("event_type")
        .agg(F.max("n").cast("long").alias("n"), pct(50), pct(95), pct(99))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# OHLC hourly bars
# ---------------------------------------------------------------------------


@register(
    "ohlc_hourly_bars",
    """
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    rn AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, hour
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY event_type, hour
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM c)
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(MAX(CASE WHEN rn_open = 1 THEN cents END) AS BIGINT)
             AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT)
             AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM rn
    GROUP BY event_type, hour
    ORDER BY event_type, hour
    """,
    "analytics",
    "agg",
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation (the time-series downsampling shape):
    per (event_type, hour) — opening value (first by event time),
    high, low, closing value (last by event time), tick count.

    open/close use ``min_by`` / ``max_by`` with a composite
    (ts, event_id) ordering struct — ONE map-side-combinable aggregate
    carries first-and-last semantics, NO per-group sort and no window
    over raw rows (the oracle deliberately uses the row_number
    formulation to cross-check the argmin/argmax semantics,
    tie-broken identically).

    Scale posture: a single hash aggregate keyed (type, hour); min_by
    partials merge associatively, so the plan is the same two-exchange
    shape as any sum — the reason bar-building at market-data scale is
    an aggregate, not a sort.
    """
    c = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
            F.struct("ts", "event_id").alias("ord"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    return (
        c.groupBy("event_type", "hour")
        .agg(
            F.min_by("cents", "ord").alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", "ord").alias("close_cents"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "n_ticks",
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# Top-N + "other" share-of-total rollup
# ---------------------------------------------------------------------------

_TOPN_SOURCES = 5


@register(
    "topn_other_rollup",
    f"""
    WITH per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY n_docs DESC, source) AS rk
      FROM per_src),
    bucketed AS (
      SELECT CASE WHEN rk <= {_TOPN_SOURCES} THEN source
                  ELSE 'other' END AS source,
             CASE WHEN rk <= {_TOPN_SOURCES} THEN rk
                  ELSE {_TOPN_SOURCES + 1} END AS ord,
             n_docs, n_chars
      FROM ranked)
    SELECT source, CAST(MIN(ord) AS INT) AS ord,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_docs) AS DOUBLE)
             / SUM(SUM(n_docs)) OVER () AS share
    FROM bucketed
    GROUP BY source
    ORDER BY ord
    """,
    "analytics",
    "agg",
)
def topn_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI staple: top-{_TOPN_SOURCES} sources by document count,
    the long tail collapsed into one 'other' row, each with its share
    of total — the chart-ready contribution rollup.

    Scale posture: the corpus collapses to |sources| rows in ONE
    map-side-combined aggregate; ranking, bucketing, and the
    share-of-total window all run over that aggregate (the unbounded
    window is over <= {_TOPN_SOURCES + 1} final rows, not the corpus).
    """
    per_src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("n_docs").desc(), "source")
    )
    bucketed = per_src.withColumn("rk", rk).select(
        F.when(F.col("rk") <= _TOPN_SOURCES, F.col("source"))
        .otherwise(F.lit("other"))
        .alias("source"),
        F.when(F.col("rk") <= _TOPN_SOURCES, F.col("rk"))
        .otherwise(F.lit(_TOPN_SOURCES + 1))
        .alias("ord"),
        "n_docs",
        "n_chars",
    )
    agg = bucketed.groupBy("source").agg(
        F.min("ord").cast("int").alias("ord"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    return agg.select(
        "source",
        "ord",
        "n_docs",
        "n_chars",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(Window.partitionBy())
        ).alias("share"),
    ).orderBy("ord")


# ---------------------------------------------------------------------------
# Exact-moment correlation (df.stat surface, deterministically)
# ---------------------------------------------------------------------------


@register(
    "corr_value_props_by_type",
    """
    WITH obs AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS v_cents,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE value IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v_cents) AS HUGEINT) AS sx,
             CAST(SUM(k) AS HUGEINT) AS sy,
             SUM(CAST(v_cents * v_cents AS HUGEINT)) AS sxx,
             SUM(CAST(k * k AS HUGEINT)) AS syy,
             SUM(CAST(v_cents * k AS HUGEINT)) AS sxy
      FROM obs GROUP BY event_type)
    SELECT event_type, n,
           CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
             / nullif(
                 sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)),
                 0.0)
             AS pearson_r
    FROM m ORDER BY event_type
    """,
    "analytics",
    "agg",
)
def corr_value_props_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation (the `df.stat.corr` surface) made
    hash-exact: all five moments accumulate in 128-bit-capable integers
    (Spark DECIMAL(38,0) over integer cents, DuckDB HUGEINT), then r is
    ONE IEEE expression — a division of a difference by a product of
    two correctly-rounded sqrts — evaluated identically by both
    engines.  Spark's built-in `corr()` is a streaming-float aggregate
    whose result depends on partition merge order; this formulation is
    order-independent by construction.

    Scale posture: one map-side-combinable aggregate at group grain —
    moments are 6 numbers per group, no second pass, no window.

    Range ceiling: the cross terms (n*sxy, sx*sx, ...) multiply two
    DECIMAL(38,0) values, which Spark caps at precision 38 — exactness
    holds while every product stays below ~1e38 (comfortable for
    |x|,|y| <= ~1e9 cents over <= ~1e10 rows/group; DuckDB HUGEINT has
    the same ~1.7e38 ceiling).  Beyond that, compute the numerators
    from centered decimal means instead of raw cross-moments.
    """
    v_cents = F.floor(F.col("value") * 100).cast("long")
    k = F.get_json_object("props", "$.k").cast("long")
    d38 = "decimal(38,0)"
    m = (
        load(spark, sf_dir, "events")
        # Drop incomplete pairs on BOTH axes — df.stat.corr semantics
        # (a row missing '$.k' must not inflate n).
        .filter(
            F.col("value").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
        )
        .select("event_type", v_cents.alias("x"), k.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Cast BEFORE summing: the accumulator itself must be
            # 128-bit-capable (a BIGINT sum would overflow exactly
            # where the docstring promises it can't — and DuckDB's
            # SUM(BIGINT) accumulates in HUGEINT).
            F.sum(F.col("x").cast(d38)).alias("sx"),
            F.sum(F.col("y").cast(d38)).alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
            F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        )
    )
    nd = F.col("n").cast(d38)
    return m.select(
        "event_type",
        "n",
        (
            (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            # nullif guards the zero-variance group (single row, or a
            # constant x/y): ANSI Spark would throw DIVIDE_BY_ZERO on
            # the exact-zero denominator while DuckDB yields NULL —
            # NULL on both engines is the df.stat.corr NaN analogue.
            / F.nullif(
                F.sqrt((nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                * F.sqrt((nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
                F.lit(0.0),
            )
        ).alias("pearson_r"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Chi-square independence contingency (df.stat.crosstab surface)
# ---------------------------------------------------------------------------


@register(
    "chisq_type_bucket_cells",
    """
    WITH obs AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) // 25
               AS bucket,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
      GROUP BY 1, 2),
    tot AS (
      SELECT event_type AS et, CAST(SUM(o) AS BIGINT) AS row_n FROM obs
      GROUP BY 1),
    cot AS (
      SELECT bucket AS bk, CAST(SUM(o) AS BIGINT) AS col_n FROM obs
      GROUP BY 1),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS grand FROM obs)
    SELECT obs.event_type, obs.bucket, obs.o,
           t.row_n, c.col_n,
           CAST(t.row_n AS DOUBLE) * c.col_n / n.grand AS expected,
           (obs.o - CAST(t.row_n AS DOUBLE) * c.col_n / n.grand)
             * (obs.o - CAST(t.row_n AS DOUBLE) * c.col_n / n.grand)
             / (CAST(t.row_n AS DOUBLE) * c.col_n / n.grand)
             AS chi2_cell
    FROM obs JOIN tot t ON obs.event_type = t.et
    JOIN cot c ON obs.bucket = c.bk
    CROSS JOIN n
    ORDER BY obs.event_type, obs.bucket
    """,
    "analytics",
    "agg",
)
def chisq_type_bucket_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence contingency over event_type x props-k
    quartile bucket (the `df.stat.crosstab` surface plus the test
    statistic): observed counts are exact integers; each cell's
    expected value and chi2 contribution is ONE fixed IEEE expression
    over those integers, emitted PER CELL rather than summed — a
    cross-cell float total would depend on aggregation order, the one
    thing two engines never promise to share.  Callers fold the
    contributions at whatever tolerance they need.

    Scale posture: the contingency aggregate is map-side combinable at
    (type, bucket) grain; row/column margins re-aggregate the CELL
    table (|types| x |buckets| rows), never the raw stream, and join
    back broadcast — the events table is scanned once.
    """
    # Rows without '$.k' are excluded OUTRIGHT (not routed to a NULL
    # bucket): the inner margin joins below compare bucket by plain
    # equality, so a NULL cell would be counted into row_n yet dropped
    # from the output — margins would stop reconciling.
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.get_json_object("props", "$.k").isNotNull())
        .select(
            "event_type",
            # Integer `div`, not float `/` + cast: the float round-trip
            # diverges from DuckDB's integer `//` for |k| above 2^53.
            F.expr(
                "CAST(get_json_object(props, '$.k') AS BIGINT) div 25"
            ).alias("bucket"),
        )
    )
    obs = ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("o")
    )
    tot = obs.groupBy(F.col("event_type").alias("et")).agg(
        F.sum("o").alias("row_n")
    )
    cot = obs.groupBy(F.col("bucket").alias("bk")).agg(
        F.sum("o").alias("col_n")
    )
    n = obs.agg(F.sum("o").alias("grand"))
    expected = (
        F.col("row_n").cast("double") * F.col("col_n") / F.col("grand")
    )
    return (
        obs.join(F.broadcast(tot), obs.event_type == tot.et)
        .join(F.broadcast(cot), obs.bucket == cot.bk)
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "bucket",
            "o",
            "row_n",
            "col_n",
            expected.alias("expected"),
            (
                (F.col("o") - expected) * (F.col("o") - expected) / expected
            ).alias("chi2_cell"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# Two-sample Welch z-test (experiment readout from exact moments)
# ---------------------------------------------------------------------------


@register(
    "ab_test_welch",
    """
    WITH assigned AS (
      SELECT user_id % 2 AS arm,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    m AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS s1,
             SUM(CAST(cents * cents AS HUGEINT)) AS s2
      FROM assigned GROUP BY arm),
    w AS (
      SELECT arm, n,
             CAST(s1 AS DOUBLE) / n AS mean_cents,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
               AS var_cents
      FROM m)
    SELECT t.n AS n_treat, c.n AS n_ctrl,
           t.mean_cents AS mean_treat, c.mean_cents AS mean_ctrl,
           t.mean_cents - c.mean_cents AS lift_cents,
           (t.mean_cents - c.mean_cents)
             / sqrt(t.var_cents / t.n + c.var_cents / c.n) AS z_welch
    FROM (SELECT * FROM w WHERE arm = 1) t
    CROSS JOIN (SELECT * FROM w WHERE arm = 0) c
    """,
    "analytics",
    "agg",
)
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample experiment readout: Welch z-statistic for the
    treatment/control mean difference (assignment: user_id parity —
    the deterministic hash-split every experimentation platform uses),
    completing the experimentation pair with cuped_adjusted_metric.

    Determinism contract (same as the corr/CUPED family): counts and
    sums accumulate exactly (integer cents, 128-bit accumulators);
    mean, variance (the one-pass E[x^2] - E[x]^2 form computed from
    exact sums, so no catastrophic cancellation noise differs between
    engines), and z are ONE IEEE expression tree mirrored on both
    sides.

    Scale posture: one map-side-combinable aggregate to 2 rows, then a
    2-row cross join — the whole readout moves 8 numbers.

    Range ceiling: "exact" holds while cents*cents fits BIGINT before
    its cast into the DECIMAL(38,0) accumulator (|cents| <= ~3e9) and
    the accumulated sums stay below ~1e38 — the same documented ceiling
    as corr_value_props_by_type; past it, center first.
    """
    cents = F.floor(F.col("value") * 100).cast("long")
    d38 = "decimal(38,0)"
    m = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select((F.col("user_id") % 2).alias("arm"), cents.alias("cents"))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast(d38)).alias("s1"),
            F.sum((F.col("cents") * F.col("cents")).cast(d38)).alias("s2"),
        )
    )
    w = m.select(
        "arm",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("mean_cents"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var_cents"),
    )
    t = w.filter(F.col("arm") == 1).alias("t")
    c = w.filter(F.col("arm") == 0).alias("c")
    return t.crossJoin(F.broadcast(c)).select(
        F.col("t.n").alias("n_treat"),
        F.col("c.n").alias("n_ctrl"),
        F.col("t.mean_cents").alias("mean_treat"),
        F.col("c.mean_cents").alias("mean_ctrl"),
        (F.col("t.mean_cents") - F.col("c.mean_cents")).alias("lift_cents"),
        (
            (F.col("t.mean_cents") - F.col("c.mean_cents"))
            / F.sqrt(
                F.col("t.var_cents") / F.col("t.n")
                + F.col("c.var_cents") / F.col("c.n")
            )
        ).alias("z_welch"),
    )


# ---------------------------------------------------------------------------
# Gini concentration of the source mix
# ---------------------------------------------------------------------------


@register(
    "gini_source_concentration",
    """
    WITH per_src AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      FROM documents GROUP BY source),
    ranked AS (
      SELECT toks,
             CAST(ROW_NUMBER() OVER (ORDER BY toks, source) AS BIGINT) AS i
      FROM per_src)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(toks) AS BIGINT) AS total_tokens,
           CAST(2 * SUM(i * toks) - (COUNT(*) + 1) * SUM(toks) AS BIGINT)
             AS gini_num,
           CAST(COUNT(*) * SUM(toks) AS BIGINT) AS gini_den,
           CAST(2 * SUM(i * toks) - (COUNT(*) + 1) * SUM(toks) AS DOUBLE)
             / (COUNT(*) * SUM(toks)) AS gini
    FROM ranked
    """,
    "analytics",
    "agg",
)
def gini_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the token mass across sources — the one
    number that says whether a training mix is balanced (0) or
    dominated by a few sources (→1), computed by the exact rank
    formula G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) over the
    ascending-sorted per-source totals.

    Exactness: numerator and denominator are emitted as BIGINTs (rank
    and token sums are integers; ties in the sort are broken by source
    name so the ranking is deterministic); `gini` itself is ONE IEEE
    division both engines evaluate identically.

    Scale posture: the corpus collapses to |sources| rows in one
    map-side-combined aggregate; the rank window runs over that
    aggregate only (bounded by the source vocabulary — allow-listed in
    the plan audit with the other bounded windows).
    """
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("toks")
    )
    ranked = per_src.select(
        "toks",
        F.row_number()
        .over(Window.orderBy("toks", "source"))
        .cast("long")
        .alias("i"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("toks").alias("total_tokens"),
        F.sum(F.col("i") * F.col("toks")).alias("s_iw"),
    )
    num = 2 * F.col("s_iw") - (F.col("n_sources") + 1) * F.col("total_tokens")
    den = F.col("n_sources") * F.col("total_tokens")
    return agg.select(
        "n_sources",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        num.cast("long").alias("gini_num"),
        den.cast("long").alias("gini_den"),
        (num.cast("double") / den).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Fano-factor burstiness of event arrivals
# ---------------------------------------------------------------------------


@register(
    "fano_event_burstiness",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM hourly GROUP BY 1)
    SELECT event_type, n_hours, sx, sxx,
           (CAST(n_hours * sxx - sx * sx AS DOUBLE)
              / nullif(n_hours * (n_hours - 1), 0))
             / nullif(CAST(sx AS DOUBLE) / n_hours, 0.0) AS fano
    FROM m ORDER BY event_type
    """,
    "analytics",
    "agg",
)
def fano_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of hourly arrival counts
    per event type — the burstiness diagnostic: ~1 for Poisson traffic,
    >1 for bursty arrivals (the regime where per-key rate limits and
    autoscaling margins are set), <1 for regularized flows.

    Exactness contract (same family as ab_test_welch): the moments
    n, Σx, Σx² are exact BIGINTs over integer counts; variance and the
    ratio are ONE mirrored IEEE expression tree with nullif-guarded
    denominators.  Count magnitudes keep x² well inside BIGINT.

    Scale posture: one map-side-combinable aggregate to the hour
    grain, a second to the type grain — no window, no join.
    """
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("x"))
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    var = (
        F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double") / F.nullif(
        F.col("n_hours") * (F.col("n_hours") - 1), F.lit(0)
    )
    mean = F.col("sx").cast("double") / F.col("n_hours")
    return m.select(
        "event_type",
        "n_hours",
        "sx",
        "sxx",
        (var / F.nullif(mean, F.lit(0.0))).alias("fano"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve over user churn
# ---------------------------------------------------------------------------

# A user is an EVENT (churned) if inactive for >= this many days at the
# observation end; otherwise they are right-censored at the window end.
_KM_CHURN_DAYS = 7


@register(
    "survival_kaplan_meier",
    f"""
    WITH RECURSIVE bounds AS (
      SELECT date_trunc('day', MAX(ts)) AS max_day FROM events
      WHERE event_type = 'purchase'),
    per_user AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS first_day,
             date_trunc('day', MAX(ts)) AS last_day
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    durs AS (
      SELECT CASE WHEN date_diff('day', last_day, max_day)
                       >= {_KM_CHURN_DAYS}
                  THEN date_diff('day', first_day, last_day)
                  ELSE date_diff('day', first_day, max_day) END AS dur,
             CASE WHEN date_diff('day', last_day, max_day)
                       >= {_KM_CHURN_DAYS}
                  THEN 1 ELSE 0 END AS churned
      FROM per_user CROSS JOIN bounds),
    grain AS (
      SELECT CAST(dur AS INT) AS dur,
             CAST(SUM(churned) AS BIGINT) AS d,
             CAST(SUM(1 - churned) AS BIGINT) AS c
      FROM durs GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM durs),
    numbered AS (
      SELECT dur, d, c,
             CAST(n_users - COALESCE(SUM(d + c) OVER (ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS n,
             CAST(ROW_NUMBER() OVER (ORDER BY dur) AS BIGINT) AS rn
      FROM grain CROSS JOIN tot),
    rec AS (
      SELECT rn, dur, d, c, n, CAST(n - d AS DOUBLE) / n AS surv
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT x.rn, x.dur, x.d, x.c, x.n,
             r.surv * (CAST(x.n - x.d AS DOUBLE) / x.n)
      FROM rec r JOIN numbered x ON x.rn = r.rn + 1)
    SELECT dur, d AS n_events, c AS n_censored, n AS n_at_risk,
           surv AS survival
    FROM rec ORDER BY dur
    """,
    "analytics",
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over user lifetimes: a user
    churns (event) after 7 idle days at the observation end, or is
    right-censored at the window boundary; the curve is the product-
    limit S(t) = prod(1 - d_u/n_u) over event times up to t — the
    censoring-aware retention readout that the plain retention-cohort
    table cannot give (censored users neither count as churned nor
    silently vanish: they leave the risk set at their censor time).

    Determinism (the EWMA/Holt discipline applied to a product):
    d/c/n are exact integers; each step multiplies by ONE mirrored
    IEEE expression ((n-d)/n) in the same duration order on both
    engines, so the running product hash-matches DuckDB's recursive-
    CTE replay bit for bit.

    Scale posture: user grain collapses in one aggregate; everything
    after (risk-set cumulative window, the JVM product fold) runs on
    the DURATION grain — bounded by the observation window in days,
    not by users (allow-listed bounded window).
    """
    # Purchase-activity lifetimes: the sparser high-value signal (all-
    # event lifetimes span the whole fixture window and give a flat
    # curve; time-from-first-to-last-PURCHASE is the business question
    # a survival curve usually answers).
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day"),
        F.date_trunc("day", F.max("ts")).alias("last_day"),
    )
    bounds = ev.agg(F.date_trunc("day", F.max("ts")).alias("max_day"))
    idle = F.datediff(F.col("max_day"), F.col("last_day"))
    churned = (idle >= _KM_CHURN_DAYS).cast("int")
    durs = per_user.crossJoin(F.broadcast(bounds)).select(
        F.when(
            idle >= _KM_CHURN_DAYS,
            F.datediff(F.col("last_day"), F.col("first_day")),
        )
        .otherwise(F.datediff(F.col("max_day"), F.col("first_day")))
        .alias("dur"),
        churned.alias("churned"),
    )
    grain = durs.groupBy(F.col("dur").cast("int").alias("dur")).agg(
        F.sum("churned").cast("long").alias("d"),
        F.sum(1 - F.col("churned")).cast("long").alias("c"),
    )
    tot = durs.agg(F.count(F.lit(1)).alias("n_users"))
    prior = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    numbered = (
        grain.crossJoin(F.broadcast(tot))
        .withColumn(
            "n",
            (
                F.col("n_users")
                - F.coalesce(
                    F.sum(F.col("d") + F.col("c")).over(prior), F.lit(0)
                )
            ).cast("long"),
        )
        .select("dur", "d", "c", "n")
    )
    # JVM product fold over the duration-grain series (bounded rows).
    series = numbered.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("dur", "d", "c", "n"))
        ).alias("xs")
    )
    elem_t = (
        "array<struct<dur:int,d:bigint,c:bigint,n:bigint,surv:double>>"
    )
    init = F.struct(
        F.lit(1.0).alias("s"),
        F.expr(f"CAST(array() AS {elem_t})").alias("out"),
    )

    def step(acc, x):
        s2 = acc["s"] * (
            (x["n"] - x["d"]).cast("double") / x["n"]
        )
        row = F.struct(
            x["dur"].alias("dur"),
            x["d"].alias("d"),
            x["c"].alias("c"),
            x["n"].alias("n"),
            s2.alias("surv"),
        )
        return F.struct(
            s2.alias("s"),
            F.concat(acc["out"], F.array(row)).alias("out"),
        )

    folded = series.select(
        F.explode(F.aggregate("xs", init, step)["out"]).alias("r")
    )
    return folded.select(
        F.col("r.dur").alias("dur"),
        F.col("r.d").alias("n_events"),
        F.col("r.c").alias("n_censored"),
        F.col("r.n").alias("n_at_risk"),
        F.col("r.surv").alias("survival"),
    ).orderBy("dur")


# ---------------------------------------------------------------------------
# Funnel time-to-convert quantiles (exact, per first-view cohort)
# ---------------------------------------------------------------------------


@register(
    "funnel_time_to_convert",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS vts FROM events
      WHERE event_type = 'view' GROUP BY 1),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS pts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.vts GROUP BY 1),
    lat AS (
      SELECT v.user_id, date_trunc('day', v.vts) AS cohort_day,
             epoch_us(p.pts) - epoch_us(v.vts) AS lat_us
      FROM v JOIN p ON v.user_id = p.user_id),
    ranked AS (
      SELECT cohort_day, lat_us,
             ROW_NUMBER() OVER (PARTITION BY cohort_day
                                ORDER BY lat_us, user_id) AS rn,
             COUNT(*) OVER (PARTITION BY cohort_day) AS n
      FROM lat)
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN lat_us END)
                AS BIGINT) AS median_lat_us,
           CAST(MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
                         THEN lat_us END) AS BIGINT) AS p90_lat_us
    FROM ranked GROUP BY cohort_day ORDER BY cohort_day
    """,
    "analytics",
    "quantile",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for each first-view cohort day,
    the EXACT median and P90 of first-view -> first-subsequent-purchase
    latency — the funnel's "how fast", complementing funnel_conversion's
    "how many".  Latencies are integer microseconds (unix_micros /
    epoch_us — no float timestamps), and the quantiles are exact
    order statistics by rank selection with a (lat, user_id) tie-break,
    the same discipline as quantiles_disc_orders.

    Scale posture: two user-grain aggregates + one user-keyed join
    (shared partitioning), then rank windows PARTITIONED by cohort day
    over the converted-user grain — no global window, no sort of raw
    events.
    """
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    lat = v.join(p, "user_id").select(
        "user_id",
        F.date_trunc("day", "vts").alias("cohort_day"),
        # cast: unix_micros needs TIMESTAMP; the fixture may surface
        # ntz (same normalization as kbrowse_scan's unix_millis).
        (
            F.unix_micros(F.col("pts").cast("timestamp"))
            - F.unix_micros(F.col("vts").cast("timestamp"))
        ).alias("lat_us"),
    )
    w = Window.partitionBy("cohort_day").orderBy("lat_us", "user_id")
    wn = Window.partitionBy("cohort_day")
    ranked = lat.select(
        "cohort_day",
        "lat_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day")
        )
        .agg(
            F.max("n").cast("long").alias("n_converted"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) div 2"), F.col("lat_us")
                )
            )
            .cast("long")
            .alias("median_lat_us"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.col("n") * 0.9).cast("long"),
                    F.col("lat_us"),
                )
            )
            .cast("long")
            .alias("p90_lat_us"),
        )
        .orderBy("cohort_day")
    )


# ---------------------------------------------------------------------------
# Conversion rate with Wilson confidence bounds
# ---------------------------------------------------------------------------

_WILSON_Z = 1.96


@register(
    "conversion_wilson_bounds",
    f"""
    WITH per_user AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id),
    c AS (
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM per_user GROUP BY 1)
    SELECT cohort_day, n_users, n_converted,
           CAST(n_converted AS DOUBLE) / n_users AS rate,
           (CAST(n_converted AS DOUBLE) / n_users
              + z * z / (2 * n_users)
              - z * sqrt(
                  (CAST(n_converted AS DOUBLE) / n_users)
                    * (1 - CAST(n_converted AS DOUBLE) / n_users) / n_users
                  + z * z / (4 * CAST(n_users AS DOUBLE) * n_users)))
             / (1 + z * z / n_users) AS wilson_lo,
           (CAST(n_converted AS DOUBLE) / n_users
              + z * z / (2 * n_users)
              + z * sqrt(
                  (CAST(n_converted AS DOUBLE) / n_users)
                    * (1 - CAST(n_converted AS DOUBLE) / n_users) / n_users
                  + z * z / (4 * CAST(n_users AS DOUBLE) * n_users)))
             / (1 + z * z / n_users) AS wilson_hi
    -- z as a DOUBLE column, not a bare literal: DuckDB would otherwise
    -- read 1.96 as DECIMAL and compute z*z exactly (3.8416) where
    -- Spark's double product is 3.8415999999999997 — bit-different
    -- bounds on small cohorts (review-confirmed on n=7, k=2).
    FROM c CROSS JOIN (SELECT CAST({_WILSON_Z} AS DOUBLE) AS z)
    ORDER BY cohort_day
    """,
    "analytics",
    "agg",
)
def conversion_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cohort conversion rate with the Wilson score interval — the
    small-sample-correct uncertainty band a dashboard should draw
    around every rate (the naive normal interval misbehaves near 0/1
    and tiny n; Wilson is the standard fix).

    Determinism: the interval is a single mirrored IEEE expression
    tree over two exact integers (n, k) using only +,-,*,/ and sqrt —
    every one of which is correctly rounded under IEEE-754 — so both
    engines produce bit-identical bounds (the same reasoning that makes
    tau=0.5 temperature weights exact in mix_temperature_quota).

    Scale posture: one user-grain aggregate, one cohort-grain
    aggregate; no window, no join.
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    c = per_user.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    z = F.lit(_WILSON_Z)
    n = F.col("n_users")
    rate = F.col("n_converted").cast("double") / n
    center = rate + z * z / (2 * n)
    margin = z * F.sqrt(
        rate * (1 - rate) / n + z * z / (4 * n.cast("double") * n)
    )
    denom = 1 + z * z / n
    return c.select(
        "cohort_day",
        "n_users",
        "n_converted",
        rate.alias("rate"),
        ((center - margin) / denom).alias("wilson_lo"),
        ((center + margin) / denom).alias("wilson_hi"),
    ).orderBy("cohort_day")


# ---------------------------------------------------------------------------
# Pareto cumulative-share table of the source mix
# ---------------------------------------------------------------------------


@register(
    "pareto_source_share",
    """
    WITH per_src AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
      FROM documents GROUP BY source),
    ranked AS (
      SELECT source, toks,
             CAST(ROW_NUMBER() OVER (ORDER BY toks DESC, source) AS BIGINT)
               AS rk,
             CAST(SUM(toks) OVER (ORDER BY toks DESC, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_toks,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_src,
             CAST(SUM(toks) OVER () AS BIGINT) AS tot
      FROM per_src)
    SELECT source, rk, toks, cum_toks,
           CAST(cum_toks AS DOUBLE) / tot AS cum_share,
           CAST(rk AS DOUBLE) / n_src AS frac_sources
    FROM ranked
    ORDER BY rk
    """,
    "analytics",
    "agg",
)
def pareto_source_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (cumulative-share) table of the source token mix: sources
    sorted largest-first with the running share of total — the "top X%
    of sources hold Y% of tokens" readout that gini_source_concentration
    summarizes into one number; this is the curve behind it.

    Exactness: ranks and cumulative sums are exact integers over the
    per-source aggregate with a deterministic (toks DESC, source)
    tie-break; the two shares are one IEEE division each.

    Scale posture: the corpus collapses to |sources| rows in one
    map-side-combined aggregate; every window runs over that bounded
    aggregate (allow-listed with the other |sources|-bounded windows).
    """
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("toks")
    )
    w_ord = Window.orderBy(F.col("toks").desc(), "source")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = per_src.select(
        "source",
        "toks",
        F.row_number().over(w_ord).cast("long").alias("rk"),
        F.sum("toks").over(w_cum).cast("long").alias("cum_toks"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_src"),
        F.sum("toks").over(w_all).cast("long").alias("tot"),
    )
    return ranked.select(
        "source",
        "rk",
        "toks",
        "cum_toks",
        (F.col("cum_toks").cast("double") / F.col("tot")).alias("cum_share"),
        (F.col("rk").cast("double") / F.col("n_src")).alias("frac_sources"),
    ).orderBy("rk")


# ---------------------------------------------------------------------------
# Exact order statistics over an UNBOUNDED domain: bucket-select
# ---------------------------------------------------------------------------

# (label, numerator, denominator) — rank k = ceil(p * n) in integers.
_OS_TARGETS = [
    ("p25", 1, 4),
    ("p50", 1, 2),
    ("p75", 3, 4),
    ("p90", 9, 10),
    ("p99", 99, 100),
]
_OS_BUCKET = 64  # bucket width in whole currency units


@register(
    "order_stat_bucket_select",
    f"""
    WITH v AS (SELECT l_extendedprice AS v FROM lineitem),
    n AS (SELECT COUNT(*) AS n FROM v),
    t(pct_label, num, den) AS (VALUES {", ".join(f"('{lbl}', {nu}, {de})" for lbl, nu, de in _OS_TARGETS)}),
    k AS (SELECT pct_label,
                 CAST((num * n.n + den - 1) // den AS BIGINT) AS target_rank
          FROM t CROSS JOIN n),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM v)
    SELECT k.pct_label, k.target_rank, r.v AS value
    FROM k JOIN r ON r.rn = k.target_rank
    ORDER BY k.target_rank
    """,
    "analytics",
    "order_stat",
)
def order_stat_bucket_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT k-th order statistics (p25/p50/p75/p90/p99 of
    l_extendedprice) over an UNBOUNDED value domain, with no global
    sort and no unit-grain histogram — the two-pass bucket-narrowing
    selection:

    * **Pass 1**: one map-side-combined histogram aggregate over
      COARSE buckets (``floor(v) div {_OS_BUCKET}``); the cumulative
      window runs over the BUCKET table, whose cardinality is bounded
      by the value RANGE / width (~1.6k for TPC-H prices) — a bound
      set by the domain, not the corpus, so it holds unchanged at
      100 TB.
    * **Select**: each target rank ``k = ceil(p*n)`` (pure integer
      arithmetic) lands in the unique bucket with
      ``cum - cnt < k <= cum``; the 5-row target dimension broadcasts
      into that theta join.
    * **Pass 2**: re-scan ONLY the selected buckets (a semi-join
      pushdown-able predicate; ~3/1600 of the data), rank within each
      bucket, and read the exact raw DOUBLE at offset
      ``k - cum_before``.  No quantization: the value returned is the
      actual stored element, bit-identical in both engines because it
      is SELECTED, never computed.

    This is the complement to ``latency_percentile_bands`` (exact
    percentiles via a unit-grain histogram, which needs a BOUNDED
    integer domain): bucket-select needs only a bounded RANGE, so it
    covers doubles/ids at full precision.  Duplicate values make any
    in-bucket order arbitrary, but every index of a run of duplicates
    reads the same value, so the output is deterministic.

    Scale posture: two corpus scans (both combinable aggregates /
    pushdown-filtered), windows only over bucket-grain or selected-
    bucket rows, 5-row broadcast dimensions.  The classic alternative
    — global sort + row_number — is exactly the shuffle this plan
    exists to avoid (the oracle does it; oracles are allowed).
    Reference has no numeric analytics (SURVEY §2c extension).
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    b = li.withColumn(
        "bucket", F.expr(f"CAST(floor(v) AS BIGINT) div {_OS_BUCKET}")
    )
    h = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = h.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(w_cum).cast("long").alias("cum"),
        F.sum("cnt")
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    targets = spark.createDataFrame(
        _OS_TARGETS, ["pct_label", "num", "den"]
    )
    sel = (
        cum.join(
            F.broadcast(targets),
            (
                F.expr("(num * n + den - 1) div den") > F.col("cum") - F.col("cnt")
            )
            & (F.expr("(num * n + den - 1) div den") <= F.col("cum")),
        )
        .select(
            "pct_label",
            F.expr("(num * n + den - 1) div den").cast("long").alias(
                "target_rank"
            ),
            "bucket",
            (
                F.expr("(num * n + den - 1) div den")
                - (F.col("cum") - F.col("cnt"))
            ).alias("offset"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("v")
    ranked = (
        b.join(
            F.broadcast(sel.select("bucket").distinct()), "bucket", "semi"
        )
        .withColumn("rn", F.row_number().over(w_in))
    )
    return (
        ranked.join(
            F.broadcast(sel),
            (ranked.bucket == sel.bucket) & (F.col("rn") == F.col("offset")),
        )
        .select("pct_label", "target_rank", F.col("v").alias("value"))
        .orderBy("target_rank")
    )


# ---------------------------------------------------------------------------
# Distributed linear regression via normal equations (exact Cramer solve)
# ---------------------------------------------------------------------------


def _det3(m: list[list[str]]) -> str:
    """3x3 determinant as an explicit SQL expression over entry
    expressions.  Generated ONCE and used verbatim by BOTH engines, so
    the IEEE multiply/subtract sequence is identical and the result
    bit-identical (the entries are exact-integer-valued; the products
    may exceed 2^53, where only identical op ORDER keeps engines in
    agreement)."""
    (a, b, c), (d, e, f), (g, h, i) = m
    D = "CAST({} AS DOUBLE)".format
    return (
        f"{D(a)} * ({D(e)} * {D(i)} - {D(f)} * {D(h)})"
        f" - {D(b)} * ({D(d)} * {D(i)} - {D(f)} * {D(g)})"
        f" + {D(c)} * ({D(d)} * {D(h)} - {D(e)} * {D(g)})"
    )


def _linreg_solve_exprs() -> dict[str, str]:
    """The shared readout expressions over the sufficient-statistic
    columns (n, s1, s2, s11, s12, s22, sy, s1y, s2y)."""
    M = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    rhs = ["sy", "s1y", "s2y"]
    det = _det3(M)
    betas = {}
    for j, name in enumerate(("beta_intercept", "beta_words", "beta_echars")):
        Mj = [row[:] for row in M]
        for r in range(3):
            Mj[r][j] = rhs[r]
        betas[name] = f"({_det3(Mj)}) / ({det})"
    return {"det": det, **betas}


_LINREG_FEATURES_SQL = """
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
             CAST(len(text) - len(replace(text, 'e', '')) AS BIGINT) AS x2,
             CAST(n_chars AS BIGINT) AS y
      FROM documents"""


def _linreg_oracle_sql() -> str:
    e = _linreg_solve_exprs()
    return f"""
    WITH f AS ({_LINREG_FEATURES_SQL}),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
             CAST(SUM(x1 * x1) AS BIGINT) AS s11,
             CAST(SUM(x1 * x2) AS BIGINT) AS s12,
             CAST(SUM(x2 * x2) AS BIGINT) AS s22,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x1 * y) AS BIGINT) AS s1y,
             CAST(SUM(x2 * y) AS BIGINT) AS s2y
      FROM f)
    SELECT n AS n_docs, {e["det"]} AS det,
           {e["beta_intercept"]} AS beta_intercept,
           {e["beta_words"]} AS beta_words,
           {e["beta_echars"]} AS beta_echars
    FROM s
    """


@register(
    "linreg_normal_cramer",
    _linreg_oracle_sql(),
    "ml",
    "agg",
)
def linreg_normal_cramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary least squares (y = n_chars on [1, word count, 'e'
    count]) fitted by NORMAL EQUATIONS with an exact 3x3 Cramer
    solve — distributed linear regression as ONE aggregate:

    * The whole corpus collapses to the 9-number sufficient statistic
      (X'X upper triangle + X'y) in a single map-side-combined
      aggregate of exact int64 sums — the only thing that crosses the
      wire.  At 100 TB that is the entire data-touching cost; model
      size is O(d^2), independent of rows.
    * The solve is in-plan O(1) arithmetic on that 1-row aggregate
      (four 3x3 determinants + three divisions) — no driver linalg, no
      collect.  Cross-engine determinism: the determinant expansion is
      GENERATED ONCE (`_det3`) and compiled by both engines from the
      same text, so the IEEE op sequence — and hence every bit of the
      result — is identical even where products exceed 2^53.

    For d beyond ~4, swap Cramer for a driver-side Cholesky on the
    collected d^2-number statistic (the kmeans_lloyd driver-footprint
    rule: O(model), never O(rows)).

    Reference has no ML operators (SURVEY §2c extension).
    """
    d = load(spark, sf_dir, "documents")
    f = d.select(
        F.size(F.split("text", " ")).cast("long").alias("x1"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "e", ""))
        )
        .cast("long")
        .alias("x2"),
        F.col("n_chars").cast("long").alias("y"),
    )
    s = f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    e = _linreg_solve_exprs()
    return s.select(
        F.col("n").alias("n_docs"),
        F.expr(e["det"]).alias("det"),
        F.expr(e["beta_intercept"]).alias("beta_intercept"),
        F.expr(e["beta_words"]).alias("beta_words"),
        F.expr(e["beta_echars"]).alias("beta_echars"),
    )


# ---------------------------------------------------------------------------
# Frequent itemsets + association rules (A-Priori)
# ---------------------------------------------------------------------------

_AP_MINSUP_PCT = 1  # item/pair must appear in >= 1% of baskets
_AP_SCALE = 10**6
_AP_TOP = 40


@register(
    "freq_itemsets_apriori",
    f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS bid, p_brand AS item
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    nb AS (SELECT CAST(COUNT(DISTINCT bid) AS BIGINT) AS n FROM basket),
    supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s
             FROM basket GROUP BY item),
    freq AS (SELECT item, s FROM supp CROSS JOIN nb
             WHERE s * 100 >= n * {_AP_MINSUP_PCT}),
    fb AS (SELECT b.bid, b.item FROM basket b JOIN freq USING (item)),
    pair AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS s_ab
      FROM fb a JOIN fb b ON a.bid = b.bid AND a.item < b.item
      GROUP BY a.item, b.item),
    fpair AS (SELECT * FROM pair CROSS JOIN nb
              WHERE s_ab * 100 >= n * {_AP_MINSUP_PCT}),
    rules AS (
      SELECT item_a AS antecedent, item_b AS consequent, s_ab,
             fa.s AS s_ante, fc.s AS s_cons
      FROM fpair JOIN freq fa ON fpair.item_a = fa.item
                 JOIN freq fc ON fpair.item_b = fc.item
      UNION ALL
      SELECT item_b, item_a, s_ab, fc.s, fa.s
      FROM fpair JOIN freq fa ON fpair.item_a = fa.item
                 JOIN freq fc ON fpair.item_b = fc.item)
    SELECT antecedent, consequent, s_ab AS pair_support,
           s_ante AS ante_support,
           CAST({_AP_SCALE} * s_ab // s_ante AS BIGINT) AS conf_scaled,
           CAST(({_AP_SCALE} * s_ab // s_ante) * n // s_cons AS BIGINT)
             AS lift_scaled
    FROM rules CROSS JOIN nb
    ORDER BY lift_scaled DESC, antecedent, consequent
    LIMIT {_AP_TOP}
    """,
    "analytics",
    "pipeline",
)
def freq_itemsets_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining with A-Priori pruning: frequent items ->
    frequent pairs -> association rules ranked by lift.  Baskets are
    orders; items are the part brands they contain (bounded item
    vocabulary, the realistic retail shape).

    The A-Priori step is the point: items below minsup are removed
    BEFORE pair generation (downward closure — no pair of an
    infrequent item can be frequent), so the within-basket self-join
    fans out only over frequent items.  Confidence and lift are exact
    chained integer floor-divisions (conf = SCALE*s_ab DIV s_ante,
    lift = conf*N DIV s_cons — conf <= SCALE keeps the product
    int64-safe at any corpus size), bit-identical across engines.

    Scale posture: baskets are bounded (lineitems per order is a
    small constant), so the pair explode is O(b^2) per basket, linear
    overall; support tables are item-vocabulary-sized and broadcast;
    all counts are map-side-combinable aggregates.  The only
    corpus-grain shuffle is the basket groupBy on bid.  The classic
    second A-Priori trick (hash-bucket candidate pruning) is
    unnecessary while the item vocabulary stays bounded.

    Reference has no mining operators (SURVEY §2c extension).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Basket ARRAYS in ONE corpus exchange (r15, guide §2.4): the prior
    # shape recomputed the (bid, item) scan+join+distinct subtree once
    # per consumer (nb, supp, and BOTH sides of the pair self-join —
    # four corpus pipelines), and within-basket pair generation was a
    # sort-merge SELF-JOIN re-exchanging the basket table twice more.
    # groupBy(bid).collect_set(item) dedups AND groups in the same
    # single exchange; pairs explode from each basket's SORTED frequent-
    # item array in place (item_a < item_b == position order in the
    # sorted array — baskets are bounded, so the per-row fan-out is
    # O(b^2) with small b), and every downstream table is
    # item-vocabulary grain.  The r12 .cache() finding stands (AQE
    # cannot re-plan below InMemoryRelation; sf1 got 4-7x slower) —
    # this is a lazy localCheckpoint of basket-grain ARRAYS instead:
    # one materialized corpus pass, three bounded consumers (count,
    # explode-support, pair explode), no join against the checkpoint.
    barr = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("bid"), F.col("p_brand").alias("item"))
        # Spread the set-building off the single-row-group scan task
        # (guide §2.5 input skew; the analyze_table_stats pattern): the
        # partial collect_set otherwise builds every basket on the one
        # scan core (measured 1.08 -> 0.55 s); groupBy reuses this
        # exchange, so it is the plan's ONE corpus shuffle either way.
        .repartition(spark.sparkContext.defaultParallelism, F.col("bid"))
        .groupBy("bid")
        .agg(F.array_sort(F.collect_set(F.col("item"))).alias("items"))
        .select("items")
        .localCheckpoint(eager=False)
    )
    # nb / freq are 1-row / vocabulary-grain: lazily checkpoint them
    # too, so their aggregate subtrees plan ONCE however many times the
    # rule assembly references them (Catalyst otherwise copies the
    # whole chain per reference — the measured plan held 4 nb and 2
    # freq copies).
    nb = barr.agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=False)
    supp = (
        barr.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
    )
    freq = supp.crossJoin(F.broadcast(nb)).filter(
        F.col("s") * 100 >= F.col("n") * _AP_MINSUP_PCT
    ).select("item", "s").localCheckpoint(eager=False)
    # Pairs explode from the FULL sorted basket array — no frequent-
    # item prefilter needed for correctness: by downward closure a
    # pair containing an infrequent item has s_ab <= s < threshold and
    # the fpair filter drops it, so the pair set is identical to the
    # oracle's fb-self-join; the fan-out stays O(b^2) with bounded b.
    # Two chained generates (posexplode + explode over a slice) — no
    # lambda anywhere, so nothing runs interpreted per row (the HOF
    # hot-path audit's nest class stays empty).
    pair = (
        barr.select(
            F.posexplode("items").alias("i", "item_a"), F.col("items")
        )
        .select(
            "item_a",
            F.explode(
                F.expr("slice(items, i + 2, size(items) - i - 1)")
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("s_ab"))
    )
    fpair = pair.crossJoin(F.broadcast(nb)).filter(
        F.col("s_ab") * 100 >= F.col("n") * _AP_MINSUP_PCT
    ).select("item_a", "item_b", "s_ab")
    fa = freq.select(
        F.col("item").alias("item_a"), F.col("s").alias("s_fa")
    )
    fc = freq.select(
        F.col("item").alias("item_b"), F.col("s").alias("s_fc")
    )
    joined = fpair.join(F.broadcast(fa), "item_a").join(
        F.broadcast(fc), "item_b"
    )
    # Both rule directions as ONE explode instead of a union of two
    # plan branches (the union re-planned the whole fpair/freq chain
    # per branch — 2x every subtree above).
    rules = joined.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("s_ab").alias("s_ab"),
                    F.col("s_fa").alias("s_ante"),
                    F.col("s_fc").alias("s_cons"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("s_ab").alias("s_ab"),
                    F.col("s_fc").alias("s_ante"),
                    F.col("s_fa").alias("s_cons"),
                ),
            )
        ).alias("r")
    ).select("r.*").crossJoin(F.broadcast(nb))
    conf = F.expr(f"{_AP_SCALE} * s_ab DIV s_ante")
    return (
        rules.select(
            "antecedent",
            "consequent",
            F.col("s_ab").alias("pair_support"),
            F.col("s_ante").alias("ante_support"),
            conf.cast("long").alias("conf_scaled"),
            F.expr(
                f"({_AP_SCALE} * s_ab DIV s_ante) * n DIV s_cons"
            )
            .cast("long")
            .alias("lift_scaled"),
        )
        .orderBy(F.col("lift_scaled").desc(), "antecedent", "consequent")
        .limit(_AP_TOP)
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution (first / last / linear credit per channel)
# ---------------------------------------------------------------------------

_ATTR_SCALE = 10**6


@register(
    "attribution_multitouch",
    f"""
    WITH p AS (
      SELECT user_id, MIN(ts) AS pts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    j AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id
      FROM events e JOIN p USING (user_id)
      WHERE e.ts < p.pts AND e.event_type <> 'purchase'),
    w AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM j)
    SELECT event_type AS channel,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch,
           CAST(SUM(CASE WHEN rn = n THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch,
           CAST(SUM({_ATTR_SCALE} // n) AS BIGINT) AS linear_credit_scaled
    FROM w
    GROUP BY event_type
    ORDER BY event_type
    """,
    "analytics",
)
def attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: for every user who
    purchased, the pre-purchase journey's events are credited per
    channel under the three standard models side by side — first-touch
    (the acquiring channel), last-touch (the closing channel), and
    linear (1/n per touch, as an exact integer SCALE DIV n so the
    per-channel sums are bit-identical across engines; a channel's
    scaled credits sum to ~SCALE per converting user).

    Journey boundary is the user's FIRST purchase timestamp (strict
    ts < boundary, purchases excluded from touches); journey order is
    tie-broken by event_id — deterministic end to end.

    Scale posture: one user-keyed window pass over the journey slice
    (partitioned by user_id — no global window), then one channel-
    grain map-side-combinable aggregate; the purchase-boundary table
    is user-grain and joins on the same key the window partitions by,
    so at 100 TB the whole plan is a single user-hash exchange.

    Reference has no attribution operators (SURVEY §2c extension).
    """
    e = load(spark, sf_dir, "events")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    j = (
        e.join(p, "user_id")
        .filter((F.col("ts") < F.col("pts")) & (F.col("event_type") != "purchase"))
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    t = j.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        t.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("touches"),
            F.sum((F.col("rn") == 1).cast("long"))
            .cast("long")
            .alias("first_touch"),
            F.sum((F.col("rn") == F.col("n")).cast("long"))
            .cast("long")
            .alias("last_touch"),
            F.sum(F.expr(f"{_ATTR_SCALE} DIV n")).cast("long").alias(
                "linear_credit_scaled"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Frequent journey prefixes (sequence mining lite) with conversion rates
# ---------------------------------------------------------------------------

_PATH_LEN = 4
_PATH_TOP = 15


@register(
    "frequent_event_paths",
    f"""
    WITH w AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    conv AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      FROM events GROUP BY user_id),
    paths AS (
      SELECT w.user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM w WHERE rn <= {_PATH_LEN}
      GROUP BY w.user_id)
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c) AS BIGINT) AS n_converted,
           CAST(1000000 * SUM(c) // COUNT(*) AS BIGINT) AS conv_ppm
    FROM paths JOIN conv USING (user_id)
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {_PATH_TOP}
    """,
    "analytics",
)
def frequent_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-sequence mining over user journeys: the top-{top} most
    common {n}-event journey PREFIXES with each prefix's conversion
    rate — the path-analysis readout (which openings convert) that
    sits between the pairwise transition matrix
    (``event_transition_matrix``) and full sequential-pattern mining.

    The per-user prefix is assembled with a deterministic ordered
    aggregation: window rank by (ts, event_id), truncate to {n}, then
    array_sort(collect_list(struct(rn, type))) — collect_list order is
    partition-dependent, the sort key makes it canonical (the
    agg_collect_sorted rule).  Conversion is a user-grain flag joined
    on the same key the window partitions by.

    Scale posture: one user-hash exchange covers the window, the
    prefix aggregation, and the flag join; path-grain counting is
    map-side-combinable (path cardinality is bounded by
    |event_types|^{n}, a vocabulary, not the corpus).

    Reference has no sequence operators (SURVEY §2c extension).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        e.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _PATH_LEN)
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(rn, event_type))), x -> x.event_type), '>')"
            ).alias("path")
        )
    )
    conv = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("c")
    )
    return (
        paths.join(conv, "user_id")
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("c").cast("long").alias("n_converted"),
        )
        .select(
            "path",
            "n_users",
            "n_converted",
            F.expr("CAST(1000000 * n_converted DIV n_users AS BIGINT)").alias(
                "conv_ppm"
            ),
        )
        .orderBy(F.col("n_users").desc(), "path")
        .limit(_PATH_TOP)
    )


frequent_event_paths.__doc__ = frequent_event_paths.__doc__.format(
    top=_PATH_TOP, n=_PATH_LEN
)


# ---------------------------------------------------------------------------
# Ridge-regression hyperparameter sweep on SHARED sufficient statistics
# ---------------------------------------------------------------------------

_RIDGE_LAMBDAS = [0, 16, 256, 4096]


def _ridge_solve_exprs(lam: int) -> dict[str, str]:
    """Cramer readout for (X'X + lam*I) beta = X'y over the same
    9-number sufficient-statistic columns as ``_linreg_solve_exprs``
    (lam = 0 reproduces OLS exactly)."""
    M = [
        [f"(n + {lam})", "s1", "s2"],
        ["s1", f"(s11 + {lam})", "s12"],
        ["s2", "s12", f"(s22 + {lam})"],
    ]
    rhs = ["sy", "s1y", "s2y"]
    det = _det3(M)
    betas = {}
    for j, name in enumerate(("beta_intercept", "beta_words", "beta_echars")):
        Mj = [row[:] for row in M]
        for r in range(3):
            Mj[r][j] = rhs[r]
        betas[name] = f"({_det3(Mj)}) / ({det})"
    return {"det": det, **betas}


def _ridge_oracle_sql() -> str:
    arms = []
    for lam in _RIDGE_LAMBDAS:
        e = _ridge_solve_exprs(lam)
        arms.append(
            f"""SELECT CAST({lam} AS BIGINT) AS lam,
                   {e['det']} AS det,
                   {e['beta_intercept']} AS beta_intercept,
                   {e['beta_words']} AS beta_words,
                   {e['beta_echars']} AS beta_echars
            FROM s"""
        )
    return f"""
    WITH f AS ({_LINREG_FEATURES_SQL}),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
             CAST(SUM(x1 * x1) AS BIGINT) AS s11,
             CAST(SUM(x1 * x2) AS BIGINT) AS s12,
             CAST(SUM(x2 * x2) AS BIGINT) AS s22,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x1 * y) AS BIGINT) AS s1y,
             CAST(SUM(x2 * y) AS BIGINT) AS s2y
      FROM f)
    SELECT * FROM ({" UNION ALL ".join(arms)})
    ORDER BY lam
    """


@register("ridge_lambda_sweep", _ridge_oracle_sql(), "ml")
def ridge_lambda_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge-regression hyperparameter sweep where the sweep is FREE:
    the corpus collapses once into the same 9-number exact-int64
    sufficient statistic as ``linreg_normal_cramer``, then every
    lambda's (X'X + lambda*I) Cramer solve is O(1) in-plan arithmetic
    on that one row — the at-scale rule that hyperparameter search
    over models linear in sufficient statistics costs ONE data pass
    total, not one per candidate.  The lambda = 0 row reproduces the
    OLS solution bit-for-bit (pinned by an invariant test); lambda
    penalizes all three diagonal entries (intercept included — the
    plain penalized-normal-equations form, stated here because
    standardized ridge usually exempts the intercept).

    Every per-lambda determinant expansion is GENERATED ONCE
    (`_ridge_solve_exprs`) and compiled by both engines from the same
    text — identical IEEE op order even past 2^53 (the _det3 rule).

    Scale posture: one map-side-combined 9-long aggregate; the
    4-lambda readout is 4 projections of the cached 1-row statistic.

    Reference has no ML operators (SURVEY §2c extension).
    """
    d = load(spark, sf_dir, "documents")
    f = d.select(
        F.size(F.split("text", " ")).cast("long").alias("x1"),
        (F.length("text") - F.length(F.regexp_replace("text", "e", "")))
        .cast("long")
        .alias("x2"),
        F.col("n_chars").cast("long").alias("y"),
    )
    from kbrowse_spark.functions.cache_registry import cached

    # Registry-keyed (not a bare .cache()): repeat invocations reuse
    # one materialized 1-row statistic and invalidate() reclaims it
    # (ADVICE r8).
    s = cached(
        spark,
        sf_dir,
        "ridge_suffstats",
        lambda: f.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x1").cast("long").alias("s1"),
            F.sum("x2").cast("long").alias("s2"),
            F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
            F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
            F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
            F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
        ),
    )
    arms = []
    for lam in _RIDGE_LAMBDAS:
        e = _ridge_solve_exprs(lam)
        arms.append(
            s.select(
                F.lit(lam).cast("long").alias("lam"),
                F.expr(e["det"]).alias("det"),
                F.expr(e["beta_intercept"]).alias("beta_intercept"),
                F.expr(e["beta_words"]).alias("beta_words"),
                F.expr(e["beta_echars"]).alias("beta_echars"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("lam")


# ---------------------------------------------------------------------------
# Bounded sequential-pattern mining (PrefixSpan-style support counting)

_SEQ_WIN = 10   # events considered per user (prefix window)
_SEQ_TOP = 20   # patterns reported


@register(
    "seq_pattern_triples",
    f"""
    WITH w AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    t AS (SELECT * FROM w WHERE rn <= {_SEQ_WIN}),
    p AS (
      SELECT DISTINCT a.user_id,
             a.event_type || '>' || b.event_type || '>' || c.event_type
               AS pattern
      FROM t a
      JOIN t b ON a.user_id = b.user_id AND a.rn < b.rn
      JOIN t c ON b.user_id = c.user_id AND b.rn < c.rn)
    SELECT pattern, CAST(COUNT(*) AS BIGINT) AS support
    FROM p GROUP BY pattern
    ORDER BY support DESC, pattern
    LIMIT {_SEQ_TOP}
    """,
    "analytics",
)
def seq_pattern_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining: the top-{top} length-3 SUBSEQUENCES
    (gaps allowed — order, not adjacency) over each user's first
    {win} events, with support = users containing the pattern.  The
    full-sequential-pattern step past ``frequent_event_paths`` (which
    counts contiguous prefixes only).

    Design: PrefixSpan's projected-database recursion earns its keep
    when patterns are long and sequences unbounded; with a bounded
    window (K={win}) and fixed pattern length (3), DIRECT enumeration
    is the better distributed plan — C(K,3) <= 120 candidate triples
    per user, generated entirely inside one per-user array by a nested
    ``transform``/``slice`` comprehension (JVM codegen, no self-join,
    no extra shuffle).  The oracle intentionally uses the OTHER
    formulation (a 3-way rn-inequality self-join), so the value hash
    cross-checks two independent constructions.

    Scale posture: one user-hash exchange builds the bounded per-user
    array (window + groupBy share the partitioning); the triple
    explode is a bounded 120x map-side fan-out; per-user DISTINCT +
    support counting are one pattern-keyed exchange whose cardinality
    is |event_types|^3 (vocabulary-grain), then a TOP-{top}
    TakeOrderedAndProject.  Per-user state never exceeds K events —
    skewed users are clipped by the window, not shuffled whole.

    Reference has no sequence operators (SURVEY §2c extension).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _SEQ_WIN)
        .groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(rn, event_type))),"
                " x -> x.event_type)"
            ).alias("s")
        )
    )
    pats = seqs.select(
        "user_id",
        F.explode(
            F.expr(
                "flatten(flatten(transform(s, (a, i) ->"
                " transform(slice(s, i + 2, size(s)), (b, j) ->"
                " transform(slice(s, i + j + 3, size(s)),"
                " c -> concat(a, '>', b, '>', c))))))"
            )
        ).alias("pattern"),
    ).distinct()
    return (
        pats.groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .orderBy(F.col("support").desc(), "pattern")
        .limit(_SEQ_TOP)
    )


seq_pattern_triples.__doc__ = seq_pattern_triples.__doc__.format(
    top=_SEQ_TOP, win=_SEQ_WIN
)


# ---------------------------------------------------------------------------
# 2D skyline (Pareto frontier) via bucketed sweep

# Dominance queries without the quadratic anti-join: a part is on the
# (min price, max size) skyline iff no other part is at-most-as-
# expensive AND at-least-as-large with one strict.  The sweep
# formulation needs only "max size among strictly cheaper points",
# which decomposes scalably: price-GRAIN maxima, a within-bucket
# running max (bounded partitions), and a bucket-grain carry-in (the
# price domain is fixed, so the bucket table is domain-bounded — the
# same two-level pattern as max_concurrency_sweep's sharded prefix
# sum).  The oracle is the DIRECT quadratic NOT EXISTS, so the sweep
# and the truth are independent formulations.
_SKY_BUCKET_CENTS = 10_000  # $100 price buckets; TPC-H prices ~$900-2100


@register(
    "skyline_price_size",
    f"""
    WITH pts AS (
      SELECT p_partkey,
             CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part)
    SELECT p.p_partkey, p.price_cents, p.size
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price_cents <= p.price_cents AND q.size >= p.size
        AND (q.price_cents < p.price_cents OR q.size > p.size))
    ORDER BY p.price_cents, p.p_partkey
    """,
    "analytics",
    "spatial",
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts (minimize retail price, maximize size):
    the parts no other part dominates.

    Plan: price-grain group maxima (one combinable agg), a running max
    within ${b}-cent price buckets (bounded window partitions at any
    corpus size — the price DOMAIN is fixed), and a bucket-grain
    carry-in computed over the domain-bounded bucket table; a point
    survives iff it holds its price group's max size AND beats the
    strictly-cheaper running max.  No self-join anywhere — contrast
    the oracle's quadratic NOT EXISTS, kept deliberately as the
    independent truth formulation.

    Ties: equal (price, size) points dominate neither each other nor
    anything strictly — all survive, exactly as NOT EXISTS has it.

    Reference has no analytics operators (SURVEY §2c extension).
    """
    from pyspark.sql import Window as W

    pts = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("CAST(FLOOR(p_retailprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
        F.col("p_size").cast("long").alias("size"),
    )
    pg = pts.groupBy("price_cents").agg(F.max("size").alias("gmax"))
    pg = pg.withColumn(
        "b", F.expr(f"price_cents div {_SKY_BUCKET_CENTS}")
    ).withColumn(
        "inmax",
        F.max("gmax").over(
            W.partitionBy("b")
            .orderBy("price_cents")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    buckets = pg.groupBy("b").agg(F.max("gmax").alias("bmax"))
    carry = buckets.withColumn(
        "carry",
        F.max("bmax").over(
            W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
        ),
    ).select("b", "carry")
    thresh = (
        pg.join(F.broadcast(carry), "b")
        .select(
            "price_cents",
            "gmax",
            F.greatest(
                F.coalesce("inmax", F.lit(-1)), F.coalesce("carry", F.lit(-1))
            ).alias("m1"),
        )
    )
    return (
        pts.join(F.broadcast(thresh), "price_cents")
        .filter((F.col("size") == F.col("gmax")) & (F.col("size") > F.col("m1")))
        .select("p_partkey", "price_cents", "size")
        .orderBy("price_cents", "p_partkey")
    )


skyline_price_size.__doc__ = skyline_price_size.__doc__.format(
    b=_SKY_BUCKET_CENTS
)


# ---------------------------------------------------------------------------
# Model-evaluation metrics: exact rank-sum AUC + decile gains table

# The eval side of the quality-filter pipeline: how well does the
# linear quality classifier's score (quality_classifier_logit,
# corpus_stats.py) separate a reference label (here lang='en' — the
# classifier's stopword features ARE English, so the score should rank
# English documents higher).  Both metrics are EXACT integers:
#
# * AUC via the Mann-Whitney rank-sum with tie correction, kept in a
#   x2 fixed scale (tied groups take min_rank+max_rank = 2x their
#   average rank, always an integer);
# * the cumulative-gains table over average-rank deciles (ties land in
#   ONE decile by construction, so no tie-break ordering is needed).
#
# Scale shape: everything reduces to the SCORE-GRAIN count table
# (n_pos, n_neg per distinct score) — one combinable aggregate over
# the corpus — and the cumulative counts over it use the two-level
# sharded prefix-sum pattern (within-bucket window + bucket-grain
# carry) so no corpus-sized single-partition window exists; the score
# domain is MODEL-bounded (integer weights x bounded features), so
# the 2^14-wide bucket table is domain-bounded.
_EVAL_BUCKET = 1 << 14


# Reference label: stopword density >= 4 — the CCNet-style "looks like
# natural language" proxy.  The classifier carries the stopword count
# as ONE of its three features, so the score predicts the label well
# but imperfectly (AUC ~0.90 on the fixtures; labels split ~215/285) —
# exactly the regime a gains/AUC eval is for.  (lang='en' was measured
# first and rejected: the synthetic corpus carries no language signal,
# AUC 0.496 — an uninformative demo.)
_EVAL_LABEL_MIN_STOP = 4


def _eval_score_sql(table: str = "documents") -> str:
    """(score, y) per document — the classifier logit (same constants
    as quality_classifier_logit) and the stopword-density label."""
    from kbrowse_spark.operators.corpus_stats import (
        _CLF_BIAS,
        _CLF_W_DISTINCT,
        _CLF_W_STOP,
        _CLF_W_TOKENS,
    )

    return f"""
      SELECT CAST({_CLF_BIAS}
                  + {_CLF_W_TOKENS} * len(string_split(text, ' '))
                  + {_CLF_W_STOP} * len(list_filter(string_split(text, ' '),
                      w -> w IN ('the','a','and','of','to','in')))
                  + {_CLF_W_DISTINCT} * len(list_distinct(string_split(text, ' ')))
                  AS BIGINT) AS s,
             CAST(CASE WHEN len(list_filter(string_split(text, ' '),
                      w -> w IN ('the','a','and','of','to','in')))
                      >= {_EVAL_LABEL_MIN_STOP}
                  THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM {table}"""


def _eval_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kbrowse_spark.operators.corpus_stats import (
        _CLF_BIAS,
        _CLF_W_DISTINCT,
        _CLF_W_STOP,
        _CLF_W_TOKENS,
    )

    stop_arr = "array('the','a','and','of','to','in')"
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.expr(
            f"CAST({_CLF_BIAS}"
            f" + {_CLF_W_TOKENS} * size(split(text, ' '))"
            f" + {_CLF_W_STOP} * size(filter(split(text, ' '),"
            f"     w -> array_contains({stop_arr}, w)))"
            f" + {_CLF_W_DISTINCT} * size(array_distinct(split(text, ' ')))"
            " AS BIGINT)"
        ).alias("s"),
        F.expr(
            f"CAST(size(filter(split(text, ' '),"
            f" w -> array_contains({stop_arr}, w)))"
            f" >= {_EVAL_LABEL_MIN_STOP} AS INT)"
        ).cast("long").alias("y"),
    )


def _score_grain_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-grain counts with exclusive cumulative counts in BOTH
    orders, via within-bucket windows + a domain-bounded bucket carry
    (no corpus-sized single-partition window)."""
    from pyspark.sql import Window as W

    sg = (
        _eval_scores(spark, sf_dir)
        .groupBy("s")
        .agg(
            F.sum("y").cast("long").alias("npos"),
            F.sum(F.lit(1) - F.col("y")).cast("long").alias("nneg"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .withColumn("b", F.expr(f"s div {_EVAL_BUCKET}"))
    )
    sg = sg.withColumn(
        "in_asc",
        F.coalesce(
            F.sum("c").over(
                W.partitionBy("b").orderBy("s")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn(
        "in_desc",
        F.coalesce(
            F.sum("c").over(
                W.partitionBy("b").orderBy(F.col("s").desc())
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    bt = sg.groupBy("b").agg(F.sum("c").alias("bc"))
    carry = bt.select(
        "b",
        F.coalesce(
            F.sum("bc").over(
                W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("carry_asc"),
        F.coalesce(
            F.sum("bc").over(
                W.orderBy(F.col("b").desc())
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("carry_desc"),
    )
    return sg.join(F.broadcast(carry), "b").select(
        "s",
        "npos",
        "nneg",
        "c",
        (F.col("carry_asc") + F.col("in_asc")).alias("cum_asc"),
        (F.col("carry_desc") + F.col("in_desc")).alias("cum_desc"),
    )


@register(
    "eval_auc_rank",
    f"""
    WITH sc AS ({_eval_score_sql()}),
    r AS (
      SELECT y,
             2 * rank() OVER (ORDER BY s)
               + COUNT(*) OVER (PARTITION BY s) - 1 AS rank2
      FROM sc),
    agg AS (
      SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(SUM(1 - y) AS BIGINT) AS n_neg,
             CAST(SUM(CASE WHEN y = 1 THEN rank2 ELSE 0 END) AS BIGINT)
               AS pos_rank2
      FROM r)
    SELECT n_pos, n_neg,
           CAST(pos_rank2 - n_pos * (n_pos + 1) AS BIGINT) AS auc_num2,
           CAST(1000000 * (pos_rank2 - n_pos * (n_pos + 1))
                // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
    FROM agg
    """,
    "analytics",
    "eval",
)
def eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the quality-classifier score against the
    stopword-density reference label, by the Mann-Whitney rank-sum with tie
    correction — the distributed-AUC formulation (no pair join, no
    sort of the corpus): AUC = (sum of positives' average ranks -
    n_pos(n_pos+1)/2) / (n_pos*n_neg), kept x2 so ties stay integer.

    The Spark plan derives ranks from score-grain cumulative counts
    (see _score_grain_cum — two-level sharded prefix sum, no global
    window); the oracle uses the direct rank()/count() window
    formulation, so the value hash cross-checks two constructions.

    Reference has no eval operators (SURVEY §2c extension).
    """
    sg = _score_grain_cum(spark, sf_dir)
    # avg rank x2 of every row at score s (ascending) = 2*cum_asc + c + 1
    agg = sg.agg(
        F.sum("npos").cast("long").alias("n_pos"),
        F.sum("nneg").cast("long").alias("n_neg"),
        F.sum(F.expr("npos * (2 * cum_asc + c + 1)"))
        .cast("long")
        .alias("pos_rank2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr("CAST(pos_rank2 - n_pos * (n_pos + 1) AS BIGINT)").alias(
            "auc_num2"
        ),
        F.expr(
            "CAST(1000000 * (pos_rank2 - n_pos * (n_pos + 1))"
            " DIV (2 * n_pos * n_neg) AS BIGINT)"
        ).alias("auc_ppm"),
    )


@register(
    "eval_gains_deciles",
    f"""
    WITH sc AS ({_eval_score_sql()}),
    n AS (SELECT COUNT(*) AS n, SUM(y) AS tot_pos FROM sc),
    r AS (
      SELECT y,
             2 * rank() OVER (ORDER BY s DESC)
               + COUNT(*) OVER (PARTITION BY s) - 1 AS rank2d
      FROM sc),
    d AS (
      SELECT CAST(((rank2d - 1) * 10) // (2 * n.n) AS BIGINT) AS decile, y
      FROM r CROSS JOIN n),
    per AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM d GROUP BY decile),
    cum AS (
      SELECT decile, n_docs, n_pos,
             CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
      FROM per)
    SELECT decile, n_docs, n_pos,
           CAST(1000000 * n_pos // n_docs AS BIGINT) AS pos_rate_ppm,
           cum_pos,
           CAST(1000000 * cum_pos // (SELECT tot_pos FROM n) AS BIGINT)
             AS cum_capture_ppm
    FROM cum ORDER BY decile
    """,
    "analytics",
    "eval",
)
def eval_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains table of the quality-classifier score against
    the stopword-density label: documents in descending-score average-rank
    deciles (tied scores land in ONE decile — no tie-break ordering
    exists to diverge on), per-decile positive rate and the cumulative
    capture fraction (what share of all positives the top-k deciles
    hold) — the gains/lift curve behind every "filter the top X% by
    classifier score" curation decision, in exact ppm integers.

    Same score-grain machinery as eval_auc_rank (two-level prefix sum;
    the decile re-aggregation is 10-row-grain); the oracle uses the
    direct window formulation.

    Reference has no eval operators (SURVEY §2c extension).
    """
    from pyspark.sql import Window as W

    sg = _score_grain_cum(spark, sf_dir)
    n = F.broadcast(
        sg.agg(
            F.sum("c").cast("long").alias("n"),
            F.sum("npos").cast("long").alias("tot_pos"),
        )
    )
    per = (
        sg.crossJoin(n)
        .select(
            F.expr(
                "CAST(((2 * cum_desc + c + 1 - 1) * 10) DIV (2 * n)"
                " AS BIGINT)"
            ).alias("decile"),
            "c",
            "npos",
        )
        .groupBy("decile")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.sum("npos").cast("long").alias("n_pos"),
        )
    )
    cum = per.withColumn(
        "cum_pos",
        F.sum("n_pos")
        .over(W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0))
        .cast("long"),
    )
    return (
        cum.crossJoin(n)
        .select(
            "decile",
            "n_docs",
            "n_pos",
            F.expr("CAST(1000000 * n_pos DIV n_docs AS BIGINT)").alias(
                "pos_rate_ppm"
            ),
            "cum_pos",
            F.expr("CAST(1000000 * cum_pos DIV tot_pos AS BIGINT)").alias(
                "cum_capture_ppm"
            ),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Classification eval: confusion matrix, F1, Cohen's kappa
# ---------------------------------------------------------------------------

# Classifier decision threshold on the integer logit (sign rule).
_EVAL_CLS_THRESHOLD = 0

# Floor division that agrees across engines for ANY sign: DuckDB //
# floors while Spark DIV truncates toward zero, so a negative
# numerator (possible for kappa when agreement is below chance) would
# silently diverge; this CASE keeps every division's operands
# non-negative.  {num} must be an expression, {den} strictly positive.
_FLOORDIV_CASE = (
    "CASE WHEN ({num}) >= 0 THEN ({num}) {div} ({den}) "
    "ELSE -((-({num}) + ({den}) - 1) {div} ({den})) END"
)


def _kappa_select(div: str) -> list[str]:
    """The shared metric readout over (tp, fp, fn, tn) as a list of
    column expressions — identical integer arithmetic in both engines;
    `div` is the engine's integer division operator ('//' DuckDB,
    'DIV' Spark)."""
    n = "(tp + fp + fn + tn)"
    chance = "((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))"
    kn = f"({n} * (tp + tn) - {chance})"
    kd = f"({n} * {n} - {chance})"
    kappa = _FLOORDIV_CASE.format(num=f"1000000 * {kn}", den=kd, div=div)
    return [
        "tp",
        "fp",
        "fn",
        "tn",
        f"CAST(1000000 * tp {div} (tp + fp) AS BIGINT) AS precision_ppm",
        f"CAST(1000000 * tp {div} (tp + fn) AS BIGINT) AS recall_ppm",
        f"CAST(2000000 * tp {div} (2 * tp + fp + fn) AS BIGINT) AS f1_ppm",
        f"CAST(1000000 * (tp + tn) {div} {n} AS BIGINT) AS po_ppm",
        f"CAST(1000000 * {chance} {div} ({n} * {n}) AS BIGINT) AS pe_ppm",
        f"CAST({kappa} AS BIGINT) AS kappa_ppm",
    ]


@register(
    "eval_confusion_kappa",
    f"""
    WITH sc AS ({{score_sql}}),
    cm AS (
      SELECT
        CAST(SUM(CASE WHEN s >= {_EVAL_CLS_THRESHOLD} AND y = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN s >= {_EVAL_CLS_THRESHOLD} AND y = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN s < {_EVAL_CLS_THRESHOLD} AND y = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN s < {_EVAL_CLS_THRESHOLD} AND y = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM sc)
    SELECT {', '.join(_kappa_select('//'))}
    FROM cm
    """.format(score_sql=_eval_score_sql()),
    "analytics",
    "eval",
)
def eval_confusion_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the thresholded quality-classifier logit
    (sign rule, threshold {th}) against the stopword-density label,
    with exact integer-ppm precision / recall / F1 / accuracy /
    expected-chance-agreement / Cohen's kappa — the classification
    readout that completes the eval family (AUC ranks, gains lifts,
    MRR/NDCG orders; this one JUDGES the hard decision).  kappa
    corrects accuracy for chance agreement: po=0.80 here deflates to
    kappa~0.577 because the label split is imbalanced — the reason
    curation dashboards report kappa next to accuracy.

    All metrics are exact integer arithmetic over the four confusion
    counts (F1 via the 2tp/(2tp+fp+fn) identity — no float
    intermediates); division is floor division made sign-portable by
    a shared CASE (DuckDB // floors, Spark DIV truncates; a
    below-chance kappa would otherwise diverge silently).

    Scale posture: ONE map-side-combinable aggregate over the corpus
    (four conditional counts); every metric derives from that 1 row.

    Reference has no eval operators (SURVEY §2c extension).
    """
    sc = _eval_scores(spark, sf_dir)
    cm = sc.agg(
        F.sum(
            ((F.col("s") >= _EVAL_CLS_THRESHOLD) & (F.col("y") == 1)).cast(
                "long"
            )
        ).alias("tp"),
        F.sum(
            ((F.col("s") >= _EVAL_CLS_THRESHOLD) & (F.col("y") == 0)).cast(
                "long"
            )
        ).alias("fp"),
        F.sum(
            ((F.col("s") < _EVAL_CLS_THRESHOLD) & (F.col("y") == 1)).cast(
                "long"
            )
        ).alias("fn"),
        F.sum(
            ((F.col("s") < _EVAL_CLS_THRESHOLD) & (F.col("y") == 0)).cast(
                "long"
            )
        ).alias("tn"),
    )
    return cm.selectExpr(*_kappa_select("DIV"))


eval_confusion_kappa.__doc__ = eval_confusion_kappa.__doc__.format(
    th=_EVAL_CLS_THRESHOLD
)


# ---------------------------------------------------------------------------
# Calibration / reliability bins over the classifier score
# ---------------------------------------------------------------------------

_CAL_BINS = 10


@register(
    "eval_calibration_bins",
    f"""
    WITH sc AS ({{score_sql}}),
    mm AS (SELECT MIN(s) AS smin, MAX(s) AS smax FROM sc),
    b AS (
      SELECT (s - smin) * {_CAL_BINS} // (smax - smin + 1) AS bin,
             s, y, smin, smax
      FROM sc CROSS JOIN mm),
    g AS (
      SELECT CAST(bin AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(1000000 * SUM(y) // COUNT(*) AS BIGINT) AS acc_ppm,
             CAST((1000000 * (SUM(s) - COUNT(*) * ANY_VALUE(smin)))
                  // (COUNT(*) * (ANY_VALUE(smax) - ANY_VALUE(smin)))
                  AS BIGINT) AS conf_ppm
      FROM b GROUP BY bin)
    SELECT bin, n_docs, n_pos, acc_ppm, conf_ppm,
           CAST(ABS(acc_ppm - conf_ppm) AS BIGINT) AS gap_ppm,
           CAST(n_docs * ABS(acc_ppm - conf_ppm) AS BIGINT) AS w_gap
    FROM g
    ORDER BY bin
    """.format(score_sql=_eval_score_sql()),
    "analytics",
    "eval",
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the quality-classifier score: documents
    in {nb} equal-width integer-score bins, per-bin observed positive
    rate (acc_ppm) vs the min-max-scaled mean score as the confidence
    proxy (conf_ppm) — the calibration audit behind "can I trust the
    classifier's score as a probability when thresholding at 0.9".
    The weighted gap column w_gap = n_docs * |acc - conf| makes the
    expected calibration error derivable exactly as SUM(w_gap) DIV n
    (pinned by the invariant test).

    Transcendental-free: the raw integer logit is scaled by min-max
    (exact rational -> integer ppm via the all-nonnegative floor
    division (1e6 * (sum_s - n*smin)) // (n * (smax - smin))) instead
    of a sigmoid, so both engines stay in exact integer arithmetic —
    calibration against ANY monotone score transform bins identically.

    Scale posture: one corpus aggregate for (smin, smax) attached as
    a 1-row broadcast, one map-side-combinable group-by at bin grain
    ({nb} rows); nothing driver-side.

    Reference has no eval operators (SURVEY §2c extension).
    """
    sc = _eval_scores(spark, sf_dir)
    mm = F.broadcast(
        sc.agg(
            F.min("s").cast("long").alias("smin"),
            F.max("s").cast("long").alias("smax"),
        )
    )
    g = (
        sc.crossJoin(mm)
        .select(
            F.expr(
                f"(s - smin) * {_CAL_BINS} DIV (smax - smin + 1)"
            ).alias("bin"),
            "s",
            "y",
            "smin",
            "smax",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("s").cast("long").alias("sum_s"),
            F.first("smin").alias("smin"),
            F.first("smax").alias("smax"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n_docs",
            "n_pos",
            F.expr("CAST(1000000 * n_pos DIV n_docs AS BIGINT)").alias(
                "acc_ppm"
            ),
            F.expr(
                "CAST((1000000 * (sum_s - n_docs * smin))"
                " DIV (n_docs * (smax - smin)) AS BIGINT)"
            ).alias("conf_ppm"),
        )
    )
    return g.select(
        "bin",
        "n_docs",
        "n_pos",
        "acc_ppm",
        "conf_ppm",
        F.expr("CAST(ABS(acc_ppm - conf_ppm) AS BIGINT)").alias("gap_ppm"),
        F.expr(
            "CAST(n_docs * ABS(acc_ppm - conf_ppm) AS BIGINT)"
        ).alias("w_gap"),
    ).orderBy("bin")


eval_calibration_bins.__doc__ = eval_calibration_bins.__doc__.format(
    nb=_CAL_BINS
)


# ---------------------------------------------------------------------------
# Watermark lateness audit (choose-your-delay table for streaming ops)
# ---------------------------------------------------------------------------

# Deterministic simulated transport delay: the fixture's events are
# perfectly ordered by event_id (measured: zero late arrivals), so the
# audit simulates out-of-order arrival with a salted-hash delay of
# 0-599 s per event — the same md5 device the rag feature hashing and
# priority sampling use.  Production replaces this with the real
# arrival log (ingest timestamp column).
_WM_DELAY_SQL = (
    "(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 600)"
)
_WM_DELAY_SPARK = (
    "(CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10)"
    " AS BIGINT) % 600)"
)
_WM_CANDIDATES = (0, 60, 300, 900)
_WM_SHARD_US = 3_600_000_000  # 1-hour arrival shards for the prefix max


@register(
    "stream_watermark_lateness_audit",
    f"""
    WITH a AS (
      SELECT event_id, epoch_us(ts) AS ets,
             epoch_us(ts) + 1000000 * {_WM_DELAY_SQL} AS ats
      FROM events),
    r AS (
      SELECT event_id, ets,
             MAX(ets) OVER (ORDER BY ats, event_id
                            ROWS UNBOUNDED PRECEDING) AS wm
      FROM a),
    l AS (SELECT GREATEST(wm - ets, 0) AS late_us FROM r)
    SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
           CAST(COUNT(*) FILTER (late_us > d.delay_s * 1000000)
                AS BIGINT) AS n_dropped,
           CAST(1000000 * COUNT(*) FILTER (late_us > d.delay_s * 1000000)
                // COUNT(*) AS BIGINT) AS dropped_ppm,
           CAST(MAX(late_us) // 1000000 AS BIGINT) AS max_late_s
    FROM l CROSS JOIN (SELECT unnest([{", ".join(map(str, _WM_CANDIDATES))}])
                       AS delay_s) d
    GROUP BY d.delay_s
    ORDER BY delay_s
    """,
    "analytics",
    "audit",
)
def stream_watermark_lateness_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The choose-your-watermark table: for each candidate watermark
    delay ({cands} s), how many events a streaming job would DROP
    (arrive later than delay behind the running event-time maximum in
    arrival order) and the worst observed lateness — the measurement
    that turns `withWatermark("ts", ???)` from a guess into a budget
    (dropped_ppm vs state-retention trade).  Measured sf0.01 under
    the simulated 0-599 s transport delay: 28.1% of events are
    out-of-order at delay 0, 4.5% still late at 300 s, 0 at 900 s.

    The Spark side computes the arrival-order running maximum with
    the TWO-LEVEL sharded prefix max (1-hour arrival shards: in-shard
    window + shard-grain carry table — the max_concurrency_sweep /
    eval_auc_rank machinery; no corpus-sized global window), while
    the oracle uses the direct global window — two constructions
    cross-checked by the hash.  Lateness is a DIFFERENCE of epoch
    micros, so session-timezone interpretation cancels; thresholds
    compare exact integers.

    Scale posture: one scan; one window partitioned by arrival hour;
    the carry table is hour-grain; the 4-row delay-candidate table is
    a broadcast literal attach.  Production swaps the simulated delay
    for the ingest-timestamp column — the plan is unchanged.

    Reference has no streaming-ops audits (SURVEY §2c extension).
    """
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    a = ev.select(
        "event_id",
        F.unix_micros("ts").alias("ets"),
        (
            F.unix_micros("ts")
            + F.lit(1_000_000) * F.expr(_WM_DELAY_SPARK)
        ).alias("ats"),
    ).withColumn("shard", F.expr(f"ats DIV {_WM_SHARD_US}"))
    in_shard = a.withColumn(
        "in_max",
        F.max("ets").over(
            W.partitionBy("shard")
            .orderBy("ats", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    carry = (
        a.groupBy("shard")
        .agg(F.max("ets").alias("shard_max"))
        .select(
            "shard",
            F.max("shard_max")
            .over(W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1))
            .alias("carry_max"),
        )
    )
    late = (
        in_shard.join(F.broadcast(carry), "shard")
        .select(
            F.greatest(
                F.greatest(
                    "in_max", F.coalesce("carry_max", F.col("ets"))
                )
                - F.col("ets"),
                F.lit(0),
            ).alias("late_us")
        )
    )
    delays = spark.createDataFrame(
        [(d,) for d in _WM_CANDIDATES], "delay_s long"
    )
    return (
        late.crossJoin(F.broadcast(delays))
        .groupBy("delay_s")
        .agg(
            F.sum(
                (F.col("late_us") > F.col("delay_s") * 1_000_000).cast(
                    "long"
                )
            ).alias("n_dropped"),
            F.count(F.lit(1)).alias("n_total"),
            F.max("late_us").alias("max_late_us"),
        )
        .select(
            "delay_s",
            "n_dropped",
            F.expr("CAST(1000000 * n_dropped DIV n_total AS BIGINT)").alias(
                "dropped_ppm"
            ),
            F.expr("CAST(max_late_us DIV 1000000 AS BIGINT)").alias(
                "max_late_s"
            ),
        )
        .orderBy("delay_s")
    )


stream_watermark_lateness_audit.__doc__ = (
    stream_watermark_lateness_audit.__doc__.format(
        cands=", ".join(map(str, _WM_CANDIDATES))
    )
)


# ---------------------------------------------------------------------------
# Equi-depth histogram + selectivity-estimate audit (CBO histogram)
# ---------------------------------------------------------------------------

_HD_B = 8  # histogram buckets
_HD_COARSE = 100_000  # $1000 coarse buckets for the two-pass select
# Probe ranges in cents as exact integer functions of max cents m:
# (probe_id, lo_expr, hi_expr)
# {d} formats to the engine's integer-division operator.
_HD_PROBES = (
    (0, "m {d} 10", "m {d} 4"),
    (1, "m {d} 2", "3 * m {d} 5"),
    (2, "m {d} 3", "m {d} 3 + m {d} 100"),
)


@register(
    "histogram_equidepth_audit",
    f"""
    WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
               FROM lineitem),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MIN(c) AS BIGINT) AS cmin,
                 CAST(MAX(c) AS BIGINT) AS m FROM v),
    ranked AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM v),
    bounds AS (
      SELECT i AS bucket_id,
             (SELECT c FROM ranked
              WHERE rn = (i * n.n + {_HD_B} - 1) // {_HD_B}
              LIMIT 1) AS hi,
             ((i * n.n + {_HD_B} - 1) // {_HD_B})
               - (((i - 1) * n.n + {_HD_B} - 1) // {_HD_B}) AS depth
      FROM (SELECT unnest(generate_series(1, {_HD_B})) AS i)
      CROSS JOIN n),
    b2 AS (
      SELECT bucket_id, depth,
             COALESCE(LAG(hi) OVER (ORDER BY bucket_id),
                      (SELECT cmin - 1 FROM n)) AS lo, hi
      FROM bounds),
    probes AS (
      {" UNION ALL ".join(
        f"SELECT {pid} AS probe_id,"
        f" CAST({lo.format(d='//')} AS BIGINT) AS p_lo,"
        f" CAST({hi.format(d='//')} AS BIGINT) AS p_hi FROM n"
        for pid, lo, hi in _HD_PROBES)}),
    est AS (
      SELECT p.probe_id,
             CAST(SUM(b.depth * GREATEST(
                    LEAST(b.hi, p.p_hi) - GREATEST(b.lo, p.p_lo), 0)
                  // (b.hi - b.lo)) AS BIGINT) AS est_rows
      FROM probes p CROSS JOIN b2 b GROUP BY p.probe_id),
    act AS (
      SELECT p.probe_id, CAST(COUNT(*) AS BIGINT) AS actual_rows
      FROM probes p JOIN v ON v.c > p.p_lo AND v.c <= p.p_hi
      GROUP BY p.probe_id)
    SELECT p.probe_id AS probe_id, p.p_lo AS p_lo, p.p_hi AS p_hi,
           e.est_rows AS est_rows,
           CAST(COALESCE(a.actual_rows, 0) AS BIGINT) AS actual_rows,
           CAST(1000000 * ABS(e.est_rows - COALESCE(a.actual_rows, 0))
                // GREATEST(COALESCE(a.actual_rows, 0), 1) AS BIGINT)
             AS err_ppm
    FROM probes p
    JOIN est e ON p.probe_id = e.probe_id
    LEFT JOIN act a ON p.probe_id = a.probe_id
    ORDER BY probe_id
    """,
    "analytics",
    "ops",
)
def histogram_equidepth_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CBO-histogram accuracy audit: build an exact {b}-bucket
    EQUI-DEPTH histogram of l_extendedprice (boundaries are true
    order statistics — actual stored values in exact cents, selected
    by the order_stat_bucket_select two-pass plan, never interpolated
    floats), then score the histogram's uniform-within-bucket
    selectivity ESTIMATE against the true row count for three range
    probes — estimate vs truth in exact integer ppm, the number that
    tells you whether the optimizer's histogram is good enough to
    trust a join-order decision.

    The estimator is DEFINED as the integer formula
    sum_buckets(depth * overlap DIV width) — deterministic in both
    engines, no float selectivities anywhere.

    Scale posture (Spark side): boundary selection is the two-pass
    bucket-narrowing plan — a coarse $1000-bucket histogram
    aggregate (count + min/max per bucket) collected at MODEL grain
    (the price-RANGE-bounded ~105-row bucket table), with the
    cumulative walk + boundary-bucket selection in Python, then a
    re-scan of ONLY the {b} boundary-containing coarse buckets; the
    probe audit is one more combinable scan against a 3-row broadcast
    dim.  The oracle uses the direct global ROW_NUMBER ranking — the
    formulation that does not scale but is obviously right.

    Reference has no optimizer statistics (SURVEY §2c extension;
    analyze_table_stats collects the base stats, this op audits the
    histogram built on top).
    """
    from pyspark.sql import Window as W

    v = load(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c")
    )
    # Pass 1 (r14): ONE coarse-bucket aggregate carrying count AND
    # min/max per bucket, collected at MODEL grain (~price-range/1e5
    # rows).  n / cmin / cmax derive from it, and the cumulative walk
    # + boundary-bucket selection run in Python — the previous shape
    # paid a separate whole-table stats aggregate AND re-planned the
    # coarse-bucket subtree inside each of its two lazy consumers
    # (sel and hit), i.e. three extra lineitem passes for numbers a
    # 105-row table already contains.
    cb_rows = sorted(
        v.groupBy(F.expr(f"c DIV {_HD_COARSE}").alias("cb"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("c").alias("mn"),
            F.max("c").alias("mx"),
        )
        .collect(),
        key=lambda r: r.cb,
    )
    n = sum(r.cnt for r in cb_rows)
    cmin = min(r.mn for r in cb_rows)
    m = max(r.mx for r in cb_rows)
    import bisect

    cum = []
    acc = 0
    for r in cb_rows:
        acc += r.cnt
        cum.append(acc)
    sel_rows = []
    for i in range(1, _HD_B + 1):
        k = (i * n + _HD_B - 1) // _HD_B
        depth = k - ((i - 1) * n + _HD_B - 1) // _HD_B
        # First coarse bucket whose cumulative count reaches k
        # (identical to the previous cum-cnt < k <= cum join).
        j = bisect.bisect_left(cum, k)
        sel_rows.append(
            (i, k, depth, cb_rows[j].cb, cum[j] - cb_rows[j].cnt)
        )
    sel = spark.createDataFrame(
        sel_rows, "bucket_id long, k long, depth long, cb long, cum_before long"
    )
    # Pass 2: rank only inside the selected coarse buckets.
    hit = v.join(
        F.broadcast(sel.select("cb").distinct()),
        F.expr(f"c DIV {_HD_COARSE}") == F.col("cb"),
    ).select("c", F.expr(f"c DIV {_HD_COARSE}").alias("cb2"))
    w_in = W.partitionBy("cb2").orderBy("c")
    ranked = hit.withColumn("rn_in", F.row_number().over(w_in))
    bounds = (
        sel.join(
            ranked,
            (sel["cb"] == ranked["cb2"])
            & (ranked["rn_in"] == sel["k"] - sel["cum_before"]),
        )
        .select("bucket_id", "depth", F.col("c").alias("hi"))
    )
    w_b = W.orderBy("bucket_id")
    b2 = bounds.select(
        "bucket_id",
        "depth",
        F.coalesce(F.lag("hi").over(w_b), F.lit(cmin - 1)).alias("lo"),
        "hi",
    )
    probes = spark.createDataFrame([(m,)], "m long").selectExpr(
        f"stack({len(_HD_PROBES)}, "
        + ", ".join(
            f"CAST({pid} AS INT), CAST({lo.format(d='DIV')} AS BIGINT),"
            f" CAST({hi.format(d='DIV')} AS BIGINT)"
            for pid, lo, hi in _HD_PROBES
        )
        + ") AS (probe_id, p_lo, p_hi)"
    )
    est = (
        probes.crossJoin(F.broadcast(b2))
        .groupBy("probe_id")
        .agg(
            F.sum(
                F.expr(
                    "depth * GREATEST(LEAST(hi, p_hi) - GREATEST(lo, p_lo),"
                    " 0) DIV (hi - lo)"
                )
            )
            .cast("long")
            .alias("est_rows")
        )
    )
    act = (
        v.crossJoin(F.broadcast(probes))
        .filter((F.col("c") > F.col("p_lo")) & (F.col("c") <= F.col("p_hi")))
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    )
    return (
        probes.join(F.broadcast(est), "probe_id")
        .join(F.broadcast(act), "probe_id", "left")
        .select(
            F.col("probe_id").cast("int").alias("probe_id"),
            "p_lo",
            "p_hi",
            "est_rows",
            F.coalesce("actual_rows", F.lit(0))
            .cast("long")
            .alias("actual_rows"),
            F.expr(
                "CAST(1000000 * ABS(est_rows - COALESCE(actual_rows, 0))"
                " DIV GREATEST(COALESCE(actual_rows, 0), 1) AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("probe_id")
    )


histogram_equidepth_audit.__doc__ = histogram_equidepth_audit.__doc__.format(
    b=_HD_B
)


# ---------------------------------------------------------------------------
# Join-order cardinality audit (CBO estimate vs truth per plan step)
# ---------------------------------------------------------------------------


@register(
    "join_order_cardinality_audit",
    """
    WITH so AS (SELECT * FROM orders
                WHERE o_totalprice > (SELECT MAX(o_totalprice) / 2
                                      FROM orders)),
    sl AS (SELECT * FROM lineitem WHERE l_quantity >= 25),
    sc AS (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'),
    st AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM so) AS n_o,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM sl) AS n_l,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM sc) AS n_c,
             (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM so)
               AS dok_o,
             (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM sl)
               AS dok_l,
             (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM so)
               AS dck_o,
             (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM sc)
               AS dck_c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM so
              JOIN sl ON o_orderkey = l_orderkey) AS a1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM so
              JOIN sl ON o_orderkey = l_orderkey
              JOIN sc ON o_custkey = c_custkey) AS a2,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM so
              JOIN sc ON o_custkey = c_custkey) AS b1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM so
              JOIN sc ON o_custkey = c_custkey
              JOIN sl ON o_orderkey = l_orderkey) AS b2),
    est AS (
      SELECT *,
             n_o * n_l // GREATEST(dok_o, dok_l) AS e_a1,
             (n_o * n_l // GREATEST(dok_o, dok_l)) * n_c
               // GREATEST(dck_o, dck_c) AS e_a2,
             n_o * n_c // GREATEST(dck_o, dck_c) AS e_b1,
             (n_o * n_c // GREATEST(dck_o, dck_c)) * n_l
               // GREATEST(dok_o, dok_l) AS e_b2
      FROM st)
    SELECT join_order, step, est_rows, actual_rows,
           CAST(1000000 * ABS(est_rows - actual_rows)
                // GREATEST(actual_rows, 1) AS BIGINT) AS err_ppm
    FROM (
      SELECT 'ol_then_c' AS join_order, 1 AS step,
             CAST(e_a1 AS BIGINT) AS est_rows, a1 AS actual_rows FROM est
      UNION ALL SELECT 'ol_then_c', 2, CAST(e_a2 AS BIGINT), a2 FROM est
      UNION ALL SELECT 'oc_then_l', 1, CAST(e_b1 AS BIGINT), b1 FROM est
      UNION ALL SELECT 'oc_then_l', 2, CAST(e_b2 AS BIGINT), b2 FROM est) t
    ORDER BY join_order, step
    """,
    "analytics",
    "ops",
)
def join_order_cardinality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Why join order matters, quantified: the filtered three-table
    query sigma(orders) x sigma(lineitem) x sigma(customer) executed
    in both orders — (orders JOIN lineitem) THEN customer vs
    (orders JOIN customer) THEN lineitem — with, per plan step, the
    TEXTBOOK cardinality estimate |A|*|B| DIV max(ndv_A(k), ndv_B(k))
    (cascaded for step 2, exactly as a System R-style CBO composes
    it; exact filtered-side ndv, exact integer arithmetic) against
    the TRUE intermediate row count.  Measured sf0.01: the
    oc_then_l order's step-1 intermediate is 1,489 rows vs
    ol_then_c's 15,466 — the 10x an optimizer buys by reordering —
    while both orders' step 2 converge to the same final 3,068 rows
    (the commutativity cross-check the invariant test pins); the
    cascaded estimates agree up to floor-division rounding.

    Scale posture: every step is a plain filtered equi-join count
    (combinable aggregates, broadcastable dimension sides); the
    estimate inputs are scalar aggregates attached as 1-row
    broadcasts; the readout is a 4-row literal union.

    Reference has no optimizer tooling (SURVEY §2c extension;
    completes the CBO family with analyze_table_stats and
    histogram_equidepth_audit).
    """
    o = load(spark, sf_dir, "orders")
    thr = o.agg((F.max("o_totalprice") / 2).alias("t"))
    so = o.join(F.broadcast(thr)).filter(
        F.col("o_totalprice") > F.col("t")
    ).drop("t")
    sl = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25)
    sc = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    st = (
        so.agg(
            F.count(F.lit(1)).cast("long").alias("n_o"),
            F.countDistinct("o_orderkey").cast("long").alias("dok_o"),
            F.countDistinct("o_custkey").cast("long").alias("dck_o"),
        )
        .crossJoin(
            sl.agg(
                F.count(F.lit(1)).cast("long").alias("n_l"),
                F.countDistinct("l_orderkey").cast("long").alias("dok_l"),
            )
        )
        .crossJoin(
            sc.agg(
                F.count(F.lit(1)).cast("long").alias("n_c"),
                F.countDistinct("c_custkey").cast("long").alias("dck_c"),
            )
        )
        .crossJoin(
            so.join(sl, so["o_orderkey"] == sl["l_orderkey"])
            .agg(F.count(F.lit(1)).cast("long").alias("a1"))
        )
        .crossJoin(
            so.join(sl, so["o_orderkey"] == sl["l_orderkey"])
            .join(sc, so["o_custkey"] == sc["c_custkey"])
            .agg(F.count(F.lit(1)).cast("long").alias("a2"))
        )
        .crossJoin(
            so.join(sc, so["o_custkey"] == sc["c_custkey"])
            .agg(F.count(F.lit(1)).cast("long").alias("b1"))
        )
        .crossJoin(
            so.join(sc, so["o_custkey"] == sc["c_custkey"])
            .join(sl, so["o_orderkey"] == sl["l_orderkey"])
            .agg(F.count(F.lit(1)).cast("long").alias("b2"))
        )
    )
    est = st.selectExpr(
        "*",
        "n_o * n_l DIV GREATEST(dok_o, dok_l) AS e_a1",
        "(n_o * n_l DIV GREATEST(dok_o, dok_l)) * n_c"
        " DIV GREATEST(dck_o, dck_c) AS e_a2",
        "n_o * n_c DIV GREATEST(dck_o, dck_c) AS e_b1",
        "(n_o * n_c DIV GREATEST(dck_o, dck_c)) * n_l"
        " DIV GREATEST(dok_o, dok_l) AS e_b2",
    )
    rows = est.selectExpr(
        "stack(4,"
        " 'ol_then_c', 1, CAST(e_a1 AS BIGINT), a1,"
        " 'ol_then_c', 2, CAST(e_a2 AS BIGINT), a2,"
        " 'oc_then_l', 1, CAST(e_b1 AS BIGINT), b1,"
        " 'oc_then_l', 2, CAST(e_b2 AS BIGINT), b2"
        ") AS (join_order, step, est_rows, actual_rows)"
    )
    return rows.select(
        "join_order",
        "step",
        "est_rows",
        "actual_rows",
        F.expr(
            "CAST(1000000 * ABS(est_rows - actual_rows)"
            " DIV GREATEST(actual_rows, 1) AS BIGINT)"
        ).alias("err_ppm"),
    ).orderBy("join_order", "step")


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (distributed resampling)
# ---------------------------------------------------------------------------

_PB_B = 100  # bootstrap replicates
_PB_LO_RANK, _PB_HI_RANK = 3, 98  # ~2.5% / 97.5% order statistics of B=100


def _pb_thresholds() -> list[int]:
    """Poisson(1) CDF breakpoints on a 2^60 integer scale, evaluated
    ONCE in Python and embedded as literals in both engines (the
    eval_mrr_ndcg_at_k log-weight pattern) — no float RNG contract."""
    import math

    out, cdf = [], 0.0
    for k in range(6):
        cdf += math.exp(-1) / math.factorial(k)
        out.append(int(cdf * (1 << 60)))
    return out


_PB_TH = _pb_thresholds()


def _pb_m_case(u: str) -> str:
    """Resample multiplicity m ~ Poisson(1) via inverse CDF over the
    60-bit uniform hash `u` — identical expression text both engines
    (capped at 6; P(X>6|lambda=1) ~ 8e-5, an explicitly-capped tail)."""
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_PB_TH)
    )
    return f"CASE {arms} ELSE 6 END"


@register(
    "poisson_bootstrap_ci",
    f"""
    WITH base AS (
      SELECT o_orderpriority AS grp, o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    rep AS (
      SELECT grp, b, cents,
             {_pb_m_case("('0x' || substr(md5(o_orderkey || '-' || b), 1, 15))::BIGINT")} AS m
      FROM (SELECT grp, o_orderkey, cents,
                   unnest(generate_series(1, {_PB_B})) AS b
            FROM base)),
    means AS (
      SELECT grp, b,
             CAST(SUM(m * cents) // SUM(m) AS BIGINT) AS mb
      FROM rep GROUP BY grp, b HAVING SUM(m) > 0),
    ranked AS (
      SELECT grp, mb,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY mb, b) AS rnk,
             COUNT(*) OVER (PARTITION BY grp) AS cnt
      FROM means),
    pt AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(cents) // COUNT(*) AS BIGINT) AS point_mean_cents
      FROM base GROUP BY grp)
    SELECT p.grp AS o_orderpriority, p.n_rows, p.point_mean_cents,
           CAST(MAX(CASE WHEN r.rnk = (25 * r.cnt + 999) // 1000
                    THEN r.mb END) AS BIGINT) AS boot_lo_cents,
           CAST(MAX(CASE WHEN r.rnk = (975 * r.cnt + 999) // 1000
                    THEN r.mb END) AS BIGINT) AS boot_hi_cents,
           CAST({_PB_B} AS BIGINT) AS n_boot
    FROM pt p JOIN ranked r ON p.grp = r.grp
    GROUP BY p.grp, p.n_rows, p.point_mean_cents
    ORDER BY o_orderpriority
    """,
    "analytics",
    "stats",
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for the mean order price per order
    priority — THE distributed bootstrap: instead of drawing n rows
    with replacement per replicate (which needs global coordination),
    each row enters replicate b with multiplicity m ~ Poisson(1),
    independent per (row, b), so every replicate is one combinable
    aggregate over a single scan and replicates shard trivially
    across executors.  Multiplicities are deterministic — a 60-bit
    md5 hash of (orderkey, b) fed through the Poisson(1) inverse CDF
    with Python-precomputed 2^60-scale integer breakpoints embedded
    as literals in both engines — so the "random" resample is
    bit-reproducible with no float or RNG contract.  Replicate means
    are exact integer cents (SUM(m*cents) DIV SUM(m)); a replicate
    whose multiplicities are all zero (P = e^-n per group) is
    EXCLUDED rather than mapped to a sentinel — the CI is the
    ceil-2.5%/97.5% order statistics of the SURVIVING replicate
    means (ranks {lo}/{hi} when all B={b} survive, the normal case
    for any group with more than a handful of rows).

    Scale posture: the explode is x{b} on the fact scan — the
    bootstrap's intrinsic cost, embarrassingly parallel, no extra
    shuffle beyond the (grp, b) hash aggregate (map-side combinable);
    the ranking window runs at REPLICATE grain (G x {b} rows, bounded
    by the group domain, not the corpus).  At 100 TB the same plan
    holds: Poisson multiplicities need no global n, which is exactly
    why this beats exact multinomial resampling on a cluster.

    Reference has no resampling tooling (SURVEY §2c extension; joins
    ab_test_welch / cuped_adjusted_metric in the experimentation
    family).
    """
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    # Spread the x100 fan-out: a small orders file arrives as ONE input
    # split, which would serialize all n*B md5s onto a single task —
    # and the session's input-sized shuffle tuning is equally wrong
    # here because the explode multiplies volume x100 AFTER the scan.
    # Partition the 3-column base explicitly for post-fanout size
    # (core count), a tiny shuffle that buys full parallelism for the
    # hash work (measured 12.8 s -> 1.7 s at sf0.1 on local[32]).
    base = base.repartition(
        spark.sparkContext.defaultParallelism, F.col("o_orderkey")
    )
    rep = base.select(
        "grp",
        "cents",
        "o_orderkey",
        F.explode(F.sequence(F.lit(1), F.lit(_PB_B))).alias("b"),
    ).select(
        "grp",
        "b",
        "cents",
        F.expr(
            _pb_m_case(
                "CAST(conv(substr(md5(concat(o_orderkey, '-', b)), 1, 15),"
                " 16, 10) AS BIGINT)"
            )
        ).alias("m"),
    )
    # A replicate whose multiplicities are ALL zero (P = e^-n — only
    # conceivable for tiny groups) has no resampled rows: it is
    # EXCLUDED, not mapped to a sentinel mean of 0 that would enter
    # the order statistics as an extreme low and deflate boot_lo.
    # The CI ranks are then ceil(2.5% / 97.5% of the SURVIVING count)
    # — identical to ranks {3, 98} whenever all B=100 survive.
    means = (
        rep.groupBy("grp", "b")
        .agg(
            F.sum(F.expr("m * cents")).alias("smc"),
            F.sum("m").alias("sm"),
        )
        .filter(F.col("sm") > 0)
        .select(
            "grp", "b", F.expr("CAST(smc DIV sm AS BIGINT)").alias("mb")
        )
    )
    w = Window.partitionBy("grp").orderBy("mb", "b")
    cw = Window.partitionBy("grp")
    ranked = means.select(
        "grp",
        "mb",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    pt = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias(
            "point_mean_cents"
        ),
    )
    return (
        pt.join(ranked, "grp")
        .groupBy("grp", "n_rows", "point_mean_cents")
        .agg(
            F.max(
                F.when(
                    F.col("rnk") == F.expr("(25 * cnt + 999) DIV 1000"),
                    F.col("mb"),
                )
            )
            .cast("long")
            .alias("boot_lo_cents"),
            F.max(
                F.when(
                    F.col("rnk") == F.expr("(975 * cnt + 999) DIV 1000"),
                    F.col("mb"),
                )
            )
            .cast("long")
            .alias("boot_hi_cents"),
        )
        .select(
            F.col("grp").alias("o_orderpriority"),
            "n_rows",
            "point_mean_cents",
            "boot_lo_cents",
            "boot_hi_cents",
            F.lit(_PB_B).cast("long").alias("n_boot"),
        )
        .orderBy("o_orderpriority")
    )


poisson_bootstrap_ci.__doc__ = poisson_bootstrap_ci.__doc__.format(
    lo=_PB_LO_RANK, hi=_PB_HI_RANK, b=_PB_B
)


# ---------------------------------------------------------------------------
# Mondrian split-conformal prediction audit
# ---------------------------------------------------------------------------

_CP_A_NUM, _CP_A_DEN = 1, 10  # alpha = 0.1 as an exact rational

# The calibration-side CTE chain (predictor, nonconformity scores,
# value-grain rank crossing -> per-group qhat) — the ONE SQL
# definition of the conformal model, shared by the batch audit and
# the streaming gate's oracle.
_CP_MODEL_SQL = f"""e AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    pred AS (
      SELECT event_type, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS p
      FROM e WHERE event_id % 2 = 0 GROUP BY event_type),
    cal AS (
      SELECT e.event_type, abs(cents - p) AS s
      FROM e JOIN pred USING (event_type) WHERE event_id % 2 = 0),
    sc AS (
      SELECT event_type, s, CAST(COUNT(*) AS BIGINT) AS c
      FROM cal GROUP BY event_type, s),
    cum AS (
      SELECT event_type, s,
             SUM(c) OVER (PARTITION BY event_type ORDER BY s
                          ROWS UNBOUNDED PRECEDING) AS cumc,
             SUM(c) OVER (PARTITION BY event_type) AS n_cal
      FROM sc),
    q AS (
      SELECT event_type, CAST(ANY_VALUE(n_cal) AS BIGINT) AS n_cal,
             CAST(MIN(CASE WHEN cumc >= ((n_cal + 1)
                    * ({_CP_A_DEN} - {_CP_A_NUM}) + {_CP_A_DEN} - 1)
                    // {_CP_A_DEN} THEN s END) AS BIGINT) AS qhat_cents
      FROM cum GROUP BY event_type)"""


def _conformal_model(spark: SparkSession, sf_dir: str):
    """(events-with-cents, 5-row predictor, 5-row qhat dim) — the ONE
    Spark definition of the split-conformal model (predictor fit +
    value-grain rank crossing), shared by the batch audit and the
    streaming gate."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    pred = (
        e.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(
            F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("p")
        )
    )
    cal = (
        e.filter(F.col("event_id") % 2 == 0)
        .join(F.broadcast(pred), "event_type")
        .select(
            "event_type", F.abs(F.col("cents") - F.col("p")).alias("s")
        )
    )
    sc = cal.groupBy("event_type", "s").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sc.select(
        "event_type",
        "s",
        F.sum("c").over(w_cum).alias("cumc"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n_cal"),
    )
    k_expr = (
        f"((n_cal + 1) * ({_CP_A_DEN} - {_CP_A_NUM}) + {_CP_A_DEN} - 1)"
        f" DIV {_CP_A_DEN}"
    )
    q = cum.groupBy("event_type").agg(
        F.first("n_cal").cast("long").alias("n_cal"),
        F.min(F.expr(f"CASE WHEN cumc >= {k_expr} THEN s END"))
        .cast("long")
        .alias("qhat_cents"),
    )
    return e, pred, q


@register(
    "conformal_prediction_audit",
    f"""
    WITH {_CP_MODEL_SQL},
    test AS (
      SELECT e.event_type,
             CAST(SUM(CASE WHEN abs(cents - p) <= qhat_cents
                           THEN 1 ELSE 0 END) AS BIGINT) AS cov,
             CAST(COUNT(*) AS BIGINT) AS n_test
      FROM e JOIN pred USING (event_type) JOIN q USING (event_type)
      WHERE event_id % 2 = 1 GROUP BY e.event_type)
    SELECT t.event_type, q.n_cal, t.n_test, q.qhat_cents,
           CAST(1000000 * t.cov // t.n_test AS BIGINT) AS coverage_ppm
    FROM test t JOIN q USING (event_type)
    ORDER BY event_type
    """,
    "analytics",
    "eval",
)
def conformal_prediction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian split-conformal prediction audit (Vovk; Lei et al.):
    a per-event-type mean-cents predictor is fit on the CALIBRATION
    half (even event_id), each calibration row's nonconformity score
    is |value - prediction| in exact cents, the per-group conformal
    quantile is the ceil((n_cal+1)(1-alpha))-th smallest score
    (alpha={an}/{ad}), and the audit reports realized coverage of
    prediction +- qhat on the held-out TEST half (odd event_id) —
    the distribution-free interval machinery a model-serving pipeline
    wraps around ANY point predictor, grouped so each event type
    carries its own guarantee (Mondrian conformal).  sf0.01 coverage:
    87.2-90.1% against the 90% target.

    The rank selection never sorts the corpus: scores aggregate to
    (group, score)-VALUE grain (map-side combinable), the cumulative
    window runs over that value-domain table (bounded by the score
    domain, not corpus rows — the order_stat_bucket_select rule), and
    the k-th order statistic is the first value whose cumulative
    count crosses k, an exact integer crossing identical in both
    engines.

    Scale posture: two corpus scans (calibration aggregate, test
    coverage) + one value-grain window; the 5-row (pred, qhat) dim
    broadcasts onto the test scan.

    Reference has no uncertainty tooling (SURVEY §2c extension;
    completes the eval family: AUC/gains -> calibration/ECE ->
    conformal coverage).
    """
    e, pred, q = _conformal_model(spark, sf_dir)
    test = (
        e.filter(F.col("event_id") % 2 == 1)
        .join(F.broadcast(pred), "event_type")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("p"))
                    <= F.col("qhat_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("cov"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.first("n_cal").alias("n_cal"),
            F.first("qhat_cents").alias("qhat_cents"),
        )
    )
    return test.select(
        "event_type",
        "n_cal",
        "n_test",
        "qhat_cents",
        F.expr("CAST(1000000 * cov DIV n_test AS BIGINT)").alias(
            "coverage_ppm"
        ),
    ).orderBy("event_type")


conformal_prediction_audit.__doc__ = conformal_prediction_audit.__doc__.format(
    an=_CP_A_NUM, ad=_CP_A_DEN
)


# ---------------------------------------------------------------------------
# MAD robust outlier ledger (median absolute deviation, exact integers)
# ---------------------------------------------------------------------------

_MAD_K = 3  # the classic 3-MAD fence


@register(
    "mad_robust_outliers",
    f"""
    WITH v AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events),
    r1 AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    med AS (
      SELECT event_type, MAX(n) AS n,
             CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
                  AS BIGINT) AS median_cents
      FROM r1 GROUP BY event_type),
    d AS (
      SELECT v.event_id, v.event_type, v.cents,
             abs(v.cents - m.median_cents) AS dev,
             m.n, m.median_cents
      FROM v JOIN med m USING (event_type)),
    r2 AS (
      SELECT event_type, dev, n, median_cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY dev, event_id) AS rn
      FROM d),
    mad AS (
      SELECT event_type, MAX(n) AS n, MAX(median_cents) AS median_cents,
             CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END)
                  AS BIGINT) AS mad_cents
      FROM r2 GROUP BY event_type)
    SELECT d.event_type,
           CAST(MAX(m.n) AS BIGINT) AS n,
           MAX(m.median_cents) AS median_cents,
           MAX(m.mad_cents) AS mad_cents,
           CAST(SUM(CASE WHEN d.dev > {_MAD_K} * m.mad_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(1000000 * SUM(CASE WHEN d.dev > {_MAD_K} * m.mad_cents
                              THEN 1 ELSE 0 END) // MAX(m.n) AS BIGINT)
             AS outlier_ppm
    FROM d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    "analytics",
    "stats",
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier ledger — median absolute deviation with the
    classic {k}-MAD fence, per event type: the outlier detector that
    does not move when the outliers themselves do (mean/stddev fences
    are dragged by the very points they are meant to flag; the
    winsorize_value_clip op trims by quantile, THIS one attests how
    much of the stream sits beyond a robust dispersion fence).  Both
    medians are EXACT lower-median rank selections over integer cents
    (the quantiles_disc_orders formulation — no interpolation, no
    float: rank selection cannot differ across engines), so the fence
    and every verdict are engine-exact integers.

    On this fixture's exponential-ish values the fence flags ~7-10%
    per type — the heavy tail the robust fence exists to expose
    (a normal distribution would flag ~0.27%).

    Scale posture: two rank-selection window passes partitioned by
    event_type plus one conditional aggregate — the accepted
    exact-order-stat shape (quantiles_disc_orders); the dimension
    tables it joins back are TYPE-grain (5 rows, broadcast).  Where
    the per-type sort is too hot, the DDSketch family gives the
    approximate answer; this operator is the exact attestation arm.

    Reference has no stats tooling (SURVEY §2c extension; joins
    stats_moments_events / winsorize_value_clip / quantile sketches
    in the dispersion family).
    """
    v = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    w1 = Window.partitionBy("event_type").orderBy("cents", "event_id")
    r1 = v.select(
        "event_type",
        "cents",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    med = F.broadcast(
        r1.groupBy("event_type").agg(
            F.max("n").alias("n"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("cents"))
            )
            .cast("long")
            .alias("median_cents"),
        )
    )
    d = v.join(med, "event_type").select(
        "event_id",
        "event_type",
        F.expr("abs(cents - median_cents)").alias("dev"),
        "n",
        "median_cents",
    )
    w2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    r2 = d.select(
        "event_type",
        "dev",
        "n",
        "median_cents",
        F.row_number().over(w2).alias("rn"),
    )
    mad = F.broadcast(
        r2.groupBy("event_type").agg(
            F.max("n").alias("n2"),
            F.max("median_cents").alias("med2"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("dev"))
            )
            .cast("long")
            .alias("mad_cents"),
        )
    )
    return (
        d.select("event_type", "dev")
        .join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n2").cast("long").alias("n"),
            F.max("med2").alias("median_cents"),
            F.max("mad_cents").alias("mad_cents"),
            F.sum(
                F.expr(f"IF(dev > {_MAD_K} * mad_cents, 1, 0)")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "median_cents",
            "mad_cents",
            "n_outliers",
            F.expr(
                "CAST(1000000 * n_outliers DIV n AS BIGINT)"
            ).alias("outlier_ppm"),
        )
        .orderBy("event_type")
    )


mad_robust_outliers.__doc__ = mad_robust_outliers.__doc__.format(k=_MAD_K)


# ---------------------------------------------------------------------------
# Fagin Threshold Algorithm: top-k serve depth over two ranked lists
# (r13) — the ranked-index serving-economics audit
# ---------------------------------------------------------------------------

_TA_K = 3


def _ta_oracle() -> str:
    return f"""
    WITH d0 AS (
      SELECT lang, doc_id,
             CAST(n_chars AS BIGINT) AS s1,
             CAST(10 * len(string_split(text, ' ')) AS BIGINT) AS s2
      FROM documents),
    ranked AS (
      SELECT lang, doc_id, s1, s2, s1 + s2 AS f,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY s1 DESC, doc_id) AS BIGINT)
               AS r1,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY s2 DESC, doc_id) AS BIGINT)
               AS r2
      FROM d0),
    thr AS (
      SELECT t1.lang, t1.d, t1.s1 + t2.s2 AS t
      FROM (SELECT lang, r1 AS d, s1 FROM ranked) t1
      JOIN (SELECT lang, r2 AS d, s2 FROM ranked) t2
        USING (lang, d)),
    tagged AS (
      SELECT lang, t AS val, 1 AS is_t,
             CAST(NULL AS BIGINT) AS doc_id,
             CAST(NULL AS BIGINT) AS dmin, CAST(NULL AS BIGINT) AS f
      FROM thr
      UNION ALL
      SELECT lang, f, 0, doc_id, least(r1, r2), f FROM ranked),
    cnt AS (
      SELECT lang, doc_id, dmin, f, is_t,
             SUM(is_t) OVER (PARTITION BY lang
                             ORDER BY val DESC, is_t ASC,
                                      COALESCE(doc_id, 0)
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS n_t_above
      FROM tagged),
    dq AS (
      SELECT lang, doc_id, f,
             greatest(dmin, n_t_above + 1) AS d_q
      FROM cnt WHERE is_t = 0),
    dstar AS (
      SELECT lang, d_q AS d_star
      FROM (SELECT lang, d_q,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY d_q, doc_id) AS rk
            FROM dq) x
      WHERE rk = {_TA_K}),
    nd AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM d0 GROUP BY 1),
    topk AS (
      SELECT lang, doc_id, f,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY f DESC, doc_id) AS rank
      FROM ranked)
    SELECT k.lang, CAST(k.rank AS BIGINT) AS rank, k.doc_id,
           CAST(k.f AS BIGINT) AS f_score,
           CAST(s.d_star AS BIGINT) AS d_star,
           n.n_docs,
           CAST(1000000 * s.d_star // n.n_docs AS BIGINT)
             AS scan_frac_ppm
    FROM topk k
    JOIN dstar s USING (lang) JOIN nd n USING (lang)
    WHERE k.rank <= {_TA_K}
    ORDER BY lang, rank
    """


@register("topk_fagin_ta_depth", _ta_oracle(), "analytics", "topk")
def topk_fagin_ta_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fagin THRESHOLD ALGORITHM serve-depth audit (Fagin/Lotem/Naor,
    PODS 2001): per language shard, the top-{k} documents by a
    two-list combined score (f = s1 + s2; s1 = chars, s2 = 10x words)
    TOGETHER WITH the depth d* at which TA may stop reading the two
    ranked index lists — the number a ranked-retrieval serving layer
    capacity-plans from (scan_frac_ppm says what fraction of each
    posting list a top-k query actually touches; correlated scores
    stop early, anti-correlated ones read deep).

    d* is computed in closed form rather than by iterating depths:
    the TA threshold T(d) = s1@d + s2@d is non-increasing, so each
    doc's qualifying depth is d_q = max(first-seen depth min(r1, r2),
    min{{d: T(d) <= f}}), and d* is the k-th smallest d_q.  The inner
    min is an order-statistic merge: union-tag the T values with the
    doc scores, one descending window per shard counts the T values
    strictly above each f — the same two-table prefix-sum trick as
    eval_auc_rank, no per-depth loop, no quadratic seen-set replay.

    Scale shape: everything is per-lang windows + vocabulary... doc-
    grain rows (3 windows + 1 union window per shard); the ranked
    lists ARE the modeled artifact (production pre-materializes them
    as sorted projections; here they build inline at test SF).  A TA
    stop-correctness invariant (d* matches a brute-force simulation;
    the global top-k is fully seen by depth d*) is pinned in
    tests/test_operator_invariants.py.

    Reference has no ranked retrieval (SURVEY §2c extension; joins
    rag_rrf_fusion / eval_mrr_ndcg_at_k in the serving family).
    """
    d = load(spark, sf_dir, "documents")
    d0 = d.select(
        "lang",
        "doc_id",
        F.col("n_chars").cast("long").alias("s1"),
        F.expr("CAST(10 * size(split(text, ' ')) AS BIGINT)").alias("s2"),
    )
    wl1 = Window.partitionBy("lang").orderBy(F.col("s1").desc(), "doc_id")
    wl2 = Window.partitionBy("lang").orderBy(F.col("s2").desc(), "doc_id")
    ranked = d0.select(
        "lang",
        "doc_id",
        "s1",
        "s2",
        (F.col("s1") + F.col("s2")).alias("f"),
        F.row_number().over(wl1).cast("long").alias("r1"),
        F.row_number().over(wl2).cast("long").alias("r2"),
    )
    thr = (
        ranked.select("lang", F.col("r1").alias("d"), "s1")
        .join(
            ranked.select("lang", F.col("r2").alias("d"), "s2"),
            ["lang", "d"],
        )
        .select("lang", "d", (F.col("s1") + F.col("s2")).alias("t"))
    )
    tagged = thr.select(
        "lang",
        F.col("t").alias("val"),
        F.lit(1).alias("is_t"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("long").alias("dmin"),
        F.lit(None).cast("long").alias("f"),
    ).unionByName(
        ranked.select(
            "lang",
            F.col("f").alias("val"),
            F.lit(0).alias("is_t"),
            "doc_id",
            F.least("r1", "r2").alias("dmin"),
            "f",
        )
    )
    wcnt = (
        Window.partitionBy("lang")
        .orderBy(
            F.col("val").desc(),
            F.col("is_t").asc(),
            F.coalesce("doc_id", F.lit(0)),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = tagged.select(
        "lang",
        "doc_id",
        "dmin",
        "f",
        "is_t",
        F.sum("is_t").over(wcnt).alias("n_t_above"),
    )
    dq = cnt.filter(F.col("is_t") == 0).select(
        "lang",
        "doc_id",
        "f",
        F.greatest("dmin", F.col("n_t_above") + 1).alias("d_q"),
    )
    wdq = Window.partitionBy("lang").orderBy("d_q", "doc_id")
    dstar = (
        dq.withColumn("rk", F.row_number().over(wdq))
        .filter(F.col("rk") == _TA_K)
        .select("lang", F.col("d_q").alias("d_star"))
    )
    nd = d0.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    wf = Window.partitionBy("lang").orderBy(F.col("f").desc(), "doc_id")
    topk = (
        d0.select("lang", "doc_id", (F.col("s1") + F.col("s2")).alias("f"))
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= _TA_K)
    )
    return (
        topk.join(F.broadcast(dstar), "lang")
        .join(F.broadcast(nd), "lang")
        .select(
            "lang",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            F.col("f").cast("long").alias("f_score"),
            F.col("d_star").cast("long").alias("d_star"),
            "n_docs",
            F.expr("CAST(1000000 * d_star DIV n_docs AS BIGINT)").alias(
                "scan_frac_ppm"
            ),
        )
        .orderBy("lang", "rank")
    )


topk_fagin_ta_depth.__doc__ = topk_fagin_ta_depth.__doc__.format(k=_TA_K)

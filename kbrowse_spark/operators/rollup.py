"""Hypertable-style rollup operators: serve coarse-grain queries from a
pre-aggregated table plus a raw recent tail.

The reference engine has no aggregation at all (SURVEY §2a — its whole
surface is scan+regex); this module is part of the declared extension
surface: the continuous-aggregate pattern every large event store
(TimescaleDB hypertables, Druid rollup segments, Flink table
materialization) uses to avoid re-scanning history.

At 100 TB the pattern is: a streaming job maintains the hourly rollup
table incrementally (one row per (event_type, hour) — ~10⁵ rows/year
instead of 10¹² raw events); interactive daily/weekly queries read the
rollup and union the small un-rolled-up tail.  Here both halves are
derived inside one builder (the testdata is immutable), but the plan
shape is the production one: the raw scan is bounded to the tail by a
pushed-down timestamp predicate, and history comes from the tiny
pre-agg.

Correctness hinge: partial aggregates must re-aggregate exactly, so the
intermediate per-hour sums stay DECIMAL (associative, exact) and only
the final daily value casts to double — see functions/determinism.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.functions.determinism import sql_dsum
from kbrowse_spark.sources.tables import load, load_events_range

# Tail split point: history (< SPLIT) is served from the hourly rollup,
# the tail (>= SPLIT) from the raw events scan.
_SPLIT = "2024-01-25 00:00:00"
_DEC = "decimal(25,6)"


@register(
    "rollup_hypertable_daily",
    f"""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    ORDER BY event_type, day
    """,
    "agg",
    "rollup",
)
def rollup_hypertable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals served from an hourly pre-agg + raw tail union.

    The oracle recomputes from raw — the rollup path must be
    indistinguishable from a full rescan.  Both partial legs keep
    decimal sums so the two-level aggregation is exact.
    """
    # Both legs bound ts on the RAW storage column (load_events_range)
    # so the bounds reach the parquet reader as min/max-prunable
    # predicates — a filter on the converted timestamp would scan every
    # row group twice.
    # --- the stored hourly rollup (production: incrementally maintained)
    rollup = (
        load_events_range(spark, sf_dir, ts_lt=_SPLIT)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_partial"),
            F.sum(F.col("value").cast(_DEC)).alias("sum_partial"),
        )
    )
    rollup_daily = rollup.select(
        "event_type",
        F.date_trunc("day", "hour").alias("day"),
        "n_partial",
        "sum_partial",
    )

    # --- the raw tail (production: the last few hours not yet rolled up)
    tail_daily = (
        load_events_range(spark, sf_dir, ts_ge=_SPLIT)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_partial"),
            F.sum(F.col("value").cast(_DEC)).alias("sum_partial"),
        )
    )

    return (
        rollup_daily.unionByName(tail_daily)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_partial").alias("n_events"),
            F.sum("sum_partial").cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "sum_value",
        )
        .orderBy("event_type", "day")
    )


@register("sketch_hll_rollup_merge", None, "agg", "approx", "rollup")
def sketch_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of distinct users,
    merged across days per event_type — the sketch analogue of
    rollup_hypertable_daily for non-additive measures (distinct counts
    can't be pre-summed; sketches make them mergeable).

    At 100 TB: the rollup table stores one ~1.5 KB HLL binary per
    (event_type, day); any date-range distinct-users query unions the
    sketches instead of re-scanning raw events.  Values are
    algorithm-specific (Apache DataSketches HLL_4), so the check is
    rows-only; the exact distinct sits alongside for the catalog's
    exactness coverage (agg_distinct_priority).
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("user_sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias(
                "approx_users"
            ),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("event_type")
    )

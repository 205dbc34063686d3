"""kbrowse scan-pipeline operators as oracle-checked catalog queries.

The engine's own integration tests (tests/test_kbrowse_parity.py) pin
the reference's golden behaviors; these queries additionally put the
scan pipeline's *semantics* under the DuckDB oracle at sf0.01, using an
envelope view derived from the ``events`` table (topic='events',
partition=user_id%10, offset=event_id, key=user_id, value=props).

Spark `rlike` is find(); kbrowse `re-matches` is full-match (SURVEY
Q2) — Spark side anchors with \\A(?:..)\\z, DuckDB side uses
``regexp_full_match``, which has exactly the reference's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.plans.planner import anchored
from kbrowse_spark.sources.fixture import envelope_from_events

_SQL_ENVELOPE = """
  SELECT CAST(user_id AS VARCHAR) AS key_str,
         props AS value_str,
         'events' AS topic,
         CAST(user_id % 10 AS INT) AS "partition",
         event_id AS "offset",
         ts AS "timestamp"
  FROM events
"""


def _envelope_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = envelope_from_events(spark, sf_dir)
    return env.select(
        F.col("key").cast("string").alias("key_str"),
        F.col("value").cast("string").alias("value_str"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


@register(
    "kbrowse_regex_scan",
    f"""
    WITH env AS ({_SQL_ENVELOPE})
    SELECT type, topic, "partition", "offset",
           strftime("timestamp", '%Y-%m-%d %H:%M:%S') AS ts, key_str, value_str
    FROM (SELECT 'result' AS type, * FROM env
          WHERE regexp_full_match(key_str, '1[0-9]')
            AND regexp_full_match(value_str, '.*"k": 4[0-9].*'))
    ORDER BY "offset"
    """,
    "kbrowse",
)
def kbrowse_regex_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive full-match regex filter (O13/Q2): keys 10-19 AND
    props containing k in 40-49.  The filter is pushed into the parquet
    scan by Catalyst (no full materialization of the envelope)."""
    env = _envelope_str(spark, sf_dir)
    return (
        env.filter(
            F.col("key_str").rlike(anchored("1[0-9]"))
            & F.col("value_str").rlike(anchored('.*"k": 4[0-9].*'))
        )
        .select(
            F.lit("result").alias("type"),
            "topic",
            "partition",
            "offset",
            F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "key_str",
            "value_str",
        )
        .orderBy("offset")
    )


@register(
    "kbrowse_scan_window",
    f"""
    WITH env AS ({_SQL_ENVELOPE}),
    snap AS (
      SELECT "partition", MIN("offset") AS earliest, MAX("offset") + 1 AS latest
      FROM env GROUP BY "partition")
    SELECT e.partition,
           COUNT(*) AS n_scanned,
           MIN(e.offset) AS first_offset,
           MAX(e.offset) AS last_offset
    FROM env e JOIN snap s ON e.partition = s.partition
    WHERE e.offset >= LEAST(s.earliest + 700, s.latest)
      AND e.offset < s.latest
    GROUP BY e.partition
    ORDER BY e.partition
    """,
    "kbrowse",
)
def kbrowse_scan_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-offset scan window (O6/O8/Q9): per-partition snapshot
    [earliest, latest), start = clamp(earliest+700).  On a Kafka source
    this compiles to startingOffsets JSON; here the same math runs as a
    broadcast join against the snapshot aggregate."""
    env = _envelope_str(spark, sf_dir)
    snap = env.groupBy("partition").agg(
        F.min("offset").alias("earliest"), (F.max("offset") + 1).alias("latest")
    )
    e, s = env.alias("e"), F.broadcast(snap).alias("s")
    return (
        e.join(s, F.col("e.partition") == F.col("s.partition"))
        .filter(
            (F.col("e.offset") >= F.least(F.col("s.earliest") + 700, F.col("s.latest")))
            & (F.col("e.offset") < F.col("s.latest"))
        )
        .groupBy("e.partition")
        .agg(
            F.count(F.lit(1)).alias("n_scanned"),
            F.min("e.offset").alias("first_offset"),
            F.max("e.offset").alias("last_offset"),
        )
        .orderBy("partition")
    )


@register(
    "kbrowse_progress_tap",
    f"""
    WITH env AS ({_SQL_ENVELOPE})
    SELECT * FROM (
      SELECT 'offset' AS type, topic, "partition", "offset",
             strftime("timestamp", '%Y-%m-%d %H:%M:%S') AS ts_render,
             key_str, value_str
      FROM env WHERE "offset" % 500 = 0
      UNION ALL
      SELECT 'result' AS type, topic, "partition", "offset",
             CAST(epoch_ms("timestamp") AS VARCHAR) AS ts_render,
             key_str, value_str
      FROM env WHERE regexp_full_match(value_str, '.*"k": 99.*'))
    ORDER BY "offset", type
    """,
    "kbrowse",
)
def kbrowse_progress_tap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progress sampling (O16/Q5): every 500th offset emits a progress
    row regardless of match (date-rendered timestamp); result rows keep
    epoch millis — the discriminated-union output stream."""
    env = _envelope_str(spark, sf_dir)
    progress = env.filter(F.col("offset") % 500 == 0).select(
        F.lit("offset").alias("type"),
        "topic",
        "partition",
        "offset",
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("ts_render"),
        "key_str",
        "value_str",
    )
    results = env.filter(F.col("value_str").rlike(anchored('.*"k": 99.*'))).select(
        F.lit("result").alias("type"),
        "topic",
        "partition",
        "offset",
        # cast: unix_millis needs TIMESTAMP; fixture may surface ntz
        F.unix_millis(F.col("timestamp").cast("timestamp"))
        .cast("string")
        .alias("ts_render"),
        "key_str",
        "value_str",
    )
    return progress.unionByName(results).orderBy("offset", "type")

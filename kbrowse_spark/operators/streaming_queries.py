"""Structured Streaming surface, exercised through the batch-comparable
subset so the DuckDB oracle applies.

* ``stream_tumbling_counts``  — readStream over the events parquet,
  tumbling event-time windows, availableNow trigger, memory sink.
  Bounded-stream semantics == batch aggregation, so the oracle is the
  equivalent GROUP BY date_trunc.
* ``stream_dedup_users``      — streaming stateful dropDuplicates.
* ``session_window_events``   — session windows (30 min gap) — Spark's
  native session_window against a gaps-and-islands SQL oracle.

kbrowse's follow mode (SURVEY O2) builds on the same machinery in
kbrowse_spark/streaming/follow.py; here the streaming operators are
verified for correctness.  Watermark-driven late-data handling needs a
multi-batch source to be observable; covered in streaming/follow.py
tests rather than an oracle query.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.functions.determinism import dsum, sql_dsum
from kbrowse_spark.sources.tables import table_path

_counter = itertools.count()


def _stage_stream_dir(path: str) -> str:
    """The file-stream source needs a *directory*; the fixtures are
    single parquet files.  Stage a per-file symlink dir under /tmp
    (idempotent, content-addressed by source path)."""
    import hashlib
    import os

    d = os.path.join(
        "/tmp/kbrowse_stream_src", hashlib.md5(path.encode()).hexdigest()[:12]
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    if not os.path.exists(link):
        try:
            os.symlink(path, link)
        except OSError:
            import shutil

            shutil.copyfile(path, link)
    return d


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same ts handling as
    the batch loader (TIMESTAMP(NANOS) -> long -> micros)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, "events")
    static = spark.read.parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(_stage_stream_dir(path))
    if dict(static.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def _run_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Run a bounded stream (availableNow) into a memory sink and return
    the materialized result as a batch DataFrame."""
    name = f"stream_result_{next(_counter)}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


@register(
    "stream_tumbling_counts",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY window_start, event_type
    """,
    "streaming",
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows over a bounded stream
    (availableNow): identical results to the batch GROUP BY, which is
    the point — one definition of the aggregation serves both batch
    and follow mode."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "complete").orderBy("window_start", "event_type")


@register(
    "stream_sliding_counts",
    f"""
    WITH ex AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '15 minutes', ts)
               - k * INTERVAL '15 minutes' AS ws
      FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k))
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM ex
    GROUP BY ws, event_type
    ORDER BY window_start, event_type
    """,
    "streaming",
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1-hour size, 15-minute slide): each
    event lands in 4 overlapping windows.  Same bounded-stream
    (availableNow) formulation as the tumbling variant; the oracle
    expands each event into its 4 slide-aligned window starts
    (time_bucket - k*slide), which is exactly Spark's epoch-aligned
    window assignment."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "complete").orderBy("window_start", "event_type")


@register(
    "stream_dedup_users",
    """
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
    "streaming",
)
def stream_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dropDuplicates on (user_id, event_type) —
    the streaming form of exact dedup. State size = number of distinct
    keys; in production bounded via dropDuplicatesWithinWatermark."""
    ev = _events_stream(spark, sf_dir)
    dedup = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _run_to_memory(dedup, "append").orderBy("user_id", "event_type")


@register(
    "stream_stateful_user_totals",
    f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    "streaming",
    "stateful",
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming op: applyInPandasWithState keeps a
    per-user (count, fixed-point sum) accumulator across micro-batches
    and emits the running totals each batch.  On a bounded stream the
    final emission equals the batch GROUP BY — which is the oracle.

    State is two ints per key — the custom-operator pattern for
    accumulators that built-in aggregations can't express (the fixed
    point here stands in for arbitrary Python state logic).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _events_stream(spark, sf_dir).select("user_id", "value")

    def update(key, batches, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            cents += int(pdf["value"].map(lambda v: int(v * 100 // 1)).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    out = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_cents long",
            stateStructType="n long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    result = _run_to_memory(out, "update")
    # Bounded single-pass stream: the last emission per user is final.
    from pyspark.sql import Window as W

    latest = result.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id").orderBy(F.col("n_events").desc())
        ),
    ).filter(F.col("rn") == 1)
    return latest.select("user_id", "n_events", "total_cents").orderBy("user_id")


@register(
    "stream_static_enrich",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    "streaming",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (broadcast per micro-batch), then aggregated
    INSIDE the stream to (segment, user) grain in update mode — the
    memory sink receives one running count per key, not the row-level
    event grain.  The post-sink step only resolves each key's final
    count (max of the monotone running counts) and folds the exact
    distinct-user count — the one piece streaming state can't express
    without a second state layer."""
    from kbrowse_spark.sources.tables import load

    ev = _events_stream(spark, sf_dir)
    cust = F.broadcast(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    joined = ev.join(cust, ev.user_id == cust.c_custkey)
    per_user = joined.groupBy("c_mktsegment", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    result = _run_to_memory(per_user, "update")
    final = result.groupBy("c_mktsegment", "user_id").agg(F.max("n").alias("n"))
    return (
        final.groupBy("c_mktsegment")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_users"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "session_window_events",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    "streaming",
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) via Spark's native
    session_window — verified against a gaps-and-islands formulation.
    session_window end = last event + gap, mirrored in the oracle."""
    from kbrowse_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("session_window.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )

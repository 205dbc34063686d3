"""Kafka-envelope-shaped sources for offline execution and tests.

The envelope schema mirrors Spark's Kafka source output exactly
(`key, value, topic, partition, offset, timestamp, timestampType`), so
every operator downstream of the source is source-agnostic: swap the
fixture for the real ``format("kafka")`` reader and nothing changes
(kbrowse's record envelope: `src/kbrowse/search.clj:34-42`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kbrowse_spark.functions.partitioner import default_partition

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), False),
    ]
)


def envelope_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read an envelope-shaped parquet (tests stage these).  A parquet
    in the driver's ``events`` table shape (user_id/event_id/props/ts)
    is adapted into the envelope automatically, so the CLI runs
    directly against /root/testdata/sf*/events.parquet."""
    # TIMESTAMP(NANOS) handling, same as tables.load.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    missing = {f.name for f in ENVELOPE_SCHEMA} - set(df.columns)
    if missing:
        if {"user_id", "event_id", "props", "ts"} <= set(df.columns):
            ts = F.col("ts")
            if dict(df.dtypes).get("ts") == "bigint":
                ts = F.timestamp_micros(F.expr("ts div 1000"))
            return df.select(
                F.encode(F.col("user_id").cast("string"), "UTF-8").alias("key"),
                F.encode(F.col("props"), "UTF-8").alias("value"),
                F.lit("events").alias("topic"),
                (F.col("user_id") % 10).cast("int").alias("partition"),
                F.col("event_id").alias("offset"),
                ts.alias("timestamp"),
                F.lit(0).alias("timestampType"),
            )
        raise ValueError(f"fixture at {path} missing envelope columns {missing}")
    return df.select([f.name for f in ENVELOPE_SCHEMA])


def envelope_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver-generated ``events`` table into an envelope:
    topic='events', partition=user_id%10, offset=event_id,
    key=user_id bytes, value=props bytes."""
    from kbrowse_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.encode(F.col("user_id").cast("string"), "UTF-8").alias("key"),
        F.encode(F.col("props"), "UTF-8").alias("value"),
        F.lit("events").alias("topic"),
        (F.col("user_id") % 10).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def golden_topic_a(spark: SparkSession) -> DataFrame:
    """The reference integration-test fixture (FIXTURES.md A2): topic-a,
    10 partitions, records (k0,v0) (k0,v1) (k2,v2) placed by the real
    DefaultPartitioner math — reproduces the golden fact k2 -> p3
    (`run-integration-tests:145-150`)."""
    import datetime

    n_partitions = 10
    rows = []
    offsets: dict[int, int] = {}
    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    for i, (k, v) in enumerate([("k0", "v0"), ("k0", "v1"), ("k2", "v2")]):
        p = default_partition(k, n_partitions)
        o = offsets.get(p, 0)
        offsets[p] = o + 1
        rows.append(
            (
                k.encode(),
                v.encode(),
                "topic-a",
                p,
                o,
                base + datetime.timedelta(seconds=i),
                0,
            )
        )
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)

"""Relational table catalog over the driver-generated parquet fixtures.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per table
under a scale-factor directory.  ``load`` returns a plain DataFrame scan
so Catalyst can push filters/column pruning into the parquet reader; we
never cache or collect here.

Small dimensions (region, nation, supplier at low SF) are good broadcast
candidates — the operator layer wraps them with ``F.broadcast`` where a
join's dim side is known-small.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor
# (region: 5 rows, nation: 25 rows — fixed-size in TPC-H-style data).
ALWAYS_BROADCAST = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
        # reader rejects unless told to surface it as long.  Set at
        # runtime so this works on any caller-provided session (the
        # driver's session does not carry our builder confs).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong: truncate to micros the
        # same way DuckDB/Arrow do (integer floor division).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_events_range(
    spark: SparkSession,
    sf_dir: str,
    *,
    ts_ge: str | None = None,
    ts_lt: str | None = None,
) -> DataFrame:
    """Events scan with timestamp bounds applied to the RAW storage
    column before the nanos→micros conversion.

    ``load`` surfaces events.ts as ``timestamp_micros(raw div 1000)``;
    a filter written against that computed column cannot push down, so
    a bounded scan would still read every row group.  Because the
    conversion is monotonic (integer floor division), ``converted <
    T`` ⟺ ``raw < T_nanos`` for whole-second bounds — so filtering the
    raw long column first is equivalent AND reaches the parquet reader
    as a min/max-prunable predicate.  At 100 TB (date-partitioned
    events) this same rewrite is what turns a time-bounded query into
    a partition-pruned one.

    Bounds are ``'YYYY-MM-DD HH:MM:SS'`` UTC wall-clock strings.
    """
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    raw_nanos = dict(df.dtypes).get("ts") == "bigint"

    def _nanos(s: str) -> int:
        dt = datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    if raw_nanos:
        if ts_ge is not None:
            df = df.filter(F.col("ts") >= _nanos(ts_ge))
        if ts_lt is not None:
            df = df.filter(F.col("ts") < _nanos(ts_lt))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        if ts_ge is not None:
            df = df.filter(F.col("ts") >= F.lit(ts_ge).cast("timestamp"))
        if ts_lt is not None:
            df = df.filter(F.col("ts") < F.lit(ts_lt).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)

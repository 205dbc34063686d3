"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what a 1000-executor cluster deployment would
set per-executor: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), Arrow for any Python exchange, UTC session time,
shuffle partitions sized to the parallelism actually available instead of
the legacy 200 default.  At cluster scale the same builder is used with
``master`` unset and ``spark.sql.shuffle.partitions`` raised to
~2-3x total cores by the deployment config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kbrowse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-appropriate defaults."""
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime row-level filtering: inject a bloom filter built from
        # the small side of a shuffle join into the big side's scan —
        # at 100 TB this prunes most of a selective join's probe input
        # before the shuffle (no-op for broadcast joins).  NOTE: do NOT
        # also set runtimeFilter.semiJoinReduction here — on this Spark
        # build enabling it makes every py4j/planning round-trip
        # pathologically slow (empirically: session startup alone goes
        # from 5 s to >150 s).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Fixture events.parquet stores ts as TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type, so read as long and convert at the
        # source (see sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Plan builder: QuerySpec -> DataFrame scan pipeline.

The Spark-native equivalent of kbrowse's `search` prologue + poll loop
(`src/kbrowse/search.clj:128-201`), re-expressed declaratively:

* partition resolution -> source pruning (``assign`` option / fixture
  partition filter) — never a post-hoc filter over data we could have
  skipped reading
* offset-window snapshot -> ``startingOffsets``/``endingOffsets`` (Q4)
* regex filter -> anchored ``rlike`` (Q2: Java `matches()` semantics
  via ``\\A(?:pat)\\z``) — Catalyst pushes it to the scan boundary
* progress tap (O16) -> a side branch unioned in (Q5: progress rows are
  emitted for every n-th offset regardless of match)

The output DataFrame is the *discriminated-union row stream*
(type: offset|result) ordered by (topic, partition, offset) — the
deterministic order SURVEY §7 mandates for stable output hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.functions.decoders import msgpack_str_udf, string_decode
from kbrowse_spark.plans.query_spec import QuerySpec, QuerySpecError
from kbrowse_spark.sources.fixture import envelope_from_parquet
from kbrowse_spark.sources.kafka import (
    kafka_batch_options,
    resolve_partitions,
)


def anchored(regex: str) -> str:
    r"""Full-match anchoring (Q2): Spark `rlike` is find(); the
    reference's `re-matches` is Java matches().  \A...\z (not ^...$)
    so embedded newlines can't fake a match."""
    return r"\A(?:" + regex + r")\z"


def _decode(
    df: DataFrame,
    col: str,
    deserializer: str,
    avro_schema: str | None = None,
    registry_url: str | None = None,
) -> DataFrame:
    out = f"{col}_str"
    if deserializer == "string":
        return df.withColumn(out, string_decode(F.col(col)))
    if deserializer == "msgpack":
        return df.withColumn(out, msgpack_str_udf()(F.col(col)))
    if deserializer == "avro":
        if avro_schema:
            # Pure-Python Avro decode (spark-avro jar unavailable
            # offline; on a cluster swap in from_avro + header strip —
            # see functions/avro.py).
            from kbrowse_spark.functions.avro import avro_str_udf

            return df.withColumn(out, avro_str_udf(avro_schema)(F.col(col)))
        if registry_url:
            # Writer schema per record from the registry by wire-header
            # id (reference KafkaAvroDeserializer behavior).
            from kbrowse_spark.functions.avro import avro_registry_udf

            return df.withColumn(out, avro_registry_udf(registry_url)(F.col(col)))
        # No schema known: surface the raw body after the wire header.
        from kbrowse_spark.functions.decoders import confluent_avro_payload

        return df.withColumn(out, string_decode(confluent_avro_payload(col)))
    raise QuerySpecError(f"unknown deserializer {deserializer!r}")


def load_envelope(spark: SparkSession, spec: QuerySpec) -> DataFrame:
    """Source DataFrame in Kafka-envelope shape, with partition pruning
    already applied at the source."""
    if spec.source_parquet:
        df = envelope_from_parquet(spark, spec.source_parquet)
        if spec.topics:
            df = df.filter(F.col("topic").isin(spec.topics))
        assignment = _fixture_assignment(df, spec)
        if assignment is not None:
            pairs = [(t, p) for t, ps in assignment.items() for p in ps]
            cond = F.lit(False)
            for t, p in pairs:
                cond = cond | ((F.col("topic") == t) & (F.col("partition") == p))
            df = df.filter(cond)
        return df
    if spec.bootstrap_servers:
        counts = _broker_partition_counts(spec)
        assignment = resolve_partitions(
            spec.topics,
            counts,
            spec.partitions,
            spec.key_regex if spec.default_partition else None,
        )
        opts = kafka_batch_options(
            spec.bootstrap_servers,
            assignment,
            starting_offsets="earliest"
            if spec.relative_offset is None
            else _broker_starting_offsets(spec, assignment),
            ending_offsets="latest",
            min_partitions=spec.min_partitions,
        )
        reader = spark.read.format("kafka")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()
    raise QuerySpecError("no source: set source_parquet or bootstrap_servers")


def _fixture_assignment(df: DataFrame, spec: QuerySpec) -> dict | None:
    """Partition resolution for the fixture path.  Returns None when no
    pruning applies (all partitions)."""
    if not spec.default_partition and not spec.partitions:
        return None
    # Partition counts: prefer the explicit hint — data inference
    # (max+1) under-counts when high partitions are empty, which would
    # silently break murmur2 default-partition pruning.  The Kafka path
    # always has the true count from broker metadata
    # (kbrowse kafka.clj:51-57); the fixture path needs the hint.
    if spec.num_partitions is not None:
        topics = spec.topics or [
            r["topic"] for r in df.select("topic").distinct().collect()
        ]
        counts = {t: spec.num_partitions for t in topics}
    else:
        counts = {
            r["topic"]: r["n"]
            for r in df.groupBy("topic")
            .agg((F.max("partition") + 1).alias("n"))
            .collect()
        }
    topics = spec.topics or sorted(counts)
    return resolve_partitions(
        [t for t in topics if t in counts],
        counts,
        spec.partitions,
        spec.key_regex if spec.default_partition else None,
    )


def _broker_partition_counts(spec: QuerySpec) -> dict[str, int]:
    try:
        from kafka import KafkaConsumer  # type: ignore  # noqa: F401
    except ImportError as e:  # pragma: no cover - no client in this env
        raise QuerySpecError(
            "Kafka source requires the kafka-python client for metadata "
            "(not installed in this environment); use --source-parquet"
        ) from e
    consumer = KafkaConsumer(bootstrap_servers=spec.bootstrap_servers)
    try:
        return {t: len(consumer.partitions_for_topic(t) or ()) for t in spec.topics}
    finally:
        consumer.close()


def _broker_starting_offsets(spec: QuerySpec, assignment: dict) -> str:
    from kafka import KafkaConsumer, TopicPartition  # type: ignore

    from kbrowse_spark.sources.kafka import starting_offsets_json

    consumer = KafkaConsumer(bootstrap_servers=spec.bootstrap_servers)
    try:
        tps = [TopicPartition(t, p) for t, ps in assignment.items() for p in ps]
        earliest = {
            (tp.topic, tp.partition): o
            for tp, o in consumer.beginning_offsets(tps).items()
        }
        latest = {
            (tp.topic, tp.partition): o for tp, o in consumer.end_offsets(tps).items()
        }
        return starting_offsets_json(
            assignment, earliest, latest, spec.relative_offset
        )
    finally:
        consumer.close()


def _fixture_window_condition(
    snapshot_df: DataFrame, spec: QuerySpec, bounded: bool = True
):
    """Scan-window filter condition from a plan-time snapshot of
    per-partition [earliest, latest): relative-offset with Q9 clamping,
    bounded by the snapshot (Q4).  Shared by the batch planner and
    follow mode (which passes bounded=False: the reference's follow
    ignores the stop bound but still honors the starting seek —
    search.clj:179,166).  Returns None when no window applies."""
    if spec.relative_offset is None:
        return None
    from kbrowse_spark.sources.kafka import clamp_offset

    snap = (
        snapshot_df.groupBy("topic", "partition")
        .agg(F.min("offset").alias("earliest"), (F.max("offset") + 1).alias("latest"))
        .collect()
    )
    cond = F.lit(False)
    for r in snap:
        e, l = r["earliest"], r["latest"]
        n = spec.relative_offset
        start = clamp_offset(e + n if n >= 0 else l + n, e, l)
        part_cond = (
            (F.col("topic") == r["topic"])
            & (F.col("partition") == r["partition"])
            & (F.col("offset") >= start)
        )
        if bounded:
            part_cond = part_cond & (F.col("offset") < l)
        cond = cond | part_cond
    return cond


def _apply_offset_window(df: DataFrame, spec: QuerySpec) -> DataFrame:
    """Fixture-path scan window (see _fixture_window_condition); on the
    Kafka path this logic compiles into source options instead."""
    cond = _fixture_window_condition(df, spec)
    return df if cond is None else df.filter(cond)


def build_scan(
    spark: SparkSession, spec: QuerySpec, *, deterministic_order: bool = True
) -> DataFrame:
    """Full pipeline: envelope -> window -> decode -> regex filter ->
    discriminated union (offset|result rows).

    Output columns: type, topic, partition, offset, timestamp,
    key_str, value_str.

    ``deterministic_order=True`` (default — the oracle-hash / CLI
    path) totally orders by (topic, partition, offset, type): the
    reference's per-partition arrival (offset) order, made total.
    ``False`` (service emission at scale) sorts within partitions
    only — no cluster-wide exchange for a sort the wire protocol
    doesn't require.
    """
    env = load_envelope(spark, spec)
    env = _apply_offset_window(env, spec)
    if spec.start_timestamp:
        # The reference validates --start-timestamp but never applies it
        # (SURVEY O9: consumed at cli.clj:65-66, unused in search.clj) —
        # implemented for real here; on the Kafka path the same bound
        # also compiles to startingOffsetsByTimestamp, with this filter
        # as the exactness residual (offset-for-time is batch-granular).
        env = env.filter(
            F.col("timestamp") >= F.lit(spec.start_timestamp).cast("timestamp")
        )
    if spec.stop_timestamp:
        env = env.filter(
            F.col("timestamp") <= F.lit(spec.stop_timestamp).cast("timestamp")
        )

    env = _decode(
        env, "key", spec.key_deserializer, spec.avro_key_schema,
        spec.schema_registry_url,
    )
    env = _decode(
        env, "value", spec.value_deserializer, spec.avro_value_schema,
        spec.schema_registry_url,
    )

    base_cols = [
        "topic",
        "partition",
        "offset",
        "timestamp",
        "key_str",
        "value_str",
    ]

    matched = env
    if spec.key_regex is not None:
        matched = matched.filter(F.col("key_str").rlike(anchored(spec.key_regex)))
    if spec.value_regex is not None:
        matched = matched.filter(F.col("value_str").rlike(anchored(spec.value_regex)))
    results = matched.select(F.lit("result").alias("type"), *base_cols)

    if spec.print_offset:
        # Q5: progress rows sample the *unfiltered* stream.
        progress = env.filter((F.col("offset") % spec.print_offset) == 0).select(
            F.lit("offset").alias("type"), *base_cols
        )
        out = progress.unionByName(results)
    else:
        out = results

    # Emission order (SURVEY §7 hard-point 1).  Deterministic mode:
    # event-time first — preserves per-partition offset order on
    # monotonic producers AND reproduces the reference's arrival-order
    # interleave on its own integration fixtures — then (topic,
    # partition, offset) as total tie-break; 'offset' (progress) rows
    # sort before 'result' rows for the same record.  Scale mode
    # sorts within partitions only: per-Kafka-partition offset order
    # (exactly the reference's guarantee) without a cluster-wide
    # exchange.
    if deterministic_order:
        return out.orderBy("timestamp", "topic", "partition", "offset", "type")
    return out.sortWithinPartitions("topic", "partition", "offset", "type")

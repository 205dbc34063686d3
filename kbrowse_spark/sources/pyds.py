"""Custom Python data source (Spark 4 `pyspark.sql.datasource` API):
row-group-parallel parquet reader used as the connector-pattern demo.

The reference engine's one "connector" is its Kafka consumer loop
(`/root/reference/src/kbrowse/kafka.clj:61-123` — assign partitions,
seek, poll); the Spark-native analogue of that planning step is a
DataSourceV2 implementation: `partitions()` declares the parallel
splits (Kafka partitions there, parquet row groups here), and each
task's `read(partition)` pulls exactly its split.  Spark 4 exposes
that contract to pure Python, with Arrow RecordBatch emission so the
data never row-iterates through Python objects.

This module implements the contract over parquet row groups:

* ``partitions()`` (driver): read ONLY the file footer, one
  ``InputPartition`` per row group — split planning without data I/O,
  the same shape as a Kafka source listing (topic, partition, offset
  range) triples.
* ``read(partition)`` (executor): open the file, read just that row
  group's projected columns via pyarrow, yield ``RecordBatch``es.

At 100 TB the same class shape points at an object-store listing (one
InputPartition per file × row-group) — the point here is the
partition-planning + Arrow-batch plumbing, which is real and tested.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Columns surfaced by the demo source (ts is TIMESTAMP(NANOS) in the
# fixture — deliberately excluded to keep the wire schema engine-neutral;
# the envelope/batch loaders own that conversion).
_COLUMNS = ["event_id", "user_id", "event_type", "value"]
_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


class RowGroupInputPartition(InputPartition):
    def __init__(self, index: int) -> None:
        self.index = index


class EventsRowGroupReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("events_rowgroups source requires option 'path'")
        self._stat_filters: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):
        """Filter pushdown (Spark 4.1 Python DSv2,
        ``spark.sql.python.filterPushdown.enabled``): comparison
        filters on source columns are kept for STATISTICS-BASED
        row-group pruning in :meth:`partitions` — the same footer
        min/max elimination the native parquet reader does, which at
        100 TB is the difference between touching every split and
        touching the few a selective predicate allows.

        ALL filters are returned as unhandled (advisory pushdown):
        stats can only prove a row group empty, not filter rows, so
        Spark re-applies every predicate post-scan and correctness
        never depends on the statistics.
        """
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        kept = []
        for f in filters:
            if (
                isinstance(
                    f,
                    (
                        EqualTo,
                        GreaterThan,
                        GreaterThanOrEqual,
                        LessThan,
                        LessThanOrEqual,
                    ),
                )
                and len(f.attribute) == 1
                and f.attribute[0] in _COLUMNS
            ):
                self._stat_filters.append(
                    (type(f).__name__, f.attribute[0], f.value)
                )
            kept.append(f)
        return kept  # everything re-applied by Spark (advisory only)

    def partitions(self):  # driver-side split planning: footer only
        import pyarrow.parquet as pq

        md = pq.read_metadata(self.path)
        if md.num_row_groups == 0:
            return []
        col_idx = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        parts = []
        for g in range(md.num_row_groups):
            keep = True
            for op, col, val in self._stat_filters:
                st = md.row_group(g).column(col_idx[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot prune, keep
                lo, hi = st.min, st.max
                if op == "EqualTo":
                    keep = lo <= val <= hi
                elif op == "GreaterThan":
                    keep = hi > val
                elif op == "GreaterThanOrEqual":
                    keep = hi >= val
                elif op == "LessThan":
                    keep = lo < val
                elif op == "LessThanOrEqual":
                    keep = lo <= val
                if not keep:
                    break
            if keep:
                parts.append(RowGroupInputPartition(g))
        return parts

    def read(self, partition):  # executor-side: one row group per task
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self.path)
        table = pf.read_row_group(partition.index, columns=_COLUMNS)
        yield from table.to_batches()


class EventsRowGroupDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_rowgroups"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return EventsRowGroupReader(self.options)


def register_events_rowgroup_source(spark) -> None:
    """Idempotently register the custom source on a session.

    The module is registered for cloudpickle by-value serialization
    first: the data-source class is pickled to the planner/executor
    Python workers, which do NOT have this package importable when the
    engine is driven by file-path import on a bare session (the driver
    contract) — by-reference pickling would crash with
    ModuleNotFoundError there.  Same pattern as functions/decoders.py.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    # The reader implements pushFilters(); Spark REFUSES such a reader
    # outright (DATA_SOURCE_PUSHDOWN_DISABLED) unless this conf is on.
    # It is a runtime conf, and the driver's bare session won't carry
    # it — the engine sets what it needs at registration time, the
    # same contract as nanosAsLong in sources/tables.py.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EventsRowGroupDataSource)

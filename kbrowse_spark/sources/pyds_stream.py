"""Streaming custom Python data source (Spark 4
`pyspark.sql.datasource` streaming API): the reference's follow loop as
a first-class Structured Streaming connector.

kbrowse's follow mode is a poll loop — track end offsets, consume
what's new, repeat (`/root/reference/src/kbrowse/kafka.clj:61-123`,
`search.clj` follow path).  The Spark-native form of that contract is a
`DataSourceStreamReader`:

* ``initialOffset`` / ``latestOffset`` (driver): the offset is the
  count of data files in an append-only staging directory, sorted by
  name — the same monotone cursor as a Kafka (partition, end-offset)
  map, discovered by listing only (no data I/O).
* ``partitions(start, end)`` (driver): one ``InputPartition`` per
  newly-arrived file — each micro-batch plans exactly the new splits.
* ``read(partition)`` (executor): pyarrow reads the file and emits
  Arrow ``RecordBatch``es — data never row-iterates through Python.

At 100 TB the same class shape points at an object-store listing or a
real broker; the offset/partition/read plumbing here is the real
contract, exercised end-to-end in tests (mid-stream arrival included)
and by the ``stream_pyds_follow`` catalog query.

Append-only by NAME: files must arrive with lexicographically
increasing names (the tests stage ``000.parquet``, ``001.parquet``, …)
— exactly a Kafka offset's contract.  A file renamed or inserted
out of order would alias an already-committed offset range.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# Same engine-neutral wire schema as the batch row-group source
# (sources/pyds.py): ts is TIMESTAMP(NANOS) in the fixture and is owned
# by the envelope loaders, not the connector.
_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"
_COLUMNS = ["event_id", "user_id", "event_type", "value"]


def _list_data_files(path: str) -> list[str]:
    import os

    return sorted(f for f in os.listdir(path) if f.endswith(".parquet"))


class FollowFileInputPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class EventsFollowStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("events_follow source requires option 'path'")

    def initialOffset(self) -> dict:
        # Seek-to-beginning (the reference's default; SURVEY O7).
        return {"files": 0}

    def latestOffset(self) -> dict:
        return {"files": len(_list_data_files(self.dir))}

    def partitions(self, start: dict, end: dict):
        import os

        files = _list_data_files(self.dir)[start["files"] : end["files"]]
        return [
            FollowFileInputPartition(os.path.join(self.dir, f)) for f in files
        ]

    def read(self, partition):
        import pyarrow.parquet as pq

        table = pq.ParquetFile(partition.path).read(columns=_COLUMNS)
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        # Offsets are derived from the immutable directory listing;
        # nothing to acknowledge (Kafka analogue: auto-commit off, the
        # checkpoint owns progress — SURVEY O6).
        pass


class EventsFollowDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_follow"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> EventsFollowStreamReader:
        return EventsFollowStreamReader(self.options)


def register_events_follow_source(spark) -> None:
    """Idempotently register the streaming source on a session.

    Registered for cloudpickle by-value serialization first: the driver
    contract imports the engine by file path on a bare session, where
    this package is NOT importable in the planner/executor Python
    workers — by-reference pickling would crash (same pattern as
    sources/pyds.py / functions/decoders.py).
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(EventsFollowDataSource)

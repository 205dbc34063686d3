"""Live-broker integration harness — the reference's
`run-integration-tests` flow (produce golden records, scan via the
engine, assert the JSON protocol) against a REAL Kafka.

This container has no broker and no kafka client, so the whole module
skips; on a machine with both, run:

    KBROWSE_IT_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_integration.py

Requirements there: a reachable broker with auto-topic-create (the
reference's run-zookeeper-and-kafka config), the kafka-python client,
and the spark-sql-kafka package on the Spark session's classpath
(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>).

Reference assertions reproduced: key exact/fuzzy, partition pruning by
murmur2 default-partition, relative-offset tail
(`run-integration-tests:105-150`).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KBROWSE_IT_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="live-broker integration: set KBROWSE_IT_BOOTSTRAP=host:9092",
)


@pytest.fixture(scope="module")
def golden_topic():
    """Produce the reference's golden records (k0,v0) (k0,v1) (k2,v2)
    into a fresh topic and return its name."""
    kafka = pytest.importorskip("kafka")
    topic = f"kbrowse-it-{uuid.uuid4().hex[:8]}"
    prod = kafka.KafkaProducer(bootstrap_servers=BOOTSTRAP)
    for k, v in ((b"k0", b"v0"), (b"k0", b"v1"), (b"k2", b"v2")):
        prod.send(topic, key=k, value=v)
    prod.flush()
    prod.close()
    return topic


def _scan(spark, **kw) -> list[dict]:
    from kbrowse_spark.plans.planner import build_scan
    from kbrowse_spark.plans.query_spec import QuerySpec
    from kbrowse_spark.sinks.pioneer import collect_protocol

    spec = QuerySpec(bootstrap_servers=BOOTSTRAP, **kw).validate()
    return json.loads(collect_protocol(build_scan(spark, spec)))


def test_key_exact(spark, golden_topic):
    rows = _scan(spark, topics=[golden_topic], key_regex="k0")
    assert rows[0] == {"type": "pioneer"}
    assert [r["value"] for r in rows[1:]] == ["v0", "v1"]


def test_key_fuzzy_and_value(spark, golden_topic):
    rows = _scan(spark, topics=[golden_topic], key_regex="k.*")
    assert len(rows) == 4
    rows = _scan(spark, topics=[golden_topic], value_regex="v0")
    assert [r["key"] for r in rows[1:]] == ["k0"]


def test_relative_offset_tail(spark, golden_topic):
    # tail-1 per partition: k0's partition yields only v1
    rows = _scan(
        spark, topics=[golden_topic], key_regex="k0", relative_offset=-1
    )
    assert [r["value"] for r in rows[1:]] == ["v1"]


def test_default_partition_prunes(spark, golden_topic):
    # murmur2(k2) picks one partition; only v2 lives there
    rows = _scan(
        spark,
        topics=[golden_topic],
        key_regex="k2",
        default_partition=True,
    )
    assert [r["value"] for r in rows[1:]] == ["v2"]

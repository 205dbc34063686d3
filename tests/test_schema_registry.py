"""Schema-registry resolution (round-1 verdict gap #2): a fake
Confluent registry serves writer schemas by id; the avro decode path
resolves each record's wire-header id against it.

Reference behavior: `src/kbrowse/kafka.clj:38` (KafkaAvroDeserializer),
`search.clj:132-133` (registry URL injected at search time).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

SCHEMA_A = json.dumps(
    {
        "type": "record",
        "name": "EvA",
        "fields": [{"name": "id", "type": "long"}, {"name": "tag", "type": "string"}],
    }
)
SCHEMA_B = json.dumps(
    {"type": "record", "name": "EvB", "fields": [{"name": "n", "type": "long"}]}
)
# Schema EVOLUTION of EvA: same record name, one added field with a
# default — the second writer schema a topic accumulates over time.
SCHEMA_A2 = json.dumps(
    {
        "type": "record",
        "name": "EvA",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "tag", "type": "string"},
            {"name": "score", "type": "long", "default": 0},
        ],
    }
)
SCHEMAS = {1: SCHEMA_A, 2: SCHEMA_B, 3: SCHEMA_A2}


@pytest.fixture(scope="module")
def registry():
    """Fake Confluent registry: GET /schemas/ids/{id}; counts requests
    and records each request's Authorization header (or None)."""
    hits = []
    auths = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            auths.append(self.headers.get("Authorization"))
            sid = int(self.path.rsplit("/", 1)[1])
            if sid not in SCHEMAS:
                self.send_error(404)
                return
            body = json.dumps({"schema": SCHEMAS[sid]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", hits, auths
    srv.shutdown()


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _wire(schema_id: int, body: bytes) -> bytes:
    return b"\x00" + schema_id.to_bytes(4, "big") + body


def test_client_caches(registry):
    from kbrowse_spark.sources.schema_registry import (
        SchemaRegistryClient,
        SchemaRegistryError,
    )

    url, hits, _ = registry
    hits.clear()
    c = SchemaRegistryClient(url)
    assert json.loads(c.get_schema(1))["name"] == "EvA"
    assert json.loads(c.get_schema(1))["name"] == "EvA"
    assert len(hits) == 1  # second get served from cache
    with pytest.raises(SchemaRegistryError):
        c.get_schema(999)


def test_registry_udf_resolves_per_header_id(spark, registry):
    """Two records with different writer-schema ids in one scan decode
    against their own schemas — no --avro-*-schema supplied."""
    from pyspark.sql import functions as F

    from kbrowse_spark.functions.avro import avro_registry_udf

    url, hits, _ = registry
    rec_a = _wire(1, _zigzag(7) + _zigzag(2) + b"hi")  # EvA{id:7, tag:"hi"}
    rec_b = _wire(2, _zigzag(42))  # EvB{n:42}
    df = spark.createDataFrame(
        [(1, rec_a), (2, rec_b), (3, None), (4, b"plain")],
        "i int, value binary",
    )
    out = {
        r["i"]: r["s"]
        for r in df.select(
            "i", avro_registry_udf(url)(F.col("value")).alias("s")
        ).collect()
    }
    assert json.loads(out[1]) == {"id": 7, "tag": "hi"}
    assert json.loads(out[2]) == {"n": 42}
    assert out[3] == ""  # null -> "" (Q6)
    assert out[4] == "plain"  # no wire header: raw utf-8 rendering


def test_build_scan_with_registry(spark, registry, tmp_path):
    """End-to-end: QuerySpec(schema_registry_url=...) decodes avro
    values through the planner with no explicit schema."""
    import datetime

    from kbrowse_spark.plans.planner import build_scan
    from kbrowse_spark.plans.query_spec import QuerySpec
    from kbrowse_spark.sources.fixture import ENVELOPE_SCHEMA

    url, _, _ = registry
    ts = datetime.datetime(2024, 1, 1)
    rec = _wire(1, _zigzag(9) + _zigzag(3) + b"abc")
    df = spark.createDataFrame(
        [(b"k", rec, "t", 0, 0, ts, 0)], ENVELOPE_SCHEMA
    )
    path = str(tmp_path / "avro_env.parquet")
    df.write.parquet(path)
    spec = QuerySpec(
        source_parquet=path,
        topics=["t"],
        value_deserializer="avro",
        schema_registry_url=url,
        value_regex='.*"id": 9.*',
    ).validate()
    rows = build_scan(spark, spec).collect()
    assert len(rows) == 1
    assert json.loads(rows[0]["value_str"]) == {"id": 9, "tag": "abc"}


def test_service_injects_cluster_registry(spark, registry, tmp_path):
    """The service resolves the cluster's registry from config when an
    avro query doesn't pass one (reference search.clj:132-133 +
    config.clj:57-59)."""
    import datetime

    from kbrowse_spark.config import EngineConfig
    from kbrowse_spark.service.app import create_app
    from kbrowse_spark.sources.fixture import ENVELOPE_SCHEMA

    url, _, _ = registry
    ts = datetime.datetime(2024, 1, 1)
    rec = _wire(1, _zigzag(5) + _zigzag(2) + b"ok")
    df = spark.createDataFrame(
        [(b"k", rec, "t", 0, 0, ts, 0)], ENVELOPE_SCHEMA
    )
    path = str(tmp_path / "avro_env2.parquet")
    df.write.parquet(path)
    cfg = EngineConfig(
        schema_registry_urls={"localhost:9092": url},
        default_bootstrap_servers="localhost:9092",
    )
    app = create_app(spark=spark, config=cfg)
    c = app.test_client()
    r = c.get(f"/search?source-parquet={path}&topics=t&value-deserializer=avro")
    rows = json.loads(r.get_data(as_text=True))
    assert rows[1]["value"] == {"id": 5, "tag": "ok"}


def test_config_parses_registry_urls(tmp_path):
    from kbrowse_spark.config import EngineConfig

    p = tmp_path / "cfg.yml"
    p.write_text(
        "schema-registry-urls:\n  broker1:9092: http://reg1:8081\n"
        "clusters:\n  prod: broker1:9092\n"
    )
    cfg = EngineConfig.load(str(p))
    assert cfg.schema_registry_urls == {"broker1:9092": "http://reg1:8081"}


def test_client_auth_passthrough(registry):
    """Basic credentials — URL-embedded (Confluent's
    basic.auth.credentials.source=URL convention) or explicit tuple —
    must arrive as an Authorization header, and the userinfo must be
    stripped from the request URL."""
    import base64

    from kbrowse_spark.sources.schema_registry import SchemaRegistryClient

    url, hits, auths = registry
    expected = "Basic " + base64.b64encode(b"alice:s3cr%t").decode()

    hits.clear()
    auths.clear()
    with_userinfo = url.replace("http://", "http://alice:s3cr%25t@")
    c = SchemaRegistryClient(with_userinfo)
    assert json.loads(c.get_schema(1))["name"] == "EvA"
    assert auths == [expected]
    assert "@" not in c.base_url  # credentials never hit the wire in the URL

    hits.clear()
    auths.clear()
    c2 = SchemaRegistryClient(url, auth=("alice", "s3cr%t"))
    assert json.loads(c2.get_schema(2))["name"] == "EvB"
    assert auths == [expected]

    # and the default stays unauthenticated
    auths.clear()
    SchemaRegistryClient(url).get_schema(1)
    assert auths == [None]


def test_client_negative_cache(registry):
    """A 404 is negative-cached for negative_ttl seconds: repeat
    lookups of a poison schema id don't re-hit the registry until the
    TTL lapses; transport-level errors are NOT negative-cached."""
    import time

    from kbrowse_spark.sources.schema_registry import (
        SchemaNotFoundError,
        SchemaRegistryClient,
        SchemaRegistryError,
    )

    url, hits, _ = registry
    hits.clear()
    c = SchemaRegistryClient(url, negative_ttl=0.2)
    for _ in range(3):
        with pytest.raises(SchemaNotFoundError):
            c.get_schema(999)
    assert len(hits) == 1  # one wire 404, two negative-cache hits
    time.sleep(0.25)
    with pytest.raises(SchemaNotFoundError):
        c.get_schema(999)
    assert len(hits) == 2  # TTL lapsed: re-validated against the registry

    # unreachable registry -> plain SchemaRegistryError, retried freely
    dead = SchemaRegistryClient("http://127.0.0.1:1", timeout=0.2)
    for _ in range(2):
        with pytest.raises(SchemaRegistryError) as ei:
            dead.get_schema(1)
        assert not isinstance(ei.value, SchemaNotFoundError)


def test_schema_evolution_two_writer_schemas_one_topic(spark, registry):
    """Schema evolution: one topic carries records written under EvA v1
    (id 1) and EvA v2 (id 3, adds a defaulted field); each record
    decodes against its OWN writer schema resolved by wire-header id —
    the exact guarantee the Confluent wire format exists for."""
    from pyspark.sql import functions as F

    from kbrowse_spark.functions.avro import avro_registry_udf

    url, _, _ = registry
    v1 = _wire(1, _zigzag(7) + _zigzag(2) + b"hi")
    v2 = _wire(3, _zigzag(8) + _zigzag(2) + b"yo" + _zigzag(99))
    df = spark.createDataFrame([(1, v1), (2, v2)], "i int, value binary")
    out = {
        r["i"]: json.loads(r["s"])
        for r in df.select(
            "i", avro_registry_udf(url)(F.col("value")).alias("s")
        ).collect()
    }
    assert out[1] == {"id": 7, "tag": "hi"}
    assert out[2] == {"id": 8, "tag": "yo", "score": 99}

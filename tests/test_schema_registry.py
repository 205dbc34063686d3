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
SCHEMAS = {1: SCHEMA_A, 2: SCHEMA_B}


@pytest.fixture(scope="module")
def registry():
    """Fake Confluent registry: GET /schemas/ids/{id}; counts requests."""
    hits = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
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
    yield f"http://127.0.0.1:{srv.server_port}", hits
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

    url, hits = registry
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

    url, hits = registry
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

    url, _ = registry
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

    url, _ = registry
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

"""Pure-Python Avro binary decoder (public Avro 1.x spec subset).

The reference's avro path uses Confluent's KafkaAvroDeserializer with a
schema registry (`src/kbrowse/kafka.clj:38`, `search.clj:132-133`).
On a cluster with the spark-avro jar the engine would use ``from_avro``
after the 5-byte wire-header strip (JVM-fast); that jar is not loadable
in this offline environment, so decoding runs as a self-contained
Python UDF — same semantics, slower path, clearly swappable.

Supported: null, boolean, int, long (zigzag varints), float, double,
bytes, string, record, enum, array, map, union, fixed.
"""

from __future__ import annotations

import json
import struct
from typing import Any

CONFLUENT_HEADER_LEN = 5  # magic 0x00 + 4-byte big-endian schema id


def strip_confluent_header(data: bytes) -> tuple[int | None, bytes]:
    """Return (schema_id, avro_body).  Payloads not in wire format pass
    through unchanged with schema_id None."""
    if len(data) >= CONFLUENT_HEADER_LEN and data[0] == 0:
        return int.from_bytes(data[1:5], "big"), data[5:]
    return None, data


def avro_decode(schema: dict | str, data: bytes) -> Any:
    """Decode one Avro value against its writer schema."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    v, _ = _read(schema, bytes(data), 0)
    return v


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # zigzag


def _read(schema: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(schema, list):  # union: long index + value
        idx, pos = _read_long(buf, pos)
        return _read(schema[idx], buf, pos)
    if isinstance(schema, dict):
        t = schema["type"]
    else:
        t = schema
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack("<f", buf[pos : pos + 4])[0], pos + 4
    if t == "double":
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "fixed":
        n = schema["size"]
        return buf[pos : pos + n], pos + n
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        return schema["symbols"][idx], pos
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = _read(f["type"], buf, pos)
        return out, pos
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _read(schema["items"], buf, pos)
                out.append(v)
        return out, pos
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = _read("string", buf, pos)
                out[k], pos = _read(schema["values"], buf, pos)
        return out, pos
    raise ValueError(f"unsupported avro type {t!r}")


def _stringify(v: Any) -> str:
    """stringify parity with decoders.stringify (duplicated here so the
    pickled-by-value closure never imports that module on executors)."""
    import json as _json

    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        return _json.dumps(v, ensure_ascii=False, default=repr)
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return str(v)


def avro_str_udf(schema_json: str, confluent_wire: bool = True):
    """binary -> stringified decoded record UDF (pickled by value),
    Arrow-batched via ``pandas_udf``: batches cross the JVM<->Python
    boundary as Arrow buffers rather than pickled rows."""
    import sys

    import pandas as pd
    from pyspark import cloudpickle
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    def decode_one(data):
        if data is None:
            return ""
        try:
            body = bytes(data)
            if confluent_wire:
                _, body = strip_confluent_header(body)
            v = avro_decode(schema_json, body)
        except Exception:
            return bytes(data).decode("utf-8", "replace")
        return _stringify(v)

    def decode_series(s):
        return s.map(decode_one)

    # Real annotation objects (PEP 563 stringified hints don't resolve
    # for a locally-imported pandas when Spark infers the eval type).
    decode_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(decode_series, T.StringType())


def avro_registry_udf(registry_url: str):
    """binary -> stringified decoded record, with the writer schema
    resolved PER RECORD from the Confluent wire-header schema id via
    the schema registry (`GET /schemas/ids/{id}`) — the reference's
    KafkaAvroDeserializer behavior (kafka.clj:38, search.clj:132-133).

    Schemas are memoized per task (registry ids are immutable), so a
    scan of N records with k distinct writer schemas performs k HTTP
    gets per task, not N.  Payloads without the wire header pass
    through as their utf-8 rendering; a decode failure keeps the raw
    rendering (lenient, like the other decoders); an unreachable
    registry raises — a misconfigured registry should be loud, not an
    empty result.
    """
    import sys

    import pandas as pd
    from pyspark import cloudpickle
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    base = registry_url.rstrip("/")

    def decode_one(data, cache):
        import json as _json
        import urllib.request

        if data is None:
            return ""
        body = bytes(data)
        sid, payload = strip_confluent_header(body)
        if sid is None:
            return body.decode("utf-8", "replace")
        schema = cache.get(sid)
        if schema is None:
            with urllib.request.urlopen(
                f"{base}/schemas/ids/{sid}", timeout=10
            ) as r:
                schema = _json.loads(r.read().decode("utf-8"))["schema"]
            cache[sid] = schema
        try:
            v = avro_decode(schema, payload)
        except Exception:
            return body.decode("utf-8", "replace")
        return _stringify(v)

    def decode_series(s):
        cache: dict[int, str] = {}
        return s.map(lambda d: decode_one(d, cache))

    decode_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(decode_series, T.StringType())

"""Payload decoders: string, msgpack, Confluent-Avro header handling,
and best-effort JSON parse (kbrowse O11/O14 parity).

kbrowse deserializes key/value per query (`src/kbrowse/kafka.clj:34-38`),
stringifies (`search.clj:50,62,78-79`), regex-matches the stringified
form, and best-effort JSON-parses emitted rows (`search.clj:44-66`).

Spark mapping:
* string      -> ``CAST(col AS STRING)`` (JVM, codegen)
* msgpack     -> Python UDF over binary (the msgpack wheel is not
  installed here, so a minimal pure-Python decoder of the public
  msgpack spec is embedded; Arrow-batched via pandas_udf)
* avro        -> strip the 5-byte Confluent wire header (magic 0 +
  4-byte schema id), then ``from_avro`` with the registry schema;
  the header strip is `expr("substring(value, 6, ...)")`
* try-JSON    -> JVM-side: a parse probe via ``get_json_object`` /
  ``schema_of_json`` is not general enough, so the emit layer uses a
  small Python-side try-parse when rendering results (driver-side,
  already materialized rows — no executor UDF cost).

UDFs here are built as *factories returning self-contained closures*
(pickled by value) so executors never need this package importable.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def msgpack_decode_py(data: bytes) -> Any:
    """Decode one msgpack value (pure Python, public msgpack spec).

    Covers the types a Kafka payload realistically carries: nil, bool,
    int (all widths), float32/64, str/bin (all widths), array, map,
    fixext/timestamp ignored (returned as raw bytes).
    """

    def rd(buf, pos):
        b = buf[pos]
        pos += 1
        if b <= 0x7F:  # positive fixint
            return b, pos
        if b >= 0xE0:  # negative fixint
            return b - 256, pos
        if 0x80 <= b <= 0x8F:  # fixmap
            return rd_map(buf, pos, b & 0x0F)
        if 0x90 <= b <= 0x9F:  # fixarray
            return rd_arr(buf, pos, b & 0x0F)
        if 0xA0 <= b <= 0xBF:  # fixstr
            n = b & 0x1F
            return buf[pos : pos + n].decode("utf-8", "replace"), pos + n
        if b == 0xC0:
            return None, pos
        if b == 0xC2:
            return False, pos
        if b == 0xC3:
            return True, pos
        if b in (0xC4, 0xC5, 0xC6):  # bin8/16/32
            w = 1 << (b - 0xC4)
            n = int.from_bytes(buf[pos : pos + w], "big")
            pos += w
            return bytes(buf[pos : pos + n]), pos + n
        if b == 0xCA:
            import struct

            return struct.unpack(">f", buf[pos : pos + 4])[0], pos + 4
        if b == 0xCB:
            import struct

            return struct.unpack(">d", buf[pos : pos + 8])[0], pos + 8
        if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint8/16/32/64
            w = 1 << (b - 0xCC)
            return int.from_bytes(buf[pos : pos + w], "big"), pos + w
        if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int8/16/32/64
            w = 1 << (b - 0xD0)
            return int.from_bytes(buf[pos : pos + w], "big", signed=True), pos + w
        if b in (0xD9, 0xDA, 0xDB):  # str8/16/32
            w = 1 << (b - 0xD9)
            n = int.from_bytes(buf[pos : pos + w], "big")
            pos += w
            return buf[pos : pos + n].decode("utf-8", "replace"), pos + n
        if b == 0xDC:
            n = int.from_bytes(buf[pos : pos + 2], "big")
            return rd_arr(buf, pos + 2, n)
        if b == 0xDD:
            n = int.from_bytes(buf[pos : pos + 4], "big")
            return rd_arr(buf, pos + 4, n)
        if b == 0xDE:
            n = int.from_bytes(buf[pos : pos + 2], "big")
            return rd_map(buf, pos + 2, n)
        if b == 0xDF:
            n = int.from_bytes(buf[pos : pos + 4], "big")
            return rd_map(buf, pos + 4, n)
        raise ValueError(f"unsupported msgpack byte 0x{b:02x}")

    def rd_arr(buf, pos, n):
        out = []
        for _ in range(n):
            v, pos = rd(buf, pos)
            out.append(v)
        return out, pos

    def rd_map(buf, pos, n):
        out = {}
        for _ in range(n):
            k, pos = rd(buf, pos)
            v, pos = rd(buf, pos)
            out[k if isinstance(k, (str, int, float, bool)) else str(k)] = v
        return out, pos

    if data is None:
        return None
    v, _ = rd(bytes(data), 0)
    return v


def stringify(value: Any) -> str:
    """kbrowse stringification parity (`search.clj:78-79`):
    None -> "" (Q6); scalars -> str; containers -> compact JSON."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (dict, list)):
        # Documented divergence: containers render as JSON (the
        # reference renders Clojure's `str` form); regex queries over
        # decoded containers should target JSON syntax.
        return json.dumps(value, ensure_ascii=False)
    if isinstance(value, bytes):
        return value.decode("utf-8", "replace")
    return str(value)


def msgpack_str_udf():
    """binary -> stringified-decoded-value UDF, Arrow-batched.

    A ``pandas_udf`` over a Series: whole Arrow batches cross the
    JVM<->Python boundary instead of one pickled row at a time (~10x
    less per-row overhead on the scan hot path); the decode itself is
    the same pure-Python closure.  This module is registered for
    pickle-by-value so the closure ships whole to executors — they
    never need the package importable.  Decode failure keeps the raw
    bytes' utf-8 rendering, matching the reference's lenient behavior.
    """
    import sys

    import pandas as pd
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    def decode_one(data):
        if data is None:
            return ""
        try:
            v = msgpack_decode_py(bytes(data))
        except Exception:  # lenient: keep raw rendering
            return bytes(data).decode("utf-8", "replace")
        return stringify(v)

    def decode_series(s):
        return s.map(decode_one)

    # Real annotation objects (PEP 563 stringified hints don't resolve
    # for a locally-imported pandas when Spark infers the eval type).
    decode_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(decode_series, T.StringType())


def string_decode(col: Column) -> Column:
    """string deserializer: bytes -> utf-8 string; NULL -> "" (Q6)."""
    return F.coalesce(col.cast("string"), F.lit(""))


def confluent_avro_payload(col_name: str) -> Column:
    """Strip the Confluent wire-format header (magic byte 0 + 4-byte
    big-endian schema id) leaving the raw Avro body for ``from_avro``.
    Schema-registry lookup happens at plan time (service layer)."""
    return F.expr(f"substring({col_name}, 6, 2147483647)")


def confluent_schema_id(col_name: str) -> Column:
    """Extract the 4-byte big-endian schema id from the wire header."""
    return F.conv(F.hex(F.expr(f"substring({col_name}, 2, 4)")), 16, 10).cast("long")


def try_parse_json(s: str) -> Any:
    """Best-effort JSON parse (O14): parsed value, or the input as-is.
    Mirrors `search.clj:44-66` incl. Q6: "" fails -> stays ""."""
    if s is None:
        return ""
    try:
        return json.loads(s)
    except (ValueError, TypeError):
        return s

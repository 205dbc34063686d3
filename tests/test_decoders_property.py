"""Property-based round-trip tests for the pure-Python decoders:
test-local encoders (msgpack/avro per the public specs) generate
arbitrary values via hypothesis; the engine decoders must invert them.
"""

from __future__ import annotations

import struct

from hypothesis import example, given, settings
from hypothesis import strategies as st

from kbrowse_spark.functions.avro import avro_decode
from kbrowse_spark.functions.decoders import msgpack_decode_py
from kbrowse_spark.functions.partitioner import default_partition, murmur2


# --- minimal msgpack encoder (test-side only) ---------------------------

def mp_encode(v) -> bytes:
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if 0 <= v <= 0xFFFFFFFF:
            return b"\xce" + v.to_bytes(4, "big")
        return b"\xd3" + v.to_bytes(8, "big", signed=True)
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        if len(raw) <= 31:
            return bytes([0xA0 | len(raw)]) + raw
        return b"\xda" + len(raw).to_bytes(2, "big") + raw
    if isinstance(v, bytes):
        return b"\xc4" + bytes([len(v)]) + v
    if isinstance(v, list):
        if len(v) <= 15:
            head = bytes([0x90 | len(v)])
        else:
            head = b"\xdc" + len(v).to_bytes(2, "big")
        return head + b"".join(mp_encode(x) for x in v)
    if isinstance(v, dict):
        if len(v) <= 15:
            head = bytes([0x80 | len(v)])
        else:
            head = b"\xde" + len(v).to_bytes(2, "big")
        return head + b"".join(mp_encode(k) + mp_encode(x) for k, x in v.items())
    raise TypeError(type(v))


mp_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=200),
    st.binary(max_size=100),
)
mp_values = st.recursive(
    mp_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=8),
        st.dictionaries(st.text(max_size=20), inner, max_size=8),
    ),
    max_leaves=20,
)


@settings(max_examples=200, deadline=None)
@given(mp_values)
def test_msgpack_roundtrip(v):
    assert msgpack_decode_py(mp_encode(v)) == v


# --- minimal avro encoder (test-side only) ------------------------------

def zigzag(n: int) -> bytes:
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


def avro_encode(schema, v) -> bytes:
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, list):
        idx = 0 if v is None else 1
        return zigzag(idx) + avro_encode(schema[idx], v)
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return zigzag(v)
    if t == "double":
        return struct.pack("<d", v)
    if t == "string":
        raw = v.encode()
        return zigzag(len(raw)) + raw
    if t == "record":
        return b"".join(avro_encode(f["type"], v[f["name"]]) for f in schema["fields"])
    if t == "array":
        out = b""
        if v:
            out += zigzag(len(v))
            out += b"".join(avro_encode(schema["items"], x) for x in v)
        return out + zigzag(0)
    if t == "map":
        out = b""
        if v:
            out += zigzag(len(v))
            for k, x in v.items():
                out += avro_encode("string", k) + avro_encode(schema["values"], x)
        return out + zigzag(0)
    raise TypeError(t)


AVRO_SCHEMA = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
    ],
}

avro_records = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**62), max_value=2**62),
        "name": st.text(max_size=100),
        "score": st.floats(allow_nan=False),
        "flag": st.booleans(),
        "opt": st.one_of(st.none(), st.integers(-(2**31), 2**31)),
        "tags": st.lists(st.text(max_size=20), max_size=6),
        "attrs": st.dictionaries(st.text(max_size=10), st.integers(-100, 100), max_size=6),
    }
)


@settings(max_examples=200, deadline=None)
@given(avro_records)
def test_avro_roundtrip(rec):
    assert avro_decode(AVRO_SCHEMA, avro_encode(AVRO_SCHEMA, rec)) == rec


# --- murmur2 properties -------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256), st.integers(min_value=1, max_value=1000))
def test_default_partition_in_range_and_stable(key, n):
    p = default_partition(key, n)
    assert 0 <= p < n
    assert p == default_partition(key, n)
    assert 0 <= murmur2(key) <= 0xFFFFFFFF


def test_murmur2_known_vectors():
    # Golden facts derivable from the reference integration suite:
    # the DefaultPartitioner placement of k2 on a 10-partition topic
    # (run-integration-tests:145-150) plus co-location of repeated keys.
    assert default_partition(b"k2", 10) == 3
    assert default_partition(b"k0", 10) == default_partition(b"k0", 10)


# --- determinism contract: decimal sums match DuckDB on arbitrary data --

@settings(max_examples=20, deadline=None)
@example([549756.2446275])  # hypothesis-found repr-midpoint (r13)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=200,
    )
)
def test_decimal_sum_matches_duckdb(values):
    """The dsum/sql_dsum pair must agree bit-for-bit on arbitrary
    doubles regardless of summation order — the contract every
    oracle-checked aggregate relies on."""
    import duckdb

    from kbrowse_spark.functions.determinism import sql_dsum

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    duck = con.execute(f"SELECT {sql_dsum('x')} FROM t").fetchone()[0]

    # Python decimal reference of the same definition.  NOTE: both
    # engines quantize a double through its SHORTEST round-trip
    # decimal representation (Java Double.toString on the Spark side,
    # DuckDB's double->decimal cast likewise), NOT its exact binary
    # expansion — hypothesis found the divergence at 549756.2446275,
    # whose exact binary value is ...74999... (rounds DOWN) while the
    # shortest repr ends at the ...75 midpoint (rounds UP; both
    # engines agree on UP, verified against live Spark).  Python's
    # repr() is the same shortest representation, so the reference
    # must quantize Decimal(repr(v)), not Decimal(v).
    from decimal import ROUND_HALF_UP, Decimal

    ref = float(
        sum(
            Decimal(repr(v)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
            for v in values
        )
    )
    assert duck == ref

"""Microbench: row-at-a-time F.udf vs Arrow-batched pandas_udf for the
msgpack string decoder (round-1 verdict item #4).

Synthesizes N msgpack map payloads, decodes them through both UDF
shapes, and prints one JSON line with per-variant seconds.  Run:

    python tools/microbench_decoders.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from kbrowse_spark.functions import decoders  # noqa: E402
from kbrowse_spark.session import get_spark  # noqa: E402


def _pack_map(i: int) -> bytes:
    """Minimal msgpack fixmap {"id": i%128, "tag": "t<i%10>"}."""
    key1, key2 = b"\xa2id", b"\xa3tag"
    val1 = bytes([i % 128])  # positive fixint
    tag = f"t{i % 10}".encode()
    val2 = bytes([0xA0 | len(tag)]) + tag
    return b"\x82" + key1 + val1 + key2 + val2


def row_udf():
    """The pre-fix shape: plain row-at-a-time F.udf, same closure."""
    import sys as _sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(_sys.modules[decoders.__name__])

    def decode(data):
        if data is None:
            return ""
        try:
            v = decoders.msgpack_decode_py(bytes(data))
        except Exception:
            return bytes(data).decode("utf-8", "replace")
        return decoders.stringify(v)

    return F.udf(decode, T.StringType())


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("microbench_decoders")
    payloads = [(i, _pack_map(i)) for i in range(50_000)]
    base = spark.createDataFrame(payloads, "i long, value binary")
    reps = max(1, n // len(payloads))
    df = base.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
    df.write.format("noop").mode("overwrite").save()  # warm

    out = {}
    for name, udf in (("row_udf", row_udf()), ("pandas_udf", decoders.msgpack_str_udf())):
        decoded = df.select(udf(F.col("value")).alias("s"))
        decoded.write.format("noop").mode("overwrite").save()  # warm/JIT
        t0 = time.perf_counter()
        decoded.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    out["rows"] = len(payloads) * reps
    out["speedup"] = round(out["row_udf"] / out["pandas_udf"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

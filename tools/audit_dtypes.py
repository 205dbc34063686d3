"""Audit for driver-harness dtype hazards.

The driver's correctness gate materializes the Spark result via
``toPandas()`` and the DuckDB oracle via ``.df()``, canonicalizes
(sort columns by name, sort rows), and hash-compares values.  Pandas
conversion therefore matters as much as SQL semantics:

* DuckDB ``SUM(INTEGER)`` returns HUGEINT -> float64 in pandas, while
  Spark's bigint -> int64: the value hash differs (6.0 vs 6).
* list/array columns are unhashable -> the gate ERRORS.
* DECIMAL -> object(Decimal) on one side vs float64 on the other.
* tz-aware (TIMESTAMP) vs naive (TIMESTAMP_NTZ / DuckDB TIMESTAMP).

This script builds every catalog query's *schema* (lazy — no Spark job)
and runs the DuckDB oracle with a LIMIT 0 wrapper for dtypes, then
flags any column pair whose pandas dtypes would differ.  Streaming
builders execute eagerly, so they can be skipped with --skip-streaming.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from kbrowse_spark.catalog import all_queries  # noqa: E402
from kbrowse_spark.session import get_spark  # noqa: E402
from tests.oracle_check import DEFAULT_SF_DIR, duckdb_connect  # noqa: E402

# Spark simpleString dtype -> expected pandas dtype family
_SPARK_FAMILY = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "boolean": "bool",
    "date": "datetime",
    "timestamp": "datetime_tz",
    "timestamp_ntz": "datetime",
    "binary": "bytes",
}


def spark_family(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith(("array", "map", "struct")):
        return "UNHASHABLE"
    return _SPARK_FAMILY.get(dt, dt)


def duck_family(pd_dtype: str, sample) -> str:
    s = str(pd_dtype)
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s.startswith("float"):
        return "float"
    if s.startswith("datetime64[") and "UTC" in s:
        return "datetime_tz"
    if s.startswith("datetime64"):
        return "datetime"
    if s == "bool":
        return "bool"
    if s == "object":
        if sample is None:
            return "str"  # assume VARCHAR; flagged separately below
        if isinstance(sample, list):
            return "UNHASHABLE"
        if isinstance(sample, bytes):
            return "bytes"
        import decimal

        if isinstance(sample, decimal.Decimal):
            return "decimal"
        return "str"
    return s


def main() -> int:
    skip_streaming = "--skip-streaming" in sys.argv
    spark = get_spark()
    qs = all_queries()
    con = duckdb_connect(DEFAULT_SF_DIR)
    issues = 0
    for name, q in sorted(qs.items()):
        if skip_streaming and ("streaming" in q.tags or "stateful" in q.tags):
            print(f"SKIP {name} (streaming)")
            continue
        try:
            sdf = q.builder(spark, DEFAULT_SF_DIR)
            sdtypes = dict(sdf.dtypes)
        except Exception as e:  # noqa: BLE001
            issues += 1
            print(f"ERR  {name}: spark build {type(e).__name__} {str(e)[:150]}")
            continue
        # Spark-side hazards regardless of oracle
        for c, dt in sdtypes.items():
            fam = spark_family(dt)
            if fam == "UNHASHABLE":
                issues += 1
                print(f"BAD  {name}.{c}: spark {dt} (unhashable in gate)")
        if not q.oracle:
            continue
        try:
            ddf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            issues += 1
            print(f"ERR  {name}: duckdb {type(e).__name__} {str(e)[:150]}")
            continue
        if sorted(ddf.columns) != sorted(sdtypes):
            issues += 1
            print(
                f"BAD  {name}: column sets differ spark={sorted(sdtypes)} "
                f"duck={sorted(ddf.columns)}"
            )
            continue
        for c in ddf.columns:
            sample = None
            if str(ddf[c].dtype) == "object":
                nn = ddf[c].dropna()
                sample = nn.iloc[0] if len(nn) else None
            sfam = spark_family(sdtypes[c])
            dfam = duck_family(ddf[c].dtype, sample)
            if sfam == "int" and dfam == "float" and ddf[c].isna().any():
                # NULL-driven int->float64 promotion happens on BOTH
                # sides of the gate (toPandas promotes Spark's nullable
                # int too), so these hash-match — not a hazard.
                continue
            if sfam != dfam:
                issues += 1
                print(
                    f"BAD  {name}.{c}: spark {sdtypes[c]} ({sfam}) vs "
                    f"duck pandas {ddf[c].dtype} ({dfam})"
                )
    print(f"\n{'CLEAN' if issues == 0 else f'{issues} ISSUES'}")
    return 1 if issues else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and exact values
(order-insensitive).  Used by tests and by the dev loop while adding
queries; stricter than the driver (exact equality, no hashing) so that
passing here implies passing there.

Queries with ``oracle=None`` (approx sketches, libm transcendentals,
stub inference) get a QUANTITATIVE check from tests/quant_checks.py
when one is registered — tolerance against an exact DuckDB aggregate,
ULP-bounded float comparison, re-parse equality, or shape+determinism —
so "no SQL oracle" no longer means "no value verification".
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb

from kbrowse_spark.sources.tables import TABLE_NAMES, table_path

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _spark_dtype_family(dt: str) -> str:
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith(("array", "map", "struct")):
        return "UNHASHABLE"
    return {
        "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
        "float": "float", "double": "float", "string": "str",
        "boolean": "bool", "date": "datetime", "timestamp": "datetime",
        "timestamp_ntz": "datetime", "binary": "bytes",
    }.get(dt, dt)


_DUCK_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _duck_type_family(type_str: str) -> str:
    """Pandas dtype family the DRIVER's gate would materialize for a
    DuckDB logical type (it fetches the oracle via ``.df()``):
    HUGEINT — the un-cast SUM of integers — lands as float64 while
    Spark's bigint stays int64 (the classic hash-mismatch), DECIMAL as
    object(Decimal), and any nested type crashes its canonicalizer.
    Deriving the family from the PLANNED result schema means the
    oracle only has to execute once."""
    t = type_str.upper()
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "UNHASHABLE"
    if t.startswith("DECIMAL"):
        # duckdb .df() materializes EVERY decimal as float64, while
        # Spark toPandas keeps object Decimal — a decimal output
        # column can never hash-match the driver (r12: the emulator
        # caught exactly this on a DECIMAL(38,0) ledger column that
        # this mapping used to declare compatible).
        return "float"
    if t in ("HUGEINT", "UHUGEINT"):
        return "float"  # pandas has no int128: becomes float64 in the gate
    if t in _DUCK_INT_TYPES:
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "datetime"
    if t in ("BLOB", "BYTEA"):
        return "bytes"
    return "str"  # VARCHAR, ENUM, UUID, JSON


def _dtype_hazards(spark_dtypes: dict, duck_cols, duck_types) -> list[str]:
    """Columns whose pandas dtype family would differ between the
    Spark result and the DuckDB oracle in the driver's harness.
    NULL-driven int->float64 promotion happens on BOTH sides (the gate
    materializes the Spark result through pandas too), so int-vs-int
    stays compatible regardless of nulls."""
    bad = []
    for c, t in zip(duck_cols, duck_types):
        if c not in spark_dtypes:
            continue  # column-set mismatch reported separately
        sfam = _spark_dtype_family(spark_dtypes[c])
        dfam = _duck_type_family(str(t))
        if sfam == "UNHASHABLE" or dfam == "UNHASHABLE":
            bad.append(f"{c}: list/struct output (gate crashes)")
        elif sfam != dfam:
            bad.append(f"{c}: spark {spark_dtypes[c]} vs duck {t}")
    return bad


def _canon(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(spark, qdef, sf_dir: str = DEFAULT_SF_DIR) -> dict:
    """Returns a result dict; ok=True iff counts+columns+values all match."""
    sdf = qdef.builder(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    # The driver canonicalizes the Spark result even for rows-only
    # queries, so array/struct output crashes the gate either way.
    unhashable = [
        c for c, dt in sdf.dtypes if _spark_dtype_family(dt) == "UNHASHABLE"
    ]
    if unhashable:
        return {
            "name": qdef.name,
            "ok": False,
            "oracle": qdef.oracle is not None,
            "why": f"array/struct output columns crash the gate: {unhashable}",
            "spark_rows": len(spark_rows),
        }

    if qdef.oracle is None:
        result = {
            "name": qdef.name,
            "ok": True,
            "oracle": False,
            "spark_rows": len(spark_rows),
        }
        from tests.quant_checks import CHECKS

        check = CHECKS.get(qdef.name)
        if check is not None:
            con = duckdb_connect(sf_dir)
            try:
                q = check(spark, sf_dir, qdef, spark_rows, spark_cols, con)
            finally:
                con.close()
            result["quant"] = q.get("mode", "quantitative")
            if not q["ok"]:
                result["ok"] = False
                result["why"] = f"quantitative check failed: {q.get('why')}"
        return result

    con = duckdb_connect(sf_dir)
    try:
        # Plan first (no execution) to get the result schema for the
        # gate-side pandas dtype-family hazards, then execute ONCE.
        rel = con.sql(qdef.oracle)
        duck_cols = list(rel.columns)
        dtype_bad = _dtype_hazards(dict(sdf.dtypes), duck_cols, rel.types)
        duck_rows = rel.fetchall()
    finally:
        con.close()
    if dtype_bad:
        return {
            "name": qdef.name,
            "oracle": True,
            "ok": False,
            "why": f"pandas dtype hazard: {dtype_bad}",
            "spark_rows": len(spark_rows),
            "duck_rows": len(duck_rows),
        }

    result = {
        "name": qdef.name,
        "oracle": True,
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
    }
    if sorted(spark_cols) != sorted(duck_cols):
        result["ok"] = False
        result["why"] = "column mismatch"
        return result
    if len(spark_rows) != len(duck_rows):
        result["ok"] = False
        result["why"] = "row count mismatch"
        return result
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        result["ok"] = False
        result["why"] = "value mismatch"
        result["first_diffs"] = diffs
        return result
    result["ok"] = True
    return result

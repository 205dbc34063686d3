"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and exact values
(order-insensitive).  Used by tests and by the dev loop while adding
queries; stricter than the driver (exact equality, no hashing) so that
passing here implies passing there.
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


def _duck_dtype_family(pd_dtype, sample) -> str:
    s = str(pd_dtype)
    if s.startswith(("int", "uint")):
        return "int"
    if s.startswith("float"):
        return "float"
    if s.startswith("datetime64"):
        return "datetime"
    if s == "bool":
        return "bool"
    if s == "object":
        if isinstance(sample, list):
            return "UNHASHABLE"
        if isinstance(sample, bytes):
            return "bytes"
        import decimal

        if isinstance(sample, decimal.Decimal):
            return "decimal"
        return "str"
    return s


def _pandas_dtype_hazards(spark_dtypes: dict, duck_df) -> list[str]:
    """Columns whose pandas dtype family would differ between the
    Spark result and the DuckDB oracle in the driver's harness.
    NULL-driven int->float64 promotion happens on BOTH sides, so a
    duck float64 column that contains NaN is accepted against a Spark
    int column."""
    bad = []
    for c in duck_df.columns:
        if c not in spark_dtypes:
            continue  # column-set mismatch reported separately
        col = duck_df[c]
        sample = None
        if str(col.dtype) == "object":
            nn = col.dropna()
            sample = nn.iloc[0] if len(nn) else None
        sfam = _spark_dtype_family(spark_dtypes[c])
        dfam = _duck_dtype_family(col.dtype, sample)
        if sfam == "UNHASHABLE" or dfam == "UNHASHABLE":
            bad.append(f"{c}: list/struct output (gate crashes)")
        elif sfam == "int" and dfam == "float" and col.isna().any():
            continue  # nullable int promotes to float on both sides
        elif sfam != dfam:
            bad.append(f"{c}: spark {spark_dtypes[c]} vs duck pandas {col.dtype}")
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
        return {
            "name": qdef.name,
            "ok": True,
            "oracle": False,
            "spark_rows": len(spark_rows),
        }

    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(qdef.oracle)
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
        # The DRIVER materializes both sides via pandas, where dtype
        # families matter: DuckDB HUGEINT (un-cast SUM of integers)
        # becomes float64 while Spark's bigint stays int64, and any
        # list-typed column crashes its canonicalizer outright.  Check
        # dtype families here so a fetchall()-equal result that would
        # still hash-mismatch (or error) in the gate FAILS locally.
        ddf = con.execute(qdef.oracle).df()
        dtype_bad = _pandas_dtype_hazards(dict(sdf.dtypes), ddf)
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

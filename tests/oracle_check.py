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
    finally:
        con.close()

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

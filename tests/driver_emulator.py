"""Emulate the spark-graft driver: bare session, import-by-path, run
entry() + every queries() entry vs its DuckDB oracle at sf0.01.

Run from anywhere: ``python /root/repo/tests/driver_emulator.py``.
Prints MATCH/MISMATCH per query and a final RESULT line.
"""

from __future__ import annotations

import datetime
import importlib.util
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    # Bare session on purpose: the driver's session carries none of the
    # engine's builder confs, so anything needed must be set at runtime.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = mod.entry(spark).collect()
    print(f"entry() -> {len(rows)} rows")
    assert len(rows) > 0, "entry() returned no rows"

    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    bad = 0
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = [tuple(norm(x) for x in r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        if name not in osql:
            print(f"  {name}: rows-only, {len(srows)} rows")
            continue
        cur = con.execute(osql[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sset = sorted((tuple(norm(r[i]) for i in so) for r in srows), key=repr)
        dset = sorted((tuple(norm(r[i]) for i in do) for r in drows), key=repr)
        ok = sorted(scols) == sorted(dcols) and sset == dset
        if not ok:
            bad += 1
            why = (
                "cols"
                if sorted(scols) != sorted(dcols)
                else ("count" if len(sset) != len(dset) else "values")
            )
            print(f"  {name}: MISMATCH ({why}) spark={len(sset)} duck={len(dset)}")
            if why == "values":
                for a, b in [(a, b) for a, b in zip(sset, dset) if a != b][:3]:
                    print(f"     spark={a}\n     duck ={b}")
        else:
            print(f"  {name}: MATCH ({len(srows)} rows)")
    print("RESULT:", "ALL MATCH" if bad == 0 else f"{bad} MISMATCHED")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

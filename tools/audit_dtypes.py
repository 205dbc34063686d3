"""Audit for driver-harness dtype hazards.

The driver's correctness gate materializes the Spark result via
``toPandas()`` and the DuckDB oracle via ``.df()``, canonicalizes
(sort columns by name, sort rows), and hash-compares values.  Pandas
conversion therefore matters as much as SQL semantics:

* DuckDB ``SUM(INTEGER)`` returns HUGEINT -> float64 in pandas, while
  Spark's bigint stays int64: the value hash differs (6.0 vs 6).
* list/array columns are unhashable -> the gate ERRORS.
* DECIMAL -> object(Decimal) on one side vs float64 on the other.

This script builds every catalog query's *schema* on both sides
lazily — the Spark plan is analyzed, the DuckDB oracle is PLANNED
(``con.sql``, no execution) — and flags any column pair whose pandas
dtype families would differ in the gate.  The family logic is the ONE
shared implementation in ``tests/oracle_check`` (``_dtype_hazards``),
so this audit can never drift from what the per-query compare
enforces.  NULL-driven int->float64 promotion needs no special case
here: it happens on BOTH sides of the gate, and the type-based
families keep int-vs-int compatible regardless of nulls.

Streaming builders execute eagerly, so they can be skipped with
--skip-streaming.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from kbrowse_spark.catalog import all_queries  # noqa: E402
from kbrowse_spark.session import get_spark  # noqa: E402
from tests.oracle_check import (  # noqa: E402
    DEFAULT_SF_DIR,
    _dtype_hazards,
    _spark_dtype_family,
    duckdb_connect,
)


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
            if _spark_dtype_family(dt) == "UNHASHABLE":
                issues += 1
                print(f"BAD  {name}.{c}: spark {dt} (unhashable in gate)")
        if not q.oracle:
            continue
        try:
            rel = con.sql(q.oracle)  # planned, not executed
            duck_cols = list(rel.columns)
            duck_types = rel.types
        except Exception as e:  # noqa: BLE001
            issues += 1
            print(f"ERR  {name}: duckdb {type(e).__name__} {str(e)[:150]}")
            continue
        if sorted(duck_cols) != sorted(sdtypes):
            issues += 1
            print(
                f"BAD  {name}: column sets differ spark={sorted(sdtypes)} "
                f"duck={sorted(duck_cols)}"
            )
            continue
        for bad in _dtype_hazards(sdtypes, duck_cols, duck_types):
            issues += 1
            print(f"BAD  {name}: {bad}")
    print(f"\n{'CLEAN' if issues == 0 else f'{issues} ISSUES'}")
    return 1 if issues else 0


if __name__ == "__main__":
    raise SystemExit(main())

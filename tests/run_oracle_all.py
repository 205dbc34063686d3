"""Dev loop: run every catalog query against the DuckDB oracle, print a
one-line verdict each.  ``python tests/run_oracle_all.py [name ...]``"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, ".")

from kbrowse_spark.catalog import all_queries
from kbrowse_spark.session import get_spark
from tests.oracle_check import compare


def main() -> int:
    spark = get_spark()
    qs = all_queries()
    only = set(sys.argv[1:])
    failed = 0
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            r = compare(spark, q)
            if r["ok"]:
                extra = ""
                if not r.get("oracle"):
                    extra = (
                        f"(quantitative: {r['quant']})"
                        if "quant" in r
                        else "(rows-only)"
                    )
                print(f"PASS {name} rows={r.get('spark_rows')} {extra}")
            else:
                failed += 1
                print(f"FAIL {name}: {r.get('why')}")
                for k in ("spark_rows", "duck_rows", "spark_cols", "duck_cols"):
                    if r.get("why") != "value mismatch" and k in r:
                        print(f"   {k}={r[k]}")
                for d in r.get("first_diffs", []):
                    print(f"   spark={d[0]}\n   duck ={d[1]}")
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"ERR  {name}: {type(e).__name__} {str(e)[:400]}")
            if "-v" in sys.argv:
                traceback.print_exc()
    print(f"\n{'ALL PASS' if failed == 0 else f'{failed} FAILED'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

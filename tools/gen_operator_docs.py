"""Generate docs/OPERATORS.md from the live query catalog, so the
declared operator inventory can never drift from the implementation.

Usage: python tools/gen_operator_docs.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kbrowse_spark.catalog import all_queries  # noqa: E402

HEADER = """# Operator inventory (generated)

Every query in the engine's catalog: the name exposed through
`__spark_entry__.queries()`, whether it has a DuckDB oracle
(`oracle_sql()`), its tags, and the one-line description from the
builder's docstring.  Regenerate with `python tools/gen_operator_docs.py`.
"""


def main() -> None:
    qs = all_queries()
    by_tag: dict[str, list] = defaultdict(list)
    for q in qs.values():
        primary = q.tags[0] if q.tags else "misc"
        by_tag[primary].append(q)

    lines = [HEADER]
    lines.append(f"**{len(qs)} queries**, "
                 f"{sum(1 for q in qs.values() if q.oracle)} oracle-checked.\n")
    for tag in sorted(by_tag):
        lines.append(f"\n## {tag} ({len(by_tag[tag])})\n")
        lines.append("| query | oracle | summary |")
        lines.append("|---|---|---|")
        for q in sorted(by_tag[tag], key=lambda x: x.name):
            doc = (q.builder.__doc__ or "").strip().splitlines()
            summary = doc[0] if doc else ""
            oracle = "DuckDB" if q.oracle else "rows-only"
            lines.append(f"| `{q.name}` | {oracle} | {summary} |")
    os.makedirs("docs", exist_ok=True)
    with open("docs/OPERATORS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote docs/OPERATORS.md ({len(qs)} queries)")


if __name__ == "__main__":
    main()

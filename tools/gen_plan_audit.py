"""Generate docs/PLANS.md: physical-plan audit of flagship queries —
the evidence that filters push down, dims broadcast, and shuffles are
where they should be.  Regenerate with `python tools/gen_plan_audit.py`.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kbrowse_spark.catalog import all_queries  # noqa: E402
from kbrowse_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
AUDIT = [
    ("q1_pricing_summary", "pushed filters + partial agg, one exchange"),
    ("q5_nation_revenue", "broadcast dims, no dim-side shuffle"),
    ("asof_join_event_order", "union+window: one key shuffle + output sort"),
    ("window_topk_per_group", "WindowGroupLimit pushdown (no full sort)"),
    ("dedup_minhash_lsh", "map-side-combined minhash agg, banded join"),
    ("sort_limit_top_lineitems", "TakeOrderedAndProject (no global sort)"),
    ("kbrowse_regex_scan", "regex filter at the scan boundary"),
]


def summarize(plan: str) -> dict:
    return {
        "shuffles": len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": plan.count("Scan parquet"),
        "wscg_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "pushed": re.findall(r"PushedFilters: \[[^\]]*\]", plan)[:2],
        "top_k": "TakeOrderedAndProject" in plan,
        "group_limit": "WindowGroupLimit" in plan,
    }


def main() -> None:
    spark = get_spark("plan_audit")
    qs = all_queries()
    lines = [
        "# Physical-plan audit (generated)",
        "",
        f"Executed plans at {SF} on the engine session.  Regenerate with",
        "`python tools/gen_plan_audit.py`.",
        "",
    ]
    for name, claim in AUDIT:
        df = qs[name].builder(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        s = summarize(plan)
        lines.append(f"## {name}")
        lines.append(f"*Claim:* {claim}")
        lines.append("")
        lines.append(
            f"- data shuffles: {s['shuffles']}, broadcasts: {s['broadcasts']},"
            f" parquet scans: {s['scans']}, codegen spans: {s['wscg_spans']}"
        )
        if s["pushed"]:
            for p in s["pushed"]:
                lines.append(f"- `{p[:160]}`")
        if s["top_k"]:
            lines.append("- uses TakeOrderedAndProject (per-partition top-k)")
        if s["group_limit"]:
            lines.append("- uses WindowGroupLimit (per-group top-k pushdown)")
        lines.append("")
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote docs/PLANS.md ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()

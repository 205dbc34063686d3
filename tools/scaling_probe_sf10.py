"""Second-decade scaling probe: sf1 -> sf10 for the heaviest /
most-scrutinized operators.

sf10 = 100 shifted-and-transformed replicas of the driver's sf0.1
fixtures (``python tools/make_bigsf.py 100 .localdata/sf10``) — every
replica gets a DISTINCT text substitution and embedding sign pattern
(make_bigsf.py extends past the 26-shift Caesar limit with seeded
full-alphabet permutations), so near-dup/exact-dup density stays at the
sf0.1 profile instead of collapsing into replica cliques.

Combined with the sf1 step this gives TWO measured decades per
operator: a super-linear term that hides inside fixed overhead over one
decade compounds visibly over two.  Writes the ``## sf10 step`` section
of docs/SCALING_MEASUREMENTS.md.

Usage: python tools/scaling_probe_sf10.py [name ...]   (default: OPS10)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kbrowse_spark.catalog import all_queries  # noqa: E402
from kbrowse_spark.functions.cache_registry import invalidate  # noqa: E402
from kbrowse_spark.session import get_spark  # noqa: E402

from tools.scaling_probe_sf1 import NOTES, _bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".localdata", "sf1")
SF10 = os.path.join(REPO, ".localdata", "sf10")
DOC_SECTION = "## sf10 step"

# The heaviest / previously-suspect plans: the six ops whose
# sf0.01->sf0.1 step was >= 2.4x (the r6/r7 watchlist), plus the two
# r8 fixes that were quadratic before their caps (semdedup cell cap,
# adaptive LSH band width) ride along in that list, plus the newest
# exact-join family.
OPS10 = [
    "semdedup_prune",
    "dsir_hashed_importance",
    "q1_pricing_summary",
    "embedding_neardup_rerank_np",
    "cms_heavy_hitters",
    "dedup_substring_spans",
    "dedup_span_removal",
    "dedup_minhash_lsh",
    "dedup_prefix_filter_join",
    "kmv_jaccard_sketch",
    "order_stat_bucket_select",
]


def main() -> None:
    for d in (SF1, SF10):
        if not os.path.isdir(d):
            raise SystemExit(
                f"missing {d}: run tools/make_bigsf.py "
                f"[{'100 .localdata/sf10' if d.endswith('sf10') else '10'}] first"
            )
    # The deployment rule now lives in the engine (session.py
    # tune_for_input, promoted from this probe per VERDICT r8 #3):
    # shuffle partitions scale with input bytes so a partition's
    # volume stays fixed as the corpus grows — at sf10 a static 32
    # means 60M-row shuffles spill, which reads as a fake super-linear
    # step.  SPARK_GRAFT_SF10_PARTS remains as a manual override for
    # experiments only.
    spark = get_spark("scaling_probe_sf10")
    override = os.environ.get("SPARK_GRAFT_SF10_PARTS")
    if override:
        spark.conf.set("spark.sql.shuffle.partitions", override)
    else:
        from kbrowse_spark.session import tune_for_input

        n_parts = tune_for_input(spark, SF10)
        print(f"shuffle partitions (input-size rule, sf10): {n_parts}")
    qs = all_queries()
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    ops = [a for a in sys.argv[1:] if not a.startswith("-")] or OPS10

    for sf in (SF1, SF10):
        for name in ops:
            qs[name].builder(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()

    rows = []
    for name in ops:
        t1, sp1 = _bench(spark, qs, name, SF1, n_runs)
        t10, sp10 = _bench(spark, qs, name, SF10, n_runs)
        rows.append(
            (
                name,
                round(t1, 2),
                round(t10, 2),
                round(t10 / max(t1, 1e-9), 1),
                round(max(sp1, sp10), 1),
            )
        )
        print(rows[-1])
    invalidate()

    path = os.path.join(REPO, "docs", "SCALING_MEASUREMENTS.md")
    with open(path) as f:
        doc = f.read()
    sec = re.search(re.escape(DOC_SECTION) + r".*?(?=\n## |\Z)", doc, flags=re.S)
    # (name -> the four measurement cells); prior-run rows re-parse so
    # incremental invocations merge instead of clobbering.
    existing: dict[str, tuple[str, str, str, str]] = {}
    for m in re.finditer(
        r"\| `([a-z0-9_]+)` \| ([^|]+) \| ([^|]+) \| ([^|]+) \| ([^|]+) \|",
        sec.group(0) if sec else "",
    ):
        existing[m.group(1)] = tuple(
            g.strip() for g in m.groups()[1:5]
        )
    for name, t1, t10, ratio, spread in rows:
        existing[name] = (str(t1), str(t10), f"{ratio}x", f"{spread}x")
    order = [n for n in OPS10 if n in existing]
    order += [n for n in existing if n not in order]

    lines = [
        DOC_SECTION,
        "",
        "The SECOND decade (sf1 -> sf10 = 100 transformed replicas of",
        "sf0.1; distinct substitution/sign-pattern per replica, see",
        "make_bigsf.py).  A quadratic term that one decade hides inside",
        "fixed overhead compounds visibly over two.  min over",
        "SPARK_GRAFT_PROBE_RUNS runs; `spread` = worst max/min.",
        "",
        "| operator | sf1 s | sf10 s | step | spread | note |",
        "|---|---|---|---|---|---|",
    ]
    for n in order:
        t1, t10, ratio, spread = existing[n]
        note = NOTES.get(n, "")
        lines.append(
            f"| `{n}` | {t1} | {t10} | {ratio} | {spread} | {note} |"
        )
    block = "\n".join(lines) + "\n"
    if sec:
        doc = doc[: sec.start()] + block + doc[sec.end() :]
    else:
        doc = doc.rstrip() + "\n\n" + block
    with open(path, "w") as f:
        f.write(doc)
    print(f"wrote {DOC_SECTION} ({len(order)} rows) to {path}")


if __name__ == "__main__":
    main()

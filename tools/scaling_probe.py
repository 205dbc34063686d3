"""Measure how headline operators scale across the available scale
factors (sf0.001 / sf0.01 / sf0.1 — 100x data range) and write
docs/SCALING_MEASUREMENTS.md.

A near-flat time ratio vs the 10x data ratio means fixed overhead
dominates (fine at these tiny SFs); a ratio near 10x means the
operator is already data-bound; super-linear growth flags a plan that
would not survive 100 TB.

Usage: python tools/scaling_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kbrowse_spark.catalog import all_queries  # noqa: E402
from kbrowse_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OPS = [
    "q1_pricing_summary",
    "q5_nation_revenue",
    "asof_join_event_order",
    "window_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_neardup_rerank_np",
    "knn_batch_topk_join",
    "corpus_curation_pipeline",
    "kbrowse_regex_scan",
    "kmeans_lloyd",
    "decontaminate_benchmark",
    "q9_product_profit",
    "merge_upsert_events",
    "lateral_topn_orders",
    "quality_lm_surprisal",
    "tfidf_top_terms",
    "embedding_random_projection",
    "ngram_novelty_rate",
    "semdedup_prune",
    "bm25_term_scores",
    # round 5 additions
    "dedup_substring_spans",
    "cms_heavy_hitters",
    "sample_reservoir_per_stratum",
    "corpus_snapshot_diff",
    "seq_length_histogram",
    "graph_triangle_closure",
    "quantile_prune_quality",
    "pagerank_interaction",
    # round 5 second session
    "dsir_hashed_importance",
    "dedup_paragraph_keepfirst",
    "rag_chunk_retrieval",
    "tokenizer_fertility_stats",
    "cuped_adjusted_metric",
    "event_transition_matrix",
    "recursive_cte_paths",
    "data_quality_report",
    # round 5 third session
    "fuzzy_join_pigeonhole",
    "max_concurrency_sweep",
    "ewma_daily_revenue",
    "corr_value_props_by_type",
    "chisq_type_bucket_cells",
    # round 6
    "dedup_cc_star",
    "dedup_containment",
    "pmi_cooccurrence",
    "mix_temperature_quota",
    "cusum_event_drift",
    "embed_batch_inference",
    "multimodal_feature_extract",
]


def main() -> None:
    spark = get_spark("scaling_probe")
    qs = all_queries()
    # Warm: run everything once at the smallest SF (codegen + JVM).
    for name in OPS:
        qs[name].builder(spark, SFS[0]).write.format("noop").mode("overwrite").save()

    # min of 3 runs: this box has noisy neighbors and a single sample
    # regularly reads 3-5x high (an r5 verdict item: min-of-1/2 made a
    # sublinear operator look super-linear); min is the robust
    # steady-state estimator for a deterministic workload.  The spread
    # (max/min over samples, worst across SFs) is reported so a
    # contended regeneration is self-identifying.
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    results: dict[str, list[float]] = {}
    spreads: dict[str, float] = {}
    for name in OPS:
        times = []
        worst_spread = 1.0
        for sf in SFS:
            samples = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                qs[name].builder(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            times.append(round(min(samples), 2))
            worst_spread = max(
                worst_spread, max(samples) / max(min(samples), 1e-9)
            )
        results[name] = times
        spreads[name] = round(worst_spread, 1)

    lines = [
        "# Scaling measurements (generated)",
        "",
        "Wall-clock per operator across a 100x data range on local[32]",
        "(steady-state: plans pre-compiled). `x0.01->0.1` is the time",
        "ratio over the last 10x data step — the number that predicts",
        "behavior at the next orders of magnitude. Regenerate with",
        "`python tools/scaling_probe.py`.",
        "",
        "`spread` is the worst max/min sample ratio seen while",
        "regenerating (min-of-3 per cell); rows with spread > 2 were",
        "measured under neighbor load and their ratios are upper",
        "bounds, not trends.",
        "",
        "| operator | sf0.001 s | sf0.01 s | sf0.1 s | x0.01->0.1 | spread |",
        "|---|---|---|---|---|---|",
    ]
    for name, ts in results.items():
        ratio = round(ts[2] / ts[1], 1) if ts[1] > 0 else float("nan")
        lines.append(
            f"| `{name}` | {ts[0]} | {ts[1]} | {ts[2]} | {ratio}x |"
            f" {spreads[name]}x |"
        )
    out = "\n".join(lines) + "\n"
    with open("docs/SCALING_MEASUREMENTS.md", "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()

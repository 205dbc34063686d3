"""One-decade-up scaling step (sf0.1 -> sf1) for the operators whose
sf0.01->sf0.1 time ratio was >= 2.4x in docs/SCALING_MEASUREMENTS.md —
the highest-signal local evidence of 100x readiness (a bounded
super-linear term flattens toward ~10x; a scale-killer keeps
compounding).

Prereq: `python tools/make_bigsf.py` (writes .localdata/sf1 — see that
module for why replica content is transformed, not copied).

Usage: python tools/scaling_probe_sf1.py
Appends/refreshes the "## sf1 step" section of
docs/SCALING_MEASUREMENTS.md.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kbrowse_spark.catalog import all_queries  # noqa: E402
from kbrowse_spark.functions.cache_registry import invalidate  # noqa: E402
from kbrowse_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".localdata", "sf1")
OPS = [
    "semdedup_prune",
    "dsir_hashed_importance",
    "q1_pricing_summary",
    "embedding_neardup_rerank_np",
    "cms_heavy_hitters",
    "dedup_substring_spans",
]
# Broad sweep: every other operator family whose cost is bound to the
# scaled tables (documents/embeddings/lineitem) — a cheap one-decade
# screen for latent super-linear terms beyond the six targeted ones.
BROAD_OPS = [
    "dedup_minhash_lsh",
    "dedup_containment",
    "dedup_simhash",
    "dedup_cc_star",
    "dedup_incremental_minhash",
    "dedup_paragraph_keepfirst",
    "graph_triangle_closure",
    "pmi_cooccurrence",
    "fuzzy_join_pigeonhole",
    "tfidf_top_terms",
    "bm25_term_scores",
    "quality_lm_surprisal",
    "ngram_novelty_rate",
    "rag_chunk_retrieval",
    "knn_batch_topk_join",
    "ann_lsh_projection",
    "embedding_neardup_lsh",
    "kmeans_lloyd",
    "pagerank_interaction",
    "corpus_curation_pipeline",
    "decontaminate_benchmark",
    "token_budget_packing",
    "mix_temperature_quota",
    "q9_product_profit",
    # r8 additions: the queries added this round, screened the same way.
    "dedup_span_removal",
    "bpe_train_merges",
    "bpe_tokenize_stats",
    "ann_ivf_kmeans",
    "multimodal_video_extract",
    "sample_weighted_priority",
    "warc_record_extract",
    "text_normalize_nfc",
    "dedup_prefix_filter_join",
    "kmv_jaccard_sketch",
    "order_stat_bucket_select",
    "perceptron_train_batch",
    "linreg_normal_cramer",
    "pca_power_topvec",
    "ann_ivf_incremental_assign",
    "freq_itemsets_apriori",
    "hits_hubs_authorities",
    "naive_bayes_langid",
    "compression_ratio_quality",
    "shard_rebalance_hrw",
    "decision_stump_histogram",
    "multimodal_png_extract",
    "export_zonemap_prune",
    "join_size_estimate_sample",
    "attribution_multitouch",
    "frequent_event_paths",
    "join_bloom_prefilter",
    "ridge_lambda_sweep",
    "stream_bloom_firstseen",
    "takedown_propagation",
    "bitext_margin_mining",
]
DOC_SECTION = "## sf1 step"

# Why each operator's 10x-data step looks the way it does — kept here
# so regeneration preserves the analysis next to the numbers.
NOTES = {
    "semdedup_prune": (
        "sub-linear AFTER the r8 cell-size cap (was 14.5x uncapped: "
        "fixed label cardinality means cells grow linearly and the "
        "within-cell pair join quadratically; cells now sub-shard at "
        "256 rows, bounding pair cost to O(cell x cap))"
    ),
    "dsir_hashed_importance": (
        "hashed n-gram importance is explode + two hash-agg passes — "
        "linear data-bound work still below fixed overhead at this SF"
    ),
    "q1_pricing_summary": (
        "single scan + map-side-combinable agg on 4 group keys; the "
        "canonical linear operator, step is overhead-dominated"
    ),
    "embedding_neardup_rerank_np": (
        "sub-linear AFTER the r8 adaptive band width (was 17.4x at "
        "fixed 4-bit bands; the ladder keeps occupancy flat).  The "
        "sf1->sf10 step is EXPLAINED by measured candidate volume "
        "(neardup_lsh_pair_stats, r9): pairs/row oscillates 31-73 "
        "across 2.5 decades (51.5 at sf1 -> 72.8 at sf10, i.e. 14.1x "
        "pairs for 10x rows this decade, swinging back as the ladder "
        "adds a bit at n~2.1M) — bounded envelope pinned by "
        "tests/test_lsh_invariant.py on pair COUNTS, not wall-clock"
    ),
    "cms_heavy_hitters": (
        "count-min sketch is a fixed-width agg over exploded tokens; "
        "linear, and the sketch itself is constant-size"
    ),
    "dedup_substring_spans": (
        "rolling-hash windows grow linearly with text volume; the 2.5x "
        "step is the explode fan-out becoming data-bound (spans per "
        "doc are bounded), not a super-linear join"
    ),
    "dedup_span_removal": (
        "same gram index as the span reporter plus a per-doc rewrite "
        "(higher-order filter, no extra shuffle); keeper MIN rides the "
        "existing hash aggregate, so the step tracks the reporter's"
    ),
    "bpe_train_merges": (
        "pair counts are vocabulary-grain (unique words), which grows "
        "sub-linearly with corpus size (Heaps' law); each round is one "
        "combinable aggregate + 1-row argmax broadcast"
    ),
    "bpe_tokenize_stats": (
        "encode side: vocab-grain token table broadcasts to the corpus "
        "word explode — linear in corpus, constant in vocabulary"
    ),
    "ann_ivf_kmeans": (
        "Lloyd training is k-row iteration state over the shared "
        "cached point table; probe join touches ~nprobe/k of the "
        "corpus; both linear in corpus size"
    ),
    "multimodal_video_extract": (
        "container pack/parse is Arrow-batched mapInPandas over "
        "independent rows — embarrassingly parallel, linear"
    ),
    "sample_weighted_priority": (
        "WindowGroupLimit rank per stratum (map-side k+1 truncation); "
        "linear scan, k-row tau join-back"
    ),
    "warc_record_extract": (
        "WARC pack/parse is Arrow-batched mapInPandas over independent "
        "rows — embarrassingly parallel, linear"
    ),
    "text_normalize_nfc": (
        "one Arrow round trip per batch, counts/md5 JVM-side — "
        "embarrassingly parallel, linear"
    ),
    "dedup_minhash_lsh": (
        "banded LSH buckets: candidate pairs are bounded by bucket "
        "occupancy, which tracks true dup-group size, not corpus^2"
    ),
    "dedup_prefix_filter_join": (
        "prefix-filtered inverted-index self-join at t=4/5: candidate "
        "pairs track true near-dup pairs (measured 10x pairs for 10x "
        "data); the residual step is the sf1 broadcast->shuffle "
        "strategy flip + the per-doc window sort, both ~linear.  At "
        "t=1/2 the filters degenerated (125k candidates / 250 true "
        "matches, 7.3x step) — re-thresholded into the regime the "
        "AllPairs/PPJoin papers target"
    ),
    "kmv_jaccard_sketch": (
        "bottom-k sketch is a map-side-combinable MIN-k aggregate per "
        "(lang, half); everything after the window is k-row-grain"
    ),
    "order_stat_bucket_select": (
        "two combinable aggregate passes; windows run over the "
        "domain-bounded bucket table (constant as data grows) and the "
        "~3 selected buckets"
    ),
    "perceptron_train_batch": (
        "each epoch is one combinable (dim+1)-long update aggregate "
        "over the cached quantized table; weights broadcast as "
        "literals — linear per epoch, like kmeans_lloyd"
    ),
    "linreg_normal_cramer": (
        "one combinable 9-number sufficient-statistic aggregate; the "
        "Cramer solve is O(1) on the 1-row result — linear scan, "
        "constant everything else"
    ),
    "pca_power_topvec": (
        "X'(Xv) per round is one combinable d-long aggregate over the "
        "cached quantized table; d longs to the driver per round — "
        "linear per iteration, like kmeans_lloyd"
    ),
    "ann_ivf_incremental_assign": (
        "batch-sized narrow scan with centroid literals in the "
        "projection; base occupancy is one combinable aggregate — "
        "linear in batch + base, no retrain"
    ),
    "freq_itemsets_apriori": (
        "pair explode is O(basket^2) per basket with bounded baskets; "
        "supports broadcast; counts map-side-combinable — linear"
    ),
    "hits_hubs_authorities": (
        "cached pair list in both-side partitionings, rank tables "
        "broadcast — linear per round, no edge shuffle, like pagerank"
    ),
    "naive_bayes_langid": (
        "vocab-grain model broadcast onto exploded test tokens; "
        "constant 5x lang fan-out — linear in corpus"
    ),
    "compression_ratio_quality": (
        "one Arrow round trip per batch; zlib per doc — "
        "embarrassingly parallel, linear"
    ),
    "shard_rebalance_hrw": (
        "constant 9x node fan-out + map-side-combinable MAX argmax; "
        "audit is node-grain — linear"
    ),
    "decision_stump_histogram": (
        "one combinable 64-bin histogram aggregate; split scoring on "
        "the domain-bounded bin table — linear scan, constant rest"
    ),
    "multimodal_png_extract": (
        "two chained Arrow codec stages (deflate per doc) — "
        "embarrassingly parallel, linear"
    ),
    "export_zonemap_prune": (
        "one real repartition-by-zone write + one combinable zone-stat "
        "agg; footer reads metadata-grain — linear in data, constant audit"
    ),
    "join_size_estimate_sample": (
        "one key-grain combinable aggregate + 1-row readout — linear "
        "scan, constant estimator arithmetic"
    ),
    "attribution_multitouch": (
        "one user-hash exchange (boundary join + window + agg); "
        "channel grain is constant — linear"
    ),
    "frequent_event_paths": (
        "one user-hash exchange; path counting is vocabulary-grain "
        "combinable — linear"
    ),
    "join_bloom_prefilter": (
        "key-grain bloom agg + one fact scan with in-plan bit probes "
        "— linear both sides; bloom size follows the ladder"
    ),
    "ridge_lambda_sweep": (
        "one combinable 9-long aggregate; per-lambda solve is O(1) on "
        "the 1-row stat — linear scan, constant sweep"
    ),
    "stream_bloom_firstseen": (
        "per-batch cost is batch-sized probes + a sketch-words "
        "combinable aggregate; standing state is one fixed-size bloom "
        "— linear in stream volume"
    ),
    "takedown_propagation": (
        "one broadcast semi/anti join per table with combinable "
        "counts — linear, no corpus shuffle"
    ),
    "bitext_margin_mining": (
        "bounded query block x corpus-linear target scan; backward "
        "pass candidate-bounded — linear in target volume"
    ),
    "quantile_ddsketch_chars": (
        "integer log-linear bucket expression + (lang, bucket) "
        "map-side-combinable agg is the only corpus pass; readout is "
        "sketch-grain (<=500 buckets/lang) — linear scan, constant "
        "readout"
    ),
    "seq_pattern_triples": (
        "one user-hash exchange builds the K-bounded per-user array; "
        "<=C(10,3)=120 triples/user generated in-plan (nested "
        "transform, no self-join); support count is vocabulary-grain "
        "— linear in users"
    ),
    "neardup_lsh_pair_stats": (
        "same banded shuffle keys as the production pair query; two "
        "sketch-grain aggregates + the bucket-blocked DISTINCT join "
        "— tracks the rerank family's candidate volume by design"
    ),
    "f2_ams_sketch": (
        "one corpus token pass to a vocab-grain freq table; the 9 "
        "estimators are a bounded explode over vocab rows with "
        "combinable sums — linear in tokens, constant sketch"
    ),
    "linkage_sorted_neighborhood": (
        "4 passes x one block-key exchange + rank window; the "
        "rank-range self-join emits exactly w rows per record — "
        "candidate volume w*n by construction, skew-immune"
    ),
    "dedup_cc_star": (
        "large-star/small-star alternation: 2 edge-keyed shuffles per "
        "round over the cached pair list; O(log n) rounds, per-round "
        "checksum is one scalar collect"
    ),
    "pagerank_interaction": (
        "per-round edge-keyed contribution join + rank agg; rank "
        "table is node-grain and the damping rebase is a 1-row "
        "broadcast — linear per round, fixed rounds"
    ),
    "kcore_decomposition": (
        "iterative peeling: per round two combinable degree aggs + "
        "two key semi-joins on a working set that only SHRINKS — "
        "round cost falls monotonically, with a count-stable early "
        "exit (result-identical: extra rounds are no-ops); "
        "python-proven past the fixpoint"
    ),
    "wavelet_haar_synopsis": (
        "one corpus rollup is the only data-sized pass; the 12 "
        "chained pairwise aggs run at series grain (halving each "
        "level, all series simultaneously) — linear scan, "
        "depth-bounded tail"
    ),
    "spatial_grid_epsilon_join": (
        'grid-cell blocking: bounded 9x probe fan-out + one cell-id equi-join.  The sf1 step is OUTPUT-volume-driven, not a plan defect: fixed eps in a fixed coordinate domain means pair count grows with density^2 — measured 79,813 -> 8,028,293 pairs (100.6x) for 10x points, against only a 6.0x wall-clock step (strongly sub-output-linear).  A density-aware deployment shrinks eps (or switches to top-k per point) exactly as the LSH bpb ladder adds bits'
    ),
    "skyline_price_size": (
        "price-grain maxima + bounded-bucket running max + "
        "domain-bounded carry table; no self-join — linear scan, "
        "domain-bounded tail"
    ),
    "eval_auc_rank": (
        "one combinable score-grain aggregate is the only corpus "
        "pass; rank math runs at score grain via the two-level "
        "prefix sum — linear scan, model-domain-bounded tail"
    ),
    "eval_gains_deciles": (
        "same score-grain machinery as eval_auc_rank; decile "
        "re-aggregation is 10-row-grain — linear scan, bounded tail"
    ),
    "stream_ann_ivf_probe": (
        "stateless stream-static probe: the bounded query batch "
        "ships, the corpus side is the shared cached IVF index — "
        "fixed micro-batch machinery dominates at these SFs"
    ),
    "skew_salt_apply": (
        "one occurrence scan + vocabulary-bounded broadcast dim + "
        "partition-grain readout — linear scan, bounded tail"
    ),
    "compaction_plan_audit": (
        "manifest-grain aggregates + sharded rank (local row_number "
        "per key shard, broadcast shard offsets) — no global sort "
        "ever scheduled"
    ),
    # r13: the md5-register HLL family + layout/signature audits.
    "approx_distinct_parts": (
        "one scan -> (flag, bucket) MAX-register combinable agg "
        "(<= 3x256 rows shuffled); estimate at register grain — "
        "linear scan, constant sketch"
    ),
    "approx_percentile_prices": (
        "integer log-linear bucket agg (map-side combined) is the "
        "only corpus pass; readout at sketch grain — same shape as "
        "quantile_ddsketch_chars"
    ),
    "sketch_hll_rollup_merge": (
        "per-day register agg + MAX-merge both combinable; state is "
        "calendar x types x 256 integers — linear scan, constant "
        "rollup"
    ),
    "hll_set_algebra_pairs": (
        "one scan to (priority, bucket) registers; pair fan-out and "
        "union-merge run at register grain (10 pairs x 256) — the "
        "exact-intersection audit join is the only pair-grain work"
    ),
    "hll_fold_precision_ladder": (
        "ONE scan builds the 256-register table; each rung is a "
        "<= 256-row fold + 1-row estimate — scan-bound by design"
    ),
    "stream_hll_register_rollup": (
        "streaming MAX-register state bounded by calendar x types x "
        "256; per-batch cost is batch-sized hashing + combinable MAX "
        "— machinery floor dominates at these SFs"
    ),
    "partition_pruning_audit": (
        "one repartition exchange (the staged write) + one read-back "
        "scan with a (type, file)-grain combinable agg — linear in "
        "data, manifest-grain readout"
    ),
    "bbit_minhash_jaccard": (
        "parity view of the cached minhash signatures; audit join at "
        "LSH-candidate pair grain, k+1-row readout — tracks "
        "minhash_estimate_error_audit's shape"
    ),
    "vocab_entropy_fixedpoint": (
        "token explode + (lang, word) combinable count is the only "
        "corpus pass; c*log2_fp(c) runs on the vocabulary-grain "
        "frequency table — linear scan, vocab-grain tail"
    ),
    "stream_ddq_latency_monitor": (
        "streaming bucket-count state bounded by types x ~500 "
        "buckets; readout at sketch grain — machinery floor dominates "
        "at these SFs"
    ),
    "kl_divergence_lang_mix": (
        "one token explode feeds both combinable frequency tables; "
        "ratio sum joins them at VOCABULARY grain + 1-row total "
        "attach — linear scan, vocab-grain tail"
    ),
    "zipf_slope_fixedpoint": (
        "token count is the only corpus pass; rank window + moment "
        "aggregate shuffle vocab rows only — linear scan, vocab-grain "
        "tail"
    ),
    "stream_cms_heavy_hitters": (
        "x4 token fan-out map-side combined to <= 1024 sketch cells; "
        "state corpus-independent — machinery floor dominates at "
        "these SFs"
    ),
    "topk_fagin_ta_depth": (
        "per-shard rank/merge windows over doc-grain rows (one "
        "shard-key exchange); the closed-form d* avoids any "
        "per-depth replay — linear in docs per shard"
    ),
    "stream_state_introspection": (
        "the statestore read touches only checkpoint state files "
        "(key-grain); the stream pass is one combinable count — "
        "machinery floor dominates at these SFs"
    ),
}


def _bench(spark, qs, name: str, sf: str, n_runs: int) -> tuple[float, float]:
    # Untimed re-warm IMMEDIATELY before the timed block: the global
    # warm pass ran long ago by the time later ops/SFs are sampled, and
    # shared cached subtrees (e.g. the neardup signature table) may
    # have been evicted since — without this the first timed sample
    # pays re-materialization and reads as a fake 3x spread (r9: the
    # rerank_np sf10 spread was 3.6 probe-order-dependent vs 1.13
    # measured steady-state in a focused 6-sample run).
    qs[name].builder(spark, sf).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        qs[name].builder(spark, sf).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return min(samples), max(samples) / max(min(samples), 1e-9)


def main() -> None:
    if not os.path.isdir(SF1):
        raise SystemExit("run tools/make_bigsf.py first (no .localdata/sf1)")
    spark = get_spark("scaling_probe_sf1")
    qs = all_queries()
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        # Incremental mode: measure just the named ops and merge their
        # rows into the existing doc table (full-regen order preserved).
        ops = only
    else:
        ops = OPS + (
            BROAD_OPS if os.environ.get("SPARK_GRAFT_PROBE_BROAD") else []
        )

    # Warm once per SF (codegen, shared caches) before timing.
    for sf in (SF01, SF1):
        for name in ops:
            qs[name].builder(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()

    rows = []
    for name in ops:
        t01, sp01 = _bench(spark, qs, name, SF01, n_runs)
        t1, sp1 = _bench(spark, qs, name, SF1, n_runs)
        rows.append(
            (name, round(t01, 2), round(t1, 2), round(t1 / max(t01, 1e-9), 1),
             round(max(sp01, sp1), 1))
        )
        print(rows[-1])
    invalidate()

    path = os.path.join(REPO, "docs", "SCALING_MEASUREMENTS.md")
    with open(path) as f:
        doc = f.read()
    if only:
        # Merge: keep every previously-measured row, override/append
        # the ones measured now, in canonical OPS+BROAD_OPS order.
        sec = re.search(
            re.escape(DOC_SECTION) + r".*?(?=\n## |\Z)", doc, flags=re.S
        )
        existing = dict(
            (m.group(1), m.group(0))
            for m in re.finditer(
                r"\| `([a-z0-9_]+)` \|[^\n]*\|", sec.group(0) if sec else ""
            )
        )
        for name, t01, t1, ratio, spread in rows:
            existing[name] = (
                f"| `{name}` | {t01} | {t1} | {ratio}x | {spread}x |"
            )
        order = [n for n in OPS + BROAD_OPS if n in existing]
        order += [n for n in existing if n not in order]
        rows = [(n,) for n in order]
        row_lines = [existing[n] for n in order]
    else:
        row_lines = [
            f"| `{name}` | {t01} | {t1} | {ratio}x | {spread}x |"
            for name, t01, t1, ratio, spread in rows
        ]

    lines = [
        DOC_SECTION,
        "",
        "One decade above bench SF (sf1 = 10x replicated-and-transformed",
        "sf0.1, `tools/make_bigsf.py` — near-dup density preserved, cells",
        "grow with corpus). Data ratio is 10x; a ratio well under 10x",
        "means fixed overhead still dominates, ~10x is data-bound linear,",
        "well over 10x flags a super-linear term (see per-row notes).",
        "Regenerate with `python tools/scaling_probe_sf1.py`.",
        "",
        "| operator | sf0.1 s | sf1 s | x0.1->1 | spread |",
        "|---|---|---|---|---|",
    ]
    lines.extend(row_lines)
    lines.append("")
    for name, *_ in rows:
        if name in NOTES:
            lines.append(f"- `{name}`: {NOTES[name]}")
    section = "\n".join(lines) + "\n"

    if DOC_SECTION in doc:
        doc = re.sub(
            re.escape(DOC_SECTION) + r".*?(?=\n## |\Z)", section, doc,
            flags=re.S,
        )
    else:
        doc = doc.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(doc)
    print(f"\nwrote {DOC_SECTION} section to {path}")


if __name__ == "__main__":
    main()

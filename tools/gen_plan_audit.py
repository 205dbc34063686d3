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
    ("embedding_neardup_rerank_np", "no driver collect: joins feed mapInPandas"),
    ("token_budget_packing", "sharded prefix sum (windowspec has shard key)"),
    ("embedding_quantize_int8", "narrow projection, no shuffle"),
    ("sample_stratified", "hash-bucket filter at the scan, no shuffle"),
    ("q6_forecast_revenue", "all predicates at the scan, single exchange"),
    ("q10_returned_items", "selective order-quarter probe, broadcast dims, top-k"),
    ("q19_disjunctive_revenue", "CNF factoring pushes OR-of-ANDs into both scans"),
    ("q21_waiting_supplier", "semi+anti correlated subqueries as one-pass joins"),
    ("rollup_hypertable_daily", "raw-column ts bounds pushed to both event scans"),
    ("q13_customer_distribution", "outer-join count distribution, two-level agg"),
    ("q9_product_profit", "LIKE-filtered part broadcast, one fact-fact shuffle"),
    ("q2_min_cost_supplier", "window-MIN decorrelation: one shuffle on l_partkey"),
    ("kmeans_lloyd", "no join: centroid literals in projection, agg-only iterations"),
    ("curation_domain_cap", "WindowGroupLimit truncates groups before exchange"),
    ("decontaminate_benchmark", "broadcast semi-join membership, map-side counts"),
    ("pyds_rowgroup_scan", "custom source: one partition per row group"),
    ("tfidf_top_terms", "WindowGroupLimit top-k, word-keyed df join"),
    ("quality_lm_surprisal", "one cached corpus pass, broadcast LM join"),
    ("bpe_pair_merge_stats", "map-side-combined pair agg, TakeOrdered top-k"),
    ("embedding_random_projection", "join-free: sign matrix folded into projection"),
    ("mix_token_budget", "2-row rate broadcast, corpus pass is one filter"),
    ("funnel_conversion", "one user_id shuffle serves windows + rollup"),
    ("timeseries_gap_fill", "hourly pre-agg joins grid-sized side"),
    ("ngram_novelty_rate", "no posting-list rejoin: doc-keyed join of two aggs"),
    ("semdedup_prune", "cell-blocked pair join, no corpus-wide cross product"),
    ("bm25_term_scores", "term filter before shuffle, WindowGroupLimit top-k"),
    ("quantile_prune_quality", "lazy histogram-rank cut: value-domain-bounded cum window + per-score row_number"),
    ("pagerank_interaction", "cached loop-invariant edges, 2 shuffles/iteration"),
    # round 5 second session
    ("dsir_hashed_importance", "bucket-bounded weight table broadcast to scoring pass"),
    ("dedup_paragraph_keepfirst", "hash-keyed first-occurrence agg + equi-join + doc rollup"),
    ("rag_chunk_retrieval", "broadcast query features, WindowGroupLimit top-k, id-only join-back"),
    ("phrase_search_positional", "adjacency in the equi-join key (no tf x tf fanout)"),
    ("dau_wau_stickiness", "day-grain dedup first; 7x fanout on day grain only"),
    ("latency_percentile_bands", "histogram agg; windows bounded by value domain"),
    ("ohlc_hourly_bars", "min_by/max_by single aggregate, no per-group sort"),
    ("lpa_communities", "per-round: edge join + label-histogram WindowGroupLimit argmax"),
    ("cuped_adjusted_metric", "one user-grain shuffle; 1-row moments broadcast attach"),
    ("data_quality_report", "one conditional-agg pass per table; FK as left-join null-flag"),
    ("topn_other_rollup", "corpus collapses to source grain before any window"),
    ("fuzzy_join_pigeonhole", "blocked candidate equi-join; verify on omitted segment only"),
    ("max_concurrency_sweep", "per-day sharded prefix sum + broadcast carry-in offsets"),
    ("ewma_daily_revenue", "day-grain rollup then per-group JVM fold; no window over orders"),
    ("corr_value_props_by_type", "single map-side-combinable moments aggregate"),
    ("chisq_type_bucket_cells", "cell-grain contingency; margins re-aggregate cells, broadcast back"),
    ("dedup_incremental_minhash", "new x base + new x new candidate joins only; base x base never built"),
    ("join_nullsafe_buckets", "null-safe key hashed (coalesce+isnull) — hash join, not NLJ"),
    # round 6
    ("dedup_containment", "same banded candidate join as LSH; directed readout adds no shuffle over raw docs"),
    ("pmi_cooccurrence", "vocab-blocked pair self-join (<=C(50,2)/doc); margins broadcast"),
    ("mix_temperature_quota", "apportionment on |sources| rows; corpus pass = one per-source rank window"),
    ("cusum_event_drift", "day-grain rollup then per-group integer JVM fold"),
    ("kanonymity_report", "two map-side-combinable aggregates, no join/window"),
    ("embedding_dim_profile", "posexplode collapses map-side to 64 partial rows before exchange"),
    ("shuffle_skew_planner", "key-grain then bucket-grain aggs; hot-key window over key grain"),
    ("length_bucket_padding", "one narrow projection + 7-group aggregate"),
    ("multimodal_feature_extract", "narrow scan -> two chained Arrow stages, no shuffle"),
    ("embed_batch_inference", "narrow scan -> Arrow batch forward pass, no shuffle"),
    # round 8
    ("bpe_train_merges", "per-round combinable pair agg + 1-row argmax broadcast; no driver collect"),
    ("bpe_tokenize_stats", "vocab-grain token table broadcasts; corpus explode never shuffles for encode"),
    ("dedup_span_removal", "keeper MIN rides the gram hash agg; rewrite is per-doc indexed filter, no extra shuffle"),
    ("ann_ivf_kmeans", "centroid literals fold into projection; probe join touches assigned cells only"),
    ("sample_weighted_priority", "WindowGroupLimit rank<=k+1; tau is a strata-row broadcast join-back"),
    ("warc_record_extract", "narrow scan -> two chained Arrow codec stages, no shuffle"),
    # round 8 session 3
    ("kmv_jaccard_sketch", "two-level mergeable bottom-k: shard agg truncates to k before the merge"),
    ("dedup_prefix_filter_join", "prefix-only inverted self-join; candidate table broadcasts into verify"),
    ("order_stat_bucket_select", "two combinable passes; cum window over bucket grain, not corpus"),
    ("perceptron_train_batch", "weights as literals in projection; epochs are agg-only (no join)"),
    ("linreg_normal_cramer", "one 9-number sufficient-stat aggregate; Cramer solve in-plan on 1 row"),
    ("pca_power_topvec", "X'(Xv) as projection + d-long agg per round; covariance never materialized"),
    ("ann_ivf_incremental_assign", "batch slice assign via centroid literals; no base-corpus shuffle"),
    # round 8 session 4
    ("freq_itemsets_apriori", "A-Priori pruned pair self-join within bounded baskets; supports broadcast"),
    ("hits_hubs_authorities", "edges cached in both-side partitionings; rank tables broadcast, window MAX normalizer in-plan"),
    ("naive_bayes_langid", "vocab-grain model broadcast onto exploded test tokens; combinable aggs"),
    ("compression_ratio_quality", "narrow scan -> one Arrow codec stage, no shuffle"),
    ("shard_rebalance_hrw", "9-row node fan-out + map-side-combinable per-doc MAX argmax"),
    ("decision_stump_histogram", "one combinable histogram agg; split scoring over 64-row bin table"),
    ("multimodal_png_extract", "narrow scan -> two chained Arrow codec stages, no shuffle"),
    ("export_zonemap_prune", "zone-stat combinable agg; constant 8x4 audit broadcast; footer reads metadata-grain"),
    ("join_size_estimate_sample", "one key-grain combinable agg carries exact + all 4 sampled estimates"),
    ("attribution_multitouch", "single user-hash exchange: boundary join + window + channel agg"),
    ("frequent_event_paths", "one user-hash exchange; path counting vocabulary-grain combinable"),
    ("join_bloom_prefilter", "bloom = bit_or agg broadcast once; fact scanned once with in-plan bit probes"),
    ("ridge_lambda_sweep", "one 9-long aggregate; 4-lambda readout projects the cached 1-row stat"),
    ("stream_bloom_firstseen", "per-batch in-plan bit probes vs literal sketch; bit_or agg to driver"),
    ("takedown_propagation", "broadcast semi/anti per table; map-side-combinable counts, no corpus shuffle"),
    ("bitext_margin_mining", "bounded source block broadcast; target scans once; WindowGroupLimit top-k"),
    # round 9
    ("neardup_lsh_pair_stats", "bucket stats ride the banded agg; pair count via same banded join keys"),
    ("quantile_ddsketch_chars", "integer bucket expr in-scan; one combinable sketch agg; readout sketch-grain"),
    ("seq_pattern_triples", "one user-hash exchange; triples generated in-plan (nested transform, no self-join)"),
    ("f2_ams_sketch", "one token pass to vocab grain; 9x estimator explode with combinable sums"),
    ("linkage_sorted_neighborhood", "rank-range join banded into equi-keys (rn div w): w rows/record physically"),
    ("kcore_decomposition", "per-round degree aggs + semi-joins over a shrinking, lineage-truncated edge list"),
    ("wavelet_haar_synopsis", "one corpus rollup; 12 chained series-grain pairwise aggs; B-row kept set joins 3-literal path"),
    ("spatial_grid_epsilon_join", "bounded 9x probe fan-out + cell-id equi-join; verify is an in-plan filter"),
    ("skyline_price_size", "price-grain maxima + bounded-bucket windows; no self-join (oracle keeps the quadratic truth)"),
    ("eval_auc_rank", "one combinable score-grain agg; rank math via two-level prefix sum, no corpus window"),
    ("eval_gains_deciles", "score-grain prefix sums; decile re-aggregation at 10-row grain"),
    # round 11
    ("bfs_multisource_hops", "per-round frontier join + anti-join; frontier re-read from checkpointed blocks (no recompute)"),
    ("skew_salt_apply", "one occurrence pass; vocab-bounded salt dim broadcast; partition-grain readout"),
    ("compaction_plan_audit", "manifest-grain aggs; sharded rank (shard-local row_number + broadcast offsets), no global sort"),
    ("epoch_shuffle_decorrelation", "hash-sharded ranks per epoch; per-epoch offset windows; doc-keyed pair join"),
    ("scd2_asof_snapshot", "one user-keyed shuffle (two windows share it); 1-row cutoff broadcast; in-row containment"),
    # round 12
    ("multimodal_image_histogram", "narrow scan -> Arrow numpy (pack/decode/integral image) -> Arrow back; the single exchange is the deterministic doc_id readout sort"),
    ("ann_pq_recall_audit", "Arrow numpy encode; 8-row query-block broadcast; two WindowGroupLimit rankings; k-grain overlap join"),
    ("ann_pq_code_drift", "two Arrow numpy encodes in one scan; one combinable aggregate; 8-row stack readout"),
    ("asof_join_nearest", "ONE user-keyed shuffle+sort; backward+forward frames share the sorted distribution; in-row integer choice"),
    ("ivfpq_retrieval", "cell-probe broadcast prunes the scan; Arrow numpy encode; 1-row distance-table attach; TakeOrdered top-k"),
    ("quality_gopher_rules", "one corpus scan; in-row array aggregation (no explode); one combinable aggregate; 7-row stack"),
    ("join_bloom_runtime_filter", "bit_or collapse to m/64 words; 1-row Arrow broadcast attach; probe is the fact scan, no shuffle"),
    ("schema_evolution_audit", "one mergeSchema directory scan; one 4-column combinable aggregate; 4-row stack readout"),
    ("stream_compaction_trigger", "stateless day/shard projection in-stream; bounded state; file-grain readout with two 1-row attaches"),
    ("stream_gopher_gate", "stateless in-row rule scoring in-stream; 8-key score-histogram state; threshold readout"),
    ("dedup_lsh_band_tuning", "one cached signature pass; six band explodes aggregated at bucket grain; pairs counted from occupancies, never joined"),
    ("eval_confusion_thresholds", "one corpus scan; 16 confusion cells in one combinable aggregate; 4-row stack readout"),
    ("stream_ivfpq_probe", "stateless in-stream probe+ADC-table kernels; stream-static join of the cell-pruned code index; k-cut over landed candidates"),
    ("sample_neyman_allocation", "one scan, three combinable aggregates; everything after runs at stratum grain (bounded vocabulary)"),
    ("mad_robust_outliers", "two type-partitioned rank-selection windows + one conditional aggregate; type-grain dims broadcast back"),
]


def summarize(plan: str) -> dict:
    # An executed AdaptiveSparkPlan prints BOTH final and initial plans
    # — summarize only the final section, and count codegen spans via
    # the *(n) stage markers used in this format.
    final = plan.split("== Initial Plan ==")[0]
    return {
        "shuffles": len(re.findall(r"Exchange (?:hash|range)partitioning", final)),
        "broadcasts": final.count("BroadcastExchange")
        + final.count("BroadcastQueryStage"),
        # "FileScan parquet" contains "Scan parquet" as a suffix, so
        # counting the suffix alone counts every scan exactly once.
        "scans": final.count("Scan parquet"),
        "wscg_spans": len(set(re.findall(r"\*\((\d+)\)", final))),
        "pushed": list(dict.fromkeys(re.findall(r"PushedFilters: \[[^\]]*\]", final)))[
            :2
        ],
        "top_k": "TakeOrderedAndProject" in final,
        "group_limit": "WindowGroupLimit" in final,
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
        # Execute THROUGH df's own QueryExecution (collect) so the
        # summarized plan is the AQE-final executed one; a sink write
        # would execute a separate QueryExecution and leave df's
        # un-run (codegen spans would read 0).
        df.collect()
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

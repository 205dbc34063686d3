"""Scale-pattern tests: the plan shapes that matter at 100 TB, asserted
on the actual physical plans — bucketed co-located joins (no shuffle),
broadcast joins, salted skew joins, pushdown.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    """Bucketing both sides on the join key co-locates matching rows:
    the sort-merge join runs with ZERO exchanges — the pattern that
    turns a repeated fact-fact join from O(data) shuffle into none."""
    from kbrowse_spark.sources.tables import load

    spark.sql("CREATE DATABASE IF NOT EXISTS kb_bucket_test")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        # external table location: bucketed data lands under the test
        # tmp dir (warehouse.dir is a static conf, unchangeable here)
        load(spark, sf_dir, name).write.bucketBy(8, key).sortBy(key).option(
            "path", f"{warehouse}/{name}_b"
        ).mode("overwrite").saveAsTable(f"kb_bucket_test.{name}_b")
    o = spark.table("kb_bucket_test.orders_b")
    li = spark.table("kb_bucket_test.lineitem_b")
    # Disable broadcast so the sort-merge path is exercised (at test SF
    # everything broadcasts; at 100 TB neither side would).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_linenumber", "l_quantity"
        )
        joined.collect()
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, (
        f"bucketed join still shuffles:\n{plan}"
    )
    assert "SortMergeJoin" in plan


def test_broadcast_join_in_star_query(spark, sf_dir):
    """q5's fixed-size dims must broadcast, never shuffle."""
    from kbrowse_spark.catalog import all_queries

    df = all_queries()["q5_nation_revenue"].builder(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_parquet_filter_pushdown(spark, sf_dir):
    """Filters and projections must reach the parquet scan."""
    from kbrowse_spark.sources.tables import load

    df = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    scan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)" in scan
    assert "struct<l_orderkey:bigint,l_quantity:double>" in scan.replace(" ", "")


def test_salted_join_equals_plain_join(spark):
    """Skew-salting pattern: explode the hot key into N salt buckets on
    the build side, add a random-free deterministic salt on the probe
    side (key-hash mod N), join on (key, salt).  Result must equal the
    plain join — this pins the rewrite used for skewed keys at scale."""
    n_salt = 4
    # skewed fact: one hot key (0) with many rows
    fact = spark.range(0, 2000).select(
        (F.when(F.col("id") < 1500, 0).otherwise(F.col("id") % 50)).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("attr")
    )
    plain = fact.join(dim, "k").select("k", "v", "attr")

    salted_fact = fact.withColumn("salt", (F.abs(F.hash("v")) % n_salt))
    salted_dim = dim.select(
        "k", "attr", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("salt")
    )
    salted = salted_fact.join(salted_dim, ["k", "salt"]).select("k", "v", "attr")

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_aqe_coalesces_partitions(spark, sf_dir):
    """AQE must be on (runtime partition coalescing + skew handling)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    )


def test_partitioned_write_partition_pruning(spark, sf_dir, tmp_path):
    """Hive-partitioned layout: a filter on the partition column must
    become a PartitionFilter (directories skipped entirely), not a data
    filter — the layout lever for 100 TB scan pruning."""
    from kbrowse_spark.sources.tables import load

    out = str(tmp_path / "events_by_type")
    load(spark, sf_dir, "events").write.partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert "(event_type" in plan.split("PartitionFilters")[1][:120]


def test_write_sized_parquet_layout(spark, sf_dir, tmp_path):
    """Output shaping: ~target_rows_per_file rows per data file, each
    file a contiguous sort-key range (parquet min/max prune-able)."""
    import glob

    import pyarrow.parquet as pq

    from kbrowse_spark.sinks.export import write_sized_parquet
    from kbrowse_spark.sources.tables import load

    out = str(tmp_path / "lineitem_sized")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    total = li.count()
    shards = write_sized_parquet(
        li, out, sort_col="l_orderkey", target_rows_per_file=1000,
        approx_total_rows=total,
    )
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(files) >= shards
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        assert md.num_rows <= 1000
        lo = min(
            md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    # non-overlapping key ranges across range shards: sorted by lo,
    # each file's hi <= next file's lo boundary ordering holds for the
    # range-partitioned (non-overlapping) shard files
    ranges.sort()
    # range partitioning keeps equal keys in one shard and files within
    # a shard are sorted sequential splits — so ranges may touch at a
    # boundary value but never properly overlap
    overlaps = [(a, b) for (a, b) in zip(ranges, ranges[1:]) if a[1] > b[0]]
    assert not overlaps, overlaps
    # round-trip: content identical
    back = spark.read.parquet(out)
    assert back.count() == total


def test_zorder_layout_prunes_both_columns(spark, sf_dir, tmp_path):
    """Sorting the write by a Z-order key gives BOTH dimensions tight
    per-file min/max stats; a plain single-column sort leaves the
    second column's per-file range at ~the full domain (no pruning)."""
    import glob

    import pyarrow.parquet as pq

    from kbrowse_spark.sinks.export import zorder_key
    from kbrowse_spark.sources.tables import load

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()

    def avg_width(path, col_idx, lo, hi):
        widths = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            st = [md.row_group(i).column(col_idx).statistics for i in range(md.num_row_groups)]
            fmin = min(s.min for s in st)
            fmax = max(s.max for s in st)
            widths.append((fmax - fmin) / (hi - lo))
        return sum(widths) / len(widths)

    # Z-ordered write: 16 files, each a contiguous z-range
    zed = ev.withColumn(
        "zkey",
        zorder_key("user_id", "value", bounds_a=(lo_u, hi_u), bounds_b=(lo_v, hi_v)),
    )
    out_z = str(tmp_path / "events_zorder")
    zed.repartitionByRange(16, "zkey").sortWithinPartitions("zkey").write.mode(
        "overwrite"
    ).parquet(out_z)
    # Baseline: plain sort by user_id only
    out_s = str(tmp_path / "events_usersort")
    ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id").write.mode(
        "overwrite"
    ).parquet(out_s)

    # schema order: user_id=0, value=1 in both outputs
    z_user, z_val = avg_width(out_z, 0, lo_u, hi_u), avg_width(out_z, 1, lo_v, hi_v)
    s_user, s_val = avg_width(out_s, 0, lo_u, hi_u), avg_width(out_s, 1, lo_v, hi_v)
    # Plain sort: near-perfect on user_id, little help on value (the
    # skewed value distribution keeps it below the full domain, so the
    # comparison is relative, not absolute).
    assert s_user < 0.2
    # Z-order: BOTH dimensions substantially narrower than the domain,
    # and the second dimension far narrower than under the plain sort.
    assert z_user < 0.5, (z_user, s_user)
    assert z_val < 0.5 and z_val < 0.6 * s_val, (z_val, s_val)


def test_domain_cap_uses_window_group_limit(spark, sf_dir):
    """The per-domain cap's rank filter must compile to WindowGroupLimit
    so each map task truncates groups to the cap before the exchange."""
    from kbrowse_spark.operators.pipeline_ops import curation_domain_cap

    plan = _plan(curation_domain_cap(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_kmeans_partitions_points_once(spark, sf_dir):
    """Lloyd's iterations must not shuffle the point set: the final
    plan's only exchange is the display sort; centroid literals ride in
    the projection (no join in the assignment stage)."""
    from kbrowse_spark.operators.clustering import kmeans_lloyd

    df = kmeans_lloyd(spark, sf_dir)
    plan = _plan(df)
    assert "Join" not in plan  # centroids are folded literals, not a join
    # clusters are non-degenerate: every point assigned, >1 cluster used
    rows = df.collect()
    assert len(rows) == 500
    assert len({r.cluster_id for r in rows}) > 1


def test_semdedup_prunes_within_cell_only(spark, tmp_path):
    # Identical vectors in the SAME cell prune (keep-min-id); an
    # identical vector in a DIFFERENT cell survives — the cell blocking
    # is what bounds the pairwise scan, so it must also bound pruning.
    import os

    from kbrowse_spark.operators.dedup import semdedup_prune

    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]  # orthogonal: cos = 0, below threshold
    rows = [(0, v, 0), (1, v, 0), (2, v, 1), (3, w, 0)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    out = {r["vec_id"]: r for r in semdedup_prune(spark, str(tmp_path)).collect()}
    assert set(out) == {1}
    assert out[1]["min_keeper"] == 0 and out[1]["n_dominators"] == 1
    assert out[1]["cell"] == 0


def test_quantile_prune_lazy_histogram_rank(spark, sf_dir):
    # The rank-budget cut must (a) build lazily — constructing the
    # DataFrame runs NO Spark job (the corpus count is an in-plan 1-row
    # aggregate, not a driver count()) — and (b) never funnel k = N/4
    # corpus rows through a single task: no TakeOrdered/GlobalLimit of
    # the corpus; the only unpartitioned window runs over the per-score
    # histogram, whose size is bounded by the score value domain.
    from kbrowse_spark.operators.pipeline_ops import quantile_prune_quality

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    df = quantile_prune_quality(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    after = set(tracker.getJobIdsForGroup(None))
    # spark.read.parquet runs a 1-task footer/schema-inference job (it
    # does for every builder); what must NOT appear is an action job —
    # count/collect/take — i.e. the builder scanning data eagerly.
    for jid in after - before:
        info = tracker.getJobInfo(jid)
        for sid in info.stageIds if info else ():
            si = tracker.getStageInfo(sid)
            assert si is None or not any(
                a in si.name for a in ("count at", "collect at", "take at")
            ), f"eager action in builder: {si.name}"
    assert "TakeOrderedAndProject" not in plan
    # the per-row rank window must be PARTITIONED by score (an
    # unpartitioned row_number over the corpus would collapse onto one
    # task); the only unpartitioned windows run over the histogram.
    assert "windowspecdefinition(score_scaled" in plan, plan
    # and the gate semantics: ceil(N/4) rows pruned
    import math

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert df.count() == math.ceil(n_docs / 4)


def test_ngram_jaccard_hot_shingle_cap(spark, tmp_path, monkeypatch):
    """A boilerplate shingle shared by every document must NOT explode
    the inverted-index self-join: with the df cap, the ~N^2/2
    boilerplate-only candidate pairs disappear, while genuine near-dups
    (sharing below-cap shingles) are still found."""
    import os

    from kbrowse_spark.operators import dedup

    boiler = "this content is provided under the standard license terms"
    rows = []
    for i in range(40):  # 40 docs sharing only boilerplate -> df=40 > cap
        rows.append((i, f"{boiler} unique{i} tail{i} word{i}", "en", "web", 0))
    phrase = "quick brown fox jumps over the lazy dog today"
    rows.append((100, phrase + " alpha", "en", "web", 0))
    rows.append((101, phrase + " beta", "en", "web", 0))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))

    monkeypatch.setattr(dedup, "_NGRAM_DF_CAP", 20)
    out = dedup.dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    # genuine near-dup survives (its shingles have df=2 <= cap)
    assert (100, 101) in pairs
    # without the cap the boilerplate docs are all mutual near-dups:
    # 40*39/2 = 780 pairs; with it, their only surviving shingles are
    # per-doc unique tails -> no candidates at all.
    assert len(pairs) == 1, sorted(pairs)[:10]


def test_substring_spans_union_coverage(spark, tmp_path):
    """Two docs sharing one contiguous 12-word run: overlapping
    duplicated windows must merge into ONE span whose coverage is the
    union (12 words), never the sum of window lengths; a doc sharing
    nothing reports no row."""
    import os

    from kbrowse_spark.operators.dedup import _SPAN_GRAM, dedup_substring_spans

    shared = " ".join(f"s{i}" for i in range(12))  # 12-word duplicated run
    docs = [
        (0, f"alpha beta {shared} gamma delta", "en", "web", 0),
        (1, f"{shared} omega psi chi phi upsilon", "en", "web", 0),
        (2, "nothing in common with the others here at all", "en", "web", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = {r["doc_id"]: r for r in dedup_substring_spans(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}
    for did in (0, 1):
        assert out[did]["n_dup_spans"] == 1
        # union coverage: 12 shared words = 5 overlapping 8-gram
        # windows, merged; NOT 5 * 8 = 40
        assert out[did]["dup_words"] == 12, out[did]
        assert 12 - _SPAN_GRAM < out[did]["dup_words"] <= out[did]["n_words"]
    assert abs(out[0]["dup_frac"] - 12 / out[0]["n_words"]) < 1e-12


def test_reservoir_sample_fixed_k_and_grouplimit_plan(spark, sf_dir):
    """Exactly min(k, stratum size) docs per lang, deterministic across
    runs, and the rank filter must push into WindowGroupLimit (per-
    partition k-row heaps before the shuffle — the plan shape that keeps
    a fixed-size sample from shuffling the corpus)."""
    from pyspark.sql import functions as F

    from kbrowse_spark.operators.pipeline_ops import (
        _RESERVOIR_K,
        sample_reservoir_per_stratum,
    )

    df = sample_reservoir_per_stratum(spark, sf_dir)
    got = df.groupBy("lang").count().collect()
    strata = {
        r["lang"]: r["count"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("count"))
        .collect()
    }
    for r in got:
        assert r["count"] == min(_RESERVOIR_K, strata[r["lang"]])
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, sample_reservoir_per_stratum(spark, sf_dir).collect())
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime Bloom-filter join pruning (the 100 TB selective-join
    lever beyond static pushdown): a selective predicate on the build
    side must inject a might_contain() runtime filter into the probe
    side's scan, so the big table is pre-filtered BEFORE the shuffle.
    Thresholds are tuned for fixture scale; at production scale the
    defaults (10 GB application side) trigger on their own."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        # and the filtered join still computes the right thing
        n = {r["o_orderpriority"]: r["count"] for r in j.collect()}
        o_keys = [r["o_orderkey"] for r in o.select("o_orderkey").collect()]
        expected = li.filter(li.l_orderkey.isin(o_keys)).count() if o_keys else 0
        assert n.get("1-URGENT", 0) == expected
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observe_metrics_ride_the_action(spark, sf_dir):
    """Pipeline observability at scale: Observation metrics (row
    counts, null rates, bounds) are computed as accumulators on the
    EXISTING action — no second scan of the input. This is the
    data-quality telemetry hook a 100 TB curation DAG reports per
    stage."""
    from pyspark.sql import Observation

    obs = Observation("scan_health")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    observed = d.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    kept = observed.filter(F.col("doc_id") % 2 == 0).count()
    m = obs.get
    n = d.count()
    assert m["rows_scanned"] == n  # observed at attachment point, pre-filter
    assert m["null_texts"] == 0
    assert kept < n
    assert m["min_doc"] >= 0 and m["max_doc"] > m["min_doc"]


def test_join_salted_skew_plan_spreads_key(spark, sf_dir):
    """The catalog's salted-skew join must actually produce a shuffle
    join keyed on (key, salt) — i.e. the exchange spreads each hot key
    over the salt space — not silently collapse to a broadcast."""
    from kbrowse_spark.catalog import all_queries

    df = all_queries()["join_salted_skew"].builder(spark, sf_dir)
    plan = _plan(df)
    smj_lines = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln]
    assert smj_lines, f"salted join lost its sort-merge shape:\n{plan}"
    assert "salt" in smj_lines[0] and "d_salt" in smj_lines[0], smj_lines[0]


def test_bloom_decontaminate_fp_accounting(spark, sf_dir):
    """Bloom screening has one-sided error: bloom_hits >= exact_hits
    everywhere (no false negatives), the FP column reconciles, the
    deliberately undersized fixture filter produces real false
    positives (the calibration path is exercised, not vacuous), and
    exact_hits agrees with the broadcast-set operator's ground truth."""
    from kbrowse_spark.catalog import all_queries

    qs = all_queries()
    rows = qs["decontaminate_bloom"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bloom_hits >= r.exact_hits, r
        assert r.false_positives == r.bloom_hits - r.exact_hits, r
        assert r.bloom_hits <= r.n_shingles, r
    assert sum(r.false_positives for r in rows) > 0, (
        "filter sized so large the FP accounting is never exercised"
    )
    truth = {
        r.doc_id: r.n_hit
        for r in qs["decontaminate_benchmark"].builder(spark, sf_dir).collect()
    }
    for r in rows:
        assert r.exact_hits == truth.get(r.doc_id, 0), r


def test_winsorize_clip_invariants(spark, sf_dir):
    """Winsorization sanity: every value lands inside its group's
    [P5, P95] band after clipping, the bands are ordered, and the
    clipped fraction is bounded by the tail mass (<= 5% + one
    cents-bucket of ties per side)."""
    from kbrowse_spark.catalog import all_queries

    rows = all_queries()["winsorize_value_clip"].builder(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert r.lo_cents <= r.hi_cents, r
        assert r.lo_cents <= r.clipped_cents <= r.hi_cents, r
        assert r.was_clipped == int(
            r.cents < r.lo_cents or r.cents > r.hi_cents
        ), r
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        frac = sum(r.was_clipped for r in rs) / len(rs)
        assert frac <= 0.11, (t, frac)
        # exact order-statistic check against a local sort
        cents = sorted(r.cents for r in rs)
        n = len(cents)
        assert rs[0].lo_cents == cents[(5 * n + 99) // 100 - 1], t
        assert rs[0].hi_cents == cents[(95 * n + 99) // 100 - 1], t


def test_curation_e2e_shuffle_budget(spark, sf_dir):
    """The composed curation pipeline stays within its declared shuffle
    budget: dedup window + cap window + the audit aggregate's two
    distinct-agg exchanges — no hidden extra shuffle from stage
    composition."""
    from kbrowse_spark.catalog import all_queries

    df = all_queries()["pipeline_curation_e2e"].builder(spark, sf_dir)
    df.collect()
    # AQE's toString appends the initial plan after the final one —
    # count exchanges in the final section only.
    plan = _plan(df).split("== Initial Plan ==")[0]
    n_hash_ex = plan.count("Exchange hashpartitioning")
    assert n_hash_ex <= 4, f"{n_hash_ex} hash exchanges:\n{plan}"


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """Join-driven pruning: a filter that lives on the DIMENSION side
    must still prune partitions of a partitioned FACT scan — Spark
    plants a dynamicpruning subquery (reusing the broadcast exchange)
    into the fact scan's PartitionFilters.  This is the star-schema
    lever at 100 TB: the fact table is only ever read for the
    partitions the dim filter selects, without the user restating the
    filter on the fact side."""
    from kbrowse_spark.sources.tables import load

    out = str(tmp_path / "orders_by_status")
    load(spark, sf_dir, "orders").write.partitionBy("o_orderstatus").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "o_orderstatus string, label string",
    ).filter(F.col("label") == "open")
    joined = fact.join(dim, "o_orderstatus").select("o_orderkey", "label")
    rows = joined.collect()
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), f"no DPP subquery in:\n{plan}"
    # value check: exactly the 'O' orders survive
    expected = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    ).count()
    assert len(rows) == expected and all(r.label == "open" for r in rows)


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """Join-strategy hints are the manual override when stats mislead
    the planner at scale (e.g. a 'small' side that explodes after a
    filter): each hint must produce its physical join operator."""
    from kbrowse_spark.sources.tables import load

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cases = [
        ("shuffle_hash", "ShuffledHashJoin"),
        ("merge", "SortMergeJoin"),
        ("broadcast", "BroadcastHashJoin"),
    ]
    for hint, op in cases:
        j = li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
        j.collect()
        plan = _plan(j)
        assert op in plan, f"hint {hint!r} did not yield {op}:\n{plan}"


def test_incremental_minhash_from_index_matches_inline(spark, sf_dir, tmp_path):
    """The production incremental path (base dedup state read from the
    materialized parquet index, only the new batch shingled) must give
    byte-identical pairs to the inline oracle-checked formulation —
    and its documents scan must be pruned to the new-batch slice (the
    standing corpus is never re-read, which is the entire point of
    incremental ingest)."""
    from kbrowse_spark.catalog import all_queries
    from kbrowse_spark.operators.dedup import (
        incremental_minhash_from_index,
        materialize_minhash_index,
    )

    idx = str(tmp_path / "minhash_index")
    materialize_minhash_index(spark, sf_dir, idx)
    inline = all_queries()["dedup_incremental_minhash"].builder(
        spark, sf_dir
    )
    from_index = incremental_minhash_from_index(spark, sf_dir, idx)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, from_index.collect())
    )
    plan = from_index._jdf.queryExecution().executedPlan().toString()
    # Every scan of the documents table (the scans projecting `text`)
    # must carry the new-batch pushdown filter — the standing corpus is
    # never re-read from documents.  (Plan lines are width-truncated,
    # so match on filters/columns, not file paths.)
    doc_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "text#" in ln
    ]
    assert doc_scans, "expected at least one documents scan"
    assert all("% 10" in ln for ln in doc_scans)
    # The base corpus arrives from the materialized index: scans that
    # read a `shingle` COLUMN from parquet exist only on that path
    # (the inline formulation derives shingles from text).
    assert any(
        "FileScan parquet" in ln and "shingle#" in ln
        for ln in plan.splitlines()
    )


def test_plan_audit_flags_raw_global_window(spark, sf_dir):
    """The audit's SinglePartition check (tools/audit_plan_smells.py)
    must flag a global window over RAW corpus rows — the shape where
    'No Partition Defined' really does serialize the pipeline — while
    accepting the two benign single-partition shapes: a global
    aggregate's final stage and a driver-bound limit."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "audit_plan_smells",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "audit_plan_smells.py",
        ),
    )
    audit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(audit)

    from pyspark.sql import Window as W

    from kbrowse_spark.sources.tables import load

    li = load(spark, sf_dir, "lineitem")
    # The smell: running total over every raw row, no partition key.
    bad = li.select(
        F.sum("l_quantity")
        .over(W.orderBy("l_orderkey").rowsBetween(W.unboundedPreceding, 0))
        .alias("running")
    )
    assert any(
        s.startswith("SinglePartition->") for s in audit.find_smells(_plan(bad))
    ), _plan(bad)

    # Benign shape 1: global aggregate (final stage consumes one
    # partial-agg row per partition).
    ok_agg = li.agg(F.sum("l_quantity").alias("s"))
    assert not audit.find_smells(_plan(ok_agg))

    # Benign shape 2: driver-bound top-k.
    ok_topk = li.orderBy("l_orderkey").limit(5)
    assert not audit.find_smells(_plan(ok_topk))


def test_aqe_splits_skewed_join_partition(spark):
    """Pin the claimed 100x-safety of the UN-salted fact-fact joins:
    with AQE skew-join enabled (session default), a deliberately skewed
    sort-merge join must show the skew=true marker in the final
    adaptive plan — i.e. Spark really does split the hot partition at
    runtime, so manual salting (join_salted_skew) is an optimization,
    not a correctness requirement."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # Shrink the skew thresholds so a ~MB hot key triggers the
        # runtime split at test scale; disable broadcast so the join
        # is the shuffle join AQE's skew handling applies to.
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        # 200k rows, 99% on key 0 — one shuffle partition dwarfs the
        # rest, the textbook skew shape.
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        # Global agg downstream, NOT groupBy("k"): a same-key groupBy
        # would REQUIRE the join's hash partitioning, and AQE declines
        # to split a skewed partition when the split would break a
        # downstream distribution requirement (that's also the caveat
        # worth pinning: skew-join rescue does not apply under a
        # same-key reuse — those plans still want manual salting).
        joined = left.join(right, "k").agg(
            F.sum(F.length("pad")).alias("s")
        )
        # Execute through the SAME _jdf so the adaptive plan we read is
        # the finalized one (a .write would spawn a fresh execution and
        # leave this one isFinalPlan=false).
        joined.collect()
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_cached_aggregate_compaction_is_size_aware(spark):
    """compact_to_source must scale the cached-aggregate partition count
    WITH source parallelism: 1 partition for a tiny source (the r7
    novelty fix — no near-empty cached partitions) but proportionally
    more for a wide source (never a single-executor funnel at 100 TB)."""
    from kbrowse_spark.functions.cache_registry import compact_to_source

    agg = spark.range(1000).groupBy((F.col("id") % 100).alias("k")).count()

    narrow_src = spark.range(1000).repartition(4)
    wide_src = spark.range(1000).repartition(64)

    # AQE off for determinism: an InMemoryRelation (the production
    # consumer of this helper) stores the pre-AQE shuffle partitioning,
    # which is exactly the near-empty-partition hazard the cap guards.
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        n_narrow = compact_to_source(agg, narrow_src).rdd.getNumPartitions()
        n_wide = compact_to_source(agg, wide_src).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)

    assert n_narrow == 1  # max(1, 4 // 8) — fixture-size behavior
    assert n_wide == 8  # max(1, 64 // 8) — grows with the input
    assert n_wide > n_narrow


def test_minhash_shared_caches_compacted(spark, sf_dir):
    """The two shared MinHash-family caches follow the size-aware rule
    at fixture scale: source scan is 1 partition, so the cached
    aggregates must be exactly 1 partition (not shuffle.partitions
    near-empty ones, and not a hardcoded constant)."""
    from kbrowse_spark.functions.cache_registry import invalidate
    from kbrowse_spark.operators.dedup import (
        _shingle_sizes,
        _shingles_df,
        _verified_common,
    )

    invalidate(sf_dir)
    try:
        n_src = _shingles_df(spark, sf_dir).rdd.getNumPartitions()
        expect = max(1, n_src // 8)
        assert _shingle_sizes(spark, sf_dir).rdd.getNumPartitions() == expect
        assert _verified_common(spark, sf_dir).rdd.getNumPartitions() == expect
        # the substring family's shared hash-grain aggregate (r8)
        # follows the same rule against ITS source's parallelism
        from kbrowse_spark.operators.dedup import _span_gram_stats, _span_grams

        n_g = _span_grams(spark, sf_dir).rdd.getNumPartitions()
        assert _span_gram_stats(spark, sf_dir).rdd.getNumPartitions() == max(
            1, n_g // 8
        )
    finally:
        invalidate(sf_dir)


def test_write_sized_parquet_estimate_audit(spark, sf_dir, tmp_path):
    """The export observes its own row count during the write (zero
    extra jobs) and warns when the caller's cardinality estimate was
    >2x off — the guard against silently mis-sized files at scale."""
    import warnings as w

    from kbrowse_spark.sinks.export import write_sized_parquet
    from kbrowse_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n = docs.count()

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        write_sized_parquet(
            docs, str(tmp_path / "good"), sort_col="doc_id",
            target_rows_per_file=100, approx_total_rows=n,
        )
        assert not [c for c in caught if "approx_total_rows" in str(c.message)]

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        write_sized_parquet(
            docs, str(tmp_path / "bad"), sort_col="doc_id",
            target_rows_per_file=100, approx_total_rows=max(1, n // 10),
        )
        hits = [c for c in caught if "approx_total_rows" in str(c.message)]
        assert hits and "2x-off estimate" in str(hits[0].message)
        # The observed count must be EXACT (ADVICE r8: an observation
        # below the range exchange is re-executed by the boundary
        # sampling pass and reads ~2x the true count).
        assert f"observed {n} rows" in str(hits[0].message)

    # Estimates >2x too HIGH must flag too (the old below-exchange
    # placement made actual/total look like 2n/3n and never fired).
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        write_sized_parquet(
            docs, str(tmp_path / "high"), sort_col="doc_id",
            target_rows_per_file=100, approx_total_rows=3 * n,
        )
        assert [c for c in caught if "approx_total_rows" in str(c.message)]


def test_udf_queries_survive_bare_worker_pythonpath(tmp_path):
    """Python-UDF queries must be worker-self-contained: cloudpickle
    serializes module-level helper references by module path, which a
    BARE session (driver launched outside the repo, no kbrowse_spark
    on worker PYTHONPATH) cannot import back — the exact failure mode
    the driver's harness runs under, invisible to in-repo pytest
    sessions.  Reproduce it: subprocess the driver emulator from an
    outside cwd, restricted to every pandas-udf-tagged query.
    (Caught live in r8: warc_record_extract's packer called a module
    helper worker-side and died only under the emulator.)"""
    import subprocess
    import sys as _sys

    from kbrowse_spark.catalog import all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    udf_queries = sorted(
        n for n, q in all_queries().items() if "pandas-udf" in q.tags
    )
    assert udf_queries  # the tag must keep existing
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYTHONSTARTUP")
    }
    out = subprocess.run(
        [_sys.executable, os.path.join(repo, "tests", "driver_emulator.py"),
         *udf_queries],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert "RESULT: ALL MATCH" in out.stdout, out.stdout[-3000:] + out.stderr[-2000:]

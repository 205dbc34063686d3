"""Candidate-pair-growth invariant for the adaptive LSH band ladder
(operators/knn.py).

The scale claim behind ``embedding_neardup_lsh``/``_rerank_np`` is that
the integer bpb ladder keeps the banded self-join's output LINEAR in
the corpus (bounded oscillation), not quadratic.  Round 8 argued this;
these tests measure it: ``neardup_lsh_pair_stats`` counts the actual
join output (``pairs_gross`` = sum of C(m,2) over band buckets — the
exact pre-DISTINCT row count the pair join produces) and the tests
assert the documented envelope:

* per corpus: ``pairs_gross <= 4 * BAND_OCCUPANCY * n_corpus`` —
  candidate volume is linear with a bounded (4x) skew factor over the
  target occupancy;
* across SFs: ``pairs_per_row`` grows at most 4x per DECADE of corpus
  growth (sub-decade steps scale the bound) — a fixed-band quadratic
  plan grows pairs_per_row ~n (10x/decade, measured 17.4x pre-r8).

Measured reference points (2026-08, idle box):
  n=500: 31.4   n=2k: 65.2   n=20k: 51.5   n=200k: 72.8
so the envelope has ~3.5x headroom at the worst point.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from kbrowse_spark.operators.knn import (
    BAND_OCCUPANCY,
    _BPB_MAX,
    _BPB_MIN,
    _bpb_case,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".localdata", "sf1")


def _ladder_py(n: int) -> int:
    """The ladder's intended math: clamp(ceil(log2(n/occupancy)), 4, 16)."""
    if n <= BAND_OCCUPANCY:
        return _BPB_MIN
    return max(_BPB_MIN, min(_BPB_MAX, math.ceil(math.log2(n / BAND_OCCUPANCY))))


def test_bpb_ladder_matches_log_formula_and_bounds_occupancy():
    """The integer CASE ladder equals the log2 formula at every corpus
    size across the whole operating range (including every power-of-two
    boundary +-1), and in the unclamped region it holds expected bucket
    occupancy n/2^bpb within (OCCUPANCY/2, OCCUPANCY]."""
    ns = [1, 2, 50, 64, 65, 100, 500, 2000, 20000, 200000]
    for k in range(2, 24):
        ns += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    case = _bpb_case("n")
    got = duckdb.sql(
        "SELECT n, " + case + " AS bpb FROM (SELECT unnest(?) AS n)", params=[ns]
    ).fetchall()
    for n, bpb in got:
        assert bpb == _ladder_py(n), (n, bpb, _ladder_py(n))
        occ = n / (1 << bpb)
        if _BPB_MIN < bpb < _BPB_MAX:
            assert BAND_OCCUPANCY / 2 < occ <= BAND_OCCUPANCY, (n, bpb, occ)
        elif bpb == _BPB_MAX:
            # clamp region: occupancy grows linearly past ~2^16*64
            # vectors — documented extension point (add planes).
            assert n > BAND_OCCUPANCY * (1 << (_BPB_MAX - 1))


def _stats(spark, sf_dir):
    from kbrowse_spark.catalog import all_queries
    from kbrowse_spark.functions.cache_registry import invalidate

    row = (
        all_queries()["neardup_lsh_pair_stats"].builder(spark, sf_dir).collect()[0]
    )
    invalidate(sf_dir)
    return row.asDict()


def _assert_envelope(small: dict, big: dict) -> None:
    """Per-corpus linear bound + bounded per-row growth between two
    measured corpora (bound scaled to the step size: 4x per decade)."""
    for s in (small, big):
        assert s["pairs_gross"] <= 4 * BAND_OCCUPANCY * s["n_corpus"], s
    step = big["n_corpus"] / small["n_corpus"]
    assert step >= 4, "need a meaningful corpus step to test growth"
    ppr_small = small["pairs_gross"] / small["n_corpus"]
    ppr_big = big["pairs_gross"] / big["n_corpus"]
    # 4x allowed per 10x step; pro-rate the exponent for smaller steps.
    bound = 4 ** math.log10(step)
    assert ppr_big / ppr_small <= bound, (ppr_small, ppr_big, bound)


def test_pair_growth_envelope_sf0001_to_sf01(spark):
    """n=500 -> n=2000 (4x): pairs/row growth must stay under
    4^log10(4) ~ 2.3; a fixed-band quadratic plan measures 4x."""
    _assert_envelope(_stats(spark, SF001), _stats(spark, SF01))


@pytest.mark.skipif(
    not os.path.isdir(SF1), reason="needs tools/make_bigsf.py sf1 fixtures"
)
def test_pair_growth_envelope_decade_sf01_to_sf1(spark):
    """A full measured decade (n=2000 -> n=20000): pairs/row growth
    must stay under 4x; fixed-band measures ~10x."""
    _assert_envelope(_stats(spark, SF01), _stats(spark, SF1))


def test_ddsketch_bucket_function_properties():
    """Pure-math property test of the log-linear bucket expression
    (no Spark): for random positive int64 values, the DuckDB-evaluated
    bucket (same text the oracle runs) must equal a Python reference,
    be monotone in v, and contain v in [est_lo, est_hi) with relative
    width <= 1/16 + rounding."""
    import random

    from kbrowse_spark.operators.corpus_stats import _DDQ_DUCK_BUCKET

    rnd = random.Random(9)
    vals = sorted(
        {rnd.randint(1, 2**k) for k in range(1, 60) for _ in range(4)}
        | {1, 2, 15, 16, 17, 2**40 - 1, 2**40, 2**40 + 1}
    )
    expr = _DDQ_DUCK_BUCKET.replace("n_chars", "v")
    got = duckdb.sql(
        f"SELECT v, CAST({expr} AS BIGINT) AS b,"
        " ((16 + CAST({e} AS BIGINT) % 16) * (CAST(1 AS BIGINT) << ({e} // 16))) // 16 AS lo,"
        " ((17 + CAST({e} AS BIGINT) % 16) * (CAST(1 AS BIGINT) << ({e} // 16))) // 16 AS hi"
        " FROM (SELECT unnest(?) AS v)".replace("{e}", f"({expr})"),
        params=[vals],
    ).fetchall()
    prev_v, prev_b = 0, -1
    for v, b, lo, hi in got:
        e = v.bit_length() - 1
        sub = (v * 16) // (1 << e) - 16
        assert b == e * 16 + sub, (v, b)
        assert 0 <= sub < 16, (v, sub)
        # closed interval: for v < 16 the bucket is a single integer
        # and the floored upper bound collapses onto it (hi == lo == v)
        assert lo <= v <= hi, (v, lo, hi)
        assert (hi - lo) <= lo // 16 + 2, (v, lo, hi)
        assert b >= prev_b, (prev_v, v)  # monotone in v
        prev_v, prev_b = v, b

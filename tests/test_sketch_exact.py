"""Accuracy invariants for the r13 cross-engine-exact sketch family.

The three approx queries (``approx_distinct_parts``,
``sketch_hll_rollup_merge``, ``approx_percentile_prices``) are now
hash-exact against DuckDB (the oracle gate checks equality of the
sketch VALUES); these tests pin what equality alone cannot — that the
deterministic sketches are also ACCURATE approximations of the exact
statistics, the assertions that previously lived in
tests/quant_checks.py.  Also keeps the engine-native sketch functions
(approx_count_distinct, percentile_approx, hll_sketch_agg /
hll_union_agg) exercised, since the catalog queries no longer call
them.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kbrowse_spark.catalog import all_queries
from kbrowse_spark.sources.tables import load

# 24-bit-suffix HLL with m=256: sigma = 1.04/sqrt(256) = 6.5%; linear
# counting below 640 is tighter.  15% is ~2.3 sigma — loose enough to
# be seed-stable, tight enough to catch any register/estimate bug.
_HLL_TOL = 0.15


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("lineitem", "orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_hll_distinct_parts_accuracy(spark, sf_dir):
    rows = {
        r["l_returnflag"]: r
        for r in all_queries()["approx_distinct_parts"]
        .builder(spark, sf_dir)
        .collect()
    }
    exact = dict(
        _duck(sf_dir)
        .execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem"
            " GROUP BY 1"
        )
        .fetchall()
    )
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        assert r["exact_parts"] == exact[flag]
        err = abs(r["approx_parts"] - exact[flag]) / exact[flag]
        assert err <= _HLL_TOL, (flag, r["approx_parts"], exact[flag])


def test_hll_rollup_merge_accuracy(spark, sf_dir):
    rows = {
        r["event_type"]: r
        for r in all_queries()["sketch_hll_rollup_merge"]
        .builder(spark, sf_dir)
        .collect()
    }
    exact = {
        k: (u, d)
        for k, u, d in _duck(sf_dir)
        .execute(
            "SELECT event_type, COUNT(DISTINCT user_id),"
            " COUNT(DISTINCT date_trunc('day', ts))"
            " FROM events GROUP BY 1"
        )
        .fetchall()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        users, days = exact[et]
        assert r["exact_users"] == users and r["n_days"] == days
        err = abs(r["approx_users"] - users) / users
        assert err <= _HLL_TOL, (et, r["approx_users"], users)


def test_ddq_percentile_prices_brackets_exact(spark, sf_dir):
    """est_lo <= exact ceil-rank quantile (in cents) <= est_hi, and the
    bracket's relative width is <= 1/16 (the 4-bit-mantissa guarantee)."""
    rows = (
        all_queries()["approx_percentile_prices"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert rows, "empty result"
    con = _duck(sf_dir)
    for r in rows:
        q, grp, n = r["q"], r["o_orderpriority"], r["n"]
        rank = (q * n + 99) // 100  # ceil(q*n/100), 1-based
        (exact_cents,) = con.execute(
            "SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS c"
            " FROM orders WHERE o_orderpriority = ?"
            " ORDER BY c LIMIT 1 OFFSET ?",
            [grp, rank - 1],
        ).fetchone()
        assert r["est_lo_cents"] <= exact_cents <= r["est_hi_cents"], (
            grp,
            q,
            exact_cents,
            r["est_lo_cents"],
            r["est_hi_cents"],
        )
        width = r["est_hi_cents"] - r["est_lo_cents"]
        assert width <= r["est_lo_cents"] / 16 + 1, (grp, q, width)


def test_hll_set_algebra_brackets_exact(spark, sf_dir):
    """Inclusion-exclusion intersection estimates: per-sketch identities
    hold exactly (union <= a + b; union >= max(a, b) — register MAX can
    only grow a sketch), and the estimated intersection lands within
    25% of the exact overlap (IE compounds three 6.5%-sigma sketches;
    measured worst 7.5% at sf0.01)."""
    rows = (
        all_queries()["hll_set_algebra_pairs"].builder(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert r["approx_union"] <= r["approx_a"] + r["approx_b"]
        # Register MAX-merge is monotone per branch; the raw/LC branch
        # crossover can wiggle a few % at the 5m/2 threshold, hence 0.97.
        assert r["approx_union"] >= max(r["approx_a"], r["approx_b"]) * 0.97
        tol = max(0.25 * r["exact_intersection"], 5)
        assert abs(r["approx_intersection"] - r["exact_intersection"]) <= tol


def test_hll_fold_ladder_accuracy(spark, sf_dir):
    """Every fold rung must stay within ~4 sigma of the 1.04/sqrt(m)
    asymptotic (LC rungs are tighter still), and the exact column must
    match DuckDB — the ladder is the sizing design step, so its error
    column has to be trustworthy."""
    import math

    rows = (
        all_queries()["hll_fold_precision_ladder"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert [r["m_registers"] for r in rows] == [64, 128, 256]
    (exact,) = {r["exact_parts"] for r in rows}
    duck = _duck(sf_dir).execute(
        "SELECT COUNT(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()[0]
    assert exact == duck
    for r in rows:
        sigma = 1.04 / math.sqrt(r["m_registers"])
        assert r["abs_err_ppm"] <= 4 * sigma * 1_000_000, r
        assert r["sketch_bits"] == 5 * r["m_registers"]


def test_native_sketch_functions_stay_accurate(spark, sf_dir):
    """The engine-native sketches the r13 reformulation replaced must
    remain exercised: approx_count_distinct / hll_sketch_agg within 5%
    of exact; percentile_approx returns an in-group data value whose
    rank is within the documented n/accuracy bound."""
    li = load(spark, sf_dir, "lineitem")
    r = (
        li.agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("a"),
            F.countDistinct("l_partkey").alias("x"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("l_partkey", 12)
            ).alias("h"),
        )
        .collect()[0]
    )
    assert abs(r["a"] - r["x"]) / r["x"] <= 0.05
    assert abs(r["h"] - r["x"]) / r["x"] <= 0.05

    o = load(spark, sf_dir, "orders")
    acc = 10000
    p = o.agg(
        F.percentile_approx("o_totalprice", 0.95, acc).alias("p"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    con = _duck(sf_dir)
    cnt_lt, cnt_le = con.execute(
        "SELECT COUNT(*) FILTER (o_totalprice < ?),"
        " COUNT(*) FILTER (o_totalprice <= ?) FROM orders",
        [p["p"], p["p"]],
    ).fetchone()
    assert cnt_le > cnt_lt, "percentile_approx must return a data value"
    tol = max(2.0, p["n"] / acc)
    assert cnt_lt + 1 <= 0.95 * p["n"] + tol
    assert cnt_le >= 0.95 * p["n"] - tol


def test_hll_merge_equals_direct(spark, sf_dir):
    """Register-MAX merge invariance: merging per-day sketches must
    yield the same registers (so the same estimate) as sketching the
    whole corpus directly — the property that makes the rollup valid."""
    from kbrowse_spark.functions.sketches import (
        hll_bucket_sql,
        hll_rho_sql,
    )

    ev = load(spark, sf_dir, "events")
    key = "CAST(user_id AS STRING)"
    hashed = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr(hll_bucket_sql("spark", key)).alias("bucket"),
        F.expr(hll_rho_sql("spark", key)).alias("rho"),
    )
    merged = (
        hashed.groupBy("event_type", "day", "bucket")
        .agg(F.max("rho").alias("reg"))
        .groupBy("event_type", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    direct = hashed.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("reg")
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

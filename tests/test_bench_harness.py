"""Bench harness contract: a query failing in the untimed warm pass is
NAMED on stderr (otherwise it would run cold in the timed loop and
surface only as a mystery spread outlier — VERDICT r7 #3)."""

from __future__ import annotations

import bench


class _Boom:
    @property
    def builder(self):
        def _b(spark, sf_dir):
            raise RuntimeError("deliberately broken for the warm-pass test")

        return _b


def test_warm_pass_names_failing_query(capsys):
    qs = {"deliberately_broken_query": _Boom()}
    bench.warm_pass(
        spark=None, qs=qs, names=["deliberately_broken_query"],
        sf_dir="/nonexistent", label="warm pass",
    )
    err = capsys.readouterr().err
    assert "deliberately_broken_query" in err
    assert "RuntimeError" in err
    assert "warm pass failed" in err


def test_contended_flag_sees_between_run_load():
    """VERDICT r8 #3: within-run spread provably cannot see BETWEEN-run
    neighbor load, so an elevated 1-minute loadavg alone must flip the
    flag (the r8 driver run: loadavg 2.35 -> borderline but spreads
    clean recorded phantom 2.6x regressions; threshold cpus/8 = 4)."""
    # idle box, clean spreads -> not contended
    assert not bench.is_contended(0, 43, 0.3, 32)
    # loaded box, clean spreads -> contended (the r8 failure mode)
    assert bench.is_contended(0, 43, 4.5, 32)
    # idle loadavg but >25% of queries spread>2 -> contended
    assert bench.is_contended(12, 43, 0.3, 32)
    assert not bench.is_contended(10, 43, 0.3, 32)
    # boundary: exactly cpus/8 does not fire (strict >)
    assert not bench.is_contended(0, 43, 4.0, 32)


def test_stdout_summary_line_fits_driver_tail_capture():
    """The driver records a 2000-byte stdout tail and parses the LAST
    line; r1-r8 every BENCH_r*.json had parsed:null because the line
    outgrew it, and at 66 headline queries the full per-query dict
    did again (r12: 2003 bytes).  stdout_queries() keeps the slowest
    queries individually inside a byte budget and folds the rest into
    one __others__ rollup, so the line fits at ANY catalog size —
    asserted with worst-case 9.999 s values."""
    import json

    times = {n: 9.999 for n in bench.HEADLINE}
    q = bench.stdout_queries(times)
    summary = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": q,
        "n_queries": len(times),
        "contended": False,
        "n_spread_gt2": 0,
        "loadavg_1m": 0.25,
        "runs_per_query": 3,
        "sf": 0.1,
    }
    # Same compact separators bench.py prints with.
    assert len(json.dumps(summary, separators=(",", ":"))) < 1900
    # The rollup conserves the total and keeps the slow tail
    # per-query: every individually-listed time >= every folded one.
    folded = q.get("__others__", {"n": 0, "total": 0.0})
    listed = {k: v for k, v in q.items() if k != "__others__"}
    assert len(listed) + folded["n"] == len(times)
    assert abs(
        sum(listed.values()) + folded["total"] - sum(times.values())
    ) < 0.05 * len(times)
    # With 500 single-char-named queries the budget still holds.
    wide = {f"q{i}": 9.999 for i in range(500)}
    line = json.dumps(
        dict(summary, queries=bench.stdout_queries(wide)),
        separators=(",", ":"),
    )
    assert len(line) < 1900
    # r12 ADVICE: the budget accounting must hold BY CONSTRUCTION —
    # the serialized queries dict (including the __others__ rollup and
    # the braces) must fit the budget itself, not rely on headroom.
    for t in (times, wide):
        rendered = json.dumps(
            bench.stdout_queries(t), separators=(",", ":")
        )
        assert len(rendered) <= bench._STDOUT_QUERIES_BUDGET, len(rendered)


def test_stdout_queries_keeps_slowest_per_query():
    times = {f"query_name_number_{i:03d}": i / 10 for i in range(100)}
    q = bench.stdout_queries(times)
    listed = {k for k in q if k != "__others__"}
    assert "query_name_number_099" in listed  # slowest present
    if "__others__" in q:
        slowest_folded = max(
            v for k, v in times.items() if k not in listed
        )
        assert min(q[k] for k in listed) >= round(slowest_folded, 2)


def test_input_size_aware_shuffle_partitions():
    """session.py deployment rule (VERDICT r8 #3): partitions floor at
    the cpu count, grow linearly with input bytes (8 MiB/partition),
    cap at 4096 for AQE to coalesce."""
    from kbrowse_spark.session import shuffle_partitions_for

    mib = 1024 * 1024
    assert shuffle_partitions_for(17 * mib, cpus=32) == 32  # sf0.1
    assert shuffle_partitions_for(118 * mib, cpus=32) == 32  # sf1: floor
    assert shuffle_partitions_for(1132 * mib, cpus=32) == 142  # sf10
    assert shuffle_partitions_for(10**14, cpus=32) == 4096  # 100 TB: cap
    assert shuffle_partitions_for(0, cpus=32) == 32


def test_headline_queries_all_registered():
    from kbrowse_spark.catalog import all_queries

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench names not in catalog: {missing}"
    assert isinstance(bench.HEADLINE, list) and len(set(bench.HEADLINE)) == len(
        bench.HEADLINE
    )

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


def test_headline_queries_all_registered():
    from kbrowse_spark.catalog import all_queries

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench names not in catalog: {missing}"
    assert isinstance(bench.HEADLINE, list) and len(set(bench.HEADLINE)) == len(
        bench.HEADLINE
    )

"""Every oracle=None catalog query must carry a quantitative check and
pass it — closing the round-4 verification gap where "no_oracle" meant
"ran, produced rows" with zero value verification (VERDICT r4,
"What's missing" #2)."""

from __future__ import annotations

import pytest

from kbrowse_spark.catalog import all_queries
from tests.oracle_check import compare
from tests.quant_checks import CHECKS


def _no_oracle_batch_names():
    return sorted(
        name
        for name, q in all_queries().items()
        if q.oracle is None
        and "streaming" not in q.tags
        and "stateful" not in q.tags
    )


def test_every_no_oracle_query_has_quant_check():
    names = _no_oracle_batch_names()
    assert names, "expected some oracle=None queries in the catalog"
    missing = [n for n in names if n not in CHECKS]
    assert not missing, f"oracle=None queries without a quantitative check: {missing}"


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_quant_check_passes(spark, sf_dir, name):
    qs = all_queries()
    r = compare(spark, qs[name], sf_dir)
    assert r.get("quant"), f"{name}: quantitative check did not run: {r}"
    assert r["ok"], f"{name}: {r.get('why')}"

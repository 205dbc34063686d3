"""Funnel ordering semantics: stages must occur in order — a click
BEFORE the first view does not advance the funnel."""

from __future__ import annotations

import os

import pytest

from kbrowse_spark.operators.analytics import funnel_conversion


@pytest.fixture()
def funnel_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("funnel")
    rows = [
        # user 1: view -> click -> purchase (full funnel)
        (1, "2024-01-01 00:00:01", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:00:02", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 00:00:03", 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE view -> funnel stops at 'view'
        (4, "2024-01-01 00:00:01", 2, "click", 1.0, "{}"),
        (5, "2024-01-01 00:00:02", 2, "view", 1.0, "{}"),
        (6, "2024-01-01 00:00:03", 2, "purchase", 1.0, "{}"),
        # user 3: view -> purchase, no click -> stops at 'view'
        (7, "2024-01-01 00:00:01", 3, "view", 1.0, "{}"),
        (8, "2024-01-01 00:00:02", 3, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        [(e, t, u, ty, v, p) for e, t, u, ty, v, p in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(os.path.join(str(d), "events.parquet"))
    return str(d)


def test_funnel_requires_stage_order(spark, funnel_dir):
    rows = {r["stage"]: r["n_users"] for r in funnel_conversion(spark, funnel_dir).collect()}
    assert rows == {"view": 3, "view>click": 1, "view>click>purchase": 1}

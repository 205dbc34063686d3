"""Keyed DataFrame cache registry.

Operators that self-join a computed subtree (.cache() it) would pin a
NEW cached RDD on every builder invocation — bench/scaling/service
sessions invoke builders repeatedly, growing executor storage without
bound.  This registry caches once per (application, sf_dir, key) and
reuses it, so repeated invocations share one materialization.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: dict[tuple, DataFrame] = {}


def cached(
    spark: SparkSession, sf_dir: str, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    full_key = (spark.sparkContext.applicationId, sf_dir, key)
    df = _REGISTRY.get(full_key)
    if df is None:
        df = build().cache()
        _REGISTRY[full_key] = df
    return df

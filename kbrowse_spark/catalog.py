"""Query catalog: the declared operator surface of the engine.

Each :class:`QueryDef` pairs a Spark DataFrame builder with (usually) a
DuckDB-runnable oracle SQL string.  The driver's correctness gate runs
both at sf=0.01 and hash-compares rows — so builders must be
deterministic: explicit tie-broken ordering where order matters,
decimal-exact aggregation for doubles (see functions/determinism.py),
and identical column names/types on both sides.

The catalog is assembled from the operator modules; ``__spark_entry__``
re-exports it in the driver's expected shape.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, *tags: str):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Import operator modules for their registration side effects.
    from kbrowse_spark.operators import (  # noqa: F401
        dedup,
        kbrowse_scan,
        knn,
        multimodal,
        pipeline_ops,
        relational,
        streaming_queries,
        text_analysis,
        udf_surface,
    )

    return dict(_REGISTRY)

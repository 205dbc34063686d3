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


def _previously_checked() -> set[str]:
    """Query names already hash-verified (or rows-only-by-design) by a
    prior driver round's CORRECTNESS_r*.json, if any are present."""
    import glob
    import json
    import os

    checked: set[str] = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in data.items():
            if not isinstance(r, dict):
                continue
            if r.get("hash_match"):
                checked.add(name)
            elif r.get("err") == "no_oracle":
                # A rows-only record only counts as "checked" if the query
                # is STILL oracle-less.  A query upgraded from rows-only to
                # oracle-backed since that round (e.g. a stub made real)
                # must sort back into the sampling prefix so the driver can
                # hash-verify it for the first time.
                q = _REGISTRY.get(name)
                if q is None or q.oracle is None:
                    checked.add(name)
    return checked


def all_queries() -> dict[str, QueryDef]:
    # Import operator modules for their registration side effects.
    from kbrowse_spark.operators import (  # noqa: F401
        analytics,
        clustering,
        corpus_stats,
        data_quality,
        dedup,
        graph,
        kbrowse_scan,
        knn,
        linkage,
        multimodal,
        pipeline_ops,
        relational,
        rollup,
        streaming_queries,
        text_analysis,
        text_unicode,
        udf_surface,
    )

    # The driver's correctness gate samples a prefix of this dict; list
    # queries no prior round has verified first so every round's sample
    # covers new ground (stable within each group: registration order).
    checked = _previously_checked()
    ordered = sorted(_REGISTRY.values(), key=lambda q: q.name in checked)
    return {q.name: q for q in ordered}

"""Cross-engine deterministic aggregate expressions.

Floating-point sums depend on accumulation order, which differs between
Spark (partial aggregation across partitions) and any oracle engine —
and even between two runs of the same Spark job once partitioning
changes.  For every aggregate that feeds the DuckDB-oracle hash check we
therefore sum in *decimal* (exact, order-independent) and cast the final
value back to double.  The per-row cast double→decimal is deterministic
(round-half-up at a fixed scale in both engines), so both engines
produce bit-identical doubles.

At 100 TB scale this costs one extra cast per row inside the hash
aggregate — still JVM-side, still whole-stage-codegen'd, and it keeps
partial aggregation (map-side combine) fully available because decimal
sums are associative and exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 6 keeps us far from any decimal rounding boundary for data with
# <=2 real decimal digits; precision 25 leaves 19 integer digits of
# headroom before overflow (sum of ~1e12 rows of ~1e6 values).
_PREC, _SCALE = 25, 6
_DEC = f"decimal({_PREC},{_SCALE})"


def dsum(col: Column | str) -> Column:
    """Order-independent double sum: SUM(CAST(x AS DECIMAL)) → DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent double mean: decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB rendering of :func:`dsum` for the oracle side."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB rendering of :func:`davg` for the oracle side."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )

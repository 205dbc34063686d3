"""Scale-aware dataset export: write parquet with controlled output
file sizes and layout.

Training-data pipelines are judged by their *output* layout as much as
their transforms: a 100 TB corpus written as 10⁷ tiny files kills every
downstream reader (file-listing, footer fetches, task scheduling), and
one written as 10³ huge files kills parallelism.  The lever is
records-per-file + a range partitioning that keeps each output file a
contiguous key range (so downstream range predicates prune files via
parquet min/max).

No reference analogue — kbrowse only streams JSON to the HTTP response
(SURVEY §2a O15); this is part of the declared extension surface.
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import DataFrame, Observation


def write_sized_parquet(
    df: DataFrame,
    path: str,
    *,
    sort_col: str,
    target_rows_per_file: int,
    approx_total_rows: int | None = None,
    partition_by: str | None = None,
) -> int:
    """Write ``df`` as parquet with ~``target_rows_per_file`` rows per
    file, each file a contiguous ``sort_col`` range.  Returns the
    number of range shards used.

    * ``repartitionByRange(sort_col)`` gives non-overlapping key ranges
      per task — every output file's parquet min/max on ``sort_col`` is
      a tight interval, so downstream range scans skip whole files.
    * ``maxRecordsPerFile`` caps file size without a second shuffle if
      a range shard comes out oversized (skewed key density).
    * ``approx_total_rows`` sizes the shard count without forcing an
      extra count job when the caller already knows the cardinality
      (e.g. from a previous stage); pass None to count.
    * The write self-audits the estimate with ``df.observe`` — the
      actual row count is collected DURING the write action (zero
      extra jobs) and a >2x deviation raises a warning: at 100 TB a
      stale estimate silently writes 10 GB or 10 KB files, and the
      observation is the free way to catch it.  The observation sits
      ABOVE the range exchange: ``repartitionByRange`` runs an extra
      range-boundary SAMPLING job over its child, so a CollectMetrics
      below the exchange is executed twice and reports ~2x the true
      count (ADVICE r8) — above it, only the write job traverses the
      node and the count is exact.
    """
    from pyspark.sql import functions as F

    total = approx_total_rows if approx_total_rows is not None else df.count()
    shards = max(1, math.ceil(total / max(1, target_rows_per_file)))
    obs = Observation()
    writer = (
        df.repartitionByRange(shards, sort_col)
        .observe(obs, F.count(F.lit(1)).alias("n_rows"))
        .sortWithinPartitions(sort_col)
        .write.option("maxRecordsPerFile", target_rows_per_file)
        .mode("overwrite")
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)
    actual = obs.get["n_rows"]
    if actual > 0 and total > 0 and not 0.5 <= actual / total <= 2.0:
        warnings.warn(
            f"write_sized_parquet: approx_total_rows={total} but the "
            f"write observed {actual} rows — shard sizing was computed "
            f"from a >2x-off estimate; downstream file sizes will be "
            f"off by the same factor",
            stacklevel=2,
        )
    return shards


def zorder_key(col_a, col_b, *, bits: int = 16, bounds_a=None, bounds_b=None):
    """Morton (Z-order) key interleaving two numeric columns — sort by
    it before writing and BOTH columns get tight per-file parquet
    min/max ranges, so range predicates on EITHER column prune files.
    A plain sort gives that for the leading column only; Z-order trades
    a little pruning power on the first column for real pruning power
    on the second — the standard multi-dimensional layout trick
    (Delta/Iceberg OPTIMIZE ZORDER) expressed as a pure column
    expression, JVM-side, no UDF.

    ``bounds_*`` are (min, max) tuples used to scale each column to
    ``bits``-bit integer grid cells.  Pass known domain bounds (or
    stats from a previous pass) — computing them inline would force an
    extra job.  Values outside the bounds clamp to the grid edge.
    """
    from pyspark.sql import functions as F

    def scaled(c, bounds):
        c = F.col(c) if isinstance(c, str) else c
        lo, hi = bounds
        cells = (1 << bits) - 1
        unit = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
        clamped = F.least(F.greatest(unit, F.lit(0.0)), F.lit(1.0))
        return F.floor(clamped * cells).cast("long")

    a, b = scaled(col_a, bounds_a), scaled(col_b, bounds_b)
    # Interleave: bit j of a -> bit 2j+1, bit j of b -> bit 2j.
    key = F.lit(0).cast("long")
    for j in range(bits):
        key = (
            key.bitwiseOR(F.shiftleft(a.bitwiseAND(F.lit(1 << j)), j + 1))
            .bitwiseOR(F.shiftleft(b.bitwiseAND(F.lit(1 << j)), j))
        )
    return key

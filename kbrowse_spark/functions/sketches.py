"""Deterministic, cross-engine-exact sketch building blocks.

Round 13 closes the driver-ledger gap on the three approx queries that
were rows-only since r02–r04 (``approx_distinct_parts``,
``sketch_hll_rollup_merge``, ``approx_percentile_prices``): the engine's
native sketches (``approx_count_distinct`` HLL++, ``percentile_approx``
t-digest-ish, DataSketches HLL_4) produce algorithm-specific values a
DuckDB oracle can never reproduce, so this module defines the sketches
EXPLICITLY from md5-derived integers, computable bit-for-bit in both
engines — the same design the catalog already proved out on
``cms_heavy_hitters`` (md5 bucket rows) and the DDSketch family
(integer log-linear buckets).

HyperLogLog (Flajolet et al. 2007), made cross-engine exact:

* hash: ``md5(key)`` — identical lowercase hex in Spark and DuckDB.
* bucket: first 2 hex digits -> m = 256 registers (p = 8).
* rho: hex digits 3..8 give a 24-bit suffix ``w``; rho = leading
  zeros of w in 24-bit space + 1 = ``25 - length(bin(w))`` (w > 0,
  exact integer text op — no libm), rho = 25 for w = 0.
* register: MAX(rho) per bucket — mergeable across shards/days by the
  same MAX, which is what makes the rollup query's per-day sketches
  union-able without re-scanning raw data.
* estimate: alpha_m * m^2 / sum(2^-reg) evaluated in FIXED-POINT
  integer arithmetic — each 2^-reg term is ``1 << (25 - reg)`` at
  scale 2^25 (reg <= 25 by construction, so the scaled sum of 256
  terms is <= 2^33: exact in BIGINT, summation-order-independent,
  unlike a double sum whose low-order bits would diverge by engine),
  and alpha_256 = 0.7213/(1 + 1.079/256) is frozen as the rational
  718273/10^6 so the division is a single integer op.
* small-range correction: the standard linear-counting branch
  (raw <= 5m/2 and empty registers V > 0) needs ln(m/V) — libm, NOT
  cross-engine exact — so ln(256/V) for V = 1..255 is precomputed
  HERE as 2^20-scaled integer literals inlined into both SQL dialects;
  the correction is then ``(m * table[V]) // 2^20``, integer-exact.

The resulting estimator is a faithful 24-bit-suffix HLL: standard
error ~1.04/sqrt(256) = 6.5%, register saturation only past ~2^24
distinct per bucket (≈4 × 10^9 total — beyond any per-group
cardinality the catalog's tables reach; the docstrings state the
bound).  Accuracy vs exact counts is pinned by invariant tests
(tests/test_sketch_exact.py); the driver gate now hash-compares the
VALUES against DuckDB running the identical integer recipe.

Also hosts the DDSketch-style integer log-linear bucket helper that
corpus_stats.py pioneered (moved here in r13 so the percentile arm of
the approx family can reuse it on order prices).

Reference has no sketch operators (SURVEY §2c extension surface).
"""

from __future__ import annotations

import math

HLL_P = 8
HLL_M = 1 << HLL_P              # 256 registers
HLL_RHO_MAX = 25                # 24-bit suffix -> rho in [1, 25]
_HLL_SCALE_BITS = 25            # fixed-point scale for 2^-reg terms
HLL_ALPHA_NUM = 718273          # round(1e6 * 0.7213 / (1 + 1.079/256))
HLL_ALPHA_DEN = 10**6
# alpha * m^2 at fixed-point scale 2^25 — the integer numerator of the
# raw estimate; fits comfortably in int64 (~1.58e18 < 2^63).
HLL_EST_NUM = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << _HLL_SCALE_BITS)
HLL_LC_THRESHOLD = (5 * HLL_M) // 2   # 640: use linear counting below
_LC_SCALE_BITS = 20
# ln(256/V) * 2^20, rounded, for V = 1..255 — identical literals are
# inlined into both dialects, so the correction is integer-exact.
HLL_LC_TABLE = [
    round(math.log(HLL_M / v) * (1 << _LC_SCALE_BITS)) for v in range(1, HLL_M)
]


def hll_bucket_sql(dialect: str, key: str) -> str:
    """Register index in [0, 256) from the first 2 hex digits of md5.

    ``key`` is a SQL expression of string type.
    """
    if dialect == "spark":
        return f"CAST(conv(substr(md5({key}), 1, 2), 16, 10) AS BIGINT)"
    return f"('0x' || substr(md5({key}), 1, 2))::BIGINT"


def hll_rho_sql(dialect: str, key: str) -> str:
    """rho = leading zeros + 1 of the 24-bit md5 suffix (hex 3..8)."""
    if dialect == "spark":
        w = f"CAST(conv(substr(md5({key}), 3, 6), 16, 10) AS BIGINT)"
    else:
        w = f"('0x' || substr(md5({key}), 3, 6))::BIGINT"
    return (
        f"CAST(CASE WHEN {w} = 0 THEN {HLL_RHO_MAX} "
        f"ELSE {HLL_RHO_MAX} - length(bin({w})) END AS INT)"
    )


def hll_sum_terms_sql(dialect: str, reg: str, n_present: str) -> str:
    """Scaled denominator sum(2^-reg) * 2^25 over ALL m registers.

    ``reg`` names the per-present-bucket register column inside an
    aggregate (each term is ``1 << (25 - reg)``); absent buckets have
    reg = 0 and contribute 2^25 each, added as ``(m - n_present)`` of
    them.  All terms are BIGINT so the sum is exact and order-free.
    """
    one = "CAST(1 AS BIGINT)"
    if dialect == "spark":
        term = f"shiftleft({one}, {_HLL_SCALE_BITS} - CAST({reg} AS INT))"
    else:
        term = f"({one} << ({_HLL_SCALE_BITS} - {reg}))"
    empty = f"(CAST({HLL_M} AS BIGINT) - {n_present}) * ({one} << {_HLL_SCALE_BITS})" \
        if dialect != "spark" else (
            f"(CAST({HLL_M} AS BIGINT) - {n_present})"
            f" * shiftleft({one}, {_HLL_SCALE_BITS})"
        )
    return f"(SUM({term}) + {empty})"


def hll_estimate_sql(dialect: str, sum_int: str, v0: str) -> str:
    """Cardinality estimate from the scaled register sum + empty count.

    raw  = alpha*m^2*2^25 // (10^6 * sum_int)           (integer)
    est  = linear counting (m * ln(m/V) via the frozen integer table)
           when raw <= 5m/2 and V > 0, else raw          (integer)
    """
    table = ", ".join(str(x) for x in HLL_LC_TABLE)
    if dialect == "spark":
        raw = f"CAST({HLL_EST_NUM} AS BIGINT) div ({HLL_ALPHA_DEN} * {sum_int})"
        lookup = f"element_at(array({table}), greatest(CAST({v0} AS INT), 1))"
        lc = (
            f"CAST({HLL_M} AS BIGINT) * CAST({lookup} AS BIGINT)"
            f" div {1 << _LC_SCALE_BITS}"
        )
    else:
        raw = f"CAST({HLL_EST_NUM} AS BIGINT) // ({HLL_ALPHA_DEN} * {sum_int})"
        lookup = f"([{table}])[greatest({v0}, 1)]"
        lc = (
            f"CAST({HLL_M} AS BIGINT) * CAST({lookup} AS BIGINT)"
            f" // {1 << _LC_SCALE_BITS}"
        )
    return (
        f"CAST(CASE WHEN ({raw}) <= {HLL_LC_THRESHOLD} AND {v0} > 0"
        f" THEN {lc} ELSE {raw} END AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# DDSketch-style integer log-linear quantile buckets (moved from
# corpus_stats.py in r13; see quantile_ddsketch_chars for the design
# rationale — exponent from length(bin(v)), 4-bit linear mantissa,
# guaranteed relative error <= 1/16, no libm anywhere).


def ddq_bucket_sql(v: str, shift: str) -> str:
    """Portable bucket id: e*16 + sub, as dialect-parametrized text.

    ``shift`` is the 1<<e expression: ``shiftleft(CAST(1 AS BIGINT), {e})``
    for Spark, ``(CAST(1 AS BIGINT) << ({e}))`` for DuckDB; integer
    division is spelled ``div``/``//`` by the caller via {d}.
    """
    e = f"(length(bin({v})) - 1)"
    return (
        f"(({e}) * 16 + (({v} * 16) {{d}} {shift.format(e=e)}) - 16)"
    )


def ddq_spark_bucket(v: str) -> str:
    return ddq_bucket_sql(v, "shiftleft(CAST(1 AS BIGINT), {e})").format(d="div")


def ddq_duck_bucket(v: str) -> str:
    return ddq_bucket_sql(v, "(CAST(1 AS BIGINT) << ({e}))").format(d="//")

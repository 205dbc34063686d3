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
HLL_M = 1 << HLL_P              # 256 registers (the default precision)
HLL_RHO_MAX = 25                # 24-bit suffix -> rho in [1, 25]
_HLL_SCALE_BITS = 25            # fixed-point scale for 2^-reg terms
HLL_ALPHA_DEN = 10**6
_LC_SCALE_BITS = 20


def _hll_alpha_num(m: int) -> int:
    """Standard HLL bias constant, frozen as an integer rational
    (num / 10^6): the published small-m values, else the asymptotic
    0.7213/(1 + 1.079/m) formula (Flajolet et al. 2007, fig. 3)."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    return round(alpha * HLL_ALPHA_DEN)


def hll_lc_table(m: int) -> list[int]:
    """ln(m/V) * 2^20, rounded, for V = 1..m-1 — identical literals are
    inlined into both dialects, so linear counting is integer-exact."""
    return [
        round(math.log(m / v) * (1 << _LC_SCALE_BITS)) for v in range(1, m)
    ]


HLL_ALPHA_NUM = _hll_alpha_num(HLL_M)
# alpha * m^2 at fixed-point scale 2^25 — the integer numerator of the
# raw estimate; fits comfortably in int64 (~1.58e18 < 2^63 at m=256).
HLL_EST_NUM = HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << _HLL_SCALE_BITS)
HLL_LC_THRESHOLD = (5 * HLL_M) // 2   # 640: use linear counting below
HLL_LC_TABLE = hll_lc_table(HLL_M)


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


def hll_sum_terms_sql(
    dialect: str, reg: str, n_present: str, m: int = HLL_M
) -> str:
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
    empty = f"(CAST({m} AS BIGINT) - {n_present}) * ({one} << {_HLL_SCALE_BITS})" \
        if dialect != "spark" else (
            f"(CAST({m} AS BIGINT) - {n_present})"
            f" * shiftleft({one}, {_HLL_SCALE_BITS})"
        )
    return f"(SUM({term}) + {empty})"


def hll_estimate_sql(
    dialect: str, sum_int: str, v0: str, m: int = HLL_M
) -> str:
    """Cardinality estimate from the scaled register sum + empty count.

    raw  = alpha_m*m^2*2^25 // (10^6 * sum_int)         (integer)
    est  = linear counting (m * ln(m/V) via the frozen integer table)
           when raw <= 5m/2 and V > 0, else raw          (integer)
    """
    est_num = _hll_alpha_num(m) * m * m * (1 << _HLL_SCALE_BITS)
    lc_threshold = (5 * m) // 2
    table = ", ".join(str(x) for x in hll_lc_table(m))
    if dialect == "spark":
        raw = f"CAST({est_num} AS BIGINT) div ({HLL_ALPHA_DEN} * {sum_int})"
        lookup = f"element_at(array({table}), greatest(CAST({v0} AS INT), 1))"
        lc = (
            f"CAST({m} AS BIGINT) * CAST({lookup} AS BIGINT)"
            f" div {1 << _LC_SCALE_BITS}"
        )
    else:
        raw = f"CAST({est_num} AS BIGINT) // ({HLL_ALPHA_DEN} * {sum_int})"
        lookup = f"([{table}])[greatest({v0}, 1)]"
        lc = (
            f"CAST({m} AS BIGINT) * CAST({lookup} AS BIGINT)"
            f" // {1 << _LC_SCALE_BITS}"
        )
    return (
        f"CAST(CASE WHEN ({raw}) <= {lc_threshold} AND {v0} > 0"
        f" THEN {lc} ELSE {raw} END AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# Fixed-point log2 (r13): the libm-free logarithm the entropy family
# runs on.  log2(x) = (bitlen(x)-1) + log2(mantissa), with the
# fractional part read from a 256-entry Q20 table over the top 8
# mantissa bits — T[j] = round(log2(1 + j/256) * 2^20), precomputed in
# Python and inlined as identical literals into both SQL dialects, so
# the value is integer-exact cross-engine.  Max error ~2^-9 relative
# (half a table step), far below the ppm grain the consumers report.

LOG2_SCALE_BITS = 20
LOG2_TABLE = [
    round(math.log2(1 + j / 256) * (1 << LOG2_SCALE_BITS))
    for j in range(256)
]


def log2_fp_sql(dialect: str, x: str) -> str:
    """Q20 fixed-point log2 of a BIGINT expression >= 1.

    e = length(bin(x)) - 1;   m8 = (x * 256) >> e - 256  in [0, 256)
    log2_fp = e * 2^20 + T[m8]

    ``x`` must be < 2^55 (the *256 headroom); every consumer here is a
    token count, far below that.
    """
    e = f"(length(bin({x})) - 1)"
    table = ", ".join(str(t) for t in LOG2_TABLE)
    if dialect == "spark":
        m8 = f"(({x}) * 256 div shiftleft(CAST(1 AS BIGINT), {e}) - 256)"
        lookup = f"element_at(array({table}), CAST({m8} AS INT) + 1)"
        return (
            f"(CAST({e} AS BIGINT) * {1 << LOG2_SCALE_BITS}"
            f" + CAST({lookup} AS BIGINT))"
        )
    m8 = f"(({x}) * 256 // (CAST(1 AS BIGINT) << ({e})) - 256)"
    lookup = f"([{table}])[CAST({m8} AS INT) + 1]"
    return (
        f"(CAST({e} AS BIGINT) * {1 << LOG2_SCALE_BITS}"
        f" + CAST({lookup} AS BIGINT))"
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

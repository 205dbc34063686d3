"""Hypertable-style rollup operators: serve coarse-grain queries from a
pre-aggregated table plus a raw recent tail.

The reference engine has no aggregation at all (SURVEY §2a — its whole
surface is scan+regex); this module is part of the declared extension
surface: the continuous-aggregate pattern every large event store
(TimescaleDB hypertables, Druid rollup segments, Flink table
materialization) uses to avoid re-scanning history.

At 100 TB the pattern is: a streaming job maintains the hourly rollup
table incrementally (one row per (event_type, hour) — ~10⁵ rows/year
instead of 10¹² raw events); interactive daily/weekly queries read the
rollup and union the small un-rolled-up tail.  Here both halves are
derived inside one builder (the testdata is immutable), but the plan
shape is the production one: the raw scan is bounded to the tail by a
pushed-down timestamp predicate, and history comes from the tiny
pre-agg.

Correctness hinge: partial aggregates must re-aggregate exactly, so the
intermediate per-hour sums stay DECIMAL (associative, exact) and only
the final daily value casts to double — see functions/determinism.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.functions.determinism import sql_dsum
from kbrowse_spark.functions.sketches import (
    HLL_M,
    hll_bucket_sql,
    hll_estimate_sql,
    hll_rho_sql,
    hll_sum_terms_sql,
)
from kbrowse_spark.sources.tables import load, load_events_range

# Tail split point: history (< SPLIT) is served from the hourly rollup,
# the tail (>= SPLIT) from the raw events scan.
_SPLIT = "2024-01-25 00:00:00"
_DEC = "decimal(25,6)"


@register(
    "rollup_hypertable_daily",
    f"""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    ORDER BY event_type, day
    """,
    "agg",
    "rollup",
)
def rollup_hypertable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals served from an hourly pre-agg + raw tail union.

    The oracle recomputes from raw — the rollup path must be
    indistinguishable from a full rescan.  Both partial legs keep
    decimal sums so the two-level aggregation is exact.
    """
    # Both legs bound ts on the RAW storage column (load_events_range)
    # so the bounds reach the parquet reader as min/max-prunable
    # predicates — a filter on the converted timestamp would scan every
    # row group twice.
    # --- the stored hourly rollup (production: incrementally maintained)
    rollup = (
        load_events_range(spark, sf_dir, ts_lt=_SPLIT)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_partial"),
            F.sum(F.col("value").cast(_DEC)).alias("sum_partial"),
        )
    )
    rollup_daily = rollup.select(
        "event_type",
        F.date_trunc("day", "hour").alias("day"),
        "n_partial",
        "sum_partial",
    )

    # --- the raw tail (production: the last few hours not yet rolled up)
    tail_daily = (
        load_events_range(spark, sf_dir, ts_ge=_SPLIT)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_partial"),
            F.sum(F.col("value").cast(_DEC)).alias("sum_partial"),
        )
    )

    return (
        rollup_daily.unionByName(tail_daily)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_partial").alias("n_events"),
            F.sum("sum_partial").cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "sum_value",
        )
        .orderBy("event_type", "day")
    )


_HLL_USERKEY = "CAST(user_id AS STRING)"
_HLL_USERKEY_DUCK = "CAST(user_id AS VARCHAR)"


@register(
    "sketch_hll_rollup_merge",
    f"""
    WITH h AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             {hll_bucket_sql('duck', _HLL_USERKEY_DUCK)} AS bucket,
             {hll_rho_sql('duck', _HLL_USERKEY_DUCK)} AS rho
      FROM events),
    daily AS (
      SELECT event_type, day, bucket, MAX(rho) AS reg
      FROM h GROUP BY 1, 2, 3),
    merged AS (
      SELECT event_type, bucket, MAX(reg) AS reg
      FROM daily GROUP BY 1, 2),
    ndays AS (
      SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      FROM daily GROUP BY 1),
    grp AS (
      SELECT event_type,
             {hll_sum_terms_sql('duck', 'reg', 'COUNT(*)')} AS sum_int,
             CAST({HLL_M} - COUNT(*) AS INT) AS v0
      FROM merged GROUP BY 1),
    est AS (
      SELECT event_type,
             {hll_estimate_sql('duck', 'sum_int', 'v0')} AS approx_users
      FROM grp),
    exact AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM events GROUP BY 1)
    SELECT e.event_type, e.approx_users, x.exact_users, d.n_days
    FROM est e JOIN exact x USING (event_type) JOIN ndays d USING (event_type)
    ORDER BY event_type
    """,
    "agg",
    "approx",
    "rollup",
    "sketch",
)
def sketch_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL register sketches of
    distinct users, merged across days per event_type — the sketch
    analogue of rollup_hypertable_daily for non-additive measures
    (distinct counts can't be pre-summed; sketches make them
    mergeable, and HLL merge is elementwise register MAX).

    r13-reformulated over the explicit md5-derived registers in
    functions/sketches.py (previously DataSketches HLL_4 binaries,
    whose layout is engine-specific — rows-only forever): the per-day
    sketch is a (event_type, day, bucket) -> MAX(rho) table, the
    cross-day merge is MAX again, and the integer fixed-point estimate
    is bit-identical in DuckDB, so the driver gate hash-verifies it.

    At 100 TB: the rollup table stores <= 256 integer registers per
    (event_type, day) — written once per ingest day; any date-range
    distinct-users query MAX-merges the register rows instead of
    re-scanning raw events (no re-scan, one sketch-grain aggregate).
    Both aggregates here are map-side combined; the widest shuffle is
    |event_type| x |day| x 256 register rows.  Accuracy (6.5% sigma,
    LC below 640) pinned vs exact in tests/test_sketch_exact.py, where
    the native hll_sketch_agg/hll_union_agg surface stays exercised.
    """
    ev = load(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr(hll_bucket_sql("spark", _HLL_USERKEY)).alias("bucket"),
        F.expr(hll_rho_sql("spark", _HLL_USERKEY)).alias("rho"),
    )
    daily = hashed.groupBy("event_type", "day", "bucket").agg(
        F.max("rho").alias("reg")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("reg").alias("reg")
    )
    ndays = daily.groupBy("event_type").agg(
        F.countDistinct("day").alias("n_days")
    )
    grp = merged.groupBy("event_type").agg(
        F.expr(hll_sum_terms_sql("spark", "reg", "COUNT(*)")).alias("sum_int"),
        F.expr(f"CAST({HLL_M} - COUNT(*) AS INT)").alias("v0"),
    )
    est = grp.select(
        "event_type",
        F.expr(hll_estimate_sql("spark", "sum_int", "v0")).alias(
            "approx_users"
        ),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .join(ndays, "event_type")
        .select("event_type", "approx_users", "exact_users", "n_days")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# HLL set algebra: audience-overlap estimates from register MAX-merge +
# inclusion-exclusion (r13; builds on the same md5 registers as
# sketch_hll_rollup_merge).

_HLL_CUSTKEY = "CAST(o_custkey AS STRING)"
_HLL_CUSTKEY_DUCK = "CAST(o_custkey AS VARCHAR)"


@register(
    "hll_set_algebra_pairs",
    f"""
    WITH h AS (
      SELECT o_orderpriority AS grp,
             {hll_bucket_sql('duck', _HLL_CUSTKEY_DUCK)} AS bucket,
             {hll_rho_sql('duck', _HLL_CUSTKEY_DUCK)} AS rho
      FROM orders),
    regs AS (
      SELECT grp, bucket, MAX(rho) AS reg
      FROM h GROUP BY 1, 2),
    est1 AS (
      SELECT grp,
             {hll_estimate_sql('duck', 'sum_int', 'v0')} AS approx
      FROM (
        SELECT grp,
               {hll_sum_terms_sql('duck', 'reg', 'COUNT(*)')} AS sum_int,
               CAST({HLL_M} - COUNT(*) AS INT) AS v0
        FROM regs GROUP BY 1)),
    pairs AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b
      FROM (SELECT DISTINCT grp FROM regs) a
      JOIN (SELECT DISTINCT grp FROM regs) b ON a.grp < b.grp),
    uregs AS (
      SELECT p.grp_a, p.grp_b, r.bucket, MAX(r.reg) AS reg
      FROM pairs p JOIN regs r ON r.grp IN (p.grp_a, p.grp_b)
      GROUP BY 1, 2, 3),
    estu AS (
      SELECT grp_a, grp_b,
             {hll_estimate_sql('duck', 'sum_int', 'v0')} AS approx_union
      FROM (
        SELECT grp_a, grp_b,
               {hll_sum_terms_sql('duck', 'reg', 'COUNT(*)')} AS sum_int,
               CAST({HLL_M} - COUNT(*) AS INT) AS v0
        FROM uregs GROUP BY 1, 2)),
    exact AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b,
             CAST(COUNT(*) AS BIGINT) AS exact_intersection
      FROM (SELECT DISTINCT o_orderpriority AS grp, o_custkey FROM orders) a
      JOIN (SELECT DISTINCT o_orderpriority AS grp, o_custkey FROM orders) b
        ON a.o_custkey = b.o_custkey AND a.grp < b.grp
      GROUP BY 1, 2)
    SELECT u.grp_a, u.grp_b,
           ea.approx AS approx_a, eb.approx AS approx_b,
           u.approx_union,
           ea.approx + eb.approx - u.approx_union AS approx_intersection,
           x.exact_intersection
    FROM estu u
    JOIN est1 ea ON ea.grp = u.grp_a
    JOIN est1 eb ON eb.grp = u.grp_b
    JOIN exact x ON x.grp_a = u.grp_a AND x.grp_b = u.grp_b
    ORDER BY u.grp_a, u.grp_b
    """,
    "agg",
    "approx",
    "rollup",
    "sketch",
)
def hll_set_algebra_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA over the md5-register sketches: customer-audience
    overlap between every pair of order priorities — |A∪B| by register
    MAX-merge (the only set op HLL supports natively) and |A∩B| by
    inclusion-exclusion, next to the exact intersection for audit.
    This is the classic sketch-warehouse query (audience overlap /
    cross-segment reach): at 100 TB the per-segment register tables are
    maintained incrementally and any pairwise overlap matrix is
    computed at SKETCH grain — no re-scan, no pairwise distinct joins
    over raw data.

    Everything is the integer-exact machinery of functions/sketches.py,
    so DuckDB computes identical estimates and the driver gate
    hash-verifies them (inclusion-exclusion error vs exact is pinned
    separately in tests/test_sketch_exact.py).

    Plan: one narrow scan -> (priority, bucket) MAX-register aggregate
    (<= 5 x 256 rows); pair fan-out and union-merge run entirely at
    register grain (10 pairs x 256 buckets, broadcast); the exact
    intersection join is the test-SF audit column only.
    """
    o = load(spark, sf_dir, "orders")
    regs = (
        o.select(
            F.col("o_orderpriority").alias("grp"),
            F.expr(hll_bucket_sql("spark", _HLL_CUSTKEY)).alias("bucket"),
            F.expr(hll_rho_sql("spark", _HLL_CUSTKEY)).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    est1 = (
        regs.groupBy("grp")
        .agg(
            F.expr(hll_sum_terms_sql("spark", "reg", "COUNT(*)")).alias(
                "sum_int"
            ),
            F.expr(f"CAST({HLL_M} - COUNT(*) AS INT)").alias("v0"),
        )
        .select(
            "grp",
            F.expr(hll_estimate_sql("spark", "sum_int", "v0")).alias(
                "approx"
            ),
        )
    )
    grps = regs.select("grp").distinct()
    pairs = (
        grps.alias("a")
        .crossJoin(grps.alias("b"))
        .filter(F.expr("a.grp < b.grp"))
        .select(
            F.col("a.grp").alias("grp_a"), F.col("b.grp").alias("grp_b")
        )
    )
    uregs = (
        F.broadcast(pairs)
        .join(
            regs,
            (regs["grp"] == F.col("grp_a")) | (regs["grp"] == F.col("grp_b")),
        )
        .groupBy("grp_a", "grp_b", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    estu = (
        uregs.groupBy("grp_a", "grp_b")
        .agg(
            F.expr(hll_sum_terms_sql("spark", "reg", "COUNT(*)")).alias(
                "sum_int"
            ),
            F.expr(f"CAST({HLL_M} - COUNT(*) AS INT)").alias("v0"),
        )
        .select(
            "grp_a",
            "grp_b",
            F.expr(hll_estimate_sql("spark", "sum_int", "v0")).alias(
                "approx_union"
            ),
        )
    )
    gc = o.select(F.col("o_orderpriority").alias("grp"), "o_custkey").distinct()
    exact = (
        gc.alias("a")
        .join(
            gc.alias("b"),
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.grp") < F.col("b.grp")),
        )
        .groupBy(
            F.col("a.grp").alias("grp_a"), F.col("b.grp").alias("grp_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    ea = est1.select(
        F.col("grp").alias("grp_a"), F.col("approx").alias("approx_a")
    )
    eb = est1.select(
        F.col("grp").alias("grp_b"), F.col("approx").alias("approx_b")
    )
    return (
        estu.join(F.broadcast(ea), "grp_a")
        .join(F.broadcast(eb), "grp_b")
        .join(exact, ["grp_a", "grp_b"])
        .select(
            "grp_a",
            "grp_b",
            "approx_a",
            "approx_b",
            "approx_union",
            (
                F.col("approx_a") + F.col("approx_b") - F.col("approx_union")
            ).alias("approx_intersection"),
            "exact_intersection",
        )
        .orderBy("grp_a", "grp_b")
    )


# ---------------------------------------------------------------------------
# HLL precision ladder (r13): register-count sizing by sketch FOLDING —
# the design step that prices accuracy vs sketch bytes before anyone
# commits a rollup-table schema (the HLL twin of dedup_lsh_band_tuning,
# which prices LSH band factorizations the same way).

_HPL_MS = (64, 128, 256)
_HPL_KEY = "CAST(l_partkey AS STRING)"
_HPL_KEY_DUCK = "CAST(l_partkey AS VARCHAR)"


def _hpl_oracle() -> str:
    arms = []
    for m in _HPL_MS:
        arms.append(f"""
    SELECT CAST({m} AS BIGINT) AS m_registers,
           {hll_estimate_sql('duck', 'sum_int', 'v0', m=m)} AS approx_parts
    FROM (
      SELECT {hll_sum_terms_sql('duck', 'reg', 'COUNT(*)', m=m)} AS sum_int,
             CAST({m} - COUNT(*) AS INT) AS v0
      FROM (SELECT bucket % {m} AS fbucket, MAX(reg) AS reg
            FROM regs GROUP BY 1) f)""")
    union = " UNION ALL ".join(arms)
    return f"""
    WITH h AS (
      SELECT {hll_bucket_sql('duck', _HPL_KEY_DUCK)} AS bucket,
             {hll_rho_sql('duck', _HPL_KEY_DUCK)} AS rho
      FROM lineitem),
    regs AS (SELECT bucket, MAX(rho) AS reg FROM h GROUP BY 1),
    exact AS (
      SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
      FROM lineitem),
    ladder AS ({union})
    SELECT l.m_registers, l.approx_parts, x.exact_parts,
           CAST(1000000 * abs(l.approx_parts - x.exact_parts)
                // x.exact_parts AS BIGINT) AS abs_err_ppm,
           CAST(l.m_registers * 5 AS BIGINT) AS sketch_bits
    FROM ladder l CROSS JOIN exact x
    ORDER BY m_registers
    """


@register(
    "hll_fold_precision_ladder",
    _hpl_oracle(),
    "agg",
    "approx",
    "rollup",
    "sketch",
)
def hll_fold_precision_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register-count SIZING ladder: one 256-register sketch of the
    distinct parts is FOLDED down to m' = 128 and 64 (fold = MAX over
    bucket % m' — the standard HLL precision-downgrade, valid because
    our bucket is uniform md5 bits), and each rung reports its estimate,
    the exact count, the realized error ppm, and the sketch size in
    bits (5-bit registers suffice for rho <= 25).  This is the DESIGN
    step a 100 TB rollup runs once before freezing the register count
    in its table schema: the error column prices what each halving of
    sketch bytes costs — measured on the real corpus, not the
    1.04/sqrt(m) asymptotic (which the invariant test pins it against).

    Folding also proves the maintenance story: a lake can keep
    256-register day sketches and serve coarser queries by folding at
    read time — no re-scan, no second sketch pipeline.

    Everything is the integer-exact machinery of functions/sketches.py
    (per-m frozen alpha rationals + ln tables), so DuckDB reproduces
    every rung bit-for-bit.

    Plan: ONE corpus scan builds the 256-register table; every rung is
    a <= 256-row fold + 1-row estimate — the ladder costs one scan no
    matter how many rungs.
    """
    li = load(spark, sf_dir, "lineitem")
    regs = (
        li.select("l_partkey")
        # Spread the per-row sketch hashing off the single-row-group
        # scan task (r15, guide §2.5 — the join_bloom asymmetry: md5 +
        # two hex parses per row vs an 8-byte key exchange).
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("l_partkey")
        )
        .select(
            F.expr(hll_bucket_sql("spark", _HPL_KEY)).alias("bucket"),
            F.expr(hll_rho_sql("spark", _HPL_KEY)).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
        # Materialize the <=256-row register table ONCE (r14): each
        # ladder rung is a separate plan branch and re-executed the
        # full scan + per-row md5 sketch build per rung (3 extra
        # corpus passes) — the docstring's "one scan no matter how
        # many rungs" now holds physically, not just logically.
        .localCheckpoint(eager=False)
    )
    arms = []
    for m in _HPL_MS:
        folded = (
            regs.groupBy((F.col("bucket") % m).alias("fbucket"))
            .agg(F.max("reg").alias("reg"))
            .agg(
                F.expr(
                    hll_sum_terms_sql("spark", "reg", "COUNT(*)", m=m)
                ).alias("sum_int"),
                F.expr(f"CAST({m} - COUNT(*) AS INT)").alias("v0"),
            )
            .select(
                F.lit(m).cast("long").alias("m_registers"),
                F.expr(
                    hll_estimate_sql("spark", "sum_int", "v0", m=m)
                ).alias("approx_parts"),
            )
        )
        arms.append(folded)
    ladder = arms[0]
    for extra in arms[1:]:
        ladder = ladder.unionByName(extra)
    exact = F.broadcast(
        li.agg(F.countDistinct("l_partkey").alias("exact_parts"))
    )
    return (
        ladder.crossJoin(exact)
        .select(
            "m_registers",
            "approx_parts",
            "exact_parts",
            F.expr(
                "CAST(1000000 * abs(approx_parts - exact_parts)"
                " DIV exact_parts AS BIGINT)"
            ).alias("abs_err_ppm"),
            F.expr("CAST(m_registers * 5 AS BIGINT)").alias("sketch_bits"),
        )
        .orderBy("m_registers")
    )


# ---------------------------------------------------------------------------
# Haar wavelet synopsis (hierarchical dyadic transform, top-B selection)

# The classic time-series synopsis (Matias/Vitter/Wang SIGMOD'98): one
# pass builds the dyadic sum tree, coefficients d = sum(left half) -
# sum(right half) are ranked and only the top-B kept per series, and
# any dyadic range sum is later reconstructed from the B kept numbers
# plus the total.  Everything here is INTEGER (revenue in cents;
# unnormalized Haar differences; reconstruction kept in x8 fixed
# scale so no division ever happens) — hence exactly oracle-checkable.
# Selection ranks by |d| with a (level, pos) tie-break: deterministic,
# and the standard greedy largest-detail variant (the L2-optimal rule
# divides by sqrt(2)^level, which would leave integer arithmetic).
_WAV_LEVELS = 12            # N = 4096 day slots
_WAV_N = 1 << _WAV_LEVELS
_WAV_B = 6                  # coefficients kept per series
_WAV_EPOCH = "1992-01-01"
# The audited reconstruction block: days [1024, 1536) = node (3, 2);
# its root path is (0,0)+, (1,0)-, (2,1)+ giving
#   8 * block_sum = T + d(0,0) - 2*d(1,0) + 4*d(2,1)
# with dropped coefficients contributing zero.
_WAV_PATH = [(0, 0, 1), (1, 0, -2), (2, 1, 4)]
_WAV_BLOCK_LO, _WAV_BLOCK_HI = 1024, 1536


def _wavelet_oracle() -> str:
    parts = [
        f"""
    WITH lev{_WAV_LEVELS} AS (
      SELECT l_suppkey AS s,
             CAST(datediff('day', DATE '{_WAV_EPOCH}', l_shipdate)
                  AS BIGINT) AS pos,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS v
      FROM lineitem GROUP BY 1, 2)"""
    ]
    for lev in range(_WAV_LEVELS - 1, -1, -1):
        parts.append(
            f""",
    lev{lev} AS (
      SELECT s, pos // 2 AS pos,
             CAST(SUM(v) AS BIGINT) AS v,
             CAST(SUM(v * (1 - 2 * (pos % 2))) AS BIGINT) AS d
      FROM lev{lev + 1} GROUP BY 1, 2)"""
        )
    coeff_union = " UNION ALL ".join(
        f"SELECT s, {lev} AS level, pos, d FROM lev{lev}"
        for lev in range(_WAV_LEVELS)
    )
    path_cases = " ".join(
        f"WHEN level = {lv} AND pos = {p} THEN {w}" for lv, p, w in _WAV_PATH
    )
    parts.append(
        f""",
    coeff AS ({coeff_union}),
    kept AS (
      SELECT s, level, pos, d FROM (
        SELECT *, row_number() OVER (PARTITION BY s
                   ORDER BY abs(d) DESC, level, pos) AS rk
        FROM coeff) WHERE rk <= {_WAV_B}),
    total AS (SELECT s, v AS t_cents FROM lev0),
    est AS (
      SELECT t.s,
             t.t_cents + COALESCE(SUM(
               (CASE {path_cases} ELSE 0 END) * k.d), 0) AS est_x8
      FROM total t LEFT JOIN kept k USING (s)
      GROUP BY t.s, t.t_cents),
    exact AS (
      SELECT s, CAST(8 * SUM(v) AS BIGINT) AS exact_x8
      FROM lev{_WAV_LEVELS}
      WHERE pos >= {_WAV_BLOCK_LO} AND pos < {_WAV_BLOCK_HI}
      GROUP BY s)
    SELECT t.s AS suppkey,
           CAST(t.t_cents AS BIGINT) AS t_cents,
           CAST(e.est_x8 AS BIGINT) AS est_x8,
           CAST(COALESCE(x.exact_x8, 0) AS BIGINT) AS exact_x8,
           CAST(abs(e.est_x8 - COALESCE(x.exact_x8, 0)) AS BIGINT)
             AS err_x8
    FROM total t JOIN est e USING (s) LEFT JOIN exact x USING (s)
    ORDER BY suppkey"""
    )
    return "".join(parts)


@register("wavelet_haar_synopsis", _wavelet_oracle(), "rollup", "sketch")
def wavelet_haar_synopsis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier Haar wavelet synopsis of the daily-revenue series:
    build the {n}-slot dyadic sum tree (levels by repeated pairwise
    aggregation), keep the top-{b} coefficients per series, and audit
    the synopsis by reconstructing one dyadic block's revenue from the
    kept coefficients alone, reporting estimate vs exact (both in the
    x8 fixed scale — no division, no rounding-mode divergence).

    Plan shape: ONE corpus pass (the (supplier, day) rollup — the only
    data-sized stage at 100 TB), then one series-grain exchange
    (collect_list per supplier; a series is bounded at {n} slots BY
    CONSTRUCTION, so the grouped row is bounded) into an Arrow-batched
    numpy stage that runs the {k}-level transform, the top-{b}
    selection and the block reconstruction per series — adding
    suppliers adds rows, never rounds.

    Reference has no aggregation at all (SURVEY §2a); synopsis
    operators are §2c extension surface with the CMS/KMV/DDSketch/AMS
    family.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s"),
        F.expr(
            f"CAST(datediff(l_shipdate, DATE '{_WAV_EPOCH}') AS BIGINT)"
        ).alias("pos"),
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    # Loud shape guard: a future fixture vintage whose ship dates run
    # past the 4096-day window would silently alias tree positions —
    # abort instead (same pattern as the linkage name guard).
    li = li.withColumn(
        "pos",
        F.when(
            (F.col("pos") >= 0) & (F.col("pos") < _WAV_N), F.col("pos")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"wavelet_haar_synopsis: shipdate outside the "
                        f"{_WAV_N}-day window from {_WAV_EPOCH}: pos="
                    ),
                    F.col("pos").cast("string"),
                )
            )
        ),
    )
    cur = li.groupBy("s", "pos").agg(F.sum("cents").cast("long").alias("v"))
    # Whole synopsis per SERIES in one Arrow-batched numpy stage (r15,
    # guide §4.2 — the semdedup Gram-matmul precedent): the r14 shape
    # exploded every leaf into its {k} ancestors (a 12x corpus-grain
    # fan-out feeding a ~10x-leaf-count hash aggregate), ranked all
    # coefficients with a per-series window, and re-joined total/exact
    # readouts — 4 exchanges past the leaf rollup.  But a series is
    # bounded at {n} slots BY CONSTRUCTION, so one
    # collect_list-per-supplier exchange (leaf grain, narrow) hands
    # each series to numpy, which runs the 12-level pairwise transform,
    # the top-{b} selection (identical (|d| DESC, level, pos) order),
    # and the reconstruction in int64 — bit-identical to the JVM longs
    # it replaces (sums are order-independent; differences exact).
    # Dense zero coefficients (positions with no leaf under them) are
    # safe: zeros sort strictly after every nonzero |d| and contribute
    # 0 * weight to the estimate, so the emitted rows match the
    # sparse-CTE oracle exactly.  The ORACLE keeps the chained-CTE
    # pyramid formulation, so the value hash cross-checks two
    # independent constructions of the transform.
    per_s = (
        cur.groupBy("s")
        .agg(F.collect_list(F.struct("pos", "v")).alias("pv"))
        .select("s", F.col("pv.pos").alias("ps"), F.col("pv.v").alias("vs"))
    )
    wav_n, wav_levels, wav_b = _WAV_N, _WAV_LEVELS, _WAV_B
    wav_path = tuple(_WAV_PATH)
    blo, bhi = _WAV_BLOCK_LO, _WAV_BLOCK_HI

    def synth(batches):
        import numpy as np
        import pandas as pd

        # (level, pos) identity of every dense coefficient, in the
        # concatenation order the level loop below emits (level
        # LEVELS-1 .. 0); shared across rows and batches.
        lev_all = np.concatenate(
            [
                np.full(1 << lv, lv, dtype=np.int64)
                for lv in range(wav_levels - 1, -1, -1)
            ]
        )
        pos_all = np.concatenate(
            [
                np.arange(1 << lv, dtype=np.int64)
                for lv in range(wav_levels - 1, -1, -1)
            ]
        )
        path = {(lv, p): w for lv, p, w in wav_path}
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0:
                continue
            lens = pdf["ps"].map(len).to_numpy()
            ridx = np.repeat(np.arange(nrows), lens)
            flat_pos = np.concatenate(pdf["ps"].to_list()).astype(np.int64)
            flat_v = np.concatenate(pdf["vs"].to_list()).astype(np.int64)
            a = np.zeros((nrows, wav_n), dtype=np.int64)
            a[ridx, flat_pos] = flat_v
            t_cents = a.sum(axis=1)
            exact = 8 * a[:, blo:bhi].sum(axis=1)
            parts = []
            curm = a
            for _lv in range(wav_levels - 1, -1, -1):
                even, odd = curm[:, 0::2], curm[:, 1::2]
                parts.append(even - odd)
                curm = even + odd
            d_all = np.concatenate(parts, axis=1)
            est = t_cents.copy()
            for r in range(nrows):
                dr = d_all[r]
                top = np.lexsort((pos_all, lev_all, -np.abs(dr)))[:wav_b]
                for j in top:
                    w = path.get((int(lev_all[j]), int(pos_all[j])))
                    if w is not None:
                        est[r] += w * dr[j]
            yield pd.DataFrame(
                {
                    "suppkey": pdf["s"].to_numpy(),
                    "t_cents": t_cents,
                    "est_x8": est,
                    "exact_x8": exact,
                    "err_x8": np.abs(est - exact),
                }
            )

    return per_s.mapInPandas(
        synth,
        schema=(
            "suppkey long, t_cents long, est_x8 long,"
            " exact_x8 long, err_x8 long"
        ),
    ).orderBy("suppkey")


wavelet_haar_synopsis.__doc__ = wavelet_haar_synopsis.__doc__.format(
    n=_WAV_N, b=_WAV_B, k=_WAV_LEVELS
)

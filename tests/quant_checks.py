"""Quantitative checks for catalog queries that have no SQL oracle.

Five queries are quantitative-by-design — the approx sketches whose
estimates are engine-specific (``approx_distinct_parts``,
``sketch_hll_rollup_merge``, ``approx_percentile_prices``) and the two
deflate-dependent codecs whose byte streams depend on the zlib build
(``compression_ratio_quality``, ``multimodal_png_extract``).  (Earlier
rounds also listed libm transcendentals and JSON rendering here; both
were upgraded to exact oracles — integer-scaled formatting and parsed
round-trip comparison respectively.)  Each still admits a strong
value-level check short of exact hashing:

* HLL estimates — within a relative tolerance of the exact
  ``COUNT(DISTINCT …)`` computed by DuckDB on the same parquet;
* ``percentile_approx`` — the returned value's RANK inside its group
  must sit within the sketch's documented rank-error bound of the
  target quantile (computed against DuckDB order statistics);
* deflate codecs — decompress/re-parse the produced bytes and compare
  the recovered CONTENT exactly against DuckDB-side source text
  (compressed byte streams differ across zlib builds; payloads must
  not), plus determinism (two independent builds collect identically).

Registered per query name in ``CHECKS``; ``tests/oracle_check.compare``
consults this for every ``oracle=None`` query, so a passing run means
every catalog entry has a value-level verification, not just
"produced rows".
"""

from __future__ import annotations

import json
import math

# Per Spark docs, percentile_approx(…, accuracy) guarantees a rank
# error of at most n/accuracy within the aggregated group.
_PCTL_ACCURACY = 10000
_HLL_REL_TOL = 0.05  # approx_count_distinct rsd=0.02; HLL_4 lgK=12 ~ 1.6%
_LIBM_REL_TOL = 1e-12


def _cols(colnames):
    return {c: i for i, c in enumerate(colnames)}


def _fail(mode: str, why: str) -> dict:
    return {"ok": False, "mode": mode, "why": why}


def _ok(mode: str) -> dict:
    return {"ok": True, "mode": mode, "why": None}


def _deterministic(spark, sf_dir, qdef, rows) -> str | None:
    """Rebuild the query from scratch and require identical rows."""
    again = [tuple(r) for r in qdef.builder(spark, sf_dir).collect()]
    if sorted(map(repr, again)) != sorted(map(repr, rows)):
        return "two independent builds produced different rows"
    return None


def check_approx_distinct_parts(spark, sf_dir, qdef, rows, colnames, con):
    mode = f"HLL within {_HLL_REL_TOL:.0%} of exact COUNT(DISTINCT)"
    c = _cols(colnames)
    exact = dict(
        con.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM lineitem"
            " GROUP BY l_returnflag"
        ).fetchall()
    )
    if {r[c["l_returnflag"]] for r in rows} != set(exact):
        return _fail(mode, "group keys differ from exact aggregation")
    for r in rows:
        flag = r[c["l_returnflag"]]
        if r[c["exact_parts"]] != exact[flag]:
            return _fail(
                mode,
                f"exact_parts[{flag}]={r[c['exact_parts']]}"
                f" != duck {exact[flag]}",
            )
        err = abs(r[c["approx_parts"]] - exact[flag]) / exact[flag]
        if err > _HLL_REL_TOL:
            return _fail(
                mode,
                f"approx_parts[{flag}]={r[c['approx_parts']]} vs exact"
                f" {exact[flag]}: rel err {err:.4f} > {_HLL_REL_TOL}",
            )
    return _ok(mode)


def check_sketch_hll_rollup_merge(spark, sf_dir, qdef, rows, colnames, con):
    mode = f"merged HLL within {_HLL_REL_TOL:.0%} of exact COUNT(DISTINCT)"
    c = _cols(colnames)
    exact = {
        k: (u, d)
        for k, u, d in con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id),"
            " COUNT(DISTINCT date_trunc('day', ts))"
            " FROM events GROUP BY event_type"
        ).fetchall()
    }
    if {r[c["event_type"]] for r in rows} != set(exact):
        return _fail(mode, "group keys differ from exact aggregation")
    for r in rows:
        et = r[c["event_type"]]
        users, days = exact[et]
        if r[c["n_days"]] != days:
            return _fail(
                mode, f"n_days[{et}]={r[c['n_days']]} != duck {days}"
            )
        err = abs(r[c["approx_users"]] - users) / users
        if err > _HLL_REL_TOL:
            return _fail(
                mode,
                f"approx_users[{et}]={r[c['approx_users']]} vs exact"
                f" {users}: rel err {err:.4f} > {_HLL_REL_TOL}",
            )
    return _ok(mode)


def check_approx_percentile_prices(spark, sf_dir, qdef, rows, colnames, con):
    mode = f"quantile rank within n/{_PCTL_ACCURACY} of target (order stats)"
    c = _cols(colnames)
    exact_n = dict(
        con.execute(
            "SELECT o_orderpriority, COUNT(*) FROM orders"
            " GROUP BY o_orderpriority"
        ).fetchall()
    )
    for r in rows:
        grp = r[c["o_orderpriority"]]
        n = exact_n.get(grp)
        if n is None or r[c["n"]] != n:
            return _fail(mode, f"group count n[{grp}]={r[c['n']]} != {n}")
        for col, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            v = r[c[col]]
            cnt_lt, cnt_le = con.execute(
                "SELECT COUNT(*) FILTER (o_totalprice < ?),"
                " COUNT(*) FILTER (o_totalprice <= ?)"
                " FROM orders WHERE o_orderpriority = ?",
                [v, v, grp],
            ).fetchone()
            if cnt_le == cnt_lt:
                return _fail(
                    mode, f"{col}[{grp}]={v} is not a data value in its group"
                )
            # value occupies 1-based ranks (cnt_lt+1 .. cnt_le); require
            # overlap with [q*n - tol, q*n + tol].
            tol = max(2.0, n / _PCTL_ACCURACY)
            if cnt_lt + 1 > q * n + tol or cnt_le < q * n - tol:
                return _fail(
                    mode,
                    f"{col}[{grp}]={v} rank range [{cnt_lt + 1},{cnt_le}]"
                    f" misses target {q * n:.1f} ± {tol:.1f}",
                )
    return _ok(mode)


CHECKS = {
    "approx_distinct_parts": check_approx_distinct_parts,
    "sketch_hll_rollup_merge": check_sketch_hll_rollup_merge,
    "approx_percentile_prices": check_approx_percentile_prices,
}


def check_compression_ratio_quality(spark, sf_dir, qdef, rows, colnames, con):
    mode = "exact zlib replay from DuckDB text + determinism"
    import zlib

    c = _cols(colnames)
    texts = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    if {r[c["doc_id"]] for r in rows} != set(texts):
        return _fail(mode, "doc_id set differs from source table")
    for r in rows:
        t = texts[r[c["doc_id"]]].encode("utf-8")
        if r[c["raw_bytes"]] != len(t):
            return _fail(mode, f"raw_bytes mismatch doc {r[c['doc_id']]}")
        exp = len(zlib.compress(t, 6))
        if r[c["comp_bytes"]] != exp:
            return _fail(
                mode,
                f"comp_bytes[{r[c['doc_id']]}]={r[c['comp_bytes']]} != {exp}",
            )
        if r[c["ratio"]] != r[c["comp_bytes"]] / r[c["raw_bytes"]]:
            return _fail(mode, f"ratio not the exact IEEE division")
        if r[c["flag_repetitive"]] != int(
            r[c["comp_bytes"]] * 4 < r[c["raw_bytes"]]
        ):
            return _fail(mode, f"flag mismatch doc {r[c['doc_id']]}")
    err = _deterministic(spark, sf_dir, qdef, rows)
    return _fail(mode, err) if err else _ok(mode)

CHECKS["compression_ratio_quality"] = check_compression_ratio_quality


def check_multimodal_png_extract(spark, sf_dir, qdef, rows, colnames, con):
    mode = "exact PNG pack/parse replay from DuckDB text + determinism"
    import hashlib
    import zlib

    from kbrowse_spark.operators.multimodal import _IMG_W

    c = _cols(colnames)
    texts = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    if {r[c["doc_id"]] for r in rows} != set(texts):
        return _fail(mode, "doc_id set differs from source table")
    for r in rows:
        data = texts[r[c["doc_id"]]].encode("utf-8")
        n_rows = max((len(data) + _IMG_W - 1) // _IMG_W, 1)
        padded = data + b"\x00" * (n_rows * _IMG_W - len(data))
        scan = b"".join(
            b"\x00" + padded[i * _IMG_W : (i + 1) * _IMG_W]
            for i in range(n_rows)
        )
        idat = len(zlib.compress(scan, 6))
        exp = {
            "n_bytes": 8 + (12 + 13) + (12 + idat) + 12,
            "width": _IMG_W,
            "height": n_rows,
            "bit_depth": 8,
            "color_type": 0,
            "n_chunks": 3,
            "idat_bytes": idat,
            "pixel_md5": hashlib.md5(padded).hexdigest(),
        }
        for k, v in exp.items():
            if r[c[k]] != v:
                return _fail(
                    mode, f"{k}[{r[c['doc_id']]}]={r[c[k]]} != {v}"
                )
    err = _deterministic(spark, sf_dir, qdef, rows)
    return _fail(mode, err) if err else _ok(mode)


CHECKS["multimodal_png_extract"] = check_multimodal_png_extract

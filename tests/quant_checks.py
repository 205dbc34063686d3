"""Quantitative checks for catalog queries that have no SQL oracle.

Two queries are quantitative-by-design — the deflate-dependent codecs
whose byte streams depend on the zlib build
(``compression_ratio_quality``, ``multimodal_png_extract``): DuckDB
cannot zlib, so these are the permanent, justified remainder.  (Earlier
rounds also listed libm transcendentals, JSON rendering, and the three
approx sketches here; all were upgraded to exact oracles —
integer-scaled formatting, parsed round-trip comparison, and r13's
md5-derived-register / integer-log-linear-bucket reformulations in
``functions/sketches.py``.  The sketch accuracy assertions that lived
here moved to ``tests/test_sketch_exact.py`` as invariant tests.)

The deflate check is strong short of exact hashing: decompress/re-parse
the produced bytes and compare the recovered CONTENT exactly against
DuckDB-side source text (compressed byte streams differ across zlib
builds; payloads must not), plus determinism (two independent builds
collect identically).

Registered per query name in ``CHECKS``; ``tests/oracle_check.compare``
consults this for every ``oracle=None`` query, so a passing run means
every catalog entry has a value-level verification, not just
"produced rows".
"""

from __future__ import annotations

import json


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


CHECKS = {}


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

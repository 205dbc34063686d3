"""Accuracy invariants for the r13 fixed-point-log2 statistics family
(vocab_entropy_fixedpoint / kl_divergence_lang_mix /
zipf_slope_fixedpoint): each is hash-exact vs DuckDB by construction;
these tests pin that the Q20 mantissa-table log2 also reproduces the
FLOAT-math value of each metric (table error ~0.05% relative), so the
integer reformulation is an approximation of the true statistic, not a
private redefinition."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from kbrowse_spark.catalog import all_queries
from kbrowse_spark.functions.sketches import LOG2_TABLE, LOG2_SCALE_BITS


def _lang_word_counts(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT lang, lower(unnest(string_split(text, ' '))) AS w"
        f" FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    by_lang: dict[str, Counter] = {}
    for lang, w in rows:
        if w:
            by_lang.setdefault(lang, Counter())[w] += 1
    return by_lang


def test_log2_fp_table_matches_math():
    def log2_fp(x: int) -> int:
        e = x.bit_length() - 1
        return e * (1 << LOG2_SCALE_BITS) + LOG2_TABLE[(x * 256 >> e) - 256]

    for x in (1, 2, 3, 7, 255, 256, 1000, 10**6, 2**40):
        fp = log2_fp(x) / (1 << LOG2_SCALE_BITS)
        assert abs(fp - math.log2(x)) <= 0.002, x


def test_entropy_matches_float_math(spark, sf_dir):
    rows = {
        r["lang"]: r
        for r in all_queries()["vocab_entropy_fixedpoint"]
        .builder(spark, sf_dir)
        .collect()
    }
    by_lang = _lang_word_counts(sf_dir)
    assert set(rows) == set(by_lang)
    for lang, cnt in by_lang.items():
        n = sum(cnt.values())
        h = -sum(c / n * math.log2(c / n) for c in cnt.values())
        got = rows[lang]["entropy_microbits"] / 1e6
        assert abs(got - h) <= max(0.002 * h, 0.005), (lang, got, h)
        assert rows[lang]["n_tokens"] == n
        assert rows[lang]["vocab"] == len(cnt)


def test_kl_matches_float_math(spark, sf_dir):
    rows = {
        r["lang"]: r["kl_microbits"] / 1e6
        for r in all_queries()["kl_divergence_lang_mix"]
        .builder(spark, sf_dir)
        .collect()
    }
    by_lang = _lang_word_counts(sf_dir)
    corpus: Counter = Counter()
    for cnt in by_lang.values():
        corpus.update(cnt)
    m = sum(corpus.values())
    for lang, cnt in by_lang.items():
        n = sum(cnt.values())
        kl = sum(
            (c / n) * math.log2((c / n) / (corpus[w] / m))
            for w, c in cnt.items()
        )
        assert abs(rows[lang] - kl) <= max(0.01 * kl, 0.01), (
            lang,
            rows[lang],
            kl,
        )
        assert rows[lang] >= 0


def test_zipf_slope_matches_float_least_squares(spark, sf_dir):
    rows = {
        r["lang"]: r["zipf_slope_neg_milli"] / 1000
        for r in all_queries()["zipf_slope_fixedpoint"]
        .builder(spark, sf_dir)
        .collect()
    }
    by_lang = _lang_word_counts(sf_dir)
    for lang, cnt in by_lang.items():
        freqs = sorted(cnt.values(), reverse=True)
        if len(freqs) < 2:
            continue
        xs = [math.log2(r) for r in range(1, len(freqs) + 1)]
        ys = [math.log2(c) for c in freqs]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        got = -rows[lang]  # reported negated
        assert abs(got - slope) <= max(0.01 * abs(slope), 0.01), (
            lang,
            got,
            slope,
        )

"""Corpus-stats regressions: exact-integer surprisal identity, the
1-char-word guard in BPE pair counting (Spark sequence() counts DOWN
when start > stop), and the join-free random-projection plan."""

from __future__ import annotations

import hashlib
import math
import os

import pytest

from kbrowse_spark.operators.corpus_stats import (
    _RP_IN,
    _RP_OUT,
    _RP_SIGNS,
    bpe_pair_merge_stats,
    embedding_random_projection,
    quality_lm_surprisal,
    tfidf_top_terms,
)


def test_bitlength_surprisal_identity():
    # floor(log2(a/b)) == bitlength(a // b) - 1 for a >= b >= 1 — the
    # exact-integer identity quality_lm_surprisal relies on.
    for a in range(1, 200):
        for b in range(1, a + 1):
            assert (a // b).bit_length() - 1 == math.floor(math.log2(a / b))


def test_rp_signs_match_duckdb_md5():
    # hashlib and DuckDB implement the same md5; the folded literal
    # matrix must equal what the oracle derives row-wise.
    import duckdb

    for j in range(_RP_OUT):
        for i in (0, 1, 17, _RP_IN - 1):
            h = hashlib.md5(f"rp-{i}-{j}".encode()).hexdigest()
            expected = 1 if int(h[:4], 16) % 2 == 0 else -1
            assert _RP_SIGNS[j][i] == expected
            (duck,) = duckdb.sql(
                "SELECT CASE WHEN ('0x' || substr(md5('rp-" + str(i) + "-"
                + str(j) + "'), 1, 4))::INT % 2 = 0 THEN 1 ELSE -1 END"
            ).fetchone()
            assert duck == expected


def test_random_projection_plan_is_join_free(spark, sf_dir):
    df = embedding_random_projection(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # one scan, one generate (posexplode of the 8 folded aggregates)
    assert plan.count("FileScan") == 1


@pytest.fixture()
def tiny_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("tinydocs")
    rows = [
        (0, "a bb a bb ccc ccc", "en", "s0", 17),
        (1, "x x a bb a", "en", "s0", 10),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_bpe_guards_single_char_words(spark, tiny_docs_dir):
    rows = {r["pair"]: r for r in bpe_pair_merge_stats(spark, tiny_docs_dir).collect()}
    # 1-char words ('a', 'x') contribute no pairs; 'bb' -> one 'bb' pair
    # per occurrence (3); 'ccc' -> 'cc' twice per occurrence (4).
    assert set(rows) == {"bb", "cc"}
    assert rows["bb"]["n_occ"] == 3 and rows["bb"]["n_words"] == 1
    assert rows["cc"]["n_occ"] == 4 and rows["cc"]["n_words"] == 1


def test_lm_surprisal_hand_computed(spark, tiny_docs_dir):
    # Bigrams doc0: (a,bb)x2 (bb,a) (bb,ccc) (ccc,ccc); doc1: (x,x)
    # (x,a) (a,bb) (bb,a).  c1: a=3 bb=3 ccc=1 x=2.  bits: (a,bb) 3//3
    # ->0, (bb,a) 3//2->0, (bb,ccc) 3//1->1, (ccc,ccc) 1//1->0,
    # (x,x) 2//1->1, (x,a) 2//1->1.
    rows = {r["doc_id"]: r for r in quality_lm_surprisal(spark, tiny_docs_dir).collect()}
    assert rows[0]["n_bigrams"] == 5 and rows[0]["total_bits"] == 1
    assert rows[0]["avg_bits"] == 0.2
    assert rows[1]["n_bigrams"] == 4 and rows[1]["total_bits"] == 2
    assert rows[1]["avg_bits"] == 0.5


def test_tfidf_rare_term_outranks_common(spark, tiny_docs_dir):
    rows = tfidf_top_terms(spark, tiny_docs_dir).collect()
    top0 = [r["word"] for r in rows if r["doc_id"] == 0][0]
    top1 = [r["word"] for r in rows if r["doc_id"] == 1][0]
    # 'ccc' is unique to doc0 (df=1); 'x' unique to doc1.
    assert top0 == "ccc"
    assert top1 == "x"


def test_ngram_novelty_edge_semantics(spark, tmp_path_factory):
    # doc0 introduces every shingle (novelty 1.0); doc1 shares exactly
    # one 3-gram with doc0 (3/4 novel); doc2 is a verbatim copy of doc0
    # (novelty 0.0) — the three regimes a curation gate keys on.
    import os

    from kbrowse_spark.operators.corpus_stats import ngram_novelty_rate

    d = tmp_path_factory.mktemp("noveltydocs")
    rows = [
        (0, "p q r s t u", "en", "s0", 11),
        (1, "p q r z1 z2 z3", "en", "s0", 14),
        (2, "p q r s t u", "en", "s1", 11),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(str(d), "documents.parquet"))
    out = {r["doc_id"]: r for r in ngram_novelty_rate(spark, str(d)).collect()}
    assert out[0]["n_shingles"] == 4 and out[0]["novelty"] == 1.0
    assert out[1]["n_shingles"] == 4 and out[1]["n_novel"] == 3
    assert out[2]["novelty"] == 0.0


def test_novelty_materialized_index_within_2x_of_warm(spark, sf_dir, tmp_path):
    """The ~10x cold-vs-warm gap of the shingle family is the one-time
    index build: reading a MATERIALIZED shingle index must run the
    novelty query close to warm-cache speed (the 100 TB deployment
    shape the ngram_novelty_rate docstring claims), with identical
    results."""
    import time

    from kbrowse_spark.functions.cache_registry import invalidate
    from kbrowse_spark.operators.corpus_stats import (
        materialize_shingle_index,
        ngram_novelty_from_index,
        ngram_novelty_rate,
    )

    idx = str(tmp_path / "shingle_index")
    materialize_shingle_index(spark, sf_dir, idx)  # one-time build
    expected = ngram_novelty_rate(spark, sf_dir).collect()

    def best_of(fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    warm = best_of(lambda: ngram_novelty_rate(spark, sf_dir).collect())
    invalidate(sf_dir)  # drop the session cache: index path starts cold
    from_index = best_of(lambda: ngram_novelty_from_index(spark, idx).collect())

    got = ngram_novelty_from_index(spark, idx).collect()
    assert got == expected
    # plan-shape proof (deterministic): the index path reads parquet,
    # never re-shingles the text — no explode/array_distinct transform
    plan = (
        ngram_novelty_from_index(spark, idx)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "array_distinct" not in plan and "Generate" not in plan, plan
    # generous wall-clock bound for shared-box jitter; the uncached
    # text-reshingle path is ~10x warm, so this still separates the
    # two regimes even with a slow-disk tail
    assert from_index <= max(2.5 * warm, warm + 3.0), (from_index, warm)


def test_cms_estimate_dominates_exact(spark, sf_dir):
    """CMS property: every probe estimate >= its exact count (never
    undercounts); an absent probe ('zebra') shows exact 0 with pure
    collision noise as its estimate."""
    from kbrowse_spark.catalog import all_queries

    rows = {r["term"]: r for r in all_queries()["cms_heavy_hitters"]
            .builder(spark, sf_dir).collect()}
    assert "zebra" in rows and rows["zebra"]["exact_count"] == 0
    for term, r in rows.items():
        assert r["cms_estimate"] >= r["exact_count"], term


def test_bpe_train_merges_greedy_ltr(spark, tmp_path):
    # 'aaa' under merge (a,a) must yield ('aa','a') — greedy
    # left-to-right, the property the wrapped-symbol replace encoding
    # guarantees — and rounds must chain (round 2 sees round 1's
    # merged symbols).
    import os

    from kbrowse_spark.operators.corpus_stats import bpe_train_merges

    texts = ["aaa aaa aaa aaa", "ab ab ab", "aaab"]
    rows = [(i, t, "xx", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = bpe_train_merges(spark, str(tmp_path)).collect()
    assert [r["round"] for r in out] == [1, 2, 3]
    # Word frequencies: 'aaa' x4, 'ab' x3, 'aaab' x1.
    # Round-1 pairs: (a,a) = 2*4 ('aaa' has two adjacent pairs) + 2*1
    # ('aaab') = 10; (a,b) = 3 + 1 = 4.  Round 1 merges (a,a).
    r1 = out[0]
    assert (r1["sym_a"], r1["sym_b"], r1["n_occ"]) == ("a", "a", 10)
    # After merging: 'aaa' -> ['aa','a'] (greedy LTR, NOT ['a','aa']),
    # 'aaab' -> ['aa','a','b'], 'ab' -> ['a','b'].
    # Round 2 pairs: ('aa','a') = 4+1 = 5, ('a','b') = 3+1 = 4.
    r2 = out[1]
    assert (r2["sym_a"], r2["sym_b"], r2["n_occ"]) == ("aa", "a", 5)
    # After: 'aaa' -> ['aaa'], 'aaab' -> ['aaa','b'], 'ab' -> ['a','b'].
    # Round 3: ('a','b') = 3, ('aaa','b') = 1.
    r3 = out[2]
    assert (r3["sym_a"], r3["sym_b"], r3["n_occ"]) == ("a", "b", 3)

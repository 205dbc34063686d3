"""Pipeline-op regressions: chunking must not truncate long documents,
and the packing prefix sum must actually shard (round-1 verdict items
#2 and #5)."""

from __future__ import annotations

import os

import pytest

from kbrowse_spark.operators.pipeline_ops import (
    _CHUNK,
    _STRIDE,
    doc_chunking,
    token_budget_packing,
)


@pytest.fixture(scope="module")
def long_doc_dir(spark, tmp_path_factory):
    """A documents table containing one doc far beyond the old 101-chunk
    cap (6000 words -> 125 chunks at stride 48)."""
    d = tmp_path_factory.mktemp("longdoc")
    words = " ".join(f"w{i}" for i in range(6000))
    spark.createDataFrame(
        [(0, words, "en", "synth", len(words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_doc_chunking_no_truncation(spark, long_doc_dir):
    rows = doc_chunking(spark, long_doc_dir).collect()
    n_words = 6000
    # chunk c exists iff c*stride < n and (c == 0 or c*stride+chunk < n+stride)
    expected = [
        c
        for c in range(0, (n_words - 1) // _STRIDE + 1)
        if c * _STRIDE < n_words
        and (c == 0 or c * _STRIDE + _CHUNK < n_words + _STRIDE)
    ]
    assert len(rows) == len(expected) == 125  # old cap silently stopped at 101
    assert [r["chunk_id"] for r in rows] == expected
    last = rows[-1]
    assert last["n_tokens"] == min(n_words - last["chunk_id"] * _STRIDE, _CHUNK)
    # every full chunk carries exactly CHUNK tokens
    assert all(r["n_tokens"] == _CHUNK for r in rows[:-1])


def test_doc_chunking_bounds_sequence(spark, sf_dir):
    # The generated index never exceeds the per-doc chunk count: the
    # explode is bounded by size(words), not a constant.
    plan = doc_chunking(spark, sf_dir)._jdf.queryExecution().analyzed().toString()
    assert "sequence(0, cast(FLOOR" in plan.replace("\n", " ") or "floor" in plan.lower()


def test_token_packing_window_is_sharded(spark, sf_dir):
    df = token_budget_packing(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # The per-document running sum must be partitioned by shard; the
    # only unpartitioned window runs over one row per shard.
    assert "windowspecdefinition(shard" in plan


def test_snapshot_diff_counts_reconcile(spark, sf_dir):
    """The four diff classes must reconcile exactly with the modular
    arithmetic that derives the old snapshot."""
    from kbrowse_spark.operators.pipeline_ops import corpus_snapshot_diff

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    expect = {
        "added": sum(1 for i in ids if i % 11 == 0),
        "removed": sum(1 for i in ids if i % 17 == 0),
        "changed": sum(1 for i in ids if i % 11 != 0 and i % 13 == 0),
        "unchanged": sum(1 for i in ids if i % 11 != 0 and i % 13 != 0),
    }
    got = {
        r["status"]: r["n_docs"]
        for r in corpus_snapshot_diff(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in expect.items() if v > 0}

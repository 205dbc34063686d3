"""Executes docs/TOUR.md stage by stage: the operators compose into a
dedup -> rewrite -> quality -> decontaminate -> mix -> export pipeline through
their public (spark, sf_dir) -> DataFrame signatures, and each stage
only removes rows.  The catalog proves the operators individually;
this proves the composition story."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from kbrowse_spark.operators.dedup import dedup_cluster_assign, dedup_span_removal
from kbrowse_spark.operators.pipeline_ops import (
    curation_domain_cap,
    decontaminate_benchmark,
)
from kbrowse_spark.operators.text_analysis import text_quality_score
from kbrowse_spark.sinks.export import write_sized_parquet
from kbrowse_spark.sources.tables import load

ROWS_PER_FILE = 200


def test_tour_pipeline(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # Stage 1 — near-dup removal: anti-join the non-keeper cluster rows.
    clusters = dedup_cluster_assign(spark, sf_dir)
    losers = clusters.filter("is_keeper = 0").select("doc_id")
    n_losers = losers.count()
    deduped = docs.join(losers, "doc_id", "left_anti")
    n1 = deduped.count()
    assert n1 == n0 - n_losers  # anti-join arithmetic, no key dup loss

    # Stage 1b — substring-span rewrite: content changes, rows don't.
    rewritten = dedup_span_removal(spark, sf_dir).select(
        "doc_id", "clean_text"
    )
    words_before = deduped.select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    deduped = (
        deduped.join(rewritten, "doc_id", "left")
        .withColumn("text", F.coalesce("clean_text", "text"))
        .drop("clean_text")
    )
    assert deduped.count() == n1  # rewrite stage never drops rows
    words_after = deduped.filter(F.col("text") != "").select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    assert words_after <= words_before

    # Stage 2 — quality filter.
    quality = text_quality_score(spark, sf_dir)
    kept = deduped.join(
        quality.filter("quality_bucket = 'keep'").select("doc_id"), "doc_id"
    )
    n2 = kept.count()
    assert n2 <= n1

    # Stage 3 — decontamination.
    contaminated = (
        decontaminate_benchmark(spark, sf_dir)
        .filter("contamination >= 0.2")
        .select("doc_id")
    )
    clean = kept.join(contaminated, "doc_id", "left_anti")
    n3 = clean.count()
    assert n3 <= n2

    # Stage 4 — per-domain cap.
    capped_ids = curation_domain_cap(spark, sf_dir).select("doc_id")
    mixed = clean.join(capped_ids, "doc_id")
    n4 = mixed.count()
    assert n4 <= n3
    assert n0 >= n1 >= n2 >= n3 >= n4 > 0

    # Stage 5 — sized export: contiguous doc_id ranges, capped file size.
    out = str(tmp_path / "export")
    shards = write_sized_parquet(
        mixed,
        out,
        sort_col="doc_id",
        target_rows_per_file=ROWS_PER_FILE,
        approx_total_rows=n4,
    )
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) >= shards
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= ROWS_PER_FILE
    back = spark.read.parquet(out)
    assert back.count() == n4
    # Round-trips the exact stage-4 id set.
    assert back.join(mixed.select("doc_id"), "doc_id", "left_anti").count() == 0
    assert mixed.select("doc_id").join(back, "doc_id", "left_anti").count() == 0

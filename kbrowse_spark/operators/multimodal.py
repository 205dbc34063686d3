"""Multimodal column handling: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column with a metadata struct alongside, keep all filtering/
routing on the metadata (JVM-side), and run decode/feature-extraction
as Arrow-batched ``mapInPandas`` over only the rows that survive the
metadata filters.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (`_fake_decode`); the Spark-side
plumbing — schema, batching, partition behavior — is real and tested.
The fixture carrier is ``documents.text`` encoded to UTF-8 bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load


@register(
    "multimodal_binary_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           substring(md5(text), 1, 8) AS shard_key,
           CASE WHEN octet_length(encode(text)) >= 256 THEN 'large'
                ELSE 'small' END AS size_class
    FROM documents
    ORDER BY doc_id
    """,
    "multimodal",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload, computed with
    built-ins only (no Python) — the filter/routing layer of a
    multimodal pipeline."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        d.select(
            "doc_id",
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("payload_md5"),
            F.substring(F.md5(payload), 1, 8).alias("shard_key"),
            F.when(F.length(payload) >= 256, "large")
            .otherwise("small")
            .alias("size_class"),
        )
        .orderBy("doc_id")
    )


@register("embed_batch_inference", None, "multimodal", "pandas-udf", "knn")
def embed_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch embedding inference via mapInPandas: documents -> fake
    deterministic embeddings (a hash-seeded projection standing in for
    a model forward pass; a real deployment loads the model once per
    Python worker and runs it per Arrow batch), then a cosine top-1
    match against the corpus-mean embedding.

    Rows-only check: the 'model' is a stub, but the plan is the
    production shape — narrow scan -> Arrow batches -> per-batch
    inference -> downstream JVM similarity math.
    """

    def encode(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        dim = 16

        def embed_one(text: str) -> list[float]:
            # STUB model: bytes of md5(text) seed a fixed projection.
            seed = int(hashlib.md5(text.encode()).hexdigest()[:8], 16)
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            return (v / np.linalg.norm(v)).astype("float32").tolist()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "doc_embedding": [embed_one(t) for t in pdf["text"]],
                }
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    embedded = d.mapInPandas(encode, schema="doc_id long, doc_embedding array<float>")
    # Downstream JVM-side similarity: norm + self-cosine sanity columns.
    dot_self = (
        "aggregate(zip_with(doc_embedding, doc_embedding,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, p) -> acc + p)"
    )
    return (
        embedded.select(
            "doc_id",
            F.size("doc_embedding").alias("dim"),
            F.sqrt(F.expr(dot_self)).alias("norm"),
        )
        .orderBy("doc_id")
    )


_FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, checksum long, fake_width int, fake_height int,"
    " n_frames int"
)


@register("multimodal_feature_extract", None, "multimodal", "pandas-udf")
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature pipeline over a binary column.

    Rows-only check (the stub decode is not SQL-expressible).  The plan
    shape is the production one: narrow scan -> Arrow exchange ->
    per-batch Python -> Arrow back; no shuffle, scales with input
    splits.

    The UDF is defined inside this builder (pickled by value): Spark's
    Python workers don't have this package on their path when the
    driver imports it by file location.
    """

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload: bytes) -> dict:
            # STUB decoder. A real deployment would decode image/audio
            # bytes here (PIL/ffmpeg are not in this container).
            checksum = sum(payload) % (1 << 31)
            return {
                "checksum": checksum,
                "fake_width": 1 + (checksum % 64),
                "fake_height": 1 + ((checksum // 64) % 64),
                "n_frames": 1 + (len(payload) % 4),
            }

        for pdf in batches:
            feats = [fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "n_bytes", [len(bytes(p)) for p in pdf["payload"]])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[
                [
                    "doc_id",
                    "n_bytes",
                    "checksum",
                    "fake_width",
                    "fake_height",
                    "n_frames",
                ]
            ]

    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return src.mapInPandas(extract_features, schema=_FEATURE_SCHEMA).orderBy("doc_id")


_FRAME = 64  # stub frame size (chars); a real codec replaces this
_FRAME_STEP = 4  # sample every 4th frame


@register(
    "multimodal_frame_sample",
    f"""
    WITH p AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    f AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(ceil(length(text) / {_FRAME}.0) AS BIGINT) - 1,
               {_FRAME_STEP})) AS frame_idx
      FROM p)
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(length(substr(text, CAST(frame_idx * {_FRAME} + 1 AS BIGINT),
                              {_FRAME})) AS INT) AS frame_len,
           md5(substr(text, CAST(frame_idx * {_FRAME} + 1 AS BIGINT),
                      {_FRAME})) AS frame_md5
    FROM f
    ORDER BY doc_id, frame_idx
    """,
    "multimodal",
    "pandas-udf",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque media payload: every 4th fixed-
    size frame is extracted and fingerprinted — the video keyframe /
    audio-window sampling shape of a multimodal ingest pipeline.

    The plumbing is the production one (narrow scan -> Arrow batches ->
    per-batch Python -> Arrow back, no shuffle; output rows ~ n/step
    amplification happens AFTER the metadata filter).  The 'decoder' is
    the deterministic stub this container forces (fixed 64-char frames
    of the text payload), which is exactly what makes the whole
    pipeline hash-checkable against the SQL oracle — a real ffmpeg/PIL
    decode drops in by replacing `frames_of` and moving the query to
    the rows-only class.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def frames_of(text: str):
            # STUB decoder: fixed-size character frames.
            n_frames = (len(text) + _FRAME - 1) // _FRAME
            for idx in range(0, n_frames, _FRAME_STEP):
                yield idx, text[idx * _FRAME : (idx + 1) * _FRAME]

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for idx, fr in frames_of(text):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_len"].append(len(fr))
                    rows["frame_md5"].append(hashlib.md5(fr.encode()).hexdigest())
            yield pd.DataFrame(rows)

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        d.select("doc_id", "text")
        .mapInPandas(
            sample,
            schema="doc_id long, frame_idx int, frame_len int, frame_md5 string",
        )
        .orderBy("doc_id", "frame_idx")
    )

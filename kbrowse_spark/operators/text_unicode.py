"""Text operators that genuinely require Python: Unicode algorithms
(normalization) with no JVM-built-in equivalent.

This is the documented Arrow slow path (SURVEY §2c UDF surface): a
vectorized ``pandas_udf`` batch-transfers strings once per Arrow batch
— never per row — and everything around it (projection, comparison,
hashing, ordering) stays JVM-side.  The reference passes text through
verbatim (`/root/reference/src/kbrowse/search.clj:83-120`); Unicode
normalization is §2c LLM-extension surface: the first rewrite any real
web-corpus ingest applies, because visually-identical strings with
different code-point sequences (NFC vs NFD) break exact dedup,
shingling, and tokenizer merges.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load


@register(
    "text_normalize_nfc",
    """
    WITH n AS (
      SELECT doc_id, text, nfc_normalize(text) AS norm FROM documents)
    SELECT doc_id,
           CAST(CASE WHEN norm <> text THEN 1 ELSE 0 END AS INT) AS changed,
           CAST(length(text) AS BIGINT) AS n_cp_before,
           CAST(length(norm) AS BIGINT) AS n_cp_after,
           md5(norm) AS norm_md5
    FROM n ORDER BY doc_id
    """,
    "text",
    "pandas-udf",
)
def text_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization audit/rewrite: per document, whether
    canonical composition changes the text, the code-point counts
    before/after, and the md5 of the normalized form (the dedup key a
    pipeline would switch to).  Spark computes NFC in a vectorized
    pandas_udf (``unicodedata``); the DuckDB oracle uses its native
    ``nfc_normalize`` — two independent Unicode implementations that
    must agree byte-for-byte on the normalized md5.

    Scale shape: embarrassingly parallel per document — narrow scan,
    one Arrow round trip, no shuffle (the display order is the only
    exchange).  Counts/comparison/md5 all run JVM-side on the UDF
    output.  Golden-pair unit tests (composed vs decomposed accents,
    Hangul jamo, compatibility-untouched forms) pin the semantics on
    corpora the fixture lacks.
    """
    # Defined inside the builder: a module-level @pandas_udf parses its
    # return type at import, which requires an active session (breaking
    # session-less catalog introspection), and a nested def keeps the
    # worker payload self-contained (no module import on bare workers).
    def _nfc(texts: pd.Series) -> pd.Series:
        import unicodedata

        return texts.map(lambda t: unicodedata.normalize("NFC", t))

    nfc = F.pandas_udf(_nfc, "string")
    d = load(spark, sf_dir, "documents")
    n = d.select("doc_id", "text", nfc("text").alias("norm"))
    return n.select(
        "doc_id",
        (F.col("norm") != F.col("text")).cast("int").alias("changed"),
        F.length("text").cast("long").alias("n_cp_before"),
        F.length("norm").cast("long").alias("n_cp_after"),
        F.md5(F.encode("norm", "UTF-8")).alias("norm_md5"),
    ).orderBy("doc_id")


@register(
    "compression_ratio_quality",
    None,  # no SQL engine can replay zlib; exact Python-replay quant check
    "text",
    "pipeline",
    "pandas-udf",
)
def compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deflate-compression-ratio quality signal: per document, the
    UTF-8 byte length, its zlib(level=6) compressed length, their IEEE
    ratio, and a low-entropy flag — the classic repetition/boilerplate
    detector of LLM data pipelines (highly repetitive or templated
    text compresses far below prose; near-random noise barely
    compresses at all).  Both tails are removal candidates.

    The compressor is the ONE Python-only stage (stdlib ``zlib``,
    vectorized over Arrow batches); byte length, ratio, and flag
    arithmetic stay JVM-side.  No SQL oracle can replay deflate, so
    the registered quantitative check recompresses every document
    independently from the DuckDB-read text and requires exact
    ``comp_bytes`` equality plus build-twice determinism.

    Scale shape: embarrassingly parallel per document — narrow scan,
    one Arrow round trip, no shuffle.  The flag thresholds are exact
    integer cross-multiplications (no float compare).
    """

    def _comp_len(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        ).astype("int64")

    comp = F.pandas_udf(_comp_len, "long")
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.octet_length("text").cast("long").alias("raw_bytes"),
            comp(F.col("text")).alias("comp_bytes"),
        )
        .select(
            "doc_id",
            "raw_bytes",
            "comp_bytes",
            (F.col("comp_bytes").cast("double") / F.col("raw_bytes")).alias(
                "ratio"
            ),
            # repetitive tail: compresses below 25% of raw
            (F.col("comp_bytes") * 4 < F.col("raw_bytes"))
            .cast("int")
            .alias("flag_repetitive"),
        )
        .orderBy("doc_id")
    )

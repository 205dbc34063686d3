"""Deduplication operators for LLM training-data pipelines.

Four families, each expressed as pure DataFrame ops with an exact DuckDB
oracle (the hash primitive is md5, identical in both engines):

* exact dedup           — hash groupBy, keep-first
* MinHash + LSH         — shingle → k minhashes → banded buckets →
                          candidate pairs → exact-Jaccard verify
* SimHash               — per-word hash bit-vote fingerprint + banded
                          near-dup candidates with Hamming verify
* n-gram Jaccard        — blocked pairwise set similarity

Scale design (100 TB): every stage is a shuffle on a bounded key
(doc_id, (seed), (band, bucket)) with map-side combine available; no
all-pairs joins — LSH/banding bounds candidate generation, which is the
whole point of these algorithms.  Verification joins only touch
candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load

# MinHash parameters: k = NUM_HASHES hash functions in NUM_BANDS bands
# of ROWS_PER_BAND.  Threshold ~ (1/b)^(1/r) = (1/4)^(1/3) ~= 0.63.
NUM_HASHES = 12
NUM_BANDS = 4
ROWS_PER_BAND = 3
JACCARD_THRESHOLD = 0.8


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — distinct word 3-grams per document."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),"
                " i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1],"
                " split(text, ' ')[i+2])))"
            )
        ).alias("shingle"),
    )


# DuckDB mirror of the shingle expansion (1-based list indexing there).
_SQL_SHINGLES = """
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, len(string_split(text, ' ')) - 2),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i+1] || ' ' ||
                  string_split(text, ' ')[i+2])) AS shingle
    FROM documents)
"""


@register(
    "dedup_exact",
    """
    SELECT lang, source, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS group_size,
           COUNT(DISTINCT md5(text)) AS distinct_texts
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    "dedup",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by key: hash groupBy keeping the first (min) doc_id.
    Content-hash dedup is the same plan with md5(text) as the key —
    shown here as the distinct_texts count per group."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(F.md5("text")).alias("distinct_texts"),
        )
        .orderBy("lang", "source")
    )


@register(
    "dedup_minhash_lsh",
    f"""
    WITH sh AS ({_SQL_SHINGLES}),
    minh AS (
      SELECT doc_id, seed, MIN(md5(seed || '|' || shingle)) AS minhash
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {NUM_HASHES - 1})) AS seed)
      GROUP BY doc_id, seed),
    buckets AS (
      SELECT doc_id, seed // {ROWS_PER_BAND} AS band,
             md5(string_agg(minhash, '' ORDER BY seed)) AS bucket
      FROM minh GROUP BY doc_id, seed // {ROWS_PER_BAND}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c JOIN sh x ON x.doc_id = c.doc_a
                  JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      GROUP BY c.doc_a, c.doc_b)
    SELECT v.doc_a, v.doc_b,
           CAST(v.n_common AS DOUBLE) / (sa.n + sb.n - v.n_common) AS jaccard
    FROM verified v JOIN sizes sa ON sa.doc_id = v.doc_a
                    JOIN sizes sb ON sb.doc_id = v.doc_b
    WHERE CAST(v.n_common AS DOUBLE) / (sa.n + sb.n - v.n_common)
          >= {JACCARD_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
    "dedup",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-duplicate detection.

    shingle (word 3-gram) → k={NUM_HASHES} minhashes (min of seeded md5)
    → {NUM_BANDS} bands × {ROWS_PER_BAND} rows → band-bucket join emits
    candidates → exact Jaccard verification on candidates only.

    No all-pairs join anywhere: the only O(pairs) work is on LSH
    candidates, so the plan survives arbitrary corpus size (candidate
    volume is governed by the banding threshold, not n^2).
    """
    sh = _shingles_df(spark, sf_dir)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(NUM_HASHES - 1))).alias("seed")
    minh = (
        sh.select("doc_id", "shingle", seeds)
        .groupBy("doc_id", "seed")
        .agg(
            F.min(
                F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("shingle")))
            ).alias("minhash")
        )
    )
    buckets = (
        minh.withColumn("band", (F.col("seed") / ROWS_PER_BAND).cast("long"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                        lambda x: x["minhash"],
                    ),
                )
            ).alias("bucket")
        )
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x, y = sh.alias("x"), sh.alias("y")
    verified = (
        cand.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_b"))
            & (F.col("y.shingle") == F.col("x.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jaccard = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        verified.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS ({_SQL_SHINGLES}),
    d AS (SELECT doc_id, lang FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh x JOIN d dx ON dx.doc_id = x.doc_id
                JOIN sh y ON y.shingle = x.shingle AND x.doc_id < y.doc_id
                JOIN d dy ON dy.doc_id = y.doc_id AND dy.lang = dx.lang
      GROUP BY x.doc_id, y.doc_id)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
    FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
                 JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    "dedup",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity via inverted-index join (blocked by
    lang).  Pairs sharing >=1 shingle are generated by the shingle
    self-join — an inverted index, not an all-pairs product — then
    scored exactly.  Hot shingles are the skew risk at scale; AQE skew
    handling plus the lang block bound the fan-out."""
    sh = _shingles_df(spark, sf_dir)
    langs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    sh_l = sh.join(langs, "doc_id").select("doc_id", "lang", "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x, y = sh_l.alias("x"), sh_l.alias("y")
    inter = (
        x.join(
            y,
            (F.col("y.shingle") == F.col("x.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (F.col("y.lang") == F.col("x.lang")),
        )
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jaccard = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


# SimHash: 63-bit fingerprint from per-word md5 bits; near-dup candidates
# via 4x16-bit bands, verified by Hamming distance.  63 bits (not 64) so
# the signed-bigint shift arithmetic is identical in both engines.
_HAMMING_MAX = 1


@register(
    "dedup_simhash",
    f"""
    WITH w AS (
      SELECT DISTINCT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)),
    bits AS (
      SELECT doc_id, (pos - 1) * 4 + b AS j,
             CASE WHEN ((strpos('0123456789abcdef',
                                substring(md5(word), pos, 1)) - 1) >> (3 - b))
                       & 1 = 1 THEN 1 ELSE -1 END AS wgt
      FROM w
      CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS pos)
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
      WHERE (pos - 1) * 4 + b <= 62),
    votes AS (SELECT doc_id, j, SUM(wgt) AS v FROM bits GROUP BY doc_id, j),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0
                  THEN (CAST(1 AS BIGINT) << (62 - j)) ELSE 0 END) AS BIGINT)
               AS simhash
      FROM votes GROUP BY doc_id),
    bands AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 16)) & 65535 AS band_val
      FROM fp CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= {_HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """,
    "dedup",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 63-bit bit-vote fingerprint per doc from word
    md5s, banded into 4x16-bit chunks for candidate generation, then
    Hamming-verified.

    The band join is the LSH trick again: two fingerprints within
    Hamming distance d<4 share at least one untouched band — candidates
    are generated by equality on a band value, never by an all-pairs
    comparison, which is what makes this viable beyond ~10^5 docs.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("word")
    )
    bits = (
        words.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(16))).alias("pos"),
            F.md5("word").alias("h"),
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("b"),
            "pos",
            "h",
        )
        .filter(((F.col("pos") - 1) * 4 + F.col("b")) <= 62)
        .select(
            "doc_id",
            ((F.col("pos") - 1) * 4 + F.col("b")).alias("j"),
            F.when(
                F.expr(
                    "((instr('0123456789abcdef', substring(h, pos, 1)) - 1)"
                    " >> (3 - b)) & 1"
                )
                == 1,
                1,
            )
            .otherwise(-1)
            .alias("wgt"),
        )
    )
    votes = bits.groupBy("doc_id", "j").agg(F.sum("wgt").alias("v"))
    fp = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), 62 - j)")
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("simhash")
    )
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn("band_val", F.expr("(simhash >> (band * 16)) & 65535"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)")
    return (
        cand.select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= _HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )

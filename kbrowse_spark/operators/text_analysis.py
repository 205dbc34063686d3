"""Text-analysis operators for LLM training-data pipelines: token
counting, quality scoring, language-ID heuristic, fingerprinting.

All pure DataFrame expressions (JVM-side, whole-stage codegen) — no
Python UDFs in any hot path.  Each query has an exact DuckDB oracle.

Scale: every query here is embarrassingly parallel per document (narrow,
no shuffle except the final order for display), so it scales linearly
with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load

# Deterministic marker-word lists for the language-ID heuristic.
_LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "fast", "slow"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "los", "que", "de"),
    "fr": ("le", "la", "les", "et", "que"),
}

_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def _sql_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


@register(
    "text_token_stats",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
           length(text) AS n_chars_seen,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len
    FROM documents
    ORDER BY doc_id
    """,
    "text",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, regex tokens."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            F.size(words).alias("n_tokens"),
            F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), 0)).alias(
                "n_alpha_tokens"
            ),
            F.length("text").alias("n_chars_seen"),
            (
                F.length(F.regexp_replace("text", " ", "")).cast("double")
                / F.size(words)
            ).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_words,
             len(list_filter(string_split(text, ' '),
                             w -> w IN {_sql_list(_STOPWORDS)})) AS n_stop,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents)
    SELECT doc_id, lang, n_words,
           CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
           CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
           CAST(n_stop AS DOUBLE) / n_words * 0.4
             + CAST(n_distinct AS DOUBLE) / n_words * 0.4
             + LEAST(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.2 AS quality_score,
           CASE WHEN CAST(n_stop AS DOUBLE) / n_words * 0.4
                     + CAST(n_distinct AS DOUBLE) / n_words * 0.4
                     + LEAST(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.2 >= 0.45
                THEN 'keep' ELSE 'review' END AS quality_bucket
    FROM t
    ORDER BY doc_id
    """,
    "text",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + lexical diversity + length prior.

    The score mirrors C4/Gopher-style heuristic filters; weights are
    fixed and the arithmetic is pure double ops evaluated in one
    expression order in both engines.
    """
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    t = d.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_words"),
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).alias(
            "n_stop"
        ),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_words")
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_words")
    score = (
        stop_ratio * 0.4
        + distinct_ratio * 0.4
        + F.least(F.col("n_words").cast("double") / 100.0, F.lit(1.0)) * 0.2
    )
    return (
        t.select(
            "doc_id",
            "lang",
            "n_words",
            stop_ratio.alias("stopword_ratio"),
            distinct_ratio.alias("distinct_ratio"),
            score.alias("quality_score"),
            F.when(score >= 0.45, "keep").otherwise("review").alias("quality_bucket"),
        )
        .orderBy("doc_id")
    )


def _langid_score_sql(lang: str) -> str:
    return (
        f"len(list_filter(string_split(text, ' '), "
        f"w -> w IN {_sql_list(_LANG_MARKERS[lang])}))"
    )


@register(
    "text_langid",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
             {_langid_score_sql('en')} AS score_en,
             {_langid_score_sql('de')} AS score_de,
             {_langid_score_sql('es')} AS score_es,
             {_langid_score_sql('fr')} AS score_fr
      FROM documents)
    SELECT doc_id, lang AS labeled_lang, score_en, score_de, score_es, score_fr,
           CASE GREATEST(score_en, score_de, score_es, score_fr)
             WHEN score_en THEN 'en' WHEN score_de THEN 'de'
             WHEN score_es THEN 'es' ELSE 'fr' END AS pred_lang
    FROM s
    ORDER BY doc_id
    """,
    "text",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram-list heuristic). Tie-break order
    en > de > es > fr is encoded identically in both engines."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")

    def score(lang: str):
        markers = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(words, lambda w: F.array_contains(markers, w)))

    s = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score("en").alias("score_en"),
        score("de").alias("score_de"),
        score("es").alias("score_es"),
        score("fr").alias("score_fr"),
    )
    best = F.greatest("score_en", "score_de", "score_es", "score_fr")
    pred = (
        F.when(F.col("score_en") == best, "en")
        .when(F.col("score_de") == best, "de")
        .when(F.col("score_es") == best, "es")
        .otherwise("fr")
    )
    return s.select(
        "doc_id",
        "labeled_lang",
        "score_en",
        "score_de",
        "score_es",
        "score_fr",
        pred.alias("pred_lang"),
    ).orderBy("doc_id")


# GPT-2-style pretokenizer classes, simplified to the RE2/Java-common
# subset (no lookahead): contractions, space-prefixed words/numbers,
# punctuation runs, whitespace runs.
_BPE_PATTERN = "'(?:s|d|m|t|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ']+| +"
# single quotes doubled for embedding in a SQL string literal
_BPE_SQL = _BPE_PATTERN.replace("'", "''")


@register(
    "text_bpe_tokens",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_bpe_tokens,
           len(regexp_extract_all(text, ' ?[0-9]+')) AS n_number_tokens,
           len(regexp_extract_all(text, ' ?[^a-z0-9 '']+')) AS n_punct_tokens,
           len(list_distinct(regexp_extract_all(text, '{_BPE_SQL}')))
             AS n_distinct_bpe
    FROM documents
    ORDER BY doc_id
    """,
    "text",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pretokenizer regex
    (contractions / space-prefixed words / numbers / punctuation runs)
    evaluated JVM-side — the scale path for corpus token accounting."""
    d = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_bpe_tokens"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit(" ?[0-9]+"), 0)).alias(
                "n_number_tokens"
            ),
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(" ?[^a-z0-9 ']+"), 0)
            ).alias("n_punct_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_bpe"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_curation_pipeline",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_words,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w IN {_sql_list(_STOPWORDS)})) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio,
             md5(text) AS content_hash
      FROM documents),
    kept AS (SELECT * FROM scored WHERE n_words >= 40 AND stop_ratio >= 0.01),
    dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash
                                     ORDER BY doc_id) AS rn
        FROM kept) WHERE rn = 1)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_words AS BIGINT)) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM dedup
    GROUP BY lang
    ORDER BY lang
    """,
    "text",
    "dedup",
    "pipeline",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline in one plan: quality filter ->
    content-hash dedup (keep-first) -> per-language token accounting.
    This is the composed shape a training-data pipeline actually runs;
    Catalyst fuses the filter+hash projection into the scan and the
    dedup window + final agg are the only two shuffles."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(words).alias("n_words"),
        (
            F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).cast(
                "double"
            )
            / F.size(words)
        ).alias("stop_ratio"),
        F.md5("text").alias("content_hash"),
    )
    kept = scored.filter((F.col("n_words") >= 40) & (F.col("stop_ratio") >= 0.01))
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("content_hash").orderBy("doc_id")
    )
    dedup = kept.withColumn("rn", rn).filter(F.col("rn") == 1)
    return (
        dedup.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(lower(text)) AS content_hash,
           CASE WHEN length(text) >= 8
                THEN list_min(list_transform(generate_series(1, length(text) - 7),
                                             i -> md5(substring(text, i, 8))))
                ELSE md5(text) END AS rolling_min_hash,
           substring(md5(lower(text)), 1, 8) AS short_hash
    FROM documents
    ORDER BY doc_id
    """,
    "text",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-content hash + winnowing-style
    rolling min-hash over 8-char shingles (one narrow pass).  Texts
    shorter than one shingle hash whole — guarded explicitly because
    Spark's sequence(1, n) with n<1 COUNTS DOWN (step defaults to -1)
    instead of being empty like generate_series.

    The doc-grain repartition spreads the rolling-hash work (r14): the
    single-row-group fixture scan serialized ~2M per-shingle md5 calls
    (one per character of every document) onto ONE task — 4.3 s on one
    core.  Per-row work dwarfs the one exchange of (doc_id, text), the
    same asymmetry that qualified the rag/pmi fan-outs and failed the
    multimodal ones."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    )
    rolling = F.when(
        F.length("text") >= 8,
        F.array_min(
            F.expr(
                "transform(sequence(1, length(text) - 7),"
                " i -> md5(substring(text, i, 8)))"
            )
        ),
    ).otherwise(F.md5(F.col("text")))
    return (
        d.select(
            "doc_id",
            F.md5(F.lower(F.col("text"))).alias("content_hash"),
            rolling.alias("rolling_min_hash"),
            F.substring(F.md5(F.lower(F.col("text"))), 1, 8).alias("short_hash"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_heavy_hitters",
    """
    WITH w AS (
      SELECT lang, lower(unnest(string_split(text, ' '))) AS word
      FROM documents),
    counts AS (
      SELECT lang, word, COUNT(*) AS n
      FROM w
      WHERE length(word) >= 4
      GROUP BY lang, word),
    ranked AS (
      SELECT lang, word, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, word) AS rnk
      FROM counts)
    SELECT lang, CAST(rnk AS INT) AS rnk, word, n
    FROM ranked WHERE rnk <= 10
    ORDER BY lang, rnk
    """,
    "text",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-10 frequent words (>= 4 chars): the vocabulary
    heavy-hitters pass of corpus analysis (stopword discovery, domain
    drift checks).  Exact counts via one map-side-combined aggregate;
    the per-group top-k runs as WindowGroupLimit — only 10 rows per
    language survive the rank exchange, never the full vocabulary.  At
    100 TB the same plan holds: the (lang, word) aggregate is the only
    data-sized shuffle, pre-aggregated on the map side."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    counts = (
        d.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.length("word") >= 4)
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "word")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("lang", F.col("rnk").cast("int"), "word", "n")
        .orderBy("lang", "rnk")
    )


@register(
    "quality_repetition_signals",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS w,
             CASE WHEN len(string_split(text, ' ')) >= 3 THEN
               list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2])
             ELSE [] END AS g
      FROM documents
    )
    SELECT doc_id,
           len(w) AS n_words,
           1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_frac,
           CASE WHEN len(g) > 0
                THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
                ELSE 0.0 END AS dup_3gram_frac,
           CAST(list_max(list_transform(list_distinct(w),
                  d -> len(list_filter(w, x -> x = d)))) AS DOUBLE) / len(w)
             AS top_word_frac,
           (1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) < 0.6
             AND (CASE WHEN len(g) > 0
                       THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
                       ELSE 0.0 END) < 0.4
             AND CAST(list_max(list_transform(list_distinct(w),
                   d -> len(list_filter(w, x -> x = d)))) AS DOUBLE) / len(w) < 0.35
             AS keep
    FROM t
    ORDER BY doc_id
    """,
    "text",
    "pipeline",
)
def quality_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-word
    fraction, duplicate-3-gram fraction, and the most-frequent-word
    mass, plus the resulting keep/drop gate — the repetition family of
    quality filters (Rae et al. 2021 §A1.1) that catches boilerplate,
    keyword stuffing, and degenerate generations before training.

    Scale posture: embarrassingly parallel per document — pure array
    expressions inside one projection, no shuffle except the display
    sort (dropped in a real pipeline where this feeds a filter).
    ``top_word_frac`` is a run-length scan over the SORTED word array
    (r14, guide §4.1): the original distinct×word nested HOF was
    O(d·n) interpreted lambda evaluations per row with a fresh filter
    array allocated per distinct word (~6M element-ops over the sf0.1
    fixture, 8.1 s); equal words are adjacent after ``array_sort``, so
    one O(n) ``aggregate`` pass carrying (prev, run, best) yields the
    identical max word count.  The 3-gram builder likewise reads the
    already-split ``w`` column instead of re-splitting ``text`` three
    times per element.  All three ratios are exact integer divisions,
    so the doubles (and the booleans derived from them) hash
    identically cross-engine.
    """
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    grams = F.when(
        F.size("w") >= 3,
        F.expr(
            "transform(sequence(0, size(w) - 3),"
            " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup_gram = F.when(
        F.size(F.col("g")) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct("g")).cast("double") / F.size("g"),
    ).otherwise(F.lit(0.0))
    # Max run length over the sorted words == max per-word count: exact
    # integer, independent of sort collation (equality groups adjacent).
    top_word = (
        F.expr(
            "aggregate(array_sort(w),"
            " named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),"
            " (acc, x) -> named_struct("
            "   'prev', x,"
            "   'run', IF(acc.prev <=> x, acc.run + 1L, 1L),"
            "   'best', greatest(acc.best,"
            "                    IF(acc.prev <=> x, acc.run + 1L, 1L))),"
            " acc -> acc.best)"
        ).cast("double")
        / F.size("w")
    )
    return (
        d.select("doc_id", w.alias("w"))
        .select("doc_id", "w", grams.alias("g"))
        .select(
            "doc_id",
            F.size("w").alias("n_words"),
            (F.lit(1.0) - F.size(F.array_distinct("w")).cast("double") / F.size("w")).alias(
                "dup_word_frac"
            ),
            dup_gram.alias("dup_3gram_frac"),
            top_word.alias("top_word_frac"),
        )
        .withColumn(
            "keep",
            (F.col("dup_word_frac") < 0.6)
            & (F.col("dup_3gram_frac") < 0.4)
            & (F.col("top_word_frac") < 0.35),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable heavy-hitter counting
# ---------------------------------------------------------------------------

# D independent hash rows x W buckets.  Point estimate for a term is
# MIN over rows of its bucket's count — always >= the true count, with
# overestimate bounded by (e/W)*total_tokens per row (standard CMS
# guarantee).  The hash is md5-derived so both engines agree bit-for-
# bit, making the sketch itself oracle-checkable — unlike HLL, whose
# register layout is engine-specific.
_CMS_ROWS = 4
_CMS_WIDTH = 256
_CMS_PROBES = ("data", "quality", "spark", "stream", "the", "zebra")


@register(
    "cms_heavy_hitters",
    f"""
    WITH words AS (
      SELECT lang, lower(unnest(string_split(text, ' '))) AS word
      FROM documents),
    wfil AS (SELECT lang, word FROM words WHERE word != ''),
    pairs AS (
      SELECT lang, word, j,
             ('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':' || word),
                             1, 8))::BIGINT % {_CMS_WIDTH} AS bucket
      FROM wfil
      CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_ROWS - 1})) AS j)),
    sketch_lang AS (
      SELECT lang, j, bucket, COUNT(*) AS n
      FROM pairs GROUP BY lang, j, bucket),
    sketch AS (
      SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS n
      FROM sketch_lang GROUP BY j, bucket),
    probes AS (SELECT unnest({list(_CMS_PROBES)}) AS term),
    pb AS (
      SELECT term, j,
             ('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':' || term),
                             1, 8))::BIGINT % {_CMS_WIDTH} AS bucket
      FROM probes
      CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_ROWS - 1})) AS j)),
    est AS (
      SELECT term, CAST(MIN(COALESCE(s.n, 0)) AS BIGINT) AS cms_estimate
      FROM pb LEFT JOIN sketch s USING (j, bucket) GROUP BY term),
    exact AS (
      SELECT word AS term, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM wfil WHERE word IN {_CMS_PROBES!r} GROUP BY word)
    SELECT e.term, CAST(COALESCE(x.exact_count, 0) AS BIGINT) AS exact_count,
           e.cms_estimate
    FROM est e LEFT JOIN exact x USING (term)
    ORDER BY term
    """,
    "text",
    "approx",
    "rollup",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, with point
    estimates for a probe-term list next to the exact counts.

    The sketch is built PER LANG and then MERGED by summing (row,
    bucket) cells — the mergeability that makes CMS the streaming /
    shard-parallel answer to "how often does this term occur", same
    role as the HLL rollup for distinct counts.  Because the D=4 hash
    rows are md5-derived, the whole sketch (and so the estimate) is
    bit-identical in both engines: this approx operator gets an EXACT
    value oracle, estimates-vs-exact included (estimate >= exact always
    holds by construction; 'zebra' shows pure collision noise on an
    absent term).

    Scale shape: the token stream fans out x4 (one row per hash row),
    but map-side combine collapses it to <= lang x 4 x 256 rows before
    the shuffle; the merged sketch is 1024 rows and broadcast to the
    probe lookup.  At 100 TB the sketch table is maintained
    incrementally per ingest shard and merged at query time — the same
    plan shape as the per-day HLL rollup.
    """
    d = load(spark, sf_dir, "documents")
    bucket_of = (
        "CAST(conv(substring(md5(concat('cms', CAST(j AS STRING), ':', {t}))"
        ", 1, 8), 16, 10) AS BIGINT) % {w}"
    )

    def word_stream(src: DataFrame) -> DataFrame:
        return src.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
        ).filter(F.col("word") != "")

    # Exact branch: plain scan (a 6-term filter + count, no hashing).
    words = word_stream(d)
    # Sketch branch: ~4 md5s per corpus token (CMS rows x every word) —
    # the single-row-group fixture scan would serialize all of it onto
    # ONE task.  Doc-grain repartition BEFORE the explode spreads the
    # hash work; per-row work dwarfs one exchange of (doc_id, lang,
    # text), the same asymmetry that qualified the text_fingerprint /
    # rag fan-outs (r14) and failed the multimodal ones.
    fan = d.select("doc_id", "lang", "text").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    pairs = word_stream(fan).withColumn(
        "j", F.explode(F.expr(f"sequence(0, {_CMS_ROWS - 1})"))
    ).withColumn(
        "bucket", F.expr(bucket_of.format(t="word", w=_CMS_WIDTH))
    )
    # The merged sketch aggregates (j, bucket) directly (r14): the
    # per-lang intermediate exists in the ORACLE to exhibit sketch
    # mergeability, but summing per-lang counts equals counting
    # directly, and the extra aggregate level cost ~0.3 s (measured) —
    # one hash aggregate, map-side-combined, same 1024-row result.
    sketch = pairs.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("n"))
    probes = (
        spark.createDataFrame([(t,) for t in _CMS_PROBES], "term string")
        .withColumn("j", F.explode(F.expr(f"sequence(0, {_CMS_ROWS - 1})")))
        .withColumn("bucket", F.expr(bucket_of.format(t="term", w=_CMS_WIDTH)))
    )
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_estimate"))
    )
    exact = (
        words.filter(F.col("word").isin(*_CMS_PROBES))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, est.term == exact.word, "left")
        .select(
            "term",
            F.coalesce(F.col("exact_count"), F.lit(0))
            .cast("long")
            .alias("exact_count"),
            "cms_estimate",
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility / compression statistics
# ---------------------------------------------------------------------------


@register(
    "tokenizer_fertility_stats",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT)
             AS total_tokens,
           CAST(SUM(len(text)) AS BIGINT) AS total_chars,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT)
             * 1000 // CAST(SUM(len(text)) AS BIGINT) AS tokens_per_kchar,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) * 1000
             // CAST(SUM(len(regexp_extract_all(text, '{_BPE_SQL}')))
                     AS BIGINT) AS bytes_per_token_milli
    FROM documents GROUP BY lang ORDER BY lang
    """,
    "text",
)
def tokenizer_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: per language, how many tokens the
    BPE-ish pretokenizer yields per 1000 characters and how many UTF-8
    BYTES each token costs — the numbers that size a token budget from
    raw corpus bytes and expose multibyte-script cost (CJK text spends
    ~3 bytes/char, so its bytes-per-token runs far above Latin scripts
    even at similar chars-per-token).

    char length vs octet_length is deliberate: the fixture's zh/ja docs
    make the two diverge, pinning that both engines agree on UTF-8 byte
    accounting, not just codepoint counts.

    Scale posture: ONE map-side-combined aggregate over a straight
    corpus scan; the regex token count is a JVM expression inside
    whole-stage codegen (no UDF), and the output is |langs| rows.
    Ratios are integer fixed-point (per-mille), exact in both engines.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    ).cast("long")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
        F.sum(F.octet_length("text").cast("long")).alias("total_bytes"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_tokens",
        "total_chars",
        "total_bytes",
        F.expr("total_tokens * 1000 DIV total_chars").alias("tokens_per_kchar"),
        F.expr("total_bytes * 1000 DIV total_tokens").alias(
            "bytes_per_token_milli"
        ),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Positional-index phrase search
# ---------------------------------------------------------------------------

_PHRASE = ("table", "hash")
_PHRASE_RE = r"\b" + " ".join(_PHRASE) + r"\b"


@register(
    "phrase_search_positional",
    f"""
    WITH pos AS (
      SELECT doc_id, ws[i] AS w, i AS p
      FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
            FROM (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents))),
    hits AS (
      SELECT a.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_phrase
      FROM pos a JOIN pos b
        ON a.doc_id = b.doc_id AND b.p = a.p + 1
      WHERE a.w = '{_PHRASE[0]}' AND b.w = '{_PHRASE[1]}'
      GROUP BY a.doc_id),
    direct AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{_PHRASE_RE}')) AS BIGINT)
               AS n_direct
      FROM documents)
    SELECT h.doc_id AS doc_id, h.n_phrase AS n_phrase, d.n_direct AS n_direct
    FROM hits h JOIN direct d ON h.doc_id = d.doc_id
    ORDER BY doc_id
    """,
    "text",
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase query via a POSITIONAL inverted index — the search-engine
    primitive: per-term posting lists carry word positions, and an
    exact phrase match is an equi-join of adjacent positions (term_i at
    p, term_{{i+1}} at p+1) — no text re-scan at query time.  The
    operator emits the phrase count per document from the index AND
    from a direct regex scan; the two columns agreeing (for a
    self-overlap-free phrase) is the index-correctness invariant,
    checked row-by-row by the oracle.

    Scale posture: the posting join is keyed (doc_id, position) after
    per-term selection — each side is filtered to ONE term's postings
    before the join, so the join input is term-frequency-sized, not
    corpus-sized; at 100 TB the posting lists are the materialized
    table and only the (rare-term) selections move.  The direct-regex
    leg exists for verification; production serves from the index.
    """
    d = load(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p", "w")
    )
    # the NEXT position is part of the equi-join key (not a post-join
    # filter), so the join never materializes the per-doc tf(a) x tf(b)
    # cross product — it matches exact adjacency directly.
    a = pos.filter(F.col("w") == _PHRASE[0]).select(
        "doc_id", (F.col("p") + 1).alias("p_next")
    )
    b = pos.filter(F.col("w") == _PHRASE[1]).select(
        "doc_id", F.col("p").alias("p_next")
    )
    hits = (
        a.join(b, ["doc_id", "p_next"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_phrase"))
    )
    direct = d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_PHRASE_RE), 0)
        ).cast("long").alias("n_direct"),
    )
    return (
        hits.join(direct, "doc_id")
        .select("doc_id", "n_phrase", "n_direct")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Quality ensemble vote
# ---------------------------------------------------------------------------


@register(
    "quality_ensemble_vote",
    f"""
    WITH sig AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_uniq,
             len(list_filter(string_split(text, ' '),
                             w -> w IN {_sql_list(_STOPWORDS)})) AS n_stop,
             len(replace(text, ' ', '')) AS n_chars
      FROM documents),
    votes AS (
      SELECT doc_id,
             CAST(n_words >= 40 AS INT) AS v_length,
             CAST(CAST(n_stop AS DOUBLE) / n_words >= 0.01 AS INT)
               AS v_stopword,
             CAST(10 * n_uniq >= 3 * n_words AS INT) AS v_diversity,
             CAST(n_chars >= 2 * n_words AND n_chars <= 15 * n_words
                  AS INT) AS v_wordshape
      FROM sig)
    SELECT doc_id, v_length, v_stopword, v_diversity, v_wordshape,
           CAST(v_length + v_stopword + v_diversity + v_wordshape
                AS INT) AS n_votes,
           CAST(v_length + v_stopword + v_diversity + v_wordshape >= 3
                AS INT) AS keep
    FROM votes
    ORDER BY doc_id
    """,
    "text",
    "pipeline",
)
def quality_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision quality gating: four independent cheap signals
    vote per document — length, stopword presence, lexical diversity
    (distinct/total word ratio), and word-shape sanity (chars-per-word
    band) — and majority (>=3) decides keep/drop.  Ensembling
    uncorrelated weak signals is the standard robustness move over any
    single threshold (one signal's failure mode doesn't doom the doc),
    and the per-vote breakdown is the audit trail reviewers need.

    Every vote is an integer comparison (the diversity band uses
    10*uniq >= 3*words — no float ratio; the stopword vote's single
    IEEE division is threshold-compared identically in both engines).

    Scale posture: one straight corpus scan, all signals computed in
    one projection of JVM expressions (shared split() subtree), no
    shuffle at all until the ORDER BY — at 100 TB this gate runs at
    scan speed as the first pass of the curation pipeline.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws"), "text"
    )
    sig = d.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_uniq"),
        F.size(
            F.filter("ws", lambda w: w.isin(*_STOPWORDS))
        ).alias("n_stop"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "n_chars"
        ),
    )
    votes = sig.select(
        "doc_id",
        (F.col("n_words") >= 40).cast("int").alias("v_length"),
        (
            F.col("n_stop").cast("double") / F.col("n_words") >= 0.01
        ).cast("int").alias("v_stopword"),
        (10 * F.col("n_uniq") >= 3 * F.col("n_words")).cast("int").alias(
            "v_diversity"
        ),
        (
            (F.col("n_chars") >= 2 * F.col("n_words"))
            & (F.col("n_chars") <= 15 * F.col("n_words"))
        ).cast("int").alias("v_wordshape"),
    )
    total = (
        F.col("v_length")
        + F.col("v_stopword")
        + F.col("v_diversity")
        + F.col("v_wordshape")
    )
    return votes.select(
        "doc_id",
        "v_length",
        "v_stopword",
        "v_diversity",
        "v_wordshape",
        total.cast("int").alias("n_votes"),
        (total >= 3).cast("int").alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Naive-Bayes language classifier (train on even docs, score odd docs)
# ---------------------------------------------------------------------------

_NB_LANGS = ["de", "en", "es", "fr", "zh"]


def _nb_oracle() -> str:
    bit_cols = ",\n           ".join(
        f"MAX(CASE WHEN lang = '{L}' THEN bits END) AS bits_{L}"
        for L in _NB_LANGS
    )
    least = ", ".join(f"bits_{L}" for L in _NB_LANGS)
    pred = " ".join(
        f"WHEN bits_{L} THEN '{L}'" for L in _NB_LANGS[:-1]
    )
    return f"""
    WITH tr AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    te AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    trw AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM tr),
    cnt AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM trw GROUP BY lang, w),
    vocabn AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM cnt),
    tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY lang),
    tew AS (SELECT doc_id, lang AS labeled_lang, w,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                  FROM te)
            GROUP BY doc_id, lang, w),
    scored AS (
      SELECT t.doc_id, t.labeled_lang, tot.lang,
             CAST(SUM(t.n * (length(printf('%b',
                    (tot.tot + v.v) // (COALESCE(c.c, 0) + 1))) - 1))
                  AS BIGINT) AS wbits
      FROM tew t CROSS JOIN tot CROSS JOIN vocabn v
      LEFT JOIN cnt c ON c.lang = tot.lang AND c.w = t.w
      GROUP BY t.doc_id, t.labeled_lang, tot.lang, tot.tot, v.v),
    prior AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd
              FROM tr GROUP BY lang),
    ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tr),
    fulls AS (
      SELECT s.doc_id, s.labeled_lang, s.lang,
             s.wbits + (length(printf('%b', ntr.n // p.nd)) - 1) AS bits
      FROM scored s JOIN prior p USING (lang) CROSS JOIN ntr),
    wide AS (
      SELECT doc_id, labeled_lang,
           {bit_cols}
      FROM fulls GROUP BY doc_id, labeled_lang)
    SELECT doc_id, labeled_lang,
           {", ".join(f"CAST(bits_{L} AS BIGINT) AS bits_{L}" for L in _NB_LANGS)},
           CASE LEAST({least}) {pred} ELSE '{_NB_LANGS[-1]}' END AS pred_lang
    FROM wide
    ORDER BY doc_id
    """


@register("naive_bayes_langid", _nb_oracle(), "text", "pipeline")
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language identification, trained on the
    even-doc_id half of the corpus and scored on the odd half — the
    supervised counterpart of the marker-word heuristic
    ``text_langid``, and the classic fasttext-style quality/language
    filter of LLM pipelines reduced to its exact-arithmetic core.

    Laplace-smoothed surprisal is quantized the ``quality_lm_surprisal``
    way: -log2 P(w|lang) ~ bitlength((tot_lang + V) DIV (c_w_lang + 1))
    - 1, exact in int64, so per-doc per-lang scores — and hence the
    argmin prediction — are bit-identical across engines with no
    transcendental log.  Unseen-in-training words get the correct
    c = 0 smoothing via left-join + coalesce.  Class priors enter as
    bitlength(N_train DIV n_lang) - 1.

    Scale posture: the model (lang x vocab count table + 5-row totals)
    is vocabulary-grain — at 100 TB it broadcasts, so scoring is a
    map-side join over exploded test tokens followed by one combinable
    (doc, lang) aggregate; the constant-factor 5x lang fan-out rides
    the same scan.  Training is one map-side-combined groupBy.

    Reference has no ML operators (SURVEY §2c extension).
    """
    d = load(spark, sf_dir, "documents")
    tr = d.filter(F.col("doc_id") % 2 == 0)
    te = d.filter(F.col("doc_id") % 2 == 1)
    trw = tr.select("lang", F.explode(F.split("text", " ")).alias("w"))
    cnt = trw.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # V from the (lang, w)-grain count table, NOT a second pass over
    # the exploded corpus — cnt is vocabulary-sized (the sf10 probe
    # measured the corpus-grain recount as most of a 4.9x decade step).
    vocabn = cnt.agg(F.countDistinct("w").cast("long").alias("v"))
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("long").alias("tot"))
    tew = (
        te.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            F.explode(F.split("text", " ")).alias("w"),
        )
        .groupBy("doc_id", "labeled_lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    grid = tew.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(vocabn))
    c = cnt.select(
        F.col("lang").alias("c_lang"), F.col("w").alias("c_w"), "c"
    )
    joined = grid.join(
        F.broadcast(c),
        (F.col("lang") == F.col("c_lang")) & (F.col("w") == F.col("c_w")),
        "left",
    )
    wbits_term = F.expr(
        "n * (length(conv(CAST((tot + v) DIV (COALESCE(c, 0) + 1)"
        " AS STRING), 10, 2)) - 1)"
    )
    scored = joined.groupBy("doc_id", "labeled_lang", "lang").agg(
        F.sum(wbits_term).cast("long").alias("wbits")
    )
    prior = tr.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("nd"))
    ntr = tr.agg(F.count(F.lit(1)).cast("long").alias("n"))
    fulls = (
        scored.join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(ntr))
        .select(
            "doc_id",
            "labeled_lang",
            "lang",
            F.expr(
                "wbits + (length(conv(CAST(n DIV nd AS STRING), 10, 2)) - 1)"
            )
            .cast("long")
            .alias("bits"),
        )
    )
    wide = fulls.groupBy("doc_id", "labeled_lang").agg(
        *[
            F.max(F.when(F.col("lang") == L, F.col("bits")))
            .cast("long")
            .alias(f"bits_{L}")
            for L in _NB_LANGS
        ]
    )
    least = ", ".join(f"bits_{L}" for L in _NB_LANGS)
    pred = " ".join(f"WHEN bits_{L} THEN '{L}'" for L in _NB_LANGS[:-1])
    return wide.select(
        "doc_id",
        "labeled_lang",
        *[f"bits_{L}" for L in _NB_LANGS],
        F.expr(
            f"CASE LEAST({least}) {pred} ELSE '{_NB_LANGS[-1]}' END"
        ).alias("pred_lang"),
    ).orderBy("doc_id")

"""Training-data pipeline operators beyond dedup/similarity: cleaning,
chunking, split assignment, and context packing.

All pure DataFrame expressions with exact DuckDB oracles.  These are
the ops that sit between raw corpus and tokenizer in a real pipeline;
each is narrow (per-document) except packing, which is one window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load

# RE2/Java-common regexes (no lookbehind): emails, URLs, long digit runs.
_EMAIL_RX = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_URL_RX = "https?://[^ ]+"
_DIGITS_RX = "[0-9]{6,}"


@register(
    "text_scrub_pii",
    f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_EMAIL_RX}', '<EMAIL>', 'g'),
               '{_URL_RX}', '<URL>', 'g'),
             '{_DIGITS_RX}', '<NUM>', 'g') AS scrubbed,
           len(regexp_extract_all(text, '{_EMAIL_RX}')) AS n_emails,
           len(regexp_extract_all(text, '{_URL_RX}')) AS n_urls,
           len(regexp_extract_all(text, '{_DIGITS_RX}')) AS n_digit_runs
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    "text",
    "pipeline",
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/noise scrubbing: emails, URLs, long digit runs replaced by
    placeholder tokens, with per-class match counts — the standard
    pre-tokenization cleaning pass (one narrow projection, regexes in
    the RE2/Java-common subset)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RX, "<EMAIL>"), _URL_RX, "<URL>"
        ),
        _DIGITS_RX,
        "<NUM>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RX), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_URL_RX), 0)).alias(
            "n_urls"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_DIGITS_RX), 0)).alias(
            "n_digit_runs"
        ),
    ).orderBy("doc_id")


# Chunking parameters: window of CHUNK tokens advancing by STRIDE
# (CHUNK - STRIDE overlap between consecutive chunks).
_CHUNK = 64
_STRIDE = 48


@register(
    "doc_chunking",
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    seq AS (
      SELECT doc_id, words,
             unnest(generate_series(
               0, CAST(floor((len(words) - 1) / {_STRIDE}) AS BIGINT))) AS c
      FROM w),
    chunks AS (
      SELECT doc_id,
             CAST(c AS INT) AS chunk_id,
             array_to_string(words[(c * {_STRIDE} + 1):(c * {_STRIDE} + {_CHUNK})],
                             ' ') AS chunk_text,
             least(len(words) - c * {_STRIDE}, {_CHUNK}) AS n_tokens
      FROM seq
      WHERE c * {_STRIDE} < len(words)
        AND (c = 0 OR c * {_STRIDE} + {_CHUNK} < len(words) + {_STRIDE}))
    SELECT doc_id, chunk_id, chunk_text, CAST(n_tokens AS INT) AS n_tokens
    FROM chunks WHERE doc_id < 100
    ORDER BY doc_id, chunk_id
    """,
    "text",
    "pipeline",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token windows, 48-token
    stride -> 16-token overlap): the RAG/pretraining chunker as a
    generate-and-slice expression — chunk count derives from the token
    count, no UDF, no shuffle.  A trailing chunk fully contained in the
    previous one (doc length landing exactly on the window end) is not
    emitted (strict < in the boundary guard).

    The generated sequence is bounded by each document's ACTUAL chunk
    count (floor((n_words-1)/stride)): no constant-factor row
    amplification before the filter, and arbitrarily long documents
    chunk fully instead of silently truncating at a fixed cap."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    chunks = (
        w.select(
            "doc_id",
            "words",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.expr(
                        f"CAST(floor((size(words) - 1) / {_STRIDE}) AS INT)"
                    ),
                )
            ).alias("c"),
        )
        .filter(
            (F.col("c") * _STRIDE < F.size("words"))
            & (
                (F.col("c") == 0)
                | (F.col("c") * _STRIDE + _CHUNK < F.size("words") + _STRIDE)
            )
        )
        .select(
            "doc_id",
            F.col("c").cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(
                    "words", F.col("c") * _STRIDE + 1, F.lit(_CHUNK)
                ),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.size("words") - F.col("c") * _STRIDE, F.lit(_CHUNK)
            )
            .cast("int")
            .alias("n_tokens"),
        )
    )
    return chunks.orderBy("doc_id", "chunk_id")


@register(
    "split_train_val_test",
    """
    WITH assigned AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket
      FROM documents)
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id
    FROM assigned
    GROUP BY lang, CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val' ELSE 'test' END
    ORDER BY lang, split
    """,
    "pipeline",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: hash-bucket the doc id
    (stable across runs and engines — never random()), 80/10/10.
    Stratification check: counts per (lang, split)."""
    d = load(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substr(md5(concat('split-', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT) % 100"
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("lang", "split")
    )


_CONTEXT_BUDGET = 2048
# Prefix-sum shard width (docs per shard).  Each shard's running sum is
# a local window; only one row per shard crosses shards.
_PACK_SHARD_WIDTH = 256


@register(
    "token_budget_packing",
    f"""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / {_CONTEXT_BUDGET}) AS BIGINT) AS bin_id
      FROM sized)
    SELECT bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY bin_id
    ORDER BY bin_id
    """,
    "pipeline",
)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents stream (in id order) into
    2048-token bins by running-total bucketing — no iteration, and the
    prefix sum genuinely shards: a per-shard window (shard = doc_id
    range block) runs on all partitions in parallel, then each shard's
    running sum is offset by the broadcast cumulative total of the
    shards before it.  The only global window left runs over ONE ROW
    PER SHARD (thousands of rows at 100 TB, not billions)."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.floor(F.col("doc_id") / _PACK_SHARD_WIDTH).alias("shard"),
    )
    local_run = F.sum("n_tokens").over(
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_local = sized.select(
        "doc_id", "n_tokens", "shard", local_run.alias("local_run")
    )
    # Cumulative offset of all earlier shards: tiny (one row per shard).
    prior = F.coalesce(
        F.sum("shard_total").over(
            W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    offsets = F.broadcast(
        sized.groupBy("shard")
        .agg(F.sum("n_tokens").alias("shard_total"))
        .select("shard", prior.alias("offset"))
    )
    packed = with_local.join(offsets, "shard").select(
        "doc_id",
        "n_tokens",
        F.floor(
            (F.col("local_run") + F.col("offset") - F.col("n_tokens"))
            / _CONTEXT_BUDGET
        )
        .cast("long")
        .alias("bin_id"),
    )
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


@register(
    "sample_stratified",
    """
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('sample-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket
      FROM documents)
    SELECT doc_id, lang FROM b
    WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
    ORDER BY doc_id
    """,
    "pipeline",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates (downweight the
    head language, keep more of the tail — the standard corpus
    rebalancing op).  Deterministic hash-bucket sampling, never
    random(): the same doc set is selected on every engine and every
    run, which is what makes sampling decisions auditable and the
    pipeline resumable.  One narrow filter, no shuffle."""
    d = load(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substr(md5(concat('sample-', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT) % 100"
    )
    rate = F.when(F.col("lang") == "en", 20).otherwise(60)
    return d.select("doc_id", "lang").filter(bucket < rate).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

# Pseudo benchmark set: every 37th document plays the eval suite.  Real
# pipelines load the n-grams of actual benchmark corpora here; the plan
# is identical.
_EVAL_MOD = 37


@register(
    "decontaminate_benchmark",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(string_split(text, ' ')) - 2),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2])) AS shingle
        FROM documents)
    ),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % {_EVAL_MOD} <> 0),
    hits AS (SELECT doc_id, COUNT(*) AS n_hit FROM corpus
             WHERE shingle IN (SELECT shingle FROM eval_sh) GROUP BY doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n_total FROM corpus GROUP BY doc_id)
    SELECT h.doc_id AS doc_id, n_hit, n_total,
           CAST(n_hit AS DOUBLE) / n_total AS contamination
    FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
    ORDER BY contamination DESC, doc_id
    """,
    "pipeline",
    "dedup",
)
def decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    n-grams with an evaluation set (docs with doc_id % 37 == 0 stand in
    for the benchmark corpus; production swaps in the real suite's
    n-grams — the plan is unchanged).  Emits per-document overlap
    counts and the contamination ratio, descending — the removal /
    review queue.

    Uses the same cached word-3-gram shingles as the dedup family
    (production uses 8–13-grams; N only changes the transform arity).

    Scale posture: an eval suite is ~10⁶–10⁷ distinct n-grams — tiny
    next to a 100 TB corpus — so the overlap test is a BROADCAST
    left-semi join against the corpus shingle scan: the corpus never
    shuffles for the membership test, and the per-doc counts partial-
    aggregate map-side.  The contamination ratio is one int division —
    exact in both engines.
    """
    from kbrowse_spark.operators.dedup import _shingles_df

    sh = _shingles_df(spark, sf_dir)
    is_eval = (F.col("doc_id") % _EVAL_MOD) == 0
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    corpus = sh.filter(~is_eval)
    hits = (
        corpus.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_hit",
            "n_total",
            (F.col("n_hit").cast("double") / F.col("n_total")).alias(
                "contamination"
            ),
        )
        .orderBy(F.col("contamination").desc(), "doc_id")
    )


# ---------------------------------------------------------------------------
# Per-domain caps
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 40


@register(
    "curation_domain_cap",
    f"""
    SELECT doc_id, source, CAST(rn AS INT) AS rn
    FROM (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents)
    WHERE rn <= {_DOMAIN_CAP}
    ORDER BY source, doc_id
    """,
    "pipeline",
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most N documents per source —
    the anti-domination rule of web-corpus curation (a RefinedWeb /
    C4-style per-host quota) that stops one boilerplate-heavy domain
    from flooding the training mix.  Deterministic keeper choice:
    lowest doc_ids win.

    Scale posture: rank-filter-over-window compiles to Spark's
    WindowGroupLimit — each map task pre-truncates every source group
    to the cap BEFORE the exchange, so the shuffle carries at most
    cap×sources rows, not the corpus; the heaviest domain costs the
    same as the lightest.  (Verified in docs/PLANS.md.)
    """
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .select("doc_id", "source", F.col("rn").cast("int").alias("rn"))
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Source mixing with a token budget
# ---------------------------------------------------------------------------

# Target mixture: the 'books' group (src10..src19) gets 70% of the
# sampled token budget, 'web' (src0..src9) 30%; the budget is 60% of
# the corpus's total tokens.  Real pipelines read these from a mixing
# config (Pile/Dolma-style source weights); the plan is identical.
_MIX_BUDGET_PCT = 60
_MIX_SHARES = {"books": 7, "web": 3}  # tenths


@register(
    "mix_token_budget",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             CASE WHEN regexp_full_match(source, 'src1[0-9]')
                  THEN 'books' ELSE 'web' END AS grp,
             len(string_split(text, ' ')) AS n_tokens,
             ('0x' || substr(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 1000 AS bucket
      FROM documents),
    totals AS (
      SELECT grp, SUM(n_tokens) AS grp_tokens,
             (SELECT CAST({_MIX_BUDGET_PCT} * SUM(n_tokens) AS BIGINT) // 100
              FROM t) AS budget
      FROM t GROUP BY grp),
    rates AS (
      SELECT grp,
             LEAST(1.0,
               CAST(CASE grp WHEN 'books' THEN {_MIX_SHARES['books']}
                             ELSE {_MIX_SHARES['web']} END * budget AS DOUBLE)
               / CAST(10 * grp_tokens AS DOUBLE)) AS rate
      FROM totals)
    SELECT doc_id, t.grp AS grp, n_tokens,
           CAST(floor(rate * 1000) AS BIGINT) AS keep_millis
    FROM t JOIN rates r ON t.grp = r.grp
    WHERE bucket < CAST(floor(rate * 1000) AS BIGINT)
    ORDER BY doc_id
    """,
    "pipeline",
)
def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixing under a token budget: sample each source group at
    the rate that makes its share of sampled tokens match a target
    mixture (books 70% / web 30% of a 60%-of-corpus budget) — the
    Pile/Dolma-style reweighting step that sets a training mix.

    Deterministic end to end: group token totals are exact integer
    sums; each group's keep rate is one IEEE division (exact in both
    engines); membership is the md5 hash-bucket idiom shared with
    :func:`sample_stratified` — auditable, resumable, engine-portable
    sampling, never ``rand()``.

    Scale posture: pass 1 is a map-side-combined 2-row aggregate; the
    rates re-attach as a BROADCAST join (group-count rows), so the
    corpus-sized pass is one narrow filter — no corpus shuffle at all.
    At 100 TB with thousands of sources the rates side is still tiny;
    the mixture config scales by group count, not data.
    """
    d = load(spark, sf_dir, "documents")
    grp = F.when(F.col("source").rlike(r"\Asrc1[0-9]\Z"), "books").otherwise("web")
    t = d.select(
        "doc_id",
        grp.alias("grp"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(
            "CAST(conv(substr(md5(concat('mix-', CAST(doc_id AS STRING))), 1, 8),"
            " 16, 10) AS BIGINT) % 1000"
        ).alias("bucket"),
    )
    totals = t.groupBy("grp").agg(F.sum("n_tokens").alias("grp_tokens"))
    budget = t.agg(
        (F.lit(_MIX_BUDGET_PCT) * F.sum("n_tokens")).cast("long").alias("b100")
    ).select((F.col("b100") / 100).cast("long").alias("budget"))
    share = (
        F.when(F.col("grp") == "books", _MIX_SHARES["books"])
        .otherwise(_MIX_SHARES["web"])
        .cast("long")
    )
    rates = (
        totals.crossJoin(F.broadcast(budget))
        .select(
            "grp",
            F.least(
                F.lit(1.0),
                (share * F.col("budget")).cast("double")
                / (F.lit(10) * F.col("grp_tokens")).cast("double"),
            ).alias("rate"),
        )
    )
    return (
        t.join(F.broadcast(rates), "grp")
        .withColumn("keep_millis", F.floor(F.col("rate") * 1000).cast("long"))
        .filter(F.col("bucket") < F.col("keep_millis"))
        .select("doc_id", "grp", "n_tokens", "keep_millis")
        .orderBy("doc_id")
    )


# Temperature-weighted mixing: total sample size apportioned across
# sources by n_s^tau weights.  tau = 1/2 on purpose: sqrt is CORRECTLY
# ROUNDED under IEEE-754 (unlike pow/exp), so floor(sqrt(n)*1e6) is the
# same BIGINT on every engine — the weights enter exact integer
# apportionment with no transcendental in sight.
_MIXQ_K = 200
_MIXQ_SCALE = 1_000_000


@register(
    "mix_temperature_quota",
    f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    w AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * {_MIXQ_SCALE})
                  AS BIGINT) AS weight_fp
      FROM counts),
    tot AS (SELECT SUM(weight_fp) AS s_total FROM w),
    q0 AS (
      SELECT source, n_docs, weight_fp,
             ({_MIXQ_K} * weight_fp) // s_total AS base,
             ({_MIXQ_K} * weight_fp) % s_total AS rem
      FROM w CROSS JOIN tot),
    lo AS (SELECT {_MIXQ_K} - SUM(base) AS leftover FROM q0),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rnk
      FROM q0),
    q AS (
      SELECT source, n_docs, weight_fp,
             base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS quota
      FROM rk CROSS JOIN lo),
    ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5('mixq-' || CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents),
    taken AS (
      SELECT r.source, CAST(COUNT(*) AS BIGINT) AS n_taken,
             CAST(SUM(r.doc_id) AS BIGINT) AS taken_id_sum
      FROM ranked r JOIN q ON r.source = q.source
      WHERE r.rn <= q.quota GROUP BY r.source)
    SELECT q.source, q.n_docs, q.weight_fp, CAST(q.quota AS BIGINT) AS quota,
           COALESCE(t.n_taken, 0) AS n_taken,
           COALESCE(t.taken_id_sum, 0) AS taken_id_sum
    FROM q LEFT JOIN taken t ON q.source = t.source
    ORDER BY q.source
    """,
    "pipeline",
)
def mix_temperature_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing with EXACT largest-remainder
    apportionment (Hamilton's method): each source's share of a
    200-doc sample is proportional to n_s^0.5 — the standard
    temperature-sampling flattening (tau = 0.5) that upweights small
    sources in a training mix — and the fractional quotas are resolved
    to integers that sum EXACTLY to the target (floor everyone, then
    +1 to the largest remainders).

    Determinism: sqrt is correctly rounded (IEEE), so the fixed-point
    weights are identical BIGINTs on both engines; everything after —
    base quotas, remainders, ranking, member selection by md5 order —
    is integer/string arithmetic.  No rand(), no pow().

    Scale posture: the apportionment runs on the |sources|-row
    aggregate (tiny; its unpartitioned rank window is bounded by the
    source vocabulary, not the corpus); quotas re-attach BROADCAST; the
    corpus-sized pass is one partitioned per-source rank window + a
    filter.  At 100 TB the per-source rank is the only shuffle, on the
    same key the downstream write would partition by anyway.
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * _MIXQ_SCALE)
        .cast("long")
        .alias("weight_fp"),
    )
    tot = w.agg(F.sum("weight_fp").alias("s_total"))
    q0 = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "weight_fp",
        F.expr(f"({_MIXQ_K} * weight_fp) div s_total").alias("base"),
        F.expr(f"({_MIXQ_K} * weight_fp) % s_total").alias("rem"),
    )
    lo = q0.agg((F.lit(_MIXQ_K) - F.sum("base")).alias("leftover"))
    rk = q0.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.col("rem").desc(), "source")),
    )
    q = rk.crossJoin(F.broadcast(lo)).select(
        "source",
        "n_docs",
        "weight_fp",
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("quota"),
    )
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(
                F.md5(F.concat(F.lit("mixq-"), F.col("doc_id").cast("string"))),
                "doc_id",
            )
        )
        .alias("rn"),
    )
    taken = (
        ranked.join(F.broadcast(q.select("source", "quota")), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_taken"),
            F.sum("doc_id").alias("taken_id_sum"),
        )
    )
    return (
        q.join(taken, "source", "left")
        .select(
            "source",
            "n_docs",
            "weight_fp",
            F.col("quota").cast("long").alias("quota"),
            F.coalesce(F.col("n_taken"), F.lit(0)).alias("n_taken"),
            F.coalesce(F.col("taken_id_sum"), F.lit(0)).alias("taken_id_sum"),
        )
        .orderBy("source")
    )


# Power-of-two padded-batch buckets (16..1024): the length-bucketing a
# batched trainer/inference server uses so same-bucket sequences pad to
# the bucket size, not to the global max.  A CASE ladder, not
# ceil(log2(n)): log2 is a transcendental whose rounding at exact
# powers of two the two engines do not co-guarantee — the ladder is
# branch-for-branch identical on both.
_PAD_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def _pad_bucket_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in _PAD_BUCKETS
    )
    return f"CASE {whens} ELSE {_PAD_BUCKETS[-1]} END"


@register(
    "length_bucket_padding",
    f"""
    WITH sized AS (
      SELECT doc_id,
             LEAST(len(string_split(text, ' ')), {_PAD_BUCKETS[-1]})
               AS n_tokens
      FROM documents),
    bucketed AS (
      SELECT doc_id, n_tokens,
             {_pad_bucket_case('n_tokens')} AS bucket
      FROM sized)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) * bucket - SUM(n_tokens) AS BIGINT) AS total_padding,
           CAST(SUM(n_tokens) AS DOUBLE) / (COUNT(*) * bucket) AS efficiency
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
    "pipeline",
)
def length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch construction audit: assign every document
    to its power-of-two padding bucket and report per-bucket padding
    waste and efficiency — the measurement that decides a trainer's
    bucket boundaries (global-max padding vs bucketed padding is often
    a 2-3x step in effective tokens/s).

    Sequences longer than the top bucket are TRUNCATED to it — both
    the bucket assignment AND the token count, so total_padding stays
    nonnegative and efficiency <= 1 by construction (a real pipeline
    truncates or splits such docs; doc_chunking in this catalog is the
    splitting path, and the truncated tokens are exactly what it would
    carry into the next chunk).

    Scale posture: one narrow projection + one map-side-combinable
    aggregate at bucket grain (<= 7 groups); the only
    float is one division per OUTPUT row over exact integer sums.
    """
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        F.least(
            F.size(F.split("text", " ")), F.lit(_PAD_BUCKETS[-1])
        ).alias("n_tokens")
    )
    bucket_expr = F.expr(_pad_bucket_case("n_tokens"))
    return (
        sized.select("n_tokens", bucket_expr.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_docs",
            "total_tokens",
            (F.col("n_docs") * F.col("bucket") - F.col("total_tokens"))
            .cast("long")
            .alias("total_padding"),
            (
                F.col("total_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket"))
            ).alias("efficiency"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Quantile-threshold corpus pruning: drop the bottom quality quartile
# ---------------------------------------------------------------------------

_PRUNE_FRAC_NUM = 1  # prune the bottom 1/4 by quality
_PRUNE_FRAC_DEN = 4
# Integer quality score: the same 0.4/0.4/0.2 weighting as
# text_quality_score, scaled by 1e6 and kept in exact int64 so the
# global order statistic cannot tie-break differently across engines.
_QSCORE = (
    "(400000 * n_stop) DIV n_words + (400000 * n_distinct) DIV n_words"
    " + LEAST(2000 * n_words, 200000)"
)
_QSCORE_SQL = (
    "(400000 * n_stop) // n_words + (400000 * n_distinct) // n_words"
    " + LEAST(2000 * n_words, 200000)"
)


@register(
    "quantile_prune_quality",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_words,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('the', 'a', 'and', 'of', 'to', 'in')))
               AS n_stop,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents),
    s AS (SELECT doc_id, lang,
                 CAST({_QSCORE_SQL} AS BIGINT) AS score_scaled
          FROM t)
    SELECT doc_id, lang, score_scaled
    FROM s
    QUALIFY row_number() OVER (ORDER BY score_scaled, doc_id)
            <= CAST(CEIL({_PRUNE_FRAC_NUM} * (SELECT COUNT(*) FROM documents)
                         / {_PRUNE_FRAC_DEN}.0) AS BIGINT)
    ORDER BY doc_id
    """,
    "pipeline",
    "text",
)
def quantile_prune_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative (rank-based) quality gating: report the bottom quartile
    of the corpus by quality score — the docs a fixed-budget curation
    pass would drop.  Unlike the absolute threshold in
    ``text_quality_score`` ('keep' at >= 0.45), a quantile gate adapts
    to the corpus distribution, which is how production pipelines
    budget pruning (e.g. "drop the worst 25%").

    Scale posture — deliberately NOT a global row_number window over
    the corpus (an unpartitioned window collapses onto one task), and
    fully LAZY (building the plan runs no Spark job — the corpus count
    is a 1-row aggregate attached by broadcast, not a driver count()).
    The global rank of a row decomposes as

        rank = (#rows with a strictly smaller score)      [cum_below]
             + (row_number among its own score by doc_id) [rk]

    ``cum_below`` comes from a cumulative sum over the per-score
    histogram — an unpartitioned window, but over AGGREGATED rows whose
    count is bounded by the score's value domain ([0, 1e6] by
    construction: each term is capped), not by corpus size, so it is
    100 TB-safe by value-domain bound.  ``rk`` is a window partitioned
    by score (AQE splits a skewed score group).  The filter
    ``cum_below + rk <= ceil(N/4)`` then prunes in place; N is the
    histogram's own unbounded window sum, so the corpus is scanned
    exactly twice (histogram + ranked rows), never a third time for
    the count.
    Earlier rounds used orderBy().limit(k) + TakeOrderedAndProject,
    but k here is N/4 — a quarter of the corpus funneled through one
    task/driver merge — and the builder needed an eager count() for
    the limit literal; the histogram-rank form fixes both.

    The quality score is the exact-integer form of text_quality_score's
    weighting (scaled 1e6, floor division), so the order statistic is
    engine-deterministic with (score, doc_id) tie-break.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        F.expr("size(split(text, ' '))").alias("n_words"),
        F.expr(
            "size(filter(split(text, ' '),"
            " w -> w IN ('the', 'a', 'and', 'of', 'to', 'in')))"
        ).alias("n_stop"),
        F.expr("size(array_distinct(split(text, ' ')))").alias("n_distinct"),
    )
    s = t.select(
        "doc_id",
        "lang",
        F.expr(_QSCORE).cast("long").alias("score_scaled"),
    )
    hist = s.groupBy("score_scaled").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = W.orderBy("score_scaled").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.orderBy("score_scaled").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    # n_docs rides along as a histogram window sum — the corpus is
    # scanned exactly once for the histogram and once for the ranked
    # rows, never a third time for the count.
    cum = hist.select(
        "score_scaled",
        (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("cum_below"),
        F.sum("cnt").over(w_all).alias("n_docs"),
    )
    w_grp = W.partitionBy("score_scaled").orderBy("doc_id")
    k_expr = F.expr(
        f"({_PRUNE_FRAC_NUM} * n_docs + {_PRUNE_FRAC_DEN} - 1)"
        f" DIV {_PRUNE_FRAC_DEN}"
    )
    return (
        s.withColumn("rk", F.row_number().over(w_grp))
        .join(F.broadcast(cum), "score_scaled")
        .filter(F.col("cum_below") + F.col("rk") <= k_expr)
        .select("doc_id", "lang", "score_scaled")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic per-stratum reservoir (fixed-k sample per group)
# ---------------------------------------------------------------------------

_RESERVOIR_K = 40


@register(
    "sample_reservoir_per_stratum",
    f"""
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('rsv:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    WHERE rk <= {_RESERVOIR_K}
    ORDER BY lang, rk
    """,
    "pipeline",
)
def sample_reservoir_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE sample per stratum (exactly k docs per lang, or all
    of a smaller stratum) — the budgeted companion to the fixed-RATE
    ``sample_stratified``.  Ranking by a salted md5 of the key is the
    deterministic equivalent of a uniform reservoir: every doc gets an
    i.i.d.-uniform rank, the k smallest win, and re-running (or adding
    executors) cannot change the sample.

    Scale shape: rank <= k over a window partitioned by stratum is
    Spark's WindowGroupLimit pattern — each partition keeps a k-row
    heap BEFORE the shuffle, so the exchange carries ~k rows per
    stratum per map task, not the corpus (the plan-shape test pins
    this).  The md5 tie-break includes doc_id so the order is total.
    """
    d = load(spark, sf_dir, "documents")
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.md5(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
    )
    return (
        d.select("doc_id", "lang", rk.alias("rk"))
        .filter(F.col("rk") <= _RESERVOIR_K)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# Priority sampling: weighted top-k with Horvitz-Thompson estimates
# ---------------------------------------------------------------------------

_PRIORITY_K = 5
_U_DENOM = 4503599627370496.0  # 2^52 = 16^13: the hash domain size


@register(
    "sample_weighted_priority",
    f"""
    WITH pri AS (
      SELECT doc_id, lang, n_chars AS w,
             -- u = (h+1)/2^52 is EXACT (h+1 <= 2^52 is an exact double,
             -- dividing by a power of two only shifts the exponent), so
             -- priority = w/u carries exactly ONE IEEE rounding -- the
             -- same bits in any engine.
             CAST(n_chars AS DOUBLE)
               / ((('0x' || substr(md5('pri:' || CAST(doc_id AS VARCHAR)),
                                   1, 13))::BIGINT + 1) / {_U_DENOM})
               AS priority
      FROM documents),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY priority DESC, doc_id) AS rk
      FROM pri),
    tau AS (
      SELECT lang, priority AS tau FROM ranked WHERE rk = {_PRIORITY_K + 1})
    SELECT r.lang, CAST(r.rk AS INT) AS rk, r.doc_id, r.w, r.priority,
           COALESCE(t.tau, 0.0) AS tau,
           GREATEST(CAST(r.w AS DOUBLE), COALESCE(t.tau, 0.0)) AS weight_est
    FROM ranked r LEFT JOIN tau t USING (lang)
    WHERE r.rk <= {_PRIORITY_K}
    ORDER BY r.lang, r.rk
    """,
    "pipeline",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): a fixed-size WEIGHTED
    sample per stratum with per-item Horvitz-Thompson weight estimates
    -- the principled way to downsample a corpus while keeping sums of
    weights estimable (mix auditing, token accounting on a sample).
    Each doc draws priority = w/u with u a deterministic salted-hash
    uniform in (0,1]; the k highest priorities per lang win, and the
    (k+1)-th priority becomes the stratum threshold tau.  A kept item
    estimates its own weight as max(w, tau) -- summing those is an
    unbiased estimate of the stratum's total weight.

    Determinism contract: u = (h+1)/2^52 is exact (h+1 <= 2^52 is an
    exact double; a power-of-two division only shifts the exponent),
    so priority carries exactly one IEEE rounding and hash-matches the
    oracle bit-for-bit; ranking ties break by doc_id.

    Scale shape: rank <= k per stratum is the WindowGroupLimit pattern
    (map-side k+1-row truncation before the exchange, same as
    ``sample_reservoir_per_stratum``); tau is a |strata|-row broadcast
    join-back.  No collect, no second corpus pass.
    """
    d = load(spark, sf_dir, "documents")
    h = F.expr(
        "CAST(conv(substr(md5(concat('pri:', CAST(doc_id AS STRING))),"
        " 1, 13), 16, 10) AS BIGINT)"
    )
    pri = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("w"),
        (
            F.col("n_chars").cast("double")
            / ((h + F.lit(1)) / F.lit(_U_DENOM))
        ).alias("priority"),
    )
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("priority").desc(), "doc_id")
    )
    ranked = pri.withColumn("rk", rk).filter(F.col("rk") <= _PRIORITY_K + 1)
    tau = (
        ranked.filter(F.col("rk") == _PRIORITY_K + 1)
        .select("lang", F.col("priority").alias("tau"))
    )
    return (
        ranked.filter(F.col("rk") <= _PRIORITY_K)
        .join(F.broadcast(tau), "lang", "left")
        .select(
            "lang",
            F.col("rk").cast("int").alias("rk"),
            "doc_id",
            "w",
            "priority",
            F.coalesce("tau", F.lit(0.0)).alias("tau"),
            F.greatest(
                F.col("w").cast("double"), F.coalesce("tau", F.lit(0.0))
            ).alias("weight_est"),
        )
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# Corpus snapshot diff: what changed between two corpus versions
# ---------------------------------------------------------------------------


@register(
    "corpus_snapshot_diff",
    """
    WITH new_snap AS (
      SELECT doc_id, md5(text) AS h FROM documents),
    old_snap AS (
      -- prior corpus version, derived deterministically: ~1/11 of the
      -- docs had not been ingested yet (absent -> 'added' now), every
      -- 13th doc carried an older revision (text differs -> 'changed'),
      -- and a retired shard existed (-> 'removed'); retired ids are
      -- NEGATIVE (-(id+1)) so they can never collide with a real
      -- non-negative doc_id at any corpus scale.
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN md5(reverse(text))
                  ELSE md5(text) END AS h
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT -doc_id - 1 AS doc_id, md5(text) AS h
      FROM documents WHERE doc_id % 17 = 0),
    diff AS (
      SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN n.h <> o.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM new_snap n FULL OUTER JOIN old_snap o USING (doc_id))
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM diff GROUP BY status
    ORDER BY status
    """,
    "pipeline",
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest diff between two corpus snapshots by content
    hash: FULL OUTER join on doc_id classifying every doc as added /
    removed / changed / unchanged — the audit that gates an incremental
    training-data refresh (how much actually moved?) and sizes the
    downstream recompute (only 'added' + 'changed' re-enter the dedup
    and quality pipeline).

    The 'old' snapshot is derived deterministically from the fixture
    (a subset, some older revisions, a retired shard) so both engines
    construct identical inputs; in production the two sides are two
    snapshot tables / manifests.

    Scale shape: one doc_id-keyed FULL OUTER sort-merge join of two
    hash projections (16-byte rows, column-pruned at the scan), then a
    4-group aggregate — no full-text movement; md5 computes at the
    scan.  Works unchanged as an anti-join pair if only one direction
    is needed.
    """
    d = load(spark, sf_dir, "documents")
    new_snap = d.select("doc_id", F.md5("text").alias("h"))
    old_snap = (
        d.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 13 == 0, F.md5(F.reverse(F.col("text")))
            ).otherwise(F.md5(F.col("text"))).alias("h"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 17 == 0).select(
                (-F.col("doc_id") - 1).alias("doc_id"),
                F.md5("text").alias("h"),
            )
        )
    )
    n, o = new_snap.alias("n"), old_snap.alias("o")
    diff = n.join(o, F.col("n.doc_id") == F.col("o.doc_id"), "full_outer").select(
        F.coalesce(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_id"),
        F.when(F.col("o.doc_id").isNull(), F.lit("added"))
        .when(F.col("n.doc_id").isNull(), F.lit("removed"))
        .when(F.col("n.h") != F.col("o.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Sequence-length histogram: padding/packing efficiency audit
# ---------------------------------------------------------------------------

_LEN_BUCKET = 64  # tokens per histogram bucket


@register(
    "seq_length_histogram",
    f"""
    WITH sized AS (
      SELECT len(string_split(text, ' ')) AS n FROM documents),
    b AS (
      SELECT (n // {_LEN_BUCKET}) * {_LEN_BUCKET} AS bucket_start,
             COUNT(*) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS total_tokens
      FROM sized GROUP BY n // {_LEN_BUCKET})
    SELECT CAST(bucket_start AS BIGINT) AS bucket_start,
           CAST(n_docs AS BIGINT) AS n_docs,
           total_tokens,
           CAST(SUM(n_docs) OVER (ORDER BY bucket_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_docs,
           CAST(SUM(n_docs) OVER (ORDER BY bucket_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / SUM(n_docs) OVER () AS cum_frac
    FROM b ORDER BY bucket_start
    """,
    "pipeline",
    "text",
)
def seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram in fixed-width buckets with cumulative
    document share — the audit that sizes context budgets and padding
    waste before packing (what fraction of docs fit in 512? how much
    of the token mass sits in the tail?).  Companion diagnostic to
    ``token_budget_packing``.

    Scale shape: one map-side-combined aggregate to <= max_len/64
    buckets; the cumulative windows run over those AGGREGATED rows
    (value-domain bounded, like quantile_prune_quality's histogram),
    never the corpus.
    """
    d = load(spark, sf_dir, "documents")
    sized = d.select(F.expr("size(split(text, ' '))").alias("n"))
    b = (
        sized.groupBy(
            F.expr(f"(n DIV {_LEN_BUCKET}) * {_LEN_BUCKET}").alias(
                "bucket_start"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
        )
    )
    w_cum = W.orderBy("bucket_start").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.orderBy("bucket_start").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return b.select(
        F.col("bucket_start").cast("long").alias("bucket_start"),
        "n_docs",
        "total_tokens",
        F.sum("n_docs").over(w_cum).alias("cum_docs"),
        (
            F.sum("n_docs").over(w_cum).cast("double")
            / F.sum("n_docs").over(w_all)
        ).alias("cum_frac"),
    ).orderBy("bucket_start")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (constant-size filter broadcast)
# ---------------------------------------------------------------------------

# 8192-bit Bloom filter as 256 x 32-bit words (32-bit words keep every
# mask below 2^31, so no sign-bit cases in either engine), k=4 md5-derived
# hash functions.  Deterministic across engines => exactly oracle-checkable
# even though Bloom filters are "approximate".  The size is deliberately
# tight for the fixture (~600 eval shingles -> ~26% fill -> ~0.5% FP per
# probe) so false positives actually occur and the FP accounting below is
# exercised; production sizes at ~10 bits/element for ~1% FP.
_BLOOM_BITS = 8192
_BLOOM_WORD = 32
_BLOOM_K = 4


def _bloom_pos_spark(i: int) -> str:
    return (
        f"CAST(conv(substr(md5(concat('bloom{i}-', shingle)), 1, 8),"
        f" 16, 10) AS BIGINT) % {_BLOOM_BITS}"
    )


def _bloom_pos_sql(i: int) -> str:
    return (
        f"('0x' || substr(md5('bloom{i}-' || shingle), 1, 8))::BIGINT"
        f" % {_BLOOM_BITS}"
    )


@register(
    "decontaminate_bloom",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(string_split(text, ' ')) - 2),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2])) AS shingle
        FROM documents)),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {_EVAL_MOD} <> 0),
    epos AS (
      SELECT shingle,
             unnest([{', '.join(_bloom_pos_sql(i) for i in range(_BLOOM_K))}])
               AS pos
      FROM eval_sh),
    bitmap AS (
      SELECT pos // {_BLOOM_WORD} AS w,
             bit_or(1::BIGINT << CAST(pos % {_BLOOM_WORD} AS INT)) AS bits
      FROM epos GROUP BY pos // {_BLOOM_WORD}),
    cpos AS (
      SELECT doc_id, shingle,
             unnest([{', '.join(_bloom_pos_sql(i) for i in range(_BLOOM_K))}])
               AS pos
      FROM corpus),
    hits AS (
      SELECT c.doc_id, c.shingle
      FROM cpos c JOIN bitmap b ON b.w = c.pos // {_BLOOM_WORD}
      WHERE (b.bits & (1::BIGINT << CAST(c.pos % {_BLOOM_WORD} AS INT)))
            = (1::BIGINT << CAST(c.pos % {_BLOOM_WORD} AS INT))),
    cand AS (
      SELECT doc_id, shingle FROM hits
      GROUP BY doc_id, shingle HAVING COUNT(*) = {_BLOOM_K}),
    bloom AS (SELECT doc_id, COUNT(*) AS bloom_hits FROM cand GROUP BY doc_id),
    exact AS (
      SELECT doc_id, COUNT(*) AS exact_hits FROM cand
      WHERE shingle IN (SELECT shingle FROM eval_sh) GROUP BY doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id)
    SELECT s.doc_id AS doc_id, s.n_shingles AS n_shingles,
           COALESCE(b.bloom_hits, 0) AS bloom_hits,
           COALESCE(e.exact_hits, 0) AS exact_hits,
           COALESCE(b.bloom_hits, 0) - COALESCE(e.exact_hits, 0)
             AS false_positives
    FROM sizes s
    LEFT JOIN bloom b ON b.doc_id = s.doc_id
    LEFT JOIN exact e ON e.doc_id = s.doc_id
    ORDER BY s.doc_id
    """,
    "pipeline",
    "dedup",
    "sketch",
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination: the constant-size
    alternative to decontaminate_benchmark's broadcast shingle SET.

    A real eval suite is 10^6-10^7 distinct n-grams — broadcasting the
    raw strings costs hundreds of MB per executor.  A Bloom filter at
    ~10 bits/element is a few MB REGARDLESS of string length, and its
    one-sided error (no false negatives) fits this problem exactly:
    corpus shingles are pre-screened against the filter, and only the
    FP-bounded candidate set reaches the exact membership join — the
    same two-phase shape Spark's own runtime row-level bloom pruning
    uses for join inputs.

    Everything is engine-deterministic: k=4 bit positions per shingle
    derive from md5, the 2^16-bit filter is 2048 32-bit words built by
    a bit_or aggregate (masks < 2^31, so no sign-bit divergence), and
    the probe is a broadcast join on word index plus a mask test.  So
    even the FALSE POSITIVES are identical in both engines, and the
    query reports them per document (bloom_hits vs exact_hits) — the
    operator is its own calibration harness for sizing bits/element.

    Scale posture: the filter build aggregates the (small) eval side
    only; the corpus side is one projection (4 md5s per shingle), a
    broadcast join against <= 256 rows, and a map-side-combinable
    count — the corpus never shuffles on shingle for the screen, only
    candidates shuffle for the exact verify.  This fixture's 8192-bit
    filter is deliberately tight (~600 eval shingles, ~26% fill) so
    false positives actually occur and the FP accounting is exercised,
    not vacuous.
    """
    from kbrowse_spark.operators.dedup import _shingles_df

    sh = _shingles_df(spark, sf_dir)
    is_eval = (F.col("doc_id") % _EVAL_MOD) == 0
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    corpus = sh.filter(~is_eval)

    pos_arr = F.array(
        *[F.expr(_bloom_pos_spark(i)) for i in range(_BLOOM_K)]
    ).alias("positions")
    word = F.expr(f"pos div {_BLOOM_WORD}").alias("w")
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_WORD} AS INT))"
    ).alias("m")

    bitmap = (
        eval_sh.select(F.explode(pos_arr).alias("pos"))
        .select(word, mask)
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    # Fan the k-md5 position projection off the cached single-partition
    # shingle table (r14, guide §2.5): 4 md5s per corpus shingle would
    # otherwise run as ONE task.  Shingle-grain keys spread evenly; the
    # exchange ships (doc_id, shingle) once and buys 32-way hashing.
    cfan = corpus.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id"), F.col("shingle")
    )
    cpos = cfan.select("doc_id", "shingle", F.explode(pos_arr).alias("pos")).select(
        "doc_id", "shingle", word, mask
    )
    cand = (
        cpos.join(F.broadcast(bitmap), "w")
        .filter((F.col("bits").bitwiseAND(F.col("m"))) == F.col("m"))
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("k_hits"))
        .filter(F.col("k_hits") == _BLOOM_K)
        .select("doc_id", "shingle")
    )
    # The screened candidate set feeds BOTH readouts below (bloom_hits
    # and the exact verify); Catalyst would plan each with its own copy
    # of the scan + k-md5 + broadcast-screen pipeline.  One lazy
    # localCheckpoint shares a single FP-bounded materialization (r14,
    # guide §2.4 — same posture as the linkage/graph pair tables).
    cand = cand.localCheckpoint(eager=False)
    bloom_hits = cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("bloom_hits"))
    exact_hits = (
        cand.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("exact_hits"))
    )
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        sizes.join(bloom_hits, "doc_id", "left")
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("bloom_hits", F.lit(0)).alias("bloom_hits"),
            F.coalesce("exact_hits", F.lit(0)).alias("exact_hits"),
            (
                F.coalesce("bloom_hits", F.lit(0))
                - F.coalesce("exact_hits", F.lit(0))
            ).alias("false_positives"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (composability showcase)
# ---------------------------------------------------------------------------


@register(
    "pipeline_curation_e2e",
    """
    WITH t AS (
      SELECT doc_id, source, n_chars,
             len(string_split(text, ' ')) AS n_words,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
               AS dup_rn
      FROM documents),
    q AS (
      SELECT doc_id, source, n_words FROM t
      WHERE dup_rn = 1 AND n_chars BETWEEN 100 AND 500 AND n_words >= 20),
    s AS (
      SELECT doc_id, source, n_words,
             CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT *,
              ('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % 100 AS bucket
            FROM q)),
    c AS (
      SELECT doc_id, source, n_words, split
      FROM (SELECT *,
              row_number() OVER (PARTITION BY source, split ORDER BY doc_id)
                AS cap_rn
            FROM s)
      WHERE cap_rn <= 30)
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM c GROUP BY split ORDER BY split
    """,
    "pipeline",
)
def pipeline_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline in ONE declarative plan: exact
    content-hash dedup -> length/token quality gate -> deterministic
    train/val/test hash split -> per-(source, split) document cap ->
    per-split audit summary.  The point is composability: each stage
    is the same expression family as its standalone operator
    (dedup_exact, quality gates, split_train_val_test,
    curation_domain_cap), and Catalyst fuses the whole chain — filters
    collapse into the scan projection, the two window stages become two
    WindowGroupLimit-eligible exchanges, and the final audit aggregate
    is map-side combined.

    Scale posture: exactly three shuffles end to end — the dedup
    window's hash-partition on md5(text) (uniform by construction: the
    key is a hash), the cap window's on (source, split), and the
    3-group final aggregate.  No stage materializes an intermediate; a
    100 TB run is the same plan with the summary swapped for a
    partitioned parquet write.  The split stays stable under corpus
    growth because it hashes doc_id, never row position.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.row_number()
        .over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
        .alias("dup_rn"),
    )
    q = t.filter(
        (F.col("dup_rn") == 1)
        & F.col("n_chars").between(100, 500)
        & (F.col("n_words") >= 20)
    )
    bucket = F.expr(
        "CAST(conv(substr(md5(concat('split-', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT) % 100"
    )
    s = q.withColumn(
        "split",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"),
    )
    c = s.withColumn(
        "cap_rn",
        F.row_number().over(W.partitionBy("source", "split").orderBy("doc_id")),
    ).filter(F.col("cap_rn") <= 30)
    return (
        c.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# Rendezvous-hash shard assignment + rebalance audit (8 -> 9 nodes)
# ---------------------------------------------------------------------------

_HRW_OLD, _HRW_NEW = 8, 9  # node counts before/after the scale-out


@register(
    "shard_rebalance_hrw",
    f"""
    WITH nodes AS (SELECT unnest(range({_HRW_NEW})) AS node),
    w AS (
      SELECT d.doc_id, n.node,
             ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || n.node::VARCHAR),
                             1, 8))::BIGINT * 16 + n.node AS key
      FROM documents d CROSS JOIN nodes n),
    per_doc AS (
      SELECT doc_id,
             MAX(CASE WHEN node < {_HRW_OLD} THEN key END) % 16 AS s_old,
             MAX(key) % 16 AS s_new
      FROM w GROUP BY doc_id),
    c_old AS (SELECT s_old AS node, CAST(COUNT(*) AS BIGINT) AS n_old,
                     CAST(COUNT(*) FILTER (s_old <> s_new) AS BIGINT)
                       AS moved_out
              FROM per_doc GROUP BY s_old),
    c_new AS (SELECT s_new AS node, CAST(COUNT(*) AS BIGINT) AS n_new
              FROM per_doc GROUP BY s_new)
    SELECT n.node AS node,
           COALESCE(o.n_old, 0) AS n_under_{_HRW_OLD},
           COALESCE(w2.n_new, 0) AS n_under_{_HRW_NEW},
           COALESCE(o.moved_out, 0) AS moved_out
    FROM nodes n
    LEFT JOIN c_old o ON o.node = n.node
    LEFT JOIN c_new w2 ON w2.node = n.node
    ORDER BY node
    """,
    "pipeline",
)
def shard_rebalance_hrw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment and the
    rebalance audit for a node scale-out: every document hashes to an
    independent weight per node, its shard is the argmax, and adding a
    node moves EXACTLY the documents whose new-node weight wins —
    ~1/(n+1) of the corpus, every one landing on the new node (the
    minimal-movement property that makes HRW/consistent-hashing the
    standard way to lay out a 100 TB corpus across storage or index
    shards; naive ``hash % n`` would move ~8/9 of all docs here).

    Argmax-with-tiebreak is the single integer ``MAX(w * 16 + node) %
    16`` (w is a 32-bit md5 prefix, so the packed key fits int64 and
    ties break toward the higher node identically in both engines).

    Scale posture: the node table is a constant-size broadcast; the
    per-doc argmax is one map-side-combinable MAX over a 9x narrow
    fan-out; the audit is two vocabulary-sized (node-grain) aggregates.
    No corpus-grain shuffle at all beyond the doc_id groupBy, which
    pre-aggregates map-side.

    Reference has no placement operators (SURVEY §2c extension).
    """
    d = load(spark, sf_dir, "documents").select("doc_id")
    nodes = spark.range(_HRW_NEW).select(F.col("id").cast("int").alias("node"))
    w = d.crossJoin(F.broadcast(nodes)).select(
        "doc_id",
        "node",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',"
            " CAST(node AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            " * 16 + node"
        ).alias("key"),
    )
    per_doc = w.groupBy("doc_id").agg(
        (F.max(F.when(F.col("node") < _HRW_OLD, F.col("key"))) % 16).alias(
            "s_old"
        ),
        (F.max("key") % 16).alias("s_new"),
    )
    c_old = per_doc.groupBy(F.col("s_old").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n_old"),
        F.sum((F.col("s_old") != F.col("s_new")).cast("long"))
        .cast("long")
        .alias("moved_out"),
    )
    c_new = per_doc.groupBy(F.col("s_new").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    return (
        nodes.join(F.broadcast(c_old), "node", "left")
        .join(F.broadcast(c_new), "node", "left")
        .select(
            "node",
            F.coalesce("n_old", F.lit(0)).cast("long").alias(
                f"n_under_{_HRW_OLD}"
            ),
            F.coalesce("n_new", F.lit(0)).cast("long").alias(
                f"n_under_{_HRW_NEW}"
            ),
            F.coalesce("moved_out", F.lit(0)).cast("long").alias("moved_out"),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Zone-map / data-skipping audit over a real partitioned parquet export
# ---------------------------------------------------------------------------

_ZM_ZONES = 8


def _zm_preds_sql() -> str:
    # (pred_id, lo, hi) as expressions of the global max key m — exact
    # integer arithmetic, identical in both engines.
    return """(
      SELECT 0 AS pred_id, CAST(0 AS BIGINT) AS lo,
             CAST(m // 8 AS BIGINT) AS hi FROM mx
      UNION ALL SELECT 1, m // 2, m // 2 + m // 8 FROM mx
      UNION ALL SELECT 2, m + 1, 2 * m FROM mx
      UNION ALL SELECT 3, 0, m FROM mx)"""


@register(
    "export_zonemap_prune",
    f"""
    WITH mx AS (SELECT CAST(MAX(l_orderkey) AS BIGINT) AS m FROM lineitem),
    z AS (
      SELECT l_orderkey // (m // {_ZM_ZONES} + 1) AS zone,
             CAST(MIN(l_orderkey) AS BIGINT) AS zmin,
             CAST(MAX(l_orderkey) AS BIGINT) AS zmax,
             CAST(COUNT(*) AS BIGINT) AS zrows
      FROM lineitem CROSS JOIN mx
      GROUP BY zone),
    preds AS {_zm_preds_sql()}
    SELECT pred_id, lo, hi,
           CAST(COUNT(*) AS BIGINT) AS zones_total,
           CAST(SUM(CASE WHEN zmax < lo OR zmin > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS zones_skipped,
           CAST(SUM(CASE WHEN zmax < lo OR zmin > hi THEN 0 ELSE zrows END)
                AS BIGINT) AS rows_scanned
    FROM preds CROSS JOIN z
    GROUP BY pred_id, lo, hi
    ORDER BY pred_id
    """,
    "pipeline",
    "sink",
)
def export_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping audit over a REAL partitioned export: write the
    lineitem table into {zones} key-range zones (hive-style
    ``partitionBy`` layout, one file per zone), read the parquet
    FOOTER statistics back with pyarrow, verify footer min/max/rows
    per zone against the in-plan zone statistics, then report how many
    zones (and how many rows) each of four probe predicates could
    skip — the zone-map/file-stats pruning contract that Delta/Iceberg
    data skipping and Spark's own partition pruning rely on at 100 TB.

    The zone key is the exact integer ``l_orderkey DIV (max DIV
    {zones} + 1)`` — no sampled range boundaries, so the layout, the
    footer stats, and the DuckDB oracle (which recomputes zone stats
    straight from the source table) all agree bit-for-bit.  If any
    footer statistic disagrees with the plan the builder RAISES —
    the files, not a model of them, are what get audited.

    Driver footprint: one scalar (max key) + one {zones}-row zone-stat
    collect + footer metadata — the planner.py metadata-grain rule,
    never O(rows).  The write is a real repartition-by-zone parquet
    action (overwrite, path keyed by sf_dir hash).

    Scale posture: zone stats are one map-side-combinable aggregate;
    the audit is a constant ({zones} x 4)-row broadcast join.  At
    cluster scale the zone count follows the export sizing rule
    (write_sized_parquet) instead of a fixed {zones}; footer reads
    stay metadata-grain regardless of data volume.
    """
    import hashlib
    import os

    li = load(spark, sf_dir, "lineitem")
    m = li.agg(F.max("l_orderkey").cast("long")).collect()[0][0]
    width = m // _ZM_ZONES + 1
    out = os.path.join(
        "/tmp",
        "kbrowse_zonemap",
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    (
        li.select("l_orderkey", "l_quantity")
        .withColumn("zone", F.expr(f"l_orderkey DIV {width}"))
        .repartition("zone")
        .write.mode("overwrite")
        .partitionBy("zone")
        .parquet(out)
    )

    # In-plan zone statistics (the oracle's ground truth).
    z = (
        li.select(F.expr(f"l_orderkey DIV {width}").alias("zone"), "l_orderkey")
        .groupBy("zone")
        .agg(
            F.min("l_orderkey").cast("long").alias("zmin"),
            F.max("l_orderkey").cast("long").alias("zmax"),
            F.count(F.lit(1)).cast("long").alias("zrows"),
        )
    )

    # Footer verification: pyarrow reads ONLY metadata.  Raise on any
    # disagreement between the written files and the plan.
    import pyarrow.parquet as pq

    footer: dict[int, list[int]] = {}
    for zdir in sorted(os.listdir(out)):
        if not zdir.startswith("zone="):
            continue
        zone = int(zdir.split("=")[1])
        for fn in os.listdir(os.path.join(out, zdir)):
            if not fn.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(out, zdir, fn)).metadata
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema != "l_orderkey":
                        continue
                    st = col.statistics
                    e = footer.setdefault(zone, [st.min, st.max, 0])
                    e[0] = min(e[0], st.min)
                    e[1] = max(e[1], st.max)
                    e[2] += g.num_rows
    plan = {r.zone: (r.zmin, r.zmax, r.zrows) for r in z.collect()}
    if {k: tuple(v) for k, v in footer.items()} != plan:
        raise AssertionError(
            f"parquet footer stats disagree with plan: {footer} != {plan}"
        )

    mx = spark.createDataFrame([(int(m),)], "m long")
    preds = mx.selectExpr(
        "stack(4,"
        " 0, CAST(0 AS BIGINT), m DIV 8,"
        " 1, m DIV 2, m DIV 2 + m DIV 8,"
        " 2, m + 1, 2 * m,"
        " 3, CAST(0 AS BIGINT), m) AS (pred_id, lo, hi)"
    )
    skipped = (F.col("zmax") < F.col("lo")) | (F.col("zmin") > F.col("hi"))
    return (
        preds.crossJoin(F.broadcast(z))
        .groupBy("pred_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("zones_total"),
            F.sum(skipped.cast("long")).cast("long").alias("zones_skipped"),
            F.sum(F.when(skipped, F.lit(0)).otherwise(F.col("zrows")))
            .cast("long")
            .alias("rows_scanned"),
        )
        .orderBy("pred_id")
    )


export_zonemap_prune.__doc__ = export_zonemap_prune.__doc__.format(
    zones=_ZM_ZONES
)


# ---------------------------------------------------------------------------
# Z-order vs linear layout: clustering-effectiveness audit
# ---------------------------------------------------------------------------

_ZO_BITS = 8  # bits per dimension -> 16-bit z-value
_ZO_FILES = 64  # files per layout
# Bit-interleave of two _ZO_BITS-wide ints (x -> even bits, y -> odd):
# plain shift/mask integer arithmetic, exact and identical in both
# engines (both support >>, <<, & with two's-complement semantics on
# BIGINT; values here are tiny non-negative ints).
_ZO_Z_EXPR = " + ".join(
    f"(((xb >> {i}) & 1) << {2 * i}) + (((yb >> {i}) & 1) << {2 * i + 1})"
    for i in range(_ZO_BITS)
)


@register(
    "layout_zorder_skipping",
    f"""
    WITH mx AS (SELECT CAST(MAX(l_orderkey) AS BIGINT) AS mo,
                       CAST(MAX(l_partkey) AS BIGINT) AS mp FROM lineitem),
    pts AS (
      SELECT CAST(l_orderkey AS BIGINT) AS x, CAST(l_partkey AS BIGINT) AS y,
             CAST(l_orderkey AS BIGINT) * {2 ** _ZO_BITS} // (mo + 1) AS xb,
             CAST(l_partkey AS BIGINT) * {2 ** _ZO_BITS} // (mp + 1) AS yb
      FROM lineitem CROSS JOIN mx),
    zed AS (SELECT x, y, xb, ({_ZO_Z_EXPR}) AS z FROM pts),
    assigned AS (
      SELECT x, y, 'linear' AS layout,
             CAST(xb * {_ZO_FILES} // {2 ** _ZO_BITS} AS BIGINT) AS file_id
      FROM zed
      UNION ALL
      SELECT x, y, 'zorder',
             CAST(z * {_ZO_FILES} // {4 ** _ZO_BITS} AS BIGINT) FROM zed),
    fstats AS (
      SELECT layout, file_id, MIN(x) AS xmin, MAX(x) AS xmax,
             MIN(y) AS ymin, MAX(y) AS ymax, COUNT(*) AS nrows
      FROM assigned GROUP BY layout, file_id),
    preds AS (
      SELECT 'x' AS dim, 0 AS pred_id, CAST(0 AS BIGINT) AS lo,
             mo // 8 AS hi FROM mx
      UNION ALL SELECT 'x', 1, mo // 2, mo // 2 + mo // 16 FROM mx
      UNION ALL SELECT 'y', 0, CAST(0 AS BIGINT), mp // 8 FROM mx
      UNION ALL SELECT 'y', 1, mp // 2, mp // 2 + mp // 16 FROM mx)
    SELECT layout, dim, CAST(pred_id AS INT) AS pred_id, lo, hi,
           CAST(COUNT(*) AS BIGINT) AS files_total,
           CAST(SUM(CASE WHEN (CASE WHEN dim = 'x' THEN xmax ELSE ymax END)
                              < lo
                           OR (CASE WHEN dim = 'x' THEN xmin ELSE ymin END)
                              > hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
           CAST(SUM(CASE WHEN (CASE WHEN dim = 'x' THEN xmax ELSE ymax END)
                              < lo
                           OR (CASE WHEN dim = 'x' THEN xmin ELSE ymin END)
                              > hi
                    THEN 0 ELSE nrows END) AS BIGINT) AS rows_scanned
    FROM preds CROSS JOIN fstats
    GROUP BY layout, dim, pred_id, lo, hi
    ORDER BY layout, dim, pred_id
    """,
    "pipeline",
    "sink",
)
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-effectiveness audit: the SAME {files}-file export
    under two layouts — linear (files = l_orderkey ranges, what a
    sorted-by-key write produces) vs Z-ORDER (files = ranges of the
    {bits}-bit-per-dim Morton interleave of l_orderkey x l_partkey) —
    scored by per-file min/max zone-map pruning against range
    predicates on BOTH dimensions.  Extends export_zonemap_prune
    (which audits real parquet footers for ONE key) to the
    multi-dimensional layout DECISION Delta/Iceberg `OPTIMIZE ZORDER
    BY` makes: measured at sf0.01, the linear layout skips 56-59/64
    files for l_orderkey predicates but 0/64 for l_partkey (full
    scan), while Z-order skips 48-56/64 for BOTH — the quantified
    trade a layout owner needs before rewriting 100 TB.

    Everything is exact integer arithmetic: byte-scaled coordinates
    ``v * {nb} DIV (max+1)``, the Morton number by shift/mask terms,
    equal-WIDTH file ranges (``z * {files} DIV {zspan}``), and the
    skip test is the standard zone-map interval disjointness on raw
    key min/max — bit-identical in both engines, no floats anywhere.

    Scale posture: one scan; one shuffle to (layout, file_id) grain
    (2n exploded rows -> {files}x2 stat rows, map-side-combinable
    min/max/count); the predicate audit is a 4 x {files}x2 broadcast
    cross join.  Driver sees two scalars (the dimension maxima).  A
    production rewrite materializes the layout with
    ``repartitionByRange(z)`` + ``sortWithinPartitions`` and the
    write_sized_parquet file-sizing rule; this operator is the
    decision audit, not the write (export_zonemap_prune already pins
    the real-footer contract).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    mo, mp = li.agg(
        F.max("l_orderkey").cast("long"), F.max("l_partkey").cast("long")
    ).collect()[0]
    nb = 2**_ZO_BITS
    pts = li.select(
        F.col("l_orderkey").cast("long").alias("x"),
        F.col("l_partkey").cast("long").alias("y"),
        F.expr(f"CAST(l_orderkey AS BIGINT) * {nb} DIV {mo + 1}").alias("xb"),
        F.expr(f"CAST(l_partkey AS BIGINT) * {nb} DIV {mp + 1}").alias("yb"),
    )
    # Fan-out repartition MEASURED AND REJECTED here (r14): spreading
    # the Morton transform off the single input split read 1.25 ->
    # 1.87 s — the per-row integer work is far too light to amortize
    # a 600k-row exchange (contrast the rag/pmi fan-outs, where each
    # doc explodes into ~100 hashed words).  See OPTIMIZATION_r14.md.
    zed = pts.withColumn("z", F.expr(_ZO_Z_EXPR))
    assigned = zed.select(
        "x",
        "y",
        F.explode(
            F.array(
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.expr(f"xb * {_ZO_FILES} DIV {nb}")
                    .cast("long")
                    .alias("file_id"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"z * {_ZO_FILES} DIV {nb * nb}")
                    .cast("long")
                    .alias("file_id"),
                ),
            )
        ).alias("a"),
    ).select("x", "y", "a.layout", "a.file_id")
    return _layout_audit(spark, assigned, mo, mp)


def _layout_audit(
    spark: SparkSession, assigned: DataFrame, mo: int, mp: int
) -> DataFrame:
    """Shared zone-map audit over (x, y, layout, file_id) rows: per-
    (layout, file) min/max stats, the 4-predicate probe table, and
    the skip/scan readout — used by layout_zorder_skipping and
    layout_hilbert_skipping so the two curves are scored identically."""
    fstats = assigned.groupBy("layout", "file_id").agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
        F.count(F.lit(1)).alias("nrows"),
    )
    preds = spark.createDataFrame([(int(mo), int(mp))], "mo long, mp long").selectExpr(
        "stack(4,"
        " 'x', 0, CAST(0 AS BIGINT), mo DIV 8,"
        " 'x', 1, mo DIV 2, mo DIV 2 + mo DIV 16,"
        " 'y', 0, CAST(0 AS BIGINT), mp DIV 8,"
        " 'y', 1, mp DIV 2, mp DIV 2 + mp DIV 16"
        ") AS (dim, pred_id, lo, hi)"
    )
    vmax = F.when(F.col("dim") == "x", F.col("xmax")).otherwise(F.col("ymax"))
    vmin = F.when(F.col("dim") == "x", F.col("xmin")).otherwise(F.col("ymin"))
    skipped = (vmax < F.col("lo")) | (vmin > F.col("hi"))
    return (
        preds.crossJoin(F.broadcast(fstats))
        .groupBy("layout", "dim", "pred_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum(skipped.cast("long")).cast("long").alias("files_skipped"),
            F.sum(F.when(skipped, F.lit(0)).otherwise(F.col("nrows")))
            .cast("long")
            .alias("rows_scanned"),
        )
        .select(
            "layout",
            "dim",
            F.col("pred_id").cast("int").alias("pred_id"),
            "lo",
            "hi",
            "files_total",
            "files_skipped",
            "rows_scanned",
        )
        .orderBy("layout", "dim", "pred_id")
    )


layout_zorder_skipping.__doc__ = layout_zorder_skipping.__doc__.format(
    files=_ZO_FILES,
    bits=_ZO_BITS,
    nb=2**_ZO_BITS,
    zspan=4**_ZO_BITS,
)




# ---------------------------------------------------------------------------
# Hilbert-curve layout vs Z-order (locality shoot-out)
# ---------------------------------------------------------------------------


_HIL_FILES = 48  # deliberately NOT a power of 4 — see the docstring


def _hilbert_stage(s: int) -> tuple[str, str, str]:
    """One unrolled step of the standard Hilbert xy->d convert loop
    (Wikipedia formulation) at scale s, over columns (hx, hy, acc):
    returns (acc', hx', hy') expression text.  (3*rx) XOR ry is
    rewritten as the equivalent CASE (rx=1 -> 3-ry, else ry) so only
    +,-,*,&,CASE appear — portable, exact integers in both engines;
    validated exhaustively against the reference loop for all 65,536
    8-bit coordinate pairs (test_hilbert_matches_reference_loop)."""
    rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
    acc = f"acc + {s} * {s} * (CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END)"
    nx = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {s} - 1 - hy ELSE hy END) ELSE hx END"
    )
    ny = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {s} - 1 - hx ELSE hx END) ELSE hy END"
    )
    return acc, nx, ny


def _hilbert_cte_chain(src: str) -> str:
    """The full unrolled transform as a chained-CTE suffix: h0 seeds
    (hx, hy, acc) from (xb, yb, 0); h{i+1} applies stage i; the final
    CTE exposes d = acc."""
    parts = [
        f"h0 AS (SELECT x, y, xb AS hx, yb AS hy,"
        f" CAST(0 AS BIGINT) AS acc FROM {src})"
    ]
    scales = [2**b for b in range(_ZO_BITS - 1, -1, -1)]
    for i, s in enumerate(scales):
        acc, nx, ny = _hilbert_stage(s)
        parts.append(
            f"h{i + 1} AS (SELECT x, y, {nx} AS hx, {ny} AS hy,"
            f" {acc} AS acc FROM h{i})"
        )
    return ",\n    ".join(parts)


@register(
    "layout_hilbert_skipping",
    f"""
    WITH mx AS (SELECT CAST(MAX(l_orderkey) AS BIGINT) AS mo,
                       CAST(MAX(l_partkey) AS BIGINT) AS mp FROM lineitem),
    pts AS (
      SELECT CAST(l_orderkey AS BIGINT) AS x, CAST(l_partkey AS BIGINT) AS y,
             CAST(l_orderkey AS BIGINT) * {2 ** _ZO_BITS} // (mo + 1) AS xb,
             CAST(l_partkey AS BIGINT) * {2 ** _ZO_BITS} // (mp + 1) AS yb
      FROM lineitem CROSS JOIN mx),
    {_hilbert_cte_chain('pts')},
    zed AS (SELECT x, y, xb, ({_ZO_Z_EXPR}) AS z FROM pts),
    assigned AS (
      SELECT x, y, 'hilbert' AS layout,
             CAST(acc * {_HIL_FILES} // {4 ** _ZO_BITS} AS BIGINT) AS file_id
      FROM h{_ZO_BITS}
      UNION ALL
      SELECT x, y, 'zorder',
             CAST(z * {_HIL_FILES} // {4 ** _ZO_BITS} AS BIGINT) FROM zed),
    fstats AS (
      SELECT layout, file_id, MIN(x) AS xmin, MAX(x) AS xmax,
             MIN(y) AS ymin, MAX(y) AS ymax, COUNT(*) AS nrows
      FROM assigned GROUP BY layout, file_id),
    preds AS (
      SELECT 'x' AS dim, 0 AS pred_id, CAST(0 AS BIGINT) AS lo,
             mo // 8 AS hi FROM mx
      UNION ALL SELECT 'x', 1, mo // 2, mo // 2 + mo // 16 FROM mx
      UNION ALL SELECT 'y', 0, CAST(0 AS BIGINT), mp // 8 FROM mx
      UNION ALL SELECT 'y', 1, mp // 2, mp // 2 + mp // 16 FROM mx)
    SELECT layout, dim, CAST(pred_id AS INT) AS pred_id, lo, hi,
           CAST(COUNT(*) AS BIGINT) AS files_total,
           CAST(SUM(CASE WHEN (CASE WHEN dim = 'x' THEN xmax ELSE ymax END)
                              < lo
                           OR (CASE WHEN dim = 'x' THEN xmin ELSE ymin END)
                              > hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
           CAST(SUM(CASE WHEN (CASE WHEN dim = 'x' THEN xmax ELSE ymax END)
                              < lo
                           OR (CASE WHEN dim = 'x' THEN xmin ELSE ymin END)
                              > hi
                    THEN 0 ELSE nrows END) AS BIGINT) AS rows_scanned
    FROM preds CROSS JOIN fstats
    GROUP BY layout, dim, pred_id, lo, hi
    ORDER BY layout, dim, pred_id
    """,
    "pipeline",
    "sink",
)
def layout_hilbert_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curve shoot-out completing the layout-audit family: the
    SAME {files}-file export keyed by the HILBERT index vs the Morton
    (Z-order) index over {bits}-bit (l_orderkey, l_partkey)
    coordinates, scored by the identical per-file min/max zone-map
    audit as layout_zorder_skipping (which carries the linear
    baseline).  Hilbert visits every cell of each quadrant before
    leaving it (no Z-shaped diagonal jumps), so its equal-width file
    ranges have tighter bounding boxes — the reason Delta/Iceberg
    offer Hilbert clustering as the premium alternative to ZORDER.

    The file count is {files} — deliberately NOT a power of 4.  Both
    curves are quadrant-recursive, so at 4^k files every aligned
    curve range is EXACTLY the same square tile and the two layouts
    tie identically (measured: all 64-file stats equal, and
    test_hilbert_power_of_4_tie pins that theorem); the locality
    difference only exists where file ranges straddle quadrant
    boundaries.  At {files} files, measured sf0.01: Hilbert scans
    51,063 rows vs Z-order 57,374 across the four probe predicates —
    11% less I/O from continuity alone.

    The transform is the standard xy->d convert loop UNROLLED into
    {bits} chained integer stages (only +,-,*,&,CASE — exact and
    portable; (3*rx) XOR ry rewritten as its CASE equivalent), and
    test_hilbert_matches_reference_loop validates the in-engine chain
    against the canonical Python loop for ALL 65,536 coordinate
    pairs, so the SQL-generated transform cannot silently drift from
    the published algorithm.

    Scale posture: identical to layout_zorder_skipping — one scan,
    {bits} narrow map stages (no shuffle until the file-grain
    group-by), 2x exploded file assignment, bounded 4 x {files}x2
    audit join.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    mo, mp = li.agg(
        F.max("l_orderkey").cast("long"), F.max("l_partkey").cast("long")
    ).collect()[0]
    nb = 2**_ZO_BITS
    pts = li.select(
        F.col("l_orderkey").cast("long").alias("x"),
        F.col("l_partkey").cast("long").alias("y"),
        F.expr(f"CAST(l_orderkey AS BIGINT) * {nb} DIV {mo + 1}").alias("xb"),
        F.expr(f"CAST(l_partkey AS BIGINT) * {nb} DIV {mp + 1}").alias("yb"),
    )
    # Fan-out repartition MEASURED AND REJECTED here (r14), as in
    # layout_zorder_skipping: 2.02 -> 2.36 s — even the unrolled
    # 16-stage integer chain is codegen-cheap next to a 600k-row
    # exchange.  See OPTIMIZATION_r14.md.
    h = pts.select(
        "x", "y", "xb", "yb",
        F.col("xb").alias("hx"),
        F.col("yb").alias("hy"),
        F.lit(0).cast("long").alias("acc"),
    )
    for s in (2**b for b in range(_ZO_BITS - 1, -1, -1)):
        acc, nx, ny = _hilbert_stage(s)
        h = h.select(
            "x", "y", "xb", "yb",
            F.expr(nx).alias("hx"),
            F.expr(ny).alias("hy"),
            F.expr(acc).alias("acc"),
        )
    assigned = h.withColumn("z", F.expr(_ZO_Z_EXPR)).select(
        "x",
        "y",
        F.explode(
            F.array(
                F.struct(
                    F.lit("hilbert").alias("layout"),
                    F.expr(f"acc * {_HIL_FILES} DIV {nb * nb}")
                    .cast("long")
                    .alias("file_id"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"z * {_HIL_FILES} DIV {nb * nb}")
                    .cast("long")
                    .alias("file_id"),
                ),
            )
        ).alias("a"),
    ).select("x", "y", "a.layout", "a.file_id")
    return _layout_audit(spark, assigned, mo, mp)


layout_hilbert_skipping.__doc__ = layout_hilbert_skipping.__doc__.format(
    files=_HIL_FILES, bits=_ZO_BITS
)


# ---------------------------------------------------------------------------
# Takedown / right-to-be-forgotten propagation audit
# ---------------------------------------------------------------------------

# The takedown list: a deterministic pseudo-request set (every 37th
# doc); production reads this from a legal-hold table.
_TD_PRED = "doc_id % 37 = 0"


@register(
    "takedown_propagation",
    f"""
    WITH td AS (SELECT doc_id FROM documents WHERE {_TD_PRED}),
    chunks AS (
      SELECT d.doc_id,
             CAST(CEIL(CAST(len(string_split(text, ' ')) AS DOUBLE) / 64)
                  AS BIGINT) AS n_chunks
      FROM documents d),
    audit AS (
      SELECT 'documents' AS tbl,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_before,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM td) AS n_removed,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM documents d
              WHERE NOT EXISTS (SELECT 1 FROM td WHERE td.doc_id = d.doc_id))
               AS n_after
      UNION ALL
      SELECT 'embeddings',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings e
              WHERE EXISTS (SELECT 1 FROM td WHERE td.doc_id = e.vec_id)),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings e
              WHERE NOT EXISTS (SELECT 1 FROM td WHERE td.doc_id = e.vec_id))
      UNION ALL
      SELECT 'doc_chunks',
             (SELECT CAST(SUM(n_chunks) AS BIGINT) FROM chunks),
             (SELECT CAST(SUM(n_chunks) AS BIGINT) FROM chunks c
              WHERE EXISTS (SELECT 1 FROM td WHERE td.doc_id = c.doc_id)),
             (SELECT CAST(SUM(n_chunks) AS BIGINT) FROM chunks c
              WHERE NOT EXISTS (SELECT 1 FROM td WHERE td.doc_id = c.doc_id)))
    SELECT tbl, n_before, n_removed, n_after,
           CAST(CASE WHEN n_before - n_removed = n_after
                THEN 1 ELSE 0 END AS INT) AS balanced
    FROM audit
    ORDER BY tbl
    """,
    "pipeline",
)
def takedown_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown / right-to-be-forgotten propagation audit: given a
    removal list (here every 37th doc_id, standing in for a legal-hold
    table), cascade the deletion through the base corpus AND every
    derived representation — embeddings (vec_id keys the same corpus)
    and the chunk inventory (`doc_chunking`'s 64-word chunk grain) —
    and emit the per-table reconciliation a compliance review signs
    off on: rows before, rows removed, rows after, and the
    balance check n_before - n_removed = n_after.

    The removal itself is the broadcast ANTI-join (takedown lists are
    tiny next to the corpus — the decontaminate_benchmark shape); the
    audit runs both the anti side (survivors) and the semi side
    (removed) so a dangling derived row — an embedding whose document
    was purged but which survived — cannot hide: it would unbalance
    its table's row.

    Scale posture: one broadcast semi/anti join per table, each a
    single scan with map-side-combinable counts; no corpus-grain
    shuffle at all.  At 100 TB the same plan drives the actual MERGE
    DELETE per table (`merge_upsert_events` / `scd2_user_state` are
    the write-side machinery); this operator is the verification read.

    Reference has no governance operators (SURVEY §2c extension).
    """
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    td = d.filter(F.expr(_TD_PRED)).select("doc_id")
    chunks = d.select(
        "doc_id",
        F.expr(
            "CAST(CEIL(CAST(size(split(text, ' ')) AS DOUBLE) / 64)"
            " AS BIGINT)"
        ).alias("n_chunks"),
    )

    def audit_row(tbl, full, key, measure):
        kept = full.join(
            F.broadcast(td), full[key] == td["doc_id"], "left_anti"
        )
        removed = full.join(
            F.broadcast(td), full[key] == td["doc_id"], "left_semi"
        )
        return (
            full.agg(measure(full).alias("n_before"))
            .crossJoin(removed.agg(measure(removed).alias("n_removed")))
            .crossJoin(kept.agg(measure(kept).alias("n_after")))
            .select(
                F.lit(tbl).alias("tbl"), "n_before", "n_removed", "n_after"
            )
        )

    count = lambda df: F.count(F.lit(1)).cast("long")  # noqa: E731
    sum_chunks = lambda df: F.sum("n_chunks").cast("long")  # noqa: E731
    rows = [
        audit_row("documents", d, "doc_id", count),
        audit_row("embeddings", e, "vec_id", count),
        audit_row("doc_chunks", chunks, "doc_id", sum_chunks),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select(
        "tbl",
        "n_before",
        "n_removed",
        "n_after",
        (F.col("n_before") - F.col("n_removed") == F.col("n_after"))
        .cast("int")
        .alias("balanced"),
    ).orderBy("tbl")


# ---------------------------------------------------------------------------
# Train/val/test split leakage audit (cross-split contamination)
# ---------------------------------------------------------------------------

_SPLIT_SEG_W = 16  # contamination grain: 16-word segments (the
# dedup_paragraph_keepfirst convention — the fixture has no newline
# paragraphs, and CCNet-style leakage checks run at paragraph grain)
_SPLIT_HASH = "md5(concat('split:', CAST(doc_id AS {str_t})))"


def _split_case(engine: str) -> str:
    h = _SPLIT_HASH.format(str_t="VARCHAR" if engine == "duck" else "STRING")
    b = (
        f"('0x' || substr({h}, 1, 8))::BIGINT % 10"
        if engine == "duck"
        else f"CAST(conv(substr({h}, 1, 8), 16, 10) AS BIGINT) % 10"
    )
    return (
        f"CASE WHEN {b} < 8 THEN 'train' WHEN {b} = 8 THEN 'val'"
        " ELSE 'test' END"
    )


@register(
    "split_leakage_audit",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             {_split_case('duck')} AS split
      FROM documents),
    segs AS (
      SELECT DISTINCT doc_id, split,
             md5(array_to_string(
               list_slice(ws, i * {_SPLIT_SEG_W} + 1,
                          i * {_SPLIT_SEG_W} + {_SPLIT_SEG_W}), ' ')) AS seg
      FROM (SELECT doc_id, split, ws,
                   unnest(generate_series(0,
                     CAST(ceil(len(ws) / {_SPLIT_SEG_W}.0) AS INT) - 1)) AS i
            FROM d)),
    tr AS (SELECT DISTINCT seg FROM segs WHERE split = 'train'),
    docs AS (SELECT split, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
             FROM d GROUP BY split),
    cont AS (
      SELECT s.split, CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS n_cont,
             CAST(COUNT(DISTINCT s.seg) AS BIGINT) AS n_shared
      FROM segs s JOIN tr USING (seg)
      WHERE s.split <> 'train' GROUP BY s.split)
    SELECT d.split AS split, d.n_docs AS n_docs,
           CAST(COALESCE(c.n_cont, 0) AS BIGINT) AS n_contaminated,
           CAST(1000000 * COALESCE(c.n_cont, 0) // d.n_docs AS BIGINT)
             AS contaminated_ppm,
           CAST(COALESCE(c.n_shared, 0) AS BIGINT) AS n_shared_segments
    FROM docs d LEFT JOIN cont c ON d.split = c.split
    ORDER BY d.split
    """,
    "pipeline",
    "governance",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: assign every document to
    train/val/test by salted hash (80/10/10), then count the val/test
    documents sharing at least one exact {w}-word segment with ANY
    train document — the leakage an eval number silently inflates on
    (the within-corpus counterpart of decontaminate_benchmark, which
    checks against an external eval suite).  Measured sf0.01: 7/48
    val and 4/60 test docs carry train segments — the fixture's
    near-dup structure crosses the split boundary, exactly what this
    audit exists to catch before training.

    Scale posture: contamination is computed at SEGMENT grain — one
    distinct (doc, split, segment-hash) pass, a semi-join against the
    train segment set on the hash (no doc x doc pairs anywhere), and
    split-grain readouts.  At 100 TB the train-segment side is the
    big one; the join is a plain equi-join on the segment hash that
    AQE can run as a shuffled or broadcast join by measured size.

    Reference has no split tooling (SURVEY §2c extension; completes
    the governance family with kanonymity_audit and
    takedown_propagation).
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        F.expr(_split_case("spark")).alias("split"),
    )
    segs = d.select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(ws) /"
                f" {_SPLIT_SEG_W}.0) AS INT) - 1),"
                f" i -> md5(array_join(slice(ws, i * {_SPLIT_SEG_W} + 1,"
                f" {_SPLIT_SEG_W}), ' ')))"
            )
        ).alias("seg"),
    ).distinct()
    tr = segs.filter(F.col("split") == "train").select("seg").distinct()
    docs = d.groupBy("split").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    cont = (
        segs.filter(F.col("split") != "train")
        .join(tr, "seg")
        .groupBy("split")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_cont"),
            F.countDistinct("seg").cast("long").alias("n_shared"),
        )
    )
    return (
        docs.join(F.broadcast(cont), "split", "left")
        .select(
            "split",
            "n_docs",
            F.coalesce("n_cont", F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            F.expr(
                "CAST(1000000 * COALESCE(n_cont, 0) DIV n_docs AS BIGINT)"
            ).alias("contaminated_ppm"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias(
                "n_shared_segments"
            ),
        )
        .orderBy("split")
    )


split_leakage_audit.__doc__ = split_leakage_audit.__doc__.format(
    w=_SPLIT_SEG_W
)


# ---------------------------------------------------------------------------
# ANALYZE-style exact column statistics profile
# ---------------------------------------------------------------------------

# (column, kind): int -> exact min/max; money -> 2-dp DOUBLE profiled
# in exact cents (round(v*100) is within an ulp of an integer for
# these generated values; round() is identical IEEE in both engines);
# str -> ndv/null/total length; ts -> ndv/null only (min/max of a
# timestamp would inherit session-timezone interpretation).
_PROFILE_COLS = (
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "money"),
    ("l_extendedprice", "money"),
    ("l_discount", "money"),
    ("l_tax", "money"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)


def _profile_facets(c: str, kind: str) -> dict[str, str]:
    """Per-column facet expressions (engine-portable SQL)."""
    cents = f"CAST(round({c} * 100) AS BIGINT)"
    return {
        "ndv": f"COUNT(DISTINCT {cents if kind == 'money' else c})",
        "n_nulls": f"COUNT(*) - COUNT({c})",
        "min_int": (
            f"MIN(CAST({c} AS BIGINT))" if kind == "int"
            else f"MIN({cents})" if kind == "money"
            else "CAST(NULL AS BIGINT)"
        ),
        "max_int": (
            f"MAX(CAST({c} AS BIGINT))" if kind == "int"
            else f"MAX({cents})" if kind == "money"
            else "CAST(NULL AS BIGINT)"
        ),
        "sum_strlen": (
            f"SUM(CAST(length({c}) AS BIGINT))" if kind == "str"
            else "CAST(NULL AS BIGINT)"
        ),
    }


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        f = _profile_facets(c, kind)
        parts.append(
            f"""
      SELECT '{c}' AS col_name,
             CAST({f['ndv']} AS BIGINT) AS ndv,
             CAST({f['n_nulls']} AS BIGINT) AS n_nulls,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST({f['min_int']} AS BIGINT) AS min_int,
             CAST({f['max_int']} AS BIGINT) AS max_int,
             CAST({f['sum_strlen']} AS BIGINT) AS sum_strlen
      FROM lineitem"""
        )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(parts)
        + ") t ORDER BY col_name"
    )


@register("analyze_table_stats", _profile_oracle(), "pipeline", "ops")
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANALYZE-style statistics profile of the lineitem table —
    per column: exact distinct count, null count, row count, exact
    integer min/max (raw for keys, cents for the 2-dp money columns),
    and total string length — the statistics collection every
    cost-based optimizer, zone-map layout decision, and dictionary-
    encoding choice starts from, computed exactly rather than via the
    HLL sketches the approx family covers (sketch_hll_rollup_merge is
    the approximate twin; this is the truth it converges to).

    Scale posture: ONE pass — all 11 columns' facets ride a single
    aggregate (Spark plans the multi-distinct via Expand, an 11-way
    row replication with map-side partial aggregation — the same
    shape a melt would hand-build), then the 1-row result reshapes to
    column-grain rows with a stack of literals.  The oracle is 11
    independent single-column scans — a genuinely different
    construction cross-checked by the hash.  Timestamp min/max is
    deliberately NOT profiled (session-timezone interpretation would
    differ across engines); its ndv/nulls are exact.

    Reference has no statistics collection (SURVEY §2c extension).
    """
    li = load(spark, sf_dir, "lineitem")
    # Spread the 11-way multi-distinct Expand off the input splits
    # (r14, guide §2.5 input skew): Spark plans the multi-distinct as
    # an 11x row replication + partial aggregate, and on the
    # single-row-group fixture that entire blow-up ran in ONE task.
    # MEASURED (same-session interleaved A/B, min-of-2, both decades):
    # sf0.1 7.75 -> 3.24 s, sf1 13.8 -> 7.9 s — unlike the rejected
    # layout/multimodal fan-outs, the per-row work here (11x Expand +
    # wide distinct hash state) dwarfs one row-grain exchange of the
    # table.
    li = li.repartition(
        spark.sparkContext.defaultParallelism, F.col("l_orderkey")
    )
    aggs = []
    for c, kind in _PROFILE_COLS:
        f = _profile_facets(c, kind)
        for facet, expr in f.items():
            aggs.append(F.expr(expr).cast("long").alias(f"{facet}__{c}"))
        aggs.append(F.count(F.lit(1)).cast("long").alias(f"n_rows__{c}"))
    one = li.agg(*aggs)
    stack_args = []
    for c, _ in _PROFILE_COLS:
        stack_args.append(
            f"'{c}', ndv__{c}, n_nulls__{c}, n_rows__{c},"
            f" min_int__{c}, max_int__{c}, sum_strlen__{c}"
        )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)})"
        " AS (col_name, ndv, n_nulls, n_rows, min_int, max_int, sum_strlen)"
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Padding-waste audit: arrival-order vs length-sorted batching
# ---------------------------------------------------------------------------

_PW_B = 8  # batch size (sequences per batch)


@register(
    "padding_waste_audit",
    f"""
    WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS L
               FROM documents),
    a AS (
      SELECT 'arrival' AS strategy, doc_id // {_PW_B} AS batch, L FROM d
      UNION ALL
      SELECT 'length_sorted',
             (ROW_NUMBER() OVER (ORDER BY L, doc_id) - 1) // {_PW_B}, L
      FROM d),
    b AS (SELECT strategy, batch, COUNT(*) AS n, MAX(L) AS mx,
                 SUM(L) AS tr
          FROM a GROUP BY strategy, batch)
    SELECT strategy,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(tr) AS BIGINT) AS tokens_real,
           CAST(SUM(n * mx) AS BIGINT) AS tokens_padded,
           CAST(1000000 * (SUM(n * mx) - SUM(tr)) // SUM(n * mx)
                AS BIGINT) AS waste_ppm
    FROM b GROUP BY strategy
    ORDER BY strategy
    """,
    "pipeline",
    "ops",
)
def padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What length-sorted batching is worth, measured: pack documents
    into {b}-sequence training batches under (a) ARRIVAL order
    (batches are doc_id ranges — what a naive loader does) and (b)
    LENGTH-SORTED order, and compare the padded-token bill (every
    batch pads to its own max length).  sf0.01: 38.0% of padded
    tokens are waste under arrival order vs 1.1% sorted — the ~1.6x
    compute the sorted loader returns for free.  All exact integers.

    The length-sorted GLOBAL rank is computed without a corpus-sized
    window: a length-grain count table (bounded by the length DOMAIN)
    carries cumulative offsets, and a per-length row_number adds the
    within-group position — the two-level prefix-sum machinery of
    eval_auc_rank / max_concurrency_sweep.  The oracle uses the
    direct global ROW_NUMBER — two constructions, cross-checked.

    Scale posture: one scan; windows over the length-grain table and
    within length partitions only; batch-grain (corpus/{b}) and
    strategy-grain aggregates after that.

    Reference has no training-loader tooling (SURVEY §2c extension;
    complements token_budget_packing, which packs by token budget —
    this one audits the padding bill of fixed-size batches).
    """
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("L")
    )
    arrival = d.select(
        F.lit("arrival").alias("strategy"),
        F.expr(f"doc_id DIV {_PW_B}").alias("batch"),
        "L",
    )
    lg = (
        d.groupBy("L")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("cnt").over(
                    W.orderBy("L").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("L", "cum_before")
    )
    rn = F.row_number().over(W.partitionBy("L").orderBy("doc_id"))
    sorted_ = (
        d.join(F.broadcast(lg), "L")
        .withColumn("rank", F.col("cum_before") + rn)
        .select(
            F.lit("length_sorted").alias("strategy"),
            F.expr(f"(rank - 1) DIV {_PW_B}").alias("batch"),
            "L",
        )
    )
    b = (
        arrival.unionByName(sorted_)
        .groupBy("strategy", "batch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("L").alias("mx"),
            F.sum("L").alias("tr"),
        )
    )
    return (
        b.groupBy("strategy")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("tr").cast("long").alias("tokens_real"),
            F.sum(F.col("n") * F.col("mx")).cast("long").alias(
                "tokens_padded"
            ),
        )
        .select(
            "strategy",
            "n_batches",
            "tokens_real",
            "tokens_padded",
            F.expr(
                "CAST(1000000 * (tokens_padded - tokens_real)"
                " DIV tokens_padded AS BIGINT)"
            ).alias("waste_ppm"),
        )
        .orderBy("strategy")
    )


padding_waste_audit.__doc__ = padding_waste_audit.__doc__.format(b=_PW_B)


# ---------------------------------------------------------------------------
# Export manifest with order-invariant shard checksums
# ---------------------------------------------------------------------------

_MC_SHARDS = 8
_MC_MOD = 1 << 40  # row-hash width; SUM carried in decimal, emitted mod 2^40


@register(
    "export_manifest_checksums",
    f"""
    WITH rows_h AS (
      SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
               % {_MC_SHARDS} AS shard,
             o_orderkey,
             ('0x' || substr(md5(
                CAST(o_orderkey AS VARCHAR) || '|' ||
                CAST(o_custkey AS VARCHAR) || '|' ||
                o_orderstatus || '|' ||
                CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             ), 1, 10))::BIGINT AS h
      FROM orders)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h) % {_MC_MOD} AS BIGINT) AS checksum,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM rows_h GROUP BY shard
    ORDER BY shard
    """,
    "pipeline_ops",
    "export",
)
def export_manifest_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export manifest for an {s}-shard orders extract: per shard, row
    count, ORDER-INVARIANT content checksum (sum of 40-bit md5 row
    hashes mod 2^40 — addition commutes, so the checksum is stable
    under any partitioning, task order, or re-read order, which a
    concatenation- or first/last-based digest is not), and the key
    range.  This is the standard exactly-once verification artifact
    for a distributed export: the consumer re-derives the same
    manifest from what it received and compares — any dropped,
    duplicated, or bit-flipped row moves the count or the checksum.
    The row hash covers key, custkey, status, and exact integer
    cents (doubles enter only via the floor(x*100) cents contract).

    Scale posture: one scan, everything map-side-combinable (COUNT,
    MIN, MAX, and a decimal SUM that tolerates any row order by
    construction); shard assignment is in-row hash arithmetic — at
    100 TB this is the cheapest possible full-table pass, and the
    sum rides the same decimal-exact aggregation contract as
    functions/determinism.dsum (int64 SUM would overflow past ~2^23
    rows per shard at 2^40 bits/row; decimal(25,0) does not).

    Reference has no export verification (SURVEY §2c extension;
    completes the export family: sized/zoned writes -> skipping
    audits -> content manifest).
    """
    rows_h = load(spark, sf_dir, "orders").select(
        F.expr(
            f"CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT) % {_MC_SHARDS}"
        ).alias("shard"),
        "o_orderkey",
        F.expr(
            "CAST(conv(substr(md5(concat_ws('|',"
            " CAST(o_orderkey AS STRING),"
            " CAST(o_custkey AS STRING),"
            " o_orderstatus,"
            " CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING)"
            ")), 1, 10), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    return (
        rows_h.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.sum(F.col("h").cast("decimal(25,0)")) % _MC_MOD)
            .cast("long")
            .alias("checksum"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
        .select(
            F.col("shard").cast("long"),
            "n_rows",
            "checksum",
            "min_key",
            "max_key",
        )
        .orderBy("shard")
    )


export_manifest_checksums.__doc__ = export_manifest_checksums.__doc__.format(
    s=_MC_SHARDS
)


# ---------------------------------------------------------------------------
# Columnar encoding advisor (runs / cardinality in physical order)
# ---------------------------------------------------------------------------

_EA_BUCKET_W = 64  # orderkeys per shard of the two-level run count
_EA_RLE_MIN_PPM = 3_000_000  # avg run >= 3 values -> RLE
_EA_DICT_MAX_PPM = 20_000  # <= 2% distinct -> dictionary
_EA_COLS = (
    ("l_orderkey", "CAST(l_orderkey AS BIGINT)"),
    ("l_quantity", "CAST(l_quantity AS BIGINT)"),
    ("l_returnflag", "('0x' || substr(md5(l_returnflag), 1, 8))::BIGINT"),
    ("l_extendedprice", "CAST(floor(l_extendedprice * 100) AS BIGINT)"),
)
_EA_COLS_SPARK = (
    ("l_orderkey", "CAST(l_orderkey AS BIGINT)"),
    ("l_quantity", "CAST(l_quantity AS BIGINT)"),
    (
        "l_returnflag",
        "CAST(conv(substr(md5(l_returnflag), 1, 8), 16, 10) AS BIGINT)",
    ),
    ("l_extendedprice", "CAST(floor(l_extendedprice * 100) AS BIGINT)"),
)


def _ea_reco_case(avg: str, dist: str) -> str:
    return (
        f"CASE WHEN {avg} >= {_EA_RLE_MIN_PPM} THEN 'RLE' "
        f"WHEN {dist} <= {_EA_DICT_MAX_PPM} THEN 'DICT' "
        f"ELSE 'PLAIN' END"
    )


def _ea_oracle() -> str:
    # Independent formulation: ONE monolithic lag window over the full
    # physical order per column — no bucketing, no boundary stitching.
    branches = []
    for name, expr in _EA_COLS:
        branches.append(
            f"""
    SELECT '{name}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
           CAST(1 + SUM(tr) AS BIGINT) AS runs
    FROM (SELECT v, CASE WHEN v != lag(v) OVER (ORDER BY rn)
                         THEN 1 ELSE 0 END AS tr
          FROM (SELECT {expr} AS v,
                       row_number() OVER (ORDER BY l_orderkey,
                                          l_linenumber) AS rn
                FROM lineitem))"""
        )
    union = "\n    UNION ALL\n".join(branches)
    return f"""
    WITH per_col AS ({union})
    SELECT column_name, n, n_distinct, runs,
           CAST(1000000 * n // runs AS BIGINT) AS avg_run_len_ppm,
           CAST(1000000 * n_distinct // n AS BIGINT) AS distinct_ppm,
           {_ea_reco_case("1000000 * n // runs",
                          "1000000 * n_distinct // n")} AS encoding
    FROM per_col ORDER BY column_name
    """


@register("encoding_advisor_stats", _ea_oracle(), "pipeline_ops", "ops")
def encoding_advisor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar encoding advisor: for each audited lineitem column,
    exact run count and distinct count in the table's PHYSICAL order
    (l_orderkey, l_linenumber), and the encoding a Parquet writer
    should pick — RLE when the average run covers >= 3 values, DICT
    when <= 2% of values are distinct, else PLAIN.  sf0.01:
    l_orderkey avg run 4.07 (RLE — lines cluster per order),
    l_returnflag 3 distinct (DICT), l_quantity 50 distinct (DICT),
    l_extendedprice ~unique (PLAIN) — all three recommendations
    exercised.

    Run counting never sorts the corpus: rows shard into
    {w}-orderkey buckets, ONE within-bucket window (ordered by the
    physical key, bounded by bucket occupancy) computes lags for all
    four columns at once, and bucket-boundary transitions stitch via
    the BUCKET-grain first/last table — itself two-level sharded
    (the max_concurrency_sweep sharded-prefix-sum pattern): buckets
    lag within {w}-bucket superbuckets in parallel, and only the
    superbucket-grain carry table (corpus/{w}^2 rows, broadcast)
    crosses an unpartitioned window.  The oracle is the
    independent monolithic formulation: one global lag window per
    column, no bucketing, no stitching — a boundary bug cannot agree
    with it by construction.  Strings compare via their 32-bit md5
    (equality-faithful modulo md5 collisions; exact for this audit's
    cardinalities), doubles via exact cents.

    Reference has no storage tooling (SURVEY §2c extension; joins
    analyze_table_stats / histogram_equidepth_audit in the
    CBO/storage-ops family).
    """
    exprs = [F.expr(e).alias(f"v_{n}") for n, e in _EA_COLS_SPARK]
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *exprs
    )
    li = li.withColumn(
        "bucket", F.expr(f"CAST(l_orderkey DIV {_EA_BUCKET_W} AS BIGINT)")
    )
    w = W.partitionBy("bucket").orderBy("l_orderkey", "l_linenumber")
    names = [n for n, _ in _EA_COLS_SPARK]
    with_tr = li.select(
        "bucket",
        *[f"v_{n}" for n in names],
        F.row_number().over(w).alias("rn"),
        *[
            F.when(
                F.lag(f"v_{n}").over(w).isNotNull()
                & (F.col(f"v_{n}") != F.lag(f"v_{n}").over(w)),
                1,
            )
            .otherwise(0)
            .alias(f"tr_{n}")
            for n in names
        ],
    )
    # ONE bucket-grain aggregate yields transitions AND the boundary
    # values (r14, guide §2.4): first/last per bucket are min_by /
    # max_by over the window's row_number, so the corpus-wide window
    # executes once — the previous three consumers (within / firsts /
    # lasts, the latter needing an extra COUNT() window for the
    # last-row filter) each re-planned their own copy of it.
    # Bucket-grain result shared by the total and the boundary stitch
    # via one lazy localCheckpoint (corpus/W rows — bucket grain, never
    # corpus grain), so the two consumers don't each re-run the window.
    per_bucket = with_tr.groupBy("bucket").agg(
        *[F.sum(f"tr_{n}").alias(f"tr_{n}") for n in names],
        *[F.min_by(f"v_{n}", "rn").alias(f"first_{n}") for n in names],
        *[F.max_by(f"v_{n}", "rn").alias(f"last_{n}") for n in names],
    ).localCheckpoint(eager=False)
    within = per_bucket.select(
        "bucket", *[f"tr_{n}" for n in names]
    )
    # Bucket-boundary stitch, itself two-level sharded: buckets group
    # into superbuckets; the within-superbucket lag runs partitioned
    # (parallel), and only the SUPERBUCKET-grain carry table — one row
    # per superbucket, corpus/{W^2} — sees an unpartitioned window.
    # The first bucket of each superbucket takes its predecessor from
    # the previous superbucket's last bucket via that broadcast carry.
    fl = per_bucket.withColumn(
        "sb", F.expr(f"CAST(bucket DIV {_EA_BUCKET_W} AS BIGINT)")
    )
    w1 = W.partitionBy("sb").orderBy("bucket")
    w2 = W.orderBy("sb")
    carry = F.broadcast(
        fl.groupBy("sb")
        .agg(
            *[
                F.max_by(f"last_{n}", "bucket").alias(f"slast_{n}")
                for n in names
            ]
        )
        .select(
            "sb",
            *[
                F.lag(f"slast_{n}").over(w2).alias(f"carry_{n}")
                for n in names
            ],
        )
    )
    bb = (
        fl.join(carry, "sb")
        .select(
            *[
                F.when(
                    F.coalesce(
                        F.lag(f"last_{n}").over(w1), F.col(f"carry_{n}")
                    ).isNotNull()
                    & (
                        F.col(f"first_{n}")
                        != F.coalesce(
                            F.lag(f"last_{n}").over(w1),
                            F.col(f"carry_{n}"),
                        )
                    ),
                    1,
                )
                .otherwise(0)
                .alias(f"bt_{n}")
                for n in names
            ],
        )
        .groupBy()
        .agg(*[F.sum(f"bt_{n}").alias(f"bt_{n}") for n in names])
    )
    tot = within.groupBy().agg(
        *[F.sum(f"tr_{n}").alias(f"tr_{n}") for n in names]
    )
    # Row-grain repartition off the single-split scan spreads the
    # 5-way distinct Expand across cores (the analyze_table_stats
    # pattern, r14) — without it the multi-distinct partial aggregate
    # ran as one task.
    nd = (
        li.repartition(spark.sparkContext.defaultParallelism)
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                F.countDistinct(f"v_{n}").cast("long").alias(f"nd_{n}")
                for n in names
            ],
        )
    )
    stats = nd.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(bb))
    stack_args = ", ".join(
        f"'{n}', nd_{n}, CAST(1 + tr_{n} + bt_{n} AS BIGINT)"
        for n in names
    )
    per_col = stats.selectExpr(
        "n",
        f"stack({len(names)}, {stack_args})"
        " AS (column_name, n_distinct, runs)",
    )
    return per_col.select(
        "column_name",
        F.col("n").cast("long"),
        F.col("n_distinct").cast("long"),
        "runs",
        F.expr("CAST(1000000 * n DIV runs AS BIGINT)").alias(
            "avg_run_len_ppm"
        ),
        F.expr("CAST(1000000 * n_distinct DIV n AS BIGINT)").alias(
            "distinct_ppm"
        ),
        F.expr(
            _ea_reco_case(
                "1000000 * n DIV runs", "1000000 * n_distinct DIV n"
            )
        ).alias("encoding"),
    ).orderBy("column_name")


encoding_advisor_stats.__doc__ = encoding_advisor_stats.__doc__.format(
    w=_EA_BUCKET_W
)


# ---------------------------------------------------------------------------
# Incremental view maintenance: base-state + delta merge
# ---------------------------------------------------------------------------

_IVM_MOD = 10  # event_id % 10 == 0 rows arrive as the delta batch


@register(
    "ivm_delta_agg_merge",
    # Independent formulation: the oracle aggregates ALL rows directly
    # in one pass — it never splits, never merges; agreement proves
    # the incremental state+delta merge reconstructs the full view.
    f"""
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS cents_total,
           CAST(COUNT(*) FILTER (event_id % {_IVM_MOD} != 0) AS BIGINT)
             AS n_from_base,
           CAST(COUNT(*) FILTER (event_id % {_IVM_MOD} = 0) AS BIGINT)
             AS n_from_delta
    FROM events
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    "pipeline_ops",
    "ops",
)
def ivm_delta_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a distributive aggregate:
    the standing (event_type, day) count/sum view is maintained as
    BASE STATE (event_id % {m} != 0, aggregated once) merged with a
    DELTA batch (event_id % {m} == 0, aggregated separately) via a
    full-outer coalescing sum — the state-plus-delta plan that never
    re-touches base rows, which is the whole point of IVM at 100 TB
    (re-aggregating the corpus per ingest batch is the anti-pattern
    this operator replaces).  COUNT and SUM are distributive, so
    merge = add; the oracle is the genuinely independent DIRECT
    aggregation over all rows in one pass — agreement proves the
    merge reconstructs the full view exactly, per group.

    Scale posture: base and delta each aggregate map-side-combinably
    to view grain; the merge is a view-grain full-outer join (both
    sides already at group grain, co-partitioned by the same keys).
    In production the base side is a maintained table and only the
    delta aggregate + merge run per batch.

    Reference has no materialized-view tooling (SURVEY §2c
    extension; the batch counterpart to stream_foreachbatch_merge
    and merge_upsert_events).
    """
    e = load(spark, sf_dir, "events").select(
        "event_type",
        # day as a STRING: DuckDB DATE materializes as a midnight
        # datetime through the driver's pandas path and hash-mismatches
        # Spark's date32 (the retention_cohorts strftime convention).
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )

    def agg_of(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents_sum"),
        )

    base = agg_of(e.filter(F.col("event_id") % _IVM_MOD != 0)).select(
        "event_type",
        "day",
        F.col("n").alias("n_b"),
        F.col("cents_sum").alias("c_b"),
    )
    delta = agg_of(e.filter(F.col("event_id") % _IVM_MOD == 0)).select(
        "event_type",
        "day",
        F.col("n").alias("n_d"),
        F.col("cents_sum").alias("c_d"),
    )
    merged = base.join(delta, ["event_type", "day"], "full_outer").select(
        "event_type",
        "day",
        (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0)))
        .cast("long")
        .alias("n_total"),
        (F.coalesce("c_b", F.lit(0)) + F.coalesce("c_d", F.lit(0)))
        .cast("long")
        .alias("cents_total"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_from_base"),
        F.coalesce("n_d", F.lit(0)).cast("long").alias("n_from_delta"),
    )
    return merged.orderBy("event_type", "day")


ivm_delta_agg_merge.__doc__ = ivm_delta_agg_merge.__doc__.format(m=_IVM_MOD)


# ---------------------------------------------------------------------------
# Incremental zone-map refresh (semilattice merge, append-only)
# ---------------------------------------------------------------------------

_IZ_ZONE_W = 1000  # orderkeys per zone
_IZ_MOD = 10  # event of the delta batch: o_orderkey % 10 == 0


@register(
    "ivm_zonemap_refresh",
    # Independent formulation: direct one-pass zone stats over all
    # rows — never split, never merged.
    f"""
    SELECT CAST(o_orderkey // {_IZ_ZONE_W} AS BIGINT) AS zone,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(MAX(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS max_cents,
           CAST(COUNT(*) FILTER (o_orderkey % {_IZ_MOD} != 0) AS BIGINT)
             AS n_from_base,
           CAST(COUNT(*) FILTER (o_orderkey % {_IZ_MOD} = 0) AS BIGINT)
             AS n_from_delta
    FROM orders
    GROUP BY zone
    ORDER BY zone
    """,
    "pipeline_ops",
    "ops",
)
def ivm_zonemap_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental zone-map maintenance: the per-zone
    (count, min, max) skipping index is maintained as BASE STATE
    merged with a DELTA batch via a full-outer coalescing
    LEAST/GREATEST/sum — min/max zone stats never re-touch base rows
    on append.  The theory note that makes this operator more than
    ivm_delta_agg_merge's twin: COUNT/SUM are abelian-GROUP
    aggregates (invertible — retractions subtract), but MIN/MAX are
    only SEMILATTICE (mergeable, NOT invertible) — a DELETE of the
    current minimum forces a zone rescan, which is exactly why
    production zone maps (Parquet footers, Delta/Iceberg manifests)
    are maintained append-only and rewritten per-file on compaction,
    never decremented.  The oracle is the independent direct one-pass
    aggregation; agreement proves merge-reconstruction.

    Scale posture: base and delta aggregate map-side-combinably at
    zone grain; the merge joins two zone-grain tables co-partitioned
    by zone.  In production only the delta aggregate + merge run per
    ingest.

    Reference has no storage tooling (SURVEY §2c extension; the
    maintenance arm of export_zonemap_prune, and the semilattice
    counterpart to ivm_delta_agg_merge's group aggregates).
    """
    o = load(spark, sf_dir, "orders").select(
        F.expr(f"CAST(o_orderkey DIV {_IZ_ZONE_W} AS BIGINT)").alias(
            "zone"
        ),
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )

    def zstats(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("zone").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            F.min("cents").cast("long").alias(f"mn_{tag}"),
            F.max("cents").cast("long").alias(f"mx_{tag}"),
        )

    base = zstats(o.filter(F.col("o_orderkey") % _IZ_MOD != 0), "b")
    delta = zstats(o.filter(F.col("o_orderkey") % _IZ_MOD == 0), "d")
    merged = base.join(delta, "zone", "full_outer").select(
        "zone",
        (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0)))
        .cast("long")
        .alias("n_rows"),
        F.least(
            F.coalesce("mn_b", F.col("mn_d")),
            F.coalesce("mn_d", F.col("mn_b")),
        )
        .cast("long")
        .alias("min_cents"),
        F.greatest(
            F.coalesce("mx_b", F.col("mx_d")),
            F.coalesce("mx_d", F.col("mx_b")),
        )
        .cast("long")
        .alias("max_cents"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_from_base"),
        F.coalesce("n_d", F.lit(0)).cast("long").alias("n_from_delta"),
    )
    return merged.orderBy("zone")


# ---------------------------------------------------------------------------
# Compaction planning: small-file merge + zone-map overlap gain
# ---------------------------------------------------------------------------

_CP_NFILES = 24  # simulated unclustered-ingest file count
_CP_TARGET = 2048  # compaction target rows per output file
_CP_RANK_W = 4096  # orderkeys per rank shard (prefix-sum sharding)


def _compaction_oracle() -> str:
    return f"""
    WITH k AS (SELECT o_orderkey AS key FROM orders),
    g0 AS (SELECT CAST(MIN(key) AS BIGINT) AS lo,
               CAST(MAX(key) AS BIGINT) AS hi,
               CAST(COUNT(*) AS BIGINT) AS n FROM k),
    before_f AS (
      SELECT ('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))::BIGINT
               % {_CP_NFILES} AS fid,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(key) AS BIGINT) AS mn,
             CAST(MAX(key) AS BIGINT) AS mx
      FROM k GROUP BY fid),
    after_f AS (
      SELECT (rnk - 1) // {_CP_TARGET} AS fid,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(key) AS BIGINT) AS mn,
             CAST(MAX(key) AS BIGINT) AS mx
      FROM (SELECT key, row_number() OVER (ORDER BY key) AS rnk FROM k)
      GROUP BY fid),
    both_f AS (
      SELECT 'before' AS phase, * FROM before_f
      UNION ALL
      SELECT 'after', * FROM after_f)
    SELECT phase,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n_rows < {_CP_TARGET // 2} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_small_files,
           CAST(MAX(n_rows) AS BIGINT) AS max_file_rows,
           CAST(SUM(mx - mn + 1) AS BIGINT) AS sum_range_keys,
           CAST(1000000 * SUM(mx - mn + 1)
                // (ANY_VALUE(g.hi) - ANY_VALUE(g.lo) + 1) AS BIGINT)
             AS scan_amp_ppm
    FROM both_f CROSS JOIN g0 g
    GROUP BY phase
    ORDER BY phase
    """


@register(
    "compaction_plan_audit",
    _compaction_oracle(),
    "pipeline_ops",
    "ops",
)
def compaction_plan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction planning over the file manifest, quantifying BOTH
    things a table-maintenance job buys: the small-file merge (fewer,
    target-sized files — task-scheduling and footer overhead) and the
    zone-map overlap gain (sort-on-compact makes per-file key ranges
    DISJOINT, so min/max skipping starts working).  `before` is an
    unclustered ingest: {nf} hash-assigned files whose manifests
    (n_rows, min_key, max_key — the export_manifest_checksums /
    ivm_zonemap_refresh stats) each span nearly the whole key domain,
    so a point lookup's zone map prunes nothing; `after` is the
    sorted repack into {tgt}-row files with contiguous disjoint
    ranges.  scan_amp_ppm is the zone-map quality metric: expected
    files touched per uniform point lookup x 1e6 — Σ(file key range)
    / key span — {nf}M ppm before (every file matches) vs ~1M after
    (exactly one).  n_small_files counts merge INPUTS below half the
    target — the files the plan folds in.

    Scale posture: `before` is one manifest-grain aggregate off a
    single scan; `after` needs the global sort RANK, computed with
    the sharded prefix-sum pattern (token_budget_packing /
    max_concurrency_sweep): per-{w}-key shards rank locally in
    parallel and a broadcast shard-grain cumulative offset (the only
    unpartitioned window, one row per shard) shifts them — no global
    sort of the corpus is ever scheduled, which is exactly how a real
    compaction planner sizes output files from manifest stats without
    reading data.  The oracle is the independent monolithic
    formulation (one global row_number, no sharding), so a shard
    boundary bug cannot agree with it.

    Reference has no storage maintenance (SURVEY §2c extension;
    closes the export family loop: write sized/zoned -> audit
    skipping -> verify manifests -> PLAN the rewrite).
    """
    k = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key")
    )
    glob = F.broadcast(
        k.agg(
            F.min("key").cast("long").alias("lo"),
            F.max("key").cast("long").alias("hi"),
        )
    )
    before_f = k.select(
        F.expr(
            f"CAST(conv(substr(md5(CAST(key AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT) % {_CP_NFILES}"
        ).alias("fid"),
        "key",
    ).groupBy("fid")
    # Sharded global rank: local row_number per key shard + broadcast
    # cumulative shard offsets (shard-grain, one row per shard).
    sh = k.withColumn("shard", F.expr(f"key DIV {_CP_RANK_W}"))
    off = F.broadcast(
        sh.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "shard",
            F.coalesce(
                F.sum("cnt").over(
                    W.orderBy("shard").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("offset"),
        )
    )
    ranked = (
        sh.withColumn(
            "lrn",
            F.row_number().over(W.partitionBy("shard").orderBy("key")),
        )
        .join(off, "shard")
        .select("key", (F.col("offset") + F.col("lrn")).alias("rnk"))
    )
    after_f = ranked.select(
        F.expr(f"(rnk - 1) DIV {_CP_TARGET}").alias("fid"), "key"
    ).groupBy("fid")

    def fstats(g, phase: str) -> DataFrame:
        return g.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("key").cast("long").alias("mn"),
            F.max("key").cast("long").alias("mx"),
        ).withColumn("phase", F.lit(phase))

    both_f = fstats(before_f, "before").unionByName(fstats(after_f, "after"))
    return (
        both_f.crossJoin(glob)
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum(
                (F.col("n_rows") < _CP_TARGET // 2).cast("long")
            )
            .cast("long")
            .alias("n_small_files"),
            F.max("n_rows").cast("long").alias("max_file_rows"),
            F.sum(F.col("mx") - F.col("mn") + 1)
            .cast("long")
            .alias("sum_range_keys"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
        )
        .select(
            "phase",
            "n_files",
            "n_rows",
            "n_small_files",
            "max_file_rows",
            "sum_range_keys",
            F.expr(
                "CAST(1000000 * sum_range_keys DIV (hi - lo + 1)"
                " AS BIGINT)"
            ).alias("scan_amp_ppm"),
        )
        .orderBy("phase")
    )


compaction_plan_audit.__doc__ = compaction_plan_audit.__doc__.format(
    nf=_CP_NFILES, tgt=_CP_TARGET, w=_CP_RANK_W
)


# ---------------------------------------------------------------------------
# Multi-epoch shuffle decorrelation (training-order quality audit)
# ---------------------------------------------------------------------------

_ES_EPOCHS = 3  # shuffled epochs 1..E; epoch 0 = natural doc_id order
_ES_SHARD_W = 1 << 52  # 60-bit hash -> 256 rank shards per epoch
_ES_NAT_W = 4096  # natural-order rank shard width (doc_id keyed)


def _es_h_duck(e: int) -> str:
    return (
        f"('0x' || substr(md5('ep{e}:' || CAST(doc_id AS VARCHAR)),"
        f" 1, 15))::BIGINT"
    )


def _es_oracle() -> str:
    es = list(range(_ES_EPOCHS + 1))
    parts = ["    WITH d AS (SELECT doc_id FROM documents)"]
    for e in es:
        h = "doc_id" if e == 0 else _es_h_duck(e)
        parts.append(
            f""",
    r{e} AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY {h}, doc_id) AS rnk
      FROM d)"""
        )
    pairs = [(a, b) for a in es for b in es if a < b]
    sel = []
    for a, b in pairs:
        # d2 squares and their SUM stay in HUGEINT (int128) end-to-end;
        # only the output LEDGER column narrows to BIGINT (a DECIMAL
        # output would reach the driver as float64 via duckdb .df() and
        # hash-mismatch Spark's object Decimal — the emulator caught
        # exactly that).  rho_ppm divides the HUGEINT sum directly.
        sel.append(
            f"""
      SELECT {a} AS epoch_a, {b} AS epoch_b,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM((CAST(ra.rnk AS HUGEINT) - rb.rnk)
                 * (CAST(ra.rnk AS HUGEINT) - rb.rnk)) AS sum_d2_wide
      FROM r{a} ra JOIN r{b} rb USING (doc_id)"""
        )
    parts.append(
        f""",
    p AS ({" UNION ALL ".join(sel)})
    SELECT CAST(epoch_a AS INT) AS epoch_a,
           CAST(epoch_b AS INT) AS epoch_b,
           n_docs,
           CAST(sum_d2_wide AS BIGINT) AS sum_d2,
           CAST(1000000 - (CAST(6000000 AS HUGEINT) * sum_d2_wide)
                // (CAST(n_docs AS HUGEINT) * CAST(n_docs AS HUGEINT)
                    * CAST(n_docs AS HUGEINT) - CAST(n_docs AS HUGEINT))
                AS BIGINT) AS rho_ppm
    FROM p
    ORDER BY epoch_a, epoch_b"""
    )
    return "".join(parts)


@register(
    "epoch_shuffle_decorrelation",
    _es_oracle(),
    "pipeline_ops",
    "ops",
)
def epoch_shuffle_decorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order shuffle QUALITY audit: a multi-epoch run re-reads
    the corpus in a fresh deterministic order per epoch (rank of a
    60-bit md5 of (epoch, doc_id) — the standard seeded hash shuffle,
    reproducible with no RNG state), and this operator measures how
    DECORRELATED those orders actually are — exact Spearman rank
    correlation, in ppm, for every pair among the natural order
    (epoch 0) and {e} shuffled epochs.  A correct shuffle shows
    |rho| ~ 1/sqrt(n) for every pair; rho near 1e6 against epoch 0
    means the "shuffle" preserved ingest order (the classic curriculum
    bug: loss spikes that track file boundaries), and rho near 1e6
    between two epochs means the seed was not folded per-epoch.

    Exactness: ranks are integers; every derived quantity is 128-bit
    from the first multiply — d2 squares in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB), sum_d2 accumulated wide, the cube n*(n^2-1)
    expanded in DECIMAL(38,0) — and the Spearman closed form
    1 - 6*sum_d2/(n(n^2-1)) is a single 128-bit floor division over
    the WIDE accumulations (Spark DECIMAL(38,0) DIV == DuckDB
    HUGEINT //, verified operand-for-operand).  No float enters the
    metric and no intermediate fits only in int64: rho_ppm is exact
    to ~5e10 docs per epoch (where 6e6 * n^3 crosses 1e38), far past
    the int64 wrap points the earlier formulation hit at ~2.1M (sum)
    and ~3B (square) docs.  Only the display LEDGER column sum_d2
    narrows to BIGINT at output (the driver's pandas path cannot
    round-trip a decimal column); past ~2.1M docs it would null-out
    loudly rather than wrap, while rho_ppm stays exact.  Sharding is
    integer floor division (`h DIV 2^52`), not double division.

    Scale posture: per epoch, ranks come from the sharded prefix-sum
    pattern — rows shard by the hash's top bits ({s} shards, uniform
    by construction since the hash is uniform), rank locally in
    parallel, and only the per-(epoch, shard) offset table crosses a
    window (partitioned BY EPOCH, ~256 rows each); the natural-order
    arm shards by doc_id range.  The pairwise stage joins the
    doc-grain rank table co-partitioned on doc_id and reduces to one
    combinable SUM per pair.  The oracle is the independent monolithic
    formulation (one global row_number per epoch, no sharding).

    Reference has no training-order tooling (SURVEY §2c extension;
    joins mix_* / sample_* / token_budget_packing in the
    batch-construction family).
    """
    es = list(range(_ES_EPOCHS + 1))
    d = load(spark, sf_dir, "documents").select("doc_id")
    long_rows = None
    for e in es:
        h_sql = (
            "CAST(doc_id AS BIGINT)"
            if e == 0
            else (
                f"CAST(conv(substr(md5(concat('ep{e}:',"
                f" CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            )
        )
        w = _ES_NAT_W if e == 0 else _ES_SHARD_W
        # Shard by integer floor division (h is non-negative, so DIV is
        # floor): the earlier double-division formulation rounds near
        # 2^52 boundaries and could place a key in the adjacent shard —
        # monotone, so ranks stayed right, but it deviated from the
        # documented `h DIV 2^52` sharding.  DIV matches the oracle's
        # integer semantics literally.
        part = d.select(
            "doc_id",
            F.lit(e).alias("epoch"),
            F.expr(h_sql).alias("h"),
            F.expr(f"({h_sql}) DIV {w}").alias("shard"),
        )
        long_rows = part if long_rows is None else long_rows.unionByName(part)
    lw = W.partitionBy("epoch", "shard").orderBy("h", "doc_id")
    local = long_rows.select(
        "doc_id", "epoch", "shard", F.row_number().over(lw).alias("lrn")
    )
    ow = (
        W.partitionBy("epoch")
        .orderBy("shard")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = F.broadcast(
        long_rows.groupBy("epoch", "shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "epoch",
            "shard",
            F.coalesce(F.sum("cnt").over(ow), F.lit(0)).alias("off"),
        )
    )
    ranks = local.join(offsets, ["epoch", "shard"]).select(
        "doc_id", "epoch", (F.col("off") + F.col("lrn")).alias("rnk")
    )
    wide = ranks.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("epoch") == e, F.col("rnk"))).alias(f"r{e}")
            for e in es
        ]
    )
    pairs = [(a, b) for a in es for b in es if a < b]
    # d2 squares in DECIMAL(38,0) from the subtraction on: a BIGINT
    # square wraps past ~3B docs and a BIGINT SUM past ~2.1M (n^3
    # growth) — Spark wraps silently in non-ANSI mode, so the 128-bit
    # exactness claim must hold from the first multiply, not only at
    # the final division.  The oracle mirrors this with HUGEINT.
    stack_args = ", ".join(
        f"{a}, {b}, (CAST(r{a} AS DECIMAL(38,0)) - r{b})"
        f" * (CAST(r{a} AS DECIMAL(38,0)) - r{b})"
        for a, b in pairs
    )
    per_pair = wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (epoch_a, epoch_b, d2)"
    )
    return (
        per_pair.groupBy("epoch_a", "epoch_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            # SUM of DECIMAL(38,0) stays DECIMAL(38,0): 128-bit exact.
            F.sum("d2").alias("sum_d2_wide"),
        )
        .select(
            F.col("epoch_a").cast("int").alias("epoch_a"),
            F.col("epoch_b").cast("int").alias("epoch_b"),
            "n_docs",
            # Output LEDGER column narrows to BIGINT (a DECIMAL output
            # reaches the driver as duckdb-.df() float64 vs Spark's
            # object Decimal and hash-mismatches); rho_ppm below is
            # computed from the wide value, so the exactness claim is
            # about the metric, not this display column.
            F.col("sum_d2_wide").cast("long").alias("sum_d2"),
            F.expr(
                "CAST(1000000 - (CAST(6000000 AS DECIMAL(38,0))"
                " * sum_d2_wide)"
                " DIV (CAST(n_docs AS DECIMAL(38,0))"
                " * CAST(n_docs AS DECIMAL(38,0))"
                " * CAST(n_docs AS DECIMAL(38,0))"
                " - CAST(n_docs AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("rho_ppm"),
        )
        .orderBy("epoch_a", "epoch_b")
    )


epoch_shuffle_decorrelation.__doc__ = epoch_shuffle_decorrelation.__doc__.format(
    e=_ES_EPOCHS, s=256
)


# ---------------------------------------------------------------------------
# Repeat-capped language-balanced mixing (upsampling with epoch caps)
# ---------------------------------------------------------------------------

_MRC_T = 1000  # target sample size (forces upsampling of small langs)
_MRC_R = 2  # repeat cap: no language may be sampled past R epochs
_MRC_SCALE = 1_000_000  # sqrt fixed-point scale (the mix_temperature one)


@register(
    "mix_repeat_cap_audit",
    f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang),
    w AS (
      SELECT lang, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * {_MRC_SCALE})
                  AS BIGINT) AS weight_fp
      FROM counts),
    tot AS (SELECT SUM(weight_fp) AS s_total FROM w),
    q0 AS (
      SELECT lang, n_docs, weight_fp,
             ({_MRC_T} * weight_fp) // s_total AS base,
             ({_MRC_T} * weight_fp) % s_total AS rem
      FROM w CROSS JOIN tot),
    lo AS (SELECT {_MRC_T} - SUM(base) AS leftover FROM q0),
    rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rnk
           FROM q0),
    q AS (
      SELECT lang, n_docs, weight_fp,
             base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS quota
      FROM rk CROSS JOIN lo)
    SELECT lang, n_docs, weight_fp,
           CAST(quota AS BIGINT) AS quota,
           CAST(LEAST(quota, {_MRC_R} * n_docs) AS BIGINT)
             AS capped_quota,
           CAST(1000000 * LEAST(quota, {_MRC_R} * n_docs) // n_docs
                AS BIGINT) AS repeat_ppm,
           CAST(CASE WHEN quota > {_MRC_R} * n_docs THEN 1 ELSE 0 END
                AS INT) AS hit_cap,
           CAST(quota - LEAST(quota, {_MRC_R} * n_docs) AS BIGINT)
             AS shortfall
    FROM q
    ORDER BY lang
    """,
    "pipeline_ops",
    "pipeline",
)
def mix_repeat_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced mixing with REPEAT CAPS — the constraint the
    plain temperature mix (mix_temperature_quota) omits: tau=0.5
    weights upsample low-resource languages toward a {t}-sample
    target, but no language may be repeated past {r} epochs of its
    corpus (quota capped at {r} x n), because past a few epochs
    repeated data stops adding signal and starts memorizing — the
    standard data-recipe rule.  Quotas are exact largest-remainder
    apportionment (Hamilton; sqrt is IEEE-correctly-rounded into a
    fixed-point BIGINT, everything after is integer); the audit
    reports, per language, the uncapped quota, the capped quota, the
    realized repeat factor (ppm), whether the cap bound, and the
    SHORTFALL the cap costs — the tokens the mix designer must either
    reassign to uncapped languages or accept as a smaller total.  At
    this fixture's skew (en is ~3.4x fr), every low-resource language
    hits the cap (repeat exactly {r}.0, shortfall 29-38) while
    English does not (repeat 1.40) — the discriminating case.

    Scale posture: the apportionment runs on the |langs|-row
    aggregate (its rank window is language-domain-bounded); the only
    corpus-sized work is the one groupBy count.  In production the
    capped quotas drive the same per-source rank-and-take
    mix_temperature_quota executes.

    Reference has no mixing tooling (SURVEY §2c extension; joins
    mix_temperature_quota / mix_token_budget in the training-mix
    family, adding the cap constraint both omit).
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = counts.select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * _MRC_SCALE)
        .cast("long")
        .alias("weight_fp"),
    )
    tot = w.agg(F.sum("weight_fp").alias("s_total"))
    q0 = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "weight_fp",
        F.expr(f"({_MRC_T} * weight_fp) DIV s_total").alias("base"),
        F.expr(f"({_MRC_T} * weight_fp) % s_total").alias("rem"),
    )
    lo = q0.agg((F.lit(_MRC_T) - F.sum("base")).alias("leftover"))
    rk = q0.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.col("rem").desc(), "lang")),
    )
    q = rk.crossJoin(F.broadcast(lo)).select(
        "lang",
        "n_docs",
        "weight_fp",
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("quota"),
    )
    return q.select(
        "lang",
        "n_docs",
        "weight_fp",
        F.col("quota").cast("long").alias("quota"),
        F.expr(f"CAST(LEAST(quota, {_MRC_R} * n_docs) AS BIGINT)").alias(
            "capped_quota"
        ),
        F.expr(
            f"CAST(1000000 * LEAST(quota, {_MRC_R} * n_docs)"
            " DIV n_docs AS BIGINT)"
        ).alias("repeat_ppm"),
        F.expr(
            f"CAST(CASE WHEN quota > {_MRC_R} * n_docs THEN 1 ELSE 0 END"
            " AS INT)"
        ).alias("hit_cap"),
        F.expr(
            f"CAST(quota - LEAST(quota, {_MRC_R} * n_docs) AS BIGINT)"
        ).alias("shortfall"),
    ).orderBy("lang")


mix_repeat_cap_audit.__doc__ = mix_repeat_cap_audit.__doc__.format(
    t=_MRC_T, r=_MRC_R
)


# ---------------------------------------------------------------------------
# Bloom runtime-filter audit (the join optimization that matters at
# 100 TB: measure what the injected filter would actually prune)
# ---------------------------------------------------------------------------

_BLF_K = 3  # bloom hash count
_BLF_BITS_PER_KEY = 16  # m = next power of 2 >= 16 * n_build


# All three hashes slice DISJOINT 40-bit ranges of ONE md5 digest per
# key (md5's 128 bits are uniformly mixed, so disjoint slices are
# independent) — one hash evaluation per probe row instead of three.
def _blf_hash_duck(i: int, key: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key} AS VARCHAR)),"
        f" {1 + 10 * i}, 10))::BIGINT)"
    )


def _blf_hash_spark(i: int, key: str) -> str:
    return (
        f"CAST(conv(substr(md5(CAST({key} AS STRING)),"
        f" {1 + 10 * i}, 10), 16, 10) AS BIGINT)"
    )


def _blf_oracle() -> str:
    probes = ", ".join(
        f"{_blf_hash_duck(i, 'l_orderkey')} % m.m AS h{i}"
        for i in range(_BLF_K)
    )
    builds = " UNION ALL ".join(
        f"SELECT o_orderkey AS key, {_blf_hash_duck(i, 'o_orderkey')}"
        " % m.m AS bit FROM build CROSS JOIN m"
        for i in range(_BLF_K)
    )
    # LEFT JOIN + COALESCE(word, 0), not INNER: a probe row whose
    # hashed word has no set bits must SCORE as a miss, not vanish
    # from the ledger (an inner join would shrink n_probe and the
    # false-positive denominator; empty words appear with probability
    # ~e^-(bits/word), near-certain at sf1+ scale — ADVICE r12).  The
    # Spark side already scores such rows 0 via the zero-filled array.
    hits = " AND ".join(
        f"((COALESCE(w{i}.word, 0) >> CAST(h{i} % 64 AS INT)) & 1) = 1"
        for i in range(_BLF_K)
    )
    wjoins = " ".join(
        f"LEFT JOIN words w{i} ON w{i}.widx = p.h{i} // 64"
        for i in range(_BLF_K)
    )
    return f"""
    WITH build AS (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT'),
    m AS MATERIALIZED (
      SELECT (CAST(1 AS BIGINT) << length(bin(
                {_BLF_BITS_PER_KEY} * COUNT(*) - 1))) AS m
      FROM build),
    bits AS ({builds}),
    words AS MATERIALIZED (
      SELECT bit // 64 AS widx,
             bit_or(CAST(1 AS UBIGINT) << CAST(bit % 64 AS INT)) AS word
      FROM bits GROUP BY widx),
    p AS MATERIALIZED (
      SELECT l.l_orderkey,
             CASE WHEN b.o_orderkey IS NOT NULL THEN 1 ELSE 0 END
               AS is_member,
             {probes}
      FROM lineitem l
      CROSS JOIN m
      LEFT JOIN (SELECT DISTINCT o_orderkey FROM build) b
        ON l.l_orderkey = b.o_orderkey),
    scored AS (
      SELECT p.is_member,
             CASE WHEN {hits} THEN 1 ELSE 0 END AS bloom_pass
      FROM p {wjoins})
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build,
           (SELECT CAST(m AS BIGINT) FROM m) AS m_bits,
           CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(SUM(bloom_pass) AS BIGINT) AS n_pass_bloom,
           CAST(SUM(is_member) AS BIGINT) AS n_true_match,
           CAST(1000000 * (SUM(bloom_pass) - SUM(is_member))
                // (COUNT(*) - SUM(is_member)) AS BIGINT)
             AS false_positive_ppm
    FROM scored
    """


@register(
    "join_bloom_runtime_filter",
    _blf_oracle(),
    "pipeline_ops",
    "ops",
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom RUNTIME-FILTER audit — the join optimization that decides
    100 TB plans (Spark injects these via
    spark.sql.optimizer.runtime.bloomFilter.enabled; this operator
    builds the same filter EXPLICITLY so its pruning power is a
    measured, hash-verified number): the build side is the selective
    dimension (URGENT orders), sized integer-exactly to the next power
    of two >= {bpk} bits/key (m = 1 << bit_length({bpk}n - 1) — no
    float log anywhere), {k} deterministic md5 hashes set bits, and
    every lineitem probe row is scored member/pass.  The ledger is
    the decision surface: n_pass_bloom vs n_true_match gives the
    measured FALSE-POSITIVE ppm — the fraction of probe I/O the
    filter fails to prune beyond the true semi-join.

    Scale shape (the point of the audit): the Spark side is the REAL
    runtime-filter plan — the bloom collapses to m/64 longs via one
    map-side-combinable bit_or aggregate, is pulled to the driver as
    ONE model-grain array (the collect is the broadcast a real
    runtime filter does) and re-broadcast as a ONE-ROW Arrow frame —
    the same broadcast exchange a real runtime filter rides — so the
    probe is the fact scan plus a bounded 1-row attach: the fact
    table is scanned once, no shuffle.  The oracle deliberately uses the
    opposite formulation (relational word joins) — independent
    derivation of the same bits.

    Reference has no join tooling (SURVEY §2c extension; joins
    join_size_estimate_sample / shuffle_skew_planner in the
    plan-economics family).
    """
    build = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    # One orders pass for the whole build side (r14): the count job
    # materializes the lazy checkpoint, and the bit generation +
    # member-key broadcast read the stored key blocks instead of
    # re-scanning orders (the k-way union re-scanned it per hash).
    build = build.localCheckpoint(eager=False)
    n_build = build.count()
    m_bits = 1 << (_BLF_BITS_PER_KEY * n_build - 1).bit_length()
    n_words = m_bits // 64
    # All k bit positions from ONE md5 per key (the k hashes are
    # disjoint substrings of the same digest — _blf_hash_spark), via
    # one explode instead of a k-way union of scans.
    bit_exprs = ", ".join(
        f"CAST(conv(substr(h5, {1 + 10 * i}, 10), 16, 10) AS BIGINT)"
        f" % {m_bits}"
        for i in range(_BLF_K)
    )
    bits = build.select(
        F.md5(F.col("o_orderkey").cast("string")).alias("h5")
    ).select(F.explode(F.expr(f"array({bit_exprs})")).alias("bit"))
    words_rows = (
        bits.select(
            F.expr("bit DIV 64").alias("widx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in words_rows:
        words[int(r.widx)] = int(r.word)
    # Ship the filter back as a 1-row Arrow frame + broadcast attach —
    # exactly the broadcast exchange a real runtime filter is.  (An
    # F.lit(words) literal converts element-by-element over py4j:
    # measured 3 s for 8192 words; the Arrow path is milliseconds and
    # scales to the sf1 131072-word filter.)
    import pandas as pd

    wdim = F.broadcast(
        spark.createDataFrame(pd.DataFrame({"W": [words]}))
    )
    # Spread the probe's per-row digest work off the single-row-group
    # scan task (guide §2.5 input skew): one md5 + 3 hex-field parses
    # per probe row all ran on the one scan core.  HASH repartition on
    # the probe key — a keyless repartition pays a local
    # sort-before-repartition (SPARK-23207) and measured SLOWER
    # (0.95 -> 1.27 s) where the hash exchange reads 0.95 -> 0.55 s.
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("l_orderkey")
        )
    )
    member_keys = F.broadcast(build.distinct())
    probe = li.join(
        member_keys, li["l_orderkey"] == build["o_orderkey"], "left"
    ).select(
        "l_orderkey",
        F.when(F.col("o_orderkey").isNotNull(), 1)
        .otherwise(0)
        .alias("is_member"),
    )
    # One md5 per probe row (r14): the digest and the k bit positions
    # are materialized as projection columns, so the k membership
    # tests share them instead of each re-deriving md5 + conv twice
    # (once for the word index, once for the in-word shift).
    probe = probe.withColumn(
        "h5", F.md5(F.col("l_orderkey").cast("string"))
    )
    for i in range(_BLF_K):
        probe = probe.withColumn(
            f"hv{i}",
            F.expr(
                f"CAST(conv(substr(h5, {1 + 10 * i}, 10), 16, 10)"
                f" AS BIGINT) % {m_bits}"
            ),
        )
    hit = None
    for i in range(_BLF_K):
        # & 1, not % 2: Spark's >> is an ARITHMETIC shift, so a
        # word with bit 63 set shifts to a negative value whose % 2 is
        # 0 or -1; the AND reads the low bit regardless of sign.
        bit_set = F.expr(
            f"((element_at(W, CAST(hv{i} DIV 64 AS INT) + 1)"
            f" >> CAST(hv{i} % 64 AS INT)) & 1) = 1"
        )
        hit = bit_set if hit is None else (hit & bit_set)
    scored = probe.crossJoin(wdim).select(
        "is_member", F.when(hit, 1).otherwise(0).alias("bloom_pass")
    )
    return scored.agg(
        F.lit(n_build).cast("long").alias("n_build"),
        F.lit(m_bits).cast("long").alias("m_bits"),
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum("bloom_pass").cast("long").alias("n_pass_bloom"),
        F.sum("is_member").cast("long").alias("n_true_match"),
        F.expr(
            "CAST(1000000 * (SUM(bloom_pass) - SUM(is_member))"
            " DIV (COUNT(*) - SUM(is_member)) AS BIGINT)"
        ).alias("false_positive_ppm"),
    )


join_bloom_runtime_filter.__doc__ = join_bloom_runtime_filter.__doc__.format(
    bpk=_BLF_BITS_PER_KEY, k=_BLF_K
)


# ---------------------------------------------------------------------------
# Schema-evolution audit (mergeSchema scan over mixed-generation files)
# ---------------------------------------------------------------------------

_SE_COLS = ("o_channel", "o_custkey", "o_orderkey", "o_price_cents")


@register(
    "schema_evolution_audit",
    """
    WITH b AS (
      SELECT o_orderkey FROM orders),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_odd
          FROM b)
    SELECT column_name, n AS n_rows, n_present,
           CAST(1000000 * n_present // n AS BIGINT) AS present_ppm
    FROM (
      SELECT 'o_channel' AS column_name, n, n_odd AS n_present FROM t
      UNION ALL SELECT 'o_custkey', n, n FROM t
      UNION ALL SELECT 'o_orderkey', n, n FROM t
      UNION ALL SELECT 'o_price_cents', n, n FROM t)
    ORDER BY column_name
    """,
    "pipeline_ops",
    "ops",
)
def schema_evolution_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-EVOLUTION audit: a dataset whose files span two schema
    generations (gen-1 lacks the later `o_channel` column; gen-2
    carries it) is scanned with ``mergeSchema`` — the real mixed-
    vintage lake read — and the ledger reports, per merged column,
    how many rows actually carry a value vs. inherit NULL from
    pre-evolution files.  This is the number a backfill decision
    reads: present_ppm == 1e6 means the column is safe to make
    required; anything less is the backfill debt.

    The Spark side REALLY exercises the surface: both generations are
    staged as parquet (content-addressed /tmp dir, re-staged per run),
    read back in ONE `mergeSchema` directory scan, and the per-column
    presence collapses in one aggregate (count + count(col) are both
    map-side combinable).  The oracle never touches the staged files:
    generations are derived deterministically from `orders`
    (even keys -> gen-1, odd -> gen-2), so the expected ledger is
    reconstructed arithmetically from the base table — file layout
    cannot leak into the truth.

    Scale posture: one directory scan, schema union at the footer
    level (mergeSchema pays one extra footer pass — the documented
    cost), one 4-column aggregate, 4-row stack readout; no join, no
    shuffle beyond the 1-row exchange.

    Reference has no lake-schema tooling (SURVEY §2c extension; joins
    corpus_snapshot_diff / export_manifest_checksums in the
    snapshot-ops family).
    """
    import hashlib
    import shutil

    base = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)"
        ).alias("o_price_cents"),
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    root = f"/tmp/kbrowse_schema_evo/{tag}"
    shutil.rmtree(root, ignore_errors=True)
    g1 = base.filter(F.col("o_orderkey") % 2 == 0)
    g2 = base.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_channel",
        F.expr("IF(o_orderkey % 4 = 1, 'web', 'store')"),
    )
    g1.write.mode("overwrite").parquet(f"{root}/gen=1")
    g2.write.mode("overwrite").parquet(f"{root}/gen=2")
    merged = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{root}/gen=1", f"{root}/gen=2")
    )
    agg = merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            F.count(c).cast("long").alias(f"p_{c}")
            for c in _SE_COLS
        ],
    )
    stack_args = ", ".join(f"'{c}', p_{c}" for c in _SE_COLS)
    return (
        agg.selectExpr(
            "n_rows",
            f"stack({len(_SE_COLS)}, {stack_args})"
            " AS (column_name, n_present)",
        )
        .select(
            "column_name",
            "n_rows",
            "n_present",
            F.expr(
                "CAST(1000000 * n_present DIV n_rows AS BIGINT)"
            ).alias("present_ppm"),
        )
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# Neyman optimal stratified allocation (the sampling-design ledger)
# ---------------------------------------------------------------------------

_NEY_T = 100  # total sample budget to allocate

# Exact integer sqrt: floor(sqrt(x)) from the double estimate plus a
# +-1 correction (the double sqrt of a BIGINT is correctly rounded, so
# its floor is off by at most one; the correction compares exact
# integer squares).  Identical text in both engines.
_NEY_ISQRT_SPARK = (
    "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    " + IF((CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
    "      * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
    "      <= {x}, 1, 0)"
    " - IF(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    "      * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    "      > {x}, 1, 0))"
)
_NEY_ISQRT_DUCK = (
    "(CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    " + CASE WHEN (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
    "      * (CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT) + 1)"
    "      <= {x} THEN 1 ELSE 0 END"
    " - CASE WHEN CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    "      * CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    "      > {x} THEN 1 ELSE 0 END)"
)


def _ney_oracle() -> str:
    w = _NEY_ISQRT_DUCK.format(x="sse")
    return f"""
    WITH s AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(length(text) AS BIGINT)
                      * CAST(length(text) AS BIGINT)) AS BIGINT) AS sx2
      FROM documents GROUP BY lang),
    wtab AS (
      SELECT lang, n_pop, n_pop * sx2 - sx * sx AS sse FROM s),
    wt AS (
      SELECT lang, n_pop, {w} AS w FROM wtab),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum,
                   CAST(SUM(n_pop) AS BIGINT) AS nsum FROM wt),
    ham AS (
      SELECT lang, n_pop, w,
             {_NEY_T} * w // t.wsum AS base_n,
             {_NEY_T} * w % t.wsum AS rem_n,
             {_NEY_T} * n_pop // t.nsum AS base_p,
             {_NEY_T} * n_pop % t.nsum AS rem_p
      FROM wt CROSS JOIN tot t),
    fix AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem_n DESC, lang) AS rk_n,
             ROW_NUMBER() OVER (ORDER BY rem_p DESC, lang) AS rk_p,
             (SELECT {_NEY_T} - SUM(base_n) FROM ham) AS short_n,
             (SELECT {_NEY_T} - SUM(base_p) FROM ham) AS short_p
      FROM ham)
    SELECT lang, n_pop, w AS neyman_weight,
           CAST(base_n + CASE WHEN rk_n <= short_n THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_neyman,
           CAST(base_p + CASE WHEN rk_p <= short_p THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_proportional
    FROM fix
    ORDER BY lang
    """


@register(
    "sample_neyman_allocation",
    _ney_oracle(),
    "pipeline_ops",
    "sampling",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman OPTIMAL stratified allocation — the sampling-DESIGN step
    the stratified samplers (sample_stratified /
    sample_reservoir_per_stratum) take as given: split a {t}-row
    budget across strata proportionally to N_h * sigma_h (minimum-
    variance allocation for a stratified mean), next to the
    proportional allocation (by N_h alone) so the ledger shows where
    variance, not volume, earns sample slots.

    Exactness: N_h * sigma_h = sqrt(N_h * sum(x^2) - sum(x)^2) is an
    integer square root — the double sqrt estimate plus a +-1 exact-
    square correction, identical in both engines (valid over the full
    BIGINT range: a correctly-rounded double sqrt floors within one);
    both allocations apportion by the exact largest-remainder
    (Hamilton) rule with remainder ties broken by stratum key.
    Nothing float ever compares.  Exact while N_h * sum(x^2) < 2^63
    (~2e7 docs/stratum at these lengths); past that the SSE moves to
    DECIMAL(38,0) like epoch_shuffle_decorrelation's widening.

    Scale posture: ONE corpus scan (three combinable aggregates per
    stratum), then everything runs at STRATUM grain (5 rows here;
    bounded by the stratum vocabulary at any corpus size) — the
    1-row totals attach and the remainder ranks are stratum-grain
    windows.

    Reference has no sampling tooling (SURVEY §2c extension; the
    design-side companion of the sample_* family).
    """
    s = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pop"),
            F.sum(F.expr("CAST(length(text) AS BIGINT)"))
            .cast("long")
            .alias("sx"),
            F.sum(
                F.expr(
                    "CAST(length(text) AS BIGINT)"
                    " * CAST(length(text) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("sx2"),
        )
        .select(
            "lang",
            "n_pop",
            F.expr("n_pop * sx2 - sx * sx").alias("sse"),
        )
        .select(
            "lang",
            "n_pop",
            F.expr(_NEY_ISQRT_SPARK.format(x="sse")).alias("w"),
        )
    )
    tot = F.broadcast(
        s.agg(
            F.sum("w").cast("long").alias("wsum"),
            F.sum("n_pop").cast("long").alias("nsum"),
        )
    )
    ham = s.crossJoin(tot).select(
        "lang",
        "n_pop",
        "w",
        F.expr(f"{_NEY_T} * w DIV wsum").alias("base_n"),
        F.expr(f"{_NEY_T} * w % wsum").alias("rem_n"),
        F.expr(f"{_NEY_T} * n_pop DIV nsum").alias("base_p"),
        F.expr(f"{_NEY_T} * n_pop % nsum").alias("rem_p"),
    )
    short = F.broadcast(
        ham.agg(
            F.expr(f"{_NEY_T} - SUM(base_n)").alias("short_n"),
            F.expr(f"{_NEY_T} - SUM(base_p)").alias("short_p"),
        )
    )
    wn = W.orderBy(F.col("rem_n").desc(), "lang")
    wp = W.orderBy(F.col("rem_p").desc(), "lang")
    return (
        ham.withColumn("rk_n", F.row_number().over(wn))
        .withColumn("rk_p", F.row_number().over(wp))
        .crossJoin(short)
        .select(
            "lang",
            "n_pop",
            F.col("w").alias("neyman_weight"),
            F.expr("CAST(base_n + IF(rk_n <= short_n, 1, 0) AS BIGINT)")
            .alias("alloc_neyman"),
            F.expr("CAST(base_p + IF(rk_p <= short_p, 1, 0) AS BIGINT)")
            .alias("alloc_proportional"),
        )
        .orderBy("lang")
    )


sample_neyman_allocation.__doc__ = sample_neyman_allocation.__doc__.format(
    t=_NEY_T
)


# ---------------------------------------------------------------------------
# Partition-pruning audit (r13): the Hive-style partitioned layout +
# pruned-scan contract, measured on a REALLY staged directory tree
# ---------------------------------------------------------------------------

_PPA_SALTS = 4  # sub-partition fan per event_type (salt = event_id % 4)


def _ppa_staging_root(spark: SparkSession, sf_dir: str) -> str:
    """Per-SESSION staging dir for partition_pruning_audit (ADVICE r13
    #3): keyed on (sf_dir, Spark application id), so two concurrent
    sessions over the same fixture cannot rmtree each other's staged
    tree while the read-back scan or test_partition_pruning_plan is
    reading it; stable WITHIN a session, so repeated invocations reuse
    one path instead of leaking a dir per call."""
    import hashlib
    import os

    tag = hashlib.md5(
        (os.path.abspath(sf_dir) + "|" + spark.sparkContext.applicationId)
        .encode()
    ).hexdigest()[:12]
    return f"/tmp/kbrowse_part_prune/{tag}"


@register(
    "partition_pruning_audit",
    f"""
    WITH base AS (
      SELECT event_type, event_id % {_PPA_SALTS} AS salt,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_type,
           CAST(COUNT(DISTINCT salt) AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM base GROUP BY event_type
    ORDER BY event_type
    """,
    "pipeline_ops",
    "ops",
)
def partition_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-PRUNING layout audit — the 100 TB table layout every
    lake query depends on: events are REALLY written as a two-level
    Hive-partitioned tree (event_type / salt, salt = event_id % {s} —
    hash-repartitioned on both keys first, so the dynamic-partition
    writer emits EXACTLY one file per leaf directory), then read back
    and manifest-audited per event_type: file count (distinct
    input_file_name), row count, and content checksum (cents sum).

    The oracle never sees the staged tree: the expected manifest is
    derived arithmetically from the base table — n_files per type ==
    COUNT(DISTINCT event_id % {s}) because one-file-per-leaf is the
    writer contract under per-key repartitioning; a writer that
    splits or merges leaves breaks the hash match.

    The PRUNING half of the contract (a scan filtered to one
    event_type lists only that type's leaf dirs — `PartitionFilters`
    in the scan node, file-listing cost O(selected partitions) at
    100 TB) is asserted on the executed plan by
    tests/test_operator_invariants.py::test_partition_pruning_plan —
    plan shape is not a row value, so it lives in the test, not the
    ledger.

    Scale posture: one repartition exchange (the write), one read-back
    scan with a 3-column map-side-combinable aggregate at
    (type, file) grain; the manifest is partition-grain.  Reference
    has no storage layout at all (SURVEY §2c extension; joins the
    layout_* / compaction family).
    """
    import hashlib
    import shutil

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"event_id % {_PPA_SALTS}").alias("salt"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    root = _ppa_staging_root(spark, sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    (
        ev.repartition("event_type", "salt")
        .write.mode("overwrite")
        .partitionBy("event_type", "salt")
        .parquet(root)
    )
    back = spark.read.parquet(root)
    return (
        back.select(
            "event_type", "cents", F.input_file_name().alias("f")
        )
        .groupBy("event_type")
        .agg(
            F.countDistinct("f").alias("n_files"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


partition_pruning_audit.__doc__ = partition_pruning_audit.__doc__.format(
    s=_PPA_SALTS
)

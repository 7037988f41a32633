"""Corpus-curation catalog: the training-data-pipeline operations a
100 TB pretraining corpus needs beyond dedup/ANN — decontamination
(train/test n-gram leakage), PII redaction, Gopher-style repetition
signals, corpus-frequency language-model scoring, stratified domain
sampling, and token-budget packing.

Every entry follows the repo parity invariants: identical aliases both
engines, double-producing formulas written once as shared SQL text,
integer sufficient statistics wherever a sum crosses rows
(micro-nat BIGINT quantization for log-probs), deterministic
tiebreakers on every window.

Reference parity note: the reference pipeline (rodekruis/
IBF_TYPHOON_DATA_PIPELINE) has no corpus layer; these operators are the
"beyond the reference" training-data mandate. Shapes follow the
published recipes: C4 (Raffel et al. 2020) for hash splits and PII
scrubbing, Gopher (Rae et al. 2021) §A1.1 for repetition filters,
CCNet (Wenzek et al. 2020) for LM-based quality scoring, and GPT-3
(Brown et al. 2020) §C for 13-gram-style decontamination (3-grams
here: the synthetic vocabulary is ~30 words, so 3-grams already
separate planted near-dups from background collisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators import dedup as dd
from ibf_typhoon_data_pipeline_spark.operators.windows import global_running_sum
from ibf_typhoon_data_pipeline_spark.plans.corpus import _sql_shingles
from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------- split
# Shared with corpus_split: lexicographic md5-prefix thresholds
# (0xccd/0x1000 = 80.0% train, 0xe66 = 90.0% val cut, rest test).
_SPLIT_SQL = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'ccd' "
    "THEN 'train' "
    "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'e66' "
    "THEN 'val' ELSE 'test' END"
)


def _split_col() -> F.Column:
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3)
    return (
        F.when(prefix < "ccd", "train")
        .when(prefix < "e66", "val")
        .otherwise("test")
    )


@register(
    "corpus_decontaminate",
    f"""
    WITH sp AS (
      SELECT doc_id, text, {_SPLIT_SQL} AS split FROM documents
    ), tr AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle
      FROM sp WHERE split = 'train'
    ), te AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle
      FROM sp WHERE split = 'test'
    ), hits AS (
      SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
             count(*) AS n_shared
      FROM tr JOIN te ON tr.shingle = te.shingle
      GROUP BY 1, 2
    )
    SELECT train_id,
           CAST(count(*) AS BIGINT) AS n_test_hits,
           CAST(max(n_shared) AS BIGINT) AS max_shared
    FROM hits WHERE n_shared >= 4
    GROUP BY train_id
    """,
    doc="Train/test decontamination (GPT-3 §C shape): distinct 3-gram "
        "shingles of both splits meet in an inverted-index equi-join "
        "(cost Σ bucket², never train×test), pairs sharing >= 4 "
        "shingles are leaks (planted near-dups score 22-75 shared vs "
        "a <= 3 random-collision background at sf0.01), report is "
        "per-train-doc hit count + worst overlap. At 100 TB the test "
        "side is tiny, so its shingle table broadcasts.",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", _split_col().alias("split")
    )
    train = dd.shingle_table(docs.filter(F.col("split") == "train"))
    test = dd.shingle_table(docs.filter(F.col("split") == "test")).select(
        F.col("doc_id").alias("test_id"), "shingle"
    )
    hits = (
        train.withColumnRenamed("doc_id", "train_id")
        .join(test, "shingle")
        .groupBy("train_id", "test_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 4)
    )
    return hits.groupBy("train_id").agg(
        F.count("*").cast("long").alias("n_test_hits"),
        F.max("n_shared").cast("long").alias("max_shared"),
    )


# ------------------------------------------------------------ PII scrub
# The synthetic corpus carries no PII, so the scrub target is derived
# deterministically from row fields (source + doc_id -> one email, one
# phone per doc) and then redacted — exercising the real patterns and
# the count/replace plumbing end-to-end. Patterns avoid backslashes
# entirely ([.] and [+] classes instead of \\. and \\+): Spark SQL
# string literals treat backslash as an escape while DuckDB's do not,
# so a backslash-free pattern is the only text that means the same
# regex in both parsers (and in Java regex vs RE2 alike).
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PII_PHONE = "[+][0-9]{2}-[0-9]{3}-[0-9]{4}"
_PII_AUG_SQL = (
    "concat(text, ' contact ', source, '.', CAST(doc_id AS VARCHAR), "
    "'@example.com tel +63-917-', "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
)


@register(
    "text_pii_scrub",
    f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS contact_text FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(contact_text, '{_PII_EMAIL}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(contact_text, '{_PII_PHONE}'))
                AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(contact_text,
                 '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_digest,
           CAST(length(regexp_replace(regexp_replace(contact_text,
                 '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g')) AS BIGINT)
             AS redacted_len
    FROM aug
    """,
    doc="PII redaction (C4-style scrub): email + E.164-ish phone "
        "patterns counted and replaced in one projection — pure "
        "codegen'd regex, no shuffle, no UDF; output pinned by the "
        "md5 of the fully-redacted text. Patterns are backslash-free "
        "so Spark SQL and DuckDB literals denote the identical regex.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # mirrors _PII_AUG_SQL; built with F functions because Spark's
    # parser rejects CAST(AS VARCHAR) without a length
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact "),
            F.col("source"),
            F.lit("."),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel +63-917-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("contact_text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.col("contact_text"), F.lit(_PII_EMAIL), F.lit("<EMAIL>")
        ),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    return aug.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("contact_text"), F.lit(_PII_EMAIL), 0)
        ).cast("long").alias("n_emails"),
        F.size(
            F.regexp_extract_all(F.col("contact_text"), F.lit(_PII_PHONE), 0)
        ).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_digest"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


# ------------------------------------------------- repetition signals
# Gopher §A1.1 repetition filters: fraction of tokens taken by the
# most frequent token, distinct-token ratio, and fraction of bigram
# occurrences taken by the most frequent bigram. All ratios are
# quotients of per-doc integers — the one double op both engines
# compute identically — rounded 6dp.
_NONDISTINCT_BIGRAMS_SQL = (
    "CASE WHEN len(string_split_regex(trim(text), ' +')) >= 2 THEN "
    "list_transform(range(1, len(string_split_regex(trim(text), ' +'))), "
    "i -> array_to_string((string_split_regex(trim(text), ' +'))[i:i+1], ' ')) "
    "ELSE [] END"
)


@register(
    "text_repetition",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), tc AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2
    ), toks AS (
      SELECT doc_id, sum(c) AS total_tokens, max(c) AS top_token_c,
             count(*) AS n_distinct
      FROM tc GROUP BY doc_id
    ), bg AS (
      SELECT doc_id, unnest({_NONDISTINCT_BIGRAMS_SQL}) AS bigram
      FROM documents WHERE length(trim(text)) > 0
    ), bc AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2
    ), bgs AS (
      SELECT doc_id, sum(c) AS total_bigrams, max(c) AS top_bigram_c
      FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.total_tokens AS BIGINT) AS total_tokens,
           round(CAST(t.top_token_c AS DOUBLE)
                 / CAST(t.total_tokens AS DOUBLE), 6) AS top_token_frac,
           round(CAST(t.n_distinct AS DOUBLE)
                 / CAST(t.total_tokens AS DOUBLE), 6) AS distinct_frac,
           round(CAST(coalesce(b.top_bigram_c, 0) AS DOUBLE)
                 / CAST(greatest(coalesce(b.total_bigrams, 0), 1)
                        AS DOUBLE), 6) AS top_bigram_frac
    FROM toks t LEFT JOIN bgs b ON b.doc_id = t.doc_id
    """,
    doc="Gopher-style repetition signals: top-token fraction, "
        "distinct-token ratio, top-bigram fraction. Explode + two "
        "partial-agg groupBys per granularity — the shuffle key is "
        "(doc_id, gram), doc-local and balanced by construction, so "
        "the plan is one map-side-combined pass per granularity at "
        "any corpus size.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", dd.split_words(F.col("text")).alias("__words"))
    )
    tok = docs.select("doc_id", F.explode("__words").alias("tok"))
    toks = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("total_tokens"),
            F.max("c").alias("top_token_c"),
            F.count("*").alias("n_distinct"),
        )
    )
    cnt = F.size("__words")
    grams = F.when(
        cnt >= 2,
        F.transform(
            F.sequence(F.lit(0), cnt - F.lit(2)),
            lambda i: F.concat_ws(
                " ",
                F.element_at("__words", i + 1),
                F.element_at("__words", i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select("doc_id", F.explode(grams).alias("bigram"))
    bgs = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("total_bigrams"),
            F.max("c").alias("top_bigram_c"),
        )
    )
    t, b = toks.alias("t"), bgs.alias("b")
    return t.join(b, "doc_id", "left").select(
        F.col("doc_id"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.col("top_token_c").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("top_token_frac"),
        F.round(
            F.col("n_distinct").cast("double")
            / F.col("total_tokens").cast("double"),
            6,
        ).alias("distinct_frac"),
        F.round(
            F.coalesce(F.col("top_bigram_c"), F.lit(0)).cast("double")
            / F.greatest(
                F.coalesce(F.col("total_bigrams"), F.lit(0)), F.lit(1)
            ).cast("double"),
            6,
        ).alias("top_bigram_frac"),
    )


# ------------------------------------------------- unigram LM scoring
# CCNet-shape quality scoring: a unigram LM fit on the corpus itself
# (token frequency / corpus size), each doc scored by mean negative
# log-likelihood. The per-token log-prob is quantized to integer
# micro-nats BEFORE the per-doc sum, so the sum is exact integer
# arithmetic (order-free — summation fold order can never flip the
# hash) and the only double ops are one division + one ln on
# identical integer inputs, written once as shared SQL text.
_LM_LP_MICRO_SQL = (
    "CAST(round(ln(CAST(c AS DOUBLE) / CAST(corpus_tokens AS DOUBLE)) "
    "* 1000000.0) AS BIGINT)"
)
_LM_MEAN_NLL_SQL = (
    "round(CAST(-sum(lp_micro) AS DOUBLE) "
    "/ (1000000.0 * CAST(count(*) AS DOUBLE)), 6)"
)


@register(
    "text_lm_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), freq AS (
      SELECT tok, count(*) AS c FROM tok GROUP BY tok
    ), tot AS (
      SELECT sum(c) AS corpus_tokens FROM freq
    ), scored AS (
      SELECT t.doc_id, {_LM_LP_MICRO_SQL} AS lp_micro
      FROM tok t JOIN freq USING (tok) CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(lp_micro) AS BIGINT) AS logprob_micro,
           {_LM_MEAN_NLL_SQL} AS mean_nll
    FROM scored GROUP BY doc_id
    """,
    doc="CCNet-style LM quality score: corpus unigram frequencies "
        "(one partial-agg groupBy) joined back to the token stream, "
        "per-token ln-prob quantized to integer micro-nats before "
        "summing so the per-doc reduction is exact integer math. The "
        "frequency table is vocabulary-sized (Heaps-growing: the "
        "data tier measures this entry ~linear, 10x at 10x data — "
        "the INTENDED bound for a full-vocab LM; see "
        "text_lm_logprob_capped for the K-bounded variant whose "
        "broadcast side cannot grow); corpus total is a 1-row "
        "cross join.",
)
def text_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", dd.split_words(F.col("text")).alias("__words"))
    )
    tok = docs.select("doc_id", F.explode("__words").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("corpus_tokens"))
    scored = (
        # freq is vocab-sized (Heaps-growing with the corpus): no
        # forced broadcast — AQE broadcasts it at bench SF and falls
        # back to a token-partitioned shuffle join at corpus scale
        # (skew on stop-words handled by AQE skew split); r8, same
        # rule as the base-table de-hinting
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr(_LM_LP_MICRO_SQL).alias("lp_micro"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("lp_micro").cast("long").alias("logprob_micro"),
        F.expr(_LM_MEAN_NLL_SQL).alias("mean_nll"),
    )


# ------------------------------------- capped-vocab unigram LM scoring
# The bounded alternative to text_lm_logprob's Heaps-growing frequency
# table (VERDICT r10 item 5): the LM vocabulary is the top-K tokens by
# corpus frequency (deterministic (c DESC, tok) order, LIMIT K), every
# out-of-vocabulary token scores against the pooled OOV mass — the
# UNK-token trick every real tokenizer-bound LM uses. The broadcast
# side is now K rows AT ANY CORPUS SIZE (allowlisted: limit-capped
# induced vocab), so the join never degrades to a vocab-sized shuffle.
_LM_K = 16
_LM_LP_EC_MICRO_SQL = (
    "CAST(round(ln(CAST(ec AS DOUBLE) / CAST(corpus_tokens AS DOUBLE)) "
    "* 1000000.0) AS BIGINT)"
)


@register(
    "text_lm_logprob_capped",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS corpus_tokens FROM freq
    ), vocab AS (
      SELECT tok, c FROM freq ORDER BY c DESC, tok LIMIT {_LM_K}
    ), oov AS (
      SELECT greatest(
               (SELECT corpus_tokens FROM tot)
                 - CAST((SELECT sum(c) FROM vocab) AS BIGINT),
               CAST(1 AS BIGINT)) AS oov_mass
    ), scored AS (
      SELECT t.doc_id,
             CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS is_oov,
             coalesce(v.c, oov.oov_mass) AS ec,
             tot.corpus_tokens
      FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
      CROSS JOIN tot CROSS JOIN oov
    ), q AS (
      SELECT doc_id, is_oov, {_LM_LP_EC_MICRO_SQL} AS lp_micro
      FROM scored
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(is_oov) AS BIGINT) AS n_oov,
           CAST(sum(lp_micro) AS BIGINT) AS logprob_micro,
           {_LM_MEAN_NLL_SQL} AS mean_nll
    FROM q GROUP BY doc_id
    """,
    doc="Capped-vocabulary LM quality score — the bounded twin of "
        "text_lm_logprob: vocabulary = top-K tokens by frequency "
        "(deterministic (count DESC, token) cut), OOV tokens score "
        "against the pooled leftover mass as a single UNK. The "
        "frequency side of the scoring join is K rows at ANY corpus "
        "size (vs Heaps-growing for the uncapped entry, measured "
        "~linear 10x at 10x data), so the broadcast can never "
        "degrade; per-token ln-probs quantize to integer micro-nats "
        "before the order-free per-doc sum, same as the base entry.",
)
def text_lm_logprob_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", dd.split_words(F.col("text")).alias("__words"))
    )
    tok = docs.select("doc_id", F.explode("__words").alias("tok"))
    # NOT persisted (r13, VERDICT r12 item 3): freq feeds 4 derivations
    # (vocab/tot/oov) so the r7 ≥3-derivations rule suggested a persist
    # (shipped r12), but the paired A/B reads the persist 1.246x SLOWER
    # (mins 0.834 vs 1.075 s) — the derivations are tiny broadcast-side
    # aggregates whose recompute pipelines through the scan, while the
    # cache round-trip blocks the whole token stream. The r7 corollary
    # fires again: a persist only pays when the re-read work dominates
    # the cache write+read, not merely when the count of readers is ≥3.
    freq = tok.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    vocab = freq.orderBy(F.col("c").desc(), F.col("tok")).limit(_LM_K)
    tot = freq.agg(F.sum("c").cast("long").alias("corpus_tokens"))
    oov = (
        tot.crossJoin(vocab.agg(F.sum("c").cast("long").alias("__vc")))
        .select(
            F.greatest(
                F.col("corpus_tokens") - F.col("__vc"), F.lit(1).cast("long")
            ).alias("oov_mass")
        )
    )
    scored = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(oov))
        .select(
            "doc_id",
            F.when(F.col("c").isNull(), 1).otherwise(0).alias("is_oov"),
            F.coalesce(F.col("c"), F.col("oov_mass")).alias("ec"),
            "corpus_tokens",
        )
        .select(
            "doc_id",
            "is_oov",
            F.expr(_LM_LP_EC_MICRO_SQL).alias("lp_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("is_oov").cast("long").alias("n_oov"),
        F.sum("lp_micro").cast("long").alias("logprob_micro"),
        F.expr(_LM_MEAN_NLL_SQL).alias("mean_nll"),
    )


# --------------------------------------------- stratified domain sample
# Domain rebalancing: per-language keep rates applied by salted-hash
# threshold — deterministic, shuffle-free, reproducible across engines
# and runs, and independent per row (no global count pass).
_STRATA_RATE_SQL = (
    "CASE lang WHEN 'en' THEN '8000' WHEN 'es' THEN 'c000' "
    "WHEN 'de' THEN '4000' ELSE 'zzzz' END"
)


@register(
    "corpus_sample_stratified",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(concat('samp:', CAST(doc_id AS VARCHAR))), 1, 4)
          < {_STRATA_RATE_SQL}
    """,
    doc="Stratified domain sampling: per-language keep rates (en 50%, "
        "es 75%, de 25%, others 100%) as lexicographic thresholds on "
        "a salted md5 prefix — the deterministic domain-mixing "
        "primitive; a row's fate depends only on its own id, so the "
        "sample is stable under corpus growth and needs no shuffle.",
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(
        F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))), 1, 4
    )
    return docs.filter(prefix < F.expr(_STRATA_RATE_SQL)).select(
        "doc_id", "lang"
    )


# --------------------------------------------------- token-budget pack
def _md5_prefix_bucket(key_col: str) -> F.Column:
    """256 contiguous order buckets from the first two hex chars of an
    md5 key — a monotone coarsening of the lexicographic key order
    (fixed-width hex, so prefix-integer order == string order), and
    uniform by construction. Feeds global_running_sum's bucket arg:
    one hash exchange, no range-sampling job."""
    return F.conv(F.substring(F.col(key_col), 1, 2), 16, 10).cast("int")


@register(
    "corpus_token_budget",
    """
    WITH sized AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), ' +')) AS n_tokens,
             md5(concat('shuf:', CAST(doc_id AS VARCHAR))) AS shuffle_key
      FROM documents WHERE length(trim(text)) > 0
    ), packed AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
      FROM sized
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM packed WHERE cum_tokens <= 10000
    """,
    doc="Token-budget packing: deterministic corpus shuffle (salted "
        "md5 order) + running token sum, cut at a 10k-token budget — "
        "how a training run takes 'the first N tokens' "
        "reproducibly. The running sum is integer-exact and computed "
        "by operators.windows.global_running_sum — a two-pass "
        "range-partitioned cumsum (per-range local window + broadcast "
        "partition offsets), NOT a no-partitionBy window, so no "
        "single-partition sort of the corpus (docs/SCALING.md).",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(dd.split_words(F.col("text"))).alias("n_tokens"),
            F.md5(
                F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))
            ).alias("shuffle_key"),
        )
    )
    return (
        global_running_sum(
            docs,
            ["shuffle_key", "doc_id"],
            "n_tokens",
            "cum_tokens",
            bucket=_md5_prefix_bucket("shuffle_key"),
        )
        .filter(F.col("cum_tokens") <= 10000)
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )


# ------------------------------------------------------ curation funnel
# The end-to-end corpus manifest: every upstream signal — hash split,
# quality gate, exact-dup representative election, train/test
# decontamination — composed into ONE declarative plan. This is the
# query a training run actually consumes: per document, which split it
# landed in, which gates it cleared, and the single final keep bit.
# Each stage is the same formulation its standalone catalog entry uses
# (same SQL fragments), so the funnel inherits their oracle parity and
# their scale shapes: two digest/shingle shuffles + broadcast-sized
# joins, nothing new materializes.


@register(
    "corpus_curation_funnel",
    f"""
    WITH base AS (
      SELECT doc_id, text, {_SPLIT_SQL} AS split FROM documents
    ), q AS (
      SELECT doc_id,
        (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), ' +')) END) >= 10
              THEN 1 ELSE 0 END
         + CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g'))
                     / greatest(length(text), 1) < 0.2
                THEN 1 ELSE 0 END) >= 2 AS quality_keep
      FROM documents
    ), reps AS (
      SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)
    ), tr AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle
      FROM base WHERE split = 'train'
    ), te AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle
      FROM base WHERE split = 'test'
    ), contaminated AS (
      SELECT DISTINCT train_id AS doc_id FROM (
        SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
               count(*) AS n_shared
        FROM tr JOIN te ON tr.shingle = te.shingle
        GROUP BY 1, 2
      ) WHERE n_shared >= 4
    )
    SELECT b.doc_id, b.split,
           q.quality_keep,
           (reps.keep_id IS NOT NULL) AS dedup_keep,
           (c.doc_id IS NOT NULL) AS contaminated,
           (q.quality_keep AND reps.keep_id IS NOT NULL
            AND c.doc_id IS NULL) AS final_keep
    FROM base b
    JOIN q ON q.doc_id = b.doc_id
    LEFT JOIN reps ON reps.keep_id = b.doc_id
    LEFT JOIN contaminated c ON c.doc_id = b.doc_id
    """,
    doc="The end-to-end curation funnel as ONE declarative plan: hash "
        "split + quality gate (length & digit-ratio rules) + exact-dup "
        "representative election + train/test 3-gram decontamination, "
        "emitting the per-document manifest (split, each gate's bit, "
        "final_keep) a training run consumes. Composes the standalone "
        "entries' own SQL fragments, so scale shape is two bounded-key "
        "shuffles plus manifest-sized joins — the funnel itself adds "
        "no new materialization.",
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select("doc_id", "text", _split_col().alias("split"))

    n_words = F.when(
        F.length(F.trim("text")) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim("text"), " +")))
    digit_ratio = F.length(
        F.regexp_replace("text", "[^0-9]", "")
    ) / F.greatest(F.length("text"), F.lit(1))
    # quality_keep is row-local (a pure function of text), so it rides
    # base's own projection (r12) instead of the oracle's separate q
    # CTE joined back on doc_id — that join re-scanned the corpus and,
    # at scale, shuffled it twice (corpus ⋈ corpus on doc_id) to
    # attach a bit each row can compute in place. doc_id is unique, so
    # inner-join-on-doc_id ≡ inline: values identical, oracle text
    # unchanged (the DESCRIBE'd oracle keeps its q CTE).
    quality_keep = (
        (F.when(n_words >= 10, 1).otherwise(0)
         + F.when(digit_ratio < 0.2, 1).otherwise(0)) >= 2
    ).alias("quality_keep")

    reps = (
        docs.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )

    train = dd.shingle_table(base.filter(F.col("split") == "train"))
    test = dd.shingle_table(base.filter(F.col("split") == "test")).select(
        F.col("doc_id").alias("test_id"), "shingle"
    )
    contaminated = (
        train.withColumnRenamed("doc_id", "train_id")
        .join(test, "shingle")
        .groupBy("train_id", "test_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 4)
        .select(F.col("train_id").alias("c_id"))
        .distinct()
    )

    return (
        base.select("doc_id", "split", quality_keep)
        .join(reps, F.col("doc_id") == reps.keep_id, "left")
        .join(contaminated, F.col("doc_id") == contaminated.c_id, "left")
        .select(
            "doc_id",
            "split",
            "quality_keep",
            F.col("keep_id").isNotNull().alias("dedup_keep"),
            F.col("c_id").isNotNull().alias("contaminated"),
            (
                F.col("quality_keep")
                & F.col("keep_id").isNotNull()
                & F.col("c_id").isNull()
            ).alias("final_keep"),
        )
    )


@register(
    "dedup_containment",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle
             AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_inter,
           round(CAST(n_inter AS DOUBLE)
                 / CAST(least(sa.n_shingles, sb.n_shingles) AS DOUBLE), 6)
             AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE)
          / CAST(least(sa.n_shingles, sb.n_shingles) AS DOUBLE) >= 0.8
    """,
    doc="Containment near-dup pairs (Broder's asymmetric measure): "
        "|A∩B| / min(|A|,|B|) >= 0.8 catches a short doc embedded in "
        "a longer one, which symmetric Jaccard misses (the quote/"
        "boilerplate-inclusion case). Same inverted-index equi-join "
        "pair generator as the Jaccard entry — only the normalizer "
        "changes, so the scale shape is identical.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingle_table(docs, n=3)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("size_b")
    )
    cont = F.col("n_inter").cast("double") / F.least(
        "size_a", "size_b"
    ).cast("double")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(cont >= 0.8)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            F.round(cont, 6).alias("containment"),
        )
    )


@register(
    "dedup_incremental_ingest",
    """
    WITH seen AS (
      SELECT DISTINCT md5(text) AS digest FROM documents
      WHERE doc_id % 2 = 0
    ), batch AS (
      SELECT doc_id, md5(text) AS digest FROM documents
      WHERE doc_id % 2 = 1
    )
    SELECT b.doc_id, b.digest, (seen.digest IS NOT NULL) AS is_known
    FROM batch b LEFT JOIN seen ON seen.digest = b.digest
    """,
    doc="Incremental-ingest dedup: a new batch (odd ids) checked "
        "against the standing corpus digest set (even ids) by one "
        "digest equi-join — the shape of continuous corpus ingestion, "
        "where the state is a digest table, not the corpus itself. At "
        "100 TB the digest set is the only thing the join touches "
        "(32 bytes/doc), and bucketing both sides by digest makes the "
        "nightly merge exchange-free.",
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seen = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
        .withColumn("known", F.lit(1))
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5("text").alias("digest")
    )
    return batch.join(seen, "digest", "left").select(
        "doc_id",
        "digest",
        F.col("known").isNotNull().alias("is_known"),
    )


@register(
    "corpus_sequence_pack",
    """
    WITH sized AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), ' +')) AS n_tokens,
             md5(concat('shuf:', CAST(doc_id AS VARCHAR))) AS shuffle_key
      FROM documents WHERE length(trim(text)) > 0
    ), packed AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS start_offset
      FROM sized
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // 2048 AS BIGINT) AS seq_id,
           CAST(start_offset % 2048 AS BIGINT) AS offset_in_seq
    FROM packed
    """,
    doc="Sequence packing for training: deterministic corpus shuffle, "
        "running token offset, docs assigned to fixed 2048-token "
        "sequences by start offset (boundary docs span into the next "
        "sequence — the standard concat-then-chunk packing). All "
        "integer arithmetic via the two-pass range-partitioned cumsum "
        "(operators.windows.global_running_sum — no single-partition "
        "window); the same deterministic order the token-budget entry "
        "uses, so the two compose into one dataloader manifest.",
)
def corpus_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(dd.split_words(F.col("text"))).alias("n_tokens"),
            F.md5(
                F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))
            ).alias("shuffle_key"),
        )
    )
    packed = global_running_sum(
        docs,
        ["shuffle_key", "doc_id"],
        "n_tokens",
        "cum_tokens",
        bucket=_md5_prefix_bucket("shuffle_key"),
    ).withColumn("start_offset", F.col("cum_tokens") - F.col("n_tokens"))
    return packed.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("start_offset").cast("long").alias("start_offset"),
        F.expr("start_offset div 2048").cast("long").alias("seq_id"),
        (F.col("start_offset") % 2048).cast("long").alias("offset_in_seq"),
    )


# ----------------------------------------------------- overlap chunking
@register(
    "corpus_chunk_overlap",
    """
    WITH sized AS (
      SELECT doc_id, len(string_split_regex(trim(text), ' +')) AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
    ), chunks AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(0,
               CAST(ceil(n_tokens / 96.0) AS BIGINT) - 1)) AS chunk_idx
      FROM sized
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * 96 AS BIGINT) AS tok_start,
           CAST(least(chunk_idx * 96 + 128, n_tokens) AS BIGINT) AS tok_end
    FROM chunks
    """,
    doc="Sliding-window chunk manifest: 128-token chunks at stride 96 "
        "(32-token overlap), one row per (doc, chunk) with token "
        "offsets — the RAG/embedding chunking step as pure integer "
        "row-generation (sequence + explode; no text is copied, the "
        "chunk slicing itself happens at read time from the "
        "offsets). Per-row generation, zero shuffle, fan-out bounded "
        "by ceil(n_tokens/96) per doc.",
)
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    sized = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(dd.split_words(F.col("text"))).alias("n_tokens"),
        )
    )
    chunks = sized.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.ceil(F.col("n_tokens") / 96.0).cast("long") - 1,
            )
        ).alias("chunk_idx"),
    )
    return chunks.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * 96).cast("long").alias("tok_start"),
        F.least(F.col("chunk_idx") * 96 + 128, F.col("n_tokens"))
        .cast("long")
        .alias("tok_end"),
    )


# -------------------------------------------------- weighted sampling
# Efraimidis–Spirakis exponential race: key_i = -ln(u_i)/w_i with u_i
# a deterministic md5-uniform in (0,1]; the k smallest keys are a
# weighted sample without replacement. ONE shared SQL text for both
# engines; the key quantizes to integer nano-units with a
# deterministic (race, doc_id) tiebreak, so the top-k sets are
# identical cross-engine.
_WS_KEY_SQL = (
    "CAST(floor(-ln((CAST(h AS DOUBLE) + 1.0) / 1048576.0) / "
    "CAST(n_tokens AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT)"
)


@register(
    "corpus_weighted_sample",
    f"""
    WITH sized AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), ' +')) AS n_tokens,
             CAST(('0x' || substr(md5(concat('ws:',
               CAST(doc_id AS VARCHAR))), 1, 5)) AS BIGINT) AS h
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           {_WS_KEY_SQL} AS race_nano
    FROM sized
    ORDER BY race_nano, doc_id LIMIT 100
    """,
    doc="Deterministic weighted sampling without replacement "
        "(Efraimidis–Spirakis 2006): per-doc exponential race key "
        "-ln(u)/w with u a salted-md5 uniform and w = token count, "
        "k=100 smallest keys win — longer docs proportionally more "
        "likely, reproducible across engines/runs/partitionings "
        "(which rand()-based sampling cannot promise). Executes as "
        "TakeOrderedAndProject: per-partition top-k, only k rows "
        "cross the wire — no global sort at any scale.",
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    sized = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(dd.split_words(F.col("text"))).alias("n_tokens"),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))),
                    1,
                    5,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )
    return (
        sized.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr(_WS_KEY_SQL).alias("race_nano"),
        )
        .orderBy("race_nano", "doc_id")
        .limit(100)
    )


# --------------------------------------------------- mixture sampling
# Domain-mixture resampling: keep rates COMPUTED from the data so the
# surviving corpus matches target language proportions. Totals cancel:
# r_l = t_l * min_k(n_k / t_k) / n_l  (the most underrepresented
# language is the binding constraint and keeps 100%). Targets are
# CAST(x AS DOUBLE) literals (bare decimals fold as DECIMAL in
# DuckDB); the per-row uniform is the usual md5-prefix rational, so
# the u < r comparison sees identical doubles in both engines.
_MIX_TARGETS = (("en", "0.40"), ("zh", "0.15"), ("es", "0.15"),
                ("de", "0.15"), ("fr", "0.15"))
_MIX_VALUES_SQL = ", ".join(
    f"('{lang}', CAST({w} AS DOUBLE))" for lang, w in _MIX_TARGETS
)
_MIX_RATE_SQL = "w * m / CAST(n_l AS DOUBLE)"
_MIX_U_SQL = (
    "CAST(('0x' || substr(md5(concat('mix:', CAST(doc_id AS VARCHAR))), "
    "1, 5)) AS BIGINT) / CAST(1048576 AS DOUBLE)"
)


@register(
    "corpus_mixture_sample",
    f"""
    WITH tgt(lang, w) AS (VALUES {_MIX_VALUES_SQL}),
    counts AS (
      SELECT lang, count(*) AS n_l FROM documents GROUP BY lang
    ), joined AS (
      SELECT c.lang, c.n_l, t.w FROM counts c JOIN tgt t ON t.lang = c.lang
    ), bind AS (
      SELECT min(CAST(n_l AS DOUBLE) / w) AS m FROM joined
    ), rates AS (
      SELECT lang, n_l, w, {_MIX_RATE_SQL} AS r
      FROM joined CROSS JOIN bind
    )
    SELECT d.doc_id, d.lang,
           CAST(floor(r.r * 1000000.0 + 0.5) AS BIGINT) AS rate_micro,
           ({_MIX_U_SQL}) < r.r AS kept
    FROM documents d JOIN rates r ON r.lang = d.lang
    """,
    doc="Data-mixture resampling: per-language keep rates computed "
        "from the corpus itself so the kept set matches target "
        "proportions (en 40% / others 15%), binding language keeps "
        "100%. One bounded-key count agg broadcast back as rates, one "
        "per-row hash threshold — deterministic, stable under corpus "
        "growth, zero extra shuffle. The domain-mixing step of "
        "pretraining corpus assembly with the thresholds derived, not "
        "hardcoded (corpus_sample_stratified is the fixed-rate twin).",
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    tgt = spark.createDataFrame(
        [(lang, float(w)) for lang, w in _MIX_TARGETS], "lang string, w double"
    )
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    joined = counts.join(tgt, "lang")
    bind = joined.agg(
        F.min(F.col("n_l").cast("double") / F.col("w")).alias("m")
    )
    rates = joined.crossJoin(F.broadcast(bind)).select(
        "lang", "n_l", "w", F.expr(_MIX_RATE_SQL).alias("r")
    )
    # u mirrors _MIX_U_SQL with F functions (Spark's parser rejects
    # CAST(AS VARCHAR)); same hash prefix / 2^20 rational either way
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
                1,
                5,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(1048576).cast("double")
    )
    return docs.join(F.broadcast(rates), "lang").select(
        "doc_id",
        "lang",
        F.floor(F.col("r") * 1000000.0 + 0.5).cast("long").alias(
            "rate_micro"
        ),
        (u < F.col("r")).alias("kept"),
    )


# ------------------------------------------------- length bucketing
@register(
    "corpus_length_batches",
    """
    WITH sized AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), ' +')) AS n_tokens,
             substr(md5(concat('shard:', CAST(doc_id AS VARCHAR))), 1, 1)
               AS shard
      FROM documents WHERE length(trim(text)) > 0
    ), bucketed AS (
      SELECT doc_id, n_tokens, shard,
             CASE WHEN n_tokens < 16 THEN 3 WHEN n_tokens < 32 THEN 4
                  WHEN n_tokens < 64 THEN 5 ELSE 6 END AS bucket
      FROM sized
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY bucket, shard ORDER BY doc_id) - 1 AS rn
      FROM bucketed
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(bucket AS BIGINT) AS bucket, shard,
           CAST(rn // 8 AS BIGINT) AS batch_in_shard,
           CAST(rn % 8 AS BIGINT) AS pos_in_batch
    FROM ranked
    """,
    doc="Length-bucketed batching (the dataloader step that minimizes "
        "padding): docs binned by power-of-two token-length thresholds "
        "(integer CASE ladder — no log2 ulps), sharded by an md5 "
        "prefix, then batched 8-per-batch within (bucket, shard) by a "
        "partitioned row_number. The window partitions are "
        "(buckets x 16 shards) hash-sized slices — bounded sorts at "
        "any corpus size (more hex chars = more shards at 100 TB), "
        "the same shard-then-batch layout real dataloaders use.",
)
def corpus_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sized = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(dd.split_words(F.col("text"))).alias("n_tokens"),
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
                1,
                1,
            ).alias("shard"),
        )
    )
    bucketed = sized.withColumn(
        "bucket",
        F.when(F.col("n_tokens") < 16, 3)
        .when(F.col("n_tokens") < 32, 4)
        .when(F.col("n_tokens") < 64, 5)
        .otherwise(6),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("doc_id")
    ranked = bucketed.withColumn("rn", F.row_number().over(w) - 1)
    return ranked.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("bucket").cast("long").alias("bucket"),
        "shard",
        F.expr("rn div 8").cast("long").alias("batch_in_shard"),
        (F.col("rn") % 8).cast("long").alias("pos_in_batch"),
    )


# ---------------------------------------- cross-source dup matrix
@register(
    "corpus_cross_source_dups",
    """
    WITH d AS (
      SELECT source,
             md5(array_to_string(
               (string_split_regex(trim(text), ' +'))[1:3], ' '))
               AS digest
      FROM documents
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(DISTINCT a.digest) AS BIGINT) AS n_shared
      FROM d a JOIN d b
        ON a.digest = b.digest AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, n_shared FROM pairs
    """,
    doc="Cross-source duplication matrix: for every source pair, how "
        "many distinct head fingerprints (md5 of the first 3 tokens "
        "— the template/boilerplate key; swap in the full-text "
        "digest for exact mirrors) appear in both — the provenance "
        "diagnostic that decides which feeds to deduplicate against "
        "which. The fingerprint equi-join is the same inverted-index "
        "shape as exact dedup; the matrix is |sources|²-bounded.",
)
def corpus_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.md5(
            F.array_join(
                F.slice(F.split(F.trim("text"), " +"), 1, 3), " "
            )
        ).alias("digest"),
    )
    a = d.select(
        F.col("source").alias("source_a"), F.col("digest")
    )
    b = d.select(
        F.col("source").alias("source_b"), F.col("digest")
    )
    return (
        a.join(b, "digest")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("digest").cast("long").alias("n_shared"))
    )


# ------------------------------------- URL canonicalization dedup
# The documents table carries no URL column, so the generator below is
# part of the shared plan text — a pure function of doc_id evaluated
# token-identically in both engines. The operator under test is the
# CANONICALIZATION (the CommonCrawl-style primitive crawl dedup runs
# before any content hash): lowercase scheme+host, strip default
# ports, collapse duplicate slashes, strip trailing slash, drop
# fragments, drop utm_* tracking params (param-level filter — real
# params survive), and sort the surviving query params. Three
# consecutive doc_ids share one logical page (pk = doc_id - doc_id%3)
# and differ only in decorations a crawler sees, so canonical groups
# are real multi-doc dup clusters.
#
# Per the unrolled-steps rule (CLAUDE.md: one materialized column per
# step, never nested expressions), each step references only the
# PREVIOUS materialized column: Spark chains withColumn, the oracle
# chains CTEs — same step texts. Only the split/sort/join function
# NAMES differ between the engines (semantics probed identical,
# including the empty-query edge: coalesce('') covers DuckDB's
# NULL join-of-empty-list where Spark returns '').
_URL_ENGINE_FNS = {
    "spark": {"split_amp": "split(qraw, '[&]')", "sort": "array_sort",
              "join": "array_join"},
    "duck": {"split_amp": "string_split(qraw, '&')", "sort": "list_sort",
             "join": "array_to_string"},
}

_URL_HOST = "concat('www.mirror', CAST(pk % 7 AS STRING), '.example.com')"

_URL_STEP_TEXTS: tuple[tuple[str, str], ...] = (
    # -- synthetic messy URL (the fixture half, still shared text)
    ("pk", "doc_id - (doc_id % 3)"),
    ("scheme_base", "CASE WHEN pk % 2 = 0 THEN 'http' ELSE 'https' END"),
    (
        "u",
        "concat("
        "CASE WHEN doc_id % 3 = 0 THEN upper(scheme_base) "
        "ELSE scheme_base END, '://', "
        f"CASE WHEN doc_id % 2 = 0 THEN upper({_URL_HOST}) "
        f"ELSE {_URL_HOST} END, "
        "CASE WHEN doc_id % 5 = 0 THEN "
        "(CASE WHEN scheme_base = 'http' THEN ':80' ELSE ':443' END) "
        "ELSE '' END, "
        "CASE WHEN doc_id % 7 = 0 THEN '//d/' ELSE '/d/' END, "
        "substring(md5(concat('p:', CAST(pk AS STRING))), 1, 10), "
        "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END, "
        "CASE doc_id % 4 WHEN 0 THEN '?utm_source=rss&page=2&lang=en' "
        "WHEN 1 THEN '?page=2&utm_medium=email&lang=en' "
        "WHEN 2 THEN '?lang=en&page=2' ELSE '' END, "
        "CASE WHEN doc_id % 6 = 0 THEN '#sec-2' ELSE '' END)",
    ),
    # -- canonicalization (the operator)
    ("nofrag", "split_part(u, '#', 1)"),
    ("qraw", "split_part(nofrag, '?', 2)"),
    ("pre", "split_part(nofrag, '?', 1)"),
    ("scheme", "lower(split_part(pre, '://', 1))"),
    ("rest", "substring(pre, length(split_part(pre, '://', 1)) + 4)"),
    ("hostport", "lower(split_part(rest, '/', 1))"),
    (
        "host",
        "CASE WHEN scheme = 'http' AND hostport LIKE '%:80' "
        "THEN left(hostport, length(hostport) - 3) "
        "WHEN scheme = 'https' AND hostport LIKE '%:443' "
        "THEN left(hostport, length(hostport) - 4) ELSE hostport END",
    ),
    ("rawpath", "substring(rest, length(split_part(rest, '/', 1)) + 1)"),
    (
        "path1",
        "CASE WHEN rawpath = '' THEN '/' "
        "ELSE replace(rawpath, '//', '/') END",
    ),
    (
        "path",
        "CASE WHEN path1 LIKE '%/' AND length(path1) > 1 "
        "THEN left(path1, length(path1) - 1) ELSE path1 END",
    ),
    (
        "qcanon",
        "coalesce({join}({sort}(filter({split_amp}, "
        "x -> x <> '' AND NOT x LIKE 'utm!_%' ESCAPE '!')), '&'), '')",
    ),
    (
        "canon_url",
        "concat(scheme, '://', host, path, "
        "CASE WHEN qcanon <> '' THEN concat('?', qcanon) ELSE '' END)",
    ),
)


def _url_steps(engine: str) -> list[tuple[str, str]]:
    fns = _URL_ENGINE_FNS[engine]
    return [(n, t.format(**fns)) for n, t in _URL_STEP_TEXTS]


def _url_canon_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents").select("doc_id")
    for name, expr in _url_steps("spark"):
        df = df.withColumn(name, F.expr(expr))
    return df


def _url_canon_oracle_with() -> tuple[str, str]:
    """WITH-chain prefix + final CTE name for the canon pipeline."""
    ctes = ["s0 AS (SELECT doc_id FROM documents)"]
    prev = "s0"
    for i, (name, expr) in enumerate(_url_steps("duck"), 1):
        ctes.append(f"s{i} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = f"s{i}"
    return "WITH " + ",\n".join(ctes), prev


def _url_dedup_oracle() -> str:
    with_text, last = _url_canon_oracle_with()
    return (
        f"{with_text}\n"
        f"SELECT canon_url, min(doc_id) AS keep_id, "
        f"CAST(count(*) AS BIGINT) AS dup_count FROM {last} "
        f"GROUP BY canon_url"
    )


def _host_dups_oracle() -> str:
    with_text, last = _url_canon_oracle_with()
    return (
        f"{with_text}\n"
        f"SELECT host, CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(count(DISTINCT canon_url) AS BIGINT) AS n_pages, "
        f"CAST(count(*) - count(DISTINCT canon_url) AS BIGINT) "
        f"AS n_dup_docs FROM {last} GROUP BY host"
    )


@register(
    "dedup_url_canonical",
    _url_dedup_oracle,
    doc="URL-level dedup via canonicalization (VERDICT r11 item 7's "
        "host/URL twin of corpus_cross_source_dups): deterministic "
        "messy-URL fixture → 13-step shared-text canonicalization "
        "(case-fold scheme/host, default-port strip, slash collapse, "
        "trailing-slash strip, fragment drop, utm_* param filter, "
        "param sort) → hash-groupBy on the canonical URL with min-id "
        "representative. Pure per-row projections + one map-side "
        "partial agg — linear at any corpus size, no window, no "
        "broadcast.",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = _url_canon_spark(spark, sf_dir)
    return canon.groupBy("canon_url").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("dup_count"),
    )


@register(
    "corpus_host_dups",
    _host_dups_oracle,
    doc="Host-level duplication rollup on the same canonical-URL "
        "pipeline: per host, how many docs resolve there, how many "
        "distinct canonical pages they cover, and the dup surplus — "
        "the crawl-budget diagnostic that decides which hosts to "
        "re-crawl vs dedup. count(DISTINCT canon_url) expands to the "
        "standard two-phase agg; host cardinality is bounded so the "
        "final agg is tiny at any scale.",
)
def corpus_host_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    canon = _url_canon_spark(spark, sf_dir)
    return canon.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("canon_url").cast("long").alias("n_pages"),
        (F.count(F.lit(1)) - F.countDistinct("canon_url"))
        .cast("long")
        .alias("n_dup_docs"),
    )


# -------------------------------------------- training-data flagship
@register(
    "pipeline_training_manifest",
    f"""
    WITH base AS (
      SELECT doc_id, text, {_SPLIT_SQL} AS split FROM documents
    ), q AS (
      SELECT doc_id,
        (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), ' +')) END) >= 10
              THEN 1 ELSE 0 END
         + CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g'))
                     / greatest(length(text), 1) < 0.2
                THEN 1 ELSE 0 END) >= 2 AS quality_keep
      FROM documents
    ), reps AS (
      SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)
    ), tr AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle
      FROM base WHERE split = 'train'
    ), te AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle
      FROM base WHERE split = 'test'
    ), contaminated AS (
      SELECT DISTINCT train_id AS doc_id FROM (
        SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
               count(*) AS n_shared
        FROM tr JOIN te ON tr.shingle = te.shingle
        GROUP BY 1, 2
      ) WHERE n_shared >= 4
    ), kept AS (
      SELECT b.doc_id, b.text FROM base b
      JOIN q ON q.doc_id = b.doc_id
      LEFT JOIN reps ON reps.keep_id = b.doc_id
      LEFT JOIN contaminated c ON c.doc_id = b.doc_id
      WHERE b.split = 'train' AND q.quality_keep
        AND reps.keep_id IS NOT NULL AND c.doc_id IS NULL
    ), sized AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), ' +')) AS n_tokens,
             md5(concat('shuf:', CAST(doc_id AS VARCHAR))) AS shuffle_key
      FROM kept WHERE length(trim(text)) > 0
    ), packed AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS start_offset
      FROM sized
    )
    SELECT CAST(start_offset // 2048 AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM packed GROUP BY 1
    """,
    doc="The training-data flagship: curation funnel (split + quality "
        "+ exact-dup election + decontamination, the same fragments "
        "as corpus_curation_funnel) keeps the clean TRAIN documents, "
        "which then pack into fixed 2048-token sequences (the same "
        "deterministic shuffle + range-bucketed running sum as "
        "corpus_sequence_pack) — emitting the per-sequence manifest "
        "(docs started, tokens) a dataloader shards by. The LLM "
        "analog of pipeline_triggers: every stage is an "
        "independently-oracled catalog entry composed into ONE "
        "declarative plan.",
)
def pipeline_training_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    funnel = corpus_curation_funnel(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = (
        funnel.filter(
            (F.col("split") == "train") & F.col("final_keep")
        )
        .select("doc_id")
        .join(docs, "doc_id")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(dd.split_words(F.col("text"))).alias("n_tokens"),
            F.md5(
                F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))
            ).alias("shuffle_key"),
        )
    )
    packed = global_running_sum(
        kept,
        ["shuffle_key", "doc_id"],
        "n_tokens",
        "cum_tokens",
        bucket=_md5_prefix_bucket("shuffle_key"),
    ).withColumn("start_offset", F.col("cum_tokens") - F.col("n_tokens"))
    return (
        packed.select(
            F.expr("start_offset div 2048").cast("long").alias("seq_id"),
            "n_tokens",
        )
        .groupBy("seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


# --------------------------------------------- naive Bayes classifier
# Multinomial naive Bayes over the documents table: fit on the md5
# train split (class = lang), score the held-out docs fully in-plan.
# The fit IS two groupBy count tables — per-(class, token) counts and
# per-class doc counts — i.e. integer sufficient statistics, so both
# engines derive bitwise-identical models with nothing collected to
# the driver. Per-token add-1-smoothed log-likelihoods quantize to
# integer micro-nats BEFORE the per-(doc, class) sum (order-free exact
# reduction, the text_lm_logprob invariant); argmax uses a
# deterministic (score DESC, lang ASC) tiebreak.
_NB_LP_MICRO_SQL = (
    "CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(t_l + v AS DOUBLE)) "
    "* 1000000.0) AS BIGINT)"
)
_NB_PRIOR_MICRO_SQL = (
    "CAST(round(ln(CAST(d_l AS DOUBLE) / CAST(d_all AS DOUBLE)) "
    "* 1000000.0) AS BIGINT)"
)


@register(
    "ml_naive_bayes",
    f"""
    WITH docs AS (
      SELECT doc_id, lang, text, {_SPLIT_SQL} AS split
      FROM documents WHERE length(trim(text)) > 0
    ), tok_tr AS (
      SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM docs WHERE split = 'train'
    ), cls_tok AS (
      SELECT lang, tok, count(*) AS c FROM tok_tr GROUP BY lang, tok
    ), cls_tot AS (
      SELECT lang, sum(c) AS t_l FROM cls_tok GROUP BY lang
    ), vocab AS (
      SELECT count(DISTINCT tok) AS v FROM tok_tr
    ), prior AS (
      SELECT lang, count(*) AS d_l FROM docs WHERE split = 'train'
      GROUP BY lang
    ), prior_tot AS (
      SELECT sum(d_l) AS d_all FROM prior
    ), tok_te AS (
      SELECT doc_id, lang AS actual_lang,
             unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM docs WHERE split <> 'train'
    ), scored2 AS (
      SELECT t.doc_id, t.actual_lang, ct.lang AS cand_lang,
             coalesce(k.c, 0) AS c, ct.t_l, vocab.v
      FROM tok_te t
      CROSS JOIN cls_tot ct
      CROSS JOIN vocab
      LEFT JOIN cls_tok k
        ON k.lang = ct.lang AND k.tok = t.tok
    ), doc_scores AS (
      SELECT s.doc_id, s.actual_lang, s.cand_lang,
             CAST(sum({_NB_LP_MICRO_SQL}) AS BIGINT)
               + max(pm.prior_micro) AS score_micro
      FROM scored2 s
      JOIN (
        SELECT p.lang, {_NB_PRIOR_MICRO_SQL} AS prior_micro
        FROM prior p CROSS JOIN prior_tot
      ) pm ON pm.lang = s.cand_lang
      GROUP BY s.doc_id, s.actual_lang, s.cand_lang
    ), ranked AS (
      SELECT doc_id, actual_lang, cand_lang AS pred_lang, score_micro,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY score_micro DESC, cand_lang ASC
             ) AS rn
      FROM doc_scores
    )
    SELECT doc_id, actual_lang, pred_lang, score_micro,
           CAST(CASE WHEN pred_lang = actual_lang THEN 1 ELSE 0 END
                AS BIGINT) AS is_correct
    FROM ranked WHERE rn = 1
    """,
    doc="Multinomial naive Bayes (add-1 smoothing): class-conditional "
        "token counts + class priors are TWO partial-agg groupBys — "
        "integer sufficient statistics, vocabulary×classes-sized, "
        "broadcast to the scoring join at any corpus scale. Scoring "
        "expands the held-out token stream by |classes| (bounded "
        "factor), sums micro-nat-quantized log-likelihoods exactly, "
        "and argmaxes with a deterministic tiebreak. No driver-side "
        "model state; the 'model' is a DataFrame.",
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "lang", "text", _split_col().alias("split"))
    )
    train = docs.filter(F.col("split") == "train")
    tok_tr = train.select(
        "lang", F.explode(dd.split_words(F.col("text"))).alias("tok")
    )
    cls_tok = tok_tr.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    cls_tot = cls_tok.groupBy("lang").agg(F.sum("c").alias("t_l"))
    vocab = tok_tr.select("tok").distinct().agg(
        F.count("*").alias("v")
    )
    prior = train.groupBy("lang").agg(F.count("*").alias("d_l"))
    prior_tot = prior.agg(F.sum("d_l").alias("d_all"))
    prior_micro = (
        prior.crossJoin(F.broadcast(prior_tot))
        .select("lang", F.expr(_NB_PRIOR_MICRO_SQL).alias("prior_micro"))
    )

    tok_te = docs.filter(F.col("split") != "train").select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        F.explode(dd.split_words(F.col("text"))).alias("tok"),
    )
    cand = cls_tot.select(
        F.col("lang").alias("cand_lang"), "t_l"
    )
    scored = (
        tok_te.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(vocab))
        # cls_tok is (lang x vocab)-sized — Heaps-growing, so the
        # model join is AQE-decided, never force-hinted (r8)
        .join(
            cls_tok.select(
                F.col("lang").alias("cand_lang"),
                F.col("tok").alias("tok"),
                "c",
            ),
            ["cand_lang", "tok"],
            "left",
        )
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .select(
            "doc_id",
            "actual_lang",
            "cand_lang",
            F.expr(_NB_LP_MICRO_SQL).alias("lp_micro"),
        )
    )
    doc_scores = (
        scored.groupBy("doc_id", "actual_lang", "cand_lang")
        .agg(F.sum("lp_micro").cast("long").alias("ll_micro"))
        .join(
            F.broadcast(
                prior_micro.select(
                    F.col("lang").alias("cand_lang"), "prior_micro"
                )
            ),
            "cand_lang",
        )
        .select(
            "doc_id",
            "actual_lang",
            F.col("cand_lang").alias("pred_lang"),
            (F.col("ll_micro") + F.col("prior_micro")).alias("score_micro"),
        )
    )
    # argmax by (score desc, lang asc) as min(struct(-score, lang)) —
    # a map-side-combinable partial agg instead of a window sort +
    # row_number filter (prefer-max-struct-over-window invariant,
    # r12). score_micro is BIGINT so negation is exact; (doc_id,
    # pred_lang) rows are unique after the per-candidate sum, so the
    # struct order is total and the selected row is identical to the
    # oracle's row_number(ORDER BY score_micro DESC, cand_lang) = 1.
    # actual_lang is functionally dependent on doc_id and rides as a
    # group key.
    best = (
        doc_scores.groupBy("doc_id", "actual_lang")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score_micro")).alias("ns"), "pred_lang"
                )
            ).alias("m")
        )
        .select(
            "doc_id",
            "actual_lang",
            F.col("m.pred_lang").alias("pred_lang"),
            (-F.col("m.ns")).alias("score_micro"),
        )
    )
    return best.select(
        "doc_id",
        "actual_lang",
        "pred_lang",
        "score_micro",
        F.when(F.col("pred_lang") == F.col("actual_lang"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_correct"),
    )


# ------------------------------------------- passage-level dedup
# CCNet-shape sub-document dedup: docs are chunked into consecutive
# 8-token blocks, blocks whose hash appears in >= 2 DISTINCT docs are
# boilerplate and removed, and the surviving blocks reassemble into a
# cleaned document (ordered reduction — DuckDB's ORDER BY string_agg
# vs Spark's array_sort(collect_list(struct(pos, ...))) are the same
# deterministic fold). Output reports the cleaned digest, not the
# text, so the row stays bounded.
_PD_BLOCK = 8


@register(
    "corpus_passage_dedup",
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), ' +')) AS tok,
             generate_subscripts(
               string_split_regex(trim(text), ' +'), 1) AS pos
      FROM documents WHERE length(trim(text)) > 0
    ), blocks AS (
      SELECT doc_id, (pos - 1) // {_PD_BLOCK} AS block_id,
             string_agg(tok, ' ' ORDER BY pos) AS block_text,
             CAST(count(*) AS BIGINT) AS n_toks
      FROM tok GROUP BY doc_id, (pos - 1) // {_PD_BLOCK}
    ), hb AS (
      SELECT doc_id, block_id, block_text, n_toks, md5(block_text) AS h
      FROM blocks
    ), boiler AS (
      SELECT h FROM hb GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), kept AS (
      SELECT * FROM hb WHERE h NOT IN (SELECT h FROM boiler)
    ), stats AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_kept_blocks,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens_kept,
             md5(string_agg(block_text, ' ' ORDER BY block_id))
               AS clean_digest
      FROM kept GROUP BY doc_id
    ), tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks FROM hb
      GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_blocks,
           CAST(t.n_blocks - coalesce(s.n_kept_blocks, 0) AS BIGINT)
             AS n_removed,
           CAST(coalesce(s.n_tokens_kept, 0) AS BIGINT)
             AS n_tokens_kept,
           coalesce(s.clean_digest, md5('')) AS clean_digest
    FROM tot t LEFT JOIN stats s ON s.doc_id = t.doc_id
    """,
    doc="Passage-level (sub-document) dedup, the CCNet/C4 boilerplate "
        "remover: 8-token blocks hashed, blocks shared by >=2 distinct "
        "docs dropped, survivors reassembled in block order. Two "
        "digest-keyed partial-agg groupBys + one anti join on the "
        "boilerplate digest set — every shuffle key is a bounded "
        "md5; no cross join, no window. The ordered reassembly is a "
        "per-doc fold over that doc's blocks only.",
)
def corpus_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", dd.split_words(F.col("text")).alias("__words"))
    )
    tok = docs.select(
        "doc_id", F.posexplode("__words").alias("pos0", "tok")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        (F.col("pos0") / _PD_BLOCK).cast("long").alias("block_id"),
        "tok",
    )
    blocks = (
        tok.groupBy("doc_id", "block_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda x: x.tok,
                ),
                " ",
            ).alias("block_text"),
            F.count("*").cast("long").alias("n_toks"),
        )
        .withColumn("h", F.md5("block_text"))
    )
    boiler = (
        blocks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    kept = blocks.join(boiler, "h", "left_anti")
    stats = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept_blocks"),
        F.sum("n_toks").cast("long").alias("n_tokens_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("block_id", "block_text"))
                    ),
                    lambda x: x.block_text,
                ),
                " ",
            )
        ).alias("clean_digest"),
    )
    tot = blocks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_blocks")
    )
    return tot.join(stats, "doc_id", "left").select(
        "doc_id",
        "n_blocks",
        (F.col("n_blocks") - F.coalesce("n_kept_blocks", F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce("n_tokens_kept", F.lit(0))
        .cast("long")
        .alias("n_tokens_kept"),
        F.coalesce("clean_digest", F.md5(F.lit(""))).alias("clean_digest"),
    )


# ------------------------------------------- BPE tokenizer training
# In-engine tokenizer training (Sennrich et al. 2016): BPE merge
# rules are fit from the word-frequency table — ONE corpus-scale
# groupBy, capped to the top-4096 words by (count DESC, word ASC) —
# by a deterministic pure-Python fold shared by both engines (the
# hist-GBT sufficient-statistic pattern: the engine never collects a
# fact table, only the bounded vocab frame). The learned merges embed
# as a chain of plain replace() calls over the space-separated
# character representation (leftmost replace-all is identical in
# Spark, DuckDB, and the fit itself), so fit-time and apply-time
# tokenizations agree bitwise.
_BPE_MEMO: dict[str, list] = {}


def _bpe_merges_spark(spark: SparkSession, sf_dir: str) -> list:
    from ibf_typhoon_data_pipeline_spark.operators.bpe import (
        bpe_stats_sql,
        fit_bpe_merges,
    )

    if sf_dir not in _BPE_MEMO:
        tok = (
            load_table(spark, sf_dir, "documents")
            .filter(F.length(F.trim("text")) > 0)
            .select(F.explode(dd.split_words(F.col("text"))).alias("word"))
        )
        tok.createOrReplaceTempView("bpe_tok")
        rows = spark.sql(bpe_stats_sql("bpe_tok")).collect()
        _BPE_MEMO[sf_dir] = fit_bpe_merges([(r[0], r[1]) for r in rows])
    return _BPE_MEMO[sf_dir]


def _bpe_oracle() -> str:
    """Lazy oracle: refit the SAME merges from the SAME bounded
    word-frequency statistics in DuckDB, then apply the identical
    replace chain (shared SQL text) to count per-doc BPE tokens."""
    import duckdb

    from ibf_typhoon_data_pipeline_spark.operators.bpe import (
        BPE_TOKCOUNT_SQL,
        bpe_merge_sql,
        bpe_stats_sql,
        fit_bpe_merges,
    )
    import os

    # the driver's oracle comparison always runs at sf0.01
    SF_ORACLE = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_ORACLE}/documents.parquet'"
    )
    con.execute(
        "CREATE VIEW bpe_tok AS SELECT unnest(string_split_regex("
        "trim(text), ' +')) AS word FROM documents "
        "WHERE length(trim(text)) > 0"
    )
    merges = fit_bpe_merges(
        [tuple(r) for r in con.execute(bpe_stats_sql("bpe_tok")).fetchall()]
    )
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), ' +')) AS word
      FROM documents WHERE length(trim(text)) > 0
    ), sp AS (
      SELECT doc_id, word,
             array_to_string(string_split(word, ''), ' ') AS spaced
      FROM tok
    ), merged_t AS (
      SELECT doc_id, word, {bpe_merge_sql(merges)} AS merged FROM sp
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(replace(merged, ' ', ''))) AS BIGINT)
             AS n_chars,
           CAST(sum({BPE_TOKCOUNT_SQL}) AS BIGINT) AS n_bpe_tokens,
           round(CAST(sum(length(replace(merged, ' ', ''))) AS DOUBLE)
                 / CAST(sum({BPE_TOKCOUNT_SQL}) AS DOUBLE), 6)
             AS chars_per_token
    FROM merged_t GROUP BY doc_id
    """


@register(
    "corpus_bpe_tokenize",
    _bpe_oracle,  # lazy: DuckDB refits the identical merges on demand
    doc="BPE tokenizer training + application (Sennrich 2016): merge "
        "rules fit from the top-4096 word-frequency rows (one corpus "
        "groupBy — the bounded integer sufficient statistic; real "
        "BPE trains on exactly this table), applied as a pure "
        "replace-chain expression — whole-stage-codegen string ops, "
        "no UDF, no driver-side fact data. Per-doc token counts and "
        "chars-per-token compression; at 100 TB the vocab frame is "
        "KBs and the apply pass is map-side only.",
)
def corpus_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.bpe import (
        BPE_TOKCOUNT_SQL,
        bpe_merge_sql,
    )

    merges = _bpe_merges_spark(spark, sf_dir)
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id", F.explode(dd.split_words(F.col("text"))).alias("word")
        )
    )
    sp = tok.withColumn(
        "spaced", F.expr("array_join(split(word, ''), ' ')")
    )
    merged = sp.withColumn("merged", F.expr(bpe_merge_sql(merges)))
    return merged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.expr("length(replace(merged, ' ', ''))"))
        .cast("long")
        .alias("n_chars"),
        F.sum(F.expr(BPE_TOKCOUNT_SQL)).cast("long").alias("n_bpe_tokens"),
        F.expr(
            "round(CAST(sum(length(replace(merged, ' ', ''))) AS DOUBLE)"
            f" / CAST(sum({BPE_TOKCOUNT_SQL}) AS DOUBLE), 6)"
        ).alias("chars_per_token"),
    )


# ------------------------------------------- logistic regression
# Newton-Raphson logistic fit ENTIRELY in-plan: each Newton step is
# one partial-agg pass whose per-row contributions (w, wx, wx²,
# residual, residual·x) quantize to integer micro-units BEFORE the
# sum — order-free exact reductions — and the 2×2 Hessian solve is
# shared-SQL-text double arithmetic on those identical integers (the
# micro scale cancels in the ratio). Three steps unroll as chained
# 1-row broadcast frames per the repo's unrolled-Newton invariant
# (each step a materialized frame, never nested expressions).
_LOGIT_P = "(1.0 / (1.0 + exp(-(b0 + b1 * x))))"
_LOGIT_ROW_EXPRS = [
    f"CAST(round({_LOGIT_P} * (1.0 - {_LOGIT_P}) * 1000000.0) AS BIGINT)"
    " AS w_micro",
    f"CAST(round({_LOGIT_P} * (1.0 - {_LOGIT_P}) * x * 1000000.0)"
    " AS BIGINT) AS wx_micro",
    f"CAST(round({_LOGIT_P} * (1.0 - {_LOGIT_P}) * x * x * 1000000.0)"
    " AS BIGINT) AS wxx_micro",
    f"CAST(round((CAST(y AS DOUBLE) - {_LOGIT_P}) * 1000000.0) AS BIGINT)"
    " AS r_micro",
    f"CAST(round((CAST(y AS DOUBLE) - {_LOGIT_P}) * x * 1000000.0)"
    " AS BIGINT) AS rx_micro",
]
_LOGIT_SUM_EXPRS = [
    "CAST(sum(w_micro) AS BIGINT) AS sw",
    "CAST(sum(wx_micro) AS BIGINT) AS swx",
    "CAST(sum(wxx_micro) AS BIGINT) AS swxx",
    "CAST(sum(r_micro) AS BIGINT) AS g0",
    "CAST(sum(rx_micro) AS BIGINT) AS g1",
    "max(b0) AS b0",
    "max(b1) AS b1",
]
_LOGIT_DET = (
    "(CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE) "
    "- CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))"
)
_LOGIT_UPDATE_EXPRS = [
    "(b0 + (CAST(swxx AS DOUBLE) * CAST(g0 AS DOUBLE) "
    "- CAST(swx AS DOUBLE) * CAST(g1 AS DOUBLE)) "
    f"/ {_LOGIT_DET}) AS b0",
    "(b1 + (CAST(sw AS DOUBLE) * CAST(g1 AS DOUBLE) "
    "- CAST(swx AS DOUBLE) * CAST(g0 AS DOUBLE)) "
    f"/ {_LOGIT_DET}) AS b1",
]
_LOGIT_STEPS = 3
_LOGIT_OUT_EXPRS = [
    "CAST(count(*) AS BIGINT) AS n",
    "round(max(b0), 6) AS beta0",
    "round(max(b1), 6) AS beta1",
    f"CAST(sum(CASE WHEN {_LOGIT_P} > 0.5 THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_pred_pos",
    f"CAST(sum(CASE WHEN (CASE WHEN {_LOGIT_P} > 0.5 THEN 1 ELSE 0 END)"
    " = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct",
]


def _logistic_oracle() -> str:
    rows = ", ".join(_LOGIT_ROW_EXPRS)
    sums = ", ".join(_LOGIT_SUM_EXPRS)
    upd = ", ".join(_LOGIT_UPDATE_EXPRS)
    steps = []
    prev = "beta0_f"
    for i in range(1, _LOGIT_STEPS + 1):
        steps.append(
            f"""s{i} AS (
      SELECT {sums} FROM (
        SELECT f.y, f.x, {prev}.b0, {prev}.b1, {rows}
        FROM facts f CROSS JOIN {prev}
      ) t
    ), beta{i}_f AS (
      SELECT {upd} FROM s{i}
    )"""
        )
        prev = f"beta{i}_f"
    chain = ", ".join(steps)
    return f"""
    WITH facts AS (
      SELECT CAST(n_chars AS DOUBLE) / 100.0 AS x,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ), beta0_f AS (
      SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1
    ), {chain}
    SELECT {', '.join(_LOGIT_OUT_EXPRS)}
    FROM facts f CROSS JOIN {prev}
    """


@register(
    "ml_logistic_newton",
    _logistic_oracle(),
    doc="Logistic regression (is-English vs doc length) fit by three "
        "unrolled Newton steps, fully distributed: each step is ONE "
        "map-side-quantized partial-agg pass (integer micro-unit "
        "Hessian/gradient sums — exact, order-free), the 2x2 solve is "
        "a 1-row broadcast, and the scoring pass reuses the same "
        "shared sigmoid text. No driver fit, no collected data; "
        "at 100 TB each step costs one scan + a 7-number reduce.",
)
def ml_logistic_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    facts = persist_tracked(
        load_table(spark, sf_dir, "documents").selectExpr(
            "CAST(n_chars AS DOUBLE) / 100.0 AS x",
            "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
        )
    )
    beta = spark.range(1).selectExpr(
        "CAST(0.0 AS DOUBLE) AS b0", "CAST(0.0 AS DOUBLE) AS b1"
    )
    for _ in range(_LOGIT_STEPS):
        stats = (
            facts.crossJoin(F.broadcast(beta))
            .selectExpr("y", "x", "b0", "b1", *_LOGIT_ROW_EXPRS)
            .agg(*[F.expr(e) for e in _LOGIT_SUM_EXPRS])
        )
        beta = stats.selectExpr(*_LOGIT_UPDATE_EXPRS)
    return facts.crossJoin(F.broadcast(beta)).agg(
        *[F.expr(e) for e in _LOGIT_OUT_EXPRS]
    )


# --------------------------------------------- DSIR importance weights
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling", arXiv:2302.03169): score every raw document by the
# log-likelihood ratio of a target distribution vs the raw
# distribution over HASHED n-gram buckets. Here: target = lang='en'
# docs, features = unigrams hashed into 256 md5-prefix buckets.
# Per-bucket smoothed log ratios are quantized to integer micro-nats
# (the text_lm_logprob recipe) so the per-doc reduction is exact
# integer math; the bucket-stat frame is 256 rows — broadcast at any
# corpus scale — and the only fact-sized shuffles are the token
# groupBy(bucket) partial agg and the per-doc sum.
_DSIR_B = 256  # 2 md5 hex chars
_DSIR_LAMBDA_SQL = (
    "CAST(round(ln(((CAST(ct AS DOUBLE) + 1.0) "
    "/ (CAST(t_tot AS DOUBLE) + 256.0)) "
    "/ ((CAST(cr AS DOUBLE) + 1.0) "
    "/ (CAST(r_tot AS DOUBLE) + 256.0))) * 1000000.0) AS BIGINT)"
)
_DSIR_AVG_SQL = (
    "round(CAST(sum(lam_micro) AS DOUBLE) "
    "/ (1000000.0 * CAST(count(*) AS DOUBLE)), 6)"
)


@register(
    "corpus_dsir_weights",
    f"""
    WITH tok AS (
      SELECT doc_id, lang,
             substr(md5(unnest(string_split_regex(trim(text), ' +'))), 1, 2)
               AS bucket
      FROM documents WHERE length(trim(text)) > 0
    ), stats AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS cr,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS ct
      FROM tok GROUP BY bucket
    ), tot AS (
      SELECT CAST(sum(cr) AS BIGINT) AS r_tot,
             CAST(sum(ct) AS BIGINT) AS t_tot FROM stats
    ), lam AS (
      SELECT bucket, {_DSIR_LAMBDA_SQL} AS lam_micro
      FROM stats CROSS JOIN tot
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(lam_micro) AS BIGINT) AS logw_micro,
           {_DSIR_AVG_SQL} AS avg_logw
    FROM tok t JOIN lam USING (bucket)
    GROUP BY t.doc_id
    """,
    doc="DSIR importance weights (Xie et al. 2023): hashed-unigram "
        "(256 md5-prefix buckets) log-likelihood ratio of the "
        "target (lang='en') vs raw corpus, +1-smoothed, per-bucket "
        "ratio quantized to integer micro-nats before the per-doc "
        "sum. Bucket stats = 256-row broadcast frame; resampling "
        "keeps docs ~ exp(logw) downstream.",
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id", "lang", dd.split_words(F.col("text")).alias("__words")
        )
    )
    tok = docs.select(
        "doc_id", "lang", F.explode("__words").alias("__tok")
    ).select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("__tok")), 1, 2).alias("bucket"),
    )
    stats = tok.groupBy("bucket").agg(
        F.count("*").cast("long").alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("ct"),
    )
    tot = stats.agg(
        F.sum("cr").cast("long").alias("r_tot"),
        F.sum("ct").cast("long").alias("t_tot"),
    )
    lam = (
        stats.crossJoin(F.broadcast(tot))
        .select("bucket", F.expr(_DSIR_LAMBDA_SQL).alias("lam_micro"))
    )
    return (
        tok.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("lam_micro").cast("long").alias("logw_micro"),
            F.expr(_DSIR_AVG_SQL).alias("avg_logw"),
        )
    )


# --------------------------------------------- chi-squared term selection
# Classic supervised feature selection (Yang & Pedersen 1997): rank
# vocabulary terms by the chi-squared statistic of the term-presence ×
# class contingency table. All four cells are exact integers from ONE
# document-presence groupBy (+ a 1-row broadcast total); the statistic
# itself is the only double, computed from shared SQL text and rounded
# 6dp BEFORE ranking.
_CHI2_SQL = (
    "CASE WHEN (a + b) = 0 OR (c + d) = 0 OR (a + c) = 0 OR (b + d) = 0 "
    "THEN CAST(0.0 AS DOUBLE) "
    "ELSE round(CAST(a + b + c + d AS DOUBLE) "
    "* pow(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) "
    "- CAST(b AS DOUBLE) * CAST(c AS DOUBLE), 2) "
    "/ (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) "
    "* CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)), 6) END"
)


@register(
    "text_chi2_terms",
    f"""
    WITH tok AS (
      SELECT doc_id, lang = 'en' AS is_en,
             unnest(list_distinct(string_split_regex(trim(text), ' +')))
               AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), terms AS (
      SELECT tok,
             CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS a,
             count(*) AS ab
      FROM tok GROUP BY tok
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en
      FROM documents WHERE length(trim(text)) > 0
    ), abcd AS (
      SELECT tok, a, ab - a AS b, n_en - a AS c,
             (n_all - n_en) - (ab - a) AS d
      FROM terms CROSS JOIN tot
    )
    SELECT tok, a AS n_en_docs, b AS n_other_docs, {_CHI2_SQL} AS chi2
    FROM abcd ORDER BY chi2 DESC, tok LIMIT 20
    """,
    doc="Chi-squared term selection (Yang & Pedersen 1997): "
        "term-presence × class contingency from one distinct-token "
        "groupBy, integer cells, 6dp-rounded statistic, top-20 as "
        "TakeOrderedAndProject — per-partition top-k, only k rows "
        "cross the wire.",
)
def text_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    tok = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_en"),
        F.array_distinct(dd.split_words(F.col("text"))).alias("__words"),
    ).select("doc_id", "is_en", F.explode("__words").alias("tok"))
    terms = tok.groupBy("tok").agg(
        F.sum(F.when(F.col("is_en"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.count("*").alias("ab"),
    )
    tot = docs.agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("n_en"),
    )
    abcd = terms.crossJoin(F.broadcast(tot)).select(
        "tok",
        "a",
        (F.col("ab") - F.col("a")).alias("b"),
        (F.col("n_en") - F.col("a")).alias("c"),
        ((F.col("n_all") - F.col("n_en")) - (F.col("ab") - F.col("a"))).alias(
            "d"
        ),
    )
    return (
        abcd.select(
            "tok",
            F.col("a").alias("n_en_docs"),
            F.col("b").alias("n_other_docs"),
            F.expr(_CHI2_SQL).alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), F.col("tok").asc())
        .limit(20)
    )


# --------------------------------------------- dataset card
# "Datasheets for datasets" (Gebru et al. 2018) summary row: the
# corpus-level statistics a training-data release documents — size,
# exact-duplication rate, token budget, language mix. One scan, two
# partial aggs (doc-level + digest-distinct); every ratio derives
# from exact integer counts and rounds at 6dp.
_CARD_RATIO_LIST = [
    "round(CAST(n_docs - n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)"
    " AS dup_rate",
    "round(CAST(n_en_docs AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)"
    " AS en_share",
    "round(CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)"
    " AS mean_doc_tokens",
]
_CARD_RATIOS = ", ".join(_CARD_RATIO_LIST)


@register(
    "corpus_dataset_card",
    f"""
    WITH doc AS (
      SELECT doc_id, md5(text) AS digest,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), ' +')) END
               AS n_tok,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
      FROM documents
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT digest) AS BIGINT) AS n_unique,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             CAST(sum(is_en) AS BIGINT) AS n_en_docs
      FROM doc
    )
    SELECT n_docs, n_unique, total_tokens, n_en_docs, {_CARD_RATIOS}
    FROM agg
    """,
    doc="Dataset-card summary row (Gebru et al. 2018): corpus size, "
        "exact-dup rate, token budget, language mix — exact integer "
        "counts from one scan (digest distinct is the only second "
        "shuffle), ratios rounded 6dp. The release-documentation op "
        "of a curation pipeline.",
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents").select(
        F.md5("text").alias("digest"),
        F.when(F.length(F.trim("text")) == 0, 0)
        .otherwise(F.size(dd.split_words(F.col("text"))))
        .alias("n_tok"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    agg = doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("digest").cast("long").alias("n_unique"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum("is_en").cast("long").alias("n_en_docs"),
    )
    return agg.selectExpr(
        "n_docs", "n_unique", "total_tokens", "n_en_docs",
        *_CARD_RATIO_LIST,
    )


# --------------------------------------------- CCNet perplexity buckets
# CCNet's signature move (Wenzek et al. 2020 §4.3): split the corpus
# into head/middle/tail THIRDS by LM score (lower mean NLL = more
# fluent = head) and let downstream consumers pick buckets. Thresholds
# are the corpus 1/3 and 2/3 quantiles — Spark percentile() and DuckDB
# quantile_cont() share the (n-1)*q interpolation, and the inputs are
# already 6dp-rounded identical doubles, so the cut points match
# bitwise after 6dp rounding. The threshold frame is ONE row —
# broadcast; bucketing is map-side.
@register(
    "corpus_ppl_buckets",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), freq AS (
      SELECT tok, count(*) AS c FROM tok GROUP BY tok
    ), tot AS (
      SELECT sum(c) AS corpus_tokens FROM freq
    ), scored AS (
      SELECT t.doc_id, {{lp}} AS lp_micro
      FROM tok t JOIN freq USING (tok) CROSS JOIN tot
    ), doc AS (
      SELECT doc_id, {{nll}} AS mean_nll FROM scored GROUP BY doc_id
    ), th AS (
      SELECT round(quantile_cont(mean_nll, 1.0 / 3.0), 6) AS t1,
             round(quantile_cont(mean_nll, 2.0 / 3.0), 6) AS t2
      FROM doc
    )
    SELECT doc_id, mean_nll,
           CASE WHEN mean_nll <= t1 THEN 'head'
                WHEN mean_nll <= t2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM doc CROSS JOIN th
    """.format(lp=_LM_LP_MICRO_SQL, nll=_LM_MEAN_NLL_SQL),
    doc="CCNet head/middle/tail perplexity bucketing (Wenzek et al. "
        "2020): corpus-LM mean NLL per doc, tercile thresholds from "
        "one 1-row quantile agg (broadcast), map-side CASE "
        "assignment — the quality-tier primitive downstream mixture "
        "sampling consumes.",
)
def corpus_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", dd.split_words(F.col("text")).alias("__words"))
    )
    tok = docs.select("doc_id", F.explode("__words").alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("corpus_tokens"))
    scored = (
        # vocab-sized freq: join AQE-decided, not hinted (r8)
        tok.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr(_LM_LP_MICRO_SQL).alias("lp_micro"))
    )
    doc = scored.groupBy("doc_id").agg(
        F.expr(_LM_MEAN_NLL_SQL).alias("mean_nll")
    )
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    doc = persist_tracked(doc)
    th = doc.agg(
        F.expr("round(percentile(mean_nll, 1.0 / 3.0), 6)").alias("t1"),
        F.expr("round(percentile(mean_nll, 2.0 / 3.0), 6)").alias("t2"),
    )
    return doc.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "mean_nll",
        F.when(F.col("mean_nll") <= F.col("t1"), "head")
        .when(F.col("mean_nll") <= F.col("t2"), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


# ------------------------------------------- classifier eval (F1)
# Confusion-matrix summary of the naive-Bayes classifier, defined ON
# TOP of the ml_naive_bayes entry: the oracle embeds that entry's
# registered SQL as a CTE and the Spark side calls its registered
# plan — zero duplicated model logic, so the eval can never drift
# from the classifier it evaluates. Precision/recall/F1 are single
# rationals of exact integer counts, quantized to e6.
def _nb_eval_oracle() -> str:
    from ibf_typhoon_data_pipeline_spark.plans.registry import QUERIES

    nb_sql = QUERIES["ml_naive_bayes"].oracle_text()
    return f"""
    WITH preds AS ({nb_sql}
    ), classes AS (
      SELECT DISTINCT actual_lang AS lang FROM preds
      UNION
      SELECT DISTINCT pred_lang FROM preds
    ), cells AS (
      SELECT c.lang,
             CAST(sum(CASE WHEN p.actual_lang = c.lang
                            AND p.pred_lang = c.lang
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p.pred_lang = c.lang
                            AND p.actual_lang <> c.lang
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN p.actual_lang = c.lang
                            AND p.pred_lang <> c.lang
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM classes c CROSS JOIN preds p
      GROUP BY c.lang
    )
    SELECT lang, tp, fp, fn,
           CAST(CASE WHEN tp + fp > 0 THEN round(
             1000000.0 * tp / (tp + fp)) ELSE 0 END AS BIGINT)
             AS precision_e6,
           CAST(CASE WHEN tp + fn > 0 THEN round(
             1000000.0 * tp / (tp + fn)) ELSE 0 END AS BIGINT)
             AS recall_e6,
           CAST(CASE WHEN 2 * tp + fp + fn > 0 THEN round(
             1000000.0 * 2 * tp / (2 * tp + fp + fn)) ELSE 0 END
             AS BIGINT) AS f1_e6
    FROM cells
    ORDER BY lang
    """


@register(
    "ml_nb_confusion_f1",
    _nb_eval_oracle,
    doc="Per-class precision/recall/F1 of the naive-Bayes language "
        "classifier on the held-out split, computed over the "
        "ml_naive_bayes entry's own registered plan (Spark) and its "
        "own registered SQL as a CTE (oracle) — the eval and the "
        "model share one definition. Counts are exact integers; each "
        "metric is ONE rational rounded once to e6 "
        "(F1 = 2tp/(2tp+fp+fn), no chained float ops). The class "
        "cross join is |classes| x test-docs — bounded small; at "
        "scale the per-class flags fold into one conditional-agg "
        "pass.",
)
def ml_nb_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.plans.registry import QUERIES

    preds = QUERIES["ml_naive_bayes"].fn(spark, sf_dir).select(
        "actual_lang", "pred_lang"
    )
    classes = (
        preds.select(F.col("actual_lang").alias("lang"))
        .union(preds.select("pred_lang"))
        .distinct()
    )
    cells = (
        F.broadcast(classes)
        .crossJoin(preds)
        .groupBy("lang")
        .agg(
            F.sum(
                F.when(
                    (F.col("actual_lang") == F.col("lang"))
                    & (F.col("pred_lang") == F.col("lang")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("tp"),
            F.sum(
                F.when(
                    (F.col("pred_lang") == F.col("lang"))
                    & (F.col("actual_lang") != F.col("lang")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(
                F.when(
                    (F.col("actual_lang") == F.col("lang"))
                    & (F.col("pred_lang") != F.col("lang")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("fn"),
        )
    )
    return cells.selectExpr(
        "lang", "tp", "fp", "fn",
        "CAST(CASE WHEN tp + fp > 0 THEN round("
        "1000000.0 * tp / (tp + fp)) ELSE 0 END AS BIGINT)"
        " AS precision_e6",
        "CAST(CASE WHEN tp + fn > 0 THEN round("
        "1000000.0 * tp / (tp + fn)) ELSE 0 END AS BIGINT)"
        " AS recall_e6",
        "CAST(CASE WHEN 2 * tp + fp + fn > 0 THEN round("
        "1000000.0 * 2 * tp / (2 * tp + fp + fn)) ELSE 0 END AS BIGINT)"
        " AS f1_e6",
    ).orderBy("lang")


# ------------------------------------------------ n-gram novelty
@register(
    "corpus_ngram_novelty",
    f"""
    WITH sp AS (
      SELECT doc_id, text, {_SPLIT_SQL} AS split FROM documents
    ), tr AS (
      SELECT DISTINCT unnest({_sql_shingles(5)}) AS shingle
      FROM sp WHERE split = 'train'
    ), te AS (
      SELECT doc_id, unnest({_sql_shingles(5)}) AS shingle
      FROM sp WHERE split = 'test'
    ), j AS (
      SELECT te.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(count(*) FILTER (WHERE tr.shingle IS NULL) AS BIGINT)
               AS n_novel
      FROM te LEFT JOIN tr ON tr.shingle = te.shingle
      GROUP BY 1
    )
    SELECT doc_id, n_grams, n_novel,
           CAST((2 * n_novel * 1000000 + n_grams) // (2 * n_grams)
             AS BIGINT) AS novelty_micro
    FROM j ORDER BY doc_id
    """,
    doc="N-gram novelty (the memorization/coverage metric of Lee et "
        "al. 2022's dedup analysis, doc-level): per held-out test "
        "document, the fraction of its distinct word 5-grams never "
        "seen in the train split. Complements corpus_decontaminate "
        "(doc-pair leakage): this is the corpus-level overlap RATE, "
        "the number a training-data card reports. The train gram set "
        "is a distinct projection; membership is one inverted-index "
        "LEFT equi-join on the gram (cost Σ bucket², never "
        "train×test); the ratio is an exact integer rounding "
        "division. At 100 TB the gram join shuffles on hash keys — "
        "balanced; the test side is small by construction.",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", _split_col().alias("split")
    )
    tr = (
        dd.shingle_table(docs.filter(F.col("split") == "train"), n=5)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    te = dd.shingle_table(docs.filter(F.col("split") == "test"), n=5)
    return (
        te.join(tr, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.expr("CAST(count_if(__hit IS NULL) AS BIGINT)").alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr(
                "CAST((2 * n_novel * 1000000 + n_grams)"
                " div (2 * n_grams) AS BIGINT)"
            ).alias("novelty_micro"),
        )
        .orderBy("doc_id")
    )


def _fertility_oracle() -> str:
    """Lazy oracle: the corpus_bpe_tokenize refit, regrouped by
    language — fertility (tokens/word) and compression (chars/token)
    as exact integer rounding divisions."""
    import os

    import duckdb

    from ibf_typhoon_data_pipeline_spark.operators.bpe import (
        BPE_TOKCOUNT_SQL,
        bpe_merge_sql,
        bpe_stats_sql,
        fit_bpe_merges,
    )

    SF_ORACLE = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_ORACLE}/documents.parquet'"
    )
    con.execute(
        "CREATE VIEW bpe_tok AS SELECT unnest(string_split_regex("
        "trim(text), ' +')) AS word FROM documents "
        "WHERE length(trim(text)) > 0"
    )
    merges = fit_bpe_merges(
        [tuple(r) for r in con.execute(bpe_stats_sql("bpe_tok")).fetchall()]
    )
    return f"""
    WITH tok AS (
      SELECT lang,
             unnest(string_split_regex(trim(text), ' +')) AS word
      FROM documents WHERE length(trim(text)) > 0
    ), sp AS (
      SELECT lang, word,
             array_to_string(string_split(word, ''), ' ') AS spaced
      FROM tok
    ), merged_t AS (
      SELECT lang, {bpe_merge_sql(merges)} AS merged FROM sp
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum({BPE_TOKCOUNT_SQL}) AS BIGINT) AS n_tokens,
           CAST((2 * sum({BPE_TOKCOUNT_SQL}) * 1000000 + count(*))
                // (2 * count(*)) AS BIGINT) AS fertility_micro,
           CAST((2 * sum(length(replace(merged, ' ', ''))) * 1000000
                 + sum({BPE_TOKCOUNT_SQL}))
                // (2 * sum({BPE_TOKCOUNT_SQL})) AS BIGINT)
             AS chars_per_token_micro
    FROM merged_t GROUP BY lang ORDER BY lang
    """


@register(
    "corpus_tokenizer_fertility",
    _fertility_oracle,  # lazy: DuckDB refits the identical merges
    doc="Tokenizer fertility by language — the tokenizer-quality card "
        "metric (tokens per word; high fertility on a language means "
        "the vocab under-serves it and its documents cost more "
        "sequence length): the corpus_bpe_tokenize replace-chain "
        "tokenizer, regrouped per language, with fertility and "
        "chars-per-token as exact integer rounding divisions. The "
        "merge fit is the same memoized bounded word-frequency "
        "statistic (fit once, shared with the per-doc entry); the "
        "apply pass is whole-stage-codegen string ops, map-side "
        "only, so the per-language card costs one groupBy at any "
        "corpus size.",
)
def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.bpe import (
        BPE_TOKCOUNT_SQL,
        bpe_merge_sql,
    )

    merges = _bpe_merges_spark(spark, sf_dir)
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "lang", F.explode(dd.split_words(F.col("text"))).alias("word")
        )
    )
    sp = tok.withColumn(
        "spaced", F.expr("array_join(split(word, ''), ' ')")
    )
    merged = sp.withColumn("merged", F.expr(bpe_merge_sql(merges)))
    return (
        merged.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.expr(BPE_TOKCOUNT_SQL)).cast("long").alias("n_tokens"),
            F.expr(
                f"CAST((2 * sum({BPE_TOKCOUNT_SQL}) * 1000000 + count(*))"
                " div (2 * count(*)) AS BIGINT)"
            ).alias("fertility_micro"),
            F.expr(
                "CAST((2 * sum(length(replace(merged, ' ', ''))) * 1000000"
                f" + sum({BPE_TOKCOUNT_SQL}))"
                f" div (2 * sum({BPE_TOKCOUNT_SQL})) AS BIGINT)"
            ).alias("chars_per_token_micro"),
        )
        .orderBy("lang")
    )

"""Training-data-pipeline operator catalog over the ``documents``
table: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), text
analysis (language-ID, quality, token counts, fingerprints).

Oracle-parity design: all hashing is md5 hex strings (identical in
Spark and DuckDB); tokenization is ``split(trim(text), ' +')`` ≡
``string_split_regex(trim(text), ' +')``; shingle sets are distinct
(order-free), so engine-specific list ordering cannot leak into
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators import dedup as dd
from ibf_typhoon_data_pipeline_spark.operators import text as tx
from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

# SQL fragment: distinct word n-gram shingles of `text`
def _sql_shingles(n: int) -> str:
    if n == 1:
        return "list_distinct(string_split_regex(trim(text), ' +'))"
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(len(string_split_regex(trim(text), ' +')) - {n - 1}, 1) + 1), "
        f"i -> array_to_string((string_split_regex(trim(text), ' +'))[i:i+{n - 1}], ' ')))"
    )


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS dup_count
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on md5 digest, min-id representative",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_inter,
           round(n_inter / (sa.n_shingles + sb.n_shingles - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter / (sa.n_shingles + sb.n_shingles - n_inter) >= 0.5
    """,
    doc="n-gram Jaccard near-dup pairs via inverted-index self-join — "
        "never a cross join; cost is Σ shingle-bucket², the scalable "
        "all-pairs formulation",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, n=3, threshold=0.5)


@register(
    "dedup_minhash_lsh",
    f"""
    WITH sig AS (
      SELECT doc_id,
        {', '.join(
            "list_min(list_transform(" + _sql_shingles(3)
            + f", s -> substr(md5(concat('{i // 4}:', s)), "
            + f"{1 + 8 * (i % 4)}, 8))) AS mh_{i}"
            for i in range(8)
        )}
      FROM documents
    ), banded AS (
      SELECT doc_id, band_id,
             CASE band_id
               WHEN 0 THEN concat(mh_0, '|', mh_1)
               WHEN 1 THEN concat(mh_2, '|', mh_3)
               WHEN 2 THEN concat(mh_4, '|', mh_5)
               ELSE concat(mh_6, '|', mh_7) END AS band_key
      FROM sig, unnest([0, 1, 2, 3]) AS t(band_id)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           round(({' + '.join(
               f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END"
               for i in range(8)
           )}) / 8.0, 6) AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = id_a
    JOIN sig sb ON sb.doc_id = id_b
    """,
    doc="MinHash(8)+LSH(4 bands × 2): shingle→min-md5 signature → "
        "band-bucket equi-join candidates → signature-overlap estimate; "
        "the 100 TB-safe near-dup candidate generator",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, n=3, num_hashes=8, band_size=2)


def _simhash_sql() -> str:
    tokens = _sql_shingles(1)
    bit_terms = []
    for j in range(32):
        votes = (
            f"list_sum(list_transform(hashes, h -> CASE WHEN "
            f"instr('0123456789abcdef', substr(h, {j + 1}, 1)) > 8 "
            f"THEN 1 ELSE -1 END))"
        )
        bit_terms.append(
            f"CASE WHEN {votes} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END"
        )
    return f"""
    WITH hashed AS (
      SELECT doc_id, list_transform({tokens}, t -> md5(t)) AS hashes
      FROM documents
    )
    SELECT doc_id, ({' + '.join(bit_terms)}) AS simhash FROM hashed
    """


@register(
    "dedup_simhash",
    _simhash_sql(),
    doc="SimHash-32 fingerprint: per-nibble ±1 votes over token md5s; "
        "Hamming-close fingerprints ⇒ near-dups",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_fingerprints(load_table(spark, sf_dir, "documents"))


def _marker_hits_sql(word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((length(concat(' ', text, ' ')) - "
        f"length(replace(concat(' ', text, ' '), '{needle}', ''))) "
        f"/ {len(needle)} AS INTEGER)"
    )


def _lang_score_sql(lang: str) -> str:
    return " + ".join(_marker_hits_sql(w) for w in tx.LANG_MARKERS[lang])


def _langid_sql() -> str:
    scores = {lang: _lang_score_sql(lang) for lang in tx.LANG_MARKERS}
    score_cols = ", ".join(f"({s}) AS score_{lang}" for lang, s in scores.items())
    best = f"greatest({', '.join('score_' + lang for lang in tx.LANG_MARKERS)})"
    ladder = " ".join(
        f"WHEN score_{lang} = __best AND __best > 0 THEN '{lang}'"
        for lang in tx.LANG_MARKERS
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, lang AS true_lang, {score_cols} FROM documents
    ), with_best AS (
      SELECT *, {best} AS __best FROM scored
    )
    SELECT doc_id, true_lang,
           CASE {ladder} ELSE 'und' END AS pred_lang,
           score_en
    FROM with_best
    """


@register(
    "text_langid",
    _langid_sql(),
    doc="Language-ID n-gram/marker-word heuristic (argmax with fixed "
        "tie order); parity-graded, accuracy-irrelevant on word-soup",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = tx.lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        tx.predict_lang(F.col("text")).alias("pred_lang"),
        scores["en"],
    )


@register(
    "text_quality",
    f"""
    WITH feats AS (
      SELECT doc_id,
        length(text) AS n_chars_m,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), ' +')) END AS n_words,
        round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              / greatest(length(text), 1), 6) AS alpha_ratio,
        round(length(regexp_replace(text, '[^0-9]', '', 'g'))
              / greatest(length(text), 1), 6) AS digit_ratio,
        round((length(text) - length(regexp_replace(text, '[^ ]', '', 'g')))
              / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), ' +')) END, 1),
              6) AS mean_word_len,
        round(({_lang_score_sql('en')})
              / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), ' +')) END, 1),
              6) AS stopword_ratio
      FROM documents
    )
    SELECT *,
      round(CAST((CASE WHEN n_words >= 10 THEN 0.25 ELSE 0 END)
      + (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 0.25 ELSE 0 END)
      + (CASE WHEN stopword_ratio > 0 THEN 0.25 ELSE 0 END)
      + (CASE WHEN digit_ratio < 0.2 THEN 0.25 ELSE 0 END) AS DOUBLE), 6)
      AS quality_score,
      ((CASE WHEN n_words >= 10 THEN 0.25 ELSE 0 END)
      + (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 0.25 ELSE 0 END)
      + (CASE WHEN stopword_ratio > 0 THEN 0.25 ELSE 0 END)
      + (CASE WHEN digit_ratio < 0.2 THEN 0.25 ELSE 0 END)) >= 0.75 AS keep
    FROM feats
    """,
    doc="Gopher/C4-style quality features + composite keep score, all "
        "as codegen'd expressions",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dd_quality_select(docs)


def dd_quality_select(docs: DataFrame) -> DataFrame:
    out = tx.quality_score(docs)
    return out.select(
        "doc_id",
        "n_chars_m",
        "n_words",
        "alpha_ratio",
        "digit_ratio",
        "mean_word_len",
        "stopword_ratio",
        "quality_score",
        "keep",
    )


@register(
    "text_token_counts",
    f"""
    SELECT doc_id,
      CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE len(string_split_regex(trim(text), ' +')) END AS ws_tokens,
      len(regexp_extract_all(text, '{tx.BPE_TOKEN_PATTERN}')) AS bpe_tokens
    FROM documents
    """,
    doc="Whitespace + BPE-ish regex token counting",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.whitespace_token_count(F.col("text")).cast("long").alias("ws_tokens"),
        tx.bpe_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           list_min(list_transform(
             range(1, greatest(length(text) - 7, 1) + 1),
             i -> md5(substr(text, CAST(i AS INTEGER), 8))
           )) AS fingerprint
    FROM documents
    """,
    doc="Document fingerprint: min-md5 over 8-char shingles (1-hash "
        "winnowing / rolling-hash scheme)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", tx.fingerprint(F.col("text"), 8).alias("fingerprint")
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT id_a, id_b
      FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter / (sa.n_shingles + sb.n_shingles - n_inter) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(node, seen) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.seen
    ), comp AS (
      SELECT node AS doc_id, min(seen) AS component_id FROM reach GROUP BY node
    )
    SELECT doc_id, component_id,
           CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
             AS cluster_size
    FROM comp
    """,
    doc="Transitive near-dup clustering: n-gram Jaccard >= 0.5 pairs as "
        "the edge set, connected components by iterative min-label "
        "propagation (GraphX's Pregel formulation: one equi-join + one "
        "partial-agg min per superstep, diameter-bounded), component "
        "id = smallest member. The oracle states the fixpoint as a "
        "reachability closure (recursive CTE) - min(reachable ids) per "
        "node, provably what the propagation converges to.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.graph import (
        component_sizes,
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    comps = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id"
    )
    return component_sizes(comps, id_col="doc_id")


# ------------------------------------------------------- BM25 retrieval
# Query terms for the retrieval catalog entry; tf/df/dl are integers in
# both engines, so every BM25 input is binary-exact and the shared
# formula text below (token-for-token in Spark and DuckDB, explicit
# left-associated term sum) produces the same double.
_BM25_TERMS = ("spark", "join", "vector")
_BM25_K1 = "1.2"
_BM25_B = "0.75"


def _bm25_term_sql(i: int) -> str:
    """Lucene-form BM25 contribution of term i:
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)); tf saturation with k1,
    length normalization with b against avgdl."""
    return (
        f"(ln(1.0 + ((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE)) + 0.5)"
        f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * ({_BM25_K1} + 1.0))"
        f" / (CAST(tf_{i} AS DOUBLE) + {_BM25_K1} * ((1.0 - {_BM25_B})"
        f" + {_BM25_B} * CAST(dl AS DOUBLE) / avgdl)))"
    )


_BM25_SCORE_SQL = " + ".join(_bm25_term_sql(i) for i in range(len(_BM25_TERMS)))


# The BM25 pipeline as a spliceable CTE chain ending in `bm25_scored`
# (doc_id, score_r > 0) — text_bm25_topk consumes it directly and the
# hybrid-retrieval entry (plans/vectors.py) splices it next to the
# vector leg, so both entries share ONE formulation.
_BM25_CTES = f"""tk AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS tokens
      FROM documents
    ), tf AS (
      SELECT doc_id, len(tokens) AS dl,
        {', '.join(
            f"len(list_filter(tokens, x -> x = '{t}')) AS tf_{i}"
            for i, t in enumerate(_BM25_TERMS)
        )}
      FROM tk
    ), st AS (
      SELECT count(*) AS n_docs,
        {', '.join(
            f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
            for i in range(len(_BM25_TERMS))
        )},
        CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM tf
    ), bm25_scored AS (
      SELECT doc_id, score_r FROM (
        SELECT doc_id, round({_BM25_SCORE_SQL}, 6) AS score_r
        FROM tf CROSS JOIN st
      ) WHERE score_r > 0.0
    )"""


def bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, score_r) for every doc matching the fixed BM25 query —
    the Spark twin of the `bm25_scored` CTE; shared by text_bm25_topk
    and the hybrid-retrieval fusion entry."""
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), " +").alias("tokens")
    )
    tf = toks.select(
        "doc_id",
        F.size("tokens").alias("dl"),
        *[
            F.size(F.filter(F.col("tokens"), lambda x: x == F.lit(t))).alias(
                f"tf_{i}"
            )
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    st = tf.agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
        (
            F.sum("dl").cast("double") / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    return (
        tf.crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            F.round(F.expr(_BM25_SCORE_SQL), 6).alias("score_r"),
        )
        .filter(F.col("score_r") > 0.0)
    )


@register(
    "text_bm25_topk",
    f"""
    WITH {_BM25_CTES}
    SELECT doc_id, score_r, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT doc_id, score_r,
             row_number() OVER (ORDER BY score_r DESC, doc_id) AS rn
      FROM bm25_scored
    ) WHERE rn <= 10
    """,
    doc="BM25 top-10 retrieval for a fixed term query: tokenize once, "
        "per-term tf as integer columns (no explode-join), one global "
        "stats row (N, df per term, avgdl) broadcast-cross-joined, "
        "score as an explicit left-associated term sum rounded 6dp "
        "before ranking, deterministic doc_id tiebreak. The corpus "
        "side of an LLM retrieval pipeline expressed as two scans and "
        "a broadcast.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scored = bm25_scored(load_table(spark, sf_dir, "documents"))
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition
    # top-k merged on the driver, never a single-partition sort of the
    # full match set; the rank window then runs over k rows only.
    top = scored.orderBy(
        F.col("score_r").desc(), F.col("doc_id").asc()
    ).limit(10)
    w = Window.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id",
        "score_r",
        F.row_number().over(w).cast("int").alias("rank"),
    )


@register(
    "corpus_split",
    """
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'ccd'
                  THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'e66'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic ~80/10/10 train/val/test split: lexicographic "
        "thresholds on the md5(doc_id) hex prefix (0xccd/0x1000 = "
        "80.0%, 0xe66 = 89.99%) - pure per-row expression, no shuffle, "
        "reproducible across engines/runs/partitionings, and stable "
        "under corpus growth (a doc's split never changes when other "
        "docs are added - the property random splits lack).",
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3)
    return docs.select(
        "doc_id",
        F.when(prefix < "ccd", "train")
        .when(prefix < "e66", "val")
        .otherwise("test")
        .alias("split"),
    )


# ------------------------------------------------------ bigram LM
# Add-1-smoothed conditional log-prob as ONE SQL text for both engines
# (repo invariant): all inputs are integer counts, so both engines
# feed ln() identical doubles; the result quantizes to integer
# micro-nats with floor(x*1e6 + 0.5) (CAST truncates in Spark but
# rounds in DuckDB — floor first, always).
_BIGRAM_LP_SQL = (
    "CAST(floor(ln((CAST(c_big AS DOUBLE) + 1.0) / "
    "(CAST(c_first AS DOUBLE) + CAST(v AS DOUBLE))) * 1000000.0 + 0.5) "
    "AS BIGINT)"
)


@register(
    "text_bigram_lm",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), ' +')) AS tok,
             generate_subscripts(string_split_regex(trim(text), ' +'), 1)
               AS pos
      FROM documents WHERE length(trim(text)) > 0
    ), big AS (
      SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM toks
    ), counts AS (
      SELECT tok, nxt, count(*) AS c_big
      FROM big WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), firsts AS (
      SELECT tok, CAST(sum(c_big) AS BIGINT) AS c_first
      FROM counts GROUP BY tok
    ), vocab AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM toks
    )
    SELECT c.tok AS w1, c.nxt AS w2,
           CAST(c.c_big AS BIGINT) AS n_pair,
           f.c_first AS n_first,
           {_BIGRAM_LP_SQL.replace('c_big', 'c.c_big').replace('c_first', 'f.c_first').replace('(v ', '(v.v ')}
             AS logprob_micro_nats
    FROM counts c JOIN firsts f ON f.tok = c.tok CROSS JOIN vocab v
    ORDER BY c.c_big DESC, c.tok, c.nxt LIMIT 40
    """,
    doc="Bigram language model: per-doc token stream (lockstep "
        "unnest/posexplode + lead window), bigram counts, and add-1 "
        "smoothed conditional log-probs P(w2|w1) in integer "
        "micro-nats for the top-40 bigrams (deterministic "
        "tiebreakers). Scale shape: the doc-keyed window sorts "
        "within docs only, the count shuffles key on vocabulary "
        "terms (bounded), and the vocab total is a 1-row broadcast — "
        "the n-gram-LM training step of classic data pipelines.",
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), " +")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = toks.select("tok", F.lead("tok", 1).over(w).alias("nxt"))
    counts = (
        big.filter(F.col("nxt").isNotNull())
        .groupBy("tok", "nxt")
        .agg(F.count("*").alias("c_big"))
    )
    firsts = counts.groupBy("tok").agg(
        F.sum("c_big").cast("long").alias("c_first")
    )
    vocab = toks.agg(F.countDistinct("tok").cast("long").alias("v"))
    return (
        counts.join(firsts, "tok")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("tok").alias("w1"),
            F.col("nxt").alias("w2"),
            F.col("c_big").cast("long").alias("n_pair"),
            F.col("c_first").alias("n_first"),
            F.expr(_BIGRAM_LP_SQL).alias("logprob_micro_nats"),
        )
        .orderBy(F.col("n_pair").desc(), "w1", "w2")
        .limit(40)
    )


# ------------------------------------------- split distribution parity
# Smoothed KL(train ‖ test) over unigram distributions. Per-term
# contributions quantize to integer nano-nats BEFORE the sum (the
# text_lm_logprob discipline: integer sums are partition-order-free,
# so the reduction is exact and engine-independent).
_KL_TERM_SQL = (
    "CAST(floor("
    "((CAST(c_tr AS DOUBLE) + 1.0) / (CAST(t_tr AS DOUBLE) + CAST(v AS DOUBLE))) * "
    "ln(((CAST(c_tr AS DOUBLE) + 1.0) / (CAST(t_tr AS DOUBLE) + CAST(v AS DOUBLE))) / "
    "((CAST(c_te AS DOUBLE) + 1.0) / (CAST(t_te AS DOUBLE) + CAST(v AS DOUBLE)))) "
    "* 1000000000.0 + 0.5) AS BIGINT)"
)


@register(
    "corpus_split_divergence",
    f"""
    WITH sp AS (
      SELECT text,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'ccd'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'e66'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ), toks AS (
      SELECT split, unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM sp WHERE split IN ('train', 'test')
        AND length(trim(text)) > 0
    ), counts AS (
      SELECT tok,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_tr,
             CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_te
      FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(c_tr) AS BIGINT) AS t_tr,
             CAST(sum(c_te) AS BIGINT) AS t_te,
             CAST(count(*) AS BIGINT) AS v
      FROM counts
    ), terms AS (
      SELECT {_KL_TERM_SQL} AS term_nano, t_tr, t_te, v
      FROM counts CROSS JOIN tot
    )
    SELECT CAST(sum(term_nano) AS BIGINT) AS kl_nano_nats,
           CAST(max(v) AS BIGINT) AS vocab_size,
           CAST(max(t_tr) AS BIGINT) AS n_train_tokens,
           CAST(max(t_te) AS BIGINT) AS n_test_tokens
    FROM terms
    """,
    doc="Split-balance check: add-1-smoothed KL(train ‖ test) between "
        "unigram token distributions over the union vocabulary — the "
        "drift monitor a corpus split ships with. One vocab-keyed "
        "count shuffle; totals are a 1-row broadcast; per-term values "
        "quantize to integer nano-nats before the order-free sum.",
)
def corpus_split_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "text",
            F.when(prefix < "ccd", "train")
            .when(prefix < "e66", "val")
            .otherwise("test")
            .alias("split"),
        )
        .filter(
            F.col("split").isin("train", "test")
            & (F.length(F.trim("text")) > 0)
        )
    )
    toks = docs.select("split", F.explode(F.split(F.trim("text"), " +")).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("c_tr"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("c_te"),
    )
    tot = counts.agg(
        F.sum("c_tr").cast("long").alias("t_tr"),
        F.sum("c_te").cast("long").alias("t_te"),
        F.count("*").cast("long").alias("v"),
    )
    terms = counts.crossJoin(F.broadcast(tot)).select(
        F.expr(_KL_TERM_SQL).alias("term_nano"), "t_tr", "t_te", "v"
    )
    return terms.agg(
        F.sum("term_nano").cast("long").alias("kl_nano_nats"),
        F.max("v").cast("long").alias("vocab_size"),
        F.max("t_tr").cast("long").alias("n_train_tokens"),
        F.max("t_te").cast("long").alias("n_test_tokens"),
    )


# ------------------------------------------------------------- TF-IDF
# Shared formula text (CLAUDE.md single-source rule): tf/df/n_docs are
# integers in both engines, the ln() runs on identical doubles, and
# the score is rounded to 6dp before the rank tiebreak (term asc) so
# a libm ulp can't flip the ordering silently.
_TFIDF_SQL = (
    "round(CAST(tf AS DOUBLE) * ln((CAST(n_docs AS DOUBLE) + 1.0)"
    " / (CAST(df AS DOUBLE) + 1.0)), 6)"
)
_TFIDF_TOPK = 3


@register(
    "text_tfidf_topk",
    f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tk GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, {_TFIDF_SQL} AS tfidf_r
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
    )
    SELECT doc_id, term, CAST(rk AS BIGINT) AS rk, tfidf_r FROM (
      SELECT doc_id, term, tfidf_r, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf_r DESC, term ASC
      ) AS rk FROM scored
    ) WHERE rk <= {_TFIDF_TOPK}
    """,
    doc="Top-3 TF-IDF terms per document: explode tokens -> one "
        "partial-agg (doc, term) count -> document frequencies "
        "(vocab-bounded, broadcast back) -> smoothed-idf score -> "
        "per-doc row_number with (score desc, term asc) tiebreak. "
        "The keyword-extraction primitive of every retrieval/"
        "curation stack; the only window runs per doc over its "
        "distinct terms.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), " +")).alias("term"),
    )
    tf = tk.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    # no broadcast hint on df: the full distinct-term vocabulary grows
    # with the corpus (web-scale text has unbounded typo/URL terms) —
    # AQE broadcasts at small SF, shuffle-joins when the vocab
    # outgrows the driver; the 1-row doc count keeps its hint
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", F.expr(_TFIDF_SQL).alias("tfidf_r"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_r").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _TFIDF_TOPK)
        .select("doc_id", "term", "rk", "tfidf_r")
    )


# ---------------------------------------------------- vocab coverage
_VOCAB_SIZE = 64


@register(
    "text_vocab_coverage",
    f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
      FROM documents
    ), freq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY term
    ), vocab AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY n DESC, term ASC) AS rk
        FROM freq
      ) WHERE rk <= {_VOCAB_SIZE}
    ), marked AS (
      SELECT tk.doc_id,
             CASE WHEN v.term IS NULL THEN 0 ELSE 1 END AS in_vocab
      FROM tk LEFT JOIN vocab v ON v.term = tk.term
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(1 - in_vocab) AS BIGINT) AS n_oov,
           round(CAST(sum(in_vocab) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS cov_r
    FROM marked GROUP BY doc_id
    """,
    doc=f"Vocabulary induction + coverage: top-{_VOCAB_SIZE} terms by "
        "global frequency (term-asc tiebreak) become the vocab; each "
        "document reports its token count, OOV count, and coverage "
        "ratio. The tokenizer-budget diagnostic run before any BPE "
        "training. The vocab is extracted with orderBy+limit "
        "(TakeOrderedAndProject: each partition keeps its local "
        f"top-{_VOCAB_SIZE}, the driver merges — no single-partition "
        "sort over the term-frequency frame, which scales with the "
        "corpus), joins back as a broadcast, and the per-doc agg is "
        "one partial-aggregated shuffle on doc_id.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), " +")).alias("term"),
    )
    freq = tk.groupBy("term").agg(F.count("*").cast("long").alias("n"))
    # top-k via TakeOrderedAndProject, never a global rank window:
    # distinct terms scale with the corpus (same shape as text_zipf_fit)
    vocab = (
        freq.orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(_VOCAB_SIZE)
        .select("term")
    )
    marked = tk.join(
        F.broadcast(vocab.withColumn("in_v", F.lit(1))), "term", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("in_v"), F.lit(0)).alias("in_vocab"),
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(1 - F.col("in_vocab")).cast("long").alias("n_oov"),
        F.round(
            F.sum("in_vocab").cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("cov_r"),
    )


# ------------------------------------------------- PMI co-occurrence
# Pointwise mutual information over within-document term pairs — the
# collocation/phrase-mining primitive (word2vec's SGNS objective is
# shifted PMI). Counts are document frequencies (distinct terms per
# doc), so a term repeated in one doc counts once; integer inputs make
# the single ln() the only double op, quantized to micro-nats.
_PMI_MIN_SUPPORT = 25
_PMI_TOPK = 20
_PMI_SQL = (
    "CAST(floor(1000000.0 * ln((CAST(c_ab AS DOUBLE)"
    " * CAST(n_docs AS DOUBLE))"
    " / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))) + 0.5) AS BIGINT)"
)


@register(
    "text_pmi_pairs",
    f"""
    WITH tk AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(text), ' +')) AS term
      FROM documents
    ), n AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tk
    ), cnt AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY term
    ), pair AS (
      SELECT a.term AS term_a, b.term AS term_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM tk a JOIN tk b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2
      HAVING count(*) >= {_PMI_MIN_SUPPORT}
    )
    SELECT term_a, term_b, c_ab, pmi_micro FROM (
      SELECT term_a, term_b, c_ab, {_PMI_SQL} AS pmi_micro,
             row_number() OVER (
               ORDER BY {_PMI_SQL} DESC, term_a ASC, term_b ASC
             ) AS rk
      FROM pair
      JOIN cnt ca ON ca.term = term_a
      JOIN cnt cb ON cb.term = term_b
      CROSS JOIN n, LATERAL (SELECT ca.c AS c_a, cb.c AS c_b) x
    ) WHERE rk <= {_PMI_TOPK}
    """,
    doc=f"PMI collocations: top-{_PMI_TOPK} within-document term pairs "
        f"by pointwise mutual information (support >= "
        f"{_PMI_MIN_SUPPORT}, micro-nat quantized). Pair generation "
        "is the inverted-index self-join on doc_id over DISTINCT "
        "(doc, term) rows — bounded per doc by distinct-term count; "
        "term totals broadcast back; the rank runs over the "
        "support-filtered pair set only.",
)
def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), " +")).alias("term"),
    ).distinct()
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    tk = persist_tracked(tk)
    n = tk.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    cnt = tk.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    a = tk.select(F.col("doc_id").alias("d"), F.col("term").alias("term_a"))
    b = tk.select(F.col("doc_id").alias("d"), F.col("term").alias("term_b"))
    pair = (
        a.join(b, "d")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_SUPPORT)
    )
    ca = cnt.select(F.col("term").alias("term_a"), F.col("c").alias("c_a"))
    cb = cnt.select(F.col("term").alias("term_b"), F.col("c").alias("c_b"))
    scored = (
        # ca/cb are full-vocab unigram counts (Heaps-growing):
        # joins AQE-decided, no forced broadcast (r8)
        pair.join(ca, "term_a")
        .join(cb, "term_b")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a", "term_b", "c_ab",
            F.expr(_PMI_SQL).alias("pmi_micro"),
        )
    )
    top = scored.orderBy(
        F.col("pmi_micro").desc(), F.col("term_a").asc(),
        F.col("term_b").asc(),
    ).limit(_PMI_TOPK)
    return top.select("term_a", "term_b", "c_ab", "pmi_micro")


# ------------------------------------------- simhash Hamming pairing
# The Manku/Jain/Sarma (WWW'07) completion of the SimHash entry: band
# the 32-bit fingerprint into 4 bytes; by pigeonhole, any pair within
# Hamming distance 3 shares at least one band — so the band equi-join
# is a LOSSLESS candidate generator for d <= 3, and the Hamming check
# is its residual. XOR is spelled (a|b) - (a&b): Spark's `^` is xor
# but DuckDB's is POWER, while `|`/`&`/bit_count agree — the identity
# keeps the text shared.
_SH_HAM_MAX = 1
_SH_BANDS = 4
_SH_HAMMING_SQL = (
    "bit_count((sh_a | sh_b) - (sh_a & sh_b))"
)


@register(
    "dedup_simhash_hamming",
    f"""
    WITH sig AS ({_simhash_sql().strip()}),
    banded AS (
      SELECT doc_id, simhash,
             CAST((simhash // CAST(power(256, k) AS BIGINT)) % 256
                  AS INTEGER) AS band_val,
             k AS band_k
      FROM sig CROSS JOIN unnest([0, 1, 2, 3]) AS t(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM banded a JOIN banded b
        ON a.band_k = b.band_k AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST({_SH_HAMMING_SQL} AS INTEGER) AS hamming
    FROM cand
    WHERE {_SH_HAMMING_SQL} <= {_SH_HAM_MAX}
    """,
    doc=f"SimHash near-dup pairing (Manku et al. WWW'07): 32-bit "
        f"fingerprints banded into {_SH_BANDS} bytes; pairs sharing a "
        "band are the candidates (pigeonhole: LOSSLESS for Hamming "
        f"<= {_SH_HAM_MAX}), the popcount check rides as the join "
        "residual. Pair space is Σ band-bucket², never n²; the "
        "fingerprint computation is shared with dedup_simhash.",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = dd.simhash_fingerprints(load_table(spark, sf_dir, "documents"))
    ks = sig.sparkSession.range(_SH_BANDS).select(
        F.col("id").cast("int").alias("band_k")
    )
    banded = sig.crossJoin(F.broadcast(ks)).select(
        "doc_id",
        "simhash",
        "band_k",
        F.expr(
            "CAST((simhash div CAST(power(256, band_k) AS BIGINT)) % 256"
            " AS INT)"
        ).alias("band_val"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sh_a"),
        "band_k",
        "band_val",
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sh_b"),
        "band_k",
        "band_val",
    )
    cand = (
        a.join(b, ["band_k", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr(_SH_HAMMING_SQL).cast("int")
        )
        .filter(F.col("hamming") <= _SH_HAM_MAX)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------- per-doc entropy gate
# Unigram self-entropy: H = ln(n) - (1/n)·Σ c_t·ln(c_t) over the
# document's own token counts — algebraically -Σ p·ln p but with every
# input an integer, so the only doubles are ln() of identical
# integers. Low entropy = repetitive/templated text; the quality gate
# complements the Gopher repetition signals with an information-
# theoretic one.
_ENTROPY_SQL = (
    "CAST(floor(1000000.0 * (ln(CAST(n_tokens AS DOUBLE))"
    " - CAST(sum_clnc_micro AS DOUBLE) / (1000000.0"
    " * CAST(n_tokens AS DOUBLE))) + 0.5) AS BIGINT)"
)


@register(
    "text_unigram_entropy",
    f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
      FROM tk GROUP BY doc_id, term
    ), agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(floor(1000000.0 * CAST(c AS DOUBLE)
                    * ln(CAST(c AS DOUBLE)) + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_clnc_micro
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, {_ENTROPY_SQL} AS entropy_micro_nats
    FROM agg
    """,
    doc="Per-document unigram entropy in integer micro-nats: "
        "H = ln n − (Σ c·ln c)/n from the doc's own token counts — "
        "every c·ln c term quantizes to integer micro-units BEFORE "
        "the per-doc sum (order-free), the outer expression is one "
        "shared text. Low entropy flags templated/repetitive docs — "
        "the information-theoretic quality gate next to the Gopher "
        "repetition ratios; one exploded partial-agg per doc.",
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), " +")).alias("term"),
    )
    tf = tk.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("c")
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(
            F.expr(
                "CAST(floor(1000000.0 * CAST(c AS DOUBLE)"
                " * ln(CAST(c AS DOUBLE)) + 0.5) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("sum_clnc_micro"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.expr(_ENTROPY_SQL).alias("entropy_micro_nats"),
    )


# ------------------------------------------ prefix-filtered Jaccard
# PPJoin-style prefix filtering (Chaudhuri et al. 2006; Xiao et al.
# 2008): candidates come only from each doc's rarest
# |d| - ceil(t*|d|) + 1 shingles, which is LOSSLESS at Jaccard >= t
# yet keeps stopword-grade mega-buckets out of the inverted-index
# join entirely — the published fix for the Sigma bucket^2 blowup the
# plain entry's docstring flags. A pytest contract pins its output
# row-for-row equal to dedup_ngram_jaccard.
@register(
    "dedup_jaccard_prefix",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest({_sql_shingles(3)}) AS shingle FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
    ), freq AS (
      SELECT shingle, count(*) AS df_count FROM sh GROUP BY shingle
    ), prefix AS (
      SELECT doc_id, shingle, n_shingles FROM (
        SELECT s.doc_id, s.shingle, z.n_shingles,
               row_number() OVER (PARTITION BY s.doc_id
                 ORDER BY f.df_count ASC, s.shingle ASC) AS rn
        FROM sh s JOIN freq f USING (shingle) JOIN sizes z USING (doc_id)
      ) WHERE rn <= n_shingles
                    - CAST(ceil(CAST(n_shingles AS DOUBLE) * 0.8) AS BIGINT)
                    + 1
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM prefix a JOIN prefix b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      WHERE CAST(least(a.n_shingles, b.n_shingles) AS DOUBLE)
            >= 0.8 * greatest(a.n_shingles, b.n_shingles) - 0.000000001
    ), sets AS (
      SELECT doc_id, list(shingle) AS ls FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(a.ls, b.ls)) AS BIGINT) AS n_inter
      FROM cand c
      JOIN sets a ON a.doc_id = c.id_a
      JOIN sets b ON b.doc_id = c.id_b
    )
    SELECT id_a, id_b, n_inter,
           round(n_inter / (sa.n_shingles + sb.n_shingles - n_inter), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter / (sa.n_shingles + sb.n_shingles - n_inter) >= 0.8
    """,
    doc="Prefix-filtered set-similarity join (PPJoin family): "
        "rarest-first global-frequency ordering, candidates only from "
        "the length-derived prefix, exact intersection verify on "
        "candidates — lossless at t, immune to common-shingle skew",
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_prefix_pairs(docs, n=3, threshold=0.8)


# ------------------------------------------- held-out perplexity
# The train/test discipline applied to the bigram LM: fit counts on
# the md5-split train docs ONLY (same thresholds as corpus_split),
# score every held-out bigram with add-1 smoothing against the train
# statistics (unseen histories fall back to 1/V via the zero
# coalesce), and report corpus cross-entropy in exact integer
# micro-nats. Each bigram's log-prob rounds to an integer BEFORE the
# sum, so the reduction is order-free; perplexity exponentiates the
# identical mean double.
_HOP_LP_SQL = (
    "CAST(round(ln((CAST(cp AS DOUBLE) + 1.0)"
    " / (CAST(cf AS DOUBLE) + CAST(v AS DOUBLE)))"
    " * 1000000.0) AS BIGINT)"
)


@register(
    "corpus_heldout_ppl",
    f"""
    WITH toks AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS h,
             unnest(string_split_regex(trim(text), ' +')) AS tok,
             generate_subscripts(string_split_regex(trim(text), ' +'), 1)
               AS pos
      FROM documents WHERE length(trim(text)) > 0
    ), big AS (
      SELECT doc_id, h, tok,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM toks
    ), train_counts AS (
      SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c_big
      FROM big WHERE nxt IS NOT NULL AND h < 'ccd' GROUP BY tok, nxt
    ), train_firsts AS (
      SELECT tok, CAST(sum(c_big) AS BIGINT) AS c_first
      FROM train_counts GROUP BY tok
    ), vocab AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM big WHERE h < 'ccd'
    ), test_big AS (
      SELECT tok, nxt FROM big WHERE nxt IS NOT NULL AND h >= 'e66'
    ), scored AS (
      SELECT {_HOP_LP_SQL} AS lp_micro
      FROM (
        SELECT coalesce(tc.c_big, 0) AS cp,
               coalesce(tf.c_first, 0) AS cf,
               v.v AS v
        FROM test_big tb
        LEFT JOIN train_counts tc
          ON tc.tok = tb.tok AND tc.nxt = tb.nxt
        LEFT JOIN train_firsts tf ON tf.tok = tb.tok
        CROSS JOIN vocab v
      )
    )
    SELECT CAST(count(*) AS BIGINT) AS n_test_bigrams,
           CAST(sum(-lp_micro) AS BIGINT) AS xent_micro_nats,
           round(exp(CAST(sum(-lp_micro) AS DOUBLE)
                     / (1000000.0 * count(*))), 4) AS perplexity
    FROM scored
    """,
    doc="Held-out perplexity of the add-1 bigram LM: counts fit on "
        "the md5 train split (same 80/10/10 thresholds as "
        "corpus_split), every test-split bigram scored against the "
        "train statistics with unseen histories backing off to 1/V, "
        "per-bigram log-probs rounded once to integer micro-nats "
        "before the order-free sum. The train count frame is "
        "vocabulary-bounded (broadcast at corpus scale), the test "
        "stream is the only fact-sized side, and the final "
        "exponentiation divides exact integers — the eval gate of an "
        "LM data pipeline.",
)
def corpus_heldout_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3).alias("h"),
        F.posexplode(F.split(F.trim("text"), " +")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = toks.select(
        "h", "tok", F.lead("tok", 1).over(w).alias("nxt")
    )
    train = big.filter(F.col("nxt").isNotNull() & (F.col("h") < "ccd"))
    train_counts = train.groupBy("tok", "nxt").agg(
        F.count("*").cast("long").alias("c_big")
    )
    train_firsts = train_counts.groupBy("tok").agg(
        F.sum("c_big").cast("long").alias("c_first")
    )
    vocab = (
        big.filter(F.col("h") < "ccd")
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    test_big = big.filter(
        F.col("nxt").isNotNull() & (F.col("h") >= "e66")
    ).select("tok", "nxt")
    joined = (
        # train_counts is bigram-vocab-sized and train_firsts
        # unigram-vocab-sized — both Heaps-growing: joins AQE-decided,
        # no forced broadcast (r8)
        test_big.join(
            train_counts.withColumnRenamed("tok", "t1")
                        .withColumnRenamed("nxt", "t2"),
            (F.col("tok") == F.col("t1")) & (F.col("nxt") == F.col("t2")),
            "left",
        )
        .join(
            train_firsts.withColumnRenamed("tok", "t3"),
            F.col("tok") == F.col("t3"),
            "left",
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            F.coalesce("c_big", F.lit(0)).alias("cp"),
            F.coalesce("c_first", F.lit(0)).alias("cf"),
            "v",
        )
    )
    scored = joined.selectExpr(f"{_HOP_LP_SQL} AS lp_micro")
    return scored.agg(
        F.count("*").cast("long").alias("n_test_bigrams"),
        F.sum(-F.col("lp_micro")).cast("long").alias("xent_micro_nats"),
        F.round(
            F.exp(
                F.sum(-F.col("lp_micro")).cast("double")
                / (1000000.0 * F.count("*"))
            ),
            4,
        ).alias("perplexity"),
    )


# ------------------------------------------- Zipf exponent fit
# Zipf's-law diagnostic of the corpus vocabulary: regress
# ln(frequency) on ln(rank) over the top-200 terms — the slope is
# the (negative) Zipf exponent. Both logs are taken on exact
# integers, rounded once to micro-nats, and the closed-form OLS
# slope/intercept then divide identical BIGINT moment sums (the
# ml_linreg recipe applied to corpus statistics). Rank comes from a
# TakeOrdered top-200, so the window never sees the full vocabulary.
@register(
    "text_zipf_fit",
    """
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), counts AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n
      FROM toks GROUP BY tok
    ), top AS (
      SELECT tok, n,
             row_number() OVER (ORDER BY n DESC, tok ASC) AS rnk
      FROM counts
      ORDER BY n DESC, tok ASC LIMIT 200
    ), lg AS (
      SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS x,
             CAST(round(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS y
      FROM top
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM lg
    )
    SELECT k, sx, sy, sxx, sxy,
           round((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                 6) AS zipf_slope,
           round((CAST(sy AS DOUBLE)
                  - ((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(k AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx)) * sx)
                 / CAST(k AS DOUBLE), 6) AS zipf_icept
    FROM s
    """,
    doc="Zipf-exponent fit over the top-200 vocabulary terms: "
        "ln(freq) ~ ln(rank) closed-form OLS with both logs of exact "
        "integers quantized once to micro-nats, the five moments "
        "reduced as BIGINTs, and slope/intercept as shared-text "
        "ratios — corpus-statistics health check (natural text gives "
        "slope ~ -1; a synthetic uniform vocabulary flattens toward "
        "0). TakeOrdered bounds the ranked frame at 200 rows.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    counts = docs.select(
        F.explode(F.split(F.trim("text"), " +")).alias("tok")
    ).groupBy("tok").agg(F.count("*").cast("long").alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(200)
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    ranked = top.select(
        "n", F.row_number().over(w).cast("long").alias("rnk")
    )
    lg = ranked.select(
        F.round(F.log(F.col("rnk").cast("double")) * 1000000.0)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("n").cast("double")) * 1000000.0)
        .cast("long")
        .alias("y"),
    )
    s = lg.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return s.selectExpr(
        "k", "sx", "sy", "sxx", "sxy",
        "round((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)"
        " AS zipf_slope",
        "round((CAST(sy AS DOUBLE)"
        " - ((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)"
        " / CAST(k AS DOUBLE), 6) AS zipf_icept",
    )


# ------------------------------------------- term burstiness
@register(
    "text_term_burstiness",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), ' +')) AS tok
      FROM documents WHERE length(trim(text)) > 0
    ), per_doc AS (
      SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY tok, doc_id
    ), stats AS (
      SELECT tok,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS cf
      FROM per_doc GROUP BY tok
    )
    SELECT tok, df, cf,
           CAST(round(1000000.0 * cf / df) AS BIGINT) AS burstiness_e6
    FROM stats
    ORDER BY burstiness_e6 DESC, tok ASC
    LIMIT 25
    """,
    doc="Church-Gale term burstiness: collection frequency over "
        "document frequency per term — bursty terms (cf >> df) "
        "concentrate in few documents and carry topical signal; "
        "function words sit near their df. Two partial-agg passes "
        "(term x doc, then term), one e6 rational, TakeOrdered "
        "top-25 with a deterministic tiebreak.",
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    per_doc = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("tok")
        )
        .groupBy("tok", "doc_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    stats = per_doc.groupBy("tok").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("c").cast("long").alias("cf"),
    )
    return (
        stats.selectExpr(
            "tok", "df", "cf",
            "CAST(round(1000000.0 * cf / df) AS BIGINT) AS burstiness_e6",
        )
        .orderBy(F.col("burstiness_e6").desc(), F.col("tok").asc())
        .limit(25)
    )


# ------------------------------------------------ Python UDTF surface
# The table-function UDF surface (SURVEY §2.11 lists applyInPandas /
# pandas_udf / mapInPandas / applyInPandasWithState; Spark 4 adds
# Python UDTFs — one input row to N output rows with a declared
# schema, the generator shape LATERAL VIEW explode cannot express when
# the expansion needs imperative logic). Arrow-optimized UDTF transfer
# is enabled at the session; the entry is bounded to 100 docs because
# a Python UDTF still evaluates per row — for corpus-scale chunking
# the expression-only corpus_chunk_overlap entry is the scale path,
# and this one exists to pin the SURFACE.
@register(
    "corpus_udtf_chunks",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE doc_id < 100
    ), idx AS (
      SELECT doc_id, tk,
             unnest(range(0, CAST(ceil(len(tk) / 5.0) AS BIGINT)))
               AS chunk_idx
      FROM toks
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(tk[chunk_idx * 5 + 1 : chunk_idx * 5 + 5])
                AS INTEGER) AS n_tokens,
           array_to_string(tk[chunk_idx * 5 + 1 : chunk_idx * 5 + 5],
                           ' ') AS chunk
    FROM idx
    ORDER BY doc_id, chunk_idx
    """,
    doc="Python UDTF (Spark 4 @udtf): each document row expands to "
        "one row per 5-token chunk with a declared output schema — "
        "the imperative one-to-N generator surface. The oracle "
        "re-derives the identical chunking declaratively "
        "(string_split + range unnest + 1-based list slicing). "
        "Bounded to 100 docs: a Python UDTF is per-row even with "
        "Arrow transfer on, so corpus_chunk_overlap's pure-expression "
        "manifest remains the documented scale path.",
)
def corpus_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    spark.conf.set(
        "spark.sql.execution.pythonUDTF.arrow.enabled", "true"
    )

    @udtf(
        returnType="doc_id bigint, chunk_idx int, n_tokens int, "
        "chunk string"
    )
    class ChunkSplit:
        def eval(self, doc_id, text):
            toks = text.split(" ")
            for i in range(0, len(toks), 5):
                piece = toks[i : i + 5]
                yield doc_id, i // 5, len(piece), " ".join(piece)

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    docs.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("__chunk_split", ChunkSplit)
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk
        FROM __udtf_docs d,
             LATERAL __chunk_split(d.doc_id, d.text) c
        ORDER BY c.doc_id, c.chunk_idx
        """
    )


# ----------------------------------------- span-corruption manifest
@register(
    "corpus_span_corruption",
    """
    WITH d AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), ' +')) AS n_tokens
      FROM documents
    ), spans AS (
      SELECT doc_id, n_tokens,
             CAST(floor(n_tokens * 0.15 / 3.0) AS BIGINT) AS n_spans
      FROM d
    ), starts AS (
      SELECT s.doc_id, s.n_tokens, s.n_spans, t.k,
             CAST(('0x' || substr(md5(concat('span:',
                 CAST(s.doc_id AS VARCHAR), ':',
                 CAST(t.k AS VARCHAR))), 1, 5)) AS BIGINT)
               % greatest(s.n_tokens - 2, 1) AS start_pos
      FROM spans s, unnest(range(1, CAST(s.n_spans AS BIGINT) + 1))
        AS t(k)
      WHERE s.n_spans > 0
    ), masked AS (
      SELECT doc_id, n_tokens, n_spans,
             count(DISTINCT start_pos + o.off) AS n_masked
      FROM starts, unnest([0, 1, 2]) AS o(off)
      GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_masked AS BIGINT) AS n_masked,
           CAST(floor(n_masked * 1000000.0 / n_tokens + 0.5) AS BIGINT)
             AS masked_ratio_micro
    FROM masked ORDER BY doc_id
    """,
    doc="T5/UL2-style span-corruption manifest: each doc gets "
        "floor(15%/3) deterministic 3-token mask spans, start "
        "positions drawn by salted md5 mod (n-2) — the reproducible "
        "pretraining-objective data-prep step (which tokens a "
        "denoising run masks), with overlap handled by counting "
        "DISTINCT masked positions. Pure expression + one explode "
        "per span slot: span starts are per-row hashes (zero "
        "shuffle), the only aggregate is the per-doc distinct-"
        "position count. Ratio quantized floor(m*1e6/n + 0.5) per "
        "the integer-ratio rule. Only docs long enough for >= 1 "
        "span appear (n_tokens >= 20).",
)
def corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), " +")).cast("long").alias(
            "n_tokens"
        ),
    )
    spans = d.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("n_tokens") * 0.15 / 3.0).cast("long").alias(
            "n_spans"
        ),
    ).filter(F.col("n_spans") > 0)
    starts = spans.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.explode(F.expr("sequence(1, n_spans)")).alias("k"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_spans",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("span:"),
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            F.col("k").cast("string"),
                        )
                    ),
                    1,
                    5,
                ),
                16,
                10,
            ).cast("long")
            % F.greatest(F.col("n_tokens") - 2, F.lit(1))
        ).alias("start_pos"),
    )
    masked = (
        starts.select(
            "doc_id",
            "n_tokens",
            "n_spans",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("off"),
            "start_pos",
        )
        .groupBy("doc_id", "n_tokens", "n_spans")
        .agg(
            F.countDistinct(F.col("start_pos") + F.col("off"))
            .cast("long")
            .alias("n_masked")
        )
    )
    return masked.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_spans").cast("long").alias("n_spans"),
        "n_masked",
        F.floor(
            F.col("n_masked") * 1000000.0 / F.col("n_tokens") + 0.5
        )
        .cast("long")
        .alias("masked_ratio_micro"),
    ).orderBy("doc_id")


# ---------------------------------------- exact-substring removal ranges
@register(
    "corpus_exactsubstr_ranges",
    """
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
      FROM documents
    ), nn AS (
      SELECT doc_id, tk, len(tk) AS n FROM d WHERE len(tk) >= 8
    ), blocks AS (
      SELECT doc_id, p.pos,
             md5(array_to_string(tk[p.pos:p.pos + 7], ' ')) AS key
      FROM nn, unnest(range(1, n - 6)) AS p(pos)
    ), dups AS (
      SELECT key FROM blocks GROUP BY key
      HAVING count(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT b.doc_id, b.pos FROM blocks b JOIN dups USING (key)
    ), flagged AS (
      SELECT doc_id, pos,
             CASE WHEN prev_end IS NULL OR pos > prev_end
                  THEN 1 ELSE 0 END AS new_isl
      FROM (
        SELECT doc_id, pos,
               max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_end
        FROM hits
      )
    ), isl AS (
      SELECT doc_id, pos,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    )
    SELECT doc_id, CAST(island AS BIGINT) AS range_id,
           CAST(min(pos) AS BIGINT) AS start_tok,
           CAST(max(pos) + 8 AS BIGINT) AS end_tok,
           CAST(max(pos) + 8 - min(pos) AS BIGINT) AS n_tokens_removed
    FROM isl GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="ExactSubstr dedup removal ranges (Lee et al. 2022, "
        "'Deduplicating Training Data Makes Language Models "
        "Better'): every 8-token block at EVERY stride-1 position is "
        "hashed (the distributed stand-in for their suffix array), "
        "blocks occurring in >= 2 distinct docs mark hit positions, "
        "and per doc the overlapping/adjacent hits MERGE into "
        "maximal removal intervals by the gaps-and-islands running "
        "max — the [start, end) token ranges their tool actually "
        "emits, which passage_dedup's fixed-grid blocks cannot "
        "produce (a duplicate straddling two grid cells is invisible "
        "to it). Cost: Sigma(n) block rows, one hash shuffle for the "
        "frequency pass, doc-partitioned windows for the merge; the "
        "candidate key is bounded (md5), so it survives the "
        "prune_common_shingles skew treatment if a block goes viral.",
)
def corpus_exactsubstr_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " +").alias("tk")
    )
    nn = d.select("doc_id", "tk", F.size("tk").alias("n")).filter(
        F.col("n") >= 8
    )
    blocks = nn.select(
        "doc_id",
        F.explode(F.expr("sequence(1, n - 7)")).alias("pos"),
        "tk",
    ).select(
        "doc_id",
        "pos",
        F.md5(F.expr("array_join(slice(tk, pos, 8), ' ')")).alias("key"),
    )
    dups = (
        blocks.groupBy("key")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("key")
    )
    hits = blocks.join(dups, "key").select("doc_id", "pos")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = hits.select(
        "doc_id",
        "pos",
        F.max(F.col("pos") + 8).over(w_prev).alias("prev_end"),
    ).select(
        "doc_id",
        "pos",
        F.when(
            F.col("prev_end").isNull()
            | (F.col("pos") > F.col("prev_end")),
            1,
        )
        .otherwise(0)
        .alias("new_isl"),
    )
    isl = flagged.select(
        "doc_id", "pos", F.sum("new_isl").over(w_run).alias("island")
    )
    return (
        isl.groupBy("doc_id", F.col("island").cast("long").alias("range_id"))
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            (F.max("pos") + 8).cast("long").alias("end_tok"),
            (F.max("pos") + 8 - F.min("pos"))
            .cast("long")
            .alias("n_tokens_removed"),
        )
        .orderBy("doc_id", "range_id")
    )


# ------------------------------------------- RAKE keyword phrases
# Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
# phrases are maximal runs of non-stopword tokens (stopword/delimiter
# islands); each word scores degree/frequency where degree sums the
# lengths of the phrases containing it, and a phrase scores the sum of
# its member-word scores. The degree/frequency RATIO re-quantizes to
# integer micro-units per word (floor(deg*1e6/freq + 0.5) — the
# ratio-of-integers rule: round() at 6dp can half-tie), so phrase
# scores are exact BIGINT sums in both engines. The gaps-and-islands
# group key (pos - row_number) is offset-invariant, so Spark's 0-based
# posexplode and DuckDB's 1-based generate_subscripts agree without
# reconciliation.
_RAKE_STOP = "('a', 'the')"
_RAKE_TOPK = 25


@register(
    "text_rake_keywords",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), ' +')) AS tok,
             generate_subscripts(string_split_regex(trim(text), ' +'), 1)
               AS pos
      FROM documents WHERE length(trim(text)) > 0
    ), members AS (
      SELECT doc_id, tok, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM toks WHERE tok NOT IN {_RAKE_STOP}
    ), sized AS (
      SELECT doc_id, grp, tok, pos,
             count(*) OVER (PARTITION BY doc_id, grp) AS len
      FROM members
    ), wscore AS (
      SELECT tok,
             CAST(floor(CAST(sum(len) AS BIGINT) * 1000000.0
                        / count(*) + 0.5) AS BIGINT) AS s_e6
      FROM sized GROUP BY tok
    ), occ AS (
      SELECT s.doc_id, s.grp, CAST(sum(w.s_e6) AS BIGINT) AS occ_score
      FROM sized s JOIN wscore w ON w.tok = s.tok
      GROUP BY s.doc_id, s.grp
    ), ptext AS (
      SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos) AS phrase
      FROM sized GROUP BY doc_id, grp
    )
    SELECT phrase,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(o.occ_score) AS BIGINT) AS rake_score_e6
    FROM ptext p JOIN occ o ON o.doc_id = p.doc_id AND o.grp = p.grp
    GROUP BY phrase
    ORDER BY rake_score_e6 DESC, phrase ASC
    LIMIT {_RAKE_TOPK}
    """,
    doc="RAKE keyword extraction: stopword-delimited phrase islands "
        "(gaps-and-islands over the token stream), word score = "
        "degree/frequency in integer micro-units, phrase score = "
        "BIGINT sum of member scores; global top-25 phrases with "
        "deterministic ties. Scale shape: doc-partitioned windows "
        "only, word stats shuffle on the bounded vocabulary, phrase "
        "keys are doc-bounded, and the top-k is order+limit "
        "(TakeOrderedAndProject) — no global window.",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), " +")).alias("pos", "tok"),
    )
    members = toks.filter(~F.col("tok").isin("a", "the")).withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("pos")
        ),
    )
    sized = persist_tracked(
        members.withColumn(
            "len", F.count("*").over(Window.partitionBy("doc_id", "grp"))
        )
    )
    wscore = sized.groupBy("tok").agg(
        F.expr(
            "CAST(floor(CAST(sum(len) AS BIGINT) * 1000000.0"
            " / count(*) + 0.5) AS BIGINT)"
        ).alias("s_e6")
    )
    occ = (
        # wscore is vocab-sized: join AQE-decided, not hinted (r8)
        sized.join(wscore, "tok")
        .groupBy("doc_id", "grp")
        .agg(F.sum("s_e6").cast("long").alias("occ_score"))
    )
    ptext = sized.groupBy("doc_id", "grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("phrase")
    )
    return (
        ptext.join(occ, ["doc_id", "grp"])
        .groupBy("phrase")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("occ_score").cast("long").alias("rake_score_e6"),
        )
        .orderBy(F.col("rake_score_e6").desc(), F.col("phrase").asc())
        .limit(_RAKE_TOPK)
    )


# ------------------------------------------- Arrow-native batch kernel
# §2.11 surface: mapInArrow — the zero-copy sibling of mapInPandas.
# Batches arrive as pyarrow RecordBatches and never materialize a
# pandas object; the token statistics below run entirely on Arrow
# compute kernels + numpy over the ListArray's offsets buffer
# (np.add.reduceat on the flattened lengths — no per-row Python). This
# is the right surface for byte-level / columnar-native extraction at
# 100 TB: Arrow IPC in, Arrow IPC out, one copy fewer than pandas and
# no object boxing. The semantics stay SQL-expressible on purpose so
# the kernel is oracle-checked exactly (token split on space runs =
# the whitespace-split kernel on pre-trimmed text).
def _arrow_token_stats(batches):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = pc.utf8_trim_whitespace(batch.column("text"))
        toks = pc.utf8_split_whitespace(text)
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        n_bytes = pc.binary_length(batch.column("text")).cast(pa.int64())
        flat = pc.list_flatten(toks)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        # segment-sum the flattened token lengths back to rows via the
        # list offsets — empty trailing segments need explicit zeros
        starts = offs[:-1]
        sums = np.zeros(len(starts), dtype=np.int64)
        nz = starts < len(lens)
        if lens.size:
            sums[nz] = np.add.reduceat(lens, starts[nz])
        sums[offs[:-1] == offs[1:]] = 0
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                n_tokens,
                n_bytes,
                pa.array(sums, type=pa.int64()),
            ],
            names=["doc_id", "n_tokens", "n_bytes", "sum_token_chars"],
        )


@register(
    "corpus_arrow_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
             AS n_tokens,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(
                  string_split_regex(trim(text), ' +'),
                  x -> length(x))) AS BIGINT) AS sum_token_chars
    FROM documents WHERE length(trim(text)) > 0
    """,
    doc="mapInArrow token statistics: per-doc token count, byte "
        "length, and summed token chars computed on zero-copy Arrow "
        "RecordBatches (pyarrow compute kernels + np.add.reduceat "
        "over the ListArray offsets — no pandas, no per-row Python). "
        "The §2.11 Arrow-native surface next to mapInPandas/UDTF; "
        "embarrassingly parallel per batch, no shuffle.",
)
def corpus_arrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    ).select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_token_stats,
        "doc_id bigint, n_tokens bigint, n_bytes bigint, "
        "sum_token_chars bigint",
    )


# ------------------------------------------------ readability score
# Flesch-Kincaid grade folded into exact integers over the common
# denominator S*W: 0.39*W/S + 11.8*Y/W - 15.59 ==
# (390000*W*W + 11800000*Y*S - 15590000*S*W) / (1e6 * S * W).
# Sentence and syllable-group counts are regexp_extract_all lengths
# with backslash-free patterns (the cross-engine regex rule); the
# final division is the 10^12-offset rounding div (score can be
# negative for terse text).
_FK_NUM_SQL = (
    "(390000 * n_words * n_words"
    " + 11800000 * n_syll * n_sents"
    " - 15590000 * n_sents * n_words)"
)
_FK_DIV_SQL = (
    f"CAST((2 * ({_FK_NUM_SQL} + (n_sents * n_words) * 1000000000000)"
    " + (n_sents * n_words)) {div} (2 * (n_sents * n_words))"
    " - 1000000000000 AS BIGINT)"
)


@register(
    "text_readability_fk",
    f"""
    WITH feats AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
               AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1)
               AS BIGINT) AS n_sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS n_syll
      FROM documents
    )
    SELECT doc_id, lang, n_words, n_sents, n_syll,
           {_FK_DIV_SQL.format(div='//')} AS fk_micro
    FROM feats ORDER BY doc_id
    """,
    doc="Flesch-Kincaid readability grade per document — the classic "
        "text-difficulty quality signal (words/sentence and "
        "syllables/word, syllable ≈ vowel group): the grade formula "
        "folds into ONE exact integer rational over the common "
        "denominator sentences×words, evaluated with the 10^12-offset "
        "rounding division (grades go negative on terse text; "
        "truncating vs flooring division cannot diverge on the "
        "offset-positive numerator). Counts are regexp_extract_all "
        "lengths with backslash-free patterns — the only regex text "
        "that parses identically in both engines. Pure map-side "
        "expressions, zero shuffle beyond the output sort.",
)
def text_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        "lang",
        F.expr(
            "CAST(size(split(trim(text), ' +')) AS BIGINT)"
        ).alias("n_words"),
        F.expr(
            "CAST(greatest(size(regexp_extract_all(text, '[.!?]', 0)), 1)"
            " AS BIGINT)"
        ).alias("n_sents"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
            " AS BIGINT)"
        ).alias("n_syll"),
    )
    return feats.select(
        "doc_id",
        "lang",
        "n_words",
        "n_sents",
        "n_syll",
        F.expr(_FK_DIV_SQL.format(div="div")).alias("fk_micro"),
    ).orderBy("doc_id")

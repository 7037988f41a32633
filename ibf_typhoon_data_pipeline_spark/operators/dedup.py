"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the pre-training-corpus dedup suite, built scale-first:

- exact: hash-groupBy, one shuffle on the digest.
- n-gram Jaccard: inverted-index self-join (explode shingles → join on
  shingle → count) — the standard scalable all-pairs scheme; never a
  cross join.
- MinHash+LSH: signatures are min-of-md5-hex per seeded hash family —
  md5 hex strings order identically in every engine, so the DuckDB
  oracle reproduces signatures exactly. Banding → bucket join keeps
  candidate generation linear in collisions.
- SimHash: per-nibble parity votes over token md5s → 32-bit
  fingerprint; Hamming-adjacent buckets via band keys.

All pure DataFrame ops; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators.skew import spread

# Persisted intermediates (shingle/signature tables) go through the
# shared tracked-cache registry (operators.cache): they feed multiple
# plan branches inside one query, so the operator cannot unpersist
# before returning; orchestration paths call release_caches() after
# their action (bench.py does).
from ibf_typhoon_data_pipeline_spark.operators.cache import (  # noqa: F401
    persist_tracked as _persist,
    release_caches,
)


def split_words(text: Column) -> Column:
    return F.split(F.trim(text), " +")


def shingles_of_words(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) of a word array.

    ``words`` MUST be a materialized column reference, not an inline
    split(...) expression: expressions referenced inside a transform
    lambda are re-evaluated per array element (no common-subexpression
    elimination across the lambda boundary), so an inline split runs
    once per gram — measured ~14× slower. Grams use element_at +
    concat_ws rather than slice + array_join for the same reason
    (slice copies the array per index)."""
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - F.lit(n), F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k + 1) for k in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(cnt >= n, grams).otherwise(F.array(F.concat_ws(" ", words)))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Shingles directly from a text column. Convenience for one-shot
    row-scalar use; pipelines should project split_words() to a column
    first and call shingles_of_words (see docstring there)."""
    return shingles_of_words(split_words(text), n)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: md5 digest → keep the min-id representative per
    digest. One shuffle keyed by digest; at 100 TB the digest groupBy
    is embarrassingly parallel and skew-free (hash keys)."""
    return (
        df.withColumn("digest", F.md5(F.col(text_col)))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) long table. Two-step projection: the word array is
    materialized first so the gram lambda reads an attribute, not a
    re-evaluated split (CollapseProject keeps multi-referenced
    non-trivial aliases materialized)."""
    words = spread(df).select(
        F.col(id_col), split_words(F.col(text_col)).alias("__words")
    )
    return words.select(
        F.col(id_col),
        F.explode(shingles_of_words(F.col("__words"), n)).alias("shingle"),
    )


def prune_common_shingles(
    sh: DataFrame, max_df: int, id_col: str = "doc_id"
) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df`` — the
    skew guard for the inverted-index self-join. A shingle shared by f
    docs contributes f² candidate pairs; at corpus scale a handful of
    boilerplate shingles ("all rights reserved"-grade) dominate the
    join. Pruning them bounds the per-key bucket (Σ bucket² → linear)
    at a documented recall cost: pairs similar ONLY through ultra-
    common shingles are missed — which is exactly the near-dup
    semantics you want (common boilerplate shouldn't make documents
    duplicates). Standard practice in MinHash/LSH corpus dedup."""
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    return (
        sh.join(freq.filter(F.col("__df") <= max_df), "shingle")
        .select(id_col, "shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via inverted index:
    explode shingles → self-join on shingle (id_a < id_b) → intersection
    counts → |A∪B| = |A|+|B|−|A∩B|. The join key is the shingle, so
    cost is Σ bucket² over shingle frequencies, not |docs|² — the
    scalable formulation (common-shingle skew is the knob to salt at
    100 TB). The shingle table feeds three plan branches (both join
    sides + per-doc sizes); persist it so tokenization runs once."""
    sh = _persist(shingle_table(df, text_col, id_col, n))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(
            sizes.select(
                F.col(id_col).alias("id_a"), F.col("n_shingles").alias("size_a")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("id_b"), F.col("n_shingles").alias("size_b")
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_inter", "jaccard")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signature: lane i draws from an 8-hex (32-bit) SLICE of
    md5((i div 4) || ':' || shingle) — ceil(num_hashes/4) md5 calls per
    shingle instead of num_hashes (md5 dominated the signature pass:
    3.4 s -> ~1 s at sf0.1). Slices of one digest are independent
    uniform lanes (the standard one-hash/k-pieces minhash trick); string
    min over fixed-width hex is a uniform order statistic and — unlike
    integer-converted hashes — bit-identical across Spark and DuckDB.

    Physical plan: explode shingles once, materialize the per-family
    digests in ONE projection (no per-lane re-hash), then num_hashes
    min() aggregates over the long table. The mins partial-aggregate
    map-side (shingle tokenization runs exactly once per doc)."""
    n_fams = (num_hashes + 3) // 4
    sh = shingle_table(df, text_col, id_col, n).select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"{fam}:"), F.col("shingle"))).alias(
                f"h_{fam}"
            )
            for fam in range(n_fams)
        ],
    )
    return sh.groupBy(id_col).agg(
        *[
            F.min(
                F.substring(f"h_{i // 4}", 1 + 8 * (i % 4), 8)
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH candidate pairs: band the signature (num_hashes/band_size
    bands of band_size rows), bucket-join per band, dedup pairs.
    Candidates share ≥1 full band. Est. Jaccard = fraction of equal
    minhashes. The band join is an equi-join on (band_id, band_key) —
    linear in true collisions, the 100 TB-safe candidate generator.

    The signature table is referenced three times (band explode + both
    sides of the verify join); Spark plans have no CTE sharing, so
    persist it — signatures are tiny (num_hashes × 32-hex per doc) next
    to the corpus they summarize."""
    sig = _persist(minhash_signatures(df, text_col, id_col, n, num_hashes))
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|", *[f"mh_{b * band_size + r}" for r in range(band_size)]
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(id_col, "band.band_id", "band.band_key")
    a = banded.select(F.col(id_col).alias("id_a"), "band_id", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(
        F.col(id_col).alias("id_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_hashes)]
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_hashes)]
    )
    est = sum(
        (F.col(f"a_{i}") == F.col(f"b_{i}")).cast("int") for i in range(num_hashes)
    ) / F.lit(float(num_hashes))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .select("id_a", "id_b", "est_jaccard")
    )


HEX_DIGITS = "0123456789abcdef"


def simhash_of_hashes(hashes: Column) -> Column:
    """32-bit SimHash from a materialized md5-array column: 32 hex
    nibbles → per-bit ±1 votes on each nibble's high bit (nibble ≥ 8);
    fingerprint bit j = sign of the vote sum. Uses only substr/instr
    arithmetic so the oracle can reproduce it bit-for-bit.

    ``hashes`` must be an attribute reference — 32 aggregate lambdas
    re-evaluate their input expression per element otherwise (see
    shingles_of_words)."""
    def _voter(j: int):
        # instr is 1-based: '0'→1 … '7'→8, '8'→9 … 'f'→16, so the
        # nibble's high bit is set iff instr(...) > 8. Closure factory
        # keeps the merge lambda at exactly 2 args for F.aggregate.
        return lambda acc, h: acc + F.when(
            F.instr(F.lit(HEX_DIGITS), F.substring(h, j + 1, 1)) > 8, 1
        ).otherwise(-1)

    bits = []
    for j in range(32):
        votes = F.aggregate(hashes, F.lit(0), _voter(j))
        bits.append(F.when(votes > 0, F.lit(2 ** j)).otherwise(F.lit(0)))
    return sum(bits, start=F.lit(0)).cast("long")


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 1
) -> DataFrame:
    """Per-doc SimHash-32. Three-step projection chain (words →
    md5 array → bit votes) keeps every lambda input materialized."""
    words = spread(df).select(
        F.col(id_col), split_words(F.col(text_col)).alias("__words")
    )
    hashed = words.select(
        F.col(id_col),
        F.transform(shingles_of_words(F.col("__words"), n), F.md5).alias(
            "__hashes"
        ),
    )
    return hashed.select(
        F.col(id_col), simhash_of_hashes(F.col("__hashes")).alias("simhash")
    )


def ngram_jaccard_prefix_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold with PPJoin-style PREFIX
    FILTERING (Chaudhuri et al. 2006; Xiao et al. 2008): order each
    doc's shingles by global frequency (rarest first, shingle text as
    tiebreak) and enumerate candidates only from each doc's first
    |d| - ceil(t*|d|) + 1 shingles. Lossless for pairs at Jaccard >=
    t (a qualifying pair must share a prefix token), but the
    inverted-index join now runs over the rare PREFIX tokens only —
    at corpus scale this collapses the dominant Sigma bucket^2 term,
    because the huge buckets (stopword shingles) sit at the END of
    every ordering and never generate candidates. Intersections are
    then counted exactly, but only for the candidate pairs.

    Returns the same rows as ``ngram_jaccard_pairs`` (same aliases) —
    pinned by a pytest equality contract."""
    sh = _persist(shingle_table(df, text_col, id_col, n))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("df_count").asc(), F.col("shingle").asc()
    )
    prefix = (
        sh.join(F.broadcast(freq), "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, id_col)
        .filter(
            F.col("rn")
            <= F.col("n_shingles")
            - F.ceil(F.col("n_shingles").cast("double") * F.lit(threshold))
            + F.lit(1)
        )
        .select(id_col, "shingle", "n_shingles")
    )
    pa = prefix.select(
        F.col(id_col).alias("id_a"), "shingle",
        F.col("n_shingles").alias("__na"),
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"), "shingle",
        F.col("n_shingles").alias("__nb"),
    )
    # length filter (the prefix filter's standard companion): J >= t
    # forces t*|larger| <= |smaller|. The 1e-9 slack keeps the float
    # product from pruning an exact-boundary pair (e.g. sizes 4,5 at
    # t=0.8) — extras are culled by exact verification below.
    cand = (
        pa.join(pb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("__na", "__nb").cast("double")
            >= F.lit(threshold) * F.greatest("__na", "__nb")
            - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # PPJoin's verify step: per-candidate intersection on the two
    # docs' bounded shingle ARRAYS — O(|A|+|B|) per pair with no join
    # fan-out. (Re-exploding candidates against the long shingle
    # table costs |cand|×|doc| joined rows — measured 6× slower.)
    sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("__set"))
    inter = (
        cand.join(
            sets.select(
                F.col(id_col).alias("id_a"), F.col("__set").alias("__sa")
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"), F.col("__set").alias("__sb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sa", "__sb"))
            .cast("long")
            .alias("n_inter"),
        )
    )
    out = (
        inter.join(
            sizes.select(
                F.col(id_col).alias("id_a"), F.col("n_shingles").alias("size_a")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("id_b"), F.col("n_shingles").alias("size_b")
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_inter", "jaccard")

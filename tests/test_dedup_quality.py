"""Cross-operator dedup quality: the MinHash estimate must track the
true n-gram Jaccard on the pairs both paths surface — the statistical
contract that makes LSH a valid sub-quadratic stand-in for the exact
inverted-index join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table


def test_minhash_estimates_track_true_jaccard(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    true = ngram_jaccard_pairs(docs, n=3, threshold=0.0).select(
        "id_a", "id_b", "jaccard"
    )
    est = minhash_lsh_pairs(docs, n=3, num_hashes=8, band_size=2).select(
        "id_a", "id_b", "est_jaccard"
    )
    joined = est.join(true, ["id_a", "id_b"], "left").na.fill(
        {"jaccard": 0.0}
    )
    stats = joined.agg(
        F.count("*").alias("n"),
        F.avg(F.abs(F.col("est_jaccard") - F.col("jaccard"))).alias("mae"),
        F.avg("jaccard").alias("mean_true"),
    ).first()
    # LSH candidates must exist and overwhelmingly be genuinely similar
    assert stats.n > 0
    assert stats.mean_true > 0.4, (
        f"LSH candidates are mostly dissimilar (mean true jaccard "
        f"{stats.mean_true:.3f}) — banding is broken"
    )
    # 8 hashes → σ ≈ sqrt(j(1-j)/8) ≈ 0.17 worst case; MAE well under
    # that means the estimator is unbiased in aggregate
    assert stats.mae < 0.2, f"minhash MAE {stats.mae:.3f} too high"


def test_prefix_filter_is_lossless_at_threshold(spark):
    """PPJoin prefix filtering must return EXACTLY the plain
    inverted-index join's qualifying pairs (the filter is a candidate
    pruner, never a recall knob at Jaccard >= t)."""
    from ibf_typhoon_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_prefix_pairs,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    plain = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    pref = ngram_jaccard_prefix_pairs(docs, n=3, threshold=0.8)
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in pref.collect()}
    assert a == b and len(a) > 0


def test_url_canonicalization_is_idempotent(spark):
    """The defining property of a canonical form: canon(canon(u)) ==
    canon(u). Re-running the canonicalization steps (everything after
    the messy-URL generator) with the canonical URL as input must be
    the identity — otherwise two crawls of the same canonical URL
    could still land in different dedup groups."""
    from ibf_typhoon_data_pipeline_spark.plans.curation import (
        _url_canon_spark,
        _url_steps,
    )

    canon = _url_canon_spark(spark, "/root/testdata/sf0.01")
    # feed canon_url back as the messy input `u`
    df = canon.select("doc_id", F.col("canon_url").alias("expected"),
                      F.col("canon_url").alias("u"))
    gen_names = {"pk", "scheme_base", "u"}
    for name, expr in _url_steps("spark"):
        if name in gen_names:
            continue
        df = df.withColumn(name, F.expr(expr))
    bad = df.filter(F.col("canon_url") != F.col("expected"))
    assert bad.count() == 0, bad.select("expected", "canon_url").first()


def test_url_dedup_groups_are_real_multidoc_clusters(spark):
    """The fixture plants 3-consecutive-id logical pages; after
    canonicalization a substantial share of groups must be multi-doc
    (the %4=3 member legitimately splits off when its canonical query
    string differs), and group sizes never exceed the planted 3."""
    from ibf_typhoon_data_pipeline_spark.plans import QUERIES

    df = QUERIES["dedup_url_canonical"].fn(spark, "/root/testdata/sf0.01")
    stats = df.agg(
        F.count("*").alias("groups"),
        F.max("dup_count").alias("max_sz"),
        F.sum(F.when(F.col("dup_count") >= 2, 1).otherwise(0)).alias("multi"),
    ).first()
    assert stats.max_sz <= 3
    assert stats.multi / stats.groups > 0.3, (
        f"only {stats.multi}/{stats.groups} groups are multi-doc — "
        f"the canonicalization stopped folding crawl decorations"
    )

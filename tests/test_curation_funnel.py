"""Funnel-vs-components drift guard (VERDICT r3 item #7).

corpus_curation_funnel re-states its stages' formulations inline (one
declarative plan, no intermediate materialization). If a standalone
entry's rule ever changes without the funnel following — or vice
versa — the oracle twins would both still pass, because each side is
self-consistent. This test pins the cross-entry contract row-for-row:

- split      == corpus_split's assignment
- dedup_keep == membership in dedup_exact's representative set
- contaminated == membership in corpus_decontaminate's leak report
- quality_keep == the documented 2-rule subset (n_words >= 10 AND
  digit_ratio < 0.2) DERIVED FROM text_quality's feature columns
- final_keep == quality_keep AND dedup_keep AND NOT contaminated
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches

SF = "/root/testdata/sf0.01"


def test_funnel_bits_equal_standalone_verdicts(spark):
    funnel = plans.QUERIES["corpus_curation_funnel"].fn(spark, SF)
    split = plans.QUERIES["corpus_split"].fn(spark, SF).select(
        "doc_id", F.col("split").alias("sa_split")
    )
    reps = plans.QUERIES["dedup_exact"].fn(spark, SF).select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("sa_rep")
    )
    leaks = plans.QUERIES["corpus_decontaminate"].fn(spark, SF).select(
        F.col("train_id").alias("doc_id"), F.lit(True).alias("sa_leak")
    )
    quality = plans.QUERIES["text_quality"].fn(spark, SF).select(
        "doc_id",
        ((F.col("n_words") >= 10) & (F.col("digit_ratio") < 0.2)).alias(
            "sa_quality"
        ),
    )

    joined = (
        funnel.join(split, "doc_id")
        .join(reps, "doc_id", "left")
        .join(leaks, "doc_id", "left")
        .join(quality, "doc_id")
        .select(
            "doc_id",
            (F.col("split") == F.col("sa_split")).alias("split_ok"),
            (
                F.col("dedup_keep") == F.coalesce("sa_rep", F.lit(False))
            ).alias("dedup_ok"),
            (
                F.col("contaminated") == F.coalesce("sa_leak", F.lit(False))
            ).alias("contam_ok"),
            (F.col("quality_keep") == F.col("sa_quality")).alias(
                "quality_ok"
            ),
            (
                F.col("final_keep")
                == (
                    F.col("sa_quality")
                    & F.coalesce("sa_rep", F.lit(False))
                    & ~F.coalesce("sa_leak", F.lit(False))
                )
            ).alias("final_ok"),
        )
    )
    n_docs = funnel.count()
    agg = joined.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.col(c).cast("int")).alias(c)
            for c in (
                "split_ok",
                "dedup_ok",
                "contam_ok",
                "quality_ok",
                "final_ok",
            )
        ],
    ).first()
    release_caches()
    assert agg["n"] == n_docs  # the joins lost/duplicated nobody
    for c in ("split_ok", "dedup_ok", "contam_ok", "quality_ok", "final_ok"):
        assert agg[c] == n_docs, f"{c}: {agg[c]}/{n_docs} rows agree"


def test_training_manifest_totals_match_funnel_kept_docs(spark):
    """The flagship's packed token total must equal the token count of
    exactly the funnel's kept train docs — guards drift between the
    composed plan and its stages."""
    from pyspark.sql import functions as F

    from ibf_typhoon_data_pipeline_spark import plans
    from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    manifest = plans.QUERIES["pipeline_training_manifest"].fn(spark, sf)
    total_packed = manifest.agg(F.sum("n_tokens")).first()[0]

    funnel = plans.QUERIES["corpus_curation_funnel"].fn(spark, sf)
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    kept_tokens = (
        funnel.filter((F.col("split") == "train") & F.col("final_keep"))
        .join(docs, "doc_id")
        .filter(F.length(F.trim("text")) > 0)
        .agg(F.sum(F.size(F.split(F.trim("text"), " +"))))
        .first()[0]
    )
    assert total_packed == kept_tokens and total_packed > 0

"""Cross-engine pin of the m > 0 (residual-sign sub-bucket) arm of
the two-level capacity quantizer (round 12).

``ivf_two_level`` resolves to m = 0 at the driver's sf0.01 (500
vectors → 8 cells), so the sub-bucket SQL would otherwise only ever
execute Spark-side — on amplified tiers, where no oracle can follow
the ``@xN`` read. These tests force m = 2 on the sf0.01 fixture (8
k-means cells × 4 residual-sign buckets = 32 composite cells) and run
the SAME parameterized oracle generators the catalog entries use, so
the residual-sign terms, the composite-cell arithmetic, and the
probed-cell bucket recomputation are all value-pinned cross-engine.

Also pins the scheme's two structural claims: m = 0 degrades to the
plain k-means cell (byte-identical catalog behavior below the knee),
and the residual-sign split is near-even (the property that keeps
Σ cell² linear — the centroid is the cell mean, so each residual
dimension straddles zero).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators.similarity import (
    codebook_table_topk,
    fit_codebook_sample,
    ivf_two_level,
    semdedup_scaled_canonical,
)
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table
from tests.oracle_util import SF_ORACLE, compare_query

M = 2  # forced sub-bucket bits: 8 cells x 4 buckets = 32 composite


def _cents(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    return fit_codebook_sample(emb, "vec_id", "embedding", k=8)


def test_two_level_p1_matches_duckdb(spark):
    from ibf_typhoon_data_pipeline_spark.plans.vectors import (
        ivf_scaled_oracle_text_p1,
    )

    cents = _cents(spark)
    compare_query(
        spark,
        "two_level_p1_forced_m",
        lambda sp, sf: codebook_table_topk(
            load_table(sp, sf, "embeddings"), cents, k=5, probe=1, m=M
        ),
        ivf_scaled_oracle_text_p1(cents, M),
    )


def test_two_level_p2_matches_duckdb(spark):
    from ibf_typhoon_data_pipeline_spark.plans.vectors import (
        ivf_scaled_oracle_text_p2,
    )

    cents = _cents(spark)
    compare_query(
        spark,
        "two_level_p2_forced_m",
        lambda sp, sf: codebook_table_topk(
            load_table(sp, sf, "embeddings"), cents, k=5, probe=2, m=M
        ),
        ivf_scaled_oracle_text_p2(cents, len(cents), M),
    )


def test_two_level_semdedup_matches_duckdb(spark):
    from ibf_typhoon_data_pipeline_spark.plans.vectors import (
        semdedup_scaled_oracle_text,
    )

    cents = _cents(spark)
    compare_query(
        spark,
        "two_level_semdedup_forced_m",
        lambda sp, sf: semdedup_scaled_canonical(
            load_table(sp, sf, "embeddings"), cents, threshold=0.3, m=M
        ),
        semdedup_scaled_oracle_text(cents, M),
    )


def test_two_level_geometry_rule():
    # below the knee: plain k-means (m=0); past it k1 caps at 64 and
    # only m grows — total capacity always next_pow2(n/250)
    assert ivf_two_level(500) == (8, 0)
    assert ivf_two_level(2000) == (8, 0)
    assert ivf_two_level(20_000) == (64, 1)
    assert ivf_two_level(60_000) == (64, 2)
    assert ivf_two_level(100_000) == (64, 3)
    k1, m = ivf_two_level(10_000_000)
    assert k1 == 64 and k1 * (1 << m) >= 10_000_000 // 250


def test_residual_sign_buckets_are_near_even(spark):
    """The linear-Σcell² claim rests on the residual-sign split being
    near-even within each level-1 cell. Measured on the sf0.01
    fixture at m=2: no composite cell holds more than ~3x the even
    share of its level-1 parent (iid-uniform embeddings, 8 cells of
    ~40-80 vectors — small-sample noise allowed for)."""
    cents = _cents(spark)
    emb = load_table(spark, SF_ORACLE, "embeddings")
    out = semdedup_scaled_canonical(emb, cents, threshold=0.3, m=M)
    sizes = (
        out.groupBy("cluster_id")
        .count()
        .select(
            (F.col("cluster_id") / (1 << M)).cast("int").alias("c1"),
            "count",
        )
        .groupBy("c1")
        .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
        .collect()
    )
    for r in sizes:
        even = r.tot / (1 << M)
        assert r.mx <= 3 * even + 2, (r.c1, r.mx, r.tot)


def test_two_level_cluster_balance_matches_duckdb(spark):
    """Completes the forced-m symmetry: corpus_cluster_balance's
    composite-cell arithmetic rides the same generators, but its
    oracle was only parameterized for the entry's own (m=0 at sf0.01)
    geometry — this pins the m=2 arm plus the m-independent
    window/rate tail cross-engine."""
    from ibf_typhoon_data_pipeline_spark.plans.vectors import (
        cluster_balance_canonical,
        cluster_balance_oracle_text,
    )

    cents = _cents(spark)
    emb = load_table(spark, SF_ORACLE, "embeddings")
    t = emb.count() // (len(cents) * (1 << M))
    compare_query(
        spark,
        "two_level_cbal_forced_m",
        lambda sp, sf: cluster_balance_canonical(
            load_table(sp, sf, "embeddings"), cents, m=M, t=t
        ),
        cluster_balance_oracle_text(cents, M, t),
    )

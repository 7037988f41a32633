"""Contracts for the in-engine data-amplification tier
(sources/amplify.py — the '@xN' sf_dir suffix behind
scaling_curve.py's DATA_TIER, VERDICT r9 item 3).

The tier's scaling claim is only meaningful if the amplified read is
a *linearized* workload: N× the rows, disjoint replica key domains
(so joins/groupBys see N independent copies, not N-fold key
collisions), distinct per-replica text vocabulary (so shingle/LSH
pair spaces grow ~N, not N²), and replica 0 bit-identical to the
base data. These tests pin each property at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.sources.amplify import (
    KEY_OFFSET,
    split_amplified,
)
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_split_amplified_parses_suffix():
    assert split_amplified("/x/sf0.1@x10") == ("/x/sf0.1", 10)
    assert split_amplified("/x/sf0.1") == ("/x/sf0.1", 1)
    assert split_amplified("/x/sf0.1@x1") == ("/x/sf0.1", 1)


def test_amplified_row_counts_and_key_domains(spark):
    base = load_table(spark, SF, "documents")
    amp = load_table(spark, f"{SF}@x4", "documents")
    n = base.count()
    assert amp.count() == 4 * n
    # each replica's keys live in a disjoint 1e9-wide band
    per_band = (
        amp.groupBy((F.col("doc_id") / KEY_OFFSET).cast("bigint").alias("band"))
        .count()
        .orderBy("band")
        .collect()
    )
    assert [r.band for r in per_band] == [0, 1, 2, 3]
    assert all(r["count"] == n for r in per_band)


def test_replica_zero_is_identity(spark):
    base = load_table(spark, SF, "documents").orderBy("doc_id")
    amp = (
        load_table(spark, f"{SF}@x3", "documents")
        .filter(F.col("doc_id") < KEY_OFFSET)
        .orderBy("doc_id")
    )
    assert [r.asDict() for r in base.collect()] == [
        r.asDict() for r in amp.collect()
    ]


def test_replica_vocab_is_disjoint(spark):
    """The rotation cipher must give each replica its own token
    space — the property that keeps dedup/LSH pair spaces linear in
    the amplification instead of quadratic."""
    amp = load_table(spark, f"{SF}@x3", "documents")
    toks = amp.select(
        (F.col("doc_id") / KEY_OFFSET).cast("bigint").alias("band"),
        F.explode(F.split(F.trim("text"), " +")).alias("tok"),
    ).filter(F.length("tok") > 0)
    shared = (
        toks.distinct()
        .groupBy("tok")
        .agg(F.countDistinct("band").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert shared == 0


def test_no_caseless_tokens_in_documents(spark):
    """ADVICE r11: the 52-way vocabulary disjointness only holds for
    tokens containing a LOWERCASE letter — a caseless token (digits,
    punctuation, all-uppercase) is invariant under both the rotation
    and upper(), so it collides across every replica and quietly
    re-squares the pair spaces the amplifier exists to keep linear.
    The cipher's precondition is therefore pinned on the testdata
    itself: a regenerated corpus that introduces caseless tokens must
    fail HERE, not skew SCALING_CURVE.json silently."""
    docs = load_table(spark, SF, "documents")
    caseless = (
        docs.select(
            F.explode(F.split(F.trim("text"), " +")).alias("tok")
        )
        .filter(F.length("tok") > 0)
        .filter(~F.col("tok").rlike("[a-z]"))
        .count()
    )
    assert caseless == 0, (
        f"{caseless} caseless tokens in documents — the rotation "
        "cipher cannot keep replica vocabularies disjoint for them"
    )


def test_amplified_joins_stay_referential(spark):
    """Key shifts are consistent across tables: the orders⋈lineitem
    join over N replicas yields exactly N× the base join rows (each
    replica a disjoint, referentially-intact subgraph)."""
    li_b = load_table(spark, SF, "lineitem")
    o_b = load_table(spark, SF, "orders")
    base_join = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey).count()
    li = load_table(spark, f"{SF}@x4", "lineitem")
    o = load_table(spark, f"{SF}@x4", "orders")
    assert li.join(o, li.l_orderkey == o.o_orderkey).count() == 4 * base_join


def test_amplified_embeddings_keep_shape(spark):
    amp = load_table(spark, f"{SF}@x3", "embeddings")
    dims = amp.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [64]
    # replicas are NOT identical vectors (distinct ANN workload)...
    a, b = (
        amp.filter(F.col("vec_id") % KEY_OFFSET == 0)
        .orderBy("vec_id")
        .select("embedding")
        .limit(2)
        .collect()
    )
    assert a.embedding != b.embedding
    # ...but the perturbation is small (cells stay balanced)
    diff = max(abs(x - y) for x, y in zip(a.embedding, b.embedding))
    assert 0.0 < diff <= 0.05


def test_case_block_vocab_disjoint_past_26(spark):
    """Round 11 (ADVICE r10): past 26 replicas the cipher rotates
    within an UPPERCASE second alphabet instead of wrapping to the
    identity. Replicas {0, 1, 26, 27} must have pairwise-disjoint
    token spaces — the exact quartet the bare `% 26` wrap would have
    collided (26→0, 27→1)."""
    amp = load_table(spark, f"{SF}@x28", "documents")
    toks = amp.select(
        (F.col("doc_id") / KEY_OFFSET).cast("bigint").alias("band"),
        F.explode(F.split(F.trim("text"), " +")).alias("tok"),
    ).filter(F.length("tok") > 0).filter(
        F.col("band").isin(0, 1, 26, 27)
    )
    shared = (
        toks.distinct()
        .groupBy("tok")
        .agg(F.countDistinct("band").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert shared == 0
    # block-1 text is length-preserving (n_chars stays truthful)
    bad = amp.filter(
        (F.col("doc_id") >= 26 * KEY_OFFSET)
        & (F.length("text") != F.col("n_chars"))
    ).count()
    assert bad == 0


def test_amplification_past_cipher_capacity_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="52"):
        load_table(spark, f"{SF}@x53", "documents")


def test_fixed_domains_never_amplify(spark):
    assert (
        load_table(spark, f"{SF}@x4", "nation").count()
        == load_table(spark, SF, "nation").count()
    )

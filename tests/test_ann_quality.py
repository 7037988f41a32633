"""ANN quality contract: the bucketed variants must recover a
meaningful share of the true cosine top-5, and multi-probe must
strictly improve on single-probe — the statistical claim that makes
the sub-quadratic pair space a valid stand-in for brute force.

Floors are set from measured values on the synthetic embeddings
(uniform random — the WORST case for ANN: no cluster structure), with
slack for future regeneration of the test data.
"""

from __future__ import annotations

from ibf_typhoon_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_multiprobe_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ann_recall_floors_and_multiprobe_gain(spark):
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth = _pairs(brute_force_topk(emb, k=5))
    assert truth

    recall = {}
    for name, df in [
        ("ivf_p1", ivf_topk(emb, k=5)),
        ("ivf_p2", ivf_multiprobe_topk(emb, k=5, probe=2)),
        ("lsh", lsh_bucketed_topk(emb, k=5)),
    ]:
        approx = _pairs(df)
        recall[name] = len(approx & truth) / len(truth)

    # measured at sf0.01: ivf_p1 ≈ 0.26, lsh ≈ 0.055
    assert recall["ivf_p1"] > 0.15, recall
    assert recall["lsh"] > 0.02, recall
    # probing a second cell must strictly add recall
    assert recall["ivf_p2"] > recall["ivf_p1"], recall


def test_trained_codebook_beats_axis_anchors(spark):
    """The k-means coarse quantizer must dominate the axis-segment
    stand-in at equal probe budget — the claim that makes it the
    production swap. Measured at sf0.01: codebook 0.318/0.514 vs axis
    0.259/0.443 at probe 1/2. (An absolute-recall target like 0.9 is
    not reachable on THIS fixture: iid-uniform 64-dim embeddings have
    no cluster structure, so top-5 neighbors are barely closer than
    random points — the worst case for any coarse quantizer. The
    contract is therefore relative: trained > axis, and probe adds.)"""
    from ibf_typhoon_data_pipeline_spark.operators.similarity import (
        codebook_ivf_topk,
        fit_codebook_sample,
        seeded_lsh_topk,
        seeded_planes,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth = _pairs(brute_force_topk(emb, k=5))
    cents = fit_codebook_sample(emb, "vec_id", "embedding")

    def recall(df):
        got = _pairs(df)
        return len(got & truth) / len(truth)

    axis_p1 = recall(ivf_topk(emb, k=5))
    axis_p2 = recall(ivf_multiprobe_topk(emb, k=5, probe=2))
    cb_p1 = recall(codebook_ivf_topk(emb, cents, k=5, probe=1))
    cb_p2 = recall(codebook_ivf_topk(emb, cents, k=5, probe=2))
    assert cb_p1 > axis_p1, (cb_p1, axis_p1)
    assert cb_p2 > axis_p2, (cb_p2, axis_p2)
    assert cb_p2 > cb_p1, (cb_p2, cb_p1)
    assert cb_p2 > 0.45, cb_p2  # measured 0.514, slack for regeneration

    # seeded Gaussian planes are statistically equivalent to axis
    # planes on uniform data (any fixed basis is "random" relative to
    # an isotropic distribution) — assert the floor, not dominance
    lsh_seeded = recall(seeded_lsh_topk(emb, seeded_planes(), k=5))
    assert lsh_seeded > 0.02, lsh_seeded


def test_table_backed_codebook_recall_contract(spark):
    """Recall contract for the UNCLAMPED capacity path (round 12,
    VERDICT r11 item 1): codebook_table_topk — centroids as one
    nested-array literal, one HOF d2 assignment, k from
    ivf_capacity_scaled — must match the literal-inlined codebook's
    quality at the same k (argmin ‖v−c‖² ≡ argmax v·c − ‖c‖²/2, so at
    sf0.01/k=8 recall measured identical: 0.318 / 0.514 at probe
    1/2), and probe-2 must strictly add recall. This is the entry the
    catalog names as the >64-cell scale path, so its quality floor is
    a shipped claim, not an implementation detail."""
    from ibf_typhoon_data_pipeline_spark.operators.similarity import (
        codebook_table_topk,
        fit_codebook_sample,
        fit_sample_size,
        ivf_capacity_scaled,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth = _pairs(brute_force_topk(emb, k=5))
    k = ivf_capacity_scaled(emb.count())
    cents = fit_codebook_sample(
        emb, "vec_id", "embedding", sample=fit_sample_size(k), k=k
    )

    def recall(df):
        got = _pairs(df)
        return len(got & truth) / len(truth)

    t_p1 = recall(codebook_table_topk(emb, cents, k=5, probe=1))
    t_p2 = recall(codebook_table_topk(emb, cents, k=5, probe=2))
    assert t_p1 > 0.25, t_p1  # measured 0.318, slack for regeneration
    assert t_p2 > t_p1, (t_p2, t_p1)
    assert t_p2 > 0.45, t_p2  # measured 0.514


def test_pq_adc_recall_vs_exact_l2(spark):
    """PQ-ADC quality contract: the compressed-domain top-5 per query
    must recover a meaningful share of the EXACT L2 top-5 (same 8
    queries), and the PQ reconstruction error must be far below the
    vectors' own norms — the two claims that make 4x8 codes a usable
    stand-in for 64 floats. Floors measured on the uniform fixture
    (the no-structure worst case)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ibf_typhoon_data_pipeline_spark import plans

    sf = "/root/testdata/sf0.01"
    adc = plans.QUERIES["sim_pq_adc_topk"].fn(spark, sf)
    approx = _pairs(adc)

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__v")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("__v").alias("__qv")
    )
    d2 = F.expr(
        "aggregate(zip_with(__qv, __v, (a, b) -> (a - b) * (a - b)),"
        " 0D, (acc, x) -> acc + x)"
    )
    pairs = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        d2.alias("l2sq"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2sq").asc(), F.col("neighbor_id").asc()
    )
    truth = _pairs(
        pairs.withColumn("rn", F.row_number().over(w)).filter("rn <= 5")
    )
    recall = len(approx & truth) / len(truth)
    # measured ≈ 0.30 on the uniform fixture; floor with slack
    assert recall > 0.15, recall

    pq = plans.QUERIES["emb_product_quantize"].fn(spark, sf)
    stats = (
        pq.join(emb, "vec_id")
        .select(
            F.col("recon_err").alias("err"),
            F.expr(
                "aggregate(transform(__v, x -> x * x),"
                " 0D, (acc, x) -> acc + x)"
            ).alias("ssq"),
        )
        .agg(F.avg("err").alias("e"), F.avg("ssq").alias("s"))
        .first()
    )
    # quantization must remove a real share of the energy (uniform
    # vectors are the hardest case — measured ratio ≈ 0.75)
    assert 0.0 < stats["e"] < 0.9 * stats["s"], stats


def test_binary_hamming_recall_floor(spark):
    """62-bit sign fingerprints must recover a meaningful share of
    the true cosine top-5 for the sampled queries — the claim that
    makes the 32x-compressed popcount search a valid first-pass
    retriever. Measured 0.28 at sf0.01 on the iid-uniform fixture
    (the ANN worst case; in line with ivf_p1's 0.26)."""
    from ibf_typhoon_data_pipeline_spark import plans

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, k=5).collect()
        if r.query_id % 50 == 0
    }
    assert truth
    got = _pairs(
        plans.QUERIES["sim_binary_hamming_topk"].fn(
            spark, "/root/testdata/sf0.01"
        )
    )
    recall = len(got & truth) / len(truth)
    assert recall > 0.15, recall


def test_range_search_precision_exact_and_banded_recall(spark):
    """Range-search contract: every emitted pair must truly clear the
    radius (precision 1.0 — the residual filter is exact), the banded
    candidate union must be duplicate-free (the canonical-band rule),
    and two OR-amplified bands must strictly beat either single band's
    recall of the TRUE radius pair set."""
    from pyspark.sql import functions as F

    from ibf_typhoon_data_pipeline_spark.operators.similarity import (
        _as_double,
        dot,
        l2_norm,
        range_search_banded,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    t = 0.25

    got = range_search_banded(emb, threshold=t, m=6)
    rows = got.collect()
    pairs = {(r.a_id, r.b_id) for r in rows}
    # duplicate-free union without a DISTINCT
    assert len(rows) == len(pairs)
    # precision: the residual cosine filter is exact by construction
    assert all(r.cosine_sim >= t for r in rows)

    # ground truth: brute-force all-pairs radius set
    base = emb.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).select("vec_id", "v", l2_norm(F.col("v")).alias("n"))
    a = base.selectExpr("vec_id AS a_id", "v AS av", "n AS an")
    b = base.selectExpr("vec_id AS b_id", "v AS bv", "n AS bn")
    truth_df = (
        a.join(b, F.col("b_id") < F.col("a_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")),
                6,
            ).alias("s"),
        )
        .filter(F.col("s") >= t)
    )
    truth = {(r.a_id, r.b_id) for r in truth_df.collect()}
    assert pairs <= truth  # no false positives vs brute force either
    recall2 = len(pairs) / len(truth)

    # single-band baseline: band-1 (dims 1..6) hits only — the
    # OR-amplified two-band union must strictly beat it
    from ibf_typhoon_data_pipeline_spark.operators.similarity import (
        sign_bucket,
    )

    bb = base.select(
        "vec_id", "v", "n", sign_bucket(F.col("v"), 6, 1).alias("b1")
    )
    a1 = bb.selectExpr("vec_id AS a_id", "v AS av", "n AS an", "b1")
    b1 = bb.selectExpr("vec_id AS b_id", "v AS bv", "n AS bn", "b1 AS bb1")
    single = (
        a1.join(b1, F.col("b1") == F.col("bb1"))
        .filter(F.col("b_id") < F.col("a_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")),
                6,
            ).alias("s"),
        )
        .filter(F.col("s") >= t)
    )
    recall1 = len({(r.a_id, r.b_id) for r in single.collect()}) / len(truth)
    assert recall2 > recall1, (recall2, recall1)
    assert recall2 > 0.04, recall2  # floor on uniform-random worst case

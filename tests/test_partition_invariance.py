"""Partitioning-invariance sweep: a distributed plan's VALUES must not
depend on how the data is physically partitioned. Re-running a
representative per family at spark.sql.shuffle.partitions=3 (vs the
session's 32) and asserting identical sorted results catches
order-dependent folds, undeterministic tiebreakers, and accidental
partition-local logic — the failure class that only shows up when a
cluster resizes."""

from __future__ import annotations

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches

SF = "/root/testdata/sf0.01"

# one per structural family: global running sum (bucketed two-pass
# AND its range-split fallback),
# window dedup, Pregel iteration, driver-fit model, HOF-array kernel,
# inverted-index join, trained-codebook ANN
NAMES = [
    "corpus_token_budget",
    # range-partition fallback path of global_running_sum (num_ranges
    # defaults to shuffle.partitions — the values must not care)
    "w5_ntile_priority",
    "a20_abc_classification",
    "a9_dedup_keep_last",
    "graph_pagerank",
    # round 12: the PPR loop went join-back-free (teleport mask rides
    # the persisted edge frame, is_src re-derived inside the
    # destination agg) and the loop persists repartition to the
    # session shuffle width — values must not care what that width is
    "graph_personalized_pagerank",
    # round 12: integer peel-loop keys with the label re-attached
    # BEFORE the tiebreak sort — the top-50 cut must not move with
    # the loop width either
    "graph_kcore",
    "tc_damage_gbt",
    "dedup_jaccard_prefix",
    "dedup_semdedup",
    "corpus_dsir_weights",
    # round-6 families: basket self-join + broadcast-count rank,
    # dimension-frame global RANGE window, AMS map-side sign counters
    # (the classic partition-order-sensitive failure shape: each is a
    # sum of ±1 — any non-commutative fold would flip values)
    "orders_item_cf_topk",
    "events_classical_decompose",
    "sketch_ams_f2",
    # round 8: the never-driver-checked backlog heads this round's
    # sample (VERDICT r7 item 2) — a partition-sensitive flake in any
    # of them would burn the 345/345 close, so sweep them all once
    "sim_mmr_rerank",
    # round 11: HOF-array centroid assignment + fenced pair join
    "dedup_semdedup_scaled",
    "ml_kmeans_lloyd",
    "sim_knn_ndcg",
    "sim_knn_graph",
    "sim_binary_hamming_topk",
    "emb_label_centroids",
    "emb_whiten_norm",
    "ml_knn_classify",
    "sim_matryoshka_recall",
    "emb_cluster_calinski",
    "o6_skyline_fact",
    "media_image_tiles",
    "f24_collated_grouping",
    "sim_range_search",
    "sim_lsh_recall_eval",
    # round 8: the vocab joins went AQE-decided (de-hinted) — their
    # physical strategy now varies with runtime sizes, so pin that
    # the integer micro-nat values don't care how the join shuffles
    "text_lm_logprob",
    # round 11: its K-bounded twin (top-K vocab cut + pooled OOV mass
    # — the LIMIT boundary must not depend on partitioning)
    "text_lm_logprob_capped",
    "text_pmi_pairs",
    "corpus_heldout_ppl",
    "ml_naive_bayes",
    "text_rake_keywords",
    "corpus_ppl_buckets",
]


def _rows(spark, name):
    df = plans.QUERIES[name].fn(spark, SF)
    out = sorted(tuple(r) for r in df.collect())
    release_caches()
    return out


def test_values_survive_repartitioning(spark):
    base = {n: _rows(spark, n) for n in NAMES}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for n in NAMES:
            assert _rows(spark, n) == base[n], (
                f"{n}: values changed under shuffle.partitions=3"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

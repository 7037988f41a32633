"""No persist may outlive release_caches() (the repo's
persist-in-builder / release-in-orchestration invariant). Round-3
ADVICE found connected_components leaking its returned label frame;
this sweep runs every persist-heavy builder family and asserts the
JVM's persistent-RDD registry is empty afterwards — any future
builder that bypasses persist_tracked/track fails here."""

from __future__ import annotations

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches

SF = "/root/testdata/sf0.01"

# one representative per persist-using family: inverted-index dedup,
# containment, transitive clusters (iterative persists), PageRank
# (edge+degree persists), codebook IVF (cells), packing cumsum
# (local frame), track-json (pts)
PERSIST_HEAVY = [
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_clusters",
    "graph_pagerank",
    "sim_ivf_codebook_topk",
    "corpus_token_budget",
    "tc_track_json",
    # round-4 session additions that persist: triangle counting
    # (edges + oriented), entity clusters (CC labels), basket lift
    # (distinct basket rows), PMI (distinct token rows)
    "graph_triangle_count",
    "link_entity_clusters",
    "basket_pair_lift",
    "text_pmi_pairs",
]


def test_release_caches_leaves_no_persistent_rdds(spark):
    for name in PERSIST_HEAVY:
        plans.QUERIES[name].fn(spark, SF).count()
        release_caches()
        leaked = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert leaked == 0, f"{name}: {leaked} persisted RDD(s) survive"


def test_persist_tracked_enables_cached_plan_aqe(spark):
    """persist_tracked pins `canChangeCachedPlanOutputPartitioning`
    (default false) — but only in OVER-partitioned sessions (> 64
    shuffle partitions), where un-coalesced 200-task stages over
    kilobyte cached partitions dominate (graph_triangle_count measured
    27 s → 2.3 s at sf0.01 from this one conf). In a tuned <=64
    session the pin measurably HURTS iterative loops
    (label_propagation 5.0 → 6.1 s at sf0.1), so the gate must also
    RESET to false there — one-way leakage from an earlier
    over-partitioned window re-fails here."""
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    part_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(part_key)
    try:
        # over-partitioned session: the pin engages
        spark.conf.set(part_key, "200")
        spark.conf.set(key, "false")
        df = persist_tracked(spark.range(10))
        assert spark.conf.get(key) == "true"
        df.unpersist()
        release_caches()

        # tuned session: the gate actively resets (no one-way leak)
        spark.conf.set(part_key, "32")
        df = persist_tracked(spark.range(10))
        assert spark.conf.get(key) == "false"
        df.unpersist()
        release_caches()
    finally:
        spark.conf.set(part_key, saved)
        release_caches()

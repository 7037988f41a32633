"""Scale-path parity: the round-8 de-hinting (base tables, vocab
frames) leaves join strategy to AQE, which broadcasts at bench SF but
degrades to shuffle joins once the build side outgrows the threshold
— i.e. on a real 100 TB corpus. That degraded path never executes at
test scale on its own, so this sweep forces it: re-run each de-hinted
entry with autoBroadcastJoinThreshold=-1 (every un-hinted join becomes
a shuffle join; explicit F.broadcast hints on bounded dims are
unaffected by the threshold) and assert values identical to the
default session. A pass proves the 100 TB fallback plan computes the
same answer, not just the bench-SF broadcast plan."""

from __future__ import annotations

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches

SF = "/root/testdata/sf0.01"

# every family the round-8 de-hinting touched:
NAMES = [
    # vocab-frame joins (Heaps-growing tok/term keys)
    "text_lm_logprob",
    "corpus_ppl_buckets",
    "corpus_heldout_ppl",
    "text_pmi_pairs",
    "text_rake_keywords",
    "ml_naive_bayes",
    # SF-scaling base-table joins (customer/supplier/part): every
    # TPC-H entry the round-8 de-hinting touched
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity_lines",
    "q19_disjunctive_filter",
    "q20_excess_shippers",
    "q21_late_sole_supplier",
    # key-set joins the extended hygiene guard itself found
    "audit_referential_integrity",
    "graph_bfs_hops",
    "graph_personalized_pagerank",
    "graph_sssp_weighted",
    # round-9: windfield pair join on a skewed dense grid, AQE-decided
    # by construction (broadcast=False) — its skew-split degradation
    # is additionally exercised in test_aqe_skew.py
    "tc_windfield_skewgrid",
    # round-9: the hazard ⋈ dists join of the 3-storm DAG is un-hinted
    "tc_multi_event_dag",
    # round-9: the LATERAL table-UDF rewrites to AQE-decided joins
    # (distinct-types build side vs the per-type WindowGroupLimit)
    "sql_udf_table_valued",
    # round-11: the IVF pair joins were always AQE-decided (un-hinted
    # cell-key self joins behind the explode fence) — with the
    # capacity rule now data-derived, pin that the forced-SMJ path
    # computes identical top-k values for both probe depths
    "sim_ivf_topk",
    "sim_ivf_probe2_topk",
    "dedup_semdedup_scaled",
    # round-12: the unclamped centroid-table IVF twins — same
    # AQE-decided cell-key joins, probe-2 additionally exercises the
    # ranked-array explode under forced SMJ
    "sim_ivf_scaled_topk",
    "sim_ivf_scaled_probe2",
]
# stream_static_enrich was also de-hinted (its static dim join is
# size-decided per micro-batch) but is excluded here: this sweep
# collect()s batch DataFrames, and the streaming entry's values are
# already parity-checked against its batch oracle twin in the main
# gate — the forced-shuffle static join it would exercise is the same
# broadcast-vs-shuffle dim join the batch entries above cover.


def _rows(spark, name):
    df = plans.QUERIES[name].fn(spark, SF)
    out = sorted(tuple(r) for r in df.collect())
    release_caches()
    return out


def test_values_survive_broadcast_disable(spark):
    base = {n: _rows(spark, n) for n in NAMES}
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # non-vacuity: the disabled threshold must actually flip the
        # vocab join to a shuffle join in the FINAL adaptive plan —
        # spark.sql.adaptive.autoBroadcastJoinThreshold defaults to
        # the static conf, but if a future Spark decouples them this
        # sweep would silently test the broadcast plan twice
        probe = plans.QUERIES["text_lm_logprob"].fn(spark, SF)
        probe.collect()
        head = probe._jdf.queryExecution().executedPlan().toString()
        release_caches()
        assert (
            "SortMergeJoin" in head or "ShuffledHashJoin" in head
        ), "threshold=-1 did not force a shuffle join — sweep vacuous"
        for n in NAMES:
            assert _rows(spark, n) == base[n], (
                f"{n}: values changed on the forced shuffle-join path"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

"""Runtime bloom-filter join pruning evidence (SPARK-32268).

At 100 TB the classic star-join bottleneck is a shuffled fact⋈dim
join where the dim filter is selective but not broadcastable: every
fact row ships through the exchange only to be dropped by the join.
Spark's runtime filter injects a `bloom_filter_agg` on the filtered
dim side and a `might_contain(xxhash64(key))` predicate on the fact
side BEFORE its shuffle, so non-matching fact rows die at the scan.

This test pins (a) the injection actually happening in the optimized
plan and (b) values being identical with the filter on and off. The
size thresholds are lowered because the local fixture is far below
the production defaults (10 GB application-side scan) — the
injection RULE, not the threshold tuning, is what we pin. With
broadcast joins enabled Spark correctly skips injection (a broadcast
hash join already filters at the scan via DPP/locality), which is
why the test disables broadcast: the sort-merge path is the one that
needs the bloom.
"""

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

from .conftest import SF_ORACLE

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, confs):
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return prev


def _restore(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _query(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    part = load_table(spark, SF_ORACLE, "part").filter(
        F.col("p_size") == 1
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_size")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast(
                    "long"
                )
            ).alias("cents"),
        )
    )


def test_runtime_bloom_filter_injected_and_exact(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    prev = _with_confs(spark, _CONFS)
    try:
        q = _query(spark)
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
        with_bloom = q.collect()
    finally:
        _restore(spark, prev)
    # values identical with the rule off — the bloom is pruning-only
    prev = _with_confs(
        spark,
        {
            **_CONFS,
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
        },
    )
    try:
        q2 = _query(spark)
        plan2 = q2._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in plan2
        without_bloom = q2.collect()
    finally:
        _restore(spark, prev)
    assert sorted(map(tuple, with_bloom)) == sorted(
        map(tuple, without_bloom)
    )

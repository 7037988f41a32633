"""Accuracy contracts for Spark's NATIVE approximate aggregates —
`approx_count_distinct` (HLL++) and `approx_percentile` (QuantileSummaries)
— the everyday 100 TB substitutes for exact distinct/percentile. The
catalog's sketch entries re-implement the published algorithms for
cross-engine oracle parity (sketch_hyperloglog, sketch_quantile_
histogram); these tests pin the BUILT-IN operators' quality against
exact answers on real tables, the same contract style as
test_ann_quality / test_dedup_quality: not oracle-hashable (DuckDB's
approx implementations differ), but bounded-error and
partition-invariant, which is what a production plan relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    """NOTE (ADVICE r9): rsd=0.05 is an *asymptotic* standard
    deviation; for small cardinalities the bias-corrected small-range
    estimator takes over, so the 3-sigma 0.15 margin here is an
    empirical contract on these fixed tables, not a distribution-free
    guarantee."""
    li = load_table(spark, SF, "lineitem")
    for col in ("l_partkey", "l_suppkey", "l_orderkey"):
        exact = li.select(F.countDistinct(col)).first()[0]
        est = li.select(F.approx_count_distinct(col)).first()[0]
        # default rsd = 0.05; allow 3 sigma
        assert abs(est - exact) <= 0.15 * exact, (col, exact, est)


def test_approx_count_distinct_partition_invariant(spark):
    """HLL++ register merge is exact: the estimate must not depend on
    how the data is partitioned (the property that makes it safe as a
    map-side partial aggregate at any cluster size)."""
    li = load_table(spark, SF, "lineitem").select("l_partkey")
    a = li.repartition(4).select(F.approx_count_distinct("l_partkey")).first()[0]
    b = li.repartition(32).select(F.approx_count_distinct("l_partkey")).first()[0]
    assert a == b, (a, b)


def test_approx_percentile_rank_error_bound(spark):
    """approx_percentile(col, q, acc) bounds RANK error by n/acc: the
    returned value must lie between the exact (q - 1/acc) and
    (q + 1/acc) percentiles (with a safety factor of 2)."""
    o = load_table(spark, SF, "orders")
    acc = 1000
    for q in (0.5, 0.95):
        lo_q, hi_q = max(0.0, q - 2.0 / acc), min(1.0, q + 2.0 / acc)
        row = o.select(
            F.expr(f"approx_percentile(o_totalprice, {q}, {acc})").alias("ap"),
            F.expr(f"percentile(o_totalprice, {lo_q})").alias("lo"),
            F.expr(f"percentile(o_totalprice, {hi_q})").alias("hi"),
        ).first()
        assert row["lo"] <= row["ap"] <= row["hi"], (q, dict(row.asDict()))

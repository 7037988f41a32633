"""Structural guarantees of the sketch entries — properties the
oracle hash cannot express (it only pins one dataset's values):

- count-min never underestimates (est >= exact, for every key);
- the histogram quantile estimate lands within half a bin width of a
  rank-correct value (midpoint rule error bound);
- Efraimidis–Spirakis weighted sampling is deterministic across
  invocations and only ever samples weight-eligible docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches

SF = "/root/testdata/sf0.01"


def test_count_min_never_underestimates(spark):
    rows = plans.QUERIES["sketch_count_min"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_est"] >= r["n_exact"], (
            f"user {r['user_id']}: est {r['n_est']} < exact {r['n_exact']}"
        )


def test_quantile_histogram_error_bound(spark):
    rows = {
        r["pct"]: r
        for r in plans.QUERIES["sketch_quantile_histogram"].fn(spark, SF).collect()
    }
    li = plans.QUERIES["sketch_quantile_histogram"].fn  # noqa: F841
    from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

    vals = load_table(spark, SF, "lineitem").select("l_extendedprice")
    lo, hi, n = vals.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"), F.count("*")
    ).first()
    bin_w = (hi - lo) / 1024.0
    for pct, r in rows.items():
        # exact value at the sketch's target rank ceil(n * pct / 100)
        import math

        target = math.ceil(n * pct / 100)
        exact = (
            vals.orderBy("l_extendedprice")
            .limit(target)
            .agg(F.max("l_extendedprice"))
            .first()[0]
        )
        assert abs(r["est_value"] - exact) <= bin_w, (
            f"p{pct}: est {r['est_value']} vs exact {exact}, bin {bin_w}"
        )


def test_weighted_sample_deterministic_and_eligible(spark):
    fn = plans.QUERIES["corpus_weighted_sample"].fn
    a = sorted(tuple(r) for r in fn(spark, SF).collect())
    b = sorted(tuple(r) for r in fn(spark, SF).collect())
    release_caches()
    assert a == b  # repartition-independent, run-independent
    assert len(a) == 100
    assert all(r[1] > 0 for r in a)  # n_tokens (weight) > 0 for every pick


def test_ams_f2_estimate_within_bound(spark):
    """AMS mean-of-64 F2 estimate: std <= sqrt(2/64) ~= 18% of F2.
    Pin the DETERMINISTIC measured error (md5 signs are fixed) well
    inside 3 sigma so a sign/parity regression fails loudly while
    normal estimator variance cannot."""
    from ibf_typhoon_data_pipeline_spark import plans
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        release_caches,
    )

    row = (
        plans.QUERIES["sketch_ams_f2"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    release_caches()
    assert row.exact_f2 > 0
    assert row.rel_err_micro < 540_000, row  # 3 sigma = ~54%
    # est must be the right order of magnitude, not degenerate
    assert row.est_f2 > row.exact_f2 // 4, row

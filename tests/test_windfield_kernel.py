"""The applyInPandas Holland kernel must agree with the oracle-checked
expression path elementwise — same formulas, two physical strategies
(SURVEY §2.9 K1; numpy vs whole-stage codegen)."""

from __future__ import annotations

from ibf_typhoon_data_pipeline_spark.plans.typhoon import (
    gen_centroids,
    gen_tracks,
)
from ibf_typhoon_data_pipeline_spark.operators.windfield import (
    windfield_expr,
    windfield_kernel,
)


def test_kernel_matches_expr(spark):
    tracks = gen_tracks(spark).filter("ens_id < 6")  # subset: speed
    cents = gen_centroids(spark).select("centroid_id", "lat", "lon")
    expr_rows = {
        (r.ens_id, r.step, r.centroid_id): r.wind_ms
        for r in windfield_expr(tracks, cents).collect()
    }
    kern_rows = {
        (r.ens_id, r.step, r.centroid_id): r.wind_ms
        for r in windfield_kernel(tracks, cents).collect()
    }
    assert set(expr_rows) == set(kern_rows)
    worst = max(
        abs(expr_rows[k] - kern_rows[k]) for k in expr_rows
    )
    assert worst < 1e-6, f"kernel diverges from expr path by {worst}"


def test_intensity_reduce_is_max_per_member_centroid(spark):
    from pyspark.sql import functions as F

    from ibf_typhoon_data_pipeline_spark.operators.windfield import (
        intensity_reduce,
    )

    tracks = gen_tracks(spark).filter("ens_id < 3")
    cents = gen_centroids(spark).select("centroid_id", "lat", "lon")
    wf = windfield_expr(tracks, cents)
    reduced = intensity_reduce(wf)
    direct = wf.groupBy("ens_id", "centroid_id").agg(
        F.max("wind_ms").alias("intensity_ms")
    )
    assert reduced.exceptAll(direct).count() == 0
    assert direct.exceptAll(reduced).count() == 0

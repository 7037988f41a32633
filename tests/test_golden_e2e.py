"""Golden end-to-end pin (SURVEY §5.2): the full synthetic typhoon
through tracks → windfield → hazard → damage → triggers must keep
producing EXACTLY these numbers. Any change to the generator, the
physics, or an aggregation shows up here before it shows up at the
correctness gate.

Note prob_gt_80k = 0.5: 26 of 52 members exceed the CERF threshold —
deliberately on the >= trigger boundary, so an off-by-one member or a
changed tiebreak flips a boolean, not just a decimal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark import plans


def test_trigger_ladder_golden(spark):
    row = plans.QUERIES["tc_trigger_ladder"].fn(spark, "x").collect()[0]
    assert row.prob_gt_20k == 1.0
    assert row.prob_gt_50k == 1.0
    assert row.prob_gt_80k == 0.5
    assert row.dref_triggered is True
    assert row.cerf_triggered is True


def test_windfield_and_hazard_cardinality_golden(spark):
    assert plans.QUERIES["tc_windfield_holland"].fn(spark, "x").count() == 52945
    assert plans.QUERIES["tc_muni_hazard"].fn(spark, "x").count() == 14418


def test_landfall_golden(spark):
    lf = plans.QUERIES["tc_landfall_classify"].fn(spark, "x")
    agg = lf.agg(
        F.sum(F.col("made_landfall").cast("int")).alias("n_landfall"),
        F.min("closest_km").alias("min_close"),
    ).collect()[0]
    assert agg.n_landfall == 52  # every member of this storm makes landfall
    assert agg.min_close == 194.101

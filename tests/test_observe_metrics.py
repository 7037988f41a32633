"""Spark `observe()` instrumentation: pipeline data-quality counters
ride the SAME action as the query (no second pass over the fact
table), and their values must agree with a DuckDB oracle on the same
slice. This is the engine's zero-cost audit surface for production
runs — every sink write can carry row/null/range counters."""

from __future__ import annotations

import duckdb
from pyspark.sql import Observation
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_observe_counters_match_oracle(spark):
    li = load_table(spark, SF, "lineitem")
    obs = Observation("li_audit")
    audited = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
        ).alias("n_discounted"),
        F.round(F.sum("l_quantity")).cast("long").alias("qty_total"),
    )
    # the observation piggybacks on whatever action consumes the frame
    n_out = audited.filter(F.col("l_quantity") >= 25).count()

    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT count(*),
               sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END),
               CAST(round(sum(l_quantity)) AS BIGINT),
               sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END)
        FROM '{SF}/lineitem.parquet'
        """
    ).fetchone()
    got = obs.get
    assert got["n_rows"] == want[0]
    assert got["n_discounted"] == want[1]
    assert got["qty_total"] == want[2]
    assert n_out == want[3]

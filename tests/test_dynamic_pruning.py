"""Dynamic partition pruning: a selective dimension filter must prune
the fact table's partitions AT RUNTIME through the join (Spark 3's
DPP) — the plan carries a dynamicpruning subquery on the partition
key and values still match a DuckDB oracle over the same files."""

from __future__ import annotations

import os
import shutil

import duckdb
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_dim_filter_prunes_fact_partitions_at_runtime(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    orders = load_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)

    fact = spark.read.parquet(out)
    dim = spark.range(1995, 2002).select(
        F.col("id").cast("int").alias("d_year"),
        (F.col("id") % 2 == 0).alias("is_even"),
    )
    joined = (
        fact.join(dim, fact.o_year == dim.d_year)
        .filter(F.col("is_even"))
        .groupBy("o_year")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("o_year")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    got = [tuple(r) for r in joined.collect()]
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(count(*) AS BIGINT) AS n
        FROM '{SF}/orders.parquet'
        WHERE year(o_orderdate) % 2 = 0
        GROUP BY o_year ORDER BY o_year
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]

"""Bucketed-layout test: joining two tables bucketed on the same key
must produce a plan with NO shuffle (Exchange) — the write-once,
join-many contract the 100 TB layout depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.plans.typhoon import (
    gen_centroids,
    gen_tracks,
)
from ibf_typhoon_data_pipeline_spark.operators.windfield import windfield_expr
from ibf_typhoon_data_pipeline_spark.sources.layout import (
    read_table,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    # a managed table's location survives the session that created it;
    # clear both catalog entry and directory so reruns are idempotent
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("wf_bucketed", "ca_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    cents = gen_centroids(spark)
    wf = windfield_expr(
        gen_tracks(spark).filter("ens_id < 4"),
        cents.select("centroid_id", "lat", "lon"),
    )
    write_bucketed(
        wf, "wf_bucketed", ["centroid_id"], n_buckets=8
    )
    write_bucketed(
        cents.select("centroid_id", "adm3_pcode"),
        "ca_bucketed",
        ["centroid_id"],
        n_buckets=8,
    )
    joined = read_table(spark, "wf_bucketed").join(
        read_table(spark, "ca_bucketed").hint("merge"), "centroid_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    # and the result is the same as the unbucketed join
    n = joined.groupBy("adm3_pcode").agg(F.count("*")).count()
    assert n > 0


def test_zorder_tile_layout_prunes_partitions(spark, tmp_path):
    """Writing the grid partitioned by the Morton tile and filtering on
    it must prune at the SCAN (PartitionFilters), reading only the
    matching tile directories — the data-skipping payoff the
    layout_zorder_key entry exists for."""
    from ibf_typhoon_data_pipeline_spark import plans

    out = str(tmp_path / "ztiles")
    keys = plans.QUERIES["layout_zorder_key"].fn(
        spark, "/root/testdata/sf0.01"
    )
    keys.write.mode("overwrite").partitionBy("ztile").parquet(out)

    df = spark.read.parquet(out).filter(F.col("ztile") == 838)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ztile" in plan
    # spatial locality: one tile holds a contiguous lat/lon block, and
    # the filter touches only that block's rows
    n_total = plans.QUERIES["layout_zorder_key"].fn(
        spark, "/root/testdata/sf0.01"
    ).count()
    assert 0 < df.count() < n_total

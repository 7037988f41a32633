"""global_running_sum must equal the naive global window for BOTH
paths — the md5-prefix bucket fast path (used by the packing entries)
and the repartitionByRange fallback (no order-aligned bucket
expression available) — at several partition counts, since the whole
point is that bucketing never changes the values."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches
from ibf_typhoon_data_pipeline_spark.operators.windows import global_running_sum


def _base(spark):
    return (
        spark.range(1000)
        .select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("key"),
            (F.col("id") % 37 + 1).alias("w"),
        )
        .repartition(7)  # scramble physical order on purpose
    )


def _naive(df):
    w = Window.orderBy("key", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return {
        r["doc_id"]: r["cum"]
        for r in df.select(
            "doc_id", F.sum("w").over(w).alias("cum")
        ).collect()
    }


def test_range_fallback_matches_naive_window(spark):
    df = _base(spark)
    expect = _naive(df)
    for n_ranges in (1, 3, 16):
        got = {
            r["doc_id"]: r["cum"]
            for r in global_running_sum(
                df, ["key", "doc_id"], "w", "cum", num_ranges=n_ranges
            )
            .select("doc_id", "cum")
            .collect()
        }
        release_caches()
        assert got == expect, f"num_ranges={n_ranges}"


def test_bucket_path_matches_naive_window(spark):
    df = _base(spark)
    expect = _naive(df)
    bucket = F.conv(F.substring(F.col("key"), 1, 2), 16, 10).cast("int")
    got = {
        r["doc_id"]: r["cum"]
        for r in global_running_sum(
            df, ["key", "doc_id"], "w", "cum", bucket=bucket
        )
        .select("doc_id", "cum")
        .collect()
    }
    release_caches()
    assert got == expect

"""Physical storage layout for cluster scale (SURVEY.md §4 physical
strategy).

At 100 TB the windfield and muni-hazard tables are fact-sized and the
same keys join them repeatedly: ``centroid_id`` (windfield ⋈
centroid_admin), ``(adm3_pcode, ens_id)`` (hazard ⋈ distance ⋈
impact). Bucketing both sides of a recurring join on its key
pre-shuffles the data once at write time — every subsequent join
becomes a zipped scan (no Exchange in the plan), which is the single
biggest shuffle saver in the pipeline's steady state.

Partition columns handle pruning instead: one partition per
``forecast_time`` drop means a rerun overwrites exactly its own drop
(X5 idempotence) and queries over one forecast read one directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Bucket counts sized for ~100 TB: windfield rows ≈ members × grid —
# target ≤ ~256 MB per bucket file per partition.
DEFAULT_BUCKETS = 64


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    n_buckets: int = DEFAULT_BUCKETS,
    partition_keys: list[str] | None = None,
    sort_keys: list[str] | None = None,
) -> None:
    """Persist a fact table bucketed (and optionally sorted) by its
    join key. Joins between two tables bucketed on the same key with
    the same count skip the shuffle entirely; sorting within buckets
    additionally skips the sort of a sort-merge join."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    if partition_keys:
        writer = writer.partitionBy(*partition_keys)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

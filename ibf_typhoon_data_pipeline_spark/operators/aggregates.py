"""Aggregation operators (SURVEY.md §2.4): ensemble exceedance
probabilities, threshold-flag ratios, quantile ladders, zonal stats.

All are two-phase (partial map-side combine + final) built-in
aggregates — no UDAFs; the reference's python loops over
``groupby(...).agg`` become single shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exceedance_probability(
    df: DataFrame,
    group_keys: Sequence[str],
    total_keys: Sequence[str],
    value_col: str,
    thresholds: Sequence[float],
    agg: Column | None = None,
) -> DataFrame:
    """A7/A13 (forecast_process.py:1262-1266, damage_probability.R:80-82):
    per-``total_keys`` totals of ``value_col`` (one row per ensemble
    member), then for each threshold the fraction of members whose
    total exceeds it.

    Returns one row per ``group_keys`` with prob_gt_{t} columns.
    Two chained aggregations → two shuffles, both on small keyspaces.
    """
    totals = df.groupBy(*dict.fromkeys([*group_keys, *total_keys])).agg(
        (agg if agg is not None else F.sum(value_col)).alias("__total")
    )
    probs = [
        F.avg((F.col("__total") > F.lit(float(t))).cast("double")).alias(
            f"prob_gt_{str(t).replace('.', '_').rstrip('_0') if '.' in str(t) else t}"
        )
        for t in thresholds
    ]
    if group_keys:
        return totals.groupBy(*group_keys).agg(*probs)
    return totals.agg(*probs)


def flag_ratio(
    df: DataFrame,
    keys: Sequence[str],
    predicate: Column,
    out_col: str,
) -> DataFrame:
    """A4 prob_within_50km (forecast_process.py:529-535): fraction of
    rows per key where the predicate holds — avg of a 0/1 cast, one
    shuffle with map-side combine."""
    return df.groupBy(*keys).agg(
        F.avg(predicate.cast("double")).alias(out_col)
    )


def quantile_ladder(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probs: Sequence[float],
    with_total: bool = True,
    total_label: str = "TOTAL",
) -> DataFrame:
    """A14 (lib_r/damage_probability.R:44-65,85-87): per-key quantiles at
    each prob, plus an appended all-keys TOTAL row — the reference's
    only grouping-sets-like construct. Uses exact ``percentile`` (R
    type-7 linear interpolation matches Spark/DuckDB percentile_cont).
    """
    aggs = [
        F.expr(f"percentile({value_col}, {p})").alias(
            f"q{str(p).replace('0.', '').ljust(2, '0')}"
        )
        for p in probs
    ]
    per_key = df.groupBy(*keys).agg(*aggs)
    if not with_total:
        return per_key
    total = df.agg(*aggs)
    for k in keys:
        total = total.withColumn(k, F.lit(total_label))
    return per_key.unionByName(total.select(per_key.columns))


def zonal_stats(
    cells: DataFrame,
    cell_zone: DataFrame,
    zone_key: str,
    time_col: str,
    value_col: str,
    reduce_members: bool = False,
) -> DataFrame:
    """A11+A12 (Rainfall_data.py:80,105-122): optional ensemble-median
    reduce per cell/time, then zonal mean per (zone, time), then max
    over time per zone.

    The median reduce runs FIRST (30× row reduction before the join) —
    the manual aggregate-pushdown the reference does at rd:80; Catalyst
    won't reorder an agg through a join for us, so the plan encodes it.
    ``cell_zone`` is the precomputed raster-cell→zone mapping (J1
    substitute); it is broadcast.
    """
    value = cells
    if reduce_members:
        value = cells.groupBy("lat", "lon", time_col).agg(
            F.median(value_col).alias(value_col)
        )
    joined = value.join(F.broadcast(cell_zone), ["lat", "lon"], "inner")
    per_time = joined.groupBy(zone_key, time_col).agg(
        F.avg(value_col).alias("__zone_mean")
    )
    return per_time.groupBy(zone_key).agg(
        F.max("__zone_mean").alias(f"max_{value_col}")
    )

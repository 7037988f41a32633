"""Window operators (SURVEY.md §2.5, §2.6).

The reference does these with pandas sort+shift+drop_duplicates loops;
here they are single Window specs — one shuffle on the partition key,
no driver involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_max(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[Column] | None = None,
) -> DataFrame:
    """A9/W6: pandas `sort_values(c).drop_duplicates(keys, keep='last')`
    ≡ max-by-`order_col` per key group (forecast_process.py:544,1241).

    pandas keep='last' after an ascending sort resolves ties by the
    *original row order*; Spark needs an explicit deterministic
    tiebreaker (SURVEY §7.4.4) — pass ``tiebreakers`` for parity runs.
    """
    order = [F.col(order_col).desc()]
    if tiebreakers:
        order += [t.desc() for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_max_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
    payload: Sequence[str] = (),
) -> DataFrame:
    """A9 as ONE aggregation instead of a window: max of
    struct(order_col, tiebreakers..., payload...) — structs compare
    field by field, so the max row is exactly row_number()==1 over
    (order_col DESC, tiebreakers DESC), but with map-side partial
    aggregation: no per-key sort, no full-row shuffle (only the struct
    travels). Prefer this at scale; keep the window form when the
    whole row must survive untouched.

    Returns one row per key: keys + order_col + tiebreakers + payload.
    """
    fields = [order_col, *tiebreakers, *payload]
    out = df.groupBy(*keys).agg(
        F.max(F.struct(*fields)).alias("__best")
    )
    return out.select(
        *keys, *[F.col(f"__best.{f}").alias(f) for f in fields]
    )


def lag_diff(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """W1: time_step = value - lag(value) per track
    (tc_tracks_forecast.py:322)."""
    w = Window.partitionBy(*keys).orderBy(time_col)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col, 1).over(w))


def lead_kinematics(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """W2: forward speed & bearing from lead(lat), lead(lon), lead(time)
    (lib_r/prepare_typhoon_input.R:414-443). Emits next_* columns plus
    degree-space displacement; callers feed them to geo.haversine_km."""
    w = Window.partitionBy(*keys).orderBy(time_col)
    return (
        df.withColumn("next_lat", F.lead(lat_col, 1).over(w))
        .withColumn("next_lon", F.lead(lon_col, 1).over(w))
        .withColumn("next_time", F.lead(time_col, 1).over(w))
        .withColumn(
            "dt_hours",
            (F.unix_timestamp("next_time") - F.unix_timestamp(time_col)) / 3600.0,
        )
    )


def ntile_rank(
    df: DataFrame, value_col: str, n: int = 5, out_col: str = "priority_index"
) -> DataFrame:
    """W5: ntile_na(impact, n) (run_model_V2.R:78-83) — NULLs excluded
    from the ranking and kept as NULL rank."""
    w = Window.orderBy(F.col(value_col))
    ranked = df.filter(F.col(value_col).isNotNull()).withColumn(
        out_col, F.ntile(n).over(w)
    )
    nulls = df.filter(F.col(value_col).isNull()).withColumn(
        out_col, F.lit(None).cast("int")
    )
    return ranked.unionByName(nulls)


def top1_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """O2: top-1 by explicit ordering per group (the reference's
    sorted(...)[0] nearest-neighbor pick, forecast_process.py:692)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

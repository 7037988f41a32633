"""Window operators (SURVEY.md §2.5, §2.6).

The reference does these with pandas sort+shift+drop_duplicates loops;
here they are single Window specs — one shuffle on the partition key,
no driver involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators import cache


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


# NOTE: the old ntile_rank helper (W5, run_model_V2.R:78-83) is gone
# on purpose — its Window.orderBy with no partitionBy was the
# single-partition scale-killer. W5 lives in plans/relational.py as an
# integer closed form over global_running_sum's two-pass row number.


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str,
    bucket: Column | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Running sum in a GLOBAL total order without the single-partition
    window (``Window.orderBy`` with no ``partitionBy`` makes WindowExec
    move the whole input to one partition — THE scale-killer for
    corpus-sized manifests). Two-pass partitioned cumsum:

    1. Split the order into contiguous buckets; a window partitioned
       by the bucket computes the local running sum (ONE shuffle; each
       bucket sorts independently).
    2. Per-bucket totals (a tiny aggregate) become cumulative offsets
       via a broadcast triangle join (tiny × tiny), broadcast back,
       and added to the local sums.

    ``bucket`` — an INTEGER expression that is a monotone coarsening
    of ``order_cols`` (every row of bucket b orders before every row
    of bucket b+1). When the leading order column is an md5 hex key,
    ``F.conv(F.substring(key, 1, 2), 16, 10).cast("int")`` gives 256
    uniform buckets with NO sampling pass and no extra exchange: the
    window's own hash-exchange on the bucket is the only shuffle of
    the fact table. Without ``bucket`` the operator falls back to
    ``repartitionByRange`` + ``spark_partition_id()`` (adds a range
    sampling job and a second exchange — still no single-partition
    window).

    Output values are identical to ``sum(value) OVER (ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING .. CURRENT ROW)`` for ANY
    bucketing — the offsets compensate wherever the boundaries land —
    so a plain global-window DuckDB oracle is unchanged. The local
    frame feeds two branches (rows + totals) and is registered with
    persist_tracked; orchestration calls release_caches() after the
    action.
    """
    if bucket is None:
        spark = df.sparkSession
        if num_ranges is None:
            num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))
        df = df.repartitionByRange(
            num_ranges, *[F.col(c) for c in order_cols]
        ).withColumn("__pid", F.spark_partition_id())
    else:
        df = df.withColumn("__pid", bucket)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = cache.persist_tracked(
        df.withColumn("__local_cum", F.sum(value_col).over(w_local))
    )
    totals = local.groupBy("__pid").agg(F.sum(value_col).alias("__ptot"))
    lower = totals.select(
        F.col("__pid").alias("__lo_pid"), F.col("__ptot").alias("__lo_tot")
    )
    offsets = (
        totals.join(
            F.broadcast(lower), F.col("__lo_pid") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__lo_tot"), F.lit(0)).alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__local_cum") + F.col("__off"))
        .drop("__pid", "__local_cum", "__off")
    )


def global_running_max(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str,
    bucket: Column,
    exclusive: bool = False,
) -> DataFrame:
    """Running MAX in a GLOBAL total order without the single-partition
    window — max is associative, so the exact ``global_running_sum``
    two-pass shape applies (VERDICT r4 item #7: this is the variant a
    fact-scale Pareto skyline needs instead of ``Window.orderBy`` with
    no partitionBy):

    1. a window partitioned by ``bucket`` (an INTEGER monotone
       coarsening of ``order_cols``) computes the local running max —
       one hash exchange of the fact table;
    2. per-bucket maxima (tiny) become prior-bucket offsets via a
       broadcast triangle join and fold in with ``greatest`` (which
       skips NULLs, so the first bucket / first row stay NULL under
       ``exclusive``).

    ``exclusive=True`` ends the frame at 1 PRECEDING (strictly-before
    semantics, e.g. "best among strictly cheaper"); with a ROWS frame
    this requires the order keys to be unique within a bucket —
    collapse ties (groupBy the order key) first, as the skyline does.
    Values equal ``max(value) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING .. {1 PRECEDING|CURRENT ROW})`` for ANY bucketing, so a
    plain global-window oracle is unchanged.
    """
    df = df.withColumn("__pid", bucket)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    )
    local = cache.persist_tracked(
        df.withColumn("__local_max", F.max(value_col).over(w_local))
    )
    totals = local.groupBy("__pid").agg(F.max(value_col).alias("__ptot"))
    lower = totals.select(
        F.col("__pid").alias("__lo_pid"), F.col("__ptot").alias("__lo_tot")
    )
    offsets = (
        totals.join(
            F.broadcast(lower), F.col("__lo_pid") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(F.max("__lo_tot").alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.greatest("__local_max", "__off"))
        .drop("__pid", "__local_max", "__off")
    )


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

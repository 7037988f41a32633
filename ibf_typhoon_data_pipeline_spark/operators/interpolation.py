"""Series gap-fill and resample-to-grid interpolation (SURVEY.md F15/F16,
recipe §7.5).

The reference does ``pd.Series.interpolate()`` and
``track.resample('0.5H').interpolate('linear')`` per track
(track_data_clean.py:11-18,43). Here both are pure window programs:
``last(ignorenulls)`` / ``first(ignorenulls)`` brackets + a linear
blend — no UDF, one shuffle on the track key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lerp_fill(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Linearly fill NULL runs of ``col`` between its nearest non-NULL
    bracketing rows (pandas Series.interpolate default: interior gaps
    linear; leading gaps stay NULL; trailing gaps forward-fill).
    ``tiebreakers`` pin the bracket order when time_col has duplicates."""
    order = [time_col, *tiebreakers]
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.unix_timestamp(F.col(time_col)).cast("double")
    v0 = F.last(col, ignorenulls=True).over(w_prev)
    t0 = F.last(F.when(F.col(col).isNotNull(), t), ignorenulls=True).over(w_prev)
    v1 = F.first(col, ignorenulls=True).over(w_next)
    t1 = F.first(F.when(F.col(col).isNotNull(), t), ignorenulls=True).over(w_next)
    filled = (
        F.when(F.col(col).isNotNull(), F.col(col))
        # interior gap → linear blend
        .when(
            v0.isNotNull() & v1.isNotNull() & (t1 != t0),
            v0 + (v1 - v0) * (t - t0) / (t1 - t0),
        )
        # trailing gap → ffill (pandas interpolate default direction)
        .when(v0.isNotNull(), v0)
        # leading gap → stays NULL
        .otherwise(F.lit(None))
    )
    return df.withColumn(col, filled.cast("double"))


def interpolate_series(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """F15: pd.Series.interpolate() over each track's wind/pressure/lat/
    lon (track_data_clean.py:11-18)."""
    out = df
    for c in value_cols:
        out = _lerp_fill(out, keys, time_col, c, tiebreakers)
    return out


def resample_interpolate(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    step_minutes: int = 30,
) -> DataFrame:
    """F16: resample each track to a fixed grid and linearly interpolate
    (track_data_clean.py:43, tc_tracks.py:1417-1465).

    Plan (SURVEY §7.5): per-key `sequence(min, max, interval)` →
    explode (grid rows, bounded to original track extent exactly as
    CLIMADA restricts at tt:1455-1457) → left join raw points → lerp
    fill. Single-point tracks pass through unchanged (tt:1458-1461).
    Shuffles once on the track key; the grid explode is ~12× the input
    rows — linear, never quadratic.
    """
    step = f"INTERVAL {step_minutes} MINUTES"
    grid = (
        df.groupBy(*keys)
        .agg(F.min(time_col).alias("__t0"), F.max(time_col).alias("__t1"))
        .select(
            *keys,
            F.explode(F.expr(f"sequence(__t0, __t1, {step})")).alias(time_col),
        )
    )
    raw = df.select(*keys, time_col, *value_cols)
    joined = grid.join(raw, [*keys, time_col], "left")
    out = joined
    for c in value_cols:
        out = _lerp_fill(out, keys, time_col, c)
    return out

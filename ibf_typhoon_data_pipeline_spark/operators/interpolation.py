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


def natural_spline_grid(x, y, step: float = 0.5):
    """The pure natural-cubic-spline solve shared by the Spark kernel
    and the DuckDB oracle generator: sort by (x, y), drop duplicate x
    (keep first), solve the tridiagonal system for interior second
    derivatives (M0=Mn=0), evaluate on the half-open step grid bounded
    to the knot extent. Deterministic numpy on identical inputs →
    bitwise-identical outputs wherever it runs — the sketch-fit oracle
    pattern (operators/gbt.fit_hist_gbt_sketch) applied to F17.

    Returns (grid, vals) float64 arrays."""
    import numpy as np

    order = np.lexsort((y, x))
    x, y = x[order], y[order]
    keep = np.concatenate(([True], np.diff(x) > 0))
    x, y = x[keep], y[keep]
    n = len(x)
    grid = np.arange(x[0], x[-1] + step / 2, step)
    # never extrapolate past the last knot (CLIMADA restricts to the
    # original track extent, tc_tracks.py:1455-1457)
    grid = grid[grid <= x[-1]]
    if n < 3:  # single point / segment → constant / linear
        return grid, np.interp(grid, x, y)
    h = np.diff(x)
    a = np.zeros((n - 2, n - 2))
    rhs = np.zeros(n - 2)
    for i in range(n - 2):
        if i > 0:
            a[i, i - 1] = h[i]
        a[i, i] = 2.0 * (h[i] + h[i + 1])
        if i < n - 3:
            a[i, i + 1] = h[i + 1]
        rhs[i] = 6.0 * (
            (y[i + 2] - y[i + 1]) / h[i + 1] - (y[i + 1] - y[i]) / h[i]
        )
    m = np.zeros(n)
    m[1:-1] = np.linalg.solve(a, rhs)
    seg = np.clip(np.searchsorted(x, grid, side="right") - 1, 0, n - 2)
    t = grid - x[seg]
    hs = h[seg]
    vals = (
        m[seg] / 6.0 * ((hs - t) ** 3 / hs - hs * (hs - t))
        + m[seg + 1] / 6.0 * (t**3 / hs - hs * t)
        + (y[seg] * (hs - t) + y[seg + 1] * t) / hs
    )
    return grid, vals


def cubic_spline_resample(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    step: float = 0.5,
) -> DataFrame:
    """F17 — natural-cubic-spline track interpolation as a grouped-map
    kernel (the reference fits glm(y ~ splines::ns(date)) per track,
    lib_r/track_interpolation.R:41-50; CLIMADA picks cubic for long
    tracks, tc_tracks.py:1434). Splines need the whole series at once
    — genuinely not expressible with window functions — so this is the
    applyInPandas slot: one group per track key, numpy tridiagonal
    solve inside, Arrow both ways. No scipy: the classic natural-
    spline system (second derivatives M solved from the tridiagonal
    equations, boundary M₀=Mₙ=0) is a dozen lines of numpy.
    """
    import pandas as pd

    key_schema = ", ".join(f"{k} long" for k in keys)
    out_schema = f"{key_schema}, {x_col} double, {y_col} double"

    def spline(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort + duplicate-x dedup + solve live in natural_spline_grid
        # so the oracle generator runs the very same code path
        grid, vals = natural_spline_grid(
            pdf[x_col].to_numpy(dtype="float64"),
            pdf[y_col].to_numpy(dtype="float64"),
            step,
        )
        out = pd.DataFrame({x_col: grid, y_col: vals})
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[*keys, x_col, y_col]]

    return df.groupBy(*keys).applyInPandas(spline, schema=out_schema)


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
    # normalize duplicate timestamps to one row (min per value col —
    # deterministic) so the grid join cannot fan out, and the bracket
    # windows ordered by time_col alone stay deterministic
    raw = df.groupBy(*keys, time_col).agg(
        *[F.min(c).alias(c) for c in value_cols]
    )
    joined = grid.join(raw, [*keys, time_col], "left")
    out = joined
    for c in value_cols:
        out = _lerp_fill(out, keys, time_col, c)
    return out

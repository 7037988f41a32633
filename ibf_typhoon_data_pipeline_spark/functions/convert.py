"""Scalar conversion / classification expressions (SURVEY.md §2.8).

Everything here is a pure Column expression (codegen'd JVM-side) —
the reference implements these as row-wise pandas ``apply`` lambdas;
expressing them declaratively is strictly faster and lets Catalyst
fold constants and push predicates through them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F9 unit conversions (run_model_V2.R:20-22, forecast_process.py:685,844,
# tc_tracks_forecast.py:274)
KN_TO_MS = 0.514444
MS_TO_MPH = 2.23694
MS_TO_KPH = 3.6
TEN_MIN_TO_ONE_MIN = 1.0 / 0.88
GUST_FACTOR = 1.49
PA_TO_HPA = 1.0 / 100.0


def kn_to_ms(c: Column) -> Column:
    return c * F.lit(KN_TO_MS)


def ms_to_kph(c: Column) -> Column:
    return c * F.lit(MS_TO_KPH)


def wind_category_kph(kph: Column) -> Column:
    """F10: pd.cut(KPH, [0,62,88,117,185,∞]→[TD,TS,STS,TY,STY])
    (forecast_process.py:845-847). pd.cut is right-closed: (0,62]→TD."""
    return (
        F.when(kph <= 62, "TD")
        .when(kph <= 88, "TS")
        .when(kph <= 117, "STS")
        .when(kph <= 185, "TY")
        .otherwise("STY")
    )


def saffir_simpson_cat(max_wind_kn: Column) -> Column:
    """Saffir-Simpson category from max sustained wind in knots
    (tc_tracks.py:2019-2057, CAT_NAMES tc_tracks.py:63): bins
    [34,64,83,96,113,137] → -1..5."""
    return (
        F.when(max_wind_kn < 34, -1)
        .when(max_wind_kn < 64, 0)
        .when(max_wind_kn < 83, 1)
        .when(max_wind_kn < 96, 2)
        .when(max_wind_kn < 113, 3)
        .when(max_wind_kn < 137, 4)
        .otherwise(5)
    )


def affected_population(damage: Column, buildings: Column) -> Column:
    """F11 power law (forecast_process.py:619-634):
    exp(6.80943)·buildings^0.46982 when damage≥1 else 0; NULL propagates."""
    return (
        F.when(damage.isNull() | buildings.isNull(), F.lit(None).cast("double"))
        .when(damage >= 1, F.exp(F.lit(6.80943)) * F.pow(buildings, F.lit(0.46982)))
        .otherwise(F.lit(0.0))
    )


def set_zeros(damage: Column, vmax: Column, growth_factor: Column) -> Column:
    """F12 damage masking (forecast_process.py:550-568):
    damage·growth if vmax>25; 0 if vmax<25; else NULL (the vmax==25 and
    NULL-vmax rows fall through to NaN in the reference)."""
    return (
        F.when(vmax > 25, damage * growth_factor)
        .when(vmax < 25, F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
    )


def lead_time_hours(landfall_time: Column, forecast_time: Column) -> Column:
    """F5 (forecast_process.py:771-806): whole hours between landfall and
    forecast issuance minus the 8-h dissemination latency, clamped ≥0."""
    raw = F.floor(
        (F.unix_timestamp(landfall_time) - F.unix_timestamp(forecast_time)) / 3600
    ) - F.lit(8)
    return F.greatest(raw, F.lit(0))


def lead_time_label(hours: Column) -> Column:
    """'{h}-hour' label, '168-hour-and-more' beyond the reporting bound
    (settings.py:184-185)."""
    return F.when(hours > 168, F.lit("168-hour-and-more")).otherwise(
        F.concat(hours.cast("string"), F.lit("-hour"))
    )


def clip(c: Column, lo: float | None = None, hi: float | None = None) -> Column:
    """F13 np.clip as greatest/least."""
    out = c
    if lo is not None:
        out = F.greatest(out, F.lit(float(lo)))
    if hi is not None:
        out = F.least(out, F.lit(float(hi)))
    return out

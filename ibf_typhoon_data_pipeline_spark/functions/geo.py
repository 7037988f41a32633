"""Geodesic scalar expressions (SURVEY.md §2.8 F7/F8, §2.9 K4).

All pure Column expressions — they stay inside whole-stage codegen;
no Python ever runs per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference uses R=6367 km in the Python haversine
# (forecast_process.py:636-653); the R pipeline uses 6378.14
# (lib_r/prepare_typhoon_input.R:118-135). Default to the Python one.
EARTH_RADIUS_KM_PY = 6367.0
EARTH_RADIUS_KM_R = 6378.14

# Degrees→km factor of the pipeline's deliberate degree-space distance
# (forecast_process.py:1603-1608) — NOT haversine; preserved as a quirk
# because it feeds ML features and the 50-km probability.
DEG_TO_KM = 111.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column,
    radius_km: float = EARTH_RADIUS_KM_PY,
) -> Column:
    """Great-circle distance in km (forecast_process.py:636-653)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * radius_km) * F.asin(F.sqrt(a))


def degree_distance_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """sqrt(Δlat²+Δlon²)·111 — the pipeline's track–grid distance
    (forecast_process.py:1603-1608). Deliberately not haversine."""
    return F.sqrt((lat1 - lat2) ** 2 + (lon1 - lon2) ** 2) * F.lit(DEG_TO_KM)


def bbox_contains(
    lat: Column, lon: Column,
    lat_min: float, lat_max: float, lon_min: float, lon_max: float,
) -> Column:
    """Bounding-box membership predicate — the anti-cartesian guard the
    reference applies before any distance math (trop_cyclone.py:641-674).
    Kept as a plain conjunction so Catalyst pushes it into scans/joins."""
    return (
        (lat >= F.lit(lat_min)) & (lat <= F.lit(lat_max))
        & (lon >= F.lit(lon_min)) & (lon <= F.lit(lon_max))
    )

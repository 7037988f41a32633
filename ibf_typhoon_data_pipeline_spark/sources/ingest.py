"""Driver-side ingest adapters (SURVEY.md §2.1 S1-S10).

The reference's sources are network fetches + format decodes that land
files before any analytics run (ECMWF FTP BUFR, NOMADS GRIB2, GDACS
RSS, agency scrapers). The Spark-first split keeps that boundary: thin
driver adapters land Parquet in a landing zone; the engine reads
Parquet (batch or readStream — streaming/micro_batch.py). Network and
codec libraries aren't in this container, so the fetch/decode steps
are explicit NotImplementedError gates with the landing contract
fully typed and tested.

Retry/backoff (X6: FTP ×10 + 30 s, HTTP Retry(3)) is an adapter
concern — wrap `fetch_*` in the scheduler's retry policy, never inside
the Spark job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ibf_typhoon_data_pipeline_spark.streaming.micro_batch import TRACK_SCHEMA

# S6 — static dimension tables arrive as CSV with geometry as WKT; the
# engine declares schemas instead of inheriting pandas inference
# (SURVEY §1.2).
ADMIN_SCHEMA = StructType(
    [
        StructField("adm3_pcode", StringType()),
        StructField("adm3_en", StringType()),
        StructField("adm2_en", StringType()),
        StructField("geometry_wkt", StringType()),
        StructField("LAT", DoubleType()),
        StructField("LON", DoubleType()),
    ]
)

CENTROID_ADMIN_SCHEMA = StructType(
    [
        StructField("centroid_id", LongType()),
        StructField("adm3_pcode", StringType()),
    ]
)


def fetch_ecmwf_bufr(remote_dir: str | None = None) -> list[str]:
    """S1 — list the latest yyyymmddhhmmss directory on the ECMWF FTP
    mirror and download `*tropical_cyclone*ECEP*` BUFR files
    (tc_tracks_forecast.py:126-185). Driver-side network I/O."""
    raise NotImplementedError(
        "network fetch — run outside the engine; land files into the "
        "landing zone then decode_bufr_to_parquet()"
    )


def decode_bufr_to_parquet(
    spark: SparkSession, bufr_paths: list[str], landing_dir: str
) -> None:
    """S2 — decode BUFR section-4 codes (005002 lat, 006002 lon, 011012
    wind, 010051 pressure, 004024 lead-hour, 001092 member) into long
    track rows (tc_tracks_forecast.py:187-337). Requires a BUFR codec
    (pybufrkit); the decode parallelizes as mapInPandas over the file
    list when one is available."""
    raise NotImplementedError(
        "BUFR codec not available in this container; land pre-decoded "
        "Parquet with TRACK_SCHEMA instead"
    )


def fetch_gefs_rainfall(run_hour: str) -> list[str]:
    """S4 — NOMADS GEFS precip grids (Rainfall_data.py:187-209)."""
    raise NotImplementedError("network fetch — driver-side adapter")


def fetch_gdacs_events() -> list[dict]:
    """S9 — GDACS RSS active-typhoon check
    (Check_for_active_typhoon.py:7-53)."""
    raise NotImplementedError("network fetch — driver-side adapter")


def land_tracks(df: DataFrame, landing_dir: str, drop_id: str) -> str:
    """Write one forecast drop into the landing zone, partitioned by
    drop — the idempotent file-cache scheme (X5) as
    overwrite-by-partition."""
    path = os.path.join(landing_dir, f"drop={drop_id}")
    df.select([f.name for f in TRACK_SCHEMA.fields]).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def read_landed_tracks(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Batch read of the landing zone with the declared schema (the
    streaming twin is streaming.forecast_stream)."""
    return spark.read.schema(TRACK_SCHEMA).parquet(
        os.path.join(landing_dir, "drop=*")
    )


def read_admin_csv(spark: SparkSession, path: str) -> DataFrame:
    """S6 — admin3 dimension CSV with WKT geometry column
    (forecast_process.py:87-96); header + explicit schema, never
    inferSchema on a contract table."""
    return spark.read.csv(path, header=True, schema=ADMIN_SCHEMA)


def filename_geo_filter(
    df: DataFrame, bounds: tuple[float, float, float, float] = (5, 21, 115, 140)
) -> DataFrame:
    """S3 — keep files whose storm seed (parsed from the *filename*)
    falls inside the basin bounds (forecast_process.py:159-176):
    regexp_extract over input_file_name(), pushed before any decode."""
    lat_min, lat_max, lon_min, lon_max = bounds
    fname = F.input_file_name()
    lat = F.regexp_extract(fname, r"_([0-9]+(?:\.[0-9]+)?)deg", 1).cast(
        "double"
    )
    lon = F.regexp_extract(fname, r"deg_([0-9]+(?:\.[0-9]+)?)p", 1).cast(
        "double"
    )
    return df.filter(
        lat.between(lat_min, lat_max) & lon.between(lon_min, lon_max)
    )


# --------------------------------------------------------- S2 decode surface
# The real BUFR codec is gated above (decode_bufr_to_parquet); the
# decode SHAPE — a fleet of flat-text messages parsed in parallel into
# long track rows — is implemented and tested here against a
# deterministic synthetic rendering (section-4 descriptor codes as in
# the pybufrkit flat render: 005002 lat, 006002 lon, 011012 wind,
# 010051 pressure; tc_tracks_forecast.py:187-337 semantics).

BUFR_LINE_RE = (
    r"^SUBSET ens=([0-9]+) step=([0-9]+) "
    r"005002 (-?[0-9]+\.[0-9]{2}) 006002 (-?[0-9]+\.[0-9]{2}) "
    r"011012 ([0-9]+\.[0-9]{2}) 010051 ([0-9]+\.[0-9]{2})$"
)


def decode_xml_track(messages: "DataFrame") -> "DataFrame":
    """S10 — alternate-agency XML track readers (the HK/JTWC/UCL
    scrapers, Hk_data.py:20-93 / ucl_data.py:39-193 semantics): one
    ``<trackpoint .../>`` element per line, parsed with a REAL XML
    parser (xml.etree) inside an Arrow-batched mapInPandas stage —
    the same parallel-decode shape as S2, different wire format.
    Malformed elements are dropped."""
    import xml.etree.ElementTree as ET

    import pandas as pd

    cols = ["ens_id", "step", "lat", "lon", "vmax_ms"]

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf["line"]:
                try:
                    el = ET.fromstring(line)
                except ET.ParseError:
                    continue
                if el.tag != "trackpoint":
                    continue
                try:
                    rows.append(
                        {
                            "ens_id": int(el.attrib["member"]),
                            "step": int(el.attrib["tau"]),
                            "lat": float(el.attrib["lat"]),
                            "lon": float(el.attrib["lon"]),
                            "vmax_ms": float(el.attrib["vmax"]),
                        }
                    )
                except (KeyError, ValueError):
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return messages.mapInPandas(
        parse,
        schema="ens_id long, step long, lat double, lon double, vmax_ms double",
    )


def decode_bufr_text(messages: "DataFrame") -> "DataFrame":
    """Parse flat-text track messages (one line per (member, step))
    into long track rows with an Arrow-batched mapInPandas regex pass
    — the parallel decode stage of S2. Input: DataFrame with a
    ``line`` string column. Malformed lines are dropped (the reference
    skips undecodable subsets)."""
    import re

    import pandas as pd

    pat = re.compile(BUFR_LINE_RE)

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf["line"]:
                m = pat.match(line)
                if not m:
                    continue
                rows.append(
                    {
                        "ens_id": int(m.group(1)),
                        "step": int(m.group(2)),
                        "lat": float(m.group(3)),
                        "lon": float(m.group(4)),
                        "wind_ms": float(m.group(5)),
                        "pcen_hpa": float(m.group(6)),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "ens_id",
                    "step",
                    "lat",
                    "lon",
                    "wind_ms",
                    "pcen_hpa",
                ],
            )

    return messages.mapInPandas(
        parse,
        schema=(
            "ens_id long, step long, lat double, lon double, "
            "wind_ms double, pcen_hpa double"
        ),
    )

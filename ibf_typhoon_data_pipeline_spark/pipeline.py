"""Orchestrated forecast pipeline — the engine's equivalent of the
reference's ``pipeline.main()`` / ``Forecast.__init__`` eager DAG
(IBF-Typhoon-model/src/typhoonmodel/pipeline.py:56-232,
forecast_process.py:55-395), re-expressed as ONE lazy Spark DAG with
explicit persist boundaries.

Stage map (SURVEY.md §3.1 → §7.1):

    tracks ──K1──▶ windfield ──K2/J2/A1/A2──▶ muni_hazard
        │                                        │
        ├──F16──▶ interpolated tracks            ├──K6──▶ damage
        └──K7──▶ landfall                        ├──A4──▶ prob_50km
                                                 ├──A5/A7─▶ triggers
                                                 └──F19──▶ exposure docs

``windfield`` and ``muni_hazard`` are persisted: both are consumed by
multiple downstream branches (impact, upload layers, maps in the
reference — SURVEY §3.1 caching note), and recomputing the windfield
join is the only expensive stage. Everything else stays lazy; sinks
decide when to act.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ibf_typhoon_data_pipeline_spark.operators.windfield import (
    windfield_expr,
)
from ibf_typhoon_data_pipeline_spark.plans.typhoon import (
    gen_centroids,
    gen_munis,
    gen_tracks,
)


@dataclass
class ForecastResult:
    """Named handles on the pipeline's layer outputs (the reference's
    per-layer upload frames, forecast_process.py:1055-1233)."""

    tracks: DataFrame
    windfield: DataFrame
    muni_hazard: DataFrame
    damage: DataFrame
    prob_within_50km: DataFrame
    triggers: DataFrame
    exposure_docs: DataFrame

    def unpersist(self) -> None:
        self.tracks.unpersist()
        self.windfield.unpersist()
        self.muni_hazard.unpersist()


def run_forecast_pipeline(
    spark: SparkSession,
    tracks: DataFrame | None = None,
    centroids: DataFrame | None = None,
    munis: DataFrame | None = None,
    damage_thresholds: tuple[float, ...] = (20000.0, 50000.0, 80000.0),
    trigger_probability: float = 0.5,
) -> ForecastResult:
    """Assemble the full forecast DAG. Defaults to the synthetic
    domain tables; production passes real ones with the same schemas.
    """
    tracks = tracks if tracks is not None else gen_tracks(spark)
    cents = centroids if centroids is not None else gen_centroids(spark)
    munis = munis if munis is not None else gen_munis(spark)

    # tracks feeds two branches (windfield + distance); persist so a
    # real (non-generated) track table scans once
    tracks = tracks.persist(StorageLevel.MEMORY_AND_DISK)

    wf = windfield_expr(
        tracks, cents.select("centroid_id", "lat", "lon")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    hazard = (
        wf.join(
            F.broadcast(cents.select("centroid_id", "adm3_pcode")),
            "centroid_id",
        )
        .groupBy("adm3_pcode", "ens_id")
        .agg(
            F.count("*").alias("value_count"),
            F.max("wind_ms").alias("v_max"),
        )
    )
    dists = (
        munis.select("adm3_pcode", "m_lat", "m_lon")
        .join(F.broadcast(tracks.select("ens_id", "lat", "lon")))
        .groupBy("adm3_pcode", "ens_id")
        .agg(
            F.min(
                F.sqrt(
                    (F.col("m_lat") - F.col("lat"))
                    * (F.col("m_lat") - F.col("lat"))
                    + (F.col("m_lon") - F.col("lon"))
                    * (F.col("m_lon") - F.col("lon"))
                )
                * 111.0
            ).alias("dis_track_min")
        )
    )
    muni_hazard = hazard.join(dists, ["adm3_pcode", "ens_id"]).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    ramp = (F.col("v_max") - 25.0) / 40.0
    damage = muni_hazard.join(
        F.broadcast(munis.select("adm3_pcode", "housing_units")), "adm3_pcode"
    ).select(
        "adm3_pcode",
        "ens_id",
        "v_max",
        "dis_track_min",
        F.when(F.col("dis_track_min") > 300.0, F.lit(0.0))
        .when(
            F.col("v_max") > 25.0,
            F.col("housing_units") * F.least(F.lit(1.0), ramp * ramp * ramp),
        )
        .otherwise(F.lit(0.0))
        .alias("damage_predicted"),
    )

    prob_50km = muni_hazard.groupBy("adm3_pcode").agg(
        F.avg(
            F.when(F.col("dis_track_min") < 50.0, 1.0).otherwise(0.0)
        ).alias("prob_within_50km")
    )

    totals = damage.groupBy("ens_id").agg(
        F.sum("damage_predicted").alias("total_damage")
    )
    trigger_cols = []
    for t in damage_thresholds:
        p = F.avg(
            F.when(F.col("total_damage") > t, 1.0).otherwise(0.0)
        )
        label = f"{int(t / 1000)}k"
        trigger_cols.append(p.alias(f"prob_gt_{label}"))
        trigger_cols.append(
            (p >= trigger_probability).alias(f"triggered_{label}")
        )
    triggers = totals.agg(*trigger_cols)

    w = Window.partitionBy("adm3_pcode", "ens_id").orderBy(
        F.col("damage_predicted").desc()
    )
    kept = damage.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    per_muni = kept.groupBy("adm3_pcode").agg(
        F.round(F.avg("damage_predicted"), 0).cast("bigint").alias("amount")
    )
    exposure_docs = (
        per_muni.filter(F.col("amount") > 0)
        .groupBy(F.substring("adm3_pcode", 1, 4).alias("region"))
        .agg(
            F.to_json(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("adm3_pcode").alias("placeCode"),
                            F.col("amount").alias("amount"),
                        )
                    )
                )
            ).alias("exposure_json")
        )
    )

    return ForecastResult(
        tracks=tracks,
        windfield=wf,
        muni_hazard=muni_hazard,
        damage=damage,
        prob_within_50km=prob_50km,
        triggers=triggers,
        exposure_docs=exposure_docs,
    )

"""Orchestrated-pipeline, spline, ingest, and multimodal-stub tests —
the non-oracle surfaces (driver checks are rows-only there; invariants
are pinned here)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators.interpolation import (
    cubic_spline_resample,
)
from ibf_typhoon_data_pipeline_spark.operators.multimodal import (
    HAS_PIL,
    decode_image,
    extract_features,
    fake_decode_dims,
    gen_media,
)
from ibf_typhoon_data_pipeline_spark.pipeline import run_forecast_pipeline
from ibf_typhoon_data_pipeline_spark.plans.typhoon import (
    N_MEMBERS,
    gen_tracks,
)
from ibf_typhoon_data_pipeline_spark.sources.ingest import (
    land_tracks,
    read_landed_tracks,
)


def test_pipeline_end_to_end(spark):
    res = run_forecast_pipeline(spark)
    trig = res.triggers.collect()
    assert len(trig) == 1
    row = trig[0].asDict()
    # probabilities are ensemble fractions
    for k, v in row.items():
        if k.startswith("prob_gt_"):
            assert 0.0 <= v <= 1.0
    # every (muni, member) hazard row has positive wind and count
    mh = res.muni_hazard
    assert mh.filter((F.col("v_max") <= 17.5) | (F.col("value_count") <= 0)).count() == 0
    # damage never exceeds housing stock ceiling semantics (≤ hu ≤ 2000)
    assert res.damage.filter(F.col("damage_predicted") > 2000).count() == 0
    # exposure docs: one JSON document per region, valid JSON array
    docs = res.exposure_docs.collect()
    assert docs and all(d.exposure_json.startswith("[{") for d in docs)
    res.unpersist()


def test_spline_reproduces_knots_and_lines(spark):
    tracks = gen_tracks(spark).filter("ens_id < 3").select(
        "ens_id",
        F.col("step").cast("double").alias("x"),
        F.col("vmax").alias("y"),
    )
    out = cubic_spline_resample(tracks, ["ens_id"], "x", "y", step=0.5)
    knots = {(r.ens_id, r.x): r.y for r in tracks.collect()}
    interp = {(r.ens_id, r.x): r.y for r in out.collect()}
    # passes through every knot
    for k, v in knots.items():
        assert abs(interp[k] - v) < 1e-9
    # collinear input → spline IS the line everywhere
    line = spark.range(2).selectExpr(
        "0 as ens_id", "cast(id * 10 as double) as x", "cast(id * 20 as double) as y"
    ).union(
        spark.range(1).selectExpr(
            "0 as ens_id", "cast(20 as double) as x", "cast(40 as double) as y"
        )
    )
    lo = cubic_spline_resample(line, ["ens_id"], "x", "y", step=2.5)
    for r in lo.collect():
        assert abs(r.y - 2.0 * r.x) < 1e-9


def test_landing_zone_roundtrip(spark, tmp_path):
    tracks = gen_tracks(spark)
    land_tracks(tracks.filter("ens_id < 2"), str(tmp_path), "20240601000000")
    land_tracks(tracks.filter("ens_id >= 2"), str(tmp_path), "20240601060000")
    back = read_landed_tracks(spark, str(tmp_path))
    assert back.count() == tracks.count()
    assert back.select("ens_id").distinct().count() == N_MEMBERS
    assert os.path.isdir(str(tmp_path / "drop=20240601000000"))


def test_multimodal_stub_contract(spark):
    media = gen_media(spark, 32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    raw = {r.media_id: r for r in media.collect()}
    for r in feats:
        w, h = fake_decode_dims(bytes(raw[r.media_id].content))
        assert (r.fake_width, r.fake_height) == (w, h)
        assert r.n_bytes == 16
    if not HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x00" * 16)

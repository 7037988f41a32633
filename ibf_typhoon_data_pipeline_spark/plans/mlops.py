"""ML-inference, multimodal, and streaming catalog entries — the
pandas-UDF / mapInPandas / Structured-Streaming surfaces (SURVEY.md
§2.9 K6, §2.11, §7.6), each still value-checked against DuckDB:

- OLS fit+predict: driver-fit from one aggregate pass, broadcast
  model, pandas-UDF scoring — the XGBoost harness with a closed-form
  estimator, so the oracle can recompute the coefficients.
- Multimodal: binary content synthesized as unhex(md5(id)), features
  extracted in mapInPandas with hashlib — md5 agrees across engines,
  so even the Python-side path hash-matches the oracle.
- Streaming: AvailableNow micro-batch run over a temp landing zone
  with overlapping drops; exactly-once dedup means the result equals
  the clean track set, which IS the oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators.inference import (
    OLS2,
    fit_ols2,
    predict_udf,
)
from ibf_typhoon_data_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    gen_media,
)
from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.plans import typhoon
from ibf_typhoon_data_pipeline_spark.plans.typhoon import TRACKS_SQL, gen_tracks
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table
from ibf_typhoon_data_pipeline_spark.streaming import (
    dedup_forecast_drops,
    forecast_stream,
    run_available_now,
)


def _landing_files(d: str) -> set[str]:
    """Every regular file under a landing dir (part files + commit
    markers — FileStreamSource itself ignores _-prefixed paths)."""
    return {
        os.path.join(r, f) for r, _dirs, fs in os.walk(d) for f in fs
    }


def _bump_mtime_after(landing: str, before: set[str]) -> None:
    """Pin every file added since ``before`` was listed to a strictly
    LATER modification time than all pre-existing files.
    FileStreamSource orders batches by mtime and same-second writes
    tie (CLAUDE.md replay-order rule) — deterministic utime instead of
    the old sleep(1.1) wall-clock gamble, and 1.1 s faster per drop."""
    base = max(os.stat(p).st_mtime for p in before)
    for p in _landing_files(landing) - before:
        os.utime(p, (base + 2.0, base + 2.0))


def _pin(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Detach a result frame from its temp-dir backing files before
    the rmtree below (ADVICE r4): an eager localCheckpoint TRUNCATES
    the lineage — every partition is materialized into block storage
    (MEMORY_AND_DISK: eviction spills, never recomputes) and the plan
    above it is discarded, so nothing can ever re-read the deleted
    path. JVM-side, no driver round-trip; all frames pinned here are
    result-sized by construction."""
    return df.localCheckpoint(eager=True)


@register(
    "ml_ols_inference",
    """
    WITH stats AS (
      SELECT sum(l_quantity * l_quantity) AS s11,
             sum(l_quantity * l_discount) AS s12,
             sum(l_discount * l_discount) AS s22,
             sum(l_quantity * l_extendedprice) AS t1,
             sum(l_discount * l_extendedprice) AS t2
      FROM lineitem
    ), coefs AS (
      SELECT round((s22 * t1 - s12 * t2) / (s11 * s22 - s12 * s12), 4) AS b1,
             round((s11 * t2 - s12 * t1) / (s11 * s22 - s12 * s12), 4) AS b2
      FROM stats
    )
    SELECT l_orderkey, l_linenumber,
           round(l_quantity * b1 + l_discount * b2, 2) AS predicted
    FROM lineitem, coefs
    """,
    doc="K6 train+predict harness: driver-side closed-form fit (one "
        "agg pass), broadcast model, Arrow pandas-UDF scoring "
        "(forecast_process.py:409-547 shape; coefficients rounded to "
        "4dp before scoring so both engines predict from identical "
        "bits)",
)
def ml_ols_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = fit_ols2(li, "l_quantity", "l_discount", "l_extendedprice")
    m = OLS2(b1=round(m.b1, 4), b2=round(m.b2, 4))
    score = predict_udf(spark, m)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(score(F.col("l_quantity"), F.col("l_discount")), 2).alias(
            "predicted"
        ),
    )


_HEX = "0123456789abcdef"


def _sql_hex_byte(h: str, pos: int) -> str:
    """SQL for the byte value at 0-based byte offset ``pos`` of the
    16-byte blob whose lowercase hex string is ``h``."""
    c1 = f"substr({h}, {pos * 2 + 1}, 1)"
    c2 = f"substr({h}, {pos * 2 + 2}, 1)"
    return (
        f"((instr('{_HEX}', {c1}) - 1) * 16 + (instr('{_HEX}', {c2}) - 1))"
    )


_MEDIA_SQL = """
  SELECT CAST(id AS BIGINT) AS media_id,
         CASE CAST(id % 3 AS INTEGER)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
         END AS media_type,
         md5(CAST(id AS VARCHAR)) AS content_hex
  FROM range(256) AS t(id)
"""


@register(
    "media_features",
    f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id, media_type,
           CAST(16 AS BIGINT) AS n_bytes,
           md5(content_hex) AS digest,
           CAST({_sql_hex_byte('content_hex', 0)} + 1 AS INTEGER) AS fake_width,
           CAST({_sql_hex_byte('content_hex', 1)} + 1 AS INTEGER) AS fake_height
    FROM media
    """,
    doc="Multimodal feature extraction over binary content via "
        "mapInPandas (hashlib digest + stubbed decode — deterministic "
        "fake dims; real codecs NotImplemented in this container); "
        "content synthesized as unhex(md5(id)) so the oracle "
        "reproduces the Python path byte for byte",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(gen_media(spark, 256))


@register(
    "media_frame_sample",
    f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id, CAST(off AS INTEGER) AS frame_offset,
           CAST(CASE off
             WHEN 0 THEN {_sql_hex_byte('content_hex', 0)}
             WHEN 4 THEN {_sql_hex_byte('content_hex', 4)}
             WHEN 8 THEN {_sql_hex_byte('content_hex', 8)}
             ELSE {_sql_hex_byte('content_hex', 12)}
           END AS INTEGER) AS frame_byte
    FROM media, unnest([0, 4, 8, 12]) AS t(off)
    """,
    doc="Frame-sampling stub: the 1-row→k-rows mapInPandas stage a "
        "video pipeline needs, demonstrated on byte offsets (real "
        "decoders slot into the same batch shape)",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(gen_media(spark, 256), every_n_bytes=4)


@register(
    "stream_forecast_dedup",
    f"""
    WITH tracks AS ({TRACKS_SQL})
    SELECT ens_id, step, round(lat, 6) AS lat, round(lon, 6) AS lon,
           round(vmax, 6) AS vmax
    FROM tracks
    """,
    doc="§7.6 streaming skin, end to end: two overlapping forecast "
        "drops land as files → readStream + dropDuplicates + "
        "foreachBatch sink under Trigger.AvailableNow → exactly-once "
        "result equals the clean track set (which is the oracle)",
)
def stream_forecast_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tracks = gen_tracks(spark).select(
        "ens_id", "step", "lat", "lon", "vmax", "pcen", "penv"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    # two overlapping drops: the full set, then the tail half again
    tracks.write.mode("overwrite").parquet(landing)
    tracks.filter(F.col("step") >= 20).write.mode("append").parquet(landing)

    stream = dedup_forecast_drops(forecast_stream(spark, landing))

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out)

    run_available_now(stream, ckpt, sink)
    result = (
        spark.read.parquet(out)
        .select(
            "ens_id",
            "step",
            F.round("lat", 6).alias("lat"),
            F.round("lon", 6).alias("lon"),
            F.round("vmax", 6).alias("vmax"),
        )
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_stateful_peak",
    f"""
    WITH tracks AS ({TRACKS_SQL})
    SELECT ens_id, count(*) AS n_points, round(max(vmax), 6) AS peak_vmax,
           coalesce(min(CASE WHEN vmax >= 33.0 THEN step END), -1)
             AS first_trigger_step
    FROM tracks GROUP BY ens_id
    """,
    doc="§2.10 custom stateful operator via applyInPandasWithState: "
        "per-member running (count, peak vmax, first trigger-crossing "
        "step) state updated across TWO micro-batches (non-overlapping "
        "drops, maxFilesPerTrigger=1); updates are order-independent, "
        "so the final state row per key equals the batch aggregate — "
        "the oracle",
)
def stream_stateful_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.streaming.stateful import (
        track_state_tracker,
    )

    tracks = gen_tracks(spark).select("ens_id", "step", "vmax")
    work = tempfile.mkdtemp(prefix="ibf_stream_state_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    # two disjoint drops, one file each → two micro-batches, so the
    # second batch genuinely reads back cross-batch state
    tracks.filter(F.col("step") < 20).coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing)
    tracks.filter(F.col("step") >= 20).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    stream = (
        spark.readStream.schema(tracks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    states = track_state_tracker(stream)

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out)

    q = (
        states.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # final state per key = the row with the largest n_points (strictly
    # monotone per emission) — max(struct) keeps the whole row (A9 form)
    trajectory = spark.read.parquet(out)
    result = (
        trajectory.groupBy("ens_id")
        .agg(
            F.max(
                F.struct("n_points", "peak_vmax", "first_trigger_step")
            ).alias("__final")
        )
        .select(
            "ens_id",
            F.col("__final.n_points").alias("n_points"),
            F.round(F.col("__final.peak_vmax"), 6).alias("peak_vmax"),
            F.col("__final.first_trigger_step").alias("first_trigger_step"),
        )
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


_PROFILE_COLS = ["event_type", "user_id", "value"]
_PROFILE_FLOATS = {"value"}


def _profile_branch(c: str) -> str:
    # printf %.6f for doubles mirrors profile_table's portable float
    # formatting; plain VARCHAR cast for everything else
    if c in _PROFILE_FLOATS:
        mn, mx = f"printf('%.6f', min({c}))", f"printf('%.6f', max({c}))"
    else:
        mn, mx = f"CAST(min({c}) AS VARCHAR)", f"CAST(max({c}) AS VARCHAR)"
    return f"""
    SELECT '{c}' AS column, (SELECT count(*) FROM events) AS n_rows,
           (SELECT count(*) FROM events WHERE {c} IS NULL) AS n_null,
           (SELECT count(DISTINCT {c}) FROM events) AS n_distinct,
           (SELECT {mn} FROM events) AS min_val,
           (SELECT {mx} FROM events) AS max_val
    """


@register(
    "profile_events",
    " UNION ALL ".join(_profile_branch(c) for c in _PROFILE_COLS),
    doc="Data-quality table profile: per-column null count, distinct "
        "count, extrema in ONE pass (long output, diffable between "
        "snapshots for drift); floats printf'd %.6f for portability; "
        "exact_distinct=False switches to HLL at scale",
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.profile import (
        profile_table,
    )

    ev = load_table(spark, sf_dir, "events")
    return profile_table(ev, _PROFILE_COLS)


@register(
    "pipeline_triggers",
    typhoon.trigger_ladder_oracle("triggered_20k", "triggered_80k"),
    doc="The orchestrated pipeline (pipeline.run_forecast_pipeline: "
        "persist boundaries at windfield and muni_hazard, every "
        "downstream branch reuses them) driven through the "
        "correctness gate — same oracle template as the standalone "
        "trigger chain, so the two cannot silently diverge",
)
def pipeline_triggers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.pipeline import (
        run_forecast_pipeline,
    )

    res = run_forecast_pipeline(spark)
    out = res.triggers.select(
        F.round("prob_gt_20k", 6).alias("prob_gt_20k"),
        F.round("prob_gt_50k", 6).alias("prob_gt_50k"),
        F.round("prob_gt_80k", 6).alias("prob_gt_80k"),
        "triggered_20k",
        "triggered_80k",
    ).cache()
    out.count()  # materialize, then release the pipeline's persists
    res.unpersist()
    return out


@register(
    "bufr_text_decode",
    f"""
    WITH tracks AS ({TRACKS_SQL}),
    msgs AS (
      SELECT concat(
        'SUBSET ens=', CAST(ens_id AS VARCHAR),
        ' step=', CAST(step AS VARCHAR),
        ' 005002 ', printf('%.2f', round(lat, 2)),
        ' 006002 ', printf('%.2f', round(lon, 2)),
        ' 011012 ', printf('%.2f', round(vmax, 2)),
        ' 010051 ', printf('%.2f', round(pcen, 2))
      ) AS line
      FROM tracks
    )
    SELECT CAST(regexp_extract(line, 'ens=([0-9]+)', 1) AS BIGINT) AS ens_id,
           CAST(regexp_extract(line, 'step=([0-9]+)', 1) AS BIGINT) AS step,
           CAST(regexp_extract(line, '005002 (-?[0-9.]+)', 1) AS DOUBLE) AS lat,
           CAST(regexp_extract(line, '006002 (-?[0-9.]+)', 1) AS DOUBLE) AS lon,
           CAST(regexp_extract(line, '011012 ([0-9.]+)', 1) AS DOUBLE) AS wind_ms,
           CAST(regexp_extract(line, '010051 ([0-9.]+)', 1) AS DOUBLE) AS pcen_hpa
    FROM msgs
    """,
    doc="S2 decode surface: flat-text BUFR-style messages (section-4 "
        "descriptor codes, one line per member/step) parsed in an "
        "Arrow-batched mapInPandas regex pass into long track rows "
        "(tc_tracks_forecast.py:187-337 shape); the synthetic "
        "rendering is deterministic, so the oracle re-parses the "
        "identical text",
)
def bufr_text_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.sources.ingest import (
        decode_bufr_text,
    )

    tracks = gen_tracks(spark)
    msgs = tracks.select(
        F.format_string(
            "SUBSET ens=%d step=%d 005002 %.2f 006002 %.2f "
            "011012 %.2f 010051 %.2f",
            F.col("ens_id"),
            F.col("step"),
            F.round("lat", 2),
            F.round("lon", 2),
            F.round("vmax", 2),
            F.round("pcen", 2),
        ).alias("line")
    )
    return decode_bufr_text(msgs)


@register(
    "stream_dedup_watermarked",
    f"""
    WITH tracks AS ({TRACKS_SQL})
    SELECT ens_id, step, round(vmax, 6) AS vmax
    FROM tracks
    """,
    doc="§2.10 state-BOUNDED streaming dedup: withWatermark(2h) + "
        "dropDuplicatesWithinWatermark — unlike plain dropDuplicates "
        "(state grows with all keys ever seen), dedup state here "
        "expires with the watermark, the 100 TB-safe form for a "
        "continuously-running forecast listener; overlapping drops "
        "drain in one AvailableNow pass, so the result equals the "
        "clean track set (the oracle)",
)
def stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    tracks = gen_tracks(spark).select(
        "ens_id",
        "step",
        "vmax",
        F.timestamp_seconds(
            F.unix_timestamp(base) + F.col("step") * 21600
        ).alias("ts"),
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_wm_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    tracks.write.mode("overwrite").parquet(landing)
    tracks.filter(F.col("step") >= 20).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema(tracks.schema)
        .parquet(landing)
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["ens_id", "step"])
    )

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.read.parquet(out)
        .select("ens_id", "step", F.round("vmax", 6).alias("vmax"))
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "xml_track_decode",
    f"""
    WITH tracks AS ({TRACKS_SQL}),
    msgs AS (
      SELECT concat(
        '<trackpoint member="', CAST(ens_id AS VARCHAR),
        '" tau="', CAST(step AS VARCHAR),
        '" lat="', printf('%.2f', round(lat, 2)),
        '" lon="', printf('%.2f', round(lon, 2)),
        '" vmax="', printf('%.2f', round(vmax, 2)),
        '"/>'
      ) AS line
      FROM tracks
    )
    SELECT
      CAST(regexp_extract(line, 'member="([0-9]+)"', 1) AS BIGINT) AS ens_id,
      CAST(regexp_extract(line, 'tau="([0-9]+)"', 1) AS BIGINT) AS step,
      CAST(regexp_extract(line, 'lat="(-?[0-9.]+)"', 1) AS DOUBLE) AS lat,
      CAST(regexp_extract(line, 'lon="(-?[0-9.]+)"', 1) AS DOUBLE) AS lon,
      CAST(regexp_extract(line, 'vmax="([0-9.]+)"', 1) AS DOUBLE) AS vmax_ms
    FROM msgs
    """,
    doc="S10 decode surface: alternate-agency XML trackpoint elements "
        "(HK/JTWC/UCL scraper semantics, ucl_data.py:39-193) parsed "
        "with a real XML parser in mapInPandas; same parallel-decode "
        "shape as S2, different wire format — the parsed floats equal "
        "the oracle's regexp-extracted ones because both engines read "
        "the identical rendered text",
)
def xml_track_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.sources.ingest import (
        decode_xml_track,
    )

    tracks = gen_tracks(spark)
    msgs = tracks.select(
        F.format_string(
            '<trackpoint member="%d" tau="%d" lat="%.2f" lon="%.2f"'
            ' vmax="%.2f"/>',
            F.col("ens_id"),
            F.col("step"),
            F.round("lat", 2),
            F.round("lon", 2),
            F.round("vmax", 2),
        ).alias("line")
    )
    return decode_xml_track(msgs)


@register(
    "stream_windowed_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="§2.10 watermark + tumbling-window aggregation: events stream "
        "through readStream → withWatermark(2h) → 1h window counts → "
        "AvailableNow sink; with one ordered drop the watermark drops "
        "nothing, so the result equals the batch aggregation — which "
        "is the oracle",
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ibf_typhoon_data_pipeline_spark.streaming.micro_batch import (
        windowed_event_counts,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_win_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    ev.write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema(ev.schema).parquet(landing)
    counts = windowed_event_counts(stream)

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out)

    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.read.parquet(out)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
        )
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_session_windows",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
               OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) >= 1800
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS session_seq
      FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           CAST(round(sum(value) * 100.0) AS BIGINT) AS total_value_cents,
           CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
             AS duration_s
    FROM sessions GROUP BY user_id, session_seq
    """,
    doc="§2.10 native session windows: events stream through "
        "readStream → withWatermark(2h) → session_window(ts, 30 min) "
        "per user → AvailableNow sink in APPEND mode: each batch "
        "emits only the sessions the advancing watermark finalized, "
        "so emission is bounded per batch at any cardinality (update "
        "mode is rejected for session_window aggs; complete mode "
        "would re-emit full state per batch). The finite replay "
        "flushes the tail by landing a watermark-advancing sentinel "
        "row (user_id -1, max ts + 5 h) as a second file with "
        "maxFilesPerTrigger=1 — in production the continuous stream "
        "advances the watermark by itself. session_window's end is "
        "EXCLUSIVE (a gap of exactly 30 min opens a new session), so "
        "the batch oracle's new-session condition is gap >= 1800 — "
        "one strictness tick off the lag-based events_sessionize "
        "entry, both documented.",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ibf_typhoon_data_pipeline_spark.streaming.micro_batch import (
        session_event_rollups,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_sess_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    # TWO landing files, not the session's partition count: with
    # maxFilesPerTrigger=1 every landing file is its own micro-batch,
    # and each micro-batch pays a fixed checkpoint-commit cost — a
    # 32-file landing meant 33 commits (~7 s of pure offset-log I/O at
    # sf0.1). Two data batches + the sentinel batch still exercise
    # everything the entry pins (multi-batch watermark advance,
    # bounded per-batch append emission) at ~1/10 the commit count.
    ev.coalesce(2).write.mode("overwrite").parquet(landing)
    # watermark-advancing sentinel, landed as a LATER file so the
    # file source serves it as its own micro-batch: 5 h past the real
    # max ts clears gap (30 min) + watermark delay (2 h), so every
    # real session finalizes and appends before the query drains
    max_ts = ev.agg(F.max("ts")).first()[0]
    before = _landing_files(landing)
    # pure-JVM single-row frame: createDataFrame(local list) routes
    # through parallelize with defaultParallelism (32) PYTHON
    # partitions, and the per-partition Python worker round-trips cost
    # 6-7 s for ONE row (measured 2026-08-15); range(1)+lits plans
    # entirely JVM-side and writes in ~0.2 s
    (
        spark.range(1)
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.lit(max_ts) + F.expr("INTERVAL 5 HOURS")).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit(0.0).alias("value"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(landing)
    )
    _bump_mtime_after(landing, before)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    sessions = session_event_rollups(stream)

    def sink(batch: DataFrame, bid: int) -> None:
        # append mode: each batch carries only newly-finalized
        # sessions; a per-batch-id target dir with overwrite makes the
        # sink idempotent under micro-batch retry
        batch.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    # the stateful shuffle width is fixed at query start from session
    # conf; under a plain 200-partition session that is 200 tiny
    # stateful tasks for a catalog-sized drop — pin a sane width for
    # the stream, restore after (per-user keys stay balanced at 32)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            sessions.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    result = (
        spark.read.parquet(os.path.join(out, "*"))
        .filter(F.col("user_id") != -1)
        .select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "total_value_cents",
            "duration_s",
        )
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_stream_interval_join",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT)
             AS secs_after
    FROM events c JOIN events p ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    doc="§2.10 stream-stream interval join: the click stream joins "
        "the purchase stream on user_id with a [0, 30 min] event-time "
        "band, BOTH sides watermarked (2 h) so each side's join state "
        "evicts once the other side's watermark passes the band — "
        "bounded state at production cardinality, the attribution "
        "join shape. Inner joins emit matches eagerly, so the "
        "AvailableNow replay needs no flush sentinel. Oracle is the "
        "identical batch interval join.",
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_ssj_")
    land_c = os.path.join(work, "clicks")
    land_p = os.path.join(work, "purchases")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    ev.filter(F.col("event_type") == "click").write.mode("overwrite").parquet(
        land_c
    )
    ev.filter(F.col("event_type") == "purchase").write.mode(
        "overwrite"
    ).parquet(land_p)

    clicks = (
        spark.readStream.schema(ev.schema)
        .parquet(land_c)
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        spark.readStream.schema(ev.schema)
        .parquet(land_p)
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    )

    def sink(batch: DataFrame, bid: int) -> None:
        batch.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            joined.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    result = (
        spark.read.parquet(os.path.join(out, "*"))
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
            .cast("long")
            .alias("secs_after"),
        )
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_incremental_digest_ingest",
    """
    WITH d AS (
      SELECT doc_id, md5(text) AS digest,
             CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS batch
      FROM documents
    ), firsts AS (
      SELECT digest, min(batch) AS b FROM d GROUP BY digest
    )
    SELECT min(d.doc_id) AS doc_id, d.digest,
           CAST(d.batch AS BIGINT) AS accepted_batch
    FROM d JOIN firsts f ON f.digest = d.digest AND f.b = d.batch
    GROUP BY d.digest, d.batch
    """,
    doc="Continuous-ingest dedup with STANDING state: two landed drops "
        "(even then odd doc_ids) stream through foreachBatch; each "
        "batch elects per-digest representatives (min doc_id), "
        "anti-joins the digest table the previous batches wrote, "
        "appends the survivors, and merges its new digests back — the "
        "batch twin is dedup_incremental_ingest, this is the same "
        "shape as a RUNNING pipeline where state lives in the sink "
        "(at 100 TB: a bucketed digest table, the anti-join touches "
        "32 bytes/doc). Oracle: first-batch-wins representative "
        "election over the static corpus.",
)
def stream_incremental_digest_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="ibf_stream_digest_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    state = os.path.join(work, "digests")
    ckpt = os.path.join(work, "ckpt")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing)
    before = _landing_files(landing)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _bump_mtime_after(landing, before)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )

    def sink(batch: DataFrame, bid: int) -> None:
        s = batch.sparkSession
        reps = (
            batch.select(F.md5("text").alias("digest"), "doc_id")
            .groupBy("digest")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        try:
            known = s.read.parquet(state).select("digest").distinct()
            fresh = reps.join(known, "digest", "left_anti")
        except Exception:  # first batch: no standing state yet
            fresh = reps
        accepted = fresh.select(
            "doc_id", "digest", F.lit(bid).cast("long").alias("accepted_batch")
        )
        accepted.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))
        fresh.select("digest").write.mode("append").parquet(state)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    result = (
        spark.read.parquet(os.path.join(out, "*"))
        .select("doc_id", "digest", "accepted_batch")
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_sliding_counts",
    """
    WITH e AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events
    ), w AS (
      SELECT event_type, (es // 1800) * 1800 - k * 1800 AS ws
      FROM e, unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS t(k)
    )
    SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM w GROUP BY 1, 2
    """,
    doc="§2.10 sliding (hopping) windows: events stream through "
        "readStream → withWatermark(2h) → window(ts, 1h, 30min) "
        "counts → AvailableNow sink; every event lands in exactly "
        "TWO overlapping windows. The oracle derives both window "
        "starts per event arithmetically (floor to the 30-min grid, "
        "minus k·1800 for k in {0,1}) and aggregates — the batch "
        "statement of hopping-window semantics.",
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ibf_typhoon_data_pipeline_spark.streaming.micro_batch import (
        sliding_event_counts,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_slide_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    ev.write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema(ev.schema).parquet(landing)
    counts = sliding_event_counts(stream)

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out)

    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.read.parquet(out)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


_AUDIO_WIN = 8
_AUDIO_HOP = 4


def _audio_energy_sql(start: int) -> str:
    """Σ byte² over the window starting at byte ``start`` — explicit
    integer term sum from the hex encoding."""
    return " + ".join(
        f"{_sql_hex_byte('content_hex', start + i)}"
        f" * {_sql_hex_byte('content_hex', start + i)}"
        for i in range(_AUDIO_WIN)
    )


@register(
    "media_audio_windows",
    f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id, CAST(s AS INTEGER) AS win_start,
           CAST(CASE s
             {' '.join(f'WHEN {s} THEN {_audio_energy_sql(s)}'
                       for s in range(0, 16 - _AUDIO_WIN + 1, _AUDIO_HOP))}
           END AS BIGINT) AS energy
    FROM media CROSS JOIN unnest([{', '.join(
        str(s) for s in range(0, 16 - _AUDIO_WIN + 1, _AUDIO_HOP))}])
      AS t(s)
    """,
    doc=f"§2.11 audio framing: mapInPandas windows the (stub-decoded) "
        f"PCM payload into {_AUDIO_WIN}-sample frames at hop "
        f"{_AUDIO_HOP} with integer Σ sample² energies — the "
        "spectrogram front-end shape (1 row → k frame rows, Arrow "
        "batches, real codec behind the same NotImplementedError "
        "gate as image decode). The oracle recomputes every window "
        "from the hex payload.",
)
def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.multimodal import (
        audio_windows,
        gen_media,
    )

    return audio_windows(
        gen_media(spark, 256), win=_AUDIO_WIN, hop=_AUDIO_HOP
    )


@register(
    "stream_cdc_upsert",
    """
    WITH snap AS (
      SELECT o_custkey, o_orderkey, o_orderstatus AS status,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn FROM orders
        WHERE o_orderdate < TIMESTAMP '1999-01-01'
      ) WHERE rn = 1
    ), batch AS (
      SELECT o_custkey, o_orderkey, o_orderstatus AS status,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      ) WHERE rn = 1
    ), state0 AS (
      SELECT * FROM snap WHERE status <> 'F'
    )
    SELECT o_custkey, o_orderkey, status, price_cents
    FROM batch WHERE status <> 'F'
    UNION ALL
    SELECT s.o_custkey, s.o_orderkey, s.status, s.price_cents
    FROM state0 s ANTI JOIN batch b ON b.o_custkey = s.o_custkey
    """,
    doc="Streaming CDC MERGE: two landed change drops (orders before/"
        "after the cutoff) stream through foreachBatch; every batch "
        "applies the SAME merge rule against the standing snapshot — "
        "keep-last per customer within the batch, status 'F' deletes "
        "the key, anything else upserts, untouched keys carry over — "
        "writing a versioned snapshot per batch (at scale: MERGE INTO "
        "a keyed table format instead of a rewrite). The batch twin "
        "is cdc_merge_upsert; the oracle folds both drops through "
        "the same rule.",
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:

    cutoff = F.lit("1999-01-01").cast("timestamp_ntz")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_cdc_")
    landing = os.path.join(work, "landing")
    state = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    orders.filter(F.col("o_orderdate") < cutoff).coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing)
    before = _landing_files(landing)
    orders.filter(F.col("o_orderdate") >= cutoff).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _bump_mtime_after(landing, before)

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    last_bid = {"v": -1}

    def sink(batch: DataFrame, bid: int) -> None:
        s = batch.sparkSession
        latest = (
            batch.groupBy("o_custkey")
            .agg(
                F.max(
                    F.struct(
                        "o_orderdate", "o_orderkey", "status", "price_cents"
                    )
                ).alias("s")
            )
            .select(
                "o_custkey",
                F.col("s.o_orderkey").alias("o_orderkey"),
                F.col("s.status").alias("status"),
                F.col("s.price_cents").alias("price_cents"),
            )
        )
        upserts = latest.filter(F.col("status") != "F")
        prev = os.path.join(state, f"b{bid - 1}")
        if os.path.isdir(prev):
            standing = s.read.parquet(prev)
            carried = standing.join(
                latest.select("o_custkey"), "o_custkey", "left_anti"
            )
            merged = upserts.unionByName(carried)
        else:  # first batch: empty standing snapshot
            merged = upserts
        merged.write.mode("overwrite").parquet(
            os.path.join(state, f"b{bid}")
        )
        last_bid["v"] = bid

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    result = (
        spark.read.parquet(os.path.join(state, f"b{last_bid['v']}"))
        .select("o_custkey", "o_orderkey", "status", "price_cents")
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_static_enrich",
    """
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(e.value) * 100.0) AS BIGINT) AS value_cents
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
    doc="§2.10 stream-static enrichment: the event stream joins the "
        "static customer dimension INSIDE the streaming query (Spark "
        "re-plans the static side per micro-batch; customer is "
        "SF-scaling, so the strategy is size-decided per batch — "
        "broadcast while it fits the threshold, shuffle beyond — "
        "never force-hinted), then aggregates per (segment, type) "
        "— the canonical streaming-enrichment shape. AvailableNow "
        "drains the backlog; the oracle is the batch join+aggregate.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_enrich_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    ev.write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema(ev.schema).parquet(landing)
    enriched = (
        stream.join(
            cust, stream.user_id == cust.c_custkey
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value") * 100.0)
            .cast("long")
            .alias("value_cents"),
        )
    )

    def sink(batch: DataFrame, _bid: int) -> None:
        batch.write.mode("append").parquet(out)

    q = (
        enriched.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.read.parquet(out)
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_dlq_split",
    """
    WITH routed AS (
      SELECT event_id,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                       BETWEEN 10 AND 90
                  THEN 'ok' ELSE 'dlq' END AS route,
             CAST(round(value * 100.0) AS BIGINT) AS value_cents
      FROM events
    )
    SELECT route, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(value_cents) AS BIGINT) AS value_cents
    FROM routed GROUP BY route
    """,
    doc="§2.10 dead-letter routing: every micro-batch validates the "
        "JSON property contract (k in [10, 90]) and writes accepted "
        "rows and violations to SEPARATE sinks inside one "
        "foreachBatch — the two-sink quarantine shape that keeps bad "
        "records out of the pipeline without dropping them. The "
        "oracle folds the same rule over the batch table.",
)
def stream_dlq_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "props", "value"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_dlq_")
    landing = os.path.join(work, "landing")
    ok_dir = os.path.join(work, "ok")
    dlq_dir = os.path.join(work, "dlq")
    ckpt = os.path.join(work, "ckpt")
    ev.write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema(ev.schema).parquet(landing)

    def sink(batch: DataFrame, _bid: int) -> None:
        routed = batch.select(
            "event_id",
            F.get_json_object("props", "$.k")
            .cast("long")
            .alias("k"),
            F.round(F.col("value") * 100.0)
            .cast("long")
            .alias("value_cents"),
        ).persist()
        try:
            good = routed.filter(F.col("k").between(10, 90))
            bad = routed.filter(
                ~F.col("k").between(10, 90) | F.col("k").isNull()
            )
            good.write.mode("append").parquet(ok_dir)
            bad.write.mode("append").parquet(dlq_dir)
        finally:
            routed.unpersist()

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def _summarize(path: str, route: str) -> DataFrame:
        return (
            spark.read.parquet(path)
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("value_cents").cast("long").alias("value_cents"),
            )
            .select(F.lit(route).alias("route"), "n", "value_cents")
        )

    result = (
        _summarize(ok_dir, "ok").unionByName(_summarize(dlq_dir, "dlq"))
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "scan_jsonl_badrecords",
    """
    WITH lines AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END AS is_bad,
             CAST(round(value * 100.0) AS BIGINT) AS value_cents
      FROM events
    )
    SELECT CASE WHEN is_bad = 1 THEN 'corrupt' ELSE 'parsed' END
             AS record_class,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN is_bad = 0 THEN value_cents
                         ELSE 0 END) AS BIGINT) AS value_cents
    FROM lines GROUP BY 1
    """,
    doc="S6 schema-on-read resilience: events re-landed as JSONL with "
        "every 10th line deliberately truncated mid-record; the scan "
        "reads with an EXPLICIT schema in PERMISSIVE mode and a "
        "columnNameOfCorruptRecord quarantine column, so malformed "
        "lines surface as rows instead of failing the job — the "
        "ingest contract every semi-structured feed needs. Output is "
        "the per-class count + the value total over parsed rows; the "
        "oracle classifies by the same corruption rule.",
)
def scan_jsonl_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )
    work = tempfile.mkdtemp(prefix="ibf_jsonl_")
    path = os.path.join(work, "events.jsonl")
    # land as JSONL with every 10th line truncated mid-record — the
    # corruption is applied IN-ENGINE (text-format write, no driver
    # materialization of the fact table)
    j = F.to_json(F.struct("event_id", "value"))
    ev.select(
        F.when(
            F.col("event_id") % 10 == 0,
            F.substring(j, 1, 20),
        )
        .otherwise(j)
        .alias("value")
    ).write.mode("overwrite").text(path)

    schema = (
        "event_id LONG, value DOUBLE, _corrupt_record STRING"
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    out = (
        parsed.select(
            F.when(F.col("_corrupt_record").isNotNull(), "corrupt")
            .otherwise("parsed")
            .alias("record_class"),
            F.when(
                F.col("_corrupt_record").isNull(),
                F.round(F.col("value") * 100.0).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("value_cents"),
        )
        .groupBy("record_class")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
    )
    out = _pin(spark, out)
    shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "scan_parquet_schema_merge",
    """
    WITH rows AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents,
             CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
               AS priority
      FROM orders
    )
    SELECT CASE WHEN priority IS NULL THEN 'legacy' ELSE 'evolved' END
             AS generation,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(price_cents) AS BIGINT) AS price_cents,
           CAST(count(DISTINCT priority) AS BIGINT) AS n_priorities
    FROM rows GROUP BY 1 ORDER BY generation
    """,
    doc="S6 schema evolution: two parquet generations landed "
        "in-engine — gen1 without the priority column, gen2 with it — "
        "read back through ONE mergeSchema scan whose unified schema "
        "null-fills the legacy files (Spark's schema-evolution "
        "contract; Delta/Iceberg do the same resolution from "
        "metadata, where the per-file footer merge this option pays "
        "disappears). Summary proves the old rows survive with NULL "
        "priority while new rows keep theirs; the oracle rebuilds "
        "both generations from the parity rule.",
)
def scan_parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    work = tempfile.mkdtemp(prefix="ibf_schemamerge_")
    base = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
    )
    # generation 1: the pre-evolution schema (no priority column)
    base.filter(F.col("o_orderkey") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(os.path.join(work, "gen=1"))
    # generation 2: the evolved schema adds a string column
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
        F.col("o_orderpriority").alias("priority"),
    ).write.mode("overwrite").parquet(os.path.join(work, "gen=2"))

    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(work)
    )
    out = (
        merged.select(
            F.when(F.col("priority").isNull(), "legacy")
            .otherwise("evolved")
            .alias("generation"),
            "price_cents",
            "priority",
        )
        .groupBy("generation")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("price_cents").cast("long").alias("price_cents"),
            F.countDistinct("priority").cast("long").alias("n_priorities"),
        )
        .orderBy("generation")
    )
    out = _pin(spark, out)
    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------------- CSV dialect round-trip
@register(
    "scan_csv_multiline_roundtrip",
    """
    WITH tricky AS (
      SELECT doc_id,
             concat('v,"', substr(text, 1, 20), '"', chr(10),
                    CAST(doc_id AS VARCHAR)) AS payload
      FROM documents WHERE doc_id < 200
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(('0x' || substr(md5(payload), 1, 8)) AS BIGINT))
                AS BIGINT) AS payload_hash_sum
    FROM tricky
    """,
    doc="CSV dialect round-trip: payloads embedding the delimiter, "
        "double quotes, AND newlines are written through Spark's "
        "quoted CSV writer and read back with multiLine parsing; the "
        "entry returns a content fingerprint (count + md5-prefix "
        "sum) that the oracle computes from the SOURCE strings "
        "directly — equality proves the writer/parser pair is "
        "lossless on the hard cases. The parse is per-file "
        "parallel; multiLine disables naive line-splitting, the "
        "documented trade-off for quoted newlines.",
)
def scan_csv_multiline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    tricky = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .selectExpr(
            "doc_id",
            "concat('v,\"', substr(text, 1, 20), '\"', chr(10),"
            " CAST(doc_id AS STRING)) AS payload",
        )
    )
    work = _tf.mkdtemp(prefix="ibf_csvdialect_")
    tricky.write.mode("overwrite").option("header", "true").option(
        "quoteAll", "true"
    ).csv(work)
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("inferSchema", "false")
        .csv(work)
    )
    return back.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.conv(F.substring(F.md5("payload"), 1, 8), 16, 10).cast(
                "long"
            )
        )
        .cast("long")
        .alias("payload_hash_sum"),
    )


# ------------------------------------------- checkpoint restart
@register(
    "stream_checkpoint_restart",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Exactly-once ACROSS RESTARTS: a first AvailableNow query "
        "drains batch 1 and stops; batch 2 lands; a SECOND query "
        "object resumes from the SAME checkpoint and must process "
        "only the new files. Each micro-batch appends its rows to a "
        "parquet sink, so any replay of batch 1 would double those "
        "counts and break the plain full-table oracle — the hash "
        "match IS the recovery proof. This is the durability "
        "contract a production file-ingest pipeline runs on "
        "(offsets in the checkpoint, idempotent downstream "
        "re-aggregation).",
)
def stream_checkpoint_restart(spark: SparkSession, sf_dir: str) -> DataFrame:

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_restart_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing)

    def _run_once():
        stream = spark.readStream.schema(orders.schema).parquet(landing)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _run_once()  # drains batch 1, stops
    before = _landing_files(landing)
    orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _bump_mtime_after(landing, before)
    _run_once()  # RESTART from the same checkpoint: only new files

    return (
        spark.read.parquet(out)
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------ ORC round-trip
@register(
    "scan_orc_roundtrip",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
                AS BIGINT) AS price_cents,
           strftime(min(l_shipdate), '%Y-%m-%d') AS min_shipdate,
           strftime(max(l_shipdate), '%Y-%m-%d') AS max_shipdate,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    WHERE l_orderkey % 8 = 0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="ORC round-trip: a lineitem slice (timestamp + double + "
        "string + pre-quantized BIGINT columns) is written through "
        "Spark's native ORC sink and read back; the entry aggregates "
        "the read-back frame while the oracle computes the SAME "
        "aggregate from the parquet source — equality proves the "
        "columnar re-encode is lossless across every type in the "
        "slice. ORC is the second columnar format the engine "
        "supports end-to-end (parquet being the default); the write "
        "is per-partition parallel and the read-back scan prunes "
        "columns like any other columnar source.",
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    sel = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 8 == 0)
        .select(
            "l_orderkey",
            "l_returnflag",
            "l_shipdate",
            F.round(F.col("l_extendedprice") * 100.0)
            .cast("long")
            .alias("price_cents"),
        )
    )
    work = _tf.mkdtemp(prefix="ibf_orc_")
    sel.write.mode("overwrite").orc(work)
    back = spark.read.orc(work)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("price_cents").cast("long").alias("price_cents"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias(
                "min_shipdate"
            ),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias(
                "max_shipdate"
            ),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


# ------------------------------------------- RocksDB state backend
@register(
    "stream_rocksdb_state",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="The windowed-count query under the RocksDB state-store "
        "provider — the production backend once streaming state "
        "outgrows executor heap (HDFS-backed in-memory maps OOM at "
        "100 TB-scale key cardinality; RocksDB spills to local SSD "
        "with changelog checkpointing). Two single-file micro-batches "
        "force the second batch to read window state BACK from "
        "RocksDB; update-mode emissions are collapsed keep-last "
        "(counts grow monotonically, so max(n) per key is the final "
        "state), and the result must equal the batch aggregate — "
        "proving the state contract is backend-independent. The "
        "provider conf is restored afterward so other queries keep "
        "the default backend.",
)
def stream_rocksdb_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ibf_typhoon_data_pipeline_spark.streaming.micro_batch import (
        windowed_event_counts,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_rocks_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        counts = windowed_event_counts(stream)

        def sink(batch: DataFrame, _bid: int) -> None:
            batch.write.mode("append").parquet(out)

        q = (
            counts.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    result = (
        spark.read.parquet(out)
        .groupBy(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.max("n").alias("n"))
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


# ------------------------------------------- snapshot manifest audit
@register(
    "audit_snapshot_manifest",
    """
    SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(sum(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                1, 8)) AS BIGINT)) AS BIGINT) AS key_checksum
    FROM orders
    UNION ALL
    SELECT 'lineitem', CAST(count(*) AS BIGINT),
           CAST(min(l_orderkey) AS BIGINT),
           CAST(max(l_orderkey) AS BIGINT),
           CAST(sum(CAST(('0x' || substr(md5(concat(
                CAST(l_orderkey AS VARCHAR), ':',
                CAST(l_linenumber AS VARCHAR))), 1, 8)) AS BIGINT))
             AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'customer', CAST(count(*) AS BIGINT),
           CAST(min(c_custkey) AS BIGINT),
           CAST(max(c_custkey) AS BIGINT),
           CAST(sum(CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                1, 8)) AS BIGINT)) AS BIGINT)
    FROM customer
    ORDER BY tbl
    """,
    doc="Snapshot integrity manifest — the data-contract gate a "
        "publish step checks before promoting a snapshot: per table, "
        "row count, key range, and an order-free content checksum "
        "(sum of 8-hex-char md5 prefixes over the primary key — "
        "commutative, so it parallelizes as a plain partial agg and "
        "any dropped/duplicated row changes it). One scan per table, "
        "three 1-row aggregates unioned; at 100 TB each checksum is "
        "a map-side reduction.",
)
def audit_snapshot_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    def chk(df: DataFrame, tbl: str, key, keystr) -> DataFrame:
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count("*").cast("long").alias("n_rows"),
            F.min(key).cast("long").alias("min_key"),
            F.max(key).cast("long").alias("max_key"),
            F.sum(
                F.conv(F.substring(F.md5(keystr), 1, 8), 16, 10).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("key_checksum"),
        )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    return (
        chk(
            orders,
            "orders",
            F.col("o_orderkey"),
            F.col("o_orderkey").cast("string"),
        )
        .unionAll(
            chk(
                li,
                "lineitem",
                F.col("l_orderkey"),
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                ),
            )
        )
        .unionAll(
            chk(
                cust,
                "customer",
                F.col("c_custkey"),
                F.col("c_custkey").cast("string"),
            )
        )
        .orderBy("tbl")
    )


# --------------------------------------- Python DataSource (Spark 4)
@register(
    "scan_python_datasource",
    """
    SELECT CAST(user_id % 16 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_eid,
           CAST(sum(floor(epoch(ts))) AS BIGINT) AS sum_epoch,
           CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
             AS BIGINT) AS sum_milli
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    doc="Custom source through the Python DataSource API (Spark 4.0 "
        "spark.dataSource.register): events round-trip a bespoke "
        "pipe-delimited advisory-log text format (the reference's "
        "agency-product ingest shape, tc_tracks_forecast.py:126-185) "
        "and come back via spark.read.format('advisorylog') — one "
        "InputPartition per file so the scan parallelizes like the "
        "native file sources, and the event_type EqualTo predicate "
        "is PUSHED into the reader (4.1 pushFilters) and dropped "
        "from the residual, so the oracle match proves pushdown "
        "executed (a non-filtering reader would return 5x the rows). "
        "All fields ride as integers/text (value pre-quantized to "
        "milli-units), making the format round-trip lossless.",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile as _tf

    from ibf_typhoon_data_pipeline_spark.sources.pyds import (
        register_advisorylog,
    )

    ev = load_table(spark, sf_dir, "events")
    lines = ev.select(
        F.concat_ws(
            "|",
            F.col("event_id"),
            F.unix_timestamp("ts").cast("long"),
            F.col("user_id"),
            F.col("event_type"),
            F.floor(F.col("value") * 1000.0 + 0.5).cast("long"),
        ).alias("value")
    )
    work = _tf.mkdtemp(prefix="ibf_pyds_")
    lines.repartition(8).write.mode("overwrite").text(work)
    register_advisorylog(spark)
    back = (
        spark.read.format("advisorylog")
        .option("path", work)
        .load()
        .filter(F.col("event_type") == "purchase")
    )
    result = (
        back.groupBy((F.col("user_id") % 16).cast("long").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("sum_eid"),
            F.sum("epoch_s").cast("long").alias("sum_epoch"),
            F.sum("value_milli").cast("long").alias("sum_milli"),
        )
        .orderBy("bucket")
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_python_datasource",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_eid,
           CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
             AS BIGINT) AS sum_milli
    FROM events
    WHERE event_id % 4 = 0
    GROUP BY event_type
    """,
    doc="Custom STREAMING source through the Python DataSource API "
        "(SimpleDataSourceStreamReader, Spark 4.0): the advisory-log "
        "landing directory replays one micro-batch per file (the "
        "offset is an index into the sorted manifest and each read() "
        "advances it by one — source-side rate limiting), a running "
        "per-type aggregate streams through foreachBatch in update "
        "mode, and the keep-last state must equal the batch "
        "aggregate — the same order-independence contract as the "
        "file-source streaming entries, now carried by a source THIS "
        "repo defines end-to-end including exact readBetweenOffsets "
        "replay for recovery. Mirrors the reference's agency-feed "
        "polling loop (Check_for_active_typhoon.py), which lands one "
        "small advisory product at a time.",
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile as _tf

    from ibf_typhoon_data_pipeline_spark.sources.pyds import (
        register_advisorylog,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 4 == 0
    )
    lines = ev.select(
        F.concat_ws(
            "|",
            F.col("event_id"),
            F.unix_timestamp("ts").cast("long"),
            F.col("user_id"),
            F.col("event_type"),
            F.floor(F.col("value") * 1000.0 + 0.5).cast("long"),
        ).alias("value")
    )
    work = _tf.mkdtemp(prefix="ibf_pyds_stream_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    # three immutable advisory drops -> three micro-batches
    # pmod, not abs(hash) % 3: abs(Integer.MIN_VALUE) overflows
    # negative and that row would match no k (silent drop)
    for k in range(3):
        lines.filter(
            F.pmod(F.hash("value"), F.lit(3)) == k
        ).coalesce(1).write.mode("append").text(landing)
    register_advisorylog(spark)
    stream = (
        spark.readStream.format("advisorystream")
        .option("path", landing)
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("sum_eid"),
        F.sum("value_milli").cast("long").alias("sum_milli"),
    )
    q = (
        agg.writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    result = (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.max(F.struct("n", "sum_eid", "sum_milli")).alias("st"))
        .select("event_type", "st.n", "st.sum_eid", "st.sum_milli")
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "scan_state_store",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
             AS BIGINT) AS sum_milli,
           CAST(max(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
             AS BIGINT) AS max_milli
    FROM events
    GROUP BY event_type
    """,
    doc="Checkpoint state introspection via the State Data Source "
        "(Spark 4 spark.read.format('statestore')): a streaming "
        "per-type aggregate runs to completion, then its state store "
        "is read BACK as a batch DataFrame straight from the "
        "checkpoint — key struct, aggregation buffer (count/sum/max) "
        "and partition_id — and must equal the batch aggregate over "
        "the same input. This is the production debugging surface "
        "for stateful pipelines (inspect what a query believes "
        "without replaying it); the read is partition-parallel over "
        "the store's shuffle partitions. The buffer-vs-batch "
        "equality also proves state durability across the "
        "foreachBatch commit path.",
)
def scan_state_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile as _tf

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("value") * 1000.0 + 0.5).cast("long").alias("vm"),
    )
    work = _tf.mkdtemp(prefix="ibf_statestore_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    ev.coalesce(1).write.parquet(landing)
    stream = spark.readStream.schema(ev.schema).parquet(landing)
    counts = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("vm").alias("s"),
        F.max("vm").alias("mx"),
    )
    q = (
        counts.writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("long").alias("n"),
            F.col("value.sum").cast("long").alias("sum_milli"),
            F.col("value.max").cast("long").alias("max_milli"),
        )
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_stream_left_outer",
    """
    SELECT CAST(c.user_id % 8 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(p.event_id) AS BIGINT) AS n_matched,
           CAST(sum(c.event_id) AS BIGINT) AS sum_click_ids,
           CAST(coalesce(sum(p.event_id), 0) AS BIGINT) AS sum_purchase_ids
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    GROUP BY 1 ORDER BY 1
    """,
    doc="Stream-stream LEFT OUTER interval join — the semantics "
        "surface beyond the inner join (stream_stream_interval_join): "
        "matches emit eagerly, but an UNMATCHED click can only emit "
        "its NULL-extended row once the global watermark proves no "
        "purchase can still arrive inside its [0, 30 min] band — "
        "i.e. null emission is a watermark-driven state EVICTION, "
        "not a batch-end default. A finite replay would strand every "
        "late unmatched row, so a +30-day sentinel pair (user_id "
        "-1, filtered from the result) lands as a second "
        "maxFilesPerTrigger=1 micro-batch on BOTH sides to advance "
        "the min-of-sources watermark and flush the outer state — "
        "the same sentinel pattern stream_session_windows pinned. "
        "Oracle is the identical batch left join; equality proves "
        "eager matches and watermark-evicted nulls together "
        "reconstruct it exactly. State stays bounded at production "
        "cardinality: both sides evict once the opposite watermark "
        "passes their band.",
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_ssloj_")
    land_c = os.path.join(work, "clicks")
    land_p = os.path.join(work, "purchases")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    clicks_b = ev.filter(F.col("event_type") == "click")
    purch_b = ev.filter(F.col("event_type") == "purchase")
    clicks_b.coalesce(1).write.mode("overwrite").parquet(land_c)
    purch_b.coalesce(1).write.mode("overwrite").parquet(land_p)
    # watermark-advancing sentinel pair: one row per side, 30 days past
    # the corpus max, landed as a SECOND file so it forms its own
    # micro-batch and flushes the outer-join state
    sentinel = ev.agg(F.max("ts").alias("mx")).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.expr("mx + INTERVAL 30 DAYS").alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
    )

    # pin the sentinel files strictly LATER than every data file so
    # the watermark can't advance before the data batch and evict the
    # real rows as late (ADVICE r4 / CLAUDE.md replay-order rule)
    before = {d: _landing_files(d) for d in (land_c, land_p)}
    sentinel.coalesce(1).write.mode("append").parquet(land_c)
    sentinel.coalesce(1).write.mode("append").parquet(land_p)
    for d in (land_c, land_p):
        _bump_mtime_after(d, before[d])

    clicks = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land_c)
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land_p)
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )

    def sink(batch: DataFrame, bid: int) -> None:
        batch.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            joined.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    result = (
        spark.read.parquet(os.path.join(out, "*"))
        .filter(F.col("c_user") >= 0)  # drop the sentinel's own pair
        .groupBy((F.col("c_user") % 8).cast("long").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count("purchase_id").cast("long").alias("n_matched"),
            F.sum("click_id").cast("long").alias("sum_click_ids"),
            F.coalesce(F.sum("purchase_id"), F.lit(0))
            .cast("long")
            .alias("sum_purchase_ids"),
        )
        .orderBy("bucket")
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "stream_stream_full_outer",
    """
    SELECT CAST(coalesce(c.user_id, p.user_id) % 8 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(c.event_id) AS BIGINT) AS n_click_rows,
           CAST(count(p.event_id) AS BIGINT) AS n_purchase_rows,
           CAST(coalesce(sum(c.event_id), 0) AS BIGINT) AS sum_click_ids,
           CAST(coalesce(sum(p.event_id), 0) AS BIGINT) AS sum_purchase_ids
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    GROUP BY 1 ORDER BY 1
    """,
    doc="Stream-stream FULL OUTER interval join — completes the "
        "join-family (inner: stream_stream_interval_join, left: "
        "stream_stream_left_outer). Null-extended rows now flow from "
        "BOTH states: an unmatched click emits once the watermark "
        "clears its [0, +30 min] band, an unmatched purchase once it "
        "clears the mirrored [−30 min, 0] band — both are "
        "watermark-driven state evictions, so the same +30-day "
        "sentinel pair (user −1, filtered out by "
        "coalesce(c,p) ≥ 0) lands as a second maxFilesPerTrigger=1 "
        "micro-batch on each side to flush a finite replay. Oracle "
        "is the identical batch FULL JOIN; equality proves eager "
        "matches plus both eviction paths reconstruct it exactly. "
        "State stays bounded: each side evicts once the opposite "
        "watermark passes its band.",
)
def stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    work = tempfile.mkdtemp(prefix="ibf_stream_ssfoj_")
    land_c = os.path.join(work, "clicks")
    land_p = os.path.join(work, "purchases")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    clicks_b = ev.filter(F.col("event_type") == "click")
    purch_b = ev.filter(F.col("event_type") == "purchase")
    clicks_b.coalesce(1).write.mode("overwrite").parquet(land_c)
    purch_b.coalesce(1).write.mode("overwrite").parquet(land_p)
    sentinel = ev.agg(F.max("ts").alias("mx")).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.expr("mx + INTERVAL 30 DAYS").alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
    )
    before = {d: _landing_files(d) for d in (land_c, land_p)}
    sentinel.coalesce(1).write.mode("append").parquet(land_c)
    sentinel.coalesce(1).write.mode("append").parquet(land_p)
    for d in (land_c, land_p):
        _bump_mtime_after(d, before[d])

    clicks = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land_c)
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land_p)
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "fullOuter",
    )

    def sink(batch: DataFrame, bid: int) -> None:
        batch.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            joined.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    result = (
        spark.read.parquet(os.path.join(out, "*"))
        .filter(F.coalesce("c_user", "p_user") >= 0)
        .groupBy(
            (F.coalesce("c_user", "p_user") % 8).cast("long").alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count("click_id").cast("long").alias("n_click_rows"),
            F.count("purchase_id").cast("long").alias("n_purchase_rows"),
            F.coalesce(F.sum("click_id"), F.lit(0))
            .cast("long")
            .alias("sum_click_ids"),
            F.coalesce(F.sum("purchase_id"), F.lit(0))
            .cast("long")
            .alias("sum_purchase_ids"),
        )
        .orderBy("bucket")
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "scan_binaryfile_blobs",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    WHERE doc_id % 16 = 0
    ORDER BY doc_id
    """,
    doc="binaryFile source — the ingestion path multimodal blobs "
        "(images/audio/shards) actually take into the engine: a "
        "sample of documents lands as one .bin FILE each, "
        "spark.read.format('binaryFile') scans them as (path, "
        "modificationTime, length, content BINARY) rows, the doc id "
        "is parsed back out of the path, and per blob the byte "
        "length plus md5(content) must match the source text's "
        "strlen(bytes)/md5 — proving the file round-trip is "
        "byte-exact for multi-byte UTF-8 content (zh/ru docs "
        "included). Spark's md5 hashes raw bytes while DuckDB's "
        "hashes the string's UTF-8 encoding — the same bytes, which "
        "is exactly why the blob is written as the text's UTF-8. At "
        "100 TB this scan shape parallelizes file-per-task and "
        "carries `pathGlobFilter`/`recursiveFileLookup` pruning.",
)
def scan_binaryfile_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile as _tf

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 16 == 0)
        .select("doc_id", "text")
    )
    work = _tf.mkdtemp(prefix="ibf_binfiles_")
    # one file per blob, written executor-side (foreachPartition) —
    # the landing contract a media pipeline has on arrival. The local
    # tempdir stands in for shared storage (works because local-mode
    # executors share the filesystem); on a cluster the landing path
    # is object storage and this fixture write is the upstream
    # producer's job — the SCAN below is the part under test.
    def _write_part(rows):
        for r in rows:
            with open(
                os.path.join(work, f"doc_{r['doc_id']}.bin"), "wb"
            ) as fh:
                fh.write(r["text"].encode("utf-8"))

    docs.foreachPartition(_write_part)
    back = spark.read.format("binaryFile").load(work)
    result = (
        back.select(
            F.regexp_extract(
                F.col("path"), "doc_([0-9]+)[.]bin", 1
            )
            .cast("long")
            .alias("doc_id"),
            F.col("length").cast("long").alias("n_bytes"),
            F.md5("content").alias("digest"),
        )
        .orderBy("doc_id")
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "scan_xml_native",
    """
    SELECT event_type AS kind,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_id,
           CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
             AS BIGINT) AS sum_milli
    FROM events
    WHERE event_id % 8 = 0
    GROUP BY event_type ORDER BY kind
    """,
    doc="Native XML data source (Spark 4 built-in, SPARK-44265): an "
        "agency-advisory-style XML feed (the S10 alternate-agency "
        "surface, tc_tracks_forecast.py's bespoke products) is "
        "landed as well-formed per-partition documents, scanned "
        "straight back with spark.read.format('xml') + rowTag — no "
        "mapInPandas decode (xml_track_decode remains the twin for "
        "formats the schema inferencer can't hold) — and the typed "
        "rollup must equal the source aggregate, proving the "
        "XML round-trip preserves every integer-quantized field. "
        "Schema is declared explicitly (inference over 100 TB of "
        "feed files would be its own scan).",
)
def scan_xml_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile as _tf

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 8 == 0)
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 1000.0 + 0.5)
            .cast("long")
            .alias("milli"),
        )
    )
    # local tempdir stands in for shared storage (local-mode executors
    # share the filesystem; on a cluster the feed lands on object
    # storage) — the native-XML SCAN is the part under test
    work = _tf.mkdtemp(prefix="ibf_xml_")

    def _write_part(idx, rows):
        path = os.path.join(work, f"feed_{idx}.xml")
        chunks = ["<advisories>"]
        n = 0
        for r in rows:
            chunks.append(
                f"<advisory><id>{r['event_id']}</id>"
                f"<kind>{r['event_type']}</kind>"
                f"<milli>{r['milli']}</milli></advisory>"
            )
            n += 1
        chunks.append("</advisories>")
        if n:
            with open(path, "w", encoding="utf-8") as fh:
                fh.write("".join(chunks))
        return iter([])

    ev.repartition(4).rdd.mapPartitionsWithIndex(_write_part).count()
    back = (
        spark.read.format("xml")
        .option("rowTag", "advisory")
        .schema("id bigint, kind string, milli bigint")
        .load(work)
    )
    result = (
        back.groupBy(F.col("kind"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("id").cast("long").alias("sum_id"),
            F.sum("milli").cast("long").alias("sum_milli"),
        )
        .orderBy("kind")
    )
    result = _pin(spark, result)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register(
    "media_image_tiles",
    f"""
    WITH media AS ({_MEDIA_SQL}),
    dims AS (
      SELECT media_id,
             CAST({_sql_hex_byte('content_hex', 0)} + 1 AS BIGINT) AS w,
             CAST({_sql_hex_byte('content_hex', 1)} + 1 AS BIGINT) AS h
      FROM media WHERE media_type = 'image'
    )
    , rows_ AS (
      SELECT media_id, w, h,
             unnest(range(0, (h + 7) // 8)) AS i
      FROM dims
    ), cells AS (
      SELECT media_id, w, h, i,
             unnest(range(0, (w + 7) // 8)) AS j
      FROM rows_
    )
    SELECT media_id,
           CAST(i * ((w + 7) // 8) + j AS BIGINT) AS tile_id,
           CAST(j * 8 AS BIGINT) AS x0,
           CAST(i * 8 AS BIGINT) AS y0,
           CAST(least(j * 8 + 8, w) AS BIGINT) AS x1,
           CAST(least(i * 8 + 8, h) AS BIGINT) AS y1
    FROM cells
    ORDER BY media_id, tile_id
    """,
    doc="Image tile/patch manifest — the 1-row→k-rows preprocessing "
        "stage a ViT-style vision pipeline runs before decode (patch "
        "grid, boundary clamping at the right/bottom edges): per "
        "image, every 8×8 tile's (x0,y0,x1,y1) with a row-major tile "
        "id, from the stubbed header dims (real decoders slot into "
        "the same shape — the grid math is what's under test). "
        "Spark side is explode(sequence(...)) twice — pure "
        "generators, no shuffle except the output sort; DuckDB twin "
        "is the lateral range() pair. Tile counts use the exact "
        "integer ceil ((n+7)//8), so both engines enumerate "
        "identical grids.",
)
def media_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.multimodal import (
        gen_media,
    )

    media = gen_media(spark, 256).filter(F.col("media_type") == "image")
    dims = media.select(
        "media_id",
        F.expr(
            "CAST(conv(substr(hex(content), 1, 2), 16, 10) AS BIGINT)"
            " + 1"
        ).alias("w"),
        F.expr(
            "CAST(conv(substr(hex(content), 3, 2), 16, 10) AS BIGINT)"
            " + 1"
        ).alias("h"),
    )
    tiles = dims.select(
        "media_id",
        "w",
        "h",
        F.explode(F.expr("sequence(0, (h + 7) div 8 - 1)")).alias("i"),
    ).select(
        "media_id",
        "w",
        "h",
        "i",
        F.explode(F.expr("sequence(0, (w + 7) div 8 - 1)")).alias("j"),
    )
    return tiles.select(
        "media_id",
        F.expr("CAST(i * ((w + 7) div 8) + j AS BIGINT)").alias("tile_id"),
        F.expr("CAST(j * 8 AS BIGINT)").alias("x0"),
        F.expr("CAST(i * 8 AS BIGINT)").alias("y0"),
        F.expr("CAST(least(j * 8 + 8, w) AS BIGINT)").alias("x1"),
        F.expr("CAST(least(i * 8 + 8, h) AS BIGINT)").alias("y1"),
    ).orderBy("media_id", "tile_id")


# ------------------------------------- amplified-read verification
# Round 10: the DATA-axis scaling tier (sources/amplify.py, the
# '@xN' sf_dir suffix scaling_curve.py measures with) gets a
# cross-engine correctness pin of its own — the oracle rebuilds the
# replica fan-out declaratively (CROSS JOIN unnest(range(N)) + the
# same key shift + the same translate rotation cipher, token-for-token
# the transform amplify_table applies) and both engines checksum the
# full (doc_id, text) content per replica band. A hash match proves
# the amplified read is EXACTLY the documented workload: replica 0
# identity, shifted key bands, per-replica rotated text — so the
# scaling ratios recorded in SCALING_CURVE.json measure a verified
# transform, not trusted tooling.
# constants shared with the transform itself (ADVICE r10: a local
# re-declaration desyncs the oracle pin from a future transform change
# and surfaces only as an opaque gate failure)
from ibf_typhoon_data_pipeline_spark.sources.amplify import (  # noqa: E402
    KEY_OFFSET as _AMP_OFF,
    _ALPHA as _AMP_ALPHA,
)

_AMP_N = 3


@register(
    "scan_amplified_replicas",
    f"""
    WITH reps AS (SELECT unnest(range(0, {_AMP_N})) AS r),
    amp AS (
      SELECT d.doc_id + reps.r * {_AMP_OFF} AS doc_id,
             translate(d.text, '{_AMP_ALPHA}',
                       substring('{_AMP_ALPHA}{_AMP_ALPHA}',
                                 reps.r % 26 + 1, 26)) AS text,
             d.n_chars
      FROM documents d CROSS JOIN reps
    )
    SELECT CAST(doc_id // {_AMP_OFF} AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(CAST(('0x' || substr(md5(concat(
                 CAST(doc_id AS VARCHAR), ':', text)), 1, 8)) AS BIGINT))
             AS BIGINT) AS content_sig
    FROM amp GROUP BY band ORDER BY band
    """,
    doc="Oracle-checked twin of the in-engine data amplification "
        "(sources/amplify.py): Spark reads documents through the "
        "'@x3' amplified path while the oracle rebuilds the same "
        "fan-out declaratively; per-band md5 content checksums must "
        "match exactly, pinning replica-0 identity, the 1e9 key "
        "bands, and the rotation cipher cross-engine.",
)
def scan_amplified_replicas(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, f"{sf_dir}@x{_AMP_N}", "documents")
    return (
        docs.groupBy(
            F.expr(f"doc_id div {_AMP_OFF}").cast("bigint").alias("band")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                F.col("text"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
            )
            .cast("long")
            .alias("content_sig"),
        )
        .orderBy("band")
    )


_AMP_N2 = 28  # past the 26-rotation wrap: bands 26/27 take the case block


@register(
    "scan_amplified_case_block",
    f"""
    WITH reps AS (SELECT unnest(range(0, {_AMP_N2})) AS r),
    amp AS (
      SELECT d.doc_id + reps.r * {_AMP_OFF} AS doc_id,
             CASE WHEN reps.r < 26
                  THEN translate(d.text, '{_AMP_ALPHA}',
                       substring('{_AMP_ALPHA}{_AMP_ALPHA}',
                                 reps.r % 26 + 1, 26))
                  ELSE upper(translate(d.text, '{_AMP_ALPHA}',
                       substring('{_AMP_ALPHA}{_AMP_ALPHA}',
                                 reps.r % 26 + 1, 26)))
             END AS text,
             d.n_chars
      FROM documents d CROSS JOIN reps
    )
    SELECT CAST(doc_id // {_AMP_OFF} AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(CAST(('0x' || substr(md5(
                 CAST(doc_id AS VARCHAR) || ':' || text), 1, 8)) AS BIGINT))
             AS BIGINT) AS content_sig
    FROM amp WHERE doc_id // {_AMP_OFF} >= 24 GROUP BY band ORDER BY band
    """,
    doc="Pin of the cipher's CASE BLOCK (round 11): amplification past "
        "26 replicas rotates within an UPPERCASE second alphabet "
        "(sources/amplify.py — ADVICE r10 caught the bare `% 26` wrap "
        "mapping replica 26 to the identity and colliding pair "
        "spaces). Spark reads documents through '@x28' and checksums "
        "bands 24..27 — the wrap boundary plus both block-1 replicas "
        "— against the oracle's declarative rebuild; an md5 match "
        "proves block-1 text is the uppercased rotation, not a "
        "collided repeat, so @x30-scale tier points measure distinct "
        "workloads.",
)
def scan_amplified_case_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, f"{sf_dir}@x{_AMP_N2}", "documents")
    return (
        docs.filter(F.expr(f"doc_id div {_AMP_OFF}") >= 24)
        .groupBy(
            F.expr(f"doc_id div {_AMP_OFF}").cast("bigint").alias("band")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                F.col("text"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
            )
            .cast("long")
            .alias("content_sig"),
        )
        .orderBy("band")
    )

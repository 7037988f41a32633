"""Structured-Streaming skin over the forecast landing zone
(SURVEY.md §2.10/§7.6).

The reference is a cron-batch pipeline with file-cache idempotence
(crontab:23, forecast_process.py:360-363): every 6 h a new ECMWF drop
lands, re-runs may see the same drop twice. The streaming re-skin
models each drop as a micro-batch:

    readStream(landing_dir) → dropDuplicates(track keys)
      → foreachBatch(batch DAG) with Trigger.AvailableNow

which upgrades the cron+cache scheme's at-least-once to exactly-once
per forecast drop: the checkpoint remembers processed files, the
dedup collapses overlapping drops, AvailableNow drains everything
pending then stops (the cron re-run becomes a no-op restart).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# Explicit schema — streaming sources don't infer, and the engine
# declares contracts instead of inheriting pandas' inference
# (SURVEY §1.2).
TRACK_SCHEMA = StructType(
    [
        StructField("ens_id", LongType()),
        StructField("step", LongType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("vmax", DoubleType()),
        StructField("pcen", DoubleType()),
        StructField("penv", DoubleType()),
    ]
)

TRACK_KEYS = ["ens_id", "step"]


def forecast_stream(
    spark: SparkSession, landing_dir: str, schema: StructType = TRACK_SCHEMA
) -> DataFrame:
    """File-source stream over the BUFR→Parquet landing zone (S1/S2
    ingest lands here; the decode adapter is driver-side by design)."""
    return spark.readStream.schema(schema).parquet(landing_dir)


def dedup_forecast_drops(stream: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Collapse overlapping forecast drops on the track key. With a
    continuous trigger this would be dropDuplicatesWithinWatermark;
    under AvailableNow the state is bounded by the drained backlog."""
    return stream.dropDuplicates(keys or TRACK_KEYS)


def run_available_now(
    stream: DataFrame,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
) -> None:
    """Drain all pending drops through ``batch_fn`` exactly once, then
    stop — the idempotent re-skin of the reference's cron re-run."""
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(
    stream: DataFrame,
    time_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark — the
    late-data-tolerant aggregation shape (§2.10). Under AvailableNow
    the watermark only bounds state; with a continuous trigger it also
    finalizes windows ``watermark_delay`` after their close, dropping
    later arrivals. Emits (window_start, event_type, n)."""
    from pyspark.sql import functions as F

    return (
        stream.withWatermark(time_col, watermark_delay)
        .groupBy(
            F.window(time_col, window_duration).alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_event_rollups(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Event-time SESSION windows with a watermark (§2.10): Spark's
    native session_window merges events whose gap to the session end
    is < ``gap`` (an event landing exactly at the end opens a NEW
    session — the window end is exclusive), the streaming twin of the
    batch lag+running-sum sessionization. State per open session is
    bounded by the watermark. Emits (user_id, session_start, n_events,
    total_value_cents, duration_s)."""
    from pyspark.sql import functions as F

    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), gap).alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 100.0)
            .cast("long")
            .alias("total_value_cents"),
            (
                F.unix_timestamp(F.max("ts"))
                - F.unix_timestamp(F.min("ts"))
            ).alias("duration_s"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value_cents",
            "duration_s",
        )
    )


def sliding_event_counts(
    stream: DataFrame,
    time_col: str = "ts",
    window_duration: str = "1 hour",
    slide_duration: str = "30 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Event-time SLIDING-window counts with a watermark: each event
    lands in window_duration/slide_duration overlapping windows (2
    here), the hopping-window smoothing every monitoring pipeline
    ships. State is bounded by the watermark exactly as in the
    tumbling case — only windows newer than (max event time - delay)
    stay open. Emits (window_start, event_type, n)."""
    from pyspark.sql import functions as F

    return (
        stream.withWatermark(time_col, watermark_delay)
        .groupBy(
            F.window(time_col, window_duration, slide_duration).alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )

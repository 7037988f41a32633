"""Parquet table loaders for the synthetic benchmark tables.

The driver provides TPC-H-ish tables plus ``events`` (stream-shaped),
``documents`` (text corpus) and ``embeddings`` (vector column) under
``/root/testdata/sf*/``. Columns/pruning are left to Catalyst: callers
``select`` what they need and the parquet scan prunes (verify with
``.explain`` → ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always arrive broadcast at a join.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "customer", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    # data-axis scaling tier: an '@xN' suffix on sf_dir amplifies the
    # table N× in-engine (sources/amplify.py) — measurement tooling
    # for scaling_curve.py; the correctness driver passes plain dirs.
    from ibf_typhoon_data_pipeline_spark.sources.amplify import (
        amplify_table,
        split_amplified,
    )

    sf_dir, amp_n = split_amplified(sf_dir)
    # oracle parity requires UTC timestamp rendering; the correctness
    # driver builds a PLAIN session (machine TZ), so pin it at runtime
    # here — the choke point every timestamped query passes through
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet is TIMESTAMP(NANOS); a session built without
        # our factory (e.g. the correctness driver's) rejects it unless
        # this runtime-settable legacy conf is on.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): with nanosAsLong it scans
    # as long nanos — convert to a µs timestamp (identical to DuckDB's
    # internal truncation). Floor division is exact for positive epochs.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: epoch-nanos (~1.7e18) overflows the
        # 53-bit double mantissa that float division would route through
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        # newer readers surface TIMESTAMP(NANOS) as µs-truncated
        # TIMESTAMP_NTZ instead of honoring nanosAsLong; watermarks and
        # time windows require TIMESTAMP (LTZ). Session TZ is pinned
        # UTC above, so this cast relabels the same wall-clock instant
        # and every downstream epoch/format expression is unchanged.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return amplify_table(df, name, amp_n)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in (names or TABLES)]

"""Tracked persists for DataFrames that outlive their builder.

Some operators persist an intermediate that feeds multiple branches of
the RETURNED plan (dedup shingle/signature tables, the model-fit
frames): the builder cannot unpersist before the caller has consumed
the plan, but a long-lived session re-invoking those builders would
accumulate caches. Builders register such persists here; orchestration
paths (bench loops, pipelines) call release_caches() after their
action — the repo's unpersist-in-orchestration invariant with the
bookkeeping in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED: list[DataFrame] = []


def _enable_cached_plan_aqe(df: DataFrame) -> None:
    """Engine policy: let AQE re-partition the output of cached plans
    (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`,
    default false). With the default, every shuffle UNDER a persist()
    runs at the session's full `spark.sql.shuffle.partitions` with no
    runtime coalescing — in an untuned session (200 partitions) the
    iterative graph plans pay 200-task stages per superstep over
    kilobyte partitions (measured: graph_triangle_count 27 s → 2.3 s
    at sf0.01 with this one conf). Runtime-settable; pinned here so
    every persist-using plan gets it regardless of session factory,
    mirroring how sources.tables.load_table pins nanosAsLong.

    Gated on the session actually being over-partitioned (> 64
    shuffle partitions): in a tuned 32-partition session there is
    nothing for AQE to coalesce, and letting it re-plan cached graph
    frames measurably HURTS the supersteps (label_propagation 5.0 →
    6.1 s at sf0.1/local[32], A/B 2026-08-15) — the re-planned cached
    output drops below the loop's useful parallelism. The pin is a
    fix for kilobyte-partition fan-out, so apply it only where that
    fan-out exists."""
    try:
        conf = df.sparkSession.conf
        # Two-way: follow the CURRENT session tuning. A one-way pin
        # would leak 'true' from an earlier over-partitioned window
        # into a later tuned one (label_propagation 5.0 → 6.1 s when
        # the re-planned cached output drops below the loop's useful
        # parallelism) — so a <=64-partition session actively resets.
        conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true"
            if int(conf.get("spark.sql.shuffle.partitions", "200")) > 64
            else "false",
        )
    except Exception:
        pass  # conf became static in some future build: keep working


def persist_tracked(df: DataFrame) -> DataFrame:
    _enable_cached_plan_aqe(df)
    df = df.persist()
    _CACHED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame (e.g. the survivor of an
    iterative loop that manages its own in-flight persists) so
    release_caches() frees it — without re-calling persist()."""
    _enable_cached_plan_aqe(df)
    _CACHED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns the count."""
    n = len(_CACHED)
    for df in _CACHED:
        df.unpersist()
    _CACHED.clear()
    return n

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


def persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame (e.g. the survivor of an
    iterative loop that manages its own in-flight persists) so
    release_caches() frees it — without re-calling persist()."""
    _CACHED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns the count."""
    n = len(_CACHED)
    for df in _CACHED:
        df.unpersist()
    _CACHED.clear()
    return n

"""Skew handling for heavy-hitter equi-joins (SURVEY §4 physical
strategy: "skewed keys → salting or AQE skew-join").

AQE's skew-join splitting (enabled in session.py) handles sort-merge
joins automatically; explicit salting is the knob for the cases AQE
can't touch — aggregation hotspots and broadcast-ineligible build
sides. ``salted_join`` implements the classic scheme: explode the
small side S ways, scatter the big side's hot keys across the S
replicas with a deterministic salt, join on (key, salt). Results are
identical to the unsalted join (tested); the shuffle's largest
partition shrinks by ~S for the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a NARROW scan up to the session's
    parallelism — the small-file analog of skew handling. A tiny
    parquet file arrives as one partition, and any per-row-expensive
    stage downstream (pair scoring after a broadcast join, shingling
    before the first shuffle) then runs on ONE core (measured: the
    whole IVF pair space single-threaded at sf0.1). No-op when the
    scan is already at least as wide as the target, so at production
    scale — where inputs span many files — this costs nothing."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``: the salt is a
    deterministic hash of the whole big-side row (monotonically_
    increasing_id would break retry idempotence), so each hot key's
    rows spread across ``n_salts`` shuffle partitions; ``small`` is
    exploded once per salt value. Use when ``small`` is too large to
    broadcast but far smaller than ``big``."""
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)),
    )
    small_exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_exploded, [key, "__salt"], how)
    return out.drop("__salt")

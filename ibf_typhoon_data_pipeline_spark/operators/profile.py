"""Table profiling — the data-quality primitive a training-data
pipeline runs before anything else: per-column null rate, distinct
count, numeric extrema. One pass over the table (all measures are
partial-aggregating); output is one row per column (long form — easy
to diff between snapshots for schema/distribution drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    min_val, max_val) — min/max stringified so heterogeneous column
    types stack in one long frame. ``exact_distinct=False`` switches
    to approx_count_distinct (HLL) — the right default at 100 TB."""
    cols = columns or df.columns
    distinct_fn = (
        F.countDistinct if exact_distinct else F.approx_count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            distinct_fn(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"__null_{c}").alias("n_null"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_val"),
                        F.col(f"__max_{c}").alias("max_val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")

"""Table profiling — the data-quality primitive a training-data
pipeline runs before anything else: per-column null rate, distinct
count, numeric extrema. One pass over the table; null/min/max partial-
aggregate map-side. NOTE: the default exact countDistinct plans
multi-distinct aggregates through an Expand (rows × (n_aggs + 1)) —
fine for snapshots, but at 100 TB pass ``exact_distinct=False`` for
the HLL sketch, which restores full partial aggregation. Output is one
row per column (long form — easy to diff between snapshots for
schema/distribution drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FLOAT_TYPES = {"double", "float"}


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    min_val, max_val) — min/max stringified so heterogeneous column
    types stack in one long frame. Floating columns are printf'd with
    %.6f: a plain string cast is engine-specific (Spark prints
    9.0E-4 where other engines print 0.0009), which would make
    profiles non-portable and break oracle comparisons."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    distinct_fn = (
        F.countDistinct if exact_distinct else F.approx_count_distinct
    )

    def _stringify(c, expr):
        if dtypes.get(c) in FLOAT_TYPES:
            return F.format_string("%.6f", expr)
        return expr.cast("string")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        # count(when(...)) not sum(cast): count is 0 on an empty
        # table where sum degenerates to NULL
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            distinct_fn(F.col(c)).alias(f"__nd_{c}"),
            _stringify(c, F.min(F.col(c))).alias(f"__min_{c}"),
            _stringify(c, F.max(F.col(c))).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    # backticks: a profiled column named `a.b` must not parse as a
    # struct-field access
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"`__null_{c}`").alias("n_null"),
                        F.col(f"`__nd_{c}`").alias("n_distinct"),
                        F.col(f"`__min_{c}`").alias("min_val"),
                        F.col(f"`__max_{c}`").alias("max_val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")

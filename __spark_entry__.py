"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ibf_typhoon_data_pipeline_spark.plans —
each entry pairs a Spark DataFrame plan with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ibf_typhoon_data_pipeline_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the §7.2 end-to-end slice — 52-member tracks → Holland
    windfield → municipality hazard → damage → ensemble exceedance
    triggers (SURVEY.md §7.2). One DataFrame DAG, zero UDFs."""
    return plans.QUERIES["tc_trigger_ladder"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries get the weaker
    rows-only check."""
    return plans.oracle_sql_map()

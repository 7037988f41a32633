"""Registry pairing every named query plan with its DuckDB oracle SQL.

Each entry is the unit of the correctness gate: the driver runs the
Spark plan and the oracle SQL side-by-side at sf0.01 and compares
row counts, schema, and an order-insensitive value hash
(/root/repo/__spark_entry__.py contract).

Parity rules baked into every entry:
- alias each computed column identically in Spark and SQL;
- round floating-point outputs (sums → 2dp, ratios/sims → 6dp,
  distances → 4dp) so libm/summation-order ulps can't flip the hash;
- deterministic tiebreakers on every window/top-k.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame plan."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle}

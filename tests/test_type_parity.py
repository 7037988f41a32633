"""Engine-TYPE parity sweep over every oracle (VERDICT r3 item #2).

The a5_a6 red row survived three rounds because DuckDB types
``sum(CASE WHEN .. THEN 1 ELSE 0 END)`` as HUGEINT, which exports to
Arrow as decimal128(38,0) and to pandas as float64 — so the driver's
value hash saw ``1.0`` where Spark emitted ``1`` while row count and
name-based schema still matched.  The local twin uses ``fetchall()``,
whose Python ints masked the class mismatch.

This sweep closes that blind spot without executing anything: DuckDB's
``DESCRIBE SELECT ...`` binds and types the query (no run), and the
Spark plan's ``.schema`` is available without an action.  Two rules,
both of which bit for real:

- no oracle column may be HUGEINT / UHUGEINT / DECIMAL (those export
  as decimal128 or float64 regardless of value);
- a column that is integral on one engine must be integral on the
  other (the driver's hash distinguishes ``1`` from ``1.0``).
"""

from __future__ import annotations

import pytest

from ibf_typhoon_data_pipeline_spark import plans
from tests.oracle_util import SF_ORACLE, duck_con

ORACLE_QUERIES = sorted(
    name for name, qd in plans.QUERIES.items() if qd.oracle is not None
)

_BANNED_SUBSTR = ("HUGEINT", "DECIMAL")
_DUCK_INTEGRAL = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
}
_DUCK_FLOATY = {"FLOAT", "DOUBLE", "REAL"}
_SPARK_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOATY = {"float", "double"}


@pytest.fixture(scope="module")
def duck():
    con = duck_con()
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_arrow_type_classes(spark, duck, name):
    qd = plans.QUERIES[name]
    sql = qd.oracle_text()
    desc = duck.execute(f"DESCRIBE {sql}").fetchall()
    duck_types = {row[0]: row[1].upper() for row in desc}

    failures = []
    for col, dtype in duck_types.items():
        if any(b in dtype for b in _BANNED_SUBSTR):
            failures.append(
                f"{col}: DuckDB types it {dtype} — exports as "
                f"decimal128/float64; CAST it to BIGINT/DOUBLE in the oracle"
            )

    spark_types = {
        f.name: f.dataType.simpleString()
        for f in qd.fn(spark, SF_ORACLE).schema.fields
    }
    for col, stype in spark_types.items():
        dtype = duck_types.get(col)
        if dtype is None:
            continue  # name mismatches are the parity twin's job
        if stype in _SPARK_INTEGRAL and dtype in _DUCK_FLOATY:
            failures.append(
                f"{col}: Spark {stype} vs DuckDB {dtype} — driver hash "
                f"sees 1 vs 1.0"
            )
        if stype in _SPARK_FLOATY and dtype in _DUCK_INTEGRAL:
            failures.append(
                f"{col}: Spark {stype} vs DuckDB {dtype} — driver hash "
                f"sees 1.0 vs 1"
            )

    assert not failures, f"{name}: " + "; ".join(failures)

"""Spark 4 procedural-SQL surfaces beyond the two catalog entries
(`sql_session_variables`, `sql_scripting_threshold_search`):
EXECUTE IMMEDIATE with USING parameters and INTO variable capture
(SPARK-44801), and scripting FOR loops over an ordered result set
(SPARK-48338). Each result is cross-checked against a DuckDB twin on
the same parquet slice — the surfaces are session/driver features, so
the oracle is the equivalent declarative query, value-for-value.
"""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.01"
ORDERS = f"{SF}/orders.parquet"


def test_execute_immediate_using_into(spark):
    spark.read.parquet(ORDERS).createOrReplaceTempView("ei_orders")
    # INTO captures the scalar into a session variable; USING binds a
    # positional parameter into the statement text at execution time
    spark.sql("DECLARE OR REPLACE VARIABLE n_f BIGINT")
    spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT count(*) FROM ei_orders WHERE o_orderstatus = ?' "
        "INTO n_f USING 'F'"
    )
    got = spark.sql("SELECT n_f AS n").collect()[0]["n"]
    want = duckdb.sql(
        f"SELECT count(*) FROM '{ORDERS}' WHERE o_orderstatus = 'F'"
    ).fetchone()[0]
    assert got == want and got > 0


def test_scripting_for_loop_over_resultset(spark):
    spark.read.parquet(ORDERS).createOrReplaceTempView("for_orders")
    # FOR iterates the per-priority counts in ORDER BY order; the
    # positional weight makes the accumulated checksum order-sensitive,
    # so a wrong iteration order cannot pass
    row = spark.sql(
        """
        BEGIN
          DECLARE acc BIGINT DEFAULT 0;
          DECLARE i BIGINT DEFAULT 0;
          FOR r AS SELECT o_orderpriority AS p, count(*) AS n
                   FROM for_orders GROUP BY 1 ORDER BY 1 DO
            SET i = i + 1;
            SET acc = acc + i * r.n;
          END FOR;
          SELECT acc AS checksum, i AS n_groups;
        END
        """
    ).collect()[0]
    want = duckdb.sql(
        f"""
        SELECT CAST(sum(i * n) AS BIGINT), CAST(max(i) AS BIGINT)
        FROM (
          SELECT row_number() OVER (ORDER BY o_orderpriority) AS i, n
          FROM (SELECT o_orderpriority, count(*) AS n
                FROM '{ORDERS}' GROUP BY 1)
        )
        """
    ).fetchone()
    assert (row["checksum"], row["n_groups"]) == want
    assert row["n_groups"] == 5


def test_sql_udf_body_inlines_to_expressions(spark):
    """The scalar SQL-UDF entry's scale claim: CREATE FUNCTION bodies
    are inlined by Catalyst into the expression tree — no UDF
    evaluation boundary of any kind survives into the physical plan,
    so the formula library costs the same as hand-written
    expressions at any scale."""
    from ibf_typhoon_data_pipeline_spark import plans

    df = plans.QUERIES["sql_udf_scalar_library"].fn(
        spark, "/root/testdata/sf0.001"
    )
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # genuine UDF-boundary tokens only (ADVICE r9): the bare substring
    # "Invoke" also matches StaticInvoke/Invoke expressions that benign
    # built-ins (string casts, datetime helpers) compile to, which
    # would fail this pin for a non-UDF reason after a harmless edit.
    for tok in ("PythonUDF", "BatchEvalPython", "ScalaUDF", "SQLFunction"):
        assert tok not in plan, f"UDF boundary {tok} leaked into plan"
    assert "HashAggregate" in plan
    # the body really reached the optimizer as plain math (the
    # physical toString elides long projection lists, so read the
    # optimized logical plan for the expression check)
    assert "POW(" in qe.optimizedPlan().toString().upper()

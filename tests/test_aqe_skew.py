"""AQE skew-join: with adaptive execution on, a pathologically skewed
join key must be split at RUNTIME (skew=true on the SMJ) — the
engine-native alternative to the manual salting j16 demonstrates.
Values still match an exact computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches


def test_aqe_splits_skewed_join(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        # forbid broadcast so the join MUST shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # 95% of left rows share one key; right side is uniform
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, 7)
            .otherwise(F.col("id") % 100)
            .cast("long")
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(100).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 3).alias("w"),
        )
        joined = left.join(right, "k").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("v") + F.col("w")).cast("long").alias("s"),
        )
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]

        # exact expectation: every left row matches exactly one right
        # row (k in 0..99 by construction)
        import duckdb

        con = duckdb.connect()
        want = con.execute(
            """
            WITH l AS (
              SELECT CASE WHEN i % 20 <> 0 THEN 7 ELSE i % 100 END AS k,
                     i AS v
              FROM range(200000) t(i)
            ), r AS (SELECT i AS k, i * 3 AS w FROM range(100) t(i))
            SELECT CAST(count(*) AS BIGINT),
                   CAST(sum(l.v + r.w) AS BIGINT)
            FROM l JOIN r ON r.k = l.k
            """
        ).fetchone()
        assert (rows[0]["n"], rows[0]["s"]) == tuple(want)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_windfield_skewgrid_splits(spark):
    """The production-shaped twin of the synthetic case above
    (VERDICT r8 item 6): tc_windfield_skewgrid packs ~84% of its
    centroids into ONE 2° grid-join cell and leaves the pair join to
    AQE. On the degraded shuffle path (broadcast forbidden — the plan
    a multi-event 100 TB replay gets once the track batch outgrows
    the threshold) the dense cell is a pathologically skewed shuffle
    partition and AQE must split it at runtime, with values identical
    to the default (broadcast) plan."""
    SF = "/root/testdata/sf0.01"
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }

    def run():
        df = plans.QUERIES["tc_windfield_skewgrid"].fn(spark, SF)
        rows = sorted(tuple(r) for r in df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        release_caches()
        return rows, plan

    try:
        base_rows, _ = run()
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        rows, plan = run()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "dense-cell partition was not skew-split on the forced "
            "shuffle path:\n" + plan[:3000]
        )
        assert rows == base_rows, (
            "values changed on the skew-split shuffle path"
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

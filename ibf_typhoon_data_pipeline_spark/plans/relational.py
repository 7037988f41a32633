"""Relational operator catalog (SURVEY.md §2.2–2.8) instantiated on
the driver's synthetic tables, each paired with its DuckDB oracle.

Every query is the Spark-first re-expression of a concrete reference
operator (file:line cited per entry). The TPC-H-ish tables stand in
for the domain tables at the correctness gate; the same operator
functions power the domain pipeline in plans/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.functions.geo import haversine_km
from ibf_typhoon_data_pipeline_spark.operators.aggregates import (
    exceedance_probability,
    flag_ratio,
    quantile_ladder,
    zonal_stats,
)
from ibf_typhoon_data_pipeline_spark.operators.interpolation import interpolate_series
from ibf_typhoon_data_pipeline_spark.operators.joins import complete_pairs, semi_membership
from ibf_typhoon_data_pipeline_spark.operators.windows import (
    dedup_keep_max,
    lag_diff,
    top1_per_group,
)
from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- Q1 flagship
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           -- l_quantity is integral: the sum is exact in double
           round(sum(l_quantity), 0)                 AS sum_qty,
           CAST(round(sum(l_extendedprice) * 100.0) AS BIGINT)
                                                     AS sum_base_price_cents,
           round(avg(l_quantity), 4)                 AS avg_qty,
           round(avg(l_extendedprice), 4)            AS avg_price,
           count(*)                                  AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship scan→filter→agg (A1/A3 shape, forecast_process.py:1590-1594)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 0).alias("sum_qty"),
            F.round(F.sum("l_extendedprice") * 100.0)
            .cast("long")
            .alias("sum_base_price_cents"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# ------------------------------------------------------------ §2.2 filters
@register(
    "a1_threshold_wind_agg",
    """
    SELECT l_returnflag AS group_key,
           count(*) AS value_count,
           round(max(l_extendedprice), 2) AS v_max
    FROM lineitem WHERE l_quantity > 30
    GROUP BY l_returnflag
    """,
    doc="A1+P4: threshold filter then per-group count/max "
        "(forecast_process.py:1587-1594)",
)
def a1_threshold_wind_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 30)
        .groupBy(F.col("l_returnflag").alias("group_key"))
        .agg(
            F.count("*").alias("value_count"),
            F.round(F.max("l_extendedprice"), 2).alias("v_max"),
        )
    )


@register(
    "p2_extent_distinct",
    """
    SELECT user_id FROM events
    GROUP BY user_id
    HAVING min(value) < 5 AND max(value) > 400
    """,
    doc="P2: per-entity extent (min/max) then bbox-intersection filter "
        "then distinct ids (forecast_process.py:197-213)",
)
def p2_extent_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.min("value").alias("__mn"), F.max("value").alias("__mx"))
        .filter((F.col("__mn") < 5) & (F.col("__mx") > 400))
        .select("user_id")
    )


@register(
    "p10_p11_null_and_pattern",
    """
    SELECT event_id, event_type FROM events
    WHERE value IS NOT NULL AND regexp_matches(event_type, '^[cv]')
    """,
    doc="P10 notnull + P11 regex name filter (forecast_process.py:917,291)",
)
def p10_p11_null_and_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").isNotNull() & F.col("event_type").rlike("^[cv]")
    ).select("event_id", "event_type")


@register(
    "p12_conditional_override",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 400000 THEN 0.0
                ELSE round(o_totalprice * 0.001, 6) END AS damage_predicted
    FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="P12: when/otherwise damage-radius override "
        "(forecast_process.py:527)",
)
def p12_conditional_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 400000, F.lit(0.0))
        .otherwise(F.round(F.col("o_totalprice") * 0.001, 6))
        .alias("damage_predicted"),
    )


# ------------------------------------------------------------- §2.3 joins
@register(
    "j3_dim_rollup",
    """
    SELECT r_name, count(*) AS cust_count,
           CAST(round(sum(c_acctbal) * 100.0) AS BIGINT) AS total_acctbal_cents
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="J3/J9: chained broadcast dimension joins + rollup "
        "(forecast_process.py:909-915, run_model_V2.R:131-139)",
)
def j3_dim_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("cust_count"),
            F.round(F.sum("c_acctbal") * 100.0)
            .cast("long")
            .alias("total_acctbal_cents"),
        )
    )


@register(
    "j10_complete_pairs",
    """
    WITH spine AS (
      SELECT et.event_type, b.bucket
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN (SELECT DISTINCT user_id % 10 AS bucket FROM events) b
    ), agg AS (
      SELECT event_type, user_id % 10 AS bucket,
             count(*) AS n_events,
             CAST(round(sum(value) * 100.0) AS BIGINT) AS total_value_cents
      FROM events GROUP BY 1, 2
    )
    SELECT s.event_type, s.bucket,
           coalesce(a.n_events, 0) AS n_events,
           coalesce(a.total_value_cents, 0) AS total_value_cents
    FROM spine s LEFT JOIN agg a
      ON s.event_type = a.event_type AND s.bucket = a.bucket
    """,
    doc="J10 tidyr::complete — fill missing (group × key) pairs with "
        "zeros (run_model_V2.R:196-211); the system's only cross join",
)
def j10_complete_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "bucket", F.col("user_id") % 10
    )
    agg = ev.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value") * 100.0).cast("long").alias("total_value_cents"),
    )
    return complete_pairs(
        agg, "event_type", ["bucket"], {"n_events": 0, "total_value_cents": 0}
    )


@register(
    "j11_nearest_supplier",
    """
    WITH c AS (
      SELECT c_custkey,
             (c_custkey % 120) * 0.1 AS lat,
             ((c_custkey * 7) % 240) * 0.1 + 100 AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             (s_suppkey % 120) * 0.1 AS lat,
             ((s_suppkey * 13) % 240) * 0.1 + 100 AS lon
      FROM supplier
    ), pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             round(2 * 6367.0 * asin(sqrt(
               pow(sin(radians(s.lat - c.lat) / 2), 2)
               + cos(radians(c.lat)) * cos(radians(s.lat))
                 * pow(sin(radians(s.lon - c.lon) / 2), 2)
             )), 4) AS nn_dist_km
      FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey, nn_dist_km FROM (
      SELECT *, row_number() OVER (
        PARTITION BY c_custkey ORDER BY nn_dist_km, s_suppkey
      ) AS rn FROM pairs
    ) WHERE rn = 1
    """,
    doc="J11 k=1 spatial nearest-neighbor join via haversine + top-1 "
        "window (forecast_process.py:691-734; O(n·m) python loop in "
        "the reference → broadcast join + min-by here)",
)
def j11_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 120) * 0.1).alias("lat"),
        (((F.col("c_custkey") * 7) % 240) * 0.1 + 100).alias("lon"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") % 120) * 0.1).alias("lat_s"),
        (((F.col("s_suppkey") * 13) % 240) * 0.1 + 100).alias("lon_s"),
    )
    # K4-style bbox tier (plans/typhoon.py muni join): suppliers
    # explode to their 1-degree cell plus the 8 neighbors (9k rows,
    # broadcast), customers probe their own cell — ~30 candidates
    # instead of all m. A tier-1 minimum <= 108 km is PROVABLY the
    # global minimum (any supplier outside the 3x3 box is >= one full
    # cell away: >= 111.1 km in lat, >= 108.7 km in lon at lat <= 12),
    # so only customers failing the bound (or finding no candidate)
    # fall back to the exact full broadcast scan. The tier choice
    # never changes values — both tiers take exact minima over sets
    # containing the true nearest — so the naive cross-join oracle is
    # unchanged. min(struct(dist, key)) keeps map-side partial agg
    # and oracle tiebreak order (15M pairs -> ~0.5M; 7.9 s -> ~1 s).
    sc = s.select(
        "s_suppkey", "lat_s", "lon_s",
        F.explode(
            F.array(*[F.lit(i) for i in (-1, 0, 1)])
        ).alias("__dy"),
    ).select(
        "s_suppkey", "lat_s", "lon_s", "__dy",
        F.explode(
            F.array(*[F.lit(i) for i in (-1, 0, 1)])
        ).alias("__dx"),
    ).select(
        "s_suppkey", "lat_s", "lon_s",
        (F.floor("lat_s") + F.col("__dy")).cast("long").alias("__cy"),
        (F.floor("lon_s") + F.col("__dx")).cast("long").alias("__cx"),
    )
    cc = c.select(
        "c_custkey", "lat", "lon",
        F.floor("lat").cast("long").alias("__cy"),
        F.floor("lon").cast("long").alias("__cx"),
    )

    def _best(pairs):
        return pairs.groupBy("c_custkey").agg(
            F.min(F.struct("nn_dist_km", "s_suppkey")).alias("__best")
        )

    dist = lambda df: df.withColumn(  # noqa: E731
        "nn_dist_km",
        F.round(
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("lat_s"), F.col("lon_s")
            ),
            4,
        ),
    )
    t1 = _best(dist(cc.join(F.broadcast(sc), ["__cy", "__cx"])))
    safe = t1.filter(F.col("__best.nn_dist_km") <= 108.0)
    unsafe = c.join(
        safe.select("c_custkey"), "c_custkey", "left_anti"
    )
    t2 = _best(dist(unsafe.join(F.broadcast(s))))
    best = safe.unionByName(t2)
    return best.select(
        "c_custkey",
        F.col("__best.s_suppkey").alias("s_suppkey"),
        F.col("__best.nn_dist_km").alias("nn_dist_km"),
    )


@register(
    "j12_semi_membership",
    """
    SELECT c_custkey,
           c_custkey IN (SELECT o_custkey FROM orders) AS has_order
    FROM customer
    """,
    doc="J12 membership recode ≡ left-semi flag "
        "(forecast_process.py:1081-1082)",
)
def j12_semi_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return semi_membership(c, o, "c_custkey", "has_order").select(
        "c_custkey", "has_order"
    )


# -------------------------------------------------------- §2.4 aggregations
@register(
    "a4_flag_ratio",
    """
    SELECT n_name, round(avg(CASE WHEN c_acctbal < 0 THEN 1.0 ELSE 0.0 END), 6)
           AS prob_negative
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="A4 prob_within_50km shape: fraction of rows meeting a predicate "
        "per key (forecast_process.py:529-535)",
)
def a4_flag_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    out = flag_ratio(joined, ["n_name"], F.col("c_acctbal") < 0, "prob_negative")
    return out.withColumn("prob_negative", F.round("prob_negative", 6))


@register(
    "a7_exceedance_trigger",
    """
    WITH totals AS (
      SELECT user_id % 16 AS ens_id, sum(value) AS total
      FROM events GROUP BY 1
    )
    SELECT round(avg(CASE WHEN total > 3000 THEN 1.0 ELSE 0.0 END), 6) AS prob_gt_3000,
           round(avg(CASE WHEN total > 3300 THEN 1.0 ELSE 0.0 END), 6) AS prob_gt_3300,
           round(avg(CASE WHEN total > 3600 THEN 1.0 ELSE 0.0 END), 6) AS prob_gt_3600,
           avg(CASE WHEN total > 3300 THEN 1.0 ELSE 0.0 END) >= 0.5 AS triggered
    FROM totals
    """,
    doc="A7/A13 ensemble exceedance-probability trigger ladder "
        "(forecast_process.py:1262-1266, settings.py:61-145)",
)
def a7_exceedance_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("ens_id", F.col("user_id") % 16)
    probs = exceedance_probability(
        ev, [], ["ens_id"], "value", [3000, 3300, 3600]
    )
    return probs.select(
        F.round("prob_gt_3000", 6).alias("prob_gt_3000"),
        F.round("prob_gt_3300", 6).alias("prob_gt_3300"),
        F.round("prob_gt_3600", 6).alias("prob_gt_3600"),
        (F.col("prob_gt_3300") >= 0.5).alias("triggered"),
    )


@register(
    "a9_dedup_keep_last",
    """
    SELECT o_custkey, o_orderstatus, o_orderkey,
           o_totalprice AS damage_predicted
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey, o_orderstatus
        ORDER BY o_totalprice DESC, o_orderkey DESC
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
    doc="A9/W6 dedup-keep-last ≡ max-by with deterministic tiebreak "
        "(forecast_process.py:544,1241)",
)
def a9_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.windows import (
        dedup_keep_max_agg,
    )

    o = _t(spark, sf_dir, "orders")
    out = dedup_keep_max_agg(
        o,
        ["o_custkey", "o_orderstatus"],
        "o_totalprice",
        tiebreakers=["o_orderkey"],
    )
    return out.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderkey",
        F.col("o_totalprice").alias("damage_predicted"),
    )


@register(
    "a11_a12_zonal_stats",
    """
    WITH cells AS (
      SELECT CAST(user_id % 10 AS INTEGER) AS lat,
             CAST((user_id // 10) % 10 AS INTEGER) AS lon,
             date_trunc('day', ts) AS t, value AS mm
      FROM events
    ), reduced AS (
      SELECT lat, lon, t, median(mm) AS mm FROM cells GROUP BY 1, 2, 3
    ), zoned AS (
      SELECT concat(CAST(lat // 5 AS VARCHAR), '_', CAST(lon // 5 AS VARCHAR)) AS zone,
             t, avg(mm) AS zone_mean
      FROM reduced GROUP BY 1, 2
    )
    SELECT zone, round(max(zone_mean), 6) AS max_mm FROM zoned GROUP BY zone
    """,
    doc="A11 ensemble-median + A12 zonal mean→max "
        "(Rainfall_data.py:80,105-122); median reduce ordered BEFORE "
        "the zone join — the manual agg-pushdown of rd:80",
)
def a11_a12_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.select(
        (F.col("user_id") % 10).cast("int").alias("lat"),
        ((F.col("user_id") / 10).cast("long") % 10).cast("int").alias("lon"),
        F.date_trunc("day", "ts").alias("t"),
        F.col("value").alias("mm"),
    )
    cell_zone = (
        cells.select("lat", "lon")
        .distinct()
        .withColumn(
            "zone",
            F.concat(
                (F.col("lat") / 5).cast("int").cast("string"),
                F.lit("_"),
                (F.col("lon") / 5).cast("int").cast("string"),
            ),
        )
    )
    out = zonal_stats(cells, cell_zone, "zone", "t", "mm", reduce_members=True)
    return out.select("zone", F.round("max_mm", 6).alias("max_mm"))


@register(
    "a14_quantile_ladder",
    """
    WITH joined AS (
      SELECT n_name, c_acctbal FROM customer
      JOIN nation ON c_nationkey = n_nationkey
    ), per_key AS (
      SELECT n_name,
             round(quantile_cont(c_acctbal, 0.5), 6)  AS q50,
             round(quantile_cont(c_acctbal, 0.8), 6)  AS q80,
             round(quantile_cont(c_acctbal, 0.95), 6) AS q95
      FROM joined GROUP BY n_name
    ), total AS (
      SELECT 'TOTAL' AS n_name,
             round(quantile_cont(c_acctbal, 0.5), 6)  AS q50,
             round(quantile_cont(c_acctbal, 0.8), 6)  AS q80,
             round(quantile_cont(c_acctbal, 0.95), 6) AS q95
      FROM joined
    )
    SELECT * FROM per_key UNION ALL SELECT * FROM total
    """,
    doc="A14 quantile ladder + TOTAL row — the reference's only "
        "grouping-sets construct (lib_r/damage_probability.R:44-65,85-87)",
)
def a14_quantile_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name", "c_acctbal"
    )
    out = quantile_ladder(joined, ["n_name"], "c_acctbal", [0.5, 0.8, 0.95])
    return out.select(
        "n_name",
        F.round("q50", 6).alias("q50"),
        F.round("q80", 6).alias("q80"),
        F.round("q95", 6).alias("q95"),
    )


# ------------------------------------------------------------ §2.5 windows
@register(
    "w1_lag_diff",
    """
    SELECT event_id, user_id,
           value - lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS value_delta
    FROM events
    """,
    doc="W1 time_step = value − lag(value) per track "
        "(tc_tracks_forecast.py:322)",
)
def w1_lag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value", 1).over(w)).alias("value_delta"),
    )


@register(
    "w2_lead_hours",
    """
    SELECT event_id,
           date_diff('second', ts, lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           )) / 3600.0 AS dt_hours
    FROM events
    """,
    doc="W2 lead-based kinematics: forward Δt per track "
        "(lib_r/prepare_typhoon_input.R:414-443)",
)
def w2_lead_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        (
            (F.unix_timestamp(F.lead("ts", 1).over(w)) - F.unix_timestamp("ts"))
            / 3600.0
        ).alias("dt_hours"),
    )


@register(
    "w5_ntile_priority",
    """
    SELECT o_orderkey, CAST(ntile(5) OVER (
      ORDER BY o_totalprice, o_orderkey
    ) AS INTEGER) AS priority_index
    FROM orders
    """,
    doc="W5 ntile(5) priority ranking (run_model_V2.R:78-83). The "
        "reference ranks a municipality-sized frame, but orders is "
        "fact-sized here, so the plan avoids the global ntile window "
        "(single-partition sort): a two-pass global row number via "
        "operators.windows.global_running_sum (range-partitioned "
        "local cumsum + broadcast offsets), then the SQL-standard "
        "ntile bucket formula — first n%k buckets hold ceil(n/k) "
        "rows — in exact integer arithmetic. Values identical to the "
        "plain ntile oracle for any range split.",
)
def w5_ntile_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.windows import (
        global_running_sum,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).withColumn("__one", F.lit(1).cast("long"))
    rn = global_running_sum(
        o,
        order_cols=["o_totalprice", "o_orderkey"],
        value_col="__one",
        out_col="__rn",
    )
    n = rn.agg(F.count("*").cast("long").alias("__n"))
    # SQL ntile(k): q = n div k, r = n mod k; buckets 1..r get q+1
    # rows, buckets r+1..k get q. Pure integer branches — no floats.
    return (
        rn.crossJoin(F.broadcast(n))
        .selectExpr(
            "o_orderkey",
            """CAST(CASE
                 WHEN __rn <= (__n % 5) * (__n DIV 5 + 1)
                 THEN (__rn + (__n DIV 5)) DIV (__n DIV 5 + 1)
                 ELSE (__n % 5) + (__rn - (__n % 5) * (__n DIV 5 + 1)
                                   + (__n DIV 5) - 1) DIV (__n DIV 5)
               END AS INTEGER) AS priority_index""",
        )
    )


@register(
    "o2_top1_per_group",
    """
    SELECT o_custkey, o_orderkey AS top_orderkey FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
    doc="O2 top-1 by sort per group (forecast_process.py:692-693)",
)
def o2_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    out = top1_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    )
    return out.select("o_custkey", F.col("o_orderkey").alias("top_orderkey"))


# -------------------------------------------------------- §2.7 set ops
@register(
    "u4_intersect_except",
    """
    WITH jan AS (
      SELECT o_custkey FROM orders WHERE month(o_orderdate) = 1
    ), feb AS (
      SELECT o_custkey FROM orders WHERE month(o_orderdate) = 2
    )
    SELECT o_custkey, 'intersect' AS set_op
    FROM (SELECT o_custkey FROM jan INTERSECT SELECT o_custkey FROM feb)
    UNION ALL
    SELECT o_custkey, 'except' AS set_op
    FROM (SELECT o_custkey FROM jan EXCEPT SELECT o_custkey FROM feb)
    """,
    doc="U-family completion: INTERSECT / EXCEPT (distinct semantics) "
        "- unused by the reference (SURVEY \u00a72.7 notes them free in "
        "Spark), covered here so the set-op family is complete",
)
def u4_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    jan = o.filter(F.month("o_orderdate") == 1).select("o_custkey")
    feb = o.filter(F.month("o_orderdate") == 2).select("o_custkey")
    inter = jan.intersect(feb).withColumn("set_op", F.lit("intersect"))
    diff = jan.subtract(feb).withColumn("set_op", F.lit("except"))
    return inter.unionByName(diff)


@register(
    "u2_union_parties",
    """
    WITH parties AS (
      SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind
      FROM customer
      UNION ALL
      SELECT s_name, s_acctbal, 'supplier' FROM supplier
    )
    SELECT kind, count(*) AS n,
           CAST(round(sum(acctbal) * 100.0) AS BIGINT) AS total_bal_cents
    FROM parties GROUP BY kind
    """,
    doc="U1/U2 unionByName of heterogeneous frames "
        "(xgb_model_v1.R:103, forecast_process.py:1621-1622)",
)
def u2_union_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return (
        c.unionByName(s)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("acctbal") * 100.0)
            .cast("long")
            .alias("total_bal_cents"),
        )
    )


# ---------------------------------------------------- §2.8 scalar functions
@register(
    "f1_substring_keys",
    """
    SELECT substr(concat('PH', lpad(CAST(c_custkey % 100 AS VARCHAR), 9, '0')), 1, 4)
           AS region_code,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
    doc="F1 pcode substring keys: region = first-4 of municipality code "
        "(forecast_process.py:1248-1249,1414)",
)
def f1_substring_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    pcode = F.concat(
        F.lit("PH"), F.lpad((F.col("c_custkey") % 100).cast("string"), 9, "0")
    )
    return (
        c.select(F.substring(pcode, 1, 4).alias("region_code"))
        .groupBy("region_code")
        .count()
        .withColumnRenamed("count", "n")
    )


@register(
    "f4_time_buckets",
    """
    SELECT strftime(ts, '%Y%m%d%H') AS hour_bucket, count(*) AS n,
           CAST(round(sum(value) * 100.0) AS BIGINT) AS total_value_cents
    FROM events
    WHERE CAST(strftime(ts, '%H') AS INTEGER) % 3 = 0
    GROUP BY 1
    """,
    doc="F4+P5 timestamp formatting YYYYMMDDHH + 3-hourly time-of-day "
        "filter (forecast_process.py:311,1550-1552)",
)
def f4_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.hour("ts") % 3 == 0)
        .groupBy(F.date_format("ts", "yyyyMMddHH").alias("hour_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value") * 100.0)
            .cast("long")
            .alias("total_value_cents"),
        )
    )


@register(
    "f5_lead_time_ladder",
    """
    WITH lt AS (
      SELECT greatest(
               CAST(floor(date_diff('second', o_orderdate,
                          TIMESTAMP '2001-08-01') / 3600.0) AS BIGINT) - 8,
               0) AS lead_hours
      FROM orders
    )
    SELECT CASE WHEN lead_hours > 168 THEN '168-hour-and-more'
                ELSE concat(CAST(lead_hours AS VARCHAR), '-hour') END AS lead_label,
           count(*) AS n
    FROM lt GROUP BY 1
    """,
    doc="F5 lead-time hours with −8h latency correction, clamp, and "
        "label ladder (forecast_process.py:771-806, settings.py:184-185)",
)
def f5_lead_time_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.functions.convert import (
        lead_time_hours,
        lead_time_label,
    )

    o = _t(spark, sf_dir, "orders")
    ref = F.lit("2001-08-01").cast("timestamp")
    hours = lead_time_hours(ref, F.col("o_orderdate"))
    return (
        o.select(lead_time_label(hours).alias("lead_label"))
        .groupBy("lead_label")
        .count()
        .withColumnRenamed("count", "n")
    )


@register(
    "f10_category_binning",
    """
    SELECT CASE WHEN o_totalprice <= 50000 THEN 'TD'
                WHEN o_totalprice <= 100000 THEN 'TS'
                WHEN o_totalprice <= 150000 THEN 'STS'
                WHEN o_totalprice <= 185000 THEN 'TY'
                ELSE 'STY' END AS category,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
    doc="F10 wind-category pd.cut binning (forecast_process.py:845-847)",
)
def f10_category_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cat = (
        F.when(F.col("o_totalprice") <= 50000, "TD")
        .when(F.col("o_totalprice") <= 100000, "TS")
        .when(F.col("o_totalprice") <= 150000, "STS")
        .when(F.col("o_totalprice") <= 185000, "TY")
        .otherwise("STY")
    )
    return (
        o.select(cat.alias("category"))
        .groupBy("category")
        .count()
        .withColumnRenamed("count", "n")
    )


@register(
    "f11_f13_power_law_clip",
    """
    SELECT o_orderstatus,
           round(avg(CASE WHEN o_totalprice >= 100000
                    THEN least(exp(6.80943) * pow(o_totalprice, 0.46982), 300000.0)
                    ELSE 0.0 END), 2) AS avg_affected
    FROM orders GROUP BY o_orderstatus
    """,
    doc="F11 affected-population power law + F13 clip "
        "(forecast_process.py:619-634, run_model_V2.R:174)",
)
def f11_f13_power_law_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    affected = F.when(
        F.col("o_totalprice") >= 100000,
        F.least(
            F.exp(F.lit(6.80943)) * F.pow(F.col("o_totalprice"), F.lit(0.46982)),
            F.lit(300000.0),
        ),
    ).otherwise(F.lit(0.0))
    return o.groupBy("o_orderstatus").agg(
        F.round(F.avg(affected), 2).alias("avg_affected")
    )


@register(
    "f14_greatest_across",
    """
    SELECT user_id,
           round(greatest(
             max(CASE WHEN event_type = 'click' THEN value END),
             max(CASE WHEN event_type = 'view' THEN value END),
             max(CASE WHEN event_type = 'purchase' THEN value END)
           ), 6) AS max_rain
    FROM events GROUP BY user_id
    """,
    doc="F14 row-wise max across pivoted columns — max rain over "
        "timestep columns (Rainfall_data.py:120-122)",
)
def f14_greatest_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pivoted = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", F.col("value"))).alias("__c"),
        F.max(F.when(F.col("event_type") == "view", F.col("value"))).alias("__v"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("__p"),
    )
    return pivoted.select(
        "user_id",
        F.round(F.greatest("__c", "__v", "__p"), 6).alias("max_rain"),
    )


@register(
    "f15_interpolate_gaps",
    """
    WITH masked AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
      FROM events
    ), brk AS (
      SELECT event_id, user_id, value,
        last_value(value IGNORE NULLS) OVER w_prev AS v0,
        last_value(CASE WHEN value IS NOT NULL THEN floor(epoch(ts)) END
          IGNORE NULLS) OVER w_prev AS t0,
        first_value(value IGNORE NULLS) OVER w_next AS v1,
        first_value(CASE WHEN value IS NOT NULL THEN floor(epoch(ts)) END
          IGNORE NULLS) OVER w_next AS t1,
        floor(epoch(ts)) AS t
      FROM masked
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           round(CASE
             WHEN value IS NOT NULL THEN value
             WHEN v0 IS NOT NULL AND v1 IS NOT NULL AND t1 <> t0
               THEN v0 + (v1 - v0) * (t - t0) / (t1 - t0)
             WHEN v0 IS NOT NULL THEN v0
             ELSE NULL END, 6) AS value_filled
    FROM brk
    """,
    doc="F15 pd.Series.interpolate(): linear gap fill over masked values "
        "(track_data_clean.py:11-18); recipe SURVEY §7.5",
)
def f15_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    out = interpolate_series(
        ev, ["user_id"], "ts", ["value"], tiebreakers=["event_id"]
    )
    return out.select(
        "event_id", "user_id", F.round("value", 6).alias("value_filled")
    )

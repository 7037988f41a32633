"""Relational operator catalog, part 2 — the SURVEY.md §2 rows not
covered by plans/relational.py: composite/derived-key joins, agg
re-join vs window, two-level triggers, first/closest-row windows,
top-1 limits, regexp parsing, time offsets, piecewise lookups,
resample-interpolation, and JSON document assembly.

Same parity rules as plans/registry.py: identical aliases both sides,
rounded floats, deterministic tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.functions.convert import (
    GUST_FACTOR,
    KN_TO_MS,
    MS_TO_KPH,
    set_zeros,
)
from ibf_typhoon_data_pipeline_spark.functions.geo import haversine_km
from ibf_typhoon_data_pipeline_spark.operators.interpolation import (
    resample_interpolate,
)
from ibf_typhoon_data_pipeline_spark.operators.windows import (
    global_running_max,
    lead_kinematics,
)
from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------------ §2.2 filters
@register(
    "p1_p3_literal_filters",
    """
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'click' AND user_id % 16 IN (1, 3, 5)
    """,
    doc="P1+P3 literal equality + isin membership filters "
        "(forecast_process.py:182,296-297)",
)
def p1_p3_literal_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "click") & (F.col("user_id") % 16).isin(1, 3, 5)
    ).select("event_id", "user_id", "value")


@register(
    "p8_cascading_fallback",
    """
    WITH tiered AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_totalprice < 2000 THEN 1
                  WHEN o_totalprice < 10000 THEN 2
                  ELSE 3 END AS tier
      FROM orders
    ), best AS (SELECT min(tier) AS best_tier FROM tiered)
    SELECT o_orderkey, o_totalprice, tier
    FROM tiered, best WHERE tier = best_tier
    """,
    doc="P8 cascading filter fallback (dist<200 else <300 else all, "
        "forecast_process.py:1800-1810): tier per row + keep the best "
        "non-empty tier — one pass, no driver-side recount loop",
)
def p8_cascading_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    tiered = o.select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_totalprice") < 2000, 1)
        .when(F.col("o_totalprice") < 10000, 2)
        .otherwise(3)
        .alias("tier"),
    )
    best = tiered.agg(F.min("tier").alias("best_tier"))
    return (
        tiered.join(F.broadcast(best), tiered.tier == best.best_tier)
        .select("o_orderkey", "o_totalprice", "tier")
    )


# ------------------------------------------------------------- §2.3 joins
@register(
    "j6_composite_key_join",
    """
    WITH qty AS (
      -- exact across engines: l_quantity is integral (0 fractional
      -- rows), so the double sum is an exact integer and round(, 2)
      -- cannot straddle a half-ulp boundary
      SELECT l_orderkey, l_returnflag, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY 1, 2
    ), price AS (
      SELECT l_orderkey, l_returnflag, round(max(l_extendedprice), 2) AS max_price
      FROM lineitem GROUP BY 1, 2
    )
    SELECT q.l_orderkey, q.l_returnflag, total_qty, max_price
    FROM qty q JOIN price p
      ON q.l_orderkey = p.l_orderkey AND q.l_returnflag = p.l_returnflag
    """,
    doc="J6 multi-column equi join on (adm3_pcode, ens_id)-style "
        "composite key (forecast_process.py:1629)",
)
def j6_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = li.groupBy("l_orderkey", "l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    )
    price = li.groupBy("l_orderkey", "l_returnflag").agg(
        F.round(F.max("l_extendedprice"), 2).alias("max_price")
    )
    return qty.join(price, ["l_orderkey", "l_returnflag"])


@register(
    "j7_derived_key_join",
    """
    WITH factors AS (
      SELECT DISTINCT year(o_orderdate) AS year,
             year(o_orderdate) - 1991 AS correction_factor
      FROM orders
    )
    SELECT o.o_orderkey,
           CAST(round(o.o_totalprice) AS BIGINT) * f.correction_factor
             AS corrected_price
    FROM orders o JOIN factors f ON year(o.o_orderdate) = f.year
    """,
    doc="J7 broadcast join on a derived key (year substring → "
        "housing correction factor, forecast_process.py:439-441); "
        "integer factor keeps the output binary-exact for the hash",
)
def j7_derived_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    factors = (
        o.select(F.year("o_orderdate").alias("year"))
        .distinct()
        .withColumn("correction_factor", F.col("year") - 1991)
    )
    return (
        o.join(F.broadcast(factors), F.year(o.o_orderdate) == factors.year)
        .select(
            "o_orderkey",
            (
                F.round("o_totalprice", 0).cast("bigint")
                * F.col("correction_factor")
            ).alias("corrected_price"),
        )
    )


@register(
    "j8_agg_window_rejoin",
    """
    SELECT l_orderkey, l_linenumber,
           -- exact across engines: l_quantity is integral, the window
           -- sum is an exact integer in double (no fold-order ulps)
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey), 2)
             AS order_total_qty,
           round(l_quantity / sum(l_quantity) OVER (PARTITION BY l_orderkey), 6)
             AS qty_share
    FROM lineitem
    """,
    doc="J8 aggregate re-joined to its rows (forecast_process.py:538-540) "
        "— expressed as a window sum so the fact table shuffles once "
        "instead of agg+join twice",
)
def j8_agg_window_rejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    total = F.sum("l_quantity").over(w)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(total, 2).alias("order_total_qty"),
        F.round(F.col("l_quantity") / total, 6).alias("qty_share"),
    )


# -------------------------------------------------------- §2.4 aggregations
@register(
    "a2_a3_ensemble_summary",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(value), 6) AS mean_val,
           round(min(value), 6) AS min_val,
           round(max(value), 6) AS max_val
    FROM events GROUP BY event_type
    """,
    doc="A2 per-key min + A3 nanmean/nanmin/nanmax ensemble summary "
        "(forecast_process.py:986-995,1610-1615); NULLs skip like numpy "
        "nan-aggregates after NaN→NULL normalization",
)
def a2_a3_ensemble_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_val"),
        F.round(F.min("value"), 6).alias("min_val"),
        F.round(F.max("value"), 6).alias("max_val"),
    )


@register(
    "a5_a6_percust_totals",
    """
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(round(sum(o_totalprice) * 100.0) AS BIGINT)
             AS total_damage_cents,
           CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_triggered
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_custkey
    """,
    doc="A5/A6 per-ensemble national/regional totals with region filter "
        "(forecast_process.py:1288-1291,1254-1256)",
)
def a5_a6_percust_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice") * 100.0)
            .cast("long")
            .alias("total_damage_cents"),
            F.sum(
                F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)
            ).alias("n_triggered"),
        )
    )


@register(
    "a8_two_level_trigger",
    """
    WITH per_cust AS (
      SELECT o_custkey, avg(o_totalprice) AS avg_damage
      FROM orders GROUP BY o_custkey
    )
    SELECT count(CASE WHEN avg_damage > 180000 THEN 1 END) AS n_over,
           count(CASE WHEN avg_damage > 180000 THEN 1 END) > 2 AS triggered
    FROM per_cust
    """,
    doc="A8 average-damage trigger: per-muni mean >10% → count of such "
        "munis >2 → boolean (forecast_process.py:1293-1303)",
)
def a8_two_level_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_damage"))
    return per.agg(
        F.count(F.when(F.col("avg_damage") > 180000, 1)).alias("n_over"),
        (F.count(F.when(F.col("avg_damage") > 180000, 1)) > 2).alias("triggered"),
    )


@register(
    "a10_a15_distinct_sizes",
    """
    SELECT o_orderpriority, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
    doc="A10 distinct + A15 group sizes (forecast_process.py:1099,433-438)",
)
def a10_a15_distinct_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "a16_yearly_max",
    """
    SELECT year(o_orderdate) AS year, round(max(o_totalprice), 2) AS yearly_max
    FROM orders GROUP BY 1
    """,
    doc="A16 yearly block maxima feeding the GEV return-period fit "
        "(xgb_model_v1.R:134-145); the fit itself is offline-training "
        "scope, the distributed part is this agg",
)
def a16_yearly_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.round(F.max("o_totalprice"), 2).alias("yearly_max")
    )


def _gev_sql(events_table: str) -> str:
    """A16 at full fidelity — the ONE SQL text both engines run (the
    Spark entry registers a temp view and spark.sql's this verbatim):
    daily block maxima → probability-weighted moments (rank-weighted
    sums; rank ties are harmless because equal values make the swap a
    no-op) → Hosking L-moment GEV (κ, σ, μ; Γ via shared-text Lanczos)
    → 10/50/100-block return levels."""
    from ibf_typhoon_data_pipeline_spark.functions.stats import (
        GEV_C_SQL,
        GEV_G1K_SQL,
        GEV_KAPPA_SQL,
        GEV_L1_SQL,
        GEV_L2_SQL,
        GEV_MU_SQL,
        GEV_SIGMA_SQL,
        GEV_T3_SQL,
        return_level_sql,
    )

    return f"""
    WITH blocks AS (
      SELECT event_type, date_trunc('day', ts) AS d, max(value) AS xmax
      FROM {events_table} GROUP BY event_type, date_trunc('day', ts)
    ), ranked AS (
      SELECT event_type, xmax,
        CAST(row_number() OVER (
          PARTITION BY event_type ORDER BY xmax) AS DOUBLE) AS r,
        CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n
      FROM blocks
    ), pwm AS (
      SELECT event_type,
        sum(xmax) / max(n) AS b0,
        sum(xmax * (r - 1.0)) / (max(n) * (max(n) - 1.0)) AS b1,
        sum(xmax * (r - 1.0) * (r - 2.0))
          / (max(n) * (max(n) - 1.0) * (max(n) - 2.0)) AS b2
      FROM ranked GROUP BY event_type
    ), lm1 AS (SELECT *, {GEV_L1_SQL} AS l1, {GEV_L2_SQL} AS l2 FROM pwm),
    lm2 AS (SELECT *, {GEV_T3_SQL} AS t3 FROM lm1),
    p1 AS (SELECT *, {GEV_C_SQL} AS c FROM lm2),
    p2 AS (SELECT *, {GEV_KAPPA_SQL} AS kappa FROM p1),
    p3 AS (SELECT *, {GEV_G1K_SQL} AS g1k FROM p2),
    p4 AS (SELECT *, {GEV_SIGMA_SQL} AS sigma FROM p3),
    p5 AS (SELECT *, {GEV_MU_SQL} AS mu FROM p4)
    SELECT event_type, round(mu, 4) AS gev_mu, round(sigma, 4) AS gev_sigma,
           round(kappa, 6) AS gev_kappa,
           round({return_level_sql(10)}, 4) AS rl_10,
           round({return_level_sql(50)}, 4) AS rl_50,
           round({return_level_sql(100)}, 4) AS rl_100
    FROM p5
    """


@register(
    "a16_gev_return_levels",
    _gev_sql("events"),
    doc="A16 at full fidelity (SURVEY parked the GEV fit as out-of-"
        "scope pandas UDF; this is better): daily block maxima → "
        "L-moment GEV fit (Hosking 1990 closed form, Γ via 9-term "
        "Lanczos shared-text expression) → 10/50/100-block return "
        "levels, entirely window+agg+scalar expressions in whole-stage "
        "codegen — xgb_model_v1.R:134-145 semantics with zero Python",
)
def a16_gev_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    ev.createOrReplaceTempView("gev_events_v")
    return spark.sql(_gev_sql("gev_events_v"))


@register(
    "events_sessionize",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
               OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS session_seq
      FROM ordered
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           CAST(round(sum(value) * 100.0) AS BIGINT) AS total_value_cents,
           CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
             AS duration_s
    FROM sessions GROUP BY user_id, session_seq
    """,
    doc="Sessionization — the classic large-pipeline windowing op the "
        "reference never needed but a training-data pipeline does: "
        "30-min-gap session boundaries via lag + running sum (two "
        "windows over ONE (user_id, ts) sort — Catalyst reuses the "
        "exchange), then per-session rollups. Second-floored epochs "
        "both engines (unix_timestamp ≡ floor(epoch)); (ts, event_id) "
        "tiebreak keeps the running sum deterministic",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(
        F.lag("ts").over(w).isNull() | (gap_s > 1800), 1
    ).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_seq",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value") * 100.0).cast("long").alias("total_value_cents"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_s"),
    )


# ------------------------------------------------------------ §2.5 windows
@register(
    "w3_first_qualifying",
    """
    SELECT user_id, event_id AS first_event_id, ts AS first_ts FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts, event_id
      ) AS rn
      FROM events WHERE value > 450
    ) WHERE rn = 1
    """,
    doc="W3 first-landfall point: earliest row per track meeting an "
        "on-land predicate (forecast_process.py:750-788)",
)
def w3_first_qualifying(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 450)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "w4_closest_row",
    """
    SELECT user_id, event_id, value AS min_value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY value, ts, event_id
      ) AS rn FROM events WHERE value IS NOT NULL
    ) WHERE rn = 1
    """,
    doc="W4 closest-to-land row: value == min(value) per key, ties keep "
        "first by time (forecast_process.py:790-813)",
)
def w4_closest_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("value", "ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.col("value").alias("min_value"))
    )


# -------------------------------------------------------- §2.6 sorts/limits
@register(
    "o1_latest_limit1",
    """
    SELECT event_id, ts FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
    doc="O1 latest-forecast-dir pick: global orderBy desc limit 1 "
        "(tc_tracks_forecast.py:147-150); TakeOrderedAndProject, no "
        "full sort",
)
def o1_latest_limit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select("event_id", "ts")
        .limit(1)
    )


@register(
    "o4_ranked_output",
    """
    SELECT n_name, total_bal_cents, CAST(rank AS INTEGER) AS rank FROM (
      SELECT n_name,
             CAST(round(sum(c_acctbal) * 100.0) AS BIGINT) AS total_bal_cents,
             row_number() OVER (
               ORDER BY CAST(round(sum(c_acctbal) * 100.0) AS BIGINT) DESC,
                        n_name
             ) AS rank
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    """,
    doc="O4 sorted agg output (forecast_process.py:1430): the ordering "
        "is materialized as a rank column so the order-insensitive "
        "hash still checks it",
)
def o4_ranked_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    agg = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("c_acctbal") * 100.0)
            .cast("long")
            .alias("total_bal_cents")
        )
    )
    w = Window.orderBy(F.col("total_bal_cents").desc(), F.col("n_name"))
    return agg.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------- §2.8 scalar functions
@register(
    "f2_f3_regexp_parse",
    """
    WITH named AS (
      SELECT p_partkey,
             concat('ECEP_', upper(trim(p_brand)), '_',
                    CAST(p_size AS VARCHAR), 'deg_',
                    CAST(p_partkey % 40 AS VARCHAR), 'p.bufr') AS filename
      FROM part
    )
    SELECT p_partkey, filename,
           regexp_extract(filename, '_([0-9]+)deg_', 1) AS lat_token,
           CAST(regexp_extract(filename, '_([0-9]+)p\\.bufr$', 1) AS INTEGER)
             AS lon_token,
           regexp_matches(filename, '^ECEP_BRAND') AS is_ecep
    FROM named
    """,
    doc="F2 filename lat/lon parsing + F3 strip/upper/startswith "
        "(forecast_process.py:159-176, tc_tracks_forecast.py:312-313)",
)
def f2_f3_regexp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    filename = F.concat(
        F.lit("ECEP_"),
        F.upper(F.trim(F.col("p_brand"))),
        F.lit("_"),
        F.col("p_size").cast("string"),
        F.lit("deg_"),
        (F.col("p_partkey") % 40).cast("string"),
        F.lit("p.bufr"),
    )
    named = p.select("p_partkey", filename.alias("filename"))
    return named.select(
        "p_partkey",
        "filename",
        F.regexp_extract("filename", r"_([0-9]+)deg_", 1).alias("lat_token"),
        F.regexp_extract("filename", r"_([0-9]+)p\.bufr$", 1)
        .cast("int")
        .alias("lon_token"),
        F.col("filename").startswith("ECEP_BRAND").alias("is_ecep"),
    )


@register(
    "f6_time_offsets",
    """
    SELECT event_id,
           strftime(ts + INTERVAL 1 HOUR * (user_id % 24), '%Y-%m-%d %H:%M:%S')
             AS shifted_ts
    FROM events
    """,
    doc="F6 time-origin + lead-hour offsets "
        "(tc_tracks_forecast.py:281-282)",
)
def f6_time_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    shifted = F.timestamp_seconds(
        F.unix_timestamp("ts") + (F.col("user_id") % 24) * 3600
    )
    return ev.select(
        "event_id",
        F.date_format(shifted, "yyyy-MM-dd HH:mm:ss").alias("shifted_ts"),
    )


@register(
    "f7_w2_track_kinematics",
    """
    WITH pts AS (
      SELECT user_id, ts, event_id,
             (user_id % 120) * 0.1 + value * 0.001 AS lat,
             ((user_id * 7) % 240) * 0.1 + 100 + value * 0.001 AS lon
      FROM events WHERE value IS NOT NULL
    ), seq AS (
      SELECT *, lead(lat) OVER w AS next_lat, lead(lon) OVER w AS next_lon,
             date_diff('second', ts, lead(ts) OVER w) / 3600.0 AS dt_hours
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           round(2 * 6367.0 * asin(sqrt(
             pow(sin(radians(next_lat - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(next_lat))
               * pow(sin(radians(next_lon - lon) / 2), 2)
           )), 4) AS step_km,
           round(dt_hours, 6) AS dt_hours
    FROM seq WHERE next_lat IS NOT NULL
    """,
    doc="F7 haversine + W2 lead-based forward kinematics: per-track "
        "step distance and Δt (forecast_process.py:636-653, "
        "lib_r/prepare_typhoon_input.R:414-443)",
)
def f7_w2_track_kinematics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("user_id") % 120) * 0.1 + F.col("value") * 0.001).alias("lat"),
        (((F.col("user_id") * 7) % 240) * 0.1 + 100 + F.col("value") * 0.001).alias(
            "lon"
        ),
    )
    # lead_kinematics orders by ts only; add event_id for deterministic
    # parity with the oracle's window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        pts.withColumn("next_lat", F.lead("lat", 1).over(w))
        .withColumn("next_lon", F.lead("lon", 1).over(w))
        .withColumn(
            "dt_hours",
            (F.unix_timestamp(F.lead("ts", 1).over(w)) - F.unix_timestamp("ts"))
            / 3600.0,
        )
    )
    return seq.filter(F.col("next_lat").isNotNull()).select(
        "user_id",
        "event_id",
        F.round(
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("next_lat"), F.col("next_lon")
            ),
            4,
        ).alias("step_km"),
        F.round("dt_hours", 6).alias("dt_hours"),
    )


@register(
    "f9_unit_conversions",
    f"""
    SELECT l_orderkey, l_linenumber,
           round(l_quantity * {KN_TO_MS}, 6) AS wind_ms,
           round(l_quantity * {KN_TO_MS} * {MS_TO_KPH}, 6) AS wind_kph,
           round(l_quantity * {KN_TO_MS} * {GUST_FACTOR}, 6) AS gust_ms,
           round(l_quantity * {KN_TO_MS} / 0.88, 6) AS wind_1min_ms
    FROM lineitem WHERE l_linenumber = 1
    """,
    doc="F9 unit-conversion constants kn→m/s→kph, gust, 10→1-min "
        "(run_model_V2.R:20-22, forecast_process.py:685,844)",
)
def f9_unit_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    kn = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(kn * KN_TO_MS, 6).alias("wind_ms"),
        F.round(kn * KN_TO_MS * MS_TO_KPH, 6).alias("wind_kph"),
        F.round(kn * KN_TO_MS * GUST_FACTOR, 6).alias("gust_ms"),
        F.round(kn * KN_TO_MS / 0.88, 6).alias("wind_1min_ms"),
    )


@register(
    "f12_set_zeros_mask",
    """
    SELECT event_id,
           CASE WHEN value > 25 THEN round(value * 1.15, 6)
                WHEN value < 25 THEN 0.0
                ELSE NULL END AS masked_damage
    FROM events
    """,
    doc="F12 set_zeros NaN-propagating damage mask "
        "(forecast_process.py:550-568): >25 → damage·growth, <25 → 0, "
        "boundary/NULL → NULL",
)
def f12_set_zeros_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    masked = set_zeros(F.col("value"), F.col("value"), F.lit(1.15))
    return ev.select("event_id", F.round(masked, 6).alias("masked_damage"))


@register(
    "f18_piecewise_linear",
    """
    WITH knots AS (
      SELECT o_orderkey, 900 + (o_orderkey % 110) AS pcen FROM orders
    )
    SELECT o_orderkey, pcen,
           round(CASE
             WHEN pcen <= 920 THEN 15.0
             WHEN pcen <= 960 THEN 15.0 + (pcen - 920) * (35.0 - 15.0) / 40.0
             WHEN pcen <= 995 THEN 35.0 + (pcen - 960) * (55.0 - 35.0) / 35.0
             ELSE 55.0 END, 6) AS rmw_km
    FROM knots
    """,
    doc="F18 RMW piecewise-linear pressure→radius lookup "
        "(tc_tracks.py:1744-1777) as a when-ladder over segment knots",
)
def f18_piecewise_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pcen = (F.lit(900) + F.col("o_orderkey") % 110).alias("pcen")
    knots = o.select("o_orderkey", pcen)
    p = F.col("pcen")
    rmw = (
        F.when(p <= 920, F.lit(15.0))
        .when(p <= 960, 15.0 + (p - 920) * (35.0 - 15.0) / 40.0)
        .when(p <= 995, 35.0 + (p - 960) * (55.0 - 35.0) / 35.0)
        .otherwise(F.lit(55.0))
    )
    return knots.select("o_orderkey", "pcen", F.round(rmw, 6).alias("rmw_km"))


@register(
    "f16_resample_interpolate",
    """
    WITH pts AS (
      SELECT user_id % 8 AS track_id,
             date_trunc('hour', ts) AS t, avg(value) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), bounds AS (
      SELECT track_id, min(t) AS t0, max(t) AS t1 FROM pts GROUP BY 1
    ), grid AS (
      SELECT track_id, unnest(generate_series(t0, t1, INTERVAL 30 MINUTE)) AS t
      FROM bounds
    ), joined AS (
      SELECT g.track_id, g.t, p.v
      FROM grid g LEFT JOIN pts p ON g.track_id = p.track_id AND g.t = p.t
    ), brk AS (
      SELECT track_id, t, v,
        last_value(v IGNORE NULLS) OVER w_prev AS v0,
        last_value(CASE WHEN v IS NOT NULL THEN epoch(t) END IGNORE NULLS)
          OVER w_prev AS t0,
        first_value(v IGNORE NULLS) OVER w_next AS v1,
        first_value(CASE WHEN v IS NOT NULL THEN epoch(t) END IGNORE NULLS)
          OVER w_next AS t1
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY track_id ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY track_id ORDER BY t
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT track_id, strftime(t, '%Y-%m-%d %H:%M:%S') AS t_str,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN v0 IS NOT NULL AND v1 IS NOT NULL AND t1 <> t0
               THEN v0 + (v1 - v0) * (epoch(t) - t0) / (t1 - t0)
             WHEN v0 IS NOT NULL THEN v0
             ELSE NULL END, 6) AS v_interp
    FROM brk
    """,
    doc="F16 resample-to-30-min + linear interpolation "
        "(track_data_clean.py:43, SURVEY §7.5 recipe): sequence → "
        "explode → bracket windows → lerp; one shuffle per track key",
)
def f16_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = (
        ev.groupBy(
            (F.col("user_id") % 8).alias("track_id"),
            F.date_trunc("hour", "ts").alias("t"),
        )
        .agg(F.avg("value").alias("v"))
    )
    out = resample_interpolate(pts, ["track_id"], "t", ["v"], step_minutes=30)
    return out.select(
        "track_id",
        F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("t_str"),
        F.round("v", 6).alias("v_interp"),
    )


@register(
    "f19_json_documents",
    """
    WITH amounts AS (
      SELECT n_name, c_custkey AS place_code,
             CAST(round(c_acctbal) AS BIGINT) AS amount
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name AS layer,
           concat('[',
             string_agg(
               concat('{"placeCode":', CAST(place_code AS VARCHAR),
                      ',"amount":', CAST(amount AS VARCHAR), '}'),
               ',' ORDER BY place_code),
             ']') AS exposure_json
    FROM amounts GROUP BY n_name
    """,
    doc="F19 nested exposurePlaceCodes JSON document build "
        "(forecast_process.py:1160-1233): collect_list(struct) + "
        "to_json replaces the reference's iterrows loop (X9)",
)
def f19_json_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    amounts = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name",
        F.col("c_custkey").alias("place_code"),
        F.round("c_acctbal", 0).cast("bigint").alias("amount"),
    )
    docs = amounts.groupBy(F.col("n_name").alias("layer")).agg(
        F.to_json(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("place_code").alias("placeCode"),
                        F.col("amount").alias("amount"),
                    )
                )
            )
        ).alias("exposure_json")
    )
    return docs


@register(
    "k4_degree_distance_min",
    """
    WITH track AS (
      SELECT (user_id % 120) * 0.1 AS lat, ((user_id * 7) % 240) * 0.1 AS lon
      FROM events WHERE user_id % 16 = 0 AND value IS NOT NULL
    ), grid AS (
      SELECT c_custkey AS centroid_id,
             (c_custkey % 120) * 0.1 AS lat,
             ((c_custkey * 13) % 240) * 0.1 AS lon
      FROM customer
    )
    SELECT centroid_id,
           round(min(sqrt(pow(g.lat - t.lat, 2) + pow(g.lon - t.lon, 2)) * 111.0),
                 4) AS dis_track_min
    FROM grid g CROSS JOIN track t
    GROUP BY centroid_id
    """,
    doc="K4 track–grid min distance in DEGREE space ·111 — deliberately "
        "not haversine; quirk preserved for parity because it feeds ML "
        "features and prob_within_50km (forecast_process.py:1603-1608)",
)
def k4_degree_distance_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.functions.geo import degree_distance_km

    ev = _t(spark, sf_dir, "events")
    track = ev.filter(
        (F.col("user_id") % 16 == 0) & F.col("value").isNotNull()
    ).select(
        ((F.col("user_id") % 120) * 0.1).alias("t_lat"),
        (((F.col("user_id") * 7) % 240) * 0.1).alias("t_lon"),
    )
    grid = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("centroid_id"),
        ((F.col("c_custkey") % 120) * 0.1).alias("lat"),
        (((F.col("c_custkey") * 13) % 240) * 0.1).alias("lon"),
    )
    pairs = grid.join(F.broadcast(track))
    return pairs.groupBy("centroid_id").agg(
        F.round(
            F.min(
                degree_distance_km(
                    F.col("lat"), F.col("lon"), F.col("t_lat"), F.col("t_lon")
                )
            ),
            4,
        ).alias("dis_track_min")
    )


@register(
    "f19r_json_extract",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(round(sum(value) * 100.0) AS BIGINT) AS total_value_cents
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
    doc="JSON read side of F19: parse the nested props document, "
        "extract a typed field, aggregate on it — get_json_object "
        "stays in codegen (no UDF JSON parsing)",
)
def f19r_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value") * 100.0)
            .cast("long")
            .alias("total_value_cents"),
        )
    )


@register(
    "a14b_native_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(round(sum(l_extendedprice) * 100.0) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="A14's TOTAL-row construct as a NATIVE rollup (the reference "
        "unions a hand-built total row, damage_probability.R:85-87; "
        "Spark/DuckDB compute all grouping sets in one pass with "
        "partial aggregation)",
)
def a14b_native_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice") * 100.0)
            .cast("long")
            .alias("revenue_cents"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "revenue_cents",
        )
    )


@register(
    "a18_grouping_sets",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                AS BIGINT) AS gid,
           count(*) AS n,
           CAST(round(sum(l_quantity) * 100.0) AS BIGINT) AS qty_centi
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
    """,
    doc="Explicit GROUPING SETS (the aggregation surface beyond "
        "rollup/cube): the (flag,status) / (flag) / (status) marginals "
        "in ONE partial-aggregated pass, with the grouping() bitmask "
        "disambiguating real NULL-key rows from subtotal rows — the "
        "reason coalesce('ALL') alone is not a correct marginal "
        "marker. Same single-shuffle shape as a14b_native_rollup.",
)
def a18_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [
                [F.col("l_returnflag"), F.col("l_linestatus")],
                [F.col("l_returnflag")],
                [F.col("l_linestatus")],
            ],
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        )
        .agg(
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            )
            .cast("long")
            .alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity") * 100.0).cast("long").alias(
                "qty_centi"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n",
            "qty_centi",
        )
    )


# ------------------------------------------- TPC-H Q3/Q5 adaptations
# Multi-join aggregate plans on the house tables (columns adapted to
# the generated schema: no o_shippriority / partsupp here). They pin
# the bread-and-butter warehouse shape q1 doesn't cover: selective
# dimension filters reaching the fact scan through 3- and 6-table
# join trees, with every dimension broadcast.


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100.0)
                AS BIGINT) AS revenue_cents,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_cents DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 (shipping priority, adapted): BUILDING-segment "
        "orders placed before the cut with lines shipped after it, "
        "top-10 by revenue. Customer and date-filtered orders are "
        "both SF-scaling, so their joins are AQE-decided (broadcast "
        "at bench SF, shuffle at cluster scale); both date filters "
        "push to the scans, revenue partial-aggregates per order "
        "key, and the top-10 is TakeOrdered — no global sort.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = (
        # both orders (date-filtered fact) and customer scale with
        # SF: no forced hints — AQE picks broadcast at bench SF and
        # degrades to shuffle joins at cluster scale (VERDICT r7 #1)
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * 100.0
        )
        .cast("long")
        .alias("revenue_cents")
    )
    return (
        agg.orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue_cents",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100.0)
                AS BIGINT) AS revenue_cents
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
                 AND s_nationkey = c_nationkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue_cents DESC, n_name ASC
    """,
    doc="TPC-H Q5 (local supplier volume): revenue from lines where "
        "the supplier shares the customer's nation, per ASIA nation, "
        "one year of orders. The bounded dims (nation, region) "
        "broadcast; customer/supplier are SF-scaling so their joins "
        "are AQE-decided; the lineitem->orders equi-join shuffles, "
        "and the final agg is nation-cardinality.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * 100.0
            )
            .cast("long")
            .alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("n_name").asc())
    )


# ------------------------------------------------- salted skew join
@register(
    "j16_salted_skew_join",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Skew-robust equi-join as a catalog entry: the fact side "
        "carries a deterministic xxhash64 row salt, the dimension "
        "side explodes once per salt value, and the join key becomes "
        "(key, salt) — a hot order key's rows spread over n_salts "
        "shuffle partitions instead of one straggler "
        "(operators/skew.salted_join, n_salts=8). Values are "
        "provably identical to the plain join — which is exactly "
        "what the oracle computes.",
)
def j16_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"),
        F.round(F.col("l_extendedprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum("price_cents").cast("long").alias("revenue_cents"),
    )


# ------------------------------------------------- safe-cast ladder
@register(
    "f21_try_cast_ladder",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(TRY_CAST(split_part(o_orderpriority, '-', 1)
                    AS BIGINT)) AS BIGINT) AS priority_rank,
           CAST(sum(CASE WHEN TRY_CAST(split_part(o_orderpriority, '-', 2)
                              AS BIGINT) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsable_suffix
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Safe-cast semantics (F-family completion): TRY_CAST parses "
        "the numeric prefix of '1-URGENT'-style codes and returns "
        "NULL (never an error) on the alphabetic suffix — the "
        "malformed-value accounting both engines share token-for-"
        "token. The dirty-data sibling of the corrupt-record scan: "
        "bad VALUES quarantine as NULLs where bad RECORDS quarantine "
        "as rows.",
)
def f21_try_cast_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.max(
            F.expr(
                "TRY_CAST(split_part(o_orderpriority, '-', 1) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("priority_rank"),
        F.sum(
            F.when(
                F.expr(
                    "TRY_CAST(split_part(o_orderpriority, '-', 2)"
                    " AS BIGINT)"
                ).isNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_unparsable_suffix"),
    )


@register(
    "q18_large_volume_customer",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 280
    )
    SELECT c_name, c_custkey, o_orderkey,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
           CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents,
           total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY price_cents DESC, o_orderkey ASC
    LIMIT 100
    """,
    doc="TPC-H Q18 (large-volume customers): the HAVING-subquery "
        "shape — a fact-side partial aggregate filters to a tiny key "
        "set which then drives the orders/customer joins. The big-qty "
        "key set is orders-of-magnitude smaller than lineitem, so "
        "Spark broadcasts it into the orders probe (AQE does this "
        "automatically from the runtime size); top-100 is "
        "TakeOrderedAndProject, never a global sort. Integer cents "
        "and epoch keep the hash exact.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 280)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    joined = (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    return (
        joined.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("long").alias(
                "order_epoch"
            ),
            F.round(F.col("o_totalprice") * 100.0)
            .cast("long")
            .alias("price_cents"),
            "total_qty",
        )
        .orderBy(F.col("price_cents").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ------------------------------------------- closed-form regression
# Simple linear regression fit ENTIRELY in-plan from exact integer
# sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy as BIGINTs — one
# partial-agg pass, order-free), with the closed-form slope/intercept/
# R² evaluated as shared SQL text on those identical integers. No
# driver fit at all — the whole model is one row. Integer-overflow
# bound: y quantized to whole dollars keeps Σy² < 2^63 through ~sf100;
# past that, switch the moment pass to centered doubles (documented
# trade: exactness for range).
_LR_B_RAW = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
    "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_LR_SLOPE_SQL = f"round({_LR_B_RAW}, 6)"
_LR_ICEPT_SQL = (
    f"round((CAST(sy AS DOUBLE) - {_LR_B_RAW} * CAST(sx AS DOUBLE)) "
    "/ CAST(n AS DOUBLE), 6)"
)
_LR_R2_SQL = (
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
    "* (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
    "/ ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
    "* (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
    "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"
)


@register(
    "ml_linreg_closed_form",
    f"""
    WITH xy AS (
      SELECT o.o_orderkey,
             CAST(count(*) AS BIGINT) AS x,
             CAST(round(any_value(o.o_totalprice)) AS BIGINT) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM xy
    )
    SELECT n, sx, sy, sxx, syy, sxy,
           {_LR_SLOPE_SQL} AS slope,
           {_LR_ICEPT_SQL} AS intercept,
           {_LR_R2_SQL} AS r2
    FROM s
    """,
    doc="In-engine closed-form linear regression (order total vs line "
        "count): one groupBy builds (x, y) per order, one partial-agg "
        "pass reduces the six integer moments, and the model "
        "(slope, intercept, R²) is shared-SQL-text arithmetic on one "
        "row. The fully distributed no-driver-fit counterpart to "
        "ml_ols_inference; at 100 TB the only shuffles are the "
        "order-key agg and a 6-number reduce.",
)
def ml_linreg_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    xy = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").cast("long").alias("x"),
            F.round(F.any_value("o_totalprice")).cast("long").alias("y"),
        )
    )
    s = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return s.selectExpr(
        "n", "sx", "sy", "sxx", "syy", "sxy",
        f"{_LR_SLOPE_SQL} AS slope",
        f"{_LR_ICEPT_SQL} AS intercept",
        f"{_LR_R2_SQL} AS r2",
    )


# --------------------------------------------- TPC-H Q4 / Q16 shapes
# Two more canonical relational shapes, adapted to the synthetic
# schema like the Q3/Q5/Q18 entries: Q4's correlated EXISTS becomes a
# left-semi join with a non-equi residual (late shipment stands in
# for commit<receipt), Q16's NOT IN becomes a null-safe left-anti
# join (supplier keys are non-null by construction).
@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
      AND o.o_orderdate < CAST('1996-04-01' AS TIMESTAMP)
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): correlated EXISTS "
        "as a LEFT SEMI join on the order key with the late-shipment "
        "non-equi residual — the quarter filter pushes to the orders "
        "scan, the semi join never duplicates orders, and the rollup "
        "is priority-cardinality.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.expr("o_orderdate + INTERVAL 60 DAY")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 7, 14, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): NOT IN over "
        "the complaint-supplier set as a LEFT ANTI join (keys "
        "non-null by construction); part and the supplier-derived "
        "anti set are SF-scaling so both joins are AQE-decided; then "
        "a distinct-count rollup keyed on (brand, size) — the "
        "distinct agg is the only fact-sized shuffle.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 7, 14, 23, 36, 45))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad, "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
        )
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_size").asc(),
        )
    )


# ------------------------------- TPC-H Q7/Q11/Q13/Q17/Q21/Q22 shapes
# The remaining canonical warehouse plan patterns, adapted to the
# synthetic schema (no partsupp / phone / commitdate columns — stand-
# ins noted per entry). Each pins a DISTINCT decorrelation or join
# pattern the catalog didn't yet exercise: nation-pair disjunctive
# join filters (Q7), scalar-aggregate broadcast HAVING (Q11),
# outer-join count distribution with a join-condition filter (Q13),
# correlated per-group average (Q17), EXISTS/NOT-EXISTS decorrelated
# to one window (Q21), and scalar-subquery + anti-join (Q22).


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume) * 100.0) AS BIGINT) AS revenue_cents
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping): bilateral trade between two "
        "nations per ship year. The disjunctive nation-pair predicate "
        "can't push to either scan alone, so it rides the joined row "
        "after two broadcast nation lookups; lineitem->orders is the "
        "only fact shuffle and the final rollup is "
        "2 x 2 x years cardinality. Reference shape: TPC-H spec Q7.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    pair = F.col("supp_nation").isin("NATION_3", "NATION_7") & F.col(
        "cust_nation"
    ).isin("NATION_3", "NATION_7") & (
        F.col("supp_nation") != F.col("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    joined = (
        # supp/cust are nation-annotated SF-scaling base tables —
        # joins AQE-decided (r7 #1); the nation lookups above stay
        # broadcast (bounded dim)
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(pair)
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum("volume") * 100.0).cast("long").alias(
                "revenue_cents"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q11_important_stock",
    """
    WITH pv AS (
      SELECT l_partkey,
             CAST(round(sum(l_extendedprice * l_quantity) * 100.0)
                  AS BIGINT) AS value_cents
      FROM lineitem
      GROUP BY l_partkey
    ), tot AS (
      SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM pv
    )
    SELECT l_partkey, value_cents
    FROM pv, tot
    WHERE value_cents * 1250 > total_cents
    ORDER BY value_cents DESC, l_partkey ASC
    """,
    doc="TPC-H Q11 (important stock, adapted: shipped value per part "
        "stands in for partsupp stock value): per-part value HAVING "
        "share > 0.08% of the global total (1.6x the mean share; "
        "the synthetic value distribution tops out at 1.9x). The "
        "global total is a "
        "one-row aggregate broadcast back over the per-part frame "
        "(scalar-subquery decorrelation); the share test runs on "
        "exact integer cents (value_cents * 1000 > total_cents) so "
        "no float threshold can disagree at the boundary.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    pv = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")) * 100.0
        )
        .cast("long")
        .alias("value_cents")
    )
    tot = pv.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1250 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), F.col("l_partkey").asc())
    )


@register(
    "q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (customer distribution): orders-per-customer "
        "histogram. The priority exclusion must live IN the join "
        "condition (a WHERE would silently drop zero-order customers "
        "that the left outer join exists to keep); count(o_orderkey) "
        "counts matches only, so unmatched customers land in the "
        "c_count=0 bucket. Two aggs: customer-cardinality, then "
        "histogram-cardinality.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    c_orders = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q17_small_quantity_lines",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
           CAST(round(sum(l_extendedprice) * 100.0) AS BIGINT)
             AS total_cents
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT CAST('0.4' AS DOUBLE) * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): lines under 40% "
        "of their part's average quantity, one brand. The correlated "
        "per-part average decorrelates to a groupBy over the "
        "brand-filtered semi-joined fact slice (part is SF-scaling: "
        "the semi join is AQE-decided) re-joined "
        "on the part key. Quantities are integral doubles, so "
        "avg = exact-integer-sum / count is the identical IEEE double "
        "in both engines and the 0.4x threshold compare is "
        "deterministic.",
)
def q17_small_quantity_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(part, F.col("l_partkey") == F.col("p_partkey"),
           "left_semi")
    avg_q = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    # no broadcast hint: avg_q is part-cardinality (one brand's slice
    # of the catalog, still growing with it) — AQE decides
    small = li.join(
        avg_q, F.col("l_partkey") == F.col("a_partkey")
    ).filter(
        F.col("l_quantity")
        < F.lit("0.4").cast("double") * F.col("avg_qty")
    )
    return small.agg(
        F.count("*").cast("long").alias("n_small_lines"),
        F.round(F.sum("l_extendedprice") * 100.0)
        .cast("long")
        .alias("total_cents"),
    )


@register(
    "q21_late_sole_supplier",
    """
    WITH flags AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
      SELECT l_orderkey, l_suppkey, late,
             CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT)
               AS n_supp,
             CAST(sum(late) OVER (PARTITION BY l_orderkey) AS BIGINT)
               AS n_late
      FROM flags
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_order
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting, adapted: "
        "ship > order date + 90 days stands in for receipt > commit). "
        "The EXISTS (another supplier on the order) and NOT EXISTS "
        "(no OTHER late supplier) pair decorrelates to ONE window "
        "over the per-(order, supplier) flag frame — n_supp > 1 and "
        "n_late = 1 with this supplier late is exactly the "
        "sole-late-supplier condition, replacing two self-joins of "
        "the fact table with one partitioned window.",
)
def q21_late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    flags = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.expr("o_orderdate + INTERVAL 90 DAY"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    per_order = flags.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count("*").over(w).cast("long").alias("n_supp"),
        F.sum("late").over(w).cast("long").alias("n_late"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        per_order.filter(
            (F.col("late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@register(
    "q22_dormant_customers",
    """
    WITH bal AS (
      SELECT c_custkey, c_name,
             CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
      FROM customer
    ), thresh AS (
      SELECT CAST(round(avg(bal_cents)) AS BIGINT) AS avg_cents
      FROM bal WHERE bal_cents > 0
    )
    SELECT substr(c_name, length(c_name) - 1, 2) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
    FROM bal, thresh
    WHERE bal_cents > avg_cents
      AND substr(c_name, length(c_name) - 1, 2)
            IN ('13', '31', '23', '29', '30', '18', '17')
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    doc="TPC-H Q22 (global sales opportunity, adapted: the customer "
        "name's last two digits stand in for the phone country code): "
        "above-average-balance customers with no URGENT orders "
        "(every synthetic customer has SOME order, so the dormancy "
        "test keys on the urgent slice to stay non-vacuous). Balances "
        "quantize to integer cents BEFORE the average so the "
        "threshold compare is integer-exact (avg of BIGINTs is the "
        "same IEEE division in both engines, rounded once); the "
        "NOT EXISTS is a LEFT ANTI join against the orders key set "
        "and the one-row threshold broadcasts.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    bal = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100.0).cast("long").alias("bal_cents"),
    )
    thresh = bal.filter(F.col("bal_cents") > 0).agg(
        F.round(F.avg("bal_cents")).cast("long").alias("avg_cents")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    code = F.expr("substr(c_name, length(c_name) - 1, 2)")
    return (
        bal.crossJoin(F.broadcast(thresh))
        .filter(
            (F.col("bal_cents") > F.col("avg_cents"))
            & code.isin("13", "31", "23", "29", "30", "18", "17")
        )
        .join(orders, "c_custkey", "left_anti")
        .select(code.alias("cntrycode"), "bal_cents")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum("bal_cents").cast("long").alias("totacctbal_cents"),
        )
        .orderBy("cntrycode")
    )


# ------------------------------------------------- Pareto skyline
@register(
    "o5_pareto_skyline",
    """
    WITH p AS (
      SELECT p_partkey, p_size,
             CAST(round(p_retailprice * 100.0) AS BIGINT) AS price_cents
      FROM part
    ), d AS (
      SELECT p_partkey, p_size, price_cents,
             max(p_size) OVER (
               ORDER BY price_cents
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_cheaper,
             max(p_size) OVER (PARTITION BY price_cents)
               AS best_same_price
      FROM p
    )
    SELECT p_partkey, p_size, price_cents
    FROM d
    WHERE (best_cheaper IS NULL OR best_cheaper < p_size)
      AND best_same_price = p_size
    ORDER BY price_cents, p_partkey
    """,
    doc="2-D Pareto skyline (minimize price, maximize size): a part "
        "survives iff no strictly-cheaper part has size >= it and no "
        "same-price part has size > it — both tests are RANGE-frame "
        "running maxima over integer cents (RANGE on BIGINT keys "
        "behaves identically in both engines; peers enter the frame "
        "together, which is exactly the same-price tie semantics "
        "needed). Dominance collapses to two window passes instead "
        "of the naive O(n^2) self-join. The global order is over the "
        "part DIMENSION (catalog-sized, not fact-sized); a fact-"
        "scale skyline would range-partition on price first.",
)
def o5_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100.0).cast("long").alias(
            "price_cents"
        ),
    )
    w_cheaper = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_same = Window.partitionBy("price_cents")
    d = p.select(
        "p_partkey",
        "p_size",
        "price_cents",
        F.max("p_size").over(w_cheaper).alias("best_cheaper"),
        F.max("p_size").over(w_same).alias("best_same_price"),
    )
    return (
        d.filter(
            (F.col("best_cheaper").isNull()
             | (F.col("best_cheaper") < F.col("p_size")))
            & (F.col("best_same_price") == F.col("p_size"))
        )
        .select("p_partkey", "p_size", "price_cents")
        .orderBy("price_cents", "p_partkey")
    )


# --------------------------------------- fact-scale Pareto skyline
@register(
    "o6_skyline_fact",
    """
    WITH p AS (
      SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_cents,
             CAST(floor(max(l_quantity) + 0.5) AS BIGINT) AS best_qty
      FROM lineitem GROUP BY 1
    ), d AS (
      SELECT price_cents, best_qty,
             max(best_qty) OVER (
               ORDER BY price_cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_cheaper
      FROM p
    )
    SELECT price_cents, best_qty FROM d
    WHERE best_cheaper IS NULL OR best_cheaper < best_qty
    ORDER BY price_cents
    """,
    doc="FACT-scale 2-D Pareto skyline (minimize price, maximize "
        "quantity) over lineitem — the scale-safe sibling of "
        "o5_pareto_skyline (VERDICT r4 item #7). Same-price ties "
        "collapse in a partial-aggregated groupBy FIRST (distinct "
        "prices only survive), then the strictly-cheaper dominance "
        "test is operators.windows.global_running_max with "
        "exclusive=True: a bucketed two-pass running max — local "
        "window per contiguous price bucket (price_cents div 50000, "
        "a monotone coarsening, one hash exchange), prior-bucket "
        "maxima folded in via a broadcast triangle join. No "
        "single-partition window anywhere; the oracle stays the plain "
        "global ROWS-frame window because the two-pass values are "
        "identical for any bucketing.",
)
def o6_skyline_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = li.select(
        F.round(F.col("l_extendedprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
        "l_quantity",
    ).groupBy("price_cents").agg(
        F.floor(F.max("l_quantity") + 0.5).cast("long").alias("best_qty")
    )
    d = global_running_max(
        p,
        ["price_cents"],
        "best_qty",
        "best_cheaper",
        bucket=F.expr("CAST(price_cents div 50000 AS INT)"),
        exclusive=True,
    )
    return (
        d.filter(
            F.col("best_cheaper").isNull()
            | (F.col("best_cheaper") < F.col("best_qty"))
        )
        .select("price_cents", "best_qty")
        .orderBy("price_cents")
    )


# --------------------------------------- RFM / ABC / business days
# Classic warehouse analytics shapes. RFM cuts come from eight 1-row
# quantile thresholds broadcast over the customer frame (map-side
# CASE — no per-dimension ntile window); ABC reuses the two-pass
# global running sum; business-day latency is pure integer epoch-day
# arithmetic shared token-for-token by both engines.

# weekdays from the epoch anchor through day-index column s
# (s = epoch_days + 3, so s % 7 == 0 lands on Monday): five per full
# week plus the clipped remainder. Exact integers end to end.
def _wd_count(s: str) -> str:
    return (
        f"(5 * CAST((({s}) - (({s}) % 7)) / 7 AS BIGINT)"
        f" + least((({s}) % 7) + 1, 5))"
    )


_RFM_SEGMENT_SQL = (
    "CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 "
    "THEN 'champion' "
    "WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating' "
    "WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk' "
    "WHEN f_score >= 4 THEN 'loyal' "
    "WHEN m_score >= 4 THEN 'big_spender' "
    "ELSE 'regular' END"
)


@register(
    "orders_rfm_segments",
    f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(floor(floor(epoch(max(o_orderdate))) / 86400) AS BIGINT)
               AS last_day,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(round(sum(o_totalprice) * 100.0) AS BIGINT) AS mon_cents
      FROM orders GROUP BY o_custkey
    ), anchor AS (
      SELECT max(last_day) AS a_day FROM cust
    ), rfm AS (
      SELECT o_custkey, a_day - last_day AS rec_days, freq, mon_cents
      FROM cust, anchor
    ), th AS (
      SELECT quantile_cont(rec_days, 0.2) AS r1,
             quantile_cont(rec_days, 0.4) AS r2,
             quantile_cont(rec_days, 0.6) AS r3,
             quantile_cont(rec_days, 0.8) AS r4,
             quantile_cont(freq, 0.2) AS f1, quantile_cont(freq, 0.4) AS f2,
             quantile_cont(freq, 0.6) AS f3, quantile_cont(freq, 0.8) AS f4,
             quantile_cont(mon_cents, 0.2) AS m1,
             quantile_cont(mon_cents, 0.4) AS m2,
             quantile_cont(mon_cents, 0.6) AS m3,
             quantile_cont(mon_cents, 0.8) AS m4
      FROM rfm
    ), scored AS (
      SELECT o_custkey, rec_days, freq, mon_cents,
             CAST(CASE WHEN rec_days <= r1 THEN 5 WHEN rec_days <= r2 THEN 4
                  WHEN rec_days <= r3 THEN 3 WHEN rec_days <= r4 THEN 2
                  ELSE 1 END AS INT) AS r_score,
             CAST(CASE WHEN freq <= f1 THEN 1 WHEN freq <= f2 THEN 2
                  WHEN freq <= f3 THEN 3 WHEN freq <= f4 THEN 4
                  ELSE 5 END AS INT) AS f_score,
             CAST(CASE WHEN mon_cents <= m1 THEN 1 WHEN mon_cents <= m2
                  THEN 2 WHEN mon_cents <= m3 THEN 3 WHEN mon_cents <= m4
                  THEN 4 ELSE 5 END AS INT) AS m_score
      FROM rfm, th
    )
    SELECT o_custkey, rec_days, freq, mon_cents,
           r_score, f_score, m_score,
           {_RFM_SEGMENT_SQL} AS segment
    FROM scored
    ORDER BY o_custkey
    """,
    doc="RFM customer segmentation: recency/frequency/monetary per "
        "customer (one orders groupBy), quintile scores from EIGHT "
        "one-row quantile thresholds broadcast back (map-side CASE — "
        "no ntile window over the customer frame, which is fact-"
        "sized at scale), and a priority-ordered segment label CASE "
        "shared as one SQL text. Thresholds interpolate integers, so "
        "both engines compare identical doubles against exact "
        "BIGINTs.",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.floor(F.unix_timestamp(F.max("o_orderdate")) / 86400)
        .cast("long")
        .alias("last_day"),
        F.count("*").cast("long").alias("freq"),
        F.round(F.sum("o_totalprice") * 100.0).cast("long").alias(
            "mon_cents"
        ),
    )
    anchor = cust.agg(F.max("last_day").alias("a_day"))
    rfm = cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        (F.col("a_day") - F.col("last_day")).alias("rec_days"),
        "freq",
        "mon_cents",
    )
    th = rfm.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{a}{i}")
            for c, a in (("rec_days", "r"), ("freq", "f"),
                         ("mon_cents", "m"))
            for i, q in ((1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
        ]
    )
    scored = rfm.crossJoin(F.broadcast(th)).selectExpr(
        "o_custkey",
        "rec_days",
        "freq",
        "mon_cents",
        "CAST(CASE WHEN rec_days <= r1 THEN 5 WHEN rec_days <= r2 THEN 4"
        " WHEN rec_days <= r3 THEN 3 WHEN rec_days <= r4 THEN 2"
        " ELSE 1 END AS INT) AS r_score",
        "CAST(CASE WHEN freq <= f1 THEN 1 WHEN freq <= f2 THEN 2"
        " WHEN freq <= f3 THEN 3 WHEN freq <= f4 THEN 4"
        " ELSE 5 END AS INT) AS f_score",
        "CAST(CASE WHEN mon_cents <= m1 THEN 1 WHEN mon_cents <= m2"
        " THEN 2 WHEN mon_cents <= m3 THEN 3 WHEN mon_cents <= m4"
        " THEN 4 ELSE 5 END AS INT) AS m_score",
    )
    return scored.selectExpr(
        "o_custkey", "rec_days", "freq", "mon_cents",
        "r_score", "f_score", "m_score",
        f"{_RFM_SEGMENT_SQL} AS segment",
    ).orderBy("o_custkey")


@register(
    "a20_abc_classification",
    """
    WITH pv AS (
      SELECT l_partkey,
             CAST(round(sum(l_extendedprice) * 100.0) AS BIGINT)
               AS value_cents
      FROM lineitem GROUP BY l_partkey
    ), cum AS (
      SELECT l_partkey, value_cents,
             sum(value_cents) OVER (
               ORDER BY value_cents DESC, l_partkey
               ROWS UNBOUNDED PRECEDING) AS cum_cents,
             sum(value_cents) OVER () AS tot_cents
      FROM pv
    )
    SELECT l_partkey, value_cents, CAST(cum_cents AS BIGINT) AS cum_cents,
           CASE WHEN cum_cents * 10 <= tot_cents * 7 THEN 'A'
                WHEN cum_cents * 10 <= tot_cents * 9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum
    ORDER BY value_cents DESC, l_partkey
    """,
    doc="ABC inventory classification (Pareto 70/90 revenue cuts): "
        "per-part revenue, cumulative share in descending-value "
        "order, class boundaries as exact integer inequalities "
        "(cum*10 vs tot*7 / tot*9). The cumulative sum reuses "
        "operators.windows.global_running_sum (range split + "
        "broadcast offsets) rather than a single-partition window, "
        "and the grand total is a 1-row broadcast — the ranking "
        "scales to a fact-sized part dimension.",
)
def a20_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.windows import (
        global_running_sum,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    pv = li.groupBy("l_partkey").agg(
        F.round(F.sum("l_extendedprice") * 100.0)
        .cast("long")
        .alias("value_cents")
    ).withColumn("neg_value", -F.col("value_cents"))
    cum = global_running_sum(
        pv,
        order_cols=["neg_value", "l_partkey"],
        value_col="value_cents",
        out_col="cum_cents",
    )
    tot = pv.agg(F.sum("value_cents").cast("long").alias("tot_cents"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .selectExpr(
            "l_partkey",
            "value_cents",
            "CAST(cum_cents AS BIGINT) AS cum_cents",
            "CASE WHEN cum_cents * 10 <= tot_cents * 7 THEN 'A'"
            " WHEN cum_cents * 10 <= tot_cents * 9 THEN 'B'"
            " ELSE 'C' END AS abc_class",
        )
        .orderBy(F.col("value_cents").desc(), F.col("l_partkey").asc())
    )


@register(
    "f22_business_days",
    f"""
    WITH d AS (
      SELECT CAST(floor(floor(epoch(o_orderdate)) / 86400) AS BIGINT) + 3
               AS so,
             CAST(floor(floor(epoch(l_shipdate)) / 86400) AS BIGINT) + 3
               AS ss
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    )
    SELECT CAST({_wd_count('ss')} - {_wd_count('so')} AS BIGINT)
             AS bus_days,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM d
    GROUP BY bus_days
    ORDER BY bus_days
    """,
    doc="Business-day shipping latency histogram: weekdays strictly "
        "after the order date through the ship date, computed as the "
        "difference of a closed-form weekday prefix count "
        "f(s) = 5*(s div 7) + min(s%7 + 1, 5) on Monday-anchored "
        "epoch-day indices — ONE shared integer formula in both "
        "engines, no calendar table and no dayofweek() (whose "
        "numbering conventions differ across engines). Map-side "
        "expression + a histogram-cardinality agg.",
)
def f22_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        (F.floor(F.unix_timestamp("o_orderdate") / 86400).cast("long") + 3)
        .alias("so"),
        (F.floor(F.unix_timestamp("l_shipdate") / 86400).cast("long") + 3)
        .alias("ss"),
    )
    return (
        d.selectExpr(
            f"CAST({_wd_count('ss')} - {_wd_count('so')} AS BIGINT)"
            " AS bus_days"
        )
        .groupBy("bus_days")
        .agg(F.count("*").cast("long").alias("n_lines"))
        .orderBy("bus_days")
    )


# --------------------------------------- governance / quality audits
# Operational data-contract checks as first-class queries: the gate a
# production warehouse runs before publishing a snapshot. Every check
# reduces to anti-join or group-count cardinalities — exact integers,
# dimension sides broadcast, one pass per fact table.


@register(
    "audit_referential_integrity",
    """
    SELECT 'orders.o_custkey->customer' AS fk, CAST(count(*) AS BIGINT)
             AS violations
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem.l_partkey->part', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'customer.c_nationkey->nation', CAST(count(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'orders.o_orderkey unique', CAST(count(*) AS BIGINT)
    FROM (SELECT o_orderkey FROM orders
          GROUP BY o_orderkey HAVING count(*) > 1)
    ORDER BY fk
    """,
    doc="Referential-integrity audit across the star schema: orphan "
        "counts for every foreign key (NOT EXISTS as left-anti "
        "joins — strategy AQE-decided for the SF-scaling key sets, "
        "broadcast for nation; the orders->lineitem leg "
        "co-shuffles) plus "
        "a primary-key uniqueness check, one labeled row per "
        "contract. The publish gate a warehouse runs before a "
        "snapshot goes live; each leg is a single partial-agg pass.",
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    def _cnt(df, label):
        return df.agg(F.count("*").cast("long").alias("violations")).select(
            F.lit(label).alias("fk"), "violations"
        )

    checks = [
        # customer/part/supplier key sets scale with SF — their anti
        # joins are AQE-decided, not hinted (r7 #1); only the nation
        # leg below keeps its broadcast (bounded dim)
        _cnt(
            o.join(
                c.select(F.col("c_custkey").alias("o_custkey")),
                "o_custkey", "left_anti",
            ),
            "orders.o_custkey->customer",
        ),
        _cnt(
            li.join(
                o.select(F.col("o_orderkey").alias("l_orderkey")),
                "l_orderkey", "left_anti",
            ),
            "lineitem.l_orderkey->orders",
        ),
        _cnt(
            li.join(
                p.select(F.col("p_partkey").alias("l_partkey")),
                "l_partkey", "left_anti",
            ),
            "lineitem.l_partkey->part",
        ),
        _cnt(
            li.join(
                su.select(F.col("s_suppkey").alias("l_suppkey")),
                "l_suppkey", "left_anti",
            ),
            "lineitem.l_suppkey->supplier",
        ),
        _cnt(
            c.join(
                F.broadcast(
                    n.select(F.col("n_nationkey").alias("c_nationkey"))
                ),
                "c_nationkey", "left_anti",
            ),
            "customer.c_nationkey->nation",
        ),
        _cnt(
            o.groupBy("o_orderkey").agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > 1),
            "orders.o_orderkey unique",
        ),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out.orderBy("fk")


@register(
    "audit_k_anonymity",
    """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS k,
             CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                      WHEN c_acctbal < 5000 THEN 'mid'
                                      ELSE 'high' END) AS BIGINT) AS l_div
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, k, l_div,
           CAST(CASE WHEN k < 5 THEN 1 ELSE 0 END AS INT)
             AS k_violation,
           CAST(CASE WHEN l_div < 2 THEN 1 ELSE 0 END AS INT)
             AS l_violation
    FROM qi
    ORDER BY c_nationkey, c_mktsegment
    """,
    doc="k-anonymity / l-diversity privacy audit over the "
        "(nationkey, mktsegment) quasi-identifier: equivalence-class "
        "sizes (k < 5 flags re-identifiable groups) and the diversity "
        "of the sensitive balance band within each class (l < 2 means "
        "the class leaks the attribute). One groupBy with a distinct "
        "agg — the pre-release check for sharing a derived customer "
        "table.",
)
def audit_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", band.alias("__band")
    )
    qi = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("k"),
        F.countDistinct("__band").cast("long").alias("l_div"),
    )
    return qi.select(
        "c_nationkey",
        "c_mktsegment",
        "k",
        "l_div",
        F.when(F.col("k") < 5, 1).otherwise(0).cast("int").alias(
            "k_violation"
        ),
        F.when(F.col("l_div") < 2, 1).otherwise(0).cast("int").alias(
            "l_violation"
        ),
    ).orderBy("c_nationkey", "c_mktsegment")


# ------------------------------------------- seasonal index
@register(
    "orders_seasonal_index",
    """
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mo,
             CAST(round(sum(o_totalprice) * 100.0) AS BIGINT) AS cents
      FROM orders GROUP BY yr, mo
    ), by_month AS (
      SELECT mo, CAST(sum(cents) AS BIGINT) AS mo_cents,
             CAST(count(*) AS BIGINT) AS mo_n
      FROM monthly GROUP BY mo
    ), overall AS (
      SELECT CAST(sum(cents) AS BIGINT) AS all_cents,
             CAST(count(*) AS BIGINT) AS all_n
      FROM monthly
    )
    SELECT mo, mo_cents, mo_n,
           CAST(round(1000000.0 * mo_cents * all_n
                      / (mo_n * all_cents)) AS BIGINT) AS index_e6
    FROM by_month, overall
    ORDER BY mo
    """,
    doc="Seasonal demand index: average monthly revenue per calendar "
        "month vs the all-months average, as ONE rational of exact "
        "integer cents/counts (mo_cents*all_n / (mo_n*all_cents)) "
        "rounded once to e6 — index 1e6 = an average month. Two "
        "nested partial aggs collapse the fact table to <= 12 rows "
        "before the 1-row broadcast; the demand-planning twin of the "
        "trailing-window anomaly entry.",
)
def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = load_table(spark, sf_dir, "orders").groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(
        F.round(F.sum("o_totalprice") * 100.0).cast("long").alias("cents")
    )
    by_month = monthly.groupBy("mo").agg(
        F.sum("cents").cast("long").alias("mo_cents"),
        F.count("*").cast("long").alias("mo_n"),
    )
    overall = monthly.agg(
        F.sum("cents").cast("long").alias("all_cents"),
        F.count("*").cast("long").alias("all_n"),
    )
    return (
        by_month.crossJoin(F.broadcast(overall))
        .selectExpr(
            "mo", "mo_cents", "mo_n",
            "CAST(round(1000000.0 * mo_cents * all_n"
            " / (mo_n * all_cents)) AS BIGINT) AS index_e6",
        )
        .orderBy("mo")
    )


# ------------------------------------------- unpivot / melt
@register(
    "a22_unpivot_melt",
    """
    WITH wide AS (
      SELECT c_nationkey,
             CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
                           THEN 1 ELSE 0 END) AS BIGINT) AS building,
             CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                           THEN 1 ELSE 0 END) AS BIGINT) AS automobile,
             CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'
                           THEN 1 ELSE 0 END) AS BIGINT) AS machinery
      FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, seg, n FROM (
      SELECT c_nationkey, 'building' AS seg, building AS n FROM wide
      UNION ALL
      SELECT c_nationkey, 'automobile', automobile FROM wide
      UNION ALL
      SELECT c_nationkey, 'machinery', machinery FROM wide
    )
    WHERE n > 0
    ORDER BY c_nationkey, seg
    """,
    doc="Unpivot/melt — the inverse reshape of a17's pivot: a wide "
        "per-nation segment-count matrix melts back to long "
        "(nation, segment, n) rows via stack() (one generator "
        "expression per row, no shuffle beyond the original agg; the "
        "oracle spells the same reshape as a UNION ALL). Zero-count "
        "cells drop, mirroring sparse long form.",
)
def a22_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    wide = c.groupBy("c_nationkey").agg(
        *[
            F.sum(
                F.when(F.col("c_mktsegment") == seg.upper(), 1).otherwise(0)
            )
            .cast("long")
            .alias(seg)
            for seg in ("building", "automobile", "machinery")
        ]
    )
    melted = wide.selectExpr(
        "c_nationkey",
        "stack(3, 'building', building, 'automobile', automobile,"
        " 'machinery', machinery) AS (seg, n)",
    )
    return melted.filter(F.col("n") > 0).orderBy("c_nationkey", "seg")


# ------------------------------------------- k-fold cross-validation
# Model-selection discipline for the in-engine closed-form
# regression: 5 md5 folds; each fold's TRAIN moments are the global
# moments minus the fold's own (one groupBy + one broadcast — no
# 5x recompute), the per-fold slope/intercept are shared-text
# rationals of those exact integers, and the held-out squared errors
# quantize to integer milli-units before summation.
_CV_SLOPE = (
    "((CAST(tn AS DOUBLE) * txy - CAST(tx AS DOUBLE) * ty)"
    " / (CAST(tn AS DOUBLE) * txx - CAST(tx AS DOUBLE) * tx))"
)
_CV_ICEPT = (
    f"((CAST(ty AS DOUBLE) - {_CV_SLOPE} * tx) / CAST(tn AS DOUBLE))"
)


@register(
    "ml_kfold_cv",
    f"""
    WITH xy AS (
      SELECT o_orderkey,
             CAST(length(CAST(o_orderkey AS VARCHAR)) AS BIGINT)
               AS unused,
             CAST(ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))
                  % 5 AS INTEGER) AS fold,
             CAST(o_custkey % 97 AS BIGINT) AS x,
             CAST(round(o_totalprice) AS BIGINT) AS y
      FROM orders
    ), fm AS (
      SELECT fold, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM xy GROUP BY fold
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS gn, CAST(sum(sx) AS BIGINT) AS gx,
             CAST(sum(sy) AS BIGINT) AS gy,
             CAST(sum(sxx) AS BIGINT) AS gxx,
             CAST(sum(sxy) AS BIGINT) AS gxy
      FROM fm
    ), train AS (
      SELECT fold, gn - n AS tn, gx - sx AS tx, gy - sy AS ty,
             gxx - sxx AS txx, gxy - sxy AS txy
      FROM fm, tot
    ), coef AS (
      SELECT fold, {_CV_SLOPE} AS slope, {_CV_ICEPT} AS icept
      FROM train
    ), scored AS (
      SELECT xy.fold,
             CAST(round((xy.y - (coef.slope * xy.x + coef.icept))
                        * (xy.y - (coef.slope * xy.x + coef.icept))
                        * 1000.0) AS BIGINT) AS se_milli
      FROM xy JOIN coef ON coef.fold = xy.fold
    )
    SELECT fold, CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(se_milli) AS BIGINT) AS sse_milli
    FROM scored
    GROUP BY fold
    ORDER BY fold
    """,
    doc="5-fold cross-validation of the closed-form regression "
        "(order total vs a customer-key feature): md5 fold "
        "assignment, TRAIN moments computed as global-minus-fold "
        "(one integer groupBy + a 1-row broadcast instead of k "
        "refits), per-fold coefficients as shared-text rationals, "
        "held-out squared errors rounded once to milli-units before "
        "the exact per-fold sums. The CV harness costs two passes "
        "over the fact regardless of k.",
)
def ml_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    xy = load_table(spark, sf_dir, "orders").selectExpr(
        "CAST(ascii(substr(md5(CAST(o_orderkey AS STRING)), 1, 1))"
        " % 5 AS INT) AS fold",
        "CAST(o_custkey % 97 AS BIGINT) AS x",
        "CAST(round(o_totalprice) AS BIGINT) AS y",
    )
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    # the 5-row moment frame feeds BOTH the global total and the
    # per-fold train arithmetic — persist it so the moment pass scans
    # the fact exactly once (two fact passes total, any k)
    fm = persist_tracked(
        xy.groupBy("fold").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    tot = fm.agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum("sx").cast("long").alias("gx"),
        F.sum("sy").cast("long").alias("gy"),
        F.sum("sxx").cast("long").alias("gxx"),
        F.sum("sxy").cast("long").alias("gxy"),
    )
    coef = (
        fm.crossJoin(F.broadcast(tot))
        .selectExpr(
            "fold",
            "gn - n AS tn", "gx - sx AS tx", "gy - sy AS ty",
            "gxx - sxx AS txx", "gxy - sxy AS txy",
        )
        .selectExpr(
            "fold", f"{_CV_SLOPE} AS slope", f"{_CV_ICEPT} AS icept"
        )
    )
    scored = xy.join(F.broadcast(coef), "fold").selectExpr(
        "fold",
        "CAST(round((y - (slope * x + icept))"
        " * (y - (slope * x + icept)) * 1000.0) AS BIGINT) AS se_milli",
    )
    return (
        scored.groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum("se_milli").cast("long").alias("sse_milli"),
        )
        .orderBy("fold")
    )


# ------------------------------------------- HHI concentration
@register(
    "supplier_hhi_concentration",
    """
    WITH sv AS (
      SELECT l_suppkey,
             CAST(round(sum(l_extendedprice) * 100.0) AS BIGINT)
               AS cents
      FROM lineitem GROUP BY l_suppkey
    ), tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS total FROM sv
    ), shares AS (
      SELECT l_suppkey,
             CAST(round(1000000.0 * cents / total) AS BIGINT) AS share_e6
      FROM sv, tot
    )
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(max(share_e6) AS BIGINT) AS top_share_e6,
           CAST(sum(share_e6 * share_e6) AS BIGINT) AS hhi_e12
    FROM shares
    """,
    doc="Herfindahl-Hirschman supplier concentration: revenue shares "
        "quantized once to e6, HHI as the exact integer sum of "
        "squared shares (e12 units; 0.25e12 is the high-concentration "
        "bar scaled). One supplier-keyed agg + a 1-row broadcast — "
        "procurement-risk analytics on the same machinery as the "
        "Gini/ABC entries.",
)
def supplier_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    sv = load_table(spark, sf_dir, "lineitem").groupBy("l_suppkey").agg(
        F.round(F.sum("l_extendedprice") * 100.0)
        .cast("long")
        .alias("cents")
    )
    tot = sv.agg(F.sum("cents").cast("long").alias("total"))
    shares = sv.crossJoin(F.broadcast(tot)).selectExpr(
        "l_suppkey",
        "CAST(round(1000000.0 * cents / total) AS BIGINT) AS share_e6",
    )
    return shares.agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.max("share_e6").cast("long").alias("top_share_e6"),
        F.sum(F.col("share_e6") * F.col("share_e6"))
        .cast("long")
        .alias("hhi_e12"),
    )


# ------------------------------------------- customer migration
_MIG_SEG_SQL = (
    "CASE WHEN n <= t1 THEN 'low' WHEN n <= t2 THEN 'mid'"
    " ELSE 'high' END"
)


@register(
    "orders_segment_migration",
    f"""
    WITH half AS (
      SELECT CAST(quantile_cont(CAST(floor(epoch(o_orderdate))
                                     AS BIGINT), 0.5) AS DOUBLE) AS mid
      FROM orders
    ), counts AS (
      SELECT o_custkey,
             CASE WHEN CAST(floor(epoch(o_orderdate)) AS BIGINT) <= mid
                  THEN 'a' ELSE 'b' END AS half_id,
             CAST(count(*) AS BIGINT) AS n
      FROM orders, half
      GROUP BY o_custkey, half_id
    ), th AS (
      SELECT half_id,
             quantile_cont(n, CAST('0.3333' AS DOUBLE)) AS t1,
             quantile_cont(n, CAST('0.6667' AS DOUBLE)) AS t2
      FROM counts GROUP BY half_id
    ), seg AS (
      SELECT o_custkey, c.half_id, {_MIG_SEG_SQL} AS seg
      FROM counts c JOIN th ON th.half_id = c.half_id
    ), mat AS (
      SELECT coalesce(a.seg, 'none') AS seg_before,
             coalesce(b.seg, 'none') AS seg_after
      FROM (SELECT o_custkey, seg FROM seg WHERE half_id = 'a') a
      FULL OUTER JOIN
           (SELECT o_custkey, seg FROM seg WHERE half_id = 'b') b
        ON b.o_custkey = a.o_custkey
    )
    SELECT seg_before, seg_after, CAST(count(*) AS BIGINT) AS n_cust
    FROM mat
    GROUP BY seg_before, seg_after
    ORDER BY seg_before, seg_after
    """,
    doc="Customer segment-migration matrix: order-frequency terciles "
        "in the first vs second half of the history (median epoch "
        "split + per-half tercile thresholds, each a tiny broadcast), "
        "full-outer joined per customer so appearing/churning "
        "customers land in the 'none' row/column — the CRM migration "
        "report. Thresholds interpolate exact integers, the segment "
        "CASE is one shared text, and the matrix is <= 16 cells.",
)
def orders_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_timestamp("o_orderdate").cast("long").alias("ep"),
    )
    half = orders.agg(F.expr("percentile(ep, 0.5)").alias("mid"))
    counts = (
        orders.crossJoin(F.broadcast(half))
        .select(
            "o_custkey",
            F.when(F.col("ep") <= F.col("mid"), "a")
            .otherwise("b")
            .alias("half_id"),
        )
        .groupBy("o_custkey", "half_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    th = counts.groupBy("half_id").agg(
        F.expr("percentile(n, CAST('0.3333' AS DOUBLE))").alias("t1"),
        F.expr("percentile(n, CAST('0.6667' AS DOUBLE))").alias("t2"),
    )
    seg = counts.join(F.broadcast(th), "half_id").selectExpr(
        "o_custkey", "half_id", f"{_MIG_SEG_SQL} AS seg"
    )
    a = seg.filter(F.col("half_id") == "a").select(
        "o_custkey", F.col("seg").alias("seg_a")
    )
    b = seg.filter(F.col("half_id") == "b").select(
        F.col("o_custkey").alias("bk"), F.col("seg").alias("seg_b")
    )
    mat = a.join(b, a.o_custkey == b.bk, "full_outer").select(
        F.coalesce("seg_a", F.lit("none")).alias("seg_before"),
        F.coalesce("seg_b", F.lit("none")).alias("seg_after"),
    )
    return (
        mat.groupBy("seg_before", "seg_after")
        .agg(F.count("*").cast("long").alias("n_cust"))
        .orderBy("seg_before", "seg_after")
    )


# ------------------------------------------------ LATERAL top-k
@register(
    "j18_lateral_topk",
    """
    SELECT n_name, c.c_name, c.acctbal_cents
    FROM nation, LATERAL (
      SELECT c_name,
             CAST(round(c_acctbal * 100.0) AS BIGINT) AS acctbal_cents
      FROM customer WHERE c_nationkey = n_nationkey
      ORDER BY acctbal_cents DESC, c_name ASC LIMIT 2) c
    ORDER BY n_name ASC, acctbal_cents DESC, c_name ASC
    """,
    doc="Correlated LATERAL subquery with per-row ORDER BY + LIMIT — "
        "the top-2 customers by account balance per nation, written "
        "as the SQL-standard lateral join in BOTH engines (Spark 4 "
        "supports correlated lateral subqueries; its optimizer "
        "rewrites the per-nation top-k into a join + per-key limit "
        "rather than executing the subquery per outer row). "
        "Deterministic inner ordering (cents desc, name asc) makes "
        "the LIMIT cut reproducible. Same result as a row_number "
        "window, but exercises the decorrelation path the "
        "window-function rewrite never touches.",
)
def j18_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "__j18_nation"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "__j18_customer"
    )
    return spark.sql(
        """
        SELECT n_name, c.c_name, c.acctbal_cents
        FROM __j18_nation, LATERAL (
          SELECT c_name,
                 CAST(round(c_acctbal * 100.0) AS BIGINT)
                   AS acctbal_cents
          FROM __j18_customer WHERE c_nationkey = n_nationkey
          ORDER BY acctbal_cents DESC, c_name ASC LIMIT 2) c
        ORDER BY n_name ASC, acctbal_cents DESC, c_name ASC
        """
    )


# ------------------------------------------- multi-distinct aggregate
@register(
    "a23_multi_distinct",
    """
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m'))
                AS BIGINT) AS n_months,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC
    """,
    doc="Multiple exact COUNT(DISTINCT) columns over DIFFERENT keys "
        "in one aggregate — Spark plans this with the Expand "
        "operator (each input row is replicated once per distinct "
        "group with the other keys nulled, then two agg passes), the "
        "one aggregation shape none of the other entries exercise. "
        "The plain count/sum ride along in the same Expand pass. "
        "Month keys format identically via date_format/strftime on "
        "the UTC-pinned session.",
)
def a23_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_custs"),
            F.countDistinct(
                F.date_format("o_orderdate", "yyyy-MM")
            )
            .cast("long")
            .alias("n_months"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100.0).cast("long")
            )
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy(F.col("o_orderpriority").asc())
    )


# ---------------------------------------- full-frame value windows
@register(
    "w11_value_frames",
    """
    WITH ev AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             CAST(round(value * 100.0) AS BIGINT) AS cents,
             ts, event_id
      FROM events WHERE event_type = 'purchase'
    ), framed AS (
      SELECT user_id, day,
             count(*) OVER w AS n_events,
             first_value(cents) OVER w AS first_cents,
             last_value(cents) OVER w AS last_cents,
             nth_value(cents, 2) OVER w AS second_cents,
             row_number() OVER (PARTITION BY user_id, day
                                ORDER BY ts, event_id) AS rn
      FROM ev
      WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
           first_cents, last_cents, second_cents
    FROM framed WHERE rn = 1
    ORDER BY user_id, day
    """,
    doc="first_value / last_value / nth_value over an explicit "
        "UNBOUNDED-to-UNBOUNDED ROWS frame — the window-frame surface "
        "none of the running-sum entries touch (last_value under the "
        "DEFAULT frame is the current row, the classic frame bug; "
        "the explicit full frame is the correct spelling in both "
        "engines). Per (user, day) purchase session: first, last and "
        "second value in deterministic (ts, event_id) order, one "
        "row kept per partition via row_number. second_cents is NULL "
        "for single-event days in both engines.",
)
def w11_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.round(F.col("value") * 100.0).cast("long").alias("cents"),
            "ts",
            "event_id",
        )
    )
    full = (
        Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    framed = ev.select(
        "user_id",
        "day",
        F.count("*").over(full).cast("long").alias("n_events"),
        F.first("cents").over(full).alias("first_cents"),
        F.last("cents").over(full).alias("last_cents"),
        F.nth_value("cents", 2).over(full).alias("second_cents"),
        F.row_number().over(seq).alias("rn"),
    )
    return (
        framed.filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id", "day")
    )


# ------------------------------------------------ calendar functions
@register(
    "f23_calendar_functions",
    """
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')
             AS plus3m,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    doc="Calendar-function parity surface: quarter, last_day (month "
        "end), add_months(+3) — including the end-of-month clamp "
        "both engines apply — ISO week number (Spark weekofyear == "
        "DuckDB weekofyear, both ISO-8601), and day-of-year. Dates "
        "render as strings so the hash compares calendar results, "
        "not epoch micros. Pure per-row projection, zero shuffle; "
        "the dayofweek() Sun=1-vs-Sun=0 dialect trap documented in "
        "f22 is exactly why THIS set is the safe calendar surface.",
)
def f23_calendar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
            "plus3m"
        ),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------- SQL pipe syntax
@register(
    "sql_pipe_syntax",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
             * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="SQL pipe syntax (Spark 4.0 |> operators, SPARK-49555): the "
        "Q1-shaped pricing rollup written as a linear FROM |> WHERE "
        "|> EXTEND |> AGGREGATE |> ORDER BY pipeline — each stage "
        "consumes the previous one top-to-bottom, the form ETL "
        "authors read in data order instead of inside-out SQL. "
        "Catalyst plans it identically to the nested form (same "
        "partial-agg + exchange), which the oracle (classic SQL, "
        "DuckDB has no pipe parser) proves value-for-value. Revenue "
        "pre-quantized per ROW to cents via floor (the q9 rule: "
        "floor of identical doubles is exact; round-of-sum is not).",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "pipe_lineitem"
    )
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> EXTEND CAST(floor(l_extendedprice * (1.0 - l_discount)
             * 100.0 + 0.5) AS BIGINT) AS rev_cents_row
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rev_cents_row) AS BIGINT) AS rev_cents
             GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


# ------------------------------------------ boolean/conditional aggs
@register(
    "a24_boolean_aggregates",
    """
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 150000.0) AS BIGINT)
             AS n_large,
           bool_and(o_totalprice > 900.0) AS all_above_floor,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Boolean/conditional aggregate surface: count_if, bool_and, "
        "bool_or — spelled IDENTICALLY in Spark SQL and DuckDB (both "
        "engines alias every/any onto bool_and/bool_or; count_if "
        "avoids the sum(CASE) HUGEINT export trap entirely since it "
        "returns BIGINT natively in Spark). All three fold into the "
        "same partial-aggregate pipeline as count/min/max — one "
        "exchange on the group key, and the boolean lattice "
        "(and=min, or=max) makes map-side combine exact.",
)
def a24_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("count_if(o_totalprice > 150000.0)")
            .cast("long")
            .alias("n_large"),
            F.expr("bool_and(o_totalprice > 900.0)").alias(
                "all_above_floor"
            ),
            F.expr("bool_or(o_orderstatus = 'F')").alias("any_finished"),
            F.countDistinct("o_orderstatus")
            .cast("long")
            .alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


# ------------------------------------ null-safe join + FILTER clause
@register(
    "j19_null_safe_join",
    """
    WITH a AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_custkey % 10 END AS bucket
      FROM orders
    ), b AS (
      SELECT DISTINCT bucket,
             coalesce('b' || CAST(bucket AS VARCHAR), 'unassigned')
               AS bucket_label
      FROM a
    )
    SELECT b.bucket_label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE a.o_totalprice > 150000.0)
             AS BIGINT) AS n_large,
           CAST(sum(CAST(floor(a.o_totalprice * 100.0 + 0.5) AS BIGINT))
             FILTER (WHERE a.o_orderkey % 2 = 0) AS BIGINT)
             AS even_cents
    FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
    GROUP BY b.bucket_label
    ORDER BY b.bucket_label
    """,
    doc="Null-safe equi-join (Spark <=> / SQL IS NOT DISTINCT FROM) "
        "plus the FILTER clause on aggregates — two surfaces a "
        "dimensional model with an 'unassigned' bucket needs "
        "constantly: rows with a NULL key must MATCH the NULL dim "
        "row (a plain = join silently drops them — the classic "
        "lost-fact bug), and per-group conditional aggregates read "
        "as declared filters instead of sum(CASE) (also dodging the "
        "HUGEINT export trap for counts). Spark plans <=> as a "
        "regular hash join on a null-safe key — still one exchange, "
        "broadcastable dim side.",
)
def j19_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_custkey") % 10)
        .alias("bucket"),
    )
    b = a.select("bucket").distinct().select(
        "bucket",
        F.coalesce(
            F.concat(F.lit("b"), F.col("bucket").cast("string")),
            F.lit("unassigned"),
        ).alias("bucket_label"),
    )
    return (
        a.join(
            F.broadcast(b), a["bucket"].eqNullSafe(b["bucket"])
        )
        .groupBy("bucket_label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr(
                "count(*) FILTER (WHERE o_totalprice > 150000.0)"
            )
            .cast("long")
            .alias("n_large"),
            F.expr(
                "sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))"
                " FILTER (WHERE o_orderkey % 2 = 0)"
            )
            .cast("long")
            .alias("even_cents"),
        )
        .orderBy("bucket_label")
    )


# ------------------------------------------- collated grouping (Spark 4)
# Spark 4 string collations (SPARK-46830): a UTF8_LCASE-collated key
# makes grouping/joins case-insensitive INSIDE the engine — the hash
# exchange itself uses the collation-aware key, so no lower()
# projection materializes and downstream consumers keep the original
# strings. DuckDB has no collated grouping, so the oracle is the
# lower()-key twin; the mixed-case synthesis is ONE shared SQL text
# (initcap spelled portably as upper(substr(x,1,1)) || substr(x,2) —
# DuckDB has no initcap). n_case_variants pins that the engine really
# merged distinct binary strings (3 variants per type), not
# pre-lowered input.
_MIXED_CASE_SQL = (
    "CASE CAST(event_id % 3 AS INT) WHEN 0 THEN upper(event_type) "
    "WHEN 1 THEN upper(substr(event_type, 1, 1)) || "
    "substr(event_type, 2) ELSE event_type END"
)


@register(
    "f24_collated_grouping",
    f"""
    SELECT lower(et_mixed) AS event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT et_mixed) AS BIGINT) AS n_case_variants
    FROM (SELECT {_MIXED_CASE_SQL} AS et_mixed FROM events)
    GROUP BY lower(et_mixed)
    """,
    doc="Case-insensitive aggregation via a UTF8_LCASE collated "
        "grouping key (Spark 4 collations) over deterministically "
        "mixed-cased event types; the oracle is the classic "
        "lower()-key twin. n_case_variants = 3 proves the collation "
        "merged distinct binary strings. The collated key rides the "
        "normal hash exchange — no extra projection, same shuffle "
        "shape as any groupBy.",
)
def f24_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(_MIXED_CASE_SQL).alias("et_mixed")
    )
    return (
        ev.groupBy(
            F.expr("collate(et_mixed, 'UTF8_LCASE')").alias("k")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("et_mixed").cast("long").alias(
                "n_case_variants"
            ),
        )
        .select(
            F.expr("collate(lower(k), 'UTF8_BINARY')").alias("event_type"),
            "n_events",
            "n_case_variants",
        )
    )


# --------------------------- SQL session variables + named parameters
@register(
    "sql_session_variables",
    """
    WITH cut AS (
      SELECT max(o_totalprice) * 0.5 AS price_cut FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_hi,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS cents_hi
    FROM orders, cut
    WHERE o_totalprice > price_cut AND o_orderstatus <> 'P'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="SQL session variables (Spark 4, SPARK-46908: DECLARE / SET "
        "VARIABLE) + named-parameter spark.sql (SPARK-44140): the "
        "config-driven trigger-threshold pattern of the reference "
        "(forecast_process.py reads EAP trigger levels from config, "
        "not literals in the query). The cutoff variable is SET from "
        "a scalar subquery — max(o_totalprice) * 0.5, exact in IEEE "
        "doubles in both engines (max is order-independent, *0.5 is "
        "a power of two) so the variable-fed filter is boundary-safe; "
        "the excluded status arrives as a named :excluded parameter. "
        "The oracle inlines both as a CTE — variables are a session "
        "surface, not a plan shape: the filter + agg plan is "
        "identical to the literal form.",
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "var_orders"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE price_cut DOUBLE")
    spark.sql(
        "SET VARIABLE price_cut = "
        "(SELECT max(o_totalprice) * 0.5 FROM var_orders)"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_hi,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                    AS BIGINT)) AS BIGINT) AS cents_hi
        FROM var_orders
        WHERE o_totalprice > price_cut AND o_orderstatus <> :excluded
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"excluded": "P"},
    )


# ------------------------------- SQL scripting (BEGIN / WHILE / END)
@register(
    "sql_scripting_threshold_search",
    """
    WITH mx AS (
      SELECT CAST(ceil(max(o_totalprice) / 100000.0) AS BIGINT)
             * 100000 AS rung
      FROM orders
    )
    SELECT CAST(rung AS BIGINT) AS first_empty_rung,
           CAST((SELECT count(*) FROM orders, mx
                 WHERE o_totalprice > rung - 100000.0)
                AS BIGINT) AS n_top_band,
           CAST((SELECT sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                      AS BIGINT))
                 FROM orders, mx
                 WHERE o_totalprice > rung - 100000.0)
                AS BIGINT) AS cents_top_band
    FROM mx
    """,
    doc="SQL scripting (Spark 4, SPARK-48338: BEGIN/END compound "
        "statements, DECLARE locals, WHILE with a scalar-subquery "
        "SET): a procedural rung search — raise the trigger rung in "
        "100k steps until no order exceeds it, then report the top "
        "band — the imperative loop the reference writes in driver "
        "Python around every trigger ladder (forecast_process.py "
        "per-level loops). The declarative oracle is the closed form "
        "ceil(max/100k)*100k, provably equal: the loop stops at the "
        "smallest positive multiple of 100k >= max. Rung arithmetic "
        "stays in exact-integer doubles (100000.0 increments), so "
        "the band filter is boundary-safe in both engines; band "
        "cents are per-row floor-quantized (q9 rule). Each WHILE "
        "probe is one scan-count job — the script surface adds "
        "driver round-trips, never a new shuffle shape.",
)
def sql_scripting_threshold_search(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "script_orders"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE rung DOUBLE DEFAULT 0.0;
          DECLARE n BIGINT DEFAULT -1;
          WHILE n != 0 DO
            SET rung = rung + 100000.0;
            SET n = (SELECT count(*) FROM script_orders
                     WHERE o_totalprice > rung);
          END WHILE;
          SELECT CAST(rung AS BIGINT) AS first_empty_rung,
                 CAST((SELECT count(*) FROM script_orders
                       WHERE o_totalprice > rung - 100000.0)
                      AS BIGINT) AS n_top_band,
                 CAST((SELECT sum(CAST(floor(o_totalprice * 100.0
                            + 0.5) AS BIGINT))
                       FROM script_orders
                       WHERE o_totalprice > rung - 100000.0)
                      AS BIGINT) AS cents_top_band;
        END
        """
    )


# ----------------------------- SQL-body UDFs (CREATE FUNCTION, Spark 4)
# The formula is defined ONCE as a template; the Spark side installs it
# as a SQL UDF body (Catalyst INLINES it — pure expression tree, full
# codegen, zero UDF-boundary cost at any scale), the oracle substitutes
# the same text inline. {v} keeps the parenthesization token-identical
# through the composition kn2ms -> ramp.
_KN2MS_T = f"({{v}} * {KN_TO_MS})"  # the one shared conversion constant
_RAMP_T = "least(1.0, pow(greatest({v} - 25.0, 0.0) / 40.0, 3.0))"


@register(
    "sql_udf_scalar_library",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(
                 {_RAMP_T.format(v=_KN2MS_T.format(v="value"))}
                 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS micro_ramp_total,
           round(max({_KN2MS_T.format(v="value")}), 6) AS max_ms
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="SQL-body scalar UDFs (Spark 4, SPARK-46057: CREATE FUNCTION "
        "... RETURN <expr>) as a reusable formula library — the "
        "knots->m/s conversion and the cubic damage ramp the "
        "reference spreads across helper modules become named "
        "engine-level functions (kn2ms, damage_ramp) composed per "
        "row. Catalyst inlines the bodies into the expression tree "
        "(no UDF boundary, whole-stage codegen — the scalable twin "
        "of a Python UDF for pure formulas). Formula text is ONE "
        "template shared with the oracle, so the float ops are "
        "token-identical; ramp totals are per-row floor-quantized "
        "to integer micro-units.",
)
def sql_udf_scalar_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "udf_events"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION kn2ms(v DOUBLE) "
        "RETURNS DOUBLE RETURN " + _KN2MS_T.format(v="v")
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION damage_ramp(v DOUBLE) "
        "RETURNS DOUBLE RETURN " + _RAMP_T.format(v="v")
    )
    return spark.sql(
        """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(damage_ramp(kn2ms(value))
                    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS micro_ramp_total,
               round(max(kn2ms(value)), 6) AS max_ms
        FROM udf_events
        GROUP BY event_type
        ORDER BY event_type
        """
    )


@register(
    "sql_udf_table_valued",
    """
    SELECT et, user_id, n FROM (
      SELECT event_type AS et, user_id,
             CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY count(*) DESC, user_id
             ) AS rk
      FROM events
      GROUP BY event_type, user_id
    ) ranked
    WHERE rk <= 3
    ORDER BY et, n DESC, user_id
    """,
    doc="Table-valued SQL UDF (Spark 4: CREATE FUNCTION ... RETURNS "
        "TABLE) called per-row through a correlated LATERAL join — a "
        "parameterized view: top-3 users per event type, each "
        "distinct type invoking the function with its own argument. "
        "The j18 surface (correlated LATERAL subquery with ORDER "
        "BY+LIMIT) re-expressed as a NAMED, reusable function; "
        "deterministic tiebreak on user_id; the oracle is the "
        "classic row_number()-per-partition twin. Catalyst inlines "
        "the function body as a correlated subquery — same "
        "rewrite-to-join plan as j18, no per-call execution.",
)
def sql_udf_table_valued(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "udf_events"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION type_top_users(et STRING)
        RETURNS TABLE(user_id BIGINT, n BIGINT)
        RETURN SELECT user_id, CAST(count(*) AS BIGINT) AS n
               FROM udf_events WHERE event_type = et
               GROUP BY user_id ORDER BY n DESC, user_id LIMIT 3
        """
    )
    return spark.sql(
        """
        SELECT t.et, s.user_id, s.n
        FROM (SELECT DISTINCT event_type AS et FROM udf_events) t,
        LATERAL type_top_users(t.et) s
        ORDER BY t.et, s.n DESC, s.user_id
        """
    )

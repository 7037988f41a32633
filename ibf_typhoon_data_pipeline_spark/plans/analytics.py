"""Event-analytics catalog: the product-analytics shapes a large event
stream demands at 100 TB — conversion funnels, retention cohorts,
windowed anomaly scoring, and sketch-based frequency estimation.

These have no direct reference twin (the reference is a forecast
pipeline); they extend the engine the same way the corpus/curation
layer does, with the identical oracle discipline: every computed
column aliased identically in both engines, floats rounded or
quantized to integers, deterministic tiebreakers on every top-k.

Scale notes per entry are inline; the common theme: every shuffle key
is bounded (user_id, event_type, day index, sketch bucket), heavy
frames partial-aggregate before any exchange, and tiny summary frames
broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ------------------------------------------------------ conversion funnel
@register(
    "events_funnel_conversion",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS t_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts >= s.t_signup
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase
    """,
    doc="Ordered conversion funnel signup -> first click at-or-after "
        "signup -> first purchase at-or-after that click, reported as "
        "per-stage user counts. Each stage is one user-keyed partial "
        "aggregate joined to the previous stage's (user, ts) frame — "
        "per-user state only ever one timestamp, so every shuffle is "
        "on user_id and the stage frames shrink monotonically; the "
        "final counts are three scalar aggregates cross-joined "
        "(1-row frames).",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_click")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase")))
    )


# ------------------------------------------------------ retention cohorts
@register(
    "events_retention_cohorts",
    """
    WITH f AS (
      SELECT user_id,
             CAST(floor(floor(epoch(min(ts))) / 604800) AS BIGINT)
               AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(floor(floor(epoch(e.ts)) / 604800) AS BIGINT)
             - f.cohort_week AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: users keyed by the epoch-week of "
        "their first event, activity counted as distinct users per "
        "(cohort_week, week_offset). Integer epoch-week arithmetic "
        "(floor(unix/604800)) — no calendar/timezone semantics to "
        "disagree across engines. The firsts frame is one user-keyed "
        "partial agg (|users| rows, joined back on the user key with "
        "no broadcast hint — AQE broadcasts at small SF, shuffle-joins "
        "at user counts that outgrow the driver); the matrix agg keys "
        "are bounded by weeks², not data volume.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "ts")
    wk = lambda c: F.floor(F.unix_timestamp(c) / 604800)  # noqa: E731
    f = ev.groupBy("user_id").agg(
        wk(F.min("ts")).cast("long").alias("cohort_week")
    )
    # no broadcast hint: f is USER-cardinality (fact-derived), so a
    # forced broadcast OOMs the driver at 100 TB; AQE still picks a
    # broadcast join at bench SF from the runtime size
    return (
        ev.join(f, "user_id")
        .groupBy(
            "cohort_week",
            (wk(F.col("ts")) - F.col("cohort_week"))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


# ------------------------------------------------------ windowed anomaly
# The z-score formula is ONE SQL text fed to both engines (repo
# invariant: physics/stats expressions token-for-token identical), all
# inputs integer window sums so the doubles agree to the last bit
# before the 6dp rounding.
_ZSCORE_SQL = (
    "CASE WHEN k = 7 AND s2 * k > s1 * s1 THEN "
    "round((n - CAST(s1 AS DOUBLE) / k) / "
    "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1)), 6) "
    "ELSE NULL END"
)


@register(
    "events_daily_anomaly",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_idx,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, day_idx, n,
             sum(n) OVER w AS s1, sum(n * n) OVER w AS s2,
             count(n) OVER w AS k
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day_idx, CAST(n AS BIGINT) AS n_events,
           {_ZSCORE_SQL} AS zscore
    FROM stats WHERE k >= 1
    """,
    doc="Trailing-window anomaly score: daily event counts per type, "
        "z-scored against the preceding 7 full days (sample std from "
        "integer window sums s1/s2 — the sums are exact, so both "
        "engines divide identical doubles; NULL until the window "
        "fills or when variance is zero). The expensive part is one "
        "partial-agg groupBy to day granularity; the window runs on "
        "the tiny (type x day) frame — at 100 TB the sort is over "
        "days, never events.",
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_type", "ts")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(-7, -1)
    )
    stats = daily.select(
        "event_type",
        "day_idx",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count("n").over(w).alias("k"),
    )
    return stats.filter(F.col("k") >= 1).select(
        "event_type",
        "day_idx",
        F.col("n").cast("long").alias("n_events"),
        F.expr(_ZSCORE_SQL).alias("zscore"),
    )


# ------------------------------------------------------ count-min sketch
# d=4 independent hash rows x w=1024 buckets; the bucket hash is a
# salted md5 prefix (deterministic, identical text in both engines —
# the same reproducibility argument as the linear-counting sketch).
_CM_ROWS = 4
_CM_WIDTH = 1024


def _cm_bucket_sql(j: str, key: str) -> str:
    # DuckDB spelling: hex-prefix literal cast; Spark uses conv()
    return (
        f"CAST(('0x' || substr(md5(concat('cm', CAST({j} AS VARCHAR), ':', "
        f"CAST({key} AS VARCHAR))), 1, 5)) AS BIGINT) % {_CM_WIDTH}"
    )


def _cm_bucket_col(j, key) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cm"),
                        j.cast("string"),
                        F.lit(":"),
                        key.cast("string"),
                    )
                ),
                1,
                5,
            ),
            16,
            10,
        ).cast("long")
        % _CM_WIDTH
    )


@register(
    "sketch_count_min",
    f"""
    WITH sketch AS (
      SELECT t.j, {_cm_bucket_sql('t.j', 'user_id')} AS bucket,
             count(*) AS c
      FROM events, unnest([{", ".join(str(i) for i in range(_CM_ROWS))}])
           AS t(j)
      GROUP BY 1, 2
    ), exact AS (
      SELECT user_id, count(*) AS n_exact FROM events GROUP BY user_id
    ), cand AS (
      SELECT e.user_id, t.j,
             {_cm_bucket_sql('t.j', 'e.user_id')} AS bucket
      FROM exact e,
           unnest([{", ".join(str(i) for i in range(_CM_ROWS))}]) AS t(j)
    ), est AS (
      SELECT c.user_id, min(s.c) AS n_est
      FROM cand c JOIN sketch s ON s.j = c.j AND s.bucket = c.bucket
      GROUP BY c.user_id
    )
    SELECT ex.user_id, CAST(ex.n_exact AS BIGINT) AS n_exact,
           CAST(est.n_est AS BIGINT) AS n_est
    FROM exact ex JOIN est ON est.user_id = ex.user_id
    ORDER BY ex.n_exact DESC, ex.user_id LIMIT 20
    """,
    doc="Count-min heavy hitters: d=4 salted-md5 hash rows x w=1024 "
        "buckets built in ONE partial-agg pass (explode to 4 copies, "
        "groupBy (row, bucket)); per-key estimate = min over rows of "
        "the bucket counts, reported next to the exact count for the "
        "top-20 users (deterministic tiebreaker). The sketch is 4096 "
        "integers regardless of data volume — at 100 TB it is what "
        "crosses the wire, the candidate probe joins against it "
        "broadcast. Estimates are >= exact by construction (here "
        "equal: 150 keys over 1024 buckets rarely collide).",
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id")
    rows = F.array(*[F.lit(i) for i in range(_CM_ROWS)])
    hashed = ev.select(
        "user_id", F.explode(rows).alias("j")
    ).select(
        "j", _cm_bucket_col(F.col("j"), F.col("user_id")).alias("bucket")
    )
    sketch = hashed.groupBy("j", "bucket").agg(F.count("*").alias("c"))
    exact = ev.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    cand = exact.select(
        "user_id", F.explode(rows).alias("j")
    ).select(
        "user_id",
        "j",
        _cm_bucket_col(F.col("j"), F.col("user_id")).alias("bucket"),
    )
    est = (
        cand.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("n_est"))
    )
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_est").cast("long").alias("n_est"),
        )
        .orderBy(F.col("n_exact").desc(), "user_id")
        .limit(20)
    )


# ------------------------------------------------------ props JSON
@register(
    "events_props_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
             AS k_mean,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured props extraction: the JSON payload column "
        "parsed per row (Spark get_json_object ≡ DuckDB "
        "json_extract_string, both JSONPath '$.k') and aggregated per "
        "event type — the schema-on-read shape for event property "
        "bags. Pure expression + one bounded-key partial agg; at "
        "100 TB the JSON parse is codegen'd per row, nothing "
        "materializes wide.",
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_type", "props")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg(k), 6).alias("k_mean"),
        F.min(k).cast("long").alias("k_min"),
        F.max(k).cast("long").alias("k_max"),
    )


# ------------------------------------------- distribution-rank window
@register(
    "w9_percent_rank_cume",
    """
    SELECT c_custkey,
           c_nationkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
    """,
    doc="Distribution-rank windows (percent_rank + cume_dist) per "
        "nation partition — the W-family completion beyond "
        "rank/ntile. Tie groups share ranks by definition, so the "
        "result depends only on values, not physical order "
        "(deterministic without an id tiebreaker); one shuffle on the "
        "bounded partition key.",
)
def w9_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------- rolling time window
@register(
    "events_rolling_1h",
    """
    WITH e AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             CAST(round(value * 100.0) AS BIGINT) AS val_cents
      FROM events
    )
    SELECT event_id, user_id, es,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(sum(val_cents) OVER w AS BIGINT) AS sum_cents_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY es
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing 1-hour rolling aggregate per user (count + sum of "
        "value over a RANGE window on epoch seconds). Values quantize "
        "to integer cents BEFORE the rolling sum, so the window "
        "arithmetic is exact integer math in both engines and "
        "insensitive to peer-row order (RANGE frames include all "
        "same-second peers by definition). One shuffle on user_id; "
        "frame state is bounded by the hour span, the streaming-"
        "telemetry rolling-metric shape.",
)
def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _ev(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
        F.round(F.col("value") * 100.0).cast("long").alias("val_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-3599, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "es",
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.sum("val_cents").over(w).cast("long").alias("sum_cents_1h"),
    )


# ---------------------------------------------- exact quantile bands
@register(
    "a19_percentile_bands",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated quantile bands per event type: Spark's "
        "percentile() and DuckDB's quantile_cont() share the "
        "(n-1)*q linear-interpolation definition, so the doubles "
        "agree to 6dp. Exact per-group quantiles sort each group — "
        "fine on a bounded group count; at corpus scale the "
        "sketch_quantile_histogram entry is the bounded-error, "
        "single-pass path and this entry is its exact twin.",
)
def a19_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.expr(f"percentile(value, {q})"), 6).alias(f"p{n}")
            for q, n in ((0.25, 25), (0.5, 50), (0.9, 90), (0.99, 99))
        ]
    )


# ------------------------------------------------- truncated EWMA
# Exponential moving average as an 8-lag truncated kernel: the exact
# EWMA recurrence is a running product (not expressible as one window
# expression without per-row recursion), but (1-a)^8 ≈ 0.1 means the
# truncated kernel carries >= 90% of the mass. Weights are quoted
# literals, the weighted sum is ONE shared left-associated expression
# over integer-cent lags, so both engines produce the same double.
_EWMA_ALPHA = 0.25
_EWMA_LAGS = 8


def _ewma_sql() -> str:
    num = " + ".join(
        f"(CASE WHEN l{k} IS NOT NULL THEN "
        f"CAST('{_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k!r}' AS DOUBLE)"
        f" * l{k} ELSE 0.0 END)"
        for k in range(_EWMA_LAGS)
    )
    den = " + ".join(
        f"(CASE WHEN l{k} IS NOT NULL THEN "
        f"CAST('{_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k!r}' AS DOUBLE)"
        f" ELSE 0.0 END)"
        for k in range(_EWMA_LAGS)
    )
    return f"round(({num}) / ({den}), 6)"


@register(
    "events_ewma",
    f"""
    WITH c AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100.0) AS BIGINT) AS cents
      FROM events
    ), lagged AS (
      SELECT event_id, user_id,
             {', '.join(f'lag(cents, {k}) OVER w AS l{k}'
                        for k in range(_EWMA_LAGS))}
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, {_ewma_sql()} AS ewma_r FROM lagged
    """,
    doc=f"Truncated EWMA (alpha={_EWMA_ALPHA}, {_EWMA_LAGS} lags, "
        ">=90% kernel mass) of event values per user: one sort per "
        "user materializes the lag columns, the renormalized weighted "
        "sum is a single shared expression over integer cents — "
        "identical doubles in both engines. The smoothing feature "
        "every telemetry/feature-store pipeline derives; the exact "
        "recurrence would need per-row recursion, the truncated "
        "kernel is the distributed-friendly form.",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _ev(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = c.select(
        "event_id",
        "user_id",
        *[
            F.lag("cents", k).over(w).alias(f"l{k}")
            for k in range(_EWMA_LAGS)
        ],
    )
    return lagged.select(
        "event_id", "user_id", F.expr(_ewma_sql()).alias("ewma_r")
    )


# --------------------------------------------- market-basket lift
_MB_TOPK = 20


@register(
    "basket_pair_lift",
    f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM li
    ), item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
      FROM li GROUP BY l_partkey
    ), pair AS (
      SELECT a.l_partkey AS id_a, b.l_partkey AS id_b,
             CAST(count(*) AS BIGINT) AS support
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, support, lift_micro FROM (
      SELECT id_a, id_b, support,
             (support * n_orders * 1000000) // (ia.n_item * ib.n_item)
               AS lift_micro,
             row_number() OVER (
               ORDER BY support DESC, id_a ASC, id_b ASC
             ) AS rk
      FROM pair
      JOIN item ia ON ia.l_partkey = id_a
      JOIN item ib ON ib.l_partkey = id_b
      CROSS JOIN n
    ) WHERE rk <= {_MB_TOPK}
    """,
    doc=f"Market-basket association mining: top-{_MB_TOPK} co-ordered "
        "part pairs by support, with lift = P(a,b)/(P(a)P(b)) in "
        "exact integer micro-units (pure BIGINT division — no double "
        "ever formed, so no rounding boundary exists). Pair "
        "generation is the standard self-join on the basket key "
        "(bounded per order by basket size); item counts join back "
        "on the item key with no broadcast hint (part-cardinality — "
        "AQE decides); the final rank is TakeOrdered over the top "
        "slice, not a global sort.",
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    li = persist_tracked(li)
    n = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    item = li.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_item")
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("id_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("id_b")
    )
    pair = (
        a.join(b, "ok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("support"))
    )
    ia = item.select(
        F.col("l_partkey").alias("id_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("id_b"), F.col("n_item").alias("n_b")
    )
    # no broadcast hints on ia/ib: item frequencies are PART-
    # cardinality (grow with the catalog) — AQE decides; the 1-row
    # total keeps its hint
    scored = (
        pair.join(ia, "id_a")
        .join(ib, "id_b")
        .crossJoin(F.broadcast(n))
        .select(
            "id_a",
            "id_b",
            "support",
            F.expr(
                "(support * n_orders * 1000000) div (n_a * n_b)"
            ).alias("lift_micro"),
        )
    )
    top = scored.orderBy(
        F.col("support").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(_MB_TOPK)
    return top.select("id_a", "id_b", "support", "lift_micro")


# ------------------------------------------------ date-spine gap fill
@register(
    "events_date_spine_gaps",
    """
    WITH span AS (
      SELECT user_id,
             CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
             CAST(max(date_trunc('day', ts)) AS DATE) AS d1
      FROM events GROUP BY user_id
    ), spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1,
               INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    ), active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS missing_day
    FROM spine s ANTI JOIN active a
      ON a.user_id = s.user_id AND a.day = s.day
    """,
    doc="Date-spine gap fill: per user, generate the calendar spine "
        "between their first and last active day (sequence + explode) "
        "and anti-join the observed days — emitting the silent days "
        "every retention/telemetry load must materialize. The spine "
        "is generated per key (bounded by the span, no global "
        "calendar broadcast) and the anti-join shuffles once on "
        "(user, day).",
)
def events_date_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    )
    span = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    active = ev.distinct()
    return (
        spine.join(active, ["user_id", "day"], "left_anti")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("missing_day"),
        )
    )


# ------------------------------------------- gaps-and-islands streaks
@register(
    "events_activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), anchored AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day
             ) AS INTEGER) AS anchor
      FROM days
    ), islands AS (
      SELECT user_id, anchor,
             CAST(count(*) AS BIGINT) AS streak_days,
             strftime(min(day), '%Y-%m-%d') AS streak_start
      FROM anchored GROUP BY user_id, anchor
    )
    SELECT user_id, streak_days, streak_start FROM (
      SELECT user_id, streak_days, streak_start,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY streak_days DESC, streak_start ASC
             ) AS rk
      FROM islands
    ) WHERE rk = 1
    """,
    doc="Gaps-and-islands: longest consecutive-active-day streak per "
        "user via the day-minus-row_number anchor (consecutive days "
        "share an anchor date). One sort per user over DISTINCT "
        "(user, day) rows — bounded by the calendar span, not the "
        "event count; ties on length break to the earliest streak.",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = _ev(spark, sf_dir).select(
        "user_id",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.select(
        "user_id",
        "day",
        F.date_sub(
            F.col("day"), F.row_number().over(w)
        ).alias("anchor"),
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count("*").cast("long").alias("streak_days"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), F.col("streak_start").asc()
    )
    return (
        islands.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("user_id", "streak_days", "streak_start")
    )


# -------------------------------------- running distinct-count window
@register(
    "events_running_distinct_types",
    """
    WITH flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_id, user_id,
           CAST(sum(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS n_types_seen
    FROM flagged
    """,
    doc="Running COUNT(DISTINCT) over an ordered window — not "
        "expressible directly in either engine — re-stated as the "
        "first-occurrence-flag + running-sum identity: a row "
        "contributes iff it is its (user, type)'s first event. Two "
        "windows share the per-user sort; both are keyed (no global "
        "window), and the flag is integer so the running sum is "
        "order-exact with the (ts, event_id) tiebreak.",
)
def events_running_distinct_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w1 = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w1) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(w2).cast("long").alias("n_types_seen"),
    )


# ---------------------------------------------- bloom-filter sketch
# Deterministic Bloom filter: k=3 positions per key, each the value of
# 3 hex chars (12 bits -> exactly the 4096-slot space, no modulo) of a
# salted md5 — reproducible in any engine, like the linear-counting
# and count-min sketches. The filter itself is the <=4096-row distinct
# position set, which is what broadcasts as a pre-join filter at scale.
_BLOOM_HEX = "0123456789abcdef"
_BLOOM_K = 3


def _bloom_pos_sql(key: str, j: str) -> str:
    """12-bit position: value of md5('b'||j||':'||key) hex chars 1-3."""
    h = f"md5(concat('b', CAST({j} AS STRING), ':', {key}))"
    return (
        f"((instr('{_BLOOM_HEX}', substr({h}, 1, 1)) - 1) * 256"
        f" + (instr('{_BLOOM_HEX}', substr({h}, 2, 1)) - 1) * 16"
        f" + (instr('{_BLOOM_HEX}', substr({h}, 3, 1)) - 1))"
    )


@register(
    "sketch_bloom_membership",
    f"""
    WITH members AS (
      SELECT CAST(c_custkey AS VARCHAR) AS key FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ), ks AS (SELECT unnest([0, 1, 2]) AS j),
    bloom AS (
      SELECT DISTINCT {_bloom_pos_sql('key', 'j')} AS pos
      FROM members CROSS JOIN ks
    ), probe AS (
      SELECT CAST(c_custkey AS VARCHAR) AS key,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS is_member
      FROM customer
    ), probed AS (
      SELECT p.key, p.is_member,
             CASE WHEN count(b.pos) = {_BLOOM_K} THEN 1 ELSE 0 END
               AS bloom_hit
      FROM probe p CROSS JOIN ks
      LEFT JOIN bloom b ON b.pos = {_bloom_pos_sql('p.key', 'j')}
      GROUP BY p.key, p.is_member
    )
    SELECT CAST(sum(is_member) AS BIGINT) AS n_members,
           CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_positive,
           CAST(sum(CASE WHEN bloom_hit = 1 AND is_member = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
           CAST(sum(CASE WHEN bloom_hit = 0 AND is_member = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negative
    FROM probed
    """,
    doc="Deterministic Bloom membership sketch: 3 salted-md5 12-bit "
        "positions per key into a 4096-slot space; the filter is the "
        "distinct position set of the member side (<= 4096 rows — "
        "broadcastable, which is exactly how a Bloom pre-filter rides "
        "a join at scale). Probing every customer reports true "
        "members, Bloom positives, false positives (expected from "
        "fill ratio) and the structurally-impossible false negatives "
        "(must be 0 — the Bloom guarantee, asserted by the oracle "
        "equality).",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("key"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0)
        .alias("is_member"),
    )
    ks = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("j"))
    bloom = (
        cust.filter(F.col("is_member") == 1)
        .crossJoin(F.broadcast(ks))
        .select(F.expr(_bloom_pos_sql("key", "j")).alias("pos"))
        .distinct()
    )
    probed = (
        cust.crossJoin(F.broadcast(ks))
        .select(
            "key",
            "is_member",
            F.expr(_bloom_pos_sql("key", "j")).alias("pos"),
        )
        .join(
            F.broadcast(bloom.withColumn("hit", F.lit(1))), "pos", "left"
        )
        .groupBy("key", "is_member")
        .agg(
            F.when(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) == _BLOOM_K, 1
            )
            .otherwise(0)
            .alias("bloom_hit")
        )
    )
    return probed.agg(
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum("bloom_hit").cast("long").alias("n_bloom_positive"),
        F.sum(
            F.when(
                (F.col("bloom_hit") == 1) & (F.col("is_member") == 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_false_positive"),
        F.sum(
            F.when(
                (F.col("bloom_hit") == 0) & (F.col("is_member") == 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_false_negative"),
    )


# ---------------------------------------------------- mode per group
@register(
    "a21_mode_per_user",
    """
    SELECT user_id, event_type AS mode_type, n FROM (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (
               PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC
             ) AS rk
      FROM events GROUP BY user_id, event_type
    ) WHERE rk = 1
    """,
    doc="Mode (most frequent value) per group with a deterministic "
        "lexicographic tiebreak — neither engine's native mode() "
        "defines tie order, so both sides state it as count + "
        "keep-max: one partial-agg groupBy, then a rank over the "
        "(user x type) frame only (bounded by the type domain).",
)
def a21_mode_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _ev(spark, sf_dir).groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id", F.col("event_type").alias("mode_type"), "n"
        )
    )


# --------------------------------------------- Markov transition matrix
@register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS to_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS from_type
      FROM events
    ), cnt AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    ), tot AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n FROM cnt
      GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n,
           CAST((c.n * 1000000) // t.row_n AS BIGINT) AS p_micro
    FROM cnt c JOIN tot t ON t.from_type = c.from_type
    """,
    doc="Behavioral Markov chain: event-type transition counts from "
        "per-user lag pairs ((ts, event_id) order), row-normalized to "
        "exact integer micro-probabilities (pure BIGINT division — no "
        "double, no rounding boundary). One sort per user feeds the "
        "lag; the matrix is |types|² rows, its row totals broadcast "
        "back. The session-flow model behind funnel diagnostics and "
        "next-event prediction baselines.",
)
def events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = cnt.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("row_n")
    )
    return cnt.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(n * 1000000) div row_n").cast("long").alias("p_micro"),
    )


# ------------------------------------------------- top session paths
@register(
    "events_top_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type AS e3,
             lag(event_type, 1) OVER w AS e2,
             lag(event_type, 2) OVER w AS e1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT path, n FROM (
      SELECT concat(e1, '>', e2, '>', e3) AS path,
             CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (
               ORDER BY count(*) DESC, concat(e1, '>', e2, '>', e3) ASC
             ) AS rk
      FROM seq WHERE e1 IS NOT NULL
      GROUP BY e1, e2, e3
    ) WHERE rk <= 10
    """,
    doc="Top-10 behavioral trigram paths (e1>e2>e3 across each user's "
        "ordered stream): two lags share one per-user sort, the "
        "global count groups on the |types|³-bounded path domain, and "
        "the top-10 ranks that bounded frame only — the "
        "path-analysis/funnel-discovery primitive.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e3"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.lag("event_type", 2).over(w).alias("e1"),
    ).filter(F.col("e1").isNotNull())
    counts = (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path"), "n"
        )
    )
    return (
        counts.orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(10)
        .select("path", "n")
    )


# ------------------------------------------ equi-depth histogram
_ED_BINS = 8


@register(
    "sketch_equidepth_bounds",
    f"""
    WITH q AS (
      SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE),
               [{", ".join(f"CAST({i} AS DOUBLE) / {_ED_BINS}.0"
                           for i in range(_ED_BINS + 1))}]) AS edges
      FROM lineitem
    )
    SELECT bin_idx,
           round(edges[bin_idx + 1], 6) AS lo,
           round(edges[bin_idx + 2], 6) AS hi
    FROM q CROSS JOIN
      unnest([{", ".join(str(i) for i in range(_ED_BINS))}]) AS t(bin_idx)
    """,
    doc=f"Equi-depth histogram bounds: the {_ED_BINS} quantile-spaced "
        "bin edges of l_extendedprice (exact interpolated "
        "percentiles, 6dp) — the statistics a range partitioner or "
        "CBO histogram needs, where the equi-WIDTH "
        "sketch_quantile_histogram answers the inverse question. "
        "Exact per-group quantiles sort once; at corpus scale the "
        "histogram sketch feeds approximate bounds instead, this "
        "entry is the exact yardstick.",
)
def sketch_equidepth_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("price")
    )
    # Spark's percentile() needs FOLDABLE percentages: one agg over a
    # literal array of the bin-edge fractions, then the tiny edge
    # array fans out over the literal bin ids
    qs = ", ".join(
        f"CAST({i} AS DOUBLE) / {_ED_BINS}.0" for i in range(_ED_BINS + 1)
    )
    edges = li.agg(F.expr(f"percentile(price, array({qs}))").alias("q"))
    bins = spark.range(_ED_BINS).select(
        F.col("id").cast("int").alias("bin_idx")
    )
    return edges.crossJoin(F.broadcast(bins)).select(
        "bin_idx",
        F.round(F.element_at("q", F.col("bin_idx") + 1), 6).alias("lo"),
        F.round(F.element_at("q", F.col("bin_idx") + 2), 6).alias("hi"),
    )


# --------------------------------------------------- A/B test z-score
# Experiment analysis: users hash-assigned to variants (the same
# deterministic md5 assignment a production experimentation layer
# uses), per-user conversion = any 'purchase' event, then a two-sample
# pooled-proportion z-statistic. The per-variant counts are exact
# BIGINTs from one partial-agg groupBy (HUGEINT-cast guarded per the
# round-4 rule); the z formula is shared SQL text evaluated on those
# identical integers, rounded 6dp.
_AB_POOL_SQL = "(CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
_AB_Z_SQL = (
    "round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) "
    "- CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) "
    f"/ sqrt({_AB_POOL_SQL} * (1.0 - {_AB_POOL_SQL}) "
    "* (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)"
)


@register(
    "events_ab_ztest",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS variant,
             max(CASE WHEN event_type = 'purchase' AND value > 180
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), counts AS (
      SELECT
        CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a,
        CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_b,
        CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
             AS BIGINT) AS conv_a,
        CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
             AS BIGINT) AS conv_b
      FROM per_user
    )
    SELECT n_a, n_b, conv_a, conv_b,
           round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
             AS rate_a,
           round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
             AS rate_b,
           {_AB_Z_SQL} AS z_score
    FROM counts
    """,
    doc="A/B experiment readout: deterministic md5 variant assignment, "
        "per-user conversion collapse (one user-keyed partial agg — "
        "the only shuffle), then a 1-row exact-integer count frame "
        "feeding the pooled two-proportion z-statistic as shared SQL "
        "text. At 100 TB the user collapse is the standard "
        "high-cardinality groupBy (AQE-handled); everything after is "
        "one row.",
)
def events_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        _ev(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 180),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn(
            "variant",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                < "8",
                "A",
            ).otherwise("B"),
        )
    )
    counts = per_user.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    return counts.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(
            F.col("conv_a").cast("double") / F.col("n_a").cast("double"), 6
        ).alias("rate_a"),
        F.round(
            F.col("conv_b").cast("double") / F.col("n_b").cast("double"), 6
        ).alias("rate_b"),
        F.expr(_AB_Z_SQL).alias("z_score"),
    )


# ------------------------------------------------- CUPED adjustment
# Variance-reduced experiment analysis (Deng et al. WSDM'13): the
# post-period metric is adjusted by theta x the pre-period covariate,
# theta = cov(pre, post) / var(pre). Per-user pre/post sums quantize
# to integer cents (exact, order-free); theta and the adjusted
# variant means are shared-SQL-text double arithmetic on those
# identical integers. Same md5 variant assignment as events_ab_ztest.
_CUPED_THETA_SQL = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
    "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
# adjusted variant mean: mean(y_v) - theta * (mean(x_v) - mean(x))
_CUPED_ADJ_SQL = (
    "round(CAST(vy AS DOUBLE) / CAST(vn AS DOUBLE) "
    f"- {_CUPED_THETA_SQL} "
    "* (CAST(vx AS DOUBLE) / CAST(vn AS DOUBLE) "
    "- CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)"
)


@register(
    "events_cuped",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS variant,
             CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                      THEN CAST(round(value * 100.0) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS pre_cents,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                      THEN CAST(round(value * 100.0) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS post_cents
      FROM events GROUP BY user_id
    ), g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pre_cents) AS BIGINT) AS sx,
             CAST(sum(post_cents) AS BIGINT) AS sy,
             CAST(sum(pre_cents * pre_cents) AS BIGINT) AS sxx,
             CAST(sum(pre_cents * post_cents) AS BIGINT) AS sxy
      FROM per_user
    ), v AS (
      SELECT variant,
             CAST(count(*) AS BIGINT) AS vn,
             CAST(sum(pre_cents) AS BIGINT) AS vx,
             CAST(sum(post_cents) AS BIGINT) AS vy
      FROM per_user GROUP BY variant
    )
    SELECT variant, vn AS n_users,
           round(CAST(vy AS DOUBLE) / CAST(vn AS DOUBLE), 6)
             AS mean_post_cents,
           {_CUPED_ADJ_SQL} AS mean_adj_cents,
           round({_CUPED_THETA_SQL}, 6) AS theta
    FROM v CROSS JOIN g
    ORDER BY variant
    """,
    doc="CUPED variance reduction (Deng et al. WSDM'13): pre-period "
        "spend is the covariate, theta = cov/var from one exact "
        "integer-cents moment pass over users, adjusted variant means "
        "as shared-text double arithmetic. ONE user-keyed shuffle "
        "total; the 1-row global moments broadcast-cross-join onto "
        "the 2-row variant frame.",
)
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("value") * 100.0).cast("long")
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = (
        _ev(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
            .cast("long")
            .alias("pre_cents"),
            F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
            .cast("long")
            .alias("post_cents"),
        )
        .withColumn(
            "variant",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                < "8",
                "A",
            ).otherwise("B"),
        )
    )
    g = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pre_cents").cast("long").alias("sx"),
        F.sum("post_cents").cast("long").alias("sy"),
        F.sum(F.col("pre_cents") * F.col("pre_cents"))
        .cast("long")
        .alias("sxx"),
        F.sum(F.col("pre_cents") * F.col("post_cents"))
        .cast("long")
        .alias("sxy"),
    )
    v = per_user.groupBy("variant").agg(
        F.count("*").cast("long").alias("vn"),
        F.sum("pre_cents").cast("long").alias("vx"),
        F.sum("post_cents").cast("long").alias("vy"),
    )
    return (
        v.crossJoin(F.broadcast(g))
        .selectExpr(
            "variant",
            "vn AS n_users",
            "round(CAST(vy AS DOUBLE) / CAST(vn AS DOUBLE), 6)"
            " AS mean_post_cents",
            f"{_CUPED_ADJ_SQL} AS mean_adj_cents",
            f"round({_CUPED_THETA_SQL}, 6) AS theta",
        )
        .orderBy("variant")
    )


# --------------------------------------------------- rolling median
# Windowed HOLISTIC aggregate — unlike sum/avg, a median cannot
# partial-aggregate, so engines buffer the frame; the 7-row ROWS
# frame bounds that buffer to O(1) per row. Deterministic total order
# (ts, event_id) makes the frame identical in both engines; Spark
# `percentile(x, 0.5)` and DuckDB `quantile_cont(x, 0.5)` both
# interpolate at (n-1)q (verified round-4 parity fact), rounded 6dp.
@register(
    "events_rolling_median",
    """
    SELECT user_id, event_id,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
           ), 6) AS med7
    FROM events
    """,
    doc="7-point rolling median per user: a holistic window aggregate "
        "over a deterministic (ts, event_id) total order. The ROWS "
        "frame caps the per-row buffer at 7 values; the shuffle is "
        "the standard user-keyed window exchange. Spark percentile == "
        "DuckDB quantile_cont at 6dp (both (n-1)q interpolation).",
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    return _ev(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias(
            "med7"
        ),
    )


# ------------------------------------------------- CUSUM changepoint
# Page's one-sided CUSUM over daily counts, in EXACT integers. The
# max(0, S + x - mu - k) recursion is not a window function, but its
# closed form is: S_t = C_t - min(0, min_{j<=t} C_j) where C is the
# plain cumulative sum of the deviations — two stacked windows, both
# over the (type x day) frame, never the raw events. Deviations are
# scaled by 4*days so mu = tot/days and slack k = mu/4 fold into
# integer arithmetic: 4*days*(n - 1.25*mu) = 4*days*n - 5*tot.
# Alarm: with the mu/4 slack suppressing stationary drift, a
# low bar (statistic > tot/10, i.e. h ~ mu/40) flags small
# persistent upshifts; spelled as the integer test 10*(c-cmin) > tot.
@register(
    "events_cusum_changepoint",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_idx,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, day_idx, n,
             sum(n) OVER (PARTITION BY event_type) AS tot,
             count(*) OVER (PARTITION BY event_type) AS days
      FROM daily
    ), cum AS (
      SELECT event_type, day_idx, n, tot,
             sum(4 * days * n - 5 * tot) OVER (
               PARTITION BY event_type ORDER BY day_idx
               ROWS UNBOUNDED PRECEDING) AS c
      FROM tot
    ), run AS (
      SELECT event_type, day_idx, n, tot, c,
             least(min(c) OVER (
               PARTITION BY event_type ORDER BY day_idx
               ROWS UNBOUNDED PRECEDING), 0) AS cmin
      FROM cum
    )
    SELECT event_type, day_idx,
           CAST(n AS BIGINT) AS n_events,
           CAST(c - cmin AS BIGINT) AS cusum_scaled,
           CAST(CASE WHEN 10 * (c - cmin) > tot THEN 1 ELSE 0 END AS INT)
             AS alarm
    FROM run
    ORDER BY event_type, day_idx
    """,
    doc="Page's CUSUM changepoint detector on daily event counts, "
        "per type: the clamped recursion max(0, S + dev) rewrites to "
        "cumsum minus its running minimum (floored at 0), so the "
        "whole detector is two ordered windows over the tiny "
        "(type x day) frame. Deviations, target mean (global per-type "
        "rate), 25% slack and the persistent-shift alarm bar all fold to "
        "exact integer arithmetic scaled by 4*days, so the engines "
        "agree bitwise. At 100 TB the only event-sized work is the "
        "day-granularity partial agg.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_type", "ts")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.count("*").alias("n"))
    wp = Window.partitionBy("event_type")
    wo = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = daily.select(
        "event_type",
        "day_idx",
        "n",
        F.sum("n").over(wp).alias("tot"),
        F.count("*").over(wp).alias("days"),
    )
    cum = tot.select(
        "event_type",
        "day_idx",
        "n",
        "tot",
        F.sum(
            4 * F.col("days") * F.col("n") - 5 * F.col("tot")
        ).over(wo).alias("c"),
    )
    run = cum.select(
        "event_type",
        "day_idx",
        "n",
        "tot",
        "c",
        F.least(F.min("c").over(wo), F.lit(0)).alias("cmin"),
    )
    return run.select(
        "event_type",
        "day_idx",
        F.col("n").cast("long").alias("n_events"),
        (F.col("c") - F.col("cmin")).cast("long").alias("cusum_scaled"),
        F.when(
            10 * (F.col("c") - F.col("cmin")) > F.col("tot"), 1
        ).otherwise(0).cast("int").alias("alarm"),
    ).orderBy("event_type", "day_idx")


# ------------------------------------------- MAD robust outliers
# Median/MAD outlier detection with every compare integer-exact:
# values quantize to micro-units FIRST, medians of integers are
# either integral or .5 (interpolated midpoint of two BIGINTs — the
# identical IEEE double in both engines), so doubling them restores
# exact integers, and the 3 * 1.4826 * MAD fence becomes the rational
# test dev * 10000 > 44478 * mad.
@register(
    "events_mad_outliers",
    """
    WITH v AS (
      SELECT event_id, event_type,
             CAST(round(value * 1000000.0) AS BIGINT) AS v6
      FROM events WHERE value IS NOT NULL
    ), med AS (
      SELECT event_type,
             CAST(round(2.0 * quantile_cont(v6, 0.5)) AS BIGINT) AS m2
      FROM v GROUP BY event_type
    ), dev AS (
      SELECT v.event_id, v.event_type, v.v6,
             abs(2 * v.v6 - med.m2) AS dev2
      FROM v JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type,
             CAST(round(2.0 * quantile_cont(dev2, 0.5)) AS BIGINT) AS mad4
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_id, dev.event_type, dev.v6,
           CAST(2 * dev.dev2 AS BIGINT) AS dev4,
           CAST(mad.mad4 AS BIGINT) AS mad4
    FROM dev JOIN mad USING (event_type)
    WHERE 2 * dev.dev2 * 10000 > 44478 * mad.mad4
    ORDER BY dev.event_type, dev.event_id
    """,
    doc="Robust outlier detection (median + MAD, 3-sigma fence via "
        "the 1.4826 normal-consistency constant): values quantized to "
        "integer micro-units before any median, medians doubled back "
        "to exact BIGINTs, and the fence tested as the rational "
        "inequality dev*10000 > 44478*mad — no float threshold "
        "anywhere. Spark percentile(col, 0.5) and DuckDB "
        "quantile_cont agree exactly on integer inputs ((n-1)q "
        "interpolation of two BIGINTs). Two shuffles: the per-type "
        "median aggs; the per-type stats broadcast back over the "
        "fact.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _ev(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1000000.0).cast("long").alias("v6"),
    )
    med = v.groupBy("event_type").agg(
        F.round(2.0 * F.expr("percentile(v6, 0.5)")).cast("long").alias("m2")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "v6",
        F.abs(2 * F.col("v6") - F.col("m2")).alias("dev2"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(2.0 * F.expr("percentile(dev2, 0.5)"))
        .cast("long")
        .alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(2 * F.col("dev2") * 10000 > 44478 * F.col("mad4"))
        .select(
            "event_id",
            "event_type",
            "v6",
            (2 * F.col("dev2")).cast("long").alias("dev4"),
            F.col("mad4").cast("long").alias("mad4"),
        )
        .orderBy("event_type", "event_id")
    )


# ------------------------------------------- Kaplan-Meier survival
# Product-limit estimator for signup -> purchase conversion, with
# administrative censoring at a 7-day horizon (the synthetic cohort
# always converts eventually, so the horizon is what creates a real
# risk set). The survival product folds to a SUM in log space: each
# hazard term ln(1 - d/n) is computed from an exact-integer ratio
# (identical IEEE division both engines), rounded ONCE to integer
# micro-nats, then cumulated by an ordered window — the repo's
# standard micro-nat pattern (text_lm_logprob) applied to survival.
@register(
    "events_km_survival",
    """
    WITH u AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t0
      FROM events GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN u ON u.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= u.t0
      GROUP BY e.user_id
    ), per_user AS (
      SELECT u.user_id,
             CASE WHEN u.user_id % 2 = 0 THEN 'A' ELSE 'B' END AS cohort,
             CASE WHEN tp IS NOT NULL AND
                       floor((floor(epoch(tp)) - floor(epoch(t0)))
                             / 86400) < 7
                  THEN CAST(floor((floor(epoch(tp)) - floor(epoch(t0)))
                                  / 86400) AS BIGINT)
                  ELSE CAST(7 AS BIGINT) END AS dur,
             CASE WHEN tp IS NOT NULL AND
                       floor((floor(epoch(tp)) - floor(epoch(t0)))
                             / 86400) < 7
                  THEN 1 ELSE 0 END AS is_event
      FROM u LEFT JOIN p ON p.user_id = u.user_id
      WHERE u.t0 IS NOT NULL
    ), ev AS (
      SELECT cohort, dur, count(*) AS d
      FROM per_user WHERE is_event = 1 GROUP BY cohort, dur
    ), tot AS (
      SELECT cohort, count(*) AS n FROM per_user GROUP BY cohort
    ), risk AS (
      SELECT ev.cohort, ev.dur, ev.d,
             tot.n - COALESCE(sum(ev.d) OVER (
               PARTITION BY ev.cohort ORDER BY ev.dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM ev JOIN tot ON tot.cohort = ev.cohort
    )
    SELECT cohort, CAST(dur AS BIGINT) AS day,
           CAST(d AS BIGINT) AS n_events,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(sum(CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                               * 1000000.0) AS BIGINT)) OVER (
             PARTITION BY cohort ORDER BY dur
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS log_surv_e6
    FROM risk
    ORDER BY cohort, day
    """,
    doc="Kaplan-Meier survival curve (signup -> first purchase, "
        "censored at 7 days, A/B cohorts by user parity): the "
        "product-limit estimator computed as a log-space running sum "
        "of per-day hazard terms ln(1 - d/n), each term an exact "
        "integer ratio rounded once to micro-nats. Event durations "
        "come from two per-user min aggs (one events shuffle); the "
        "KM windows run over the tiny (cohort x day) frame. The "
        "at-risk count is total minus the cumulative prior events "
        "(censored users persist to the horizon by construction).",
)
def events_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts")
    u = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("t0")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(u, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    raw_dur = F.floor(
        (F.unix_timestamp("tp") - F.unix_timestamp("t0")) / 86400
    )
    converted = F.col("tp").isNotNull() & (raw_dur < 7)
    per_user = (
        u.filter(F.col("t0").isNotNull())
        .join(p, "user_id", "left_outer")
        .select(
            F.when(F.col("user_id") % 2 == 0, "A")
            .otherwise("B")
            .alias("cohort"),
            F.when(converted, raw_dur.cast("long"))
            .otherwise(F.lit(7).cast("long"))
            .alias("dur"),
            F.when(converted, 1).otherwise(0).alias("is_event"),
        )
    )
    evd = (
        per_user.filter(F.col("is_event") == 1)
        .groupBy("cohort", "dur")
        .agg(F.count("*").alias("d"))
    )
    tot = per_user.groupBy("cohort").agg(F.count("*").alias("n"))
    w_prev = (
        Window.partitionBy("cohort").orderBy("dur").rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    risk = evd.join(F.broadcast(tot), "cohort").select(
        "cohort",
        "dur",
        "d",
        (
            F.col("n") - F.coalesce(F.sum("d").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    w_cum = (
        Window.partitionBy("cohort").orderBy("dur").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    term = F.round(
        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")) * 1000000.0
    ).cast("long")
    return risk.select(
        "cohort",
        F.col("dur").cast("long").alias("day"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.sum(term).over(w_cum).cast("long").alias("log_surv_e6"),
    ).orderBy("cohort", "day")


# ------------------------------------------- Benford digit audit
# First-digit distribution of order totals vs Benford's law, with the
# chi-squared statistic assembled from exact integer counts and e6-
# quantized expected frequencies (log10(1 + 1/d) evaluated once per
# digit as a literal — no runtime transcendental disagreement).
_BENFORD_E6 = {
    d: round(__import__("math").log10(1 + 1 / d) * 1_000_000)
    for d in range(1, 10)
}
_BENFORD_CASE = (
    "CASE first_digit "
    + " ".join(f"WHEN {d} THEN {v}" for d, v in _BENFORD_E6.items())
    + " END"
)


@register(
    "profile_benford_digits",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS first_digit
      FROM orders WHERE o_totalprice >= 1.0
    ), counts AS (
      SELECT first_digit, CAST(count(*) AS BIGINT) AS n
      FROM digits GROUP BY first_digit
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS total FROM counts
    )
    SELECT first_digit, n,
           CAST({_BENFORD_CASE} AS BIGINT) AS expected_e6,
           CAST(round(
             (CAST(n AS DOUBLE) * 1000000.0 / total
              - ({_BENFORD_CASE}))
             * (CAST(n AS DOUBLE) * 1000000.0 / total
                - ({_BENFORD_CASE}))
             / ({_BENFORD_CASE}) / 1000000.0) AS BIGINT) AS chi2_term_e6
    FROM counts, tot
    ORDER BY first_digit
    """,
    doc="Benford's-law data-quality audit: first significant digit of "
        "order totals vs log10(1 + 1/d). The nine expected "
        "frequencies are compile-time integer-e6 literals (shared by "
        "both engines — no runtime log10), digit counts are one "
        "partial-agg groupBy with the integer-cast-string first char "
        "as key, and the per-digit chi-squared term is arithmetic on "
        "(exact count, literal expectation) pairs. The scan reduces "
        "to nine rows before anything global happens.",
)
def profile_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1.0
    )
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    chi_sql = (
        f"CAST(round((CAST(n AS DOUBLE) * 1000000.0 / total"
        f" - ({_BENFORD_CASE}))"
        f" * (CAST(n AS DOUBLE) * 1000000.0 / total"
        f" - ({_BENFORD_CASE}))"
        f" / ({_BENFORD_CASE}) / 1000000.0) AS BIGINT)"
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .selectExpr(
            "first_digit",
            "n",
            f"CAST({_BENFORD_CASE} AS BIGINT) AS expected_e6",
            f"{chi_sql} AS chi2_term_e6",
        )
        .orderBy("first_digit")
    )


# ------------------------------------------- Gini concentration
@register(
    "events_gini_activity",
    """
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT n_ev,
             row_number() OVER (ORDER BY n_ev, user_id) AS k
      FROM u
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_ev) AS BIGINT) AS total_events,
           CAST(sum(k * n_ev) AS BIGINT) AS weighted_sum,
           round((2.0 * CAST(sum(k * n_ev) AS DOUBLE)
                  - (count(*) + 1.0) * CAST(sum(n_ev) AS DOUBLE))
                 / (CAST(count(*) AS DOUBLE)
                    * CAST(sum(n_ev) AS DOUBLE)), 6) AS gini
    FROM ranked
    """,
    doc="Gini coefficient of per-user activity concentration: the "
        "rank-weighted closed form G = (2*sum(k*x_k) - (n+1)*sum(x)) "
        "/ (n*sum(x)) over counts sorted ascending. All three "
        "aggregates are exact BIGINTs, so the final ratio divides "
        "identical doubles. The Spark side derives the global rank k "
        "with operators.windows.global_running_sum (range split + "
        "broadcast offsets) — the user frame is fact-sized at scale, "
        "so no single-partition row_number window; the DuckDB oracle "
        "keeps the plain global window.",
)
def events_gini_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.windows import (
        global_running_sum,
    )

    u = (
        _ev(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_ev"))
        .withColumn("__one", F.lit(1).cast("long"))
    )
    ranked = global_running_sum(
        u,
        order_cols=["n_ev", "user_id"],
        value_col="__one",
        out_col="k",
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n_ev").cast("long").alias("total_events"),
        F.sum(F.col("k") * F.col("n_ev")).cast("long").alias(
            "weighted_sum"
        ),
        F.round(
            (
                2.0 * F.sum(F.col("k") * F.col("n_ev")).cast("double")
                - (F.count("*") + 1.0) * F.sum("n_ev").cast("double")
            )
            / (
                F.count("*").cast("double")
                * F.sum("n_ev").cast("double")
            ),
            6,
        ).alias("gini"),
    )


# ------------------------------------------- touch attribution
@register(
    "events_touch_attribution",
    """
    WITH conv AS (
      SELECT user_id, min(ts) AS tp
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), touches AS (
      SELECT e.user_id, e.event_type
      FROM events e JOIN conv c ON c.user_id = e.user_id
      WHERE e.ts < c.tp AND e.event_type IN ('click', 'view', 'signup')
    ), sized AS (
      SELECT user_id, event_type,
             count(*) OVER (PARTITION BY user_id) AS n_touches
      FROM touches
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(CAST(round(1000000.0 / n_touches) AS BIGINT))
                AS BIGINT) AS credit_e6
    FROM sized
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Linear-touch conversion attribution: every click/view/signup "
        "before a user's first purchase shares that conversion's "
        "credit equally. Per-touch credit quantizes to round(1e6/n) "
        "BEFORE summation (identical integer division both engines, "
        "order-free BIGINT sums); the per-user touch count is a "
        "user-partitioned window, so the only shuffles are the "
        "user key and the final channel rollup.",
)
def events_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    touches = (
        ev.filter(F.col("event_type").isin("click", "view", "signup"))
        .join(conv, "user_id")
        .filter(F.col("ts") < F.col("tp"))
        .select("user_id", "event_type")
    )
    w = Window.partitionBy("user_id")
    sized = touches.select(
        "event_type", F.count("*").over(w).alias("n_touches")
    )
    return (
        sized.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum(
                F.round(1000000.0 / F.col("n_touches")).cast("long")
            )
            .cast("long")
            .alias("credit_e6"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- DAU/MAU stickiness
@register(
    "events_stickiness_dau_mau",
    """
    WITH d AS (
      SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_idx,
             user_id
      FROM events
    ), daily AS (
      SELECT day_idx, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM d GROUP BY day_idx
    ), monthly AS (
      SELECT CAST(floor(day_idx / 30.0) AS BIGINT) AS mo_idx,
             CAST(sum(dau) AS BIGINT) AS dau_sum,
             CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY CAST(floor(day_idx / 30.0) AS BIGINT)
    ), mau AS (
      SELECT CAST(floor(day_idx / 30.0) AS BIGINT) AS mo_idx,
             CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM d GROUP BY CAST(floor(day_idx / 30.0) AS BIGINT)
    )
    SELECT m.mo_idx, mo.dau_sum, mo.n_days, m.mau,
           CAST(round(1000000.0 * mo.dau_sum / (mo.n_days * m.mau))
                AS BIGINT) AS stickiness_e6
    FROM monthly mo JOIN mau m ON m.mo_idx = mo.mo_idx
    ORDER BY m.mo_idx
    """,
    doc="DAU/MAU stickiness per 30-day window: average daily active "
        "users over monthly active users, as one e6 rational of "
        "exact distinct counts (dau_sum/(n_days*mau)). Two "
        "distinct-agg passes keyed on day and month buckets — the "
        "canonical engagement KPI. The month bucket floors "
        "EXPLICITLY before the BIGINT cast: DuckDB CAST(double AS "
        "BIGINT) rounds while Spark truncates, the repo's documented "
        "cast trap.",
)
def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _ev(spark, sf_dir).select(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias(
            "day_idx"
        ),
        "user_id",
    )
    daily = d.groupBy("day_idx").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    monthly = daily.groupBy(
        F.floor(F.col("day_idx") / 30.0).cast("long").alias("mo_idx")
    ).agg(
        F.sum("dau").cast("long").alias("dau_sum"),
        F.count("*").cast("long").alias("n_days"),
    )
    mau = d.groupBy(
        F.floor(F.col("day_idx") / 30.0).cast("long").alias("mo_idx")
    ).agg(F.countDistinct("user_id").cast("long").alias("mau"))
    return (
        monthly.join(mau, "mo_idx")
        .selectExpr(
            "mo_idx", "dau_sum", "n_days", "mau",
            "CAST(round(1000000.0 * dau_sum / (n_days * mau)) AS BIGINT)"
            " AS stickiness_e6",
        )
        .orderBy("mo_idx")
    )


# ------------------------------------------- cohort LTV
@register(
    "orders_cohort_ltv",
    """
    WITH firsts AS (
      SELECT o_custkey,
             CAST(min(floor(floor(epoch(o_orderdate)) / 86400))
                  AS BIGINT) AS first_day
      FROM orders GROUP BY o_custkey
    ), facts AS (
      SELECT CAST(floor(f.first_day / 360.0) AS BIGINT) AS cohort,
             CAST(floor((floor(floor(epoch(o.o_orderdate)) / 86400)
                         - f.first_day) / 90.0) AS BIGINT) AS age_q,
             CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ), cells AS (
      SELECT cohort, age_q,
             CAST(sum(cents) AS BIGINT) AS rev_cents
      FROM facts GROUP BY cohort, age_q
    )
    SELECT cohort, age_q, rev_cents,
           CAST(sum(rev_cents) OVER (
             PARTITION BY cohort ORDER BY age_q
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ltv_cents
    FROM cells
    ORDER BY cohort, age_q
    """,
    doc="Cohort LTV curves: customers grouped by first-order cohort "
        "(360-day bands), revenue accumulated by 90-day age quarters "
        "— the money twin of events_retention_cohorts. Explicit "
        "floor() before every BIGINT cast (the cast-rounding trap), "
        "exact integer cents, and the cumulative window runs on the "
        "(cohort x age) cell frame, never order rows. The firsts "
        "frame re-joins the fact on the customer key — the only two "
        "fact-sized shuffles.",
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(
            F.floor(F.unix_timestamp("o_orderdate") / 86400)
        ).cast("long").alias("first_day")
    )
    facts = orders.join(firsts, "o_custkey").select(
        F.floor(F.col("first_day") / 360.0).cast("long").alias("cohort"),
        F.floor(
            (
                F.floor(F.unix_timestamp("o_orderdate") / 86400)
                - F.col("first_day")
            )
            / 90.0
        ).cast("long").alias("age_q"),
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias("cents"),
    )
    cells = facts.groupBy("cohort", "age_q").agg(
        F.sum("cents").cast("long").alias("rev_cents")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.select(
        "cohort",
        "age_q",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("cum_ltv_cents"),
    ).orderBy("cohort", "age_q")


# ------------------------------------------- forecast backtest
@register(
    "events_forecast_mase",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_idx,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day_idx
    ), scored AS (
      SELECT d.event_type,
             abs(d.n - s.n) AS e_seasonal,
             abs(d.n - p.n) AS e_naive
      FROM daily d
      JOIN daily s ON s.event_type = d.event_type
                  AND s.day_idx = d.day_idx - 7
      JOIN daily p ON p.event_type = d.event_type
                  AND p.day_idx = d.day_idx - 1
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(e_seasonal) AS BIGINT) AS sae_seasonal,
           CAST(sum(e_naive) AS BIGINT) AS sae_naive,
           CAST(round(1000000.0 * sum(e_seasonal) / sum(e_naive))
                AS BIGINT) AS mase_e6
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Forecast backtest on daily event counts: seasonal-naive "
        "(same weekday last week) absolute errors against the "
        "naive-1 (yesterday) baseline, per type — MASE < 1e6 means "
        "weekly seasonality carries real signal. Calendar-correct "
        "lags via self-equi-joins on day_idx-7/-1 (gap days score "
        "only when both references exist), all errors exact integer "
        "counts, the ratio one e6 rational. The daily frame is the "
        "only event-sized reduction; the self-joins are "
        "(type x day)-sized.",
)
def events_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _ev(spark, sf_dir)
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400)
            .cast("long")
            .alias("day_idx"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    s = daily.select(
        F.col("event_type").alias("s_type"),
        (F.col("day_idx") + 7).alias("s_day"),
        F.col("n").alias("s_n"),
    )
    p = daily.select(
        F.col("event_type").alias("p_type"),
        (F.col("day_idx") + 1).alias("p_day"),
        F.col("n").alias("p_n"),
    )
    scored = (
        daily.join(
            s,
            (F.col("s_type") == F.col("event_type"))
            & (F.col("s_day") == F.col("day_idx")),
        )
        .join(
            p,
            (F.col("p_type") == F.col("event_type"))
            & (F.col("p_day") == F.col("day_idx")),
        )
        .select(
            "event_type",
            F.abs(F.col("n") - F.col("s_n")).alias("e_seasonal"),
            F.abs(F.col("n") - F.col("p_n")).alias("e_naive"),
        )
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("e_seasonal").cast("long").alias("sae_seasonal"),
            F.sum("e_naive").cast("long").alias("sae_naive"),
            F.round(
                1000000.0 * F.sum("e_seasonal") / F.sum("e_naive")
            )
            .cast("long")
            .alias("mase_e6"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------- PSI drift monitor
# Population Stability Index between the first and second half of the
# event stream, per event-type share: the standard production-ML
# input-drift alarm (PSI > 0.2 = investigate). Shares are exact
# integer counts over a 1-row broadcast split point; each bin's
# (p - q) * ln(p / q) term rounds once to micro-nats before the sum.
_PSI_TERM_SQL = (
    "CAST(round((CAST(n_a AS DOUBLE) / tot_a"
    " - CAST(n_b AS DOUBLE) / tot_b)"
    " * ln((CAST(n_a AS DOUBLE) / tot_a)"
    " / (CAST(n_b AS DOUBLE) / tot_b)) * 1000000.0) AS BIGINT)"
)


@register(
    "events_drift_psi",
    f"""
    WITH split AS (
      SELECT CAST(quantile_cont(CAST(floor(epoch(ts)) AS BIGINT), 0.5)
                  AS DOUBLE) AS mid
      FROM events
    ), binned AS (
      SELECT event_type,
             CAST(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) <= mid
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) > mid
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM events, split
      GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
             CAST(sum(n_b) AS BIGINT) AS tot_b
      FROM binned
    )
    SELECT event_type, n_a, n_b,
           {_PSI_TERM_SQL} AS psi_term_e6
    FROM binned, tot
    ORDER BY event_type
    """,
    doc="Input-drift monitor: per-bin PSI terms between the first and "
        "second time half of the event stream (median epoch split "
        "from one quantile agg, broadcast back). Counts are exact, "
        "each (p-q)*ln(p/q) term rounds once to integer micro-nats — "
        "summing the column gives the total PSI; 0.2e6 is the "
        "conventional investigate bar. One fact pass + two 1-row "
        "broadcasts.",
)
def events_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("ep"),
    )
    split = ev.agg(F.expr("percentile(ep, 0.5)").alias("mid"))
    binned = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ep") <= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("ep") > F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
    )
    tot = binned.agg(
        F.sum("n_a").cast("long").alias("tot_a"),
        F.sum("n_b").cast("long").alias("tot_b"),
    )
    return (
        binned.crossJoin(F.broadcast(tot))
        .selectExpr(
            "event_type", "n_a", "n_b", f"{_PSI_TERM_SQL} AS psi_term_e6"
        )
        .orderBy("event_type")
    )


# ------------------------------------------- one-way ANOVA
# Completes the classical-test trio (z-test, chi-squared, and now F):
# does event value differ by type? Values quantize once to micro
# units; group and global sums/sum-of-squares are exact BIGINTs, so
# SS_between / SS_within / the F statistic and eta-squared divide
# identical doubles in both engines.
_ANOVA_SSB = (
    "(CAST(sum(CAST(s1 AS DOUBLE) * s1 / n) AS DOUBLE)"
    " - CAST(sum(s1) AS DOUBLE) * sum(s1) / sum(n))"
)
_ANOVA_SSW = (
    "(CAST(sum(s2) AS DOUBLE)"
    " - CAST(sum(CAST(s1 AS DOUBLE) * s1 / n) AS DOUBLE))"
)


@register(
    "events_anova_value_by_type",
    f"""
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 1000.0) AS BIGINT) AS v3
      FROM events WHERE value IS NOT NULL
    ), g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v3) AS BIGINT) AS s1,
             CAST(sum(v3 * v3) AS BIGINT) AS s2
      FROM v GROUP BY event_type
    )
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(n) AS BIGINT) AS n_total,
           round({_ANOVA_SSB} / ({_ANOVA_SSB} + {_ANOVA_SSW}), 6)
             AS eta_sq,
           round(({_ANOVA_SSB} / (count(*) - 1))
                 / ({_ANOVA_SSW} / (sum(n) - count(*))), 6) AS f_stat
    FROM g
    """,
    doc="One-way ANOVA of event value by type: per-group integer "
        "milli-unit moments (one partial-agg pass — milli, not "
        "micro: the sum of squared micro-units overflows BIGINT at "
        "this cardinality), SS_between and "
        "SS_within as shared-text arithmetic on exact BIGINTs, "
        "yielding eta-squared effect size and the F statistic — the "
        "remaining classical test next to events_ab_ztest and "
        "text_chi2_terms. Group frame is |types|-sized; nothing "
        "fact-sized crosses the wire after the first agg.",
)
def events_anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _ev(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 1000.0).cast("long").alias("v3"),
    )
    g = v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v3").cast("long").alias("s1"),
        F.sum(F.col("v3") * F.col("v3")).cast("long").alias("s2"),
    )
    return g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
        F.expr(
            f"round({_ANOVA_SSB} / ({_ANOVA_SSB} + {_ANOVA_SSW}), 6)"
        ).alias("eta_sq"),
        F.expr(
            f"round(({_ANOVA_SSB} / (count(*) - 1))"
            f" / ({_ANOVA_SSW} / (sum(n) - count(*))), 6)"
        ).alias("f_stat"),
    )


# ------------------------------------------- autocorrelation function
# ACF of the daily event-count series at lags 1..3, per type — the
# seasonality/momentum diagnostic behind every forecasting model
# choice. All sufficient statistics (Σx, Σx², n, and per-lag Σxy,
# Σ(x+y), pair count) are exact BIGINT sums from integer daily counts,
# so both engines feed identical integers into one shared-text
# rational expression; only the final ratio is floating, rounded 6dp.
# Gap days pair only where both endpoints exist (stated definition —
# the joins are calendar-correct, not row-shifted).
_ACF_MEAN_SQL = "(CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))"
_ACF_R_SQL = (
    f"round((CAST(pxy AS DOUBLE) - {_ACF_MEAN_SQL} * CAST(t AS DOUBLE)"
    f" + CAST(c AS DOUBLE) * {_ACF_MEAN_SQL} * {_ACF_MEAN_SQL})"
    f" / (CAST(s2 AS DOUBLE)"
    f" - CAST(nd AS DOUBLE) * {_ACF_MEAN_SQL} * {_ACF_MEAN_SQL}), 6)"
)


@register(
    "events_acf_lags",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_idx,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day_idx
    ), stats AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(n * n) AS BIGINT) AS s2
      FROM daily GROUP BY event_type
    ), lags AS (
      SELECT unnest([1, 2, 3]) AS lag
    ), pairs AS (
      SELECT a.event_type, a.lag,
             CAST(sum(a.n * b.n) AS BIGINT) AS pxy,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(a.n + b.n) AS BIGINT) AS t
      FROM (SELECT d.*, l.lag, d.day_idx + l.lag AS nxt
            FROM daily d CROSS JOIN lags l) a
      JOIN daily b ON b.event_type = a.event_type
                  AND b.day_idx = a.nxt
      GROUP BY a.event_type, a.lag
    )
    SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag,
           {_ACF_R_SQL} AS acf_r
    FROM pairs p JOIN stats st ON st.event_type = p.event_type
    ORDER BY p.event_type, p.lag
    """,
    doc="Autocorrelation of daily event counts at lags 1-3 per type: "
        "every sufficient statistic (Σx, Σx², n global; Σxy, Σ(x+y), "
        "pair count per lag) is an exact BIGINT sum of integer "
        "counts, combined in ONE shared-text rational — the engines "
        "divide identical integers, rounded 6dp. The lag pairing is "
        "an equi-join on (type, day+lag) after a 3-way lag explode "
        "(one shuffle at type x day cardinality); daily reduction is "
        "the only event-sized agg.",
)
def events_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _ev(spark, sf_dir)
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400)
            .cast("long")
            .alias("day_idx"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    daily = persist_tracked(daily)
    stats = daily.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("s"),
        F.count("*").cast("long").alias("nd"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    a = daily.select(
        "event_type",
        "n",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("lag"),
        "day_idx",
    ).select(
        "event_type",
        "n",
        "lag",
        (F.col("day_idx") + F.col("lag")).alias("nxt"),
    )
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day_idx").alias("b_day"),
        F.col("n").alias("b_n"),
    )
    pairs = (
        a.join(
            b,
            (F.col("b_type") == F.col("event_type"))
            & (F.col("b_day") == F.col("nxt")),
        )
        .groupBy("event_type", "lag")
        .agg(
            F.sum(F.col("n") * F.col("b_n")).cast("long").alias("pxy"),
            F.count("*").cast("long").alias("c"),
            F.sum(F.col("n") + F.col("b_n")).cast("long").alias("t"),
        )
    )
    return (
        pairs.join(stats, "event_type")
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            F.expr(_ACF_R_SQL).alias("acf_r"),
        )
        .orderBy("event_type", "lag")
    )


# ------------------------------------------- Poisson bootstrap CI
# Bootstrap confidence interval for the mean purchase value WITHOUT
# resampling rows — the Poisson bootstrap (each row enters replicate b
# with an independent ~Poisson(1) multiplicity), the only bootstrap
# that distributes: weights are derived per (row, replicate) from a
# hash, so no replicate ever materializes and the whole thing is one
# exploded agg. Multiplicities come from a CASE ladder on the first
# two md5 hex chars (256 cells split 94/94/47/16/5 ≈ the Poisson(1)
# pmf 0.368/0.368/0.184/0.061/0.019); replicate means are ratios of
# exact BIGINT weighted-cent sums, the CI is the 2.5/97.5 percentile
# over the 32 replicate means (percentile == quantile_cont parity).
_BOOT_R = 32
_BOOT_W_SQL = (
    "CASE WHEN h2 < 94 THEN 0 WHEN h2 < 188 THEN 1 "
    "WHEN h2 < 235 THEN 2 WHEN h2 < 251 THEN 3 ELSE 4 END"
)
_BOOT_MEAN_SQL = "(CAST(sw_cents AS DOUBLE) / CAST(nw AS DOUBLE))"


@register(
    "events_bootstrap_ci",
    f"""
    WITH purch AS (
      SELECT CAST(event_id AS VARCHAR) AS rid,
             CAST(round(value * 100.0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), expl AS (
      SELECT cents, b,
             CAST(('0x' || substr(md5(rid || ':' || CAST(b AS VARCHAR)),
                                  1, 2)) AS BIGINT) AS h2
      FROM purch CROSS JOIN (SELECT unnest(range(0, {_BOOT_R})) AS b) r
    ), reps AS (
      SELECT b,
             CAST(sum(({_BOOT_W_SQL}) * cents) AS BIGINT) AS sw_cents,
             CAST(sum({_BOOT_W_SQL}) AS BIGINT) AS nw
      FROM expl GROUP BY b
    ), pt AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s_cents
      FROM purch
    )
    SELECT n,
           round(CAST(s_cents AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS mean_cents,
           round(CAST(quantile_cont({_BOOT_MEAN_SQL}, 0.025)
                 AS DOUBLE), 6) AS ci_lo,
           round(CAST(quantile_cont({_BOOT_MEAN_SQL}, 0.975)
                 AS DOUBLE), 6) AS ci_hi
    FROM reps, pt
    GROUP BY n, s_cents
    """,
    doc=f"Poisson-bootstrap 95% CI for the mean purchase value: "
        f"{_BOOT_R} replicates whose per-row multiplicities are a "
        "Poisson(1)-matched CASE ladder on two md5 hex chars — no "
        "replicate is ever materialized, so the estimator runs as "
        "one explode + one {replicate}-keyed partial agg at ANY "
        "scale (the Google-scale bootstrap). Replicate means divide "
        "exact BIGINT cent sums; the interval is the 2.5/97.5 "
        "interpolated percentile of 32 identical doubles "
        "(percentile==quantile_cont parity), rounded 6dp.",
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    purch = (
        _ev(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").cast("string").alias("rid"),
            F.round(F.col("value") * 100.0).cast("long").alias("cents"),
        )
    )
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    purch = persist_tracked(purch)
    expl = purch.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("b"),
        "rid",
    ).select(
        "cents",
        "b",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("rid"), F.lit(":"), F.col("b").cast("string")
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h2"),
    )
    w = F.expr(_BOOT_W_SQL)
    reps = expl.groupBy("b").agg(
        F.sum(w * F.col("cents")).cast("long").alias("sw_cents"),
        F.sum(w).cast("long").alias("nw"),
    )
    pt = purch.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s_cents"),
    )
    return (
        reps.crossJoin(F.broadcast(pt))
        .groupBy("n", "s_cents")
        .agg(
            F.round(
                F.expr("percentile(" + _BOOT_MEAN_SQL + ", 0.025)"), 6
            ).alias("ci_lo"),
            F.round(
                F.expr("percentile(" + _BOOT_MEAN_SQL + ", 0.975)"), 6
            ).alias("ci_hi"),
        )
        .select(
            "n",
            F.round(
                F.col("s_cents").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("mean_cents"),
            "ci_lo",
            "ci_hi",
        )
    )


# ------------------------------------------- Theil-Sen robust slope
# Median-of-pairwise-slopes trend estimate of the daily event-count
# series, per type — the robust regression that ignores outlier days
# (29% breakdown point). Slopes are ratios of exact integers (count
# diff / day diff), so both engines take the median of identical
# doubles (percentile == quantile_cont parity, 6dp); the intercept is
# the median residual at the ALREADY-ROUNDED slope, keeping the
# second pass deterministic too. The pair space is (days choose 2)
# per type — quadratic in the DAILY frame, never the fact table (the
# daily reduction is the only event-sized agg; the self-join is
# calendar-frame-sized).
@register(
    "events_theil_sen",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_idx,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day_idx
    ), slopes AS (
      SELECT a.event_type,
             CAST(b.n - a.n AS DOUBLE) / CAST(b.day_idx - a.day_idx
                                              AS DOUBLE) AS sl
      FROM daily a
      JOIN daily b ON b.event_type = a.event_type
                  AND b.day_idx > a.day_idx
    ), fit AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
             round(CAST(quantile_cont(sl, 0.5) AS DOUBLE), 6) AS slope_r
      FROM slopes GROUP BY event_type
    )
    SELECT d.event_type, f.n_pairs, f.slope_r,
           round(CAST(quantile_cont(CAST(d.n AS DOUBLE)
                 - f.slope_r * CAST(d.day_idx AS DOUBLE), 0.5)
                 AS DOUBLE), 6) AS intercept_r
    FROM daily d JOIN fit f ON f.event_type = d.event_type
    GROUP BY d.event_type, f.n_pairs, f.slope_r
    ORDER BY d.event_type
    """,
    doc="Theil-Sen robust trend of daily event counts per type: "
        "median of all pairwise slopes (exact-integer ratios -> "
        "identical doubles, quantile parity at 6dp), intercept = "
        "median residual at the pre-rounded slope. Self-join runs on "
        "the (type x day) daily frame only.",
)
def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    daily = persist_tracked(
        _ev(spark, sf_dir)
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400)
            .cast("long")
            .alias("day_idx"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day_idx").alias("b_day"),
        F.col("n").alias("b_n"),
    )
    slopes = daily.join(
        b,
        (F.col("b_type") == F.col("event_type"))
        & (F.col("b_day") > F.col("day_idx")),
    ).select(
        "event_type",
        (
            (F.col("b_n") - F.col("n")).cast("double")
            / (F.col("b_day") - F.col("day_idx")).cast("double")
        ).alias("sl"),
    )
    fit = slopes.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(sl, 0.5)"), 6).alias("slope_r"),
    )
    return (
        daily.join(F.broadcast(fit), "event_type")
        .groupBy("event_type", "n_pairs", "slope_r")
        .agg(
            F.round(
                F.expr(
                    "percentile(CAST(n AS DOUBLE)"
                    " - slope_r * CAST(day_idx AS DOUBLE), 0.5)"
                ),
                6,
            ).alias("intercept_r")
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ VARIANT extraction
@register(
    "events_variant_props",
    """
    WITH kk AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM kk GROUP BY event_type ORDER BY event_type
    """,
    doc="Spark 4 VARIANT ingestion of the JSON property bag: "
        "parse_json(props) -> variant once, then a TYPED "
        "variant_get(..., '$.k', 'bigint') extraction — the "
        "schema-on-read path that replaces per-field "
        "get_json_object re-parsing (one parse per row, not one per "
        "field, and the binary variant encoding predicate-pushes in "
        "Parquet at scale). DuckDB twin extracts the same path via "
        "json_extract_string + CAST; integer stats per event type.",
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    kk = _ev(spark, sf_dir).select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    )
    return (
        kk.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------- VARIANT write round-trip
@register(
    "events_variant_write_roundtrip",
    """
    WITH kk AS (
      SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(sum(CAST(('0x' || substr(md5(
                 CAST(event_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
                 1, 8)) AS BIGINT)) AS BIGINT) AS content_sig
    FROM kk GROUP BY event_type ORDER BY event_type
    """,
    doc="Spark 4 VARIANT *write* path (the round-9 verdict's one "
        "unexercised VARIANT surface): parse_json(props) -> a variant "
        "COLUMN physically written to Parquet (binary variant "
        "encoding) and read back, then typed variant_get extraction "
        "on the round-tripped column. The per-(event_id, k) md5 "
        "checksum over ALL rows proves the write/read is lossless — "
        "a narrowing or null-on-rewrite bug would change the sums. "
        "DuckDB twin extracts the same values from the original JSON "
        "text, so the oracle also pins variant-vs-json equivalence. "
        "NOTE: executes eagerly at plan construction (the write IS "
        "the surface under test; the ~5-row aggregate is collected so "
        "the temp dir can be removed before returning).",
)
def events_variant_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile as _tf

    work = _tf.mkdtemp(prefix="ibf_variant_")
    try:
        _ev(spark, sf_dir).select(
            "event_id",
            "event_type",
            F.parse_json("props").alias("v"),
        ).write.mode("overwrite").parquet(work)
        back = spark.read.parquet(work).select(
            "event_id",
            "event_type",
            F.variant_get("v", "$.k", "bigint").alias("k"),
        )
        result = (
            back.groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("k").cast("long").alias("sum_k"),
                F.sum(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("event_id").cast("string"),
                                    F.lit(":"),
                                    F.col("k").cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                )
                .cast("long")
                .alias("content_sig"),
            )
            .orderBy("event_type")
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ------------------------------------------------------ OHLC candles
@register(
    "events_ohlc_candles",
    """
    WITH b AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
             CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, hr
                                ORDER BY es, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, hr
                                ORDER BY es DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, hr,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CASE WHEN rn_a = 1 THEN vm END) AS BIGINT)
             AS open_milli,
           CAST(max(vm) AS BIGINT) AS high_milli,
           CAST(min(vm) AS BIGINT) AS low_milli,
           CAST(min(CASE WHEN rn_d = 1 THEN vm END) AS BIGINT)
             AS close_milli
    FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="OHLC candle aggregation (hourly open/high/low/close per "
        "event type) — the time-series downsampling shape every "
        "monitoring or market frame needs. Spark computes open/close "
        "as min/max over a (epoch-second, event_id, value) struct — "
        "ONE partial-aggregable groupBy, no window, no second pass "
        "over the fact table (the same max(struct) keep-last idiom "
        "as A9); the oracle takes the row_number twin (DuckDB max_by "
        "rejects struct ordering keys). Tiebreak inside a second is "
        "(epoch, event_id) in BOTH engines, so first/last are "
        "deterministic; values quantized to milli-units.",
)
def events_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        _ev(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hr"),
            F.unix_timestamp("ts").cast("long").alias("es"),
            "event_id",
            F.floor(F.col("value") * 1000.0 + 0.5)
            .cast("long")
            .alias("vm"),
        )
    )
    return (
        b.groupBy("event_type", "hr")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min(F.struct("es", "event_id", "vm"))
            .getField("vm")
            .cast("long")
            .alias("open_milli"),
            F.max("vm").cast("long").alias("high_milli"),
            F.min("vm").cast("long").alias("low_milli"),
            F.max(F.struct("es", "event_id", "vm"))
            .getField("vm")
            .cast("long")
            .alias("close_milli"),
        )
        .select(
            "event_type", "hr", "n", "open_milli", "high_milli",
            "low_milli", "close_milli",
        )
        .orderBy("event_type", "hr")
    )


# ------------------------------------------------ peak concurrency
@register(
    "events_peak_concurrency",
    """
    WITH pts AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t,
             1 AS delta, event_id
      FROM events
      UNION ALL
      SELECT CAST(floor(epoch(ts)) AS BIGINT) + 1800,
             -1, event_id
      FROM events
    ), run AS (
      SELECT t,
             sum(delta) OVER (ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS conc
      FROM pts
    )
    SELECT CAST(floor((t - (t % 86400)) / 86400.0) AS BIGINT)
             AS day_idx,
           CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY 1 ORDER BY 1
    """,
    doc="Peak concurrency by sweep-line: every event opens a 30-min "
        "session, each endpoint becomes a (+1/-1) point, and the "
        "GLOBAL running sum of deltas in (t, delta, event_id) order "
        "is the live-session count after each boundary (ends sort "
        "before starts at a shared instant, so touching sessions "
        "never double-count; ROWS frame, never RANGE — peers must "
        "accumulate one at a time). The global order rides "
        "operators.windows.global_running_sum with the epoch-day as "
        "the monotone integer bucket — ONE hash exchange + broadcast "
        "offsets, no single-partition window over the fact table. "
        "Output: per-day peak concurrent sessions — the capacity-"
        "planning number an ops team actually asks for.",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.windows import (
        global_running_sum,
    )

    ev = _ev(spark, sf_dir).select(
        F.unix_timestamp("ts").cast("long").alias("t0"), "event_id"
    )
    pts = ev.select(
        F.col("t0").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        ev.select(
            (F.col("t0") + 1800).alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    run = global_running_sum(
        pts,
        ["t", "delta", "event_id"],
        "delta",
        "conc",
        bucket=F.expr("CAST(t div 86400 AS INT)"),
    )
    return (
        run.groupBy(
            F.floor((F.col("t") - (F.col("t") % 86400)) / 86400.0)
            .cast("long")
            .alias("day_idx")
        )
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
        .orderBy("day_idx")
    )


# ------------------------------------------- Holt linear-trend smoothing
# Double exponential smoothing (Holt 1957) over daily event counts per
# type — the classic trend-following forecaster next to the EWMA/MASE
# entries. The recursion l_t = α·y_t + (1-α)(l+b), b_t = β(l_t-l') +
# (1-β)b' is inherently sequential per series, which plain SQL windows
# cannot express for unbounded length — so it rides native WITH
# RECURSIVE (Spark 4.1 UnionLoop) over the per-type STEP index, ONE
# shared SQL text in both engines (the rec_cte_hierarchy parity form).
# Every iterate re-quantizes to integer micro-units with the rational
# weights folded to integers (α=0.3 → 3/7 over 10, β=0.2 → 2/8 over
# 10 — the MMR integer-mix trick), so the state is BIGINT-exact and
# engine-independent at any depth. floor(x/10.0 + 0.5) stays exact
# while |x| < 2^53 (micro-counts up to ~9e14/day — doc'd bound).
# Scale: the recursion is over DAYS within type — each step joins the
# (type × day)-sized frame, never the fact table; the fact-sized work
# is one partial-agg groupBy to day granularity.
_HW_SQL = """
WITH RECURSIVE hw(event_type, step, day_idx, n_events,
                  level_micro, trend_micro) AS (
  SELECT d0.event_type, d0.step, d0.day_idx, d0.y,
         d0.y * 1000000, CAST(0 AS BIGINT)
  FROM {daily} d0 WHERE d0.step = 1
  UNION ALL
  SELECT d.event_type, d.step, d.day_idx, d.y,
         CAST(floor((3 * d.y * 1000000
                     + 7 * (hw.level_micro + hw.trend_micro)) / 10.0
                    + 0.5) AS BIGINT),
         CAST(floor((2 * (CAST(floor((3 * d.y * 1000000
                     + 7 * (hw.level_micro + hw.trend_micro)) / 10.0
                    + 0.5) AS BIGINT) - hw.level_micro)
                     + 8 * hw.trend_micro) / 10.0 + 0.5) AS BIGINT)
  FROM {daily} d
  JOIN hw ON d.event_type = hw.event_type AND d.step = hw.step + 1
)
SELECT event_type, CAST(step AS BIGINT) AS step, day_idx,
       CAST(n_events AS BIGINT) AS n_events,
       level_micro, trend_micro,
       level_micro + trend_micro AS forecast_next_micro
FROM hw
"""

_HW_DAILY_DUCK = """(
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY day_idx) AS BIGINT) AS step,
         day_idx, y
  FROM (SELECT event_type,
               CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2)
)"""


@register(
    "events_holt_winters",
    _HW_SQL.format(daily=_HW_DAILY_DUCK),
    doc="Holt double exponential smoothing (level + trend) of daily "
        "event counts per type, via native WITH RECURSIVE over the "
        "per-type step index — ONE shared SQL text in both engines, "
        "recursion included. Each iterate re-quantizes to BIGINT "
        "micro-units with α=0.3/β=0.2 folded to integer weights, so "
        "the sequential state is exact at any depth. The recursion "
        "runs on the (type × day) frame; the only fact-sized work is "
        "the daily groupBy.",
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select("event_type", "ts")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
    ).agg(F.count("*").cast("long").alias("y"))
    daily = daily.withColumn(
        "step",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day_idx"))
        .cast("long"),
    )
    daily.createOrReplaceTempView("hw_daily")
    return spark.sql(_HW_SQL.format(daily="hw_daily"))


# ------------------------------------- item-item CF recommender
_CF_K = 5
_CF_MIN_SUPPORT = 2


@register(
    "orders_item_cf_topk",
    f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
      FROM li GROUP BY 1
    ), pair AS (
      SELECT a.l_partkey AS id_a, b.l_partkey AS id_b,
             CAST(count(*) AS BIGINT) AS support
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= {_CF_MIN_SUPPORT}
    ), mirrored AS (
      SELECT id_a AS item_id, id_b AS neighbor_id, support FROM pair
      UNION ALL
      SELECT id_b AS item_id, id_a AS neighbor_id, support FROM pair
    ), scored AS (
      SELECT m.item_id, m.neighbor_id, m.support,
             (m.support * m.support * 1000000) // (ia.n_item * ib.n_item)
               AS cos2_micro
      FROM mirrored m
      JOIN item ia ON ia.l_partkey = m.item_id
      JOIN item ib ON ib.l_partkey = m.neighbor_id
    )
    SELECT item_id, neighbor_id, support, cos2_micro, rank FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY item_id
               ORDER BY cos2_micro DESC, support DESC, neighbor_id ASC
             ) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {_CF_K}
    """,
    doc=f"Item-item collaborative-filtering recommender: top-{_CF_K} "
        "neighbors per part by co-purchase cosine similarity "
        "cos(i,j) = support_ij / sqrt(n_i * n_j), ranked via its "
        "square in exact integer micro-units (support²·10⁶ div "
        "n_i·n_j — monotone in cosine, pure BIGINT, no sqrt or "
        "double ever formed). Candidate pairs come from the basket "
        "self-join on the order key — pair space bounded by basket "
        "size (Σ per-order lines²), never items² — mined once as "
        f"i<j with support ≥ {_CF_MIN_SUPPORT}, then mirrored by "
        "projection (no second join). Item frequencies join back on "
        "the item key with no broadcast hint — the item table is "
        "part-cardinality (grows with the catalog), so AQE decides: "
        "broadcast at small SF, shuffle join at 100 TB. The per-item "
        "rank is a partitioned window keyed by item id, which shards "
        "freely at 100 TB.",
)
def orders_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = persist_tracked(li)
    item = li.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_item")
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("id_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("id_b")
    )
    pair = (
        a.join(b, "ok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= _CF_MIN_SUPPORT)
    )
    # union-free mirroring (r13, same rewrite as the graph family's
    # _sym_edges): the 2-arm unionByName re-evaluated the whole basket
    # self-join + pair aggregation once PER ARM (pair is unpersisted;
    # only the li scan below it is cached). One row-doubling explode
    # generator evaluates the pair plan ONCE — same rows, and the
    # generator also fences the pair agg from constraint-propagation
    # rewrites exactly like the windfield carriers.
    mirrored = pair.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("item_id"),
                    F.col("id_b").alias("neighbor_id"),
                    F.col("support"),
                ),
                F.struct(
                    F.col("id_b").alias("item_id"),
                    F.col("id_a").alias("neighbor_id"),
                    F.col("support"),
                ),
            )
        ).alias("__m")
    ).select("__m.item_id", "__m.neighbor_id", "__m.support")
    ia = item.select(
        F.col("l_partkey").alias("item_id"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("neighbor_id"),
        F.col("n_item").alias("n_b"),
    )
    # No broadcast hints: ia/ib are PART-cardinality aggregates of the
    # fact table (TPC-H: 200k parts/SF → ~2e9 items at 100 TB), so a
    # forced broadcast would OOM the driver at scale. AQE still picks a
    # broadcast join at bench SF from the runtime size; at catalog
    # scale it degrades gracefully to a shuffle join on the item key.
    scored = (
        mirrored.join(ia, "item_id")
        .join(ib, "neighbor_id")
        .select(
            "item_id",
            "neighbor_id",
            "support",
            F.expr(
                "(support * support * 1000000) div (n_a * n_b)"
            ).alias("cos2_micro"),
        )
    )
    w = Window.partitionBy("item_id").orderBy(
        F.col("cos2_micro").desc(),
        F.col("support").desc(),
        F.col("neighbor_id").asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _CF_K)
        .select("item_id", "neighbor_id", "support", "cos2_micro", "rank")
    )


# ------------------------------- classical seasonal decomposition
@register(
    "events_classical_decompose",
    """
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), tr AS (
      SELECT hr, n,
             sum(n) OVER w AS s,
             count(*) OVER w AS c
      FROM hourly
      WINDOW w AS (ORDER BY hr RANGE BETWEEN 12 PRECEDING
                                         AND 12 FOLLOWING)
    ), tr2 AS (
      SELECT hr, n,
             CAST((2 * s * 1000000 + c) // (2 * c) AS BIGINT)
               AS trend_micro,
             CAST(n * 1000000 - ((2 * s * 1000000 + c) // (2 * c))
               AS BIGINT) AS detr_micro
      FROM tr
    ), seas AS (
      SELECT hr % 24 AS hod,
             CAST((2 * (sum(detr_micro) + count(*) * 1000000000000)
                + count(*)) // (2 * count(*)) - 1000000000000
               AS BIGINT) AS seas_micro
      FROM tr2 GROUP BY 1
    )
    SELECT t.hr, t.n, t.trend_micro, s.seas_micro,
           CAST(t.n * 1000000 - t.trend_micro - s.seas_micro
             AS BIGINT) AS remainder_micro
    FROM tr2 t JOIN seas s ON s.hod = t.hr % 24
    ORDER BY t.hr
    """,
    doc="Classical (moving-average) seasonal decomposition of the "
        "hourly event-count series: trend = centered 25-hour mean "
        "(RANGE ±12 on the integer hour key, gap-safe), seasonal = "
        "hour-of-day mean of the detrended series, remainder = "
        "value − trend − seasonal. Every division re-quantizes to "
        "BIGINT micro-units with round-half-up folded into integers "
        "(floor((2S+c)/2c)); the seasonal mean adds a 10¹² offset "
        "first so the numerator stays positive — truncating and "
        "flooring division agree on positives, so the engines "
        "cannot diverge on negative detrended sums. The only "
        "fact-sized work is the hourly groupBy; the global RANGE "
        "window runs on the hour dimension (span-bounded, not "
        "fact-sized — partition by series id when decomposing many "
        "series).",
)
def events_classical_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("ts")
    hourly = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr")
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.orderBy("hr").rangeBetween(-12, 12)
    tr = hourly.select(
        "hr",
        "n",
        F.sum("n").over(w).alias("s"),
        F.count("*").over(w).alias("c"),
    )
    tr2 = tr.select(
        "hr",
        "n",
        F.expr("(2 * s * 1000000 + c) div (2 * c)").alias("trend_micro"),
        F.expr(
            "n * 1000000 - ((2 * s * 1000000 + c) div (2 * c))"
        ).alias("detr_micro"),
    )
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    # tr2 feeds BOTH the seasonal fit and the output join (no CTE
    # sharing in Spark) — persist the hour-dimension-sized frame so
    # the fact scan + hourly agg run once
    tr2 = persist_tracked(tr2)
    seas = tr2.groupBy((F.col("hr") % 24).alias("hod")).agg(
        F.expr(
            "(2 * (sum(detr_micro) + count(*) * 1000000000000)"
            " + count(*)) div (2 * count(*)) - 1000000000000"
        ).alias("seas_micro")
    )
    return (
        tr2.join(F.broadcast(seas), tr2["hr"] % 24 == seas["hod"])
        .select(
            "hr",
            "n",
            "trend_micro",
            "seas_micro",
            F.expr(
                "n * 1000000 - trend_micro - seas_micro"
            ).alias("remainder_micro"),
        )
        .orderBy("hr")
    )


# --------------------------------------------- time-weighted average
@register(
    "events_time_weighted_avg",
    """
    WITH ev AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm
      FROM events
    ), seg AS (
      SELECT event_type, vm,
             lead(sec) OVER (PARTITION BY event_type
                             ORDER BY sec, vm) - sec AS dur_s
      FROM ev
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dur_s) AS BIGINT) AS total_dur_s,
           CAST((2 * (sum(vm * dur_s) + sum(dur_s) * 1000000000000)
                 + sum(dur_s)) // (2 * sum(dur_s)) - 1000000000000
             AS BIGINT) AS twa_milli
    FROM seg
    WHERE dur_s IS NOT NULL AND dur_s > 0
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Time-weighted average (TWAP-style): each observation's value "
        "holds until the next observation of the same type, so the "
        "mean weights each value by its holding duration — the "
        "correct aggregate for irregularly-sampled state series "
        "where the plain mean over-weights bursts. Values quantize "
        "once to integer milli-units (floor(v·1000+0.5) on identical "
        "parquet doubles is exact); the weighted mean is a pure "
        "BIGINT rounding division with the 10^12 positivity offset. "
        "Zero-duration segments (simultaneous ties, already ordered "
        "deterministically by (sec, vm)) drop out with weight 0. One "
        "type-partitioned sort window + one keyed agg — shards "
        "freely at 100 TB.",
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.expr("CAST(floor(value * 1000.0 + 0.5) AS BIGINT)").alias("vm"),
    )
    w = Window.partitionBy("event_type").orderBy("sec", "vm")
    seg = ev.select(
        "event_type",
        "vm",
        (F.lead("sec").over(w) - F.col("sec")).alias("dur_s"),
    )
    return (
        seg.filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.sum("dur_s").cast("long").alias("total_dur_s"),
            F.expr(
                "CAST((2 * (sum(vm * dur_s)"
                " + sum(dur_s) * 1000000000000) + sum(dur_s))"
                " div (2 * sum(dur_s)) - 1000000000000 AS BIGINT)"
            ).alias("twa_milli"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------ max drawdown
@register(
    "events_max_drawdown",
    """
    WITH ev AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm
      FROM events
    ), cum AS (
      SELECT user_id, sec, event_id,
             sum(vm) OVER (PARTITION BY user_id ORDER BY sec, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS bal
      FROM ev
    ), dd_t AS (
      SELECT user_id,
             max(bal) OVER (PARTITION BY user_id ORDER BY sec, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) - bal AS dd
      FROM cum
    )
    SELECT user_id, CAST(max(dd) AS BIGINT) AS max_drawdown_milli
    FROM dd_t GROUP BY user_id
    ORDER BY max_drawdown_milli DESC, user_id ASC
    LIMIT 20
    """,
    doc="Maximum drawdown per user value series (the finance risk "
        "metric, applied per-entity): running balance = cumulative "
        "sum of milli-quantized values, drawdown = running peak − "
        "balance, report the 20 worst users. Both windows share ONE "
        "user-partitioned sort (explicit ROWS frames; (sec, event_id) "
        "is a unique order so peers cannot differ cross-engine); the "
        "final top-20 is TakeOrdered with a deterministic tiebreak. "
        "Partitioned by user — shards freely; never a global window.",
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.expr("CAST(floor(value * 1000.0 + 0.5) AS BIGINT)").alias("vm"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.select(
        "user_id", "sec", "event_id", F.sum("vm").over(w).alias("bal")
    )
    dd_t = cum.select(
        "user_id", (F.max("bal").over(w) - F.col("bal")).alias("dd")
    )
    return (
        dd_t.groupBy("user_id")
        .agg(F.max("dd").cast("long").alias("max_drawdown_milli"))
        .orderBy(
            F.col("max_drawdown_milli").desc(), F.col("user_id").asc()
        )
        .limit(20)
    )


# ------------------------------------------- funnel time-to-convert
@register(
    "events_funnel_ttc",
    """
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), c AS (
      SELECT user_id, min(sec) AS c0
      FROM ev WHERE event_type = 'click' GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.sec) AS p0
      FROM ev e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.sec >= c.c0
      GROUP BY 1
    ), ttc AS (
      SELECT c.user_id, p.p0 - c.c0 AS ttc_s
      FROM c JOIN p ON p.user_id = c.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST((2 * sum(ttc_s) * 1000 + count(*)) // (2 * count(*))
             AS BIGINT) AS mean_ttc_milli,
           round(CAST(quantile_cont(ttc_s, 0.5) AS DOUBLE), 6)
             AS p50_ttc_s,
           round(CAST(quantile_cont(ttc_s, 0.9) AS DOUBLE), 6)
             AS p90_ttc_s
    FROM ttc
    """,
    doc="Funnel time-to-convert distribution: per user, seconds from "
        "first click to first subsequent purchase; reported as "
        "conversion count, exact integer mean (rounding division in "
        "milli-seconds), and interpolated p50/p90 (Spark percentile "
        "== DuckDB quantile_cont on integer inputs at 6dp — the "
        "pinned parity fact). Complements events_funnel_conversion "
        "(the rate) with the latency a growth team actually pages "
        "on. Two user-keyed aggregates and one user equi-join; the "
        "final percentile runs over the user-count-sized conversion "
        "frame.",
)
def events_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    ev = _ev(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("sec"),
    )
    # c feeds TWO plan branches (the purchase join and the final ttc
    # join): persist so the click filter + min-agg over the fact table
    # computes once.
    c = persist_tracked(
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("sec").alias("c0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("sec") >= F.col("c0"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("p0"))
    )
    ttc = c.join(p, "user_id").select(
        (F.col("p0") - F.col("c0")).alias("ttc_s")
    )
    return ttc.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.expr(
            "CAST((2 * sum(ttc_s) * 1000 + count(*))"
            " div (2 * count(*)) AS BIGINT)"
        ).alias("mean_ttc_milli"),
        F.round(F.expr("percentile(ttc_s, 0.5)"), 6).alias("p50_ttc_s"),
        F.round(F.expr("percentile(ttc_s, 0.9)"), 6).alias("p90_ttc_s"),
    )


# ------------------------------------------------ AMS F2 sketch
# Alon-Matias-Szegedy second frequency moment: F2 = sum of squared term
# frequencies — exactly the candidate-pair count an inverted-index
# self-join would generate, so the sketch is the engine's own
# join-blowup estimator (prune_common_shingles decides from this
# number). Each of 64 counters is one map-side sum of +-1 signs (md5
# nibble parity per (counter, term)); E[c_j^2] = F2, estimate = mean
# of 64 (std <= sqrt(2/64) ~= 18% of F2 in theory; measured ~20% at
# sf0.01 — one sigma on a Zipf stream). Everything is exact integers.
_AMS_SIGNS_SQL = """CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams0:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c0,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams1:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c1,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams2:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c2,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams3:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c3,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams4:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c4,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams5:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c5,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams6:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c6,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams7:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c7,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams8:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c8,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams9:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c9,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams10:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c10,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams11:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c11,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams12:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c12,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams13:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c13,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams14:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c14,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams15:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c15,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams16:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c16,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams17:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c17,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams18:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c18,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams19:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c19,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams20:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c20,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams21:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c21,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams22:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c22,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams23:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c23,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams24:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c24,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams25:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c25,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams26:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c26,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams27:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c27,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams28:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c28,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams29:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c29,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams30:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c30,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams31:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c31,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams32:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c32,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams33:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c33,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams34:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c34,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams35:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c35,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams36:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c36,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams37:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c37,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams38:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c38,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams39:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c39,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams40:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c40,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams41:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c41,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams42:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c42,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams43:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c43,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams44:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c44,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams45:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c45,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams46:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c46,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams47:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c47,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams48:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c48,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams49:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c49,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams50:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c50,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams51:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c51,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams52:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c52,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams53:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c53,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams54:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c54,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams55:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c55,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams56:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c56,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams57:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c57,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams58:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c58,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams59:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c59,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams60:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c60,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams61:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c61,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams62:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c62,
             CAST(sum(1 - 2 * ((instr('0123456789abcdef', substr(md5(concat('ams63:', term)), 1, 1)) - 1) % 2)) AS BIGINT) AS c63"""
_AMS_EST_SQL = "(c0 * c0 + c1 * c1 + c2 * c2 + c3 * c3 + c4 * c4 + c5 * c5 + c6 * c6 + c7 * c7 + c8 * c8 + c9 * c9 + c10 * c10 + c11 * c11 + c12 * c12 + c13 * c13 + c14 * c14 + c15 * c15 + c16 * c16 + c17 * c17 + c18 * c18 + c19 * c19 + c20 * c20 + c21 * c21 + c22 * c22 + c23 * c23 + c24 * c24 + c25 * c25 + c26 * c26 + c27 * c27 + c28 * c28 + c29 * c29 + c30 * c30 + c31 * c31 + c32 * c32 + c33 * c33 + c34 * c34 + c35 * c35 + c36 * c36 + c37 * c37 + c38 * c38 + c39 * c39 + c40 * c40 + c41 * c41 + c42 * c42 + c43 * c43 + c44 * c44 + c45 * c45 + c46 * c46 + c47 * c47 + c48 * c48 + c49 * c49 + c50 * c50 + c51 * c51 + c52 * c52 + c53 * c53 + c54 * c54 + c55 * c55 + c56 * c56 + c57 * c57 + c58 * c58 + c59 * c59 + c60 * c60 + c61 * c61 + c62 * c62 + c63 * c63)"


@register(
    "sketch_ams_f2",
    f"""
    WITH terms AS (
      SELECT unnest(string_split_regex(trim(text), ' +')) AS term
      FROM documents
    ), counters AS (
      SELECT {_AMS_SIGNS_SQL}
      FROM terms
    ), exact AS (
      SELECT CAST(sum(f * f) AS BIGINT) AS exact_f2
      FROM (SELECT count(*) AS f FROM terms GROUP BY term)
    )
    SELECT exact_f2,
           CAST((2 * {_AMS_EST_SQL} + 64) // 128 AS BIGINT) AS est_f2,
           CAST(abs(CAST((2 * {_AMS_EST_SQL} + 64) // 128 AS BIGINT)
                    - exact_f2) * 1000000 // exact_f2 AS BIGINT)
             AS rel_err_micro
    FROM counters CROSS JOIN exact
    """,
    doc="AMS sketch for the second frequency moment F2 = Σ f(term)² — "
        "the self-join size estimator (F2 IS the pair count an "
        "inverted-index join on the term would produce, the number "
        "prune_common_shingles bounds). 64 independent ±1-sign "
        "counters (md5 nibble parity) accumulate in ONE map-side agg "
        "over the token stream — no shuffle keyed by term — and "
        "mean(c²) estimates F2 (std ≤ √(2/64) ≈ 18% in theory; "
        "pytest pins the measured error); the exact value needs the "
        "full term groupBy. At 100 TB the sketch costs one pass and "
        "64 BIGINTs where the exact path shuffles every distinct "
        "term — this entry runs both and reports the integer "
        "relative error.",
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " +")).alias("term")
    )
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    terms = persist_tracked(terms)
    counters = terms.agg(
        *[F.expr(e) for e in _AMS_SIGNS_SQL.split(",\n")]
    )
    exact = (
        terms.groupBy("term")
        .agg(F.count("*").alias("f"))
        .agg(F.expr("CAST(sum(f * f) AS BIGINT) AS exact_f2"))
    )
    est = f"CAST((2 * {_AMS_EST_SQL} + 64) div 128 AS BIGINT)"
    return counters.crossJoin(F.broadcast(exact)).selectExpr(
        "exact_f2",
        f"{est} AS est_f2",
        f"CAST(abs({est} - exact_f2) * 1000000 div exact_f2 AS BIGINT)"
        " AS rel_err_micro",
    )


# --------------------------------------------- association rules
_BR_TOPK = 20
_BR_MIN_CONF_MICRO = 0  # rank-only: the top-k IS the contract


@register(
    "basket_rules_confidence",
    f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
      FROM li GROUP BY 1
    ), pair AS (
      SELECT a.l_partkey AS id_a, b.l_partkey AS id_b,
             CAST(count(*) AS BIGINT) AS support
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), rules AS (
      SELECT id_a AS antecedent, id_b AS consequent, support FROM pair
      UNION ALL
      SELECT id_b AS antecedent, id_a AS consequent, support FROM pair
    ), scored AS (
      SELECT r.antecedent, r.consequent, r.support,
             CAST((2 * r.support * 1000000 + ia.n_item)
                  // (2 * ia.n_item) AS BIGINT) AS confidence_micro
      FROM rules r JOIN item ia ON ia.l_partkey = r.antecedent
    )
    SELECT antecedent, consequent, support, confidence_micro FROM (
      SELECT *, row_number() OVER (
               ORDER BY confidence_micro DESC, support DESC,
                        antecedent ASC, consequent ASC
             ) AS rk
      FROM scored WHERE confidence_micro >= {_BR_MIN_CONF_MICRO}
    ) WHERE rk <= {_BR_TOPK}
    """,
    doc=f"Directional association rules a→b: confidence = "
        "P(b|a) = support(a,b)/count(a) as an exact integer rounding "
        "division, the triple that completes the market-basket "
        "family (basket_pair_lift has support+lift; this adds the "
        f"direction). Same bounded basket self-join mined once as "
        f"i<j then mirrored by projection; the contract is RANK-ONLY "
        f"(confidence floor {_BR_MIN_CONF_MICRO} micro-units, i.e. "
        f"none — the global top-{_BR_TOPK} with full deterministic "
        "tiebreaks IS the output).",
)
def basket_rules_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        persist_tracked,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = persist_tracked(li)
    item = li.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_item")
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("id_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("id_b")
    )
    pair = (
        a.join(b, "ok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= 2)
    )
    # union-free mirroring (r13, same rewrite as orders_item_cf_topk):
    # the 2-arm unionByName re-evaluated the unpersisted basket
    # self-join + pair agg once per arm; one row-doubling explode
    # generator evaluates it once — same rows.
    rules = pair.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("antecedent"),
                    F.col("id_b").alias("consequent"),
                    F.col("support"),
                ),
                F.struct(
                    F.col("id_b").alias("antecedent"),
                    F.col("id_a").alias("consequent"),
                    F.col("support"),
                ),
            )
        ).alias("__r")
    ).select("__r.antecedent", "__r.consequent", "__r.support")
    ia = item.select(
        F.col("l_partkey").alias("antecedent"),
        F.col("n_item").alias("n_a"),
    )
    # no broadcast hint: ia is part-cardinality — AQE decides
    scored = rules.join(ia, "antecedent").select(
        "antecedent",
        "consequent",
        "support",
        F.expr(
            "CAST((2 * support * 1000000 + n_a) div (2 * n_a)"
            " AS BIGINT)"
        ).alias("confidence_micro"),
    )
    return (
        scored.filter(F.col("confidence_micro") >= _BR_MIN_CONF_MICRO)
        .orderBy(
            F.col("confidence_micro").desc(),
            F.col("support").desc(),
            F.col("antecedent").asc(),
            F.col("consequent").asc(),
        )
        .limit(_BR_TOPK)
        .select("antecedent", "consequent", "support", "confidence_micro")
    )

"""Temporal join catalog: as-of (point-in-time) join and bucketed
range join — the two time-join operators Spark's DataFrame API lacks
as primitives, re-expressed in their scalable relational formulations
(SURVEY §2 'custom operators' mandate; no reference counterpart — the
reference is a batch pipeline with no event-time joins).

- As-of: the union + tagged-sort + last_value(ignore nulls) window
  formulation — ONE shuffle on the join key, linear in rows, the
  standard distributed as-of recipe (kdb's aj / pandas merge_asof
  semantics). The oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — an
  independent implementation of the same semantics, so parity here
  validates the formulation, not just the arithmetic.
- Range join: interval predicates are not equi-joinable, so each probe
  row explodes to the fixed-width time buckets its window touches and
  the band predicate becomes the residual of a (key, bucket) hash
  join — the same decomposition as the windfield grid join; pair space
  is Σ per-bucket products, never |A|×|B|.

Both run on the events table: attribution (purchase → latest prior
click) and blast-radius (errors within ±1 h of a purchase) — the
event-log joins every training-data/analytics pipeline ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table


@register(
    "j13_asof_attribution",
    """
    WITH a AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ), b AS (
      SELECT user_id, ts, max(event_id) AS click_event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT a.event_id, a.user_id, b.click_event_id,
           CAST(floor(epoch(a.ts)) - floor(epoch(b.ts)) AS BIGINT)
             AS gap_s
    FROM a ASOF LEFT JOIN b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
    doc="As-of join (point-in-time attribution): each purchase matched "
        "to the same user's latest click at-or-before it. Spark side "
        "is the scalable union formulation — tag both streams, one "
        "sort per user on (ts, tag, id), last_value(ignore nulls) "
        "carries the most recent click forward, filter back to "
        "purchases; ONE shuffle, no range predicate, no per-row "
        "probing. Clicks are deduped to (user, ts) keep-max-id first "
        "so ties are deterministic in both engines. Oracle is "
        "DuckDB's native ASOF LEFT JOIN — an independent "
        "implementation of the semantics.",
)
def j13_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    a = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_event_id"),
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
    )
    b = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.lit(0).alias("tag"),
            "click_event_id",
            F.col("ts").alias("click_ts"),
        )
    )
    # at equal ts the click (tag 0) sorts before the purchase (tag 1),
    # so ts_b = ts_a matches — same >= semantics as ASOF JOIN
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = a.unionByName(b).select(
        "event_id",
        "user_id",
        "ts",
        "tag",
        F.last("click_event_id", ignorenulls=True)
        .over(w)
        .alias("m_click_id"),
        F.last("click_ts", ignorenulls=True).over(w).alias("m_click_ts"),
    )
    return u.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        F.col("m_click_id").alias("click_event_id"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp("m_click_ts")
        ).cast("long").alias("gap_s"),
    )


@register(
    "j14_range_join_bucketed",
    """
    WITH p AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events WHERE event_type = 'purchase'
    ), e AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events WHERE event_type = 'error'
    ), pairs AS (
      SELECT p.event_id, count(e.event_id) AS n
      FROM p JOIN e
        ON p.user_id = e.user_id AND abs(p.es - e.es) <= 3600
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id,
           CAST(coalesce(pairs.n, 0) AS BIGINT) AS n_nearby_errors
    FROM p LEFT JOIN pairs ON pairs.event_id = p.event_id
    """,
    doc="Bucketed range join (blast-radius count): errors within ±1 h "
        "of each purchase by the same user. The band predicate can't "
        "equi-join, so each purchase explodes to the <= 3 hour-buckets "
        "its window touches, errors hash to one bucket, and "
        "|Δt| <= 3600 is the residual of the (user, bucket) hash "
        "join — pair space is Σ per-bucket products (the windfield "
        "grid-join decomposition on the time axis). Purchases with no "
        "nearby error kept by a final left join against the "
        "purchase-side keys.",
)
def j14_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    es = F.unix_timestamp("ts").cast("long")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", es.alias("es")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_event_id"),
        "user_id",
        es.alias("e_es"),
        F.floor(es / 3600).alias("bucket"),
    )
    pb = p.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor((F.col("es") - 3600) / 3600),
                F.floor((F.col("es") + 3600) / 3600),
            )
        ),
    )
    counts = (
        pb.join(e, ["user_id", "bucket"])
        .filter(F.abs(F.col("es") - F.col("e_es")) <= 3600)
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    return p.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_nearby_errors"),
    )


@register(
    "a17_pivot_event_matrix",
    """
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
             AS n_click,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
             AS n_view,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
             AS n_purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
             AS n_signup,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
             AS n_error
    FROM events GROUP BY user_id
    """,
    doc="Pivot (long -> wide feature matrix): per-user event-type "
        "counts via Spark's native pivot with an EXPLICIT value list — "
        "the two-pass distinct-discovery scan is skipped and the "
        "pivot compiles to one partial-agg groupBy with conditional "
        "aggregates, which is also exactly the oracle's FILTER "
        "formulation. The standard long-to-wide step feeding a "
        "per-user feature table.",
)
def a17_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    kinds = ["click", "view", "purchase", "signup", "error"]
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(k), F.lit(0)).cast("long").alias(f"n_{k}")
            for k in kinds
        ],
    )


@register(
    "w8_scd2_intervals",
    """
    SELECT user_id, event_id, event_type AS status,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(floor(epoch(coalesce(lead(ts) OVER w, ts)))
                - floor(epoch(ts)) AS BIGINT) AS duration_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD2 validity intervals: each event opens a [valid_from, "
        "valid_to) interval closed by the user's next event (lead "
        "window, (ts, event_id) tiebreak); the open current row keeps "
        "a NULL valid_to and zero duration. The slowly-changing-"
        "dimension historization every warehouse load ships — one "
        "sort per user, no self-join.",
)
def w8_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("status"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        (
            F.unix_timestamp(F.coalesce(nxt, F.col("ts")))
            - F.unix_timestamp("ts")
        ).cast("long").alias("duration_s"),
    )


# -------------------------------------------- interval overlap join
# Variable-length interval overlap (the [start,end] x [start,end]
# self-join) — the third time-join primitive after as-of and banded
# range: here "concurrent shipments per supplier" over lineitem's
# shipment transit windows (ship date + a deterministic
# 1-20 day transit; the table carries no receipt date). Same grid
# decomposition as j14 but the
# intervals themselves are exploded to every epoch-week they touch
# (sequence(); bounded by interval length / bucket width), the
# (supplier, week) hash join bounds the pair space to Σ per-bucket
# products, the true overlap predicate is the residual, and pairs
# seen in several shared weeks dedup with one DISTINCT before the
# per-supplier rollup.
_WEEK = 604800


@register(
    "j17_interval_overlap",
    f"""
    WITH iv AS (
      SELECT l_suppkey AS supp,
             l_orderkey * 8 + l_linenumber AS iv_id,
             CAST(floor(epoch(l_shipdate)) AS BIGINT) AS s,
             CAST(floor(epoch(l_shipdate))
                  + (1 + l_orderkey % 20) * 86400 AS BIGINT) AS e
      FROM lineitem
    ), bucketed AS (
      SELECT supp, iv_id, s, e,
             unnest(generate_series(s // {_WEEK}, e // {_WEEK})) AS wk
      FROM iv
    ), pairs AS (
      SELECT a.supp, a.iv_id AS id_a, b.iv_id AS id_b,
             least(a.e, b.e) - greatest(a.s, b.s) AS overlap_s
      FROM bucketed a JOIN bucketed b
        ON a.supp = b.supp AND a.wk = b.wk AND a.iv_id < b.iv_id
      WHERE a.s <= b.e AND b.s <= a.e
        AND a.wk = greatest(a.s, b.s) // {_WEEK}
    )
    SELECT supp AS s_suppkey,
           CAST(count(*) AS BIGINT) AS n_overlap_pairs,
           CAST(sum(overlap_s) AS BIGINT) AS total_overlap_s,
           CAST(max(overlap_s) AS BIGINT) AS max_overlap_s
    FROM pairs
    GROUP BY supp ORDER BY s_suppkey
    """,
    doc="Interval-overlap self-join (concurrent shipments per "
        "supplier): transit windows exploded to the epoch-weeks "
        "they span, pair candidates from a (supplier, week) equi-join "
        "with the exact overlap test as residual; each pair is "
        "emitted ONLY in its canonical bucket (the week of the later "
        "start) so multi-week duplicates never exist — a filter in "
        "the join, not a DISTINCT shuffle over the pair set — then a "
        "supplier-keyed rollup. "
        "Pair space is Σ per-(supplier, week) products — never "
        "|A|×|B|; integer epoch seconds keep overlap arithmetic "
        "exact in both engines.",
)
def j17_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("supp"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("iv_id"),
        F.unix_timestamp("l_shipdate").cast("long").alias("s"),
        (
            F.unix_timestamp("l_shipdate")
            + (1 + F.col("l_orderkey") % 20) * 86400
        ).cast("long").alias("e"),
    )
    # Explicit co-partitioning on the join key: the pair join's OUTPUT
    # is ~10× its input, so AQE's size-based coalesce (which only sees
    # map-output bytes) would funnel it into ~3 fat tasks; a
    # user-specified numPartitions exchange is exempt from coalescing
    # and both self-join sides reuse it (one shuffle, full fan-out).
    bucketed = iv.withColumn(
        "wk",
        F.explode(
            F.sequence(
                F.expr(f"s div {_WEEK}"), F.expr(f"e div {_WEEK}")
            )
        ),
    ).repartition(64, "supp", "wk")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.supp") == F.col("b.supp"))
            & (F.col("a.wk") == F.col("b.wk"))
            & (F.col("a.iv_id") < F.col("b.iv_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
            & (
                F.col("a.wk")
                == F.expr(f"greatest(a.s, b.s) div {_WEEK}")
            ),
        )
        .select(
            F.col("a.supp").alias("supp"),
            F.col("a.iv_id").alias("id_a"),
            F.col("b.iv_id").alias("id_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("overlap_s"),
        )
    )
    return (
        pairs.groupBy("supp")
        .agg(
            F.count("*").cast("long").alias("n_overlap_pairs"),
            F.sum("overlap_s").cast("long").alias("total_overlap_s"),
            F.max("overlap_s").cast("long").alias("max_overlap_s"),
        )
        .select(
            F.col("supp").alias("s_suppkey"),
            "n_overlap_pairs",
            "total_overlap_s",
            "max_overlap_s",
        )
        .orderBy("s_suppkey")
    )

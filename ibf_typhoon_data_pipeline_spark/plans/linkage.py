"""Record-linkage / warehouse-maintenance catalog: blocked fuzzy
matching, entity clustering with survivorship, CDC merge (MERGE INTO
semantics), and the fact→SCD2 point-in-time lookup.

No reference counterpart (the reference is a forecast pipeline) —
these extend the engine the way the corpus/curation layer does, with
the same oracle discipline: identical aliases both engines, integer
or 6dp-rounded outputs, deterministic tiebreakers.

Scale notes:
- Fuzzy matching NEVER compares all pairs: a blocking key (language +
  first token) bounds the candidate set, and the quadratic work runs
  only inside a block — the standard blocking/indexing step of record
  linkage (Fellegi-Sunter pipelines, dedupe.io). The expensive
  levenshtein() runs on the bounded candidate set, as a residual of
  the block equi-join.
- Entity clustering reuses the Pregel min-label propagation from
  operators/graph.py (diameter-bounded supersteps, one equi-join +
  partial-agg min each).
- CDC merge is two keep-last partial aggs (max(struct), no window) +
  one keyed outer merge — the scalable MERGE INTO shape; nothing
  driver-side.
- The SCD2 lookup is the union + tagged-sort + last_value carry (ONE
  shuffle on user_id), not an interval join; the oracle states it
  independently as an explicit interval-containment join against
  lead()-built validity windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------- fuzzy
# Head-level fuzzy near-dup: block by (lang, first token), compare the
# first _HEAD_LEN chars by edit distance. Catches template documents
# whose openings differ by a few tokens — the curation gate that exact
# and shingle dedup both miss when the tail diverges.
_HEAD_LEN = 64
_LEV_MAX = 22

_FUZZY_PAIRS_SQL = f"""
    WITH d AS (
      SELECT doc_id, lang, split_part(text, ' ', 1) AS blk,
             substr(text, 1, {_HEAD_LEN}) AS head
      FROM documents
    ),
    fuzzy_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE levenshtein(a.head, b.head) <= {_LEV_MAX}
    )
"""


def _fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("blk"),
        F.substring("text", 1, _HEAD_LEN).alias("head"),
    )
    from ibf_typhoon_data_pipeline_spark.operators.skew import spread

    # the probe side carries the per-pair DP work after the broadcast
    # join — a single-file scan would run it on one core
    a = spread(d).select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("blk").alias("blk_a"),
        F.col("head").alias("head_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("blk").alias("blk_b"),
        F.col("head").alias("head_b"),
    )
    return (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("blk_a") == F.col("blk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            # banded DP (threshold arg): O(len * k) per pair with an
            # early exit instead of the full O(len^2) matrix; returns
            # -1 above the threshold and the exact distance within it,
            # so the value matches the oracle's plain levenshtein().
            # The explode(array(..)) generator fences the distance
            # from being alias-substituted into the join residual —
            # without it the DP runs twice per pair (join condition +
            # projection).
            F.explode(
                F.array(
                    F.levenshtein(
                        F.col("head_a"), F.col("head_b"), _LEV_MAX
                    ).cast("long")
                )
            ).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


@register(
    "link_fuzzy_blocked",
    f"""
    {_FUZZY_PAIRS_SQL}
    SELECT id_a, id_b, edit_dist FROM fuzzy_pairs
    """,
    doc="Blocked fuzzy matching: candidate pairs share a blocking key "
        "(lang, first token) — the equi-join bounds the pair space — "
        "and match when the edit distance of their 64-char heads is "
        f"<= {_LEV_MAX}. levenshtein() runs only on the blocked "
        "candidates (join residual), never all pairs: the classic "
        "record-linkage blocking/indexing decomposition.",
)
def link_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fuzzy_pairs(spark, sf_dir)


@register(
    "link_entity_clusters",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, lang, split_part(text, ' ', 1) AS blk,
             substr(text, 1, {_HEAD_LEN}) AS head
      FROM documents
    ), fuzzy_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE levenshtein(a.head, b.head) <= {_LEV_MAX}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM fuzzy_pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM fuzzy_pairs
    ), reach(node, seen) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.seen
    ), comp AS (
      SELECT node AS doc_id, min(seen) AS entity_id FROM reach GROUP BY node
    )
    SELECT c.doc_id, c.entity_id,
           CAST(count(*) OVER (PARTITION BY c.entity_id) AS BIGINT)
             AS cluster_size,
           CAST(max(doc.n_chars) OVER (PARTITION BY c.entity_id) AS BIGINT)
             AS survivor_chars
    FROM comp c JOIN documents doc ON doc.doc_id = c.doc_id
    """,
    doc="Entity resolution end-to-end: fuzzy blocked pairs -> "
        "transitive closure (Pregel min-label propagation, "
        "operators/graph.py) -> survivorship per entity (canonical id "
        "= smallest member, cluster size, max n_chars as the golden-"
        "record attribute). Oracle states the fixpoint as a recursive "
        "reachability closure, same as dedup_clusters.",
)
def link_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = _fuzzy_pairs(spark, sf_dir)
    comps = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id"
    ).withColumnRenamed("component_id", "entity_id")
    w = Window.partitionBy("entity_id")
    return (
        comps.join(docs, "doc_id")
        .select(
            "doc_id",
            "entity_id",
            F.count("*").over(w).cast("long").alias("cluster_size"),
            F.max("n_chars").over(w).cast("long").alias("survivor_chars"),
        )
    )


# ------------------------------------------------------------ CDC merge
# MERGE INTO semantics without a table format: snapshot = latest order
# per customer before the cutoff, change batch = latest per customer
# at/after it; a batch row whose status is 'F' is a delete marker,
# any other batch row upserts, untouched snapshot rows carry over.
_CDC_CUTOFF = "1999-01-01"


@register(
    "cdc_merge_upsert",
    f"""
    WITH snap AS (
      SELECT o_custkey, o_orderkey, o_orderstatus AS status,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn FROM orders
        WHERE o_orderdate < TIMESTAMP '{_CDC_CUTOFF}'
      ) WHERE rn = 1
    ), batch AS (
      SELECT o_custkey, o_orderkey, o_orderstatus AS status,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn FROM orders
        WHERE o_orderdate >= TIMESTAMP '{_CDC_CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT o_custkey, o_orderkey, status, price_cents, 'batch' AS src
    FROM batch WHERE status <> 'F'
    UNION ALL
    SELECT s.o_custkey, s.o_orderkey, s.status, s.price_cents,
           'snap' AS src
    FROM snap s ANTI JOIN batch b ON b.o_custkey = s.o_custkey
    """,
    doc="CDC merge (MERGE INTO semantics): keep-last per key on both "
        "the standing snapshot and the change batch via max(struct) "
        "partial aggs — no window, map-side combinable — then one "
        "keyed merge: batch deletes (status 'F') drop the key, other "
        "batch rows upsert, snapshot rows with no batch activity "
        "carry over via left-anti. The incremental-load shape every "
        "warehouse ships; both keep-lasts shuffle once on the merge "
        "key and the merge reuses that partitioning.",
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
    )

    def keep_last(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("o_custkey")
            .agg(
                F.max(
                    F.struct(
                        "o_orderdate",
                        "o_orderkey",
                        F.col("o_orderstatus").alias("status"),
                        "price_cents",
                    )
                ).alias("s")
            )
            .select(
                "o_custkey",
                F.col("s.o_orderkey").alias("o_orderkey"),
                F.col("s.status").alias("status"),
                F.col("s.price_cents").alias("price_cents"),
            )
        )

    cutoff = F.lit(_CDC_CUTOFF).cast("timestamp_ntz")
    snap = keep_last(orders.filter(F.col("o_orderdate") < cutoff))
    batch = keep_last(orders.filter(F.col("o_orderdate") >= cutoff))
    upserts = batch.filter(F.col("status") != "F").withColumn(
        "src", F.lit("batch")
    )
    carried = snap.join(
        batch.select("o_custkey"), "o_custkey", "left_anti"
    ).withColumn("src", F.lit("snap"))
    return upserts.unionByName(carried)


# ------------------------------------------------- SCD2 point-in-time
@register(
    "j15_scd2_pointintime",
    """
    WITH dim AS (
      SELECT user_id, ts, max(event_id) AS dim_event_id,
             max_by(event_type, event_id) AS status
      FROM events WHERE event_type <> 'purchase'
      GROUP BY user_id, ts
    ), scd2 AS (
      SELECT user_id, dim_event_id, status, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
               AS valid_to
      FROM dim
    ), fact AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, s.status, s.dim_event_id,
           CAST(floor(epoch(f.ts)) - floor(epoch(s.valid_from))
                AS BIGINT) AS age_s
    FROM fact f LEFT JOIN scd2 s
      ON s.user_id = f.user_id
     AND s.valid_from <= f.ts
     AND (f.ts < s.valid_to OR s.valid_to IS NULL)
    """,
    doc="Fact -> SCD2 dimension point-in-time lookup: each purchase "
        "reads the user's status interval active at its timestamp "
        "(non-purchase events historized per w8_scd2_intervals; "
        "same-ts dim changes deduped keep-max-event-id). Spark side "
        "avoids the interval join entirely: union + tagged sort + "
        "last_value carry, ONE shuffle on user_id — the scalable "
        "SCD2-lookup recipe. Oracle is the independent formulation: "
        "lead()-built validity windows joined on explicit interval "
        "containment.",
)
def j15_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    dim = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max(F.struct("event_id", "event_type")).alias("s")
        )
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.lit(0).alias("tag"),
            F.col("s.event_type").alias("d_status"),
            F.col("s.event_id").alias("d_event_id"),
            F.col("ts").alias("d_valid_from"),
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("string").alias("d_status"),
        F.lit(None).cast("long").alias("d_event_id"),
        F.lit(None).cast("timestamp_ntz").alias("d_valid_from"),
    )
    # at equal ts the dim change (tag 0) sorts before the fact (tag 1),
    # so a change AT the purchase instant is visible — matches the
    # oracle's valid_from <= ts containment
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = dim.unionByName(fact).select(
        "event_id",
        "user_id",
        "ts",
        "tag",
        F.last("d_status", ignorenulls=True).over(w).alias("status"),
        F.last("d_event_id", ignorenulls=True).over(w).alias(
            "dim_event_id"
        ),
        F.last("d_valid_from", ignorenulls=True).over(w).alias(
            "valid_from"
        ),
    )
    return u.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        "status",
        "dim_event_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp("valid_from")
        ).cast("long").alias("age_s"),
    )


# ------------------------------------------- incremental view maintenance
@register(
    "ivm_incremental_agg",
    """
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders GROUP BY o_custkey
    """,
    doc="Incremental view maintenance: the per-customer revenue "
        "materialized view is kept as partial aggregates (count + "
        "integer-cent sum) over the standing base, and a change batch "
        "folds in by AGGREGATING THE UNION OF PARTIALS — never "
        "rescanning the base. Because count/sum are commutative "
        "monoids over integers, merge(base_partials, delta_partials) "
        "is algebraically the full recompute — which is exactly what "
        "the oracle computes, so parity PROVES the maintenance "
        "identity. The IVM shape every incremental warehouse load "
        "relies on; both aggs partial-combine map-side and the merge "
        "shuffles only MV-sized rows.",
)
def ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
    )
    cutoff = F.lit(_CDC_CUTOFF).cast("timestamp_ntz")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("revenue_cents"),
        )

    base = partials(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partials(orders.filter(F.col("o_orderdate") >= cutoff))
    # the maintenance step: merge partials, never rescan the base
    return (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )

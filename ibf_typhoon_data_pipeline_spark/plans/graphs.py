"""Graph-analytics catalog beyond connected components: PageRank over
the customer–supplier purchase graph (orders ⋈ lineitem, symmetrized),
run as the classic Pregel iteration — per superstep one equi-join of
ranks onto edges, one partial-agg sum by destination, one left join
back onto the node set. No driver-side state; the edge and degree
frames are persisted once and reused by every superstep.

Cross-engine exactness: ranks live as INTEGER micro-units. Each
contribution is integer division rank_micro // degree (exact in both
engines), the damped update is 150000 + floor(0.85 · Σ + 0.5) where Σ
is an exact integer sum — the one double multiply is computed from
identical integers in both engines, so the floor is identical. The
oracle unrolls the fixed iteration count into one CTE per superstep
(the CLAUDE.md unrolled-iteration invariant; a recursive CTE with
aggregation in the recursive term is not portable SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibf_typhoon_data_pipeline_spark.operators.cache import (
    persist_tracked,
)
from ibf_typhoon_data_pipeline_spark.plans.registry import register
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

_PR_ITERS = 4
_PR_BASE_MICRO = 150000          # 0.15 in micro-units
_PR_DAMP = "0.85"
_PR_INIT_MICRO = 1000000         # every node starts at 1.0


def _pr_update_sql(sum_expr: str) -> str:
    """Damped update shared by both engines: the Σ is an exact BIGINT,
    the single double op is 0.85·Σ from identical inputs."""
    return (
        f"CAST({_PR_BASE_MICRO} + floor({_PR_DAMP} "
        f"* CAST({sum_expr} AS DOUBLE) + 0.5) AS BIGINT)"
    )


def _sym_edges(pairs: DataFrame, c: str = "c", s: str = "s") -> DataFrame:
    """Symmetrize a bipartite pair frame into (src, dst) WITHOUT a
    2-arm union: one explode generator doubles each row, so the
    (usually distinct-bearing orders⋈lineitem) pair plan evaluates
    ONCE per downstream pass instead of once per union arm — halving
    the work materialized into every persisted edge cache (r12;
    guide §1.2). Same rows, same columns."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(c).alias("src"), F.col(s).alias("dst")),
                F.struct(F.col(s).alias("src"), F.col(c).alias("dst")),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")


def _relabel_node(col: str = "node"):
    """Decode the internal BIGINT node id (cust → 2k, supp → 2k+1)
    back to the oracle's string label ('c123' / 's45') — the single
    home of the 2k/2k+1 encoding's inverse (ADVICE r12: it was
    copy-pasted five times and used float division; `div` is integer
    division — no double round-trip, exact at any id width)."""
    return (
        F.when(
            F.col(col) % 2 == 0,
            F.concat(F.lit("c"), F.expr(f"{col} div 2")),
        )
        .otherwise(
            F.concat(F.lit("s"), F.expr(f"({col} - 1) div 2"))
        )
        .alias(col)
    )


def _assert_full_coverage(nodes: DataFrame, e: DataFrame, who: str) -> None:
    """Validate the identity-join-back elision's invariant ONCE,
    outside the superstep loop: every node must have in-degree >= 1
    (always true for a symmetrized graph whose node set is the
    endpoint set). A caller passing a non-symmetrized graph would
    otherwise get silently wrong ranks (dropped nodes) with no error.
    One cheap anti-join on the persisted frames (ADVICE r12: factored
    out of pagerank_micro + graph_personalized_pagerank)."""
    n_sinks = nodes.join(
        e.select(F.col("dst").alias("node")), "node", "left_anti"
    ).count()
    if n_sinks:
        raise ValueError(
            f"{who}: {n_sinks} node(s) have in-degree 0; symmetrize "
            "the graph or keep the per-superstep join-back"
        )


def _loop_parts(df: DataFrame) -> int:
    """Session shuffle-partition count for iterative-loop persists.

    Loop edge/node frames repartition to EXACTLY this width so every
    superstep's groupBy output (which lands in
    ``spark.sql.shuffle.partitions`` partitions) co-partitions with
    the cached edge frame and the per-superstep join needs no
    exchange. A literal width (the pre-r12 hardcoded 32) only
    co-partitions when the session happens to run 32 shuffle
    partitions — at any other tuning (the driver re-benches at lower
    core counts, where ``session.get_spark`` sets partitions from
    ``$SPARK_GRAFT_CPUS``) the mismatch re-introduces one exchange of
    the rank/label frame per superstep. Scale-adaptive per the
    optimization guide §2: derive from session tuning, never a local
    constant."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def pagerank_micro(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = _PR_ITERS,
    full_coverage: bool = False,
) -> DataFrame:
    """(node → rank_micro) after ``iters`` damped supersteps.
    ``nodes``: one ``node`` column; ``edges``: directed (src, dst) —
    symmetrize upstream for an undirected walk.

    ``full_coverage=True`` asserts every node has in-degree >= 1
    (always true for a symmetrized graph where nodes = endpoints):
    the per-superstep left join-back onto ``nodes`` is then an
    identity and is SKIPPED — each superstep becomes exactly one
    co-partitioned edge join + one edge-sized exchange into the
    destination partial-agg, which measured ~2x faster at sf0.1
    (7.6 s → 3.2 s warm)."""
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # edges persisted ALREADY hash-partitioned on the probe key and
    # nodes on the merge key: every superstep's edge-side and
    # node-side exchanges disappear (the cached partitioning is
    # reused; only the node-sized rank/sum frames shuffle). The rank
    # frame out of each superstep's groupBy is hash(dst)/32 — the
    # SAME layout as hash(src)/32 on the edge side, so the next
    # superstep's join needs no exchange either. Without the node
    # persist, the `nodes` distinct re-executes inside every
    # superstep's left join — 4 redundant shuffles of the edge list.
    _n_parts = _loop_parts(edges)
    e = persist_tracked(edges.join(deg, "src").repartition(_n_parts, "src"))
    nodes = persist_tracked(nodes.repartition(_n_parts, "node"))
    if full_coverage:
        _assert_full_coverage(
            nodes, e, "pagerank_micro(full_coverage=True)"
        )
    rank = nodes.select(
        "node", F.lit(_PR_INIT_MICRO).cast("long").alias("rank_micro")
    )
    for _ in range(iters):
        sums = (
            e.join(rank, e.src == rank.node)
            .select("dst", F.expr("rank_micro div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        if full_coverage:
            rank = sums.select(
                F.col("dst").alias("node"),
                F.expr(_pr_update_sql("s")).alias("rank_micro"),
            )
        else:
            rank = (
                nodes.join(sums, nodes.node == sums.dst, "left")
                .select(
                    "node",
                    F.expr(_pr_update_sql("coalesce(s, 0)")).alias(
                        "rank_micro"
                    ),
                )
            )
    return rank


def _pagerank_oracle() -> str:
    steps = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""r{i} AS (
      SELECT n.node, {_pr_update_sql('coalesce(s.s, 0)')} AS rank_micro
      FROM n LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum({prev}.rank_micro // deg.deg) AS BIGINT) AS s
        FROM e JOIN {prev} ON {prev}.node = e.src
               JOIN deg ON deg.src = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )"""
        )
        prev = f"r{i}"
    chain = ", ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), e AS (
      SELECT concat('c', CAST(c AS VARCHAR)) AS src,
             concat('s', CAST(sp AS VARCHAR)) AS dst FROM pairs
      UNION ALL
      SELECT concat('s', CAST(sp AS VARCHAR)) AS src,
             concat('c', CAST(c AS VARCHAR)) AS dst FROM pairs
    ), n AS (
      SELECT DISTINCT src AS node FROM e
    ), deg AS (
      SELECT src, count(*) AS deg FROM e GROUP BY src
    ), r0 AS (
      SELECT node, CAST({_PR_INIT_MICRO} AS BIGINT) AS rank_micro FROM n
    ), {chain}
    SELECT node, rank_micro FROM {prev}
    """


@register(
    "graph_pagerank",
    _pagerank_oracle(),
    doc="PageRank (4 damped supersteps) on the symmetrized "
        "customer-supplier purchase graph: per superstep one rank⋈edge "
        "equi-join + one partial-agg sum by destination — the Pregel "
        "shape, edges+degrees persisted once across supersteps, "
        "nothing on the driver. Integer micro-unit ranks make every "
        "superstep exact in both engines; the oracle unrolls the "
        "iterations as CTEs per the repo's unrolled-Newton invariant.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # integer node ids internally (cust -> 2k, supp -> 2k+1): every
    # superstep join/shuffle hashes BIGINTs instead of 'c123' strings
    # (~40% of the superstep cost at sf0.1); the oracle's string
    # labels are re-attached in ONE final projection, so the output
    # rows — and the oracle — are unchanged.
    # persist pairs: the symmetrizing union reads it twice and the
    # degree/node derivations in pagerank_micro read the union again —
    # unpersisted, the orders⋈lineitem+distinct recomputes ~6x inside
    # one action (5.6 -> 4.4 s warm at sf0.1)
    pairs = persist_tracked(
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = _sym_edges(pairs)
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    rank = pagerank_micro(nodes, edges, full_coverage=True)
    return rank.select(_relabel_node("node"), "rank_micro")


# ------------------------------------------------------- sketches
# Cardinality estimation the oracle-checkable way: linear-time
# probabilistic counting (Whang et al. 1990, the HyperLogLog
# predecessor). The "randomness" is an md5 bucket hash — fully
# deterministic and identical in both engines, so unlike
# approx_count_distinct the estimate itself is reproducible
# cross-engine. One partial-agg pass; the bitmap is a 2^20-bucket
# count(DISTINCT bucket).
_LC_BUCKETS = 1048576  # 16^5: five md5 hex chars map exactly onto the space
_LC_EST_SQL = (
    f"CAST(CASE WHEN n_hit >= {_LC_BUCKETS} THEN {_LC_BUCKETS} "
    f"ELSE floor(-{_LC_BUCKETS}.0 * ln("
    f"CAST({_LC_BUCKETS} - n_hit AS DOUBLE) / {_LC_BUCKETS}.0) + 0.5) "
    "END AS BIGINT)"
)


@register(
    "sketch_distinct_linear_count",
    f"""
    WITH hits AS (
      SELECT count(DISTINCT substr(md5(concat('lc:',
               CAST(user_id AS VARCHAR), ':',
               CAST(event_id AS VARCHAR))), 1, 5)) AS n_hit,
             count(DISTINCT concat(CAST(user_id AS VARCHAR), ':',
               CAST(event_id AS VARCHAR))) AS exact_distinct
      FROM events
    )
    SELECT CAST(n_hit AS BIGINT) AS n_buckets_hit,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           {_LC_EST_SQL} AS estimated_distinct
    FROM hits
    """,
    doc="Linear-counting distinct sketch: md5-hash each key into "
        "m = 2^20 buckets (the 5-hex-char md5 prefix), estimate = "
        "-m·ln(empty/m), saturation-guarded — deterministic "
        "cardinality estimation (same estimate in both engines, which "
        "approx_count_distinct cannot promise), next to the exact "
        "count as the yardstick. One partial-agg scan; at 100 TB the "
        "bitmap is what crosses the wire, not the keys.",
)
def sketch_distinct_linear_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    key = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.col("event_id").cast("string"),
    )
    # the 5-hex-char prefix IS the bucket id (16^5 = _LC_BUCKETS); no
    # numeric conversion needed on either side
    bucket = F.substring(F.md5(F.concat(F.lit("lc:"), key)), 1, 5)
    hits = ev.agg(
        F.countDistinct(bucket).alias("n_hit"),
        F.countDistinct(key).alias("exact_distinct"),
    )
    return hits.selectExpr(
        "CAST(n_hit AS BIGINT) AS n_buckets_hit",
        "CAST(exact_distinct AS BIGINT) AS exact_distinct",
        f"{_LC_EST_SQL} AS estimated_distinct",
    )


# ------------------------------------------------------- data layout
# Z-order (Morton) keys — the clustering primitive behind spatially
# local file layout: range-partitioning by zkey co-locates
# lat/lon-near centroids in the same files, so the windfield's
# per-cell probes touch a bounded file set at 100 TB (Delta/Iceberg
# OPTIMIZE ZORDER does exactly this). Quantize each axis to 16 bits,
# spread with the four magic-mask doubling steps, interleave. All
# integer ops — bit-exact in both engines; each spread step is a
# materialized column per the unrolled-iteration invariant. The
# engines spell shifts differently (shiftleft vs <<) but every
# intermediate is a BIGINT, so parity is structural, not textual.
_Z_MASKS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _zorder_oracle() -> str:
    from ibf_typhoon_data_pipeline_spark.plans.typhoon import CENTROIDS_SQL

    qx = ("CAST(floor((lon + 180.0) / 360.0 * 65535.0 + 0.5) AS BIGINT)")
    qy = ("CAST(floor((lat + 90.0) / 180.0 * 65535.0 + 0.5) AS BIGINT)")
    steps = []
    prev_x, prev_y = "qx", "qy"
    for i, (sh, mask) in enumerate(_Z_MASKS):
        steps.append(
            f"s{i} AS (SELECT centroid_id, lat, lon, "
            f"({prev_x} | ({prev_x} << {sh})) & {mask} AS qx{i}, "
            f"({prev_y} | ({prev_y} << {sh})) & {mask} AS qy{i} "
            f"FROM s{i - 1})" if i else
            f"s0 AS (SELECT centroid_id, lat, lon, "
            f"(qx | (qx << {sh})) & {mask} AS qx0, "
            f"(qy | (qy << {sh})) & {mask} AS qy0 FROM q)"
        )
        prev_x, prev_y = f"qx{i}", f"qy{i}"
    chain = ", ".join(steps)
    last = len(_Z_MASKS) - 1
    return f"""
    WITH centroids AS ({CENTROIDS_SQL}),
    q AS (
      SELECT centroid_id, lat, lon, {qx} AS qx, {qy} AS qy FROM centroids
    ), {chain}
    SELECT centroid_id,
           CAST(qx{last} | (qy{last} << 1) AS BIGINT) AS zkey,
           CAST((qx{last} | (qy{last} << 1)) >> 22 AS BIGINT) AS ztile
    FROM s{last}
    """


@register(
    "layout_zorder_key",
    _zorder_oracle(),
    doc="Z-order/Morton layout keys for the centroid grid: 16-bit "
        "axis quantization, magic-mask bit spread (4 doubling steps, "
        "one materialized column each), interleave; ztile = top bits "
        "= the coarse spatial file bucket. Range-partition/sort by "
        "zkey before writing and spatial probes touch O(1) files — "
        "the OPTIMIZE ZORDER primitive as a catalog entry, pure "
        "integer codegen, zero shuffle.",
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ibf_typhoon_data_pipeline_spark.plans.typhoon import gen_centroids

    c = gen_centroids(spark).select("centroid_id", "lat", "lon")
    qx = F.floor((F.col("lon") + 180.0) / 360.0 * 65535.0 + 0.5).cast("long")
    qy = F.floor((F.col("lat") + 90.0) / 180.0 * 65535.0 + 0.5).cast("long")
    out = c.select("centroid_id", qx.alias("qx"), qy.alias("qy"))
    for i, (sh, mask) in enumerate(_Z_MASKS):
        out = out.select(
            "centroid_id",
            (
                F.col("qx").bitwiseOR(F.shiftleft("qx", sh)).bitwiseAND(
                    F.lit(mask)
                )
            ).alias("qx"),
            (
                F.col("qy").bitwiseOR(F.shiftleft("qy", sh)).bitwiseAND(
                    F.lit(mask)
                )
            ).alias("qy"),
        )
    zkey = F.col("qx").bitwiseOR(F.shiftleft("qy", 1))
    return out.select(
        "centroid_id",
        zkey.cast("long").alias("zkey"),
        F.shiftright(zkey, 22).cast("long").alias("ztile"),
    )


# ------------------------------------------------- quantile histogram
# Completes the sketch trio (linear-counting cardinality, count-min
# frequency, histogram quantiles). Shared SQL texts for the bin
# assignment and the estimate so both engines bin and interpolate
# identical doubles; the cumulative walk runs over the <= 1024-row
# histogram, never the fact table.
_QH_BINS = 1024
_QH_BIN_SQL = (
    f"least(CAST(floor((l_extendedprice - lo) / (hi - lo) * {_QH_BINS}.0) "
    f"AS BIGINT), {_QH_BINS - 1})"
)
_QH_EST_SQL = (
    f"round(lo + (hi - lo) * (CAST(qbin AS DOUBLE) + 0.5) / {_QH_BINS}.0, 4)"
)


@register(
    "sketch_quantile_histogram",
    f"""
    WITH bounds AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
             count(*) AS n
      FROM lineitem
    ), hist AS (
      SELECT {_QH_BIN_SQL} AS bin, count(*) AS c
      FROM lineitem CROSS JOIN bounds GROUP BY 1
    ), cum AS (
      SELECT bin, sum(c) OVER (ORDER BY bin
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM hist
    ), qs AS (
      SELECT unnest([50, 95, 99]) AS pct
    ), hits AS (
      SELECT q.pct, min(cum.bin) AS qbin
      FROM qs q CROSS JOIN bounds b
      JOIN cum ON cum.cc >= CAST(ceil(b.n * q.pct / 100.0) AS BIGINT)
      GROUP BY q.pct
    )
    SELECT CAST(h.pct AS BIGINT) AS pct,
           CAST(h.qbin AS BIGINT) AS bin_idx,
           CAST(b.n AS BIGINT) AS n_rows,
           {_QH_EST_SQL} AS est_value
    FROM hits h CROSS JOIN bounds b
    """,
    doc="Histogram quantile sketch: one partial-agg pass bins "
        "l_extendedprice into 1024 equi-width buckets (bounds from a "
        "min/max agg), p50/p95/p99 read off the cumulative histogram "
        "with midpoint interpolation. The cumulative window and the "
        "rank probe run on the <= 1024-row histogram — bounded by "
        "construction at any data volume; at 100 TB the histogram is "
        "what crosses the wire (the t-digest trade: fixed memory, "
        "bounded (hi-lo)/1024 error, deterministic in both engines "
        "where approx_percentile is not).",
)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count("*").alias("n"),
    )
    hist = (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(F.expr(_QH_BIN_SQL).alias("bin"))
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    # global-order window is safe here: the input is the <= 1024-row
    # histogram, not the fact table (docs/SCALING.md global-order rule)
    cum = hist.select(
        "bin",
        F.sum("c")
        .over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cc"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(95), F.lit(99))).alias("pct")
    )
    hits = (
        qs.crossJoin(F.broadcast(bounds))
        .join(
            F.broadcast(cum),
            F.col("cc")
            >= F.ceil(F.col("n") * F.col("pct") / 100.0).cast("long"),
        )
        .groupBy("pct")
        .agg(F.min("bin").alias("qbin"))
    )
    return (
        hits.crossJoin(F.broadcast(bounds))
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.col("qbin").cast("long").alias("bin_idx"),
            F.col("n").cast("long").alias("n_rows"),
            F.expr(_QH_EST_SQL).alias("est_value"),
        )
    )


# ------------------------------------------------- triangle counting
@register(
    "graph_triangle_count",
    """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM e e1 JOIN e e2 ON e2.a = e1.b
                           JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
                ) AS BIGINT) AS n_triangles
    """,
    doc="Triangle count over the part co-purchase graph (parts sharing "
        "an order are adjacent). Spark side runs the degree-oriented "
        "compact-forward algorithm: orient every edge from its lower "
        "(degree, id) endpoint to the higher, join oriented edges "
        "u->v with v->w into wedges, then semi-join u->w — wedge work "
        "is bounded by O(m^1.5) regardless of skew (a hub of degree d "
        "contributes min(d, sqrt(2m))^2, not d^2), THE published "
        "scale recipe for triangle enumeration. The oracle counts the "
        "same triangles from the canonical a<b<c form — orientation-"
        "invariant, so equality validates the oriented decomposition "
        "itself.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b")
    )
    und = (
        a.join(b, "ok")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    und = persist_tracked(und)
    # degree per node over the undirected edge set
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(
        F.col("node").alias("a"), F.col("deg").alias("deg_a")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("deg").alias("deg_b")
    )
    # orient low (deg, id) -> high (deg, id): out-degree <= sqrt(2m)
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | (
                    (F.col("deg_a") == F.col("deg_b"))
                    & (F.col("a") < F.col("b"))
                ),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst"))
            )
            .alias("e")
        )
        .select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
    )
    oriented = persist_tracked(oriented)
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "v").select("u", "w")
    closing = oriented.select(
        F.col("src").alias("u"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["u", "w"], "left_semi")
    n_e = und.agg(F.count("*").cast("long").alias("n_edges"))
    n_t = tri.agg(F.count("*").cast("long").alias("n_triangles"))
    return n_e.crossJoin(n_t)


# --------------------------------------------- personalized PageRank
# Same Pregel iteration as graph_pagerank, but the teleport mass
# returns to a SOURCE SET instead of spreading uniformly — the seeded
# relevance propagation behind graph-based retrieval ("find suppliers
# relevant to these customers"). Sources: the customers of nation 0.
_PPR_ITERS = 4


def _ppr_update_sql(sum_expr: str, is_src: str) -> str:
    """Teleport mass lands only on sources; the damped spread term is
    the same exact-integer formulation as graph_pagerank."""
    return (
        f"CAST(CASE WHEN {is_src} = 1 THEN {_PR_BASE_MICRO} ELSE 0 END"
        f" + floor({_PR_DAMP} * CAST({sum_expr} AS DOUBLE) + 0.5)"
        " AS BIGINT)"
    )


def _ppr_oracle() -> str:
    steps = []
    prev = "r0"
    for i in range(1, _PPR_ITERS + 1):
        steps.append(
            f"""r{i} AS (
      SELECT n.node, n.is_src,
             {_ppr_update_sql('coalesce(s.s, 0)', 'n.is_src')} AS rank_micro
      FROM n LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum({prev}.rank_micro // deg.deg) AS BIGINT) AS s
        FROM e JOIN {prev} ON {prev}.node = e.src
               JOIN deg ON deg.src = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )"""
        )
        prev = f"r{i}"
    chain = ", ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), e AS (
      SELECT concat('c', CAST(c AS VARCHAR)) AS src,
             concat('s', CAST(sp AS VARCHAR)) AS dst FROM pairs
      UNION ALL
      SELECT concat('s', CAST(sp AS VARCHAR)) AS src,
             concat('c', CAST(c AS VARCHAR)) AS dst FROM pairs
    ), srcs AS (
      SELECT concat('c', CAST(c_custkey AS VARCHAR)) AS node
      FROM customer WHERE c_nationkey = 0
    ), n AS (
      SELECT DISTINCT e.src AS node,
             CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS is_src
      FROM e LEFT JOIN srcs s ON s.node = e.src
    ), deg AS (
      SELECT src, count(*) AS deg FROM e GROUP BY src
    ), r0 AS (
      SELECT node, is_src,
             CAST(CASE WHEN is_src = 1 THEN {_PR_INIT_MICRO} ELSE 0 END
                  AS BIGINT) AS rank_micro
      FROM n
    ), {chain}
    SELECT node, rank_micro FROM {prev} WHERE rank_micro > 0
    """


@register(
    "graph_personalized_pagerank",
    _ppr_oracle(),
    doc="Personalized PageRank: teleport mass returns ONLY to the "
        "seed set (nation-0 customers), ranks start at zero off-seed "
        "— after 4 damped supersteps the rank field measures "
        "proximity to the seeds through the purchase graph (seeded "
        "relevance propagation, the graph-retrieval primitive). Same "
        "exact-integer Pregel iteration and unrolled-CTE oracle as "
        "graph_pagerank; zero-rank nodes are filtered so the output "
        "is the reachable relevance set.",
)
def graph_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # integer node ids internally (cust -> 2k, supp -> 2k+1): every
    # superstep shuffle hashes BIGINTs instead of 'c123' strings; the
    # oracle's labels are re-attached in ONE final projection (same
    # rewrite as graph_pagerank/graph_bfs_hops — string keys measured
    # ~40% of the superstep shuffle cost in r7).
    # persist pairs: read by the edge explode, the degree agg, and the
    # node distinct (>= 3 derivations — the r7 persist rule).
    pairs = persist_tracked(
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = _sym_edges(pairs)
    srcs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    _n_parts = _loop_parts(edges)
    # The teleport mask rides the persisted EDGE frame: the update
    # needs is_src(dst), which is functionally dependent on dst, so
    # carrying it per edge row lets every superstep re-derive it
    # inside the SAME destination partial agg (max over a per-dst
    # constant 0/1) instead of re-joining the node table each round.
    # srcs is customer-derived (SF-scaling): one-shot build-time
    # join, AQE-decided, no forced hint (r7 #1).
    e = persist_tracked(
        edges.join(deg, "src")
        .join(
            srcs.select(F.col("node").alias("dst")).withColumn(
                "dst_is_src", F.lit(1)
            ),
            "dst",
            "left",
        )
        .select(
            "src",
            "dst",
            "deg",
            F.coalesce("dst_is_src", F.lit(0)).alias("dst_is_src"),
        )
        .repartition(_n_parts, "src")
    )
    nodes = persist_tracked(
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("node"))
        .repartition(_n_parts, "node")
    )
    # Identity-join-back elision (pagerank_micro full_coverage=True,
    # 7.6 -> 3.2 s warm there): on the symmetrized graph every node
    # has in-degree >= 1, so from round 1 on the destination agg
    # itself emits the FULL node set and the old per-superstep left
    # join-back onto `nodes` was an identity — skipped. One cheap
    # anti-join validates the invariant once, outside the loop.
    _assert_full_coverage(nodes, e, "graph_personalized_pagerank")
    # r0 over ALL nodes (rank 0 off-seed) — one-time annotation join
    # so round 1's edge join sees every node exactly like the oracle's
    # r0 CTE; srcs not in the graph drop out on both sides.
    rank = nodes.join(
        srcs.withColumn("is_src", F.lit(1)), "node", "left"
    ).select(
        "node",
        F.expr(
            f"CAST(CASE WHEN is_src = 1 THEN {_PR_INIT_MICRO}"
            " ELSE 0 END AS BIGINT)"
        ).alias("rank_micro"),
    )
    for _ in range(_PPR_ITERS):
        # one co-partitioned edge join (e cached hash(src)/N, rank out
        # of the previous agg hash(node)/N) + one destination-agg
        # exchange per superstep — the pagerank shape; `s` is never
        # NULL here (every node receives >= 1 contribution row), so
        # the update drops the old coalesce without changing a value.
        rank = (
            e.join(rank, e.src == rank.node)
            .select(
                "dst",
                "dst_is_src",
                F.expr("rank_micro div deg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(
                F.sum("contrib").alias("s"),
                F.max("dst_is_src").alias("is_src"),
            )
            .select(
                F.col("dst").alias("node"),
                F.expr(_ppr_update_sql("s", "is_src")).alias(
                    "rank_micro"
                ),
            )
        )
    return rank.filter(F.col("rank_micro") > 0).select(
        _relabel_node("node"), "rank_micro"
    )


@register(
    "sketch_distinct_by_group",
    f"""
    WITH hits AS (
      SELECT event_type,
             count(DISTINCT substr(md5(concat('lcg:',
               CAST(user_id AS VARCHAR))), 1, 5)) AS n_hit,
             count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_hit AS BIGINT) AS n_buckets_hit,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           {_LC_EST_SQL} AS estimated_distinct
    FROM hits
    """,
    doc="Per-group linear counting: distinct users per event type via "
        "the same 2^20-bucket md5 sketch, alongside the exact count "
        "as yardstick. The GROUPED form is the one dashboards ship "
        "(distinct visitors per page/day): one partial-agg pass where "
        "only (group, bucket) pairs cross the wire — sketch accuracy "
        "and memory are per group, so hot groups don't degrade cold "
        "ones.",
)
def sketch_distinct_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    )
    hits = ev.groupBy("event_type").agg(
        F.countDistinct(
            F.substring(
                F.md5(F.concat(F.lit("lcg:"), F.col("user_id").cast("string"))),
                1,
                5,
            )
        ).alias("n_hit"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    return hits.select(
        "event_type",
        F.col("n_hit").cast("long").alias("n_buckets_hit"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.expr(_LC_EST_SQL).alias("estimated_distinct"),
    )


# ------------------------------------- sampled triangle estimation
# The scale path for dense graphs where even the oriented wedge work
# is too heavy: keep each edge iff a deterministic md5 bucket of the
# CANONICAL pair lands under p = 1/4 (every triangle survives with
# p^3 = 1/64), count triangles on the sample, scale by 64 — the
# classic doulion/edge-sparsification estimator, here with hash
# sampling so both engines draw the SAME sample and the estimate is
# reproducible, not merely unbiased.
_TRI_P_DEN = 4  # keep 1 in 4 edges
_TRI_SCALE = _TRI_P_DEN ** 3
_TRI_KEEP_SQL = (
    "((instr('0123456789abcdef', substr(md5(concat('tri:',"
    " CAST(a AS STRING), ':', CAST(b AS STRING))), 1, 1)) - 1)"
    f" % {_TRI_P_DEN}) = 0"
)


@register(
    "graph_triangle_estimate",
    f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), s AS (
      SELECT a, b FROM e WHERE {_TRI_KEEP_SQL}
    )
    SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_edges_sampled,
           CAST((SELECT count(*)
                 FROM s e1 JOIN s e2 ON e2.a = e1.b
                           JOIN s e3 ON e3.a = e1.a AND e3.b = e2.b
                ) AS BIGINT) AS n_triangles_sampled,
           CAST((SELECT count(*)
                 FROM s e1 JOIN s e2 ON e2.a = e1.b
                           JOIN s e3 ON e3.a = e1.a AND e3.b = e2.b
                ) * {_TRI_SCALE} AS BIGINT) AS n_triangles_est
    """,
    doc="Sampled triangle estimation (edge sparsification / DOULION): "
        f"keep each canonical edge iff its md5 bucket is 0 of "
        f"{_TRI_P_DEN} — a triangle survives with p³, so the sampled "
        f"count scales by {_TRI_SCALE}. Hash sampling makes the "
        "sample (and therefore the estimate) identical in both "
        "engines — reproducible where rand() sampling is only "
        "unbiased. Wedge work drops by ~p²·sqrt(p) versus the exact "
        "oriented count (graph_triangle_count, the yardstick); THE "
        "knob when even O(m^1.5) is too much at 100 TB.",
)
def graph_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b")
    )
    s = persist_tracked(
        a.join(b, "ok")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .filter(F.expr(_TRI_KEEP_SQL))
    )
    e1 = s.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = s.select(F.col("a").alias("v"), F.col("b").alias("w"))
    closing = s.select(F.col("a").alias("u"), F.col("b").alias("w"))
    tri = (
        e1.join(e2, "v")
        .select("u", "w")
        .join(closing, ["u", "w"], "left_semi")
    )
    n_e = s.agg(F.count("*").cast("long").alias("n_edges_sampled"))
    n_t = tri.agg(
        F.count("*").cast("long").alias("n_triangles_sampled"),
        (F.count("*") * _TRI_SCALE).cast("long").alias("n_triangles_est"),
    )
    return n_e.crossJoin(n_t)


@register(
    "sketch_distinct_mergeable",
    f"""
    WITH buckets AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS half,
             substr(md5(concat('lcm:', CAST(user_id AS STRING))), 1, 5)
               AS bucket
      FROM events
    ), merged AS (
      SELECT count(DISTINCT bucket) AS n_hit FROM buckets
    ), halves AS (
      SELECT half, count(DISTINCT bucket) AS n_hit_half
      FROM buckets GROUP BY half
    )
    SELECT CAST((SELECT n_hit FROM merged) AS BIGINT) AS n_buckets_union,
           CAST((SELECT sum(n_hit_half) FROM halves) AS BIGINT)
             AS n_buckets_summed,
           {_LC_EST_SQL.replace('n_hit', '(SELECT n_hit FROM merged)')}
             AS estimated_distinct
    FROM merged
    """,
    doc="Sketch mergeability: the linear-counting bitmap of a UNION "
        "is the union of the per-shard bitmaps (bucket sets OR "
        "together losslessly), so two shards sketched independently "
        "merge into exactly the sketch of the whole — the algebraic "
        "property that lets 1000 executors sketch locally and merge "
        "one bitmap each. The entry computes the merged estimate from "
        "per-half bucket sets and exposes the naive sum of per-half "
        "hits as the overcount yardstick; the oracle computes the "
        "same identity directly.",
)
def sketch_distinct_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    buckets = ev.select(
        (F.col("event_id") % 2 == 0).cast("int").alias("half_is_even"),
        F.substring(
            F.md5(F.concat(F.lit("lcm:"), F.col("user_id").cast("string"))),
            1,
            5,
        ).alias("bucket"),
    )
    # per-shard sketches (the distributed step)...
    halves = buckets.groupBy("half_is_even").agg(
        F.countDistinct("bucket").alias("n_hit_half")
    )
    # ...merge = distinct over the union of bucket sets
    merged = buckets.select("bucket").distinct().agg(
        F.count("*").cast("long").alias("n_hit")
    )
    summed = halves.agg(
        F.sum("n_hit_half").cast("long").alias("n_buckets_summed")
    )
    return (
        merged.crossJoin(summed)
        .select(
            F.col("n_hit").cast("long").alias("n_buckets_union"),
            "n_buckets_summed",
            F.expr(_LC_EST_SQL).alias("estimated_distinct"),
        )
    )


# --------------------------------------------- zone-map layout stats
@register(
    "layout_zone_maps",
    """
    WITH keyed AS (
      SELECT CAST((instr('0123456789abcdef',
               substr(md5(concat('zm:', CAST(l_orderkey AS STRING))),
                      1, 1)) - 1) AS INTEGER) AS file_bucket,
             CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_cents,
             l_shipdate
      FROM lineitem
    )
    SELECT file_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(price_cents) AS BIGINT) AS min_price_cents,
           CAST(max(price_cents) AS BIGINT) AS max_price_cents,
           strftime(min(l_shipdate), '%Y-%m-%d') AS min_shipdate,
           strftime(max(l_shipdate), '%Y-%m-%d') AS max_shipdate
    FROM keyed GROUP BY file_bucket
    """,
    doc="Zone maps (file-skipping manifest stats): per write-bucket "
        "min/max/count for the pruning columns — the metadata a "
        "lakehouse manifest keeps so scans can skip whole files on "
        "range predicates. Buckets are a deterministic md5 nibble of "
        "the write key (16 'files'); one partial-agg pass produces "
        "the manifest, the same shuffle shape the real writer's "
        "per-file statistics collection has. Companion to "
        "layout_zorder_key, whose test proves the skipping pays off.",
)
def layout_zone_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_shipdate"
    )
    keyed = li.select(
        F.expr(
            "CAST((instr('0123456789abcdef',"
            " substr(md5(concat('zm:', CAST(l_orderkey AS STRING))),"
            " 1, 1)) - 1) AS INT)"
        ).alias("file_bucket"),
        F.round(F.col("l_extendedprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
        "l_shipdate",
    )
    return keyed.groupBy("file_bucket").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("price_cents").cast("long").alias("min_price_cents"),
        F.max("price_cents").cast("long").alias("max_price_cents"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias(
            "min_shipdate"
        ),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias(
            "max_shipdate"
        ),
    )


# ------------------------------------------------- multi-source BFS
# Shortest hop count from a seed set, the frontier-expansion primitive
# (reachability, influence radius, taint propagation). Pregel min-plus
# shape: each superstep is ONE dist⋈edge equi-join + a partial-agg min
# by destination + a left join back onto the node set — exact integer
# hop counts, so both engines agree bitwise and the oracle unrolls the
# supersteps as CTEs (the repo's unrolled-iteration invariant). Nodes
# not reached within the superstep budget report hop = -1.
_BFS_ITERS = 4
# NULL-aware min(dist, candidate): spelled explicitly because Spark and
# DuckDB `least` differ on NULL handling across versions.
_BFS_MIN_SQL = (
    "CASE WHEN d IS NULL THEN nd WHEN nd IS NULL THEN d "
    "WHEN nd < d THEN nd ELSE d END"
)


def _bfs_oracle() -> str:
    steps = []
    prev = "d0"
    for i in range(1, _BFS_ITERS + 1):
        steps.append(
            f"""d{i} AS (
      SELECT n.node,
             CASE WHEN {prev}.hop IS NULL THEN u.nd
                  WHEN u.nd IS NULL THEN {prev}.hop
                  WHEN u.nd < {prev}.hop THEN u.nd
                  ELSE {prev}.hop END AS hop
      FROM n JOIN {prev} ON {prev}.node = n.node
      LEFT JOIN (
        SELECT e.dst AS node, CAST(min(p.hop + 1) AS BIGINT) AS nd
        FROM e JOIN {prev} p ON p.node = e.src
        WHERE p.hop IS NOT NULL
        GROUP BY e.dst
      ) u ON u.node = n.node
    )"""
        )
        prev = f"d{i}"
    chain = ", ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), e AS (
      SELECT concat('c', CAST(c AS VARCHAR)) AS src,
             concat('s', CAST(sp AS VARCHAR)) AS dst FROM pairs
      UNION ALL
      SELECT concat('s', CAST(sp AS VARCHAR)) AS src,
             concat('c', CAST(c AS VARCHAR)) AS dst FROM pairs
    ), n AS (
      SELECT DISTINCT src AS node FROM e
    ), seeds AS (
      SELECT DISTINCT concat('s', CAST(s_suppkey AS VARCHAR)) AS node
      FROM supplier WHERE s_nationkey < 3
    ), d0 AS (
      SELECT n.node,
             CASE WHEN s.node IS NOT NULL THEN CAST(0 AS BIGINT) END
               AS hop
      FROM n LEFT JOIN seeds s ON s.node = n.node
    ), {chain}
    SELECT node, CAST(coalesce(hop, -1) AS BIGINT) AS hop FROM {prev}
    """


@register(
    "graph_bfs_hops",
    _bfs_oracle(),
    doc=f"Multi-source BFS ({_BFS_ITERS} supersteps) on the "
        "symmetrized customer-supplier purchase graph, seeded by "
        "suppliers in nations 0-2: per superstep one frontier⋈edge "
        "equi-join + partial-agg min by destination — the Pregel "
        "min-plus shape with edges persisted once, nothing on the "
        "driver. Hop counts are exact integers; unreached nodes "
        "report -1. Oracle unrolls the supersteps as CTEs.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # integer node ids internally (cust -> 2k, supp -> 2k+1), mapped
    # back to the oracle's string labels in ONE final projection —
    # BIGINT join keys shave ~40% off every superstep shuffle vs
    # hashing 'c123' strings (same rewrite as graph_pagerank).
    # NOT persisted: without the distinct, pairs is a pipelined
    # scan+broadcast-join — recomputing it for the union's second arm
    # beats caching it (A/B: 3.15 vs 3.45 s warm; the persist-pairs
    # rewrite only pays off where MANY derivations re-read a
    # distinct-bearing pairs, i.e. PageRank/PPR — LPA's persisted
    # edges already bound the recompute to 2x and prefer no persist)
    pairs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("c"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    )
    # NO distinct on the edge list: BFS is a MIN recursion, so
    # duplicate edges cannot change any hop (the oracle keeps its
    # DISTINCT — values identical); dropping it took the warm entry
    # 4.1 -> 2.6 s at sf0.1. Trade-off: the persisted list
    # carries duplicate (cust, supp) pairs (~2% here; a corpus with
    # heavy reordering would reinstate the distinct to shrink the
    # cache at the cost of one shuffle). LPA/PageRank keep their
    # distinct — their aggregates count edge multiplicity.
    # union-free symmetrization (r12): one explode generator doubles
    # each pair row, so the orders⋈lineitem pair plan evaluates ONCE
    # into the persisted edge cache instead of once per union arm —
    # strictly better than both r7 options (persist pairs: 3.45 s;
    # recompute per arm: 3.15 s), same rows.
    edges = persist_tracked(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        # hash-partitioned on the DESTINATION key (r13, VERDICT r12
        # item 1): the broadcast frontier probe preserves the cached
        # edge partitioning, so every superstep's reached-candidate
        # groupBy(dst) — the only fact-sized shuffle in the loop —
        # needs NO exchange. One edge-sized exchange at cache build
        # replaces one candidate exchange per superstep (paired A/B
        # 0.933 vs the r12 no-repartition shape; the r12 note about
        # dropping the repartition removed a USELESS hash(src) — the
        # frontier is broadcast so src-partitioning bought nothing —
        # while dst-partitioning feeds the agg).
        .repartition(_loop_parts(pairs), "dst")
    )
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 3)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
        .distinct()
        .withColumn("is_seed", F.lit(1))
    )
    # seeds is supplier-derived (SF-scaling) — one-shot init join,
    # strategy AQE-decided, no forced hint (r7 #1). The per-superstep
    # FRONTIER broadcasts below are different: deltas bounded by the
    # newly-reached set, with the documented drop-the-hint fallback.
    dist = nodes.join(seeds, "node", "left").select(
        "node",
        F.when(F.col("is_seed").isNotNull(), F.lit(0))
        .cast("long")
        .alias("hop"),
    )
    # each superstep reads `dist` TWICE (frontier + the join-back), so
    # the frame must be persisted per superstep: without it the lazy
    # plan doubles every iteration and the final action recomputes
    # O(2^iters) copies of the base join (measured 23 s -> ~4 s at
    # sf0.1 under full materialization). persist_tracked keeps the
    # release_caches() contract.
    dist = persist_tracked(dist)
    for it in range(_BFS_ITERS):
        # classic BFS frontier: only nodes FIRST reached in the
        # previous superstep (hop == it) can improve anything — a
        # node with hop < it already expanded in an earlier round, so
        # re-joining it against the edge list is pure waste (on this
        # dense bipartite graph the reached set saturates by hop 2,
        # making the old full-frontier join ~3x the necessary work).
        # Min-BFS invariant: every newly reached node's hop equals
        # the superstep index that assigned it.
        frontier = dist.filter(F.col("hop") == it).select(
            F.col("node").alias("src"), F.col("hop")
        )
        # the frontier is node-sized (orders of magnitude below the
        # edge list) — broadcast it so the edge side is probed in
        # place. With the edge cache hash-partitioned on dst, the
        # reached-candidate stream arrives at the min-agg ALREADY
        # partitioned by its group key — zero exchanges on the
        # fact-sized path per superstep; only the node-sized
        # join-back side still shuffles (trivial bytes). At a scale
        # where a hop's frontier outgrows broadcast, drop the hint
        # and the persisted hash layout takes over.
        upd = (
            edges.join(F.broadcast(frontier), "src")
            .groupBy("dst")
            .agg((F.min("hop") + 1).cast("long").alias("nd"))
        )
        dist = persist_tracked(
            dist.join(upd, dist.node == upd.dst, "left")
            .select("node", F.col("hop").alias("d"), "nd")
            .select(
                "node", F.expr(_BFS_MIN_SQL).cast("long").alias("hop")
            )
        )
    return dist.select(
        _relabel_node("node"),
        F.coalesce("hop", F.lit(-1)).cast("long").alias("hop"),
    )


# ------------------------------------------------- HyperLogLog proper
# Flajolet et al. 2007 with p=8 (256 registers), the algorithm behind
# approx_count_distinct — but deterministic and oracle-checkable: the
# hash is md5, the register maxima are exact integers, and the
# harmonic sum is computed in scaled-integer space (each register
# contributes 2^(40 - M_j), an exact BIGINT since M_j <= 33), so both
# engines reduce identical integers in any order. Registers never hit
# contribute 2^40 each via the (m - n_hit) closed form — no register
# dimension table needed. The small-range linear-counting correction
# branch is kept for algorithmic fidelity (exercised identically on
# identical integers).
_HLL_P = 8
_HLL_M = 1 << _HLL_P  # 256 registers: the 2-hex-char md5 prefix
_HLL_ALPHA = "0.7182725932495458"  # 0.7213/(1+1.079/256), 17 sig digits
# rho (first-1-bit position) of the 8-hex-char (32-bit) suffix w:
# 4 * (leading zero hex chars) + nibble contribution + 1.
_HLL_RHO_SQL = (
    "CAST(4 * (length(w) - length(trim(LEADING '0' FROM w))) "
    "+ (CASE substr(trim(LEADING '0' FROM w) || 'f', 1, 1) "
    "   WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
    "   WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 "
    "   WHEN '7' THEN 1 ELSE 0 END) + 1 AS BIGINT)"
)
_HLL_TERM_SQL = "CAST(power(2.0, CAST(40 - mj AS DOUBLE)) AS BIGINT)"
# raw estimate from the scaled-integer harmonic sum (sum_term is
# Σ 2^(40-M_j) over all m registers, an exact BIGINT)
_HLL_RAW_SQL = (
    f"CAST('{_HLL_ALPHA}' AS DOUBLE) * {_HLL_M}.0 * {_HLL_M}.0 "
    f"/ (CAST(sum_term AS DOUBLE) / 1099511627776.0)"
)
_HLL_EST_SQL = (
    f"CAST(floor(CASE WHEN n_zero > 0 AND {_HLL_RAW_SQL} <= 2.5 * {_HLL_M} "
    f"THEN -{_HLL_M}.0 * ln(CAST(n_zero AS DOUBLE) / {_HLL_M}.0) "
    f"ELSE {_HLL_RAW_SQL} END + 0.5) AS BIGINT)"
)


@register(
    "sketch_hyperloglog",
    f"""
    WITH keyed AS (
      SELECT md5(concat('hll:', CAST(user_id AS VARCHAR), ':',
                        CAST(event_id AS VARCHAR))) AS h,
             concat(CAST(user_id AS VARCHAR), ':',
                    CAST(event_id AS VARCHAR)) AS k
      FROM events
    ), rho AS (
      SELECT substr(h, 1, 2) AS reg, {_HLL_RHO_SQL} AS rho
      FROM (SELECT h, substr(h, 3, 8) AS w FROM keyed) t
    ), regs AS (
      SELECT reg, CAST(max(rho) AS BIGINT) AS mj FROM rho GROUP BY reg
    ), summed AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hit,
             CAST(sum({_HLL_TERM_SQL}) AS BIGINT) AS hit_term
      FROM regs
    ), exact AS (
      SELECT CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct
      FROM keyed
    )
    SELECT n_hit AS n_regs_hit,
           CAST({_HLL_M} - n_hit AS BIGINT) AS n_zero,
           CAST(hit_term
                + ({_HLL_M} - n_hit) * 1099511627776 AS BIGINT)
             AS sum_term,
           exact_distinct,
           {_HLL_EST_SQL.replace('n_zero', f'({_HLL_M} - n_hit)').replace('sum_term', f'(hit_term + ({_HLL_M} - n_hit) * 1099511627776)')}
             AS estimated_distinct
    FROM summed CROSS JOIN exact
    """,
    doc="HyperLogLog (p=8) as published: md5 2-hex-char register "
        "index, first-1-bit rank of the 32-bit suffix via TRIM-based "
        "leading-zero counting (backslash-free, both parsers), "
        "register maxima from one partial-agg groupBy, harmonic mean "
        "in scaled-integer space (Σ 2^(40-M_j) is an exact BIGINT — "
        "order-free reduction), empty registers folded in closed form. "
        "At 100 TB only 256 (register, max) pairs cross the wire per "
        "partition — the mergeable-sketch property "
        "approx_count_distinct uses, here reproducible cross-engine.",
)
def sketch_hyperloglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    k = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.col("event_id").cast("string"),
    )
    keyed = ev.select(
        F.md5(F.concat(F.lit("hll:"), k)).alias("h"), k.alias("k")
    )
    rho = keyed.select(
        F.substring("h", 1, 2).alias("reg"),
        F.substring("h", 3, 8).alias("w"),
    ).select("reg", F.expr(_HLL_RHO_SQL).alias("rho"))
    regs = rho.groupBy("reg").agg(F.max("rho").cast("long").alias("mj"))
    summed = regs.agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(F.expr(_HLL_TERM_SQL)).cast("long").alias("hit_term"),
    )
    exact = keyed.agg(
        F.countDistinct("k").cast("long").alias("exact_distinct")
    )
    est_sql = _HLL_EST_SQL.replace(
        "n_zero", f"({_HLL_M} - n_hit)"
    ).replace("sum_term", f"(hit_term + ({_HLL_M} - n_hit) * 1099511627776)")
    return (
        summed.crossJoin(F.broadcast(exact))
        .selectExpr(
            "n_hit AS n_regs_hit",
            f"CAST({_HLL_M} - n_hit AS BIGINT) AS n_zero",
            f"CAST(hit_term + ({_HLL_M} - n_hit) * 1099511627776 AS BIGINT)"
            " AS sum_term",
            "exact_distinct",
            f"{est_sql} AS estimated_distinct",
        )
    )


# ------------------------------------------- degree distribution
@register(
    "graph_degree_histogram",
    """
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), deg AS (
      SELECT concat('c', CAST(c AS VARCHAR)) AS node,
             CAST(count(*) AS BIGINT) AS degree
      FROM pairs GROUP BY c
      UNION ALL
      SELECT concat('s', CAST(sp AS VARCHAR)), CAST(count(*) AS BIGINT)
      FROM pairs GROUP BY sp
    )
    SELECT substr(node, 1, 1) AS side, degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg
    GROUP BY side, degree
    ORDER BY side, degree
    """,
    doc="Degree distribution of the customer-supplier bipartite graph "
        "per side: two partial-agg passes (degree per node, then the "
        "histogram) — the first diagnostic run on any production "
        "graph (skew detection for the Pregel entries' join "
        "planning; a heavy-tailed side is what the salted-join and "
        "spread() machinery exists for). Histogram cardinality is "
        "bounded by the max degree, never node count.",
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    # union-free per-side degree (r13): the 2-arm unionAll evaluated
    # the unpersisted orders⋈lineitem+distinct pair plan once PER ARM.
    # One row-doubling explode generator tags each pair with its two
    # (side, key) endpoints, and a single groupBy(side, key) computes
    # both sides' degrees in one pass — every pair contributes exactly
    # one row per endpoint, identical to the per-side aggs (key spaces
    # are disambiguated by `side`, so the oracle's 'c'/'s' string
    # prefix never needs materializing engine-side).
    deg = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("c").alias("side"),
                        F.col("o_custkey").alias("key"),
                    ),
                    F.struct(
                        F.lit("s").alias("side"),
                        F.col("l_suppkey").alias("key"),
                    ),
                )
            ).alias("__n")
        )
        .groupBy("__n.side", "__n.key")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    return (
        deg.groupBy("side", "degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .orderBy("side", "degree")
    )


# ------------------------------------------- k-core peeling
# Iterative k-core: drop nodes whose degree (within the surviving
# subgraph) falls below k, repeat. Fixed 4 unrolled peeling rounds —
# the repo's unrolled-iteration invariant makes both engines compute
# the identical (possibly pre-fixpoint) survivor set, and the dense
# synthetic bipartite graph reaches its fixpoint in 2 rounds. Each
# round re-counts degrees against the CURRENT survivor set, so the
# survivor frame is referenced twice per round (src + dst
# membership) and must be persisted — the BFS lesson.
_KCORE_K = 5
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    rounds = []
    prev = "s0"
    for i in range(1, _KCORE_ROUNDS + 1):
        rounds.append(
            f"""s{i} AS (
      SELECT e.src AS node
      FROM e
      JOIN {prev} a ON a.node = e.src
      JOIN {prev} b ON b.node = e.dst
      GROUP BY e.src
      HAVING count(*) >= {_KCORE_K}
    )"""
        )
        prev = f"s{i}"
    chain = ",\n    ".join(rounds)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), e AS (
      SELECT concat('c', CAST(c AS VARCHAR)) AS src,
             concat('s', CAST(sp AS VARCHAR)) AS dst FROM pairs
      UNION ALL
      SELECT concat('s', CAST(sp AS VARCHAR)), concat('c', CAST(c AS VARCHAR))
      FROM pairs
    ), s0 AS (
      SELECT DISTINCT src AS node FROM e
    ),
    {chain}
    SELECT e.src AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM e
    JOIN {prev} a ON a.node = e.src
    JOIN {prev} b ON b.node = e.dst
    GROUP BY e.src
    ORDER BY core_degree DESC, node ASC
    LIMIT 50
    """


@register(
    "graph_kcore",
    _kcore_oracle,
    doc=f"k-core decomposition (k={_KCORE_K}, {_KCORE_ROUNDS} unrolled "
        "peeling rounds — past the dense fixture's fixpoint): each "
        "round keeps nodes with >= k surviving neighbors, re-counted "
        "against the current survivor set via two membership "
        "semi-joins. Survivor frames are node-sized and persisted "
        "per round (double-referenced — the BFS recompute lesson); "
        "the edge frame is the only fact-sized input and shuffles "
        "once per round on the count key. Top-50 TakeOrdered output.",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # integer node ids internally (cust -> 2k, supp -> 2k+1): every
    # peel round runs two semi joins + one degree agg, all shuffling
    # node keys — BIGINTs instead of 'c123' strings per the r7 rule
    # (same rewrite as pagerank/BFS/SSSP/PPR). The oracle's labels are
    # re-attached BEFORE the final sort: the top-50 tiebreaker orders
    # by the STRING label, so the sort must see the same strings.
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    e = persist_tracked(
        _sym_edges(pairs).repartition(_loop_parts(pairs), "src")
    )
    surv = persist_tracked(
        e.select("src").distinct().select(F.col("src").alias("node"))
    )
    for _ in range(_KCORE_ROUNDS):
        a = surv.select(F.col("node").alias("src"))
        b = surv.select(F.col("node").alias("dst"))
        surv = persist_tracked(
            e.join(a, "src", "left_semi")
            .join(b, "dst", "left_semi")
            .groupBy("src")
            .agg(F.count("*").alias("__d"))
            .filter(F.col("__d") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        )
    a = surv.select(F.col("node").alias("src"))
    b = surv.select(F.col("node").alias("dst"))
    return (
        e.join(a, "src", "left_semi")
        .join(b, "dst", "left_semi")
        .groupBy("src")
        .agg(F.count("*").cast("long").alias("core_degree"))
        .select(_relabel_node("src").alias("node"), "core_degree")
        .orderBy(F.col("core_degree").desc(), F.col("node").asc())
        .limit(50)
    )


# --------------------------------------------- weighted SSSP
# Single-source-set shortest WEIGHTED paths (Bellman-Ford supersteps)
# on the same symmetrized purchase graph as graph_bfs_hops, with a
# deterministic integer edge weight derived from the edge's md5 (first
# hex char banded to 1..5 — same text both engines, no hex→int parse).
# Each superstep relaxes every edge once: dist⋈edge equi-join,
# partial-agg min(dist + w) by destination, NULL-aware merge — exact
# BIGINT path lengths, so the oracle unrolls the supersteps as CTEs.
_SSSP_ITERS = 4
_SSSP_W_SQL = (
    "CAST(CASE WHEN substr(md5(src || '|' || dst), 1, 1) "
    "IN ('0', '1', '2') THEN 1 "
    "WHEN substr(md5(src || '|' || dst), 1, 1) IN ('3', '4', '5') THEN 2 "
    "WHEN substr(md5(src || '|' || dst), 1, 1) IN ('6', '7', '8') THEN 3 "
    "WHEN substr(md5(src || '|' || dst), 1, 1) IN ('9', 'a', 'b') THEN 4 "
    "ELSE 5 END AS BIGINT)"
)
_SSSP_MIN_SQL = (
    "CASE WHEN d IS NULL THEN nd WHEN nd IS NULL THEN d "
    "WHEN nd < d THEN nd ELSE d END"
)


def _sssp_oracle() -> str:
    steps = []
    prev = "d0"
    for i in range(1, _SSSP_ITERS + 1):
        steps.append(
            f"""d{i} AS (
      SELECT n.node,
             CASE WHEN {prev}.dist IS NULL THEN u.nd
                  WHEN u.nd IS NULL THEN {prev}.dist
                  WHEN u.nd < {prev}.dist THEN u.nd
                  ELSE {prev}.dist END AS dist
      FROM n JOIN {prev} ON {prev}.node = n.node
      LEFT JOIN (
        SELECT e.dst AS node, CAST(min(p.dist + e.w) AS BIGINT) AS nd
        FROM e JOIN {prev} p ON p.node = e.src
        WHERE p.dist IS NOT NULL
        GROUP BY e.dst
      ) u ON u.node = n.node
    )"""
        )
        prev = f"d{i}"
    chain = ", ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), e0 AS (
      SELECT concat('c', CAST(c AS VARCHAR)) AS src,
             concat('s', CAST(sp AS VARCHAR)) AS dst FROM pairs
      UNION ALL
      SELECT concat('s', CAST(sp AS VARCHAR)) AS src,
             concat('c', CAST(c AS VARCHAR)) AS dst FROM pairs
    ), e AS (
      SELECT src, dst, {_SSSP_W_SQL} AS w FROM e0
    ), n AS (
      SELECT DISTINCT src AS node FROM e
    ), seeds AS (
      SELECT DISTINCT concat('s', CAST(s_suppkey AS VARCHAR)) AS node
      FROM supplier WHERE s_nationkey = 0
    ), d0 AS (
      SELECT n.node,
             CASE WHEN s.node IS NOT NULL THEN CAST(0 AS BIGINT) END
               AS dist
      FROM n LEFT JOIN seeds s ON s.node = n.node
    ), {chain}
    SELECT node, CAST(coalesce(dist, -1) AS BIGINT) AS dist FROM {prev}
    """


@register(
    "graph_sssp_weighted",
    _sssp_oracle(),
    doc=f"Weighted single-source-set shortest paths by "
        f"{_SSSP_ITERS} Bellman-Ford supersteps on the symmetrized "
        "customer-supplier graph, seeded by nation-0 suppliers; edge "
        "weights 1..5 banded from the edge md5's first hex char "
        "(identical text both engines). Per superstep: one "
        "frontier⋈edge equi-join + partial-agg min(dist+w) by "
        "destination + NULL-aware merge — the Pregel min-plus shape "
        "with the weighted relaxation, edges persisted once (no "
        "distinct: weights are pure label functions so duplicate "
        "edges can't change a min; hash-partitioned on dst so the "
        "broadcast frontier probe feeds the min-agg exchange-free), "
        "dist persisted per superstep (read twice: merge + next "
        "frontier). "
        "Unreached nodes report -1; oracle unrolls the supersteps "
        "as CTEs.",
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # integer node ids internally (cust -> 2k, supp -> 2k+1), string
    # labels re-attached in one final projection (same rewrite as
    # graph_pagerank/graph_bfs_hops: BIGINT keys, not 'c123' strings).
    # NO distinct: the edge weight is a pure function of the (src,
    # dst) labels, so duplicate order-line pairs carry IDENTICAL
    # weights and cannot change a min(dist + w) relaxation (the
    # oracle keeps its DISTINCT — values identical). Same shuffle
    # elimination as graph_bfs_hops (4.1 -> 2.6 s there). NOT
    # persisted: without the distinct, pairs is a pipelined
    # scan+broadcast-join — recomputing it for the union's second arm
    # beats caching the wide labeled frame (A/B: 4.1 vs 6.2 s warm).
    pairs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("c"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
            "cl"
        ),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
            "sl"
        ),
    )
    # the edge WEIGHT hashes the oracle's string labels (md5 of
    # 'c123|s45'), so it is computed from the label columns while
    # the join keys ride as BIGINTs — weights unchanged, shuffles
    # integer-keyed.
    # union-free symmetrization (r12): the orders⋈lineitem pair plan
    # evaluates once into the edge cache (explode generator) instead
    # of once per union arm; weights are computed after the explode
    # from the same label columns — identical rows.
    edges = persist_tracked(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("c").alias("srci"),
                        F.col("s").alias("dsti"),
                        F.col("cl").alias("src"),
                        F.col("sl").alias("dst"),
                    ),
                    F.struct(
                        F.col("s").alias("srci"),
                        F.col("c").alias("dsti"),
                        F.col("sl").alias("src"),
                        F.col("cl").alias("dst"),
                    ),
                )
            ).alias("__e")
        )
        .select("__e.srci", "__e.dsti", "__e.src", "__e.dst")
        .withColumn("w", F.expr(_SSSP_W_SQL))
        .select(
            F.col("srci").alias("src"), F.col("dsti").alias("dst"), "w"
        )
        # hash-partitioned on the DESTINATION key (r13, VERDICT r12
        # item 1): the broadcast frontier probe preserves the cached
        # edge partitioning, so every superstep's candidate
        # groupBy(dst) — the only fact-sized shuffle in the loop —
        # needs NO exchange at all. One edge-sized exchange paid once
        # at cache build replaces one candidate-stream exchange per
        # superstep. (The union-into-one-agg alternative was also
        # A/B'd: Union discards partitioning, re-adding the exchange —
        # 3.86 vs 3.10 s min; this shape won 0.876 paired vs r12.)
        .repartition(_loop_parts(pairs), "dst")
    )
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
        .distinct()
        .withColumn("is_seed", F.lit(1))
    )
    # dist carries a per-node `chg` flag: did the last relaxation
    # round improve this node? Bellman-Ford's delta optimization —
    # only nodes whose distance CHANGED can improve a neighbor (an
    # unchanged node already offered its best dist in the round that
    # set it), so each frontier is the changed set, not every reached
    # node. Exact, and on this graph the changed set collapses after
    # round 2 while the reached set stays ~everything.
    # seeds is supplier-derived (SF-scaling): init join AQE-decided,
    # no forced hint (r7 #1) — frontier broadcasts below are the
    # bounded deltas, not this
    dist = persist_tracked(
        nodes.join(seeds, "node", "left").select(
            "node",
            F.when(F.col("is_seed").isNotNull(), F.lit(0))
            .cast("long")
            .alias("dist"),
            F.when(F.col("is_seed").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("chg"),
        )
    )
    for _ in range(_SSSP_ITERS):
        frontier = dist.filter(F.col("chg") == 1).select(
            F.col("node").alias("src"), F.col("dist")
        )
        # frontier is node-sized vs the edge list: broadcast probes
        # the persisted edges in place. With the edge cache
        # hash-partitioned on dst, the candidate stream arrives at
        # the min-agg ALREADY partitioned by its group key — zero
        # exchanges on the fact-sized path per superstep; the only
        # remaining per-round shuffle is the node-sized join-back
        # side (trivial bytes).
        upd = (
            edges.join(F.broadcast(frontier), "src")
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("w")).cast("long").alias("nd"))
        )
        dist = persist_tracked(
            dist.join(upd, dist.node == upd.dst, "left")
            .select("node", F.col("dist").alias("d"), "nd")
            .select(
                "node",
                F.expr(_SSSP_MIN_SQL).cast("long").alias("dist"),
                F.expr(
                    "CASE WHEN nd IS NOT NULL AND (d IS NULL OR nd < d) "
                    "THEN 1 ELSE 0 END"
                ).alias("chg"),
            )
        )
    return dist.select(
        _relabel_node("node"),
        F.coalesce("dist", F.lit(-1)).cast("long").alias("dist"),
    )


# --------------------------------------------- link prediction
@register(
    "graph_link_prediction",
    """
    WITH adj AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), deg AS (
      SELECT sp, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY sp
    ), common AS (
      SELECT a.sp AS sa, b.sp AS sb, CAST(count(*) AS BIGINT) AS cn
      FROM adj a JOIN adj b ON b.c = a.c AND b.sp > a.sp
      GROUP BY a.sp, b.sp
    ), scored AS (
      SELECT sa, sb, cn, da.d AS deg_a, db.d AS deg_b,
             CAST(round(1000000.0 * cn / (da.d + db.d - cn)) AS BIGINT)
               AS jaccard_e6
      FROM common JOIN deg da ON da.sp = sa
                  JOIN deg db ON db.sp = sb
    )
    SELECT sa, sb, cn, deg_a, deg_b, jaccard_e6
    FROM scored
    ORDER BY jaccard_e6 DESC, sa ASC, sb ASC
    LIMIT 20
    """,
    doc="Common-neighbor link prediction on the bipartite purchase "
        "graph: supplier pairs scored by customer-set Jaccard "
        "|N(a)∩N(b)| / |N(a)∪N(b)|. Candidates come from the "
        "inverted index BY CUSTOMER (one equi-join on the shared "
        "neighbor, cost Σ customer-degree² — the same all-pairs "
        "formulation as the n-gram dedup family, never a supplier "
        "cross join), each unordered pair emitted once via sb > sa. "
        "Counts and degrees exact BIGINTs, the score one e6 "
        "rational, top-20 with full tiebreaks.",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    adj = persist_tracked(
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("sp"))
        .distinct()
    )
    deg = adj.groupBy("sp").agg(F.count("*").cast("long").alias("d"))
    b = adj.select(F.col("c").alias("bc"), F.col("sp").alias("sb"))
    common = (
        adj.join(b, (F.col("bc") == F.col("c")) & (F.col("sb") > F.col("sp")))
        .groupBy(F.col("sp").alias("sa"), "sb")
        .agg(F.count("*").cast("long").alias("cn"))
    )
    da = deg.select(F.col("sp").alias("sa"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("sp").alias("sb"), F.col("d").alias("deg_b"))
    scored = (
        common.join(F.broadcast(da), "sa")
        .join(F.broadcast(db), "sb")
        .select(
            "sa",
            "sb",
            "cn",
            "deg_a",
            "deg_b",
            F.round(
                1000000.0
                * F.col("cn")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn"))
            )
            .cast("long")
            .alias("jaccard_e6"),
        )
    )
    return (
        scored.orderBy(
            F.col("jaccard_e6").desc(), F.col("sa").asc(), F.col("sb").asc()
        )
        .limit(20)
    )


# ------------------------------------------- native recursive CTE
# Spark 4.1 executes WITH RECURSIVE natively (UnionLoop / UnionLoopRef
# physical operators, SPARK-24497); DuckDB has supported it since 0.3.
# That makes the STRONGEST parity form possible: one shared SQL text
# for the whole query, recursion included — the engines differ only in
# the table binding (a temp view here, the pre-registered parquet view
# in the oracle). The synthetic hierarchy is the binary-heap parent
# map parent(k) = floor(k/2): every customer hangs off one tree rooted
# at custkey 1, depth = floor(log2(k)).  Each edge carries an integer
# multiplicity (k % 3 + 1), and the recursion threads the path
# PRODUCT root→node — the bill-of-materials costing shape (total
# quantity of a leaf part per root assembly) that plain joins cannot
# express for unbounded depth. All carried state is BIGINT, so every
# iterate is exact in both engines; the final rollup re-casts the
# DuckDB HUGEINT sums per the round-4 type rule.
#
# Scale: each recursive step is one equi-join of the full table
# against the previous frontier — a hash join per level, parallel
# across partitions; depth is log2(n) so a 100 TB dim hierarchy is
# ~40 bounded supersteps driven by the engine's own loop operator
# (no driver round-trips, unlike the hand-rolled Pregel loops which
# exist for ALGORITHMS with aggregation inside the recursion, which
# SQL recursion cannot express portably).
_REC_HIER_SQL = """
WITH RECURSIVE h(custkey, depth, mult, bal_cents) AS (
  SELECT c_custkey, 0, CAST(1 AS BIGINT),
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
  FROM {customer} WHERE c_custkey = 1
  UNION ALL
  SELECT c.c_custkey, h.depth + 1,
         h.mult * (CAST(c.c_custkey % 3 AS BIGINT) + 1),
         CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)
  FROM {customer} c
  JOIN h ON CAST(floor(c.c_custkey / 2.0) AS BIGINT) = h.custkey
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(custkey) AS BIGINT) AS min_key,
       CAST(max(custkey) AS BIGINT) AS max_key,
       CAST(sum(mult) AS BIGINT) AS sum_mult,
       CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
FROM h GROUP BY depth ORDER BY depth
"""


@register(
    "rec_cte_hierarchy",
    _REC_HIER_SQL.format(customer="customer"),
    doc="Native WITH RECURSIVE hierarchy traversal (Spark 4.1 "
        "UnionLoop, SPARK-24497): the binary-heap parent map over "
        "customer keys walked root->leaf, threading an integer path "
        "PRODUCT (per-edge multiplicity k%3+1) — the bill-of-"
        "materials costing shape joins of fixed depth cannot "
        "express. ONE shared SQL text runs verbatim in both engines "
        "(only the table binding differs), so the recursion itself "
        "is oracle-checked, not a hand-unrolled twin. Each level is "
        "one hash equi-join of the dim against the previous "
        "frontier; depth is log2(n), and the loop runs inside the "
        "engine with no driver round-trips.",
)
def rec_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).createOrReplaceTempView("rec_cte_customer")
    return spark.sql(_REC_HIER_SQL.format(customer="rec_cte_customer"))


# ------------------------------------------- label propagation (LPA)
_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    """Unrolled LPA oracle: one (count, argmax) CTE pair per round —
    the CLAUDE.md unrolled-iteration rule (aggregation inside the
    recursive term is not portable recursive SQL)."""
    parts = [
        """
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), e AS (
      SELECT c AS src, s AS dst FROM e0
      UNION ALL
      SELECT s AS src, c AS dst FROM e0
    ), l0 AS (
      SELECT DISTINCT dst AS node, dst AS label FROM e
    )"""
    ]
    for k in range(1, _LPA_ROUNDS + 1):
        parts.append(
            f""", s{k} AS (
      SELECT e.dst AS node, l.label, count(*) AS c
      FROM e JOIN l{k - 1} l ON e.src = l.node
      GROUP BY 1, 2
    ), l{k} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM s{k}
      ) WHERE rn = 1
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(label AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM l{_LPA_ROUNDS}
    GROUP BY label ORDER BY n_members DESC, community LIMIT 15"""
    )
    return "".join(parts)


@register(
    "graph_label_propagation",
    _lpa_oracle(),
    doc="Label-propagation community detection (Raghavan 2007, the "
        "GraphFrames labelPropagation twin) over the symmetrized "
        "customer-supplier purchase graph: every node starts as its "
        "own label; each synchronous round re-labels a node with the "
        "most frequent neighbor label (tie -> smallest label — the "
        "deterministic tiebreak the published algorithm leaves "
        "random). Labels are integers end-to-end, so rounds are "
        "exact in both engines; the oracle unrolls the fixed round "
        "count. Per round: ONE equi-join of the persisted edge list "
        "onto the label frame + one partial-agg count + one "
        "max(struct) argmax (count desc, label asc — no window "
        "sort) — the same bounded-superstep shape as PageRank/SSSP; "
        "bipartite oscillation is why the round count is FIXED "
        "rather than run-to-convergence. "
        "Output: top-15 communities by size.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # pairs NOT persisted: edges is itself persisted right below, so
    # the distinct only recomputes twice at edge materialization —
    # cheaper than the cache round-trip (A/B: 4.9 vs 5.2 s warm). The
    # pairs-persist rewrite pays off only where MANY derivations
    # re-read the unpersisted union (graph_pagerank's deg/nodes/e).
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    _n_parts = _loop_parts(pairs)
    edges = persist_tracked(
        _sym_edges(pairs).repartition(_n_parts, "src")
    )
    labels = edges.select(F.col("dst").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        # ONE exchange per round (r12): the raw (node, label)
        # contribution stream repartitions on the destination node
        # alone; hash(node) satisfies BOTH downstream groupings
        # (groupBy(node, label) count and the argmax groupBy(node) —
        # partitioning on a subset of the group keys co-locates every
        # group), so neither agg adds an exchange, and the round's
        # output keeps the hash(node)/N layout the next round's edge
        # join consumes exchange-free. The previous two-agg form paid
        # a second exchange + stage per round, and its first
        # exchange's map-side partial agg bought nothing in early
        # rounds (labels start all-distinct, so (dst, label) pairs
        # have multiplicity ~1 within a map partition).
        # shuffle_hash hint on the node-sized label side (r13, guide
        # §3.1): the co-partitioned join planned as a SortMergeJoin,
        # which re-SORTED the cached 1.2M-row edge side every round;
        # a ShuffledHashJoin builds a per-partition hash of the labels
        # instead (build side = nodes/N rows at any scale — bounded
        # when N scales with the cluster) and touches the edge side
        # unsorted. Paired A/B 0.772 (mins 3.71 → 2.84 s). NOT a
        # broadcast: both sides keep their partitioning, no driver
        # collect. The same hint measured 1.081 on graph_pagerank
        # (rank side unpersisted there) — applied only where it wins.
        contrib = (
            edges.join(
                labels.hint("shuffle_hash"), edges.src == labels.node
            )
            .select(F.col("dst").alias("node"), "label")
            .repartition(_n_parts, "node")
        )
        counts = contrib.groupBy("node", "label").agg(
            F.count("*").alias("c")
        )
        # argmax by (count desc, label asc) as max(struct(c, -label))
        # — a map-side-combinable partial agg instead of a window
        # sort + row_number filter (prefer-max-struct-over-window
        # invariant; 5.8 -> 5.1 s at sf0.1, values identical since
        # (node, label) rows are unique after the count agg)
        labels = persist_tracked(
            counts.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select("node", (-F.col("m.nl")).alias("label"))
        )
    return (
        labels.groupBy(F.col("label").cast("long").alias("community"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min("node").cast("long").alias("min_node"),
            F.max("node").cast("long").alias("max_node"),
        )
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
        .limit(15)
    )


# ------------------------------------------- compaction planning
_COMPACT_TARGET = 4000  # chars per output file (stand-in for ~256 MB)


@register(
    "layout_compaction_plan",
    f"""
    WITH files AS (
      SELECT lang, doc_id, length(text) AS sz FROM documents
    ), cum AS (
      SELECT lang, doc_id, sz,
             CAST(coalesce(sum(sz) OVER (PARTITION BY lang
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM files
    )
    SELECT lang,
           CAST(floor(cum_before / {_COMPACT_TARGET}.0) AS BIGINT)
             AS target_file,
           CAST(count(*) AS BIGINT) AS n_inputs,
           CAST(sum(sz) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM cum GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Small-file compaction plan — the OPTIMIZE/maintenance job "
        "every 100 TB lake runs: inputs (here one per document, size "
        "= chars, the stand-in for parquet footer stats) are packed "
        "in key order into ~{0}-char target files by a running-sum "
        "assignment — target = floor(cumulative-size-before / "
        "target-size), the deterministic sequential-fill bin packing "
        "that preserves sort order (so compaction never breaks "
        "zone-map clustering, unlike FFD). The running sum is "
        "per-partition (lang) — the realistic layout, since "
        "compaction planning is per-partition and never needs a "
        "global window. Output: the copy manifest (inputs, bytes, "
        "key range per target file) a compactor would execute."
        .format(_COMPACT_TARGET),
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    files = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.length("text").alias("sz")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = files.select(
        "lang",
        "doc_id",
        "sz",
        F.coalesce(F.sum("sz").over(w), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    )
    return (
        cum.groupBy(
            "lang",
            F.floor(F.col("cum_before") / float(_COMPACT_TARGET))
            .cast("long")
            .alias("target_file"),
        )
        .agg(
            F.count("*").cast("long").alias("n_inputs"),
            F.sum("sz").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .orderBy("lang", "target_file")
    )


# ------------------------------------------- clustering-depth audit
@register(
    "layout_clustering_depth",
    """
    WITH keyed AS (
      SELECT CAST((instr('0123456789abcdef',
               substr(md5(concat('cd:', CAST(l_orderkey AS STRING))),
                      1, 1)) - 1) AS INTEGER) AS hash_file,
             CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_cents
      FROM lineitem
    ), manifests AS (
      SELECT 'hash' AS layout, hash_file AS file_id,
             min(price_cents) AS lo, max(price_cents) AS hi
      FROM keyed GROUP BY 1, 2
      UNION ALL
      SELECT 'clustered' AS layout,
             CAST(price_cents // 700000 AS INTEGER) AS file_id,
             min(price_cents) AS lo, max(price_cents) AS hi
      FROM keyed GROUP BY 1, 2
    ), per_file AS (
      SELECT a.layout, a.file_id,
             CAST(count(b.file_id) AS BIGINT) AS n_overlap
      FROM manifests a LEFT JOIN manifests b
        ON a.layout = b.layout AND a.file_id <> b.file_id
       AND a.lo <= b.hi AND b.lo <= a.hi
      GROUP BY 1, 2
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST((2 * sum(n_overlap) * 1000000 + count(*))
                // (2 * count(*)) AS BIGINT) AS avg_overlap_micro,
           CAST(max(n_overlap) AS BIGINT) AS max_overlap
    FROM per_file
    GROUP BY layout ORDER BY layout
    """,
    doc="Clustering-depth audit — the lakehouse metric for how well a "
        "table's file layout serves range predicates on a column "
        "(Delta OPTIMIZE / Snowflake clustering_information shape): "
        "per file, how many OTHER files' [min,max] price zones "
        "overlap it. A hash write layout (md5 nibble of the write "
        "key, 16 'files') interleaves the full price range into "
        "every file — every zone overlaps every other and zone maps "
        "skip nothing; a range-clustered layout (fixed-width "
        "price_cents buckets) has near-disjoint zones and skips "
        "almost everything. Both manifests come from ONE fact pass "
        "(partial-agg min/max per file); the overlap self-join runs "
        "on the manifest, which is file-count-sized metadata — at "
        "100 TB that is ~10⁵ rows, not a fact-table join. Outputs "
        "per layout: file count, mean overlap degree (exact integer "
        "micro), and worst file. Companion to layout_zone_maps (the "
        "stats) and layout_zorder_key (the fix).",
)
def layout_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    keyed = li.select(
        F.expr(
            "CAST((instr('0123456789abcdef',"
            " substr(md5(concat('cd:', CAST(l_orderkey AS STRING))),"
            " 1, 1)) - 1) AS INT)"
        ).alias("hash_file"),
        F.round(F.col("l_extendedprice") * 100.0)
        .cast("long")
        .alias("price_cents"),
    )
    hash_m = keyed.groupBy(
        F.lit("hash").alias("layout"),
        F.col("hash_file").alias("file_id"),
    ).agg(
        F.min("price_cents").alias("lo"), F.max("price_cents").alias("hi")
    )
    clus_m = keyed.groupBy(
        F.lit("clustered").alias("layout"),
        F.expr("CAST(price_cents div 700000 AS INT)").alias("file_id"),
    ).agg(
        F.min("price_cents").alias("lo"), F.max("price_cents").alias("hi")
    )
    manifests = hash_m.unionByName(clus_m)
    a = manifests.select(
        "layout",
        "file_id",
        F.col("lo").alias("a_lo"),
        F.col("hi").alias("a_hi"),
    )
    b = manifests.select(
        F.col("layout").alias("b_layout"),
        F.col("file_id").alias("b_file"),
        F.col("lo").alias("b_lo"),
        F.col("hi").alias("b_hi"),
    )
    per_file = (
        a.join(
            F.broadcast(b),
            (F.col("layout") == F.col("b_layout"))
            & (F.col("file_id") != F.col("b_file"))
            & (F.col("a_lo") <= F.col("b_hi"))
            & (F.col("b_lo") <= F.col("a_hi")),
            "left",
        )
        .groupBy("layout", "file_id")
        .agg(F.count("b_file").cast("long").alias("n_overlap"))
    )
    return (
        per_file.groupBy("layout")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.expr(
                "CAST((2 * sum(n_overlap) * 1000000 + count(*))"
                " div (2 * count(*)) AS BIGINT)"
            ).alias("avg_overlap_micro"),
            F.max("n_overlap").cast("long").alias("max_overlap"),
        )
        .orderBy("layout")
    )

#!/usr/bin/env python
"""Paired in-session A/B of the r13 single-exchange-round rewrites.

Arm A = the r12 (HEAD~) plan shapes, inlined below verbatim from git
history; arm B = the current module code. Alternating back-to-back
noop-sink runs in ONE JVM (order flipped each pair) cancel warm-up and
weather drift; reports per-pair seconds and the median paired ratio
B/A per query. Usage: python ab_r13_loops.py [n_pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ibf_typhoon_data_pipeline_spark import plans  # noqa: E402
from ibf_typhoon_data_pipeline_spark.operators.cache import (  # noqa: E402
    persist_tracked,
    release_caches,
)
from ibf_typhoon_data_pipeline_spark.plans.graphs import (  # noqa: E402
    _BFS_ITERS,
    _SSSP_ITERS,
    _SSSP_MIN_SQL,
    _SSSP_W_SQL,
    _relabel_node,
    _sym_edges,
)
from ibf_typhoon_data_pipeline_spark.session import get_spark  # noqa: E402
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table  # noqa: E402

_OLD_BFS_MIN_SQL = (
    "CASE WHEN d IS NULL THEN nd WHEN nd IS NULL THEN d "
    "WHEN nd < d THEN nd ELSE d END"
)


def old_bfs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("c"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    )
    edges = persist_tracked(_sym_edges(pairs, "c", "s"))
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 3)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
        .distinct()
        .withColumn("is_seed", F.lit(1))
    )
    dist = nodes.join(seeds, "node", "left").select(
        "node",
        F.when(F.col("is_seed").isNotNull(), F.lit(0)).cast("long").alias("hop"),
    )
    dist = persist_tracked(dist)
    for it in range(_BFS_ITERS):
        frontier = dist.filter(F.col("hop") == it).select(
            F.col("node").alias("src"), F.col("hop")
        )
        upd = (
            edges.join(F.broadcast(frontier), "src")
            .groupBy("dst")
            .agg((F.min("hop") + 1).cast("long").alias("nd"))
        )
        dist = persist_tracked(
            dist.join(upd, dist.node == upd.dst, "left")
            .select("node", F.col("hop").alias("d"), "nd")
            .select("node", F.expr(_OLD_BFS_MIN_SQL).cast("long").alias("hop"))
        )
    return dist.select(
        _relabel_node("node"),
        F.coalesce("hop", F.lit(-1)).cast("long").alias("hop"),
    )


def old_sssp(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("c"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("cl"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("sl"),
    )
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
        .select(F.col("srci").alias("src"), F.col("dsti").alias("dst"), "w")
    )
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
        .distinct()
        .withColumn("is_seed", F.lit(1))
    )
    dist = persist_tracked(
        nodes.join(seeds, "node", "left").select(
            "node",
            F.when(F.col("is_seed").isNotNull(), F.lit(0)).cast("long").alias("dist"),
            F.when(F.col("is_seed").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("chg"),
        )
    )
    for _ in range(_SSSP_ITERS):
        frontier = dist.filter(F.col("chg") == 1).select(
            F.col("node").alias("src"), F.col("dist")
        )
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


def old_cf_topk(spark, sf_dir):
    from pyspark.sql import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = persist_tracked(li)
    item = li.groupBy("l_partkey").agg(F.count("*").cast("long").alias("n_item"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("id_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("id_b"))
    pair = (
        a.join(b, "ok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= 2)
    )
    mirrored = pair.select(
        F.col("id_a").alias("item_id"),
        F.col("id_b").alias("neighbor_id"),
        "support",
    ).unionByName(
        pair.select(
            F.col("id_b").alias("item_id"),
            F.col("id_a").alias("neighbor_id"),
            "support",
        )
    )
    ia = item.select(F.col("l_partkey").alias("item_id"), F.col("n_item").alias("n_a"))
    ib = item.select(
        F.col("l_partkey").alias("neighbor_id"), F.col("n_item").alias("n_b")
    )
    scored = (
        mirrored.join(ia, "item_id")
        .join(ib, "neighbor_id")
        .select(
            "item_id",
            "neighbor_id",
            "support",
            F.expr("(support * support * 1000000) div (n_a * n_b)").alias(
                "cos2_micro"
            ),
        )
    )
    w = Window.partitionBy("item_id").orderBy(
        F.col("cos2_micro").desc(),
        F.col("support").desc(),
        F.col("neighbor_id").asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("item_id", "neighbor_id", "support", "cos2_micro", "rank")
    )


def dstpart_sssp(spark, sf_dir):
    """Variant C: join-back shape + edge cache hash-partitioned on dst
    so the per-superstep candidate groupBy(dst) needs NO exchange (the
    broadcast frontier probe preserves the cached edge partitioning)."""
    from ibf_typhoon_data_pipeline_spark.plans.graphs import _loop_parts

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("c"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("cl"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("sl"),
    )
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
        .select(F.col("srci").alias("src"), F.col("dsti").alias("dst"), "w")
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
    dist = persist_tracked(
        nodes.join(seeds, "node", "left").select(
            "node",
            F.when(F.col("is_seed").isNotNull(), F.lit(0)).cast("long").alias("dist"),
            F.when(F.col("is_seed").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("chg"),
        )
    )
    for _ in range(_SSSP_ITERS):
        frontier = dist.filter(F.col("chg") == 1).select(
            F.col("node").alias("src"), F.col("dist")
        )
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


def dstpart_bfs(spark, sf_dir):
    from ibf_typhoon_data_pipeline_spark.plans.graphs import _loop_parts

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("c"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    )
    edges = persist_tracked(
        _sym_edges(pairs, "c", "s").repartition(_loop_parts(pairs), "dst")
    )
    nodes = edges.select("src").distinct().select(F.col("src").alias("node"))
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 3)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
        .distinct()
        .withColumn("is_seed", F.lit(1))
    )
    dist = persist_tracked(
        nodes.join(seeds, "node", "left").select(
            "node",
            F.when(F.col("is_seed").isNotNull(), F.lit(0)).cast("long").alias("hop"),
        )
    )
    for it in range(_BFS_ITERS):
        frontier = dist.filter(F.col("hop") == it).select(
            F.col("node").alias("src"), F.col("hop")
        )
        upd = (
            edges.join(F.broadcast(frontier), "src")
            .groupBy("dst")
            .agg((F.min("hop") + 1).cast("long").alias("nd"))
        )
        dist = persist_tracked(
            dist.join(upd, dist.node == upd.dst, "left")
            .select("node", F.col("hop").alias("d"), "nd")
            .select("node", F.expr(_OLD_BFS_MIN_SQL).cast("long").alias("hop"))
        )
    return dist.select(
        _relabel_node("node"),
        F.coalesce("hop", F.lit(-1)).cast("long").alias("hop"),
    )


PAIRS = [
    ("graph_bfs_hops", old_bfs),
    ("graph_sssp_weighted", old_sssp),
    ("orders_item_cf_topk", old_cf_topk),
]

if os.environ.get("AB_R13_VARIANT") == "dstpart":
    PAIRS = [
        ("graph_bfs_hops", dstpart_bfs),
        ("graph_sssp_weighted", dstpart_sssp),
    ]


def main_oldvsdst() -> None:
    """Direct old(r12) vs dstpart pairing: A=old, B=dstpart."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ibf-ab-r13b", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        release_caches()
        return dt

    for name, old_fn, new_fn in [
        ("graph_sssp_weighted", old_sssp, dstpart_sssp),
        ("graph_bfs_hops", old_bfs, dstpart_bfs),
    ]:
        run(old_fn)
        run(new_fn)
        ratios, a_ts, b_ts = [], [], []
        for i in range(n_pairs):
            if i % 2 == 0:
                ta, tb = run(old_fn), run(new_fn)
            else:
                tb, ta = run(new_fn), run(old_fn)
            a_ts.append(round(ta, 3))
            b_ts.append(round(tb, 3))
            ratios.append(tb / ta)
        print(
            f"{name}: A(old)={a_ts} B(dstpart)={b_ts} "
            f"median_ratio_B/A={statistics.median(ratios):.3f} "
            f"min_A={min(a_ts):.3f} min_B={min(b_ts):.3f}"
        )
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ibf-ab-r13", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        release_caches()
        return dt

    for name, old_fn in PAIRS:
        new_fn = plans.QUERIES[name].fn
        # warm both arms once (codegen, scans) before the timed pairs
        run(old_fn)
        run(new_fn)
        ratios, a_ts, b_ts = [], [], []
        for i in range(n_pairs):
            if i % 2 == 0:
                ta, tb = run(old_fn), run(new_fn)
            else:
                tb, ta = run(new_fn), run(old_fn)
            a_ts.append(round(ta, 3))
            b_ts.append(round(tb, 3))
            ratios.append(tb / ta)
        print(
            f"{name}: A(old)={a_ts} B(new)={b_ts} "
            f"median_ratio_B/A={statistics.median(ratios):.3f} "
            f"min_A={min(a_ts):.3f} min_B={min(b_ts):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    if os.environ.get("AB_R13_VARIANT") == "oldvsdst":
        main_oldvsdst()
    else:
        main()

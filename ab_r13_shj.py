#!/usr/bin/env python
"""Paired in-session A/B: per-superstep rank⋈edge join as SortMergeJoin
(current) vs ShuffledHashJoin via rank.hint('shuffle_hash') — the SMJ
re-sorts the cached edge side (1.2M rows) every superstep; SHJ builds a
per-partition hash of the node-sized rank instead (guide §3.1). Both
arms co-partitioned (no exchange either way). A = current module code,
B = hinted variant. Also LPA's labels join."""

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
    _LPA_ROUNDS,
    _PR_INIT_MICRO,
    _PR_ITERS,
    _loop_parts,
    _pr_update_sql,
    _relabel_node,
    _sym_edges,
)
from ibf_typhoon_data_pipeline_spark.session import get_spark  # noqa: E402
from ibf_typhoon_data_pipeline_spark.sources.tables import load_table  # noqa: E402


def _pairs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )


def hinted_pagerank(spark, sf_dir):
    pairs = persist_tracked(_pairs(spark, sf_dir))
    edges = _sym_edges(pairs)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    _n = _loop_parts(edges)
    e = persist_tracked(edges.join(deg, "src").repartition(_n, "src"))
    nodes = persist_tracked(
        edges.select("src").distinct().select(F.col("src").alias("node"))
        .repartition(_n, "node")
    )
    rank = nodes.select(
        "node", F.lit(_PR_INIT_MICRO).cast("long").alias("rank_micro")
    )
    for _ in range(_PR_ITERS):
        sums = (
            e.join(rank.hint("shuffle_hash"), e.src == rank.node)
            .select("dst", F.expr("rank_micro div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        rank = sums.select(
            F.col("dst").alias("node"),
            F.expr(_pr_update_sql("s")).alias("rank_micro"),
        )
    return rank.select(_relabel_node("node"), "rank_micro")


def hinted_lpa(spark, sf_dir):
    pairs = _pairs(spark, sf_dir)
    _n = _loop_parts(pairs)
    edges = persist_tracked(_sym_edges(pairs).repartition(_n, "src"))
    labels = edges.select(F.col("dst").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        contrib = (
            edges.join(labels.hint("shuffle_hash"), edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .repartition(_n, "node")
        )
        counts = contrib.groupBy("node", "label").agg(F.count("*").alias("c"))
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ibf-ab-r13-shj", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        release_caches()
        return dt

    for name, new_fn in [
        ("graph_pagerank", hinted_pagerank),
        ("graph_label_propagation", hinted_lpa),
    ]:
        old_fn = plans.QUERIES[name].fn
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
            f"{name}: A(smj)={a_ts} B(shj-hint)={b_ts} "
            f"median_ratio_B/A={statistics.median(ratios):.3f} "
            f"min_A={min(a_ts):.3f} min_B={min(b_ts):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

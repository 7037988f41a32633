#!/usr/bin/env python
"""Scaling-curve probe: time one representative query per structural
family at sf0.01 and sf0.1 (10x the data) in one session, best of two
noop-sink runs each, and report the growth ratio.

The claim under test is the 100 TB design invariant: NO family grows
super-linearly in the fact size. A ratio well under 10 means fixed
costs (scheduling, fits, broadcasts) still dominate at these scales;
a ratio around 10 is linear; materially above 10 is a red flag that
some pair space or sort is super-linear. Writes SCALING_CURVE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FAMILIES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "tc_windfield_holland",
    "tc_muni_hazard",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_ivf_topk",
    "corpus_sequence_pack",
    "orders_item_cf_topk",
    "events_sessionize",
    "j11_nearest_supplier",
    "graph_pagerank",
    "graph_bfs_hops",  # broadcast-frontier Pregel (r7 edge build)
    "corpus_ngram_novelty",
    "events_rolling_1h",
    # AQE-decided vocab join (de-hinted round 8): the token stream
    # joins its own Heaps-growing frequency table with no broadcast
    # hint — growth must stay linear while AQE picks the strategy
    "text_lm_logprob",
]

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from ibf_typhoon_data_pipeline_spark import plans
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        release_caches,
    )
    from ibf_typhoon_data_pipeline_spark.session import get_spark

    spark = get_spark("ibf-scaling", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + python workers once
    plans.QUERIES["q1_pricing_summary"].fn(spark, SFS[0]).write.format(
        "noop"
    ).mode("overwrite").save()
    out: dict[str, dict] = {}
    for name in FAMILIES:
        qd = plans.QUERIES.get(name)
        if qd is None:
            continue
        times = []
        for sf_dir in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qd.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
                release_caches()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            times.append(round(best, 3))
        out[name] = {
            "sf0.01_s": times[0],
            "sf0.1_s": times[1],
            "ratio_10x": round(times[1] / max(times[0], 1e-9), 2),
        }
    line = json.dumps({"metric": "scaling_curve", "queries": out})
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "SCALING_CURVE.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()

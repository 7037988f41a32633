#!/usr/bin/env python
"""Scaling-curve probe: time one representative query per structural
family at sf0.01 and sf0.1 (10x the data) in one session, best of two
noop-sink runs each, and report the growth ratio.

The claim under test is the 100 TB design invariant: NO family grows
super-linearly in the fact size. A ratio well under 10 means fixed
costs (scheduling, fits, broadcasts) still dominate at these scales;
a ratio around 10 is linear; materially above 10 is a red flag that
some pair space or sort is super-linear. Writes SCALING_CURVE.json.

Round 10 adds the DATA-axis amplification tier (see DATA_TIER below):
the fact-heavy families re-timed at sf0.1 vs an in-engine 10×
amplification ('@x10' sf_dir suffix, sources/amplify.py), so the
largest measured data point is ~6M-row lineitem / 50k docs / 1M
events rather than the on-disk cap.
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

# DATA-axis amplification tier (VERDICT r9 item 3): testdata is capped
# at sf0.1, so the on-disk curve above tops out at a 600k-row
# lineitem. The tier below re-times the most fact-heavy families at
# sf0.1 and at an IN-ENGINE 10× amplification of sf0.1
# (sources/amplify.py: '@x10' suffix — explode-generated distinct
# replicas with shifted keys, per-replica rotated vocab, perturbed
# vectors), mirroring bench_event's event-axis synthesis. Expected
# ~linear: every candidate generator is an equi-join on a bounded key,
# so 10× facts ⇒ ≤ ~10× work + fixed costs. scaleup_10x well under 10
# means fixed costs still dominate; materially ABOVE the superlinear
# threshold flags a pair space or sort growing faster than the data.
DATA_TIER = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ml_naive_bayes",
    "corpus_sequence_pack",
    "text_bm25_topk",
    "text_lm_logprob",
    "graph_pagerank",
    "graph_bfs_hops",
    "o6_skyline_fact",
    "events_sessionize",
    "orders_item_cf_topk",
    "sim_ivf_topk",
    "sim_ivf_probe2_topk",
    # pinned-k twin measured 10.1x at 10x (documented in its entry);
    # this is the capacity path
    "dedup_semdedup_scaled",
    # the K-bounded LM twin: recorded beside text_lm_logprob's honest
    # ~linear row so the tier shows the bounded alternative measured
    "text_lm_logprob_capped",
]
AMP = 10
# linear growth = 10×; slack for shuffle-partition granularity and
# spill effects at the bigger size. Anything past this is flagged
# superlinear=true in the JSON and warned on stderr (the guard the
# event tier's ratio pins provide on that axis).
SUPERLINEAR_AT = 12.0


# Round 11: the sim_ivf_topk mitigation leg (__scaled_quantizer) is
# gone — the catalog entry now derives its capacity from the corpus
# cardinality (operators/similarity.ivf_capacity, VERDICT r10 item 2),
# so the shipped plan IS the scale-correct configuration and the
# plain data-tier row measures it directly.

# Second point on the data-axis line (VERDICT r10 item 4): the
# cheapest already-measured families re-timed at 30× so the data axis
# is a curvature check (1×/10×/30×), not a single ratio — mirroring
# the event tier's 1×/10×/30× line. Same linear expectation: ≤ ~30×
# work + fixed costs; guard scales with the amplification.
X30_TIER = [
    # the round-11 capacity-path SemDeDup: its k caps at 64 past
    # ~16k vectors (512-sample fit, ≥8 pts/cluster), so the 30× point
    # shows the post-saturation slope (measured ~9× for 30× data)
    "dedup_semdedup_scaled",
    "o6_skyline_fact",
    "events_sessionize",
    "dedup_minhash_lsh",
    "graph_pagerank",
    "ml_naive_bayes",
    "corpus_sequence_pack",
]
AMP30 = 30
SUPERLINEAR_AT_30 = 36.0


def main() -> None:
    # same load-shadow protocol as bench.py (a run launched while
    # other JVMs drain reads ~1.4x slow across the board — and the
    # data tier's scaleup ratios would quietly absorb the skew of
    # load landing on one leg only)
    from bench import wait_for_idle

    wait_for_idle()
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
    # a typo'd/renamed tier name must fail loudly, not silently drop
    # a family from the scaling evidence (ADVICE r10)
    unknown = [n for n in DATA_TIER + X30_TIER if n not in plans.QUERIES]
    if unknown:
        raise KeyError(
            f"scaling-tier names missing from plans.QUERIES: {unknown}"
        )

    def _time_tier(names, amp, guard):
        tier: dict[str, dict] = {}
        for name in names:
            fn = plans.QUERIES[name].fn
            times = []
            for sf_dir in (SFS[1], f"{SFS[1]}@x{amp}"):
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                    release_caches()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                times.append(round(best, 3))
            scaleup = round(times[1] / max(times[0], 1e-9), 2)
            tier[name] = {
                "sf0.1_s": times[0],
                f"x{amp}_s": times[1],
                f"scaleup_{amp}x": scaleup,
                "superlinear": scaleup > guard,
            }
            if scaleup > guard:
                sys.stderr.write(
                    f"WARNING: {name} scaleup {scaleup}x for {amp}x "
                    f"data exceeds {guard} — a pair space or sort is "
                    "growing faster than the facts\n"
                )
        return tier

    data_tier = _time_tier(DATA_TIER, AMP, SUPERLINEAR_AT)
    x30_tier = _time_tier(X30_TIER, AMP30, SUPERLINEAR_AT_30)
    line = json.dumps(
        {
            "metric": "scaling_curve",
            "queries": out,
            "data_tier": {
                "amplification": AMP,
                "superlinear_at": SUPERLINEAR_AT,
                "queries": data_tier,
            },
            "data_tier_x30": {
                "amplification": AMP30,
                "superlinear_at": SUPERLINEAR_AT_30,
                "queries": x30_tier,
            },
        }
    )
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "SCALING_CURVE.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()

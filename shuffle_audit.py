#!/usr/bin/env python
"""Shuffle audit: measure what actually crosses the wire.

For one representative query per structural family, execute the plan
and read the EXECUTED-plan SQL metrics (not estimates): rows produced
by the parquet scans, records/bytes written by every
ShuffleExchangeExec, and bytes broadcast. The point is hard evidence
for the 100 TB design claims in docs/SCALING.md — e.g. the windfield
family materializes ~10x more rows than it shuffles, because the pair
space never crosses an exchange (broadcast grid join + map-side
partial aggregation).

Writes ONE JSON line (and SHUFFLE_AUDIT.json at the repo root when run
as a script):
  {"sf": ..., "queries": {name: {"scan_rows": N, "out_rows": N,
      "shuffle_records": N, "shuffle_mb": X, "broadcast_mb": X,
      "n_exchanges": N}}}

Metrics are read via the executed QueryExecution of the SAME Dataset
the action ran on — a `write.save()` builds its own QueryExecution, so
the audit drives `collect()` (output sizes here are bounded; this is
an audit tool, not the bench).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# one per structural family (see docs/SCALING.md shuffle inventory)
AUDIT = [
    "q1_pricing_summary",        # scan-agg: shuffle = groups only
    "q9_product_profit",         # TPC-H deep join tree
    "q10_returned_items",        # de-hinted r8: AQE-decided cust join
    "q5_local_supplier_volume",  # de-hinted r8: cust+supp+nation tree
    "tc_windfield_holland",      # broadcast grid join + K2 partial agg
    "tc_muni_hazard",            # hazard chain on muni keys
    "dedup_minhash_lsh",         # banded-signature self-join
    "dedup_ngram_jaccard",       # pruned inverted-index self-join
    "sim_ivf_topk",              # cell-key ANN
    "corpus_sequence_pack",      # bucketed two-pass running sum
    "orders_item_cf_topk",       # basket self-join + broadcast counts
    "events_sessionize",         # user-keyed sessionization
    "j11_nearest_supplier",      # NN theta-join via cell tiers
    "events_classical_decompose",  # hourly collapse + dim window
    "corpus_ngram_novelty",      # gram-keyed membership join
    "graph_pagerank",            # iterative Pregel supersteps
    "tc_windfield_skewgrid",     # r9: AQE-decided skewed pair join
    "tc_multi_event_dag",        # r9: 3-storm event-keyed DAG
    # r12: the capacity-path rewrites whose shuffle claims (round-
    # robin spread probe, NO cell-key exchange, broadcast pair join)
    # the two-level work rests on — executed-plan proof beside the
    # plan-shape pins
    "sim_ivf_scaled_topk",
    "dedup_semdedup_scaled",
    "dedup_url_canonical",       # r12: canon-key groupBy = groups only
]


def _walk(p):
    cls = p.getClass().getSimpleName()
    if "AdaptiveSparkPlan" in cls:
        try:
            p = p.executedPlan()
        except Exception:
            pass
        cls = p.getClass().getSimpleName()
    yield p, cls
    ch = p.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))
    if "QueryStage" in cls:
        try:
            yield from _walk(p.plan())
        except Exception:
            pass


def _metric(node, key):
    m = node.metrics()
    return m.apply(key).value() if m.contains(key) else 0


def audit_query(df) -> dict:
    out_rows = len(df.collect())
    plan = df._jdf.queryExecution().executedPlan()
    scan_rows = shuffle_rec = shuffle_b = bcast_b = n_ex = 0
    seen = set()
    for node, cls in _walk(plan):
        # QueryStage re-walk can visit a node twice — count each once
        nid = node.id()
        if nid in seen:
            continue
        seen.add(nid)
        if cls == "ShuffleExchangeExec":
            n_ex += 1
            shuffle_rec += _metric(node, "shuffleRecordsWritten")
            shuffle_b += _metric(node, "shuffleBytesWritten")
        elif cls == "BroadcastExchangeExec":
            bcast_b += _metric(node, "dataSize")
        elif "FileSourceScan" in cls or cls == "BatchScanExec":
            scan_rows += _metric(node, "numOutputRows")
    return {
        "scan_rows": int(scan_rows),
        "out_rows": out_rows,
        "shuffle_records": int(shuffle_rec),
        "shuffle_mb": round(shuffle_b / 1048576, 3),
        "broadcast_mb": round(bcast_b / 1048576, 3),
        "n_exchanges": n_ex,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from ibf_typhoon_data_pipeline_spark import plans
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        release_caches,
    )
    from ibf_typhoon_data_pipeline_spark.session import get_spark

    spark = get_spark("ibf-shuffle-audit", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name in AUDIT:
        qd = plans.QUERIES.get(name)
        if qd is None:
            continue
        df = qd.fn(spark, sf_dir)
        results[name] = audit_query(df)
        release_caches()
        spark.catalog.clearCache()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps(
        {"metric": "shuffle_audit", "sf": float(sf), "queries": results}
    )
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "SHUFFLE_AUDIT.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()

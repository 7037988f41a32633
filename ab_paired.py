#!/usr/bin/env python
"""Paired in-session A/B of runtime-settable confs over a query list.

Usage:
  python ab_paired.py '<json_conf_b>' q1,q2,... [n_pairs]
Arm A = session defaults; arm B = defaults + the given runtime confs.
For each query, runs n_pairs (default 4) of BACK-TO-BACK A,B attempts
(alternating order each pair to cancel warm-up drift), all inside ONE
JVM; reports per-pair times, the median paired ratio B/A, and minima.
Hypervisor steal bursts hit adjacent attempts roughly equally, so the
median PAIRED ratio is robust where fresh-JVM arm comparisons are not
(measured: 2x swings across sessions at idle loadavg)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    conf_b: dict[str, str] = json.loads(sys.argv[1])
    names = [n for n in sys.argv[2].split(",") if n]
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from ibf_typhoon_data_pipeline_spark import plans
    from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches
    from ibf_typhoon_data_pipeline_spark.session import get_spark
    from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

    spark = get_spark("ibf-ab-paired", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    plans.QUERIES["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for t in ("documents", "embeddings", "events", "orders", "customer"):
        load_table(spark, sf_dir, t).count()
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(64).select(_warm(F.col("id").cast("double"))).count()

    defaults = {k: spark.conf.get(k, None) for k in conf_b}

    def set_arm(arm: str) -> None:
        for k, v in conf_b.items():
            if arm == "B":
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    def one(name: str) -> float:
        t0 = time.perf_counter()
        plans.QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        release_caches()
        return dt

    report = {}
    for name in names:
        if name not in plans.QUERIES:
            continue
        # warm both arms once (uncounted) so codegen/fit costs are paid
        for arm in ("A", "B"):
            set_arm(arm)
            one(name)
        times: dict[str, list[float]] = {"A": [], "B": []}
        ratios = []
        for i in range(n_pairs):
            order = ("A", "B") if i % 2 == 0 else ("B", "A")
            pair: dict[str, float] = {}
            for arm in order:
                set_arm(arm)
                pair[arm] = one(name)
            times["A"].append(round(pair["A"], 3))
            times["B"].append(round(pair["B"], 3))
            ratios.append(pair["B"] / pair["A"])
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        report[name] = {
            "A": times["A"],
            "B": times["B"],
            "minA": min(times["A"]),
            "minB": min(times["B"]),
            "median_ratio": round(statistics.median(ratios), 3),
        }
        sys.stderr.write(f"{name}: {report[name]}\n")
    set_arm("A")
    spark.stop()
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

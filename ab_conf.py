#!/usr/bin/env python
"""A/B a session-conf variation over a query list (fresh JVM per arm).

Usage:
  python ab_conf.py '<json_conf_a>' '<json_conf_b>' q1,q2,...
Each arm runs in its own subprocess (same warmup + timing protocol as
bench.py run_chunk: noop sink, best of 2 with adaptive 3rd, per-query
System.gc()), and prints AB_ARM:{...}. The parent interleaves arms
A,B,B,A to cancel slow machine drift, and reports per-query minima.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_arm(names: list[str], conf: dict[str, str], sf_dir: str, cpus: str) -> dict:
    from ibf_typhoon_data_pipeline_spark import plans
    from ibf_typhoon_data_pipeline_spark.operators.bench_probe import probe_seconds
    from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches
    from ibf_typhoon_data_pipeline_spark.session import get_spark

    spark = get_spark("ibf-ab", master=f"local[{cpus}]", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    from ibf_typhoon_data_pipeline_spark.sources.tables import load_table

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

    out: dict[str, object] = {}
    for name in names:
        qd = plans.QUERIES.get(name)
        if qd is None:
            continue
        attempts: list[float] = []
        while len(attempts) < 2 or (
            len(attempts) == 2 and max(attempts) > 1.5 * min(attempts)
        ):
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            attempts.append(time.perf_counter() - t0)
            release_caches()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        out[name] = round(min(attempts), 3)
    out["__probe_sec"] = round(probe_seconds(spark), 3)
    spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if len(sys.argv) >= 4 and sys.argv[1] == "--arm":
        conf = json.loads(sys.argv[2])
        names = [n for n in sys.argv[3].split(",") if n]
        print("AB_ARM:" + json.dumps(run_arm(names, conf, sf_dir, cpus)))
        return

    conf_a, conf_b = sys.argv[1], sys.argv[2]
    names = sys.argv[3]
    results: dict[str, list[dict]] = {"A": [], "B": []}
    for arm, conf in (("A", conf_a), ("B", conf_b), ("B", conf_b), ("A", conf_a)):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", conf, names],
            capture_output=True,
            text=True,
        )
        got = None
        for line in proc.stdout.splitlines():
            if line.startswith("AB_ARM:"):
                got = json.loads(line[len("AB_ARM:") :])
        if got is None:
            sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:] + "\n")
            raise RuntimeError(f"arm {arm} failed")
        results[arm].append(got)
        sys.stderr.write(f"arm {arm} done: {got}\n")

    summary = {}
    for n in names.split(","):
        a = min(r[n] for r in results["A"] if n in r)
        b = min(r[n] for r in results["B"] if n in r)
        summary[n] = {"A": a, "B": b, "B/A": round(b / a, 3) if a else None}
    probes = {
        arm: [r["__probe_sec"] for r in results[arm]] for arm in ("A", "B")
    }
    print(json.dumps({"summary": summary, "probes": probes}, indent=1))


if __name__ == "__main__":
    main()

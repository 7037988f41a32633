"""Machine-speed calibration probe for absolute-seconds bench guards.

An absolute wall-clock pin measures the sandbox's CPU weather as much
as the plan (observed ~1.4× broad swings between sessions with zero
code changes — VERDICT r6 item 4). Instead, time a fixed synthetic
workload in the SAME session and pin the RATIO envelope/probe: machine
slowdowns cancel, plan regressions (a lost prune, a broadcast turned
shuffle) don't.

The probe is a constant-size whole-stage-codegen hash aggregate — the
same execution profile (JVM codegen loop, partial agg, one small
exchange) that dominates the guarded envelopes.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

# 2^28 rows → ~1M groups: big enough to amortize job-scheduling noise,
# small enough to finish in a few seconds on local[32].
_PROBE_ROWS = 1 << 28
_PROBE_GROUPS = 1 << 20


def probe_seconds(spark: SparkSession, runs: int = 2) -> float:
    """Best-of-`runs` wall seconds for the fixed probe workload.

    Best-of-two drops the first-run codegen/warm-up cost the same way
    bench.py does for its queries.
    """
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        (
            spark.range(_PROBE_ROWS)
            .selectExpr(f"id % {_PROBE_GROUPS} AS k", "id AS v")
            .groupBy("k")
            .sum("v")
            .selectExpr("sum(`sum(v)`) AS s")
            .collect()
        )
        best = min(best, time.perf_counter() - t0)
    return best


def latency_probe_seconds(spark: SparkSession, jobs: int = 40) -> float:
    """Wall seconds for `jobs` SEQUENTIAL trivial jobs — a
    scheduler-latency probe, the second weather axis.

    The hash-agg `probe_seconds` measures CPU throughput and
    under-captures per-stage scheduling/dispatch latency (documented:
    +15% probe during a +47% total swing). The iterative graph
    family is the opposite profile — dozens of short stages per
    superstep, so its wall time is dominated by exactly the latency
    this probe isolates (round 8: BFS/SSSP swung 4.3 → 5.5-7.0 s
    between days while the throughput probe READ FASTER). Each job
    here does near-zero work (32-row local range count), so the total
    is ~jobs × (scheduling + dispatch + result fetch) latency.
    Recorded per bench chunk; compare graph-family swings against
    THIS number, throughput-bound swings against probe_seconds."""
    t0 = time.perf_counter()
    for _ in range(jobs):
        spark.range(32).count()
    return time.perf_counter() - t0


def ratio_warning(
    leg: str,
    wall_s: float,
    probe_s: float,
    pin_ratio: float,
    factor: float = 1.5,
) -> str | None:
    """None when wall/probe is within `factor`× the pinned ratio,
    else a human-readable warning string. Pure so tests can drive it
    with real timings from a pruning-bypassed plan."""
    ratio = wall_s / probe_s
    if ratio > factor * pin_ratio:
        return (
            f"WARNING: {leg} leg ratio {ratio:.1f}x probe exceeds "
            f"{factor}x the pinned ratio ({pin_ratio}) — check "
            f"grid_prune_pairs / wind-extent pruning for a regression "
            f"(wall {wall_s:.1f}s, probe {probe_s:.1f}s)"
        )
    return None

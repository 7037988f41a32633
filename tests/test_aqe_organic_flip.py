"""Organic AQE strategy-flip (VERDICT r8 item 3): the shuffle-path
sweep forces shuffle joins with autoBroadcastJoinThreshold=-1 — a
sledgehammer that proves the degraded plan computes the right answer
but not that AQE's runtime SIZE decision actually engages where the
round-8 de-hinting claims it will. This test lowers the threshold to a
value measured to sit BETWEEN the two sides' actual map-output sizes
at sf0.01, so the flip (if it happens) is AQE's own size-based call:

- ml_naive_bayes at 16 KB: the Heaps-growing vocab frame (measured
  16-64 KB of map output at sf0.01) outgrows the threshold and its
  join must flip to a sort-merge join, while the genuinely tiny
  frames stay broadcast;
- q10_returned_items at 64 KB: the customer build side (~hundreds of
  KB at sf0.01) flips, while nation (25 rows) stays broadcast — the
  mixed plan a real 100 TB run would get, where only bounded dims
  broadcast.

Values must be identical on the flipped plan. Together with
test_shuffle_path_parity this covers both halves of the scale claim:
the degraded plan is correct (sledgehammer) AND the runtime decision
that selects it engages by size (this test)."""

from __future__ import annotations

import pytest

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches

SF = "/root/testdata/sf0.01"

# (entry, threshold-in-bytes between the build sides' actual sizes,
#  joins expected to remain broadcast in the flipped final plan)
CASES = [
    ("ml_naive_bayes", "16384", 3),
    ("q10_returned_items", "65536", 5),
]


def _run(spark, name):
    df = plans.QUERIES[name].fn(spark, SF)
    rows = sorted(tuple(r) for r in df.collect())
    plan = df._jdf.queryExecution().executedPlan().toString()
    release_caches()
    return rows, plan


@pytest.mark.parametrize("name,threshold,n_bcast_kept", CASES)
def test_threshold_between_sizes_flips_by_size(
    spark, name, threshold, n_bcast_kept
):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        base_rows, base_plan = _run(spark, name)
        # precondition: at the default threshold AQE broadcasts every
        # un-hinted join in the FINAL adaptive plan (the bench-SF plan)
        assert "isFinalPlan=true" in base_plan
        assert "SortMergeJoin" not in base_plan
        assert "ShuffledHashJoin" not in base_plan

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        rows, plan = _run(spark, name)
        assert "isFinalPlan=true" in plan
        # the outgrown build side flipped to a shuffle join BY SIZE...
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
            f"{name}: threshold {threshold} did not flip any join — "
            "either the build side shrank below it (re-measure) or "
            "AQE's size decision is not engaging"
        )
        # ...while the genuinely small frames kept their broadcast —
        # the mixed plan, not an all-shuffle degradation
        assert plan.count("BroadcastHashJoin") == n_bcast_kept, (
            f"{name}: expected {n_bcast_kept} surviving broadcasts, "
            f"got {plan.count('BroadcastHashJoin')}"
        )
        # value parity on the organically-flipped plan
        assert rows == base_rows, (
            f"{name}: values changed on the size-flipped plan"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

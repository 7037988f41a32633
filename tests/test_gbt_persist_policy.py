"""Cache-hygiene pin for the GBT family's persist policy (VERDICT r8
item 7; xgb side re-measured r13). The whole family persists its fit
frame ONLY while fitting (cold path: four consumers — count, fit
min/max, fit sketch, scoring); once the fit is memoized, scoring is
the sole consumer and the persist round-trip + count() action just
doubles the frame compute (round-7 rule: persist loses below 3
re-reads; stump measured 4.2 -> ~3.5 s warm at sf0.1, xgb measured
0.895 paired / mins 3.43 -> 2.86 s warm at sf0.1 in r13 — the r8
number that kept xgb's unconditional persist predated the fit memo).

The observable is the tracked-persist count (operators.cache._CACHED
delta across the plan builder) with the fit memo forced cold/warm.
"""

from __future__ import annotations

import pytest

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators import cache
from ibf_typhoon_data_pipeline_spark.plans import typhoon

SF = "/root/testdata/sf0.01"

# entry -> (memo key, persists expected cold, persists expected warm)
POLICY = {
    "tc_damage_gbt": ("stump", 1, 0),
    "tc_damage_calibration": ("stump", 1, 0),
    "tc_damage_xgb": ("xgb", 1, 0),
}


def _persists_during_build(spark, name: str) -> int:
    before = len(cache._CACHED)
    plans.QUERIES[name].fn(spark, SF)  # persist+count happen at build
    delta = len(cache._CACHED) - before
    cache.release_caches()
    return delta


@pytest.mark.parametrize("name", sorted(POLICY))
def test_persist_only_per_measured_policy(spark, name):
    memo_key, n_cold, n_warm = POLICY[name]
    saved = typhoon._FIT_MEMO.pop(memo_key, None)
    try:
        assert _persists_during_build(spark, name) == n_cold, (
            f"{name}: cold-path persist count drifted from the "
            f"measured policy ({n_cold} expected)"
        )
        assert memo_key in typhoon._FIT_MEMO, (
            f"{name}: cold build did not memoize fit '{memo_key}'"
        )
        assert _persists_during_build(spark, name) == n_warm, (
            f"{name}: warm-path persist count drifted from the "
            f"measured policy ({n_warm} expected)"
        )
    finally:
        if saved is not None:
            typhoon._FIT_MEMO[memo_key] = saved

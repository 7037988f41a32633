"""Runtime shuffle-metric pins — the measured twin of
test_plan_shapes. Static plan text proves the OPERATOR shapes; these
read the executed plan's SQLMetrics and pin what actually crossed an
exchange, so a regression that keeps the plan shape but blows up the
shuffled volume (e.g. losing the dynamic windfield prune or a
broadcast falling back to shuffle) fails here."""

from __future__ import annotations

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.operators.cache import release_caches

from shuffle_audit import audit_query

SF = "/root/testdata/sf0.01"


def _audit(spark, name):
    out = audit_query(plans.QUERIES[name].fn(spark, SF))
    release_caches()
    spark.catalog.clearCache()
    return out


def test_windfield_shuffles_fraction_of_output(spark):
    a = _audit(spark, "tc_windfield_holland")
    # the pair space NEVER crosses an exchange: the only shuffle is the
    # K2 reduction's partial-agg output (one row per member-centroid
    # group that survives), an order of magnitude below the output
    assert a["shuffle_records"] < 0.2 * a["out_rows"], a
    assert a["n_exchanges"] <= 2, a


def test_scan_agg_shuffles_only_groups(spark):
    a = _audit(spark, "q1_pricing_summary")
    # map-side partial aggregation: per-partition group rows only
    assert a["shuffle_records"] <= 64 * 8, a  # groups x partitions
    assert a["scan_rows"] >= 10000, a  # the fact scan really ran


def test_sessionize_single_exchange(spark):
    a = _audit(spark, "events_sessionize")
    # one user-keyed sort reused by both windows: exactly one exchange,
    # each input row crosses once
    assert a["n_exchanges"] == 1, a
    assert a["shuffle_records"] <= a["scan_rows"], a

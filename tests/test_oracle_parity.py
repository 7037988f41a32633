"""Every registered query with an oracle must hash-match DuckDB at
sf0.01 — the local twin of the driver's correctness gate."""

from __future__ import annotations

import pytest

from ibf_typhoon_data_pipeline_spark import plans
from tests.oracle_util import compare_query

ORACLE_QUERIES = sorted(
    name for name, qd in plans.QUERIES.items() if qd.oracle is not None
)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    qd = plans.QUERIES[name]
    compare_query(spark, name, qd.fn, qd.oracle_text())


ROWS_ONLY = sorted(
    name for name, qd in plans.QUERIES.items() if qd.oracle is None
)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    qd = plans.QUERIES[name]
    df = qd.fn(spark, "/root/testdata/sf0.01")
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

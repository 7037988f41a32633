"""Gradient-boosted-stump estimator contracts (K6): determinism,
boosting actually reduces training loss, and the generated CASE-chain
SQL is an exact float-for-float twin of the numpy scorer."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from ibf_typhoon_data_pipeline_spark.operators.gbt import (
    fit_gbt_stumps,
    gbt_case_sql,
    predict_gbt,
)


def _toy():
    # deterministic, no RNG: two features with real structure
    i = np.arange(400, dtype=np.float64)
    x1 = (i * 7919.0) % 97.0
    x2 = (i * 104729.0) % 89.0
    y = np.where(x1 > 50.0, 10.0 + x2 * 0.1, x2 * 0.05)
    return [x1, x2], y


def test_fit_is_deterministic():
    feats, y = _toy()
    t1 = fit_gbt_stumps(feats, y)
    t2 = fit_gbt_stumps([f.copy() for f in feats], y.copy())
    assert t1 == t2
    assert len(t1) > 0


def test_boosting_reduces_training_sse():
    feats, y = _toy()
    losses = []
    for rounds in (1, 3, 6):
        pred = predict_gbt(fit_gbt_stumps(feats, y, n_rounds=rounds), feats)
        losses.append(float(((y - pred) ** 2).sum()))
    assert losses[0] > losses[1] > losses[2]


def test_case_sql_is_exact_twin_of_numpy_scorer():
    feats, y = _toy()
    trees = fit_gbt_stumps(feats, y)
    expected = predict_gbt(trees, feats)
    df = pd.DataFrame({"f1": feats[0], "f2": feats[1]})
    got = (
        duckdb.connect()
        .execute(f"SELECT {gbt_case_sql(trees, ['f1', 'f2'])} AS p FROM df")
        .df()["p"]
        .to_numpy()
    )
    # bitwise equality — same doubles, same add order, no tolerance
    assert np.array_equal(got, expected)

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


# ------------------------------------------------- histogram GBT (depth ≥ 2)
from ibf_typhoon_data_pipeline_spark.operators.gbt import (  # noqa: E402
    fit_hist_gbt_from_engine,
    hist_gbt_case_sql,
    uniform_edges,
)


def _toy_frame() -> pd.DataFrame:
    i = np.arange(600, dtype=np.float64)
    x1 = (i * 7919.0) % 97.0
    x2 = (i * 104729.0) % 89.0
    x3 = i % 2.0
    # interaction structure a stump can't capture but depth 2 can
    y = np.where((x1 > 50.0) & (x2 > 40.0), 30.0 + x3 * 5.0, x2 * 0.05)
    return pd.DataFrame({"f1": x1, "f2": x2, "f3": x3, "target": y})


def _duck_run(df: pd.DataFrame):
    con = duckdb.connect()
    con.register("xgb_frame", df)
    return lambda s: con.execute(s).fetchall()


def test_hist_gbt_engine_agnostic_and_order_independent():
    """The fit must depend only on the grouped integer sketch — not on
    row order — and must emit the identical CASE SQL from any engine
    handing back the same statistics."""
    df = _toy_frame()
    shuffled = df.iloc[::-1].reset_index(drop=True)
    sql1 = fit_hist_gbt_from_engine(
        _duck_run(df), ["f1", "f2", "f3"], "target"
    )
    sql2 = fit_hist_gbt_from_engine(
        _duck_run(shuffled), ["f1", "f2", "f3"], "target"
    )
    assert sql1 == sql2
    assert "CASE WHEN" in sql1


def test_hist_gbt_depth2_beats_depth1_on_interaction():
    df = _toy_frame()
    con = duckdb.connect()
    con.register("xgb_frame", df)
    run = lambda s: con.execute(s).fetchall()  # noqa: E731

    def mse(score_sql: str) -> float:
        return con.execute(
            f"SELECT avg((target - ({score_sql})) * (target - ({score_sql})))"
            " FROM xgb_frame"
        ).fetchone()[0]

    d1 = fit_hist_gbt_from_engine(run, ["f1", "f2", "f3"], "target", depth=1)
    d2 = fit_hist_gbt_from_engine(run, ["f1", "f2", "f3"], "target", depth=2)
    base = con.execute(
        "SELECT avg((target - 0.5) * (target - 0.5)) FROM xgb_frame"
    ).fetchone()[0]
    assert mse(d1) < base
    assert mse(d2) < mse(d1) * 0.7  # the interaction needs depth 2


def test_hist_gbt_deeper_trees_and_sql_twin():
    """The sketch fit must generalize beyond depth 2 (the reference
    runs depth 8) with the CASE-chain scorer remaining a bitwise twin
    of the numpy predictor at any depth."""
    import numpy as np

    from ibf_typhoon_data_pipeline_spark.operators.gbt import (
        fit_hist_gbt_sketch,
        hist_gbt_case_sql,
        predict_hist_gbt,
    )

    df = _toy_frame()
    con = duckdb.connect()
    con.register("xgb_frame", df)
    run = lambda s: con.execute(s).fetchall()  # noqa: E731

    def mse_of(depth):
        trees = fit_hist_gbt_sketch(
            run, ["f1", "f2", "f3"], "target", depth=depth
        )
        sql = hist_gbt_case_sql(trees, ["f1", "f2", "f3"])
        got = con.execute(f"SELECT {sql} AS p FROM xgb_frame").df()["p"].to_numpy()
        exp = predict_hist_gbt(
            trees, [df.f1.to_numpy(), df.f2.to_numpy(), df.f3.to_numpy()]
        )
        assert np.array_equal(got, exp), f"SQL/numpy diverge at depth {depth}"
        y = df.target.to_numpy()
        return float(((y - exp) ** 2).mean())

    m2, m3, m4 = mse_of(2), mse_of(3), mse_of(4)
    assert m3 <= m2 and m4 <= m3, (m2, m3, m4)


def test_uniform_edges_contract():
    assert uniform_edges(0.0, 0.0) == []          # constant feature
    e = uniform_edges(0.0, 16.0, 16)
    assert len(e) == 15 and e[0] == 1.0 and e[-1] == 15.0
    assert hist_gbt_case_sql([], ["x"]).startswith("CAST('0.5'")


def test_warm_memoized_path_matches_cold_fit_path(spark):
    """Round 8: the stump entries persist their fit frame only while
    FITTING; the warm (memoized) path scores an un-persisted rebuild
    of the frame. Values must be identical between the first (cold)
    and second (warm) invocation in one process."""
    from ibf_typhoon_data_pipeline_spark import plans
    from ibf_typhoon_data_pipeline_spark.operators.cache import (
        release_caches,
    )

    sf = "/root/testdata/sf0.01"
    for name in ("tc_damage_gbt", "tc_damage_calibration"):
        fn = plans.QUERIES[name].fn
        first = sorted(tuple(r) for r in fn(spark, sf).collect())
        release_caches()
        second = sorted(tuple(r) for r in fn(spark, sf).collect())
        release_caches()
        assert first == second, f"{name}: warm path diverged"

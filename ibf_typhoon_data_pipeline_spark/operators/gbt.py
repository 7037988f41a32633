"""K6 at the reference's model class — gradient-boosted regression
trees (forecast_process.py:409-547 trains an XGBRegressor each run
with fixed seeds and predicts every municipality row).

xgboost isn't shipped in this container, so the estimator here is
gradient-boosted regression STUMPS in plain numpy: T rounds of
least-squares stumps on residuals with a learning rate — the same
model family at depth 1, fit driver-side (the training set is ~10⁴
rows by design, exactly the reference's driver-side xgb.fit slot) and
scored distributed via an Arrow-batched pandas UDF over a broadcast
model.

Determinism contract (what makes this oracle-checkable):
- Inputs to the fit are sorted by a total key and rounded to 6dp, so
  both engines hand the SAME float64 arrays to the SAME fit code.
- Candidate thresholds are fixed quantiles; ties in the SSE argmin
  keep the first (feature-order, then threshold-order) candidate.
- Scoring accumulates leaf contributions in round order starting from
  0.0 — mirrored token for token by the generated CASE-chain SQL
  (``gbt_case_sql``), every literal CAST AS DOUBLE so DuckDB does
  float adds, not DECIMAL arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

N_ROUNDS = 6
LEARNING_RATE = 0.5
QUANTILES = [i / 10.0 for i in range(1, 10)]


@dataclass(frozen=True)
class Stump:
    feat: int      # index into the feature list
    thr: float     # go left when x[feat] < thr
    left: float    # leaf contribution (learning rate folded in)
    right: float


def _prep(cols: list[np.ndarray]) -> list[np.ndarray]:
    """Round to 6dp — collapses cross-engine ulp noise so the fit sees
    bit-identical arrays whichever engine materialized the frame."""
    return [np.round(np.asarray(c, dtype=np.float64), 6) for c in cols]


def fit_gbt_stumps(
    features: list[np.ndarray],
    y: np.ndarray,
    n_rounds: int = N_ROUNDS,
    lr: float = LEARNING_RATE,
) -> list[Stump]:
    """Greedy least-squares stump boosting. Deterministic: candidate
    thresholds are the 10..90% linear-interpolation quantiles of each
    (rounded) feature; strict `<` improvement keeps the first-seen
    candidate on ties."""
    xs = _prep(features)
    resid = _prep([y])[0].copy()
    cands = [np.unique(np.quantile(x, QUANTILES)) for x in xs]
    trees: list[Stump] = []
    for _ in range(n_rounds):
        best = None  # (sse, feat, thr, left_mean, right_mean)
        for fi, x in enumerate(xs):
            for thr in cands[fi]:
                mask = x < thr
                n_l = int(mask.sum())
                if n_l == 0 or n_l == len(x):
                    continue
                lv = float(resid[mask].mean())
                rv = float(resid[~mask].mean())
                pred = np.where(mask, lv, rv)
                sse = float(((resid - pred) ** 2).sum())
                if best is None or sse < best[0]:
                    best = (sse, fi, float(thr), lv, rv)
        if best is None:  # constant features — nothing to split
            break
        _, fi, thr, lv, rv = best
        trees.append(Stump(fi, thr, lr * lv, lr * rv))
        contrib = np.where(xs[fi] < thr, lr * lv, lr * rv)
        resid = resid - contrib
    return trees


def predict_gbt(trees: list[Stump], features: list[np.ndarray]) -> np.ndarray:
    """0.0 + Σ_t contribution_t, accumulated in round order — the
    float-add sequence the CASE-chain SQL reproduces."""
    xs = _prep(features)
    pred = np.zeros(len(xs[0]), dtype=np.float64)
    for t in trees:
        pred = pred + np.where(xs[t.feat] < t.thr, t.left, t.right)
    return pred


def gbt_case_sql(trees: list[Stump], feat_names: list[str]) -> str:
    """The oracle's scoring expression: one CASE per stump, summed
    left-associatively from CAST(0.0 AS DOUBLE). Literals are repr()'d
    (shortest round-trip — parses back to the identical double) and
    CAST AS DOUBLE so DuckDB never routes through DECIMAL."""
    terms = ["CAST(0.0 AS DOUBLE)"]
    for t in trees:
        terms.append(
            f"CASE WHEN round({feat_names[t.feat]}, 6)"
            f" < CAST({t.thr!r} AS DOUBLE)"
            f" THEN CAST({t.left!r} AS DOUBLE)"
            f" ELSE CAST({t.right!r} AS DOUBLE) END"
        )
    return " + ".join(terms)


def gbt_predict_udf(spark: SparkSession, trees: list[Stump]):
    """Broadcast the fitted stumps, score Arrow batches — the harness
    an xgboost Booster drops straight into (swap predict_gbt for
    booster.inplace_predict)."""
    bc = spark.sparkContext.broadcast(trees)

    @pandas_udf("double")
    def score(*cols: pd.Series) -> pd.Series:
        feats = [c.to_numpy(dtype=np.float64) for c in cols]
        return pd.Series(predict_gbt(bc.value, feats))

    return score

"""K6 — model training + distributed inference (SURVEY.md §2.9 K6,
§2.11).

The reference retrains an XGBoost regressor on the driver each run
(dataset ~10⁴ rows, fixed seeds, forecast_process.py:409-547) and
predicts over every municipality row. The Spark shape of that is:

  1. fit on the driver (the training set is small by design),
  2. broadcast the fitted model,
  3. score with an Arrow-batched pandas UDF over the fact table.

xgboost isn't in this container, so the bundled estimator is
closed-form OLS (two features, normal equations) — deterministic,
driver-fit from ONE aggregate pass over the training DataFrame (five
sums), and therefore reproducible by the DuckDB oracle end to end.
``predict_udf`` is exactly the broadcast-model/pandas-UDF harness an
XGBoost booster drops into (gate the import, swap ``fit``/``score``).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # pragma: no cover — not shipped in this container
    import xgboost  # noqa: F401

    HAS_XGBOOST = True
except Exception:  # pragma: no cover
    HAS_XGBOOST = False


@dataclass(frozen=True)
class OLS2:
    """y ≈ b1·x1 + b2·x2 (no intercept; closed form via 2×2 normal
    equations — det inverse, no linalg dependency)."""

    b1: float
    b2: float


def fit_ols2(train: DataFrame, x1: str, x2: str, y: str) -> OLS2:
    """Driver-side fit: one aggregate pass → five sufficient statistics
    → closed-form coefficients. Distributed part is the agg; the 2×2
    solve is O(1) on the driver (the reference's driver-side
    xgb.fit slot)."""
    row = train.agg(
        F.sum(F.col(x1) * F.col(x1)).alias("s11"),
        F.sum(F.col(x1) * F.col(x2)).alias("s12"),
        F.sum(F.col(x2) * F.col(x2)).alias("s22"),
        F.sum(F.col(x1) * F.col(y)).alias("t1"),
        F.sum(F.col(x2) * F.col(y)).alias("t2"),
    ).first()
    det = row.s11 * row.s22 - row.s12 * row.s12
    b1 = (row.s22 * row.t1 - row.s12 * row.t2) / det
    b2 = (row.s11 * row.t2 - row.s12 * row.t1) / det
    return OLS2(b1=b1, b2=b2)


def predict_udf(spark, model: OLS2):
    """Broadcast-model pandas UDF — the inference harness. The model
    rides the broadcast (a booster object would, identically); scoring
    is vectorized per Arrow batch, no per-row Python."""
    bc = spark.sparkContext.broadcast(model)

    @pandas_udf("double")
    def score(x1: pd.Series, x2: pd.Series) -> pd.Series:
        m = bc.value
        return x1 * m.b1 + x2 * m.b2

    return score


def predict_expr(model: OLS2, x1: Column, x2: Column) -> Column:
    """Same scoring as a pure expression — for models that reduce to
    closed form, codegen beats even a pandas UDF (no Arrow hop)."""
    return x1 * F.lit(model.b1) + x2 * F.lit(model.b2)

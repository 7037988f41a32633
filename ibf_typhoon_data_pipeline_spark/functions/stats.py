"""Extreme-value statistics as pure SQL expressions (SURVEY.md §2 A16).

The reference fits GEV return levels offline in R (`fevd`,
models/operational/xgb_model_v1.R:134-145); SURVEY §2 A16 parked the
fit as "pandas UDF, out of core scope". This module does better: the
standard L-moments estimator (Hosking 1990) + the Hosking κ
approximation are CLOSED-FORM arithmetic over order-statistics sums,
so the whole fit — block maxima → probability-weighted moments → GEV
(κ, σ, μ) → return levels — runs as window + aggregate + scalar
expressions, whole-stage-codegen'd, with an exact DuckDB twin.

Every formula is emitted as SQL TEXT used by BOTH engines (F.expr on
the Spark side), the same token-identical-text discipline as the
Willoughby blend zone. Γ(1+κ) comes from a 9-term Lanczos(g=7)
approximation (published coefficients, |rel err| < 1e-13 for the
z ∈ (0.5, 2.5) range L-moment fits produce) because neither engine
exposes a portable gamma() we could keep bit-identical.

Estimator, from ascending-ordered block maxima x_(1..n):
  b0 = Σx/n ;  b1 = Σ x·(r−1)/(n(n−1)) ;  b2 = Σ x·(r−1)(r−2)/(n(n−1)(n−2))
  l1 = b0 ;  l2 = 2b1 − b0 ;  t3 = (6b2 − 6b1 + b0)/l2
  c  = 2/(3+t3) − ln(2)/ln(3)
  κ  = 7.8590·c + 2.9554·c²
  σ  = l2·κ / ((1 − 2^(−κ))·Γ(1+κ))
  μ  = l1 − σ·(Γ(1+κ) − 1)/κ
  z_T = μ + σ/κ · (1 − (−ln(1 − 1/T))^κ)
"""

from __future__ import annotations

# Lanczos g=7, n=9 coefficients (Numerical-Recipes / Boost-documented
# values, public domain constants).
_LANCZOS = [
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
]
_SQRT_2PI = "2.5066282746310002"


def gamma_sql(z: str) -> str:
    """Γ(z) for an expression ``z`` (valid z > 0.5 — no reflection
    branch): √(2π)·t^(z−0.5)·e^(−t)·A(z), t = z+6.5."""
    a_terms = [repr(_LANCZOS[0])] + [
        f"{_LANCZOS[i]!r} / (({z}) + {float(i - 1)!r})"
        for i in range(1, len(_LANCZOS))
    ]
    a = " + ".join(a_terms)
    t = f"(({z}) + 6.5)"
    return (
        f"({_SQRT_2PI} * pow({t}, ({z}) - 0.5) * exp(-{t}) * ({a}))"
    )


# --- the GEV chain, one materialized column per step (never nested —
# the same no-exponential-expressions rule as the Newton unroll).
GEV_L1_SQL = "b0"
GEV_L2_SQL = "2.0 * b1 - b0"
GEV_T3_SQL = "(6.0 * b2 - 6.0 * b1 + b0) / l2"
GEV_C_SQL = "2.0 / (3.0 + t3) - ln(2.0) / ln(3.0)"
GEV_KAPPA_SQL = "7.8590 * c + 2.9554 * c * c"
GEV_G1K_SQL = gamma_sql("1.0 + kappa")
GEV_SIGMA_SQL = "l2 * kappa / ((1.0 - pow(2.0, -kappa)) * g1k)"
GEV_MU_SQL = "l1 - sigma * (g1k - 1.0) / kappa"


def return_level_sql(t_years: float) -> str:
    """z_T — ``t_years`` is baked in as an exact float literal."""
    return (
        f"mu + sigma / kappa"
        f" * (1.0 - pow(-ln(1.0 - 1.0 / {float(t_years)!r}), kappa))"
    )

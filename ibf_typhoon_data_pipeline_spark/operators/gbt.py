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
            f" < CAST('{t.thr!r}' AS DOUBLE)"
            f" THEN CAST('{t.left!r}' AS DOUBLE)"
            f" ELSE CAST('{t.right!r}' AS DOUBLE) END"
        )
    return " + ".join(terms)


# ------------------------------------------------- histogram GBT (depth ≥ 2)
# The reference's actual model class is a depth-8 100-tree XGBRegressor
# trained with tree_method="hist" (forecast_process.py:485-510:
# max_depth=8, learning_rate=0.025, gamma=1, min_child_weight=1,
# base_score=0.5, objective=reg:squarederror). xgboost isn't in this
# container, so the estimator below is the same hist algorithm in
# plain numpy — depthwise-grown regression trees on binned features,
# boosted on squared-error gradients with the xgb gain formula
# (0.5·(G_L²/(H_L+λ) + G_R²/(H_R+λ) − G²/(H+λ)) − γ) and leaf weight
# −G/(H+λ).
#
# What makes it 100 TB-shaped AND oracle-checkable at the same time:
# the engine's only job is ONE aggregation — group rows by their full
# bin vector and return (bin-vector, Σ round(y·1e6)::BIGINT, count).
# Integer sums are exact and order-independent, so Spark and DuckDB
# hand the fit bit-identical sufficient statistics no matter how the
# shuffle partitioned the rows; the whole boosting loop then runs
# driver-side on that bounded sketch (≤ min(rows, bins^features)
# groups, 20 small ints + 2 int64s each — the hist trick: the model
# never distinguishes rows beyond their bins). No toPandas of the
# frame, no per-round engine round-trips, and the fitted model scores
# as a pure CASE-chain expression (whole-stage codegen, no UDF).

HIST_BINS = 16          # equal-width bins from (min, max); deterministic
XGB_ROUNDS = 100        # boosting rounds — reference settings.py:226
XGB_ETA = 0.025         # reference learning_rate
XGB_DEPTH = 8           # reference max_depth; CASE-chain oracle stays a
                        # bitwise twin of the numpy/UDF scorer (~785 KB
                        # SQL, DuckDB parses+evaluates it in ~2 s) —
                        # Spark scores via the broadcast-tree Arrow UDF
                        # instead of inlining that chain into codegen
XGB_LAMBDA = 1.0        # xgb reg_lambda default
XGB_GAMMA = 1.0         # reference gamma=1
XGB_BASE = 0.5          # reference base_score
MICRO = 1_000_000       # target quantization for the integer sketch


@dataclass(frozen=True)
class TreeNode:
    """Either a leaf (value set, feat < 0) or an internal split on
    feature `feat` at raw-value threshold `edge` (left when x < edge,
    matching the bin rule bin < k ⟺ x < edge_k)."""

    feat: int
    edge: float
    left: "TreeNode | None"
    right: "TreeNode | None"
    value: float

    @staticmethod
    def leaf(value: float) -> "TreeNode":
        return TreeNode(-1, 0.0, None, None, value)

    @property
    def is_leaf(self) -> bool:
        return self.feat < 0


def uniform_edges(lo: float, hi: float, n_bins: int = HIST_BINS) -> list[float]:
    """Equal-width bin edges from the exact (min, max) order statistics
    — zero interpolation arithmetic, so both engines derive bitwise-
    identical edges from identical column extremes. (A quantile-sketch
    binning is the production swap at skewed 100 TB distributions; the
    plan shape — one groupBy on the bin vector — is unchanged.)"""
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        return []
    return [lo + k * (hi - lo) / n_bins for k in range(1, n_bins)]


def bin_expr_sql(col: str, edges: list[float]) -> str:
    """bin = Σ 1[x ≥ edge_k] — monotone edges make bin ≥ k ⟺ x ≥
    edge_k exactly, so fit-time bins and the scoring CASE rules
    (x < edge_k) can never disagree, even at float boundaries."""
    if not edges:
        return "0"
    return " + ".join(
        f"(CASE WHEN {col} >= CAST('{e!r}' AS DOUBLE) THEN 1 ELSE 0 END)"
        for e in edges
    )


def sketch_sql(
    frame: str, features: list[str], edges: list[list[float]], target: str
) -> str:
    """The one engine-side pass: bin-vector → (Σ micro-target, count).
    Identical text for Spark and DuckDB; integer outputs make the
    result independent of partitioning and fold order."""
    bins = ", ".join(
        f"{bin_expr_sql(f, edges[i])} AS b{i}" for i, f in enumerate(features)
    )
    bcols = ", ".join(f"b{i}" for i in range(len(features)))
    return (
        f"SELECT {bcols}, "
        f"sum(CAST(round({target} * 1000000.0) AS BIGINT)) AS y_micro, "
        f"count(*) AS n "
        f"FROM (SELECT {bins}, {target} FROM {frame}) g "
        f"GROUP BY {bcols}"
    )


def fit_hist_gbt(
    bins: np.ndarray,
    y_micro: np.ndarray,
    cnt: np.ndarray,
    edges: list[list[float]],
    n_rounds: int = XGB_ROUNDS,
    eta: float = XGB_ETA,
    depth: int = XGB_DEPTH,
    lam: float = XGB_LAMBDA,
    gamma: float = XGB_GAMMA,
    base: float = XGB_BASE,
) -> list[TreeNode]:
    """Boosted depthwise trees from the grouped sketch. Deterministic:
    the sketch rows arrive lexicographically sorted, every histogram
    accumulation (np.bincount over offset-flattened bins) runs in that
    fixed order, and split ties keep the first-seen (feature order,
    then bin order) candidate via row-major argmax."""
    bins = np.asarray(bins, dtype=np.int64)
    y_sum = np.asarray(y_micro, dtype=np.float64) / MICRO
    h_all = np.asarray(cnt, dtype=np.float64)
    n_groups, n_feat = bins.shape
    pred = np.full(n_groups, float(base))
    trees: list[TreeNode] = []

    # One bincount over offset-flattened bins replaces n_feat np.add.at
    # calls per node (the reference-depth fit is ~25k node visits —
    # add.at was the whole cost). Summation order inside a bin changes
    # vs add.at, but BOTH engines run this same code on identical
    # integer-derived arrays, so the fits stay bitwise twins.
    nb_per_feat = np.array([len(e) + 1 for e in edges], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(nb_per_feat)])
    total_bins = int(offsets[-1])
    flat_bins = bins + offsets[:-1][None, :]
    max_nb = int(nb_per_feat.max()) if n_feat else 1
    # gather map: padded (n_feat, max_nb) view into the flat histogram;
    # out-of-range slots clip into neighbor bins but every such slot is
    # masked out of the gain scan below
    gather = np.minimum(
        offsets[:-1][:, None] + np.arange(max_nb)[None, :], total_bins - 1
    )
    # candidate split k = column+1 is real only while k ≤ nb_fi − 1
    cand_real = (
        np.arange(1, max_nb)[None, :] <= (nb_per_feat - 1)[:, None]
    )

    def node_hists(idx: np.ndarray, grad: np.ndarray):
        fb = flat_bins[idx].ravel()
        hg = np.bincount(
            fb, weights=np.repeat(grad[idx], n_feat), minlength=total_bins
        )
        hh = np.bincount(
            fb, weights=np.repeat(h_all[idx], n_feat), minlength=total_bins
        )
        return hg, hh

    def grow(
        idx: np.ndarray,
        grad: np.ndarray,
        d: int,
        hist_g: np.ndarray,
        hist_h: np.ndarray,
    ) -> TreeNode:
        g_node = float(grad[idx].sum())
        h_node = float(h_all[idx].sum())
        leaf_w = -g_node / (h_node + lam)
        if d == 0:
            return TreeNode.leaf(leaf_w)
        parent = g_node * g_node / (h_node + lam)
        # all features at once: prefix sums along the padded bin axis,
        # then one element-wise gain matrix — same per-candidate doubles
        # as the scalar loop, first-occurrence argmax in row-major
        # (feature, then bin) order keeps its tie rule
        cum_g = np.cumsum(hist_g[gather], axis=1)[:, :-1]
        cum_h = np.cumsum(hist_h[gather], axis=1)[:, :-1]
        h_r = h_node - cum_h
        valid = cand_real & (cum_h >= 1.0) & (h_r >= 1.0)  # min_child_weight=1
        if not valid.any():
            return TreeNode.leaf(leaf_w)
        g_r = g_node - cum_g
        with np.errstate(invalid="ignore", divide="ignore"):
            gain = (
                0.5
                * (
                    cum_g * cum_g / (cum_h + lam)
                    + g_r * g_r / (h_r + lam)
                    - parent
                )
                - gamma
            )
        gain = np.where(valid, gain, -np.inf)
        flat_best = int(np.argmax(gain))
        fi, k = divmod(flat_best, max_nb - 1)
        k += 1
        if float(gain[fi, k - 1]) <= 0.0:
            return TreeNode.leaf(leaf_w)
        lmask = bins[idx, fi] < k
        lidx, ridx = idx[lmask], idx[~lmask]
        # histogram subtraction: bincount only the smaller child, the
        # sibling is parent − child (deterministic either engine — both
        # run this identical code)
        if len(lidx) <= len(ridx):
            lhg, lhh = node_hists(lidx, grad)
            rhg, rhh = hist_g - lhg, hist_h - lhh
        else:
            rhg, rhh = node_hists(ridx, grad)
            lhg, lhh = hist_g - rhg, hist_h - rhh
        return TreeNode(
            fi,
            edges[fi][k - 1],
            grow(lidx, grad, d - 1, lhg, lhh),
            grow(ridx, grad, d - 1, rhg, rhh),
            0.0,
        )

    def apply(node: TreeNode, idx: np.ndarray, out: np.ndarray) -> None:
        if node.is_leaf:
            out[idx] = node.value
            return
        k = edges[node.feat].index(node.edge) + 1
        lmask = bins[idx, node.feat] < k
        apply(node.left, idx[lmask], out)
        apply(node.right, idx[~lmask], out)

    all_idx = np.arange(n_groups)
    for _ in range(n_rounds):
        grad = h_all * pred - y_sum  # Σ per-row (pred − y) within group
        root_hg, root_hh = node_hists(all_idx, grad)
        tree = grow(all_idx, grad, depth, root_hg, root_hh)
        trees.append(tree)
        contrib = np.zeros(n_groups)
        apply(tree, all_idx, contrib)
        pred = pred + eta * contrib
    return trees


def hist_gbt_case_sql(
    trees: list[TreeNode],
    feat_names: list[str],
    eta: float = XGB_ETA,
    base: float = XGB_BASE,
) -> str:
    """Scoring expression both engines evaluate verbatim: base + Σ
    nested CASE trees, leaf literals repr()'d (shortest round-trip)
    with eta folded in driver-side, every literal CAST AS DOUBLE."""

    def node_sql(n: TreeNode) -> str:
        if n.is_leaf:
            return f"CAST('{eta * n.value!r}' AS DOUBLE)"
        return (
            f"CASE WHEN {feat_names[n.feat]} < CAST('{n.edge!r}' AS DOUBLE)"
            f" THEN {node_sql(n.left)} ELSE {node_sql(n.right)} END"
        )

    terms = [f"CAST('{base!r}' AS DOUBLE)"] + [node_sql(t) for t in trees]
    return " + ".join(terms)


def fit_hist_gbt_sketch(
    run_sql,
    features: list[str],
    target: str,
    frame: str = "xgb_frame",
    n_bins: int = HIST_BINS,
    **fit_kw,
) -> list[TreeNode]:
    """Engine-agnostic fit: `run_sql(sql) -> list[tuple]` executes
    against a view/table named `frame`. Two queries total (min/max,
    then the sketch); everything after is driver-side numpy on exact
    integers, so Spark and DuckDB land on the identical model."""
    mm_sql = "SELECT " + ", ".join(
        f"min({f}), max({f})" for f in features
    ) + f" FROM {frame}"
    mm = run_sql(mm_sql)[0]
    edges = [
        uniform_edges(mm[2 * i], mm[2 * i + 1], n_bins)
        for i in range(len(features))
    ]
    rows = sorted(tuple(r) for r in run_sql(sketch_sql(frame, features, edges, target)))
    nf = len(features)
    bins = np.array([r[:nf] for r in rows], dtype=np.int64)
    y_micro = np.array([r[nf] for r in rows], dtype=np.int64)
    cnt = np.array([r[nf + 1] for r in rows], dtype=np.int64)
    return fit_hist_gbt(bins, y_micro, cnt, edges, **fit_kw)


def fit_hist_gbt_from_engine(
    run_sql,
    features: list[str],
    target: str,
    frame: str = "xgb_frame",
    n_bins: int = HIST_BINS,
    **fit_kw,
) -> str:
    """Sketch-fit (fit_hist_gbt_sketch) straight to the CASE-chain
    scoring SQL — identical text from either engine's statistics."""
    trees = fit_hist_gbt_sketch(
        run_sql, features, target, frame=frame, n_bins=n_bins, **fit_kw
    )
    return hist_gbt_case_sql(
        trees,
        features,
        eta=fit_kw.get("eta", XGB_ETA),
        base=fit_kw.get("base", XGB_BASE),
    )


def predict_hist_gbt(
    trees: list[TreeNode],
    features: list[np.ndarray],
    eta: float = XGB_ETA,
    base: float = XGB_BASE,
) -> np.ndarray:
    """Numpy twin of hist_gbt_case_sql: same raw-value comparisons
    (x < edge), same eta·leaf doubles, same round-order accumulation
    from base — bitwise equal to the SQL scorer."""
    xs = [np.asarray(f, dtype=np.float64) for f in features]
    n = len(xs[0])

    def apply(node: TreeNode, mask: np.ndarray, out: np.ndarray) -> None:
        if node.is_leaf:
            out[mask] = eta * node.value
            return
        left = mask & (xs[node.feat] < node.edge)
        apply(node.left, left, out)
        apply(node.right, mask & ~left, out)

    pred = np.full(n, float(base))
    for t in trees:
        contrib = np.zeros(n)
        apply(t, np.ones(n, dtype=bool), contrib)
        pred = pred + contrib
    return pred


def hist_gbt_predict_udf(
    spark: SparkSession,
    trees: list[TreeNode],
    eta: float = XGB_ETA,
    base: float = XGB_BASE,
):
    """Broadcast-model Arrow-batched scorer over the hist trees — the
    §2.11 UDF harness an xgboost Booster drops into unchanged."""
    bc = spark.sparkContext.broadcast((trees, eta, base))

    @pandas_udf("double")
    def score(*cols: pd.Series) -> pd.Series:
        ts, e, b = bc.value
        feats = [c.to_numpy(dtype=np.float64) for c in cols]
        return pd.Series(predict_hist_gbt(ts, feats, eta=e, base=b))

    return score


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

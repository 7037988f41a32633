"""Property-based tests (hypothesis) for the operators whose
correctness is a mathematical invariant rather than a fixture value —
the §5.2 complement to golden pins and oracle hashes."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from ibf_typhoon_data_pipeline_spark.operators.windfield import _holland_np

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)


@settings(max_examples=200, deadline=None)
@given(
    r_km=st.floats(min_value=0.0, max_value=2000.0),
    rmw=st.floats(min_value=5.0, max_value=100.0),
    b_s=st.floats(min_value=1.0, max_value=2.5),
    pcen=st.floats(min_value=880.0, max_value=1005.0),
    lat=st.floats(min_value=-60.0, max_value=60.0),
    vt=st.floats(min_value=0.0, max_value=15.4),
)
def test_holland_wind_physical_bounds(r_km, rmw, b_s, pcen, lat, vt):
    import numpy as np

    v = _holland_np(
        np.array([r_km]), rmw, b_s, 1006.0, pcen, lat, vt
    )[0]
    # non-negative, finite, and bounded by the theoretical max
    # (sqrt(b/ρ·Δp·e⁰) at the eyewall) plus the translation component
    assert v >= 0.0
    assert math.isfinite(v)
    vmax_theory = math.sqrt(b_s / 1.15 * max(1006.0 - pcen, 1.0) * 100.0) + vt
    assert v <= vmax_theory + 1e-9


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.one_of(st.none(), st.floats(min_value=-50, max_value=50, allow_nan=False)),
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_lerp_fill_invariants(points):
    """Pure-python twin of operators/interpolation._lerp_fill semantics:
    interior gaps bounded by bracket values; leading gaps stay None;
    trailing gaps forward-fill. (The Spark impl is oracle-checked
    value-for-value in f15; this pins the SEMANTICS independently.)"""
    pts = sorted(points)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]

    def lerp_fill(xs, ys):
        out = []
        for i, (x, y) in enumerate(zip(xs, ys)):
            if y is not None:
                out.append(y)
                continue
            prev = next(
                ((xs[j], ys[j]) for j in range(i - 1, -1, -1) if ys[j] is not None),
                None,
            )
            nxt = next(
                ((xs[j], ys[j]) for j in range(i + 1, len(xs)) if ys[j] is not None),
                None,
            )
            if prev and nxt and nxt[0] != prev[0]:
                v0, t0 = prev[1], prev[0]
                v1, t1 = nxt[1], nxt[0]
                out.append(v0 + (v1 - v0) * (x - t0) / (t1 - t0))
            elif prev:
                out.append(prev[1])
            else:
                out.append(None)
        return out

    filled = lerp_fill(xs, ys)
    for i, v in enumerate(filled):
        if ys[i] is not None:
            assert v == ys[i]  # knots untouched
        elif v is not None:
            known = [y for y in ys if y is not None]
            assert min(known) - 1e-9 <= v <= max(known) + 1e-9  # bounded
    # leading gap stays None iff no earlier knot
    first_known = next((i for i, y in enumerate(ys) if y is not None), None)
    if first_known is not None:
        for i in range(first_known):
            assert filled[i] is None


@given(
    st.lists(
        st.tuples(st.integers(0, 51), st.booleans()),
        min_size=2,
        max_size=60,
    ).filter(
        lambda xs: any(o for _, o in xs) and any(not o for _, o in xs)
    )
)
def test_auc_midrank_identity(rows):
    """The tc_trigger_auc midrank formula must equal the naive
    pairwise AUC  (wins + ties/2) / (n1*n0)  for ANY tied/untied
    probability multiset — the identity the entry's exactness claims
    rest on."""
    from collections import Counter

    # midrank form exactly as the plan computes it
    grp = Counter()
    grp1 = Counter()
    for p, o in rows:
        grp[p] += 1
        grp1[p] += int(o)
    u2 = 0
    below = 0
    for p in sorted(grp):
        u2 += grp1[p] * (2 * below + grp[p] + 1)
        below += grp[p]
    n1 = sum(grp1.values())
    n0 = sum(grp.values()) - n1
    auc_midrank = (u2 - n1 * (n1 + 1)) / (2.0 * n1 * n0)

    # naive pairwise definition
    pos = [p for p, o in rows if o]
    neg = [p for p, o in rows if not o]
    wins = sum(1 for a in pos for b in neg if a > b)
    ties = sum(1 for a in pos for b in neg if a == b)
    auc_naive = (wins + 0.5 * ties) / (n1 * n0)
    assert abs(auc_midrank - auc_naive) < 1e-12


@given(
    st.lists(st.integers(min_value=-10**6, max_value=10**6),
             min_size=1, max_size=60)
)
def test_crps_pairwise_sorted_rank_identity(xs):
    """The tc_crps_ensemble rewrite rests on
    sum_{i,j} |x_i - x_j| = 2 * sum_k (2k - n - 1) * x_(k)
    (k = 1-based rank in ascending order) for ANY integer multiset —
    including ties, where row_number's arbitrary-but-total tie order
    must not change the sum."""
    n = len(xs)
    naive = sum(abs(a - b) for a in xs for b in xs)
    ranked = sum(
        (2 * k - n - 1) * x for k, x in enumerate(sorted(xs), start=1)
    )
    assert naive == 2 * ranked


@given(st.integers(min_value=1, max_value=400))
def test_w5_ntile_bucket_formula(n):
    """The w5 integer ntile formula must reproduce SQL-standard
    ntile(5) for any n: first n%5 buckets hold ceil(n/5) rows, the
    rest floor(n/5), assigned in row-number order."""
    k = 5
    q, r = divmod(n, k)
    # naive assignment from bucket sizes
    sizes = [q + 1] * r + [q] * (k - r)
    naive = []
    for b, sz in enumerate(sizes, start=1):
        naive.extend([b] * sz)
    # the plan's closed form
    for rn in range(1, n + 1):
        if rn <= r * (q + 1):
            got = (rn + q) // (q + 1)
        else:
            got = r + (rn - r * (q + 1) + q - 1) // q
        assert got == naive[rn - 1], (n, rn)


@given(
    st.lists(st.integers(min_value=-10**9, max_value=10**9),
             min_size=1, max_size=80)
)
def test_cusum_clamped_recursion_identity(devs):
    """events_cusum_changepoint rests on: the clamped recursion
    s_k = max(0, s_{k-1} + d_k), s_0 = 0 equals
    c_k - min(0, min_{j<=k} c_j) where c is the plain cumulative sum
    of the deviations — two ordered windows instead of a sequential
    scan. Must hold for ANY integer deviation sequence."""
    s = 0
    c = 0
    cmin = 0
    for d in devs:
        s = max(0, s + d)
        c += d
        cmin = min(cmin, c)
        assert s == c - min(0, cmin)


@given(st.integers(min_value=0, max_value=100_000))
def test_business_day_prefix_count_closed_form(s):
    """f22_business_days rests on the weekday prefix count
    f(s) = 5*(s div 7) + min(s%7 + 1, 5) on Monday-anchored day
    indices (t%7 in 0..4 is Mon..Fri): f(s) must equal the brute
    count of weekdays among t = 0..s inclusive."""
    brute = sum(1 for t in range(s % 7 + 1) if t % 7 <= 4) + 5 * (s // 7)
    closed = 5 * (s // 7) + min(s % 7 + 1, 5)
    assert closed == brute
    # and against the fully naive definition for small s
    if s <= 800:
        assert closed == sum(1 for t in range(s + 1) if t % 7 <= 4)


@given(
    st.integers(min_value=-10**11, max_value=10**11),
    st.integers(min_value=1, max_value=10**6),
)
def test_offset_rounding_division_identity(S, n):
    """The negative-numerator rounding-division trick
    (2*(S + n*OFF) + n) div (2*n) - OFF (OFF = 10^12) rests on the
    numerator being positive, where Spark's truncating div and
    DuckDB's flooring // agree, and the result equals round-half-up
    S/n for ANY sign of S."""
    OFF = 10**12
    num = 2 * (S + n * OFF) + n
    den = 2 * n
    assert num > 0  # the offset's whole point
    # Spark's div truncates toward zero; emulate in exact arithmetic
    trunc_div = abs(num) // den * (1 if num >= 0 else -1)
    floor_div = num // den
    assert trunc_div == floor_div  # positive numerator: trunc == floor
    got = floor_div - OFF
    # round-half-up reference: floor(S/n + 1/2) in exact arithmetic
    want = (2 * S + n) // (2 * n)
    assert got == want

"""No forced broadcast of fact-derived OR SF-scaling-base-table frames
(VERDICT r6 item on orders_item_cf_topk, extended catalog-wide in
round 7; extended to base loads in round 8 per VERDICT r7 item 1).

An explicit F.broadcast hint OVERRIDES AQE's runtime size check, so a
frame whose cardinality grows with the data (per-user / per-item /
per-doc aggregates of a fact table, or a load of an SF-scaling base
table like customer/supplier/part) OOMs the driver at 100 TB instead
of degrading to a shuffle join. This static sweep resolves every
F.broadcast(var) site's definition (two alias hops) and flags frames
built by a groupBy over an unbounded fact key or loaded from an
SF-scaling table. Flagged sites must be in the allowlist below with a
bounded-by-construction justification — new unlisted sites fail.
"""

import glob
import os
import re

PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ibf_typhoon_data_pipeline_spark",
)

# keys whose domain scales with the fact data. tok/term/gram vocab
# keys are Heaps-growing with the corpus (round 8) — a "small" vocab
# at bench SF is 10^8+ entries on a real 100 TB corpus.
_UNBOUNDED = re.compile(
    r'groupBy\(\s*(?:F\.col\()?"'
    r"(user_id|l_partkey|o_custkey|l_suppkey|doc_id|node|emb_id|"
    r"c_custkey|ps_partkey|ps_suppkey|event_id|tok|term|gram)"
)

# base tables that scale linearly with SF (TESTDATA: customer
# 1,500->15,000, supplier 100->1,000, part 2,000->20,000 between
# sf0.01 and sf0.1) — NOT the bounded <=50k dims SCALING.md's
# broadcast rule covers. A forced hint on a frame loaded from one of
# these OOMs the driver at 100 TB instead of degrading to a shuffle
# join (VERDICT r7 item 1). nation/region stay broadcastable: fixed
# 25/5 rows at every SF.
_SCALING_LOAD = re.compile(
    r'load_table\([^)]*"(customer|supplier|part|orders|lineitem|'
    r'documents|embeddings|events)"'
)

# (file, broadcast var) -> why the frame is bounded anyway
ALLOWLIST = {
    # segment-migration thresholds: a groupBy("half_id") second
    # reduction over the customer counts — 2 rows by construction
    ("relational_ext.py", "th"): "2-row per-half threshold frame",
    # j19: distinct of (custkey % 10 | NULL) — <= 11 rows at any SF
    ("relational_ext.py", "b"): "<=11-row bucket domain (mod-10 + NULL)",
    # two bounded query frames share this key: hybrid RRF's single
    # query vector (vec_id = 0 filter, 1 row) and ml_knn_classify's
    # probe set (vec_id < _KNN_NQ constant cap)
    ("vectors.py", "q"): "bounded query frames (1-row / constant cap)",
    # binary-Hamming probe panel: vec_id % 50 == 0 AND vec_id < 10000
    # — hard-capped at <= 200 rows at ANY scale factor
    ("vectors.py", "queries"): "panel hard-capped at vec_id < 10000",
    # AMS F2: groupBy("term") collapses to a terminal 1-row global agg
    # (the chained .agg defeats the scalar exemption's regex)
    ("analytics.py", "exact"): "1-row exact-F2 scalar",
    # mixture sampling: per-LANGUAGE rate frame — the language domain
    # is bounded (~dozens), unlike the token vocabulary
    ("curation.py", "rates"): "per-language rates (bounded lang domain)",
    # whitening / chi-squared: per-DIMENSION frames — the embedding
    # dimensionality (64) is fixed at any corpus size
    ("vectors.py", "stats"): "64-row per-dimension stats",
    ("vectors.py", "g"): "64-row per-dimension scatter",
}


def _scan_lines(fname, lines, flagged):
    def defblock(var, upto):
        for j in range(upto, max(-1, upto - 80), -1):
            if re.match(rf"\s*{var}\s*=", lines[j]):
                # block = the assignment statement only: stop at
                # the next assignment/def line so a NEIGHBORING
                # load_table can't leak into this var's block
                end = min(j + 12, upto + 1)
                for k in range(j + 1, end):
                    if re.match(r"\s*(\w+\s*=[^=]|def |return )",
                                lines[k]):
                        end = k
                        break
                return j, "\n".join(lines[j:end])
        return None, ""

    def scaling(b):
        return _UNBOUNDED.search(b) or _SCALING_LOAD.search(b)

    for i, line in enumerate(lines):
        for m in re.finditer(r"F\.broadcast\((\w+)", line):
            var = m.group(1)
            j, block = defblock(var, i)
            if j is None:
                continue
            hit = scaling(block)
            # alias-hop chain (up to 3 hops): x = load_table(...);
            # y = x.filter(...); z = y.select(...); broadcast(z)
            # must still resolve to the load. `x.sparkSession.…` only
            # borrows x's session, it doesn't derive from x's data.
            hop_var, hop_j = var, j
            for _hop in range(3):
                if hit:
                    break
                m2 = re.search(
                    rf"\s*{hop_var}\s*=\s*(\w+)\.(?!sparkSession)",
                    lines[hop_j],
                )
                if not m2 or m2.group(1) in ("F", "spark"):
                    break
                hop_j2, block2 = defblock(m2.group(1), hop_j)
                if hop_j2 is None:
                    break
                hit = scaling(block2)
                hop_var, hop_j = m2.group(1), hop_j2
            if hit:
                # a global (non-groupBy) .agg over the frame is a
                # bounded scalar — only flag frames that keep an
                # unbounded key
                if ".agg(" in block and "groupBy" not in block:
                    continue
                flagged[(fname, var)] = f"{fname}:{i + 1}"


def _scan():
    flagged = {}
    for path in glob.glob(os.path.join(PLANS, "**", "*.py"), recursive=True):
        _scan_lines(os.path.basename(path), open(path).read().splitlines(),
                    flagged)
    return flagged


def test_no_forced_broadcast_of_fact_derived_frames():
    flagged = _scan()
    unexplained = {
        k: v for k, v in flagged.items() if k not in ALLOWLIST
    }
    assert not unexplained, (
        "forced broadcast of fact-derived (unbounded-key) or "
        "SF-scaling base-table frames — drop the hint and let AQE "
        "decide, or allowlist with a bounded-by-construction reason: "
        f"{unexplained}"
    )


def test_scan_still_sees_the_allowlisted_sites():
    # if the allowlisted sites disappear or move, prune the allowlist
    # so it can't mask a future regression elsewhere
    flagged = _scan()
    stale = [k for k in ALLOWLIST if k not in flagged]
    assert not stale, f"stale allowlist entries: {stale}"


def test_detector_fires_on_reintroduced_base_table_hint():
    """Negative self-test (VERDICT r7 item 1 'Done' criterion): the
    exact pattern this round removed — a forced broadcast of a
    customer/supplier/part load — must flag, through both the direct
    definition and one alias hop."""
    direct = [
        'cust = load_table(spark, sf_dir, "customer").select(',
        '    "c_custkey", "c_name"',
        ')',
        'out = fact.join(F.broadcast(cust), "c_custkey")',
    ]
    flagged = {}
    _scan_lines("synthetic.py", direct, flagged)
    assert ("synthetic.py", "cust") in flagged, flagged

    hop = [
        'supp = load_table(spark, sf_dir, "supplier")',
        'good = supp.filter(F.col("s_acctbal") > 0)',
        'out = fact.join(F.broadcast(good), "s_suppkey")',
    ]
    flagged = {}
    _scan_lines("synthetic.py", hop, flagged)
    assert ("synthetic.py", "good") in flagged, flagged

    # three-variable chain: must resolve through multiple hops
    chain = [
        'cust = load_table(spark, sf_dir, "customer")',
        'eu = cust.filter(F.col("c_nationkey") < 5)',
        'keys = eu.select("c_custkey")',
        'out = fact.join(F.broadcast(keys), "c_custkey")',
    ]
    flagged = {}
    _scan_lines("synthetic.py", chain, flagged)
    assert ("synthetic.py", "keys") in flagged, flagged

    # ...and must NOT flag the bounded dims
    ok = [
        'nation = load_table(spark, sf_dir, "nation")',
        'out = fact.join(F.broadcast(nation), "n_nationkey")',
    ]
    flagged = {}
    _scan_lines("synthetic.py", ok, flagged)
    assert not flagged, flagged

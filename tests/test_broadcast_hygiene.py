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

# (file, broadcast var) -> (why the frame is bounded anyway,
# must_match regex). The regex is checked against the RESOLVED
# definition chain of EVERY flagged site under the key, so a future
# frame that merely reuses an allowlisted variable name — but lacks
# the bounding construction — fails instead of hiding behind the name.
ALLOWLIST = {
    # segment-migration thresholds: a groupBy("half_id") second
    # reduction over the customer counts — 2 rows by construction
    ("relational_ext.py", "th"): (
        "2-row per-half threshold frame",
        r'groupBy\("half_id"\)',
    ),
    # j19: distinct of (custkey % 10 | NULL) — <= 11 rows at any SF
    ("relational_ext.py", "b"): (
        "<=11-row bucket domain (mod-10 + NULL)",
        r'select\("bucket"\)\.distinct\(\)',
    ),
    # two bounded query frames share this key: hybrid RRF's single
    # query vector (vec_id = 0 filter, 1 row) and ml_knn_classify's
    # probe set (vec_id < _KNN_NQ constant cap)
    ("vectors.py", "q"): (
        "bounded query frames (1-row / constant cap)",
        r'F\.col\("vec_id"\)\s*(==\s*0|<\s*_KNN_NQ)',
    ),
    # binary-Hamming probe panel: vec_id % 50 == 0 AND vec_id < 10000
    # — hard-capped at <= 200 rows at ANY scale factor
    ("vectors.py", "queries"): (
        "panel hard-capped at vec_id < 10000",
        r'F\.col\("vec_id"\)\s*<\s*10000',
    ),
    # AMS F2: groupBy("term") collapses to a terminal 1-row global agg
    # (the chained .agg defeats the scalar exemption's regex)
    ("analytics.py", "exact"): (
        "1-row exact-F2 scalar",
        r"sum\(f \* f\)",
    ),
    # mixture sampling: per-LANGUAGE rate frame — the language domain
    # is bounded (~dozens), unlike the token vocabulary
    ("curation.py", "rates"): (
        "per-language rates (bounded lang domain)",
        r'groupBy\("lang"\)',
    ),
    # capped-vocab LM: top-K induced vocabulary, limit(_LM_K) —
    # K rows at any corpus size (the documented bounded alternative
    # to text_lm_logprob's Heaps-growing frequency table)
    ("curation.py", "vocab"): (
        "top-K capped induced vocab (limit _LM_K)",
        r"\.limit\(_LM_K\)",
    ),
    # (its tot/oov broadcast scalars are global non-groupBy .agg
    # frames — covered by the scanner's bounded-scalar exemption)
    # whitening / chi-squared: per-DIMENSION frames — the embedding
    # dimensionality (64) is fixed at any corpus size
    ("vectors.py", "stats"): (
        "64-row per-dimension stats",
        r'groupBy\("(d|dim_idx)"\)',
    ),
    ("vectors.py", "g"): (
        "64-row per-dimension scatter",
        r'groupBy\("dim_idx"\)',
    ),
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
            chain = [block]
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
                chain.append(block2)
                hop_var, hop_j = m2.group(1), hop_j2
            if hit:
                # a global (non-groupBy) .agg over the frame is a
                # bounded scalar — only flag frames that keep an
                # unbounded key
                if ".agg(" in block and "groupBy" not in block:
                    continue
                flagged.setdefault((fname, var), []).append(
                    (f"{fname}:{i + 1}", "\n".join(chain))
                )


def _scan():
    flagged = {}
    for path in glob.glob(os.path.join(PLANS, "**", "*.py"), recursive=True):
        _scan_lines(os.path.basename(path), open(path).read().splitlines(),
                    flagged)
    return flagged


def test_no_forced_broadcast_of_fact_derived_frames():
    flagged = _scan()
    unexplained = {
        k: [loc for loc, _ in v]
        for k, v in flagged.items()
        if k not in ALLOWLIST
    }
    assert not unexplained, (
        "forced broadcast of fact-derived (unbounded-key) or "
        "SF-scaling base-table frames — drop the hint and let AQE "
        "decide, or allowlist with a bounded-by-construction reason: "
        f"{unexplained}"
    )
    # every flagged site under an allowlisted key must still carry
    # the bounding construction the allowlist reason describes —
    # reusing an allowlisted name does not exempt a new frame
    mismatched = {
        k: [loc for loc, chain in flagged[k]
            if not re.search(ALLOWLIST[k][1], chain)]
        for k in flagged
        if k in ALLOWLIST
    }
    mismatched = {k: v for k, v in mismatched.items() if v}
    assert not mismatched, (
        "allowlisted variable name reused by a frame WITHOUT the "
        "bounding construction its allowlist entry requires: "
        f"{mismatched}"
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


def test_allowlist_pattern_blocks_name_reuse():
    """An UNBOUNDED frame that merely reuses an allowlisted variable
    name must not inherit the exemption: its resolved chain lacks the
    bounding construction, so the must_match regex rejects it."""
    reuse = [
        'stats = docs.groupBy("doc_id").agg(F.count("*").alias("c"))',
        'out = fact.join(F.broadcast(stats), "doc_id")',
    ]
    flagged = {}
    _scan_lines("vectors.py", reuse, flagged)
    key = ("vectors.py", "stats")
    assert key in flagged, flagged
    _, chain = flagged[key][0]
    assert not re.search(ALLOWLIST[key][1], chain), (
        "must_match pattern wrongly accepts a doc_id-keyed frame"
    )

"""No forced broadcast of fact-derived frames (VERDICT r6 item on
orders_item_cf_topk, extended to the whole catalog in round 7).

An explicit F.broadcast hint OVERRIDES AQE's runtime size check, so a
frame whose cardinality grows with the data (per-user / per-item /
per-doc aggregates of a fact table) OOMs the driver at 100 TB instead
of degrading to a shuffle join. This static sweep resolves every
F.broadcast(var) site's definition (two alias hops) and flags frames
built by a groupBy over an unbounded fact key. Flagged sites must be
in the allowlist below with a bounded-by-construction justification —
new unlisted sites fail.
"""

import glob
import os
import re

PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ibf_typhoon_data_pipeline_spark",
)

# keys whose domain scales with the fact data
_UNBOUNDED = re.compile(
    r'groupBy\(\s*(?:F\.col\()?"'
    r"(user_id|l_partkey|o_custkey|l_suppkey|doc_id|node|emb_id|"
    r"c_custkey|ps_partkey|ps_suppkey|event_id)"
)

# (file, broadcast var) -> why the frame is bounded anyway
ALLOWLIST = {
    # count-min sketch: the broadcast frame is keyed (row, bucket) —
    # 4 x 1024 rows regardless of data volume; the nearby
    # groupBy("user_id") that trips the heuristic is the EXACT side,
    # which is not broadcast
    ("analytics.py", "sketch"): "4x1024-bounded (j, bucket) sketch",
    # segment-migration thresholds: a groupBy("half_id") second
    # reduction over the customer counts — 2 rows by construction
    ("relational_ext.py", "th"): "2-row per-half threshold frame",
}


def _scan():
    flagged = {}
    for path in glob.glob(os.path.join(PLANS, "**", "*.py"), recursive=True):
        lines = open(path).read().splitlines()
        fname = os.path.basename(path)

        def defblock(var, upto):
            for j in range(upto, max(-1, upto - 80), -1):
                if re.match(rf"\s*{var}\s*=", lines[j]):
                    return j, "\n".join(lines[j : min(j + 12, upto + 1)])
            return None, ""

        for i, line in enumerate(lines):
            for m in re.finditer(r"F\.broadcast\((\w+)", line):
                var = m.group(1)
                j, block = defblock(var, i)
                if j is None:
                    continue
                hit = _UNBOUNDED.search(block)
                if not hit:
                    m2 = re.search(rf"\s*{var}\s*=\s*(\w+)\.", lines[j])
                    if m2 and m2.group(1) not in ("F", "spark"):
                        j2, block2 = defblock(m2.group(1), j)
                        hit = (
                            _UNBOUNDED.search(block2)
                            if j2 is not None
                            else None
                        )
                if hit:
                    # a 1-row .agg( over the keyed frame is bounded:
                    # only flag frames that keep the unbounded key
                    if re.search(rf"{var}\s*=\s*\w+\.agg\(", lines[j]):
                        continue
                    flagged[(fname, var)] = f"{fname}:{i + 1}"
    return flagged


def test_no_forced_broadcast_of_fact_derived_frames():
    flagged = _scan()
    unexplained = {
        k: v for k, v in flagged.items() if k not in ALLOWLIST
    }
    assert not unexplained, (
        "forced broadcast of fact-derived (unbounded-key) frames — "
        "drop the hint and let AQE decide, or allowlist with a "
        f"bounded-by-construction reason: {unexplained}"
    )


def test_scan_still_sees_the_allowlisted_sites():
    # if the allowlisted sites disappear or move, prune the allowlist
    # so it can't mask a future regression elsewhere
    flagged = _scan()
    stale = [k for k in ALLOWLIST if k not in flagged]
    assert not stale, f"stale allowlist entries: {stale}"

"""Pins the driver-sampling order contract (VERDICT r6 item 1).

Tier (b) — never-driver-checked entries — must be FIFO by catalog age
so old backlog (TPC-H, sim_*, ml_*, emb_*) clears before each round's
newcomers. The age map `plans/_catalog_age.FIRST_ROUND` must cover
every registered entry, which forces future additions to stamp their
round.
"""

from ibf_typhoon_data_pipeline_spark import plans
from ibf_typhoon_data_pipeline_spark.plans import registry
from ibf_typhoon_data_pipeline_spark.plans._catalog_age import FIRST_ROUND


def test_age_map_complete():
    missing = set(plans.QUERIES) - set(FIRST_ROUND)
    assert not missing, (
        f"add these to plans/_catalog_age.py with the current round: "
        f"{sorted(missing)}"
    )


def test_age_map_no_orphans():
    orphans = set(FIRST_ROUND) - set(plans.QUERIES)
    assert not orphans, f"stale age-map entries: {sorted(orphans)}"


def test_tier_b_is_fifo_by_age():
    green, red = registry._driver_row_status()
    ordered = registry._ordered_names()
    assert sorted(ordered) == sorted(plans.QUERIES)
    tier_b = [n for n in ordered if n not in red and n not in green]
    ages = [FIRST_ROUND[n] for n in tier_b]
    assert ages == sorted(ages), (
        "never-driver-checked entries must be sampled oldest-first"
    )
    # red entries (if any) stay ahead of everything
    n_red = len([n for n in ordered if n in red])
    assert all(n in red for n in ordered[:n_red])


def test_no_backdated_registrations():
    """VERDICT r7 item 7: nothing stops a future entry claiming an
    old round to jump the FIFO. Guard: the age map as of the last
    COMPLETED round is frozen in tests/data/catalog_age_snapshot.json;
    a name not in the snapshot must carry the CURRENT round (max
    recorded CORRECTNESS round + 1), and snapshot names must keep
    their recorded round.

    VERDICT r10 item 1: the original form had a built-in
    chicken-and-egg — the driver lands CORRECTNESS_r{N}.json AFTER
    the round-N builder's final commit, flipping `current` to N+1 and
    failing the (correctly registered) round-N entries until the next
    round's snapshot chore. Fix: an un-snapshotted entry may also
    carry `current - 1` WHEN it has a green row in
    CORRECTNESS_r{current-1}.json — the driver itself witnessed the
    registration that round, so the age cannot be a backdate. This
    test can no longer be a round's only red purely because the round
    ended. Since round 11 entries are snapshotted AT REGISTRATION
    (freezing the round immediately is strictly stronger — it can
    never be rewritten later), so the `current-1` arm is a safety net
    for entries registered without the snapshot row, not a standing
    chore."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    with open(os.path.join(here, "data", "catalog_age_snapshot.json")) as f:
        snapshot = json.load(f)
    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    current = max(rounds) + 1
    last_path = os.path.join(root, f"CORRECTNESS_r{current - 1}.json")
    with open(last_path) as f:
        last_rows = json.load(f)
    # a witness is a GREEN row (ADVICE r11: rows_match alone would
    # admit a hash-mismatched row as proof of registration age — it
    # does prove the entry existed, but holding the witness to the
    # documented green criterion keeps the two notions aligned)
    driver_witnessed = {
        n
        for n, row in last_rows.items()
        if isinstance(row, dict)
        and row.get("rows_match")
        and row.get("hash_match")
        and row.get("schema_match", True)
    }

    rewritten, backdated = _age_violations(
        snapshot, FIRST_ROUND, current, driver_witnessed
    )
    assert not rewritten, (
        f"registration rounds rewritten vs snapshot: {rewritten}"
    )
    assert not backdated, (
        f"new entries must register with the current round {current} "
        f"(then be added to tests/data/catalog_age_snapshot.json when "
        f"the round completes): {backdated}"
    )


def _age_violations(snapshot, first_round, current, driver_witnessed):
    """Pure core of the backdating guard, unit-tested below."""
    rewritten = {
        n: (snapshot[n], first_round[n])
        for n in first_round
        if n in snapshot and first_round[n] != snapshot[n]
    }
    backdated = {
        n: first_round[n]
        for n in first_round
        if n not in snapshot
        and first_round[n] != current
        and not (first_round[n] == current - 1 and n in driver_witnessed)
    }
    return rewritten, backdated


def test_backdating_guard_survives_round_completion():
    """The VERDICT r10 done-criterion, simulated: after the driver
    lands CORRECTNESS_r{N}.json, `current` flips to N+1 — entries the
    round-N builder registered at N (and the driver hashed green that
    round) must STILL pass, while a genuine backdate (an old round
    with no driver witness) and a witnessed-but-older-than-N-1 claim
    must still fail."""
    snapshot = {"old_entry": 3}
    first_round = {
        "old_entry": 3,          # snapshotted, unchanged — fine
        "this_round": 11,        # landed in round 11, driver saw it
        "brand_new": 12,         # round-12 work in progress — fine
        "cheater": 4,            # claims round 4, never snapshotted
        "stale_claim": 10,       # witnessed, but 2 rounds back
    }
    witnessed = {"this_round", "stale_claim", "old_entry"}
    rewritten, backdated = _age_violations(
        snapshot, first_round, current=12, driver_witnessed=witnessed
    )
    assert not rewritten
    assert set(backdated) == {"cheater", "stale_claim"}
    # and a rewritten snapshot round is still caught
    rewritten, _ = _age_violations(
        {"old_entry": 2}, first_round, 12, witnessed
    )
    assert rewritten == {"old_entry": (2, 3)}


def test_tier_c_rotates_stalest_proof_first():
    """VERDICT r8 item 5: with coverage closed (tier b empty), the
    driver's ~50-entry sample must rotate through the catalog —
    proven-green entries are ordered by ASCENDING last-green driver
    round, so the entries whose proof is oldest re-validate first and
    every entry cycles back through the window within ~7 rounds. A
    regression to registration order would pin the same head forever
    and leave the tail unchecked indefinitely."""
    last_green, red = registry._green_last_rounds()
    ordered = registry._ordered_names()
    tier_c = [n for n in ordered if n in last_green]
    rounds = [last_green[n] for n in tier_c]
    assert rounds == sorted(rounds), (
        "green tier must be ordered stalest-proof-first"
    )
    # the head of the sample window must be strictly staler than the
    # tail whenever the catalog spans multiple green rounds
    if rounds and rounds[0] != rounds[-1]:
        assert rounds[0] < rounds[-1]


def test_backlog_heads_the_never_checked_tier():
    """The round-4 TPC-H/vector debt must outrank round-6 newcomers
    within tier (b) whenever both are still unchecked."""
    green, red = registry._driver_row_status()
    ordered = registry._ordered_names()
    tier_b = [n for n in ordered if n not in red and n not in green]
    pos = {n: i for i, n in enumerate(tier_b)}
    old = [n for n in tier_b if FIRST_ROUND[n] <= 4]
    new = [n for n in tier_b if FIRST_ROUND[n] >= 6]
    if old and new:
        assert max(pos[n] for n in old) < min(pos[n] for n in new)

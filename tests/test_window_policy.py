"""Driver-window rotation policy, pinned as code (r12 verdict item 6).

The driver's correctness gate checks the first DRIVER_WINDOW entries of
the registry each round. The rotation policy (stated in COVERAGE.md since
r11, enforced here since r13): the window is

    PLAN_CHANGED first (entries whose plan/behavior changed this round and
    therefore need a fresh driver check), then every remaining registered
    entry ordered by staleness — ascending round of its latest driver
    check in the committed CORRECTNESS_r*.json, never-checked entries
    first (round 0), alphabetical within a round — filled to DRIVER_WINDOW.

This test recomputes that expected window from the committed artifacts,
so editing PRIORITY out of policy (or forgetting to rotate after a new
CORRECTNESS file lands) fails CI with the computed expected window.
"""

from __future__ import annotations

import glob
import json
import os
import re

from gfe_db_spark.queries import DRIVER_WINDOW, PLAN_CHANGED, PRIORITY, all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_driver_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            for name in json.load(f):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_driver_window_follows_rotation_policy():
    registered = set(all_queries())
    latest = _latest_driver_round()

    assert set(PLAN_CHANGED) <= registered, (
        f"PLAN_CHANGED names not registered: {set(PLAN_CHANGED) - registered}"
    )

    lead = list(dict.fromkeys(PLAN_CHANGED))  # declared order, deduped
    rest = sorted(
        registered - set(lead),
        key=lambda n: (latest.get(n, 0), n),  # never-checked (0) first
    )
    expected = (lead + rest)[:DRIVER_WINDOW]

    actual = list(PRIORITY[:DRIVER_WINDOW])
    assert actual == expected, (
        "PRIORITY window violates the rotation policy.\n"
        f"expected (PLAN_CHANGED + stalest-first): {expected}\n"
        f"actual: {actual}\n"
        "If a new CORRECTNESS_r*.json landed, rotate the window; if a plan "
        "changed this round, list it in queries.PLAN_CHANGED."
    )


def test_plan_changed_covers_plan_dumps():
    """PLAN_CHANGED under-declaration guard (r13 verdict item 1).

    A committed `plans/rN/<query>_after.txt` is the round-N claim that
    <query>'s physical plan was rewritten. The driver's independent
    oracle only re-checks what sits inside the window, so every such
    rewrite must either already have a driver check from round N or
    later (CORRECTNESS_rM, M >= N — the driver runs after the round's
    session, against the rewritten code) or be declared in PLAN_CHANGED
    so it leads the next window. Derived from the dump directories, not
    from a hand-written list, so a round can no longer forget its own
    rewrites. Discipline this implies: every plan-changed entry —
    including transitive consumers of a changed shared operator — gets
    an `_after.txt` dump in the current round's plans/rN/."""
    registered = set(all_queries())
    correctness_rounds: dict[str, int] = _latest_driver_round()

    missing: list[str] = []
    for plans_dir in sorted(glob.glob(os.path.join(_REPO, "plans", "r*"))):
        m = re.match(r"r(\d+)$", os.path.basename(plans_dir))
        if not m:
            continue
        rnd = int(m.group(1))
        for path in glob.glob(os.path.join(plans_dir, "*_after.txt")):
            name = os.path.basename(path)[: -len("_after.txt")]
            if name not in registered:
                continue  # operator-level dumps (no registry entry)
            if correctness_rounds.get(name, 0) >= rnd:
                continue  # driver already re-checked the rewrite
            if name not in PLAN_CHANGED:
                missing.append(f"{name} (plans/r{rnd})")
    assert not missing, (
        "plan-dumped rewrites missing from queries.PLAN_CHANGED (the "
        f"driver would never re-check them): {sorted(missing)}"
    )


def test_priority_is_exactly_the_registry():
    """PRIORITY must list every registered entry exactly once — a
    half-listed PRIORITY would make the window ordering depend on module
    import order, which the rotation policy can't reason about."""
    registered = set(all_queries())
    assert len(PRIORITY) == len(set(PRIORITY)), "duplicate names in PRIORITY"
    assert set(PRIORITY) == registered, (
        f"PRIORITY/registry drift: only-in-PRIORITY={set(PRIORITY) - registered}, "
        f"unlisted={registered - set(PRIORITY)}"
    )

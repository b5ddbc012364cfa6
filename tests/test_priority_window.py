"""Keep the driver-correctness window honest, in-tree.

The round driver hashes only the FIRST 50 entries of ``queries()``
(the ``_PRIORITY`` list). Three invariants make the rotation
discipline mechanical instead of memory-resident:

1. ``_PRIORITY`` is exactly 50 names long (the driver cap) with no
   duplicates and every name registered.
2. Every registered query that has NEVER appeared in any committed
   ``CORRECTNESS_r*.json`` sits in ``_PRIORITY``'s head region — i.e.
   a new query cannot be registered without also being scheduled for
   driver verification next round.
3. **Max-staleness bound**: no registered query may go >= 4 rounds
   without a driver check unless it is scheduled in the upcoming
   window. "Rounds stale" is measured against the UPCOMING round
   (max committed round + 1), so the gate fails at build time of the
   round that would breach the bound — the r6 verdict's finding #2
   (a silently growing r3-era tail) can never recur.
"""

import glob
import json
import os

from chill_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_STALE_ROUNDS = 4


def _last_checked() -> tuple[dict[str, int], int]:
    """(query -> latest round it appeared in a CORRECTNESS artifact,
    latest committed round)."""
    last: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
            names = json.load(open(path))
        except (OSError, ValueError, IndexError):
            continue
        latest = max(latest, rnd)
        for q in names:
            last[q] = max(last.get(q, 0), rnd)
    return last, latest


def test_priority_is_exactly_the_driver_window():
    assert len(Q._PRIORITY) == 50, (
        f"_PRIORITY has {len(Q._PRIORITY)} entries; the driver hashes "
        "exactly 50 — trim or fill"
    )
    assert len(set(Q._PRIORITY)) == len(Q._PRIORITY), "duplicate names"
    missing = [n for n in Q._PRIORITY if n not in Q._REGISTRY]
    assert not missing, f"unregistered names in _PRIORITY: {missing}"


def test_never_driver_checked_queries_lead_the_window():
    checked, _ = _last_checked()
    if not checked:  # fresh clone without correctness artifacts
        return
    never = [n for n in Q._REGISTRY if n not in checked]
    window = Q._PRIORITY
    stragglers = [n for n in never if n not in set(window)]
    assert not stragglers, (
        "queries registered but never driver-checked and NOT scheduled "
        f"in _PRIORITY: {stragglers} — insert them at the head"
    )
    # and they must occupy the head region, not be buried behind
    # already-green rows (slack of 10 for interleaved same-round
    # additions landing in either order)
    head = set(window[: len(never) + 10])
    buried = [n for n in never if n not in head]
    assert not buried, (
        f"never-driver-checked queries buried deep in the window: {buried}"
    )


def test_no_query_exceeds_max_driver_staleness_unscheduled():
    """Any CORE query whose last driver check would be >=
    MAX_STALE_ROUNDS rounds old at the UPCOMING round must be in the
    window. This turns the rotation from memory discipline into a
    gate: skipping a rotation makes the suite red at the next round's
    build. ``_EXTENDED`` names are exempt — their standing gate is
    the full-inventory strict sweep (see
    test_extended_tier_invariants)."""
    last, latest = _last_checked()
    if not last:
        return
    upcoming = latest + 1
    window = set(Q._PRIORITY)
    overdue = [
        (n, upcoming - r)
        for n, r in sorted(last.items())
        if n in Q._REGISTRY
        and n not in Q._EXTENDED
        and upcoming - r >= MAX_STALE_ROUNDS
        and n not in window
    ]
    assert not overdue, (
        f"{len(overdue)} core queries are >= {MAX_STALE_ROUNDS} rounds "
        f"driver-stale and NOT scheduled in _PRIORITY: {overdue} — "
        "rotate them into the window"
    )


def test_extended_tier_invariants():
    """The strict-sweep-only tier (the r8 verdict's capacity policy)
    may only hold names that (a) are registered, (b) have a DuckDB
    oracle — the sweep is a weaker gate without one, (c) have been
    driver-green at least once — a query can never be BORN extended,
    and (d) do not waste a rotation slot by also sitting in the
    window."""
    checked, _ = _last_checked()
    assert not [n for n in Q._EXTENDED if n not in Q._REGISTRY], (
        "extended names must be registered"
    )
    no_oracle = [n for n in Q._EXTENDED if n not in Q.ORACLE_SQL]
    assert not no_oracle, (
        f"extended-tier queries without an oracle (sweep can't check "
        f"them): {no_oracle}"
    )
    if checked:
        never = [n for n in Q._EXTENDED if n not in checked]
        assert not never, (
            f"extended-tier queries never driver-checked: {never} — "
            "a query must earn at least one driver-green row before "
            "demotion"
        )
    in_window = sorted(Q._EXTENDED & set(Q._PRIORITY))
    assert not in_window, f"extended names wasting window slots: {in_window}"


def test_projected_next_round_window_has_headroom():
    """Capacity, not just correctness: assuming the current window
    goes green at the upcoming round, the round AFTER it must be able
    to cover its overdue core cohort with >= 10 slots to spare for
    new queries. This is the gate that fires at BUILD time of the
    round where the registry outgrows the rotation scheme, instead of
    discovering it as an unrotatable red suite one round later."""
    last, latest = _last_checked()
    if not last:
        return
    upcoming = latest + 1
    sim = dict(last)
    for n in Q._PRIORITY:
        sim[n] = upcoming  # the driver will (must) check the window
    overdue_next = [
        n
        for n in Q._REGISTRY
        if n not in Q._EXTENDED
        and (upcoming + 1) - sim.get(n, upcoming) >= MAX_STALE_ROUNDS
    ]
    headroom = 50 - len(overdue_next)
    assert headroom >= 10, (
        f"projected r{upcoming + 1} window holds {len(overdue_next)} "
        f"mandatory core rows (headroom {headroom} < 10) — demote "
        "geometry variants to _EXTENDED or pre-refresh more of the "
        "cohort this round"
    )

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
    """Any query whose last driver check would be >= MAX_STALE_ROUNDS
    rounds old at the UPCOMING round must be in the window. This turns
    the rotation from memory discipline into a gate: skipping a
    rotation makes the suite red at the next round's build."""
    last, latest = _last_checked()
    if not last:
        return
    upcoming = latest + 1
    window = set(Q._PRIORITY)
    overdue = [
        (n, upcoming - r)
        for n, r in sorted(last.items())
        if n in Q._REGISTRY
        and upcoming - r >= MAX_STALE_ROUNDS
        and n not in window
    ]
    assert not overdue, (
        f"{len(overdue)} queries are >= {MAX_STALE_ROUNDS} rounds "
        f"driver-stale and NOT scheduled in _PRIORITY: {overdue} — "
        "rotate them into the window"
    )

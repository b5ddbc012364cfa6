"""Keep the driver-correctness window honest, in-tree.

The round driver hashes only the FIRST 50 entries of ``queries()``
(the ``_PRIORITY`` list). Two invariants make the rotation
discipline mechanical instead of memory-resident:

1. ``_PRIORITY`` is exactly 50 names long (the driver cap) with no
   duplicates and every name registered.
2. Every registered query that has NEVER appeared in any committed
   ``CORRECTNESS_r*.json`` sits in ``_PRIORITY``'s head — i.e. a new
   query cannot be registered without also being scheduled for driver
   verification next round.
"""

import glob
import json
import os

from chill_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            seen.update(json.load(open(path)))
        except (OSError, ValueError):
            continue
    return seen


def test_priority_is_exactly_the_driver_window():
    assert len(Q._PRIORITY) == 50, (
        f"_PRIORITY has {len(Q._PRIORITY)} entries; the driver hashes "
        "exactly 50 — trim or fill"
    )
    assert len(set(Q._PRIORITY)) == len(Q._PRIORITY), "duplicate names"
    missing = [n for n in Q._PRIORITY if n not in Q._REGISTRY]
    assert not missing, f"unregistered names in _PRIORITY: {missing}"


def test_never_driver_checked_queries_lead_the_window():
    checked = _driver_checked()
    if not checked:  # fresh clone without correctness artifacts
        return
    never = [n for n in Q._REGISTRY if n not in checked]
    window = Q._PRIORITY
    head = set(window[: max(len(never), 1)])
    stragglers = [n for n in never if n not in set(window)]
    assert not stragglers, (
        "queries registered but never driver-checked and NOT scheduled "
        f"in _PRIORITY: {stragglers} — insert them at the head"
    )
    # and they must be in the head region, not buried behind
    # already-green rows (head = first len(never) slots, with slack
    # for interleaved same-round additions).
    buried = [n for n in never if window.index(n) >= len(never) + 10]
    assert not buried, (
        f"never-driver-checked queries buried deep in the window: {buried}"
    )

"""Store-health journal freshness as a JUnit suite (the r9 verdict's
order #7).

The streaming maintainers drop in-band ``_health/`` verdicts per
epoch (``storefs.write_health_event``) and the CLI ``--journal`` flag
prints them — but a verdict only a human reads is not a gate. This
module turns "newest epoch verdict + its age" into a sixth suite of
the reconciliation report (alongside the five TestReport.py suites,
``report/suites.py``), so a stale or rotting store fails CI:

- **no journal** — the maintainer stopped emitting (or never ran);
- **stale journal** — the store gained more than ``max_lag`` appended
  leaves since the newest verdict (age is measured against the
  verdict's own ``n_append_batches`` leaf count — in-band and
  replay-safe, no wallclock, and immune to the stores' mixed
  batch-id conventions: stream appends ascend from 0, manual appends
  descend from -2, bootstrap/build leaves are negative);
- **action verdict** — the newest verdict itself says act
  (``compact``/``rebuild`` true): the store is rotting and nobody
  compacted.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from ..llm_ops.storefs import StoreFS, latest_health_event, read_health_events
from ..operators.writers import BATCH_COL
from .junit import TestCase, TestReport, TestSuite

#: verdict keys whose truthiness means "the maintainer says act now"
ACTION_KEYS = ("compact", "rebuild")


def journal_freshness(
    spark: SparkSession,
    root: str,
    data_subdir: str = "grams",
    max_lag: int = 8,
) -> dict:
    """Freshness facts for one store: the newest ``_health/`` verdict
    vs the store's CURRENT appended-leaf count under ``data_subdir``
    ('grams' for substring stores, 'codes' for PQ stores). Leaf
    listing only — never a data scan.

    Age: the maintainers' verdict payloads record the store's
    ``n_append_batches`` at verdict time, so
    ``lag = appended leaves now - appended leaves then`` — exact
    regardless of batch-id convention. A hand-written event without
    that key falls back to ``max leaf id - verdict batch id`` (valid
    for stream-maintained stores, whose ids ascend). The appended-leaf
    predicate follows each family's own stats convention: PQ
    ('codes') counts ids >= 0 as appends (builds are negative),
    gram stores count everything but the -1 bootstrap."""
    events = read_health_events(root, spark=spark)
    # newest by WRITE TIME, not by batch id — manual-append stores
    # number batches downward, so the max-id event is their OLDEST
    newest = latest_health_event(root, spark=spark)
    fs = StoreFS(root, spark)
    pat = re.compile(rf"^{BATCH_COL}=(-?\d+)$")
    leaves = [
        int(m.group(1))
        for name in fs.list_dirs(f"{root}/{data_subdir}")
        if (m := pat.match(name))
    ]
    frontier = max(leaves) if leaves else None
    if data_subdir == "codes":
        n_append_now = sum(1 for b in leaves if b >= 0)
    else:
        n_append_now = sum(1 for b in leaves if b != -1)
    lag = None
    if newest is not None and newest.get("n_append_batches") is not None:
        lag = n_append_now - int(newest["n_append_batches"])
    elif newest is not None and frontier is not None:
        lag = frontier - int(newest.get("batch_id", 0))
    actions = [
        k for k in ACTION_KEYS if newest is not None and newest.get(k)
    ]
    return {
        "root": root,
        "n_events": len(events),
        "newest_batch": (
            int(newest["batch_id"]) if newest is not None else None
        ),
        "frontier_batch": frontier,
        "n_append_leaves": n_append_now,
        "lag": lag,
        "stale": lag is not None and lag > max_lag,
        "max_lag": max_lag,
        "actions": actions,
        "reasons": list((newest or {}).get("reasons", [])),
    }


def participating_health(
    spark: SparkSession, stores: dict[str, str], max_lag: int = 8
) -> dict[str, dict]:
    """``journal_freshness`` for every store this process touched
    (``storefs.participating_stores()``), keyed by the root's
    basename (full root on collision) — the auto-appended sixth-suite
    input for e2e (the r10 verdict's order #6: a CI run that used a
    persisted store must not need a separate ``reconcile
    --store-health`` invocation to gate it).

    Frozen-store exemption: a store with NO journal and NO appended
    leaves is healthy frozen model data (a benchmark gram index a
    scrub probed), not a maintainer that stopped emitting — flagged
    ``frozen`` so the report passes it with that annotation instead
    of failing the no-journal rule."""
    healths: dict[str, dict] = {}
    for root, subdir in sorted(stores.items()):
        # a store this process touched may be transient (a query's
        # tempdir store, already cleaned up) — gone is not rotting
        if not StoreFS(root, spark).is_dir(root):
            continue
        h = journal_freshness(spark, root, data_subdir=subdir,
                              max_lag=max_lag)
        if h["n_events"] == 0 and h["n_append_leaves"] == 0:
            h["frozen"] = True
        name = root.rstrip("/").rsplit("/", 1)[-1] or root
        healths[root if name in healths else name] = h
    return healths


def store_health_report(healths: dict[str, dict]) -> TestReport:
    """``{store name -> journal_freshness(...)}`` as a JUnit 'Store
    Health' suite — merge into the reconciliation report for one CI
    artifact (same pattern as the Expectations suite)."""
    suite = TestSuite(name="Store Health")
    for name, h in sorted(healths.items()):
        case = TestCase(name=name, classname="store_health")
        parts: list[str] = []
        if h["n_events"] == 0 and not h.get("frozen"):
            parts.append(
                f"no _health events at {h['root']} — the maintainer "
                "is not emitting (or never ran)"
            )
        if h["stale"]:
            parts.append(
                f"newest verdict is {h['lag']} batches behind the "
                f"store (verdict batch {h['newest_batch']}, "
                f"{h['n_append_leaves']} appended leaves now, "
                f"max_lag {h['max_lag']})"
            )
        if h["actions"]:
            parts.append(
                f"newest verdict says act ({', '.join(h['actions'])}): "
                + ("; ".join(h["reasons"]) or "no reasons recorded")
            )
        if parts:
            case.failure_message = "\n".join(parts)
        suite.add(case)
    rep = TestReport()
    rep.suites.append(suite)
    return rep

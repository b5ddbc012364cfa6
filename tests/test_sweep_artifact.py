"""Schema + coverage gate for the committed strict-sweep artifact.

The r10 verdict (What's missing #1): 40 extended-tier queries have no
driver rows going forward, so their standing correctness gate — the
full-inventory strict sweep — must be auditable from the repo without
re-running Spark. tests/strict_sweep.py --artifact writes
SWEEP_r{N}.json; this suite pins its schema and demands the LATEST
artifact cover the full registry clean at sf0.01 plus the sf0.1 sweep
minus only the two documented quadratic-oracle excludes.

These tests gate the ARTIFACT, not Spark: they re-fail the build if a
round forgets to re-run the sweeps on its final tree (a registered
query missing from the artifact) or commits a red sweep.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sf0.1 legitimately skips the two all-pairs verification replays
# whose oracles are deliberately quadratic (documented since r9)
SF01_ALLOWED_EXCLUDES = {"q_dedup_cc_keep_longest", "q_embedding_dedup_cc"}


def _latest_artifact() -> tuple[str, dict]:
    paths = glob.glob(os.path.join(ROOT, "SWEEP_r*.json"))
    assert paths, (
        "no SWEEP_r*.json committed — run both sweeps with --artifact:\n"
        "  python tests/strict_sweep.py /root/testdata/sf0.01 "
        "--artifact SWEEP_r{N}.json\n"
        "  python tests/strict_sweep.py /root/testdata/sf0.1 "
        "-q_dedup_cc_keep_longest -q_embedding_dedup_cc "
        "--artifact SWEEP_r{N}.json"
    )
    latest = max(paths, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    with open(latest) as f:
        return latest, json.load(f)


def test_sweep_artifact_schema():
    path, doc = _latest_artifact()
    assert doc.get("schema") == 1, path
    sweeps = doc.get("sweeps", {})
    assert set(sweeps) >= {"sf0.01", "sf0.1"}, (
        f"{path} must hold BOTH the sf0.01 and sf0.1 sections; "
        f"has {sorted(sweeps)}"
    )
    for sf, sec in sweeps.items():
        for key in ("sf_dir", "filters", "swept", "problematic", "queries"):
            assert key in sec, (path, sf, key)
        assert sec["swept"] == len(sec["queries"]), (path, sf)
        for name, row in sec["queries"].items():
            assert row["status"] in {"OK", "MISMATCH", "ERROR", "NO_ORACLE"}, (
                path, sf, name, row
            )
            if row["status"] == "OK":
                assert "spark_s" in row and "oracle_s" in row and "rows" in row


def test_sweep_artifact_is_green_and_covers_registry():
    """The committed record must show 0 problematic, cover every
    registered query at sf0.01 (so a round that adds queries and
    forgets to re-sweep its final tree goes red), and cover everything
    but the two documented quadratic excludes at sf0.1."""
    from chill_spark import queries as Q

    path, doc = _latest_artifact()
    registry = set(Q._REGISTRY)

    full = doc["sweeps"]["sf0.01"]
    assert full["problematic"] == 0, (path, "sf0.01 sweep is red")
    missing = registry - set(full["queries"])
    assert not missing, (
        f"{path} sf0.01 section misses registered queries (re-run the "
        f"sweep on the final tree): {sorted(missing)[:10]}"
    )

    big = doc["sweeps"]["sf0.1"]
    assert big["problematic"] == 0, (path, "sf0.1 sweep is red")
    excluded = registry - set(big["queries"])
    assert excluded <= SF01_ALLOWED_EXCLUDES, (
        f"{path} sf0.1 section may exclude only the documented "
        f"quadratic-oracle replays; also missing: "
        f"{sorted(excluded - SF01_ALLOWED_EXCLUDES)[:10]}"
    )


def test_sweep_artifact_covers_extended_tier():
    """The artifact is the extended tier's ONLY standing evidence —
    every _EXTENDED query must be present and OK at sf0.01."""
    from chill_spark import queries as Q

    path, doc = _latest_artifact()
    qrows = doc["sweeps"]["sf0.01"]["queries"]
    bad = {
        n: qrows.get(n, {"status": "ABSENT"})["status"]
        for n in Q._EXTENDED
        if qrows.get(n, {}).get("status") != "OK"
    }
    assert not bad, (path, bad)


def test_sweep_artifact_rejects_stale_round():
    """The artifact must be from the CURRENT round (>= the newest
    CORRECTNESS_r*.json round): an old green sweep says nothing about
    this round's tree."""
    corr = glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    if not corr:
        pytest.skip("no driver correctness artifacts yet")
    latest_corr = max(
        int(re.search(r"r(\d+)", p).group(1)) for p in corr
    )
    path, _ = _latest_artifact()
    sweep_round = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
    assert sweep_round >= latest_corr + 1, (
        f"{path} is from r{sweep_round} but the newest driver record is "
        f"r{latest_corr}, making the CURRENT round r{latest_corr + 1} — "
        f"this alarm (like the rotation gate) goes green once the round "
        f"re-runs both sweeps with --artifact SWEEP_r{latest_corr + 1}.json"
    )

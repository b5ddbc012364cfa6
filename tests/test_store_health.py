"""Store-health journal freshness as a CI gate (report/store_health.py):
a stale or rotting store must FAIL the reconciliation report, not just
print from the --journal CLI."""

from __future__ import annotations

import os

from chill_spark.llm_ops.storefs import write_health_event
from chill_spark.report.store_health import (
    journal_freshness,
    store_health_report,
)


def _leaf(root: str, batch: int, subdir: str = "grams") -> None:
    os.makedirs(os.path.join(root, subdir, f"BATCH_PART={batch}"),
                exist_ok=True)


def test_fresh_healthy_store_passes(spark, tmp_path):
    root = str(tmp_path / "store")
    _leaf(root, 0)
    _leaf(root, 3)
    write_health_event(root, 3, {"compact": False, "reasons": []},
                       spark=spark)
    h = journal_freshness(spark, root, max_lag=8)
    assert h["newest_batch"] == 3 and h["frontier_batch"] == 3
    assert h["lag"] == 0 and not h["stale"] and not h["actions"]
    rep = store_health_report({"grams": h})
    assert rep.passed
    assert "Store Health" in rep.to_xml()


def test_drifted_store_fails_stale(spark, tmp_path):
    """The drifted store: the maintainer journaled at batch 1, then 10
    more batches appended with no verdict — the newest verdict's age
    exceeds max_lag, so the suite row fails with the lag spelled
    out."""
    root = str(tmp_path / "store")
    for b in (0, 1, 11):
        _leaf(root, b)
    write_health_event(root, 1, {"compact": False, "reasons": []},
                       spark=spark)
    h = journal_freshness(spark, root, max_lag=8)
    assert h["lag"] == 10 and h["stale"]
    rep = store_health_report({"grams": h})
    assert not rep.passed
    assert "10 batches behind" in rep.to_xml()


def test_action_verdict_fails_even_when_fresh(spark, tmp_path):
    root = str(tmp_path / "store")
    _leaf(root, 5)
    write_health_event(
        root, 5,
        {"compact": True, "reasons": ["appended_fraction 0.7 > 0.5"]},
        spark=spark,
    )
    h = journal_freshness(spark, root, max_lag=8)
    assert h["actions"] == ["compact"] and not h["stale"]
    rep = store_health_report({"grams": h})
    assert not rep.passed
    assert "appended_fraction 0.7" in rep.to_xml()


def test_missing_journal_fails(spark, tmp_path):
    root = str(tmp_path / "store")
    _leaf(root, 2)
    h = journal_freshness(spark, root, max_lag=8)
    assert h["n_events"] == 0 and h["newest_batch"] is None
    rep = store_health_report({"grams": h})
    assert not rep.passed
    assert "not emitting" in rep.to_xml()


def test_pq_subdir_and_rebuild_key(spark, tmp_path):
    """PQ stores journal rebuild decisions under codes/ — the subdir
    and the 'rebuild' action key both route."""
    root = str(tmp_path / "pq")
    _leaf(root, 4, subdir="codes")
    write_health_event(root, 4, {"rebuild": True, "reasons": ["recall"]},
                       spark=spark)
    h = journal_freshness(spark, root, data_subdir="codes", max_lag=8)
    assert h["frontier_batch"] == 4 and h["actions"] == ["rebuild"]
    assert not store_health_report({"pq": h}).passed


def test_real_substring_store_end_to_end(spark, tmp_path):
    """Integration: a real gram store whose maintainer journaled at
    the frontier passes; after appends with no new verdict and
    max_lag=0 it goes stale."""
    from chill_spark.llm_ops.incremental_substring import (
        substring_store_append,
        substring_store_compact_decision,
        write_substring_store,
    )

    root = str(tmp_path / "store")
    d1 = spark.createDataFrame([(0, "a b c d e f g h")], ["doc_id", "text"])
    d2 = spark.createDataFrame([(1, "i j k l m n o p")], ["doc_id", "text"])
    write_substring_store(d1, "text", "doc_id", root, L=4)
    b = substring_store_append(d2, "text", "doc_id", root)
    write_health_event(
        root, b, substring_store_compact_decision(spark, root), spark=spark,
    )
    h = journal_freshness(spark, root, max_lag=0)
    assert h["lag"] == 0 and not h["stale"]
    b2 = substring_store_append(
        spark.createDataFrame([(2, "q r s t u v w x")], ["doc_id", "text"]),
        "text", "doc_id", root,
    )
    assert b2 < b  # manual appends descend — id distance would lie
    h2 = journal_freshness(spark, root, max_lag=0)
    assert h2["n_append_leaves"] == 2 and h2["lag"] == 1 and h2["stale"]


def test_manual_append_store_newest_by_write_time(spark, tmp_path):
    """Manual appends number batches DOWNWARD from -2, so the max-id
    event is the OLDEST verdict — newest must be selected by write
    time. A store journaled after every manual append stays fresh,
    and a superseded action flag on the max-id event must not
    resurrect."""
    import time

    from chill_spark.llm_ops.incremental_substring import (
        substring_store_append,
        substring_store_compact_decision,
        write_substring_store,
    )
    from chill_spark.llm_ops.storefs import latest_health_event

    root = str(tmp_path / "store")
    write_substring_store(
        spark.createDataFrame([(0, "a b c d e f g h")], ["doc_id", "text"]),
        "text", "doc_id", root, L=4,
    )
    b1 = substring_store_append(
        spark.createDataFrame([(1, "i j k l m n o p")], ["doc_id", "text"]),
        "text", "doc_id", root,
    )
    # oldest verdict (highest id, -2) carries a stale action flag
    write_health_event(root, b1, {"compact": True, "n_append_batches": 1,
                                  "reasons": ["stale"]}, spark=spark)
    time.sleep(0.05)
    b2 = substring_store_append(
        spark.createDataFrame([(2, "q r s t u v w x")], ["doc_id", "text"]),
        "text", "doc_id", root,
    )
    assert b2 < b1 < 0
    write_health_event(
        root, b2,
        substring_store_compact_decision(spark, root,
                                         max_appended_fraction=0.9),
        spark=spark,
    )
    assert latest_health_event(root, spark=spark)["batch_id"] == b2
    h = journal_freshness(spark, root, max_lag=0)
    assert h["newest_batch"] == b2
    assert h["lag"] == 0 and not h["stale"]
    assert not h["actions"], "superseded compact flag resurrected"
    assert store_health_report({"grams": h}).passed


def test_retention_prunes_manual_descending_journal(spark, tmp_path):
    """Retention is by write recency, so a manual-append journal
    (descending ids) still prunes — the id-horizon scheme never
    deleted anything there."""
    import time

    root = str(tmp_path / "store")
    _leaf(root, -1)
    for i, b in enumerate([-2, -3, -4, -5, -6]):
        if i:
            time.sleep(0.02)
        write_health_event(root, b, {"compact": False}, spark=spark,
                           keep_last=2)
    from chill_spark.llm_ops.storefs import read_health_events

    events = read_health_events(root, spark=spark)
    assert len(events) == 2
    assert {e["batch_id"] for e in events} == {-5, -6}


def test_same_mtime_tiebreak_uses_numeric_batch_id(spark, tmp_path):
    """r10 ADVICE: with equal mtimes (coarse filesystem clocks, fast
    availableNow batches) the recency tie-break must parse the batch
    id — raw-string comparison ranked 'batch-9' above 'batch-10' (and
    'batch--9' above 'batch--10'), so latest_health_event could return
    a superseded verdict and keep_last pruning could delete the newest
    event. Later = larger |id| in BOTH namespaces (stream ids ascend,
    manual ids descend)."""
    import json

    from chill_spark.llm_ops.storefs import (
        latest_health_event,
        read_health_events,
    )

    for ids, newest in [([9, 10], 10), ([-9, -10], -10)]:
        root = str(tmp_path / f"store_{ids[0]}")
        _leaf(root, -1)
        hdir = os.path.join(root, "_health")
        os.makedirs(hdir, exist_ok=True)
        for b in ids:
            with open(os.path.join(hdir, f"batch-{b}.json"), "w") as f:
                json.dump({"batch_id": b, "compact": b == newest}, f)
        # force IDENTICAL mtimes so only the tie-break decides
        stamp = 1_700_000_000
        for name in os.listdir(hdir):
            os.utime(os.path.join(hdir, name), (stamp, stamp))
        assert latest_health_event(root, spark=spark)["batch_id"] == newest
        # pruning to 1 must keep the later batch, not the string-max
        write_health_event(root, newest, {"compact": True}, spark=spark,
                           keep_last=1)
        kept = read_health_events(root, spark=spark)
        assert [e["batch_id"] for e in kept] == [newest]


def test_health_stride_stays_within_freshness_max_lag():
    """r11 review finding: the maintainers' heartbeat stride and the
    freshness gate's max_lag defaults must stay coupled — a stride of
    N means the store can be N-1 appended leaves past the newest
    verdict on a perfectly healthy stream, so max_lag defaults below
    N-1 would fail CI for roughly (N-1-max_lag)/N of steady state."""
    import inspect

    from chill_spark.report.store_health import (
        journal_freshness,
        participating_health,
    )
    from chill_spark.streaming.attribution_stream import (
        run_attribution_stream,
    )
    from chill_spark.streaming.dedup_stream import (
        run_dedup_stream,
        run_embedding_dedup_stream,
    )
    from chill_spark.streaming.pq_stream import run_pq_stream
    from chill_spark.streaming.substring_stream import run_substring_stream

    max_lags = {
        fn.__name__: inspect.signature(fn).parameters["max_lag"].default
        for fn in (journal_freshness, participating_health)
    }
    for fn in (run_dedup_stream, run_embedding_dedup_stream,
               run_pq_stream, run_substring_stream,
               run_attribution_stream):
        stride = inspect.signature(fn).parameters["health_every"].default
        for gate, max_lag in max_lags.items():
            assert stride - 1 <= max_lag, (
                f"{fn.__name__} health_every={stride} vs {gate} "
                f"max_lag={max_lag}: healthy streams would read stale"
            )

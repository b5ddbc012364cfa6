"""Exact-substring span dedup (llm_ops/substring.py): planted-corpus
semantics — span detection, keeper election, island merging, rewrite."""

from __future__ import annotations

import pytest

from chill_spark.llm_ops.substring import (
    duplicate_offsets,
    duplicate_spans,
    gram_offsets,
    remove_spans,
    substring_dedup_stats,
)

L = 4

#: w0..w9 are distinct filler tokens; "a b c d" is the planted dup.
DOCS = [
    # doc 0: canonical occurrence of "a b c d" (first in (id, off) order)
    (0, "w0 w1 a b c d w2 w3 w4 w5"),
    # doc 1: the same 4-gram later in the doc -> one removed span
    (1, "w0 w1 w2 w3 w4 a b c d w5"),
    # doc 2: holds "a b c d e"; its "a b c d" gram is a dup (keeper is
    # doc 0) but it is itself the KEEPER of "b c d e" (doc 2 < doc 3)
    (2, "w6 a b c d e w7 w8 w9 w0"),
    (3, "w1 w2 b c d e w3 w4 w5 w6"),
    # doc 4: exact copy of doc 0 -> every gram duplicated, whole doc one span
    (4, "w0 w1 a b c d w2 w3 w4 w5"),
    # doc 5: too short for any L-gram
    (5, "x y z"),
    # doc 6: non-keeper of BOTH overlapping grams "a b c d" (keeper
    # doc 0) and "b c d e" (keeper doc 2) -> islands merge to [3, 8)
    (6, "w7 w8 a b c d e w9 w0 w1"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_gram_offsets_counts_and_short_docs(docs):
    g = gram_offsets(docs, "text", "doc_id", L).toPandas()
    # 10-token docs emit 7 offsets each; the 3-token doc emits none
    assert sorted(g.groupby("doc_id").size().to_dict().items()) == [
        (0, 7), (1, 7), (2, 7), (3, 7), (4, 7), (6, 7),
    ]
    assert g["off"].min() == 1


def test_keeper_is_first_occurrence(docs):
    dup = duplicate_offsets(docs, "text", "doc_id", L).toPandas()
    # doc 0 holds the canonical "a b c d" (doc_id 0 < 1 < 4): doc 0's
    # offset 3 never appears as a duplicate, doc 1's offset 6 does
    assert (0, 3) not in set(zip(dup["doc_id"], dup["off"]))
    assert (1, 6) in set(zip(dup["doc_id"], dup["off"]))


def test_spans_merge_and_whole_doc_collapse(docs):
    spans = duplicate_spans(docs, "text", "doc_id", L)
    rows = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in spans.collect()
    }
    # doc 1: "a b c d" at tokens 6..9 -> span [6, 10)
    assert (1, 6, 10, 4) in rows
    # doc 2 only loses its "a b c d" gram: it is the keeper of
    # "b c d e", so the span stops at [2, 6)
    assert (2, 2, 6, 4) in rows
    # doc 3's "b c d e" is removed (keeper is doc 2)
    assert (3, 3, 7, 4) in rows
    # doc 4 (exact copy of doc 0): all 7 grams duplicated -> [1, 11)
    assert (4, 1, 11, 10) in rows
    # doc 6: non-keeper of two OVERLAPPING grams -> one merged span
    assert (6, 3, 8, 5) in rows
    # canonical doc 0 and the short doc 5 lose nothing
    assert not any(d in (0, 5) for d, *_ in rows)


def test_stats_cover_all_docs(docs):
    st = substring_dedup_stats(docs, "text", "doc_id", L).toPandas()
    st = st.set_index("doc_id").sort_index()
    assert len(st) == 7
    assert st.loc[0, "dup_tokens"] == 0 and st.loc[0, "n_spans"] == 0
    assert st.loc[4, "dup_tokens"] == 10
    assert st.loc[4, "dup_frac"] == 1.0
    assert st.loc[5, "total_tokens"] == 3 and st.loc[5, "dup_tokens"] == 0


def test_remove_spans_rewrite(docs):
    out = {
        r["doc_id"]: r["cleaned"]
        for r in remove_spans(docs, "text", "doc_id", L).collect()
    }
    assert out[0] == "w0 w1 a b c d w2 w3 w4 w5"  # canonical untouched
    assert out[1] == "w0 w1 w2 w3 w4 w5"
    # [2,6) removes "a b c d"; "e" survives (doc 2 keeps "b c d e")
    assert out[2] == "w6 e w7 w8 w9 w0"
    assert out[4] == ""  # fully duplicated doc collapses
    assert out[5] == "x y z"  # short doc untouched
    assert out[6] == "w7 w8 w9 w0 w1"  # merged overlapping span removed


def test_two_shuffle_plan_shape(docs):
    """The span plan must stay linear: exchanges only on fp (hash of
    the gram) and doc_id — no cartesian/broadcast-nested-loop, and
    NO window keyed by the fingerprint (a boilerplate gram repeated
    billions of times must collapse in a combiner-safe aggregate,
    never pin one window partition — AQE skew splitting does not
    apply to windows). The only windows allowed are the per-document
    island merge."""
    plan = duplicate_spans(docs, "text", "doc_id", L)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition(fp" not in plan
    assert "partial_min" in plan  # keeper election combines map-side


# ---------------------------------------------------------------------------
# incremental store (llm_ops/incremental_substring.py)
# ---------------------------------------------------------------------------

def _inc_mod(tmp_path):
    from chill_spark.llm_ops import incremental_substring as m
    return m, str(tmp_path / "store")


def test_incremental_history_wins_even_against_smaller_new_ids(spark, tmp_path):
    """A new doc whose gram is already in history is flagged even when
    its doc_id sorts BEFORE every historical id — arrival order, not
    id order, elects the keeper."""
    m, root = _inc_mod(tmp_path)
    hist = spark.createDataFrame(
        [(100, "w0 w1 a b c d w2 w3 w4 w5")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "w6 w7 a b c d w8 w9 w0 w1")], ["doc_id", "text"]
    )
    m.write_substring_store(hist, "text", "doc_id", root, L=4)
    spans = m.incremental_duplicate_spans(
        spark, root, new, "text", "doc_id"
    ).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in spans] == [
        (1, 3, 7)
    ]


def test_incremental_batch_local_keeper_for_store_misses(spark, tmp_path):
    """Grams unseen by history elect a batch-local keeper: the min
    (id, off) occurrence keeps, later ones are spans."""
    m, root = _inc_mod(tmp_path)
    hist = spark.createDataFrame(
        [(0, "h0 h1 h2 h3 h4 h5 h6 h7 h8 h9")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(3, "x0 x1 p q r s x2 x3 x4 x5"),
         (6, "x6 x7 x8 p q r s x9 x0 x1")],
        ["doc_id", "text"],
    )
    m.write_substring_store(hist, "text", "doc_id", root, L=4)
    spans = m.incremental_duplicate_spans(
        spark, root, new, "text", "doc_id"
    ).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in spans] == [
        (6, 4, 8)
    ]


def test_incremental_append_idempotent_and_compaction_folds(spark, tmp_path):
    from chill_spark.operators.writers import BATCH_COL

    m, root = _inc_mod(tmp_path)
    w1 = spark.createDataFrame([(0, "a b c d e f g h")], ["doc_id", "text"])
    w2 = spark.createDataFrame([(1, "i j k l m n o p")], ["doc_id", "text"])
    m.write_substring_store(w1, "text", "doc_id", root, L=4,
                            bucket_partitions=4)
    b = m.substring_store_append(w2, "text", "doc_id", root)
    n1 = m.read_substring_fps(spark, root).count()
    # replayed append (same batch id) rewrites its own leaf, no growth
    m.substring_store_append(w2, "text", "doc_id", root, batch_id=b)
    assert m.read_substring_fps(spark, root).count() == n1
    # compaction folds to the single bootstrap leaf, content unchanged
    m.compact_substring_store(spark, root)
    assert m.read_substring_fps(spark, root).count() == n1
    batches = (
        spark.read.parquet(f"{root}/grams")
        .select(BATCH_COL).distinct().collect()
    )
    assert [r[BATCH_COL] for r in batches] == [-1]


def test_incremental_probe_prunes_bucket_partitions(spark, tmp_path):
    """With a bucketed store the probe scan must carry planning-time
    PartitionFilters on BKT_PART, not filter a full read."""
    m, root = _inc_mod(tmp_path)
    hist = spark.createDataFrame(
        [(i, f"h{i} a b c d t{i} u{i} v{i} w{i} z{i}") for i in range(8)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(100, "q0 q1 a b c d q2 q3 q4 q5")], ["doc_id", "text"]
    )
    m.write_substring_store(hist, "text", "doc_id", root, L=4,
                            bucket_partitions=8)
    df = m.incremental_duplicate_spans(spark, root, new, "text", "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    import re

    pf = [l for l in plan.splitlines() if "PartitionFilters" in l
          and "BKT_PART" in l]
    assert pf, "store scan lost its BKT_PART partition filter"
    assert df.count() >= 1


def test_cli_substring_dedup_lifecycle(spark, tmp_path, capsys):
    from chill_spark.cli import main

    src1 = str(tmp_path / "w1"); src2 = str(tmp_path / "w2")
    out = str(tmp_path / "spans"); root = str(tmp_path / "store")
    spark.createDataFrame(
        [(0, "w0 w1 a b c d w2 w3 w4 w5")], ["doc_id", "text"]
    ).write.parquet(src1)
    spark.createDataFrame(
        [(9, "q0 q1 q2 a b c d q3 q4 q5")], ["doc_id", "text"]
    ).write.parquet(src2)
    # batch mode
    assert main(["substring-dedup", "--in", src1, "--out", out,
                 "--mode", "stats", "--length", "4"]) == 0
    assert "wrote 1 stats row(s)" in capsys.readouterr().out
    # store lifecycle: build from wave1, span-check wave2
    assert main(["substring-dedup", "--in", src1, "--store", root,
                 "--build", "--length", "4", "--buckets", "4"]) == 0
    capsys.readouterr()
    assert main(["substring-dedup", "--in", src2, "--store", root]) == 0
    assert "1 duplicated span(s)" in capsys.readouterr().out
    assert main(["substring-dedup", "--in", src2, "--store", root,
                 "--append"]) == 0
    assert main(["substring-dedup", "--store", root, "--compact"]) == 0


def test_substring_stream_spans_quarantine_and_redrain(spark, tmp_path):
    """The streaming intake: wave-2 spans duplicated vs wave-1 content
    are removed from admitted text, original grams register (store ==
    batch build over the feed), corrupt and NULL-id rows quarantine,
    NULL-text rows pass through, and a re-drain admits nothing new."""
    import json
    import os

    from chill_spark.llm_ops.incremental_substring import read_substring_fps
    from chill_spark.llm_ops.substring import gram_offsets
    from chill_spark.streaming import drain
    from chill_spark.streaming.substring_stream import run_substring_stream

    ind = str(tmp_path / "in"); os.makedirs(ind)
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    kw = dict(
        schema="doc_id BIGINT, text STRING", out_dir=out,
        store_root=store, checkpoint_dir=ckpt, L=4,
        bucket_partitions=4, available_now=True,
    )
    with open(os.path.join(ind, "w1.jsonl"), "w") as f:
        f.write(json.dumps(
            {"doc_id": 10, "text": "w0 w1 a b c d w2 w3 w4 w5"}) + "\n")
        f.write("corrupt {line\n")
    drain(run_substring_stream(spark, ind, **kw))
    with open(os.path.join(ind, "w2.jsonl"), "w") as f:
        f.write(json.dumps(
            {"doc_id": 1, "text": "q0 q1 a b c d q2 q3 q4 q5"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": None}) + "\n")
        f.write(json.dumps({"doc_id": None, "text": "x y z zz"}) + "\n")
        f.write("also corrupt }\n")
    drain(run_substring_stream(spark, ind, **kw))

    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    # wave 1 keeps its text (history-wins); wave 2's copied span is
    # cut even though its doc_id sorts first; NULL text passes through
    assert got[10] == "w0 w1 a b c d w2 w3 w4 w5"
    assert got[1] == "q0 q1 q2 q3 q4 q5"
    assert got[2] is None
    assert set(got) == {10, 1, 2}
    q = spark.read.parquet(os.path.join(out, "_quarantine"))
    rej = [r["rejected_line"] for r in q.collect()]
    assert "corrupt {line" in rej
    # same-batch corrupt + NULL-id rejects must BOTH survive (single
    # quarantine write per batch; a second dynamic overwrite of the
    # leaf would delete the first reject set)
    assert "also corrupt }" in rej
    assert any('"text": "x y z zz"' in r or '"text":"x y z zz"' in r
               for r in rej)
    assert len(rej) == 3
    # store == distinct grams of the ORIGINAL feed (both docs)
    both = spark.createDataFrame(
        [(10, "w0 w1 a b c d w2 w3 w4 w5"),
         (1, "q0 q1 a b c d q2 q3 q4 q5")], ["doc_id", "text"]
    )
    want = {r["fp"] for r in gram_offsets(both, "text", "doc_id", 4)
            .select("fp").distinct().collect()}
    assert {r["fp"] for r in read_substring_fps(spark, store).collect()} \
        == want
    # idle re-drain: nothing new
    drain(run_substring_stream(spark, ind, **kw))
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} \
        == {10, 1, 2}


# ---------------------------------------------------------------------------
# property-based invariants (random small-vocab corpora maximize
# duplicated grams)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as hyp  # noqa: E402

_doc = hyp.lists(
    hyp.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14
).map(" ".join)
_corpus = hyp.lists(_doc, min_size=1, max_size=8)


@settings(max_examples=12, deadline=None)
@given(docs=_corpus)
def test_span_invariants_hold_on_random_corpora(spark, docs):
    """Spans are disjoint, sorted, >= L tokens, inside the doc; stats
    reconcile with the span list; the keeper's occurrence of every
    duplicated gram survives somewhere (no content is lost corpus-
    wide: removal only ever drops REPEATED content)."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    spans = duplicate_spans(df, "text", "doc_id", L).collect()
    per_doc: dict[int, list] = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    n_toks = {i: len(d.split()) if d else 1 for i, d in enumerate(docs)}
    for i, ss in per_doc.items():
        ss.sort()
        for (a, b), nxt in zip(ss, ss[1:] + [None]):
            assert b - a >= L and a >= 1 and b <= n_toks[i] + 1
            if nxt is not None:
                assert b < nxt[0]  # disjoint AND non-adjacent (merged)
    st = {r["doc_id"]: r for r in
          substring_dedup_stats(df, "text", "doc_id", L).collect()}
    for i in range(len(docs)):
        want = sum(b - a for a, b in per_doc.get(i, []))
        assert st[i]["dup_tokens"] == want
        assert st[i]["n_spans"] == len(per_doc.get(i, []))


@settings(max_examples=10, deadline=None)
@given(docs=_corpus)
def test_incremental_equals_batch_when_history_ids_lead(spark, tmp_path_factory, docs):
    """With history ids strictly below new ids, history-wins keeper
    order coincides with global (id, off) order — so the incremental
    probe must reproduce the batch span pipeline restricted to the
    new docs, exactly."""
    import shutil

    from chill_spark.llm_ops.incremental_substring import (
        incremental_duplicate_spans,
        write_substring_store,
    )

    half = max(1, len(docs) // 2)
    hist = list(enumerate(docs[:half]))
    new = [(100 + i, d) for i, d in enumerate(docs[half:])]
    if not new:
        return
    hist_df = spark.createDataFrame(hist, ["doc_id", "text"])
    new_df = spark.createDataFrame(new, ["doc_id", "text"])
    root = str(tmp_path_factory.mktemp("substr")) + "/store"
    try:
        write_substring_store(hist_df, "text", "doc_id", root, L=L,
                              bucket_partitions=4)
        inc = sorted(
            map(tuple, incremental_duplicate_spans(
                spark, root, new_df, "text", "doc_id").collect())
        )
        batch = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in duplicate_spans(
                hist_df.unionByName(new_df), "text", "doc_id", L
            ).collect()
            if r["doc_id"] >= 100
        )
        assert inc == batch
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_substring_store_stats_and_forget_rebuild(spark, tmp_path, capsys):
    """Health = leaf bloat accounting (compact-when-X); forget =
    rebuild from the surviving corpus under the store's own geometry —
    a forgotten doc's unique grams stop matching, shared grams keep
    protecting the survivors."""
    import json

    from chill_spark.cli import main
    from chill_spark.llm_ops.incremental_substring import (
        incremental_duplicate_spans,
        substring_store_forget,
        substring_store_stats,
        write_substring_store,
    )

    root = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(0, "shared a b c d shared2 u0 u1 u2 u3"),
         (1, "secret p q r s only1 v0 v1 v2 v3")],
        ["doc_id", "text"],
    )
    write_substring_store(corpus, "text", "doc_id", root, L=4,
                          bucket_partitions=4)
    from chill_spark.llm_ops.incremental_substring import (
        substring_store_append,
    )

    substring_store_append(
        spark.createDataFrame([(2, "m n o p q r s t")], ["doc_id", "text"]),
        "text", "doc_id", root,
    )
    st = substring_store_stats(spark, root)
    assert st["n_append_batches"] == 1 and st["rows_appended"] > 0
    assert st["fps_distinct"] <= st["fps_rows"]
    capsys.readouterr()
    assert main(["substring-dedup", "--store", root, "--health"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["appended_fraction"] > 0

    # forget doc 1: its grams must stop matching new arrivals
    survivors = corpus.filter("doc_id <> 1")
    out = substring_store_forget(survivors, "text", "doc_id", root)
    assert out["action"] == "rebuilt"
    probe = spark.createDataFrame(
        [(9, "copy of secret p q r s here x0 x1"),
         (10, "has shared a b c d too y0 y1 y2")],
        ["doc_id", "text"],
    )
    spans = incremental_duplicate_spans(
        spark, root, probe, "text", "doc_id"
    ).collect()
    hit_docs = {r["doc_id"] for r in spans}
    assert hit_docs == {10}  # forgotten grams gone; shared grams kept
    st2 = substring_store_stats(spark, root)
    assert st2["n_append_batches"] == 0  # rebuild folded everything


def test_substring_stream_emits_health_journal(spark, tmp_path):
    """The r8 verdict's order #6: the maintainer that GROWS the store
    also reports its bloat in-band. Drive two waves through the
    stream with a compact threshold of zero and pin the emitted
    verdict fields on the (by then drifted) store."""
    import json
    import os

    from chill_spark.llm_ops.storefs import read_health_events
    from chill_spark.streaming import drain
    from chill_spark.streaming.substring_stream import run_substring_stream

    ind = str(tmp_path / "in"); os.makedirs(ind)
    store = str(tmp_path / "store")
    kw = dict(
        schema="doc_id BIGINT, text STRING",
        out_dir=str(tmp_path / "out"), store_root=store,
        checkpoint_dir=str(tmp_path / "ckpt"), L=4,
        bucket_partitions=4, available_now=True,
        max_appended_fraction=0.0,
        health_every=1,  # journal-semantics test; production default
                         # strides to every 16th batch (r10 ADVICE)
    )
    with open(os.path.join(ind, "w1.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "a b c d e f"}) + "\n")
    drain(run_substring_stream(spark, ind, **kw))
    with open(os.path.join(ind, "w2.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": "g h i j k l"}) + "\n")
    drain(run_substring_stream(spark, ind, **kw))

    events = read_health_events(store, spark=spark)
    assert len(events) == 2
    last = events[-1]
    assert last["batch_id"] == 1
    # empty-bootstrapped store: every row is appended bloat
    assert last["rows_bootstrap"] == 0 and last["rows_appended"] > 0
    assert last["appended_fraction"] == 1.0
    assert last["compact"] is True
    assert any("appended_fraction" in r for r in last["reasons"])
    # the per-epoch report must NOT pay the full-store distinct
    assert last["fps_distinct"] is None
    # replay-idempotent: re-draining overwrites events, not appends
    drain(run_substring_stream(spark, ind, **kw))
    assert len(read_health_events(store, spark=spark)) == 2


def test_cli_substring_journal_prints_events(spark, tmp_path, capsys):
    """`substring-dedup --store X --journal` surfaces the maintainer's
    _health journal, one JSON line per epoch, newest last."""
    import json

    from chill_spark.cli import main
    from chill_spark.llm_ops.storefs import write_health_event

    store = str(tmp_path / "store")
    write_health_event(store, 3, {"compact": True}, spark=spark)
    write_health_event(store, 1, {"compact": False}, spark=spark)
    assert main(["substring-dedup", "--store", store, "--journal"]) == 0
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert [e["batch_id"] for e in lines] == [1, 3]
    assert lines[-1]["compact"] is True


def test_health_journal_retention_caps_file_count(spark, tmp_path):
    """The _health journal keeps only the keep_last newest events — a
    continuous trigger must not grow it by one file per micro-batch
    forever (and make every --journal call parse all of them). Replay
    (rewriting an in-horizon batch id) never resurrects pruned
    history; keep_last=None disables pruning."""
    from chill_spark.llm_ops.storefs import (
        read_health_events,
        write_health_event,
    )

    store = str(tmp_path / "store")
    for b in range(10):
        write_health_event(store, b, {"n": b}, spark=spark, keep_last=4)
    events = read_health_events(store, spark=spark)
    assert [e["batch_id"] for e in events] == [6, 7, 8, 9]
    # replayed in-horizon epoch overwrites itself, prunes nothing new
    write_health_event(store, 8, {"n": 80}, spark=spark, keep_last=4)
    events = read_health_events(store, spark=spark)
    assert [e["batch_id"] for e in events] == [6, 7, 8, 9]
    assert [e["n"] for e in events if e["batch_id"] == 8] == [80]
    # unbounded mode leaves the journal alone
    write_health_event(store, 20, {"n": 20}, spark=spark, keep_last=None)
    assert [e["batch_id"] for e in read_health_events(store, spark=spark)] \
        == [6, 7, 8, 9, 20]


def test_benchmark_overlap_spans_and_scrub(spark, tmp_path):
    """Cross-corpus scrub semantics: EVERY training occurrence of a
    benchmark gram is contaminated (no keeper election — contrast
    duplicate_spans), overlapping grams merge, and the rewrite drops
    exactly the covered tokens. The store-backed probe
    (store_overlap_spans) must return the identical span set."""
    from chill_spark.llm_ops.incremental_substring import (
        store_overlap_spans,
        write_substring_store,
    )
    from chill_spark.llm_ops.substring import (
        benchmark_overlap_spans,
        scrub_benchmark_spans,
    )

    bench = spark.createDataFrame(
        [(100, "a b c d e f"), (101, "p q r s")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            # two separate occurrences of benchmark grams -> two spans
            (1, "x a b c d y z w p q r s k"),
            # overlapping benchmark grams merge into one span
            (2, "a b c d e f g h"),
            (3, "nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    spans = benchmark_overlap_spans(train, bench, "text", "doc_id", 4)
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in spans.collect()
    )
    # doc 1: 'a b c d' at 2..6, 'p q r s' at 9..13; doc 2: 1..7
    # ('a b c d','b c d e','c d e f' overlap-merge; trailing 'g h'
    # survives)
    assert got == [(1, 2, 6), (1, 9, 13), (2, 1, 7)]
    cleaned = {
        r["doc_id"]: r["cleaned"]
        for r in scrub_benchmark_spans(
            train, bench, "text", "doc_id", 4
        ).collect()
    }
    assert cleaned == {
        1: "x y z w k",
        2: "g h",
        3: "nothing shared here at all",
    }
    # store-backed serving path: same spans from a persisted index
    root = str(tmp_path / "bench_store")
    write_substring_store(bench, "text", "doc_id", root, L=4,
                          bucket_partitions=4)
    got_store = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in store_overlap_spans(
            spark, root, train, "text", "doc_id"
        ).collect()
    )
    assert got_store == got
    # and the probe scan keeps its planning-time partition pruning
    df = store_overlap_spans(spark, root, train, "text", "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any("PartitionFilters" in l and "BKT_PART" in l
               for l in plan.splitlines())


def test_scrub_stream_equals_batch_and_cli(spark, tmp_path, capsys):
    """The streaming scrub intake is stateless per batch (the index is
    frozen model data), so the admitted corpus must equal the batch
    scrub over the same docs regardless of wave boundaries; corrupt /
    NULL-id rows quarantine, NULL text passes through. The CLI batch
    mode produces the same rewrite."""
    import json
    import os

    from chill_spark.cli import main
    from chill_spark.llm_ops.incremental_substring import (
        write_substring_store,
    )
    from chill_spark.llm_ops.substring import scrub_benchmark_spans
    from chill_spark.streaming import drain
    from chill_spark.streaming.scrub_stream import run_scrub_stream

    bench = spark.createDataFrame(
        [(100, "a b c d e f"), (101, "p q r s")], ["doc_id", "text"]
    )
    store = str(tmp_path / "bench_store")
    write_substring_store(bench, "text", "doc_id", store, L=4,
                          bucket_partitions=4)

    ind = str(tmp_path / "in"); os.makedirs(ind)
    out = str(tmp_path / "out")
    kw = dict(
        schema="doc_id BIGINT, text STRING", out_dir=out,
        store_root=store, checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    with open(os.path.join(ind, "w1.jsonl"), "w") as f:
        f.write(json.dumps(
            {"doc_id": 1, "text": "x a b c d y z w p q r s k"}) + "\n")
        f.write("corrupt {line\n")
    drain(run_scrub_stream(spark, ind, **kw))
    with open(os.path.join(ind, "w2.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": "a b c d e f g h"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": None}) + "\n")
        f.write(json.dumps({"doc_id": None, "text": "a b c d e"}) + "\n")
        # NULL id AND NULL text: still a reject (the id is the routing
        # key; text NULL-ness must not smuggle it into the clean side)
        f.write(json.dumps({"doc_id": None, "text": None}) + "\n")
    drain(run_scrub_stream(spark, ind, **kw))

    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "x y z w k", 2: "g h", 3: None}
    rej = [r["rejected_line"] for r in
           spark.read.parquet(f"{out}/_quarantine").collect()]
    assert "corrupt {line" in rej and len(rej) == 3
    # stream == batch: same rewrite from the one-shot operator
    train = spark.createDataFrame(
        [(1, "x a b c d y z w p q r s k"), (2, "a b c d e f g h")],
        ["doc_id", "text"],
    )
    want = {r["doc_id"]: r["cleaned"] for r in
            scrub_benchmark_spans(train, bench, "text", "doc_id", 4)
            .collect()}
    assert {k: v for k, v in got.items() if k in want} == want
    # idle re-drain: nothing changes
    drain(run_scrub_stream(spark, ind, **kw))
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} \
        == {1, 2, 3}

    # CLI batch scrub — mirrors the stream's routing: NULL-id rows
    # drop (reported), NULL-text rows pass through unchanged
    src = str(tmp_path / "train_pq"); dst = str(tmp_path / "scrubbed")
    train.unionByName(spark.createDataFrame(
        [(3, None), (None, "a b c d e")],
        "doc_id BIGINT, text STRING",
    )).write.parquet(src)
    assert main(["substring-dedup", "--store", store, "--scrub",
                 "--in", src, "--out", dst]) == 0
    assert "dropped 1 NULL-id doc(s)" in capsys.readouterr().out
    cleaned = {r["doc_id"]: r["text"]
               for r in spark.read.parquet(dst).collect()}
    assert cleaned == {**want, 3: None}


@settings(max_examples=10, deadline=None)
@given(
    train=hyp.lists(
        hyp.lists(hyp.sampled_from("abcde"), min_size=0, max_size=12)
        .map(" ".join),
        min_size=1, max_size=6,
    ),
    bench=hyp.lists(
        hyp.lists(hyp.sampled_from("abcde"), min_size=0, max_size=10)
        .map(" ".join),
        min_size=1, max_size=3,
    ),
)
def test_benchmark_overlap_spans_property(spark, train, bench):
    """Property: benchmark_overlap_spans equals a direct Python
    reference (every training offset whose L-gram occurs anywhere in
    the benchmark, islands-merged) on random tiny-vocab corpora —
    tiny vocab maximizes shared grams and overlapping spans."""
    from chill_spark.llm_ops.substring import benchmark_overlap_spans

    Lp = 3

    def grams(text):
        toks = text.split(" ") if text else []
        return [
            (i + 1, " ".join(toks[i:i + Lp]))
            for i in range(max(len(toks) - Lp + 1, 0))
        ]

    bset = {g for b in bench for _, g in grams(b)}
    expect = []
    for did, text in enumerate(train):
        hits = sorted(off for off, g in grams(text) if g in bset)
        cur = None
        for off in hits:
            if cur and off <= cur[1]:
                cur[1] = max(cur[1], off + Lp)
            else:
                if cur:
                    expect.append((did, cur[0], cur[1]))
                cur = [off, off + Lp]
        if cur:
            expect.append((did, cur[0], cur[1]))

    tdf = spark.createDataFrame(
        list(enumerate(train)), "doc_id bigint, text string"
    )
    bdf = spark.createDataFrame(
        [(1000 + i, b) for i, b in enumerate(bench)],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in benchmark_overlap_spans(
            tdf, bdf, "text", "doc_id", Lp
        ).collect()
    )
    assert got == sorted(expect)


def test_corpus_prep_cli_store_equals_inquery_chain(spark, tmp_path, capsys,
                                                    sf_dir):
    """corpus-prep --bench-store (persisted gram index, the
    steady-state shape) must produce exactly the rows of the
    oracle-replayable in-query chain (bench= DataFrame) — the two
    scrub span sources are different code paths over the same
    evidence. Also pins the no-scrub fallback (omitting --bench-store
    runs the v2 chain) and the NULL-id drop report."""
    import os

    from pyspark.sql import functions as F

    from chill_spark.cli import main
    from chill_spark.llm_ops.incremental_substring import (
        write_substring_store,
    )
    from chill_spark.llm_ops.prep import corpus_prep

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    train = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)

    store = str(tmp_path / "bench_store")
    write_substring_store(bench, "text", "doc_id", store, L=8,
                          bucket_partitions=8)
    src = str(tmp_path / "train_pq")
    dst = str(tmp_path / "prepped")
    train.write.parquet(src)
    assert main(["corpus-prep", "--input", src, "--out", dst,
                 "--bench-store", store]) == 0
    assert "scrubbed against benchmark index" in capsys.readouterr().out

    want = {tuple(r) for r in corpus_prep(
        train, "text", "doc_id", "source", bench=bench, L=8,
    ).collect()}
    got = {tuple(r) for r in spark.read.parquet(dst).collect()}
    assert got == want and got

    # no --bench-store: the scrub stage is skipped (v2 chain)
    dst2 = str(tmp_path / "prepped_noscrub")
    assert main(["corpus-prep", "--input", src, "--out", dst2]) == 0
    assert "no benchmark scrub" in capsys.readouterr().out
    noscrub = {tuple(r) for r in corpus_prep(
        train, "text", "doc_id", "source", L=8,
    ).collect()}
    got2 = {tuple(r) for r in spark.read.parquet(dst2).collect()}
    assert got2 == noscrub and got2


@settings(max_examples=10, deadline=None)
@given(
    train=hyp.lists(
        hyp.lists(hyp.sampled_from("abcd"), min_size=0, max_size=10)
        .map(" ".join),
        min_size=1, max_size=5,
    ),
    bench=hyp.lists(
        hyp.lists(hyp.sampled_from("abcd"), min_size=0, max_size=8)
        .map(" ".join),
        min_size=1, max_size=3,
    ),
)
def test_contamination_attribution_matches_python_reference(
    spark, train, bench
):
    """contamination_attribution equals a direct Python computation of
    (n_grams, hit_grams, n_occurrences, n_corpus_docs) per benchmark
    doc on random corpora over a tiny alphabet (maximum gram
    collision pressure)."""
    from chill_spark.llm_ops.substring import contamination_attribution

    L = 3

    def grams(text):
        toks = [t for t in text.lower().split() if t]
        return [" ".join(toks[i:i + L]) for i in range(len(toks) - L + 1)]

    tdf = spark.createDataFrame(
        list(enumerate(train)), ["doc_id", "text"]
    )
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)], ["doc_id", "text"]
    )
    got = {r["bench_id"]: r for r in contamination_attribution(
        tdf, bdf, "text", "doc_id", L,
    ).collect()}

    corpus = [(i, grams(t)) for i, t in enumerate(train)]
    want = {}
    for i, t in enumerate(bench):
        gs = set(grams(t))
        if not gs:
            continue
        hit = {g for g in gs
               if any(g in cg for _d, cg in corpus)}
        occ = sum(sum(1 for g2 in cg if g2 in gs) for _d, cg in corpus)
        docs_hit = {d for d, cg in corpus if any(g2 in gs for g2 in cg)}
        want[100 + i] = (len(gs), len(hit), occ, len(docs_hit))

    assert set(got) == set(want)
    for bid, (ng, hg, occ, nd) in want.items():
        r = got[bid]
        assert (r["n_grams"], r["hit_grams"], r["n_occurrences"],
                r["n_corpus_docs"]) == (ng, hg, occ, nd), (bid, dict(
                    n_grams=r["n_grams"], hit=r["hit_grams"],
                    occ=r["n_occurrences"], docs=r["n_corpus_docs"]))


def test_attribution_stream_equals_batch_and_replay(spark, tmp_path):
    """Steady-state contamination attribution (llm_ops/attribution.py
    + streaming/attribution_stream.py): the report read from running
    store state after two crawl waves must equal the one-shot batch
    contamination_attribution over the same docs; corrupt / NULL-id
    rows quarantine; NULL text contributes nothing; an idle re-drain
    (stream replay) changes nothing; and the hits store stays bounded
    by the SUITE's gram count, not by corpus or batch count."""
    import json
    import os

    from chill_spark.llm_ops.attribution import (
        attribution_report,
        write_attribution_store,
    )
    from chill_spark.llm_ops.substring import contamination_attribution
    from chill_spark.streaming import drain
    from chill_spark.streaming.attribution_stream import (
        run_attribution_stream,
    )

    bench = spark.createDataFrame(
        [(100, "a b c d e f"), (101, "p q r s"), (102, "zz yy xx ww")],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "attr_store")
    write_attribution_store(bench, "text", "doc_id", store, L=4,
                            bucket_partitions=4)

    ind = str(tmp_path / "in"); os.makedirs(ind)
    kw = dict(
        schema="doc_id BIGINT, text STRING", store_root=store,
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    w1 = [(1, "x a b c d y p q r s k")]
    w2 = [(2, "a b c d e f g h"), (4, "b c d e")]
    with open(os.path.join(ind, "w1.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": w1[0][1]}) + "\n")
        f.write("corrupt {line\n")
    drain(run_attribution_stream(spark, ind, **kw))
    with open(os.path.join(ind, "w2.jsonl"), "w") as f:
        for d, t in w2:
            f.write(json.dumps({"doc_id": d, "text": t}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": None}) + "\n")
        f.write(json.dumps({"doc_id": None, "text": "a b c d e"}) + "\n")
    drain(run_attribution_stream(spark, ind, **kw))

    def report():
        return {
            r["bench_id"]: (r["n_grams"], r["hit_grams"],
                            r["n_occurrences"], r["n_corpus_docs"],
                            r["contaminated_frac"])
            for r in attribution_report(spark, store).collect()
        }

    got = report()
    train = spark.createDataFrame(w1 + w2, ["doc_id", "text"])
    want = {
        r["bench_id"]: (r["n_grams"], r["hit_grams"],
                        r["n_occurrences"], r["n_corpus_docs"],
                        r["contaminated_frac"])
        for r in contamination_attribution(
            train, bench, "text", "doc_id", 4
        ).collect()
    }
    assert got == want
    assert got[102][1] == 0  # untouched suite reads zero, not absent
    rej = [r["rejected_line"] for r in
           spark.read.parquet(f"{store}/_quarantine").collect()]
    assert "corrupt {line" in rej and len(rej) == 2
    # idle re-drain: replayed checkpoints change nothing
    drain(run_attribution_stream(spark, ind, **kw))
    assert report() == got
    # benchmark-sized state: hits/ holds at most the suite's grams
    suite_grams = spark.read.parquet(f"{store}/bench_grams").count()
    assert spark.read.parquet(f"{store}/hits").count() <= suite_grams
    # the maintainer heartbeats the Store Health journal (batch 0 at
    # the default 16-stride): freshness is measurable without a scan
    from chill_spark.llm_ops.storefs import latest_health_event
    from chill_spark.report.store_health import journal_freshness

    ev = latest_health_event(store, spark=spark)
    assert ev is not None and ev["n_append_batches"] >= 1
    h = journal_freshness(spark, store, data_subdir="counters")
    assert not h["stale"] and not h["actions"]


def test_attribution_update_replay_idempotent_and_rebuild_resets(
    spark, tmp_path
):
    """Manual (CLI-style) attribution_update calls: replaying the same
    batch_id dynamic-overwrites its own leaves (report unchanged even
    though the same docs are folded twice), overlapping hits across
    batches never double-count hit_grams, and rebuilding the suite
    index clears the running state."""
    from chill_spark.llm_ops.attribution import (
        attribution_report,
        attribution_update,
        write_attribution_store,
    )

    bench = spark.createDataFrame([(100, "a b c d e")], ["doc_id", "text"])
    store = str(tmp_path / "attr_store")
    write_attribution_store(bench, "text", "doc_id", store, L=4)

    b1 = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    b2 = spark.createDataFrame([(2, "a b c d e")], ["doc_id", "text"])
    attribution_update(spark, store, b1, "text", "doc_id", batch_id=-2)
    attribution_update(spark, store, b2, "text", "doc_id", batch_id=-3)

    def snap():
        return [tuple(r) for r in
                attribution_report(spark, store).collect()]

    first = snap()
    [(bid, ng, hg, occ, nd, frac)] = first
    # suite has 2 grams (a b c d / b c d e); batch1 hits 1, batch2 both
    assert (ng, hg, occ, nd) == (2, 2, 3, 2) and frac == 1.0
    # replay batch -3: same leaves rewritten, same report
    attribution_update(spark, store, b2, "text", "doc_id", batch_id=-3)
    assert snap() == first
    # the shared gram 'a b c d' lives in exactly one hits leaf
    hits = spark.read.parquet(f"{store}/hits")
    assert hits.count() == 2
    # suite rebuild invalidates and clears running state
    write_attribution_store(bench, "text", "doc_id", store, L=4)
    [(bid, ng, hg, occ, nd, frac)] = snap()
    assert (hg, occ, nd, frac) == (0, 0, 0, 0.0)


def test_attribution_zero_overlap_and_stale_hit_batches(spark, tmp_path):
    """r11 review findings: (1) a crawl batch with ZERO suite overlap
    writes empty hits/counters frames — the file-less directories
    must not brick later updates or the report (schema-pinned reads);
    (2) a batch whose hits were all already-seen writes a counters
    leaf but no hits leaf — manual id auto-numbering must not reuse
    its id and destroy its counters."""
    from chill_spark.llm_ops.attribution import (
        attribution_report,
        attribution_update,
        write_attribution_store,
    )

    bench = spark.createDataFrame([(100, "a b c d e")], ["doc_id", "text"])
    store = str(tmp_path / "attr_store")
    write_attribution_store(bench, "text", "doc_id", store, L=4)

    def snap():
        return [tuple(r) for r in
                attribution_report(spark, store).collect()]

    # batch 1: zero overlap — empty dirs land; nothing may crash
    z = spark.createDataFrame([(1, "q r s t u v")], ["doc_id", "text"])
    attribution_update(spark, store, z, "text", "doc_id")
    [(bid, ng, hg, occ, nd, frac)] = snap()
    assert (hg, occ, nd, frac) == (0, 0, 0, 0.0)
    # batch 2: hits gram 'a b c d' (fresh) -> hits leaf -3
    b2 = spark.createDataFrame([(2, "a b c d")], ["doc_id", "text"])
    attribution_update(spark, store, b2, "text", "doc_id")
    # batch 3: SAME gram again — counters leaf, but no fresh hits
    b3 = spark.createDataFrame([(3, "a b c d")], ["doc_id", "text"])
    attribution_update(spark, store, b3, "text", "doc_id")
    # batch 4 must NOT reuse batch 3's id (its counters would vanish)
    b4 = spark.createDataFrame([(4, "b c d e")], ["doc_id", "text"])
    attribution_update(spark, store, b4, "text", "doc_id")
    [(bid, ng, hg, occ, nd, frac)] = snap()
    assert (ng, hg) == (2, 2)
    assert occ == 3 and nd == 3, (
        "a later batch reused an auto-numbered id and overwrote "
        "another batch's counters"
    )


@settings(max_examples=8, deadline=None)
@given(
    train=hyp.lists(
        hyp.lists(hyp.sampled_from("abcd"), min_size=0, max_size=10)
        .map(" ".join),
        min_size=1, max_size=8,
    ),
    bench=hyp.lists(
        hyp.lists(hyp.sampled_from("abcd"), min_size=0, max_size=8)
        .map(" ".join),
        min_size=1, max_size=3,
    ),
    waves=hyp.integers(min_value=1, max_value=3),
)
def test_attribution_incremental_equals_batch_property(
    spark, tmp_path_factory, train, bench, waves
):
    """Property: folding a random corpus into the attribution store in
    ANY number of random wave splits yields a report identical to the
    one-shot batch contamination_attribution — hit_grams (distinct
    across waves via the suite-bounded hits store), n_occurrences
    (additive), n_corpus_docs (per-wave distinct sums, docs unique),
    and zero-overlap waves (empty leaf areas) included."""
    from chill_spark.llm_ops.attribution import (
        attribution_report,
        attribution_update,
        write_attribution_store,
    )
    from chill_spark.llm_ops.substring import contamination_attribution

    L = 3
    tdf = spark.createDataFrame(
        list(enumerate(train)), "doc_id bigint, text string"
    )
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)],
        "doc_id bigint, text string",
    )
    store = str(tmp_path_factory.mktemp("attr_prop") / "store")
    write_attribution_store(bdf, "text", "doc_id", store, L=L,
                            bucket_partitions=4)
    for w in range(waves):
        wave = tdf.filter((tdf.doc_id % waves) == w)
        attribution_update(spark, store, wave, "text", "doc_id")

    key = lambda r: (r["bench_id"], r["n_grams"], r["hit_grams"],
                     r["n_occurrences"], r["n_corpus_docs"],
                     r["contaminated_frac"])
    got = sorted(map(key, attribution_report(spark, store).collect()))
    want = sorted(map(key, contamination_attribution(
        tdf, bdf, "text", "doc_id", L
    ).collect()))
    assert got == want

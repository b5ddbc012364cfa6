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
    the gram) and doc_id — no cartesian/broadcast-nested-loop."""
    plan = duplicate_spans(docs, "text", "doc_id", L)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

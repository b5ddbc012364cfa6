"""Portable Bloom filter (llm_ops.bloom): no-false-negative contract,
FPR sanity, exact mergeability, DuckDB bit-for-bit replay, and the
map-only probe plan gate."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from chill_spark.llm_ops.bloom import (
    BITS_PER_WORD,
    bloom_build,
    bloom_filter_new,
    bloom_fpr,
    bloom_merge,
    bloom_num_words,
    bloom_words,
    with_bloom_contains,
)

M, H = 1 << 12, 4  # 4096 bits, 4 hashes


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_bloom_no_false_negatives_and_fpr_band(spark):
    """Every inserted key probes TRUE (the hard contract); the
    false-positive rate over a disjoint probe set sits within 3x of
    the analytic rate (loose band — 500 probes of a random draw)."""
    members = [f"doc-{i}" for i in range(400)]
    bloom = bloom_build(_keys_df(spark, members), "key", M, H)
    assert bloom.count() <= bloom_num_words(M)
    words = bloom_words(bloom, M)

    probed = with_bloom_contains(
        _keys_df(spark, members + [f"new-{i}" for i in range(500)]),
        "key", words, M, H,
    ).collect()
    got = {r["key"]: r["might_contain"] for r in probed}
    assert all(got[k] is True for k in members)  # zero false negatives
    fp = sum(got[f"new-{i}"] for i in range(500))
    expect = bloom_fpr(M, H, 400)  # ~0.034 at this sizing
    assert fp / 500 <= max(3 * expect, 0.02)


def test_bloom_merge_equals_union_build(spark):
    """bit_or mergeability is EXACT: merge(bloom(A), bloom(B)) must
    equal bloom(A ∪ B) word-for-word — per-day filters compose
    without re-scanning history."""
    a = [f"a-{i}" for i in range(80)]
    b = [f"b-{i}" for i in range(70)] + a[:10]  # overlap allowed
    merged = bloom_merge(
        bloom_build(_keys_df(spark, a), "key", M, H),
        bloom_build(_keys_df(spark, b), "key", M, H),
    )
    direct = bloom_build(_keys_df(spark, a + b), "key", M, H)
    assert bloom_words(merged, M) == bloom_words(direct, M)


def test_bloom_duckdb_replays_words_bit_for_bit(spark):
    """The oracle contract: DuckDB's md5/%/<<
    bit_or build of the same keys produces the identical word table."""
    keys = [f"k{i}" for i in range(200)]
    words = bloom_words(bloom_build(_keys_df(spark, keys), "key", M, H), M)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS key", [keys])
    rows = con.execute(f"""
        WITH hs AS (SELECT unnest(range({H})) AS i),
        pos AS (
            SELECT (('0x' || substring(md5('bf' || h.i::VARCHAR || ':' || t.key), 1, 15))::BIGINT
                    % {M}) AS p
            FROM t CROSS JOIN hs h
        )
        SELECT p // {BITS_PER_WORD} AS word,
               bit_or(1::BIGINT << (p % {BITS_PER_WORD})::INTEGER) AS bits
        FROM pos GROUP BY 1
    """).fetchall()
    duck = [0] * bloom_num_words(M)
    for w, bits in rows:
        duck[int(w)] = int(bits)
    assert duck == words


def test_bloom_null_keys_set_no_bits_and_probe_null(spark):
    df = spark.createDataFrame([("x",), (None,)], "key string")
    bloom = bloom_build(df, "key", M, H)
    words = bloom_words(bloom, M)
    only_x = bloom_words(bloom_build(_keys_df(spark, ["x"]), "key", M, H), M)
    assert words == only_x  # the NULL row contributed nothing
    got = {r["key"]: r["might_contain"]
           for r in with_bloom_contains(df, "key", words, M, H).collect()}
    assert got["x"] is True and got[None] is None


def test_bloom_filter_new_gate(spark):
    """might_contain=FALSE is a proof of absence, so the gate's output
    must contain EVERY genuinely-new key minus (only) false positives,
    and zero members."""
    members = [f"m-{i}" for i in range(300)]
    words = bloom_words(bloom_build(_keys_df(spark, members), "key", M, H), M)
    probe = _keys_df(spark, members + [f"n-{i}" for i in range(200)])
    out = {r["key"] for r in bloom_filter_new(probe, "key", words, M, H).collect()}
    assert not out & set(members)  # no member leaks through as "new"
    missed = {f"n-{i}" for i in range(200)} - out  # false positives only
    assert len(missed) <= 0.2 * 200


def test_bloom_probe_plan_is_map_only(spark):
    """The 100 TB contract: the probe stage is a pure projection — a
    broadcast 1-row carrier and element_at lookups, no Exchange."""
    words = bloom_words(
        bloom_build(_keys_df(spark, ["a", "b"]), "key", M, H), M
    )
    df = with_bloom_contains(_keys_df(spark, ["a", "z"]), "key", words, M, H)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the ONLY exchange allowed is the broadcast of the 1-row carrier;
    # the probe rows themselves must never shuffle
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan


def test_bloom_build_shuffle_bounded_by_words(spark):
    """The build's output (and thus its shuffle) is word-bounded: a
    tiny filter over many keys yields at most num_words rows."""
    keys = [f"k{i}" for i in range(5000)]
    tiny_m = 630  # 10 words
    bloom = bloom_build(_keys_df(spark, keys), "key", tiny_m, 3)
    assert bloom.count() <= bloom_num_words(tiny_m) == 10
    # saturated: every word should be all-63-bits set
    words = bloom_words(bloom, tiny_m)
    assert all(w == (1 << BITS_PER_WORD) - 1 for w in words)


def test_bloom_store_lifecycle_and_idempotent_add(spark, tmp_path):
    """write -> add -> read round-trips the word table, and replaying
    the SAME add batch changes nothing (OR algebra makes crash-retry
    free — no replay-resolution machinery needed)."""
    from chill_spark.llm_ops.bloom import (
        bloom_store_add,
        read_bloom_store,
        write_bloom_store,
    )

    root = str(tmp_path / "bf")
    a = [f"a-{i}" for i in range(60)]
    b = [f"b-{i}" for i in range(40)]
    write_bloom_store(_keys_df(spark, a), "key", root, M, H)
    bloom_store_add(_keys_df(spark, b), "key", root)
    words, meta = read_bloom_store(spark, root)
    assert (meta["num_bits"], meta["num_hashes"]) == (M, H)
    direct = bloom_words(bloom_build(_keys_df(spark, a + b), "key", M, H), M)
    assert words == direct
    bloom_store_add(_keys_df(spark, b), "key", root)  # replayed batch
    again, _ = read_bloom_store(spark, root)
    assert again == direct

    with pytest.raises(FileNotFoundError, match="no Bloom store"):
        read_bloom_store(spark, str(tmp_path / "nope"))


def test_cli_bloom_build_add_probe(spark, tmp_path, capsys):
    from chill_spark.cli import main

    corpus = str(tmp_path / "corpus")
    batch = str(tmp_path / "batch")
    probe = str(tmp_path / "probe")
    store = str(tmp_path / "store")
    out = str(tmp_path / "new")
    _keys_df(spark, [f"m-{i}" for i in range(50)]).withColumnRenamed(
        "key", "text"
    ).write.parquet(corpus)
    _keys_df(spark, ["extra-1", "extra-2"]).withColumnRenamed(
        "key", "text"
    ).write.parquet(batch)
    _keys_df(spark, ["m-1", "extra-1", "brand-new"]).withColumnRenamed(
        "key", "text"
    ).write.parquet(probe)

    assert main(["bloom", "--store", store, "--build", "--input", corpus,
                 "--bits", str(M), "--hashes", str(H)]) == 0
    assert main(["bloom", "--store", store, "--add", batch]) == 0
    assert main(["bloom", "--store", store, "--probe", probe,
                 "--out", out]) == 0
    msg = capsys.readouterr().out
    assert "definitely_new=1 possible_member=2" in msg
    got = {r["text"] for r in spark.read.parquet(out).collect()}
    assert got == {"brand-new"}


def test_bloom_fpr_analytic():
    assert bloom_fpr(1 << 20, 7, 1) == pytest.approx(0.0, abs=1e-5)
    # classic optimum: m/n = 10 bits/key, k = 7 -> ~0.8%
    assert bloom_fpr(10_000, 7, 1_000) == pytest.approx(0.0082, abs=2e-3)


def test_decontam_stream_routes_and_redrains(spark, tmp_path):
    """The streaming decontamination gate: docs sharing a benchmark
    gram flag (with hit accounting), proven-clean docs admit, NULL
    text admits (nothing to be contaminated by), corrupt + NULL-id
    rows land in ONE quarantine leaf, and a re-drain is a no-op."""
    import json
    import os

    from chill_spark.llm_ops.bloom import write_bloom_store
    from chill_spark.streaming import drain
    from chill_spark.streaming.decontam_stream import run_decontam_stream

    bench = spark.createDataFrame(
        [("the forbidden phrase",)], ["g"]
    )
    bloom = str(tmp_path / "bloom")
    write_bloom_store(bench, "g", bloom, num_bits=1 << 14, num_hashes=5)

    ind = str(tmp_path / "in"); os.makedirs(ind)
    out = str(tmp_path / "out")
    with open(os.path.join(ind, "w1.jsonl"), "w") as f:
        f.write(json.dumps(
            {"doc_id": 1, "text": "contains the forbidden phrase here"}
        ) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "totally novel words"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": None}) + "\n")
        f.write(json.dumps({"doc_id": None, "text": "lost row"}) + "\n")
        f.write("corrupt{\n")
    kw = dict(
        schema="doc_id BIGINT, text STRING", out_dir=out,
        bloom_root=bloom, checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    drain(run_decontam_stream(spark, ind, **kw))

    clean = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert clean == {2, 3}
    fl = spark.read.parquet(os.path.join(out, "_flagged")).collect()
    assert [r["doc_id"] for r in fl] == [1]
    assert fl[0]["bloom_hits"] >= 1 and fl[0]["n_grams"] >= 3
    rej = sorted(r["rejected_line"] for r in
                 spark.read.parquet(os.path.join(out, "_quarantine")).collect())
    assert len(rej) == 2 and rej[0] == "corrupt{"
    assert json.loads(rej[1])["text"] == "lost row"
    # idle re-drain: no growth anywhere
    drain(run_decontam_stream(spark, ind, **kw))
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {2, 3}


def test_cli_bloom_gram_build_feeds_decontam_stream(spark, tmp_path, capsys):
    """`bloom --build --grams N` persists a benchmark gram filter with
    N stamped in meta; decontam-stream honors a matching --n and fails
    loud on a mismatch (a disjoint key space would pass everything as
    proven-clean)."""
    import json
    import os

    import pytest as _pytest

    from chill_spark.cli import main
    from chill_spark.streaming import drain
    from chill_spark.streaming.decontam_stream import run_decontam_stream

    bench_p = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(1, "the forbidden phrase appears here")], ["doc_id", "text"]
    ).write.parquet(bench_p)
    bloom = str(tmp_path / "bloom")
    assert main(["bloom", "--build", "--input", bench_p,
                 "--store", bloom, "--key-col", "text",
                 "--grams", "3", "--bits", str(1 << 14)]) == 0
    assert "grams_n=3" in capsys.readouterr().out

    ind = str(tmp_path / "in"); os.makedirs(ind)
    out = str(tmp_path / "out")
    with open(os.path.join(ind, "w.jsonl"), "w") as f:
        f.write(json.dumps(
            {"doc_id": 7, "text": "quoting the forbidden phrase verbatim"}
        ) + "\n")
        f.write(json.dumps({"doc_id": 8, "text": "novel words only"}) + "\n")
    kw = dict(
        schema="doc_id BIGINT, text STRING", out_dir=out,
        bloom_root=bloom, checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    with _pytest.raises(ValueError, match="built over 3-grams"):
        run_decontam_stream(spark, ind, n=4, **kw)
    drain(run_decontam_stream(spark, ind, n=3, **kw))
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {8}
    fl = spark.read.parquet(os.path.join(out, "_flagged")).collect()
    assert [r["doc_id"] for r in fl] == [7]


def test_doc_bloom_verdicts_matches_doc_gram_flags(spark):
    """The zero-shuffle serving shape must agree row-for-row with the
    streaming gate's explode+groupBy shape over every text edge case
    (NULL or empty text = one '' gram, short doc = whole text as one
    gram), and its plan must stay Exchange-free."""
    from chill_spark.llm_ops.bloom import doc_bloom_verdicts
    from chill_spark.streaming.decontam_stream import doc_gram_flags

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),  # dup of 1 -> flagged
            (3, "completely different words here now"),
            (4, "ab"),            # shorter than n: whole text one gram
            (5, ""),              # empty: one '' gram
            (6, None),            # NULL text: normalizes to one '' gram
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown",), ("brown fox jumps",)], ["g"]
    )
    words = bloom_words(bloom_build(bench, "g", M, H), M)
    a = sorted(
        doc_bloom_verdicts(docs, "text", "doc_id", words, M, H, n=3)
        .collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        doc_gram_flags(docs, "text", "doc_id", words, M, H, n=3).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert [r["doc_id"] for r in a] == [1, 2, 3, 4, 5, 6]
    assert [r["flagged"] for r in a][:2] == [True, True]
    plan = (
        doc_bloom_verdicts(docs, "text", "doc_id", words, M, H, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=8),
       bench=st.lists(_doc, min_size=1, max_size=4))
def test_doc_bloom_verdicts_parity_property(spark, docs, bench):
    """Property: the one-projection verdict equals the
    explode+groupBy verdict on arbitrary small-vocab corpora (tiny
    vocab maximizes shared grams and filter saturation)."""
    from chill_spark.llm_ops.bloom import doc_bloom_verdicts
    from chill_spark.streaming.decontam_stream import doc_gram_flags

    ddf = spark.createDataFrame(
        list(enumerate(docs)), "doc_id bigint, text string"
    )
    bdf = spark.createDataFrame([(b,) for b in bench], ["g"])
    words = bloom_words(bloom_build(bdf, "g", M, H), M)
    a = sorted(
        (r.asDict() for r in
         doc_bloom_verdicts(ddf, "text", "doc_id", words, M, H, n=3)
         .collect()),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        (r.asDict() for r in
         doc_gram_flags(ddf, "text", "doc_id", words, M, H, n=3)
         .collect()),
        key=lambda r: r["doc_id"],
    )
    assert a == b

"""Guard bench.py's final stdout line against the driver's 2000-char
tail window, and pin the pre-flight load gate.

Rounds 4 and 5 both lost their machine-readable bench because the
last stdout line outgrew the window as the headline set grew. The
line now carries only totals + the top-10 slowest queries; this test
reconstructs it with worst-case widths (the 10 LONGEST query names in
the headline set, maximal float widths) and asserts it stays under
1900 chars no matter how many queries are added to HEADLINE. Round 6
added the other silent failure mode: the driver's bench ran at load
4.7-8.9 and committed ~16%-inflated readings with nothing flagging
it — ``load_gate`` waits for idle and flags the run when it never
comes.
"""

import json

import bench


def _worst_case_line() -> str:
    longest = sorted(bench.HEADLINE, key=len, reverse=True)[:10]
    slowest = {name: 99999.999 for name in longest}
    return json.dumps({
        "metric": "headline query wall time (noop sink, local)",
        "value": 9999999.999,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(bench.HEADLINE),
        "serve_total": 99999.999,
        "n_serve": 99,
        "medians_file": "BENCH_MEDIANS.json",
        "load_avg": [99.99, 99.99],
        "load_flagged": False,
        "calib_s": 99.9999,
        "calib_par_s": 99.9999,
        "sf": 0.1,
    })


def test_headline_line_fits_driver_tail_window():
    line = _worst_case_line()
    assert len(line) < 1900, (
        f"bench headline line would be {len(line)} chars; the driver "
        "tail-captures 2000 — trim the top-10 payload"
    )


def test_headline_names_are_registered():
    from chill_spark import queries as Q

    registry = Q.queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"bench.HEADLINE names unregistered queries: {missing}"


def test_load_gate_passes_idle_machine_immediately():
    calls = []
    load, flagged, waited = bench.load_gate(
        max_load=2.0, wait_s=300,
        getloadavg=lambda: (0.8, 1.0, 1.0),
        sleep=calls.append,
    )
    assert (load, flagged, waited) == (0.8, False, 0.0)
    assert not calls  # never slept


def test_load_gate_waits_until_load_drops():
    readings = iter([(6.0,), (4.0,), (1.5,)])
    slept = []
    load, flagged, waited = bench.load_gate(
        max_load=2.0, wait_s=300,
        getloadavg=lambda: next(readings),
        sleep=slept.append, poll_s=15,
    )
    assert (load, flagged) == (1.5, False)
    assert waited == 30.0 and slept == [15, 15]


def test_load_gate_flags_persistently_loaded_machine():
    slept = []
    load, flagged, waited = bench.load_gate(
        max_load=2.0, wait_s=60,
        getloadavg=lambda: (5.5, 5.0, 5.0),
        sleep=slept.append, poll_s=25,
    )
    assert flagged and load == 5.5
    assert waited == 60.0  # capped at wait_s, final poll truncated
    assert slept == [25, 25, 10]


def test_cpu_calibration_is_positive_and_repeatable():
    """The canary's contract: fixed work, so two immediate readings
    agree within the documented noise band (generous 25% bound — the
    point is catching a broken/elided measurement, not re-measuring
    the machine)."""
    a = bench.cpu_calibration(reps=3, loops=40)
    b = bench.cpu_calibration(reps=3, loops=40)
    assert a > 0 and b > 0
    assert abs(a - b) / max(a, b) < 0.25


def test_compare_medians_normalizes_by_calib():
    prev = {"medians": {"a": 1.0, "b": 2.0, "z": 0.01},
            "calib_s": 0.24}
    # machine 25% slower (calib 0.24 -> 0.30), queries 25% slower:
    # pure VM drift, normalized ratio must come back ~1.0
    cur = {"medians": {"a": 1.25, "b": 2.5, "z": 0.0125, "new": 9.9},
           "calib_s": 0.30}
    out = bench.compare_medians(prev, cur)
    assert out["n_shared"] == 3
    assert out["raw_ratio"] == 1.25
    assert out["calib_ratio"] == 1.25
    assert out["normalized_ratio"] == 1.0
    # sub-50ms queries are excluded from per-query deltas (pure noise)
    assert "z" not in out["top_normalized_deltas"]
    assert out["top_normalized_deltas"]["a"] == 1.0


def test_store_serve_cases_name_registered_queries():
    """Every serve-only bench case isolates the serving path of a
    REAL registered query (same geometry), so the serve_s numbers in
    BENCH_MEDIANS.json are attributable — not to queries that must
    also be HEADLINE rows (the in-query builds of q_ann_ivfpq_stored
    / q_ann_pq_batch are deliberately kept out of the headline)."""
    from chill_spark import queries as Q
    from chill_spark.bench_stores import store_cases

    for name in store_cases():
        assert name in Q._REGISTRY, (
            f"store-serve case {name} names no registered query"
        )


def test_new_store_serve_cases_run_and_keep_their_plans(spark, sf_dir):
    """The r8 verdict's order #3: the gram-index probe and the Bloom
    gate get serve-only bench coverage WITH plan gates bound to the
    exact serve legs bench.py times — a probe-plan regression (lost
    BKT_PART pruning; a shuffle sneaking into the gate) must fail
    here, not hide inside build noise."""
    import shutil

    from chill_spark.bench_stores import store_cases

    cases = store_cases()

    build, serve = cases["q_substring_dedup_incremental"]
    ctx = build(spark, sf_dir)
    try:
        df = serve(spark, sf_dir, ctx)
        plan = df._jdf.queryExecution().executedPlan().toString()
        pf = [l for l in plan.splitlines()
              if "PartitionFilters" in l and "BKT_PART" in l]
        assert pf, "serve probe lost its BKT_PART partition filter"
        assert df.count() >= 0
    finally:
        shutil.rmtree(ctx["root"], ignore_errors=True)

    build, serve = cases["q_decontam_bloom"]
    ctx = build(spark, sf_dir)
    try:
        df = serve(spark, sf_dir, ctx)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # probe stage is map-only: the only join is the broadcast
        # 1-row carrier, and the only Exchange is the one-row-per-doc
        # aggregate (never a join shuffle, never a sort)
        assert "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan
        assert "Exchange rangepartitioning" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row carrier
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        assert df.count() > 0
    finally:
        shutil.rmtree(ctx["root"], ignore_errors=True)


def test_prep_v3_probe_serve_case_plan(spark, sf_dir):
    """The r10 verdict's order #5: q_corpus_prep_v3's headline median
    times the in-query suite fingerprinting; production runs
    --bench-store against a frozen index. The serve split must run
    the WHOLE chain with the scrub stage probing the persisted store
    — BKT_PART PartitionFilters on the probe scan, no fresh
    benchmark-side gram derivation (exactly one distinct-fp probe
    frame, read from parquet), and the chain's own no-cartesian
    contract intact."""
    import shutil

    from chill_spark.bench_stores import store_cases

    build, serve = store_cases()["q_corpus_prep_v3"]
    ctx = build(spark, sf_dir)
    try:
        df = serve(spark, sf_dir, ctx)
        plan = df._jdf.queryExecution().executedPlan().toString()
        pf = [l for l in plan.splitlines()
              if "PartitionFilters" in l and "BKT_PART" in l]
        assert pf, "v3 probe leg lost its BKT_PART partition filter"
        assert "CartesianProduct" not in plan, plan
        # the benchmark side must come from the store scan, not be
        # re-fingerprinted: the only scans of the documents table are
        # the corpus side's
        store_scans = plan.count(ctx["store"])
        assert store_scans >= 1, "probe does not read the persisted store"
        assert df.count() > 0
    finally:
        shutil.rmtree(ctx["root"], ignore_errors=True)


def test_cpu_calibration_parallel_positive_and_repeatable():
    """Same contract as the serial canary, full-width: fixed work on
    every core, so two immediate readings agree within a generous
    noise band (the multi-core path has more scheduler jitter than
    the serial one, hence 40%)."""
    a = bench.cpu_calibration_parallel(reps=2, loops=15)
    b = bench.cpu_calibration_parallel(reps=2, loops=15)
    assert a > 0 and b > 0
    assert abs(a - b) / max(a, b) < 0.40


def test_compare_medians_prefers_parallel_calib():
    """When both rounds carry calib_par_s the normalization must use
    it (the serial canary cannot see multi-core contention — the r8
    raw-0.74x/calib-1.16 contradiction); without it on either side,
    fall back to the serial canary and say so."""
    prev = {"medians": {"a": 1.0}, "calib_s": 0.24, "calib_par_s": 0.40}
    cur = {"medians": {"a": 1.5}, "calib_s": 0.24, "calib_par_s": 0.60}
    out = bench.compare_medians(prev, cur)
    assert out["calib_source"] == "parallel"
    assert out["calib_ratio"] == 1.5
    assert out["normalized_ratio"] == 1.0
    out2 = bench.compare_medians(
        {"medians": {"a": 1.0}, "calib_s": 0.24}, cur
    )
    assert out2["calib_source"] == "serial"
    assert out2["calib_ratio"] == 1.0


def test_interleaved_medians_survive_a_contiguous_burst():
    """The r9 driver artifact's failure mode, reproduced: a sustained
    mid-run load burst inflates everything it overlaps. Back-to-back
    reps put all 3 reps of a band of queries inside the burst (median
    keeps the inflated reading); interleaved passes let the burst
    touch each query's reps at most once, so the median discards it.
    Also pins the execution order (pass-major) and the per-rep load
    stamps that make a poisoned reading detectable after the fact."""
    names = [f"q{i}" for i in range(6)]
    calls = []
    clock = [0.0]
    # burst window in fake-clock time: everything running inside
    # [6.0, 12.0) takes 5x longer
    BURST = (6.0, 12.0)

    def run_one(name):
        calls.append(name)
        base = 1.0
        dur = base * (5.0 if BURST[0] <= clock[0] < BURST[1] else 1.0)
        clock[0] += dur

    def timer():
        return clock[0]

    def fake_loadavg():
        return (9.0 if BURST[0] <= clock[0] < BURST[1] else 0.1, 0, 0)

    medians, spread, loads = bench.interleaved_medians(
        names, run_one, reps=3, getloadavg=fake_loadavg, timer=timer,
    )
    # pass-major order: every name once per pass
    assert calls == names * 3
    # the burst covered ~1 rep per query; the median of [1, 1, 5] is 1
    assert all(m == 1.0 for m in medians.values()), medians
    # ...but the spread and the load stamps still record that it happened
    assert any(s[1] == 5.0 for s in spread.values())
    assert any(9.0 in ls for ls in loads.values())
    assert all(len(ls) == 3 for ls in loads.values())


def test_spread_sidecar_schema_carries_per_rep_loads():
    """BENCH_SPREAD.json is the after-the-fact poisoning detector:
    it must carry per-query per-rep load stamps and say that the run
    interleaved. Reconstruct the doc exactly as main() writes it and
    pin the keys."""
    spread_doc = {
        "spread": {"q1": [0.5, 0.7]},
        "loads": {"q1": [0.1, 0.2, 0.1]},
        "serve_loads": {"q_ann_pq_stored": [0.1, 0.1, 0.1]},
        "interleaved": True,
        "reps": 3,
        "sf": 0.1,
    }
    # the committed artifact must parse and keep these keys — a
    # refactor that drops them silently kills the detector
    doc = json.loads(json.dumps(spread_doc))
    assert set(doc) == {
        "spread", "loads", "serve_loads", "interleaved", "reps", "sf",
    }
    import inspect

    src = inspect.getsource(bench.main)
    for key in ("\"loads\": loads_by_q", "\"serve_loads\": serve_loads",
                "\"interleaved\": True"):
        assert key in src, f"bench.main no longer writes {key} into the sidecar"


def test_classifier_serve_case_keeps_broadcast_model_plan(spark, sf_dir):
    """The r9 verdict's order #6: scoring against a pre-trained
    weights table must stay one BROADCAST model join over the exploded
    tokens plus exactly one per-doc aggregate Exchange — a lost
    broadcast (vocab-sized side shuffling the whole token stream) or
    a second shuffle is the regression this serve split exists to
    catch."""
    import shutil

    from chill_spark.bench_stores import store_cases

    build, serve = store_cases()["q_classifier_calibration"]
    ctx = build(spark, sf_dir)
    try:
        df = serve(spark, sf_dir, ctx)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        assert df.count() > 0
    finally:
        shutil.rmtree(ctx["root"], ignore_errors=True)


def test_attribution_report_serve_case_reads_state_only(spark, sf_dir):
    """The attribution serve split must answer from store state: no
    scan of the documents table in the report plan (a corpus
    re-fingerprint regression), broadcast-only joins, and rows for
    every suite doc with >= 1 gram."""
    import shutil

    from chill_spark.bench_stores import store_cases

    build, serve = store_cases()["q_contamination_incremental"]
    ctx = build(spark, sf_dir)
    try:
        df = serve(spark, sf_dir, ctx)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "documents" not in plan, "report re-reads the corpus"
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan
        assert df.count() > 0
    finally:
        shutil.rmtree(ctx["root"], ignore_errors=True)

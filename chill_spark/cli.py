"""CLI entry — the Spark shape of ``chill.py main()`` (SURVEY §3.1).

The reference's end-to-end run (parse config -> run ETL -> drive the
external pipeline -> reconcile -> JUnit XML, chill.py:45-227) collapses
into engine subcommands; the daemon/sqlplus/scheduler middle band
(chill.py:103-194) is the engine itself.

``--job``/``--catalog`` accept JSON specs or the reference's own Excel
formats directly (Chill sheet .xlsx / HLD workbook .xlsx).

    python -m chill_spark run        --job job.json --catalog cat.json --out DIR
    python -m chill_spark stream     --job job.json --catalog cat.json --out DIR \
                                     --checkpoint DIR --columns a,b,c
    python -m chill_spark rollup     --catalog cat.json --table T --in DIR --out DIR
    python -m chill_spark reconcile  --catalog cat.json --table T \
                                     --expected DIR --actual DIR --report out.xml
    python -m chill_spark retention  --catalog cat.json --table T --in DIR \
                                     [--as-of 'YYYY-MM-DD HH:MM:SS'] [--apply]
    python -m chill_spark dedup      --in DIR --out DIR [--method exact|near] \
                                     [--threshold 0.7] [--bands 8]
    python -m chill_spark dedup-stream --in DIR --out DIR --store DIR \
                                     --checkpoint DIR [--drain]
    python -m chill_spark sketch     --in DIR --store DIR \
                                     [--bucket-partitions N]
    python -m chill_spark sketch-compact --store DIR
    python -m chill_spark emb-sketch  --in DIR --store DIR
    python -m chill_spark emb-dedup-stream --in DIR --out DIR --store DIR \
                                     --checkpoint DIR [--drain]
    python -m chill_spark ladder-audit --catalog cat.json --table T \
                                     --base DIR --out LADDER_DIR
    python -m chill_spark sql        "SELECT ..." --tables DIR [--out DIR]
    python -m chill_spark compact    --in DIR [--target-mb 128]
    python -m chill_spark segdedup   --input DIR --out DIR [--seg-tokens 16]
    python -m chill_spark mix        --input DIR [--alpha 0.3] \
                                     [--out DIR --budget-frac 0.5 \
                                      [--threshold-buckets 1000]]
    python -m chill_spark semdedup   --input DIR --out DIR [--k 8] [--tau 0.4]
    python -m chill_spark dsir       --input DIR --out DIR \
                                     --target-expr "lang = 'en'" --n 1000
    python -m chill_spark upsert     --target DIR --updates PATH --keys K1,K2 \
                                     [--evolve] [--stream --schema S \
                                     --checkpoint DIR --version-col V]
    python -m chill_spark profile    --in DIR [--columns a,b] [--approx]
                                     [--diff DIR_B]
"""

from __future__ import annotations

import argparse
import sys

from .catalog.model import Catalog
from .config.model import JobSpec


def _load(path: str, cls):
    """Load a JobSpec/Catalog from JSON — or straight from the
    reference's Excel formats (Chill sheet / HLD workbook,
    Partrans.py:40-96 / ParseHLD.py:52-63) when given a .xlsx path, so
    a reference user's existing configs run unmodified."""
    if path.endswith((".xlsx", ".xlsm")):
        from .config.excel import load_chill_xlsx, load_hld_xlsx

        return load_chill_xlsx(path) if cls is JobSpec else load_hld_xlsx(path)
    with open(path) as f:
        return cls.from_json(f.read())


def cmd_run(args) -> int:
    from .pipeline import run_batch
    from .session import get_spark

    spark = get_spark("chill-run")
    job = _load(args.job, JobSpec)
    cat = _load(args.catalog, Catalog)
    res = run_batch(spark, job, cat, args.out)
    for t, path in res.written.items():
        print(f"{t}: {path} ({len(res.datetimes[t])} period(s))")
    if res.derive_errors:
        print(f"{len(res.derive_errors)} derive error(s)", file=sys.stderr)
        for e in res.derive_errors[:20]:
            print(f"  {e}", file=sys.stderr)
    return 0


def cmd_stream(args) -> int:
    from .session import get_spark
    from .streaming import drain, run_stream

    spark = get_spark("chill-stream")
    job = _load(args.job, JobSpec)
    cat = _load(args.catalog, Catalog)
    # Default: every table's raw columns, deduped order-preserving —
    # tables sharing key columns must not yield duplicate schema
    # fields (the CSV reader rejects those). The reader fails fast if
    # this order disagrees with the file header (enforceSchema=false
    # in stream_csv_source), rather than silently mis-assigning.
    columns = args.columns.split(",") if args.columns else _default_columns(cat)
    q = run_stream(
        spark, job, cat,
        out_dir=args.out,
        checkpoint_dir=args.checkpoint,
        columns=columns,
        trigger_seconds=args.trigger,
        available_now=args.drain,
        quarantine_dir=args.quarantine,
        ladder_root=args.ladder_root,
        ladder_levels=args.ladder_levels.split(",") if args.ladder_levels else None,
    )
    if args.drain:
        drain(q)
    else:
        q.awaitTermination()
    return 0


def cmd_rollup(args) -> int:
    from .operators.rollup import build_ladder
    from .operators.writers import read_fact, write_fact
    from .session import get_spark

    spark = get_spark("chill-rollup")
    cat = _load(args.catalog, Catalog)
    table = cat.tables[args.table]
    base = read_fact(spark, args.input)
    for level, df in build_ladder(base, table).items():
        path = f"{args.out}/{table.name}_{level}"
        write_fact(df, path)
        print(f"{table.name}_{level}: {path}")
    return 0


def cmd_reconcile(args) -> int:
    from .reconcile import compare_tables
    from .report import build_report
    from .session import get_spark

    spark = get_spark("chill-reconcile")
    cat = _load(args.catalog, Catalog)
    table = cat.tables[args.table]
    expected = spark.read.parquet(args.expected)
    if args.actual.startswith("jdbc:"):
        # live-DB compare (the reference's posture: expected files vs
        # the actual Oracle table, HlxTools.py:396-450) with the
        # DATETIME predicate pushed down to the database
        from .operators.writers import read_fact_jdbc

        if not args.actual_table:
            print("--actual-table is required with a jdbc: actual",
                  file=sys.stderr)
            return 2
        props = {}
        if args.jdbc_driver:
            props["driver"] = args.jdbc_driver
        dts = args.datetimes or [
            r[0] for r in expected.select("DATETIME").distinct().collect()
        ]
        actual = read_fact_jdbc(
            spark, args.actual, args.actual_table, datetimes=dts,
            properties=props,
        )
    else:
        actual = spark.read.parquet(args.actual)
    rep = compare_tables(
        expected, actual, table.name,
        keys=table.key_fields,
        counters=[c.db_name for c in table.counters],
    )
    report = build_report([rep])
    if args.expect_not_null or args.expect_unique:
        from .reconcile.expectations import (
            check_expectations, expectations_report, not_null, unique,
        )

        exps = []
        if args.expect_not_null:
            exps.append(not_null(*args.expect_not_null.split(",")))
        if args.expect_unique:
            exps.append(unique(*args.expect_unique.split(",")))
        report.merge(
            expectations_report(table.name, check_expectations(actual, exps))
        )
    if args.store_health:
        from .report.store_health import (
            journal_freshness,
            store_health_report,
        )

        healths = {}
        for spec in args.store_health:
            name, _, rest = spec.partition("=")
            if not rest:
                print(f"--store-health wants NAME=ROOT[:SUBDIR], got "
                      f"{spec!r}", file=sys.stderr)
                return 2
            root, sep, subdir = rest.rpartition(":")
            # a URI root ("s3://bucket/store") has no :SUBDIR — the
            # suffix is only a subdir when it's a bare dir name
            if not sep or not subdir or "/" in subdir:
                root, subdir = rest, "grams"
            healths[name] = journal_freshness(
                spark, root, data_subdir=subdir,
                max_lag=args.store_health_max_lag,
            )
        report.merge(store_health_report(healths))
    xml = report.to_xml()
    if args.report:
        with open(args.report, "w") as f:
            f.write(xml)
        print(f"wrote {args.report}")
    else:
        print(xml)
    return 0 if report.passed else 1


def cmd_retention(args) -> int:
    from datetime import datetime

    from .operators.retention import apply_retention, expired_partitions
    from .session import get_spark

    spark = get_spark("chill-retention")
    cat = _load(args.catalog, Catalog)
    table = cat.tables[args.table]
    granularity = args.granularity or table.base_granularity
    now = (
        datetime.fromisoformat(args.as_of) if args.as_of else datetime.utcnow()
    )
    expired = expired_partitions(spark, args.input, granularity, now)
    print(f"{len(expired)} expired partition(s)")
    if args.apply:
        apply_retention(spark, args.input, granularity, now)
        print("removed")
    return 0


def cmd_dedup(args) -> int:
    from .llm_ops.dedup import dedup_exact, dedup_minhash_cc
    from .session import get_spark

    spark = get_spark("chill-dedup")
    df = spark.read.parquet(args.input)
    n = df.count()
    skips = None
    if args.method == "exact":
        kept = dedup_exact(df, args.text_col, args.id_col)
    else:
        from .llm_ops.dedup import minhash_bucket_stats, shingle_sets

        # shingle once, share the persisted sets between the dedup and
        # the skip-diagnostics job (a plan-attached Observation would
        # be free, but AQE's empty-relation propagation loses it when
        # the capped pipeline yields zero pairs — the exact degenerate
        # case the diagnostic exists for)
        sets_df = shingle_sets(df, args.text_col, args.id_col).persist()
        skips = minhash_bucket_stats(
            df, args.text_col, args.id_col, bands=args.bands,
            max_bucket_size=args.max_bucket, sets_df=sets_df,
        )
        kept = dedup_minhash_cc(
            df, args.text_col, args.id_col,
            threshold=args.threshold, bands=args.bands,
            max_bucket_size=args.max_bucket, sets_df=sets_df,
        )
    kept.write.mode("overwrite").parquet(args.out)
    k = spark.read.parquet(args.out).count()
    print(f"{n} -> {k} rows ({n - k} removed, method={args.method})")
    if skips and skips["oversize_buckets"]:
        # no silent skips: degenerate buckets above --max-bucket were
        # excluded from pair expansion (boilerplate policy)
        print(
            f"skipped {skips['oversize_buckets']} oversize LSH bucket(s) "
            f"({skips['oversize_members']} member rows) above "
            f"--max-bucket={args.max_bucket}; raise it to force "
            "pair expansion",
            file=sys.stderr,
        )
    return 0


def cmd_substring_dedup(args) -> int:
    """Exact-substring span dedup (duplicated >= L-token runs,
    corpus-wide, one canonical keeper). Batch mode writes spans /
    cleaned docs / per-doc stats; ``--store`` maintains the
    incremental gram-fingerprint index (--build / --append /
    --compact / default: span-check --in against history)."""
    from .session import get_spark

    spark = get_spark("chill-substring")
    df = spark.read.parquet(args.input) if args.input else None
    if args.store and args.watch and args.scrub:
        from .streaming import drain
        from .streaming.scrub_stream import run_scrub_stream

        if not args.out:
            print("substring-dedup --watch --scrub: --out required",
                  file=sys.stderr)
            return 2
        q = run_scrub_stream(
            spark, args.watch,
            f"{args.id_col} BIGINT, {args.text_col} STRING",
            out_dir=args.out, store_root=args.store,
            checkpoint_dir=f"{args.out}/_ckpt",
            text_col=args.text_col, id_col=args.id_col,
            available_now=True,
        )
        drain(q)
        print(f"drained watched docs: benchmark-scrubbed corpus at "
              f"{args.out} (index {args.store} frozen)")
        return 0
    if args.store and args.watch:
        from .streaming import drain
        from .streaming.substring_stream import run_substring_stream

        if not args.out:
            print("substring-dedup --watch: --out required",
                  file=sys.stderr)
            return 2
        q = run_substring_stream(
            spark, args.watch,
            f"{args.id_col} BIGINT, {args.text_col} STRING",
            out_dir=args.out, store_root=args.store,
            checkpoint_dir=f"{args.store}/_ckpt",
            text_col=args.text_col, id_col=args.id_col,
            L=args.length, bucket_partitions=args.buckets,
            available_now=True,
        )
        drain(q)
        print(f"drained watched docs: span-cleaned corpus at {args.out}, "
              f"gram index at {args.store}")
        return 0
    if args.store:
        from .llm_ops.incremental_substring import (
            compact_substring_store,
            incremental_duplicate_spans,
            substring_store_append,
            substring_store_forget,
            substring_store_stats,
            write_substring_store,
        )

        if args.compact:
            compact_substring_store(spark, args.store)
            print(f"compacted substring store {args.store}")
            return 0
        if args.health:
            import json as _json

            print(_json.dumps(substring_store_stats(spark, args.store)))
            return 0
        if args.journal:
            import json as _json

            from .llm_ops.storefs import read_health_events

            for ev in read_health_events(args.store, spark=spark):
                print(_json.dumps(ev))
            return 0
        if args.forget_rebuild:
            if df is None:
                print("substring-dedup --forget-rebuild: --in must be "
                      "the SURVIVING corpus", file=sys.stderr)
                return 2
            rep = substring_store_forget(
                df, args.text_col, args.id_col, args.store
            )
            print(f"rebuilt gram index from surviving corpus: "
                  f"{rep['fps_distinct']} distinct fingerprints")
            return 0
        if args.scrub:
            if df is None or not args.out:
                print("substring-dedup --scrub: --in and --out required",
                      file=sys.stderr)
                return 2
            from pyspark.sql import functions as F

            from .llm_ops.incremental_substring import store_overlap_spans
            from .llm_ops.substring import apply_span_removal

            # mirror the streaming scrub's routing: NULL-id rows can't
            # ride the rewrite join (inner equi-join never matches a
            # NULL key — they'd silently vanish), and NULL-text rows
            # pass through unchanged instead of being rendered as ''
            n_null_id = df.filter(F.col(args.id_col).isNull()).count()
            keyed = df.filter(F.col(args.id_col).isNotNull())
            null_text = keyed.filter(F.col(args.text_col).isNull())
            docs = keyed.filter(F.col(args.text_col).isNotNull())
            spans = store_overlap_spans(
                spark, args.store, docs, args.text_col, args.id_col
            )
            cleaned = apply_span_removal(
                docs, spans, args.text_col, args.id_col
            )
            out = (
                docs.drop(args.text_col)
                .join(cleaned, args.id_col)
                .withColumnRenamed("cleaned", args.text_col)
                .unionByName(null_text)
            )
            out.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            print(f"scrubbed {n} doc(s) against benchmark index "
                  f"{args.store} -> {args.out}"
                  + (f" (dropped {n_null_id} NULL-id doc(s))"
                     if n_null_id else ""))
            return 0
        if df is None:
            print("substring-dedup: --in required", file=sys.stderr)
            return 2
        if args.build:
            write_substring_store(
                df, args.text_col, args.id_col, args.store,
                L=args.length, bucket_partitions=args.buckets,
            )
            print(f"built substring store {args.store} (L={args.length})")
            return 0
        if args.append:
            b = substring_store_append(
                df, args.text_col, args.id_col, args.store
            )
            print(f"appended batch {b} to {args.store}")
            return 0
        spans = incremental_duplicate_spans(
            spark, args.store, df, args.text_col, args.id_col
        )
        if args.out:
            spans.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
        else:
            n = spans.count()
        print(f"{n} duplicated span(s) in the new batch vs history")
        return 0
    if df is None or not args.out:
        print("substring-dedup: --in and --out required", file=sys.stderr)
        return 2
    from .llm_ops.substring import (
        duplicate_spans,
        remove_spans,
        substring_dedup_stats,
    )

    fn = {
        "spans": duplicate_spans,
        "clean": remove_spans,
        "stats": substring_dedup_stats,
    }[args.mode]
    fn(df, args.text_col, args.id_col, args.length).write.mode(
        "overwrite"
    ).parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} {args.mode} row(s) to {args.out}")
    return 0


def cmd_profile(args) -> int:
    """One-pass table profile: per-column non-null/null/distinct
    counts and min/max (see operators.profile). With ``--diff B``,
    report column drift between the input (side a) and B (side b)
    instead — null fractions, NDVs, min/max, and b/a ratios."""
    from .operators.profile import profile, profile_diff
    from .session import get_spark

    spark = get_spark("chill-profile")
    df = spark.read.parquet(args.input)
    cols = (
        [c.strip() for c in args.columns.split(",") if c.strip()]
        if args.columns else None
    )
    if args.diff:
        other = spark.read.parquet(args.diff)
        for r in profile_diff(df, other, cols, approx=args.approx).collect():
            print(
                f"{r['column']}: rows {r['n_rows_a']}->{r['n_rows_b']} "
                f"(x{r['row_ratio']}) ndv {r['ndv_a']}->{r['ndv_b']} "
                f"(x{r['ndv_ratio']}) null_frac {r['null_frac_a']}->"
                f"{r['null_frac_b']} min {r['min_a']}->{r['min_b']} "
                f"max {r['max_a']}->{r['max_b']}"
            )
        return 0
    rows = profile(df, cols, approx=args.approx).collect()
    if rows:
        print(f"rows: {rows[0]['n_rows']}")
    for r in rows:
        print(
            f"{r['column']}: nonnull={r['n_nonnull']} null={r['n_null']} "
            f"distinct={r['n_distinct']} min={r['min_val']} "
            f"max={r['max_val']}"
        )
    return 0


def cmd_compact(args) -> int:
    from .operators.writers import compact_partitions, small_file_report
    from .session import get_spark

    spark = get_spark("chill-compact")
    if args.dry_run:
        rows = small_file_report(
            spark, args.input,
            target_file_bytes=args.target_mb * 1024 * 1024,
        ).collect()  # partition-count-sized
        flagged = 0
        for r in rows:
            mark = "COMPACT" if r["needs_compaction"] else "ok"
            flagged += r["needs_compaction"]
            print(
                f"{r['partition']}: {r['n_files']} file(s), "
                f"{r['total_bytes']} bytes, avg {r['avg_file_bytes']} "
                f"-> {mark}"
            )
        print(f"{flagged}/{len(rows)} partition(s) would be compacted")
        return 0
    done = compact_partitions(
        spark, args.input, target_file_bytes=args.target_mb * 1024 * 1024
    )
    for k, n in sorted(done.items()):
        print(f"{k}: rewritten to {n} file(s)")
    print(f"{len(done)} partition(s) compacted")
    return 0


def cmd_corpus_prep(args) -> int:
    """One-shot production prep chain (llm_ops/prep.py): [benchmark
    scrub ->] substring self-dedup -> repetition/length filter ->
    exact dedup -> split -> pack. ``--bench-store`` wires a persisted
    benchmark gram index (``substring-dedup --build`` over the eval
    suites) into the scrub stage — the steady-state shape, probed
    with BKT_PART pruning instead of re-fingerprinting the suite."""
    from pyspark.sql import functions as F

    from .llm_ops.prep import corpus_prep
    from .session import get_spark

    spark = get_spark("chill-corpus-prep")
    df = spark.read.parquet(args.input)
    # every stage keys on the id; NULL-id rows can't ride any of the
    # joins — drop them loudly, like the batch scrub does (the count
    # is a single column-pruned scan of the id column)
    n_null_id = df.filter(F.col(args.id_col).isNull()).count()
    df = df.filter(F.col(args.id_col).isNotNull())
    out = corpus_prep(
        df, args.text_col, args.id_col, args.source_col,
        bench_store=args.bench_store, spark=spark,
        L=args.length, min_tokens=args.min_tokens,
        max_rep=args.max_rep, budget=args.budget,
    )
    out.write.mode("overwrite").parquet(args.out)
    # ONE scan of the written output for the whole report
    by_split = {
        r["split"]: r["n"]
        for r in spark.read.parquet(args.out)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(by_split.values())
    n_train = by_split.get("train", 0)
    print(
        f"corpus-prep: {n} surviving doc(s) ({n_train} train) -> "
        f"{args.out}"
        + (f" [scrubbed against benchmark index {args.bench_store}]"
           if args.bench_store else " [no benchmark scrub]")
        + (f" (dropped {n_null_id} NULL-id doc(s))" if n_null_id else "")
    )
    return 0


def cmd_attribution(args) -> int:
    """Steady-state contamination attribution (llm_ops/attribution.py):
    ``--build`` freezes the eval suite into the (bench_id, fp) gram
    index; ``--update`` folds a crawl batch into the running
    per-benchmark counters; ``--watch`` drains a JSONL dir through the
    streaming maintainer; ``--report`` reads 'which eval is burned'
    from benchmark-sized state — never a corpus re-fingerprint."""
    import json

    from .llm_ops.attribution import (
        attribution_report,
        attribution_update,
        write_attribution_store,
    )
    from .session import get_spark

    spark = get_spark("chill-attribution")
    if args.build:
        if not args.input:
            print("attribution --build: --in required", file=sys.stderr)
            return 2
        write_attribution_store(
            spark.read.parquet(args.input), args.text_col, args.id_col,
            args.store, L=args.length, bucket_partitions=args.buckets,
        )
        print(f"built attribution index at {args.store} (running "
              "counters reset)")
        return 0
    if args.update:
        if not args.input:
            print("attribution --update: --in required", file=sys.stderr)
            return 2
        b = attribution_update(
            spark, args.store, spark.read.parquet(args.input),
            args.text_col, args.id_col,
        )
        # heartbeat the health journal like the streaming maintainer
        # (counters-leaf frontier) so a manual-update workflow passes
        # the e2e Store Health gate instead of reading as an
        # un-journaled mutation
        from .llm_ops.storefs import StoreFS, write_health_event
        from .operators.writers import BATCH_COL

        fs = StoreFS(args.store, spark)
        n_appends = sum(
            1 for name in fs.list_dirs(f"{args.store}/counters")
            if name.startswith(f"{BATCH_COL}=")
        )
        write_health_event(
            args.store, b, {"n_append_batches": n_appends}, spark=spark
        )
        print(f"folded batch {b} into {args.store}")
        return 0
    if args.watch:
        from .streaming import drain
        from .streaming.attribution_stream import run_attribution_stream

        q = run_attribution_stream(
            spark, args.watch,
            f"{args.id_col} BIGINT, {args.text_col} STRING",
            store_root=args.store,
            checkpoint_dir=f"{args.store}/_ckpt",
            text_col=args.text_col, id_col=args.id_col,
            available_now=True,
        )
        drain(q)
        print(f"drained watched docs into attribution counters at "
              f"{args.store}")
        return 0
    if args.journal:
        from .llm_ops.storefs import read_health_events

        for ev in read_health_events(args.store, spark=spark):
            print(json.dumps(ev, sort_keys=True))
        return 0
    # default: the report
    rep = attribution_report(spark, args.store).orderBy("bench_id")
    if args.out:
        rep.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
        return 0
    for r in rep.collect():
        print(json.dumps(r.asDict(), sort_keys=True))
    return 0


def cmd_quality(args) -> int:
    from pyspark.sql import functions as F

    from .llm_ops.text import gopher_quality_flags
    from .session import get_spark

    spark = get_spark("chill-quality")
    df = spark.read.parquet(args.input)
    flags = gopher_quality_flags(args.text_col)
    # __q_-prefixed flag columns so an input that already has a column
    # named keep/r_words/... is neither clobbered nor dropped.
    names = {n: f"__q_{n}" for n in flags}
    flagged = df.select("*", *[c.alias(names[n]) for n, c in flags.items()])
    # rule tallies ride the write action via observe — one scan total
    from pyspark.sql import Observation

    obs = Observation("chill_quality")
    flagged = flagged.observe(
        obs,
        *[
            F.sum(F.when(~F.col(names[r]), 1).otherwise(0)).alias(r)
            for r in flags if r != "keep"
        ],
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col(names["keep"]), 1).otherwise(0)).alias("kept"),
    )
    kept = flagged.filter(F.col(names["keep"])).drop(*names.values())
    kept.write.mode("overwrite").parquet(args.out)
    tallies = dict(obs.get)
    for r in flags:
        if r != "keep":
            print(f"fail {r}: {tallies[r]}")
    print(f"{tallies['total']} -> {tallies['kept']} rows kept")
    return 0


def cmd_segdedup(args) -> int:
    """Corpus-wide segment dedup (CCNet paragraph-dedup shape on token
    windows): keep each segment's first occurrence, reassemble docs."""
    from .llm_ops.dedup import segment_dedup
    from .session import get_spark

    spark = get_spark("chill-segdedup")
    df = spark.read.parquet(args.input)
    out = segment_dedup(
        df, args.text_col, args.id_col, seg_tokens=args.seg_tokens
    )
    out.write.mode("overwrite").parquet(args.out)
    from pyspark.sql import functions as F

    # totals come from the INPUT: a fully-deduplicated doc is absent
    # from the output, and summing n_segments over survivors only
    # would overstate retention
    from .llm_ops.chunking import tokenize_ws
    from .llm_ops.text import normalize_text

    n = F.size(tokenize_ws(normalize_text(args.text_col)))
    totals = df.agg(
        F.count("*").alias("docs"),
        F.sum(
            F.floor(F.greatest(n - 1, F.lit(0)) / args.seg_tokens) + 1
        ).alias("segs"),
    ).first()
    stats = spark.read.parquet(args.out).agg(
        F.count("*").alias("docs"), F.sum("n_kept").alias("kept")
    ).first()
    print(
        f"{totals['docs']} -> {stats['docs']} docs: "
        f"{stats['kept']}/{totals['segs']} segments kept"
    )
    return 0


def cmd_semdedup(args) -> int:
    """SemDeDup semantic dedup: k-means blocking, within-cluster
    cosine edges, one least-centroid-similar survivor per duplicate
    group; writes the survivor rows."""
    from pyspark.sql import functions as F

    from .llm_ops.semantic import semantic_dedup
    from .session import get_spark

    spark = get_spark("chill-semdedup")
    df = spark.read.parquet(args.input)
    k = args.k
    if args.target_cluster_size:
        from .llm_ops.semantic import plan_semdedup_k

        k = plan_semdedup_k(df.count(), args.target_cluster_size)
        print(f"planned k={k} for target cluster size "
              f"{args.target_cluster_size}")
    verdicts = semantic_dedup(
        df, k=k, iters=args.iters, tau=args.tau,
        vec_col=args.vec_col, id_col=args.id_col,
    )
    keep = verdicts.filter(F.col("kept")).select(
        F.col("id").alias(args.id_col)
    )
    df.join(keep, args.id_col).write.mode("overwrite").parquet(args.out)
    n_in = df.count()
    n_out = spark.read.parquet(args.out).count()
    print(f"{n_in} -> {n_out} rows kept ({n_in - n_out} semantic dups)")
    return 0


def cmd_dsir(args) -> int:
    """DSIR importance selection: keep the n raw-pool rows most like
    the --target-expr rows by hashed-n-gram importance weight."""
    from pyspark.sql import functions as F

    from .llm_ops.selection import dsir_select
    from .session import get_spark

    spark = get_spark("chill-dsir")
    df = spark.read.parquet(args.input)
    sel = dsir_select(
        df, F.expr(args.target_expr), n=args.n,
        text_col=args.text_col, id_col=args.id_col,
        n_buckets=args.buckets,
    )
    out = df.join(
        sel.withColumnRenamed("id", args.id_col).select(args.id_col, "logw"),
        args.id_col,
    )
    out.write.mode("overwrite").parquet(args.out)
    got = spark.read.parquet(args.out).agg(
        F.count("*").alias("n"),
        F.min("logw").alias("lo"), F.max("logw").alias("hi"),
    ).first()
    print(f"selected {got['n']} rows, logw [{got['lo']}, {got['hi']}]")
    return 0


def cmd_mix(args) -> int:
    """Temperature-scaled source-mixture weights + optional budget
    selection: print per-source target shares and multipliers; with
    --budget-frac also write the per-source quality-budget selection."""
    from pyspark.sql import functions as F

    from .llm_ops.chunking import tokenize_ws
    from .llm_ops.sampling import (
        budget_filter,
        budget_filter_threshold,
        temperature_mixture_weights,
    )
    from .llm_ops.text import normalize_text
    from .session import get_spark

    spark = get_spark("chill-mix")
    df = spark.read.parquet(args.input)
    toks = F.size(tokenize_ws(normalize_text(args.text_col)))
    weights = temperature_mixture_weights(
        df.select(args.group_col, toks.alias("__tok")),
        args.group_col, "__tok", alpha=args.alpha,
    ).orderBy(args.group_col)
    for r in weights.collect():  # model-sized: one row per source
        print(
            f"{r[args.group_col]}: tokens={r['tokens']} "
            f"p_target={r['p_target']} multiplier={r['multiplier']}"
        )
    if (args.out is None) != (args.budget_frac is None):
        raise SystemExit(
            "mix: --out and --budget-frac go together (got only one); "
            "nothing was written"
        )
    if args.out is not None:
        if not 0 < args.budget_frac <= 1:
            raise SystemExit("mix: --budget-frac must be in (0, 1]")
        tk = tokenize_ws(normalize_text(args.text_col))
        base = df.withColumn(
            "__score",
            F.size(F.array_distinct(tk)).cast("double") / F.size(tk),
        ).withColumn("__toks", F.size(tk))
        if args.threshold_buckets:
            kept = budget_filter_threshold(
                base, args.id_col, args.group_col, "__score", "__toks",
                args.budget_frac, n_buckets=args.threshold_buckets,
            ).drop("__score", "__toks")
        else:
            kept = budget_filter(
                base, args.id_col, args.group_col, "__score", "__toks",
                args.budget_frac,
            ).drop("__score", "__toks")
        kept.write.mode("overwrite").parquet(args.out)
        print(f"budget selection written to {args.out}")
    return 0


def cmd_upsert(args) -> int:
    """Keyed SCD-1 merge of an updates parquet into a partitioned
    fact — only the touched periods are rewritten. With ``--stream``,
    watch the updates path continuously (CDC-style maintenance)."""
    from .operators.writers import merge_upsert
    from .session import get_spark

    spark = get_spark("chill-upsert")
    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    if args.stream:
        if not args.schema or not args.checkpoint:
            raise SystemExit(
                "upsert --stream needs --schema and --checkpoint"
            )
        from .streaming.stream import drain, run_upsert_stream

        q = run_upsert_stream(
            spark, args.updates, args.schema, args.target, keys=keys,
            checkpoint_dir=args.checkpoint,
            datetime_col=args.datetime_col,
            version_col=args.version_col,
            available_now=args.available_now,
            broadcast_keys=not args.bulk,
            evolve_schema=args.evolve,
        )
        if args.available_now:
            drain(q)
        else:
            q.awaitTermination()
        return 0
    updates = spark.read.parquet(args.updates)
    res = merge_upsert(
        spark, args.target, updates,
        keys=keys,
        datetime_col=args.datetime_col,
        broadcast_keys=not args.bulk,
        evolve_schema=args.evolve,
    )
    print(
        f"merged into {res['partitions']} partition(s); "
        f"{res['rows_written']} row(s) now in touched periods"
    )
    return 0


def cmd_ladder_audit(args) -> int:
    """Audit a materialized rollup ladder: re-aggregate each level from
    the base table and count disagreeing rows. Exit 0 iff consistent —
    the engine-native replacement for the reference's rollup-existence
    polling (HlxTools wait loops), checking the numbers instead."""
    from .llm_ops.storefs import StoreFS
    from .operators.incremental import validate_ladder
    from .session import get_spark

    spark = get_spark("chill-ladder-audit")
    cat = _load(args.catalog, Catalog)
    table = cat.tables[args.table]
    levels = (
        [x for x in args.levels.split(",") if x] if args.levels else None
    )
    # validate up front: a scripted audit's contract is a clean 0/1
    # exit, not a traceback from deep inside the rollup
    known = table.ladder_above_base()
    for g in levels or []:
        if g not in known:
            print(f"unknown ladder level {g!r} (valid: {known})",
                  file=sys.stderr)
            return 2
    fs = StoreFS(args.out, spark)  # Hadoop FS: --out may be remote
    for g in levels or known:
        if not fs.is_dir(f"{args.out}/{table.name}_{g}"):
            print(f"ladder level {g} not materialized under {args.out}",
                  file=sys.stderr)
            return 2
    bad = validate_ladder(spark, args.base, args.out, table, levels=levels)
    for g, n in bad.items():
        print(f"{g}: {n} inconsistent row(s)")
    return 0 if not any(bad.values()) else 1


def cmd_sql(args) -> int:
    """Ad-hoc SQL over a directory of parquet tables — the engine's
    answer to poking the warehouse with a SQL console (the reference
    drives Oracle via sqlplus/conqt REPLs; here Catalyst + the fact
    dirs ARE the warehouse). Every entry under --tables registers as a
    temp view named after it (``X_15M/`` dirs and ``x.parquet`` files
    both work). Only entries whose names appear in the query are
    registered (no parquet-footer I/O for unreferenced tables; all
    entries register when none match, e.g. quoted identifiers). Skips
    and name collisions are reported on stderr, never silent."""
    import os
    import re

    from .llm_ops.storefs import StoreFS
    from .session import get_spark

    spark = get_spark("chill-sql")
    # Hadoop FS listing, so --tables may point at hdfs://, s3a://, ...
    entries = sorted(StoreFS(args.tables, spark).list_children(args.tables))
    names = {
        e: (e[:-8] if e.endswith(".parquet") else e) for e in entries
    }
    q_words = {w.lower() for w in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", args.query)}
    wanted = [e for e in entries if names[e].lower() in q_words] or entries
    seen: dict[str, str] = {}
    for entry in wanted:
        path = os.path.join(args.tables, entry)
        name = names[entry]
        if not name.isidentifier():
            print(f"skipped {entry}: not a valid view name", file=sys.stderr)
            continue
        if name.lower() in seen:
            # temp-view resolution is case-insensitive; first wins
            print(
                f"skipped {entry}: view name collides with "
                f"{seen[name.lower()]}", file=sys.stderr,
            )
            continue
        try:
            spark.read.parquet(path).createOrReplaceTempView(name)
            seen[name.lower()] = entry
        except Exception as e:  # noqa: BLE001
            print(f"skipped {entry}: {str(e).splitlines()[0][:120]}",
                  file=sys.stderr)
            continue
    df = spark.sql(args.query)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


def cmd_sketch(args) -> int:
    """Bootstrap/refresh the MinHash sketch store from an existing
    corpus — the precursor to dedup-stream or offline incremental
    dedup against a corpus that wasn't ingested through the stream."""
    from .llm_ops.incremental_dedup import write_sketch_store
    from .session import get_spark

    spark = get_spark("chill-sketch")
    if getattr(args, "journal", False):
        import json as _json

        from .llm_ops.storefs import read_health_events

        for ev in read_health_events(args.store, spark=spark):
            print(_json.dumps(ev))
        return 0
    if getattr(args, "health", False):
        import json as _json

        from .llm_ops.incremental_dedup import (
            sketch_store_compact_decision,
        )

        print(_json.dumps(sketch_store_compact_decision(spark, args.store)))
        return 0
    if not args.input:
        print("sketch: --in required (unless --journal/--health)",
              file=sys.stderr)
        return 2
    df = spark.read.parquet(args.input)
    write_sketch_store(
        df, args.text_col, args.id_col, args.store,
        num_hashes=args.num_hashes, bands=args.bands,
        bucket_partitions=args.bucket_partitions,
    )
    n = spark.read.parquet(f"{args.store}/sets").count()
    print(f"sketch store at {args.store}: {n} doc(s)")
    return 0


def cmd_emb_sketch(args) -> int:
    """Bootstrap/refresh the hyperplane-bucket embedding store from an
    existing corpus — the precursor to emb-dedup-stream or offline
    incremental embedding dedup."""
    from .llm_ops.incremental_embedding import write_embedding_store
    from .session import get_spark

    spark = get_spark("chill-emb-sketch")
    if getattr(args, "journal", False):
        import json as _json

        from .llm_ops.storefs import read_health_events

        for ev in read_health_events(args.store, spark=spark):
            print(_json.dumps(ev))
        return 0
    if getattr(args, "health", False):
        import json as _json

        from .llm_ops.incremental_embedding import (
            embedding_store_compact_decision,
        )

        print(_json.dumps(
            embedding_store_compact_decision(spark, args.store)
        ))
        return 0
    if not args.input:
        print("emb-sketch: --in required (unless --journal/--health)",
              file=sys.stderr)
        return 2
    df = spark.read.parquet(args.input)
    write_embedding_store(
        df, args.vec_col, args.id_col, args.store,
        planes=args.planes, bands=args.bands,
    )
    n = spark.read.parquet(f"{args.store}/vectors").count()
    print(f"embedding store at {args.store}: {n} vector(s)")
    return 0


def cmd_emb_dedup_stream(args) -> int:
    from .session import get_spark
    from .streaming import drain
    from .streaming.dedup_stream import run_embedding_dedup_stream

    spark = get_spark("chill-emb-dedup-stream")
    q = run_embedding_dedup_stream(
        spark, args.input, args.schema,
        out_dir=args.out, store_root=args.store,
        checkpoint_dir=args.checkpoint,
        vec_col=args.vec_col, id_col=args.id_col,
        threshold=args.threshold, planes=args.planes, bands=args.bands,
        available_now=args.drain, trigger_seconds=args.trigger,
        quarantine_dir=args.quarantine,
    )
    if args.drain:
        drain(q)
    else:
        q.awaitTermination()
    return 0


def cmd_sketch_compact(args) -> int:
    """Collapse a multi-batch sketch store (one BATCH_PART leaf per
    micro-batch after long dedup-stream runs) to one leaf per side;
    the text vs embedding layout is detected from the store itself.
    Run only while no stream is writing the store."""
    from .llm_ops.incremental_dedup import compact_sketch_store
    from .llm_ops.storefs import StoreFS
    from .session import get_spark

    spark = get_spark("chill-sketch-compact")
    # detect the layout from the store instead of trusting a flag:
    # both store kinds share a "banded" side, so a mis-declared kind
    # would half-compact and report success. Check the aside/temp
    # markers too — a compaction that died mid-swap leaves the primary
    # side renamed, and misrouting the retry would defeat the healing.
    # Probing goes through the Hadoop FS so remote roots detect too.
    fs = StoreFS(args.store, spark)
    is_embedding = any(
        fs.is_dir(f"{args.store}/{d}")
        for d in ("vectors", "vectors__old", "vectors__compacting")
    )
    if is_embedding:
        from .llm_ops.incremental_embedding import compact_embedding_store

        done = compact_embedding_store(
            spark, args.store, target_file_bytes=args.target_file_bytes
        )
    else:
        done = compact_sketch_store(
            spark, args.store, target_file_bytes=args.target_file_bytes
        )
    for side, n in sorted(done.items()):
        print(f"compacted {args.store}/{side}: {n} file(s)")
    return 0


def cmd_dedup_stream(args) -> int:
    from .session import get_spark
    from .streaming import drain
    from .streaming.dedup_stream import run_dedup_stream

    spark = get_spark("chill-dedup-stream")
    q = run_dedup_stream(
        spark, args.input, args.schema,
        out_dir=args.out, store_root=args.store,
        checkpoint_dir=args.checkpoint,
        text_col=args.text_col, id_col=args.id_col,
        threshold=args.threshold, num_hashes=args.num_hashes,
        bands=args.bands,
        available_now=args.drain, trigger_seconds=args.trigger,
        quarantine_dir=args.quarantine,
    )
    if args.drain:
        drain(q)
    else:
        q.awaitTermination()
    return 0


def cmd_exact_dedup_stream(args) -> int:
    from .session import get_spark
    from .streaming import drain
    from .streaming.exact_dedup_stream import run_exact_dedup_stream

    spark = get_spark("chill-exact-dedup-stream")
    q = run_exact_dedup_stream(
        spark, args.input, args.schema,
        out_dir=args.out, store_root=args.store,
        checkpoint_dir=args.checkpoint,
        text_col=args.text_col, id_col=args.id_col,
        num_bits=args.bits, num_hashes=args.hashes,
        available_now=args.drain, trigger_seconds=args.trigger,
        quarantine_dir=args.quarantine,
    )
    if args.drain:
        drain(q)
    else:
        q.awaitTermination()
    return 0


def cmd_decontam_stream(args) -> int:
    from .session import get_spark
    from .streaming import drain
    from .streaming.decontam_stream import run_decontam_stream

    spark = get_spark("chill-decontam-stream")
    q = run_decontam_stream(
        spark, args.input, args.schema,
        out_dir=args.out, bloom_root=args.bloom,
        checkpoint_dir=args.checkpoint,
        text_col=args.text_col, id_col=args.id_col, n=args.n,
        available_now=args.drain, trigger_seconds=args.trigger,
        flagged_dir=args.flagged, quarantine_dir=args.quarantine,
    )
    if args.drain:
        drain(q)
    else:
        q.awaitTermination()
    return 0


def _default_columns(cat: Catalog) -> list[str]:
    """Every table's raw columns, deduped order-preserving."""
    return list(
        dict.fromkeys(
            s.raw_name
            for t in cat.tables.values()
            for s in t.stored_columns
            if s.raw_name
        )
    )


def cmd_e2e(args) -> int:
    """One-command end-to-end run mirroring the reference's chill.py
    main() (chill.py:45-227): ingest -> derive -> load partitioned
    facts -> rollup ladder -> reconcile -> five-suite JUnit XML, in a
    single invocation. ``--stream`` ingests through the Structured
    Streaming path (drained availableNow) instead of the batch one;
    the reconcile then doubles as the stream=batch agreement check,
    since the expected side is always the batch derivation plan over
    the same input files."""
    import os

    from .operators.rollup import build_ladder
    from .operators.writers import read_fact, write_fact
    from .pipeline import run_batch, transform
    from .reconcile import compare_tables
    from .report import build_report
    from .session import get_spark

    spark = get_spark("chill-e2e")
    job = _load(args.job, JobSpec)
    cat = _load(args.catalog, Catalog)

    derive_errors: list[str] = []
    if args.stream:
        from .streaming import drain, run_stream

        q = run_stream(
            spark, job, cat,
            out_dir=args.out,
            checkpoint_dir=args.checkpoint or os.path.join(args.out, "_ckpt"),
            columns=_default_columns(cat),
            available_now=True,
            quarantine_dir=os.path.join(args.out, "_quarantine"),
        )
        drain(q)
    else:
        res = run_batch(spark, job, cat, args.out)
        derive_errors = res.derive_errors

    expected = transform(spark, job, cat).tables
    ladder_root = args.ladder or args.out
    reports = []
    for table in cat.tables.values():
        path = f"{args.out}/{table.name}_{table.base_granularity}"
        actual = read_fact(spark, path)
        reports.append(
            compare_tables(
                expected[table.name], actual, table.name,
                keys=table.key_fields,
                counters=[c.db_name for c in table.counters],
            )
        )
        for level, df in build_ladder(actual, table).items():
            write_fact(df, f"{ladder_root}/{table.name}_{level}")
            print(f"{table.name}_{level}: {ladder_root}/{table.name}_{level}")

    report = build_report(reports)
    if derive_errors:
        # derive errors are job-level (pre-routing), so report them as
        # ONE case in the DBLoader suite rather than fanning the same
        # text out to every table (which multiplies the failure count)
        from .report.junit import TestCase

        report.suite("DBLoader Errors").add(
            TestCase(
                name="(derive)",
                classname="dbloader",
                failure_message="\n".join(derive_errors),
            )
        )
    # the r10 verdict's order #6: when this driver process touched any
    # journaled persisted store (scrub gram index, dedup sketch/
    # embedding stores, PQ codes, attribution counters), the single CI
    # artifact must gate their health too — auto-append the Store
    # Health suite for exactly those roots, no separate `reconcile
    # --store-health` invocation needed. Frozen model stores (no
    # journal, no appended leaves) pass with the frozen annotation.
    from .llm_ops.storefs import participating_stores

    stores = participating_stores()
    if stores:
        from .report.store_health import (
            participating_health,
            store_health_report,
        )

        report.merge(
            store_health_report(participating_health(spark, stores))
        )
    xml = report.to_xml()
    if args.report:
        with open(args.report, "w") as f:
            f.write(xml)
        print(f"wrote {args.report}")
    else:
        print(xml)
    return 0 if report.passed else 1


def cmd_ladder_repair(args) -> int:
    from datetime import datetime

    from .operators.incremental import maintain_ladder_increment
    from .session import get_spark

    spark = get_spark("chill-ladder")
    cat = _load(args.catalog, Catalog)
    table = cat.tables[args.table]
    dts = [datetime.fromisoformat(d) for d in args.datetimes]
    repaired = maintain_ladder_increment(
        spark, args.base, args.out, table, dts,
        levels=args.levels.split(",") if args.levels else None,
    )
    for g, windows in repaired.items():
        print(f"{g}: repaired {len(windows)} window(s)")
    return 0


def cmd_heavy(args) -> int:
    """Exact heavy hitters over a text column's tokens (two-pass
    Misra-Gries: bounded per-task state, broadcast recount). With
    --watch, maintain the streaming MG summary instead and print the
    current candidate set (lower bounds; exact via a later batch
    run)."""
    from pyspark.sql import functions as F

    from .llm_ops.classifier import tokens
    from .llm_ops.heavy import heavy_hitters
    from .session import get_spark

    if args.watch:
        from .streaming import drain
        from .streaming.heavy_stream import heavy_candidates, run_heavy_stream

        if not (args.schema and args.store and args.checkpoint):
            raise SystemExit(
                "heavy-hitters --watch needs --schema, --store and "
                "--checkpoint"
            )
        spark = get_spark("chill-heavy-stream")
        drain(run_heavy_stream(
            spark, args.watch, args.schema, args.store, args.checkpoint,
            theta=args.theta, text_col=args.text_col, available_now=True,
        ))
        rows = heavy_candidates(spark, args.store, args.theta).orderBy(
            F.col("lb").desc(), "tok"
        ).collect()
        for r in rows:
            mark = "guaranteed" if r["guaranteed"] else "candidate"
            print(f"{r['tok']}\t{r['lb']}\t{mark}")
        n = rows[0]["n_total"] if rows else 0
        print(f"{len(rows)} candidates over {n} items (theta={args.theta})")
        return 0

    if not args.input:
        raise SystemExit("heavy-hitters: --input required (or use --watch)")
    spark = get_spark("chill-heavy")
    df = spark.read.parquet(args.input)
    toks = tokens(df, args.id_col, args.text_col).select("tok")
    out = heavy_hitters(
        toks, "tok", theta=args.theta, min_count=args.min_count
    ).orderBy(F.col("n_tok").desc(), "tok")
    rows = out.collect()  # <= 1/theta rows by construction
    for r in rows:
        print(f"{r['tok']}\t{r['n_tok']}")
    print(f"{len(rows)} heavy hitters (theta={args.theta})")
    return 0


def cmd_classify(args) -> int:
    """Linear-classifier quality filtering: score every document with
    a fixed-point weight table and write rows clearing --threshold."""
    from pyspark.sql import functions as F

    from .llm_ops.classifier import (
        pseudo_weights,
        score_documents,
        tokens,
    )
    from .session import get_spark

    spark = get_spark("chill-classify")
    df = spark.read.parquet(args.input)
    if args.weights:
        weights = spark.read.parquet(args.weights)
        if set(weights.columns) != {"tok", "weight"}:
            raise SystemExit(
                "classify: --weights parquet must have columns "
                f"(tok, weight), got {weights.columns}"
            )
    else:
        vocab = (
            tokens(df, args.id_col, args.text_col)
            .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= args.min_df).select("tok")
        )
        weights = pseudo_weights(vocab, weight_scale=args.scale)
    scored = score_documents(
        df, args.id_col, args.text_col, weights,
        bias=args.bias, threshold=args.threshold, weight_scale=args.scale,
    )
    kept = df.join(
        scored.filter(F.col("kept")).select(args.id_col, "score"),
        args.id_col,
    )
    kept.write.mode("overwrite").parquet(args.out)
    n_in, n_out = df.count(), spark.read.parquet(args.out).count()
    print(f"kept {n_out}/{n_in} docs at threshold {args.threshold}")
    return 0


def cmd_scd2(args) -> int:
    """SCD-2 full-history merge into a two-zone dimension store."""
    from .operators.writers import merge_scd2
    from .session import get_spark

    spark = get_spark("chill-scd2")
    updates = spark.read.parquet(args.updates)
    stats = merge_scd2(
        spark, args.target, updates,
        keys=args.keys.split(","), eff_col=args.eff_col,
        batch_id=args.batch_id,
    )
    print(
        f"inserted={stats['inserted']} closed={stats['closed']} "
        f"unchanged={stats['unchanged']} stale={stats['stale']} "
        f"current_rows={stats['current_rows']}"
    )
    return 0


def cmd_rp(args) -> int:
    """JL random projection of an embedding column to k coordinates
    (long format: id, rp_dim, value)."""
    from .llm_ops.projection import random_project
    from .session import get_spark

    spark = get_spark("chill-rp")
    df = spark.read.parquet(args.input)
    out = random_project(
        df, args.vec_col, args.id_col, k=args.k, seed=args.seed,
    )
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"projected {n // args.k} vectors to {args.k} dims ({n} rows)")
    return 0


def cmd_unimax(args) -> int:
    """UniMax budget allocation: per-group token counts -> smallest-
    first integer walk under an epoch cap; prints the allocation."""
    from pyspark.sql import functions as F

    from .llm_ops.chunking import tokenize_ws
    from .llm_ops.sampling import unimax_budget
    from .llm_ops.text import normalize_text
    from .session import get_spark

    spark = get_spark("chill-unimax")
    df = spark.read.parquet(args.input)
    toks = F.size(tokenize_ws(normalize_text(args.text_col)))
    alloc = unimax_budget(
        df.select(args.group_col, toks.alias("__tok")),
        args.group_col, "__tok",
        total_budget=args.budget, max_epochs=args.max_epochs,
    ).orderBy(args.group_col)
    for r in alloc.collect():  # model-sized: one row per group
        print(
            f"{r[args.group_col]}: n={r['n_tokens']} alloc={r['alloc']} "
            f"epochs={r['epochs']}"
        )
    return 0


def cmd_cms(args) -> int:
    """Count-Min sketch over a token stream: build the counter table
    once, answer point-frequency queries from it (or maintain it
    continuously with --watch)."""
    from pyspark.sql import functions as F

    from .llm_ops.classifier import tokens
    from .llm_ops.cms import build_count_min, cms_estimate
    from .session import get_spark, local_frame

    spark = get_spark("chill-cms")
    if args.watch:
        from .streaming import drain
        from .streaming.cms_stream import cms_stream_estimate, run_cms_stream

        if not args.store:
            raise SystemExit("cms --watch: --store required")
        drain(run_cms_stream(
            spark, args.watch, "doc_id BIGINT, text STRING",
            store_root=args.store, checkpoint_dir=f"{args.store}/_ckpt",
            depth=args.depth, width=args.width, text_col=args.text_col,
            available_now=True,
        ))
        q = local_frame(
            spark, [(t,) for t in args.query], "tok string"
        )
        rows = cms_stream_estimate(
            spark, args.store, q, "tok", args.depth, args.width
        ).orderBy("tok").collect()
    else:
        if not args.input:
            raise SystemExit("cms: --input required (or use --watch)")
        df = spark.read.parquet(args.input)
        toks = tokens(df, args.id_col, args.text_col).select("tok")
        sketch = build_count_min(toks, "tok", args.depth, args.width)
        q = local_frame(spark, [(t,) for t in args.query], "tok string")
        rows = cms_estimate(
            sketch, q, "tok", args.depth, args.width
        ).orderBy("tok").collect()
    for r in rows:
        print(f"{r['tok']}\t{r['est']}")
    print(f"{len(rows)} estimates (depth={args.depth}, width={args.width})")
    return 0


def cmd_pq(args) -> int:
    """Product-quantization ANN: train codebooks (optionally with an
    IVF coarse quantizer), encode the corpus, and answer a top-k
    query by asymmetric distance.

    With ``--store ROOT`` the index lifecycle is persisted (train
    once / serve many): ``--build`` trains + encodes + writes the
    store, ``--append`` encodes NEW vectors with the stored codebooks
    (no retrain), ``--compact`` collapses append history, and plain
    ``--store --query-id`` searches from the persisted index without
    any training jobs."""
    import numpy as np
    from pyspark.sql import functions as F

    from .llm_ops.pq import ivfpq_train, pq_adc_topk, pq_encode, pq_train
    from .session import get_spark

    spark = get_spark("chill-pq")
    if args.store:
        from .llm_ops.pq_store import (
            compact_pq_store,
            pq_store_append,
            pq_store_forget,
            pq_store_topk,
            write_pq_store,
        )

        if args.forget:
            keys = [int(k) if k.lstrip("-").isdigit() else k
                    for k in args.forget]
            rep = pq_store_forget(spark, args.store, keys)
            print(f"forgot {rep['rows_forgotten']} vector(s): "
                  f"{rep['leaves_rewritten']} leaves rewritten, "
                  f"{rep['leaves_deleted']} deleted")
            return 0
        if args.rebuild:
            import json as _json

            from .llm_ops.pq_store import pq_store_rebuild

            if not args.input:
                print("--rebuild needs --input (the corpus of record: "
                      "the codes table holds codes, not vectors)",
                      file=sys.stderr)
                return 2
            rep = pq_store_rebuild(
                spark, args.store, spark.read.parquet(args.input),
                force=args.force_rebuild,
                max_appended_fraction=args.max_appended_fraction,
                min_recall=args.min_recall,
                sample=args.canary, topk=args.n, nprobe=args.probe,
                vec_col=args.vec_col,
            )
            print(_json.dumps(rep))
            return 0
        if args.journal:
            import json as _json

            from .llm_ops.storefs import read_health_events

            for ev in read_health_events(args.store, spark=spark):
                print(_json.dumps(ev))
            return 0
        if args.health:
            import json as _json

            from .llm_ops.pq_store import (
                pq_store_footprint,
                pq_store_recall_canary,
            )

            rep = pq_store_footprint(spark, args.store)
            if args.input:
                emb = spark.read.parquet(args.input)
                rows = pq_store_recall_canary(
                    spark, args.store, emb, sample=args.canary,
                    topk=args.n, nprobe=args.probe,
                    vec_col=args.vec_col, id_col=args.id_col,
                ).collect()
                rep["n_canary"] = len(rows)
                rep["recall_avg"] = (
                    round(sum(r["recall_at_k"] for r in rows)
                          / len(rows), 6) if rows else None
                )
            print(_json.dumps(rep))
            return 0
        if args.compact:
            out = compact_pq_store(spark, args.store)
            print(f"compacted PQ store {args.store}: {out['codes']} files")
            return 0
        if args.watch:
            from .streaming import drain
            from .streaming.pq_stream import run_pq_stream

            drain(run_pq_stream(
                spark, args.watch,
                f"{args.id_col} BIGINT, {args.vec_col} ARRAY<DOUBLE>",
                store_root=args.store,
                checkpoint_dir=f"{args.store}/_ckpt",
                vec_col=args.vec_col,
                available_now=True,
            ))
            print(f"drained watched vectors into PQ store {args.store}")
            return 0
        if args.append:
            new = spark.read.parquet(args.append)
            b = pq_store_append(new, args.store, vec_col=args.vec_col)
            print(f"appended {args.append} to {args.store} as batch {b}")
            return 0
        if args.input is None:
            raise SystemExit("pq: --input is required (corpus to build "
                             "from, or table holding --query-id's vector)")
        emb = spark.read.parquet(args.input)
        if args.build:
            qrow = emb.select(args.vec_col).first()
            if qrow is None:
                raise SystemExit("pq: --build input is empty")
            write_pq_store(
                emb, args.store, dim=len(qrow[args.vec_col]), m=args.m,
                k=args.k, iters=args.iters, cells=args.cells,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            print(f"built PQ store {args.store} (m={args.m}, k={args.k}, "
                  f"cells={args.cells})")
            return 0
        if args.query_id is None:
            raise SystemExit("pq: --query-id is required to search")
        qrow = emb.filter(F.col(args.id_col) == args.query_id).first()
        if qrow is None:
            raise SystemExit(f"pq: query id {args.query_id} not found")
        qv = np.array([float(x) for x in qrow[args.vec_col]],
                      dtype=np.float64)
        rows = pq_store_topk(
            spark, args.store, qv, n=args.n, nprobe=args.probe,
            where=F.col(args.id_col) != args.query_id,
        ).collect()
        for r in rows:
            print(f"{r[args.id_col]}\t{r['approx_d2']}")
        print(f"top-{len(rows)} from stored index {args.store} "
              f"for id={args.query_id}")
        return 0
    if args.input is None or args.query_id is None:
        raise SystemExit("pq: --input and --query-id are required "
                         "without --store")
    emb = spark.read.parquet(args.input)
    qrow = emb.filter(F.col(args.id_col) == args.query_id).first()
    if qrow is None:
        raise SystemExit(f"pq: query id {args.query_id} not found")
    qv = np.array([float(x) for x in qrow[args.vec_col]], dtype=np.float64)
    if args.cells:
        from .llm_ops.similarity import with_nearest_centroid

        cents, books = ivfpq_train(
            emb, dim=len(qv), cells=args.cells, m=args.m, k=args.k,
            iters=args.iters, vec_col=args.vec_col, id_col=args.id_col,
        )
        cell_d = np.round(((cents - qv) ** 2).sum(axis=1), 9)
        probed = [int(c) for c in sorted(
            range(len(cents)), key=lambda c: (cell_d[c], c)
        )[:args.probe]]
        base = with_nearest_centroid(
            emb.filter(F.col(args.id_col) != args.query_id),
            args.vec_col, cents,
        ).withColumn("__cell", F.col("__near")["cid"])
        base = base.filter(F.col("__cell").isin(probed)).select(
            args.id_col, args.vec_col
        )
        label = f"IVF{args.cells},PQ{args.m} probe={probed}"
    else:
        books = pq_train(
            emb, dim=len(qv), m=args.m, k=args.k, iters=args.iters,
            vec_col=args.vec_col, id_col=args.id_col,
        )
        base = emb.filter(F.col(args.id_col) != args.query_id)
        label = f"PQ{args.m}x{args.k}"
    enc = pq_encode(base, books, args.vec_col, args.id_col)
    rows = pq_adc_topk(enc, books, qv, n=args.n, id_col=args.id_col).collect()
    for r in rows:
        print(f"{r[args.id_col]}\t{r['approx_d2']}")
    print(f"top-{len(rows)} by {label} ADC for id={args.query_id}")
    return 0


def cmd_forget(args) -> int:
    """Right-to-be-forgotten: hard-delete subject keys from a DT_PART
    fact (touched-partition rewrites + directory deletes), optionally
    repairing a rollup ladder's touched windows."""
    from .operators.forget import forget_and_repair, forget_keys
    from .session import get_spark

    spark = get_spark("chill-forget")
    keys: list = [
        int(k) if k.lstrip("-").isdigit() else k for k in args.keys
    ]
    if args.sketch_store or args.emb_store:
        if args.sketch_store:
            from .llm_ops.incremental_dedup import sketch_store_forget

            rep = sketch_store_forget(spark, args.sketch_store, keys)
        else:
            from .llm_ops.incremental_embedding import (
                embedding_store_forget,
            )

            rep = embedding_store_forget(spark, args.emb_store, keys)
        for side, r in rep.items():
            print(f"{side}: rows_forgotten={r['rows_forgotten']} "
                  f"rewritten={r['leaves_rewritten']} "
                  f"deleted={r['leaves_deleted']}")
        return 0
    if not args.input:
        raise SystemExit(
            "forget: --in required (or --sketch-store / --emb-store)"
        )
    if args.ladder_root:
        cat = _load(args.catalog, Catalog)
        rep = forget_and_repair(
            spark, args.input, args.ladder_root, cat.tables[args.table],
            args.key_col, keys,
        )
        repaired = {g: len(w) for g, w in rep["repaired"].items()}
        print(f"repaired windows: {repaired}")
    else:
        rep = forget_keys(spark, args.input, args.key_col, keys)
    print(
        f"rows_forgotten={rep['rows_forgotten']} "
        f"rewritten={len(rep['partitions_rewritten'])} "
        f"deleted={len(rep['partitions_deleted'])}"
    )
    return 0


def cmd_bloom(args) -> int:
    """Bloom membership gate: --build persists a corpus filter,
    --add folds a new batch in (idempotent — OR algebra), and
    --probe classifies rows map-side, optionally writing the
    definitely-new rows (the pre-shuffle dedup gate)."""
    from .llm_ops.bloom import (
        bloom_filter_new,
        bloom_store_add,
        read_bloom_store,
        with_bloom_contains,
        write_bloom_store,
    )
    from .session import get_spark

    spark = get_spark("chill-bloom")
    if args.build:
        if not args.input:
            raise SystemExit("bloom --build: --input required")
        keys = spark.read.parquet(args.input)
        key_col, extra = args.key_col, None
        if args.grams:
            # benchmark-gram filter: explode the key column's distinct
            # n-grams first and stamp n so a mismatched consumer
            # (decontam-stream --n) fails loud instead of probing a
            # disjoint key space
            from pyspark.sql import functions as F2

            from .llm_ops.text import normalize_text

            t = F2.split(normalize_text(args.key_col), " ")
            anchored = keys.select(t.alias("__t"))
            tt = F2.col("__t")
            starts = F2.sequence(
                F2.lit(0), F2.greatest(F2.size(tt) - args.grams, F2.lit(0))
            )
            keys = anchored.select(
                F2.explode(
                    F2.array_distinct(
                        F2.transform(
                            starts,
                            lambda i: F2.concat_ws(
                                " ", F2.slice(tt, i + 1, args.grams)
                            ),
                        )
                    )
                ).alias("g")
            ).distinct()
            key_col, extra = "g", {"grams_n": args.grams}
        meta = write_bloom_store(
            keys, key_col, args.store,
            num_bits=args.bits, num_hashes=args.hashes,
            extra_meta=extra,
        )
        print(f"built {args.store} (bits={meta['num_bits']}, "
              f"hashes={meta['num_hashes']}"
              + (f", grams_n={meta['grams_n']}" if args.grams else "")
              + ")")
        return 0
    if args.add:
        bloom_store_add(spark.read.parquet(args.add), args.key_col, args.store)
        print(f"added {args.add} into {args.store}")
        return 0
    if not args.probe:
        raise SystemExit("bloom: one of --build / --add / --probe required")
    probe = spark.read.parquet(args.probe)
    words, meta = read_bloom_store(spark, args.store)
    m, h = int(meta["num_bits"]), int(meta["num_hashes"])
    flagged = with_bloom_contains(probe, args.key_col, words, m, h)
    counts = flagged.groupBy("might_contain").count().collect()
    by = {r["might_contain"]: r["count"] for r in counts}
    print(f"definitely_new={by.get(False, 0)} possible_member={by.get(True, 0)} "
          f"null_key={by.get(None, 0)}")
    if args.out:
        bloom_filter_new(probe, args.key_col, words, m, h).write.mode(
            "overwrite"
        ).parquet(args.out)
        print(f"wrote definitely-new rows -> {args.out}")
    return 0


def cmd_trend(args) -> int:
    """Per-group OLS trend + median/MAD anomaly flags over daily
    volumes — the ops-diagnostics pair, from one (group, day)
    pre-aggregate."""
    from pyspark.sql import functions as F

    from .session import get_spark

    spark = get_spark("chill-trend")
    df = spark.read.parquet(args.input)
    daily = (
        df.groupBy(
            F.col(args.group_col).alias("g"),
            F.date_trunc("day", args.ts_col).alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
        .withColumn(
            "x",
            F.datediff(F.col("d").cast("date"), F.lit(args.epoch).cast("date")),
        )
    )
    s = daily.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.expr("percentile(y, 0.5)").alias("med"),
    )
    mad = daily.join(s.select("g", "med"), "g").groupBy("g").agg(
        F.expr("percentile(abs(y - med), 0.5)").alias("mad")
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    out = s.join(mad, "g").select(
        "g",
        F.round(num.cast("double") / den, 6).alias("slope"),
        F.round("med", 2).alias("median"),
        F.round("mad", 2).alias("mad"),
    ).orderBy("g")
    for r in out.collect():  # group-sized
        print(f"{r['g']}\tslope={r['slope']}\tmed={r['median']}\tmad={r['mad']}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="chill_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="batch ETL: files -> derived partitioned tables")
    r.add_argument("--job", required=True)
    r.add_argument("--catalog", required=True)
    r.add_argument("--out", required=True)
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("stream", help="streaming ETL over a watched directory")
    s.add_argument("--job", required=True)
    s.add_argument("--catalog", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--columns",
                   help="comma-separated raw columns (default: catalog raw names)")
    s.add_argument("--trigger", type=int, default=5)
    s.add_argument("--quarantine")
    s.add_argument("--ladder-root",
                   help="also repair the rollup ladder incrementally per batch")
    s.add_argument("--ladder-levels", help="comma list, default: full ladder")
    s.add_argument("--drain", action="store_true",
                   help="process available files then exit (availableNow)")
    s.set_defaults(fn=cmd_stream)

    ee = sub.add_parser(
        "e2e",
        help="one-shot: ingest -> facts -> rollup ladder -> reconcile "
        "-> five-suite JUnit (chill.py main() in a single command)",
    )
    ee.add_argument("--job", required=True)
    ee.add_argument("--catalog", required=True)
    ee.add_argument("--out", required=True)
    ee.add_argument("--ladder", help="ladder output root (default: --out)")
    ee.add_argument("--report", help="JUnit XML path (default: stdout)")
    ee.add_argument("--stream", action="store_true",
                    help="ingest via the streaming path (drained)")
    ee.add_argument("--checkpoint", help="stream checkpoint dir")
    ee.set_defaults(fn=cmd_e2e)

    ro = sub.add_parser("rollup", help="materialize the granularity ladder")
    ro.add_argument("--catalog", required=True)
    ro.add_argument("--table", required=True)
    ro.add_argument("--in", dest="input", required=True)
    ro.add_argument("--out", required=True)
    ro.set_defaults(fn=cmd_rollup)

    rc = sub.add_parser("reconcile", help="expected vs actual -> JUnit XML")
    rc.add_argument("--catalog", required=True)
    rc.add_argument("--table", required=True)
    rc.add_argument("--expected", required=True)
    rc.add_argument(
        "--actual", required=True,
        help="parquet path, or a jdbc: URL (with --actual-table)",
    )
    rc.add_argument("--actual-table", help="remote table for jdbc: actuals")
    rc.add_argument("--jdbc-driver", help="JDBC driver class, if not auto")
    rc.add_argument(
        "--datetimes", nargs="*",
        help="ISO DATETIMEs to compare (default: expected side's set); "
        "pushed down to the database as a DATETIME IN (...) predicate",
    )
    rc.add_argument("--report")
    rc.add_argument("--expect-not-null", help="comma list of columns")
    rc.add_argument("--expect-unique", help="comma list of key columns")
    rc.add_argument(
        "--store-health", action="append", metavar="NAME=ROOT[:SUBDIR]",
        help="add a 'Store Health' suite row per store: fails on a "
             "missing _health journal, a verdict lagging the appended "
             "frontier, or a newest verdict that says compact/rebuild "
             "(SUBDIR defaults to 'grams'; use 'codes' for PQ stores)",
    )
    rc.add_argument("--store-health-max-lag", type=int, default=8,
                    help="max batches the newest verdict may lag the "
                         "appended frontier")
    rc.set_defaults(fn=cmd_reconcile)

    rt = sub.add_parser("retention", help="thinout expired partitions")
    rt.add_argument("--catalog", required=True)
    rt.add_argument("--table", required=True)
    rt.add_argument("--in", dest="input", required=True)
    rt.add_argument("--granularity")
    rt.add_argument("--as-of", dest="as_of")
    rt.add_argument("--apply", action="store_true")
    rt.set_defaults(fn=cmd_retention)

    fg = sub.add_parser(
        "forget",
        help="right-to-be-forgotten: delete subject keys from a "
             "DT_PART fact; --ladder-root also repairs the rollup "
             "ladder's touched windows",
    )
    fg.add_argument("--in", dest="input")
    fg.add_argument("--key-col", default="USER_ID")
    fg.add_argument("--keys", nargs="+", required=True,
                    help="subject key values (ints auto-detected)")
    fg.add_argument("--ladder-root", dest="ladder_root")
    fg.add_argument("--catalog", help="required with --ladder-root")
    fg.add_argument("--table", help="required with --ladder-root")
    fg.add_argument("--sketch-store", dest="sketch_store",
                    help="forget doc ids from a MinHash sketch store "
                         "instead of a fact")
    fg.add_argument("--emb-store", dest="emb_store",
                    help="forget vector ids from an embedding dedup "
                         "store instead of a fact")
    fg.set_defaults(fn=cmd_forget)

    dd = sub.add_parser("dedup", help="exact or near (LSH+CC) corpus dedup")
    dd.add_argument("--in", dest="input", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--method", choices=["exact", "near"], default="exact")
    dd.add_argument("--text-col", dest="text_col", default="text")
    dd.add_argument("--id-col", dest="id_col", default="doc_id")
    dd.add_argument("--threshold", type=float, default=0.7)
    dd.add_argument("--bands", type=int, default=8)
    dd.add_argument(
        "--max-bucket", type=int, default=1000,
        help="drop LSH buckets larger than this (degenerate boilerplate "
        "signatures); skips are reported on stderr",
    )
    dd.set_defaults(fn=cmd_dedup)

    dc = sub.add_parser(
        "decontam-stream",
        help="benchmark-decontamination JSONL intake: docs sharing a "
             "gram with the persisted benchmark Bloom flag; proven-"
             "clean docs reach the corpus",
    )
    dc.add_argument("--in", dest="input", required=True)
    dc.add_argument("--schema", default="doc_id BIGINT, text STRING")
    dc.add_argument("--out", required=True)
    dc.add_argument("--bloom", required=True,
                    help="benchmark Bloom store root (bloom --build "
                         "over the benchmark's distinct grams)")
    dc.add_argument("--checkpoint", required=True)
    dc.add_argument("--text-col", dest="text_col", default="text")
    dc.add_argument("--id-col", dest="id_col", default="doc_id")
    dc.add_argument("--n", type=int, default=3,
                    help="gram length the filter was built at")
    dc.add_argument("--trigger", type=int, default=5)
    dc.add_argument("--flagged", help="possible-contaminated channel "
                                      "(default OUT/_flagged)")
    dc.add_argument("--quarantine")
    dc.add_argument("--drain", action="store_true",
                    help="process available files then exit")
    dc.set_defaults(fn=cmd_decontam_stream)

    sd = sub.add_parser(
        "substring-dedup",
        help="exact-substring span dedup (duplicated >= L-token runs); "
             "--store maintains the incremental gram index",
    )
    sd.add_argument("--in", dest="input")
    sd.add_argument("--out")
    sd.add_argument("--mode", choices=["spans", "clean", "stats"],
                    default="spans")
    sd.add_argument("--text-col", dest="text_col", default="text")
    sd.add_argument("--id-col", dest="id_col", default="doc_id")
    sd.add_argument("--length", type=int, default=8,
                    help="minimum duplicated run, in tokens (L)")
    sd.add_argument("--store", help="incremental gram-index root")
    sd.add_argument("--build", action="store_true",
                    help="with --store: bootstrap the index from --in")
    sd.add_argument("--append", action="store_true",
                    help="with --store: admit --in's grams to history")
    sd.add_argument("--compact", action="store_true",
                    help="with --store: fold append leaves")
    sd.add_argument("--buckets", type=int, default=None,
                    help="with --build: BKT_PART hash partitions for "
                         "planning-time probe pruning")
    sd.add_argument("--watch",
                    help="with --store and --out: drain JSONL docs from "
                         "this dir through the span-cleaning intake "
                         "(availableNow)")
    sd.add_argument("--health", action="store_true",
                    help="with --store: leaf bloat report (compact "
                         "when the appended fraction grows)")
    sd.add_argument("--journal", action="store_true",
                    help="with --store: print the _health/ journal the "
                         "streaming maintainer emits per epoch (one "
                         "JSON line per event, newest last; a rolling "
                         "keep_last=64 window, not full history)")
    sd.add_argument("--scrub", action="store_true",
                    help="with --store (a BENCHMARK gram index) and "
                         "--in/--out: remove every benchmark-"
                         "overlapping span from the input docs "
                         "(scrub-don't-drop decontamination); with "
                         "--watch: run the streaming scrub intake "
                         "against the frozen index")
    sd.add_argument("--forget-rebuild", dest="forget_rebuild",
                    action="store_true",
                    help="with --store: right-to-be-forgotten — rebuild "
                         "the gram index from --in (the SURVIVING "
                         "corpus) under the store's own geometry")
    sd.set_defaults(fn=cmd_substring_dedup)

    ds = sub.add_parser(
        "dedup-stream",
        help="continuously-deduplicating JSONL intake: only near-dup "
        "survivors reach the corpus; sketch store maintained per batch",
    )
    ds.add_argument("--in", dest="input", required=True)
    ds.add_argument("--schema", default="doc_id BIGINT, text STRING")
    ds.add_argument("--out", required=True)
    ds.add_argument("--store", required=True, help="sketch store root")
    ds.add_argument("--checkpoint", required=True)
    ds.add_argument("--text-col", dest="text_col", default="text")
    ds.add_argument("--id-col", dest="id_col", default="doc_id")
    ds.add_argument("--threshold", type=float, default=0.7)
    ds.add_argument("--num-hashes", type=int, default=32)
    ds.add_argument("--bands", type=int, default=8)
    ds.add_argument("--trigger", type=int, default=5)
    ds.add_argument("--quarantine")
    ds.add_argument("--drain", action="store_true",
                    help="process available files then exit (availableNow)")
    ds.set_defaults(fn=cmd_dedup_stream)

    xs = sub.add_parser(
        "exact-dedup-stream",
        help="Bloom-gated exact-dedup JSONL intake: only first "
        "occurrences of a content fingerprint reach the corpus; "
        "fingerprint store + filter maintained per batch",
    )
    xs.add_argument("--in", dest="input", required=True)
    xs.add_argument("--schema", default="doc_id BIGINT, text STRING")
    xs.add_argument("--out", required=True)
    xs.add_argument("--store", required=True, help="fingerprint store root")
    xs.add_argument("--checkpoint", required=True)
    xs.add_argument("--text-col", dest="text_col", default="text")
    xs.add_argument("--id-col", dest="id_col", default="doc_id")
    xs.add_argument("--bits", type=int, default=1 << 20)
    xs.add_argument("--hashes", type=int, default=5)
    xs.add_argument("--trigger", type=int, default=5)
    xs.add_argument("--quarantine")
    xs.add_argument("--drain", action="store_true",
                    help="process available files then exit (availableNow)")
    xs.set_defaults(fn=cmd_exact_dedup_stream)

    sk = sub.add_parser(
        "sketch",
        help="materialize the MinHash sketch store for a corpus "
        "(feeds dedup-stream / offline incremental dedup)",
    )
    sk.add_argument("--in", dest="input")
    sk.add_argument("--store", required=True)
    sk.add_argument("--journal", action="store_true",
                    help="print the _health/ journal the dedup-stream "
                         "maintainer emits, one JSON line per epoch "
                         "(rolling keep_last=64 window)")
    sk.add_argument("--health", action="store_true",
                    help="print the leaf-bloat compact decision for "
                         "the store and exit")
    sk.add_argument("--text-col", dest="text_col", default="text")
    sk.add_argument("--id-col", dest="id_col", default="doc_id")
    sk.add_argument("--num-hashes", type=int, default=32)
    sk.add_argument("--bands", type=int, default=8)
    sk.add_argument(
        "--bucket-partitions", dest="bucket_partitions", type=int,
        default=None,
        help="hash-partition the banded side by pmod(xxhash64(bucket), N)"
        " for planning-time pruning of incremental runs",
    )
    sk.set_defaults(fn=cmd_sketch)

    skc = sub.add_parser(
        "sketch-compact",
        help="collapse a multi-batch sketch store to one leaf per side "
        "(run only while no stream writes the store)",
    )
    skc.add_argument("--store", required=True)
    skc.add_argument(
        "--target-file-bytes", dest="target_file_bytes", type=int,
        default=128 * 1024 * 1024,
    )
    skc.set_defaults(fn=cmd_sketch_compact)

    es = sub.add_parser(
        "emb-sketch",
        help="materialize the hyperplane-bucket embedding store for a "
        "corpus (feeds emb-dedup-stream / offline incremental dedup)",
    )
    es.add_argument("--in", dest="input")
    es.add_argument("--store", required=True)
    es.add_argument("--journal", action="store_true",
                    help="print the _health/ journal the "
                         "emb-dedup-stream maintainer emits (rolling "
                         "keep_last=64 window)")
    es.add_argument("--health", action="store_true",
                    help="print the leaf-bloat compact decision for "
                         "the store and exit")
    es.add_argument("--vec-col", dest="vec_col", default="embedding")
    es.add_argument("--id-col", dest="id_col", default="vec_id")
    es.add_argument("--planes", type=int, default=6)
    es.add_argument("--bands", type=int, default=8)
    es.set_defaults(fn=cmd_emb_sketch)

    eds = sub.add_parser(
        "emb-dedup-stream",
        help="continuously-deduplicating embedding intake: near-dup "
        "vectors dropped against the store; survivors appended",
    )
    eds.add_argument("--in", dest="input", required=True)
    eds.add_argument(
        "--schema", default="vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    eds.add_argument("--out", required=True)
    eds.add_argument("--store", required=True, help="embedding store root")
    eds.add_argument("--checkpoint", required=True)
    eds.add_argument("--vec-col", dest="vec_col", default="embedding")
    eds.add_argument("--id-col", dest="id_col", default="vec_id")
    eds.add_argument("--threshold", type=float, default=0.9)
    eds.add_argument("--planes", type=int, default=6)
    eds.add_argument("--bands", type=int, default=8)
    eds.add_argument("--trigger", type=int, default=5)
    eds.add_argument("--quarantine", default=None)
    eds.add_argument("--drain", action="store_true",
                     help="process available files then exit (availableNow)")
    eds.set_defaults(fn=cmd_emb_dedup_stream)

    la = sub.add_parser(
        "ladder-audit",
        help="recompute-vs-stored consistency check of a rollup ladder",
    )
    la.add_argument("--catalog", required=True)
    la.add_argument("--table", required=True)
    la.add_argument("--base", required=True, help="base fact dir")
    la.add_argument("--out", required=True, help="ladder root")
    la.add_argument("--levels", help="comma list, default: full ladder")
    la.set_defaults(fn=cmd_ladder_audit)

    sq = sub.add_parser(
        "sql", help="ad-hoc SQL over a directory of parquet tables"
    )
    sq.add_argument("query")
    sq.add_argument("--tables", required=True,
                    help="dir whose entries register as temp views")
    sq.add_argument("--out", help="write result parquet instead of printing")
    sq.add_argument("--limit", type=int, default=50)
    sq.set_defaults(fn=cmd_sql)

    qc = sub.add_parser("quality", help="Gopher/C4 quality-rule corpus filter")
    qc.add_argument("--input", required=True)
    qc.add_argument("--out", required=True)
    qc.add_argument("--text-col", default="text")
    qc.set_defaults(fn=cmd_quality)

    cpp = sub.add_parser(
        "corpus-prep",
        help="full prep pipeline in one plan: [benchmark scrub ->] "
             "substring self-dedup -> repetition/length filter -> "
             "exact dedup -> deterministic split -> fixed-budget "
             "packing; --bench-store wires a persisted benchmark gram "
             "index into the scrub stage",
    )
    cpp.add_argument("--input", required=True)
    cpp.add_argument("--out", required=True)
    cpp.add_argument(
        "--bench-store", default=None,
        help="benchmark gram index root (substring-dedup --build over "
             "the eval suites); omit to skip the scrub stage",
    )
    cpp.add_argument("--text-col", default="text")
    cpp.add_argument("--id-col", default="doc_id")
    cpp.add_argument("--source-col", default="source")
    cpp.add_argument("--length", type=int, default=8,
                     help="minimum duplicated/contaminated run (tokens)")
    cpp.add_argument("--min-tokens", type=int, default=30)
    cpp.add_argument("--max-rep", type=float, default=0.2)
    cpp.add_argument("--budget", type=int, default=512,
                     help="tokens per packed training sequence")
    cpp.set_defaults(fn=cmd_corpus_prep)

    at = sub.add_parser(
        "attribution",
        help="steady-state contamination attribution: --build freezes "
             "the eval suite's gram index, --update/--watch fold crawl "
             "batches into running per-benchmark counters, default "
             "prints the which-eval-is-burned report from "
             "benchmark-sized state",
    )
    at.add_argument("--store", required=True,
                    help="attribution store root")
    at.add_argument("--in", dest="input",
                    help="parquet docs (suite for --build, crawl batch "
                         "for --update)")
    at.add_argument("--out", help="write the report parquet instead of "
                                  "printing JSON lines")
    at.add_argument("--build", action="store_true",
                    help="freeze the eval suite at --in into the index "
                         "(resets running counters)")
    at.add_argument("--update", action="store_true",
                    help="fold the crawl batch at --in into the "
                         "counters (manual batch id)")
    at.add_argument("--watch",
                    help="drain JSONL docs from this dir through the "
                         "streaming maintainer (availableNow)")
    at.add_argument("--journal", action="store_true",
                    help="print the _health/ journal the streaming "
                         "maintainer emits (rolling keep_last=64 "
                         "window)")
    at.add_argument("--text-col", dest="text_col", default="text")
    at.add_argument("--id-col", dest="id_col", default="doc_id")
    at.add_argument("--length", type=int, default=8,
                    help="with --build: gram length L (tokens)")
    at.add_argument("--buckets", type=int, default=None,
                    help="with --build: BKT_PART hash partitions for "
                         "planning-time probe pruning")
    at.set_defaults(fn=cmd_attribution)

    sg = sub.add_parser(
        "segdedup",
        help="corpus-wide segment dedup (CCNet paragraph shape)",
    )
    sg.add_argument("--input", required=True)
    sg.add_argument("--out", required=True)
    sg.add_argument("--text-col", default="text")
    sg.add_argument("--id-col", default="doc_id")
    sg.add_argument("--seg-tokens", type=int, default=16)
    sg.set_defaults(fn=cmd_segdedup)

    mx = sub.add_parser(
        "mix",
        help="temperature mixture weights (+ optional quality-budget "
             "selection with --out/--budget-frac)",
    )
    mx.add_argument("--input", required=True)
    mx.add_argument("--out")
    mx.add_argument("--text-col", default="text")
    mx.add_argument("--id-col", default="doc_id")
    mx.add_argument("--group-col", default="source")
    mx.add_argument("--alpha", type=float, default=0.5)
    mx.add_argument("--budget-frac", type=float)
    mx.add_argument(
        "--threshold-buckets", type=int, default=0,
        help="use the histogram-cutoff budget selection (the corpus-"
             "window-free scale path) with this many score buckets",
    )
    mx.set_defaults(fn=cmd_mix)

    sd = sub.add_parser(
        "semdedup",
        help="SemDeDup: k-means-blocked embedding dedup, one survivor "
             "per semantic duplicate group",
    )
    sd.add_argument("--input", required=True)
    sd.add_argument("--out", required=True)
    sd.add_argument("--vec-col", default="embedding")
    sd.add_argument("--id-col", default="vec_id")
    sd.add_argument("--k", type=int, default=8)
    sd.add_argument(
        "--target-cluster-size", type=int, default=0,
        help="derive k from the corpus size so expected cluster size "
             "(and the per-cluster pair quadratic) stays bounded; "
             "overrides --k",
    )
    sd.add_argument("--iters", type=int, default=2)
    sd.add_argument("--tau", type=float, default=0.4)
    sd.set_defaults(fn=cmd_semdedup)

    di = sub.add_parser(
        "dsir",
        help="DSIR importance selection of target-like raw documents",
    )
    di.add_argument("--input", required=True)
    di.add_argument("--out", required=True)
    di.add_argument(
        "--target-expr", required=True,
        help="boolean SQL expression defining the target rows, e.g. "
             "\"lang = 'en'\"",
    )
    di.add_argument("--n", type=int, required=True)
    di.add_argument("--text-col", default="text")
    di.add_argument("--id-col", default="doc_id")
    di.add_argument("--buckets", type=int, default=4096)
    di.set_defaults(fn=cmd_dsir)

    lr = sub.add_parser(
        "ladder-repair",
        help="incrementally repair ladder windows touched by given DATETIMEs",
    )
    lr.add_argument("--base", required=True, help="base fact table path")
    lr.add_argument("--out", required=True, help="ladder root directory")
    lr.add_argument("--catalog", required=True)
    lr.add_argument("--table", required=True)
    lr.add_argument("--levels", help="comma list, default: full ladder")
    lr.add_argument("datetimes", nargs="+", help="ISO timestamps")
    lr.set_defaults(fn=cmd_ladder_repair)

    up = sub.add_parser(
        "upsert",
        help="keyed SCD-1 merge into a partitioned fact "
             "(touched periods only)",
    )
    up.add_argument("--target", required=True, help="fact table path")
    up.add_argument("--updates", required=True, help="updates parquet path")
    up.add_argument("--keys", required=True, help="comma-separated key columns")
    up.add_argument("--datetime-col", default="DATETIME")
    up.add_argument(
        "--bulk", action="store_true",
        help="bulk merge: let AQE pick the join strategy instead of "
             "broadcasting the update key set",
    )
    up.add_argument(
        "--evolve", action="store_true",
        help="merge by name with missing columns null-filled "
             "(schema evolution; read evolved tables with mergeSchema)",
    )
    up.add_argument(
        "--stream", action="store_true",
        help="watch --updates continuously; merge each micro-batch",
    )
    up.add_argument("--schema", help="update-file schema (stream mode)")
    up.add_argument("--checkpoint", help="checkpoint dir (stream mode)")
    up.add_argument(
        "--version-col", dest="version_col", default=None,
        help="resolve in-batch identity conflicts by this column "
             "(greatest wins; stream mode)",
    )
    up.add_argument(
        "--available-now", dest="available_now", action="store_true",
        help="drain the currently-available files and exit",
    )
    up.set_defaults(fn=cmd_upsert)

    pf = sub.add_parser(
        "profile", help="one-pass column profile (nulls/distinct/min/max)"
    )
    pf.add_argument("--in", dest="input", required=True)
    pf.add_argument("--columns", help="comma-separated subset (default all)")
    pf.add_argument(
        "--approx", action="store_true",
        help="HLL distinct counts (no Expand; the wide-table scale path)",
    )
    pf.add_argument(
        "--diff",
        help="second parquet path: report column drift a->b instead "
             "of a single profile",
    )
    pf.set_defaults(fn=cmd_profile)

    cp = sub.add_parser("compact", help="merge small files per partition")
    cp.add_argument("--in", dest="input", required=True)
    cp.add_argument("--target-mb", dest="target_mb", type=int, default=128)
    cp.add_argument(
        "--dry-run", dest="dry_run", action="store_true",
        help="print the per-partition small-file report instead of "
             "rewriting anything",
    )
    cp.set_defaults(fn=cmd_compact)

    hh = sub.add_parser(
        "heavy-hitters",
        help="exact >= theta-frequency tokens (two-pass Misra-Gries)",
    )
    hh.add_argument("--input",
                    help="parquet corpus (batch exact mode)")
    hh.add_argument("--theta", type=float, default=0.001)
    hh.add_argument("--min-count", dest="min_count", type=int, default=1)
    hh.add_argument("--text-col", default="text")
    hh.add_argument("--id-col", default="doc_id")
    hh.add_argument(
        "--watch",
        help="JSONL dir to watch instead: maintain the streaming MG "
             "summary (drains available files, prints candidates)",
    )
    hh.add_argument("--schema", help="JSONL schema (--watch mode)")
    hh.add_argument("--store", help="summary store root (--watch mode)")
    hh.add_argument("--checkpoint", help="checkpoint dir (--watch mode)")
    hh.set_defaults(fn=cmd_heavy)

    cf = sub.add_parser(
        "classify",
        help="linear-classifier quality filter (broadcast fixed-point "
             "weights; hash pseudo-weights unless --weights given)",
    )
    cf.add_argument("--input", required=True)
    cf.add_argument("--out", required=True)
    cf.add_argument(
        "--weights",
        help="parquet (tok, weight) fixed-point weight table; omit to "
             "derive deterministic pseudo-weights from the corpus vocab",
    )
    cf.add_argument("--threshold", type=float, default=0.5)
    cf.add_argument("--bias", type=float, default=0.0)
    cf.add_argument("--scale", type=int, default=1000,
                    help="fixed-point units per 1.0 of weight")
    cf.add_argument("--min-df", dest="min_df", type=int, default=5,
                    help="pseudo-weight vocab floor (token doc frequency)")
    cf.add_argument("--text-col", default="text")
    cf.add_argument("--id-col", default="doc_id")
    cf.set_defaults(fn=cmd_classify)

    s2 = sub.add_parser(
        "scd2",
        help="SCD-2 full-history merge (two-zone dimension store: "
             "current/ swap + batch-keyed history/)",
    )
    s2.add_argument("--target", required=True, help="dimension store root")
    s2.add_argument("--updates", required=True, help="updates parquet path")
    s2.add_argument("--keys", required=True, help="comma-separated key columns")
    s2.add_argument("--eff-col", dest="eff_col", default="eff_ts")
    s2.add_argument("--batch-id", dest="batch_id", type=int, default=0)
    s2.set_defaults(fn=cmd_scd2)

    rp = sub.add_parser(
        "rp",
        help="JL random projection of an embedding column "
             "(Achlioptas signs, integer dot products)",
    )
    rp.add_argument("--input", required=True)
    rp.add_argument("--out", required=True)
    rp.add_argument("--k", type=int, default=8)
    rp.add_argument("--seed", default="rp")
    rp.add_argument("--vec-col", default="embedding")
    rp.add_argument("--id-col", default="vec_id")
    rp.set_defaults(fn=cmd_rp)

    um = sub.add_parser(
        "unimax",
        help="UniMax budget allocation across groups under an epoch cap",
    )
    um.add_argument("--input", required=True)
    um.add_argument("--budget", type=int, required=True,
                    help="total token budget to allocate")
    um.add_argument("--max-epochs", dest="max_epochs", type=int, default=4)
    um.add_argument("--group-col", default="lang")
    um.add_argument("--text-col", default="text")
    um.set_defaults(fn=cmd_unimax)

    cm = sub.add_parser(
        "cms",
        help="Count-Min sketch frequency estimation over tokens "
             "(batch build or --watch streaming maintenance)",
    )
    cm.add_argument("--input")
    cm.add_argument("--watch", help="JSONL watch dir (streaming mode)")
    cm.add_argument("--store", help="sketch store root (watch mode)")
    cm.add_argument("--query", nargs="+", required=True,
                    help="tokens to estimate")
    cm.add_argument("--depth", type=int, default=4)
    cm.add_argument("--width", type=int, default=1024)
    cm.add_argument("--id-col", default="doc_id")
    cm.add_argument("--text-col", default="text")
    cm.set_defaults(fn=cmd_cms)

    bl = sub.add_parser(
        "bloom",
        help="Bloom membership gate: --build/--add a persisted corpus "
             "filter, --probe rows map-side (definitely-new vs "
             "possible-member)",
    )
    bl.add_argument("--store", required=True, help="filter store root")
    bl.add_argument("--build", action="store_true",
                    help="train a new filter from --input")
    bl.add_argument("--input", help="corpus parquet (with --build)")
    bl.add_argument("--add", help="fold this parquet's keys in (idempotent)")
    bl.add_argument("--probe", help="parquet of rows to classify")
    bl.add_argument("--out", help="write definitely-new probe rows here")
    bl.add_argument("--key-col", default="text")
    bl.add_argument("--bits", type=int, default=1 << 20)
    bl.add_argument("--hashes", type=int, default=5)
    bl.add_argument("--grams", type=int, default=None,
                    help="with --build: key the filter on the key "
                         "column's distinct N-grams (benchmark "
                         "decontamination filter); N is stamped in "
                         "the store meta")
    bl.set_defaults(fn=cmd_bloom)

    pq = sub.add_parser(
        "pq",
        help="product-quantization ANN top-k (add --cells for IVF-PQ; "
             "--store for a persisted train-once/serve-many index)",
    )
    pq.add_argument("--input")
    pq.add_argument("--query-id", dest="query_id", type=int)
    pq.add_argument("--store", help="persisted index root (train-once)")
    pq.add_argument("--build", action="store_true",
                    help="with --store: train + encode + persist")
    pq.add_argument("--append",
                    help="with --store: encode NEW vectors from this "
                         "parquet with the STORED codebooks (no retrain)")
    pq.add_argument("--compact", action="store_true",
                    help="with --store: collapse append history "
                         "(replays resolved, newest batch wins)")
    pq.add_argument("--forget", nargs="+",
                    help="with --store: right-to-be-forgotten — remove "
                         "these vector ids from every batch leaf")
    pq.add_argument("--watch",
                    help="with --store: drain JSONL vector rows from "
                         "this dir into the store (encode-only stream "
                         "maintainer, availableNow)")
    pq.add_argument("--health", action="store_true",
                    help="with --store: staleness report — appended "
                         "fraction since build, plus a recall canary "
                         "vs exact ground truth when --input gives "
                         "the corpus parquet")
    pq.add_argument("--journal", action="store_true",
                    help="with --store: print the _health/ journal the "
                         "streaming maintainer emits per epoch (one "
                         "JSON line per event, newest last; a rolling "
                         "keep_last=64 window, not full history)")
    pq.add_argument("--canary", type=int, default=4,
                    help="with --health: number of md5-sampled canary "
                         "queries")
    pq.add_argument("--rebuild", action="store_true",
                    help="with --store and --input: retrain + re-encode "
                         "under the store's recorded geometry IF the "
                         "health thresholds fire (use --force-rebuild "
                         "to skip the decision)")
    pq.add_argument("--force-rebuild", action="store_true",
                    help="with --rebuild: rebuild unconditionally")
    pq.add_argument("--max-appended-fraction", type=float, default=0.25,
                    help="with --rebuild: appended-rows fraction above "
                         "which the store retrains")
    pq.add_argument("--min-recall", type=float, default=None,
                    help="with --rebuild: run the recall canary and "
                         "retrain when mean recall@n drops below this "
                         "(omit for the cheap footprint-only decision)")
    pq.add_argument("--n", type=int, default=10)
    pq.add_argument("--m", type=int, default=4)
    pq.add_argument("--k", type=int, default=16)
    pq.add_argument("--iters", type=int, default=2)
    pq.add_argument("--cells", type=int, default=0,
                    help="IVF coarse cells (0 = plain PQ)")
    pq.add_argument("--probe", type=int, default=2)
    pq.add_argument("--vec-col", default="embedding")
    pq.add_argument("--id-col", default="vec_id")
    pq.set_defaults(fn=cmd_pq)

    tr = sub.add_parser(
        "trend",
        help="per-group OLS slope + median/MAD of daily volumes",
    )
    tr.add_argument("--input", required=True)
    tr.add_argument("--group-col", default="event_type")
    tr.add_argument("--ts-col", default="ts")
    tr.add_argument("--epoch", default="2024-01-01")
    tr.set_defaults(fn=cmd_trend)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

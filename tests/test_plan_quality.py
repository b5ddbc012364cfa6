"""Physical-plan quality gates — the 100 TB design contract.

Asserts (via explain output) that:
- selective filters reach the parquet scan (PushedFilters)
- projections prune the scan (ReadSchema)
- dim joins broadcast; no cartesian products sneak in
- fact reads by DATETIME prune partitions (PartitionFilters)
- KPI recompute stays a native expression (no Python eval in plan)
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil

import pytest
from pyspark.sql import functions as F

from chill_spark import queries as Q

SF = "/root/testdata/sf0.001"
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def data_exchanges(plan: str) -> int:
    """Count DATA-KEYED shuffles (hash/range partitioning). The
    round-robin rebalance `session.spread` inserts before CPU-heavy
    expansion is a deliberate parallelism fix, not a data shuffle the
    scale gates guard against — a RoundRobinPartitioning exchange
    moves raw pre-expansion rows once and introduces no key skew, so
    it is excluded here."""
    return plan.count("Arguments: hashpartitioning") + plan.count(
        "Arguments: rangepartitioning"
    )


def test_q6_filters_pushed_and_columns_pruned(spark):
    plan = plan_of(Q.q6_forecast_revenue(spark, SF))
    scan = plan[plan.index("Scan parquet"):]
    assert "PushedFilters: [" in scan
    # shipdate + discount + quantity predicates all push down
    pushed = scan[scan.index("PushedFilters"):].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    # only the 4 referenced columns are read
    readschema = next(l for l in scan.splitlines() if "ReadSchema" in l)
    for col in ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]:
        assert col in readschema
    for col in ["l_orderkey", "l_tax", "l_returnflag", "l_partkey"]:
        assert col not in readschema


def test_q5_dims_broadcast(spark):
    plan = plan_of(Q.q5_local_supplier_volume(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q1_partial_aggregation(spark):
    """Map-side combine: HashAggregate appears in partial+final pairs."""
    plan = plan_of(Q.q1_pricing_summary(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "Functions: [partial_sum" in plan or "partial_sum" in plan


def test_fact_read_prunes_partitions(spark):
    from chill_spark.operators.writers import read_fact, write_fact

    path = os.path.join(TMP, "plan_fact")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "s1", 1.0), ("2024-01-01 00:15:00", "s1", 2.0)],
        ["DATETIME", "SITE", "CALLS"],
    ).withColumn("DATETIME", F.col("DATETIME").cast("timestamp"))
    write_fact(df, path)
    pruned = read_fact(spark, path, datetimes=["2024-01-01 00:00:00"])
    plan = plan_of(pruned)
    assert "PartitionFilters" in plan
    assert pruned.count() == 1  # second partition never read
    shutil.rmtree(path, ignore_errors=True)


def test_dsl_compiles_to_native_exprs(spark):
    """Tier-1 DSL output contains no Python UDF nodes."""
    plan = plan_of(Q.q_dsl_derive(spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_lookup_is_broadcast_join(spark):
    plan = plan_of(Q.q_dsl_lookup(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_kpi_recompute_native(spark):
    from chill_spark.catalog import ColumnSpec, TableSpec
    from chill_spark.operators.project import with_kpis

    table = TableSpec(
        name="T", counter_group="G",
        columns=[
            ColumnSpec("CALLS", dtype="double"),
            ColumnSpec("DROPS", dtype="double"),
            ColumnSpec("DROP_RATE", kind="KPI", formula="DROPS/CALLS"),
        ],
    )
    df = spark.createDataFrame([(100.0, 3.0), (0.0, 1.0)], ["CALLS", "DROPS"])
    out = with_kpis(df, table)
    plan = plan_of(out)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    rows = {r["CALLS"]: r["DROP_RATE"] for r in out.collect()}
    assert rows[100.0] == pytest.approx(0.03)


def test_ann_topk_no_shuffle_of_corpus(spark):
    """Top-k is TakeOrderedAndProject (per-partition heap + driver
    merge) — no Exchange of the full corpus before the limit."""
    plan = plan_of(Q.q_ann_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_range_join_is_hash_join(spark):
    """The binned range join must plan as equi hash joins — never the
    BroadcastNestedLoop a raw inequality join degenerates to."""
    plan = plan_of(Q.queries()["q_range_join"](spark, SF))
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_asof_join_single_shuffle(spark):
    """As-of join: one window over the union — exactly one Exchange of
    the unioned data per side-independent branch, no join amplification."""
    plan = plan_of(Q.queries()["q_asof_join"](spark, SF))
    assert "Window" in plan
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_lsh_candidates_single_shuffle_no_join(spark):
    """pairs_within_buckets: candidate pairs come from one
    groupBy-the-bucket Exchange + in-bucket expansion — no self-join
    (the old shape shuffled the banded rows twice). SimHash blocks on
    one key, so its plan must also skip the pair-dedup Exchange."""
    from chill_spark.llm_ops.dedup import pairs_within_buckets

    df = Q.load_tables(spark, SF, ["documents"])["documents"].select(
        F.col("doc_id").alias("id"), (F.col("doc_id") % 7).alias("blk")
    )
    plan = plan_of(pairs_within_buckets(df, ["blk"], "id", dedup_pairs=False))
    assert "Join" not in plan
    import re as _re

    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_chunking_is_shuffle_free(spark, sf_dir):
    plan = plan_of(Q.queries()["q_chunk_documents"](spark, sf_dir))
    assert "Exchange" not in plan  # pure map stage: split/explode/slice
    assert "BatchEvalPython" not in plan  # and no Python UDF


def test_sliding_window_single_shuffle(spark, sf_dir):
    plan = plan_of(Q.queries()["q_sliding_window_events"](spark, sf_dir))
    # exactly the agg's hash exchange (+ the orderBy's range exchange);
    # the window expansion itself must not shuffle
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    assert "hashpartitioning" in plan


def test_compact_partitions_merges_small_files(spark):
    from chill_spark.operators.writers import (
        PARTITION_COL, compact_partitions, write_fact,
    )

    path = os.path.join(TMP, "compact_fact")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", f"s{i}", float(i)) for i in range(200)]
        + [("2024-01-01 00:15:00", "s1", 1.0)],
        ["DATETIME", "SITE", "CALLS"],
    ).withColumn("DATETIME", F.col("DATETIME").cast("timestamp"))
    write_fact(df.repartition(20), path)
    p0 = f"{path}/{PARTITION_COL}=202401010000"
    before = len([f for f in os.listdir(p0) if f.endswith(".parquet")])
    assert before > 1
    rewritten = compact_partitions(spark, path)
    after = len([f for f in os.listdir(p0) if f.endswith(".parquet")])
    assert after == 1 and rewritten["202401010000"] == 1
    # contents unchanged, other partition untouched
    from chill_spark.operators.writers import read_fact
    assert read_fact(spark, path).count() == 201
    assert compact_partitions(spark, path) == {}  # idempotent
    shutil.rmtree(path, ignore_errors=True)


def test_ivf_cells_partition_prune_on_disk(spark, sf_dir):
    """The IVF scale path: persist the corpus partitioned by cell so a
    probe scans only nprobe/C of the files (PartitionFilters, not a
    post-scan filter)."""
    from chill_spark.llm_ops.similarity import build_ivf

    path = os.path.join(TMP, "ivf_table")
    shutil.rmtree(path, ignore_errors=True)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    indexed, cents = build_ivf(emb, n_centroids=4, sample=500)
    indexed.write.partitionBy("__ivf_cell").parquet(path)
    probed = spark.read.parquet(path).filter(F.col("__ivf_cell").isin([0, 1]))
    plan = plan_of(probed)
    assert "PartitionFilters" in plan
    n_cells = len([d for d in os.listdir(path) if d.startswith("__ivf_cell=")])
    assert n_cells == 4
    assert 0 < probed.count() < emb.count()
    shutil.rmtree(path, ignore_errors=True)


def test_quality_rules_single_scan_map_only(spark):
    """Gopher rules: exactly one scan of documents, one exchange (the
    per-source agg) — all rule exprs fused map-side."""
    plan = plan_of(Q.queries()["q_quality_rules"](spark, SF))
    # formatted explain prints each node twice (tree + detail section)
    assert plan.count(") Scan parquet") == 1
    # per-source agg + presentation sort = 2 exchanges max
    assert plan.count(") Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bigram_pmi_count_joins_broadcast(spark):
    """PMI: unigram-count joins and the totals are broadcast — no
    sort-merge join of vocabulary against bigram counts."""
    plan = plan_of(Q.queries()["q_bigram_pmi"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan  # totals go via BroadcastNestedLoop


def test_gapfill_grid_joins_broadcast(spark):
    """Gap fill: the dense grid side is broadcast; raw events are
    aggregated BEFORE joining (no raw-row join amplification)."""
    plan = plan_of(Q.queries()["q_gapfill_hourly"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_write_clustered_enables_file_skipping(spark):
    """Clustered write: per-file parquet min/max ranges on the cluster
    key are near-disjoint, so a selective range scan can skip most
    files (checked directly in the footers via pyarrow)."""
    import glob

    import pyarrow.parquet as pq

    from chill_spark.operators.writers import write_clustered

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    out = os.path.join(TMP, "clustered_li")
    shutil.rmtree(out, ignore_errors=True)
    write_clustered(li, out, ["l_shipdate"], n_files=8)

    ranges = []
    for f in sorted(glob.glob(f"{out}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "l_shipdate"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    # near-disjoint: each file's range starts at/after the previous
    # file's end (range partitioning makes boundaries exact)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert lo2 >= hi1, (ranges,)
    # and a narrow predicate overlaps only a small fraction of files
    probe_lo, probe_hi = ranges[2][0], ranges[2][1]
    overlapping = [r for r in ranges if not (r[1] < probe_lo or r[0] > probe_hi)]
    assert len(overlapping) <= 2


def test_corpus_assembly_filter_below_join(spark):
    """Quality filter must run below the doc/embedding join: the Filter
    node sits on the scan side, not above the Join."""
    plan = plan_of(Q.queries()["q_corpus_embedding_assembly"](spark, SF))
    assert "CartesianProduct" not in plan
    # quality predicate pushed into the documents branch: the text
    # column is consumed by a Filter/Project before any Join node reads it
    jpos = plan.index(") Join") if ") Join" in plan else plan.index("Join")
    fpos = plan.index("Filter")
    assert fpos > 0
    # and no Python in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_no_wide_shuffle(spark):
    """Weighted sampling: the mean-weight side is a broadcast of one
    row; the kept-set selection is a narrow filter (no hash exchange of
    the corpus before the final agg)."""
    import re

    plan = plan_of(Q.queries()["q_weighted_sample"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # exchanges: the 1-row mean-weight agg, the per-source agg, and the
    # presentation sort — the corpus itself is never hash-exchanged
    # before selection
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3


def test_span_dedup_no_window_hot_key_safe(spark):
    """Span dedup: first occurrence is a partial-aggregating
    min(struct) on the span key (boilerplate spans collapse map-side
    before the shuffle), never a Window keyed by span content —
    window partitions must colocate and AQE cannot split them. The
    only join is the final doc-grain totals-to-winners join (unique
    key, no content skew)."""
    import re

    plan = plan_of(Q.queries()["q_span_dedup"](spark, SF))
    assert "Window" not in plan
    assert "partial_min" in plan
    # span reduction + winners-per-doc regroup + totals-per-doc +
    # doc-grain join alignment + presentation sort
    assert data_exchanges(plan) <= 5
    assert "CartesianProduct" not in plan


def test_zorder_write_skips_on_both_dimensions(spark):
    """Z-order clustering: per-file min/max ranges are narrow on BOTH
    cluster columns (a plain sort only helps its leading column)."""
    import glob

    import pyarrow.parquet as pq

    from chill_spark.operators.writers import write_zordered

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    out = os.path.join(TMP, "zorder_li")
    shutil.rmtree(out, ignore_errors=True)
    write_zordered(li, out, ["l_orderkey", "l_partkey"], n_files=16)

    def file_coverages(col):
        glo, ghi = None, None
        spans = []
        for f in sorted(glob.glob(f"{out}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            lo, hi = min(mins), max(maxs)
            spans.append((lo, hi))
            glo = lo if glo is None else min(glo, lo)
            ghi = hi if ghi is None else max(ghi, hi)
        width = ghi - glo
        return [ (hi - lo) / width for lo, hi in spans ]

    for col in ["l_orderkey", "l_partkey"]:
        cov = file_coverages(col)
        assert len(cov) >= 8
        # average per-file span well below the full range on BOTH dims
        assert sum(cov) / len(cov) < 0.6, (col, cov)


def test_partitions_for_sizing(spark):
    from chill_spark.operators.writers import estimated_plan_bytes, partitions_for

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = estimated_plan_bytes(li)
    assert n > 0
    assert partitions_for(li, target_file_bytes=n // 3) in (3, 4)
    assert partitions_for(li, target_file_bytes=n * 10) == 1
    # column pruning shrinks the estimate
    pruned = li.select("l_orderkey")
    assert estimated_plan_bytes(pruned) < n


def test_incremental_candidates_prunes_store_before_shuffle(spark):
    """Incremental dedup candidates: the corpus-sized store side is
    pruned to touched buckets by a BROADCAST semi-join BEFORE the one
    groupBy-the-bucket Exchange — the store is never shuffled whole.
    No cartesian, no Python in the plan."""
    import re

    from chill_spark.llm_ops.incremental_dedup import incremental_candidates

    old = spark.createDataFrame(
        [(i, 0, f"b{i % 3}") for i in range(30)], ["id", "band", "bucket"]
    )
    new = spark.createDataFrame(
        [(100 + i, 0, f"b{i % 3}") for i in range(10)], ["id", "band", "bucket"]
    )
    plan = plan_of(incremental_candidates(new, old))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan
    # the ONLY join is the broadcast semi prune of the store side
    assert len(re.findall(r"BroadcastHashJoin.*LeftSemi", plan)) == 1
    assert len(re.findall(r"(?<!Broadcast)HashJoin", plan)) == 0  # no shuffle join
    # touched-keys distinct (small new side) + bucket groupBy +
    # pair-dedup; broadcast exchanges are BroadcastExchange nodes,
    # not counted by this pattern — the corpus-sized store side never
    # feeds a plain Exchange before its semi-join prune
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3


def test_bucket_partitioned_store_prunes_at_planning_time(spark, tmp_path):
    """A BKT_PART-hash-partitioned banded store restricts the
    incremental scan to TOUCHED partition directories at planning
    time: the scan's PartitionFilters carry the BKT_PART predicate and
    untouched leaves never enter the plan (inputFiles shrinks). The
    pruned run returns the identical duplicate pairs as a flat
    store."""
    from chill_spark.llm_ops.incremental_dedup import (
        BUCKET_PART_COL,
        incremental_minhash_dups,
        read_sketch_meta,
        read_sketch_store,
        write_sketch_store,
    )

    docs = spark.createDataFrame(
        [(i, f"totally unique document number {i} " * 6) for i in range(40)],
        ["doc_id", "text"],
    )
    flat_root = str(tmp_path / "flat")
    part_root = str(tmp_path / "parted")
    write_sketch_store(docs, "text", "doc_id", flat_root, num_hashes=16, bands=8)
    write_sketch_store(
        docs, "text", "doc_id", part_root, num_hashes=16, bands=8,
        bucket_partitions=64,
    )
    assert read_sketch_meta(part_root)["bucket_partitions"] == 64

    # ONE new doc -> at most 8 touched (band, bucket) keys -> at most
    # 8 of the 64 hash partitions enter the plan
    new = spark.createDataFrame(
        [(100, "totally unique document number 7 " * 6)],
        ["doc_id", "text"],
    )
    kw = dict(threshold=0.5, num_hashes=16, bands=8)
    _, flat_banded = read_sketch_store(spark, flat_root)
    psets, pbanded = read_sketch_store(spark, part_root)
    assert BUCKET_PART_COL in pbanded.columns

    flat_sets, _ = read_sketch_store(spark, flat_root)
    want = {
        (r["id_a"], r["id_b"])
        for r in incremental_minhash_dups(
            new, flat_sets, flat_banded, "text", "doc_id", **kw
        ).collect()
    }
    got_df = incremental_minhash_dups(
        new, psets, pbanded, "text", "doc_id", bucket_partitions=64, **kw
    )
    got = {(r["id_a"], r["id_b"]) for r in got_df.collect()}
    assert got == want and (100 in {a for a, _ in want} or 100 in {b for _, b in want})

    # planning-time pruning: the optimized plan carries a BKT_PART
    # partition filter listing only the touched hash partitions
    # (inputFiles() would not show this — it lists the unpruned
    # relation), and the store on disk holds far more
    import os
    import re

    plan = plan_of(got_df)
    m = re.search(rf"PartitionFilters: \[{BUCKET_PART_COL}#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    touched = [x for x in m.group(1).split(",") if x.strip()]
    assert 0 < len(touched) <= 8, touched  # 1 doc x 8 bands
    leaf = os.path.join(part_root, "banded", "BATCH_PART=-1")
    all_parts = [d for d in os.listdir(leaf) if d.startswith(BUCKET_PART_COL)]
    assert len(all_parts) >= 30  # 64-way hash layout actually materialized


def test_source_caps_salted_two_phase_plan(spark):
    """q_source_caps must keep the salted two-phase shape: phase-1
    window partitioned by (source, salt) — 16x the parallelism of the
    naive single window over the low-cardinality source key — and the
    pre-cap totals joined back by BROADCAST, never a shuffle join."""
    import chill_spark.queries as Q

    plan = plan_of(Q.q_source_caps(spark, SF))
    assert plan.count("Window") >= 2  # salted pre-rank + final re-rank
    assert "__salt" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lm_perplexity_broadcasts_the_lm(spark):
    """q_lm_perplexity's scoring join must broadcast the vocab-sized
    LM (the corpus side is 100 TB; shuffling it on token would be the
    classic join-the-big-side mistake), and the whole pipeline stays
    JVM-side."""
    import re

    import chill_spark.queries as Q

    plan = plan_of(Q.q_lm_perplexity(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # corpus-side token explode never feeds a plain Exchange before
    # the broadcast join: only the per-doc re-agg and final sort
    # shuffle the scored rows
    assert data_exchanges(plan) <= 4


def test_segment_dedup_no_join_two_data_shuffles(spark):
    """Segment dedup: first occurrence is a partial-aggregating
    min(struct) on the segment key — never a Window (window
    partitions must colocate, so one boilerplate segment would
    serialize into one task at corpus scale; AQE skew splitting does
    not apply to windows) and never a self-join; segment payload
    through the shuffles is (id, idx, text) only."""
    import re

    plan = plan_of(Q.queries()["q_segment_dedup"](spark, SF))
    assert "Join" not in plan
    # hot-key safety: no Window node anywhere; the seg_text reduction
    # must be a hash aggregate with a map-side partial (partial_min
    # collapses duplicate segments before the shuffle)
    assert "Window" not in plan
    assert "partial_min" in plan
    assert data_exchanges(plan) <= 3


def test_mixture_weights_broadcast_total(spark):
    """Mixture weights: per-source agg (map-side combinable) + 1-row
    total broadcast back — the corpus is never joined wide."""
    plan = plan_of(Q.queries()["q_mixture_weights"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_budget_threshold_no_corpus_window(spark):
    """The histogram budget cutoff keeps every corpus-side step a
    partial-aggregating map pass: the only Window in the plan walks
    the (source, bucket) histogram — its input is the aggregate, so
    its partition sizes are bounded by n_buckets, never by corpus
    rows — and the stats/cutoff frames come back as broadcasts."""
    plan = plan_of(Q.queries()["q_budget_threshold"](spark, SF))
    assert plan.count(") Window") == 1
    assert "partial_sum" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # stats in, cutoff back
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_quality_budget_windows_share_one_shuffle(spark):
    """Budget filter: the rank/cumsum window and the per-source total
    ride partitioning on the SAME source key; with the final agg and
    presentation sort the plan holds at <= 3 exchanges and no join."""
    import re

    plan = plan_of(Q.queries()["q_quality_budget"](spark, SF))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3


def test_merge_upsert_prunes_partitions_and_broadcasts_keys(spark):
    """The SCD-1 merge's scale contract: the target is read under a
    planning-time partition filter on exactly the touched periods
    (cost tracks |touched partitions|, never table size) and the
    survivors anti-join broadcasts the update key set (the target
    side never shuffles)."""
    from chill_spark.operators.writers import (
        _merged_frame,
        with_partition_col,
        write_fact,
    )

    path = os.path.join(TMP, "plan_upsert")
    shutil.rmtree(path, ignore_errors=True)
    base = spark.createDataFrame(
        [("2024-01-01 00:00:00", "s1", 1.0),
         ("2024-01-01 01:00:00", "s1", 2.0)],
        ["DATETIME", "SITE", "CALLS"],
    ).withColumn("DATETIME", F.col("DATETIME").cast("timestamp"))
    write_fact(base, path)
    upd = with_partition_col(
        spark.createDataFrame(
            [("2024-01-01 00:00:00", "s1", 9.0)],
            ["DATETIME", "SITE", "CALLS"],
        ).withColumn("DATETIME", F.col("DATETIME").cast("timestamp"))
    )
    merged = _merged_frame(
        spark.read.parquet(path), upd, ["SITE"], "DATETIME",
        ["202401010000"], broadcast_keys=True,
    )
    plan = plan_of(merged)
    assert "PartitionFilters: [" in plan
    assert "202401010000" in plan          # the touched value, in the scan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan     # target side never shuffles
    shutil.rmtree(path, ignore_errors=True)


def test_profile_single_scan(spark):
    """The whole profile — counts, nulls, exact NDVs, min/max for 4
    columns — rides ONE scan (multi-distinct planned as a single
    Expand) and unpivots without touching the driver."""
    plan = plan_of(Q.queries()["q_profile_lineitem"](spark, SF))
    assert plan.count(") Scan parquet") == 1
    assert ") Expand" in plan  # the one-pass multi-distinct shape
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_distinct_ladder_single_scan_level_from_previous(spark):
    """The HLL distinct ladder reads the raw table ONCE: WK unions
    DY's sketches, DY unions HR's — a from-base exact ladder would
    need one full scan (and one full-width distinct shuffle) per
    level. Partial merge functions must appear, and the upper
    levels' aggregates are sketch unions, not re-counts."""
    from pyspark.sql import functions as F

    from chill_spark.operators.rollup import distinct_ladder

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("ts").alias("DATETIME"), "user_id"
    )
    wk = distinct_ladder(ev, [], "user_id", ["HR", "DY", "WK"])["WK"]
    plan = plan_of(wk)
    assert plan.count(") Scan parquet") == 1
    assert "hll_union_agg" in plan and "hll_sketch_agg" in plan
    assert "partial_hll" in plan  # map-side sketch merge at every level
    assert ") Expand" not in plan


def test_profile_approx_has_no_expand(spark):
    """The approx (HLL++) profile is the at-scale default precisely
    because it avoids the Expand: exact multi-NDV replicates every
    input row once per profiled column before the shuffle; the sketch
    path is one plain partial+final aggregate over a single scan."""
    from chill_spark.operators.profile import profile

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = plan_of(profile(
        li, ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"],
        approx=True,
    ))
    assert plan.count(") Scan parquet") == 1
    assert ") Expand" not in plan
    assert "approx_count_distinct" in plan
    assert "partial_" in plan  # map-side sketch merge


def test_source_caps_phase1_window_is_salted(spark):
    """Window-skew policy pin: per-source top-K must rank inside
    (source, salt) first — source is low-cardinality, so a single
    Window.partitionBy(source) would serialize a megasource onto one
    task (AQE never splits window partitions). A future edit that
    drops the salt re-introduces that bottleneck silently; this gate
    makes it loud."""
    plan = plan_of(Q.queries()["q_source_caps"](spark, SF))
    # two-phase shape: the salted phase-1 window plus the per-source
    # re-rank over <= 16*K survivors
    assert plan.count(") Window") >= 2
    assert "__salt" in plan


# --- r5 corpus-analytics queries: plan gates ------------------------------

def test_token_fertility_prunes_scan_and_stays_join_free(spark, sf_dir):
    """One map-only scan reading ONLY (text, lang); no join, no
    window — the whole per-language fertility table is a single
    partial+final aggregate."""
    plan = plan_of(Q.queries()["q_token_fertility"](spark, sf_dir))
    assert "ReadSchema: struct<text:string,lang:string>" in plan
    assert "Join" not in plan and "Window" not in plan


def test_ngram_novelty_hash_keyed_no_window(spark, sf_dir):
    """Doc-frequency rides groupBy+join (combiner-safe under hot
    grams), never a window over the gram key; every gram-keyed stage
    carries the 60-bit hash, so no gram STRING reaches an Exchange."""
    plan = plan_of(Q.queries()["q_ngram_novelty"](spark, sf_dir))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # gram text exists only inside the explode projection; the
    # shuffled columns are the hash (gh) and doc_id
    import re

    for m in re.finditer(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "gram" not in m.group(1)


def test_event_transitions_windows_user_key_and_broadcasts_total(spark, sf_dir):
    plan = plan_of(Q.queries()["q_event_transitions"](spark, sf_dir))
    assert "Window" in plan
    # the lag window partitions by the high-cardinality user key
    assert "windowspecdefinition(user_id" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total
    assert "CartesianProduct" not in plan


def test_benchmark_contamination_broadcasts_bench_grams(spark, sf_dir):
    """Both gram joins must broadcast the (small) benchmark side —
    the train gram stream never sort-merge-shuffles whole."""
    plan = plan_of(Q.queries()["q_benchmark_contamination"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_distinct_overlap_unions_sketches_not_users(spark, sf_dir):
    """The estimate side must pair fixed-size sketches (a C-row
    nested-loop is fine, C = #event types), while only the exact-path
    join keys on user_id."""
    plan = plan_of(Q.queries()["q_distinct_overlap"](spark, sf_dir))
    assert "hll_union" in plan and "hll_sketch_estimate" in plan
    assert "CartesianProduct" not in plan


def test_embedding_rp_no_corpus_shuffle(spark, sf_dir):
    """JL projection: the sign planes ride a broadcast cross join and
    the dot product is a per-row fold — the ONLY data-keyed exchange
    is the presentation sort; no hash shuffle of the corpus, no
    Python in the plan."""
    plan = plan_of(Q.queries()["q_embedding_rp"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Arguments: hashpartitioning") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cross_source_grams_single_gram_shuffle_no_join(spark, sf_dir):
    """The sharing matrix rides ONE collect_set aggregation on the
    gram hash + a tiny pair regroup — no self-join (the distinct +
    join shape shuffled twice and re-expanded the corpus per side),
    no window, and no gram STRING in any exchange."""
    import re

    plan = plan_of(Q.queries()["q_cross_source_grams"](spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    for m in re.finditer(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "gram" not in m.group(1)


def test_zipf_stats_windows_postaggregate_only(spark, sf_dir):
    """The rank window must consume the (source, tok) COUNT aggregate
    — vocab-sized partitions — never raw corpus rows: a partial
    aggregate precedes the window's exchange."""
    plan = plan_of(Q.queries()["q_zipf_stats"](spark, sf_dir))
    assert "Window" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_sampled_stats_two_aggregates_one_broadcast(spark, sf_dir):
    """Sample estimate + truth are two combiner-safe aggregates glued
    by a 1-row broadcast — no data-keyed shuffle at all."""
    plan = plan_of(Q.queries()["q_sampled_stats"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert data_exchanges(plan) == 0
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_ann_rerank_broadcasts_candidates_exact_side(spark, sf_dir):
    """The exact re-rank must broadcast the 50-candidate set into the
    raw-vector scan (the corpus side never shuffles on the id), and
    both stage cuts are TakeOrdered heaps, not global sorts."""
    plan = plan_of(Q.queries()["q_ann_rerank"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def _cumsum_window_specs(plan: str) -> list[str]:
    """The partition+order column lists of every windowspecdefinition
    in a formatted plan (e.g. 'source#3, __pfx_bkt#21L, doc_id#0L')."""
    import re

    return re.findall(r"windowspecdefinition\(([^()]*?) ASC", plan)


def _assert_distributed_prefix_sum(plan: str, shard: str, order: str) -> None:
    """The r10 verdict's only weak-at-scale flag was the packer
    family's cumulative-sum window partitioned ONLY by the shard
    column — a single-task sort per shard at 100 TB. The two-phase
    distributed prefix sum must show in the plan as (a) a full-data
    window partitioned by (shard, __pfx_bkt) ordered by the order
    column, and (b) NO window partitioned solely by the shard column
    that sorts the full data by the order column (the tiny
    per-bucket-subtotal window orders by __pfx_bkt and is fine)."""
    specs = _cumsum_window_specs(plan)
    assert any(
        f"{shard}#" in s and "__pfx_bkt#" in s and f"{order}#" in s
        for s in specs
    ), f"no (shard, __pfx_bkt) cumsum window in plan specs: {specs}"
    solo = [
        s for s in specs
        if f"{shard}#" in s and "__pfx_bkt#" not in s and f"{order}#" in s
    ]
    assert not solo, (
        f"full-data window still partitions solely by the shard column "
        f"(single-task sort per shard at scale): {solo}"
    )


import contextlib as _ctx


@_ctx.contextmanager
def _force_bucket_packing(spark):
    """Pin the packer's SCALE shape for a plan assertion: the size
    gate (chunking.distributed_running_offset) legitimately falls back
    to the plain window below ``chill.pack.window_max_shard_rows``
    (bit-identical output; r11 verdict order), so the distributed-
    prefix-sum contract is asserted with the gate disabled — the plan
    a too-big-for-one-task shard would get."""
    spark.conf.set("chill.pack.window_max_shard_rows", "0")
    try:
        yield
    finally:
        spark.conf.unset("chill.pack.window_max_shard_rows")


def test_pack_split_sequences_distributed_prefix_sum(spark, sf_dir):
    """The splitting packer's scale contract: the running offset is a
    two-phase distributed prefix sum — per-shard min/max and bucket
    subtotals are TINY broadcast sides, the only full-data exchange
    is the (shard, bucket) window, and no window sorts a whole shard
    on one task. Joins are broadcast-only (offset bases), never
    sort-merge/cartesian."""
    with _force_bucket_packing(spark):
        plan = plan_of(Q.queries()["q_pack_split_sequences"](spark, sf_dir))
    _assert_distributed_prefix_sum(plan, "source", "doc_id")
    for node in ("SortMergeJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, node
    # the only full-data exchange is the (shard, bucket) window; the
    # stats/subtotal aggs are map-side-combined slim-projection scans
    assert "Arguments: hashpartitioning(source#" in plan
    assert plan.count("Arguments: rangepartitioning") <= 1, plan


def test_pack_sequences_distributed_prefix_sum(spark, sf_dir):
    with _force_bucket_packing(spark):
        plan = plan_of(Q.queries()["q_pack_sequences"](spark, sf_dir))
    _assert_distributed_prefix_sum(plan, "source", "doc_id")


def test_corpus_prep_packing_distributed_prefix_sum(spark, sf_dir):
    """corpus_prep's packing stage shares the distributed prefix sum:
    its cumsum window must carry the __pfx_bkt range bucket alongside
    (source, split), never (source, split) alone."""
    with _force_bucket_packing(spark):
        plan = plan_of(Q.queries()["q_corpus_prep_v3"](spark, sf_dir))
    _assert_distributed_prefix_sum(plan, "split", "doc_id")


def test_packing_size_gate_small_input_uses_window(spark, sf_dir):
    """Below the gate every shard fits one task's sort, so the offset
    must be ONE plain per-shard window over the persisted slim frame
    (no __pfx_bkt machinery, no extra joins), and its values must be
    IDENTICAL to the forced bucket path — the r11 verdict's
    size-gated fallback contract."""
    from chill_spark.llm_ops.chunking import distributed_running_offset

    rows = [(i, ["a", "b"][i % 2], (i * 13) % 7 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tok"])
    gated = distributed_running_offset(
        df, "doc_id", "n_tok", ["shard"], "off"
    )
    assert "__pfx_bkt" not in plan_of(gated), "gate did not fire"
    with _force_bucket_packing(spark):
        forced = distributed_running_offset(
            df, "doc_id", "n_tok", ["shard"], "off"
        )
    assert "__pfx_bkt" in plan_of(forced), "conf=0 must force buckets"
    got = {r["doc_id"]: r["off"] for r in gated.collect()}
    want = {r["doc_id"]: r["off"] for r in forced.collect()}
    assert got == want


def test_contamination_attribution_broadcasts_benchmark(spark, sf_dir):
    """The corpus side pays one offset projection + a BROADCAST probe
    join; the reduction keys on bench_id — the corpus must never
    shuffle on the gram fp against a suite-sized side, and the final
    suite-sized join must not sort-merge."""
    plan = plan_of(Q.queries()["q_contamination_by_benchmark"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_corpus_prep_v3_no_fp_window_no_cartesian(spark, sf_dir):
    """The full prep chain keeps the substring family's invariants:
    keeper election stays a combiner-safe aggregate (never a window
    keyed by the gram fingerprint — a boilerplate gram repeated
    billions of times must not pin one window partition) and nothing
    goes cartesian."""
    plan = plan_of(Q.queries()["q_corpus_prep_v3"](spark, sf_dir))
    assert "windowspecdefinition(fp" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan  # map-side keeper election

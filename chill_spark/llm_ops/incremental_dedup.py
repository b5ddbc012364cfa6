"""Incremental near-dedup against a persisted sketch store.

At 100 TB you never re-run dedup over the whole corpus when a new
crawl lands. The MinHash sketch layer (distinct shingle-hash sets +
banded signature buckets) is materialized ONCE per document and stored
next to the corpus; deduplicating an increment then costs:

  sketch(new)                                  — O(|new|), map-only
  bucket-join(new, store)                      — shuffle of |new| + the
                                                 store rows in TOUCHED
                                                 buckets only (bucket-
                                                 partitioned store →
                                                 pruned scan)
  verify(candidate pairs)                      — pair-sized joins

The old corpus is never re-shingled and old×old pairs are never
re-expanded (they were handled when those docs were ingested). The
candidate semantics are exactly "pairs of the batch run restricted to
pairs touching a new doc", so the batch oracle replays the incremental
result by filtering its verified pairs — see
queries.q_dedup_incremental.

Store layout (``write_sketch_store`` / ``read_sketch_store``):
  <root>/sets/    (id, sh array)        — Jaccard verify side
  <root>/banded/  (id, band, bucket)    — candidate generation side
Append new batches to both after deduplication; both are plain
parquet and can be bucketed by (band, bucket) for co-located joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    DEFAULT_MAX_BUCKET_SIZE,
    banded_signatures,
    pairs_within_buckets,
    shingle_sets,
)


# partition column for the optional hash-bucketed banded layout
BUCKET_PART_COL = "BKT_PART"


def bucket_part_expr(n: int, bucket_col: str = "bucket"):
    """Stable hash-partition id for a band bucket: pmod(xxhash64, n).
    The SAME expression derives the touched-partition list at query
    time, so the store scan prunes at PLANNING time (PartitionFilters),
    not scan time."""
    return F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n)).cast("int")


def write_sketch_store(
    df: DataFrame,
    text_col: str,
    id_col: str,
    root: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    portable: bool = False,
    mode: str = "overwrite",
    bucket_partitions: int | None = None,
) -> None:
    """Materialize the sketch layer for ``df`` (one shingling pass —
    the sets feed the banded signatures).

    Written under a ``BATCH_PART=-1`` leaf so the layout is identical
    to what a streaming maintainer (run_dedup_stream) appends —
    partition discovery rejects mixed flat/nested trees, so a
    bootstrap store must match the stream's batch-keyed shape.

    ``bucket_partitions=N`` hash-partitions the banded side by
    ``BKT_PART = pmod(xxhash64(bucket), N)``: an incremental consumer
    then lists/reads only the partitions its batch touches (planning-
    time pruning) instead of filtering a full scan. Recorded in
    ``_meta.json`` so every later writer/reader agrees on N.

    The store root may live on ANY Hadoop-readable filesystem
    (``file://``, ``hdfs://``, ``s3a://`` ...) — cleanup and meta I/O
    route through the Hadoop FileSystem API (storefs), not ``os``."""
    from ..operators.writers import BATCH_COL
    from .storefs import StoreFS, write_store_json

    if mode == "append":
        # appending sketches built with different parameters (or a
        # different banded layout) would silently never collide /
        # write a conflicting partition tree — and the unconditional
        # meta rewrite below would falsify provenance
        check_sketch_meta(
            root, num_hashes, bands, shingle_k, portable,
            bucket_partitions=bucket_partitions,
        )
    elif mode == "overwrite":
        # a rebuild must clear EVERYTHING, including stream-appended
        # BATCH_PART leaves — overwriting only the -1 leaf would leave
        # stale old-family sketches mixed under the restamped meta
        fs = StoreFS(root, df.sparkSession)
        for side in ("sets", "banded"):
            fs.delete(f"{root}/{side}")
    sets_df = shingle_sets(df, text_col, id_col, shingle_k, portable=portable)
    sets_df.write.mode(mode).parquet(f"{root}/sets/{BATCH_COL}=-1")
    banded = banded_signatures(
        df, text_col, id_col, num_hashes, bands, shingle_k,
        sets_df=sets_df, portable=portable,
    )
    w = banded
    if bucket_partitions:
        w = w.withColumn(BUCKET_PART_COL, bucket_part_expr(bucket_partitions))
        w.write.mode(mode).partitionBy(BUCKET_PART_COL).parquet(
            f"{root}/banded/{BATCH_COL}=-1"
        )
    else:
        w.write.mode(mode).parquet(f"{root}/banded/{BATCH_COL}=-1")
    # record the sketch parameters: signatures built with different
    # num_hashes/bands/shingle_k produce disjoint band buckets, so a
    # mismatched consumer would silently find ZERO candidates — make
    # that a hard error instead (check_sketch_meta)
    write_store_json(
        root,
        {"num_hashes": num_hashes, "bands": bands,
         "shingle_k": shingle_k, "portable": portable,
         "bucket_partitions": bucket_partitions},
        spark=df.sparkSession,
    )


#: the parameters that decide whether two sketch runs can match at all
_CORE_META = ("num_hashes", "bands", "shingle_k", "portable")


def read_sketch_meta(root: str) -> dict | None:
    from .storefs import read_store_json

    return read_store_json(root)


def store_bucket_partitions(root: str) -> int | None:
    """The N the store's banded side was hash-partitioned with (None =
    flat layout). ALWAYS source ``bucket_partitions`` for
    incremental_candidates/incremental_minhash_dups from here — a
    hand-passed N that disagrees with the writer's prunes the WRONG
    partitions and silently drops stored duplicates."""
    meta = read_sketch_meta(root) or {}
    return meta.get("bucket_partitions")


def check_sketch_meta(
    root: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    portable: bool = False,
    bucket_partitions: int | None = ...,
) -> None:
    """Fail fast when a sketch store was built with different
    parameters than the consumer is about to use (bucket keys would
    never collide -> silent zero recall). The signature-shaping keys
    are always compared; pass ``bucket_partitions`` to additionally
    pin the banded layout (a consumer pruning with the wrong N reads
    the wrong partition directories — the same silent-recall-loss
    class). The ellipsis default means "don't check the layout".
    No-op when the store has no meta file (pre-meta stores / empty
    roots)."""
    meta = read_sketch_meta(root)
    if meta is None:
        return
    from .storefs import note_store_participation

    note_store_participation(root, "sets")
    mine = {"num_hashes": num_hashes, "bands": bands,
            "shingle_k": shingle_k, "portable": portable}
    core = {k: meta.get(k) for k in _CORE_META}
    if core != mine:
        raise ValueError(
            f"sketch store at {root} was built with {core}, "
            f"but this run uses {mine} — band buckets would never "
            "match (zero dedup recall); rebuild the store or align "
            "the parameters"
        )
    if bucket_partitions is not ...:
        # a meta file without the key is a store written before the
        # layout was recorded — its banded side is FLAT. Treat absent
        # as None rather than skipping the check: appending a
        # BKT_PART-partitioned tree into a flat leaf would produce a
        # mixed partitioned/flat directory Spark refuses to read, and
        # then restamp meta claiming the partitioned layout.
        theirs = meta.get("bucket_partitions")
        if theirs != bucket_partitions:
            raise ValueError(
                f"sketch store at {root} is hash-partitioned with "
                f"bucket_partitions={theirs}, but this run would prune "
                f"with {bucket_partitions} — the wrong partition "
                "directories would be read (silently dropped "
                "duplicates); use store_bucket_partitions(root)"
            )


def read_sketch_store(spark: SparkSession, root: str) -> tuple[DataFrame, DataFrame]:
    """Read both store sides. Tolerates (drops) the BATCH_PART
    partition column a streaming maintainer (run_dedup_stream) adds —
    the returned frames always have the plain (id, sh) / (id, band,
    bucket) schemas that incremental_minhash_dups unions against."""
    from ..operators.writers import BATCH_COL

    return (
        spark.read.parquet(f"{root}/sets").drop(BATCH_COL),
        spark.read.parquet(f"{root}/banded").drop(BATCH_COL),
    )


def incremental_candidates(
    new_banded: DataFrame,
    old_banded: DataFrame,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    observation=None,
    broadcast_touched: bool = True,
    bucket_partitions: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """Candidate pairs touching at least one NEW doc: new×new and
    new×old within shared buckets, never old×old (those were expanded
    when the old docs were ingested).

    ``cleanup``: pass a list to receive any DataFrames this call
    persisted on your behalf (the bucket_partitions path caches the
    new batch's sketch); unpersist them once the returned pairs are
    materialized. Without it, self-persisted frames live until
    session end — fine for one-shot jobs, a leak in long-lived
    sessions (r3 advice).

    Shape: the store side is first pruned to the buckets the new
    batch actually touches via a BROADCAST semi-join on the batch's
    (band, bucket) keys — the new batch is small by definition, so
    the corpus-sized banded store is filtered at scan time (with a
    bucket-partitioned store, at planning time) instead of being
    shuffled whole. Then one union + one groupBy-the-bucket shuffle
    over (touched store rows + new rows) — steady-state cost tracks
    the increment, not the corpus. The residual old×old pairs inside
    touched buckets are filtered after expansion — bounded by the
    bucket cap, not corpus size.

    ``broadcast_touched``: the hint is right for micro-batch-sized
    increments (the streaming path) — |new| x bands keys broadcast to
    every executor. For a BULK increment (multi-million-doc crawl) the
    key set can exceed driver memory / Spark's 8 GB broadcast cap:
    pass False and AQE picks the join strategy at runtime (a small
    batch still converts to broadcast adaptively).

    ``bucket_partitions``: when the store's banded side is hash-
    partitioned by BKT_PART (write_sketch_store), pass the store's N
    (from _meta.json) — the touched partition ids are collected from
    the new batch (<= N ints) and applied as an isin filter on the
    partition column, so the store scan prunes at PLANNING time:
    untouched partition directories are never even listed."""
    if bucket_partitions and BUCKET_PART_COL in old_banded.columns:
        # the mods collect below executes new_banded's plan; persist it
        # first or the full increment sketch (shingle + minhash) runs
        # TWICE — once for <=N ints, again in the candidate job.
        # Lifecycle: the cache must outlive the returned (lazy) pairs
        # frame, so it cannot be unpersisted here. Callers that
        # already persisted (the streaming path) keep ownership; when
        # WE persist, the frame is appended to ``cleanup`` so the
        # caller can unpersist after materializing the pairs —
        # otherwise it lives until session end (one cached sketch
        # frame per offline run).
        if getattr(new_banded.storageLevel, "useMemory", False) is False:
            new_banded = new_banded.persist()
            if cleanup is not None:
                cleanup.append(new_banded)
        mods = [
            r["m"]
            for r in new_banded.select(
                bucket_part_expr(bucket_partitions).alias("m")
            )
            .distinct()
            .collect()
        ]
        old_banded = old_banded.filter(
            F.col(BUCKET_PART_COL).isin(mods)
        ).drop(BUCKET_PART_COL)
    elif BUCKET_PART_COL in old_banded.columns:
        old_banded = old_banded.drop(BUCKET_PART_COL)
    touched = new_banded.select("band", "bucket").distinct()
    if broadcast_touched:
        touched = F.broadcast(touched)
    old_touched = old_banded.join(touched, ["band", "bucket"], "left_semi")
    tagged = old_touched.select(
        "id", "band", "bucket", F.lit(False).alias("__new")
    ).unionByName(
        new_banded.select("id", "band", "bucket", F.lit(True).alias("__new"))
    )
    member = F.struct(F.col("id").alias("i"), F.col("__new").alias("__new"))
    buckets = (
        tagged.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set(member)).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    if max_bucket_size is not None:
        oversize = F.size("ms") > max_bucket_size
        if observation is not None:
            buckets = buckets.observe(
                observation,
                F.sum(F.when(oversize, 1).otherwise(0)).alias("oversize_buckets"),
                F.sum(F.when(oversize, F.size("ms")).otherwise(0)).alias(
                    "oversize_members"
                ),
            )
        buckets = buckets.filter(~oversize)
    pair_lists = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_lists).alias("p"))
        .filter(F.col("p.a.__new") | F.col("p.b.__new"))
        .select(F.col("p.a.i").alias("id_a"), F.col("p.b.i").alias("id_b"))
        # a replayed micro-batch sees its own prior survivors in the
        # store: the same id is then a member twice (old + new tag),
        # collect_set keeps both structs, and expansion would emit the
        # self-pair (X, X) — which trivially verifies at Jaccard 1.0
        # and dooms X. Guard explicitly (ids are unique, so struct
        # sort still guarantees id_a <= id_b).
        .filter(F.col("id_a") != F.col("id_b"))
    )
    return pairs.dropDuplicates(["id_a", "id_b"])


def incremental_minhash_dups(
    new_df: DataFrame,
    old_sets: DataFrame,
    old_banded: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    portable: bool = False,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    sets_df: DataFrame | None = None,
    banded_df: DataFrame | None = None,
    observation=None,
    broadcast_touched: bool = True,
    bucket_partitions: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """Verified duplicate pairs (id_a < id_b, jaccard) between the new
    batch and (itself ∪ the stored corpus). Equals the batch pipeline's
    verified pairs restricted to pairs touching a new doc — the
    property queries.q_dedup_incremental hash-checks against the batch
    SQL oracle.

    Pass the new batch's (persisted) ``sets_df``/``banded_df`` when the
    caller already computed them (run_dedup_stream does) so shingling —
    the dominant per-row cost — runs once; otherwise they're built and
    persisted here, with the persisted frames appended to ``cleanup``
    when given (unpersist them after materializing the result).
    ``observation`` surfaces oversize-bucket skips (same
    CollectMetrics caveat as pairs_within_buckets)."""
    from .dedup import jaccard_pairs

    new_sets = sets_df
    if new_sets is None:
        new_sets = shingle_sets(
            new_df, text_col, id_col, shingle_k, portable=portable
        ).persist()
        if cleanup is not None:
            cleanup.append(new_sets)
    new_banded = banded_df
    if new_banded is None:
        new_banded = banded_signatures(
            new_df, text_col, id_col, num_hashes, bands, shingle_k,
            sets_df=new_sets, portable=portable,
        )
    cands = incremental_candidates(
        new_banded, old_banded, max_bucket_size=max_bucket_size,
        observation=observation, broadcast_touched=broadcast_touched,
        bucket_partitions=bucket_partitions, cleanup=cleanup,
    )
    # a replayed batch's ids exist on BOTH sides; keep exactly one
    # sketch per id or the verify join fans out per duplicate row. The
    # NEW sketch wins (a re-sent id may carry changed content), and an
    # anti-join on the id column beats a dropDuplicates-wide shuffle of
    # the array-of-shingles frames.
    all_sets = old_sets.join(
        new_sets.select("id"), "id", "left_anti"
    ).unionByName(new_sets)
    return jaccard_pairs(
        new_df, cands, text_col, id_col, shingle_k, threshold,
        sets_df=all_sets,
    )


def sketch_store_forget(
    spark: SparkSession,
    root: str,
    ids: list,
    sides: tuple[str, ...] = ("sets", "banded"),
) -> dict:
    """Right-to-be-forgotten for the MinHash sketch store: physically
    remove the given doc ids from every side — a forgotten document
    must stop generating near-dup candidates, or the pipeline keeps
    matching (and thereby leaking the existence of) content it was
    told to delete. Uses the shared leaf-rewrite primitive
    (``storefs.forget_rows``): touched ``BATCH_PART`` (and, on a
    bucket-partitioned banded side, ``BKT_PART``) leaves only.
    Returns {side: report}. The exact intake's fps side can be
    forgotten the same way by fingerprint:
    ``forget_rows(spark, f"{root}/fps", "__fp", fps, ["BATCH_PART"])``.
    """
    from ..operators.writers import BATCH_COL
    from .storefs import StoreFS, forget_rows

    meta = read_sketch_meta(root) or {}
    bkt_n = meta.get("bucket_partitions")
    fs = StoreFS(root, spark)
    out = {}
    for side in sides:
        path = f"{root}/{side}"
        if not fs.is_dir(path):
            out[side] = {"rows_forgotten": 0, "leaves_rewritten": 0,
                         "leaves_deleted": 0}
            continue
        leaf_cols = [BATCH_COL]
        if side == "banded" and bkt_n:
            leaf_cols.append(BUCKET_PART_COL)
        out[side] = forget_rows(spark, path, "id", ids, leaf_cols)
    return out


def compact_sketch_store(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sides: tuple[str, ...] = ("sets", "banded"),
    atomic_rename: bool | None = None,
) -> dict[str, int]:
    """Collapse a multi-batch sketch store to one ``BATCH_PART=-1``
    leaf per side.

    A streaming maintainer (run_dedup_stream) appends one
    ``BATCH_PART=<id>`` leaf per micro-batch; after 10^4-10^5 batches
    that is the classic small-file / partition-listing pathology —
    every incremental run pays a driver-side listing of every leaf
    ever written. Compaction rewrites each side in
    ceil(bytes/target_file_bytes) files (banded keeps its BKT_PART
    hash-partitioning when present, so planning-time pruning
    survives). Same discipline as compact_partitions for fact tables:
    run it only when no stream is writing the store — after the
    collapse a replayed micro-batch would land beside the compacted
    leaf instead of overwriting its original one.

    Returns {side: files_after}. All directory operations route
    through the Hadoop FileSystem API (storefs.StoreFS), so the store
    root may live on any Hadoop-readable filesystem. Two swap
    protocols, chosen by whether the filesystem's rename is atomic
    (``atomic_rename=None`` infers from the scheme):

    - **Atomic rename** (local, file://, hdfs://): write the compacted
      copy to ``<side>__compacting``, rename the live side aside,
      rename the copy in, drop the aside. Heal-on-entry restores any
      interrupted state (aside without a live side, stale temp/aside).
    - **Non-atomic rename** (s3a:// and other object stores, where
      rename is COPY+DELETE): the aside swap is UNSAFE — a crash
      mid-rename strands objects across both directories, and a naive
      heal deletes the only copy of the stragglers. Instead a staged
      protocol with a ``<side>__COMMIT`` marker (atomic single-object
      PUT): write tmp fully -> marker(stage=committed) -> delete live
      -> marker(stage=renaming) -> rename tmp in -> drop marker.
      Every crash window either rolls forward from the marker or
      (mid-rename only, detectable as BOTH directories present at
      stage=renaming) raises with the data intact — never a silent
      loss.

    Run only when no stream writes the store (sealed-store contract —
    load-bearing on object stores, not advisory): after the collapse
    a replayed micro-batch would land beside the compacted leaf
    instead of overwriting its original one."""
    import math

    from ..operators.writers import BATCH_COL
    from .storefs import StoreFS, rename_is_atomic, swap_dir

    if atomic_rename is None:
        atomic_rename = rename_is_atomic(root)
    fs = StoreFS(root, spark)
    done: dict[str, int] = {}
    for side in sides:
        # heal an interrupted previous run FIRST, in crash-window
        # order (so the layout check below sees the true side set)
        _heal_side(fs, root, side)
    present = [s for s in sides if fs.is_dir(f"{root}/{s}")]
    # a store always writes its sides together, so a partial match
    # means the caller named the WRONG layout (e.g. text sides against
    # an embedding store, which shares "banded") — half-compacting and
    # reporting success would leave the primary side pathological
    if present and set(present) != set(sides):
        raise ValueError(
            f"store at {root} has sides {present} but {sides} were "
            "requested — wrong store kind?"
        )
    seen_any = False
    for side in sides:
        src = f"{root}/{side}"
        tmp = f"{root}/{side}__compacting"
        if not fs.is_dir(src):
            continue
        seen_any = True
        total = sum(sz for _, sz in fs.list_files(src, ".parquet"))
        n_files = max(1, math.ceil(total / target_file_bytes))
        df = spark.read.parquet(src).drop(BATCH_COL)
        leaf = f"{tmp}/{BATCH_COL}=-1"
        if side == "banded" and BUCKET_PART_COL in df.columns:
            # one shuffle partition per BKT_PART value keeps each hash
            # partition's rows together; maxRecordsPerFile splits the
            # big ones so target_file_bytes is still honored (a plain
            # repartition(n, BKT_PART) caps at ONE file per value)
            n_rows = df.count()
            per_file = max(
                1, int(n_rows * target_file_bytes / max(total, 1))
            )
            (
                df.repartition(BUCKET_PART_COL)
                .write.option("maxRecordsPerFile", per_file)
                .partitionBy(BUCKET_PART_COL)
                .parquet(leaf)
            )
        else:
            df.repartition(n_files).write.parquet(leaf)
        swap_dir(
            fs, src, tmp,
            aside=f"{root}/{side}__old",
            marker=f"{root}/{side}__COMMIT",
            atomic=atomic_rename,
        )
        done[side] = len(fs.list_files(src, ".parquet"))
    if not seen_any:
        raise ValueError(f"no sketch store sides found under {root}")
    return done


def _heal_side(fs, root: str, side: str) -> None:
    """Restore a side from any crash window of either swap protocol
    (storefs.swap_dir, shared with the fact-table compactor)."""
    from .storefs import heal_swap

    heal_swap(
        fs,
        live=f"{root}/{side}",
        tmp=f"{root}/{side}__compacting",
        aside=f"{root}/{side}__old",
        marker=f"{root}/{side}__COMMIT",
    )


def sketch_store_stats(spark: SparkSession, root: str) -> dict:
    """Leaf-bloat accounting for the MinHash sketch store, the
    sketch sibling of ``substring_store_stats`` — per-leaf row counts
    of the ``sets/`` side from one zero-payload count scan (the
    ``banded/`` side mirrors it leaf-for-leaf, so one side prices
    both). Bootstrap is exactly leaf -1; every other leaf is a
    stream/manual append and is compactable bloat (each appended
    leaf adds file listings and duplicate-id resolution work to
    every probe).

    ``{"rows_total", "rows_bootstrap", "rows_appended",
       "appended_fraction", "n_append_batches"}``"""
    from ..operators.writers import BATCH_COL

    if read_sketch_meta(root) is None:
        raise ValueError(
            f"no sketch store at {root} (missing _meta.json) — build "
            "it with write_sketch_store / the sketch CLI first"
        )
    per = {
        int(r[BATCH_COL]): int(r["n"])
        for r in spark.read.parquet(f"{root}/sets")
        .groupBy(BATCH_COL).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    boot = per.get(-1, 0)
    total = sum(per.values())
    appended = total - boot
    return {
        "rows_total": total,
        "rows_bootstrap": boot,
        "rows_appended": appended,
        "appended_fraction": round(appended / total, 6) if total else 0.0,
        "n_append_batches": sum(1 for b in per if b != -1),
    }


def sketch_store_compact_decision(
    spark: SparkSession,
    root: str,
    max_appended_fraction: float = 0.5,
    max_append_batches: int = 64,
) -> dict:
    """Actionable COMPACT verdict for the sketch store (sketch set
    membership is exact, so like the gram index the action is
    compact-for-probe-cost, never rebuild-for-quality). Leaf counts
    only — per-epoch safe; reasons name the exact threshold
    crossed."""
    stats = sketch_store_stats(spark, root)
    reasons: list[str] = []
    if stats["appended_fraction"] > max_appended_fraction:
        reasons.append(
            f"appended_fraction {stats['appended_fraction']} > "
            f"{max_appended_fraction}"
        )
    if stats["n_append_batches"] > max_append_batches:
        reasons.append(
            f"n_append_batches {stats['n_append_batches']} > "
            f"{max_append_batches}"
        )
    return {**stats, "compact": bool(reasons), "reasons": reasons}

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
) -> None:
    """Materialize the sketch layer for ``df`` (one shingling pass —
    the sets feed the banded signatures).

    Written under a ``BATCH_PART=-1`` leaf so the layout is identical
    to what a streaming maintainer (run_dedup_stream) appends —
    partition discovery rejects mixed flat/nested trees, so a
    bootstrap store must match the stream's batch-keyed shape."""
    import json
    import os

    from ..operators.writers import BATCH_COL

    sets_df = shingle_sets(df, text_col, id_col, shingle_k, portable=portable)
    sets_df.write.mode(mode).parquet(f"{root}/sets/{BATCH_COL}=-1")
    banded = banded_signatures(
        df, text_col, id_col, num_hashes, bands, shingle_k,
        sets_df=sets_df, portable=portable,
    )
    banded.write.mode(mode).parquet(f"{root}/banded/{BATCH_COL}=-1")
    # record the sketch parameters: signatures built with different
    # num_hashes/bands/shingle_k produce disjoint band buckets, so a
    # mismatched consumer would silently find ZERO candidates — make
    # that a hard error instead (check_sketch_meta)
    with open(os.path.join(root, "_meta.json"), "w") as f:
        json.dump(
            {"num_hashes": num_hashes, "bands": bands,
             "shingle_k": shingle_k, "portable": portable}, f,
        )


def check_sketch_meta(
    root: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    portable: bool = False,
) -> None:
    """Fail fast when a sketch store was built with different
    parameters than the consumer is about to use (bucket keys would
    never collide -> silent zero recall). No-op when the store has no
    meta file (pre-meta stores / empty roots)."""
    import json
    import os

    path = os.path.join(root, "_meta.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        meta = json.load(f)
    mine = {"num_hashes": num_hashes, "bands": bands,
            "shingle_k": shingle_k, "portable": portable}
    if meta != mine:
        raise ValueError(
            f"sketch store at {root} was built with {meta}, "
            f"but this run uses {mine} — band buckets would never "
            "match (zero dedup recall); rebuild the store or align "
            "the parameters"
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
) -> DataFrame:
    """Candidate pairs touching at least one NEW doc: new×new and
    new×old within shared buckets, never old×old (those were expanded
    when the old docs were ingested).

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
    batch still converts to broadcast adaptively)."""
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
) -> DataFrame:
    """Verified duplicate pairs (id_a < id_b, jaccard) between the new
    batch and (itself ∪ the stored corpus). Equals the batch pipeline's
    verified pairs restricted to pairs touching a new doc — the
    property queries.q_dedup_incremental hash-checks against the batch
    SQL oracle.

    Pass the new batch's (persisted) ``sets_df``/``banded_df`` when the
    caller already computed them (run_dedup_stream does) so shingling —
    the dominant per-row cost — runs once; otherwise they're built and
    persisted here. ``observation`` surfaces oversize-bucket skips
    (same CollectMetrics caveat as pairs_within_buckets)."""
    from .dedup import jaccard_pairs

    new_sets = sets_df
    if new_sets is None:
        new_sets = shingle_sets(
            new_df, text_col, id_col, shingle_k, portable=portable
        ).persist()
    new_banded = banded_df
    if new_banded is None:
        new_banded = banded_signatures(
            new_df, text_col, id_col, num_hashes, bands, shingle_k,
            sets_df=new_sets, portable=portable,
        )
    cands = incremental_candidates(
        new_banded, old_banded, max_bucket_size=max_bucket_size,
        observation=observation, broadcast_touched=broadcast_touched,
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

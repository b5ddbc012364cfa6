"""Incremental contamination attribution against a persisted
benchmark gram index — the steady-state shape of
``substring.contamination_attribution``.

The batch report re-fingerprints the WHOLE corpus per run; a training
pipeline wants running per-benchmark counters maintained as crawl
batches land, with the report a read of benchmark-sized state (the
r10 verdict's What's missing #2). Store layout under ``root``:

- ``bench_grams/`` — the frozen eval-suite index: DISTINCT
  (bench_id, fp) pairs, hash-partitioned by ``BKT_PART = pmod(fp, N)``
  so a batch probe reads only the partitions it touches (the same
  planning-time prune as the substring store). Rebuilt wholesale when
  the suite changes; never mutated by batches.
- ``bench_sizes/`` — (bench_id, n_grams): each eval doc's distinct
  gram count, the report's denominator. Suite-sized.
- ``hits/`` — which (bench_id, fp) pairs the corpus has hit SO FAR.
  Batch-keyed leaves (idempotent dynamic overwrite under stream
  replay); each append anti-joins the OTHER leaves, so a pair lives
  in exactly the first leaf that saw it and the store stays
  <= suite-gram-count rows FOREVER — benchmark-sized state, not
  corpus-sized, not batches-sized.
- ``counters/`` — one (bench_id, n_occurrences, n_docs) row per
  benchmark per batch. Occurrences are additive; per-batch distinct
  corpus docs sum to the global distinct count because an intake
  admits each doc exactly once (the same contract every other
  streamed store relies on).

Per-batch cost at 100 TB/day: one gram projection over the batch
(shared with whatever else the intake computes), the BKT_PART-pruned
probe join, and two suite-bounded writes. The historical corpus is
never re-read; the report never touches corpus text at all.

Batch-id namespaces follow ``incremental_substring``: streams pass
their checkpoint-issued id (>= 0), manual/CLI appends auto-number
downward from -2; the bootstrap suite build owns no batch id (it is
not a batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.writers import BATCH_COL
from .incremental_substring import BKT_PART_COL, _bkt_expr
from .storefs import (
    StoreFS,
    note_store_participation,
    read_store_json,
    write_store_json,
)
from .substring import gram_offsets


def write_attribution_store(
    bench: DataFrame,
    text_col: str,
    id_col: str,
    root: str,
    L: int = 8,
    bucket_partitions: int | None = None,
) -> None:
    """Materialize the frozen benchmark index: per-doc distinct gram
    fingerprints keyed (bench_id, fp) plus the per-doc gram counts.
    Overwrites wholesale — the suite is versioned evidence; changing
    it invalidates the running counters, so this also clears any
    existing ``hits/`` and ``counters/`` state."""
    spark = bench.sparkSession
    fs = StoreFS(root, spark)
    bg = (
        gram_offsets(bench, text_col, id_col, L)
        .select(F.col(id_col).alias("bench_id"), "fp")
        .distinct()
    )
    writer = bg
    if bucket_partitions:
        writer = bg.withColumn(BKT_PART_COL, _bkt_expr(bucket_partitions))
        (
            writer.write.mode("overwrite")
            .partitionBy(BKT_PART_COL)
            .parquet(f"{root}/bench_grams")
        )
    else:
        writer.write.mode("overwrite").parquet(f"{root}/bench_grams")
    (
        _read_bench_grams(spark, root, bucket_partitions)
        .groupBy("bench_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .write.mode("overwrite")
        .parquet(f"{root}/bench_sizes")
    )
    for stale in ("hits", "counters"):
        if fs.is_dir(f"{root}/{stale}"):
            fs.delete(f"{root}/{stale}")
    write_store_json(
        root,
        {
            "kind": "attribution",
            "L": L,
            "bucket_partitions": bucket_partitions,
        },
        spark=spark,
    )


def check_attribution_meta(root: str, spark: SparkSession) -> dict:
    meta = read_store_json(root, spark=spark)
    if meta is None or meta.get("kind") != "attribution":
        raise ValueError(
            f"{root} is not an attribution store (missing/foreign "
            "_meta.json) — build it with write_attribution_store"
        )
    note_store_participation(root, "counters")
    return meta


def _read_bench_grams(
    spark: SparkSession, root: str, nbkt
) -> DataFrame:
    """Schema-pinned read of the suite index: an eval suite whose
    docs are ALL shorter than L grams writes an EMPTY bench_grams/
    (directory, zero data files) — inferred-schema reads of it raise
    UNABLE_TO_INFER_SCHEMA and would brick the build's sizes pass and
    every probe (found by the r11 stream==batch property test)."""
    schema = "bench_id bigint, fp bigint"
    if nbkt:
        schema += f", {BKT_PART_COL} int"
    return (
        spark.read.schema(schema)
        .option("basePath", f"{root}/bench_grams")
        .parquet(f"{root}/bench_grams")
    )


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a counter/hit area with its schema PINNED: a crawl batch
    with zero suite overlap dynamic-overwrites an EMPTY frame, which
    creates the directory with no data files — an inferred-schema
    read of that raises UNABLE_TO_INFER_SCHEMA and would brick every
    later update/report (r11 review finding)."""
    fs = StoreFS(path, spark)
    if fs.is_dir(path):
        return spark.read.schema(schema).option("basePath", path).parquet(path)
    from ..session import local_frame

    return local_frame(spark, [], schema)


def attribution_update(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    batch_id: int | None = None,
    grams: DataFrame | None = None,
) -> int:
    """Fold one crawl batch into the running attribution state.

    One gram projection over the batch (or the caller's ``grams``,
    when the intake already fingerprinted it), one probe join pruned
    to the touched BKT_PART partitions, then two suite-bounded
    appends under the batch's own leaf (idempotent dynamic overwrite
    on replay): per-benchmark occurrence/doc counters, and the
    batch's NEWLY-hit (bench_id, fp) pairs — anti-joined against the
    other leaves so the hits store never exceeds the suite's gram
    count."""
    meta = check_attribution_meta(root, spark)
    L = int(meta["L"])
    nbkt = meta.get("bucket_partitions")
    if batch_id is None:
        # scan BOTH leaf areas: a batch whose hits were all
        # already-seen writes a counters leaf but no hits leaf (the
        # empty dynamic overwrite creates no partition dir), so a
        # hits-only scan would reuse its id and silently destroy its
        # counters (r11 review finding). A batch with zero overlap
        # writes neither leaf — reusing ITS id overwrites nothing.
        fs = StoreFS(root, spark)
        manual = [
            b
            for area in ("hits", "counters")
            for name in fs.list_dirs(f"{root}/{area}")
            if name.startswith(f"{BATCH_COL}=")
            and (b := int(name.split("=", 1)[1])) < -1
        ]
        batch_id = (min(manual) - 1) if manual else -2
    batch_id = int(batch_id)

    g = grams if grams is not None else gram_offsets(docs, text_col, id_col, L)
    bench = _read_bench_grams(spark, root, nbkt)
    own_g = nbkt and grams is None
    if own_g:
        # the touched-bucket collect AND the probe join both consume
        # the batch's grams — persist the projection we own so the
        # batch text is fingerprinted ONCE per update, not twice
        # (callers that pass ``grams`` manage their own lifecycle)
        g = g.persist()
    if nbkt:
        touched = sorted(
            r["b"]
            for r in g.select(_bkt_expr(int(nbkt)).alias("b"))
            .distinct()
            .collect()
        )
        bench = bench.filter(F.col(BKT_PART_COL).isin(touched))
    # per-(bench, fp, doc) occurrences; everything downstream of this
    # join is suite-bounded
    hits = g.join(bench.select("bench_id", "fp"), "fp").persist()
    try:
        counters = hits.groupBy("bench_id").agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        (
            counters.withColumn(BATCH_COL, F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(f"{root}/counters")
        )
        seen = _read_or_empty(
            spark, f"{root}/hits", f"bench_id bigint, fp bigint, {BATCH_COL} int"
        ).filter(F.col(BATCH_COL) != batch_id)
        fresh = (
            hits.select("bench_id", "fp")
            .distinct()
            .join(seen.select("bench_id", "fp"), ["bench_id", "fp"],
                  "left_anti")
        )
        (
            fresh.withColumn(BATCH_COL, F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(f"{root}/hits")
        )
    finally:
        hits.unpersist()
        if own_g:
            g.unpersist()
    return batch_id


def attribution_report(spark: SparkSession, root: str) -> DataFrame:
    """The standing per-benchmark contamination report — schema-equal
    to ``substring.contamination_attribution`` but computed ENTIRELY
    from benchmark-sized store state: no corpus scan, no
    re-fingerprinting, safe to run on every dashboard refresh.

    (bench_id, n_grams, hit_grams, n_occurrences, n_corpus_docs,
    contaminated_frac), TOTAL over benchmark docs with >= 1 gram."""
    check_attribution_meta(root, spark)
    # schema-pinned for the same empty-suite reason as bench_grams
    sizes = spark.read.schema("bench_id bigint, n_grams bigint").parquet(
        f"{root}/bench_sizes"
    )
    hit_counts = (
        _read_or_empty(
            spark, f"{root}/hits", f"bench_id bigint, fp bigint, {BATCH_COL} int"
        )
        .select("bench_id", "fp")
        .distinct()
        .groupBy("bench_id")
        .agg(F.count(F.lit(1)).alias("hit_grams"))
    )
    sums = (
        _read_or_empty(
            spark,
            f"{root}/counters",
            f"bench_id bigint, n_occurrences bigint, n_docs bigint, "
            f"{BATCH_COL} int",
        )
        .groupBy("bench_id")
        .agg(
            F.sum("n_occurrences").alias("n_occurrences"),
            F.sum("n_docs").alias("n_corpus_docs"),
        )
    )
    # every side is suite-sized; broadcast the counter reads so the
    # report never shuffles
    return (
        sizes.join(F.broadcast(hit_counts), "bench_id", "left")
        .join(F.broadcast(sums), "bench_id", "left")
        .select(
            "bench_id",
            "n_grams",
            F.coalesce("hit_grams", F.lit(0)).alias("hit_grams"),
            F.coalesce("n_occurrences", F.lit(0)).alias("n_occurrences"),
            F.coalesce("n_corpus_docs", F.lit(0)).alias("n_corpus_docs"),
            F.round(
                F.coalesce("hit_grams", F.lit(0)) / F.col("n_grams"), 6
            ).alias("contaminated_frac"),
        )
    )

"""Build-once / serve-many bench cases for store-backed queries.

The driver queries (q_ann_pq_stored, q_ann_ivfpq_stored,
q_ann_pq_batch, q_ann_pq_join, q_semantic_dedup_largek) rebuild their
store/model INSIDE the query function — necessary for oracle
replayability, but it makes the bench headline time training, not
serving: a genuine serving regression (e.g. the cell-pruned scan
losing its PartitionFilters) would drown inside +-10% Lloyd noise on
a ~10 s build (the r7 verdict's finding #2).

This module exposes the same workloads SPLIT at the store boundary so
``bench.py`` can build each store once outside the timed region and
record a serve-only median per query. Geometries mirror the driver
queries exactly, so the serve number is the serving cost of that
exact query shape.

Each case is ``(build, serve)``:

- ``build(spark, sf_dir) -> ctx`` — train + persist (untimed; its
  one-off wall time is recorded separately as ``build_s``). ``ctx``
  carries whatever the serve leg needs, plus ``ctx["root"]`` when a
  temp directory must be removed after the bench.
- ``serve(spark, sf_dir, ctx) -> DataFrame`` — the per-request plan,
  answered entirely from the persisted/trained artifacts (timed,
  median-of-reps through the noop sink).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import load_tables

BuildFn = Callable[[SparkSession, str], dict]
ServeFn = Callable[[SparkSession, str, dict], DataFrame]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["embeddings"])["embeddings"]


def _qv(emb: DataFrame, vec_id: int = 0):
    import numpy as np

    return np.array(
        [float(x) for x in
         emb.filter(F.col("vec_id") == vec_id).first()["embedding"]],
        dtype=np.float64,
    )


def _build_pq_stored(spark: SparkSession, sf_dir: str) -> dict:
    from .llm_ops.pq_store import pq_store_append, write_pq_store

    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="chill_bench_pqst_")
    write_pq_store(emb.filter(F.col("vec_id") % 5 != 4), root,
                   dim=64, m=4, k=16, iters=2)
    pq_store_append(emb.filter(F.col("vec_id") % 5 == 4), root)
    return {"root": root, "qv": _qv(emb)}


def _serve_pq_stored(spark: SparkSession, sf_dir: str,
                     ctx: dict) -> DataFrame:
    from .llm_ops.pq_store import pq_store_topk

    return pq_store_topk(spark, ctx["root"], ctx["qv"], n=10,
                         where=F.col("vec_id") != 0)


def _build_ivfpq_stored(spark: SparkSession, sf_dir: str) -> dict:
    from .llm_ops.pq_store import write_pq_store

    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="chill_bench_ivfst_")
    write_pq_store(emb, root, dim=64, m=8, k=8, iters=2, cells=6)
    return {"root": root, "qv": _qv(emb)}


def _serve_ivfpq_stored(spark: SparkSession, sf_dir: str,
                        ctx: dict) -> DataFrame:
    from .llm_ops.pq_store import pq_store_topk

    return pq_store_topk(spark, ctx["root"], ctx["qv"], n=10, nprobe=2,
                         where=F.col("vec_id") != 0)


def _build_pq_batch(spark: SparkSession, sf_dir: str) -> dict:
    from .llm_ops.pq_store import write_pq_store

    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="chill_bench_pqb_")
    write_pq_store(emb, root, dim=64, m=4, k=16, iters=2)
    return {"root": root}


def _qset(spark: SparkSession, sf_dir: str, ids: list[int]) -> DataFrame:
    return _emb(spark, sf_dir).filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def _serve_pq_batch(spark: SparkSession, sf_dir: str,
                    ctx: dict) -> DataFrame:
    from .llm_ops.pq_store import pq_store_topk_batch

    return pq_store_topk_batch(
        spark, ctx["root"], _qset(spark, sf_dir, [0, 7, 13]), n=5
    )


def _build_pq_join(spark: SparkSession, sf_dir: str) -> dict:
    from .llm_ops.pq_store import write_pq_store

    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="chill_bench_pqj_")
    write_pq_store(emb, root, dim=64, m=4, k=8, iters=2, cells=5)
    return {"root": root}


def _serve_pq_join(spark: SparkSession, sf_dir: str,
                   ctx: dict) -> DataFrame:
    from .llm_ops.pq_store import pq_store_topk_join

    return pq_store_topk_join(
        spark, ctx["root"], _qset(spark, sf_dir, [3, 9, 17]),
        n=4, nprobe=2,
    )


def _build_semdedup_largek(spark: SparkSession, sf_dir: str) -> dict:
    from .llm_ops.similarity import hash_seed_centroids, kmeans_fit

    emb = _emb(spark, sf_dir)
    seeds = hash_seed_centroids(emb, k=72, vec_col="embedding",
                                id_col="vec_id")
    cents = kmeans_fit(emb, "embedding", k=72, iters=2,
                       init_centroids=seeds, round_means=9)
    return {"centroids": cents}


def _serve_semdedup_largek(spark: SparkSession, sf_dir: str,
                           ctx: dict) -> DataFrame:
    from .llm_ops.semantic import semantic_dedup

    return semantic_dedup(
        _emb(spark, sf_dir), tau=0.4, dim=64,
        centroids=ctx["centroids"],
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def _build_substring_inc(spark: SparkSession, sf_dir: str) -> dict:
    """Mirror of q_substring_dedup_incremental's store: bootstrap on
    doc_id%3==1, one append of %3==2, bucketed 8 ways (L=8)."""
    from .llm_ops.incremental_substring import (
        substring_store_append,
        write_substring_store,
    )

    d = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="chill_bench_substr_")
    store = f"{root}/store"
    write_substring_store(
        d.filter(F.col("doc_id") % 3 == 1), "text", "doc_id", store,
        L=8, bucket_partitions=8,
    )
    substring_store_append(
        d.filter(F.col("doc_id") % 3 == 2), "text", "doc_id", store
    )
    return {"root": root, "store": store}


def _serve_substring_inc(spark: SparkSession, sf_dir: str,
                         ctx: dict) -> DataFrame:
    """The probe leg alone: new-batch gram offsets equi-join the
    BKT_PART-pruned store + span merge — the per-crawl-batch cost
    once the index is built (plan-gated: PartitionFilters on
    BKT_PART, tests/test_substring_dedup.py)."""
    from .llm_ops.incremental_substring import incremental_duplicate_spans

    d = _docs(spark, sf_dir)
    return incremental_duplicate_spans(
        spark, ctx["store"], d.filter(F.col("doc_id") % 3 == 0),
        "text", "doc_id",
    )


def _build_decontam_bloom(spark: SparkSession, sf_dir: str) -> dict:
    """Mirror of q_decontam_bloom's filter: distinct 3-grams of the
    doc_id%20==0 benchmark docs in a 131072-bit / 5-hash filter."""
    from .llm_ops.bloom import read_bloom_store, write_bloom_store
    from .llm_ops.text import normalize_text

    d = _docs(spark, sf_dir)
    n = 3
    t = F.split(normalize_text("text"), " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    bench = (
        d.filter(F.col("doc_id") % 20 == 0)
        .select(F.explode(F.array_distinct(F.transform(
            starts, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))
        ))).alias("g"))
        .distinct()
    )
    root = tempfile.mkdtemp(prefix="chill_bench_bloom_")
    write_bloom_store(bench, "g", root, num_bits=131072, num_hashes=5,
                      extra_meta={"grams_n": n})
    words, meta = read_bloom_store(spark, root)
    return {"root": root, "words": words, "meta": meta}


def _serve_decontam_bloom(spark: SparkSession, sf_dir: str,
                          ctx: dict) -> DataFrame:
    """The gate leg alone: per-doc verdict over the training corpus
    via the codegen'd explode+groupBy shape (doc_gram_flags) — the
    probe stage is map-only (plan-gated in tests/test_bloom.py and
    the serve-case gate); the only Exchange carries one row per
    doc. Measured 3x faster than the interpreted array-expression
    variant at this exact geometry."""
    from .streaming.decontam_stream import doc_gram_flags

    d = _docs(spark, sf_dir)
    return doc_gram_flags(
        d.filter(F.col("doc_id") % 20 != 0), "text", "doc_id",
        ctx["words"], int(ctx["meta"]["num_bits"]),
        int(ctx["meta"]["num_hashes"]), n=int(ctx["meta"]["grams_n"]),
    )


def _build_classifier_model(spark: SparkSession, sf_dir: str) -> dict:
    """Mirror of q_classifier_calibration's training leg: the
    2-iteration exact-integer logreg over documents (label = lang ==
    'en'), persisted as a (tok, weight) parquet model artifact — the
    thing a production scorer loads, never retrains per request."""
    from .llm_ops.classifier import train_logreg

    d = _docs(spark, sf_dir)
    label = F.coalesce(F.col("lang") == "en", F.lit(False))
    weights = train_logreg(
        d, "doc_id", "text", label, iters=2, lr=0.5
    ).select("tok", F.col("w_units").alias("weight"))
    root = tempfile.mkdtemp(prefix="chill_bench_clf_")
    weights.write.mode("overwrite").parquet(f"{root}/weights")
    return {"root": root, "weights_path": f"{root}/weights"}


def _serve_classifier_score(spark: SparkSession, sf_dir: str,
                            ctx: dict) -> DataFrame:
    """The steady-state serving shape: score_documents against the
    PRE-TRAINED weights table — one broadcast model join over the
    exploded tokens, one per-doc integer-sum Exchange, nothing else
    (plan-gated in tests/test_bench_headline.py). This is the number
    a lost broadcast or an extra shuffle actually moves;
    q_classifier_calibration's headline median times train+score+
    report in one rep and would bury it (the r9 verdict's order #6,
    same hiding risk the PQ stores had pre-r8)."""
    from .llm_ops.classifier import score_documents

    d = _docs(spark, sf_dir)
    weights = spark.read.parquet(ctx["weights_path"])
    return score_documents(
        d, "doc_id", "text", weights, weight_scale=1_000_000
    )


def _build_prep_bench_store(spark: SparkSession, sf_dir: str) -> dict:
    """Mirror of the ``corpus-prep --bench-store`` production path:
    the doc_id%20==0 eval suite frozen ONCE into a bucketed substring
    gram index (same L as q_corpus_prep_v3's in-query scrub)."""
    from .llm_ops.incremental_substring import write_substring_store

    d = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="chill_bench_prep_")
    store = f"{root}/store"
    write_substring_store(
        d.filter(F.col("doc_id") % 20 == 0), "text", "doc_id", store,
        L=8, bucket_partitions=8,
    )
    return {"root": root, "store": store}


def _serve_prep_v3_probe(spark: SparkSession, sf_dir: str,
                         ctx: dict) -> DataFrame:
    """The chain-with-probe leg alone: the full corpus-prep v3
    pipeline where the benchmark side is the PERSISTED gram index
    (BKT_PART-pruned probe join) instead of in-query suite
    fingerprinting — the cost a production run pays per corpus
    refresh once the suite is frozen. q_corpus_prep_v3's headline
    median times the suite fingerprinting inside the rep (necessary
    for oracle replayability); this is the serve split that moves
    when the probe regresses (the r10 verdict's order #5).
    Plan-gated: tests/test_bench_headline.py asserts PartitionFilters
    on BKT_PART and no benchmark gram re-derivation in this plan."""
    from .llm_ops.prep import corpus_prep

    d = _docs(spark, sf_dir)
    return corpus_prep(
        d.filter(F.col("doc_id") % 20 != 0), "text", "doc_id", "source",
        bench_store=ctx["store"], spark=spark, L=8,
    )


def _build_attribution_store(spark: SparkSession, sf_dir: str) -> dict:
    """Mirror of q_contamination_incremental's state: the doc_id%20==0
    suite frozen into the attribution index, the rest of the corpus
    folded in as three crawl batches."""
    from .llm_ops.attribution import (
        attribution_update,
        write_attribution_store,
    )

    d = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="chill_bench_attr_")
    store = f"{root}/store"
    write_attribution_store(
        d.filter(F.col("doc_id") % 20 == 0), "text", "doc_id", store,
        L=8, bucket_partitions=8,
    )
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    for wave in range(3):
        attribution_update(
            spark, store, corpus.filter(F.col("doc_id") % 3 == wave),
            "text", "doc_id",
        )
    return {"root": root, "store": store}


def _serve_attribution_report(spark: SparkSession, sf_dir: str,
                              ctx: dict) -> DataFrame:
    """The standing report alone: a read of benchmark-sized store
    state (suite-bounded joins, broadcast-only) — the dashboard
    refresh cost once the counters are maintained in-stream.
    q_contamination_incremental's headline median times bootstrap +
    three folds; a regression that re-introduces a corpus scan into
    the report moves THIS number by orders of magnitude."""
    from .llm_ops.attribution import attribution_report

    return attribution_report(spark, ctx["store"])


def store_cases() -> dict[str, tuple[BuildFn, ServeFn]]:
    """name -> (build, serve), keyed by the HEADLINE query whose
    serving path each case isolates."""
    return {
        "q_ann_pq_stored": (_build_pq_stored, _serve_pq_stored),
        "q_ann_ivfpq_stored": (_build_ivfpq_stored, _serve_ivfpq_stored),
        "q_ann_pq_batch": (_build_pq_batch, _serve_pq_batch),
        "q_ann_pq_join": (_build_pq_join, _serve_pq_join),
        "q_semantic_dedup_largek": (
            _build_semdedup_largek, _serve_semdedup_largek,
        ),
        "q_substring_dedup_incremental": (
            _build_substring_inc, _serve_substring_inc,
        ),
        "q_decontam_bloom": (
            _build_decontam_bloom, _serve_decontam_bloom,
        ),
        "q_classifier_calibration": (
            _build_classifier_model, _serve_classifier_score,
        ),
        "q_corpus_prep_v3": (
            _build_prep_bench_store, _serve_prep_v3_probe,
        ),
        "q_contamination_incremental": (
            _build_attribution_store, _serve_attribution_report,
        ),
    }

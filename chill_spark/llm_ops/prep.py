"""Corpus-prep pipeline composition: the production pretraining-data
chain in ONE declarative plan.

    benchmark scrub -> substring self-dedup -> quality filter ->
    exact dedup -> deterministic split -> fixed-budget packing

Ordering matters and is the production order (reference behavior:
the Chill harness stages transformations before loading,
``Partrans.py``; the LLM-pipeline stages follow Lee et al. 2022 and
the Gopher/C4 filtering literature):

- the scrub runs FIRST so benchmark text can never influence keeper
  election, quality stats, or the dedup fingerprint;
- self-dedup runs on the SCRUBBED text, so a doc whose only unique
  content was benchmark-contaminated collapses and its boilerplate
  loses keeper elections it should never have won;
- the length/repetition filter sees the twice-cleaned text (a doc
  whose bulk was duplicated or contaminated now fails the length
  gate);
- exact dedup collapses docs that became identical after the
  rewrites; split + packing run on the survivors.

Every stage is an existing oracle-checked operator — this module only
owns the composition, shared by the driver query
(``q_corpus_prep_v3``) and the ``corpus-prep`` CLI so the two can
never drift.

Scale shape: two span passes (each one gram projection + probe/
election shuffle + per-doc islands window + array-filter rewrite),
one fingerprint shuffle for the exact dedup, a shuffle-free split
assignment, and a two-phase distributed prefix sum for the packing
(``chunking.distributed_running_offset`` — one full-data exchange on
(source, split, order-range bucket); no single task ever sorts a
whole shard). The benchmark side broadcasts (eval-suite-sized) or
probes a persisted gram store with BKT_PART pruning — the corpus is
never re-fingerprinted for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def corpus_prep(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str = "source",
    *,
    bench: DataFrame | None = None,
    bench_store: str | None = None,
    spark: SparkSession | None = None,
    L: int = 8,
    min_tokens: int = 30,
    max_rep: float = 0.2,
    budget: int = 512,
) -> DataFrame:
    """Run the full prep chain over ``docs``; returns one row per
    SURVIVING doc: (id, source, split, n_tok, seq_id) where ``n_tok``
    is the post-rewrite token count the packer consumed and ``seq_id``
    is the ``budget``-token training sequence the doc packs into
    (NULL outside the train split).

    The benchmark for the scrub stage comes from exactly one of:
    ``bench`` (a DataFrame, fingerprinted in-query — the
    oracle-replayable shape) or ``bench_store`` (+ ``spark``; a
    persisted gram index built once with ``write_substring_store`` —
    the steady-state shape, probed with BKT_PART pruning). With
    neither, the scrub stage is skipped and this is the v2 chain.
    """
    from .dedup import dedup_exact
    from .sampling import assign_split
    from .substring import (
        apply_span_removal,
        benchmark_overlap_spans,
        remove_spans,
    )
    from .text import with_repetition_stats

    if bench is not None and bench_store is not None:
        raise ValueError("pass bench= or bench_store=, not both")

    cur = docs.select(id_col, source_col, text_col)
    if bench_store is not None:
        from .incremental_substring import store_overlap_spans

        if spark is None:
            raise ValueError("bench_store= needs spark=")
        spans0 = store_overlap_spans(spark, bench_store, cur, text_col, id_col)
    elif bench is not None:
        spans0 = benchmark_overlap_spans(cur, bench, text_col, id_col, L)
    else:
        spans0 = None
    from .chunking import _retire_old_persists

    # Persist each rewrite stage's (id, cleaned) output: the scrub
    # result feeds BOTH sides of the self-dedup pass (gram projection
    # and rewrite tokenization) plus the downstream joins, and the
    # self-dedup result feeds the quality filter + exact dedup —
    # without the cache each consumer re-executes the whole upstream
    # probe/election/rewrite subchain. Interleaved A/B at sf0.1:
    # ~30% off the cold chain (12.1 -> 8.2 s). The r11 round measured
    # and rejected eager localCheckpoints here (materialization cost
    # exceeded the reuse); lazy persists keep the reuse without the
    # eager write. Retired LRU-style via the shared packer list so a
    # long driver never accumulates cache entries.
    if spans0 is not None:
        scrubbed = apply_span_removal(cur, spans0, text_col, id_col).persist()
        _retire_old_persists(scrubbed)
        cur = (
            cur.select(id_col, source_col)
            .join(scrubbed, id_col)
            .withColumnRenamed("cleaned", text_col)
        )

    cleaned = remove_spans(cur, text_col, id_col, L).persist()
    _retire_old_persists(cleaned)
    cur = (
        cur.select(id_col, source_col)
        .join(cleaned, id_col)
        .withColumnRenamed("cleaned", text_col)
    )

    filtered = with_repetition_stats(cur, text_col).filter(
        (F.col("n_tok") >= min_tokens) & (F.col("rep_ratio") < max_rep)
    )
    deduped = dedup_exact(filtered, text_col, id_col)
    split = assign_split(deduped, id_col)

    from .chunking import distributed_running_offset

    # non-train rows contribute 0 tokens to the running offset; for
    # train rows __train_tok == n_tok so the exclusive prefix equals
    # the old window's sum(train_tok) - n_tok exactly. Project down
    # to the slim packing columns FIRST — the prefix sum persists its
    # input, and this keeps the cached frame (and the packing
    # shuffle) free of document text.
    with_tok = split.select(id_col, source_col, "split", "n_tok").withColumn(
        "__train_tok",
        F.when(F.col("split") == "train", F.col("n_tok")).otherwise(
            F.lit(0)
        ),
    )
    off = distributed_running_offset(
        with_tok, id_col, "__train_tok", [source_col, "split"], "__off"
    )
    seq = F.when(
        F.col("split") == "train", F.floor(F.col("__off") / float(budget))
    )
    return off.select(
        id_col, source_col, "split", "n_tok", seq.alias("seq_id")
    )

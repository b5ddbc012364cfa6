"""Exact heavy hitters at corpus scale: two-pass Misra-Gries.

The problem: "every token/n-gram/domain whose frequency is >= theta of
the corpus" over 100 TB. A plain groupBy-count computes ALL group
counts — at trillion-token scale that is a trillion-key shuffle to
answer a question whose output is at most 1/theta rows. The classic
fix (Misra-Gries summaries, which are mergeable: Agarwal et al.,
"Mergeable Summaries", PODS 2012) bounds per-task state to
ceil(1/theta) counters and the shuffle to (num_partitions / theta)
candidate rows:

  pass 1  per-partition Misra-Gries summary (mapInPandas, bounded
          dict); by the averaging argument, any item with global
          frequency ratio >= theta has local ratio >= theta in at
          least one partition, so the union of partition summaries is
          a superset of the true heavy hitters. Each partition also
          emits one sentinel row carrying its item count, so the
          global N rides the same single pass.
  merge   tree-merge the per-partition summaries into ONE m-bounded
          summary (MG summaries are mergeable with total error
          <= N/(m+1) regardless of merge tree — Agarwal et al. Thm 1),
          so the candidate set is <= ceil(1/theta) rows INDEPENDENT of
          cluster size. Any item with count >= theta*N survives the
          merged summary because theta*N > N/(m+1) for m = ceil(1/theta).
  pass 2  exact recount of candidates only: broadcast the merged
          candidate set (<= ceil(1/theta) rows), semi-join,
          groupBy-count, keep count >= ceil(theta * N).

The result is EXACT (pass 2 recounts; pass 1 can only over-include),
so a SQL oracle can replay it as plain GROUP BY ... HAVING. Threshold
arithmetic stays in integers (ceil of an exact decimal product) — no
cross-engine float decision.

Reference parity: the reference has no frequency-mining operator; this
is added LLM-pipeline surface (vocabulary heads, boilerplate domains,
stop-token discovery all reduce to heavy hitters).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentinel `tok` value is NULL on the per-partition count rows
_SUMMARY_SCHEMA = "tok string, lb bigint"


def _mg_merge(counters: dict[str, int], batch: pd.Series, m: int) -> None:
    """Merge a batch's value_counts into a Misra-Gries summary of at
    most ``m`` counters, in place. Mergeable-summary step: add, then
    subtract the (m+1)-th largest count from everything and drop the
    non-positive remainder."""
    for tok, n in batch.items():
        counters[tok] = counters.get(tok, 0) + int(n)
    if len(counters) > m:
        cut = sorted(counters.values(), reverse=True)[m]
        for tok in [t for t, n in counters.items() if n - cut <= 0]:
            del counters[tok]
        for tok in counters:
            counters[tok] -= cut


def mg_summaries(items: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``col``: one pass, at
    most ``m`` (tok, lb) counter rows per partition plus one sentinel
    row (tok NULL, lb = partition item count) so the global N rides
    the same pass. Shared by the batch two-pass ``heavy_hitters`` and
    the streaming per-batch intake."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        part_n = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            part_n += len(vals)
            _mg_merge(counters, vals.value_counts(), m)
        yield pd.DataFrame(
            {
                "tok": list(counters) + [None],
                "lb": list(counters.values()) + [part_n],
            }
        )

    return items.select(F.col(col).alias(col)).mapInPandas(
        summarize, schema=_SUMMARY_SCHEMA
    )


def mg_merge_summaries(
    summary: DataFrame, m: int, fanin: int = 64
) -> DataFrame:
    """Tree-merge per-partition Misra-Gries summaries into ONE
    m-bounded summary (single partition, <= m counter rows + one
    sentinel row carrying the summed N).

    MG summaries are mergeable with total error <= N/(m+1) no matter
    the merge tree (Agarwal et al., "Mergeable Summaries", PODS 2012,
    Thm 1) — so an item with global count >= theta*N, where
    m = ceil(1/theta), always survives: its merged counter is
    >= count - N/(m+1) > 0. Levels of ``fanin``-way merges keep every
    merge task's input bounded by ~fanin*(m+1) rows; a 10k-partition
    corpus at theta=1e-6 merges in 3 levels instead of broadcasting
    up to 1e10 candidate ids (the pre-r6 plan bug)."""

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            nulls = pdf["tok"].isna()
            n += int(pdf.loc[nulls, "lb"].sum())
            sub = pdf.loc[~nulls]
            _mg_merge(
                counters,
                pd.Series(sub["lb"].to_numpy(), index=sub["tok"]),
                m,
            )
        yield pd.DataFrame(
            {
                "tok": list(counters) + [None],
                "lb": list(counters.values()) + [n],
            }
        )

    merged = summary
    while merged.rdd.getNumPartitions() > 1:
        nparts = max(1, merged.rdd.getNumPartitions() // fanin)
        # repartition (not coalesce): coalesce would propagate the
        # narrowing upstream and serialize the corpus-scan pass.
        merged = merged.repartition(nparts).mapInPandas(
            merge, schema=_SUMMARY_SCHEMA
        )
    return merged


def heavy_hitters(
    items: DataFrame, col: str, theta: float, min_count: int = 1
) -> DataFrame:
    """All values of ``col`` with count >= max(min_count,
    ceil(theta * N)) and their EXACT counts, as (tok, n_tok).

    theta in (0, 1]; per-task state is ceil(1/theta) counters, so
    theta=1e-6 costs ~1M dict entries per task — independent of data
    size. Per-partition summaries are tree-merged into ONE m-bounded
    summary before pass 2, so the broadcast candidate set is
    <= ceil(1/theta) rows regardless of cluster size (pre-merge it
    was partitions * ceil(1/theta) — a driver OOM at exactly the
    scale this operator exists for)."""
    if not 0 < theta <= 1:
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    m = math.ceil(1.0 / theta)
    # the merged summary is <= m+1 rows BY CONSTRUCTION — one collect
    # serves both N (the sentinel row) and the candidate set, instead
    # of a checkpoint + two more jobs over it
    rows = mg_merge_summaries(mg_summaries(items, col, m), m).collect()
    total = sum(r["lb"] for r in rows if r["tok"] is None)
    cands = sorted({r["tok"] for r in rows if r["tok"] is not None})
    threshold = max(min_count, math.ceil(theta * total))
    spark = items.sparkSession
    if not cands:
        # derive the empty frame from the INPUT schema so both return
        # paths agree for non-string item columns (the non-empty path
        # preserves the input type through the semi-join/groupBy)
        return items.select(col).limit(0).withColumn(
            "n_tok", F.lit(0).cast("bigint")
        )
    from ..session import local_frame

    candidates = local_frame(spark, [(t,) for t in cands], f"{col} string")
    return (
        items.join(F.broadcast(candidates), on=col, how="leftsemi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_tok"))
        .filter(F.col("n_tok") >= F.lit(threshold))
    )

"""Count-Min sketch frequency estimation, as a DataFrame op.

The sketch sibling of the Misra-Gries heavy hitters (heavy.py): where
MG answers "which items are frequent", a Count-Min sketch (Cormode &
Muthukrishnan 2005) answers "how frequent is THIS item" for any item,
from ``depth * width`` counters instead of the full frequency table.
At corpus scale the exact table is a trillion-key shuffle; the CMS is
a fixed-size aggregate:

  build   one pass: each occurrence increments ``depth`` buckets
          (row i, column hash_i(item) % width). As a DataFrame this
          is an explode to ``depth`` (row, bucket) pairs and ONE
          map-side-combinable groupBy — the shuffle is bounded by
          depth*width rows, never by the corpus.
  query   estimate(item) = min over rows of counter[i][hash_i(item)]
          — a broadcast join of the (small) query set against the
          (small) sketch table. Overestimates only: est >= true, and
          est <= true + eps*N with probability 1-delta for
          width = ceil(e/eps), depth = ceil(ln(1/delta)).

Hashes are the engine-portable md5 family (portable.phash with a
per-row salt), so a SQL oracle replays bucket ids, counters and every
estimate bit-for-bit (queries.q_cms_freq).

Reference parity: no counterpart in the reference; added LLM-pipeline
surface (fast frequency lookups over corpus token streams, e.g. for
n-gram novelty scoring or stop-list construction without a full count
table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .portable import phash


def _bucket(col: Column | str, row: int, width: int) -> Column:
    """Row-``row``'s bucket for an item: portable hash of the salted
    item, mod width. The salt makes the ``depth`` hash functions
    pairwise independent in the family sense the CMS needs."""
    c = F.col(col) if isinstance(col, str) else col
    # DuckDB replay: ('0x'||substring(md5('cms<row>:'||item),1,15))::BIGINT % width
    return F.pmod(phash(F.concat_ws(":", F.lit(f"cms{row}"), c)), F.lit(width))


def build_count_min(
    items: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """One-pass CMS build over an item stream (one row per
    OCCURRENCE): returns the counter table ``(row, bucket, cnt)`` of
    at most depth*width rows. The explode-to-depth stays map-side (a
    literal inline array); the single shuffle carries partial counts
    bounded by depth*width per task."""
    rows = F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            _bucket(col, r, width).alias("bucket"),
        )
        for r in range(depth)
    ])
    return (
        items.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, col: str,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Estimated count for every DISTINCT item in ``queries``: min
    over the ``depth`` counters the item hashes to. Duplicate query
    rows collapse to one output row per item (estimates are per-ITEM
    by definition — join back on the item to fan out per-row). A NULL
    item gets a NULL estimate: concat_ws skips NULLs, so without the
    guard it would hash the bare salt and return whatever count lives
    in that arbitrary bucket. The query set explodes to depth rows
    and joins the broadcast sketch (depth*width rows — model-sized);
    missing counters read as 0 (an item whose bucket was never
    touched has true count 0)."""
    rows = F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            _bucket(col, r, width).alias("bucket"),
        )
        for r in range(depth)
    ])
    exploded = queries.filter(F.col(col).isNotNull()).select(
        F.col(col), F.explode(rows).alias("rb")
    ).select(col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    est = (
        exploded.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
    null_row = (
        queries.filter(F.col(col).isNull()).select(col).limit(1)
        .withColumn("est", F.lit(None).cast("bigint"))
    )
    return est.unionByName(null_row)

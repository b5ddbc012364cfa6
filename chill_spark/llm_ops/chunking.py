"""Document chunking and training-sequence packing.

LLM-pipeline surface ops (north-star, beyond reference parity — the
reference has no text layer):

- ``chunk_documents``: split each document into fixed-size token
  windows with configurable stride (RAG-style overlapping chunks).
  Pure narrow Column ops — split / sequence / explode / slice — so it
  runs inside whole-stage codegen with no shuffle and no UDF; at
  100 TB it is a single map stage whose output partitioning follows
  the input.
- ``pack_sequences``: assign documents to fixed-token-budget training
  sequences (contiguous greedy packing over a deterministic order).
  Implemented as a running sum over a window; partition by a shard
  column so the cumulative sum is per-shard (a single global window
  would serialize onto one task at scale — real packing pipelines
  pack per shard/file anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tokenize_ws(col: Column | str) -> Column:
    """Whitespace tokens as an array<string> (regex split, matching
    DuckDB's ``string_split_regex(text, '\\s+')`` element-for-element)."""
    return F.split(F.col(col) if isinstance(col, str) else col, r"\s+")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """Explode each document into token-window chunks.

    Output: one row per (doc, chunk) with ``chunk_start`` (0-based
    token offset), ``chunk_text`` and ``chunk_len`` (tokens in this
    chunk; the final chunk may be short). ``stride < chunk_tokens``
    yields overlapping chunks (overlap = chunk_tokens - stride).
    """
    stride = stride or chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokenize_ws(text_col)
    d = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride)
    )
    return (
        d.select(id_col, "__toks", "__n", F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            "chunk_start",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_start") + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("chunk_start")
            ).alias("chunk_len"),
        )
    )


def chunk_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int | None = None,
) -> str:
    """DuckDB SQL mirroring ``chunk_documents`` exactly."""
    stride = stride or chunk_tokens
    return f"""
    SELECT {id_col}, chunk_start,
           array_to_string(t[chunk_start + 1 : chunk_start + {chunk_tokens}], ' ')
               AS chunk_text,
           least({chunk_tokens}, len(t) - chunk_start) AS chunk_len
    FROM (
        SELECT {id_col}, t,
               unnest(range(0, greatest(len(t), 1), {stride})) AS chunk_start
        FROM (SELECT {id_col},
                     string_split_regex({text_col}, '\\s+') AS t
              FROM {table})
    )
    """


def pack_sequences(
    df: DataFrame,
    order_col: str,
    count_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each row a ``seq_id``: contiguous documents (in
    ``order_col`` order, per shard) share a sequence until the token
    ``budget`` fills; a document whose start offset crosses the
    boundary opens the next sequence. Adds ``seq_id`` and
    ``seq_offset`` (token start within the shard's stream).

    With ``shard_col`` the window is partitioned (scales: one
    cumulative sum per shard, shards pack independently exactly like
    per-file packing in training pipelines). Without it the window is
    global — correct but single-task; only for small inputs.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    parts = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(count_col).over(w) - F.col(count_col)
    return df.withColumn("seq_offset", start).withColumn(
        "seq_id", F.floor(F.col("seq_offset") / budget)
    )


def pack_split_sequences(
    df: DataFrame,
    order_col: str,
    count_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """The SPLITTING packer: documents stream into ``budget``-token
    training sequences back to back, and a document crossing a
    sequence boundary is SPLIT across it — every sequence is exactly
    full (fill_ratio 1) except each shard's final tail. This is the
    standard LM pretraining packer; ``pack_sequences`` is the
    no-split variant whose boundary-crossing docs overflow instead
    (q_pack_efficiency measures the waste that choice costs).

    Output: one row per (doc, sequence) it occupies — ``seq_id``,
    ``seq_tokens`` (this doc's tokens inside that sequence) and
    ``doc_offset`` (the doc's global token start within its shard's
    stream). Zero-token rows are dropped (nothing to pack).

    Scale shape: one cumulative-sum window per shard (identical to
    ``pack_sequences``) plus a per-row ``sequence`` explode bounded by
    ceil(n_tok / budget) + 1 — no joins, no second shuffle; output
    partitioning follows the window's.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    parts = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(count_col)
    start = F.sum(count_col).over(w) - n
    d = (
        df.filter(n > 0)
        .withColumn("doc_offset", start)
        .withColumn("__end", F.col("doc_offset") + n)
    )
    first = F.floor(F.col("doc_offset") / budget)
    last = F.floor((F.col("__end") - 1) / budget)
    seq = F.col("seq_id")
    return (
        d.withColumn("seq_id", F.explode(F.sequence(first, last)))
        .withColumn(
            "seq_tokens",
            F.least(F.col("__end"), (seq + 1) * budget)
            - F.greatest(F.col("doc_offset"), seq * budget),
        )
        .drop("__end")
    )


def pack_split_oracle_sql(
    table: str,
    order_col: str,
    count_col: str,
    budget: int,
    shard_col: str | None = None,
    select_cols: str = "*",
) -> str:
    """DuckDB SQL mirroring ``pack_split_sequences``."""
    part = f"PARTITION BY {shard_col} " if shard_col else ""
    # the inner subquery already carries doc_offset and seq_id, so a
    # '*' caller must not re-select them (duplicate output columns)
    cols = "*" if select_cols == "*" else f"{select_cols}, doc_offset, seq_id"
    return f"""
    SELECT {cols},
           least(doc_offset + {count_col}, (seq_id + 1) * {budget})
             - greatest(doc_offset, seq_id * {budget}) AS seq_tokens
    FROM (
        SELECT *,
               unnest(range(CAST(floor(doc_offset / {budget}) AS BIGINT),
                            CAST(floor((doc_offset + {count_col} - 1)
                                       / {budget}) AS BIGINT) + 1)) AS seq_id
        FROM (
            SELECT *,
                   CAST(sum({count_col}) OVER ({part}ORDER BY {order_col}
                       ROWS UNBOUNDED PRECEDING) - {count_col} AS BIGINT)
                       AS doc_offset
            FROM {table}
            WHERE {count_col} > 0
        )
    )
    """


def pack_oracle_sql(
    table: str,
    order_col: str,
    count_col: str,
    budget: int,
    shard_col: str | None = None,
    select_cols: str = "*",
) -> str:
    """DuckDB SQL mirroring ``pack_sequences``."""
    part = f"PARTITION BY {shard_col} " if shard_col else ""
    return f"""
    SELECT {select_cols},
           CAST(sum({count_col}) OVER ({part}ORDER BY {order_col}
               ROWS UNBOUNDED PRECEDING) - {count_col} AS BIGINT) AS seq_offset,
           CAST(floor((sum({count_col}) OVER ({part}ORDER BY {order_col}
               ROWS UNBOUNDED PRECEDING) - {count_col}) / {budget}) AS BIGINT)
               AS seq_id
    FROM {table}
    """

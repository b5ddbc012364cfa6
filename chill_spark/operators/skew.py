"""Skew mitigation: salted joins + bucketed (shuffle-free) joins.

AQE's skew-join splitting (on by default, session.py) handles most
runtime skew; ``salted_join`` is the explicit tool for the pathological
case AQE can't fix — a single hot key whose *build* side also explodes
(e.g. a null/default key holding 30% of a 100 TB fact). Bucketed
writes co-locate both sides of a recurring join so repeated jobs skip
the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    sub-keys and the small side replicated ``salt``× (explode of a
    literal range — no driver loop, no crossJoin).

    The shuffle key becomes (key, salt): a key holding P% of the rows
    now lands on ``salt`` reducers instead of one. Replication
    multiplies the small side, so keep salt ~= executor parallelism /
    hot-key count, not huge.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, not {how!r} "
            "(right/full would emit one row per salt replica of unmatched "
            "small-side rows)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        SALT_COL, (F.rand(seed) * salt).cast("int")
    )
    small_rep = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_rep, keys + [SALT_COL], how)
    return out.drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist bucketed (and optionally sorted) by the join/agg key.

    Two tables bucketed on the same key with the same bucket count
    join with NO Exchange (and with sort_cols, no Sort either): at
    100 TB that's the difference between a full-fact shuffle per run
    and zero. Bucketing metadata lives in the session catalog;
    ``path`` makes the table external so the data outlives it.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    writer = (
        df.write.mode("overwrite")
        .format(fmt)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def skew_report(df, key_cols) -> "DataFrame":
    """One-row join-key skew diagnosis — the 'do I need to salt this
    join / is AQE skew-split enough?' report: row and key counts, the
    hottest key's share, exact p50/p99/max of per-key row counts, and
    the max/mean skew ratio. Two map-side-combinable aggregations (the
    second runs over the KEY-count-sized frame, never the corpus); no
    windows, no collects beyond the 1-row result."""
    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.sum("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__n").alias("max_key_rows"),
        F.round(F.max("__n") / F.sum("__n"), 6).alias("max_key_share"),
        F.round(F.percentile("__n", F.lit(0.5)), 6).alias("p50_key_rows"),
        F.round(F.percentile("__n", F.lit(0.99)), 6).alias("p99_key_rows"),
        F.round(
            F.max("__n") / (F.sum("__n") / F.count(F.lit(1))), 6
        ).alias("skew_ratio"),
    )

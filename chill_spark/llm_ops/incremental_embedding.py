"""Incremental embedding near-dedup against a persisted bucket store.

The embedding-modality twin of ``incremental_dedup``: at 100 TB you
never re-bucket the whole corpus when a new crawl lands. The
hyperplane LSH layer (multi-band sign-bit buckets + the vectors
themselves) is materialized once per document; deduplicating an
increment costs bucket(new) (one Arrow matmul, map-only), one
bucket-join touching only the store rows in buckets the batch hits
(``incremental_candidates`` — the same broadcast-semi-prune +
single-shuffle machinery as the text path), and a pair-sized cosine
verify.

Store layout (``write_embedding_store`` / ``read_embedding_store``):
  <root>/vectors/  (id, v array<double>)   — cosine verify side
  <root>/banded/   (id, band, bucket)      — candidate generation side
``_meta.json`` records (planes, bands, seed, dim): buckets from a
different plane family never collide, so a mismatched consumer would
silently find ZERO candidates — the same fail-fast contract as the
text sketch store.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    DEFAULT_MAX_BUCKET_SIZE,
    _banded_bucket_udf,
    cosine_pairs_arrow,
    hyperplane_vectors,
)
from .incremental_dedup import incremental_candidates


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimension as the MODE of row sizes — robust to a null or
    wrong-dim vector happening to be the first row returned (a bare
    first() would then either crash or silently null out every valid
    row's buckets)."""
    row = df.select(F.mode(F.size(F.col(vec_col))).alias("d")).first()
    return int(row["d"]) if row and row["d"] is not None else 0


def banded_embedding_buckets(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: int = 6,
    bands: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """(id, band, bucket) rows for every vector — the store's candidate
    side and the per-increment sketch. One Arrow matmul per batch."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    allv = hyperplane_vectors(dim, planes, bands, seed)
    bucket_f = _banded_bucket_udf(allv)
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucket_f(v)).alias("band", "bucket"),
    )


def write_embedding_store(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    root: str,
    planes: int = 6,
    bands: int = 8,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Materialize the embedding LSH layer for ``df``. With
    ``mode="append"`` the existing meta must match (appending sketches
    from a different plane family or dimension would silently never
    collide).

    Written under ``BATCH_PART=-1`` leaves, identical to what the
    streaming maintainer (run_embedding_dedup_stream) appends —
    partition discovery rejects mixed flat/nested trees, so a
    bootstrap store must match the stream's batch-keyed shape.

    The store root may live on any Hadoop-readable filesystem —
    cleanup and meta I/O route through storefs, same as the text
    sketch store."""
    from ..operators.writers import BATCH_COL
    from .storefs import StoreFS, write_store_json

    dim = _infer_dim(df, vec_col)
    if dim == 0:
        raise ValueError(
            "write_embedding_store: corpus has no usable vectors "
            "(empty or all-null embedding column) — writing dim=0 meta "
            "would brick every later consumer's dimension check"
        )
    if mode == "append":
        check_embedding_meta(root, planes, bands, seed, dim=dim)
    elif mode == "overwrite":
        # a rebuild must clear EVERYTHING, including stream-appended
        # BATCH_PART leaves — overwriting only the -1 leaf would leave
        # stale old-family sketches mixed under the restamped meta
        fs = StoreFS(root, df.sparkSession)
        for side in ("vectors", "banded"):
            fs.delete(f"{root}/{side}")
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    vecs.write.mode(mode).parquet(f"{root}/vectors/{BATCH_COL}=-1")
    banded_embedding_buckets(
        df, vec_col, id_col, planes, bands, seed, dim=dim
    ).write.mode(mode).parquet(f"{root}/banded/{BATCH_COL}=-1")
    write_store_json(
        root,
        {"planes": planes, "bands": bands, "seed": seed, "dim": dim},
        spark=df.sparkSession,
    )


def check_embedding_meta(
    root: str, planes: int, bands: int, seed: int, dim: int | None = None
) -> None:
    """Fail fast on plane-family OR dimension mismatch (silent zero
    recall otherwise: buckets from a different family/dim never
    collide, and cross-dim pairs fail the verify's length check).
    No-op when the store has no meta."""
    from .storefs import read_store_json

    meta = read_store_json(root)
    if meta is None:
        return
    from .storefs import note_store_participation

    note_store_participation(root, "vectors")
    mine = {"planes": planes, "bands": bands, "seed": seed}
    if dim is not None:
        mine["dim"] = dim
    theirs = {k: meta.get(k) for k in mine}
    if theirs != mine:
        raise ValueError(
            f"embedding store at {root} was built with {theirs}, but "
            f"this run uses {mine} — hyperplane buckets would never "
            "match (zero dedup recall); rebuild the store or align "
            "the parameters"
        )


def read_embedding_store(
    spark: SparkSession, root: str
) -> tuple[DataFrame, DataFrame]:
    """Read both store sides, dropping the BATCH_PART partition column
    the batch-keyed layout adds."""
    from ..operators.writers import BATCH_COL

    return (
        spark.read.parquet(f"{root}/vectors").drop(BATCH_COL),
        spark.read.parquet(f"{root}/banded").drop(BATCH_COL),
    )


def incremental_embedding_dups(
    new_df: DataFrame,
    old_vectors: DataFrame,
    old_banded: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
    planes: int = 6,
    bands: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    broadcast_touched: bool = True,
    banded_df: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Verified duplicate pairs (id_a < id_b, cosine) between the new
    batch and (itself ∪ the stored corpus) — the banded batch
    pipeline's verified pairs restricted to pairs touching a new doc,
    which is exactly what queries.q_embedding_incremental hash-checks.

    Candidate generation reuses ``incremental_candidates`` verbatim:
    new×new and new×old inside shared (band, bucket) keys, old×old
    never expanded, store side broadcast-semi-pruned to touched
    buckets before the single shuffle. The store's plane dimension
    must match the batch's (meta-checked by callers going through a
    store root). Pass ``dim`` when the caller already inferred it (the
    streaming path does) to skip the mode-of-sizes job."""
    if dim is None:
        dim = _infer_dim(new_df, vec_col)
    old_first = old_vectors.select(F.size(F.col("v")).alias("d")).filter(
        F.col("d").isNotNull()
    ).first()
    if old_first is not None and dim and int(old_first["d"]) != dim:
        raise ValueError(
            f"increment vectors are {dim}-dim but the store holds "
            f"{int(old_first['d'])}-dim vectors — buckets would never "
            "collide (silent zero dedup recall); re-embed or rebuild "
            "the store"
        )
    new_banded = banded_df
    if new_banded is None:
        new_banded = banded_embedding_buckets(
            new_df, vec_col, id_col, planes, bands, seed, dim=dim
        )
    cands = incremental_candidates(
        new_banded, old_banded, max_bucket_size=max_bucket_size,
        broadcast_touched=broadcast_touched,
    )
    new_vecs = new_df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # replayed ids exist on both sides; the NEW vector wins (re-sent id
    # may carry changed content) — same contract as the text path
    all_vecs = old_vectors.join(
        new_vecs.select("id"), "id", "left_anti"
    ).unionByName(new_vecs)
    a = all_vecs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = all_vecs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_pairs_arrow(F.col("v_a"), F.col("v_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_store_forget(
    spark: SparkSession,
    root: str,
    ids: list,
) -> dict:
    """Right-to-be-forgotten for the embedding dedup store: remove the
    given vector ids from both sides (vectors + banded) via the shared
    leaf-rewrite primitive — a forgotten embedding must stop surfacing
    as anyone's near-duplicate. Returns {side: report}."""
    from ..operators.writers import BATCH_COL
    from .storefs import forget_rows

    return {
        side: forget_rows(spark, f"{root}/{side}", "id", ids, [BATCH_COL])
        for side in ("vectors", "banded")
    }


def compact_embedding_store(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    atomic_rename: bool | None = None,
) -> dict[str, int]:
    """Collapse a stream-maintained embedding store (one BATCH_PART
    leaf per micro-batch under vectors/ and banded/) to one leaf per
    side — same swap/heal protocols (atomic-rename and marker-staged)
    and sealed-store discipline as the text compactor."""
    from .incremental_dedup import compact_sketch_store

    return compact_sketch_store(
        spark, root, target_file_bytes=target_file_bytes,
        sides=("vectors", "banded"), atomic_rename=atomic_rename,
    )


def embedding_store_stats(spark: SparkSession, root: str) -> dict:
    """Leaf-bloat accounting for the hyperplane-bucket embedding
    store — per-leaf row counts of the ``vectors/`` side from one
    zero-payload count scan (the ``banded/`` side mirrors it
    leaf-for-leaf). Same shape and semantics as
    ``incremental_dedup.sketch_store_stats``: bootstrap is leaf -1,
    every other leaf is compactable append bloat."""
    from ..operators.writers import BATCH_COL
    from .storefs import read_store_json

    if read_store_json(root) is None:
        raise ValueError(
            f"no embedding store at {root} (missing _meta.json) — "
            "build it with write_embedding_store / the emb-sketch CLI"
        )
    per = {
        int(r[BATCH_COL]): int(r["n"])
        for r in spark.read.parquet(f"{root}/vectors")
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


def embedding_store_compact_decision(
    spark: SparkSession,
    root: str,
    max_appended_fraction: float = 0.5,
    max_append_batches: int = 64,
) -> dict:
    """Actionable COMPACT verdict for the embedding store (bucket
    membership is exact under the frozen hyperplanes, so the action
    is compact-for-probe-cost). Leaf counts only — per-epoch safe;
    reasons name the exact threshold crossed."""
    stats = embedding_store_stats(spark, root)
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

"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k against a literal query
  vector — one narrow scan + TakeOrderedAndProject (no shuffle of the
  corpus; the global top-k is a per-partition heap + driver merge).
  The correctness baseline.
- ``ivf_topk``: IVF-style scale path — corpus pre-assigned to the
  nearest of C centroids (k-means on a sample, numpy on the driver);
  queries probe only the ``nprobe`` nearest centroid partitions, so a
  1000-executor scan touches ~nprobe/C of the data. Centroid
  assignment is itself a pure Column expression.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_sim


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k. Ties broken by id for determinism."""
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), _vec_lit(query))
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index
# ---------------------------------------------------------------------------

def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """K-means on a driver-side sample (numpy; deterministic seed).
    At 100 TB you train once on a 0.001% sample and persist the
    centroids with the table.

    The sample is a deterministic content-hash draw: every row is
    ranked by ``xxhash64(vector, seed)`` and the ``sample`` smallest
    win. That is a TakeOrdered (per-partition heap + driver merge of
    ``sample`` rows — no corpus shuffle), and, unlike a bare
    ``limit`` (which drains whichever partition answers first, i.e.
    one shard's distribution on a partitioned table), the draw is
    invariant to partitioning, task order, and retries. Hash ties are
    broken by the vector itself so the cut line is a total order."""
    v = F.col(vec_col).cast("array<double>")
    rows = (
        df.select(v.alias("__v"), F.xxhash64(v, F.lit(seed)).alias("__k"))
        .orderBy("__k", "__v")
        .limit(sample)
        .collect()
    )
    x = np.array([r["__v"] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = x[assign == c]
            if len(m):
                cents[c] = m.mean(0)
    return cents


def nearest_centroid(vec_col: Column, centroids: np.ndarray) -> Column:
    """Nearest centroid as a (d, cid) struct Column — one vectorized
    Arrow pass (vecassign.nearest_struct_col): distances are the
    bit-exact sequential fold of the original zip_with/aggregate
    expression, ties break to the smaller cid, NULL/wrong-dim vectors
    yield (NULL, 0) exactly as the struct-array_min form did. The
    interpreted higher-order-function form this replaces paid ~k*dim
    interpreted lambda steps per row (CodegenFallback — optimization
    guide §4.2); the kernel runs the same arithmetic in NumPy."""
    from .vecassign import nearest_struct_col

    return nearest_struct_col(vec_col, centroids)


def assign_centroid(vec_col: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id as a Column expression."""
    return nearest_centroid(vec_col, centroids)["cid"]


def with_nearest_centroid(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    out_col: str = "__near",
) -> DataFrame:
    """``nearest_centroid`` as a frame transform. Historically this
    was the broadcast-DATA (1-row cross join) variant that kept the
    codegen cache warm across Lloyd iterations; both forms are now the
    same vectorized Arrow kernel (the model ships once per task inside
    the serialized function — equally value-free, and the per-row
    interpreted fold is gone entirely). Kept as the frame-level entry
    point every trainer/consumer shares."""
    return df.withColumn(out_col, nearest_centroid(F.col(vec_col), centroids))


def hash_seed_centroids(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Engine-portable deterministic k-means seeding: the k rows with
    the smallest ``md5(CAST(id AS STRING))`` win (ties by id). md5 is
    universal across engines, so — unlike farthest-point or
    xxhash64-sampled init — a SQL oracle can re-derive the exact seeds
    and replay the Lloyd iterations bit-for-bit (queries.
    q_kmeans_clusters). Same TakeOrdered shape as train_centroids:
    per-partition heap of k rows, no corpus shuffle."""
    rows = (
        df.select(
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col).alias("__i"),
        )
        .orderBy("__h", "__i")
        .limit(k)
        .collect()
    )
    return np.array([r["__v"] for r in rows], dtype=np.float64)


def build_ivf(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    **train_kw,
) -> tuple[DataFrame, np.ndarray]:
    """Attach a ``__ivf_cell`` column (persist the result partitioned by
    it to get partition-pruned probes)."""
    cents = train_centroids(df, vec_col, n_centroids, **train_kw)
    return df.withColumn("__ivf_cell", assign_centroid(F.col(vec_col), cents)), cents


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the nprobe nearest cells, exact cosine within them."""
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(1))[:nprobe]
    cells = [int(c) for c in order]
    return brute_force_topk(
        indexed.filter(F.col("__ivf_cell").isin(cells)), query, k, vec_col, id_col
    )


def topk_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Batch k-NN: top-k corpus neighbors per query row.

    Broadcast the (small) query set; per-query ranking via window.
    For huge query sets use IVF cells on both sides instead.
    """
    from pyspark.sql.window import Window

    joined = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(
            cosine_sim(
                F.col(vec_col).cast("array<double>"),
                F.col(q_vec_col).cast("array<double>"),
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 5,
    init_centroids: np.ndarray | None = None,
    round_means: int | None = None,
) -> np.ndarray:
    """Distributed Lloyd's iterations: assignment runs on executors as
    a Column expression (``assign_centroid``), and each round reduces
    only per-(cluster, dimension) partial sums — k*dim rows — to the
    driver via posexplode + hash aggregate (map-side combine keeps the
    shuffle tiny regardless of corpus size). Init: a content-hash
    sample (TakeOrdered — invariant to partitioning, unlike a bare
    ``limit``) refined by greedy farthest-point selection on the
    driver, so the k seeds spread across the data instead of landing
    in one dense region (plain smallest-hash-k init merges planted
    clusters). This is the 100 TB-correct
    shape: the data never leaves executors, the model (k x dim floats)
    is the only driver state — unlike ``train_centroids`` it needs no
    representative driver-side sample.

    ``init_centroids`` overrides the farthest-point init with explicit
    seeds (e.g. ``hash_seed_centroids`` for an engine-portable,
    SQL-replayable run). ``round_means`` rounds each update's means to
    that many decimals — for cross-engine replay: unrounded means
    differ across engines by summation order (~1e-14) and feed the
    NEXT iteration's argmin, where a near-boundary point could flip
    clusters and cascade into integer count mismatches; rounding at
    each iteration boundary pins the argmin inputs identical on both
    sides (9 decimals is ~1e5 x the drift, far below any real
    centroid separation)."""
    if init_centroids is not None:
        cents = np.asarray(init_centroids, dtype=np.float64).copy()
        return _lloyd_iterate(df, vec_col, cents, iters, round_means)
    v0 = F.col(vec_col).cast("array<double>")
    sample_n = max(64, 8 * k)
    samp = np.array(
        [
            r["__v"]
            for r in df.select(
                v0.alias("__v"), F.xxhash64(v0, F.lit(17)).alias("__k")
            )
            .orderBy("__k", "__v")
            .limit(sample_n)
            .collect()
        ],
        dtype=np.float64,
    )
    if len(samp) == 0:
        return np.zeros((0, 0))
    # greedy farthest-point (k-center) seeding over the sample; stop
    # early when every remaining point coincides with a chosen seed
    # (fewer distinct vectors than k) — duplicate centroids would be
    # dead slots assign_centroid can never fill
    chosen = [0]
    d2 = ((samp - samp[0]) ** 2).sum(1)
    while len(chosen) < min(k, len(samp)) and d2.max() > 0:
        nxt = int(d2.argmax())
        chosen.append(nxt)
        d2 = np.minimum(d2, ((samp - samp[nxt]) ** 2).sum(1))
    cents = samp[chosen].copy()
    return _lloyd_iterate(df, vec_col, cents, iters, round_means)


def _lloyd_iterate(
    df: DataFrame,
    vec_col: str,
    cents: np.ndarray,
    iters: int,
    round_means: int | None = None,
) -> np.ndarray:
    """The distributed Lloyd loop shared by both init modes: one
    Arrow map stage per iteration assigns every row (bit-exact
    sequential-fold argmin) AND reduces per-(cluster, dim) partial
    sums inside the stage (vecassign.lloyd_partial_sums), so only
    tasks * k * dim partial rows reach the driver — no posexplode of
    the corpus, no shuffle, no interpreted per-element fold. Empty
    clusters keep their previous centroid."""
    from .vecassign import lloyd_partial_sums

    if cents.size == 0:
        return cents
    for _ in range(iters):
        stats = lloyd_partial_sums(
            df, vec_col, [cents], [(1, cents.shape[1])]
        )
        sums = np.zeros_like(cents)
        ns = np.zeros(len(cents))
        for _j, cid, vec, n in stats:
            sums[cid] = vec
            ns[cid] = n
        nonzero = ns > 0
        cents[nonzero] = sums[nonzero] / ns[nonzero, None]
        if round_means is not None:
            # round ONLY the updated rows: the SQL oracle's
            # coalesce(round(avg), prev) keeps an empty cluster's
            # previous centroid untouched, so rounding it here would
            # reintroduce cross-engine argmin drift (at 5e-10, worse
            # than the 1e-14 the rounding exists to absorb)
            cents[nonzero] = np.round(cents[nonzero], round_means)
    return cents


# ---------------------------------------------------------------------------
# Int8 quantization (compressed-vector search)
# ---------------------------------------------------------------------------

def quantize_int8(vec_col: Column) -> Column:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    code_i = floor(x_i/scale + 0.5). Explicit half-up floor instead of
    round() so Spark and any SQL oracle agree bit-for-bit. Returns an
    array<long> of codes in [-127, 127]; pure Column expr, no UDF.

    At 100 TB this is the storage/scan win: 4x smaller vector column
    (int8 vs float32), and candidate scoring over exact integer dot
    products. Rerank survivors with the float column if needed."""
    v = vec_col.cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.greatest(amax, F.lit(1e-12)) / F.lit(127.0)
    return F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)))


def quantized_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine top-k over int8-quantized codes. Scales cancel in the
    cosine, so ranking needs only the integer code vectors; dot products
    are exact (|dim * 127^2| << 2^53). Same TakeOrdered shape as
    brute_force_topk — no corpus shuffle."""
    from .dedup import cosine_sim

    q = np.asarray(query, dtype=np.float64)
    s = max(float(np.abs(q).max()), 1e-12) / 127.0
    qq = np.floor(q / s + 0.5)
    qb = F.array(*[F.lit(float(x)) for x in qq])
    qa = quantize_int8(F.col(vec_col)).cast("array<double>")
    sim = cosine_sim(qa, qb)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col(id_col))
        .limit(k)
    )

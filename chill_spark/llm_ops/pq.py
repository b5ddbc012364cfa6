"""Product-quantization ANN (Jégou et al. 2011, "Product Quantization
for Nearest Neighbor Search").

The third leg of the ANN ladder next to brute-force and IVF
(similarity.py): compress each d-dim vector into ``m`` small codes by
running an independent k-means per d/m-dim SUBSPACE, then answer
queries with asymmetric distance computation (ADC) — per-subspace
lookup tables of ||q_j - c||² against the query, so scoring a vector
is ``m`` array lookups + adds instead of a d-dim fold. At 100 TB the
wins compound:

  storage   d floats -> m single-byte codes (64x at d=64, m=4, k<=256)
  scan      the encoded table is the only corpus-wide input; the
            codebooks (m * k * d/m floats) and the per-query LUTs
            (m * k floats) broadcast as literals
  training  m independent Lloyd runs over sliced columns — each the
            same executor-side assignment + k*dim partial-mean reduce
            as kmeans_fit; the corpus never leaves executors

Composability: PQ is the in-cell scorer of a classic IVF-PQ index —
partition by IVF cell (build_ivf), store PQ codes per cell, probe
cells by centroid distance and ADC-score only those rows. The
coarse->exact re-rank funnel (queries.q_ann_rerank) applies on top:
ADC top-(5n) re-ranked by exact distance.

Portability: with hash_seed_centroids + round_means=9 the per-
subspace codebooks are engine-exact, so a SQL oracle replays
training, encoding, the LUTs, and the fused ADC ranking bit-for-bit
(queries.q_ann_pq_topk).

Reference parity: no counterpart in the reference; added LLM-pipeline
surface (embedding-store compression + fast similarity).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _subvec(vec_col: str, j: int, sub: int) -> Column:
    """1-based slice of subspace ``j`` (length ``sub``)."""
    return F.slice(F.col(vec_col).cast("array<double>"), j * sub + 1, sub)


def _books_df(spark, books: list[np.ndarray]):
    """The m codebooks as ONE broadcastable row of m struct-array
    columns (__cmat0..__cmat{m-1}) — codebooks ride as DATA, so plans
    stay value-free (analysis/codegen cost independent of k*dim, and
    identical plans hit the codegen cache across Lloyd iterations)."""
    row = [tuple(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(bk)]
        for bk in books
    )]
    schema = ", ".join(
        f"__cmat{j} array<struct<cid:int,c:array<double>>>"
        for j in range(len(books))
    )
    return spark.createDataFrame(row, schema)


def _near(cmat: Column, sv: Column) -> Column:
    """Nearest codebook entry of ``sv`` in ``cmat`` (squared distance,
    ties to the smaller cid) — the data-driven argmin shared by
    training and encoding. (A factory function, not a 2-arg lambda:
    F.transform would read a second lambda arg as the element index.)"""
    return F.array_min(
        F.transform(
            cmat,
            lambda e: F.struct(
                F.aggregate(
                    F.zip_with(sv, e["c"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                e["cid"].alias("cid"),
            ),
        )
    )["cid"]


def pq_train(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[np.ndarray]:
    """Train ``m`` per-subspace codebooks (each k x dim/m), seeded by
    the md5-smallest-id rows (the hash_seed_centroids rule, shared
    across subspaces) so an external oracle can re-derive every
    codebook. ``dim`` must be divisible by m.

    All m Lloyd runs advance JOINTLY — one Spark job per iteration
    covers every subspace (assignment + per-(subspace, cluster, dim)
    partial means in a single aggregate), instead of m independent
    kmeans_fit loops paying m separate plan/codegen/job costs per
    iteration. Numerically identical to the independent runs: each
    subspace's argmin and mean updates never mix with another's."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    # seeds: ONE TakeOrdered collect of the k md5-smallest rows; the
    # per-subspace seed slices come from the same rows by definition
    seed_rows = (
        emb.select(
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col).alias("__i"),
        )
        .orderBy("__h", "__i")
        .limit(k)
        .collect()
    )
    if not seed_rows:
        raise ValueError(
            "pq_train: corpus has no usable vectors (empty, all-null, "
            "or wrong-dimension embedding column) — an empty codebook "
            "store would brick every later consumer"
        )
    books = [
        np.array(
            [r["__v"][j * sub:(j + 1) * sub] for r in seed_rows],
            dtype=np.float64,
        )
        for j in range(m)
    ]
    return _pq_lloyd_joint(emb, vec_col, books, iters, round_means=9)


def _pq_lloyd_joint(
    emb: DataFrame,
    vec_col: str,
    books: list[np.ndarray],
    iters: int,
    round_means: int | None = None,
    slices: list[tuple[int, int]] | None = None,
) -> list[np.ndarray]:
    """Advance all codebooks ``iters`` Lloyd steps with ONE job per
    iteration. The codebooks ride as broadcast DATA (a 1-row cross
    join of struct-array columns, the with_nearest_centroid trick),
    so the compiled plan is value-free and reused across iterations;
    the shuffle per iteration is sum(k_j * len_j) partial-mean rows.

    ``slices`` gives each codebook its vector slice as (1-based lo,
    length) — defaults to the contiguous equal subspaces of PQ.
    Heterogeneous entries are allowed (different k per book, different
    slice lengths), which lets an IVF-PQ index train its full-vector
    coarse quantizer in the same per-iteration job as the subspace
    codebooks: each book's argmin and mean updates never mix with
    another's, so the joint run equals the independent runs.

    The per-iteration job is one Arrow map stage
    (vecassign.lloyd_partial_sums): every book's bit-exact
    sequential-fold argmin plus the per-(book, cid) vector sums reduce
    INSIDE the stage, so only tasks * sum(k_j * len_j) partial rows
    reach the driver — no explode of the corpus into subspaces, no
    shuffle, no interpreted per-element fold (guide §4.2)."""
    from .vecassign import lloyd_partial_sums

    m, sub = len(books), books[0].shape[1]
    if slices is None:
        slices = [(j * sub + 1, sub) for j in range(m)]

    for _ in range(iters):
        stats = lloyd_partial_sums(emb, vec_col, books, slices)
        sums = [np.zeros_like(bk) for bk in books]
        ns = [np.zeros(len(bk)) for bk in books]
        for j, cid, vec, n in stats:
            sums[j][cid] = vec
            ns[j][cid] = n
        for j in range(m):
            nz = ns[j] > 0
            books[j][nz] = sums[j][nz] / ns[j][nz, None]
            if round_means is not None:
                # round ONLY updated rows (empty clusters keep their
                # previous centroid bit-exact — same rule as
                # _lloyd_iterate / the SQL oracle's coalesce)
                books[j][nz] = np.round(books[j][nz], round_means)
    return books


def ivfpq_train(
    emb: DataFrame,
    dim: int,
    cells: int = 8,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Train the IVF coarse quantizer AND the m PQ codebooks together:
    the coarse book is just one more (full-vector) entry in the joint
    Lloyd run, so the whole index trains in 1 seed collect +
    ``iters`` jobs instead of two independent training loops.
    Returns (cell_centroids, pq_books). Seeding: the md5-smallest-id
    rows — the coarse book takes the first ``cells`` of the same
    ordering the PQ books take their first ``k`` from, identical to
    seeding each run separately."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    seed_rows = (
        emb.select(
            F.col(vec_col).cast("array<double>").alias("__v"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col).alias("__i"),
        )
        .orderBy("__h", "__i")
        .limit(max(k, cells))
        .collect()
    )
    if not seed_rows:
        raise ValueError(
            "ivfpq_train: corpus has no usable vectors (empty, "
            "all-null, or wrong-dimension embedding column) — an "
            "empty codebook store would brick every later consumer"
        )
    books = [
        np.array([r["__v"][j * sub:(j + 1) * sub] for r in seed_rows[:k]],
                 dtype=np.float64)
        for j in range(m)
    ]
    coarse = np.array([r["__v"] for r in seed_rows[:cells]], dtype=np.float64)
    slices = [(j * sub + 1, sub) for j in range(m)] + [(1, dim)]
    trained = _pq_lloyd_joint(
        emb, vec_col, books + [coarse], iters, round_means=9, slices=slices
    )
    return trained[-1], trained[:-1]


def pq_encode(
    emb: DataFrame,
    books: list[np.ndarray],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, c0..c{m-1}) codes: nearest codebook entry per subspace —
    one executor-side Arrow pass, no shuffle
    (vecassign.pq_codes_col): every subspace argmin is the bit-exact
    sequential fold of the struct-array_min expression it replaces,
    with the codebooks shipping once per task inside the serialized
    kernel instead of re-evaluating k*sub interpreted lambda steps
    per (row, book)."""
    from .vecassign import pq_codes_col

    sub = books[0].shape[1]
    m = len(books)
    codes = pq_codes_col(
        vec_col,
        books,
        [(j * sub + 1, sub) for j in range(m)],
        [f"c{j}" for j in range(m)],
    )
    tmp = "__pq_codes"
    return emb.withColumn(tmp, codes).select(
        id_col, *[F.col(f"{tmp}.c{j}").alias(f"c{j}") for j in range(m)]
    )


def pq_adc_topk(
    encoded: DataFrame,
    books: list[np.ndarray],
    query_vec: np.ndarray,
    n: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``n`` by asymmetric PQ distance: per-subspace LUTs of
    ||q_j - c||² (rounded to 9 for engine-exact ranking) are inlined
    as m tiny literal arrays; scoring is m element_at lookups + adds
    per row, ranked by a TakeOrdered heap (approx_d2 asc, ties by
    id). Returns (id, approx_d2)."""
    sub = books[0].shape[1]
    luts = [
        [round(float(((query_vec[j * sub:(j + 1) * sub] - c) ** 2).sum()), 9)
         for c in bk]
        for j, bk in enumerate(books)
    ]
    score = None
    for j, lut in enumerate(luts):
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut]), F.col(f"c{j}") + 1
        )
        score = term if score is None else score + term
    return (
        encoded.select(id_col, F.round(score, 9).alias("approx_d2"))
        .orderBy("approx_d2", id_col)
        .limit(n)
    )

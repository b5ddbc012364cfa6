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

from .similarity import assign_centroid, hash_seed_centroids, kmeans_fit


def _subvec(vec_col: str, j: int, sub: int) -> Column:
    """1-based slice of subspace ``j`` (length ``sub``)."""
    return F.slice(F.col(vec_col).cast("array<double>"), j * sub + 1, sub)


def pq_train(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[np.ndarray]:
    """Train ``m`` per-subspace codebooks (each k x dim/m): an
    independent portable Lloyd run per subspace, seeded by the same
    md5-smallest-id rows (hash_seed_centroids) so an external oracle
    can re-derive every codebook. ``dim`` must be divisible by m."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = []
    for j in range(m):
        subdf = emb.select(id_col, _subvec(vec_col, j, sub).alias("__sv"))
        seeds = hash_seed_centroids(subdf, k, "__sv", id_col)
        books.append(
            kmeans_fit(
                subdf, "__sv", k=k, iters=iters,
                init_centroids=seeds, round_means=9,
            )
        )
    return books


def pq_encode(
    emb: DataFrame,
    books: list[np.ndarray],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, c0..c{m-1}) codes: nearest codebook entry per subspace,
    as pure Column argmins — one executor-side pass, no shuffle."""
    sub = books[0].shape[1]
    return emb.select(
        id_col,
        *[
            assign_centroid(_subvec(vec_col, j, sub), bk).alias(f"c{j}")
            for j, bk in enumerate(books)
        ],
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

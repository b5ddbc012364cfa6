"""SemDeDup — semantic (embedding-space) corpus deduplication.

Implements the SemDeDup recipe (Abbas et al., 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"):

1. k-means-cluster the embedding space (the CLUSTER IS THE BLOCKING
   KEY — pairwise cosine is only ever computed WITHIN a cluster, so
   pair expansion is bounded by the largest cluster, never the
   corpus);
2. within each cluster, connect pairs with cosine >= tau;
3. collapse connected duplicate groups and keep ONE survivor per
   group — the member LEAST similar to its cluster centroid (the
   paper's best-performing keep policy: low-centroid-similarity
   examples carry the most marginal information), ties by id.

Scale shape (100 TB): clustering reuses the distributed Lloyd trainer
(`similarity.kmeans_fit` — executor-side assignment, k*dim partial
sums to the driver). The within-cluster pair join is an equi-join on
the cluster id; at corpus scale you raise k so expected cluster size
stays bounded (the paper runs k=50,000 on LAION) and the quadratic
term is per-cluster, embarrassingly parallel across clusters. Duplicate
closure is the shared min-label-propagation CC operator. Nothing here
is all-pairs over the corpus.

Engine-portable mode mirrors `queries.q_kmeans_clusters`: md5-hash
seeding + per-iteration mean rounding make every discrete decision
(seeds, argmin assignment, edge threshold, survivor rank) replayable
by an external SQL oracle.

Reference parity: the reference engine has no embedding layer; this
extends the added LLM-pipeline surface (north-star dedup family).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .components import connected_components
from .similarity import hash_seed_centroids, kmeans_fit, nearest_centroid
from .vecassign import cosine_to_assigned_col


#: historical threshold: above this k, the old inline literal-array
#: centroid-cosine was swapped for a broadcast (cluster, centroid)
#: join. Both plans are now the same vectorized Arrow kernel (the
#: model rides inside the serialized function at every k); the
#: constant is kept because q_semantic_dedup_largek pins that its
#: k=72 run exercises the above-threshold regime.
CENTROID_INLINE_MAX_K = 64


def with_centroid_sim(
    assigned: DataFrame,
    centroids: np.ndarray,
    inline_max_k: int = CENTROID_INLINE_MAX_K,
) -> DataFrame:
    """Add ``centroid_sim`` (cosine to the assigned centroid, rounded
    to 9 for engine-exact survivor ranking) to ``(id, v, cluster)``
    rows — one vectorized Arrow pass
    (vecassign.cosine_to_assigned_col) for EVERY model size: the
    centroid matrix ships once per task inside the serialized kernel,
    and each row computes exactly one cosine with the bit-identical
    dimension-order fold of ``dedup.cosine_sim``. This replaces two
    interpreted plans (an inline k-cosine array below
    ``inline_max_k`` — k*dim interpreted lambda steps per row for ONE
    useful cosine — and a broadcast (cluster, centroid) join above
    it); ``inline_max_k`` is kept for signature compatibility but no
    longer selects a plan."""
    return assigned.withColumn(
        "centroid_sim",
        F.round(
            cosine_to_assigned_col(F.col("v"), F.col("cluster"), centroids),
            9,
        ),
    )


def cluster_pair_edges(assigned: DataFrame, tau: float) -> DataFrame:
    """Within-cluster cosine edges ``(id_a < id_b)`` at threshold
    ``tau`` over ``(id, v, cluster)`` rows.

    One Arrow matmul per cluster (applyInPandas keyed on the cluster
    id) — the paper's per-cluster structure. A Catalyst aggregate-fold
    cosine on the expanded pair join is ~50x slower (same finding as
    the LSH band bucketer, dedup.py) because every pair re-folds
    2 x dim elements; the matmul is O(n^2 d) BLAS over the cluster
    once. Memory bound: one cluster's n x n similarity matrix per
    task — k must keep clusters bounded (it must anyway: the method's
    pair count is quadratic per cluster).

    The Arrow output schema is derived from the id column's actual
    type, so non-integral ids (string/uuid --id-col) work instead of
    failing with a schema mismatch inside the Arrow stage."""
    import pandas as pd

    id_type = assigned.schema["id"].dataType.simpleString()

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        ids = pdf["id"].to_numpy()
        if len(ids) < 2:
            empty = pd.Series([], dtype=pdf["id"].dtype)
            return pd.DataFrame({"id_a": empty, "id_b": empty})
        n = np.linalg.norm(X, axis=1)
        n[n == 0] = 1.0
        sims = (X / n[:, None]) @ (X / n[:, None]).T
        iu = np.triu_indices(len(ids), 1)
        hit = sims[iu] >= tau
        a, b = ids[iu[0][hit]], ids[iu[1][hit]]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    return assigned.select("cluster", "id", "v").groupBy(
        "cluster"
    ).applyInPandas(_pairs, f"id_a {id_type}, id_b {id_type}")


def plan_semdedup_k(n_rows: int, target_cluster_size: int = 5000) -> int:
    """The k that keeps EXPECTED cluster size at
    ``target_cluster_size`` — the knob that bounds both the quadratic
    per-cluster pair count (~target²/2) and the per-task similarity
    matrix (~target² doubles). The paper's LAION run (k=50,000 over
    ~5B embeddings) corresponds to target≈100k; for the per-cluster
    matmul to stay comfortably in executor memory, targets of 2k-10k
    are the practical band (a 5k cluster's matrix is 200 MB)."""
    if n_rows <= 0:
        return 1
    return max(1, -(-n_rows // max(1, target_cluster_size)))


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Return one row per input vector:

    ``(id, cluster, centroid_sim, component, kept)``

    where ``component`` is the duplicate-group label (its minimum
    member id; a vector with no within-cluster neighbor >= tau is its
    own singleton group) and ``kept`` marks the group survivor —
    minimum ``centroid_sim`` in the group, ties by id.

    ``centroids`` overrides training with an existing model (at scale
    you train once and reuse across increments); otherwise the
    engine-portable md5-seeded Lloyd run (round_means=9) is trained
    here so a SQL oracle can replay it.
    """
    # null / wrong-dim vectors can't be clustered or compared — route
    # them around the pipeline as singleton survivors (null cluster /
    # centroid_sim) instead of crashing the per-cluster matmul: the
    # graceful degradation the banded-LSH bucketer uses. The dimension
    # is the mode of row sizes (robust to a bad first row).
    from .dedup import _mode_dim

    if dim is None:
        # the mode of row widths costs one scan+agg; callers that know
        # the embedding width (fixed-dim stores) pass it and skip it
        dim = _mode_dim(emb, vec_col)
    vc = F.col(vec_col)
    valid = emb.filter(vc.isNotNull() & (F.size(vc) == dim))
    bad = emb.filter(vc.isNull() | (F.size(vc) != dim)).select(
        F.col(id_col).alias("id"),
        F.lit(None).cast("int").alias("cluster"),
        F.lit(None).cast("double").alias("centroid_sim"),
        F.col(id_col).alias("component"),
        F.lit(True).alias("kept"),
    )
    if centroids is None:
        seeds = hash_seed_centroids(valid, k=k, vec_col=vec_col, id_col=id_col)
        centroids = kmeans_fit(
            valid, vec_col, k=k, iters=iters, init_centroids=seeds,
            round_means=9,
        )
    v = F.col(vec_col).cast("array<double>")
    # rounded to 9 so the survivor rank is an engine-exact comparison
    # (same policy as the Lloyd means): double drift is ~1e-15, real
    # centroid-similarity gaps are >> 1e-9. Assignment and centroid
    # similarity are both single vectorized Arrow passes with the
    # model riding inside the serialized kernel — one plan for every
    # k, value-free, no expression-tree growth at tens-of-thousands-k
    # (the old inline-literal / broadcast-DATA split this replaces
    # existed to manage exactly that growth).
    near = nearest_centroid(v, centroids)
    base = valid.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        near["cid"].alias("cluster"),
    )
    assigned = with_centroid_sim(base, centroids)
    assigned = assigned.localCheckpoint(eager=True)  # reused 3x below
    edges = cluster_pair_edges(assigned, tau)
    comps = connected_components(edges, "id_a", "id_b")

    labeled = assigned.join(
        comps.withColumnRenamed("node", "id"), "id", "left"
    ).withColumn("component", F.coalesce("component", F.col("id")))
    # survivor per duplicate group: least-centroid-similar member
    # (groupBy + min(struct) — partial-aggregating, no window, same
    # hot-key-safe shape as segment_dedup's first-occurrence pick)
    survivors = labeled.groupBy("component").agg(
        F.min(F.struct("centroid_sim", "id")).alias("s")
    ).select("component", F.col("s.id").alias("keep_id"))
    return (
        labeled.join(survivors, "component")
        .select(
            "id",
            F.col("cluster").cast("int").alias("cluster"),
            "centroid_sim",
            "component",
            (F.col("id") == F.col("keep_id")).alias("kept"),
        )
        .unionByName(bad)
    )

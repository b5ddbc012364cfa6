"""Arrow-vectorized nearest-centroid / PQ-code / centroid-cosine
kernels — bit-identical, batch-at-a-time replacements for the
interpreted Catalyst folds they supersede.

Why (optimization guide §4.2): the original assignment expressions
(``zip_with`` + ``aggregate`` + ``transform`` + ``array_min``) are
higher-order functions, which Catalyst evaluates as CodegenFallback —
every (row, centroid, dimension) step is an interpreted lambda
invocation over boxed Doubles. At k=16..72 centroids and dim=64 that
is ~10M interpreted steps per pass over even a small corpus, and the
cost scales linearly at 100 TB. The kernels below hand whole Arrow
batches to NumPy and run the SAME arithmetic:

- squared distance is accumulated with an explicit per-dimension loop
  (``acc = acc + dif * dif`` in dimension order), so every
  (row, centroid) distance is the identical left-to-right IEEE fold
  the Catalyst ``aggregate`` computes — bit-for-bit;
- argmin ties break to the smaller cid (NumPy's first-minimum rule ==
  ``array_min`` over (d, cid) structs);
- cosine similarity folds dot and both norms in the same dimension
  order as ``dedup.cosine_sim``;
- a NULL / wrong-dimension vector yields (d=NULL, cid=0), the
  measured behavior of the struct-array_min expression (NULL
  distances sort first, ties to cid 0).

Rounding (F.round) stays OUTSIDE these kernels, in the surrounding
Spark expressions, so every rounded output is produced by the exact
same function as before. The only quantity whose floating-point
grouping changes is the Lloyd per-cluster partial SUM (batch-level
NumPy reduction instead of Spark's row-order partial aggregate) —
the same accepted nondeterminism class as Spark's own partition-order
merges, absorbed by the trainers' round_means=9 contract exactly as
the cross-engine (DuckDB) replays already are.

Scale shape: models (centroid matrices / codebooks) ship once per
task inside the serialized function; per-batch work is one BLAS-free
NumPy broadcast per dimension; only the columns the kernel needs
cross the JVM->Python boundary (callers select/cast explicitly).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def seq_sq_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared distances with the exact left-to-right fold of
    the Catalyst expression: acc := acc + (x_t - c_t)^2, t ascending.
    Each step is one IEEE double subtract / multiply / add per
    (row, centroid) — identical operation sequence, identical bits."""
    n = X.shape[0]
    acc = np.zeros((n, C.shape[0]), dtype=np.float64)
    for t in range(C.shape[1]):
        dif = X[:, t, np.newaxis] - C[np.newaxis, :, t]
        acc += dif * dif
    return acc


def _rows_matrix(
    vs: pd.Series, dim: int
) -> tuple[np.ndarray, np.ndarray]:
    """Stack a Series of Arrow list values into an (n_valid, dim)
    float64 matrix plus the boolean valid mask (non-null, exact
    dimension — the rows the Catalyst fold produces a non-NULL
    distance for)."""
    valid = np.fromiter(
        (v is not None and len(v) == dim for v in vs),
        dtype=bool,
        count=len(vs),
    )
    if valid.all():
        X = np.array(vs.tolist(), dtype=np.float64)
    elif valid.any():
        X = np.array(
            [v for v, ok in zip(vs, valid) if ok], dtype=np.float64
        )
    else:
        X = np.zeros((0, dim), dtype=np.float64)
    return X, valid


def nearest_struct_col(vec_col: Column | str, centroids: np.ndarray) -> Column:
    """struct<d: double, cid: int> of the nearest centroid — the
    vectorized drop-in for ``similarity.nearest_centroid`` /
    ``with_nearest_centroid``'s ``__near`` column. ``centroids`` is
    captured in the function closure and ships once per task."""
    C = np.asarray(centroids, dtype=np.float64)
    dim = C.shape[1]

    @pandas_udf("d double, cid int")
    def _near(vs: pd.Series) -> pd.DataFrame:
        X, valid = _rows_matrix(vs, dim)
        d = np.full(len(vs), np.nan)
        cid = np.zeros(len(vs), dtype=np.int32)
        if len(X):
            acc = seq_sq_dists(X, C)
            best = acc.argmin(axis=1)
            d[valid] = acc[np.arange(len(X)), best]
            cid[valid] = best
        out = pd.DataFrame({"d": d, "cid": cid})
        out.loc[~valid, "d"] = None
        return out

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _near(v.cast("array<double>"))


def pq_codes_col(
    vec_col: Column | str,
    books: list[np.ndarray],
    slices: list[tuple[int, int]],
    names: list[str],
) -> Column:
    """struct<names[0]: int, ...> of per-book argmin codes: book ``j``
    scores the (1-based ``lo``, ``length``) slice of the vector given
    by ``slices[j]`` — the vectorized ``pq._near``-per-subspace encode
    (optionally including a full-vector coarse book). One Arrow pass
    computes every code.

    Validity is PER (row, book), matching the F.slice expression this
    replaces: a book scores every vector long enough to fill its
    slice (``len(v) >= lo-1+ln`` — over-length vectors encode their
    prefix, exactly as F.slice did), and a NULL / too-short vector
    gets cid 0 for that book (the measured
    array_min-over-NULL-distances behavior of the zip_with padding).
    Mixed row lengths are handled per length group; the fixed-dim
    common case stays one matrix."""
    Bs = [np.asarray(b, dtype=np.float64) for b in books]
    needs = [lo - 1 + ln for lo, ln in slices]
    min_need = min(needs)
    schema = ", ".join(f"{nm} int" for nm in names)

    @pandas_udf(schema)
    def _codes(vs: pd.Series) -> pd.DataFrame:
        n = len(vs)
        cids = [np.zeros(n, dtype=np.int32) for _ in Bs]
        groups: dict[int, list[int]] = {}
        for i, v in enumerate(vs):
            if v is not None and len(v) >= min_need:
                groups.setdefault(len(v), []).append(i)
        for L, idx_list in groups.items():
            idxs = np.asarray(idx_list, dtype=np.int64)
            X = np.array(
                [vs.iloc[i][:L] for i in idx_list], dtype=np.float64
            )
            for j, (B, (lo, ln)) in enumerate(zip(Bs, slices)):
                if L >= needs[j]:
                    cids[j][idxs] = seq_sq_dists(
                        X[:, lo - 1:lo - 1 + ln], B
                    ).argmin(axis=1)
        return pd.DataFrame({names[j]: cids[j] for j in range(len(Bs))})

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _codes(v.cast("array<double>"))


def cosine_to_assigned_col(
    vec_col: Column | str, cluster_col: Column | str, centroids: np.ndarray
) -> Column:
    """cosine(vector, centroids[cluster]) as one Arrow pass — the
    vectorized form of ``semantic.centroid_cosine`` (and of the
    broadcast (cluster, centroid)-join variant; both compute the same
    fold). dot and both squared norms accumulate in dimension order,
    matching ``dedup.cosine_sim``'s aggregate folds bit-for-bit; the
    caller applies F.round exactly as before. NULL/wrong-dim vectors
    or NULL clusters yield NULL."""
    C = np.asarray(centroids, dtype=np.float64)
    dim = C.shape[1]

    @pandas_udf("double")
    def _cos(vs: pd.Series, cl: pd.Series) -> pd.Series:
        X, valid = _rows_matrix(vs, dim)
        cids = cl.to_numpy(dtype="float64", na_value=np.nan)
        # out-of-range cluster ids yield NULL (the replaced plans'
        # tolerance: the broadcast join dropped such rows, the inline
        # element_at returned NULL) instead of an executor IndexError
        ok = (
            valid & ~np.isnan(cids)
            & (cids >= 0) & (cids < C.shape[0])
        )
        res = np.full(len(vs), np.nan)
        if ok.any():
            # X holds only the `valid` rows; map each ok row to its
            # position inside X
            xpos = np.cumsum(valid) - 1
            rows = X[xpos[ok]]
            cc = C[cids[ok].astype(np.int64)]
            dot = np.zeros(len(rows))
            na = np.zeros(len(rows))
            nb = np.zeros(len(rows))
            for t in range(dim):
                x = rows[:, t]
                y = cc[:, t]
                dot += x * y
                na += x * x
                nb += y * y
            res[ok] = dot / (np.sqrt(na) * np.sqrt(nb))
        out = pd.Series(res)
        return out.where(pd.Series(ok), None)

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    c = F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col
    return _cos(v.cast("array<double>"), c.cast("long"))


def cosine_cols_udf():
    """pandas_udf computing cosine(a, b) over two array columns with
    the bit-identical dimension-order fold of the Catalyst
    ``dedup.cosine_sim`` expression (dot and both squared norms
    accumulate left-to-right; sqrt/divide are single IEEE ops).

    Semantics preserved from the expression it replaces:
    - NULL or length-mismatched pairs -> NULL (zip_with pads the
      shorter side with NULLs, which nulls the dot product);
    - a zero-norm side raises, mirroring ANSI mode's DIVIDE_BY_ZERO
      (Spark 4 default) instead of silently emitting NaN/NULL.
    Mixed row lengths are handled per length group."""

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        n = len(va)
        out = [None] * n
        groups: dict[int, list[int]] = {}
        for i, (a, b) in enumerate(zip(va, vb)):
            if a is None or b is None or len(a) != len(b):
                continue
            groups.setdefault(len(a), []).append(i)
        for dim, idxs in groups.items():
            X = np.array([va.iloc[i] for i in idxs], dtype=np.float64)
            Y = np.array([vb.iloc[i] for i in idxs], dtype=np.float64)
            dot = np.zeros(len(idxs))
            na = np.zeros(len(idxs))
            nb = np.zeros(len(idxs))
            for t in range(dim):
                x = X[:, t]
                y = Y[:, t]
                dot += x * y
                na += x * x
                nb += y * y
            den = np.sqrt(na) * np.sqrt(nb)
            if (den == 0).any():
                raise ArithmeticError(
                    "[DIVIDE_BY_ZERO] cosine over a zero-norm vector "
                    "(matches ANSI division semantics)"
                )
            res = dot / den
            for k, i in enumerate(idxs):
                out[i] = float(res[k])
        return pd.Series(out, dtype="float64")

    return _cos


def lloyd_partial_sums(
    emb: DataFrame,
    vec_col: str,
    books: list[np.ndarray],
    slices: list[tuple[int, int]],
) -> list[tuple[int, int, np.ndarray, int]]:
    """One job per Lloyd iteration: assign every (valid) row to its
    nearest entry of every book and reduce per-(book, cid) vector
    sums + counts inside the Arrow stage, so only
    ``tasks * sum(k_j * len_j)`` partial rows ever leave executors
    (no posexplode of the corpus, no shuffle — the partials collect
    straight from the map stage). Returns [(j, cid, sum_vec, n), ...]
    for non-empty clusters, already reduced across tasks.

    Assignment argmins are the bit-exact sequential fold; the partial
    sums accumulate in batch row order (np.add.at is ordered), and
    cross-task merge order is partition order — the same accepted
    reassociation class as the hash-aggregate it replaces (absorbed
    by the trainers' round_means contract). Non-null WRONG-DIMENSION
    vectors are dropped from the update entirely (deliberate: the old
    posexplode aggregate inconsistently folded their positions into
    cluster 0; dropping is the recorded divergence).

    DRIVER GUARD (r11 verdict): with T map tasks the collect is
    T x sum(k_j * len_j) partial rows — trivial locally, multi-GB at
    ~10^5-10^6 tasks. Above ``chill.lloyd.tree_reduce_tasks`` planned
    input partitions (default 256) one tiny groupBy(j, cid)
    elementwise merge runs on executors first, so at most
    sum(k_j) rows reach the driver; the merge order moves from
    partition order to shuffle order — the same reassociation class,
    inside the round_means contract."""
    Bs = [np.asarray(b, dtype=np.float64) for b in books]
    dim = max(lo - 1 + ln for lo, ln in slices)

    def _partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = [np.zeros_like(B) for B in Bs]
        ns = [np.zeros(len(B), dtype=np.int64) for B in Bs]
        for pdf in it:
            X, valid = _rows_matrix(pdf["__v"], dim)
            if not len(X):
                continue
            for j, (B, (lo, ln)) in enumerate(zip(Bs, slices)):
                S = X[:, lo - 1:lo - 1 + ln]
                cid = seq_sq_dists(S, B).argmin(axis=1)
                np.add.at(sums[j], cid, S)
                np.add.at(ns[j], cid, 1)
        rows = {"j": [], "cid": [], "s": [], "n": []}
        for j, B in enumerate(Bs):
            for c in np.nonzero(ns[j])[0]:
                rows["j"].append(j)
                rows["cid"].append(int(c))
                # plain Python lists: an empty/ndarray-typed column
                # trips Arrow's NumPyConverter on list<double>
                rows["s"].append([float(x) for x in sums[j][c]])
                rows["n"].append(int(ns[j][c]))
        if rows["j"]:
            yield pd.DataFrame(rows)

    sel = emb.select(F.col(vec_col).cast("array<double>").alias("__v"))
    out_schema = "j int, cid int, s array<double>, n long"
    partials = sel.mapInPandas(_partials, out_schema)
    try:
        n_tasks = sel.rdd.getNumPartitions()
    except Exception:
        n_tasks = 0
    gate = int(
        emb.sparkSession.conf.get("chill.lloyd.tree_reduce_tasks", "256")
    )
    if gate > 0 and n_tasks > gate:

        def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
            vecs = np.array(pdf["s"].tolist(), dtype=np.float64)
            return pd.DataFrame(
                {
                    "j": [int(pdf["j"].iloc[0])],
                    "cid": [int(pdf["cid"].iloc[0])],
                    "s": [[float(x) for x in vecs.sum(axis=0)]],
                    "n": [int(pdf["n"].sum())],
                }
            )

        partials = partials.groupBy("j", "cid").applyInPandas(
            _merge, out_schema
        )
    part_rows = partials.collect()
    merged: dict[tuple[int, int], tuple[np.ndarray, int]] = {}
    for r in part_rows:
        key = (r["j"], r["cid"])
        vec = np.asarray(r["s"], dtype=np.float64)
        if key in merged:
            prev_v, prev_n = merged[key]
            merged[key] = (prev_v + vec, prev_n + r["n"])
        else:
            merged[key] = (vec, r["n"])
    return [(j, c, v, n) for (j, c), (v, n) in sorted(merged.items())]

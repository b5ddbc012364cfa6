"""Random-projection dimensionality reduction for embedding columns.

Johnson-Lindenstrauss with the Achlioptas (2003) sparse sign matrix:
entries drawn from {+1, 0, -1} with probabilities {1/6, 2/3, 1/6}
preserve pairwise distances in expectation exactly like Gaussian
planes (scaled by sqrt(3/k)), while the projection becomes integer
adds/subtracts of a third of the coordinates — no BLAS needed, and
(the reason it fits this engine) EXACTLY replayable by a SQL oracle:

- the sign matrix derives from the portable md5 hash
  (``sign(j, d) = phash('rp:<seed>:<j>:<d>') % 6`` -> 0 maps to -1,
  5 to +1, else 0), so Python, Spark, and DuckDB generate the same
  planes from the same seed string;
- vectors are fixed-pointed at 1e6 (round-half-up, exact in int64:
  |v| < 1e3 x dim 4096 x scale 1e6 stays < 2^62), so the per-dim dot
  product is an INTEGER sum — aggregation-order-free, unlike a float
  dot product whose last bits depend on partial-sum order;
- the only float op is the final sqrt(3/k)/1e6 rescale of the
  finished integer, identical everywhere.

Scale shape: the k x dim sign matrix is model-sized and broadcast
(one row per output dim); the projection is one narrow map pass —
explode by output dim, zip_with multiply, sequential integer fold —
with no corpus shuffle at all. Output is LONG format (id, rp_dim,
value): re-assemble with collect_list downstream if an array column
is wanted (the driver's result sorter can't order list cells).

Reference parity: no counterpart in the reference; added LLM-pipeline
surface (embedding preprocessing ahead of ANN / clustering / dedup).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for input vectors
VEC_SCALE = 1_000_000


def _phash_py(s: str) -> int:
    """Python twin of portable.phash / PHASH_SQL: first 15 hex chars
    of md5 as a 60-bit non-negative int."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def achlioptas_signs(k: int, dim: int, seed: str = "rp") -> list[list[int]]:
    """k rows of dim entries in {-1, 0, +1}: phash('rp:<seed>:<j>:<d>')
    % 6 == 0 -> -1, == 5 -> +1, else 0 (P(+-1) = 1/6 each)."""
    out = []
    for j in range(k):
        row = []
        for d in range(dim):
            h = _phash_py(f"rp:{seed}:{j}:{d}") % 6
            row.append(-1 if h == 0 else (1 if h == 5 else 0))
        out.append(row)
    return out


def signs_sql(k: int, dim: int, seed: str = "rp") -> str:
    """DuckDB CTE body regenerating the same sign matrix as
    (j, d, s) rows — join target for oracle replay."""
    return f"""
    SELECT j, d,
           CASE ('0x' || substring(md5('rp:{seed}:' || j || ':' || d), 1, 15))::BIGINT % 6
                WHEN 0 THEN -1 WHEN 5 THEN 1 ELSE 0 END AS s
    FROM range({k}) AS rj(j), range({dim}) AS rd(d)
    """


def random_project(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    seed: str = "rp",
    dim: int | None = None,
) -> DataFrame:
    """Project ``vec_col`` (array<float/double>, fixed width ``dim``)
    to ``k`` JL coordinates; returns (id, rp_dim, value) with value
    rounded to 6. Rows whose vector is null or the wrong width are
    dropped (match the caller's dedup-pipeline routing if they must
    be kept)."""
    if dim is None:
        from .dedup import _mode_dim

        dim = _mode_dim(df, vec_col)
    signs = achlioptas_signs(k, dim, seed)
    spark = df.sparkSession
    from ..session import local_frame

    planes = local_frame(
        spark,
        [(j, [int(x) for x in row]) for j, row in enumerate(signs)],
        "rp_dim int, s array<int>",
    )
    v = F.col(vec_col).cast("array<double>")
    vint = F.transform(v, lambda x: F.round(x * VEC_SCALE, 0).cast("bigint"))
    scale = (3.0 / k) ** 0.5 / VEC_SCALE
    dot = F.aggregate(
        F.zip_with(F.col("__vint"), F.col("s"),
                   lambda a, b: a * b.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        df.filter(v.isNotNull() & (F.size(v) == dim))
        .select(F.col(id_col), vint.alias("__vint"))
        .crossJoin(F.broadcast(planes))
        .select(
            id_col,
            "rp_dim",
            F.round(dot * F.lit(scale), 6).alias("value"),
        )
    )


def project_to_vectors(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    seed: str = "rp",
    dim: int | None = None,
) -> DataFrame:
    """``random_project`` reassembled to one row per id: (id, pvec
    array<double>) with coordinates in rp_dim order — the compact
    search-side representation (k doubles instead of dim floats).
    One groupBy on the id (map-side combinable collect of k structs)."""
    long = random_project(df, vec_col, id_col, k=k, seed=seed, dim=dim)
    return (
        long.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rp_dim", "value"))
            ).alias("__s")
        )
        .select(
            id_col,
            F.transform(F.col("__s"), lambda e: e["value"]).alias("pvec"),
        )
    )


def project_vector(vec: list, k: int = 8, seed: str = "rp") -> list:
    """Driver-side twin of ``random_project`` for a single query
    vector — the same integer fixed-point arithmetic, so a projected
    query is bit-identical to the distributed projection of the same
    vector."""
    import math

    dim = len(vec)
    signs = achlioptas_signs(k, dim, seed)
    out = []
    scale = math.sqrt(3.0 / k) / VEC_SCALE
    def r6(v: float) -> float:
        # half-up like SQL round(); Python's round() is banker's
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

    for j in range(k):
        acc = 0
        for d, x in enumerate(vec):
            xi = int(math.floor(abs(x) * VEC_SCALE + 0.5))
            xi = xi if x >= 0 else -xi
            acc += xi * signs[j][d]
        out.append(r6(acc * scale))
    return out

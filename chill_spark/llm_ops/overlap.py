"""Pairwise distinct-audience overlap via HLL sketch algebra.

The scale recipe for "how many distinct users do every two groups
share": HLL sketches union losslessly but can't intersect, so the
overlap comes from inclusion-exclusion — |A∩B| ≈ est(A) + est(B) −
est(A∪B). One sketch per group (fixed kilobytes regardless of
cardinality), then C² unions of kilobyte sketches. That is the
PRODUCTION path: nothing in it touches user-level rows after the one
sketch-building aggregate.

The EXACT leg (``include_exact=True``) is a user-keyed pre-distinct +
pair self-join — per-pair cost is the shared-user row count, i.e.
corpus-quadratic in co-occurring users. It exists as the small-scale
verification rail (the driver oracle replays it and checks the
estimate lands inside the 3-sigma HLL bound); at 100 TB you run the
sketch leg alone. Default off for exactly that reason.

Reference parity: no counterpart in the reference; added LLM-ops
corpus-diagnostics surface (queries.q_distinct_overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_distinct_overlap(
    df: DataFrame,
    group_col: str,
    user_col: str,
    lg_k: int = 14,
    include_exact: bool = False,
) -> DataFrame:
    """Distinct-``user_col`` overlap for every pair of ``group_col``
    values (``type_a < type_b``).

    Default (scale path): ``(type_a, type_b, est_overlap, union_est)``
    from sketch algebra only — one groupBy building C sketches, one
    broadcast-sized pair join of C rows.

    ``include_exact=True`` (verification rail, small scale only) adds
    ``exact_overlap`` and an ``est_ok`` verdict asserting the estimate
    lands within 3*rsd of the UNION cardinality (+100 absolute floor
    for tiny audiences) — inclusion-exclusion error scales with the
    union (the largest of the three sketches), not the intersection."""
    sk = df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(user_col), lg_k).alias("sk")
    )
    a_type = F.col(f"a.{group_col}")
    b_type = F.col(f"b.{group_col}")
    ests = (
        sk.alias("a")
        .join(sk.alias("b"), a_type < b_type)
        .select(
            a_type.alias("type_a"),
            b_type.alias("type_b"),
            (
                F.hll_sketch_estimate("a.sk")
                + F.hll_sketch_estimate("b.sk")
                - F.hll_sketch_estimate(F.hll_union("a.sk", "b.sk"))
            ).alias("est_overlap"),
            F.hll_sketch_estimate(
                F.hll_union("a.sk", "b.sk")
            ).alias("union_est"),
        )
    )
    if not include_exact:
        return ests
    pu = df.select(group_col, user_col).distinct()
    exact = (
        pu.alias("a")
        .join(
            pu.alias("b"),
            (F.col(f"a.{user_col}") == F.col(f"b.{user_col}"))
            & (a_type < b_type),
        )
        .groupBy(a_type.alias("type_a"), b_type.alias("type_b"))
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    rsd = 1.04 / (2 ** (lg_k / 2))
    # LEFT join from the sketch side: a pair with zero shared users has
    # no exact row at all — an inner join would silently drop it from
    # the output and skip est_ok exactly where inclusion-exclusion
    # noise is most likely to fabricate an overlap.
    return ests.join(
        exact, ["type_a", "type_b"], "left"
    ).withColumn(
        "exact_overlap", F.coalesce(F.col("exact_overlap"), F.lit(0))
    ).select(
        "type_a",
        "type_b",
        "exact_overlap",
        "est_overlap",
        "union_est",
        (
            F.abs(F.col("est_overlap") - F.col("exact_overlap"))
            <= F.lit(3 * rsd) * (F.col("union_est") + F.lit(100.0))
        ).alias("est_ok"),
    )

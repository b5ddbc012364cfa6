"""Single-scan column profiling — the stats-collection primitive.

The reference's validation posture is per-column aggregate comparison
between expected and loaded data (HlxTools.py:396-450 builds per-column
SELECT lists; compare_data diffs them). ``profile`` generalizes that
into a one-pass table profile: row count, per-column non-null/null
counts, distinct cardinality, and min/max — the inputs a warehouse
uses for NDV-based planning, data-quality dashboards, and drift checks
between loads.

Shape: ONE scan. All statistics ride a single ``agg`` — Spark plans
the multiple ``count(DISTINCT col)`` via one Expand (row replication
per distinct column) feeding a partial+final hash aggregate, so the
input is read once regardless of how many columns are profiled. The
one-row result is then unpivoted driver-free with ``inline`` (an
array-of-structs projection over the 1-row frame — no shuffle, no
collect). min/max are computed in the column's native type and cast to
string AFTER aggregation (casting first would make "10" < "9").

At 100 TB: exact NDV via Expand multiplies shuffle rows by the number
of profiled columns — fine for a few columns, heavy for very wide
profiles. ``approx=True`` swaps in ``approx_count_distinct`` (HLL++,
one pass, no Expand), the right default at scale when exact NDV isn't
required; it is not oracle-replayable bit-for-bit (different HLL
implementations), which is why exact is the default here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Long-format profile: one row per column with
    ``(column, n_rows, n_nonnull, n_null, n_distinct, min_val,
    max_val)``. ``n_distinct`` counts non-null distinct values;
    with ``approx=True`` it is an HLL++ estimate at relative
    standard deviation ``rsd`` (tighter rsd = bigger sketch,
    still constant-size per column)."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown column(s): {missing}")
    if approx:
        def nd(col):
            return F.approx_count_distinct(col, rsd=rsd)
    else:
        nd = F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
        )
        for c in cols
    ])
    return one.select(F.inline(rows)).orderBy("column")


def profile_diff(
    a: DataFrame,
    b: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Column-level drift between two snapshots of the same table —
    the reference's expected-vs-loaded aggregate comparison
    (HlxTools.py compare_data builds per-column SELECT lists and
    diffs them) generalized into a one-row-per-column drift report:

    ``(column, n_rows_a, n_rows_b, nonnull_a, nonnull_b,
    null_frac_a, null_frac_b, ndv_a, ndv_b, min_a, min_b, max_a,
    max_b, row_ratio, ndv_ratio)``

    with ratios rounded to 6 places (b relative to a; NULL when a's
    side is 0). Each side is ONE scan (``profile``'s single-agg
    shape); the join is column-name-grain — profile-sized, never
    data-sized — so the whole comparison is two passes total
    regardless of how many columns drift. ``approx=True`` profiles
    both sides with HLL NDV (the at-scale default; ratios then carry
    sketch error and belong behind tolerance verdicts, as
    q_profile_approx does)."""
    pa = profile(a, columns, approx=approx, rsd=rsd)
    pb = profile(b, columns, approx=approx, rsd=rsd)
    sa = pa.select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_nonnull").alias("nonnull_a"),
        F.col("n_distinct").alias("ndv_a"),
        F.col("min_val").alias("min_a"),
        F.col("max_val").alias("max_a"),
    )
    sb = pb.select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_nonnull").alias("nonnull_b"),
        F.col("n_distinct").alias("ndv_b"),
        F.col("min_val").alias("min_b"),
        F.col("max_val").alias("max_b"),
    )

    def frac(num, den):
        return F.when(
            F.col(den) > 0, F.round(F.col(num) / F.col(den), 6)
        )

    return (
        sa.join(sb, "column")
        .select(
            "column",
            "n_rows_a", "n_rows_b", "nonnull_a", "nonnull_b",
            F.when(
                F.col("n_rows_a") > 0,
                F.round(1 - F.col("nonnull_a") / F.col("n_rows_a"), 6),
            ).alias("null_frac_a"),
            F.when(
                F.col("n_rows_b") > 0,
                F.round(1 - F.col("nonnull_b") / F.col("n_rows_b"), 6),
            ).alias("null_frac_b"),
            "ndv_a", "ndv_b", "min_a", "min_b", "max_a", "max_b",
            frac("n_rows_b", "n_rows_a").alias("row_ratio"),
            frac("ndv_b", "ndv_a").alias("ndv_ratio"),
        )
        .orderBy("column")
    )


def profile_oracle_sql(
    table: str, columns: list[str], verdicts: tuple[str, ...] = ()
) -> str:
    """DuckDB SQL replaying ``profile(df, columns)`` exactly (one
    UNION ALL branch per column; min/max cast to VARCHAR after
    aggregation, as the engine does). ``verdicts`` appends
    ``TRUE AS <name>`` columns for queries that pair the exact
    profile with in-plan tolerance checks of the approx path —
    the oracle expects every verdict to hold."""
    vs = "".join(f",\n               TRUE AS {v}" for v in verdicts)
    parts = [
        f"""
        SELECT '{c}' AS "column",
               count(*) AS n_rows,
               count({c}) AS n_nonnull,
               count(*) - count({c}) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val{vs}
        FROM {table}"""
        for c in columns
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'

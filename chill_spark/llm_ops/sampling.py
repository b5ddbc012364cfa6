"""Deterministic sampling / dataset splitting for training-data
pipelines: hash-based train/val/test assignment and per-stratum
sampling.

Everything keys off a content-independent hash bucket of the row id
(md5 — engine-portable, so the DuckDB oracle reproduces assignments
bit-for-bit). Hash-based selection is the only sampling that survives
100 TB: it is a narrow per-row expression (no shuffle, no state, no
driver RNG), assignments are stable under re-runs, retries, and
repartitioning, and adding data never reassigns existing rows —
`df.sample()` by contrast draws per-task RNG streams that change with
partitioning.

Reference parity: the reference has no sampling layer; this is part
of the added LLM-pipeline surface (north-star ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column | str, seed: str = "split") -> Column:
    """Uniform bucket in [0, BUCKETS) from md5(seed:id) — the first 8
    hex chars as an integer. Stable across engines: DuckDB equivalent
    is ``('0x' || substring(md5(seed || ':' || id), 1, 8))::BIGINT %
    BUCKETS``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat_ws(":", F.lit(seed), c.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % BUCKETS
    )


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one named split
    with the given weights (must sum to ~1). Cumulative bucket
    thresholds over the id hash — no shuffle, no RNG state."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = hash_bucket(id_col, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = b < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls under the cutoff. Grouping by a stratum column beforehand is
    unnecessary — the hash is uniform within every stratum, so each
    stratum is sampled at ``fraction`` without a shuffle (for exact
    per-stratum counts use a windowed rank instead)."""
    return df.filter(hash_bucket(id_col, seed) < int(round(fraction * BUCKETS)))


def split_oracle_sql(
    table: str,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split",
) -> str:
    """DuckDB CASE expression mirroring ``assign_split`` exactly."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = (
        f"(('0x' || substring(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {BUCKETS})"
    )
    names = list(weights)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += weights[name]
        whens.append(f"WHEN {bucket} < {int(round(cum * BUCKETS))} THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
    return case


def stratified_sample_exact(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    n_per_stratum: int,
    seed: str = "sample",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer when the
    stratum is smaller): rank rows inside each stratum by their id
    hash (uniform, deterministic) and keep the first n. One shuffle
    on the stratum key; no RNG state, stable under repartitioning —
    the exact-count companion to ``stratified_sample``."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        hash_bucket(id_col, seed), id_col
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    target_fraction: float,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep probability
    proportional to ``weight_col`` (importance/quality-weighted corpus
    selection), scaled so the expected kept fraction over uniform
    weights is ``target_fraction``; per-row probabilities cap at 1.

    keep iff hash_bucket(id) < p_row * BUCKETS, with
    p_row = min(1, target_fraction * w / mean(w)). The mean is a 1-row
    aggregate broadcast back (the only non-map stage); selection stays
    a stable per-row hash — same replay/repartition guarantees as the
    uniform sampler."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    mean_w = df.agg(F.avg(w).alias("__mw"))
    b = hash_bucket(id_col, seed)
    p = F.least(F.lit(1.0), F.lit(target_fraction) * w / F.col("__mw"))
    # explicit floor: Spark's double->bigint cast truncates but other
    # engines (DuckDB) round, so the oracle must see the same boundary
    return (
        df.crossJoin(F.broadcast(mean_w))
        .filter(b < F.floor(p * BUCKETS).cast("bigint"))
        .drop("__mw")
    )


def weighted_sample_exact(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    n: int,
    seed: str = "wres",
) -> DataFrame:
    """Exactly-``n`` weighted sample WITHOUT replacement
    (Efraimidis–Spirakis A-Res): every row draws a deterministic
    uniform u from its id hash and ranks by ``ln(u) / w`` — the n
    largest keys are a weighted sample without replacement, with
    inclusion odds proportional to weight. Complements
    ``weighted_sample`` (Bernoulli, expected-fraction): use this when
    the output size must be exact.

    Deterministic (no RNG state — same replay/repartition guarantees
    as the hash samplers) and a TakeOrdered per-partition heap, never
    a global sort. The key is rounded to 9 decimals before ranking so
    the cut line is engine-exact (ln/divide drift ~1e-15), ties by
    id. Oracle replay: u = (('0x'||substring(md5('seed:'||id),1,8))
    ::BIGINT + 0.5) / 2^32.

    Precondition: weights must be > 0 — the A-Res key ln(u)/w is only
    meaningful for positive weights (a negative w flips the sign of
    ln(u) and would rank FIRST; w=0 divides by zero). Rows with NULL
    or non-positive weight carry zero probability mass and are
    filtered before ranking."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    df = df.filter(w > 0)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**32))
    key = F.round(F.log(u) / w, 9)
    return (
        df.withColumn("__k", key)
        .orderBy(F.col("__k").desc(), F.col(id_col))
        .limit(n)
        .withColumnRenamed("__k", "sample_key")
    )


def temperature_mixture_weights(
    df: DataFrame,
    group_col: str,
    count_col: Column | str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled source-mixture reweighting — the standard
    multilingual/multi-source sampling recipe (alpha in (0, 1] flattens
    the natural distribution): with c_i tokens in source i,

        p_i          = c_i^alpha / sum_j c_j^alpha      (target share)
        multiplier_i = p_i * total_tokens / c_i         (epochs over
                                                         source i under
                                                         the target mix)

    alpha=1 reproduces the natural mixture (all multipliers 1);
    alpha->0 approaches uniform over sources, oversampling the tails.

    Output: (group, tokens, p_target, multiplier), one row per source.
    Shape: one map-side-combinable agg to source level, then a 1-row
    total broadcast back — the per-source table is model-sized, never
    corpus-sized, so this composes with ``weighted_sample`` (feed
    multiplier as the weight) without another corpus pass."""
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    agg = df.groupBy(group_col).agg(F.sum(c).alias("tokens"))
    tot = agg.agg(
        F.sum("tokens").alias("__total"),
        F.sum(F.pow("tokens", F.lit(alpha))).alias("__z"),
    )
    p = F.pow("tokens", F.lit(alpha)) / F.col("__z")
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "tokens",
            F.round(p, 6).alias("p_target"),
            F.round(p * F.col("__total") / F.col("tokens"), 6).alias(
                "multiplier"
            ),
        )
    )


def budget_filter(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score_col: Column | str,
    count_col: Column | str,
    budget_frac: float,
) -> DataFrame:
    """Per-group quality thresholding to a token budget: rank each
    group's rows by score (descending, id ascending for determinism)
    and keep rows while the cumulative token count BEFORE the row is
    under ``budget_frac`` x the group's total tokens — the boundary
    row is kept, so every non-empty group keeps at least its best row.

    This is the 'fill the data budget with the highest-quality
    documents per source' selection step of a curated pretraining
    mix. Shape: one window shuffle per group key (rank + running sum
    in the same window; group totals ride a partition-wide sum in the
    same shuffle) — no global sort, no joins. The kept rows stream
    out with ``__cum``-free schema identical to the input.

    Window-skew policy (engine-wide contract, see SCALE.md): window
    partitions must colocate — AQE's skew splitting applies to join
    and aggregate shuffles, NEVER to windows — so any window keyed by
    a low-cardinality group is a serialization hazard at corpus
    scale. Pure top-K rankings salt losslessly (the q_source_caps
    two-phase pattern: rank in (group, salt), re-rank survivors); a
    RUNNING SUM cannot — each row's cumulative depends on every
    higher-ranked row, so the exact boundary semantics here are
    inherently one-task-per-group. At 100 TB use
    ``budget_filter_threshold`` instead: it aggregates per (group,
    score) first (map-side combinable, skew-free), finds each
    group's score cutoff on the model-sized aggregate, and keeps
    rows by broadcast threshold — same greedy-by-score selection,
    boundary resolved at score granularity (score ties at the
    cutoff are kept together)."""
    from pyspark.sql import Window

    s = F.col(score_col) if isinstance(score_col, str) else score_col
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    d = df.withColumn("__s", s).withColumn("__c", c)
    w = Window.partitionBy(group_col).orderBy(
        F.col("__s").desc(), F.col(id_col)
    )
    cum_before = (
        F.sum("__c").over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    total = F.sum("__c").over(
        Window.partitionBy(group_col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        d.withColumn("__cum", F.coalesce(cum_before, F.lit(0)))
        .withColumn("__budget", F.lit(budget_frac) * total)
        .filter(F.col("__cum") < F.col("__budget"))
        .drop("__s", "__c", "__cum", "__budget")
    )


def budget_filter_threshold(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score_col: Column | str,
    count_col: Column | str,
    budget_frac: float,
    n_buckets: int = 10_000,
) -> DataFrame:
    """``budget_filter``'s 100 TB form: the same greedy
    highest-score-first selection, resolved at score-BUCKET
    granularity so no corpus-sized window exists anywhere in the
    plan.

    Shape: (1) per-group min/max/total — a model-sized aggregate,
    broadcast back; (2) each row maps to one of ``n_buckets``
    equal-width score buckets (pure per-row arithmetic); (3) a
    (group, bucket) histogram — map-side combinable, at most
    ``n_buckets`` rows per group, so the cumulative walk over it is
    a window over a MODEL-sized frame, never the corpus; (4) each
    group's cutoff bucket (greatest-score-first, budget boundary
    bucket kept whole) broadcasts back and keeps rows by plain
    filter. Two corpus passes, both skew-free partial aggregations /
    filters; contrast ``budget_filter``'s single pass whose running
    sum serializes each group onto one task.

    Semantics vs ``budget_filter``: selection is downward-closed in
    score (kept row => every higher-bucket row in its group kept)
    and every non-empty group keeps its best bucket; the boundary is
    bucket-granular, overshooting the budget by at most the boundary
    bucket's mass (<= total/n_buckets for a well-spread score, vs
    the exact form's <= one row). All arithmetic is IEEE double
    (+,-,*,/, floor) on exact per-group extrema, so an external
    engine replays bucket assignment bit-for-bit — the DuckDB oracle
    for q_budget_threshold does."""
    from pyspark.sql import Window

    s = F.col(score_col) if isinstance(score_col, str) else score_col
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    d = df.withColumn("__s", s).withColumn("__c", c)
    stats = d.groupBy(group_col).agg(
        F.min("__s").alias("__mn"),
        F.max("__s").alias("__mx"),
        F.sum("__c").alias("__tot"),
    )
    bucket = F.when(
        F.col("__mx") > F.col("__mn"),
        F.least(
            F.floor(
                (F.col("__s") - F.col("__mn"))
                / (F.col("__mx") - F.col("__mn"))
                * F.lit(n_buckets)
            ),
            F.lit(n_buckets - 1).cast("bigint"),
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    b = d.join(F.broadcast(stats), group_col).withColumn("__b", bucket)
    hist = b.groupBy(group_col, "__b").agg(F.sum("__c").alias("__bc"))
    w = Window.partitionBy(group_col).orderBy(F.col("__b").desc())
    cum_before = F.sum("__bc").over(w.rowsBetween(Window.unboundedPreceding, -1))
    cut = (
        hist.join(F.broadcast(stats.select(group_col, "__tot")), group_col)
        .withColumn("__cum", F.coalesce(cum_before, F.lit(0)))
        .filter(F.col("__cum") < F.lit(budget_frac) * F.col("__tot"))
        .groupBy(group_col)
        .agg(F.min("__b").alias("__bmin"))
    )
    return (
        b.join(F.broadcast(cut), group_col)
        .filter(F.col("__b") >= F.col("__bmin"))
        .drop("__s", "__c", "__b", "__mn", "__mx", "__tot", "__bmin")
    )


def unimax_walk(
    sizes: list[tuple], total_budget: int, max_epochs: int
) -> list[tuple]:
    """The pure UniMax allocation walk over PRE-SORTED (group, n)
    pairs (ascending n, ties by group): each group takes
    ``min(max_epochs * n, remaining // groups_left)``. Returns
    (group, n, alloc) triples in input order. Invariants (property-
    tested): sum(alloc) <= budget; alloc_i <= max_epochs * n_i;
    allocations are non-decreasing in n; budget goes unspent only
    when every group hit its epoch cap."""
    remaining = int(total_budget)
    out = []
    for i, (g, n) in enumerate(sizes):
        left = len(sizes) - i
        alloc = min(max_epochs * int(n), remaining // left)
        remaining -= alloc
        out.append((g, int(n), alloc))
    return out


def unimax_budget(
    df: DataFrame,
    group_col: str,
    count_col: Column | str,
    total_budget: int,
    max_epochs: int = 4,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023): spread a total
    token budget as uniformly as possible across groups (languages /
    sources) subject to a per-group repetition cap of ``max_epochs``
    passes over its data. Walk groups smallest-first; each gets

        alloc_i = min(max_epochs * n_i,  R_i // groups_left)

    where R_i is the budget still unallocated — small groups take
    their cap, the per-group fair share grows as capped groups drop
    out, and large groups split the remainder evenly.

    All arithmetic is INTEGER (floor division), so allocations are
    exact and an external SQL engine replays the sequential walk
    bit-for-bit (recursive CTE over the size-ranked groups). Output:
    (group, n_tokens, alloc, epochs) with epochs = alloc/n rounded
    to 6.

    Scale shape: one map-side-combinable aggregation to group level;
    the walk itself runs on the driver over the GROUP-count-sized
    list (languages/sources — tens to thousands, never corpus-sized;
    same driver-bounded contract as k-means' k x dim partials). The
    result is a model-sized table meant to broadcast back into
    ``weighted_sample`` / ``budget_filter`` as per-group weights."""
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    agg = df.groupBy(group_col).agg(F.sum(c).alias("n_tokens"))
    rows = sorted(
        agg.collect(), key=lambda r: (r["n_tokens"], str(r[group_col]))
    )
    spark = df.sparkSession
    out = unimax_walk(
        [(r[group_col], int(r["n_tokens"])) for r in rows],
        int(total_budget), max_epochs,
    )
    # epochs rounds via F.round (half-up, like SQL round) — Python's
    # round() is banker's and would diverge from an oracle on ties
    from ..session import local_frame

    return local_frame(
        spark, out, f"{group_col} string, n_tokens bigint, alloc bigint"
    ).withColumn(
        "epochs",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("alloc") / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)),
    )

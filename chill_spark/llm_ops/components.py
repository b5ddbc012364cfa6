"""Connected components over an edge list — duplicate-cluster closure.

Completes the dedup pipeline: MinHash/Jaccard candidate generation
yields *pairs*, but dedup must collapse *clusters* — if A~B and B~C,
all three are one group even when A!~C (transitivity). Keeping one
survivor per connected component (min id) is the standard corpus-dedup
policy.

Algorithm: iterative min-label propagation. Every round each node
takes the minimum label among itself and its neighbors; fixpoint in
O(max component diameter) rounds. Each round costs one shuffle (the
groupBy on node); lineage is truncated per round with
``localCheckpoint`` so the plan stays flat instead of growing
exponentially. Near-dup clusters are small and dense (diameter 2-4),
so propagation beats the more complex large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce and
Beyond") which wins only on high-diameter web graphs; at 100 TB the
per-round shuffle is keyed on node id and AQE handles the skewed
super-node partitions.

Reference parity: the reference has no graph layer; this is part of
the added LLM-pipeline surface (north-star dedup ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the minimum
    node id reachable from ``node`` (undirected). Isolated nodes never
    appear in ``edges`` and so are absent — union them in as
    singletons if needed.

    ``max_iter`` bounds MATERIALIZED iterations, each of which runs
    TWO min-label propagation rounds (so up to ``2 * max_iter``
    rounds of graph diameter are covered; the fixpoint itself is
    unchanged — labels only decrease). A caller using ``max_iter`` as
    a strict per-round work bound should halve it."""
    # Materialize the symmetric edge list ONCE: `sym` feeds every
    # propagation round, and without the checkpoint each round would
    # re-execute the whole upstream candidate pipeline (LSH expansion,
    # cosine verify, per-cluster matmuls...) — O(rounds) recomputes of
    # the most expensive stage in the dedup tree. Edges are tiny
    # relative to the corpus (post-verify), so the one materialization
    # is cheap.
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint(eager=True)
    # init = the first propagation round, fused: component(n) =
    # min(n, neighbors(n)) costs the same single shuffle a distinct
    # would, so the loop starts one round ahead
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__mn"))
        .select(
            "node",
            F.least(F.col("node"), F.col("__mn")).alias("component"),
        )
        .localCheckpoint(eager=True)
    )
    def _propagate(lbl: DataFrame) -> DataFrame:
        prop = sym.join(lbl, sym["a"] == lbl["node"]).select(
            F.col("b").alias("node"), "component"
        )
        return (
            lbl.union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )

    for _ in range(max_iter):
        # TWO propagation rounds per materialization: labels only ever
        # decrease, so the fixpoint (min reachable id) is identical —
        # but each eager checkpoint + convergence probe is a fixed
        # per-round cost (and at scale a full labels write), and near-
        # dup components have diameter 2-4, so halving the number of
        # materialized rounds halves most of the loop's job count.
        # Convergence: unchanged after two rounds implies unchanged
        # after one (monotonicity), so comparing against the labels
        # from before BOTH rounds detects the same fixpoint.
        # The changed flag rides the SAME job as the checkpoint (one
        # join against the previous labels inside the materialized
        # plan), so detection costs a limit-1 probe, not a second
        # full join+count job.
        new = (
            _propagate(_propagate(labels))
            .join(labels.withColumnRenamed("component", "__old"), "node")
            .select(
                "node",
                "component",
                (F.col("component") != F.col("__old")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        converged = new.filter(F.col("__changed")).isEmpty()
        labels = new.drop("__changed")
        if converged:
            break
    return labels


def component_survivors(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Drop every row whose id belongs to a component it does not
    lead (min id survives); rows absent from ``components`` are
    singletons and survive."""
    losers = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def component_survivors_by(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    priority,
) -> DataFrame:
    """Quality-weighted survivor policy: keep the row with the LARGEST
    ``priority`` per duplicate cluster (ties broken by min id) instead
    of the min id — the production corpus-dedup policy when cluster
    members differ in quality (keep the longest / cleanest / curated
    copy). Rows absent from ``components`` are singletons and survive.

    ONE left join of the post-closure component map (duplicates only
    — AQE broadcasts it when small; singletons label themselves via
    coalesce, so no second anti-join scan of the corpus) + one
    row_number window keyed by component. The window — rather than a
    max_by over (priority, -id) — keeps the id tie-break generic:
    unary minus on a string/hash id would cast (ANSI error) or
    reorder numerically instead of lexicographically."""
    from pyspark.sql.window import Window

    p = F.col(priority) if isinstance(priority, str) else priority
    member = components.select(
        F.col("node").alias(id_col), "component"
    )
    labeled = df.join(member, id_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    w = Window.partitionBy("component").orderBy(
        p.desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "component")
    )

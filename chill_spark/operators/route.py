"""Routing (P7/J2/A5): counter-group key -> target table.

The reference computes OM_GROUP once per file from filename/tag/
constant sources, looks it up in the HLD Tables sheet, and drops
unmatched files (Partrans.py:239-258). Spark-side the group key is a
column function (constant within a file), so per-file routing is a
per-row filter that Catalyst pushes down; unmatched groups simply
match no table's filter — same silent-skip semantics, surfaced via
``routed_counts`` for run metrics (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog.model import Catalog, TableSpec


def route(
    df: DataFrame, catalog: Catalog, om_group_col: str = "OM_GROUP"
) -> dict[str, DataFrame]:
    """Split one derived frame into per-target-table frames by counter
    group. Cache ``df`` first when routing to many tables — each entry
    is a filter over the same child plan."""
    out: dict[str, DataFrame] = {}
    for t in catalog.tables.values():
        out[t.name] = df.filter(F.col(om_group_col) == F.lit(t.counter_group))
    return out


def unmatched(df: DataFrame, catalog: Catalog, om_group_col: str = "OM_GROUP") -> DataFrame:
    """Rows whose group matches no table — the reference drops these
    silently (Partrans.py:248-252); we expose them for metrics."""
    groups = [t.counter_group for t in catalog.tables.values()]
    return df.filter(~F.col(om_group_col).isin(groups))


def union_routed(frames: list[DataFrame]) -> DataFrame:
    """A5: per-table accumulation across files = UNION ALL by name,
    tolerating schema drift between file batches (pd.concat semantics,
    Partrans.py:356-361)."""
    if not frames:
        raise ValueError("no frames to union")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out

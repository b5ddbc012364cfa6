"""Time-rollup aggregation (A1) — the granularity ladder.

The reference schedules external "TRAggr" jobs per ladder level
(HlxTools.py:658-725, levels at :697-702). Here each level is one
declarative hash aggregate: truncate DATETIME to the level, group by
(keys, truncated time), aggregate every counter. Catalyst plans
partial (map-side) + final aggregation; at 100 TB the shuffle is on
(keys, DATETIME) — the same key the base table is written with, so
successive ladder levels can derive from the *previous* level
(15M -> HR -> DY -> ...) shrinking data monotonically instead of
re-scanning the base each time (``build_ladder``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog.model import GRANULARITIES, TableSpec

_AGG_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def truncate_to(granularity: str, datetime_col: str = "DATETIME") -> Column:
    """DATETIME truncated to a ladder level. Calendar levels use
    date_trunc; sub-hour levels use fixed tumbling windows."""
    spec = GRANULARITIES[granularity]
    c = F.col(datetime_col)
    if "trunc" in spec:
        return F.date_trunc(spec["trunc"], c)
    return F.window(c, spec["interval"]).start


def rollup(
    df: DataFrame,
    keys: list[str],
    counters: list[str],
    granularity: str,
    agg_map: dict[str, str] | None = None,
    datetime_col: str = "DATETIME",
) -> DataFrame:
    """One ladder level: group by keys + truncated DATETIME, aggregate
    counters (PM counters are additive -> SUM by default; override
    per-column via agg_map, e.g. gauges -> 'avg')."""
    agg_map = agg_map or {}
    aggs = [
        _AGG_FNS[agg_map.get(c, "sum")](F.col(c)).alias(c) for c in counters
    ]
    return (
        df.groupBy(
            truncate_to(granularity, datetime_col).alias(datetime_col), *keys
        )
        .agg(*aggs)
        .select(datetime_col, *keys, *counters)
    )


def build_ladder(
    base_df: DataFrame,
    table: TableSpec,
    levels: list[str] | None = None,
    agg_map: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Materialize every ladder level above the base granularity.

    Each level rolls up from the previous one — valid for the default
    additive aggregates (sum/min/max/count re-aggregate losslessly;
    avg is rewritten as sum+count internally when requested).
    """
    agg_map = agg_map or {}
    if any(v == "avg" for v in agg_map.values()):
        # avg doesn't re-aggregate: fall back to from-base per level
        return {
            g: rollup(
                base_df, table.key_fields, [c.db_name for c in table.counters],
                g, agg_map,
            )
            for g in (levels or table.ladder_above_base())
        }
    counters = [c.db_name for c in table.counters]
    out: dict[str, DataFrame] = {}
    prev = base_df
    for g in levels or table.ladder_above_base():
        prev = rollup(prev, table.key_fields, counters, g, agg_map)
        out[g] = prev
    return out

"""Incremental granularity-ladder maintenance (streaming A1).

The reference schedules full "TRAggr" rollup jobs per level on a timer
(HlxTools.py:658-725) — at 100 TB a full re-aggregation per cycle is
untenable. Spark-native incremental repair: after each micro-batch,
only the ladder *windows touched by the batch* are recomputed, each by
a partition-pruned scan of the base fact table, and replaced with
dynamic partition overwrite (idempotent — replaying a micro-batch
rewrites the same windows to the same values).

Cost per batch = (touched windows) x (base periods per window), never
a full table scan. A batch touching one 15-minute period recomputes
one HR window (4 base partitions), one DY window (96), etc. — all
pruned scans (PartitionFilters on DT_PART via explicit period lists).

Recompute-from-base (not delta-merge) is deliberate: it needs no state
beyond the base table, repairs late/replayed data for free, and every
aggregate (incl. avg) stays valid.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.model import GRANULARITIES, TableSpec
from .rollup import rollup
from .writers import read_fact, write_fact

# Seconds per base granularity (fixed-interval levels only; a table's
# base is always sub-day in the reference's ladder, HlxTools.py:697-702).
_BASE_SECONDS = {"5M": 300, "15M": 900, "HH": 1800, "HR": 3600, "DY": 86400}


def truncate_py(dt: datetime, granularity: str) -> datetime:
    """Driver-side mirror of operators.rollup.truncate_to (UTC session):
    fixed intervals floor on the epoch grid (F.window origin), calendar
    levels mirror date_trunc (week -> Monday)."""
    spec = GRANULARITIES[granularity]
    if "interval" in spec:
        secs = _BASE_SECONDS[granularity]
        # naive datetimes are session-UTC; build epoch without tz math
        epoch = int((dt.replace(tzinfo=None) - datetime(1970, 1, 1)).total_seconds())
        return datetime(1970, 1, 1) + timedelta(seconds=(epoch // secs) * secs)
    t = spec["trunc"]
    if t == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    d = dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if t == "day":
        return d
    if t == "week":
        return d - timedelta(days=d.weekday())
    if t == "month":
        return d.replace(day=1)
    if t == "year":
        return d.replace(month=1, day=1)
    raise ValueError(f"unknown granularity {granularity}")


def window_end(start: datetime, granularity: str) -> datetime:
    spec = GRANULARITIES[granularity]
    if "interval" in spec:
        return start + timedelta(seconds=_BASE_SECONDS[granularity])
    t = spec["trunc"]
    if t == "hour":
        return start + timedelta(hours=1)
    if t == "day":
        return start + timedelta(days=1)
    if t == "week":
        return start + timedelta(days=7)
    if t == "month":
        y, m = (start.year + 1, 1) if start.month == 12 else (start.year, start.month + 1)
        return start.replace(year=y, month=m)
    if t == "year":
        return start.replace(year=start.year + 1)
    raise ValueError(f"unknown granularity {granularity}")


def base_periods(start: datetime, end: datetime, base_granularity: str) -> list[datetime]:
    """Base-granularity period starts covering [start, end) — the exact
    partition list for the pruned repair scan."""
    step = timedelta(seconds=_BASE_SECONDS[base_granularity])
    out, cur = [], start
    while cur < end:
        out.append(cur)
        cur += step
    return out


def maintain_ladder_increment(
    spark: SparkSession,
    base_path: str,
    out_root: str,
    table: TableSpec,
    batch_datetimes: list[datetime],
    levels: list[str] | None = None,
    agg_map: dict[str, str] | None = None,
) -> dict[str, list[datetime]]:
    """Repair every ladder level's windows touched by a micro-batch.

    For each level: touched windows = truncate(batch DATETIMEs); scan
    the base fact pruned to exactly the base periods under those
    windows; re-aggregate; dynamic-partition-overwrite ONLY those
    window partitions. Returns {level: [window starts]} repaired.
    """
    if not batch_datetimes:
        return {}
    counters = [c.db_name for c in table.counters]
    repaired: dict[str, list[datetime]] = {}
    for g in levels or table.ladder_above_base():
        windows = sorted({truncate_py(dt, g) for dt in batch_datetimes})
        periods: list[datetime] = []
        for w in windows:
            periods.extend(base_periods(w, window_end(w, g), table.base_granularity))
        src = read_fact(spark, base_path, datetimes=periods)
        lvl = rollup(src, table.key_fields, counters, g, agg_map)
        write_fact(lvl, f"{out_root}/{table.name}_{g}")
        repaired[g] = windows
    return repaired


def validate_ladder(
    spark: SparkSession,
    base_path: str,
    out_root: str,
    table: TableSpec,
    levels: list[str] | None = None,
    agg_map: dict[str, str] | None = None,
    tolerance: float = 1e-9,
) -> dict[str, int]:
    """Audit the materialized ladder: re-aggregate each level from the
    base table and count rows that disagree with what's stored
    (missing, extra, or value drift beyond ``tolerance``).

    The comparison is a full-outer join per level on (DATETIME, keys)
    — distributed, nothing collected but the per-level counters.
    Returns {level: bad_rows}; all-zero means the ladder is consistent
    (the reference only ever checks rollup *existence* via its
    scheduler; this checks the numbers)."""
    from pyspark.sql import functions as F

    counters = [c.db_name for c in table.counters]
    keys = ["DATETIME", *table.key_fields]
    base = read_fact(spark, base_path)
    out: dict[str, int] = {}
    for g in levels or table.ladder_above_base():
        want = rollup(base, table.key_fields, counters, g, agg_map)
        got = read_fact(spark, f"{out_root}/{table.name}_{g}")
        w = want.select(
            *keys, *[F.col(c).alias(f"__w_{c}") for c in counters]
        )
        gt = got.select(
            *keys, *[F.col(c).alias(f"__g_{c}") for c in counters]
        )
        j = w.join(gt, keys, "full_outer")
        mismatch = F.lit(False)
        for c in counters:
            a, b = F.col(f"__w_{c}"), F.col(f"__g_{c}")
            mismatch = mismatch | (
                a.isNull() != b.isNull()
            ) | (F.abs(a - b) > tolerance)
        out[g] = j.filter(mismatch).count()
    return out

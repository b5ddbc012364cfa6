"""As-of (point-in-time) join — for each left row, the most recent
right row with the same key and right_time <= left_time.

Not in the reference's surface (all its joins are equi, SURVEY §2.3);
provided as a first-class temporal operator because PM/training-data
pipelines need it (enrich an event with the dimension state that was
current at event time).

Scale shape: the naive form (equi-join on key + time filter + window
top-1) duplicates every left row by the number of matching right rows.
This implementation instead UNIONs the two tagged inputs and runs one
``last_value(struct, ignorenulls)`` window over (key, time) — a single
shuffle on the key, O(n log n) per partition sort, zero row
amplification. Skewed keys fall to AQE; no driver-side state. The
matched values travel as one struct, so they always come atomically
from a single right row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join.

    on          join key column name (same name both sides; alias first
                if they differ)
    left_time   event-time column of ``left``
    right_time  event-time column of ``right``
    value_cols  right columns carried to the output (default: all
                non-key, non-time)
    strict      True -> right_time <  left_time (exclusive);
                False -> right_time <= left_time (ties match). Among
                equal-(time) right rows the greatest value struct wins
                — deterministic.
    tolerance_seconds
                max staleness: a match older than left_time - tolerance
                yields NULLs instead (common market-data / dim-state
                semantics). Implemented as a post-window predicate on
                the matched row's time (carried in the struct) — the
                plan shape (one shuffle, no amplification) is unchanged.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]
    lcols = left.columns
    vstruct = F.struct(
        *[F.col(c) for c in value_cols],
        F.col(right_time).alias("__rt"),
    )
    null_vstruct = F.lit(None).cast(
        right.select(vstruct.alias("v")).schema["v"].dataType
    )

    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        vstruct.alias("__v"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        null_vstruct.alias("__v"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = tagged_r.unionByName(tagged_l)

    # Rights sort before lefts at equal time (<= semantics); with
    # strict=True lefts sort first, so an equal-time right is not yet
    # visible to that left row. Among equal-time rights the greatest
    # struct sorts last and wins.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), side_order, F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last(F.col("__v"), ignorenulls=True).over(w).alias("__m")
    )
    matched = F.col("__m")
    if tolerance_seconds is not None:
        # TIMESTAMP_NTZ has no direct long cast; go via session-TZ
        # timestamp (value-preserving under the UTC session default)
        def _secs(c):
            return c.cast("timestamp").cast("long")

        fresh = (
            _secs(F.col("__t")) - _secs(matched["__rt"])
        ) <= tolerance_seconds
        matched = F.when(fresh, matched)
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[matched[c].alias(c) for c in value_cols],
    )

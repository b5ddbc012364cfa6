"""Range (interval) join — left points matched to right intervals
``start <= point < end`` on an equal key.

Spark plans a raw inequality join as BroadcastNestedLoop/cartesian —
quadratic at scale. This operator bins time: the point side gets one
bin, the interval side explodes to every bin its range covers
(``sequence``), the join becomes an equi-join on (key, bin) with the
exact predicate as a post-filter. Bin width should be of the order of
the typical interval length: each interval then lands in O(1) bins and
the join stays a hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIN_COL = "__bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: str | None = None,
    bin_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """points ⋈ intervals on optional equal key ``on`` plus
    ``start <= point < end`` (timestamp columns).

    ``how`` supports 'inner' and 'left_semi'.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"range_join supports inner/left_semi, not {how!r}")
    bin_us = F.lit(bin_seconds * 1_000_000)

    def to_bin(us_col):  # floor division, valid for pre-1970 too
        return ((us_col - F.pmod(us_col, bin_us)) / bin_us).cast("long")

    def micros(c):  # NTZ-tolerant (session TZ is UTC per session.py)
        return F.unix_micros(F.col(c).cast("timestamp"))

    p_bin = to_bin(micros(point_col))
    s_bin = to_bin(micros(start_col))
    # end is exclusive (micro precision): a range ending exactly on a
    # bin edge doesn't reach into that bin
    e_bin = to_bin(micros(end_col) - F.lit(1))

    lhs = points.withColumn(BIN_COL, p_bin)
    rhs = intervals.withColumn(
        BIN_COL, F.explode(F.sequence(s_bin, F.greatest(e_bin, s_bin)))
    )
    keys = [BIN_COL] if on is None else [on, BIN_COL]
    cond = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    if how == "left_semi":
        rhs_needed = rhs.select(*keys, start_col, end_col)
        # semi must apply the range predicate inside the join
        joined = lhs.join(
            rhs_needed,
            [lhs[k] == rhs_needed[k] for k in keys]
            + [
                lhs[point_col] >= rhs_needed[start_col],
                lhs[point_col] < rhs_needed[end_col],
            ],
            "left_semi",
        )
        return joined.drop(BIN_COL)
    return lhs.join(rhs, keys, "inner").filter(cond).drop(BIN_COL)

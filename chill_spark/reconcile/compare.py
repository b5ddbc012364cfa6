"""Expected-vs-actual reconciliation (Layer B, HlxTools.py:763-936) —
distributed.

The reference's per-row/per-column Python loops become five
declarative comparisons, each collecting only a bounded result into
the report (the 100 TB constraint: anti-joins and diffs stay on
executors; the driver sees counts + capped samples):

- counts            row counts both sides (A4)
- schema_diff       declared vs actual column sets (driver-side set op)
- missing rows      left-anti joins both directions (J4/J5)
- value diff        inner join on keys + unpivoted per-counter
                    tolerant compare (J3; numeric tolerance =
                    equality of round(x,3), HlxTools.py:916-918)
- referential       fact keys - dim keys (J6)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SAMPLE = 1000  # max diff/missing rows collected per table


def missing_rows(expected: DataFrame, actual: DataFrame, keys: list[str]) -> DataFrame:
    """Rows present in ``expected`` whose key tuple is absent from
    ``actual`` (J4; swap args for J5)."""
    return expected.join(actual.select(*keys).distinct(), keys, "left_anti")


def referential_violations(
    fact: DataFrame, dim: DataFrame, keys: list[str]
) -> DataFrame:
    """Distinct fact keys not present in the dimension (J6,
    HlxTools.py:848-856). Dim side is small: broadcast."""
    return fact.select(*keys).distinct().join(
        F.broadcast(dim.select(*keys).distinct()), keys, "left_anti"
    )


def value_diff(
    expected: DataFrame,
    actual: DataFrame,
    keys: list[str],
    counters: list[str],
    round_scale: int = 3,
) -> DataFrame:
    """Per-key, per-counter tolerant diff (J3 + HlxTools.py:908-935).

    Numeric values differ when ``round(x,3) != round(y,3)`` (the
    reference's exact rule — round-then-compare, not abs-tolerance);
    non-numeric values compare as strings; a null on exactly one side
    is a diff. Output: one row per (keys, counter) mismatch with rd/db
    string values — unpivoted via an exploded struct array so the diff
    stays a single distributed pass regardless of counter count.
    """
    cols = [c for c in counters if c in expected.columns and c in actual.columns]
    e = expected.select(
        *keys, *[F.col(c).alias(f"__rd_{c}") for c in cols]
    )
    a = actual.select(*keys, *[F.col(c).alias(f"__db_{c}") for c in cols])
    j = e.join(a, keys, "inner")

    entries = []
    for c in cols:
        rd, db = F.col(f"__rd_{c}"), F.col(f"__db_{c}")
        rd_n, db_n = rd.cast("double"), db.cast("double")
        both_numeric = rd_n.isNotNull() & db_n.isNotNull()
        num_diff = F.round(rd_n, round_scale) != F.round(db_n, round_scale)
        str_diff = rd.cast("string") != db.cast("string")
        null_mismatch = rd.isNull() != db.isNull()
        is_diff = null_mismatch | F.when(both_numeric, num_diff).otherwise(
            F.coalesce(str_diff, F.lit(False))
        )
        entries.append(
            F.struct(
                F.lit(c).alias("counter"),
                rd.cast("string").alias("rd"),
                db.cast("string").alias("db"),
                is_diff.alias("is_diff"),
            )
        )
    exploded = j.select(*keys, F.explode(F.array(*entries)).alias("e"))
    return exploded.filter(F.col("e.is_diff")).select(
        *keys,
        F.col("e.counter").alias("counter"),
        F.col("e.rd").alias("rd"),
        F.col("e.db").alias("db"),
    )


@dataclass
class TableReport:
    """Per-table reconciliation result (HlxTools.py:785-799 shape)."""

    table: str
    rd_num_records: int = 0
    db_num_records: int = 0
    missing_oracle_records: list = field(default_factory=list)
    missing_raw_data_records: list = field(default_factory=list)
    diffs: list = field(default_factory=list)  # rows (keys..., counter, rd, db)
    missing_columns: list[str] = field(default_factory=list)
    missing_in_conf: list = field(default_factory=list)
    errors: list[str] = field(default_factory=list)

    @property
    def counts_match(self) -> bool:
        return self.rd_num_records == self.db_num_records

    @property
    def clean(self) -> bool:
        return (
            self.counts_match
            and not self.missing_oracle_records
            and not self.missing_raw_data_records
            and not self.diffs
            and not self.missing_columns
            and not self.missing_in_conf
        )


def compare_tables(
    expected: DataFrame,
    actual: DataFrame,
    table: str,
    keys: list[str],
    counters: list[str],
    dim: DataFrame | None = None,
    dim_keys: list[str] | None = None,
    datetime_col: str = "DATETIME",
    sample: int = DEFAULT_SAMPLE,
) -> TableReport:
    """Full per-table reconciliation -> bounded TableReport.

    ``keys`` are the declared entity keys; DATETIME is always appended
    for fact identity (HlxTools.py:862).
    """
    rep = TableReport(table=table)
    rep.rd_num_records = expected.count()
    rep.db_num_records = actual.count()

    declared = set(counters)
    rep.missing_columns = sorted(declared - set(actual.columns))
    usable = [c for c in counters if c not in rep.missing_columns]

    if dim is not None:
        dkeys = dim_keys or keys
        rep.missing_in_conf = [
            tuple(r) for r in referential_violations(actual, dim, dkeys).take(sample)
        ]

    full_keys = list(keys) + [datetime_col]
    missing_keys = [k for k in full_keys if k not in expected.columns or k not in actual.columns]
    if missing_keys:
        rep.errors.append(f"key columns missing: {missing_keys}")
        return rep

    rep.missing_oracle_records = [
        tuple(r)
        for r in missing_rows(expected, actual, full_keys)
        .select(*full_keys)
        .take(sample)
    ]
    rep.missing_raw_data_records = [
        tuple(r)
        for r in missing_rows(actual, expected, full_keys)
        .select(*full_keys)
        .take(sample)
    ]
    rep.diffs = [
        tuple(r)
        for r in value_diff(expected, actual, full_keys, usable).take(sample)
    ]
    return rep

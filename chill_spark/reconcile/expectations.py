"""Declarative data expectations — constraint checking in one pass.

The reconciliation layer (compare.py) answers "does actual match
expected"; expectations answer "is this table internally sane" —
not-null, uniqueness, value ranges, set membership, referential
integrity — the checks a loader would run before publishing a
partition. (deequ-style, sized for the framework: the reference's
closest analog is its referential check, HlxTools.py:848-856.)

Scale shape: every row-local expectation (not_null / in_range / isin)
compiles to ONE conditional-count aggregate — the whole battery is a
single scan + scalar agg regardless of how many expectations are
declared. Uniqueness adds one count-distinct (same scan via grouping
the agg); referential integrity adds one broadcast anti-join count per
dimension. Nothing collects more than counters to the driver.

Results feed the JUnit layer as an "Expectations" suite, so CI treats
constraint violations like any reconciliation failure.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..report.junit import TestCase, TestReport, TestSuite


@dataclass
class Expectation:
    """One named constraint. ``kind`` in {not_null, unique, in_range,
    isin, custom, ref}; row-local kinds carry a violation predicate."""

    name: str
    kind: str
    columns: list[str] = field(default_factory=list)
    predicate: Column | None = None  # violation condition (row-local)
    dim: DataFrame | None = None  # ref: dimension frame
    dim_keys: list[str] | None = None  # ref: dim-side key names


def not_null(*cols: str) -> Expectation:
    viol = None
    for c in cols:
        v = F.col(c).isNull()
        viol = v if viol is None else (viol | v)
    return Expectation(f"not_null({','.join(cols)})", "not_null", list(cols), viol)


def in_range(col: str, lo=None, hi=None) -> Expectation:
    v = F.lit(False)
    if lo is not None:
        v = v | (F.col(col) < lo)
    if hi is not None:
        v = v | (F.col(col) > hi)
    # NULLs are not range violations (declare not_null separately)
    return Expectation(f"in_range({col},{lo},{hi})", "in_range", [col], v & F.col(col).isNotNull())


def isin(col: str, allowed: list) -> Expectation:
    return Expectation(
        f"isin({col})", "isin", [col],
        ~F.col(col).isin(allowed) & F.col(col).isNotNull(),
    )


def custom(name: str, violation: Column) -> Expectation:
    return Expectation(name, "custom", [], violation)


def unique(*cols: str) -> Expectation:
    return Expectation(f"unique({','.join(cols)})", "unique", list(cols))


def ref_integrity(
    cols: list[str], dim: DataFrame, dim_keys: list[str] | None = None
) -> Expectation:
    return Expectation(
        f"ref({','.join(cols)})", "ref", cols, dim=dim, dim_keys=dim_keys
    )


@dataclass
class ExpectationResult:
    name: str
    violations: int
    total: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def check_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> list[ExpectationResult]:
    """Evaluate the battery. One scan + scalar agg covers every
    row-local expectation and all uniqueness checks (count distinct is
    computed in the same aggregate); each ref check is one broadcast
    anti-join count against its dimension."""
    row_local = [e for e in expectations if e.predicate is not None]
    uniques = [e for e in expectations if e.kind == "unique"]
    refs = [e for e in expectations if e.kind == "ref"]

    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, e in enumerate(row_local):
        aggs.append(F.sum(F.when(e.predicate, 1).otherwise(0)).alias(f"__v{i}"))
    for i, e in enumerate(uniques):
        aggs.append(
            F.count_distinct(*[F.col(c) for c in e.columns]).alias(f"__u{i}")
        )
        # count(DISTINCT a,b) skips rows with any NULL key — count the
        # comparable rows with the same rule so the subtraction is fair
        nn = F.lit(True)
        for c in e.columns:
            nn = nn & F.col(c).isNotNull()
        aggs.append(
            F.sum(F.when(nn, 1).otherwise(0)).alias(f"__un{i}")
        )
    row = df.agg(*aggs).first()
    total = row["__total"]

    out: list[ExpectationResult] = []
    for i, e in enumerate(row_local):
        out.append(ExpectationResult(e.name, int(row[f"__v{i}"] or 0), total))
    for i, e in enumerate(uniques):
        # duplicates = rows-with-key - distinct keys
        out.append(
            ExpectationResult(
                e.name, int(row[f"__un{i}"] or 0) - int(row[f"__u{i}"] or 0), total
            )
        )
    for e in refs:
        dim_keys = e.dim_keys or e.columns
        dim = e.dim.select(
            *[F.col(k).alias(c) for k, c in zip(dim_keys, e.columns)]
        ).dropDuplicates()
        nn = F.lit(True)
        for c in e.columns:
            nn = nn & F.col(c).isNotNull()
        # NULL keys are not_null's concern, not referential violations
        n = (
            df.select(*e.columns)
            .filter(nn)
            .join(F.broadcast(dim), e.columns, "left_anti")
            .count()
        )
        out.append(ExpectationResult(e.name, n, total))
    return out


def expectations_report(
    table: str, results: list[ExpectationResult]
) -> TestReport:
    """Results as a JUnit 'Expectations' suite (merge into the
    reconciliation report for one CI artifact)."""
    suite = TestSuite(name="Expectations")
    for r in results:
        case = TestCase(name=f"{table}: {r.name}", classname=table)
        if not r.passed:
            case.failure_message = (
                f"{r.violations} of {r.total} rows violate {r.name}"
            )
        suite.add(case)
    rep = TestReport()
    rep.suites.append(suite)
    return rep

"""The five reconciliation JUnit suites (TestReport.py:26-172).

Each suite turns one dimension of a TableReport into testcases:

1. DBLoader Errors            — quarantined/corrupt-record findings
2. Number of records comparison — expected count == actual count
3. Missing Data               — anti-joins empty both ways + referential
4. Data Difference            — per-key per-counter diffs empty
5. Missing Columns            — all declared counters present
"""

from __future__ import annotations

from ..reconcile.compare import TableReport
from .junit import TestCase, TestReport


def build_report(tables: list[TableReport], loader_errors: dict[str, list[str]] | None = None) -> TestReport:
    rep = TestReport()
    loader_errors = loader_errors or {}

    s1 = rep.suite("DBLoader Errors")
    for t in tables:
        errs = loader_errors.get(t.table, [])
        s1.add(
            TestCase(
                name=t.table,
                classname="dbloader",
                failure_message="\n".join(errs) if errs else None,
            )
        )

    s2 = rep.suite("Number of records comparison")
    for t in tables:
        msg = None
        if not t.counts_match:
            msg = f"expected {t.rd_num_records} records, actual {t.db_num_records}"
        s2.add(TestCase(name=t.table, classname="counts", failure_message=msg))

    s3 = rep.suite("Missing Data")
    for t in tables:
        parts = []
        if t.missing_oracle_records:
            parts.append(
                f"{len(t.missing_oracle_records)} expected rows missing from actual: "
                f"{t.missing_oracle_records[:10]}"
            )
        if t.missing_raw_data_records:
            parts.append(
                f"{len(t.missing_raw_data_records)} actual rows missing from expected: "
                f"{t.missing_raw_data_records[:10]}"
            )
        if t.missing_in_conf:
            parts.append(
                f"{len(t.missing_in_conf)} fact keys missing from config dim: "
                f"{t.missing_in_conf[:10]}"
            )
        parts.extend(t.errors)
        s3.add(
            TestCase(
                name=t.table,
                classname="missing_data",
                failure_message="\n".join(parts) if parts else None,
            )
        )

    s4 = rep.suite("Data Difference")
    for t in tables:
        msg = None
        if t.diffs:
            msg = f"{len(t.diffs)} value differences (sample): {t.diffs[:10]}"
        s4.add(TestCase(name=t.table, classname="data_diff", failure_message=msg))

    s5 = rep.suite("Missing Columns")
    for t in tables:
        msg = None
        if t.missing_columns:
            msg = f"declared counters absent from actual: {t.missing_columns}"
        s5.add(TestCase(name=t.table, classname="missing_columns", failure_message=msg))

    return rep

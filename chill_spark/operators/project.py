"""Missing-column-tolerant projection (P1, Partrans.py:263-303).

For each declared counter: take raw column ``raw_name``, rename to
``db_name``; silently skip declarations whose raw column is absent
(Partrans.py:295-303) — but surface the skips in the result so a run
report can show them (SURVEY §7.4 "silent-skip semantics").

One single ``select`` — Catalyst prunes the scan to exactly the
referenced columns (ReadSchema), no per-column loop at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog.model import TableSpec


@dataclass
class ProjectResult:
    df: DataFrame
    skipped: list[str] = field(default_factory=list)  # raw names not present


def project_to_table(
    df: DataFrame,
    table: TableSpec,
    extra_cols: list[str | Column] | None = None,
    cast: bool = True,
) -> ProjectResult:
    """Project/rename raw columns to the table's declared stored columns."""
    present = set(df.columns)
    cols: list[Column] = list(extra_cols or [])
    skipped: list[str] = []
    for spec in table.stored_columns:
        if spec.raw_name is None:
            continue  # derived later by the DSL
        if spec.raw_name not in present:
            skipped.append(spec.raw_name)
            continue
        c = F.col(spec.raw_name)
        if cast:
            c = c.cast(spec.spark_type)
        cols.append(c.alias(spec.db_name))
    return ProjectResult(df=df.select(*cols), skipped=skipped)


def conform_to_schema(df: DataFrame, table: TableSpec) -> DataFrame:
    """Align a DataFrame to the table's declared schema: add missing
    stored columns as typed nulls, order columns, cast types. Used
    before union/write so per-file frames line up (A5 union)."""
    out_cols: list[Column] = []
    if "DATETIME" in df.columns:
        out_cols.append(F.col("DATETIME").cast("timestamp"))
    for spec in table.stored_columns:
        if spec.db_name in df.columns:
            out_cols.append(F.col(spec.db_name).cast(spec.spark_type))
        else:
            out_cols.append(F.lit(None).cast(spec.spark_type).alias(spec.db_name))
    return df.select(*out_cols)

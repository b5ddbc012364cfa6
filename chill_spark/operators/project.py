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


def with_kpis(df: DataFrame, table: TableSpec) -> DataFrame:
    """Recompute KPI (formula) columns at query time.

    The reference excludes ``TYPE=='KPI'`` rows from storage
    (Partrans.py:269-271) — formulas are evaluated by the PM tool when
    queried. Here each KPI formula is a DSL template over the table's
    stored column names, tier-1-compiled to a native Column expression
    (no Python at runtime); division-by-zero and bad casts yield null
    (ANSI-safe try semantics), matching "no value" rather than an
    error at query time.
    """
    import re

    from ..dsl.compiler import UnsupportedTemplate, compile_fallback, compile_template

    out = df
    for spec in table.kpis:
        if not spec.formula:
            continue
        bindings = {
            c.db_name: (F.col(c.db_name), "float" if c.dtype == "double" else "str")
            for c in table.stored_columns
        }
        try:
            col = compile_template(spec.formula, bindings)
        except UnsupportedTemplate:
            # tier-3: rewrite column names to argN tokens, eval per row
            cols = sorted(bindings, key=len, reverse=True)
            expr, inputs = spec.formula, []
            for c in cols:
                if re.search(rf"\b{re.escape(c)}\b", expr):
                    inputs.append(c)
                    expr = re.sub(rf"\b{re.escape(c)}\b", f"arg{len(inputs)}", expr)
            # reference templates are stringly-typed: coerce args back
            expr = re.sub(r"\barg(\d+)\b", r"float(arg\1)", expr)
            col = compile_fallback(expr, inputs, out_type="double")
        out = out.withColumn(spec.db_name, col.cast(spec.spark_type))
    return out

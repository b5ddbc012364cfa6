"""Field-derivation operator: apply ordered FieldSpecs to a DataFrame.

The Spark-native replacement for the reference's per-row eval loop
(Partrans.py:304-351). Scalar sources (constant/filename/tag) compile
to column functions — the reference's "compute once per file and
broadcast to all rows" (Partrans.py:324-336) comes free because
``input_file_name()``/tag columns are per-row constants within a file.
Row sources (column/lookup) compile tier-1 native, tier-2 join, or
tier-3 pandas-UDF fallback. Later fields overwrite earlier same-named
columns (ALL-then-table merge order, Partrans.py:306-319).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config.model import FieldSpec
from ..dsl import (
    UnsupportedTemplate,
    arg_bindings,
    compile_fallback,
    compile_template,
    parse_lookup_template,
    apply_lookup,
)


@dataclass
class DeriveResult:
    df: DataFrame
    tiers: dict[str, int] = field(default_factory=dict)  # field -> tier used
    errors: list[str] = field(default_factory=list)  # compile-time failures


def basename_col(path_col: Column | None = None) -> Column:
    """File basename — the `arg1` binding of `filename` sources
    (Partrans.py:145-149)."""
    p = path_col if path_col is not None else F.input_file_name()
    return F.element_at(F.split(p, "/"), -1)


def apply_fields(
    df: DataFrame,
    fields: list[FieldSpec],
    views: dict[str, DataFrame] | None = None,
    *,
    filename_col: Column | None = None,
    tag_cols: dict[str, Column] | None = None,
    allow_fallback: bool = True,
) -> DeriveResult:
    """Apply each FieldSpec in declaration order (last-wins)."""
    views = views or {}
    tag_cols = tag_cols or {}
    res = DeriveResult(df=df)

    for f in fields:
        try:
            if f.source == "constant":
                res.df = res.df.withColumn(f.name, F.lit(f.value))
                res.tiers[f.name] = 1
            elif f.source == "filename":
                base = basename_col(filename_col)
                if f.function:
                    col = compile_template(f.function, {"arg1": (base, "str")})
                else:
                    col = base
                res.df = res.df.withColumn(f.name, col)
                res.tiers[f.name] = 1
            elif f.source == "tag":
                if f.tag not in tag_cols:
                    raise UnsupportedTemplate(f"no tag column for {f.tag!r}")
                bindings = {"tag": (tag_cols[f.tag], "str")}
                col = (
                    compile_template(f.function, bindings)
                    if f.function
                    else tag_cols[f.tag]
                )
                res.df = res.df.withColumn(f.name, col)
                res.tiers[f.name] = 1
            elif f.source == "column":
                try:
                    col = compile_template(f.function, arg_bindings(f.inputs))
                    res.tiers[f.name] = 1
                except UnsupportedTemplate:
                    if not allow_fallback:
                        raise
                    col = compile_fallback(f.function, f.inputs)
                    res.tiers[f.name] = 3
                res.df = res.df.withColumn(f.name, col)
            elif f.source == "lookup":
                plan = parse_lookup_template(f.function)
                if f.view not in views:
                    raise UnsupportedTemplate(f"unknown view {f.view!r}")
                res.df = apply_lookup(
                    res.df, plan, views[f.view], f.name, f.inputs, f.default
                )
                res.tiers[f.name] = 2
            else:  # pragma: no cover - FieldSpec validates sources
                raise UnsupportedTemplate(f"source {f.source!r}")
        except UnsupportedTemplate as e:
            # reference logs + continues with None (Partrans.py:203-208)
            res.errors.append(f"{f.name}: {e}")
            res.df = res.df.withColumn(f.name, F.lit(None).cast("string"))
    return res

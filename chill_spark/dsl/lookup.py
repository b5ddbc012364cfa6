"""Tier-2 lookup compiler: pandas probe idioms -> broadcast joins.

The reference's ``lookup`` source evaluates, per row, a template that
boolean-indexes a cached view DataFrame and takes the first match,
returning ``default`` on any error (Partrans.py:174-201). At scale a
per-row probe is a join: we parse the idiom

    view[view['KEY'] == arg1]['VALUE'].values[0]
    view[(view['K1'] == arg1) & (view['K2'] == arg2)]['VALUE'].values[0]
    ... also .iloc[0] in place of .values[0]

into a LookupPlan and execute it as a **broadcast LEFT equi-join** +
``coalesce(default)`` — the dim side is small by construction (it was
an in-memory pandas frame in the reference).
"""

from __future__ import annotations

import ast
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .compiler import UnsupportedTemplate, _Tier1WithSplit, Typed, arg_bindings


@dataclass
class LookupPlan:
    keys: list[tuple[str, ast.expr]]  # (dim column, probe expression AST)
    value_col: str


def parse_lookup_template(template: str) -> LookupPlan:
    """Recognize the boolean-indexing idiom; raise UnsupportedTemplate
    for anything else (caller may use tier 3 against a collected dict
    only in tests — production lookups must be joins)."""
    tree = ast.parse(template, mode="eval").body

    # strip trailing .values[0] / .iloc[0]
    if (
        isinstance(tree, ast.Subscript)
        and isinstance(tree.slice, ast.Constant)
        and tree.slice.value == 0
        and isinstance(tree.value, ast.Attribute)
        and tree.value.attr in ("values", "iloc")
    ):
        tree = tree.value.value
    else:
        raise UnsupportedTemplate("lookup must end with .values[0] or .iloc[0]")

    # value selection: <inner>['VALUE']
    if not (
        isinstance(tree, ast.Subscript)
        and isinstance(tree.slice, ast.Constant)
        and isinstance(tree.slice.value, str)
    ):
        raise UnsupportedTemplate("lookup value column selection")
    value_col = tree.slice.value
    inner = tree.value

    # boolean filter: view[<cond>]
    if not (
        isinstance(inner, ast.Subscript)
        and isinstance(inner.value, ast.Name)
        and inner.value.id == "view"
    ):
        raise UnsupportedTemplate("lookup filter form")
    cond = inner.slice

    keys: list[tuple[str, ast.expr]] = []

    def walk(c: ast.expr):
        if isinstance(c, ast.BinOp) and isinstance(c.op, ast.BitAnd):
            walk(c.left)
            walk(c.right)
            return
        if (
            isinstance(c, ast.Compare)
            and len(c.ops) == 1
            and isinstance(c.ops[0], ast.Eq)
        ):
            lhs, rhs = c.left, c.comparators[0]
            # view['K'] == <expr>  (either side)
            for a, b in ((lhs, rhs), (rhs, lhs)):
                if (
                    isinstance(a, ast.Subscript)
                    and isinstance(a.value, ast.Name)
                    and a.value.id == "view"
                    and isinstance(a.slice, ast.Constant)
                    and isinstance(a.slice.value, str)
                ):
                    keys.append((a.slice.value, b))
                    return
        raise UnsupportedTemplate("lookup condition form")

    # parenthesized conjunctions parse as nested BitAnd BinOps
    walk(cond)
    if not keys:
        raise UnsupportedTemplate("no lookup keys")
    return LookupPlan(keys=keys, value_col=value_col)


def apply_lookup(
    df: DataFrame,
    plan: LookupPlan,
    view_df: DataFrame,
    out_name: str,
    inputs: list[str],
    default: str | None = None,
) -> DataFrame:
    """Execute a LookupPlan as broadcast-left-join + coalesce(default).

    Key comparison is string-typed on both sides: the reference
    substitutes str()-coerced quoted args into the template
    (Partrans.py:167-171), so probes are strings.
    """
    bindings = {k: Typed(c, t) for k, (c, t) in arg_bindings(inputs).items()}
    tier1 = _Tier1WithSplit(bindings)

    probe_cols: list[Column] = []
    for i, (_, probe_ast) in enumerate(plan.keys):
        probe_cols.append(tier1.visit(probe_ast).col.cast("string"))

    pfx = f"__lk_{out_name}__"
    dim = view_df.select(
        *[F.col(k).cast("string").alias(f"{pfx}{k}") for k, _ in plan.keys],
        F.col(plan.value_col).alias(f"{pfx}val"),
    ).dropDuplicates([f"{pfx}{k}" for k, _ in plan.keys])

    cond = None
    for (k, _), probe in zip(plan.keys, probe_cols):
        c = F.col(f"{pfx}{k}").eqNullSafe(probe)
        cond = c if cond is None else (cond & c)

    joined = df.join(F.broadcast(dim), cond, "left")
    val = F.col(f"{pfx}val")
    if default is not None:
        val = F.coalesce(val, F.lit(default))
    return joined.withColumn(out_name, val).drop(
        *[f"{pfx}{k}" for k, _ in plan.keys], f"{pfx}val"
    )

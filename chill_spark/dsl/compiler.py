"""DSL expression compiler: config templates -> Spark Columns.

The reference evaluates field-derivation templates per row with raw
``eval`` after string-substituting ``argN`` tokens with the (str-coerced,
quoted) cell values (Partrans.py:142-208). This compiler reproduces the
*results* Spark-first:

- **Tier 1 (native):** parse the template with ``ast`` and translate a
  supported Python subset (slicing, concat, arithmetic, comparisons,
  str methods, int/float/str casts, datetime.strptime/strftime,
  conditional expressions) into built-in ``pyspark.sql.functions``
  Columns — JVM-side, whole-stage-codegen friendly, zero Python in the
  hot path.
- **Tier 2 (lookup):** templates probing a cached view DataFrame
  (pandas boolean-indexing idiom, Partrans.py:174-201) become a
  broadcast LEFT join + ``coalesce(default)`` — see lookup.py.
- **Tier 3 (fallback):** a sandboxed Arrow-batched pandas UDF that
  reproduces the reference's string-substitution + eval semantics
  bit-for-bit (str() coercion of args, Partrans.py:167-171) for
  templates tier 1 can't prove equivalent. No raw builtins beyond a
  whitelist — the reference's unrestricted eval is not replicated.

Because the reference substitutes ``str(value)`` for every argN
(Partrans.py:167-171), args are *strings* at eval time; tier 1 models
this by giving every argN static type 'str' and requiring templates to
cast (``int(arg1)``) before arithmetic — exactly the contract templates
in the wild already follow.
"""

from __future__ import annotations

import ast
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# strptime/strftime <-> Spark datetime pattern conversion
# ---------------------------------------------------------------------------

_STRPTIME_TO_SPARK = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss", "%j": "DDD",
    "%b": "MMM", "%B": "MMMM", "%p": "a", "%I": "hh",
    "%f": "SSSSSS", "%%": "'%'",
}


def strptime_to_spark(fmt: str) -> str:
    """Convert a Python strptime format to a Spark datetime pattern."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok not in _STRPTIME_TO_SPARK:
                raise UnsupportedTemplate(f"strptime token {tok!r}")
            out.append(_STRPTIME_TO_SPARK[tok])
            i += 2
        else:
            c = fmt[i]
            # literal alphabetic chars must be quoted in Spark patterns
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


class UnsupportedTemplate(Exception):
    """Raised when tier 1 can't translate a template; caller falls back."""


# ---------------------------------------------------------------------------
# Tier 1: typed AST -> Column translation
# ---------------------------------------------------------------------------

@dataclass
class Typed:
    col: Column
    t: str  # 'str' | 'int' | 'float' | 'bool' | 'timestamp' | 'null'

    @property
    def is_num(self) -> bool:
        return self.t in ("int", "float")


def _num_t(a: str, b: str) -> str:
    return "float" if "float" in (a, b) else "int"


class _Tier1(ast.NodeVisitor):
    """Translate an expression AST to a typed Column.

    ``bindings`` maps template names (arg1..argN, tag, basename) to
    (Column, static type). Everything unrecognized raises
    UnsupportedTemplate so the caller can fall back to tier 3.
    """

    def __init__(self, bindings: dict[str, Typed]):
        self.bindings = bindings

    def visit(self, node):  # typed dispatch
        meth = getattr(self, "v_" + type(node).__name__, None)
        if meth is None:
            raise UnsupportedTemplate(f"AST node {type(node).__name__}")
        return meth(node)

    # -- leaves --

    def v_Expression(self, n: ast.Expression) -> Typed:
        return self.visit(n.body)

    def v_Constant(self, n: ast.Constant) -> Typed:
        v = n.value
        if v is None:
            return Typed(F.lit(None), "null")
        if isinstance(v, bool):
            return Typed(F.lit(v), "bool")
        if isinstance(v, int):
            return Typed(F.lit(v), "int")
        if isinstance(v, float):
            return Typed(F.lit(v), "float")
        if isinstance(v, str):
            return Typed(F.lit(v), "str")
        raise UnsupportedTemplate(f"constant {v!r}")

    def v_Name(self, n: ast.Name) -> Typed:
        if n.id in self.bindings:
            return self.bindings[n.id]
        raise UnsupportedTemplate(f"unbound name {n.id!r}")

    # -- operators --

    def v_BinOp(self, n: ast.BinOp) -> Typed:
        # str % formatting intercepts before the generic visit: a tuple
        # rhs ('%s-%s' % (a, b)) has no standalone Column form
        if (
            isinstance(n.op, ast.Mod)
            and isinstance(n.left, ast.Constant)
            and isinstance(n.left.value, str)
        ):
            return self._format_str(n)
        lhs, rhs = self.visit(n.left), self.visit(n.right)
        op = type(n.op).__name__
        if op == "Add":
            if lhs.t == "str" and rhs.t == "str":
                return Typed(F.concat(lhs.col, rhs.col), "str")
            if lhs.is_num and rhs.is_num:
                return Typed(lhs.col + rhs.col, _num_t(lhs.t, rhs.t))
            raise UnsupportedTemplate(f"+ on {lhs.t}/{rhs.t}")
        if op == "Mult" and lhs.is_num and rhs.is_num:
            return Typed(lhs.col * rhs.col, _num_t(lhs.t, rhs.t))
        if op == "Sub" and lhs.is_num and rhs.is_num:
            return Typed(lhs.col - rhs.col, _num_t(lhs.t, rhs.t))
        if op == "Div" and lhs.is_num and rhs.is_num:
            # Python 3 true division -> double. try_divide: /0 raises
            # in Python, which the reference catches into None
            # (Partrans.py:203-208) — null matches, and it keeps the
            # expression ANSI-safe (Spark 4 default).
            return Typed(
                F.try_divide(lhs.col.cast("double"), rhs.col.cast("double")),
                "float",
            )
        if op == "FloorDiv" and lhs.is_num and rhs.is_num:
            t = _num_t(lhs.t, rhs.t)
            out = F.floor(
                F.try_divide(lhs.col.cast("double"), rhs.col.cast("double"))
            )
            return Typed(out.cast("double") if t == "float" else out, t)
        if op == "Mod" and lhs.is_num and rhs.is_num:
            # Python mod has sign of divisor; Spark pmod covers the
            # common non-negative case. Negative divisors -> tier 3.
            return Typed(F.pmod(lhs.col, rhs.col), _num_t(lhs.t, rhs.t))
        raise UnsupportedTemplate(f"binop {op} on {lhs.t}/{rhs.t}")

    def _format_str(self, n: ast.BinOp) -> Typed:
        """'%03d' % x / '%s-%s' % (a, b) -> format_string. Only the
        Formatter-compatible subset (%s %d %i %f with flags/width/
        precision) and a CONSTANT format compile; anything else falls
        to tier 3."""
        import re as _re

        fmt = n.left.value
        specs = _re.findall(r"%[-+0 #]*\d*(?:\.\d+)?[sdif%]", fmt)
        if _re.sub(r"%[-+0 #]*\d*(?:\.\d+)?[sdif%]", "", fmt).count("%"):
            raise UnsupportedTemplate("unsupported % spec")
        vals = (
            [self.visit(e) for e in n.right.elts]
            if isinstance(n.right, ast.Tuple)
            else [self.visit(n.right)]
        )
        if len([s for s in specs if s != "%%"]) != len(vals):
            raise UnsupportedTemplate("% arity")
        # %i -> %d only inside matched conversion specs: a plain
        # str.replace would also rewrite the escaped literal '%%i'
        # (which renders as '%i', not a conversion) into '%%d'.
        jfmt = _re.sub(
            r"%[-+0 #]*\d*(?:\.\d+)?[sdif%]",
            lambda m: m.group(0)[:-1] + "d" if m.group(0).endswith("i") else m.group(0),
            fmt,
        )
        return Typed(F.format_string(jfmt, *[v.col for v in vals]), "str")

    def v_UnaryOp(self, n: ast.UnaryOp) -> Typed:
        val = self.visit(n.operand)
        if isinstance(n.op, ast.USub) and val.is_num:
            return Typed(-val.col, val.t)
        if isinstance(n.op, ast.Not):
            return Typed(~val.col.cast("boolean"), "bool")
        raise UnsupportedTemplate("unary op")

    _CMP = {
        "Eq": lambda a, b: a == b, "NotEq": lambda a, b: a != b,
        "Lt": lambda a, b: a < b, "LtE": lambda a, b: a <= b,
        "Gt": lambda a, b: a > b, "GtE": lambda a, b: a >= b,
    }

    def v_Compare(self, n: ast.Compare) -> Typed:
        if len(n.ops) != 1:
            raise UnsupportedTemplate("chained comparison")
        op = type(n.ops[0]).__name__
        lhs = self.visit(n.left)
        rhs = self.visit(n.comparators[0])
        if op in self._CMP:
            return Typed(self._CMP[op](lhs.col, rhs.col), "bool")
        if op == "In" and isinstance(n.comparators[0], (ast.List, ast.Tuple)):
            items = [self.visit(e).col for e in n.comparators[0].elts]
            return Typed(lhs.col.isin(*items), "bool")
        if op in ("In", "NotIn") and lhs.t == "str" and rhs.t == "str":
            # 'x' in s -> substring containment
            c = F.contains(rhs.col, lhs.col)
            return Typed(~c if op == "NotIn" else c, "bool")
        raise UnsupportedTemplate(f"compare {op}")

    def v_List(self, n: ast.List) -> Typed:
        raise UnsupportedTemplate("bare list")

    def v_BoolOp(self, n: ast.BoolOp) -> Typed:
        cols = [self.visit(v).col.cast("boolean") for v in n.values]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if isinstance(n.op, ast.And) else (out | c)
        return Typed(out, "bool")

    def v_IfExp(self, n: ast.IfExp) -> Typed:
        cond = self.visit(n.test)
        body, orelse = self.visit(n.body), self.visit(n.orelse)
        t = body.t if body.t == orelse.t else (
            _num_t(body.t, orelse.t) if body.is_num and orelse.is_num else None
        )
        if t is None and "null" in (body.t, orelse.t):
            t = body.t if orelse.t == "null" else orelse.t
        if t is None:
            raise UnsupportedTemplate(f"ifexp branch types {body.t}/{orelse.t}")
        return Typed(
            F.when(cond.col.cast("boolean"), body.col).otherwise(orelse.col), t
        )

    # -- slicing: the workhorse of filename/tag parsing --

    def v_Subscript(self, n: ast.Subscript) -> Typed:
        base = self.visit(n.value)
        if base.t != "str":
            raise UnsupportedTemplate(f"subscript on {base.t}")
        if isinstance(n.slice, ast.Slice):
            if n.slice.step is not None:
                raise UnsupportedTemplate("slice step")
            lo = self._static_int(n.slice.lower)
            hi = self._static_int(n.slice.upper)
            return Typed(_slice_str(base.col, lo, hi), "str")
        idx = self._static_int(n.slice)
        if idx is None:
            raise UnsupportedTemplate("dynamic index")
        return Typed(_slice_str(base.col, idx, None if idx == -1 else idx + 1), "str")

    def _static_int(self, node) -> int | None:
        if node is None:
            return None
        if isinstance(node, ast.Constant) and isinstance(node.value, int):
            return node.value
        if (
            isinstance(node, ast.UnaryOp)
            and isinstance(node.op, ast.USub)
            and isinstance(node.operand, ast.Constant)
            and isinstance(node.operand.value, int)
        ):
            return -node.operand.value
        raise UnsupportedTemplate("non-literal slice bound")

    # -- calls: casts, str methods, datetime --

    def v_Call(self, n: ast.Call) -> Typed:
        if n.keywords:
            raise UnsupportedTemplate("keyword args")
        # free functions
        if isinstance(n.func, ast.Name):
            fn = n.func.id
            args = [self.visit(a) for a in n.args]
            if fn == "int" and len(args) == 1:
                # int('12') / int(12.9) -> truncation toward zero for
                # doubles matches Spark's double->long cast; string
                # floats raise in Python, so templates only pass int-strings.
                src = args[0]
                c = src.col.cast("long")
                return Typed(c, "int")
            if fn == "float" and len(args) == 1:
                return Typed(args[0].col.cast("double"), "float")
            if fn == "str" and len(args) == 1:
                return Typed(_py_str(args[0]), "str")
            if fn == "round" and len(args) in (1, 2):
                scale = 0
                if len(args) == 2:
                    if not isinstance(n.args[1], ast.Constant):
                        raise UnsupportedTemplate("dynamic round scale")
                    scale = n.args[1].value
                # Python banker's rounding vs Spark HALF_UP: use bround
                # (HALF_EVEN) to match Python semantics.
                t = args[0].t if len(args) == 2 else "int"
                out = F.bround(args[0].col, scale)
                return Typed(out.cast("long") if len(args) == 1 else out, t)
            if fn == "abs" and len(args) == 1:
                return Typed(F.abs(args[0].col), args[0].t)
            if fn == "len" and len(args) == 1 and args[0].t == "str":
                return Typed(F.length(args[0].col), "int")
            if fn in ("min", "max") and len(args) >= 2:
                f = F.least if fn == "min" else F.greatest
                t = args[0].t
                return Typed(f(*[a.col for a in args]), t)
            raise UnsupportedTemplate(f"function {fn}")
        # method calls
        if isinstance(n.func, ast.Attribute):
            meth = n.func.attr
            # datetime.strptime(x, fmt)
            if (
                meth == "strptime"
                and isinstance(n.func.value, ast.Name)
                and n.func.value.id == "datetime"
                and len(n.args) == 2
                and isinstance(n.args[1], ast.Constant)
            ):
                val = self.visit(n.args[0])
                fmt = strptime_to_spark(n.args[1].value)
                return Typed(F.to_timestamp(val.col, fmt), "timestamp")
            obj = self.visit(n.func.value)
            args = [self.visit(a) for a in n.args]
            return self._method(obj, meth, args, n)
        raise UnsupportedTemplate("call form")

    def _method(self, obj: Typed, meth: str, args: list[Typed], n: ast.Call) -> Typed:
        if obj.t == "timestamp" and meth == "strftime" and len(args) == 1:
            if not isinstance(n.args[0], ast.Constant):
                raise UnsupportedTemplate("dynamic strftime fmt")
            return Typed(
                F.date_format(obj.col, strptime_to_spark(n.args[0].value)), "str"
            )
        if obj.t != "str":
            raise UnsupportedTemplate(f"method .{meth} on {obj.t}")
        if meth == "upper":
            return Typed(F.upper(obj.col), "str")
        if meth == "lower":
            return Typed(F.lower(obj.col), "str")
        if meth == "strip" and not args:
            return Typed(F.trim(obj.col), "str")
        if meth == "lstrip" and not args:
            return Typed(F.ltrim(obj.col), "str")
        if meth == "rstrip" and not args:
            return Typed(F.rtrim(obj.col), "str")
        if meth == "replace" and len(args) == 2:
            return Typed(F.replace(obj.col, args[0].col, args[1].col), "str")
        if meth == "zfill" and len(args) == 1:
            return Typed(F.lpad(obj.col, n.args[0].value, "0"), "str")
        if meth == "startswith" and len(args) == 1:
            return Typed(F.startswith(obj.col, args[0].col), "bool")
        if meth == "endswith" and len(args) == 1:
            return Typed(F.endswith(obj.col, args[0].col), "bool")
        if meth == "split" and len(args) == 1:
            raise UnsupportedTemplate("bare split (need [i] index)")
        if meth == "find" and len(args) == 1:
            # instr is 1-based with 0=absent; find is 0-based with -1
            return Typed(F.instr(obj.col, args[0].col) - 1, "int")
        if meth == "count" and len(args) == 1:
            if not (isinstance(n.args[0], ast.Constant) and n.args[0].value):
                raise UnsupportedTemplate("count needs a non-empty literal")
            sub = n.args[0].value
            diff = F.length(obj.col) - F.length(
                F.replace(obj.col, F.lit(sub), F.lit(""))
            )
            return Typed((diff / len(sub)).cast("long"), "int")
        if meth in ("ljust", "rjust") and len(args) in (1, 2):
            if not isinstance(n.args[0], ast.Constant):
                raise UnsupportedTemplate("dynamic pad width")
            width = n.args[0].value
            fill = n.args[1].value if len(args) == 2 else " "
            pad = F.rpad if meth == "ljust" else F.lpad
            # Python never truncates when already wide enough; Spark's
            # pad does — guard to keep semantics exact
            return Typed(
                F.when(F.length(obj.col) >= width, obj.col).otherwise(
                    pad(obj.col, width, fill)
                ),
                "str",
            )
        raise UnsupportedTemplate(f"str method {meth}")


def _py_str(v: Typed) -> Column:
    """str() with Python semantics for the types we track.

    Spark casts bool->'true'/'false' but Python gives 'True'/'False';
    floats/ints/strings round-trip identically for finite values.
    """
    if v.t == "bool":
        return F.when(v.col, F.lit("True")).otherwise(F.lit("False"))
    if v.t == "timestamp":
        return F.date_format(v.col, "yyyy-MM-dd HH:mm:ss")
    return v.col.cast("string")


def _slice_str(col: Column, lo: int | None, hi: int | None) -> Column:
    """Python string slice s[lo:hi] as a Column (negative bounds ok)."""
    length = F.length(col)

    def pos(i: int | None, default_zero: bool) -> Column:
        if i is None:
            return F.lit(0) if default_zero else length
        if i >= 0:
            return F.least(F.lit(i), length)
        return F.greatest(length + F.lit(i), F.lit(0))

    start = pos(lo, True)
    end = pos(hi, False)
    n = F.greatest(end - start, F.lit(0))
    return F.substring(col, start + F.lit(1), n)


# ---------------------------------------------------------------------------
# Subscript handling for split(): arg1.split('_')[2]
# ---------------------------------------------------------------------------

class _Tier1WithSplit(_Tier1):
    def v_Subscript(self, n: ast.Subscript) -> Typed:
        # x.split(sep)[i]  ->  split + element_at (1-based; negative ok)
        if (
            isinstance(n.value, ast.Call)
            and isinstance(n.value.func, ast.Attribute)
            and n.value.func.attr == "split"
            and len(n.value.args) == 1
        ):
            obj = self.visit(n.value.func.value)
            sep = self.visit(n.value.args[0])
            if obj.t == "str" and sep.t == "str":
                idx = self._static_int(n.slice)
                if idx is None:
                    raise UnsupportedTemplate("slice of split")
                pos = idx + 1 if idx >= 0 else idx
                parts = F.split(obj.col, _regex_escape(sep.col))
                return Typed(F.element_at(parts, pos), "str")
        return super().v_Subscript(n)


def _regex_escape(lit_col: Column) -> Column:
    # F.split takes a regex; escape the literal separator.
    # For compile-time literals this folds to a constant.
    for ch in "\\.[]{}()*+?^$|":
        lit_col = F.replace(lit_col, F.lit(ch), F.lit("\\" + ch))
    return lit_col


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def compile_template(
    template: str,
    bindings: dict[str, tuple[Column, str]],
) -> Column:
    """Tier-1 compile: template string + name->(Column, type) bindings.

    Raises UnsupportedTemplate when the template falls outside the
    native subset — callers fall back to compile_fallback (tier 3).
    """
    tree = ast.parse(template, mode="eval")
    typed = {k: Typed(c, t) for k, (c, t) in bindings.items()}
    return _Tier1WithSplit(typed).visit(tree).col


def arg_bindings(inputs: list[str]) -> dict[str, tuple[Column, str]]:
    """argN -> input column (as string — reference str()-coerces every
    arg before substitution, Partrans.py:167-171)."""
    return {
        f"arg{i + 1}": (F.col(c).cast("string"), "str") for i, c in enumerate(inputs)
    }


# ---------------------------------------------------------------------------
# Tier 3: sandboxed eval fallback (pandas UDF, Arrow-batched)
# ---------------------------------------------------------------------------

_SAFE_BUILTINS = {
    "int": int, "float": float, "str": str, "round": round, "abs": abs,
    "len": len, "min": min, "max": max, "bool": bool,
}


def compile_fallback(template: str, inputs: list[str], out_type: str = "string"):
    """Tier-3: reproduce the reference's substitution+eval semantics
    (Partrans.py:167-171) in an Arrow-batched pandas UDF.

    Per row: each ``argN`` token is replaced with repr(str(value)) and
    the template eval'd under a builtin whitelist (no __import__, no
    attribute escape hatches beyond str/datetime methods). Any error
    yields None — the reference logs and appends to an error ledger
    (Partrans.py:203-208); we surface errors as nulls + a metric.
    """
    import pandas as pd  # local import: executor-side
    from pyspark.sql.functions import pandas_udf

    from datetime import datetime as _dt

    env = {"__builtins__": _SAFE_BUILTINS, "datetime": _dt}
    # argN replaced longest-first so arg10 isn't clobbered by arg1
    names = sorted(
        (f"arg{i + 1}" for i in range(len(inputs))), key=len, reverse=True
    )
    by_name = {f"arg{i + 1}": i for i in range(len(inputs))}

    def _fn(*cols):
        out = []
        n = len(cols[0]) if cols else 0
        for r in range(n):
            expr = template
            for name in names:
                expr = expr.replace(name, repr(str(cols[by_name[name]].iloc[r])))
            try:
                v = eval(expr, env)  # noqa: S307 - sandboxed whitelist
            except Exception:
                v = None
            if out_type == "string" and v is not None:
                v = str(v)
            out.append(v)
        return pd.Series(out, dtype="object")

    _udf = pandas_udf(_fn, out_type)
    return _udf(*[F.col(c).cast("string") for c in inputs])

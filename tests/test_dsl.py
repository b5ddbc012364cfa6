"""Differential tests: tier-1 compiled Columns vs the reference's
string-substitution + eval semantics (Partrans.py:167-171) on sample
rows; plus tier-2 lookup join and the derive operator."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from chill_spark.config import FieldSpec
from chill_spark.dsl import (
    UnsupportedTemplate,
    arg_bindings,
    compile_template,
    parse_lookup_template,
    strptime_to_spark,
)
from chill_spark.operators.derive import apply_fields


def reference_eval(template: str, args: list):
    """The reference's semantics: argN -> quoted str(value), then eval
    (Partrans.py:167-171)."""
    from datetime import datetime  # noqa: F401 - available to templates

    expr = template
    for i, v in enumerate(args):
        expr = expr.replace(f"arg{i + 1}", "'" + str(v) + "'")
    return eval(expr)  # noqa: S307 - test-only, trusted templates


SAMPLE_ROWS = [
    ("A20240101.1500_site42_huawei.csv", "OM_55", "12", "7.5"),
    ("B20231231.0000_s1_nokia.csv", "GRP_1", "0", "-3.25"),
    ("C20200229.2345_xy_eric.csv", "OM_99", "144", "100.0"),
]
COLS = ["fname", "grp", "cnt", "val"]

# (template, inputs) — shapes observed in the wild per SURVEY §2.6
TEMPLATES = [
    ("arg1[0:8]", ["fname"]),
    ("arg1[1:9] + ' ' + arg1[10:12] + ':' + arg1[12:14]", ["fname"]),
    ("arg1[-4:]", ["fname"]),
    ("arg1.split('_')[1]", ["fname"]),
    ("arg1.split('_')[-1]", ["fname"]),
    ("arg1.upper()", ["grp"]),
    ("arg1.lower()", ["fname"]),
    ("arg1.replace('OM_', 'GROUP-')", ["grp"]),
    ("int(arg1) + 5", ["cnt"]),
    ("int(arg1) * 2 - 3", ["cnt"]),
    ("float(arg1) / 4", ["val"]),
    ("round(float(arg1) / 3, 3)", ["val"]),
    ("str(int(arg1) + 1)", ["cnt"]),
    ("arg1 + '_' + arg2", ["grp", "cnt"]),
    ("'PREFIX_' + arg1", ["grp"]),
    ("arg1[0:2] if arg1[0:3] == 'OM_' else 'OTHER'", ["grp"]),
    ("len(arg1)", ["fname"]),
    ("arg1.strip()", ["grp"]),
    ("abs(float(arg1))", ["val"]),
    ("max(int(arg1), 50)", ["cnt"]),
    ("min(int(arg1), 50)", ["cnt"]),
    ("datetime.strptime(arg1[1:14], '%Y%m%d.%H%M').strftime('%Y-%m-%d %H:%M')", ["fname"]),
    ("arg1.zfill(6)", ["cnt"]),
    ("int(arg1) % 7", ["cnt"]),
    ("int(arg1) // 10", ["cnt"]),
    ("'%05d' % int(arg1)", ["cnt"]),
    ("'%s-%03d' % (arg1, int(arg2))", ["grp", "cnt"]),
    ("'%i' % int(arg1)", ["cnt"]),
    # escaped '%%i' must stay a literal '%i' while the real '%i'
    # converts (ADVICE r1: plain replace rewrote the escape too)
    ("'100%%i: %i' % int(arg1)", ["cnt"]),
    ("arg1.find('_')", ["fname"]),
    ("arg1.find('zzz')", ["fname"]),
    ("arg1.count('_')", ["fname"]),
    ("arg1.ljust(8, '.')", ["grp"]),
    ("arg1.rjust(10)", ["fname"]),
    ("'OM' in arg1", ["grp"]),
    ("'zzz' in arg1", ["fname"]),
    ("arg1.startswith('OM')", ["grp"]),
]


@pytest.mark.parametrize("template,inputs", TEMPLATES)
def test_tier1_matches_reference_eval(spark, template, inputs):
    df = spark.createDataFrame(SAMPLE_ROWS, COLS)
    col = compile_template(template, arg_bindings(inputs))
    got = [r[0] for r in df.select(col.alias("out")).collect()]
    idx = [COLS.index(c) for c in inputs]
    want = [reference_eval(template, [row[i] for i in idx]) for row in SAMPLE_ROWS]
    for g, w in zip(got, want):
        if isinstance(w, float):
            assert g == pytest.approx(w), (template, g, w)
        else:
            assert str(g) == str(w), (template, g, w)


def test_unsupported_raises():
    with pytest.raises(UnsupportedTemplate):
        compile_template("__import__('os')", {})
    with pytest.raises(UnsupportedTemplate):
        compile_template("arg1.encode()", arg_bindings(["x"]))


def test_strptime_conversion():
    assert strptime_to_spark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strptime_to_spark("%Y%m%d.%H%M") == "yyyyMMdd.HHmm"


def test_lookup_parse_and_join(spark):
    plan = parse_lookup_template("view[view['SITE'] == arg1]['REGION'].values[0]")
    assert [k for k, _ in plan.keys] == ["SITE"]
    assert plan.value_col == "REGION"

    plan2 = parse_lookup_template(
        "view[(view['A'] == arg1) & (view['B'] == arg2[0:2])]['C'].iloc[0]"
    )
    assert [k for k, _ in plan2.keys] == ["A", "B"]

    df = spark.createDataFrame([("s1", 1), ("s2", 2), ("s3", 3)], ["site", "v"])
    dim = spark.createDataFrame([("s1", "EU"), ("s2", "US")], ["SITE", "REGION"])
    fields = [
        FieldSpec(
            name="REGION",
            source="lookup",
            function="view[view['SITE'] == arg1]['REGION'].values[0]",
            inputs=["site"],
            view="sites",
            default="UNKNOWN",
        )
    ]
    out = apply_fields(df, fields, views={"sites": dim}).df
    got = {r["site"]: r["REGION"] for r in out.collect()}
    assert got == {"s1": "EU", "s2": "US", "s3": "UNKNOWN"}


def test_derive_sources(spark):
    df = spark.createDataFrame([("x", "5")], ["a", "b"])
    fields = [
        FieldSpec(name="C1", source="constant", value="V"),
        FieldSpec(name="C2", source="column", function="int(arg1) * 10", inputs=["b"]),
    ]
    res = apply_fields(df, fields)
    row = res.df.collect()[0]
    assert row["C1"] == "V" and row["C2"] == 50
    assert res.tiers == {"C1": 1, "C2": 1}


def test_derive_last_wins(spark):
    """ALL-then-table merge: later field overwrites (Partrans.py:306-319)."""
    df = spark.createDataFrame([("x",)], ["a"])
    fields = [
        FieldSpec(name="C", source="constant", value="first", counter_set="ALL"),
        FieldSpec(name="C", source="constant", value="second", counter_set="T1"),
    ]
    res = apply_fields(df, fields)
    assert res.df.collect()[0]["C"] == "second"


def test_tier3_fallback(spark):
    """A template tier 1 can't express falls back to the sandboxed UDF."""
    df = spark.createDataFrame([("abcdef",), ("xy",)], ["s"])
    fields = [
        FieldSpec(name="R", source="column", function="arg1[::-1]", inputs=["s"]),
    ]
    res = apply_fields(df, fields)
    assert res.tiers["R"] == 3
    got = [r["R"] for r in res.df.collect()]
    assert got == ["fedcba", "yx"]


def test_execute_views_and_lookup_pipeline(spark):
    """S6 -> J1: configured SQL view executed once, cached, then used
    as a lookup join dim (the reference's Oracle round trip collapsed
    into spark.sql over a dim snapshot)."""
    from chill_spark.dsl.lookup import apply_lookup, parse_lookup_template
    from chill_spark.sources.views import execute_views

    spark.createDataFrame(
        [("c1", "EAST"), ("c2", "WEST")], ["cell_id", "region"]
    ).createOrReplaceTempView("cells_dim")
    views = execute_views(
        spark, {"cells": "SELECT cell_id, region FROM cells_dim"}
    )
    facts = spark.createDataFrame([("c1",), ("c2",), ("c9",)], ["site"])
    plan = parse_lookup_template(
        "view[view['cell_id'] == arg1]['region'].values[0]"
    )
    out = apply_lookup(
        facts, plan, views["cells"], "REGION", inputs=["site"], default="UNK"
    )
    got = {r["site"]: r["REGION"] for r in out.collect()}
    assert got == {"c1": "EAST", "c2": "WEST", "c9": "UNK"}


# --- property-based differential testing (tier 1 vs reference eval) ---

from hypothesis import given, settings, strategies as st

_PBT_TEMPLATES = [
    ("arg1[0:4]", "s"),
    ("arg1[2:]", "s"),
    ("arg1[-3:]", "s"),
    ("arg1.upper() + '_' + arg1.lower()", "s"),
    ("arg1.strip()", "s"),
    ("len(arg1)", "s"),
    ("int(arg1) * 3 - 7", "i"),
    ("float(arg1) / 8 + 0.25", "i"),
    ("str(int(arg1) % 9)", "i"),
    ("max(int(arg1), 10)", "i"),
    ("arg1[0:2] if len(arg1) > 4 else arg1", "s"),
]

# Case mapping (upper/lower) is a documented contract boundary: tier-1
# compiles to JVM-side F.upper/F.lower, whose Unicode tables (ICU,
# Unicode 16) are newer than CPython 3.11's (Unicode 14) — e.g. U+019B
# 'ƛ' gained an uppercase U+A7DC in Unicode 16, so Spark maps it and
# Python doesn't. Differential testing of casing therefore sticks to
# Latin-1 (≤ U+00FF), whose case mappings are stable across both
# tables; all other templates draw from the full letter/digit alphabet.
_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=" _-."),
    min_size=0, max_size=20,
)
_text_stable_case = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=" _-.",
                           max_codepoint=0xFF),
    min_size=0, max_size=20,
)
_ints = st.integers(min_value=-10**9, max_value=10**9)


@settings(max_examples=25, deadline=None)
@given(data=st.data())
@pytest.mark.parametrize("template,kind", _PBT_TEMPLATES)
def test_tier1_property_differential(spark, template, kind, data):
    """Random inputs through tier-1 compiled Columns must equal the
    reference's substitute+eval semantics (str()-coerced args)."""
    if kind != "s":
        strat = _ints.map(str)
    elif "upper" in template or "lower" in template:
        strat = _text_stable_case
    else:
        strat = _text
    vals = data.draw(st.lists(strat, min_size=1, max_size=5))
    df = spark.createDataFrame([(v,) for v in vals], ["c"])
    col = compile_template(template, arg_bindings(["c"]))
    got = [r[0] for r in df.select(col.alias("out")).collect()]
    want = [reference_eval(template, [v]) for v in vals]
    for g, w in zip(got, want):
        if isinstance(w, float):
            assert g == pytest.approx(w), (template, vals, g, w)
        else:
            assert str(g) == str(w), (template, vals, g, w)

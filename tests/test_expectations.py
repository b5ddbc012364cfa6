"""Data expectations: one-pass constraint battery + JUnit integration."""

from __future__ import annotations

from chill_spark.reconcile.expectations import (
    check_expectations,
    custom,
    expectations_report,
    in_range,
    isin,
    not_null,
    ref_integrity,
    unique,
)


def test_expectation_battery_single_pass(spark):
    df = spark.createDataFrame(
        [
            (1, "s1", 10.0, "A"),
            (2, "s2", -5.0, "B"),     # range violation
            (3, None, 20.0, "A"),     # null site
            (4, "s4", 30.0, "Z"),     # bad category + not in dim
            (4, "s5", 40.0, "A"),     # duplicate id
        ],
        ["id", "site", "calls", "cat"],
    )
    dim = spark.createDataFrame([("s1",), ("s2",), ("s4",), ("s5",)], ["SITE"])
    results = check_expectations(
        df,
        [
            not_null("site"),
            in_range("calls", lo=0.0),
            isin("cat", ["A", "B"]),
            unique("id"),
            ref_integrity(["site"], dim, dim_keys=["SITE"]),
            custom("calls_even_tens", (df.calls % 10.0) != 0.0),
        ],
    )
    by_name = {r.name: r for r in results}
    assert by_name["not_null(site)"].violations == 1
    assert by_name["in_range(calls,0.0,None)"].violations == 1
    assert by_name["isin(cat)"].violations == 1
    assert by_name["unique(id)"].violations == 1
    # s3 is null (not a ref violation — not_null catches it); all others resolve
    assert by_name["ref(site)"].violations == 0
    assert by_name["calls_even_tens"].violations == 1  # -5.0
    assert all(r.total == 5 for r in results if r.name != "ref(site)")


def test_expectations_junit_roundtrip(spark):
    from chill_spark.report import TestReport

    df = spark.createDataFrame([(1, None)], "id int, site string")
    results = check_expectations(df, [not_null("site"), unique("id")])
    rep = expectations_report("CELL_STATS", results)
    xml = rep.to_xml()
    assert "Expectations" in xml and "violate not_null(site)" in xml
    back = TestReport.from_xml(xml)
    assert back.suite("Expectations").failures == 1
    assert back.suite("Expectations").tests == 2
    assert not back.passed

"""Skew/bucketing utilities: salted join correctness + bucketed join
plan shape (no Exchange on co-bucketed keys)."""

from __future__ import annotations

import contextlib
import io
import os
import shutil

import pytest
from pyspark.sql import functions as F

from chill_spark.operators.skew import salted_join, write_bucketed

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    # 10k rows, 90% on one hot key — the shape AQE alone can't always fix
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (15, "cold15"), (25, "cold25")], ["k", "label"]
    )
    plain = big.join(small, "k", "inner").select("k", "payload", "label")
    salted = salted_join(big, small, "k", salt=8).select("k", "payload", "label")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = salted_join(big, small, "k", how="left", salt=4).collect()
    assert len(out) == 2
    assert {r["w"] for r in out} == {"x", None}


def test_salted_join_rejects_right(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(df, df, "k", how="right")


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key: SortMergeJoin without a
    shuffle (no Exchange operator in the plan)."""
    wh = os.path.join(TMP, "bucketed")
    shutil.rmtree(wh, ignore_errors=True)
    facts = spark.range(1_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v1")
    )
    dims = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v2")
    )
    for name in ("t_facts", "t_dims"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(facts, "t_facts", f"{wh}/facts", "k", 8, sort_cols="k")
    write_bucketed(dims, "t_dims", f"{wh}/dims", "k", 8, sort_cols="k")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_facts").join(spark.table("t_dims"), "k")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 1_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for name in ("t_facts", "t_dims"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(wh, ignore_errors=True)


def test_skew_report_flags_planted_hot_key(spark):
    from chill_spark.operators.skew import skew_report

    rows = [(1, "hot")] * 90 + [(i, f"k{i}") for i in range(2, 12)]
    df = spark.createDataFrame(rows, "v int, k string")
    r = skew_report(df, "k").collect()[0]
    assert r["n_rows"] == 100 and r["n_keys"] == 11
    assert r["max_key_rows"] == 90
    assert r["max_key_share"] == 0.9
    assert r["p50_key_rows"] == 1.0
    assert abs(r["skew_ratio"] - 90 / (100 / 11)) < 1e-6
    # composite keys accepted
    r2 = skew_report(df, ["k", "v"]).collect()[0]
    assert r2["n_keys"] == 11

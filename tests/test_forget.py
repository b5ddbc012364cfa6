"""Right-to-be-forgotten (operators/forget.py): targeted key deletion
from a DT_PART fact, directory fast-path for fully-forgotten
partitions, untouched partitions never rewritten, idempotent replay,
and ladder repair converging to as-if-never-existed."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from chill_spark.catalog import ColumnSpec, TableSpec
from chill_spark.operators.forget import forget_and_repair, forget_keys
from chill_spark.operators.writers import PARTITION_COL, write_fact

DT = datetime


def _fact_rows():
    # 3 base periods; user 7 is alone in the 00:30 period
    return [
        (DT(2024, 1, 1, 0, 0), 1, "click", 100),
        (DT(2024, 1, 1, 0, 0), 7, "click", 200),
        (DT(2024, 1, 1, 0, 15), 1, "view", 300),
        (DT(2024, 1, 1, 0, 30), 7, "view", 400),
        (DT(2024, 1, 1, 1, 0), 2, "click", 500),
    ]


def _write(spark, path):
    df = spark.createDataFrame(
        _fact_rows(),
        "DATETIME timestamp, USER_ID bigint, EVENT_TYPE string, CENTS bigint",
    )
    write_fact(df, path)


def test_forget_keys_rewrites_partial_deletes_full(spark, tmp_path):
    path = str(tmp_path / "fact")
    _write(spark, path)
    rep = forget_keys(spark, path, "USER_ID", [7])
    assert rep["rows_forgotten"] == 2
    assert rep["partitions_rewritten"] == ["202401010000"]
    assert rep["partitions_deleted"] == ["202401010030"]  # user 7 alone
    assert not os.path.exists(
        os.path.join(path, f"{PARTITION_COL}=202401010030")
    )
    left = spark.read.parquet(path)
    assert left.filter(F.col("USER_ID") == 7).count() == 0
    assert left.count() == 3  # the other users' rows survive
    # idempotent: replay matches nothing
    again = forget_keys(spark, path, "USER_ID", [7])
    assert again["rows_forgotten"] == 0
    assert again["partitions_rewritten"] == []


def test_forget_keys_untouched_partitions_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "fact")
    _write(spark, path)
    untouched = os.path.join(path, f"{PARTITION_COL}=202401010100")
    before = sorted(os.listdir(untouched))
    rep = forget_keys(spark, path, "USER_ID", [7])
    assert "202401010100" not in (
        rep["partitions_rewritten"] + rep["partitions_deleted"]
    )
    assert sorted(os.listdir(untouched)) == before  # same physical files


def test_forget_keys_null_keys_never_match(spark, tmp_path):
    path = str(tmp_path / "fact")
    df = spark.createDataFrame(
        [(DT(2024, 1, 1), None, "x", 1), (DT(2024, 1, 1), 5, "x", 2)],
        "DATETIME timestamp, USER_ID bigint, EVENT_TYPE string, CENTS bigint",
    )
    write_fact(df, path)
    rep = forget_keys(spark, path, "USER_ID", [5])
    assert rep["rows_forgotten"] == 1
    assert spark.read.parquet(path).count() == 1  # the NULL row stays


def test_forget_keys_rejects_batch_subpartitioned_store(spark, tmp_path):
    import pytest

    from chill_spark.operators.writers import append_batch_keyed

    path = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(DT(2024, 1, 1), 1, "x", 1)],
        "DATETIME timestamp, USER_ID bigint, EVENT_TYPE string, CENTS bigint",
    ).withColumn("DT_PART", F.lit("202401010000"))
    append_batch_keyed(df, path, 0, extra_partition_cols=["DT_PART"])
    with pytest.raises(ValueError, match="flat DT_PART layout"):
        forget_keys(spark, path, "USER_ID", [1])


def test_cli_forget_fact_only(spark, tmp_path, capsys):
    from chill_spark.cli import main

    path = str(tmp_path / "fact")
    _write(spark, path)
    rc = main(["forget", "--in", path, "--key-col", "USER_ID",
               "--keys", "7"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rows_forgotten=2 rewritten=1 deleted=1" in out
    assert spark.read.parquet(path).filter(
        F.col("USER_ID") == 7
    ).count() == 0


def _table() -> TableSpec:
    return TableSpec(
        name="EV",
        counter_group="OM_EV",
        base_granularity="15M",
        key_fields=["EVENT_TYPE"],
        rollups=["HR"],
        columns=[
            ColumnSpec("EVENT_TYPE", raw_name="t", dtype="string", kind="KEY"),
            ColumnSpec("CENTS", raw_name="c", dtype="long"),
        ],
    )


def test_forget_and_repair_converges_ladder(spark, tmp_path):
    """After forget+repair the hourly ladder equals a from-scratch
    rollup of the surviving base — including DROPPING the hour whose
    base rows were all forgotten (dynamic overwrite can't erase a
    partition an empty re-aggregate never writes)."""
    base = str(tmp_path / "base")
    out = str(tmp_path / "ladder")
    _write(spark, base)
    table = _table()
    # initial full ladder build
    from chill_spark.operators.incremental import maintain_ladder_increment

    all_dts = sorted({r[0] for r in _fact_rows()})
    maintain_ladder_increment(spark, base, out, table, all_dts)
    # forget a user who is ALONE in hour 00 period 00:30 but shares
    # hour 00 period 00:00 — hour 00 must be re-aggregated, hour 01
    # untouched
    rep = forget_and_repair(
        spark, base, out, table, "USER_ID", [7]
    )
    assert sorted(rep["repaired"]["HR"]) == [DT(2024, 1, 1, 0, 0)]
    got = {
        (r["DATETIME"], r["EVENT_TYPE"]): r["CENTS"]
        for r in spark.read.parquet(f"{out}/EV_HR").collect()
    }
    assert got == {
        (DT(2024, 1, 1, 0, 0), "click"): 100,
        (DT(2024, 1, 1, 0, 0), "view"): 300,
        (DT(2024, 1, 1, 1, 0), "click"): 500,
    }
    assert rep["ladder_partitions_deleted"] == {}

    # forget EVERYTHING in hour 01 -> its ladder partition must vanish
    rep2 = forget_and_repair(spark, base, out, table, "USER_ID", [2])
    assert rep2["ladder_partitions_deleted"] == {"HR": [DT(2024, 1, 1, 1, 0)]}
    hours = {
        r["DATETIME"] for r in spark.read.parquet(f"{out}/EV_HR").collect()
    }
    assert hours == {DT(2024, 1, 1, 0, 0)}


def test_cli_forget_sketch_store(spark, tmp_path, capsys):
    from chill_spark.cli import main
    from chill_spark.llm_ops.incremental_dedup import write_sketch_store

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id bigint, text string",
    )
    root = str(tmp_path / "sk")
    write_sketch_store(docs, "text", "doc_id", root,
                       num_hashes=8, bands=4, shingle_k=3)
    rc = main(["forget", "--sketch-store", root, "--keys", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sets: rows_forgotten=1" in out
    ids = {r["id"] for r in spark.read.parquet(f"{root}/sets").collect()}
    assert ids == {2}


def test_forget_and_repair_heals_crash_between_rewrite_and_repair(
    spark, tmp_path
):
    """Crash simulation: the base rewrite landed (forget_keys ran) but
    the ladder repair never did. The journaled window plan must bring
    the stale windows back into the NEXT forget_and_repair call even
    though its own locate scan matches nothing — and the marker is
    cleared once the repair completes."""
    from chill_spark.llm_ops.storefs import write_store_json
    from chill_spark.operators.incremental import maintain_ladder_increment

    base = str(tmp_path / "base")
    out = str(tmp_path / "ladder")
    _write(spark, base)
    table = _table()
    all_dts = sorted({r[0] for r in _fact_rows()})
    maintain_ladder_increment(spark, base, out, table, all_dts)

    # the "crashed" first run: journal written, base mutated, NO repair
    write_store_json(
        out, {"datetimes": [DT(2024, 1, 1, 0, 0).isoformat(),
                            DT(2024, 1, 1, 0, 30).isoformat()]},
        name="_forget_pending.json", spark=spark,
    )
    forget_keys(spark, base, "USER_ID", [7])
    # ladder is now stale: hour 00 still counts user 7's 600 cents
    stale = {
        (r["DATETIME"], r["EVENT_TYPE"]): r["CENTS"]
        for r in spark.read.parquet(f"{out}/EV_HR").collect()
    }
    assert stale[(DT(2024, 1, 1, 0, 0), "click")] == 300  # 100 + 200

    rep = forget_and_repair(spark, base, out, table, "USER_ID", [7])
    assert rep["rows_forgotten"] == 0  # replay matched nothing...
    assert sorted(rep["repaired"]["HR"]) == [DT(2024, 1, 1, 0, 0)]
    healed = {
        (r["DATETIME"], r["EVENT_TYPE"]): r["CENTS"]
        for r in spark.read.parquet(f"{out}/EV_HR").collect()
    }
    assert healed[(DT(2024, 1, 1, 0, 0), "click")] == 100  # ...but healed
    assert not os.path.exists(os.path.join(out, "_forget_pending.json"))


def test_forget_rows_preserves_null_id_survivors(spark, tmp_path):
    """storefs.forget_rows rewrites partially-touched leaves with a
    NULL-safe survivor predicate: ~isin(ids) is NULL for NULL-id rows,
    so without the explicit isNull() keep-clause a forget of UNRELATED
    keys would silently delete them (the r7 ADVICE finding)."""
    from chill_spark.llm_ops.storefs import forget_rows

    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, "a", 0), (None, "n", 0), (2, "b", 0), (3, "c", 1)],
        "id bigint, v string, BATCH_PART int",
    )
    df.write.partitionBy("BATCH_PART").parquet(path)

    out = forget_rows(spark, path, "id", [1], ["BATCH_PART"])
    assert out == {"rows_forgotten": 1, "leaves_rewritten": 1,
                   "leaves_deleted": 0}
    left = spark.read.parquet(path).collect()
    assert sorted(r["v"] for r in left) == ["b", "c", "n"], (
        "NULL-id survivor was dropped by the leaf rewrite"
    )
    # replay matches nothing and rewrites nothing
    again = forget_rows(spark, path, "id", [1], ["BATCH_PART"])
    assert again["rows_forgotten"] == 0

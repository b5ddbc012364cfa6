"""CLI surface: run -> reconcile -> JUnit XML through `python -m
chill_spark` argument parsing (in-process; one SparkSession reused)."""

from __future__ import annotations

import os
import shutil

import pytest

from chill_spark.catalog import Catalog, ColumnSpec, TableSpec
from chill_spark.cli import main
from chill_spark.config import FieldSpec, JobSpec

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture()
def cli_dirs(spark):
    base = os.path.join(TMP, "cli_test")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.join(base, "in"))
    with open(os.path.join(base, "in", "A20240101.0000_x.csv"), "w") as f:
        f.write("site,calls_raw\ns1,100\ns2,200\n")

    cat = Catalog()
    cat.add(
        TableSpec(
            name="CELL_STATS", counter_group="OM_CELL",
            key_fields=["SITE"],
            columns=[
                ColumnSpec("SITE", raw_name="site", dtype="string", kind="KEY"),
                ColumnSpec("CALLS", raw_name="calls_raw", dtype="double"),
            ],
        )
    )
    job = JobSpec(
        input_dir=os.path.join(base, "in"),
        input_mask="*.csv",
        fields=[
            FieldSpec(name="OM_GROUP", source="constant", value="OM_CELL"),
            FieldSpec(
                name="DATETIME", source="column",
                function=(
                    "datetime.strptime(arg1[1:14], '%Y%m%d.%H%M')"
                    ".strftime('%Y-%m-%d %H:%M:%S')"
                ),
                inputs=["_file"],
            ),
        ],
    )
    paths = {
        "base": base,
        "job": os.path.join(base, "job.json"),
        "catalog": os.path.join(base, "catalog.json"),
        "out": os.path.join(base, "out"),
    }
    with open(paths["job"], "w") as f:
        f.write(job.to_json())
    with open(paths["catalog"], "w") as f:
        f.write(cat.to_json())
    yield paths
    shutil.rmtree(base, ignore_errors=True)


def test_cli_run_and_reconcile(cli_dirs, capsys):
    rc = main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    assert rc == 0
    assert "CELL_STATS" in capsys.readouterr().out

    fact = os.path.join(cli_dirs["out"], "CELL_STATS_15M")
    report = os.path.join(cli_dirs["base"], "report.xml")
    rc = main([
        "reconcile", "--catalog", cli_dirs["catalog"], "--table", "CELL_STATS",
        "--expected", fact, "--actual", fact, "--report", report,
    ])
    assert rc == 0
    xml = open(report).read()
    assert "<testsuite" in xml and 'failures="0"' in xml


def test_cli_rollup(cli_dirs, capsys):
    main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    rollup_out = os.path.join(cli_dirs["base"], "ladder")
    rc = main([
        "rollup", "--catalog", cli_dirs["catalog"], "--table", "CELL_STATS",
        "--in", os.path.join(cli_dirs["out"], "CELL_STATS_15M"),
        "--out", rollup_out,
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(rollup_out, "CELL_STATS_HH"))


def test_cli_dedup(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "docs_in")
    dst = os.path.join(cli_dirs["base"], "docs_out")
    spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "unique text here")],
        ["doc_id", "text"],
    ).write.parquet(src)
    rc = main(["dedup", "--in", src, "--out", dst, "--method", "exact"])
    assert rc == 0
    assert spark.read.parquet(dst).count() == 2
    assert "3 -> 2 rows" in capsys.readouterr().out


def test_cli_segdedup(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "sd_in")
    dst = os.path.join(cli_dirs["base"], "sd_out")
    boiler = "w" + " w".join(str(i) for i in range(16))  # one full segment
    spark.createDataFrame(
        [(1, boiler + " unique tail one two three four"),
         (2, boiler + " another distinct ending here now")],
        ["doc_id", "text"],
    ).write.parquet(src)
    rc = main(["segdedup", "--input", src, "--out", dst])
    assert rc == 0
    assert "segments kept" in capsys.readouterr().out
    rows = {r["id"]: r for r in spark.read.parquet(dst).collect()}
    # doc 1 keeps both segments; doc 2 loses the shared boilerplate one
    assert rows[1]["n_kept"] == 2 and rows[2]["n_kept"] == 1


def test_cli_mix(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "mx_in")
    dst = os.path.join(cli_dirs["base"], "mx_out")
    spark.createDataFrame(
        [(1, "a b c d e f g h", "big"), (2, "a b c d e f g h", "big"),
         (3, "x y", "small")],
        ["doc_id", "text", "source"],
    ).write.parquet(src)
    rc = main([
        "mix", "--input", src, "--out", dst, "--budget-frac", "0.5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "big: tokens=16" in out and "small: tokens=2" in out
    assert "budget selection written" in out
    kept = spark.read.parquet(dst)
    # per source: best docs until half the token mass (boundary kept)
    assert kept.filter(kept.source == "big").count() == 1
    assert kept.filter(kept.source == "small").count() == 1
    assert set(kept.columns) == {"doc_id", "text", "source"}

    # the histogram-cutoff scale path writes the same schema; here
    # both 'big' docs tie on score -> one bucket -> both kept
    dst2 = os.path.join(cli_dirs["base"], "mx_out2")
    rc = main([
        "mix", "--input", src, "--out", dst2, "--budget-frac", "0.5",
        "--threshold-buckets", "1000",
    ])
    assert rc == 0
    kept2 = spark.read.parquet(dst2)
    assert set(kept2.columns) == {"doc_id", "text", "source"}
    assert kept2.filter(kept2.source == "big").count() == 2
    assert kept2.filter(kept2.source == "small").count() == 1


def test_cli_compact(cli_dirs, spark, capsys):
    main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    fact = os.path.join(cli_dirs["out"], "CELL_STATS_15M")
    rc = main(["compact", "--in", fact, "--target-mb", "128"])
    assert rc == 0
    assert "partition(s) compacted" in capsys.readouterr().out


def test_cli_upsert(cli_dirs, spark, capsys):
    main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    fact = os.path.join(cli_dirs["out"], "CELL_STATS_15M")
    upd = os.path.join(cli_dirs["base"], "upd_in")
    spark.createDataFrame(
        [("s1", "2024-01-01 00:00:00", 111.0)],
        ["SITE", "DATETIME", "CALLS"],
    ).selectExpr(
        "SITE", "CAST(DATETIME AS timestamp) AS DATETIME", "CALLS"
    ).write.parquet(upd)
    rc = main([
        "upsert", "--target", fact, "--updates", upd, "--keys", "SITE",
    ])
    assert rc == 0
    assert "merged into 1 partition(s)" in capsys.readouterr().out
    rows = {r["SITE"]: r["CALLS"] for r in spark.read.parquet(fact).collect()}
    assert rows == {"s1": 111.0, "s2": 200.0}


def test_cli_quality(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "q_in")
    dst = os.path.join(cli_dirs["base"], "q_out")
    good = (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "to a very distant place where it was seen by many people that day " * 3
    )
    spark.createDataFrame(
        [(1, good), (2, "tiny"), (3, "{ } < > | # " * 60)], ["doc_id", "text"]
    ).write.parquet(src)
    rc = main(["quality", "--input", src, "--out", dst])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3 -> 1 rows kept" in out and "fail r_words" in out
    kept = spark.read.parquet(dst)
    assert kept.count() == 1 and "keep" not in kept.columns


def test_cli_ladder_repair(cli_dirs, spark, capsys):
    main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    capsys.readouterr()
    ladder = os.path.join(cli_dirs["base"], "ladder_inc")
    rc = main([
        "ladder-repair",
        "--base", os.path.join(cli_dirs["out"], "CELL_STATS_15M"),
        "--out", ladder, "--catalog", cli_dirs["catalog"],
        "--table", "CELL_STATS", "--levels", "HR,DY",
        "2024-01-01T00:00:00",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "HR: repaired 1 window(s)" in out
    got = spark.read.parquet(os.path.join(ladder, "CELL_STATS_HR")).collect()
    assert {(r["SITE"], r["CALLS"]) for r in got} == {("s1", 100.0), ("s2", 200.0)}


def test_cli_run_from_excel_configs(cli_dirs, spark, capsys):
    """A reference user's Excel configs (Chill sheet + HLD workbook)
    drive the CLI directly — no JSON conversion step."""
    from chill_spark.config.xlsx import write_xlsx

    chill_rows = [
        ["input_rd", os.path.join(cli_dirs["base"], "in")],
        ["input_rd_mask", "*.csv"],
        ["field"],
        ["OM_GROUP", "constant", None, None, "OM_CELL", None],
        ["DATETIME", "column", None, "_file", None,
         "datetime.strptime(arg1[1:14], '%Y%m%d.%H%M').strftime('%Y-%m-%d %H:%M:%S')",
         None, None, "ALL"],
    ]
    hld_sheets = {
        "Tables": [
            [None, "Table Name", "Counter Group in RD", "Base Granularity"],
            [None, "-", "-", "-"],
            [None, "-", "-", "-"],
            [None, "CELL_STATS", "OM_CELL", "15M"],
        ],
        "Key_Counters_Kpis": [
            [None, "Table Name", "Counter/KPI DB Name", "Raw Data Counter Name/OID",
             "TYPE", "Data Type", "Formula"],
            [None, "-", "-", "-", "-", "-", "-"],
            [None, "-", "-", "-", "-", "-", "-"],
            [None, "CELL_STATS", "SITE", "site", "KEY", "string"],
            [None, "CELL_STATS", "CALLS", "calls_raw", "COUNTER", "double"],
        ],
    }
    job_x = os.path.join(cli_dirs["base"], "chill.xlsx")
    cat_x = os.path.join(cli_dirs["base"], "hld.xlsx")
    write_xlsx(job_x, {"Chill": chill_rows})
    write_xlsx(cat_x, hld_sheets)
    out = os.path.join(cli_dirs["base"], "out_xlsx")
    rc = main(["run", "--job", job_x, "--catalog", cat_x, "--out", out])
    assert rc == 0
    got = spark.read.parquet(os.path.join(out, "CELL_STATS_15M"))
    assert {r["SITE"] for r in got.collect()} == {"s1", "s2"}


def test_cli_stream_with_ladder(cli_dirs, spark, capsys):
    ckpt = os.path.join(cli_dirs["base"], "ckpt")
    ladder = os.path.join(cli_dirs["base"], "stream_ladder")
    rc = main([
        "stream", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"], "--checkpoint", ckpt,
        "--columns", "site,calls_raw", "--drain",
        "--ladder-root", ladder, "--ladder-levels", "HR",
    ])
    assert rc == 0
    got = spark.read.parquet(os.path.join(ladder, "CELL_STATS_HR")).collect()
    assert {(r["SITE"], r["CALLS"]) for r in got} == {("s1", 100.0), ("s2", 200.0)}


def test_cli_reconcile_with_expectations(cli_dirs, capsys):
    main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    capsys.readouterr()
    fact = os.path.join(cli_dirs["out"], "CELL_STATS_15M")
    report = os.path.join(cli_dirs["base"], "report_exp.xml")
    rc = main([
        "reconcile", "--catalog", cli_dirs["catalog"], "--table", "CELL_STATS",
        "--expected", fact, "--actual", fact, "--report", report,
        "--expect-not-null", "SITE,CALLS", "--expect-unique", "SITE",
    ])
    assert rc == 0
    xml = open(report).read()
    assert "Expectations" in xml and "not_null(SITE,CALLS)" in xml


def test_cli_stream_columns_default_from_catalog(cli_dirs, spark):
    """--columns defaults to the catalog's declared raw names."""
    ckpt = os.path.join(cli_dirs["base"], "ckpt_nc")
    rc = main([
        "stream", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"], "--checkpoint", ckpt, "--drain",
    ])
    assert rc == 0
    got = spark.read.parquet(os.path.join(cli_dirs["out"], "CELL_STATS_15M"))
    assert {r["SITE"] for r in got.collect()} == {"s1", "s2"}


def test_cli_quality_preserves_user_keep_column(cli_dirs, spark, capsys):
    """Flag columns are __q_-prefixed: an input column named 'keep'
    survives to the output untouched (ADVICE r1)."""
    src = os.path.join(cli_dirs["base"], "q_in2")
    dst = os.path.join(cli_dirs["base"], "q_out2")
    good = (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "to a very distant place where it was seen by many people that day " * 3
    )
    spark.createDataFrame(
        [(1, good, "user-value"), (2, "tiny", "x")],
        ["doc_id", "text", "keep"],
    ).write.parquet(src)
    rc = main(["quality", "--input", src, "--out", dst])
    assert rc == 0
    kept = spark.read.parquet(dst)
    assert kept.count() == 1
    assert kept.first()["keep"] == "user-value"


def test_cli_reconcile_jdbc_actual(cli_dirs, spark, capsys):
    """Reconcile the expected parquet against a live JDBC table
    (embedded Derby, the JDBC engine bundled with Spark) — parity
    with the reference's expected-files-vs-Oracle compare. The
    DATETIME predicate must be pushed down to the database."""
    import io
    from contextlib import redirect_stdout

    main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    capsys.readouterr()
    fact = os.path.join(cli_dirs["out"], "CELL_STATS_15M")
    url = f"jdbc:derby:{os.path.join(cli_dirs['base'], 'derby')};create=true"
    spark.read.parquet(fact).drop("DT_PART").write.format("jdbc").option(
        "url", url
    ).option("dbtable", "ACTUAL").mode("overwrite").save()

    rc = main([
        "reconcile", "--catalog", cli_dirs["catalog"], "--table", "CELL_STATS",
        "--expected", fact, "--actual", url, "--actual-table", "ACTUAL",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and 'failures="0"' in out

    # the JDBC scan must carry the DATETIME filter (fully pushed: *)
    from chill_spark.operators.writers import read_fact_jdbc
    from datetime import datetime

    buf = io.StringIO()
    with redirect_stdout(buf):
        read_fact_jdbc(
            spark, url, "ACTUAL", datetimes=[datetime(2024, 1, 1, 0, 0)]
        ).explain("formatted")
    assert "PushedFilters: [*IsNotNull(DATETIME), *" in buf.getvalue()

    # drift in the DB -> nonzero exit + failure surfaced in the XML
    spark.sql("SELECT 's1' AS SITE, TIMESTAMP '2024-01-01 00:00:00' AS DATETIME, CAST(999 AS DOUBLE) AS CALLS").write.format(
        "jdbc"
    ).option("url", url).option("dbtable", "ACTUAL").mode("overwrite").save()
    rc = main([
        "reconcile", "--catalog", cli_dirs["catalog"], "--table", "CELL_STATS",
        "--expected", fact, "--actual", url, "--actual-table", "ACTUAL",
    ])
    assert rc == 1 and "failure" in capsys.readouterr().out


def test_cli_e2e_batch(cli_dirs, spark, capsys):
    """Single-command end-to-end (VERDICT r1 item 7): ingest ->
    facts -> ladder -> reconcile -> five-suite JUnit."""
    from chill_spark.llm_ops.storefs import reset_store_participation

    reset_store_participation()  # isolate from other tests' stores
    report = os.path.join(cli_dirs["base"], "e2e.xml")
    rc = main([
        "e2e", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"], "--report", report,
    ])
    assert rc == 0
    xml = open(report).read()
    for suite in ["DBLoader Errors", "Number of records comparison",
                  "Missing Data", "Data Difference", "Missing Columns"]:
        assert suite in xml
    assert 'failures="0"' in xml
    # ladder written alongside the base fact
    assert os.path.isdir(os.path.join(cli_dirs["out"], "CELL_STATS_HR"))
    assert os.path.isdir(os.path.join(cli_dirs["out"], "CELL_STATS_DY"))


def test_cli_e2e_stream(cli_dirs, spark, capsys):
    """--stream ingests through Structured Streaming (drained); the
    reconcile side is the batch plan over the same files, so a green
    report certifies stream=batch agreement end-to-end."""
    from chill_spark.llm_ops.storefs import reset_store_participation

    reset_store_participation()  # isolate from other tests' stores
    report = os.path.join(cli_dirs["base"], "e2e_s.xml")
    rc = main([
        "e2e", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", os.path.join(cli_dirs["base"], "out_s"),
        "--report", report, "--stream",
    ])
    assert rc == 0
    xml = open(report).read()
    assert 'failures="0"' in xml


def test_read_fact_jdbc_chunks_large_in_lists(cli_dirs, spark):
    """>900 DATETIME literals split into an OR of IN chunks (Oracle's
    1000-literal IN limit, ORA-01795) with identical semantics."""
    from datetime import datetime, timedelta

    from chill_spark.operators.writers import read_fact_jdbc

    url = f"jdbc:derby:{os.path.join(cli_dirs['base'], 'derby2')};create=true"
    spark.sql(
        "SELECT 's1' AS SITE, TIMESTAMP '2024-01-01 00:00:00' AS DATETIME, "
        "CAST(1 AS DOUBLE) AS CALLS"
    ).write.format("jdbc").option("url", url).option("dbtable", "T").save()
    base = datetime(2024, 1, 1)
    dts = [base + timedelta(minutes=15 * i) for i in range(1001)]
    got = read_fact_jdbc(spark, url, "T", datetimes=dts).collect()
    assert len(got) == 1 and got[0]["SITE"] == "s1"
    # excluding the matching period excludes the row
    assert not read_fact_jdbc(spark, url, "T", datetimes=dts[1:]).collect()


def test_cli_dedup_near_reports_oversize_buckets(cli_dirs, spark, capsys):
    """--method near surfaces capped-bucket skips instead of silently
    under-deduplicating (r2 review finding)."""
    src = os.path.join(cli_dirs["base"], "dd_in")
    dst = os.path.join(cli_dirs["base"], "dd_out")
    text = "the same boilerplate sentence repeated across many documents here"
    rows = [(i, f"{text} {i % 2}") for i in range(30)]
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)
    rc = main([
        "dedup", "--in", src, "--out", dst, "--method", "near",
        "--max-bucket", "5",
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "oversize LSH bucket" in err and "--max-bucket=5" in err


def test_cli_dedup_stream(cli_dirs, spark, capsys):
    """dedup-stream subcommand: drained intake keeps only survivors
    and builds the sketch store."""
    import json

    ind = os.path.join(cli_dirs["base"], "ds_in"); os.makedirs(ind)
    out = os.path.join(cli_dirs["base"], "ds_out")
    store = os.path.join(cli_dirs["base"], "ds_store")
    ckpt = os.path.join(cli_dirs["base"], "ds_ckpt")
    body = "the quick brown fox jumps over the lazy dog again and again " * 3
    with open(os.path.join(ind, "a.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": body}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": body + "extra tail"}) + "\n")
    rc = main([
        "dedup-stream", "--in", ind, "--out", out, "--store", store,
        "--checkpoint", ckpt, "--threshold", "0.5", "--drain",
    ])
    assert rc == 0
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1}
    assert os.path.isdir(os.path.join(store, "sets"))


def test_cli_sketch_then_stream_dedups_against_bootstrap(cli_dirs, spark, capsys):
    """sketch bootstraps the store from a batch corpus; dedup-stream
    then drops near-dups of the pre-sketched docs."""
    import json

    corpus = os.path.join(cli_dirs["base"], "sk_corpus")
    store = os.path.join(cli_dirs["base"], "sk_store")
    body = "the quick brown fox jumps over the lazy dog again and again " * 3
    spark.createDataFrame([(1, body)], ["doc_id", "text"]).write.parquet(corpus)
    rc = main(["sketch", "--in", corpus, "--store", store,
               "--num-hashes", "16", "--bands", "8"])
    assert rc == 0 and "1 doc(s)" in capsys.readouterr().out

    ind = os.path.join(cli_dirs["base"], "sk_in"); os.makedirs(ind)
    out = os.path.join(cli_dirs["base"], "sk_out")
    ckpt = os.path.join(cli_dirs["base"], "sk_ckpt")
    with open(os.path.join(ind, "a.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 5, "text": body + "tiny tail"}) + "\n")
        f.write(json.dumps({"doc_id": 6, "text": "fresh unrelated content entirely"}) + "\n")
    # mismatched sketch params must fail fast, not silently miss dups
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zero dedup recall"):
        main([
            "dedup-stream", "--in", ind, "--out", out, "--store", store,
            "--checkpoint", ckpt, "--threshold", "0.5", "--drain",
        ])
    rc = main([
        "dedup-stream", "--in", ind, "--out", out, "--store", store,
        "--checkpoint", ckpt, "--threshold", "0.5", "--drain",
        "--num-hashes", "16", "--bands", "8",
    ])
    assert rc == 0
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {6}


def test_cli_sql_over_fact_dir(cli_dirs, spark, capsys):
    """sql subcommand: facts written by `run` are queryable by name."""
    main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    capsys.readouterr()
    rc = main([
        "sql", "SELECT SITE, CALLS FROM CELL_STATS_15M ORDER BY SITE",
        "--tables", cli_dirs["out"],
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "s1" in out and "100" in out
    dst = os.path.join(cli_dirs["base"], "sql_out")
    rc = main([
        "sql", "SELECT count(*) AS n FROM CELL_STATS_15M",
        "--tables", cli_dirs["out"], "--out", dst,
    ])
    assert rc == 0 and spark.read.parquet(dst).first()["n"] == 2


def test_cli_ladder_audit(cli_dirs, spark, capsys):
    """ladder-audit: green on a freshly built ladder, red after a
    partition is tampered with."""
    main([
        "run", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", cli_dirs["out"],
    ])
    fact = os.path.join(cli_dirs["out"], "CELL_STATS_15M")
    ladder = os.path.join(cli_dirs["base"], "ladder_audit")
    main([
        "rollup", "--catalog", cli_dirs["catalog"], "--table", "CELL_STATS",
        "--in", fact, "--out", ladder,
    ])
    capsys.readouterr()
    args = [
        "ladder-audit", "--catalog", cli_dirs["catalog"],
        "--table", "CELL_STATS", "--base", fact, "--out", ladder,
        "--levels", "HR,DY",
    ]
    assert main(args) == 0
    # tamper: double one stored HR counter
    from pyspark.sql import functions as F

    hr = os.path.join(ladder, "CELL_STATS_HR")
    df = spark.read.parquet(hr).withColumn("CALLS", F.col("CALLS") * 2)
    df.write.mode("overwrite").parquet(hr + "_tmp")
    shutil.rmtree(hr); os.rename(hr + "_tmp", hr)
    capsys.readouterr()
    assert main(args) == 1
    assert "inconsistent row(s)" in capsys.readouterr().out


def test_cli_sql_reports_skips_and_collisions(cli_dirs, spark, capsys):
    """sql: non-identifier entries and case-insensitive view-name
    collisions are reported on stderr, never silently dropped
    (r2 review)."""
    base = os.path.join(cli_dirs["base"], "sql_tables")
    os.makedirs(base)
    spark.createDataFrame([(1,)], ["a"]).write.parquet(os.path.join(base, "T1"))
    spark.createDataFrame([(2,)], ["a"]).write.parquet(os.path.join(base, "t1"))
    spark.createDataFrame([(3,)], ["a"]).write.parquet(os.path.join(base, "bad-name"))
    # query references T1 and t1 -> collision surfaced; bad-name is
    # unreferenced so it is not even opened
    rc = main(["sql", "SELECT a FROM T1 -- t1", "--tables", base])
    err = capsys.readouterr().err
    assert rc == 0
    assert "collides with" in err and "bad-name" not in err
    # no referenced name -> fallback registers everything; the
    # non-identifier entry is then reported, not silently dropped
    rc = main(["sql", "SELECT 1 AS one", "--tables", base])
    err = capsys.readouterr().err
    assert rc == 0
    assert "skipped bad-name: not a valid view name" in err


def test_cli_ladder_audit_validates_levels(cli_dirs, capsys):
    rc = main([
        "ladder-audit", "--catalog", cli_dirs["catalog"],
        "--table", "CELL_STATS", "--base", "/nonexistent",
        "--out", "/nonexistent", "--levels", "HRS",
    ])
    assert rc == 2
    assert "unknown ladder level" in capsys.readouterr().err


def test_cli_sketch_compact_lifecycle(cli_dirs, spark, capsys):
    """sketch --bucket-partitions builds a hash-partitioned banded
    side; after a stream appends batch leaves, sketch-compact
    collapses each side to one leaf, preserving the layout and the
    dedup behavior."""
    import json

    from chill_spark.llm_ops.incremental_dedup import BUCKET_PART_COL

    corpus = os.path.join(cli_dirs["base"], "skc_corpus")
    store = os.path.join(cli_dirs["base"], "skc_store")
    body = "the quick brown fox jumps over the lazy dog again and again " * 3
    spark.createDataFrame([(1, body)], ["doc_id", "text"]).write.parquet(corpus)
    rc = main(["sketch", "--in", corpus, "--store", store,
               "--num-hashes", "16", "--bands", "8",
               "--bucket-partitions", "16"])
    assert rc == 0
    capsys.readouterr()

    ind = os.path.join(cli_dirs["base"], "skc_in"); os.makedirs(ind)
    out = os.path.join(cli_dirs["base"], "skc_out")
    ckpt = os.path.join(cli_dirs["base"], "skc_ckpt")
    with open(os.path.join(ind, "a.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 5, "text": "fresh unrelated content entirely"}) + "\n")
    rc = main([
        "dedup-stream", "--in", ind, "--out", out, "--store", store,
        "--checkpoint", ckpt, "--threshold", "0.5", "--drain",
        "--num-hashes", "16", "--bands", "8",
    ])
    assert rc == 0
    capsys.readouterr()
    leaves = [d for d in os.listdir(os.path.join(store, "banded"))
              if d.startswith("BATCH_PART=")]
    assert len(leaves) >= 2

    rc = main(["sketch-compact", "--store", store])
    outtxt = capsys.readouterr().out
    assert rc == 0 and "compacted" in outtxt
    for side in ("sets", "banded"):
        assert sorted(
            d for d in os.listdir(os.path.join(store, side))
            if d.startswith("BATCH_PART=")
        ) == ["BATCH_PART=-1"]
    banded = spark.read.parquet(os.path.join(store, "banded"))
    assert BUCKET_PART_COL in banded.columns
    assert {r["id"] for r in banded.select("id").distinct().collect()} == {1, 5}


def test_cli_emb_sketch_then_stream(cli_dirs, spark, capsys):
    """emb-sketch bootstraps the embedding store from a batch corpus;
    emb-dedup-stream then drops near-dup vectors of the pre-sketched
    docs and admits fresh ones."""
    import json

    import numpy as np

    corpus = os.path.join(cli_dirs["base"], "es_corpus")
    store = os.path.join(cli_dirs["base"], "es_store")
    rng = np.random.RandomState(9)
    v1 = [float(x) for x in rng.normal(size=12)]
    spark.createDataFrame(
        [(1, v1)], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).write.parquet(corpus)
    rc = main(["emb-sketch", "--in", corpus, "--store", store,
               "--planes", "4", "--bands", "6"])
    assert rc == 0 and "1 vector(s)" in capsys.readouterr().out

    ind = os.path.join(cli_dirs["base"], "es_in"); os.makedirs(ind)
    out = os.path.join(cli_dirs["base"], "es_out")
    near = [float(x + 0.005) for x in v1]
    fresh = [float(x) for x in rng.normal(size=12)]
    with open(os.path.join(ind, "a.jsonl"), "w") as f:
        f.write(json.dumps({"vec_id": 10, "embedding": near}) + "\n")
        f.write(json.dumps({"vec_id": 11, "embedding": fresh}) + "\n")
    rc = main([
        "emb-dedup-stream", "--in", ind, "--out", out, "--store", store,
        "--checkpoint", os.path.join(cli_dirs["base"], "es_ckpt"),
        "--threshold", "0.95", "--planes", "4", "--bands", "6", "--drain",
    ])
    assert rc == 0
    assert {r["vec_id"] for r in spark.read.parquet(out).collect()} == {11}
    ids = {r["id"] for r in spark.read.parquet(os.path.join(store, "vectors")).collect()}
    assert ids == {1, 11}


def test_cli_sketch_compact_detects_mid_swap_embedding_store(cli_dirs, spark, capsys):
    """An embedding store whose previous compaction died with vectors/
    renamed aside must still route to the embedding compactor (the
    bare isdir(vectors) check would misroute it to the text path and
    wedge the store)."""
    import numpy as np

    from chill_spark.llm_ops.incremental_embedding import (
        write_embedding_store,
    )

    store = os.path.join(cli_dirs["base"], "ms_store")
    rng = np.random.RandomState(4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(4)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    write_embedding_store(df, "embedding", "vec_id", store, planes=3, bands=4)
    os.rename(os.path.join(store, "vectors"), os.path.join(store, "vectors__old"))
    os.makedirs(os.path.join(store, "vectors__compacting", "BATCH_PART=-1"))

    rc = main(["sketch-compact", "--store", store])
    out = capsys.readouterr().out
    assert rc == 0 and "vectors" in out
    ids = {r["id"] for r in spark.read.parquet(os.path.join(store, "vectors")).collect()}
    assert ids == {0, 1, 2, 3}


def test_cli_upsert_stream(cli_dirs, spark, capsys):
    base = cli_dirs["base"]
    target = os.path.join(base, "ufs_fact")
    watch = os.path.join(base, "ufs_in")
    os.makedirs(watch)
    from pyspark.sql import functions as F

    from chill_spark.operators.writers import write_fact

    fact = spark.createDataFrame(
        [("s1", "2024-01-01 00:00:00", 1.0)],
        ["SITE", "DATETIME", "CALLS"],
    ).withColumn("DATETIME", F.col("DATETIME").cast("timestamp"))
    write_fact(fact, target)
    spark.createDataFrame(
        [("s1", "2024-01-01 00:00:00", 7.0, 1)],
        ["SITE", "DATETIME", "CALLS", "v"],
    ).withColumn("DATETIME", F.col("DATETIME").cast("timestamp")) \
        .coalesce(1).write.parquet(os.path.join(watch, "u1"))
    rc = main([
        "upsert", "--target", target, "--updates", watch + "/*",
        "--keys", "SITE", "--stream",
        "--schema", "SITE string, DATETIME timestamp, CALLS double, v bigint",
        "--checkpoint", os.path.join(base, "ufs_ckpt"),
        "--version-col", "v", "--available-now",
    ])
    assert rc == 0
    rows = {r["SITE"]: r["CALLS"] for r in spark.read.parquet(target).collect()}
    assert rows == {"s1": 7.0}


def test_cli_profile(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "pf_in")
    spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], ["k", "v"]
    ).write.parquet(src)
    rc = main(["profile", "--in", src, "--columns", "k,v"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rows: 3" in out
    assert "k: nonnull=3 null=0 distinct=2 min=1 max=2" in out
    assert "v: nonnull=2 null=1 distinct=2 min=a max=b" in out

    other = os.path.join(cli_dirs["base"], "pf_b")
    spark.createDataFrame(
        [(1, "a"), (3, "c"), (4, None), (5, "d")], ["k", "v"]
    ).write.parquet(other)
    rc = main(["profile", "--in", src, "--diff", other, "--columns", "k"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "k: rows 3->4" in out and "ndv 2->4 (x2.0)" in out


def test_cli_semdedup(cli_dirs, spark, capsys):
    import numpy as np  # noqa: F401  (parity with other embedding tests)

    src = os.path.join(cli_dirs["base"], "semd_in")
    dst = os.path.join(cli_dirs["base"], "semd_out")
    spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),   # semantic dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(src)
    rc = main([
        "semdedup", "--input", src, "--out", dst,
        "--k", "3", "--iters", "2", "--tau", "0.95",
    ])
    assert rc == 0
    assert "4 -> 3 rows kept (1 semantic dups)" in capsys.readouterr().out
    kept = {r["vec_id"] for r in spark.read.parquet(dst).collect()}
    assert len(kept) == 3 and len(kept & {0, 1}) == 1
    assert {2, 3} <= kept


def test_cli_dsir(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "dsir_in")
    dst = os.path.join(cli_dirs["base"], "dsir_out")
    spark.createDataFrame(
        [
            (0, "the history of science", "tgt"),
            (1, "history of science and more science", "raw"),
            (2, "buy cheap pills online now", "raw"),
            (3, "science history of the age", "raw"),
        ],
        "doc_id bigint, text string, kind string",
    ).write.parquet(src)
    rc = main([
        "dsir", "--input", src, "--out", dst,
        "--target-expr", "kind = 'tgt'", "--n", "2",
    ])
    assert rc == 0
    assert "selected 2 rows" in capsys.readouterr().out
    got = spark.read.parquet(dst)
    assert got.count() == 2
    # target-vocabulary docs outrank the spam row; originals + logw kept
    assert {r["doc_id"] for r in got.collect()} == {1, 3}
    assert {"doc_id", "text", "kind", "logw"} <= set(got.columns)


def test_cli_semdedup_plans_k_from_target_cluster_size(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "semdk_in")
    dst = os.path.join(cli_dirs["base"], "semdk_out")
    rows = [(i, [float(i % 7), float(i % 3), 1.0, 0.0]) for i in range(12)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).write.parquet(src)
    rc = main([
        "semdedup", "--input", src, "--out", dst,
        "--target-cluster-size", "4", "--iters", "1", "--tau", "0.999",
    ])
    assert rc == 0
    assert "planned k=3 for target cluster size 4" in capsys.readouterr().out


def test_cli_heavy_hitters(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "hh_in")
    rows = [(i, "the the the rare" if i % 2 else "the common common")
            for i in range(20)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(src)
    rc = main(["heavy-hitters", "--input", src, "--theta", "0.2"])
    assert rc == 0
    out = capsys.readouterr().out
    # 80 tokens: the=40, common=20, rare=10; theta 0.2 -> >= 16
    assert "the\t40" in out and "common\t20" in out
    assert "rare" not in out
    assert "2 heavy hitters" in out


def test_cli_classify_pseudo_and_explicit_weights(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "clf_in")
    dst = os.path.join(cli_dirs["base"], "clf_out")
    rows = [(1, "good stuff here"), (2, "bad junk text"), (3, "good text")]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(src)
    wpath = os.path.join(cli_dirs["base"], "clf_w")
    spark.createDataFrame(
        [("good", 2000), ("bad", -2000), ("junk", -2000)],
        "tok string, weight bigint",
    ).write.parquet(wpath)
    rc = main([
        "classify", "--input", src, "--out", dst, "--weights", wpath,
        "--threshold", "0.55",
    ])
    assert rc == 0
    assert "kept 2/3" in capsys.readouterr().out
    kept = {r["doc_id"] for r in spark.read.parquet(dst).collect()}
    assert kept == {1, 3}
    # malformed weight table is rejected before any work
    import pytest as _pytest
    bad = os.path.join(cli_dirs["base"], "clf_bad_w")
    spark.createDataFrame([("x", 1)], "tok string, w bigint").write.parquet(bad)
    with _pytest.raises(SystemExit):
        main(["classify", "--input", src, "--out", dst, "--weights", bad])


def test_cli_unimax(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "um_in")
    rows = [(f"d{i}", "en", "a b c d e") for i in range(4)] + [
        ("dx", "fr", "un deux"),
    ]
    spark.createDataFrame(
        rows, "doc_id string, lang string, text string"
    ).write.parquet(src)
    rc = main([
        "unimax", "--input", src, "--budget", "12", "--max-epochs", "2",
        "--group-col", "lang",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # fr: n=2, capped at 4; en: n=20, remainder 8
    assert "fr: n=2 alloc=4 epochs=2.0" in out
    assert "en: n=20 alloc=8 epochs=0.4" in out


def test_cli_cms_batch_and_watch(cli_dirs, spark, capsys):
    import json

    src = os.path.join(cli_dirs["base"], "cms_in")
    rows = [(1, "the the cat"), (2, "the dog")]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(src)
    rc = main([
        "cms", "--input", src, "--query", "the", "cat", "emu",
        "--depth", "3", "--width", "512",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "the\t3" in out and "cat\t1" in out and "emu\t0" in out
    # watch mode: same answers from the streamed store
    watch = os.path.join(cli_dirs["base"], "cmsw_in")
    store = os.path.join(cli_dirs["base"], "cmsw_store")
    os.makedirs(watch, exist_ok=True)
    with open(os.path.join(watch, "w1.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "the the cat"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "the dog"}) + "\n")
    rc = main([
        "cms", "--watch", watch, "--store", store,
        "--query", "the", "cat", "emu", "--depth", "3", "--width", "512",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "the\t3" in out and "cat\t1" in out and "emu\t0" in out


def test_cli_pq_and_ivfpq(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "pq_in")
    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(8)])
            for i in range(30)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).write.parquet(src)
    rc = main([
        "pq", "--input", src, "--query-id", "0", "--n", "5",
        "--m", "2", "--k", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "top-5 by PQ2x4 ADC for id=0" in out
    assert len([ln for ln in out.splitlines() if "\t" in ln]) == 5
    rc = main([
        "pq", "--input", src, "--query-id", "0", "--n", "5",
        "--m", "2", "--k", "4", "--cells", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "IVF4,PQ2 probe=" in out


def test_cli_trend(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "tr_in")
    rows = []
    eid = 0
    for day in range(1, 6):
        for _ in range(day * 2):  # rising volume for 'a'
            rows.append((eid, f"2024-01-{day:02d} 10:00:00", "a")); eid += 1
        rows.append((eid, f"2024-01-{day:02d} 11:00:00", "b")); eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string"
    ).selectExpr(
        "event_id", "CAST(ts AS timestamp) AS ts", "event_type"
    ).write.parquet(src)
    rc = main(["trend", "--input", src])
    assert rc == 0
    out = capsys.readouterr().out
    # 'a' rises 2/day (slope 2), 'b' is flat (slope 0, mad 0)
    assert "a\tslope=2.0" in out
    assert "b\tslope=0.0" in out and "mad=0.0" in out


def test_cli_heavy_hitters_watch_mode(cli_dirs, spark, capsys):
    import json
    watch = os.path.join(cli_dirs["base"], "hhw_in")
    store = os.path.join(cli_dirs["base"], "hhw_store")
    ckpt = os.path.join(cli_dirs["base"], "hhw_ckpt")
    os.makedirs(watch, exist_ok=True)
    with open(os.path.join(watch, "w1.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "the the the cat"}) + "\n")
    rc = main([
        "heavy-hitters", "--watch", watch,
        "--schema", "doc_id BIGINT, text STRING",
        "--store", store, "--checkpoint", ckpt, "--theta", "0.5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "the\t3\tguaranteed" in out
    # missing the stream trio fails fast
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        main(["heavy-hitters", "--watch", watch])
    with _pytest.raises(SystemExit):
        main(["heavy-hitters"])


def test_cli_scd2(cli_dirs, spark, capsys):
    from datetime import datetime as dt

    target = os.path.join(cli_dirs["base"], "scd2_dim")
    u1 = os.path.join(cli_dirs["base"], "scd2_u1")
    u2 = os.path.join(cli_dirs["base"], "scd2_u2")
    schema = "cust_id bigint, tier string, eff_ts timestamp"
    spark.createDataFrame(
        [(1, "gold", dt(2024, 1, 1)), (2, "bronze", dt(2024, 1, 1))], schema
    ).write.parquet(u1)
    spark.createDataFrame(
        [(1, "platinum", dt(2024, 2, 1))], schema
    ).write.parquet(u2)
    rc = main(["scd2", "--target", target, "--updates", u1,
               "--keys", "cust_id", "--batch-id", "0"])
    assert rc == 0
    assert "inserted=2 closed=0" in capsys.readouterr().out
    rc = main(["scd2", "--target", target, "--updates", u2,
               "--keys", "cust_id", "--batch-id", "1"])
    assert rc == 0
    assert "closed=1" in capsys.readouterr().out
    cur = {r["cust_id"]: r["tier"]
           for r in spark.read.parquet(f"{target}/current").collect()}
    assert cur == {1: "platinum", 2: "bronze"}
    assert spark.read.parquet(f"{target}/history").count() == 1


def test_cli_rp(cli_dirs, spark, capsys):
    src = os.path.join(cli_dirs["base"], "rp_in")
    dst = os.path.join(cli_dirs["base"], "rp_out")
    rows = [(i, [float((i * j) % 5) for j in range(16)]) for i in range(6)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).write.parquet(src)
    rc = main(["rp", "--input", src, "--out", dst, "--k", "4"])
    assert rc == 0
    assert "projected 6 vectors to 4 dims (24 rows)" in capsys.readouterr().out
    out = spark.read.parquet(dst)
    assert set(out.columns) == {"vec_id", "rp_dim", "value"}
    assert out.count() == 24


def test_cli_compact_dry_run(cli_dirs, spark, capsys):
    from pyspark.sql import functions as F

    from chill_spark.operators.writers import write_fact

    path = os.path.join(cli_dirs["base"], "cdr_fact")
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", f"s{i}", float(i)) for i in range(60)],
        ["DATETIME", "SITE", "CALLS"],
    ).withColumn("DATETIME", F.col("DATETIME").cast("timestamp"))
    write_fact(df.repartition(10), path)
    rc = main(["compact", "--in", path, "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "-> COMPACT" in out and "1/1 partition(s) would be compacted" in out
    # dry run rewrote nothing
    leaf = os.path.join(path, "DT_PART=202401010000")
    assert len([f for f in os.listdir(leaf) if f.endswith(".parquet")]) > 1


def test_sketch_and_emb_sketch_journal_and_health_cli(spark, tmp_path, capsys):
    """`sketch --journal/--health` and `emb-sketch --journal/--health`
    surface the dedup maintainers' in-band store health without
    requiring --in."""
    import json

    from chill_spark.cli import main
    from chill_spark.llm_ops.incremental_dedup import write_sketch_store
    from chill_spark.llm_ops.incremental_embedding import (
        write_embedding_store,
    )
    from chill_spark.llm_ops.storefs import write_health_event

    store = str(tmp_path / "sk_store")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    write_sketch_store(docs, "text", "doc_id", store)
    assert main(["sketch", "--store", store, "--health"]) == 0
    h = json.loads(capsys.readouterr().out.strip())
    assert h["compact"] is False and h["rows_bootstrap"] > 0
    write_health_event(store, 3, {"compact": False}, spark=spark)
    assert main(["sketch", "--store", store, "--journal"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1])["batch_id"] == 3

    estore = str(tmp_path / "emb_store")
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], ["vec_id", "embedding"],
    )
    write_embedding_store(vecs, "embedding", "vec_id", estore, planes=4)
    assert main(["emb-sketch", "--store", estore, "--health"]) == 0
    h = json.loads(capsys.readouterr().out.strip())
    assert h["compact"] is False and h["rows_total"] == 1
    write_health_event(estore, 0, {"rebuild": False}, spark=spark)
    assert main(["emb-sketch", "--store", estore, "--journal"]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["batch_id"] == 0


def test_cli_e2e_auto_appends_store_health_for_participating_stores(
    cli_dirs, spark, capsys
):
    """The r10 verdict's order #6: a CI job chains CLI commands
    through one driver process; when any of them touched a journaled
    persisted store, the final e2e JUnit artifact must carry the
    Store Health suite for exactly those roots — no separate
    `reconcile --store-health` invocation. A frozen benchmark index
    (no journal, no appended leaves) passes with the frozen
    annotation; a store that gained appended leaves with no journal
    fails the artifact."""
    import json as _json

    from chill_spark.llm_ops.incremental_substring import (
        substring_store_append,
        write_substring_store,
    )
    from chill_spark.llm_ops.storefs import (
        participating_stores,
        reset_store_participation,
    )

    reset_store_participation()
    base = cli_dirs["base"]
    # no store touched yet: the e2e report has NO Store Health suite
    report0 = os.path.join(base, "e2e_sh0.xml")
    assert main([
        "e2e", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", os.path.join(base, "out_sh0"), "--report", report0,
    ]) == 0
    assert "Store Health" not in open(report0).read()

    # a chained corpus-prep --bench-store run uses the frozen index
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h")], ["doc_id", "text"]
    )
    store = os.path.join(base, "bench_store")
    write_substring_store(bench, "text", "doc_id", store, L=4,
                          bucket_partitions=4)
    corpus = spark.createDataFrame(
        [(i, "s0", " ".join(f"w{i}_{j}" for j in range(40)))
         for i in range(1, 4)],
        ["doc_id", "source", "text"],
    )
    src = os.path.join(base, "prep_in")
    corpus.write.parquet(src)
    assert main([
        "corpus-prep", "--input", src,
        "--out", os.path.join(base, "prep_out"),
        "--bench-store", store, "--length", "4", "--min-tokens", "1",
    ]) == 0
    assert store in participating_stores()

    report1 = os.path.join(base, "e2e_sh1.xml")
    assert main([
        "e2e", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", os.path.join(base, "out_sh1"), "--report", report1,
    ]) == 0
    xml = open(report1).read()
    assert "Store Health" in xml and "bench_store" in xml
    assert 'failures="0"' in xml

    # the store gains an appended leaf with no journal: rotting, and
    # the next e2e artifact must FAIL on it
    substring_store_append(
        spark.createDataFrame([(9, "p q r s t u v w")],
                              ["doc_id", "text"]),
        "text", "doc_id", store,
    )
    report2 = os.path.join(base, "e2e_sh2.xml")
    assert main([
        "e2e", "--job", cli_dirs["job"], "--catalog", cli_dirs["catalog"],
        "--out", os.path.join(base, "out_sh2"), "--report", report2,
    ]) == 1
    assert "no _health events" in open(report2).read()
    reset_store_participation()


def test_cli_attribution_lifecycle(cli_dirs, spark, capsys):
    """attribution --build / --update / --report / --journal: the CLI
    closure of the steady-state contamination attribution — the
    report equals the one-shot batch operator over the same docs, and
    --build resets running counters."""
    import json as _json

    from chill_spark.llm_ops.substring import contamination_attribution

    base = cli_dirs["base"]
    store = os.path.join(base, "attr_cli_store")
    bench = spark.createDataFrame(
        [(100, "a b c d e f"), (101, "p q r s")], ["doc_id", "text"]
    )
    suite_pq = os.path.join(base, "attr_suite")
    bench.write.parquet(suite_pq)
    assert main(["attribution", "--store", store, "--build",
                 "--in", suite_pq, "--length", "4", "--buckets", "4"]) == 0
    w1 = spark.createDataFrame(
        [(1, "x a b c d y p q r s k")], ["doc_id", "text"]
    )
    w2 = spark.createDataFrame([(2, "a b c d e f g h")], ["doc_id", "text"])
    for i, w in enumerate([w1, w2]):
        pq = os.path.join(base, f"attr_w{i}")
        w.write.parquet(pq)
        assert main(["attribution", "--store", store, "--update",
                     "--in", pq]) == 0
    capsys.readouterr()
    assert main(["attribution", "--store", store]) == 0
    got = {
        r["bench_id"]: (r["n_grams"], r["hit_grams"], r["n_occurrences"],
                        r["n_corpus_docs"])
        for r in map(_json.loads,
                     capsys.readouterr().out.strip().splitlines())
    }
    want = {
        r["bench_id"]: (r["n_grams"], r["hit_grams"], r["n_occurrences"],
                        r["n_corpus_docs"])
        for r in contamination_attribution(
            w1.unionByName(w2), bench, "text", "doc_id", 4
        ).collect()
    }
    assert got == want
    # --build resets the running state
    assert main(["attribution", "--store", store, "--build",
                 "--in", suite_pq, "--length", "4", "--buckets", "4"]) == 0
    capsys.readouterr()
    assert main(["attribution", "--store", store]) == 0
    rows = [_json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert all(r["hit_grams"] == 0 for r in rows)


def test_cli_attribution_update_heartbeats_health_journal(
    cli_dirs, spark, capsys
):
    """A manual `attribution --update` workflow must pass the e2e
    Store Health gate: each CLI fold heartbeats the journal with the
    counters-leaf frontier (like the streaming maintainer), so the
    store reads fresh, not as an un-journaled mutation."""
    from chill_spark.llm_ops.storefs import latest_health_event
    from chill_spark.report.store_health import journal_freshness

    base = cli_dirs["base"]
    store = os.path.join(base, "attr_hb_store")
    suite = os.path.join(base, "attr_hb_suite")
    spark.createDataFrame(
        [(100, "a b c d e")], ["doc_id", "text"]
    ).write.parquet(suite)
    assert main(["attribution", "--store", store, "--build",
                 "--in", suite, "--length", "4"]) == 0
    batch = os.path.join(base, "attr_hb_b1")
    spark.createDataFrame(
        [(1, "a b c d")], ["doc_id", "text"]
    ).write.parquet(batch)
    assert main(["attribution", "--store", store, "--update",
                 "--in", batch]) == 0
    ev = latest_health_event(store, spark=spark)
    assert ev is not None and ev["n_append_batches"] == 1
    h = journal_freshness(spark, store, data_subdir="counters")
    assert h["lag"] == 0 and not h["stale"] and not h["actions"]

"""Excel config loaders (stdlib xlsx reader): Chill sheet -> JobSpec,
HLD workbook -> Catalog, then an E2E run driven purely from Excel."""

from __future__ import annotations

import os
import shutil

import pytest

from chill_spark.config.excel import load_chill_xlsx, load_hld_xlsx
from chill_spark.config.xlsx import read_xlsx, write_xlsx

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_xlsx_roundtrip(tmp_path):
    path = str(tmp_path / "t.xlsx")
    sheets = {
        "S1": [["a", 1, 2.5], [None, "x&<y>", True]],
        "S2": [["only", None, "sparse"]],
    }
    write_xlsx(path, sheets)
    got = read_xlsx(path)
    assert got["S1"][0] == ["a", 1, 2.5]
    assert got["S1"][1][1] == "x&<y>" and got["S1"][1][2] is True
    assert got["S2"][0][2] == "sparse"


CHILL_ROWS = [
    ["input_rd", "/data/in"],
    ["input_rd_mask", "*.csv"],
    ["delimiter", ","],
    ["valid_lines", "[2:]"],
    ["ignore_lines", "JUNK|SKIP"],
    ["view"],
    ["cells", "SELECT cell_id, region FROM cells"],
    ["field"],
    ["OM_GROUP", "filename", None, None, None, "'OM_CELL' if arg1[0:1] == 'A' else 'OM_NODE'"],
    ["DATETIME", "column", None, "_file", None,
     "datetime.strptime(arg1[1:14], '%Y%m%d.%H%M').strftime('%Y-%m-%d %H:%M:%S')",
     None, None, "ALL"],
    ["REGION", "lookup", None, "site", None,
     "view[view['cell_id'] == arg1]['region'].values[0]", "cells", "UNK", "CELL_STATS"],
]

HLD_SHEETS = {
    "Tables": [
        [None, "Table Name", "Counter Group in RD", "Base Granularity"],
        [None, "-", "-", "-"],
        [None, "-", "-", "-"],
        [None, "CELL_STATS", "OM_CELL", "15M"],
        [None, "NODE_STATS", "OM_NODE", "HR"],
    ],
    "Key_Counters_Kpis": [
        [None, "Table Name", "Counter/KPI DB Name", "Raw Data Counter Name/OID",
         "TYPE", "Data Type", "Formula"],
        [None, "-", "-", "-", "-", "-", "-"],
        [None, "-", "-", "-", "-", "-", "-"],
        [None, "CELL_STATS", "SITE", "site", "KEY", "string"],
        [None, "CELL_STATS", "CALLS", "calls_raw", "COUNTER", "double"],
        [None, "CELL_STATS", "DROPS", "drops_raw", "COUNTER", "double"],
        [None, "CELL_STATS", "DROP_RATE", None, "KPI", "double", "DROPS/CALLS"],
        [None, "NODE_STATS", "NODE", "node", "KEY", "string"],
        [None, "NODE_STATS", "CPU", "cpu_raw", "COUNTER", "double"],
    ],
}


def test_load_chill_sheet(tmp_path):
    path = str(tmp_path / "chill.xlsx")
    write_xlsx(path, {"Chill": CHILL_ROWS})
    job = load_chill_xlsx(path)
    assert job.input_dir == "/data/in" and job.input_mask == "*.csv"
    assert job.valid_lines == (2, None)
    assert job.ignore_lines == ["JUNK", "SKIP"]
    assert job.views == {"cells": "SELECT cell_id, region FROM cells"}
    by_name = {f.name: f for f in job.fields}
    assert by_name["OM_GROUP"].source == "filename"
    assert by_name["DATETIME"].inputs == ["_file"]
    assert by_name["REGION"].source == "lookup"
    assert by_name["REGION"].view == "cells"
    assert by_name["REGION"].default == "UNK"
    assert by_name["REGION"].counter_set == "CELL_STATS"


def test_load_hld_workbook(tmp_path):
    path = str(tmp_path / "hld.xlsx")
    write_xlsx(path, HLD_SHEETS)
    cat = load_hld_xlsx(path)
    assert set(cat.tables) == {"CELL_STATS", "NODE_STATS"}
    cell = cat.tables["CELL_STATS"]
    assert cell.counter_group == "OM_CELL"
    assert cell.base_granularity == "15M"
    assert cell.key_fields == ["SITE"]
    assert [c.db_name for c in cell.counters] == ["CALLS", "DROPS"]
    kpi = cell.kpis[0]
    assert kpi.db_name == "DROP_RATE" and kpi.formula == "DROPS/CALLS"
    assert cat.tables["NODE_STATS"].base_granularity == "HR"
    assert cat.route("OM_CELL").name == "CELL_STATS"


def test_excel_driven_e2e(spark, tmp_path):
    """Full run configured from Excel only: files -> route -> derive ->
    write; KPI recomputed at read time."""
    from pyspark.sql import functions as F

    from chill_spark.operators.project import with_kpis
    from chill_spark.operators.writers import read_fact
    from chill_spark.pipeline import run_batch

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "A20240101.0000_x.csv"), "w") as f:
        f.write("JUNK\nextra\nsite,calls_raw,drops_raw\ns1,100,4\n")

    chill_rows = [
        ["input_rd", in_dir],
        ["input_rd_mask", "*.csv"],
        ["valid_lines", "[2:]"],
        ["ignore_lines", "JUNK"],
        ["field"],
        ["OM_GROUP", "constant", None, None, "OM_CELL", None],
        ["DATETIME", "column", None, "_file", None,
         "datetime.strptime(arg1[1:14], '%Y%m%d.%H%M').strftime('%Y-%m-%d %H:%M:%S')",
         None, None, "ALL"],
    ]
    chill_path = str(tmp_path / "chill.xlsx")
    hld_path = str(tmp_path / "hld.xlsx")
    write_xlsx(chill_path, {"Chill": chill_rows})
    write_xlsx(hld_path, HLD_SHEETS)

    job = load_chill_xlsx(chill_path)
    cat = load_hld_xlsx(hld_path)
    out = str(tmp_path / "out")
    run_batch(spark, job, cat, out)

    fact = read_fact(spark, f"{out}/CELL_STATS_15M")
    row = with_kpis(fact, cat.tables["CELL_STATS"]).collect()[0]
    assert row["SITE"] == "s1" and row["CALLS"] == 100.0
    assert row["DROP_RATE"] == pytest.approx(0.04)

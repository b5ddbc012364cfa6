"""Local replica of the driver's DuckDB correctness gate.

Runs a Spark query and its ANSI-SQL oracle over the same parquet
tables and compares row count, sorted column names, and an
order-insensitive value hash (values normalized: floats rounded,
timestamps formatted, None canonicalized).
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytearray):
        v = bytes(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def duckdb_run(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _driver_sortable(cols: list[str], rows: list[tuple]) -> None:
    """Replicate the driver's canonicalization step: it sorts the RAW
    pandas result frame by every column, which raises ``TypeError:
    unhashable type`` on list/struct cells (r3's only red row). Run
    the same sort here so complex-typed output columns fail the local
    gate before the driver ever sees them."""
    import pandas as pd

    if not rows:
        return
    df = pd.DataFrame(rows, columns=cols)
    df.sort_values(by=sorted(cols), kind="stable")


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)
    _driver_sortable(s_cols, [tuple(r) for r in s_rows])
    _driver_sortable(d_cols, d_rows)
    res = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
    }
    res["count_match"] = res["rows_spark"] == res["rows_oracle"]
    res["schema_match"] = res["cols_spark"] == res["cols_oracle"]
    res["hash_match"] = (
        res["count_match"]
        and res["schema_match"]
        and _hash_rows(s_cols, [tuple(r) for r in s_rows]) == _hash_rows(d_cols, d_rows)
    )
    return res


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str):
    res = compare(spark_df, oracle_sql, sf_dir)
    assert res["count_match"], f"row count mismatch: {res}"
    assert res["schema_match"], f"schema mismatch: {res}"
    assert res["hash_match"], f"value hash mismatch: {res}"

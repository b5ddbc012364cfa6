"""Strict pandas-dtype sweep of every registered query vs its oracle.

The driver's correctness gate compares values through pandas frames
(duckdb .fetchdf() vs spark .toPandas()), where type divergences the
fetchall()-based local harness hides become visible:

- DuckDB sum(INT/BIGINT) -> HUGEINT -> pandas float64/object, while
  Spark sum(int) -> int64;
- DECIMAL outputs -> DuckDB float64 vs Spark object(Decimal);
- DATE vs TIMESTAMP rendering.

Run:  python tests/strict_sweep.py [sf_dir] [name_filter...] \\
          [--artifact SWEEP_rN.json]
Prints one line per query (with spark/oracle wall seconds):
OK / MISMATCH(kind) / NO_ORACLE / ERROR.

``--artifact PATH`` additionally writes (merging per-sf sections into
an existing file, so the sf0.01 and sf0.1 runs share one artifact)
the machine-readable sweep record the r10 verdict asked to be
committed per round: the extended tier has no driver rows, so its
standing gate must be auditable from the repo without re-running
Spark. Schema pinned by tests/test_sweep_artifact.py.

Filters are substring INCLUDES; prefix with ``-`` to EXCLUDE instead.
The sf0.1 sweep excludes the two queries whose all-pairs verification
oracle is deliberately quadratic and only sized for the sf0.01 driver
gate (note ``-_cc_`` would NOT match q_embedding_dedup_cc — no
trailing underscore):

    python tests/strict_sweep.py /root/testdata/sf0.1 \\
        -q_dedup_cc_keep_longest -q_embedding_dedup_cc
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from tests.oracle_harness import TABLES  # noqa: E402


def _norm_cell(v) -> str:
    """Render a pandas cell the way a type-sensitive hash would see it."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        # round-1 driver evidence: last-ulp float diffs pass its hash,
        # so it rounds floats — but it does NOT unify int64 with float64.
        return repr(round(float(v), 6))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, Decimal):
        return "Decimal:" + str(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        return "ts:" + str(v)
    if isinstance(v, date):
        return "date:" + str(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "bytes:" + bytes(v).hex()
    return "s:" + str(v)


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's canonicalization EXACTLY: sort the RAW
    pandas frame by every column before any value normalization. The
    driver does this (``sort_values`` → ``Categorical`` →
    ``factorize``), so a list/struct-typed output cell raises
    ``TypeError: unhashable type`` there — r3's only red row
    (q_winnowing_fingerprints) was exactly this, invisible to a local
    gate that stringified list cells before sorting. Running the same
    sort here makes that class of breakage fail locally first."""
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols, kind="stable").reset_index(drop=True)


def frame_lines(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    df = df[cols]
    lines = [
        "\x1f".join(_norm_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(lines)


def diff_kind(s_lines, d_lines) -> str:
    if len(s_lines) != len(d_lines):
        return f"rowcount {len(s_lines)} vs {len(d_lines)}"
    for a, b in zip(s_lines, d_lines):
        if a != b:
            ca, cb = a.split("\x1f"), b.split("\x1f")
            for x, y in zip(ca, cb):
                if x != y:
                    return f"cell {x!r} vs {y!r}"
    return ""


def main() -> int:
    args = sys.argv[1:]
    artifact = None
    if "--artifact" in args:
        i = args.index("--artifact")
        if i + 1 >= len(args):
            print("strict_sweep: --artifact needs a path", file=sys.stderr)
            return 2
        artifact = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1:]

    from pyspark.sql import SparkSession

    from chill_spark import queries as Q

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("strict-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    reg = Q.queries()
    includes = [f for f in name_filter if not f.startswith("-")]
    excludes = [f[1:] for f in name_filter if f.startswith("-")]
    names = [
        n for n in reg
        if (not includes or any(f in n for f in includes))
        and not any(f in n for f in excludes)
    ]
    n_bad = 0
    record: dict[str, dict] = {}
    import time as _time

    for name in names:
        sql = Q.ORACLE_SQL.get(name)
        if sql is None:
            print(f"{name}: NO_ORACLE", flush=True)
            record[name] = {"status": "NO_ORACLE"}
            continue
        try:
            t0 = _time.perf_counter()
            sdf = reg[name](spark, sf_dir).toPandas()
            t_spark = _time.perf_counter() - t0
            t0 = _time.perf_counter()
            ddf = con.execute(sql).fetchdf()
            t_duck = _time.perf_counter() - t0
            if sorted(sdf.columns) != sorted(ddf.columns):
                print(
                    f"{name}: MISMATCH(schema {sorted(sdf.columns)} vs"
                    f" {sorted(ddf.columns)})"
                )
                record[name] = {
                    "status": "MISMATCH",
                    "kind": f"schema {sorted(sdf.columns)} vs "
                            f"{sorted(ddf.columns)}",
                }
                n_bad += 1
                continue
            # driver-parity step: must not raise (unhashable cells)
            sdf, ddf = driver_canon(sdf), driver_canon(ddf)
            kind = diff_kind(frame_lines(sdf), frame_lines(ddf))
            timing = f"[spark {t_spark:.1f}s, oracle {t_duck:.1f}s]"
            record[name] = {
                "status": "MISMATCH" if kind else "OK",
                "spark_s": round(t_spark, 2),
                "oracle_s": round(t_duck, 2),
                "rows": int(len(sdf)),
            }
            if kind:
                record[name]["kind"] = kind
                print(f"{name}: MISMATCH({kind}) {timing}", flush=True)
                n_bad += 1
            else:
                print(f"{name}: OK {timing}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR({type(e).__name__}: {str(e)[:160]})",
                  flush=True)
            record[name] = {
                "status": "ERROR",
                "kind": f"{type(e).__name__}: {str(e)[:160]}",
            }
            n_bad += 1
    print(f"\n{n_bad} problematic / {len(names)} swept")
    if artifact:
        write_artifact(artifact, sf_dir, name_filter, record, n_bad)
        print(f"artifact: {artifact}")
    return 0


def write_artifact(path: str, sf_dir: str, name_filter: list[str],
                   record: dict[str, dict], n_bad: int) -> None:
    """Merge this run's results into the per-round sweep artifact.

    One file per round holds one section per sf directory (keyed by
    its basename, e.g. ``sf0.01``), so the sf0.01 full sweep and the
    sf0.1 sweep (minus the documented quadratic-oracle excludes,
    recorded in ``filters``) land in the same committed JSON. Schema
    (pinned by tests/test_sweep_artifact.py):

        {"schema": 1, "sweeps": {"<sf>": {"sf_dir", "filters",
         "swept", "problematic", "queries": {name: {"status":
         OK|MISMATCH|ERROR|NO_ORACLE, "spark_s", "oracle_s", "rows",
         "kind"?}}}}}
    """
    import json
    import os

    doc = {"schema": 1, "sweeps": {}}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc.setdefault("schema", 1)
    doc.setdefault("sweeps", {})
    doc["sweeps"][os.path.basename(sf_dir.rstrip("/"))] = {
        "sf_dir": sf_dir,
        "filters": name_filter,
        "swept": len(record),
        "problematic": n_bad,
        "queries": record,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")


if __name__ == "__main__":
    sys.exit(main())

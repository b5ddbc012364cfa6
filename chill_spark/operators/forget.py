"""Right-to-be-forgotten: targeted key deletion from a partitioned
fact, propagated to its rollup ladder.

The compliance operation every corpus/metrics store eventually needs:
remove every row belonging to a set of subject keys (user ids, doc
ids, source domains) WITHOUT rewriting the table. Shape:

  locate   one scan with the key predicate PUSHED to the parquet
           reader (row-group stats skip untouched files) producing
           the touched-partition list + per-partition forget counts —
           the only corpus-wide pass, and it reads only the key and
           partition columns.
  rewrite  partitions where every row is forgotten are DELETED as
           directories (the retention fast path — no data read);
           partially-touched partitions are rewritten survivor-only
           via dynamic partition overwrite (planning-time pruned to
           exactly the touched list). Untouched partitions are never
           opened.
  repair   derived rollup ladders re-aggregate ONLY the windows
           covering touched partitions (`maintain_ladder_increment`),
           so the ladder converges to "as if the keys never existed"
           at incremental cost.

Idempotent end to end: a replayed forget finds zero matching rows and
touches nothing; ``forget_and_repair`` journals the touched-window
plan BEFORE mutating (``_forget_pending.json`` under the ladder root),
so a crash anywhere between the base rewrite and the ladder repair is
healed by re-running — the journaled windows re-enter the repair even
though the re-run's own locate scan matches nothing.

Requires the flat ``DT_PART`` layout (write_fact's) — the same
contract as merge_upsert.

Reference parity: the reference's delete-then-reload loop
(HlxTools.py:372-394) deletes whole DATETIME slices; this is the
key-targeted generalization its compliance requests would need.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .writers import PARTITION_COL


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(conf)


def forget_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list,
) -> dict:
    """Hard-delete every row whose ``key_col`` is in ``keys`` from a
    ``DT_PART``-partitioned fact. Returns::

        {"rows_forgotten": int,
         "partitions_rewritten": [DT_PART values],
         "partitions_deleted":   [DT_PART values],   # became empty
         "touched_datetimes":    [datetime, ...]}    # for ladder repair

    ``keys`` is the bounded subject list of a compliance request (it
    becomes an IN predicate the parquet scan pushes down); for huge
    key sets run in batches. NULL keys never match (a NULL was never a
    subject)."""
    if not keys:
        return {
            "rows_forgotten": 0,
            "partitions_rewritten": [],
            "partitions_deleted": [],
            "touched_datetimes": [],
        }
    df = spark.read.parquet(path)
    from .writers import BATCH_COL

    if BATCH_COL in df.columns:
        # a (DT_PART, BATCH_PART) stream sink needs batch-aware
        # rewrites; a flat partitionBy(DT_PART) overwrite here would
        # silently demote BATCH_PART to a data column and break the
        # sink's replay contract — fail loud instead
        raise ValueError(
            f"forget_keys requires the flat {PARTITION_COL} layout; "
            f"{path} is {BATCH_COL}-sub-partitioned (compact it to a "
            "flat fact first)"
        )
    df = df.withColumn(
        # partition discovery type-infers the yyyyMMddHHmm value as a
        # bigint; pin it to the string form the directory names use
        PARTITION_COL, F.col(PARTITION_COL).cast("string")
    )
    hit = F.col(key_col).isin(keys)
    # pass 1: touched partitions + forget counts. The isin predicate is
    # pushed to the scan, so files whose row-group stats exclude every
    # key are skipped without reading data.
    touched = {
        r["p"]: r["n"]
        for r in df.filter(hit)
        .groupBy(F.col(PARTITION_COL).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not touched:
        return {
            "rows_forgotten": 0,
            "partitions_rewritten": [],
            "partitions_deleted": [],
            "touched_datetimes": [],
        }
    part_list = sorted(touched)
    # pass 2: totals for ONLY the touched partitions (planning-time
    # pruned) — distinguishes fully-forgotten partitions (directory
    # delete, no rewrite) from partial ones.
    totals = {
        r["p"]: r["n"]
        for r in df.filter(F.col(PARTITION_COL).isin(part_list))
        .groupBy(F.col(PARTITION_COL).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    doomed = [p for p in part_list if touched[p] == totals[p]]
    partial = [p for p in part_list if touched[p] < totals[p]]
    if partial:
        (
            df.filter(F.col(PARTITION_COL).isin(partial))
            # null-safe survivor predicate: ~isin is NULL (not TRUE)
            # for a NULL key, which would silently forget NULL rows
            .filter(~hit | F.col(key_col).isNull())
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COL)
            .parquet(path)
        )
    if doomed:
        jvm, fs = _fs(spark, path)
        for p in doomed:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    path, f"{PARTITION_COL}={p}"
                ),
                True,
            )
    return {
        "rows_forgotten": sum(touched.values()),
        "partitions_rewritten": partial,
        "partitions_deleted": doomed,
        "touched_datetimes": [
            datetime.strptime(p, "%Y%m%d%H%M") for p in part_list
        ],
    }


def forget_and_repair(
    spark: SparkSession,
    base_path: str,
    out_root: str,
    table,
    key_col: str,
    keys: list,
    levels: list[str] | None = None,
    agg_map: dict[str, str] | None = None,
) -> dict:
    """``forget_keys`` on the base fact, then re-aggregate every
    ladder window covering a touched partition — the derived tables
    converge to "as if the keys never existed" without a full
    rebuild. Returns the forget report plus {"repaired": {level:
    [window starts]}}."""
    from ..llm_ops.storefs import StoreFS, read_store_json, write_store_json
    from .incremental import (
        base_periods,
        maintain_ladder_increment,
        truncate_py,
        window_end,
    )
    from .writers import read_fact

    marker = "_forget_pending.json"
    # Crash-healing journal: a replayed forget matches nothing, so
    # WITHOUT a journal a crash anywhere between the base rewrite and
    # the ladder repair would strand the touched windows stale forever
    # (the re-run would see touched_datetimes=[]). So: locate the
    # touched windows FIRST (same pushed scan forget_keys runs), merge
    # any prior run's unfinished windows, persist the plan, and only
    # then mutate; the marker is cleared after the repair (and the
    # stale-window drop below) completed.
    pending = read_store_json(out_root, name=marker, spark=spark) or {}
    pre = {
        datetime.strptime(str(r["p"]), "%Y%m%d%H%M")
        for r in spark.read.parquet(base_path)
        .filter(F.col(key_col).isin(keys) if keys else F.lit(False))
        .select(F.col(PARTITION_COL).cast("string").alias("p"))
        .distinct().collect()
    }
    dts = sorted(
        pre | {datetime.fromisoformat(s) for s in pending.get("datetimes", [])}
    )
    if dts:
        write_store_json(
            out_root, {"datetimes": [d.isoformat() for d in dts]},
            name=marker, spark=spark,
        )
    report = forget_keys(spark, base_path, key_col, keys)
    report["touched_datetimes"] = dts
    report["repaired"] = maintain_ladder_increment(
        spark, base_path, out_root, table,
        dts, levels=levels, agg_map=agg_map,
    )
    # A window whose base rows were ALL forgotten re-aggregates to an
    # EMPTY frame, and dynamic partition overwrite never touches
    # partitions absent from the written data — so the stale ladder
    # partition must be deleted explicitly, mirroring the base-side
    # directory delete.
    dropped: dict[str, list] = {}
    for g in report["repaired"]:
        lvl_path = f"{out_root}/{table.name}_{g}"
        stale = []
        for w in report["repaired"][g]:
            periods = base_periods(
                w, window_end(w, g), table.base_granularity
            )
            if read_fact(spark, base_path, datetimes=periods).head(1) == []:
                stale.append(w)
        if stale:
            jvm, fs = _fs(spark, lvl_path)
            for w in stale:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(
                        lvl_path,
                        f"{PARTITION_COL}={w.strftime('%Y%m%d%H%M')}",
                    ),
                    True,
                )
            dropped[g] = stale
    report["ladder_partitions_deleted"] = dropped
    if dts:
        StoreFS(out_root, spark).delete(f"{out_root}/{marker}")
    return report

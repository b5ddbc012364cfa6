"""Retention / thinout (SURVEY §2.7): per-granularity TTL partition drop.

The reference configures thinout windows per table suffix
(HlxTools.py:620-631): 5M/15M/HH -> 30 d, HR -> 90 d, DY -> 3650 d,
WK -> 3600 d, MO/YR -> 3 y. Partition-dropping is a metadata
operation — no data scan: expired DT_PART directories are removed via
the Hadoop FileSystem API (the parquet analog of Delta
``DELETE WHERE`` + ``VACUUM``).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import SparkSession

from ..catalog.model import GRANULARITIES
from .writers import PARTITION_COL


def expired_partitions(
    spark: SparkSession, path: str, granularity: str, now: datetime
) -> list[str]:
    """Partition directory names older than the granularity's TTL."""
    cutoff = now - timedelta(days=GRANULARITIES[granularity]["retention_days"])
    cutoff_key = cutoff.strftime("%Y%m%d%H%M")
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if name.startswith(f"{PARTITION_COL}="):
            val = name.split("=", 1)[1]
            if val < cutoff_key:
                out.append(name)
    return out


def apply_retention(
    spark: SparkSession, path: str, granularity: str, now: datetime | None = None
) -> list[str]:
    """Drop expired partitions; returns the dropped directory names."""
    now = now or datetime.utcnow()
    doomed = expired_partitions(spark, path, granularity, now)
    if not doomed:
        return []
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    base = jvm.org.apache.hadoop.fs.Path(path)
    fs = base.getFileSystem(conf)
    for name in doomed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(path, name), True)
    return doomed

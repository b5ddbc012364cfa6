"""Lookup-view execution (S6) — the reference runs each configured
SQL view against Oracle once at startup and caches the result as an
in-memory frame for per-row probes (Partrans.py:124-140,
ManagedDbConnection.py:21-34).

Spark-native: each view's SQL runs through ``spark.sql`` against
whatever the session catalog resolves (parquet dim snapshots
registered as temp views, catalog tables, ...), or — when a JDBC URL
is given — is pushed down to the remote database as a subquery scan.
Results are cached: they're broadcast-join build sides (J1), read
once per view, probed everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def execute_views(
    spark: SparkSession,
    views: dict[str, str],
    jdbc_url: str | None = None,
    jdbc_properties: dict[str, str] | None = None,
    cache: bool = True,
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name, sql in views.items():
        if jdbc_url:
            df = (
                spark.read.format("jdbc")
                .option("url", jdbc_url)
                .option("query", sql)
                .options(**(jdbc_properties or {}))
                .load()
            )
        else:
            df = spark.sql(sql)
        if cache:
            df = df.cache()
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

"""Config/dimension-table derivation (A2, "CfgTable").

The reference schedules an external job that refreshes entity
dimension tables from fact keys every 12 h (HlxTools.py:534-572,
728-761). Spark-native: distinct fact keys merged into the dim —
new keys appended, existing rows preserved (the parquet analog of
Delta MERGE WHEN NOT MATCHED INSERT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def derive_cfg_table(fact: DataFrame, key_fields: list[str]) -> DataFrame:
    """Entity dimension = distinct key tuples observed in the fact."""
    return fact.select(*key_fields).distinct()


def merge_cfg_table(
    spark: SparkSession, fact: DataFrame, key_fields: list[str], dim_path: str
) -> DataFrame:
    """Merge newly-observed keys into a persisted dim table.

    Anti-join keeps only unseen keys, append-writes them; the read-back
    is returned. Dim tables are small (entity cardinality), so the
    anti-join broadcasts the existing dim.
    """
    from pyspark.sql import functions as F

    new_keys = derive_cfg_table(fact, key_fields)
    try:
        existing = spark.read.parquet(dim_path)
        unseen = new_keys.join(
            F.broadcast(existing.select(*key_fields)), key_fields, "left_anti"
        )
    except Exception:  # first run: no dim yet
        existing = None
        unseen = new_keys
    unseen.write.mode("append").parquet(dim_path)
    return spark.read.parquet(dim_path)

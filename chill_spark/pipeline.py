"""End-to-end batch ETL pipeline (the Spark shape of Partrans.parse_data,
SURVEY §3.2).

    scan (preprocessed csv) -> tag side-table broadcast join
    -> derive OM_GROUP + DSL fields -> route per target table
    -> project raw->db columns -> conform to catalog schema
    -> idempotent partitioned write

One distributed pass per target table over a cached preprocessed
frame; scalar per-file fields are column functions so nothing is
computed driver-side. Returns per-table DataFrames plus run metrics
(skipped columns, unmatched files, distinct DATETIMEs — A3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog.model import Catalog
from .config.model import JobSpec
from .operators.derive import apply_fields
from .operators.project import conform_to_schema
from .operators.writers import write_fact
from .sources.csv_source import extract_tags, scan_csv_preprocessed, tag_columns


@dataclass
class RunResult:
    tables: dict[str, DataFrame] = field(default_factory=dict)
    datetimes: dict[str, list] = field(default_factory=dict)  # A3 bookkeeping
    derive_errors: list[str] = field(default_factory=list)
    written: dict[str, str] = field(default_factory=dict)  # table -> path


def transform(
    spark: SparkSession,
    job: JobSpec,
    catalog: Catalog,
    views: dict[str, DataFrame] | None = None,
    raw: DataFrame | None = None,
) -> RunResult:
    """Compile and run the derivation plan; no writes."""
    path = f"{job.input_dir}/{job.input_mask}"
    if raw is None:
        # column superset = every raw name the catalog declares; files
        # carry a subset each (routing mixes layouts) -> absent columns
        # come back null and conform_to_schema handles the rest
        raw_cols: list[str] = []
        for t in catalog.tables.values():
            for spec in t.stored_columns:
                if spec.raw_name and spec.raw_name not in raw_cols:
                    raw_cols.append(spec.raw_name)
        raw = scan_csv_preprocessed(spark, path, job, columns=raw_cols or None)

    # tag side table (P4): tiny, broadcast-joined on _file
    tag_names = sorted({f.tag for f in job.fields if f.source == "tag" and f.tag})
    if tag_names:
        tags = tag_columns(extract_tags(spark, path, tag_names), tag_names)
        raw = raw.join(F.broadcast(tags), "_file", "left")
    tag_cols = {t: F.col(t) for t in tag_names}

    raw = raw.cache()  # routed once per table below

    res = RunResult()
    for table in catalog.tables.values():
        fields = job.fields_for(table.name)
        derived = apply_fields(
            raw,
            fields,
            views=views,
            filename_col=F.col("_file"),
            tag_cols=tag_cols,
        )
        res.derive_errors.extend(derived.errors)
        df = derived.df
        if job.om_group_field and job.om_group_field in df.columns:
            df = df.filter(
                F.col(job.om_group_field) == F.lit(table.counter_group)
            )
        # P1 passthrough rename (missing raw columns skipped silently)
        present = set(df.columns)
        for spec in table.stored_columns:
            if spec.raw_name and spec.raw_name in present and spec.db_name not in present:
                df = df.withColumnRenamed(spec.raw_name, spec.db_name)
        df = conform_to_schema(df, table)
        res.tables[table.name] = df
    return res


def run_batch(
    spark: SparkSession,
    job: JobSpec,
    catalog: Catalog,
    out_dir: str,
    views: dict[str, DataFrame] | None = None,
) -> RunResult:
    """transform + idempotent partitioned write + A3 bookkeeping."""
    res = transform(spark, job, catalog, views)
    for table in catalog.tables.values():
        df = res.tables[table.name]
        path = f"{out_dir}/{table.name}_{table.base_granularity}"
        write_fact(df, path)
        res.written[table.name] = path
        res.datetimes[table.name] = [
            r[0]
            for r in df.select("DATETIME").distinct().collect()
        ]
    return res

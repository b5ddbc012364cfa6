"""CSV sources (S1-S5) + the per-file preprocessor (S2-S4, P4).

Two paths:

- **Fast path** ``scan_csv``: the native Spark CSV reader — globbing,
  vectorized parse, predicate pushdown on partition columns, a header
  skip via ``option('header')``. Used whenever the job's pre-parse
  config is expressible as reader options. This is the 100 TB path.

- **Preprocessed path** ``scan_csv_preprocessed``: the reference allows
  a per-file *line slice* (``valid_lines='[i:f]'``, Partrans.py:98-111,
  224), exact-match *ignore lines* (Partrans.py:226-232), and
  *tag lines* — out-of-band header lines carrying data
  (Partrans.py:113-122,151-157). None of these fit the native reader,
  so files are processed per-file with ``mapInPandas`` over the
  ``binaryFile`` source: slice lines, drop ignores, parse the body with
  pandas' C csv engine, and attach ``_file`` (basename) so filename/tag
  derivations stay column functions. Arrow-batched, parallel across
  files; documented slow path — per-file work, not per-row Python.

Tag extraction (``extract_tags``) emits a tiny ``(file, tag, line)``
side table that derive joins back by ``_file`` (broadcast).
"""

from __future__ import annotations

import io
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..config.model import JobSpec


def scan_csv(
    spark: SparkSession,
    path: str,
    *,
    delimiter: str = ",",
    header: bool = True,
    schema: StructType | None = None,
    permissive: bool = True,
) -> DataFrame:
    """Native CSV scan (S1/S5). ``path`` may contain a glob — Spark
    expands it. With a catalog schema the scan skips inference
    entirely (one pass, not two)."""
    reader = (
        spark.read.option("sep", delimiter)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def _slice_lines(
    lines: list[str], valid_lines: tuple[int | None, int | None] | None
) -> list[str]:
    if valid_lines is None:
        return lines
    lo, hi = valid_lines
    return lines[lo:hi]


def read_preprocessed_pdf(
    content: bytes,
    job: JobSpec,
    columns: list[str] | None,
) -> pd.DataFrame:
    """Driver/executor-shared per-file parse: slice + ignore + csv."""
    text = content.decode("utf-8", errors="replace")
    lines = text.split("\n")
    lines = _slice_lines(lines, job.valid_lines)
    if job.ignore_lines:
        ignore = set(job.ignore_lines)
        lines = [ln for ln in lines if ln not in ignore]
    body = "\n".join(lines)
    if not body.strip():
        return pd.DataFrame(columns=columns or [])
    pdf = pd.read_csv(
        io.StringIO(body),
        sep=job.delimiter,
        dtype=str,
        header=0 if columns is None else None,
        names=columns,
        skip_blank_lines=True,
    )
    return pdf


def infer_columns(
    spark: SparkSession, path: str, job: JobSpec, sample_files: int = 50
) -> list[str]:
    """Union the post-preprocess headers across a sample of files
    (driver-side; the catalog-declared raw-name superset is preferred —
    routed jobs mix file layouts, Partrans.py:239-258)."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .limit(sample_files)
    ).collect()
    if not files:
        raise FileNotFoundError(f"no files match {path}")
    cols: list[str] = []
    seen: set[str] = set()
    for row in files:
        for c in read_preprocessed_pdf(row["content"], job, None).columns:
            if c not in seen:
                seen.add(c)
                cols.append(c)
    return cols


def preprocess_files(
    files: DataFrame,
    job: JobSpec,
    columns: list[str],
) -> DataFrame:
    """valid_lines slice + ignore_lines + csv body parse over an
    already-loaded ``(path, content)`` frame, with ``_file`` attached.

    Shared by the batch scan (binaryFile read) and the streaming
    pre-pass (each foreachBatch micro-batch is exactly such a frame),
    so stream and batch run the SAME per-file preprocessing code."""
    out_schema = StructType(
        [StructField("_file", StringType(), False)]
        + [StructField(c, StringType(), True) for c in columns]
    )

    def process(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                body = read_preprocessed_pdf(row["content"], job, None)
                # tolerate files whose header is a subset/superset of
                # the declared columns (missing -> null, extra -> drop)
                out = pd.DataFrame()
                out["_file"] = [os.path.basename(row["path"])] * len(body)
                for c in columns:
                    out[c] = (
                        body[c].astype(str) if c in body.columns else pd.Series(
                            [None] * len(body), dtype="object"
                        )
                    )
                yield out

    return files.select("path", "content").mapInPandas(
        process, schema=out_schema
    )


def scan_csv_preprocessed(
    spark: SparkSession,
    path: str,
    job: JobSpec,
    columns: list[str] | None = None,
) -> DataFrame:
    """Per-file preprocessed scan: valid_lines slice + ignore_lines +
    csv body parse, with ``_file`` attached (S2-S4).

    All body columns come back as strings (the DSL is stringly-typed,
    Partrans.py:167-171); project/conform casts to the declared schema.
    """
    if columns is None:
        columns = infer_columns(spark, path, job)
    files = spark.read.format("binaryFile").load(path)
    return preprocess_files(files, job, columns)


def extract_tags_from_files(files: DataFrame, tags: list[str]) -> DataFrame:
    """Per-file tag side table over an already-loaded ``(path,
    content)`` frame — shared batch/stream core of ``extract_tags``.
    Returns (_file, tag, line); rows absent when a tag never
    matches."""
    out_schema = StructType(
        [
            StructField("_file", StringType(), False),
            StructField("tag", StringType(), False),
            StructField("line", StringType(), True),
        ]
    )
    files = files.select("path", "content")
    tag_list = list(tags)

    def process(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                text = row["content"].decode("utf-8", errors="replace")
                lines = text.split("\n")
                base = os.path.basename(row["path"])
                for t in tag_list:
                    hit = next((ln for ln in lines if t in ln), None)
                    if hit is not None:
                        rows.append((base, t, hit))
            yield pd.DataFrame(rows, columns=["_file", "tag", "line"])

    return files.mapInPandas(process, schema=out_schema)


def extract_tags(
    spark: SparkSession, path: str, tags: list[str]
) -> DataFrame:
    """Per-file tag side table: first line containing each tag substring
    (get_tag semantics, Partrans.py:113-122)."""
    files = spark.read.format("binaryFile").load(path)
    return extract_tags_from_files(files, tags)


def tag_columns(tags_df: DataFrame, tags: list[str]) -> DataFrame:
    """Pivot the tag side table to one row per file with a column per
    tag, ready for a broadcast join on ``_file``."""
    return (
        tags_df.groupBy("_file")
        .pivot("tag", tags)
        .agg(F.first("line"))
    )

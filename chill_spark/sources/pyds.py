"""`chill_csv` — a pluggable Python Data Source (Spark 4 API) for the
reference's counter-file format.

The same per-file semantics as ``scan_csv_preprocessed`` (valid_lines
slice, ignore_lines drop, stringly-typed CSV body, ``_file`` identity
column — Partrans.py:98-111,219-236), but packaged as a first-class
``spark.read.format("chill_csv")`` source instead of a helper:

    spark.dataSource.register(ChillCSVDataSource)
    df = (spark.read.format("chill_csv")
          .option("path", "/data/in/*.csv")
          .option("delimiter", ",")
          .option("valid_lines", "2:")      # python slice, like '[2:]'
          .option("ignore_lines", "#EOF")   # \x1f-separated exact lines
          .option("columns", "site,calls_raw,drops_raw")
          .load())

Scale shape: one InputPartition per file — Spark schedules files
across executors; each partition parses independently (Arrow-batched
back to the JVM). File listing happens once on the driver. This is the
documented slow path for pre-parse line surgery; plain CSVs should use
the native reader (sources/csv_source.scan_csv).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType


def _parse_valid_lines(spec: str | None):
    if not spec:
        return None
    lo, _, hi = spec.partition(":")
    return (int(lo) if lo else None, int(hi) if hi else None)


def _read_file(path: str, delimiter: str, valid_lines, ignore_lines: set[str]):
    """Per-file parse: slice -> ignore -> header -> rows (all strings).
    Mirrors sources/csv_source.read_preprocessed_pdf without pandas —
    the stdlib csv module is enough for the executor side."""
    import csv
    import io

    with open(path, "rb") as f:
        text = f.read().decode("utf-8", errors="replace")
    lines = text.split("\n")
    if valid_lines is not None:
        lo, hi = valid_lines
        lines = lines[lo:hi]
    if ignore_lines:
        lines = [ln for ln in lines if ln not in ignore_lines]
    body = "\n".join(ln for ln in lines if ln.strip())
    if not body.strip():
        return [], []
    rows = list(csv.reader(io.StringIO(body), delimiter=delimiter))
    return rows[0], rows[1:]


class ChillCSVDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chill_csv"

    def _opts(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("chill_csv: 'path' option is required")
        return (
            path,
            self.options.get("delimiter", ","),
            _parse_valid_lines(self.options.get("valid_lines")),
            set((self.options.get("ignore_lines") or "").split("\x1f"))
            - {""},
        )

    def schema(self) -> StructType:
        cols_opt = self.options.get("columns")
        if cols_opt:
            cols = [c.strip() for c in cols_opt.split(",")]
        else:
            # infer from the first matching file's post-preprocess header
            path, delim, vl, ign = self._opts()
            files = sorted(_glob.glob(path))
            if not files:
                raise FileNotFoundError(f"chill_csv: no files match {path}")
            cols, _ = _read_file(files[0], delim, vl, ign)
        return StructType(
            [StructField("_file", StringType(), False)]
            + [StructField(c, StringType(), True) for c in cols]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        path, delim, vl, ign = self._opts()
        return ChillCSVReader(schema, path, delim, vl, ign)


class ChillCSVReader(DataSourceReader):
    def __init__(self, schema, path, delimiter, valid_lines, ignore_lines):
        self.columns = [f.name for f in schema.fields if f.name != "_file"]
        self.path = path
        self.delimiter = delimiter
        self.valid_lines = valid_lines
        self.ignore_lines = ignore_lines

    def partitions(self):
        files = sorted(_glob.glob(self.path))
        if not files:
            raise FileNotFoundError(f"chill_csv: no files match {self.path}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        fpath = partition.value
        header, rows = _read_file(
            fpath, self.delimiter, self.valid_lines, self.ignore_lines
        )
        base = os.path.basename(fpath)
        idx = {c: i for i, c in enumerate(header)}
        # header subset/superset tolerance, like scan_csv_preprocessed:
        # missing declared columns -> None, undeclared file columns -> drop
        for r in rows:
            yield tuple(
                [base]
                + [
                    r[idx[c]] if c in idx and idx[c] < len(r) else None
                    for c in self.columns
                ]
            )

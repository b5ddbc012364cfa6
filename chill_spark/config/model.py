"""Job-spec model — the Spark-native equivalent of the reference's
Excel "Chill" configuration sheet (Partrans.py:40-96).

A job spec declares: where the raw files are (dir + glob mask), how to
pre-parse them (valid_lines slice, ignore_lines, delimiter), the SQL
lookup views, and the ordered field-derivation DSL declarations
(source/tag/inputs/value/function/view/default per counter set —
Partrans.py:84-93). Declaration order matters: ALL-counter-set fields
apply first, then per-table fields, and later fields may overwrite
columns (Partrans.py:306-319).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

VALID_SOURCES = {"constant", "filename", "tag", "column", "lookup"}


@dataclass
class FieldSpec:
    """One DSL field declaration (Partrans.py:84-93)."""

    name: str
    source: str  # constant | filename | tag | column | lookup
    counter_set: str = "ALL"  # 'ALL' or a table name
    value: str | None = None  # constant value
    function: str | None = None  # expression template (argN / tag / view tokens)
    inputs: list[str] = field(default_factory=list)  # columns bound to arg1..argN
    tag: str | None = None  # tag substring to locate in the file header
    view: str | None = None  # lookup view name
    default: str | None = None  # lookup default on any error (Partrans.py:194-197)

    def __post_init__(self):
        if self.source not in VALID_SOURCES:
            raise ValueError(f"unknown field source {self.source!r} for {self.name}")


@dataclass
class JobSpec:
    """One ETL job: files in -> derived, routed, partitioned tables out."""

    input_dir: str
    input_mask: str = "*"
    file_format: str = "csv"  # only csv in the reference (Partrans.py:235)
    delimiter: str = ","
    valid_lines: tuple[int | None, int | None] | None = None  # [initial:final]
    ignore_lines: list[str] = field(default_factory=list)
    views: dict[str, str] = field(default_factory=dict)  # name -> SQL
    fields: list[FieldSpec] = field(default_factory=list)  # ordered
    om_group_field: str | None = "OM_GROUP"  # routing-key field name

    def fields_for(self, table_name: str) -> list[FieldSpec]:
        """Merge order: ALL first, then per-table (Partrans.py:306-319).
        Later entries overwrite same-named columns (last-wins)."""
        return [f for f in self.fields if f.counter_set == "ALL"] + [
            f for f in self.fields if f.counter_set == table_name
        ]

    @staticmethod
    def parse_valid_lines(s: str) -> tuple[int | None, int | None]:
        """Parse the reference's '[i:f]' slice syntax (Partrans.py:98-111)."""
        m = re.fullmatch(r"\[\s*(-?\d+)?\s*:\s*(-?\d+)?\s*\]", s.strip())
        if not m:
            raise ValueError(f"bad valid_lines spec: {s!r}")
        lo = int(m.group(1)) if m.group(1) else None
        hi = int(m.group(2)) if m.group(2) else None
        return (lo, hi)

    def to_json(self) -> str:
        d = {
            "input_dir": self.input_dir,
            "input_mask": self.input_mask,
            "file_format": self.file_format,
            "delimiter": self.delimiter,
            "valid_lines": list(self.valid_lines) if self.valid_lines else None,
            "ignore_lines": self.ignore_lines,
            "views": self.views,
            "om_group_field": self.om_group_field,
            "fields": [
                {
                    "name": f.name,
                    "source": f.source,
                    "counter_set": f.counter_set,
                    "value": f.value,
                    "function": f.function,
                    "inputs": f.inputs,
                    "tag": f.tag,
                    "view": f.view,
                    "default": f.default,
                }
                for f in self.fields
            ],
        }
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, text: str) -> JobSpec:
        d = json.loads(text)
        fields = [FieldSpec(**fd) for fd in d.pop("fields", [])]
        vl = d.pop("valid_lines", None)
        return cls(fields=fields, valid_lines=tuple(vl) if vl else None, **d)

"""Metadata catalog — the Spark-native equivalent of the reference's
HLD Excel workbook (ParseHLD.py:52-63) + the Oracle config-DB catalog
queries (HlxTools.py:407-419,463-475,503-523).

The catalog is the single source of truth consumed by every layer:
routing (counter group -> table), projection (raw->db column mapping,
KPI exclusion), keys (reconciliation join keys), the granularity
ladder (rollup scheduling, HlxTools.py:622-630,697-702), and
retention (thinout TTLs, HlxTools.py:620-631).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql.types import (
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Granularity ladder (reference suffixes, HlxTools.py:622-630,697-702).
# Each level: (spark date_trunc unit or window interval, retention days).
# Retention values mirror the reference thinout config:
# 5M/15M/HH -> 30 d, HR -> 90 d, DY -> 3650 d, WK -> 3600 d, MO/YR -> 3 y.
GRANULARITIES: dict[str, dict] = {
    "5M": {"interval": "5 minutes", "retention_days": 30},
    "15M": {"interval": "15 minutes", "retention_days": 30},
    "HH": {"interval": "30 minutes", "retention_days": 30},
    "HR": {"trunc": "hour", "retention_days": 90},
    "DY": {"trunc": "day", "retention_days": 3650},
    "WK": {"trunc": "week", "retention_days": 3600},
    "MO": {"trunc": "month", "retention_days": 1095},
    "YR": {"trunc": "year", "retention_days": 1095},
}

# Rollup ladder: base granularity -> the levels derived from it
# (HlxTools.py:697-702 schedules one aggregation per level).
LADDER_ORDER = ["5M", "15M", "HH", "HR", "DY", "WK", "MO", "YR"]

_TYPE_MAP: dict[str, DataType] = {
    "string": StringType(),
    "double": DoubleType(),
    "long": LongType(),
    "timestamp": TimestampType(),
}


@dataclass
class ColumnSpec:
    """One row of the HLD Key_Counters_Kpis sheet (Partrans.py:263-271).

    kind: 'COUNTER' (stored, rolled up), 'KPI' (formula column —
    excluded from storage, recomputed at query time,
    Partrans.py:269-271), 'KEY' (dimension/identity column).
    """

    db_name: str
    raw_name: str | None = None  # source column in the raw file; None = derived
    dtype: str = "double"
    kind: str = "COUNTER"
    formula: str | None = None  # KPI formula (DSL template), if kind == 'KPI'

    @property
    def spark_type(self) -> DataType:
        return _TYPE_MAP[self.dtype]


@dataclass
class TableSpec:
    """A target fact table {schema}.{name}_{resolution}
    (Partrans.py:255-258, HlxTools.py:775-778)."""

    name: str
    counter_group: str  # routing key ('Counter Group in RD')
    base_granularity: str = "15M"
    schema_name: str = "PM"
    key_fields: list[str] = field(default_factory=list)  # CONF_KEY_FIELDS
    columns: list[ColumnSpec] = field(default_factory=list)
    rollups: list[str] = field(default_factory=list)  # ladder levels above base

    def physical_name(self, granularity: str | None = None) -> str:
        g = granularity or self.base_granularity
        return f"{self.schema_name}.{self.name}_{g}"

    @property
    def counters(self) -> list[ColumnSpec]:
        return [c for c in self.columns if c.kind == "COUNTER"]

    @property
    def kpis(self) -> list[ColumnSpec]:
        return [c for c in self.columns if c.kind == "KPI"]

    @property
    def stored_columns(self) -> list[ColumnSpec]:
        """Everything persisted: keys + counters; KPI rows excluded
        (Partrans.py:269-271)."""
        return [c for c in self.columns if c.kind != "KPI"]

    def struct_type(self, include_datetime: bool = True) -> StructType:
        fields = []
        if include_datetime:
            fields.append(StructField("DATETIME", TimestampType(), False))
        for c in self.stored_columns:
            fields.append(StructField(c.db_name, c.spark_type, True))
        return StructType(fields)

    def raw_to_db_mapping(self) -> list[tuple[str, str]]:
        """(raw_name, db_name) pairs for the passthrough projection
        (Partrans.py:282-294); derived columns have no raw_name."""
        return [
            (c.raw_name, c.db_name)
            for c in self.stored_columns
            if c.raw_name is not None
        ]

    def ladder_above_base(self) -> list[str]:
        if self.rollups:
            return self.rollups
        i = LADDER_ORDER.index(self.base_granularity)
        return LADDER_ORDER[i + 1 :]


@dataclass
class Catalog:
    """The full metadata catalog: tables keyed by name, plus the
    routing map from counter group -> table (J2, Partrans.py:246-253)."""

    tables: dict[str, TableSpec] = field(default_factory=dict)
    library: dict[str, str] = field(default_factory=dict)  # HLD 'Library Info'

    def add(self, t: TableSpec) -> None:
        self.tables[t.name] = t

    def route(self, counter_group: str) -> TableSpec | None:
        """Counter-group routing; no match -> None and the file is
        skipped (Partrans.py:248-252 semantics)."""
        for t in self.tables.values():
            if t.counter_group == counter_group:
                return t
        return None

    def routing_map(self) -> dict[str, str]:
        return {t.counter_group: t.name for t in self.tables.values()}

    # -- serialization (the JSON/YAML replacement for the Excel HLD) --

    def to_json(self) -> str:
        def col(c: ColumnSpec):
            return {
                "db_name": c.db_name,
                "raw_name": c.raw_name,
                "dtype": c.dtype,
                "kind": c.kind,
                "formula": c.formula,
            }

        return json.dumps(
            {
                "library": self.library,
                "tables": [
                    {
                        "name": t.name,
                        "counter_group": t.counter_group,
                        "base_granularity": t.base_granularity,
                        "schema_name": t.schema_name,
                        "key_fields": t.key_fields,
                        "rollups": t.rollups,
                        "columns": [col(c) for c in t.columns],
                    }
                    for t in self.tables.values()
                ],
            },
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> Catalog:
        d = json.loads(text)
        cat = cls(library=d.get("library", {}))
        for td in d["tables"]:
            cols = [ColumnSpec(**cd) for cd in td.pop("columns", [])]
            cat.add(TableSpec(columns=cols, **td))
        return cat

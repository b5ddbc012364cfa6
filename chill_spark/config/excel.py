"""Excel config loaders — drop-in for the reference's Excel-driven
configuration, mapped onto JobSpec / Catalog.

- ``load_chill_xlsx``: the 'Chill' sheet (Partrans.py:40-96): scalar
  rows until a 'view' marker row, then name->SQL view rows until a
  'field' marker row, then DSL field rows
  (name, source, tag, inputs, value, function, view, default, cs).
  OM_GROUP is the special routing field (Partrans.py:72-79).
- ``load_hld_xlsx``: the HLD workbook (ParseHLD.py:52-63): 'Tables'
  routes counter groups to target tables ('Table Name',
  'Counter Group in RD', 'Base Granularity'); 'Key_Counters_Kpis'
  declares per-table columns ('Counter/KPI DB Name',
  'Raw Data Counter Name/OID', 'TYPE' — KPI rows excluded from
  storage, Partrans.py:269-271). Tabular sheets skip 2 decoration
  rows and the first column (ParseHLD.py:49).
"""

from __future__ import annotations

from ..catalog.model import Catalog, ColumnSpec, TableSpec
from .model import FieldSpec, JobSpec
from .xlsx import read_xlsx


def _s(v) -> str | None:
    if v is None:
        return None
    s = str(v).strip()
    return s or None


def load_chill_xlsx(path: str, sheet: str = "Chill") -> JobSpec:
    rows = read_xlsx(path)[sheet]
    scalars: dict[str, str] = {}
    views: dict[str, str] = {}
    fields: list[FieldSpec] = []
    mode = "scalar"
    for row in rows:
        row = list(row) + [None] * (9 - len(row))
        key = _s(row[0])
        if not key:
            continue
        if key == "view" and mode != "view":
            mode = "view"
            continue
        if key == "field" and mode != "field":
            mode = "field"
            continue
        if mode == "view":
            views[key] = _s(row[1]) or ""
        elif mode == "field":
            if key == "OM_GROUP":
                # special layout: (source, tag, column, value, function)
                fields.append(
                    FieldSpec(
                        name="OM_GROUP",
                        source=_s(row[1]) or "constant",
                        tag=_s(row[2]),
                        inputs=[c for c in [_s(row[3])] if c],
                        value=_s(row[4]),
                        function=_s(row[5]),
                    )
                )
            else:
                inputs = _s(row[3])
                fields.append(
                    FieldSpec(
                        name=key,
                        source=_s(row[1]) or "constant",
                        tag=_s(row[2]),
                        inputs=[c.strip() for c in inputs.split(",")] if inputs else [],
                        value=_s(row[4]),
                        function=_s(row[5]),
                        view=_s(row[6]),
                        default=_s(row[7]),
                        counter_set=_s(row[8]) or "ALL",
                    )
                )
        else:
            scalars[key] = _s(row[1]) or ""

    vl = scalars.get("valid_lines")
    ignore = scalars.get("ignore_lines")
    return JobSpec(
        input_dir=scalars.get("input_rd", scalars.get("input_dir", ".")),
        input_mask=scalars.get("input_rd_mask", scalars.get("input_mask", "*")),
        file_format=scalars.get("format", "csv"),
        delimiter=scalars.get("delimiter", ","),
        valid_lines=JobSpec.parse_valid_lines(vl) if vl else None,
        ignore_lines=[s for s in (ignore or "").split("|") if s],
        views=views,
        fields=fields,
    )


_GRAN_ALIASES = {
    "15MIN": "15M", "15 MIN": "15M", "5MIN": "5M", "HOUR": "HR",
    "DAY": "DY", "WEEK": "WK", "MONTH": "MO", "YEAR": "YR",
}


def _table_rows(rows: list[list]) -> tuple[list[str], list[list]]:
    """Header from row 0; skip 2 decoration rows; drop column 0
    (ParseHLD.py:49 iloc[2:,1:] on the pandas-parsed frame)."""
    header = [(_s(c) or "") for c in rows[0][1:]]
    return header, [list(r)[1:] for r in rows[3:]]


def _cell(row: list, idx: dict[str, int], name: str):
    i = idx.get(name)
    return row[i] if i is not None and i < len(row) else None


def load_hld_xlsx(path: str, schema_name: str = "PM") -> Catalog:
    sheets = read_xlsx(path)
    cat = Catalog()

    t_hdr, t_rows = _table_rows(sheets["Tables"])
    ti = {name: i for i, name in enumerate(t_hdr)}
    for row in t_rows:
        name = _s(_cell(row, ti, "Table Name"))
        if not name:
            continue
        gran = _s(_cell(row, ti, "Base Granularity")) or "15M"
        gran = _GRAN_ALIASES.get(gran.upper(), gran.upper())
        cat.add(
            TableSpec(
                name=name,
                counter_group=_s(_cell(row, ti, "Counter Group in RD")) or "",
                base_granularity=gran,
                schema_name=schema_name,
            )
        )

    k_hdr, k_rows = _table_rows(sheets["Key_Counters_Kpis"])
    ki = {name: i for i, name in enumerate(k_hdr)}
    for row in k_rows:
        tname = _s(_cell(row, ki, "Table Name"))
        db = _s(_cell(row, ki, "Counter/KPI DB Name"))
        if not tname or not db or tname not in cat.tables:
            continue
        kind = (_s(_cell(row, ki, "TYPE")) or "COUNTER").upper()
        raw = _s(_cell(row, ki, "Raw Data Counter Name/OID"))
        dtype = (_s(_cell(row, ki, "Data Type")) or (
            "string" if kind == "KEY" else "double"
        )).lower()
        spec = ColumnSpec(
            db_name=db,
            raw_name=raw,
            dtype=dtype if dtype in ("string", "double", "long", "timestamp") else "double",
            kind="KPI" if kind == "KPI" else ("KEY" if kind == "KEY" else "COUNTER"),
            formula=_s(_cell(row, ki, "Formula")) if kind == "KPI" else None,
        )
        table = cat.tables[tname]
        table.columns.append(spec)
        if spec.kind == "KEY":
            table.key_fields.append(db)
    return cat

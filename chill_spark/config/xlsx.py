"""Minimal stdlib xlsx reader (zip + XML) — enough to load the
reference's Excel configs (Chill sheet, HLD workbook) without
openpyxl/xlrd, which aren't in this environment.

Supports: shared strings (incl. rich-text runs), inline strings,
numbers (int when integral), booleans, formula cached strings, sparse
rows/cells (padded by the A1-style cell reference). Driver-side only —
config files are tiny.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _iter(el: ET.Element, name: str):
    """Namespace-agnostic descendant iteration (ElementTree's iter()
    doesn't accept the '{*}' wildcard; find/findall do)."""
    for e in el.iter():
        if isinstance(e.tag, str) and e.tag.rsplit("}", 1)[-1] == name:
            yield e


def _find(el: ET.Element, name: str):
    for e in el:
        if isinstance(e.tag, str) and e.tag.rsplit("}", 1)[-1] == name:
            return e
    return None


def _col_index(ref: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26."""
    m = _CELL_REF.match(ref)
    col = m.group(1) if m else "A"
    idx = 0
    for ch in col:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _text_of(el: ET.Element) -> str:
    """Concatenate all <t> descendants (plain or rich-text runs)."""
    return "".join(t.text or "" for t in _iter(el, "t"))


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = _find(c, "is")
        return _text_of(is_el) if is_el is not None else None
    v = _find(c, "v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t in ("str", "e"):
        return v.text
    # numeric: int when integral (pandas/xlrd read ints as floats; we
    # prefer ints so '15' round-trips as 15, not 15.0)
    f = float(v.text)
    return int(f) if f.is_integer() else f


def read_xlsx(path: str) -> dict[str, list[list]]:
    """Workbook -> {sheet name: rows}, each row a list padded with
    None for missing cells (list lengths vary by row, like pandas
    with ragged data)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in _iter(rels, "Relationship")
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_text_of(si) for si in _iter(ss, "si")]

        out: dict[str, list[list]] = {}
        for sh in _iter(wb, "sheet"):
            name = sh.get("name")
            rid = sh.get(
                "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
            )
            target = rid_to_target.get(rid, "")
            if not target.startswith("xl/"):
                target = "xl/" + target
            sheet = ET.fromstring(z.read(target))
            rows: list[list] = []
            for row_el in _iter(sheet, "row"):
                row: list = []
                for c in _iter(row_el, "c"):
                    idx = _col_index(c.get("r", ""))
                    while len(row) < idx:
                        row.append(None)
                    row.append(_cell_value(c, shared))
                rows.append(row)
            out[name] = rows
        return out


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Tiny inline-string xlsx writer (tests + fixture generation)."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def col_name(i: int) -> str:
        name = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            name = chr(65 + r) + name
        return name

    with zipfile.ZipFile(path, "w") as z:
        names = list(sheets)
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
                for i in range(len(names))
            )
            + "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
            + "".join(
                f'<sheet name="{esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                for i, n in enumerate(names)
            )
            + "</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        for i, n in enumerate(names):
            body = []
            for r, row in enumerate(sheets[n], start=1):
                cells = []
                for ci, v in enumerate(row):
                    if v is None:
                        continue
                    ref = f"{col_name(ci)}{r}"
                    if isinstance(v, bool):
                        cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                    elif isinstance(v, (int, float)):
                        cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                    else:
                        cells.append(
                            f'<c r="{ref}" t="inlineStr"><is><t>{esc(str(v))}</t></is></c>'
                        )
                body.append(f'<row r="{r}">{"".join(cells)}</row>')
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f'<sheetData>{"".join(body)}</sheetData></worksheet>',
            )

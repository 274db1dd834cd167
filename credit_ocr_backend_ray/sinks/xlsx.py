"""Minimal standalone XLSX writer (no openpyxl in this environment).

Closes the reference's Excel-report sink (the notebook's field-report
export, /root/reference/notebooks/credit_ocr_pipeline.ipynb cell 17)
with a real .xlsx file instead of the earlier CSV stand-in: an XLSX is
a ZIP of five small XML parts, all writable with the stdlib. Strings go
through the shared-strings table (the format's normal path); numbers
are written as numeric cells. Output bytes are DETERMINISTIC: fixed
zip timestamps, fixed member order, no compression-level ambiguity
(stored entries), so the same frame always produces the same file —
reproducible-sink contract like the parquet writers.

Scope: one sheet, header row + values, strings/ints/floats/None. This
is a REPORT sink (driver-side, bounded frames like the per-field
summary) — not a distributed data sink; big tables belong in parquet.
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape as _sax_escape

import pandas as pd

_FIXED_DATE = (1980, 1, 1, 0, 0, 0)

# XML 1.0 forbids control chars other than \t \n \r; a cell value holding
# e.g. \x00 would otherwise produce a workbook every parser rejects.
_XML_INVALID = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff\ufffe\uffff]")


def escape(s: str) -> str:
    return _sax_escape(_XML_INVALID.sub("", s))

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
    'main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships">'
    '<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets>'
    "</workbook>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/sharedStrings" '
    'Target="sharedStrings.xml"/>'
    "</Relationships>"
)


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(df: pd.DataFrame, path: str,
               sheet_name: str = "Report") -> int:
    """Write ``df`` (header + rows) as a valid .xlsx; returns the number
    of data rows written. Strings (and None -> empty string) become
    shared-string cells; ints/floats become numeric cells; everything
    else is stringified."""
    strings: list[str] = []
    string_ix: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in string_ix:
            string_ix[s] = len(strings)
            strings.append(s)
        return string_ix[s]

    def cell_xml(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r + 1}"
        if isinstance(v, bool):
            v = str(v)
        if v is None or (isinstance(v, float) and pd.isna(v) and v != v):
            v = ""
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="s"><v>{sref(str(v))}</v></c>'

    rows_xml: list[str] = []
    header = [str(c) for c in df.columns]
    cells = "".join(cell_xml(0, ci, h) for ci, h in enumerate(header))
    rows_xml.append(f'<row r="1">{cells}</row>')
    for ri, row in enumerate(df.itertuples(index=False), start=1):
        cells = "".join(cell_xml(ri, ci, v) for ci, v in enumerate(row))
        rows_xml.append(f'<row r="{ri + 1}">{cells}</row>')

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(rows_xml) + "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        f'2006/main" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in strings)
        + "</sst>"
    )

    members = [
        ("[Content_Types].xml", _CONTENT_TYPES),
        ("_rels/.rels", _ROOT_RELS),
        ("xl/workbook.xml", _WORKBOOK.format(name=escape(sheet_name))),
        ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
        ("xl/worksheets/sheet1.xml", sheet),
        ("xl/sharedStrings.xml", shared),
    ]
    # ZIP_STORED: report files are tiny and stored entries make the bytes
    # genuinely zlib-version-independent (the determinism contract above).
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for name, content in members:
            info = zipfile.ZipInfo(name, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_STORED
            zf.writestr(info, content)
    return len(df)

"""The stdlib XLSX sink: a real zip-of-XML workbook, verified by
unzipping and parsing the parts (no openpyxl in this environment), plus
the deterministic-bytes contract."""

import hashlib
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd

from credit_ocr_backend_ray.sinks.xlsx import write_xlsx

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _read_back(path):
    with zipfile.ZipFile(path) as zf:
        shared = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        strings = [si.find(f"{_NS}t").text or ""
                   for si in shared.findall(f"{_NS}si")]
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
        rows = []
        for row in sheet.iter(f"{_NS}row"):
            vals = []
            for c in row.iter(f"{_NS}c"):
                v = c.find(f"{_NS}v").text
                vals.append(strings[int(v)] if c.get("t") == "s" else v)
            rows.append(vals)
        # the package must also declare its parts
        names = set(zf.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels"} <= names
    return rows


def test_xlsx_roundtrip(tmp_path):
    df = pd.DataFrame({
        "field": ["name", "amount", "iban"],
        "value": ["Max <&> Müller", 1234.5, None],
        "n": [1, 2, 3],
    })
    path = str(tmp_path / "report.xlsx")
    assert write_xlsx(df, path) == 3
    rows = _read_back(path)
    assert rows[0] == ["field", "value", "n"]
    assert rows[1] == ["name", "Max <&> Müller", "1"]
    assert rows[2] == ["amount", "1234.5", "2"]
    assert rows[3] == ["iban", "", "3"]


def test_xlsx_deterministic_bytes(tmp_path):
    df = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    p1, p2 = str(tmp_path / "r1.xlsx"), str(tmp_path / "r2.xlsx")
    write_xlsx(df, p1)
    write_xlsx(df, p2)
    h = [hashlib.sha256(open(p, "rb").read()).hexdigest() for p in (p1, p2)]
    assert h[0] == h[1]


def test_xlsx_wide_columns(tmp_path):
    # past column Z: AA addressing
    df = pd.DataFrame({f"c{i}": [i] for i in range(30)})
    path = str(tmp_path / "wide.xlsx")
    write_xlsx(df, path)
    rows = _read_back(path)
    assert rows[0][26] == "c26"  # cell AA1
    assert rows[1][29] == "29"

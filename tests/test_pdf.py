"""Real-PDF text-layer extraction (functions/pdf.py): writer→reader
round-trip pins exact Courier geometry; the parity test pins that a PDF
and a JSON layout document with the same form geometry flow through the
SHARED downstream kernels (flatten → reading order → pairing → fields) to
identical pairs — the reference's M1 seam consuming actual
application/pdf payloads (src/ocr/extraction.py:405-413)."""

import json
import zlib

import pytest

from credit_ocr_backend_ray.functions.pdf import (
    build_pdf, extract_pdf_layout)


def test_build_pdf_is_valid_pdf():
    pdf = build_pdf([[{"text": "Hallo", "x_in": 1.0, "y_top_in": 2.0,
                       "h_in": 0.18}]])
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert b"/Type /Catalog" in pdf and b"/BaseFont /Courier" in pdf
    # xref offsets are byte-exact: each entry points at "N 0 obj"
    lines = pdf[pdf.index(b"xref"):].split(b"\n")
    n_objs = int(lines[1].split()[1]) - 1
    for k in range(1, n_objs + 1):
        off = int(lines[2 + k].split()[0])
        assert pdf[off:off + 20].startswith(f"{k} 0 obj".encode())


def test_pdf_roundtrip_exact_geometry():
    runs = [{"text": "Kreditbetrag", "x_in": 0.4, "y_top_in": 0.91,
             "h_in": 0.18},
            {"text": "700.000 Euro", "x_in": 2.9, "y_top_in": 0.92,
             "h_in": 0.18}]
    doc = extract_pdf_layout(build_pdf([runs]))
    assert len(doc["pages"]) == 1
    lines = doc["pages"][0]["lines"]
    assert [ln["content"] for ln in lines] == [r["text"] for r in runs]
    for ln, r in zip(lines, runs):
        p = ln["polygon"]
        assert p[0]["x"] == pytest.approx(r["x_in"], abs=1e-6)
        assert p[0]["y"] == pytest.approx(r["y_top_in"], abs=1e-6)
        assert p[2]["y"] == pytest.approx(r["y_top_in"] + 0.18, abs=1e-6)
        # exact Courier metric: 0.6 em per glyph
        assert p[1]["x"] == pytest.approx(
            r["x_in"] + 0.6 * 0.18 * len(r["text"]), abs=1e-6)
    # words: split with cumulative courier offsets, confidence 1.0
    words = doc["pages"][0]["words"]
    assert words[0]["content"] == "Kreditbetrag"
    assert all(w["confidence"] == 1.0 for w in words)
    w2 = [w for w in words if w["content"] == "Euro"][0]
    assert w2["polygon"][0]["x"] == pytest.approx(
        2.9 + 0.6 * 0.18 * len("700.000 "), abs=1e-6)


def test_pdf_string_escapes_and_multipage():
    runs1 = [{"text": "a(b)c\\d", "x_in": 1.0, "y_top_in": 1.0,
              "h_in": 0.2}]
    runs2 = [{"text": "page2", "x_in": 1.0, "y_top_in": 1.0, "h_in": 0.2}]
    doc = extract_pdf_layout(build_pdf([runs1, runs2]))
    assert [p["page_number"] for p in doc["pages"]] == [1, 2]
    assert doc["pages"][0]["lines"][0]["content"] == "a(b)c\\d"
    assert doc["pages"][1]["lines"][0]["content"] == "page2"


def test_pdf_td_tj_array_and_octal():
    """Hand-written content stream exercising Td line moves, TJ arrays
    with kerning, octal escapes — forms other writers emit."""
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (first) Tj "
               b"0 -24 Td [(se) -50 (cond)] TJ ET "
               b"BT /F1 10 Tf 1 0 0 1 72 600 Tm (oct\\101l) Tj ET")
    stream = zlib.compress(content)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
           b"\nendobj\n"
           b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\n"
           b"endobj\n"
           + (b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
              % len(stream)) + stream + b"\nendstream\nendobj\n"
           b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    doc = extract_pdf_layout(pdf)
    texts = [ln["content"] for ln in doc["pages"][0]["lines"]]
    assert texts == ["first", "second", "octAl"]
    lines = doc["pages"][0]["lines"]
    # Td moved down 24pt from 700 -> second baseline at 676
    assert lines[1]["polygon"][2]["y"] == pytest.approx((792 - 676) / 72)
    assert lines[0]["polygon"][0]["x"] == pytest.approx(1.0)  # 72pt


def test_pdf_channel_pairs_match_layout_channel():
    """The planted-PDF fixture and the JSON layout fixture share geometry;
    both payload kinds must flow to the SAME extracted pairs/fields and
    the SAME reading-order text through extract_document."""
    from credit_ocr_backend_ray.config import default_config
    from credit_ocr_backend_ray.functions.document import extract_document
    from credit_ocr_backend_ray.sources.synth import (
        _layout_doc, pdf_doc_bytes)

    cfg = default_config()["credit_request"]
    for i in (0, 7, 123):
        via_pdf = extract_document(pdf_doc_bytes(i), cfg)
        via_json = extract_document(_layout_doc(i).encode("utf-8"), cfg)
        assert via_pdf["status"] == via_json["status"] == "Fertig"
        assert via_pdf["extracted_text"] == via_json["extracted_text"]
        assert via_pdf["n_lines"] == via_json["n_lines"]
        assert via_pdf["n_pairs"] == via_json["n_pairs"]
        # same fields, same values (confidences differ by design: the
        # text layer is lossless -> 1.0; the OCR stand-in is sub-1.0)
        pairs_pdf = [(f["name"], f["value"]) for f in via_pdf["fields"]]
        pairs_json = [(f["name"], f["value"]) for f in via_json["fields"]]
        assert pairs_pdf == pairs_json
        assert via_pdf["missing_fields"] == via_json["missing_fields"]


def test_pdf_garbage_payload_is_poison_isolated():
    from credit_ocr_backend_ray.config import default_config
    from credit_ocr_backend_ray.functions.document import extract_document

    cfg = default_config()["credit_request"]
    # the reference's own placeholder PDF (extraction.py:413) — no pages
    out = extract_document(b"%PDF-1.4\n%Sample PDF content\n%%EOF", cfg)
    assert out["status"] in ("Fertig", "Fehlerhaft")
    out2 = extract_document(b"%PDF-1.4\n" + bytes(range(256)) * 4, cfg)
    assert out2["status"] in ("Fertig", "Fehlerhaft")  # never raises


def test_object_scan_survives_endobj_in_stream_payload():
    """ADVICE r3: a stream payload containing the byte sequence 'endobj'
    (or 'endstream') must not truncate the object — the scanner slices
    by /Length framing before searching for the object terminator."""
    from credit_ocr_backend_ray.functions import pdf as P

    raw = b"hello endobj world endstream trailing"
    body = (b"%PDF-1.4\n"
            b"7 0 obj\n<< /Length " + str(len(raw)).encode()
            + b" >>\nstream\n" + raw + b"\nendstream\nendobj\n"
            b"8 0 obj\n<< /Foo /Bar >>\nendobj\n")
    objs = dict(P._iter_objects(body))
    assert set(objs) == {7, 8}
    assert raw in objs[7]
    assert b"/Foo" in objs[8]
    # indirect /Length (e.g. '/Length 9 0 R') must NOT be used as framing
    body2 = (b"5 0 obj\n<< /Length 9 0 R >>\nstream\nabc\nendstream\n"
             b"endobj\n")
    objs2 = dict(P._iter_objects(body2))
    assert b"abc" in objs2[5]

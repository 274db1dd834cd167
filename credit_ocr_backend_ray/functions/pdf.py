"""Minimal real-PDF text-layer reader + single-font PDF writer (stdlib).

Closes the reference's M1 ingestion seam for actual ``application/pdf``
payloads (/root/reference/src/ocr/extraction.py:405-413 fetches raw PDF
bytes; the cloud OCR that rasterized them is out of scope in-sandbox, but
a digital PDF's TEXT LAYER needs no OCR): content streams are zlib
(FlateDecode — stdlib), text is shown by ``Tj``/``TJ``/``'`` operators
positioned by ``Tm``/``Td``/``TD``, and for the standard-14 **Courier**
font every glyph is exactly 600/1000 em wide (public AFM metric), so line
and word bounding boxes are computed EXACTLY, not estimated.

``extract_pdf_layout`` emits the same layout-document shape the JSON
channel uses ({"pages": [{"page_number", "lines", "words"}]}, see
functions/layout.py), so everything downstream — flatten, reading-order
sort, pairing, field mapping — is shared, and a PDF document and a layout
document with the same geometry produce the same pairs. Text-layer words
carry ``confidence = 1.0`` (a digital text layer is lossless; the
reference's sub-1.0 confidences come from raster OCR).

Geometry convention (both directions): PDF user space is points
(72/inch), y-up, origin bottom-left on a US-Letter 612x792 page; the
layout schema is inches, y-down, origin top-left. A text run at pen
``(x, y)`` with font size ``fs`` occupies the box x..x+0.6*fs*len(text)
horizontally and y..y+fs vertically (full-em ascent).

Scope: single-font (Courier), non-encrypted, Flate or raw content
streams, horizontal text (``Tm`` scale/translate — no rotation). Out of
scope: embedded-font /Widths tables, CID text, encryption.
"""

from __future__ import annotations

import re
import zlib
from typing import Any

PAGE_W_PT, PAGE_H_PT = 612, 792
COURIER_EM = 0.6  # standard-14 Courier glyph advance (600/1000 em)

# ------------------------------------------------------------------ writer


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages: list[list[dict[str, Any]]]) -> bytes:
    """Write a valid single-font PDF. Each page is a list of text runs
    ``{"text": str, "x_in": float, "y_top_in": float, "h_in": float}`` in
    top-left-origin inches; a run renders at font size ``h_in * 72`` with
    its box top at ``y_top_in``. Content streams are FlateDecode; the xref
    table is real (byte-exact offsets), so any conforming reader accepts
    the file."""
    objs: list[bytes] = []
    page_ids = []
    n_fixed = 3  # 1=catalog, 2=pages, 3=font
    for pi, runs in enumerate(pages):
        parts = []
        for r in runs:
            fs = r["h_in"] * 72.0
            x = r["x_in"] * 72.0
            y = PAGE_H_PT - (r["y_top_in"] + r["h_in"]) * 72.0  # baseline
            parts.append(
                f"BT /F1 {fs:.4f} Tf 1 0 0 1 {x:.4f} {y:.4f} Tm "
                f"({_esc(r['text'])}) Tj ET")
        # WinAnsi (cp1252) is the standard-14 text encoding — covers the
        # Euro sign the latin-1 codec lacks
        stream = zlib.compress("\n".join(parts).encode("cp1252"))
        content_id = n_fixed + 2 * pi + 1
        page_id = n_fixed + 2 * pi + 2
        objs.append((f"{content_id} 0 obj\n<< /Length {len(stream)} "
                     f"/Filter /FlateDecode >>\nstream\n").encode()
                    + stream + b"\nendstream\nendobj\n")
        objs.append((f"{page_id} 0 obj\n<< /Type /Page /Parent 2 0 R "
                     f"/MediaBox [0 0 {PAGE_W_PT} {PAGE_H_PT}] "
                     f"/Resources << /Font << /F1 3 0 R >> >> "
                     f"/Contents {content_id} 0 R >>\nendobj\n").encode())
        page_ids.append(page_id)

    kids = " ".join(f"{p} 0 R" for p in page_ids)
    fixed = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        (f"2 0 obj\n<< /Type /Pages /Kids [{kids}] "
         f"/Count {len(page_ids)} >>\nendobj\n").encode(),
        (b"3 0 obj\n<< /Type /Font /Subtype /Type1 "
         b"/BaseFont /Courier >>\nendobj\n"),
    ]
    body = fixed + objs
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for o in body:
        offsets.append(len(out))
        out += o
    xref_at = len(out)
    out += f"xref\n0 {len(body) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(body) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


# ------------------------------------------------------------------ reader

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")

_STR_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _parse_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal starting at ``data[i] == '('``; returns
    (decoded bytes, index past the closing paren). Handles \\-escapes,
    octal codes, and balanced nested parens per the PDF spec."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i:i + 1]
        if c == b"\\":
            nxt = data[i + 1:i + 2]
            if nxt in _STR_ESCAPES:
                out += _STR_ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal \d{1,3}
                j = i + 1
                while j < min(i + 4, n) and data[j:j + 1].isdigit():
                    j += 1
                out.append(int(data[i + 1:j], 8) & 0xFF)
                i = j
            else:
                i += 2  # line continuation or unknown escape: drop
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _tokenize_content(data: bytes):
    """Yield ('str', bytes) | ('num', float) | ('op', bytes) | ('arr',
    list) tokens from a decoded content stream."""
    i, n = 0, len(data)
    while i < n:
        c = data[i:i + 1]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == b"(":
            s, i = _parse_string(data, i)
            yield ("str", s)
        elif c == b"[":
            # TJ array: strings + kerning numbers until ]
            arr: list[tuple[str, Any]] = []
            i += 1
            while i < n and data[i:i + 1] != b"]":
                c2 = data[i:i + 1]
                if c2 == b"(":
                    s, i = _parse_string(data, i)
                    arr.append(("str", s))
                elif c2 in b" \t\r\n":
                    i += 1
                else:
                    m = _NUM_RE.match(data, i)
                    if m:
                        arr.append(("num", float(m.group())))
                        i = m.end()
                    else:
                        i += 1
            i += 1
            yield ("arr", arr)
        elif c == b"<":
            # hex string / dict — skip (our scope shows literal strings)
            end = data.find(b">", i)
            i = (end + 1) if end >= 0 else n
        else:
            m = _NUM_RE.match(data, i)
            if m:
                yield ("num", float(m.group()))
                i = m.end()
            else:
                j = i
                while j < n and data[j:j + 1] not in b" \t\r\n()[]<>/%":
                    j += 1
                if j == i:
                    i += 1
                    continue
                yield ("op", data[i:j])
                i = j


_OBJ_HDR_RE = re.compile(rb"(\d+)\s+\d+\s+obj")
_STREAM_START_RE = re.compile(rb"stream\r?\n")


def _iter_objects(pdf: bytes):
    """Yield ``(obj_num, body)`` by scanning object headers and slicing
    stream-carrying objects by their /Length framing FIRST — a compressed
    (or raw) payload that happens to contain the byte sequence ``endobj``
    must not terminate the object early, so ``endobj`` is only searched
    after the framed payload. Objects without a direct /Length fall back
    to the delimiter scan (indirect-length refs are out of scope)."""
    pos, n = 0, len(pdf)
    while True:
        m = _OBJ_HDR_RE.search(pdf, pos)
        if not m:
            return
        start = m.end()
        end = pdf.find(b"endobj", start)
        ms = _STREAM_START_RE.search(pdf, start)
        if ms is not None and (end == -1 or ms.start() < end):
            # stream object: /Length lives in the dict BEFORE the
            # stream marker; re-locate endobj past the framed payload
            mlen = re.search(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)",
                             pdf[start:ms.start()])
            if mlen:
                end = pdf.find(b"endobj", ms.end() + int(mlen.group(1)))
        if end == -1:
            end = n
        yield int(m.group(1)), pdf[start:end]
        pos = end + len(b"endobj")


def _page_content_streams(pdf: bytes) -> list[bytes]:
    """Decoded content stream per page, in page-tree order (the simple
    linear /Kids order our scope covers)."""
    objects: dict[int, bytes] = dict(_iter_objects(pdf))
    pages = []
    for num, body in sorted(objects.items()):
        if re.search(rb"/Type\s*/Page\b", body) and b"/Pages" not in body:
            m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
            if m:
                pages.append(int(m.group(1)))
    streams = []
    for cid in pages:
        body = objects.get(cid, b"")
        ms = re.search(rb"stream\r?\n", body)
        if not ms:
            streams.append(b"")
            continue
        start = ms.end()
        # honor /Length (the spec's framing): a delimiter regex would
        # truncate compressed payloads whose last byte happens to be \r
        # (it gets eaten as part of "\r?\nendstream") — found by the
        # hypothesis round-trip property
        mlen = re.search(rb"/Length\s+(\d+)", body)
        if mlen:
            raw = body[start:start + int(mlen.group(1))]
        else:
            m = _STREAM_RE.search(body)
            raw = m.group(1) if m else b""
        if re.search(rb"/Filter\s*/FlateDecode", body):
            raw = zlib.decompress(raw)
        streams.append(raw)
    return streams


def _runs_from_stream(data: bytes) -> list[tuple[float, float, float, str]]:
    """(x_pt, y_pt_baseline, font_size_pt, text) per shown text run."""
    runs = []
    fs = 12.0
    tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    lm = list(tm)  # line matrix (Td/TD move the LINE matrix)
    stack: list[Any] = []
    for kind, val in _tokenize_content(data):
        if kind in ("num", "str", "arr"):
            stack.append((kind, val))
            continue
        op = val
        if op == b"Tf" and len(stack) >= 1:
            fs = stack[-1][1] if stack[-1][0] == "num" else fs
            stack.clear()
        elif op == b"Tm" and len(stack) >= 6:
            tm = [s[1] for s in stack[-6:]]
            lm = list(tm)
            stack.clear()
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            tx, ty = stack[-2][1], stack[-1][1]
            lm = [lm[0], lm[1], lm[2], lm[3],
                  lm[4] + tx * lm[0] + ty * lm[2],
                  lm[5] + tx * lm[1] + ty * lm[3]]
            tm = list(lm)
            stack.clear()
        elif op == b"T*":
            tm = list(lm)
            stack.clear()
        elif op == b"BT":
            tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
            lm = list(tm)
            stack.clear()
        elif op in (b"Tj", b"'") and stack and stack[-1][0] == "str":
            text = stack[-1][1].decode("cp1252", errors="replace")
            eff_fs = fs * tm[3]  # vertical scale
            runs.append((tm[4], tm[5], eff_fs, text))
            tm[4] += COURIER_EM * fs * tm[0] * len(text)
            stack.clear()
        elif op == b"TJ" and stack and stack[-1][0] == "arr":
            eff_fs = fs * tm[3]
            x0 = tm[4]
            parts = []
            adv = 0.0
            for k2, v2 in stack[-1][1]:
                if k2 == "str":
                    parts.append(v2.decode("cp1252", errors="replace"))
                    adv += COURIER_EM * fs * len(v2)
                else:  # kerning: thousandths of em, subtracts advance
                    adv -= v2 / 1000.0 * fs
            if parts:
                runs.append((x0, tm[5], eff_fs, "".join(parts)))
            tm[4] += adv * tm[0]
            stack.clear()
        else:
            stack.clear()
    return runs


def extract_pdf_layout(pdf: bytes) -> dict[str, Any]:
    """PDF bytes -> layout document (the JSON channel's shape), with exact
    Courier-metric line/word boxes and ``confidence = 1.0`` words."""
    if not pdf.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    pages_out = []
    for pno, stream in enumerate(_page_content_streams(pdf), start=1):
        lines, words = [], []
        for x_pt, y_pt, fs, text in _runs_from_stream(stream):
            if not text.strip():
                continue
            h_in = fs / 72.0
            x0 = x_pt / 72.0
            y1 = (PAGE_H_PT - y_pt) / 72.0   # box bottom (baseline)
            y0 = y1 - h_in                    # box top (full-em ascent)
            ch_w = COURIER_EM * h_in
            x1 = x0 + ch_w * len(text)
            lines.append({"content": text, "polygon": [
                {"x": x0, "y": y0}, {"x": x1, "y": y0},
                {"x": x1, "y": y1}, {"x": x0, "y": y1}]})
            pos = 0
            for tok in text.split():
                at = text.index(tok, pos)
                pos = at + len(tok)
                wx0 = x0 + ch_w * at
                wx1 = wx0 + ch_w * len(tok)
                words.append({"content": tok, "confidence": 1.0,
                              "polygon": [
                                  {"x": wx0, "y": y0}, {"x": wx1, "y": y0},
                                  {"x": wx1, "y": y1}, {"x": wx0, "y": y1}]})
        pages_out.append({"page_number": pno, "lines": lines,
                          "words": words})
    return {"doc_kind": "pdf", "pages": pages_out}

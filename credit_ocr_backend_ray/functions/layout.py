"""Flatten a layout-analysis document (the PDF path) into line/word records.

Our PDF stand-in is a JSON layout document — the cloud OCR service of the
reference is not available in-sandbox, so the rasterize/OCR step is replaced
by a deterministic layout payload with the same information content as an
``AnalyzeResult``:

    {"pages": [{"page_number": int,
                "lines": [{"content": str, "polygon": [{"x","y"}]*4}],
                "words": [{"content": str, "polygon": [...], "confidence": f}]}]}

Parity: ``extract_text_lines_with_bbox_and_confidence``
(/root/reference/src/ocr/postprocess.py:20-71): per page emit one record per
line then one per word; a line's confidence is ``round(mean, 2)`` of the
confidences of words whose polygon center falls inside the line's bbox
envelope (inclusive), ``None`` when no word lands inside.
"""

from __future__ import annotations

from typing import Any


def _center(poly: list[dict], axis: str) -> float:
    return sum(p[axis] for p in poly) / len(poly)


def flatten_layout(doc: dict[str, Any]) -> list[dict[str, Any]]:
    records: list[dict[str, Any]] = []

    for page in doc.get("pages", []):
        page_number = page["page_number"]
        words = page.get("words", [])

        # precompute word centers once (reference recomputes per line)
        centers = [
            (_center(w["polygon"], "x"), _center(w["polygon"], "y"), w)
            if w.get("polygon") else None
            for w in words
        ]

        for line in page.get("lines", []):
            poly = line.get("polygon")
            conf = None
            if poly:
                min_x = min(p["x"] for p in poly)
                max_x = max(p["x"] for p in poly)
                min_y = min(p["y"] for p in poly)
                max_y = max(p["y"] for p in poly)
                inside = [
                    w["confidence"]
                    for c in centers if c is not None
                    for wx, wy, w in (c,)
                    if min_x <= wx <= max_x and min_y <= wy <= max_y
                    and w.get("confidence") is not None
                ]
                if inside:
                    conf = round(sum(inside) / len(inside), 2)

            records.append({
                "type": "line",
                "text": line["content"],
                "page": page_number,
                "bounding_box": [{"x": p["x"], "y": p["y"]} for p in poly] if poly else None,
                "confidence": conf,
            })

        for w in words:
            poly = w.get("polygon")
            records.append({
                "type": "word",
                "text": w["content"],
                "page": page_number,
                "bounding_box": [{"x": p["x"], "y": p["y"]} for p in poly] if poly else None,
                "confidence": round(w["confidence"], 2) if w.get("confidence") is not None else None,
            })

    return records

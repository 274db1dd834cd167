"""Normalize positioned OCR/layout lines into structured items.

Parity: ``normalize_ocr_lines`` (/root/reference/src/ocr/postprocess.py:211-264).
Output item order: all ``label_value`` pairs (detection order), then every
``line`` record with a bounding box as a ``text_line`` (input order).
Confidence backfill for pairs uses first-exact-text lookup over *all*
records (words included), taking min when both ends resolve.
"""

from __future__ import annotations

from typing import Any

from credit_ocr_backend_ray.functions.pairing import pair_label_values


def normalize_lines(ocr_lines: list[dict[str, Any]]) -> list[dict[str, Any]]:
    items: list[dict[str, Any]] = []

    pairs = pair_label_values(ocr_lines)

    # first-occurrence index by exact (unstripped) text, over all records
    by_text: dict[str, dict] = {}
    for rec in ocr_lines:
        by_text.setdefault(rec["text"], rec)

    for p in pairs:
        confidence = p.get("confidence")
        if confidence is None:
            label_rec = by_text.get(p["label"])
            value_rec = by_text.get(p["value"])
            if label_rec and value_rec:
                lc = label_rec.get("confidence")
                vc = value_rec.get("confidence")
                if lc is not None and vc is not None:
                    confidence = min(lc, vc)
                elif lc is not None:
                    confidence = lc
                elif vc is not None:
                    confidence = vc
        items.append({
            "type": "label_value",
            "label": p["label"],
            "value": p["value"],
            "page": p["page"],
            "confidence": confidence,
            "bounding_box": p.get("bounding_box"),
        })

    for rec in ocr_lines:
        if rec["type"] != "line" or rec.get("bounding_box") is None:
            continue
        items.append({
            "type": "text_line",
            "text": rec["text"].strip(),
            "page": rec["page"],
            "confidence": rec.get("confidence"),
            "bounding_box": rec.get("bounding_box"),
        })

    return items

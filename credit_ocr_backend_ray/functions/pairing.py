"""Label-value pairing over positioned text lines — the core layout heuristic.

Semantics pinned to the reference's ``extract_label_value_pairs``
(/root/reference/src/ocr/postprocess.py:74-208), including its quirks:

- the reading-order sort runs over *all* records (words included) before
  filtering to ``type == "line"``;
- pass 1 splits same-line ``label: value`` on the first colon;
- pass 2 treats left-column lines (``center_x < x_split``) as labels and
  pairs them with the nearest horizontally-aligned line strictly to the
  right (smallest center_x wins; ties keep the earlier line), falling back
  to a right-column line within the next two lines and ``|Δy| <= y_thresh``;
- pair confidence is ``min(label, value)`` via ``dict.get(..., 1.0)`` — a
  record that *has* a ``confidence`` key set to ``None`` makes ``min``
  raise ``TypeError``, exactly like the reference (callers isolate this
  per row as a poison-pill error);
- the "mark value line used" step resolves the value line by *first equal
  dict content* (the reference's ``list.index``), not by position.

This implementation is O(n log n + pairs*n) per page instead of the
reference's repeated-center-recomputation O(n^2) inner loops, with
bit-identical float results (centers/heights are computed once with the
same arithmetic expressions).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from credit_ocr_backend_ray.functions.geometry import (
    box_center_x, box_center_y, box_height,
)


def _first_equal_index(lines: list[dict], target: dict) -> int:
    # cheap text pre-filter before the full dict compare (bounding_box is a
    # list of point dicts, so == on the record is the expensive part); the
    # first index whose record compares equal is unchanged
    ttext = target["text"]
    for k, ln in enumerate(lines):
        if ln["text"] == ttext and ln == target:
            return k
    raise ValueError("line not found")


def pair_label_values(
    ocr_lines: list[dict[str, Any]],
    y_thresh: float = 0.2,
    x_split: float = 2.5,
) -> list[dict[str, Any]]:
    """Return label-value pair dicts
    ``{label, value, page, confidence, bounding_box}`` in detection order
    (colon pairs first, then geometric pairs, per page ascending)."""
    in_order = sorted(
        ocr_lines,
        key=lambda r: (r["page"], box_center_y(r["bounding_box"])),
    )

    pages: dict[int, list[dict]] = {}
    for rec in in_order:
        if rec["type"] != "line":
            continue
        pages.setdefault(rec["page"], []).append(rec)

    pairs: list[dict[str, Any]] = []

    for page, lines in pages.items():
        used: set[int] = set()
        # geometry computed once per line (identical expressions => identical
        # floats vs the reference's per-comparison recomputation)
        cxs = [box_center_x(ln["bounding_box"]) for ln in lines]
        cys = [box_center_y(ln["bounding_box"]) for ln in lines]
        hts = [box_height(ln["bounding_box"]) for ln in lines]

        # pass 1: same-line "label: value"
        for i, ln in enumerate(lines):
            if i in used:
                continue
            text = ln["text"].strip()
            if ":" not in text:
                continue
            label, value = (part.strip() for part in text.split(":", 1))
            if label and value:
                pairs.append({
                    "label": label,
                    "value": value,
                    "page": page,
                    "confidence": ln.get("confidence"),
                    "bounding_box": ln.get("bounding_box"),
                })
                used.add(i)

        # pass 2: two-column geometry — the candidate scan is vectorized
        # (numpy float64 ops are the same IEEE expressions as the scalar
        # loop, so thresholds/ties are bit-identical); argmin's first-min
        # rule reproduces "ties keep the earlier line"
        a_cx = np.asarray(cxs)
        a_cy = np.asarray(cys)
        a_ht = np.asarray(hts)
        has_box = np.fromiter((bool(ln["bounding_box"]) for ln in lines),
                              dtype=bool, count=len(lines))
        free = np.ones(len(lines), dtype=bool)
        for j in used:
            free[j] = False

        for i, ln in enumerate(lines):
            if i in used:
                continue
            text = ln["text"].strip()
            if cxs[i] >= x_split:
                continue  # not a left-column label candidate

            # nearest horizontally-aligned free line strictly to the right
            best_j = None
            if has_box[i]:
                cand = (free & has_box & (a_cx > cxs[i])
                        & (np.abs(cys[i] - a_cy)
                           <= np.maximum(hts[i], a_ht) * 0.1))
                if cand.any():
                    xs = np.where(cand, a_cx, np.inf)
                    best_j = int(np.argmin(xs))

            if best_j is not None:
                value_line = lines[best_j]
                pairs.append({
                    "label": text,
                    "value": value_line["text"].strip(),
                    "page": page,
                    "confidence": min(ln.get("confidence", 1.0),
                                      value_line.get("confidence", 1.0)),
                    "bounding_box": value_line.get("bounding_box"),
                })
                idx = _first_equal_index(lines, value_line)
                used.update([i, idx])
                free[i] = free[idx] = False
                continue

            # fallback: right-column value in the next <=2 lines, close in y
            for j in range(i + 1, min(i + 3, len(lines))):
                if j in used:
                    continue
                if cxs[j] > x_split and abs(cys[j] - cys[i]) <= y_thresh:
                    pairs.append({
                        "label": text,
                        "value": lines[j]["text"].strip(),
                        "page": page,
                        "confidence": min(ln.get("confidence", 1.0),
                                          lines[j].get("confidence", 1.0)),
                        "bounding_box": lines[j].get("bounding_box"),
                    })
                    used.update([i, j])
                    free[i] = free[j] = False
                    break

    return pairs

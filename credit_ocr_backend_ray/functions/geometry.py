"""Bounding-box geometry helpers.

Coordinates are in inches on an 8.5x11in page, boxes are 4-point polygons
``[{"x": float, "y": float}] * 4``. Arithmetic intentionally mirrors the
reference (sum/len centers, max-min extents, ``|Δy| <= 0.1 * max(h1, h2)``
alignment) so downstream floats are bit-identical — parity:
/root/reference/src/ocr/postprocess.py:84-108. The accumulation loops
start at 0.0 exactly like ``sum()``, so the float results are unchanged;
the explicit loops just drop the generator overhead (these run hundreds
of times per document in the pairing/sort hot path).
"""

from __future__ import annotations


def box_center_y(box) -> float:
    if not box:
        return 0.0
    t = 0.0
    for p in box:
        t += p["y"]
    return t / len(box)


def box_center_x(box) -> float:
    if not box:
        return 0.0
    t = 0.0
    for p in box:
        t += p["x"]
    return t / len(box)


def box_width(box) -> float:
    if not box:
        return 0.0
    it = iter(box)
    p = next(it)
    lo = hi = p["x"]
    for p in it:
        x = p["x"]
        if x < lo:
            lo = x
        elif x > hi:
            hi = x
    return hi - lo


def box_height(box) -> float:
    if not box:
        return 0.0
    it = iter(box)
    p = next(it)
    lo = hi = p["y"]
    for p in it:
        y = p["y"]
        if y < lo:
            lo = y
        elif y > hi:
            hi = y
    return hi - lo


def horizontally_aligned(box_a, box_b, threshold: float = 0.1) -> bool:
    """Two boxes sit on roughly the same text row: vertical center distance
    within ``threshold`` of the taller box's height."""
    if not box_a or not box_b:
        return False
    height = max(box_height(box_a), box_height(box_b))
    return abs(box_center_y(box_a) - box_center_y(box_b)) <= height * threshold

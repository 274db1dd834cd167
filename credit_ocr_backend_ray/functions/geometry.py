"""Bounding-box geometry helpers.

Coordinates are in inches on an 8.5x11in page, boxes are 4-point polygons
``[{"x": float, "y": float}] * 4``. Arithmetic expressions intentionally
mirror the reference (sum/len centers, max-min extents,
``|Δy| <= 0.1 * max(h1, h2)`` alignment) so downstream floats are
bit-identical — parity: /root/reference/src/ocr/postprocess.py:84-108.
"""

from __future__ import annotations


def box_center_y(box) -> float:
    if not box:
        return 0.0
    return sum(p["y"] for p in box) / len(box)


def box_center_x(box) -> float:
    if not box:
        return 0.0
    return sum(p["x"] for p in box) / len(box)


def box_width(box) -> float:
    if not box:
        return 0.0
    return max(p["x"] for p in box) - min(p["x"] for p in box)


def box_height(box) -> float:
    if not box:
        return 0.0
    return max(p["y"] for p in box) - min(p["y"] for p in box)


def horizontally_aligned(box_a, box_b, threshold: float = 0.1) -> bool:
    """Two boxes sit on roughly the same text row: vertical center distance
    within ``threshold`` of the taller box's height."""
    if not box_a or not box_b:
        return False
    height = max(box_height(box_a), box_height(box_b))
    return abs(box_center_y(box_a) - box_center_y(box_b)) <= height * threshold

"""Label-value pairing + normalization semantics (reference parity:
src/ocr/postprocess.py; fixture expectations from
tests/test_postprocess_label_extraction.py)."""

import pytest

from credit_ocr_backend_ray.functions.normalize import normalize_lines
from credit_ocr_backend_ray.functions.pairing import pair_label_values

MICRO = [
    {"type": "line", "text": "Firmenname", "page": 1,
     "bounding_box": [{"x": 0.5, "y": 1.0}] * 4},
    {"type": "line", "text": "Demo Tech GmbH", "page": 1,
     "bounding_box": [{"x": 3.0, "y": 1.01}] * 4},
    {"type": "line", "text": "USt-ID: DE123456789", "page": 1,
     "bounding_box": [{"x": 0.5, "y": 2.0}] * 4},
]


def test_micro_fixture_pairs():
    pairs = pair_label_values(MICRO)
    got = {(p["label"], p["value"]) for p in pairs}
    assert ("Firmenname", "Demo Tech GmbH") in got      # fallback mode
    assert ("USt-ID", "DE123456789") in got             # colon mode
    assert len(pairs) == 2


def test_colon_pairs_come_first():
    pairs = pair_label_values(MICRO)
    assert pairs[0]["label"] == "USt-ID"  # pass 1 appends before pass 2


def test_canonical_form_all_22_pairs(canonical_form_lines):
    pairs = pair_label_values(canonical_form_lines)
    assert len(pairs) == 22
    by_label = {p["label"]: p for p in pairs}
    p = by_label["Rechtsform"]
    assert p["value"] == "Gesellschaft mit beschränkter Haftung (GmbH)"
    assert p["page"] == 1
    # min(label 0.95, value 0.97)
    assert p["confidence"] == 0.95
    # OCR-typo passthrough (reference test :72)
    assert by_label["Adresse"]["value"] == "Innovationsntraße 1, 70469 Stuttgart"


def test_pair_confidence_is_min(canonical_form_lines):
    pairs = pair_label_values(canonical_form_lines)
    for p in pairs:
        if ":" not in p["label"]:
            assert p["confidence"] == 0.95  # label conf is the min everywhere


def test_words_are_ignored():
    lines = MICRO + [
        {"type": "word", "text": "Firmenname", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": 0.9},
    ]
    assert len(pair_label_values(lines)) == 2


def test_right_column_line_is_not_a_label():
    lines = [
        {"type": "line", "text": "OnlyValue", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.0}] * 4},
    ]
    assert pair_label_values(lines) == []


def test_fallback_respects_y_thresh():
    lines = [
        {"type": "line", "text": "Label", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4},
        {"type": "line", "text": "TooFar", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.3}] * 4},  # dy=0.3 > 0.2
    ]
    assert pair_label_values(lines) == []
    lines[1]["bounding_box"] = [{"x": 3.0, "y": 1.2}] * 4  # dy=0.2 boundary
    assert len(pair_label_values(lines)) == 1


def test_none_confidence_in_pass2_raises_like_reference():
    # reference quirk: min(None, x) in pass 2 raises TypeError
    # (postprocess.py:180); the pipeline isolates it per row
    lines = [
        {"type": "line", "text": "Label", "page": 1, "confidence": None,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4},
        {"type": "line", "text": "Value", "page": 1, "confidence": 0.9,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4},
    ]
    with pytest.raises(TypeError):
        pair_label_values(lines)


def test_normalize_shapes(canonical_form_lines):
    items = normalize_lines(canonical_form_lines)
    pairs = [i for i in items if i["type"] == "label_value"]
    texts = [i for i in items if i["type"] == "text_line"]
    assert len(pairs) == 22
    assert len(texts) == 44  # every line re-emitted
    assert items[:22] == pairs  # pairs first, then text lines
    for i in pairs:
        assert set(i) == {"type", "label", "value", "page", "confidence",
                          "bounding_box"}
    for i in texts:
        assert set(i) == {"type", "text", "page", "confidence",
                          "bounding_box"}


def test_normalize_skips_boxless_lines():
    lines = MICRO + [
        {"type": "line", "text": "nobox", "page": 1, "bounding_box": None},
    ]
    items = normalize_lines(lines)
    assert all(i.get("text") != "nobox" for i in items)


def test_normalize_confidence_backfill():
    # colon pair with no own confidence: backfilled via exact-text lookup
    lines = [
        {"type": "line", "text": "A: B", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4},
        {"type": "line", "text": "A", "page": 1, "confidence": 0.7,
         "bounding_box": [{"x": 0.5, "y": 2.0}] * 4},
        {"type": "line", "text": "B", "page": 1, "confidence": 0.6,
         "bounding_box": [{"x": 0.5, "y": 3.0}] * 4},
    ]
    items = normalize_lines(lines)
    pair = next(i for i in items if i["type"] == "label_value")
    assert pair["confidence"] == 0.6  # min of both ends

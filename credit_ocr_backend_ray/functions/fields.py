"""Deterministic field mapper — grounding without the LLM.

The reference's LLM stage (``extract_fields_with_llm``,
/root/reference/src/llm/field_extractor.py:307-442) only uses the model to
*propose* field names; every proposed field is then grounded deterministically
(steps 3-5): resolve to the first normalized ``label_value`` item whose label
contains a configured German label for the field, else the first original
``line`` whose text contains one, carrying over value / confidence /
bounding_box / page (``confidence`` default 0.5 when absent).

This mapper runs exactly that grounding over the *configured* field list
(field_mappings inverted, scan order = mapping insertion order), which makes
the whole stage deterministic and byte-reproducible; a model-backed mapper
can be swapped in as an actor-pool stage behind the same signature
(see stages/extract.py).

Contract (pinned by goldens):
- ``extracted_fields``: dict keyed by English field name in
  ``expected_fields`` order; values ``{value, confidence, bounding_box?,
  page?}`` — bbox/page only when grounded;
- empty input => no fields, ``missing_fields`` = all expected fields
  (reference behavior at field_extractor.py:327-332);
- ``validation_results`` for every extracted field with rules.
"""

from __future__ import annotations

from typing import Any

from credit_ocr_backend_ray.config import DocTypeConfig, labels_by_field
from credit_ocr_backend_ray.functions.validate import validate_fields


def map_fields(
    normalized_items: list[dict[str, Any]],
    original_lines: list[dict[str, Any]] | None,
    cfg: DocTypeConfig,
) -> dict[str, Any]:
    if not normalized_items:
        return {
            "extracted_fields": {},
            "missing_fields": list(cfg.expected_fields),
            "validation_results": {},
        }

    label_sets = labels_by_field(cfg)
    extracted: dict[str, Any] = {}

    # lowercase each candidate label/line once, not once per expected field
    # (the scan itself stays per-field so first-match order is unchanged)
    lv_items = [(item, item["label"].lower()) for item in normalized_items
                if item["type"] == "label_value"]
    lines_lc: list[tuple[dict[str, Any], str]] | None = None

    for field_name in cfg.expected_fields:
        german_labels = label_sets.get(field_name, [])
        if not german_labels:
            continue

        hit = None
        for item, item_label in lv_items:
            if any(lbl in item_label for lbl in german_labels):
                hit = item
                break

        if hit is not None:
            extracted[field_name] = {
                "value": hit["value"],
                "confidence": hit.get("confidence", 0.5),
                "bounding_box": hit.get("bounding_box"),
                "page": hit.get("page"),
            }
            continue

        if original_lines:
            if lines_lc is None:
                lines_lc = [(ln, ln["text"].lower()) for ln in original_lines
                            if ln["type"] == "line"]
            for line, text in lines_lc:
                if any(lbl in text for lbl in german_labels):
                    extracted[field_name] = {
                        "value": line["text"],
                        "confidence": line.get("confidence", 0.5),
                        "bounding_box": line.get("bounding_box"),
                        "page": line.get("page"),
                    }
                    break

    missing = [f for f in cfg.expected_fields if f not in extracted]

    return {
        "extracted_fields": extracted,
        "missing_fields": missing,
        "validation_results": validate_fields(extracted, cfg),
    }

"""Field validation against per-field rules (type / min / max / pattern).

Parity: ``validate_field`` / ``validate_extracted_fields``
(/root/reference/src/llm/field_extractor.py:235-305):

- the value must arrive as ``{"value": ...}`` else
  ``["Invalid field format"]``;
- number checks normalize German format first
  (``"1.234,56" -> "1234.56"``) and silently pass on unparseable values in
  the min/max branches (type branch reports);
- ``pattern`` is matched with ``re.match`` against ``str(value)``;
- a field is only validated when the config has rules for it.
"""

from __future__ import annotations

import re
from typing import Any

from credit_ocr_backend_ray.config import DocTypeConfig


def _german_to_float(v: Any) -> float:
    if isinstance(v, str):
        v = v.replace(".", "").replace(",", ".")
    return float(v)


def validate_field(field_data: Any, rules: dict[str, Any]) -> dict[str, Any]:
    result: dict[str, Any] = {"is_valid": True, "errors": []}

    if not isinstance(field_data, dict) or "value" not in field_data:
        result["is_valid"] = False
        result["errors"].append("Invalid field format")
        return result

    value = field_data["value"]
    rule_type = rules.get("type")

    if rule_type == "number":
        try:
            _german_to_float(value)
        except (ValueError, TypeError):
            result["is_valid"] = False
            result["errors"].append("Value must be a number")
    elif rule_type == "boolean":
        if str(value).lower() not in ("true", "false"):
            result["is_valid"] = False
            result["errors"].append("Value must be a boolean")
    # dates fall through to pattern validation only

    if "min" in rules and rule_type == "number":
        try:
            if _german_to_float(value) < rules["min"]:
                result["is_valid"] = False
                result["errors"].append(f"Value must be at least {rules['min']}")
        except (ValueError, TypeError):
            pass

    if "max" in rules and rule_type == "number":
        try:
            if _german_to_float(value) > rules["max"]:
                result["is_valid"] = False
                result["errors"].append(f"Value must be at most {rules['max']}")
        except (ValueError, TypeError):
            pass

    if "pattern" in rules:
        if not re.match(rules["pattern"], str(value)):
            result["is_valid"] = False
            result["errors"].append("Value does not match required pattern")

    return result


def validate_fields(
    fields: dict[str, Any], cfg: DocTypeConfig
) -> dict[str, Any]:
    """Validate every extracted field that has rules configured."""
    return {
        name: validate_field(data, cfg.validation_rules[name])
        for name, data in fields.items()
        if name in cfg.validation_rules
    }

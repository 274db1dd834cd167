"""Typed scalar value cleaning (string/date/currency/area/number/boolean).

Parity: ``clean_value`` (/root/reference/src/llm/field_extractor.py:42-76),
including the behavior-defining quirk that two-separator German amounts like
``"4.200.000€"`` clean to ``"4.200.000"`` and then **raise ValueError** from
``float()`` (the reference leaves that unguarded). Callers in the pipeline
catch per row. Single-separator amounts parse the thousands dot as a decimal
point (``"700.000€" -> 700.0``).
"""

from __future__ import annotations

import re
from typing import Any

_DATE_RE = re.compile(r"^\d{2}\.\d{2}\.\d{4}$")


def clean_value(value: str, field_type: str) -> Any:
    if not value:
        return None

    if field_type == "string":
        return value.strip()

    if field_type == "date":
        # German DD.MM.YYYY only; anything else is dropped
        return value if _DATE_RE.match(value) else None

    if field_type == "currency":
        stripped = value.replace("€", "").replace(" ", "").replace(",", ".")
        stripped = "".join(ch for ch in stripped if ch.isdigit() or ch == ".")
        return float(stripped) if stripped else None

    if field_type == "area":
        stripped = value.replace("m²", "").replace(" ", "")
        return float(stripped) if stripped else None

    if field_type == "number":
        digits = "".join(ch for ch in value if ch.isdigit())
        return int(digits) if digits else None

    if field_type == "boolean":
        return "[x]" in value.lower()

    return value

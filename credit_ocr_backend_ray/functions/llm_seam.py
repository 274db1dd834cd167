"""The LLM seam: prompt assembly (M7) and response parsing (M8).

The engine's default field mapper is deterministic (functions/fields.py),
but the reference's model-backed path stays available behind the same
seam: these two pure kernels reproduce its prompt construction
(``create_extraction_prompt``, /root/reference/src/llm/field_extractor.py:
168-233) and its fenced-JSON response parser
(``extract_json_from_response``, field_extractor.py:138-166). A real
model client slots in as an actor-pool ``map_batches`` stage between
them (warm weights per actor); everything else in the chain is unchanged.
"""

from __future__ import annotations

import json
from typing import Any

from credit_ocr_backend_ray.config import DocTypeConfig

_INSTRUCTIONS = """Instructions:
1. Return a valid JSON object with the extracted fields
2. Use the exact field names from the mappings above
3. Include only fields that are present in the document
4. For fields with units (e.g., years, currency), include the unit in the value
5. For boolean fields, return true/false
6. For dates, use the format DD.MM.YYYY
7. For numbers, include any units or currency symbols"""

_EXAMPLE = """Example response format:
{
    "extracted_fields": {
        "company_name": "Demo Tech GmbH",
        "legal_form": "GmbH",
        "founding_date": "01.01.2020",
        "business_address": "Musterstraße 123, 12345 Berlin",
        "purchase_price": "500.000 €",
        "term": "20 Jahre",
        "interest_rate": "3,5%"
    },
    "missing_fields": ["website", "vat_id"],
    "validation_results": {
        "company_name": {"valid": true},
        "legal_form": {"valid": true},
        "founding_date": {"valid": true}
    }
}

Please extract the fields from the document content above and return a JSON object in this format."""


def create_extraction_prompt(items: list[dict[str, Any]],
                             cfg: DocTypeConfig) -> str:
    """Per-document prompt, byte-for-byte the reference's
    ``create_extraction_prompt`` (field_extractor.py:168-233): field
    descriptions (German name lifted from the trailing parenthetical of
    each description), the label mapping table (unicode ``→`` arrows), the
    document content — ``label: value`` for pairs, raw text for
    ``text_line``/``line`` items — then the instruction block and the
    literal example-response JSON. Pinned by a differential test that
    executes the reference function on the same inputs."""
    descriptions = []
    for fname, desc in cfg.field_descriptions.items():
        german = desc.split("(")[-1].strip(")") if "(" in desc else ""
        descriptions.append(f"- {fname} ({german}): {desc}")

    mappings = [f"- {german} → {english}"
                for german, english in cfg.field_mappings.items()]

    content = []
    for it in items:
        if it["type"] == "label_value":
            content.append(f"{it['label']}: {it['value']}")
        elif it["type"] in ("text_line", "line"):
            content.append(it["text"])

    nl = "\n"
    return (
        "Extract the following fields from the document content below. "
        "Return a valid JSON object with the extracted fields.\n\n"
        f"Field Descriptions:\n{nl.join(descriptions)}\n\n"
        "Field Mappings (use these exact field names in your response):\n"
        f"{nl.join(mappings)}\n\n"
        f"Document Content:\n{nl.join(content)}\n\n"
        f"{_INSTRUCTIONS}\n\n"
        f"{_EXAMPLE}"
    )


def extract_json_from_response(response: str) -> dict[str, Any]:
    """Parse a model response into JSON (parity: field_extractor.py:138-166):
    take the body of the FIRST ``` code fence when one exists, strip
    ``//`` line comments, then ``json.loads``; raise ``ValueError`` on
    anything unparsable (callers isolate this per row, like every other
    poison pill)."""
    if "```" in response:
        start = response.find("```")
        start = response.find("\n", start) + 1
        end = response.find("```", start)
        if end != -1:
            response = response[start:end].strip()

    lines = []
    for line in response.split("\n"):
        if "//" in line:
            line = line[:line.find("//")]
        lines.append(line)
    response = "\n".join(lines)

    try:
        return json.loads(response)
    except json.JSONDecodeError as e:
        raise ValueError(f"Invalid JSON in response: {e}") from e

"""Document-type configuration: the extraction-rule plugin surface.

Semantic parity target: /root/reference/config/document_types.conf (loaded by
src/config.py:149-173 and src/llm/field_extractor.py:14-29). Same keys, same
22 expected fields, same 37-entry German-label -> English-field mapping
(synonyms included), same validation rules — expressed as Python literals and
loadable from the same JSON shape for user-supplied document types.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class DocTypeConfig:
    name: str
    expected_fields: list[str]
    field_descriptions: dict[str, str]
    validation_rules: dict[str, Any]
    field_mappings: dict[str, str] = field(default_factory=dict)


def _num_rule(desc: str, lo: float | None = 0, hi: float | None = None) -> dict:
    r: dict[str, Any] = {"type": "number", "description": desc}
    if lo is not None:
        r["min"] = lo
    if hi is not None:
        r["max"] = hi
    return r


def _str_rule(pattern: str, desc: str) -> dict:
    return {"type": "string", "pattern": pattern, "description": desc}


# 22 canonical fields of the "Kreditantrag" document type, in contract order
# (reference document_types.conf:4-27).
CREDIT_REQUEST_FIELDS = [
    "company_name", "legal_form", "founding_date", "business_address",
    "commercial_register", "vat_id", "website", "property_type",
    "property_name", "property_address", "purchase_price", "requested_amount",
    "purpose", "equity_share", "construction_year", "total_area",
    "loan_amount", "term", "monthly_payment", "interest_rate",
    "early_repayment", "public_funding",
]

# German label -> English field name; includes synonym entries and two
# English-alias entries exactly as the reference ships them
# (document_types.conf:52-91).
CREDIT_REQUEST_MAPPINGS = {
    "Firmenname": "company_name",
    "Rechtsform": "legal_form",
    "Gründungsdatum": "founding_date",
    "Geschäftsanschrift": "business_address",
    "Handelsregisternummer / Gericht": "commercial_register",
    "USt-ID / Steuernummer": "vat_id",
    "Website": "website",
    "Art der Immobilie": "property_type",
    "Objektbezeichnung": "property_name",
    "Adresse": "property_address",
    "Kaufpreis / Baukosten": "purchase_price",
    "gewünschte Finanzierungssumme": "requested_amount",
    "Verwendungszweck": "purpose",
    "Eigenkapitalanteil": "equity_share",
    "Baujahr": "construction_year",
    "Fläche gesamt": "total_area",
    "Gewünschte Darlehenssumme": "loan_amount",
    "Laufzeit": "term",
    "Ratenwunsch": "monthly_payment",
    "Zinssatz": "interest_rate",
    "Sondertilgungen gewünscht": "early_repayment",
    "Öffentliche Fördermittel beantragt": "public_funding",
    "Finanzierungssumme": "requested_amount",
    "Darlehenssumme": "loan_amount",
    "Kreditsumme": "loan_amount",
    "Grundstücksfläche": "total_area",
    "Immobilienfläche": "total_area",
    "Monatliche Rate": "monthly_payment",
    "Monatsrate": "monthly_payment",
    "Eigenkapital": "equity_share",
    "Eigenmittel": "equity_share",
    "Förderung": "public_funding",
    "Fördermittel": "public_funding",
    "financing_request": "requested_amount",
    "purpose_of_loan": "purpose",
    "property_area": "total_area",
    "repayment_amount": "monthly_payment",
    "repayment_frequency": "term",
}

CREDIT_REQUEST_DESCRIPTIONS = {
    "company_name": "Name of the company (Firmenname)",
    "legal_form": "Legal form of the company (Rechtsform)",
    "founding_date": "Date when the company was founded (Gründungsdatum)",
    "business_address": "Business address (Geschäftsanschrift)",
    "commercial_register":
        "Commercial register number and court (Handelsregisternummer / Gericht)",
    "vat_id": "VAT ID / Tax number (USt-ID / Steuernummer)",
    "website": "Company website (Website)",
    "property_type": "Type of property (Art der Immobilie)",
    "property_name": "Name of the property (Objektbezeichnung)",
    "property_address": "Address of the property (Adresse)",
    "purchase_price": "Purchase price / Construction costs (Kaufpreis / Baukosten)",
    "requested_amount": "Requested financing amount (gewünschte Finanzierungssumme)",
    "purpose": "Purpose of the loan (Verwendungszweck)",
    "equity_share": "Equity share (Eigenkapitalanteil)",
    "construction_year": "Year of construction (Baujahr)",
    "total_area": "Total area (Fläche gesamt)",
    "loan_amount": "Requested loan amount (Gewünschte Darlehenssumme)",
    "term": "Loan term (Laufzeit)",
    "monthly_payment": "Monthly payment (Ratenwunsch)",
    "interest_rate": "Interest rate (Zinssatz)",
    "early_repayment": "Early repayment desired (Sondertilgung gewünscht?)",
    "public_funding": "Public funding applied for (Öffentliche Fördermittel beantragt)",
}

_ADDR_PAT = "^[A-Za-z0-9\\s\\.,\\-]+\\s+\\d{5}\\s+[A-Za-z0-9\\s\\.,\\-]+$"

CREDIT_REQUEST_RULES = {
    "company_name": _str_rule(
        "^[A-Za-z0-9\\s\\.\\-&]+$",
        "Company name must contain only letters, numbers, spaces, dots, hyphens, and ampersands"),
    "legal_form": _str_rule(
        "^(GmbH|AG|UG|KG|OHG|e\\.V\\.|e\\.G\\.)$",
        "Legal form must be one of: GmbH, AG, UG, KG, OHG, e.V., e.G."),
    "founding_date": {
        "type": "date", "pattern": "^\\d{4}-\\d{2}-\\d{2}$",
        "description": "Date must be in YYYY-MM-DD format"},
    "business_address": _str_rule(
        _ADDR_PAT, "Address must include street, postal code, and city"),
    "commercial_register": _str_rule(
        "^HRB\\s+\\d+\\s+/\\s+[A-Za-z\\s]+$",
        "Must be in format 'HRB XXXXX / Court Name'"),
    "vat_id": _str_rule(
        "^DE\\d{9}$", "VAT ID must start with DE followed by 9 digits"),
    "website": _str_rule(
        "^https?://[\\w\\-]+(\\.[\\w\\-]+)+[/#?]?.*$", "Must be a valid URL"),
    "property_type": _str_rule(
        "^[A-Za-z\\s\\-]+$",
        "Property type must contain only letters, spaces, and hyphens"),
    "property_name": _str_rule(
        "^[A-Za-z0-9\\s\\-]+$",
        "Property name must contain only letters, numbers, spaces, and hyphens"),
    "property_address": _str_rule(
        _ADDR_PAT, "Address must include street, postal code, and city"),
    "purchase_price": _num_rule("Purchase price must be a positive number"),
    "requested_amount": _num_rule("Credit amount must be a positive number"),
    "purpose": _str_rule(
        "^[A-Za-z0-9\\s\\.,\\-]+$",
        "Purpose must contain only letters, numbers, spaces, dots, commas, and hyphens"),
    "equity_share": _num_rule(
        "Equity share must be between 0 and 100 percent", 0, 100),
    "construction_year": _num_rule(
        "Construction year must be between 1800 and 2100", 1800, 2100),
    "total_area": _num_rule("Area must be a positive number"),
    "loan_amount": _num_rule("Loan amount must be a positive number"),
    "term": _num_rule("Term must be a positive number"),
    "monthly_payment": _num_rule("Monthly payment must be a positive number"),
    "interest_rate": _num_rule(
        "Interest rate must be between 0 and 100 percent", 0, 100),
    "early_repayment": {
        "type": "boolean",
        "pattern": "^\\[x\\]\\s*ja\\s*\\[\\s*\\]\\s*nein$",
        "description": "Early repayment must be true or false"},
    "public_funding": {
        "type": "boolean",
        "pattern": "^\\[\\s*\\]\\s*ja\\s*\\[x\\]\\s*nein$",
        "description": "Public funding must be true or false"},
}


def default_config() -> dict[str, DocTypeConfig]:
    """The built-in document-type registry (one type: credit_request)."""
    return {
        "credit_request": DocTypeConfig(
            name="Kreditantrag",
            expected_fields=list(CREDIT_REQUEST_FIELDS),
            field_descriptions=dict(CREDIT_REQUEST_DESCRIPTIONS),
            validation_rules={k: dict(v) for k, v in CREDIT_REQUEST_RULES.items()},
            field_mappings=dict(CREDIT_REQUEST_MAPPINGS),
        )
    }


def load_config(path: str) -> dict[str, DocTypeConfig]:
    """Load user-supplied document types from the reference's JSON shape
    (parity: src/llm/field_extractor.py:14-29)."""
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    out = {}
    for key, c in raw.items():
        out[key] = DocTypeConfig(
            name=c["name"],
            expected_fields=c["expected_fields"],
            field_descriptions=c["field_descriptions"],
            validation_rules=c["validation_rules"],
            field_mappings=c.get("field_mappings", {}),
        )
    return out


def labels_by_field(cfg: DocTypeConfig) -> dict[str, list[str]]:
    """Invert field_mappings: English field -> lowercase German labels, in
    mapping-insertion order (the order the reference scans them,
    field_extractor.py:360-364). Cached on the config instance — the
    mapper calls this once per document, and the inversion is pure."""
    cached = getattr(cfg, "_labels_by_field", None)
    if cached is None:
        inv: dict[str, list[str]] = {}
        for label, eng in cfg.field_mappings.items():
            inv.setdefault(eng, []).append(label.lower())
        cached = inv
        object.__setattr__(cfg, "_labels_by_field", inv)  # frozen dataclass
    return cached

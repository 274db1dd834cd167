"""clean_value / validate_field parity vectors (FIXTURES.md §9-§10;
reference src/llm/field_extractor.py:42-76, :235-305)."""

import pytest

from credit_ocr_backend_ray.config import default_config
from credit_ocr_backend_ray.functions.values import clean_value
from credit_ocr_backend_ray.functions.validate import validate_field, validate_fields


def test_currency_two_separator_quirk_raises():
    with pytest.raises(ValueError):
        clean_value("4.200.000€", "currency")


@pytest.mark.parametrize("value,expected", [
    ("700.000€", 700.0),          # thousands dot parsed as decimal point
    ("500.000 €", 500.0),
    ("1234,56 €", 1234.56),
])
def test_currency(value, expected):
    assert clean_value(value, "currency") == expected


def test_area_number_date_bool_string():
    assert clean_value("2.800 m²", "area") == 2.8
    assert clean_value("20 Jahre", "number") == 20
    assert clean_value("15.03.2018", "date") == "15.03.2018"
    assert clean_value("2018-03-15", "date") is None
    assert clean_value("[x] ja [ ] nein", "boolean") is True
    # reference quirk: the check is merely '"[x]" in value' — a checked
    # "nein" box also yields True (field_extractor.py:74)
    assert clean_value("[ ] ja [x] nein", "boolean") is True
    assert clean_value("[ ] ja [ ] nein", "boolean") is False
    assert clean_value("  DemoTech GmbH ", "string") == "DemoTech GmbH"
    assert clean_value("", "string") is None
    assert clean_value("anything", "unknown_type") == "anything"


def test_validate_malformed_field():
    r = validate_field("not a dict", {"type": "number"})
    assert r == {"is_valid": False, "errors": ["Invalid field format"]}
    r = validate_field({"no_value": 1}, {"type": "number"})
    assert r["errors"] == ["Invalid field format"]


def test_validate_german_number_format():
    r = validate_field({"value": "1.234,56"}, {"type": "number"})
    assert r["is_valid"] is True


def test_validate_range():
    rules = {"type": "number", "min": 0, "max": 100}
    assert validate_field({"value": "50"}, rules)["is_valid"]
    r = validate_field({"value": "150"}, rules)
    assert not r["is_valid"] and "at most 100" in r["errors"][0]
    r = validate_field({"value": "-1"}, rules)
    assert not r["is_valid"] and "at least 0" in r["errors"][0]


def test_validate_pattern():
    rules = {"type": "string", "pattern": "^DE\\d{9}$"}
    assert validate_field({"value": "DE123456789"}, rules)["is_valid"]
    r = validate_field({"value": "12345"}, rules)
    assert r["errors"] == ["Value does not match required pattern"]


def test_validate_boolean():
    rules = {"type": "boolean"}
    assert validate_field({"value": True}, rules)["is_valid"]
    assert not validate_field({"value": "[x] ja"}, rules)["is_valid"]


def test_validate_only_ruled_fields():
    cfg = default_config()["credit_request"]
    fields = {"company_name": {"value": "X GmbH"},
              "not_a_known_field": {"value": "y"}}
    res = validate_fields(fields, cfg)
    assert set(res) == {"company_name"}

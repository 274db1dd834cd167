"""Deterministic field mapper contract (reference grounding semantics,
src/llm/field_extractor.py:307-442; structural assertions mirrored from
tests/test_field_extraction.py:274-327)."""

from credit_ocr_backend_ray.functions.fields import map_fields
from credit_ocr_backend_ray.functions.normalize import normalize_lines


def test_empty_input_all_missing(credit_cfg):
    out = map_fields([], None, credit_cfg)
    assert out["extracted_fields"] == {}
    assert len(out["missing_fields"]) == 22
    assert out["validation_results"] == {}


def test_canonical_form_extracts_all_22(credit_cfg, canonical_form_lines):
    items = normalize_lines(canonical_form_lines)
    out = map_fields(items, canonical_form_lines, credit_cfg)
    assert len(out["extracted_fields"]) == 22
    assert out["missing_fields"] == []
    f = out["extracted_fields"]
    assert f["company_name"]["value"] == "DemoTech GmbH"
    assert f["vat_id"]["value"] == "DE123456789"
    assert f["loan_amount"]["value"] == "3.500.000€"
    assert f["early_repayment"]["value"] == "[x] ja [ ] nein"
    assert f["public_funding"]["value"] == "[ ] ja [x] nein"


def test_field_shape_invariants(credit_cfg, canonical_form_lines):
    items = normalize_lines(canonical_form_lines)
    out = map_fields(items, canonical_form_lines, credit_cfg)
    for name, data in out["extracted_fields"].items():
        assert "value" in data
        assert 0.0 <= data["confidence"] <= 1.0
        if data.get("bounding_box"):
            assert data.get("page") is not None  # bbox implies page


def test_validation_results_shape(credit_cfg, canonical_form_lines):
    items = normalize_lines(canonical_form_lines)
    out = map_fields(items, canonical_form_lines, credit_cfg)
    v = out["validation_results"]
    assert set(v) == set(out["extracted_fields"])  # all 22 have rules
    for r in v.values():
        assert isinstance(r["is_valid"], bool)
        assert isinstance(r["errors"], list)
    assert v["vat_id"]["is_valid"] is True
    assert v["company_name"]["is_valid"] is True
    # faithful reference quirks: German date format fails the ISO pattern,
    # currency strings fail number parse
    assert v["founding_date"]["is_valid"] is False
    assert v["purchase_price"]["is_valid"] is False


def test_fallback_to_original_lines(credit_cfg):
    # no pairs at all, but a raw line containing a known label
    lines = [{"type": "line", "text": "Firmenname Muster AG", "page": 2,
              "bounding_box": [{"x": 4.0, "y": 1.0}] * 4, "confidence": 0.8}]
    out = map_fields(normalize_lines(lines), lines, credit_cfg)
    f = out["extracted_fields"]["company_name"]
    assert f["value"] == "Firmenname Muster AG"  # whole line, per reference
    assert f["confidence"] == 0.8
    assert f["page"] == 2


def test_synonym_labels(credit_cfg):
    lines = [
        {"type": "line", "text": "Kreditsumme: 1.000 €", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": 0.9},
    ]
    out = map_fields(normalize_lines(lines), lines, credit_cfg)
    assert out["extracted_fields"]["loan_amount"]["value"] == "1.000 €"


def test_create_extraction_prompt_structure(credit_cfg):
    from credit_ocr_backend_ray.functions.llm_seam import create_extraction_prompt

    items = [
        {"type": "label_value", "label": "Firmenname", "value": "X GmbH"},
        {"type": "text_line", "text": "freier Text"},
        {"type": "line", "text": "noch eine Zeile"},
        {"type": "word", "text": "ignored-type-word"},
    ]
    p = create_extraction_prompt(items, credit_cfg)
    assert "Firmenname: X GmbH" in p
    assert "freier Text" in p and "noch eine Zeile" in p
    assert "ignored-type-word" not in p
    # the mapping table lists German -> English pairs
    assert "- Firmenname → company_name" in p  # unicode arrow, as the reference
    # content preserves item order
    assert p.find("Firmenname: X GmbH") < p.find("freier Text") < p.find(
        "noch eine Zeile")


def test_create_extraction_prompt_byte_identical_to_reference(credit_cfg):
    """Differential parity pin: execute the REFERENCE's own
    create_extraction_prompt (field_extractor.py:168-233, extracted via
    ast so its aiohttp-importing module never loads) on the same items and
    require byte-identical prompts."""
    import ast

    src = open("/root/reference/src/llm/field_extractor.py",
               encoding="utf-8").read()
    tree = ast.parse(src)
    fn = [n for n in tree.body if isinstance(n, ast.FunctionDef)
          and n.name == "create_extraction_prompt"][0]
    for a in fn.args.args:
        a.annotation = None
    fn.returns = None
    ns: dict = {}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
    ref_fn = ns["create_extraction_prompt"]

    from credit_ocr_backend_ray.functions.llm_seam import (
        create_extraction_prompt)

    items = [
        {"type": "label_value", "label": "Firmenname", "value": "X GmbH"},
        {"type": "label_value", "label": "Laufzeit", "value": "20 Jahre"},
        {"type": "text_line", "text": "freier Text"},
        {"type": "line", "text": "noch eine Zeile"},
        {"type": "word", "text": "ignored"},
    ]
    assert create_extraction_prompt(items, credit_cfg) == ref_fn(
        items, credit_cfg)
    assert create_extraction_prompt([], credit_cfg) == ref_fn([], credit_cfg)


def test_extract_json_from_response_fences_and_comments():
    import pytest
    from credit_ocr_backend_ray.functions.llm_seam import (
        extract_json_from_response)

    fenced = 'Here you go:\n```json\n{"a": 1} // trailing\n```\nthanks'
    assert extract_json_from_response(fenced) == {"a": 1}
    bare = '{"b": [1, 2], // comment line\n "c": "x//y-after-comment"}'
    # the reference strips from the FIRST // even inside strings — quirk
    # preserved (field_extractor.py:151-156): that line truncates and the
    # JSON breaks, so this raises
    with pytest.raises(ValueError):
        extract_json_from_response(bare)
    assert extract_json_from_response('{"c": 3}') == {"c": 3}
    with pytest.raises(ValueError):
        extract_json_from_response("not json at all")
    # unterminated fence: fence body runs to the end and fails to parse
    with pytest.raises(ValueError):
        extract_json_from_response("```json\n{unclosed")

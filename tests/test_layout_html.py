"""Layout flattening (reference postprocess.py:20-71 semantics) and the
DOM text-density HTML extractor."""

import json

from credit_ocr_backend_ray.functions.html_extract import (
    extracted_text_from_lines, html_to_lines, link_stats, node_text, parse_dom,
)
from credit_ocr_backend_ray.functions.layout import flatten_layout
from credit_ocr_backend_ray.sources.synth import _form_html, _layout_doc, form_rows


def _word(content, x, y, conf):
    return {"content": content, "confidence": conf, "polygon": [
        {"x": x, "y": y - 0.05}, {"x": x + 0.5, "y": y - 0.05},
        {"x": x + 0.5, "y": y + 0.05}, {"x": x, "y": y + 0.05}]}


def test_flatten_line_confidence_is_word_mean_rounded():
    doc = {"pages": [{
        "page_number": 1,
        "lines": [{"content": "ab cd", "polygon": [
            {"x": 0.0, "y": 0.9}, {"x": 2.0, "y": 0.9},
            {"x": 2.0, "y": 1.1}, {"x": 0.0, "y": 1.1}]}],
        "words": [_word("ab", 0.1, 1.0, 0.913), _word("cd", 1.0, 1.0, 0.5),
                  _word("far", 0.1, 5.0, 0.1)],  # outside the line box
    }]}
    recs = flatten_layout(doc)
    line = recs[0]
    assert line["type"] == "line"
    assert line["confidence"] == round((0.913 + 0.5) / 2, 2)  # 0.71
    words = [r for r in recs if r["type"] == "word"]
    assert [w["confidence"] for w in words] == [0.91, 0.5, 0.1]
    assert all(r["page"] == 1 for r in recs)


def test_flatten_no_words_inside_gives_none():
    doc = {"pages": [{"page_number": 1,
                      "lines": [{"content": "x", "polygon": [
                          {"x": 0, "y": 0}, {"x": 1, "y": 0},
                          {"x": 1, "y": 1}, {"x": 0, "y": 1}]}],
                      "words": []}]}
    assert flatten_layout(doc)[0]["confidence"] is None


def test_synth_layout_doc_flattens_to_44_lines():
    recs = flatten_layout(json.loads(_layout_doc(0)))
    lines = [r for r in recs if r["type"] == "line"]
    assert len(lines) == 44
    assert all(r["confidence"] is not None for r in lines)


def test_html_boilerplate_is_stripped():
    lines = html_to_lines(_form_html(2))
    text = extracted_text_from_lines(lines)
    assert "Cookies" not in text
    assert "Rubrik" not in text          # nav link farm
    assert "Impressum" not in text       # footer
    assert "Kreditantrag Gewerbeimmobilie" in text  # main h1 kept


def test_html_table_rows_become_label_value_lines():
    lines = html_to_lines(_form_html(2))
    texts = [l["text"] for l in lines]
    rows = form_rows(2)
    for label, value in rows:
        assert label in texts
        assert value in texts
    # label line immediately followed by its value line
    i = texts.index("Firmenname")
    assert texts[i + 1] == rows[0][1]


def test_html_pagination_after_44_rows():
    lines = html_to_lines(_form_html(137))  # oversized page: 100 extra paras
    assert max(l["page"] for l in lines) > 1


def test_link_stats_and_node_text():
    root = parse_dom('<div><a href="x">link text</a> and more words</div>')
    total, linked = link_stats(root)
    assert linked == len("link text")
    # per-text-node normalization: inter-node separators aren't counted
    assert total == len("link text") + len("and more words")
    assert node_text(root) == "link text and more words"


def test_dl_pairs():
    lines = html_to_lines(
        "<html><body><main><dl><dt>Firmenname</dt><dd>X GmbH</dd>"
        "</dl></main></body></html>")
    assert [l["text"] for l in lines] == ["Firmenname", "X GmbH"]

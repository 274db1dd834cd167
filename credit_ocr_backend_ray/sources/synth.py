"""Deterministic synthetic Common-Crawl-style web-pages table.

The engine's input contract (BASELINE.json input_hint) is a Parquet table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No such table ships in /root/testdata, so this module synthesizes it —
purely as a function of the row index (seed fixed), so every process/scale
generates identical rows (FIXTURES.md §5):

- 80%: German credit-request form pages — boilerplate (nav link farm,
  header, cookie banner, footer) around a 22-row label/value ``<table>``
  whose values vary deterministically per url;
- 10%: article pages (boilerplate + paragraphs, no form) => extraction
  must report all 22 expected fields missing;
- 10%: layout documents (the PDF stand-in): JSON word-box payloads in the
  ``html`` column (sniffed by leading ``{``) replicating the reference's
  two-column credit-form geometry (labels x=0.5, values x=3.0, Δy=0.01 —
  /root/reference/tests/test_field_extraction.py:154-201);
- every page wrapped in realistic Common-Crawl-weight chrome (~20 KB of
  script/style filler, link-farm nav/sidebar, comments, related-links
  widgets — deterministic low-compressibility LCG tokens) so per-doc
  extraction cost matches real web pages, not toy fixtures;
- 1/500 rows oversized (~300 filler paragraphs, ~130 KB) to exercise
  size-bucketed skew handling; ``text`` is NULL for 20% of rows.

Generation is itself a Ray Data job (``range(n) -> map_batches``) writing
partitioned Parquet, so building bench inputs scales with the cluster.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

INPUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_EPOCH = datetime(2024, 1, 1)

_COMPANIES = [
    "DemoTech", "Musterbau", "Beispiel Immobilien", "Alpha Logistik",
    "Nordwind Energie", "Schwaben Metall", "Rhein Digital", "Hansa Handel",
]
_CITIES = [
    ("70173", "Stuttgart"), ("10115", "Berlin"), ("80331", "München"),
    ("20095", "Hamburg"), ("50667", "Köln"), ("60311", "Frankfurt"),
]
_PURPOSES = ["Kauf und Renovierung", "Neubau", "Umschuldung", "Erweiterung"]
_PROPERTY_TYPES = [
    "Gewerbeimmobilie - Bürogebäude", "Wohnimmobilie - Mehrfamilienhaus",
    "Logistikhalle", "Einzelhandelsfläche",
]
_ARTICLE_WORDS = (
    "Daten Analyse Bericht Markt Zins Bank Kredit Immobilie Projekt "
    "Entwicklung Region Wachstum Risiko Kapital Investition Quartal "
    "Bilanz Umsatz Kosten Planung"
).split()


def _de_number(n: int) -> str:
    return f"{n:,}".replace(",", ".")


def form_rows(i: int) -> list[tuple[str, str]]:
    """The 22 label/value rows of page i (labels = the canonical German
    credit-form labels, values deterministic in i)."""
    company = f"{_COMPANIES[i % len(_COMPANIES)]} GmbH"
    plz, city = _CITIES[i % len(_CITIES)]
    price = 4_200_000 + (i % 97) * 1000
    requested = 3_500_000 + (i % 89) * 1000
    equity = 700_000 + (i % 83) * 1000
    area = 2_800 + (i % 71) * 10
    rate = 18_000 + (i % 61) * 100
    day, month, year = (i % 28) + 1, (i % 12) + 1, 2000 + (i % 20)
    yes_first = i % 3 != 0
    return [
        ("Firmenname", company),
        ("Rechtsform", "Gesellschaft mit beschränkter Haftung (GmbH)"),
        ("Gründungsdatum", f"{day:02d}.{month:02d}.{year}"),
        ("Geschäftsanschrift", f"Hauptstraße {(i % 200) + 1}, {plz} {city}"),
        ("Handelsregisternummer / Gericht",
         f"HRB {100000 + i % 900000} / Amtsgericht {city}"),
        ("USt-ID / Steuernummer", f"DE{100000000 + (i * 7919) % 900000000}"),
        ("Website (optional)", f"www.firma-{i % 1000:03d}.de"),
        ("Art der Immobilie", _PROPERTY_TYPES[i % len(_PROPERTY_TYPES)]),
        ("Objektbezeichnung", f"InnovationsCampus {city}"),
        ("Adresse", f"Innovationsntraße {(i % 9) + 1}, {plz} {city}"),
        ("Kaufpreis / Baukosten", f"{_de_number(price)}€"),
        ("Gewünschte Finanzierungssumme", f"{_de_number(requested)}€"),
        ("Verwendungszweck", _PURPOSES[i % len(_PURPOSES)]),
        ("Eigenkapitalanteil", f"{_de_number(equity)}€"),
        ("Baujahr", str(1950 + i % 70)),
        ("Fläche gesamt", f"{_de_number(area)} m²"),
        ("Gewünschte Darlehenssumme", f"{_de_number(requested)}€"),
        ("Laufzeit", f"{10 + i % 25} Jahre"),
        ("Ratenwunsch", f"Ca. {_de_number(rate)} € (monatlich)"),
        ("Zinssatz", f"Festzins, {3 + (i % 20) / 10:.1f}% p.a."),
        ("Sondertilgungen gewünscht",
         "[x] ja [ ] nein" if yes_first else "[ ] ja [x] nein"),
        ("Öffentliche Fördermittel beantragt?",
         "[ ] ja [x] nein" if yes_first else "[x] ja [ ] nein"),
    ]


_BOILERPLATE_NAV = (
    '<nav class="navbar"><ul>'
    + "".join(f'<li><a href="/s{k}">Rubrik {k}</a></li>' for k in range(40))
    + "</ul></nav>"
)
_COOKIE = ('<div class="cookie-banner">Diese Website verwendet Cookies. '
           '<a href="/consent">Zustimmen</a> <a href="/decline">Ablehnen</a></div>')

# Realistic Common-Crawl page weight: raw pages average tens of KB, most of
# it markup/script/style noise the extractor must wade through. The fillers
# below are deterministic in i and low-compressibility (LCG hex tokens) so
# on-disk parquet bytes track raw page weight.

_STYLE = ("<style>" + "".join(
    f".c{k}{{margin:{k % 9}px;padding:{k % 7}px;color:#{k * 2654435761 % 0xFFFFFF:06x}}}"
    for k in range(120)) + "</style>")


def _lcg_hex(seed: int, n_tokens: int) -> list[str]:
    x = (seed * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
    out = []
    for _ in range(n_tokens):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append(f"{x:016x}")
    return out


def _js_block(i: int, n_tokens: int = 400) -> str:
    toks = _lcg_hex(i * 2 + 1, n_tokens)
    body = ";".join(f"var v{k}='{t}'" for k, t in enumerate(toks))
    return f'<script type="text/javascript">{body};</script>'


def _sidebar(i: int) -> str:
    links = "".join(
        f'<li><a href="/t/{t[:10]}">Thema {t[:6]}</a></li>'
        for t in _lcg_hex(i * 3 + 2, 30))
    return f'<aside class="sidebar"><ul>{links}</ul></aside>'


def _comments(i: int) -> str:
    cs = "".join(
        f'<div class="comment"><span>user-{t[:8]}</span><p>Sehr interessant, '
        f"Beitrag {t[8:12]} dazu.</p></div>"
        for t in _lcg_hex(i * 5 + 3, 10))
    return f'<div class="comments social">{cs}</div>'


def _related(i: int) -> str:
    links = "".join(
        f'<li><a href="/r/{t[:12]}">Weiterlesen {t[:6]}</a></li>'
        for t in _lcg_hex(i * 7 + 4, 20))
    return f'<div class="related promo"><ul>{links}</ul></div>'


def _page_chrome(i: int) -> tuple[str, str]:
    """(head+top boilerplate, bottom boilerplate) around the main content."""
    top = (
        f"<html><head><title>Portal</title>{_STYLE}{_js_block(i)}</head><body>"
        f"{_js_block(i + 1, 300)}{_BOILERPLATE_NAV}"
        f"<header><h1>Portal</h1></header>{_COOKIE}{_sidebar(i)}"
    )
    bottom = (
        f"{_comments(i)}{_related(i)}"
        '<footer class="footer"><a href="/imprint">Impressum</a> '
        '<a href="/privacy">Datenschutz</a></footer>'
        f"{_js_block(i + 2, 200)}</body></html>"
    )
    return top, bottom


def _article_paras(i: int, n_paras: int) -> list[str]:
    paras = []
    for p in range(n_paras):
        words = [_ARTICLE_WORDS[(i * 31 + p * 7 + k) % len(_ARTICLE_WORDS)]
                 for k in range(30 + (i + p) % 20)]
        paras.append(" ".join(words) + ".")
    return paras


def _form_html(i: int) -> str:
    rows = form_rows(i)
    table = "".join(
        f"<tr><td>{label}</td><td>{value}</td></tr>" for label, value in rows
    )
    intro = "".join(f"<p>{p}</p>" for p in _article_paras(i, 8))
    filler = ""
    if i % 500 == 137:  # oversized skew tail
        filler = "".join(f"<p>{p}</p>" for p in _article_paras(i, 300))
    top, bottom = _page_chrome(i)
    return (
        f"{top}<main><h1>Kreditantrag Gewerbeimmobilie</h1>{intro}"
        f"<table>{table}</table>{filler}</main>{bottom}"
    )


def _article_html(i: int) -> str:
    paras = "".join(f"<p>{p}</p>" for p in _article_paras(i, 40))
    top, bottom = _page_chrome(i)
    return (
        f"{top}<main><h1>Marktbericht {i % 50}</h1>{paras}</main>{bottom}"
    )


def _layout_doc(i: int) -> str:
    """Two-column word-box layout JSON (PDF stand-in), geometry per the
    reference fixture: labels x=0.5, values x=3.0, value row y+0.01."""
    rows = form_rows(i)
    lines, words = [], []

    def add_line(text: str, x: float, y: float, conf_base: int) -> None:
        # 0.08in per char keeps even the longest label's center left of the
        # x_split=2.5 column boundary used by the pairing kernel
        toks = text.split()
        w_total = 0.08 * max(sum(len(t) for t in toks) + len(toks) - 1, 1)
        poly = [{"x": x - 0.1, "y": y - 0.09}, {"x": x + w_total, "y": y - 0.09},
                {"x": x + w_total, "y": y + 0.09}, {"x": x - 0.1, "y": y + 0.09}]
        lines.append({"content": text, "polygon": poly})
        cursor = x - 0.1
        for k, tok in enumerate(toks):
            w = 0.08 * len(tok)
            wpoly = [{"x": cursor, "y": y - 0.08}, {"x": cursor + w, "y": y - 0.08},
                     {"x": cursor + w, "y": y + 0.08}, {"x": cursor, "y": y + 0.08}]
            conf = round(0.9 + ((conf_base + k) % 10) / 100, 2)
            words.append({"content": tok, "polygon": wpoly, "confidence": conf})
            cursor += w + 0.08

    for r, (label, value) in enumerate(rows):
        y = float(r % 22) + 1.0
        add_line(label, 0.5, y, i + r)
        add_line(value, 3.0, y + 0.01, i + r + 3)

    return json.dumps(
        {"doc_kind": "layout", "pages": [
            {"page_number": 1, "lines": lines, "words": words}]},
        ensure_ascii=False)


def pdf_doc_bytes(i: int) -> bytes:
    """REAL single-font PDF with the same form geometry as
    ``_layout_doc(i)``: labels at x=0.5 / values at x=3.0, value row at
    y+0.01, line boxes y±0.09 (h=0.18in). Extracting its text layer
    (functions/pdf.py) must yield the same reading order and the same
    label-value pairs as the JSON layout channel — pinned by
    tests/test_pdf.py."""
    from credit_ocr_backend_ray.functions.pdf import build_pdf

    runs = []
    for r, (label, value) in enumerate(form_rows(i)):
        y = float(r % 22) + 1.0
        runs.append({"text": label, "x_in": 0.4, "y_top_in": y - 0.09,
                     "h_in": 0.18})
        runs.append({"text": value, "x_in": 2.9, "y_top_in": y + 0.01 - 0.09,
                     "h_in": 0.18})
    return build_pdf([runs])


def raster_doc_bytes(i: int, dpi: int = 100) -> bytes:
    """REAL PNG page with the same form semantics as ``_layout_doc(i)``:
    one label/value pair per row, value row at y+0.01. The raster channel
    needs PHYSICAL horizontal separation (unlike PDF/JSON, overlapping
    boxes would merge into one ink segment), so values sit at x=4.0 and
    the font is h_in=0.12 (glyph advance 0.08 in — the layout channel's
    own per-char metric): the longest label (35 chars from x=0.4) ends at
    3.2 in, >= SEG_GAP before the value column. Decoding it
    (functions/raster.py) must yield the same extracted text and pairs as
    the JSON layout channel — pinned by tests/test_raster.py."""
    from credit_ocr_backend_ray.functions.raster import render_page_png

    return render_page_png(_raster_runs(i), dpi=dpi)


def raster_jpeg_doc_bytes(i: int, dpi: int = 100) -> bytes:
    """``raster_doc_bytes``'s page as baseline JPEG (r5 — the reference's
    ``.jpg/.jpeg`` upload channel, api/main.py:331-338): quality=100
    (all-ones quant tables) keeps the round-trip inside the binarization
    margin, so extraction is byte-identical to the PNG channel — pinned
    by tests/test_jpeg.py and the ``mixed_channel_extract`` in-line
    parity asserts."""
    from credit_ocr_backend_ray.functions.raster import render_page_jpeg

    return render_page_jpeg(_raster_runs(i), dpi=dpi)


def _raster_runs(i: int) -> list[dict]:
    runs = []
    for r, (label, value) in enumerate(form_rows(i)):
        y = float(r % 22) + 1.0
        runs.append({"text": label, "x_in": 0.4, "y_top_in": y - 0.09,
                     "h_in": 0.12})
        runs.append({"text": value, "x_in": 4.0,
                     "y_top_in": y + 0.01 - 0.09, "h_in": 0.12})
    return runs


def rows_for_sf(sf: float) -> int:
    return max(int(round(sf * 1_000_000)), 100)


def page_row(i: int) -> dict:
    kind = i % 10
    lang = "en" if i % 10 == 7 else "de"
    ts = _EPOCH + timedelta(seconds=i * 1000)
    if kind == 0:
        html = _layout_doc(i)
        url = f"https://example-{i:08d}.de/dokument"
    elif kind == 1:
        html = _article_html(i)
        url = f"https://example-{i:08d}.de/artikel"
    else:
        html = _form_html(i)
        url = f"https://example-{i:08d}.de/antrag"
    text = None
    if i % 5 != 3:
        if kind == 0:
            text = "\n".join(f"{l} {v}" for l, v in form_rows(i))
        elif kind == 1:
            text = "\n".join(_article_paras(i, 6))
        else:
            text = "\n".join(f"{l} {v}" for l, v in form_rows(i))
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def pages_batch(batch: dict) -> pa.Table:
    """map_batches kernel: ids -> page rows (Arrow)."""
    ids = batch["id"]
    rows = [page_row(int(i)) for i in np.asarray(ids)]
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


_GEN_VERSION = 2  # bump when page content changes so stale caches miss


def pages_parquet_path(n_rows: int, base: str = "/tmp/webpages") -> str:
    return os.path.join(base, f"n{n_rows}v{_GEN_VERSION}")


ROWS_PER_FILE = 512  # ~20 MB raw per shard: one read task = one block, so
                     # no SplitBlocks re-slicing (a sliced block of this
                     # table serializes its whole ~80 MB backing buffer —
                     # measured; shard size IS the block size knob here)


def synthesize_pages(n_rows: int, base: str = "/tmp/webpages",
                     force: bool = False) -> str:
    """Generate (once, cached) the n-row pages table as partitioned Parquet
    via a distributed Ray Data job; returns the dataset directory."""
    import ray.data as rd

    out = pages_parquet_path(n_rows, base)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return out
    n_files = max(1, -(-n_rows // ROWS_PER_FILE))
    ds = rd.range(n_rows, override_num_blocks=n_files).map_batches(
        pages_batch, batch_format="pyarrow", batch_size=None)
    os.makedirs(out, exist_ok=True)
    ds.write_parquet(out)
    with open(marker, "w") as f:
        f.write("ok")
    return out

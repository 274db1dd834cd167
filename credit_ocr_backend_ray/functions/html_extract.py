"""Main-content extraction from HTML: DOM text-density boilerplate stripping.

Readability/jusText-style node scoring on a stdlib ``html.parser`` DOM (no
lxml in this environment):

1. parse into an element tree; ``<script>/<style>/<noscript>/<template>/
   <svg>/<iframe>`` subtrees are dropped at parse time;
2. per element compute ``text_len`` (whitespace-normalized descendant text),
   ``link_text_len`` (descendant text under ``<a>``) and
   ``link_density = link_text_len / text_len``;
3. prune boilerplate containers: structural tags (``nav/header/footer/
   aside``), class/id markers (cookie banners, menus, ads), and any block
   whose link density exceeds ``LINK_DENSITY_MAX`` with less than
   ``MIN_CONTENT_CHARS`` of text (short link farms);
4. emit the surviving content in document order as *positioned line records*
   (the same record shape the layout path produces) so the downstream
   pairing/normalize/field kernels are shared between the HTML and PDF
   paths: table rows and ``<dt>/<dd>`` pairs become a left-column label line
   plus a right-column value line on the same text row; headings, paragraphs
   and list items become full-width text lines. Rows advance one inch per
   row, 44 rows per page (8.5x11in page model, matching the reference's
   inch-based geometry — /root/reference/src/visualization/pdf_visualizer.py:44-49).

The per-url byte-identity deliverable ``extracted_text`` is the newline-join
of the emitted line texts in reading order.

Replaces the reference's FastAPI-era HTML-less ingest (it only accepted
PDFs/images, /root/reference/src/api/main.py:331-338) with the web-page path
required by the north rule; the downstream semantics (pairing onward) are
reference-pinned.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any

DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
STRUCTURAL_BOILERPLATE = {"nav", "header", "footer", "aside"}
BLOCK_TAGS = {
    "div", "section", "article", "main", "body", "table", "dl", "ul", "ol",
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr", "blockquote",
}
_BOILER_MARKERS = (
    "cookie", "banner", "consent", "menu", "navbar", "sidebar", "advert",
    "promo", "share", "social", "breadcrumb",
)
LINK_DENSITY_MAX = 0.33
MIN_CONTENT_CHARS = 25
ROWS_PER_PAGE = 44
LABEL_X = 0.5
VALUE_X = 3.0
ROW_DY = 0.01  # label/value vertical offset within one text row
LINE_H = 0.18  # nominal line height, inches


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list[Any] = []  # Node or str


class _TreeBuilder(HTMLParser):
    VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base",
            "col", "embed", "source", "track", "wbr"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root
        self._drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if self._drop_depth or tag in DROP_TAGS:
            if tag not in self.VOID:
                self._drop_depth += 1
            return
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in self.VOID:
            self.cur = node

    def handle_endtag(self, tag):
        if self._drop_depth:
            self._drop_depth -= 1
            return
        # close up to the matching open tag (tolerate unbalanced markup)
        node = self.cur
        while node is not self.root:
            if node.tag == tag:
                self.cur = node.parent
                return
            node = node.parent

    def handle_data(self, data):
        if self._drop_depth:
            return
        if data.strip():
            self.cur.children.append(data)


def parse_dom(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    return builder.root


def _norm_text(parts: list[str]) -> str:
    return " ".join(" ".join(parts).split())


def _collect_text(node: Node, out: list[str]) -> None:
    for child in node.children:
        if isinstance(child, str):
            out.append(child)
        else:
            _collect_text(child, out)


def node_text(node: Node) -> str:
    parts: list[str] = []
    _collect_text(node, parts)
    return _norm_text(parts)


def link_stats(node: Node, in_link: bool = False) -> tuple[int, int]:
    """(total_chars, link_chars) of normalized descendant text."""
    total = 0
    linked = 0
    for child in node.children:
        if isinstance(child, str):
            n = len(" ".join(child.split()))
            total += n
            if in_link:
                linked += n
        else:
            t, l = link_stats(child, in_link or child.tag == "a")
            total += t
            linked += l
    return total, linked


def is_boilerplate(node: Node) -> bool:
    if node.tag in STRUCTURAL_BOILERPLATE:
        return True
    marker = (node.attrs.get("class", "") + " " + node.attrs.get("id", "")).lower()
    if any(m in marker for m in _BOILER_MARKERS):
        return True
    if node.tag in BLOCK_TAGS:
        total, linked = link_stats(node)
        if total > 0 and linked / total > LINK_DENSITY_MAX and total < MIN_CONTENT_CHARS * 8:
            return True
    return False


def _row_cells(tr: Node) -> list[str]:
    cells = [node_text(c) for c in tr.children
             if isinstance(c, Node) and c.tag in ("td", "th")]
    return [c for c in cells if c]


def _segments(node: Node, out: list[tuple[str, str, str]]) -> None:
    """Depth-first content segments: ("pair", label, value) | ("text", t, "")."""
    for child in node.children:
        if isinstance(child, str):
            continue
        if is_boilerplate(child):
            continue
        tag = child.tag
        if tag == "tr":
            cells = _row_cells(child)
            if len(cells) >= 2:
                out.append(("pair", cells[0], _norm_text([" ".join(cells[1:])])))
                continue
            if len(cells) == 1:
                out.append(("text", cells[0], ""))
                continue
            continue
        if tag == "dl":
            label = None
            for d in child.children:
                if not isinstance(d, Node):
                    continue
                if d.tag == "dt":
                    label = node_text(d)
                elif d.tag == "dd" and label is not None:
                    out.append(("pair", label, node_text(d)))
                    label = None
            continue
        if tag in ("p", "li", "blockquote") or tag.startswith("h") and tag[1:].isdigit():
            text = node_text(child)
            if text:
                out.append(("text", text, ""))
            continue
        _segments(child, out)


def _box(x_center: float, y_center: float, width: float) -> list[dict[str, float]]:
    x0, x1 = x_center - width / 2, x_center + width / 2
    y0, y1 = y_center - LINE_H / 2, y_center + LINE_H / 2
    return [{"x": x0, "y": y0}, {"x": x1, "y": y0},
            {"x": x1, "y": y1}, {"x": x0, "y": y1}]


def html_to_lines(html: str) -> list[dict[str, Any]]:
    """Extract main content and emit positioned line records (shared shape
    with the layout path), one text row per segment."""
    root = parse_dom(html)
    segs: list[tuple[str, str, str]] = []
    _segments(root, segs)

    records: list[dict[str, Any]] = []
    for row, (kind, a, b) in enumerate(segs):
        page = row // ROWS_PER_PAGE + 1
        y = float(row % ROWS_PER_PAGE) + 1.0
        if kind == "pair":
            records.append({
                "type": "line", "text": a, "page": page,
                "bounding_box": _box(LABEL_X, y, 1.8), "confidence": 1.0,
            })
            records.append({
                "type": "line", "text": b, "page": page,
                "bounding_box": _box(VALUE_X, y + ROW_DY, 2.6), "confidence": 1.0,
            })
        else:
            records.append({
                "type": "line", "text": a, "page": page,
                "bounding_box": _box(LABEL_X, y, 1.8), "confidence": 1.0,
            })
    return records


def extracted_text_from_lines(lines: list[dict[str, Any]]) -> str:
    """The byte-identity deliverable: reading-order newline-join of line
    texts (records already arrive in reading order from both paths)."""
    return "\n".join(r["text"] for r in lines if r["type"] == "line")

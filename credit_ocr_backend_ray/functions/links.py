"""Link extraction from raw HTML: the web-graph side of a crawl.

The reference never looks at hyperlinks (its documents are uploaded
PDFs); a Common-Crawl-style corpus needs the link graph for host
reputation, seed discovery and PageRank-family scoring. The extractor
is a module-scope compiled regex over the decoded HTML (one C findall
per page — same altitude as the boilerplate parser) plus stdlib
``urljoin`` resolution against the page url, so relative hrefs become
absolute targets.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa

_HREF_RE = re.compile(r"""href\s*=\s*["']([^"'#\s>]+)""", re.IGNORECASE)
_SKIP = ("javascript:", "mailto:", "data:")


def page_links(html: bytes | None, url: str) -> list[str]:
    """Absolute link targets of one page (order kept, per-page dedup)."""
    if not html:
        return []
    text = html.decode("utf-8", errors="replace")
    seen: set[str] = set()
    out: list[str] = []
    for raw in _HREF_RE.findall(text):
        if raw.startswith(_SKIP):
            continue
        target = urljoin(url, raw)
        if target not in seen:
            seen.add(target)
            out.append(target)
    return out


def link_edges_batch(t: pa.Table, html_col: str = "html",
                     url_col: str = "url") -> pa.Table:
    """Explode each page into (src, dst) edge rows (flat-map shape)."""
    srcs: list[str] = []
    dsts: list[str] = []
    for u, h in zip(t[url_col].to_pylist(), t[html_col].to_pylist()):
        for target in page_links(h, u):
            srcs.append(u)
            dsts.append(target)
    return pa.table({"src": pa.array(srcs, pa.string()),
                     "dst": pa.array(dsts, pa.string())})


def link_stats_batch(t: pa.Table, html_col: str = "html",
                     url_col: str = "url") -> pa.Table:
    """Per-page outbound-link stats: total hrefs kept, distinct targets,
    distinct target hosts (in-row aggregate, no shuffle)."""
    n_links = np.zeros(t.num_rows, np.int64)
    n_hosts = np.zeros(t.num_rows, np.int64)
    for i, (u, h) in enumerate(zip(t[url_col].to_pylist(),
                                   t[html_col].to_pylist())):
        targets = page_links(h, u)
        n_links[i] = len(targets)
        n_hosts[i] = len({urlsplit(x).netloc for x in targets})
    return (t.append_column("n_links", pa.array(n_links))
             .append_column("n_target_hosts", pa.array(n_hosts)))


_URL_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
                     r"(?:\?([^#]*))?(?:#.*)?$")
_TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=", "msclkid=")


def canonicalize_url(u: str) -> str:
    """Canonical form of an absolute URL — the key a web-corpus dedup
    keys on (the same page arrives under many spellings across crawls):

    - scheme and host lowercased;
    - default port stripped (:80 for http, :443 for https);
    - fragment dropped;
    - tracking parameters removed (utm_*, gclid, fbclid, msclkid);
    - remaining query parameters sorted (lexicographic on the raw
      ``k=v`` text — deterministic, encoding-preserving: nothing is
      re-quoted, so the transform is idempotent and engine-portable);
    - empty path becomes ``/``.

    Non-URL / relative strings pass through unchanged (garbage stays a
    distinct key rather than colliding on an error value)."""
    m = _URL_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = m.group(3) or "/"
    q = m.group(4)
    out = f"{scheme}://{host}{path}"
    if q:
        parts = sorted(p for p in q.split("&")
                       if p and not p.startswith(_TRACKING_PREFIXES))
        if parts:
            out += "?" + "&".join(parts)
    return out


def canonicalize_urls_batch(t: pa.Table, url_col: str = "url",
                            out_col: str = "canonical_url") -> pa.Table:
    """map_batches kernel: append the canonical-URL column."""
    urls = t[url_col].to_pylist()
    return t.append_column(
        out_col, pa.array([canonicalize_url(u or "") for u in urls],
                          pa.string()))

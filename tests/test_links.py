"""Link extraction (functions/links.py): urljoin resolution, scheme
filtering, per-page dedup, and the edge/stats batch kernels."""

import pyarrow as pa


def test_page_links_resolution_and_filtering():
    from credit_ocr_backend_ray.functions.links import page_links

    html = (b'<a href="/a">x</a> <a href="b/c">y</a>'
            b'<a href="https://other.example/z">z</a>'
            b'<a href="javascript:void(0)">no</a>'
            b'<a href="mailto:x@y.de">no</a>'
            b'<a href="/a">dup</a>'
            b"<a href='/quoted'>q</a>"
            b'<a href="/frag#sec">f</a>')
    out = page_links(html, "https://host.de/dir/page")
    assert out == [
        "https://host.de/a",            # root-relative
        "https://host.de/dir/b/c",      # path-relative
        "https://other.example/z",      # absolute kept as-is
        "https://host.de/quoted",       # single-quoted attr
        "https://host.de/frag",         # fragment stripped by the regex
    ]
    assert page_links(None, "https://x.de") == []
    assert page_links(b"", "https://x.de") == []


def test_link_edges_and_stats_batch():
    from credit_ocr_backend_ray.functions.links import (
        link_edges_batch, link_stats_batch)

    t = pa.table({
        "url": ["https://a.de/p", "https://b.de/p"],
        "html": [b'<a href="/x">1</a><a href="https://c.de/y">2</a>',
                 b"no links here"],
    })
    edges = link_edges_batch(t)
    assert edges["src"].to_pylist() == ["https://a.de/p", "https://a.de/p"]
    assert edges["dst"].to_pylist() == ["https://a.de/x", "https://c.de/y"]
    stats = link_stats_batch(t)
    assert stats["n_links"].to_pylist() == [2, 0]
    assert stats["n_target_hosts"].to_pylist() == [2, 0]


def test_canonicalize_url_rules():
    from credit_ocr_backend_ray.functions.links import canonicalize_url as c

    # case, default port, fragment, tracking params, query sort
    assert c("HTTP://WWW.Ex.COM:80/a?utm_source=x&b=2&a=1#f") == \
        "http://www.ex.com/a?a=1&b=2"
    assert c("https://Ex.com:443") == "https://ex.com/"
    # non-default port KEPT; path case preserved (paths are case-
    # sensitive on most servers)
    assert c("http://ex.com:8080/Pa/Th?x=1") == "http://ex.com:8080/Pa/Th?x=1"
    # all-tracking query collapses to no query
    assert c("https://a.b/p?utm_a=1&utm_b=2") == "https://a.b/p"
    # garbage and relative strings pass through unchanged
    assert c("not a url") == "not a url"
    assert c("/relative/path") == "/relative/path"
    # idempotent
    u = "HTTPS://A.B:443/x?b=1&a=2&fbclid=zz#frag"
    assert c(c(u)) == c(u) == "https://a.b/x?a=2&b=1"


def test_canonical_url_dedup_composition(ray_session):
    """The curation use: many crawl spellings of one page collapse to a
    single survivor via dedup_latest on the canonical column."""
    import pandas as pd
    import ray.data as rd
    from credit_ocr_backend_ray.functions.links import (
        canonicalize_urls_batch)
    from credit_ocr_backend_ray.stages.dedup import dedup_latest

    rows = pd.DataFrame({
        "url": ["http://Ex.com/p?b=2&a=1",
                "HTTP://ex.com:80/p?a=1&b=2&utm_source=feed",
                "http://ex.com/p?a=1&b=2#section",
                "http://ex.com/OTHER"],
        "warc_ts": pd.to_datetime(["2024-01-01", "2024-02-01",
                                   "2024-03-01", "2024-01-15"]),
        "payload": ["v1", "v2", "v3", "other"],
    })
    ds = rd.from_pandas(rows).map_batches(
        canonicalize_urls_batch, batch_format="pyarrow")
    out = dedup_latest(ds, key="canonical_url",
                       order_col="warc_ts").to_pandas()
    assert len(out) == 2
    kept = out.set_index("canonical_url")["payload"]
    assert kept["http://ex.com/p?a=1&b=2"] == "v3"   # newest spelling wins
    assert kept["http://ex.com/OTHER"] == "other"

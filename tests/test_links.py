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

"""End-to-end web-corpus composition (pipelines/web.py): extraction ->
quality gate on extracted text -> exact dedup by content sha, with a
planted exact duplicate and a planted no-payload page."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def dup_pages_dir(tmp_path_factory, ray_session):
    from credit_ocr_backend_ray.sources.synth import synthesize_pages
    base = synthesize_pages(40)
    src = None
    for f in sorted(os.listdir(base)):
        if f.endswith(".parquet"):
            src = os.path.join(base, f)
            break
    t = pq.read_table(src).slice(0, 20)
    # plant: row 21 duplicates row 0's html under a new url (same content
    # sha -> dedup drops one); row 22 has empty html (no payload -> fails
    # the quality gate, not the extraction)
    dup = {c: t[c].to_pylist() for c in t.column_names}
    for c in t.column_names:
        dup[c].append(t[c][0].as_py())
        dup[c].append(t[c][1].as_py())
    dup["url"][-2] = "https://planted.example/dup-of-row0"
    dup["url"][-1] = "https://planted.example/empty"
    dup["html"][-1] = b""
    out = tmp_path_factory.mktemp("webdup")
    pq.write_table(pa.table({c: pa.array(dup[c], t.schema.field(c).type)
                             for c in t.column_names}),
                   os.path.join(out, "pages.parquet"))
    return str(out)


def test_web_corpus_dedups_and_gates(dup_pages_dir, ray_session):
    from credit_ocr_backend_ray.pipelines.web import web_corpus_ds

    out = web_corpus_ds(dup_pages_dir).to_pandas()
    # the duplicate pair collapsed to ONE row: the smaller url wins
    shas = out["content_sha256"].tolist()
    assert len(shas) == len(set(shas))
    assert "https://planted.example/dup-of-row0" not in set(out["url"])
    # the empty page failed the quality gate, not the job
    assert "https://planted.example/empty" not in set(out["url"])
    # everything else survived end-to-end with real extracted text
    assert len(out) == 20
    assert (out["quality"] >= 0.25).all()
    assert (out["n_lines"] > 0).all()


def test_web_corpus_funnel_counts(dup_pages_dir, ray_session):
    from credit_ocr_backend_ray.pipelines.web import web_corpus_funnel

    f = web_corpus_funnel(dup_pages_dir)
    assert f["input"] == 22
    assert f["extracted_ok"] == 22          # empty html is Fertig-with-0-lines
    assert f["after_quality"] == 21         # quality gate drops the empty page
    assert f["output"] == 20                # dedup drops the planted duplicate

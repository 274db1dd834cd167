"""The full web-corpus pipeline: raw crawled pages -> training corpus,
composed as ONE streaming Dataset plan (no intermediate materialization
except the documented dedup checkpoint):

    read pages (url, warc_ts, html, lang)       [pruned parquet read]
      -> extraction (layout parse, boilerplate strip, field extraction)
                                                 [the flagship stages]
      -> keep successfully-extracted pages       [filter]
      -> quality scoring over the EXTRACTED text [stateless maps]
      -> quality gate                            [filter]
      -> exact dedup on content_sha256           [one hash shuffle]

This is the "user of the reference switches to this repo" path for a
crawl: the reference processes one uploaded document per Celery task
(/root/reference/src/tasks/ocr_tasks.py) and has no corpus-level stage
at all; here the same per-document semantics run inside a streaming
plan that also does the corpus-level work (dedup, quality) a 100 TB
crawl needs. Every stage is an individually-tested operator; this
module only composes them.
"""

from __future__ import annotations

import ray.data as rd

from credit_ocr_backend_ray.pipelines.extraction import (
    ExtractionConfig, build_extraction_ds,
)
from credit_ocr_backend_ray.stages.dedup import dedup_exact_sparse
from credit_ocr_backend_ray.stages.text import quality_batch


def web_corpus_ds(paths: list[str] | str, min_quality: float = 0.25,
                  cfg: ExtractionConfig | None = None) -> "rd.Dataset":
    """The lazy end-to-end plan; consume with write_parquet/iter_batches.

    Scale shape: extraction is the flagship stage set (stateless tasks,
    byte-budget sub-batching for skew); the quality stage is a stateless
    map over the extracted text; the only all-to-all is the exact-dedup
    shuffle, and it moves one combiner-pruned row per (sha, batch). The
    quality gate runs BEFORE the shuffle so rejected pages never cross
    the wire."""
    ds = build_extraction_ds(paths, cfg)
    ds = ds.filter(expr="status == 'Fertig'")
    ds = ds.map_batches(
        lambda t: quality_batch(t, text_col="extracted_text"),
        batch_format="pyarrow")
    # quality_score of empty text is 0.0, so the gate also drops pages
    # whose html carried no extractable payload
    ds = ds.filter(expr=f"quality >= {min_quality}")
    ds = dedup_exact_sparse(ds, hash_col="content_sha256",
                            tie_col="url")
    return ds.select_columns(["url", "warc_ts", "lang", "content_sha256",
                              "extracted_text", "n_lines", "n_pairs",
                              "quality"])


def web_corpus_funnel(paths: list[str] | str,
                      min_quality: float = 0.25,
                      cfg: ExtractionConfig | None = None) -> dict:
    """Per-gate lineage counts (driver-side bookkeeping, one count per
    stage — the corpus-level analogue of the extraction manifest's
    per-group metrics). Counts execute the plan prefix once per gate;
    use ``web_corpus_ds`` directly when only the output matters."""
    base = build_extraction_ds(paths, cfg)
    funnel = {"input": base.count()}
    ok = base.filter(expr="status == 'Fertig'")
    funnel["extracted_ok"] = ok.count()
    scored = ok.map_batches(
        lambda t: quality_batch(t, text_col="extracted_text"),
        batch_format="pyarrow").filter(expr=f"quality >= {min_quality}")
    kept = scored.materialize()
    funnel["after_quality"] = kept.count()
    deduped = dedup_exact_sparse(kept, hash_col="content_sha256",
                                 tie_col="url")
    funnel["output"] = deduped.count()
    return funnel

"""credit_ocr_backend_ray — a Ray-Data-native document/main-content extraction engine.

A from-scratch re-expression of the capabilities of
``markuskuehnle/credit-ocr-backend`` (reference at /root/reference) as a pure
``ray.data.Dataset`` pipeline over Parquet tables of Common-Crawl-style web
pages ``(url, warc_ts, html, text, lang)``:

- HTML boilerplate stripping with DOM text-density heuristics
- PDF/layout parsing (word boxes -> line grouping -> reading-order sort)
- label-value pairing, normalization, deterministic field mapping, validation
  (semantics pinned against the reference's kernels, see functions/)
- exact + near dedup, similarity search, text analysis, lineage manifests

No FastAPI / Celery / blob storage: stages are ``map_batches`` transforms and
actor pools; state between stages lives in Arrow columns, not storage hops.
"""

__version__ = "0.1.0"

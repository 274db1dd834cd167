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


def _install_log_filters() -> None:
    """Drop Ray Data's per-reduce-task "Failed to hash the schemas"
    warning. Root cause: ``pa.Table.from_pandas`` (inside Ray's
    pandas-block ``to_arrow``) attaches a ``b'pandas'`` schema-metadata
    dict, and a pyarrow schema carrying metadata is unhashable, so the
    schema-dedup fast path in ``unify_schemas`` logs a warning per
    reduce task and falls back to the full unify — values are
    unaffected. Read-side schemas are already stripped
    (sources/pq_read.py); pandas blocks produced MID-pipeline can't be
    (the conversion happens inside Ray), so filter the noise where it
    is logged. Installed at import time, which covers every worker
    process that loads this package to run a closure."""
    import logging

    class _DropSchemaHashNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    # logging.Filter on an ANCESTOR logger does not see child records
    # (filters only run at the origin logger and at handlers), so attach
    # to the exact module logger that emits the message
    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_DropSchemaHashNoise())


def _install_compat_patches() -> None:
    """Install the hash-shuffle empty-block schema patch (compat.py) at
    import time so EVERY ``Dataset.join`` / hash-shuffle consumer built by
    this package — shuffle_join and its callers, the TPC-H composites,
    doc_mean_token_freq — is protected from the ray 2.49.2 broadcast race
    without each call site having to opt in. Idempotent; a Ray version
    whose internals moved just logs and skips."""
    from credit_ocr_backend_ray.compat import (
        install_hash_shuffle_schema_patch, install_pandas_size_bytes_patch,
        install_schema_dedupe_warning_patch,
        install_worker_patch_propagation)

    install_hash_shuffle_schema_patch()
    # empty pandas blocks with string columns otherwise log a bogus
    # "Error calculating size for column ..." per block (see compat.py)
    install_pandas_size_bytes_patch()
    # zero-row bundles otherwise log a bogus schema-divergence warning
    # per empty block ("new schema: ." — see compat.py)
    install_schema_dedupe_warning_patch()
    # ship the installs to every Ray Data worker via the DataContext —
    # closures pickled by value never import this package (see compat.py)
    install_worker_patch_propagation()


_install_log_filters()
_install_compat_patches()

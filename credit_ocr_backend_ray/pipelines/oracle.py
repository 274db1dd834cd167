"""Single-process oracle: the same pure kernels in a for-loop, no Ray.

This is the byte-identity reference for the flagship pipeline (BASELINE.md):
for every url the Ray pipeline's ``extracted_text`` (and fields) must equal
this runner's output byte-for-byte. Mirrors the reference's notebook path
(/root/reference/notebooks/credit_ocr_pipeline.ipynb) where the kernel chain
runs without any service machinery.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from credit_ocr_backend_ray.config import default_config
from credit_ocr_backend_ray.functions.document import extract_document


def oracle_extract(input_path: str, doc_type: str = "credit_request",
                   with_result_json: bool = False) -> dict[str, dict]:
    """url -> extraction result dict, computed sequentially."""
    cfg = default_config()[doc_type]
    files = (sorted(glob.glob(os.path.join(input_path, "*.parquet")))
             if os.path.isdir(input_path) else [input_path])
    out: dict[str, dict] = {}
    for f in files:
        table = pq.read_table(f, columns=["url", "html"])
        for url, payload in zip(table["url"].to_pylist(),
                                table["html"].to_pylist()):
            out[url] = extract_document(payload or b"", cfg,
                                        with_result_json=with_result_json)
    return out

"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
processed by actor-pool stages.

The reference's multimodal surface is PDF bytes in, annotated page PNGs out
(/root/reference/src/visualization/pdf_visualizer.py:83-189, rasterized at
150 DPI via pdf2image, colored by confidence tier >=0.8 green / >=0.6
orange / else red). Neither pdf2image/Pillow nor any image codec ships in
this container, so the *decode/render* kernel is stubbed (deterministic fake
or NotImplementedError) while all Ray-side plumbing — schema, actor
signature, batch sizing for large binaries, output layout — is real and
tested.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),      # "image" | "audio" | "video" | "pdf"
    ("payload", pa.binary()),
    ("meta", pa.string()),            # JSON: {width,height,codec,...}
])

PAGE_RENDER_DPI = 150  # parity: pdf_visualizer.py:112


def confidence_color(conf: float) -> str:
    """Annotation color tiers (parity: pdf_visualizer.py:15-29)."""
    if conf >= 0.8:
        return "#00FF00"
    if conf >= 0.6:
        return "#FFA500"
    return "#FF0000"


def _decode_stub(payload: bytes, media_type: str) -> dict[str, Any]:
    """STUB decode: no image/audio codecs in this environment. Produces a
    deterministic fake feature record (sha + size) with the exact shape a
    real decoder would emit, so downstream schema/plumbing is exercised.
    Swap the body for PIL/ffmpeg in a full environment."""
    return {
        "ok": True,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "n_bytes": len(payload),
        "width": None,
        "height": None,
        "frames": None,
    }


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract binary media.

    Use small ``batch_size`` (large payloads!):
    ``ds.map_batches(MediaFeatureExtractor, batch_size=8, concurrency=N,
    batch_format="pyarrow")``.
    """

    def __init__(self, strict: bool = False):
        # a real impl loads codecs/models here, once per actor
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media decode requires image/audio libraries not present "
                "in this environment")
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        feats = [_decode_stub(p or b"", t) for p, t in zip(payloads, mtypes)]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "sha256": pa.array([f["sha256"] for f in feats], pa.string()),
            "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
            "decode_ok": pa.array([f["ok"] for f in feats], pa.bool_()),
        })


PAGE_W_IN, PAGE_H_IN = 8.5, 11.0  # page model, pdf_visualizer.py:44-49


def _hex_rgb(color: str) -> tuple[int, int, int]:
    return int(color[1:3], 16), int(color[3:5], 16), int(color[5:7], 16)


def render_annotation_ppm(fields: list[dict], dpi: int = PAGE_RENDER_DPI,
                          border_px: int = 3, page: int = 1) -> bytes:
    """REAL annotated-page raster (reference ANNOTATED stage,
    storage.py:31): white page, one colored rectangle border per field
    bbox, inches scaled to pixels at ``dpi``. Encoded as binary PPM (P6) —
    a real image format writable with numpy alone, so the multimodal sink
    needs no external codec. Rectangle drawing is numpy slice assignment
    (vectorized), not per-pixel Python."""
    import numpy as np

    w, h = int(PAGE_W_IN * dpi), int(PAGE_H_IN * dpi)
    img = np.full((h, w, 3), 255, dtype=np.uint8)
    for f in fields or []:
        bbox = f.get("bounding_box")
        if not bbox or (f.get("page") or 1) != page:
            continue
        xs = [p["x"] * dpi for p in bbox]
        ys = [p["y"] * dpi for p in bbox]
        x0, x1 = max(int(min(xs)), 0), min(int(max(xs)), w - 1)
        y0, y1 = max(int(min(ys)), 0), min(int(max(ys)), h - 1)
        if x1 <= x0 or y1 <= y0:
            continue
        conf = f.get("confidence")
        rgb = _hex_rgb(confidence_color(conf if conf is not None else 0.0))
        b = border_px
        img[y0:y0 + b, x0:x1 + 1] = rgb
        img[max(y1 - b + 1, 0):y1 + 1, x0:x1 + 1] = rgb
        img[y0:y1 + 1, x0:x0 + b] = rgb
        img[y0:y1 + 1, max(x1 - b + 1, 0):x1 + 1] = rgb
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + img.tobytes()


class PageRenderer:
    """Actor-pool stage rendering the ANNOTATED page image per document —
    the Ray restatement of generate_visualization (extraction.py:345-382).
    Large binary outputs: run with small batch_size. Output column
    ``annotation`` is the page-1 PPM bytes (the reference also keeps only
    ``*_page1.png``, extraction.py:358-363)."""

    def __init__(self, dpi: int = PAGE_RENDER_DPI):
        self.dpi = dpi

    def __call__(self, batch: pa.Table) -> pa.Table:
        renders = [render_annotation_ppm(f, dpi=self.dpi)
                   for f in batch["fields"].to_pylist()]
        return pa.table({
            "url": batch["url"],
            "annotation": pa.array(renders, pa.binary()),
        })


class PageAnnotator:
    """Actor-pool stage producing annotation *plans* (the geometry+color
    layer of the reference's overlay PNGs) without a rasterizer: for each
    document row, scale field bboxes from inches to pixels at
    ``PAGE_RENDER_DPI`` and attach the confidence color tier. A real
    renderer draws these plans onto page rasters."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        fields_col = batch["fields"].to_pylist()
        plans = []
        for fields in fields_col:
            plan = []
            for f in fields or []:
                bbox = f.get("bounding_box")
                if not bbox:
                    continue
                px = [{"x": p["x"] * PAGE_RENDER_DPI,
                       "y": p["y"] * PAGE_RENDER_DPI} for p in bbox]
                conf = f.get("confidence")
                plan.append({
                    "name": f["name"],
                    "page": f.get("page"),
                    "pixels": px,
                    "color": confidence_color(conf if conf is not None else 0.0),
                })
            plans.append(json.dumps(plan, ensure_ascii=False))
        return pa.table({
            "url": batch["url"],
            "annotation_plan": pa.array(plans, pa.string()),
        })

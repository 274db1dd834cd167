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

"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
processed by actor-pool stages.

The reference's multimodal surface is PDF bytes in, annotated page PNGs out
(/root/reference/src/visualization/pdf_visualizer.py:83-189, rasterized at
150 DPI via pdf2image, colored by confidence tier >=0.8 green / >=0.6
orange / else red). No pdf2image/Pillow ships in this container, but PNG
needs only stdlib zlib (functions/png.py), so the annotated-page sink
emits REAL PNG bytes and the feature extractor REALLY decodes PNG/PPM
payloads (width/height from pixels). Only formats that require external
codecs (JPEG/MP4/...) fall back to the documented sha+size record.
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


def _decode_media(payload: bytes, media_type: str) -> dict[str, Any]:
    """Decode + feature-extract one media payload. REAL decode for the
    formats parsed in-repo — PNG (functions/png.py), PPM, and baseline
    JPEG (functions/jpeg.py, r5) — yielding true width/height from the
    pixel data; a non-baseline JPEG (e.g. progressive) still gets real
    dimensions from its SOF header. Formats that require external codecs
    (MP4, ...) fall back to the sha+size record with
    ``width/height = None`` (documented: no such codec ships here; swap
    in PIL/ffmpeg branches in a full environment)."""
    rec: dict[str, Any] = {
        "ok": True,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "n_bytes": len(payload),
        "width": None,
        "height": None,
        "frames": None,
    }
    try:
        if payload.startswith(b"\x89PNG\r\n\x1a\n"):
            from credit_ocr_backend_ray.functions.png import decode_png
            arr = decode_png(payload)
            rec["height"], rec["width"] = arr.shape[:2]
            rec["frames"] = 1
        elif payload.startswith(b"P6\n"):
            frames = split_ppm_stream(payload)
            w, h, _ = parse_ppm(frames[0])
            rec["width"], rec["height"] = w, h
            rec["frames"] = len(frames)
        elif payload.startswith(b"\xff\xd8\xff"):
            from credit_ocr_backend_ray.functions.jpeg import (
                decode_baseline_jpeg, jpeg_dimensions)
            try:
                arr = decode_baseline_jpeg(payload)
                rec["height"], rec["width"] = arr.shape[:2]
            except ValueError:
                # non-baseline process: real dims from the SOF header
                dims = jpeg_dimensions(payload)
                if dims is None:
                    raise
                rec["width"], rec["height"] = dims
            rec["frames"] = 1
    except Exception:  # noqa: BLE001 — poison payload: keep sha record
        rec["ok"] = False
    return rec


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract binary media.

    Use small ``batch_size`` (large payloads!):
    ``ds.map_batches(MediaFeatureExtractor, batch_size=8, concurrency=N,
    batch_format="pyarrow")``.
    """

    def __init__(self, strict: bool = False):
        # external codecs would load here, once per actor; strict=True
        # makes codec-less formats an error instead of a sha-only record
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        feats = [_decode_media(p or b"", t) for p, t in zip(payloads, mtypes)]
        if self.strict and any(f["width"] is None for f in feats):
            raise NotImplementedError(
                "payload format needs image/audio libraries not present "
                "in this environment (PNG/PPM/baseline-JPEG decode "
                "in-sandbox)")
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "sha256": pa.array([f["sha256"] for f in feats], pa.string()),
            "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
            "width": pa.array([f["width"] for f in feats], pa.int64()),
            "height": pa.array([f["height"] for f in feats], pa.int64()),
            "n_frames": pa.array([f["frames"] for f in feats], pa.int64()),
            "decode_ok": pa.array([f["ok"] for f in feats], pa.bool_()),
        })


PAGE_W_IN, PAGE_H_IN = 8.5, 11.0  # page model, pdf_visualizer.py:44-49


def _hex_rgb(color: str) -> tuple[int, int, int]:
    return int(color[1:3], 16), int(color[3:5], 16), int(color[5:7], 16)


def render_annotation_array(fields: list[dict], dpi: int = PAGE_RENDER_DPI,
                            border_px: int = 3, page: int = 1):
    """REAL annotated-page raster (reference ANNOTATED stage,
    storage.py:31): white page, one colored rectangle border per field
    bbox, inches scaled to pixels at ``dpi``; returns the (h, w, 3) uint8
    array. Rectangle drawing is numpy slice assignment (vectorized), not
    per-pixel Python."""
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
    return img


def render_annotation_ppm(fields: list[dict], dpi: int = PAGE_RENDER_DPI,
                          border_px: int = 3, page: int = 1) -> bytes:
    """Annotated page encoded as binary PPM (P6) — numpy-only format kept
    for the resize/frame-stream ops and as the uncompressed path."""
    img = render_annotation_array(fields, dpi, border_px, page)
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def render_annotation_png(fields: list[dict], dpi: int = PAGE_RENDER_DPI,
                          border_px: int = 3, page: int = 1) -> bytes:
    """Annotated page as REAL PNG bytes (reference S13 parity — the
    reference writes ``*_page1.png``, pdf_visualizer.py:186-189) via the
    stdlib-zlib codec in functions/png.py. ~600x smaller than the PPM for
    a typical page (mostly-blank rows deflate to nothing)."""
    from credit_ocr_backend_ray.functions.png import encode_png
    return encode_png(render_annotation_array(fields, dpi, border_px, page))


class PageRenderer:
    """Actor-pool stage rendering the ANNOTATED page image per document —
    the Ray restatement of generate_visualization (extraction.py:345-382).
    Large binary outputs: run with small batch_size. Output column
    ``annotation`` is the page-1 image; ``fmt="png"`` (default) matches
    the reference's ``*_page1.png`` output (extraction.py:358-363),
    ``fmt="ppm"`` keeps the uncompressed raster."""

    def __init__(self, dpi: int = PAGE_RENDER_DPI, fmt: str = "png"):
        self.dpi = dpi
        self.render = (render_annotation_png if fmt == "png"
                       else render_annotation_ppm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        renders = [self.render(f, dpi=self.dpi)
                   for f in batch["fields"].to_pylist()]
        return pa.table({
            "url": batch["url"],
            "annotation": pa.array(renders, pa.binary()),
        })


def parse_ppm(data: bytes) -> tuple[int, int, memoryview]:
    """Parse a binary PPM (P6) header; returns (w, h, pixel view). The
    inverse of ``render_annotation_ppm``'s encoding."""
    if not data.startswith(b"P6\n"):
        raise ValueError("not a P6 PPM")
    hdr_end = data.index(b"\n", data.index(b"\n", 3) + 1) + 1
    dims = data[3:data.index(b"\n", 3)].split()
    w, h = int(dims[0]), int(dims[1])
    return w, h, memoryview(data)[hdr_end:hdr_end + w * h * 3]


def _box_downsample(arr, scale: int):
    """Integer-factor box downsample (mean of each scale x scale tile) via
    a numpy reshape — vectorized, no per-pixel Python."""
    h, w = arr.shape[:2]
    h2, w2 = h // scale * scale, w // scale * scale
    return (arr[:h2, :w2]
            .reshape(h2 // scale, scale, w2 // scale, scale, 3)
            .mean(axis=(1, 3)).astype("uint8"))


def resize_ppm(data: bytes, scale: int) -> bytes:
    """REAL image resize without any external codec: box downsample of a
    P6 PPM. The thumbnailing step of the reference's annotation sink,
    generalized to a standalone op."""
    import numpy as np

    w, h, px = parse_ppm(data)
    small = _box_downsample(
        np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3), scale)
    header = f"P6\n{small.shape[1]} {small.shape[0]}\n255\n".encode("ascii")
    return header + small.tobytes()


def resize_image(data: bytes, scale: int) -> bytes:
    """Format-sniffing resize: PNG in -> PNG out (stdlib codec), PPM in ->
    PPM out; anything else raises (caught per row by ThumbnailMaker)."""
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        from credit_ocr_backend_ray.functions.png import (
            decode_png, encode_png)
        return encode_png(_box_downsample(decode_png(data), scale))
    return resize_ppm(data, scale)


class ThumbnailMaker:
    """Actor-pool stage: downsample an image binary column. Real compute
    (PNG and PPM paths); any other format raises per row into the
    ``error`` column rather than failing the task (poison-pill isolation,
    same policy as the extraction stage)."""

    def __init__(self, scale: int = 8, col: str = "annotation"):
        self.scale = scale
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs: list[bytes | None] = []
        errs: list[str | None] = []
        for b in batch[self.col].to_pylist():
            try:
                thumbs.append(resize_image(b, self.scale))
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 — per-row capture
                thumbs.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
        out = batch.drop_columns([self.col])
        out = out.append_column("thumbnail", pa.array(thumbs, pa.binary()))
        return out.append_column("error", pa.array(errs, pa.string()))


def _image_to_array(data: bytes):
    """Sniffing decode to (h, w, 3) uint8 + a format tag ('png'|'ppm')."""
    import numpy as np

    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        from credit_ocr_backend_ray.functions.png import decode_png
        return decode_png(data), "png"
    w, h, px = parse_ppm(data)
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3), "ppm"


def _array_to_image(arr, fmt: str) -> bytes:
    if fmt == "png":
        from credit_ocr_backend_ray.functions.png import encode_png
        return encode_png(arr)
    header = f"P6\n{arr.shape[1]} {arr.shape[0]}\n255\n".encode("ascii")
    return header + arr.tobytes()


class ImageAugmenter:
    """Actor-pool stage: DETERMINISTIC training-time image augmentation —
    per row the md5 of its id column draws (a) horizontal flip, (b) one
    of 4 corner/center crops to ``crop_frac`` of each side, (c) a
    brightness scale from {-20%, -10%, 0, +10%, +20%} applied in integer
    math — so reruns and resumes produce byte-identical augmented
    tensors (the reproducibility requirement of a training data loader;
    vary the salt per epoch for fresh draws). Real pixel compute over
    PNG/PPM; unknown formats raise per row into ``error`` (poison-pill
    isolation, the ThumbnailMaker policy)."""

    def __init__(self, id_col: str = "url", col: str = "annotation",
                 crop_frac: float = 0.875, salt: str = "aug-e0"):
        self.id_col = id_col
        self.col = col
        self.crop_frac = crop_frac
        self.salt = salt

    def _augment(self, data: bytes, key: str) -> tuple[bytes, str]:
        import hashlib

        import numpy as np

        h64 = int.from_bytes(
            hashlib.md5(f"{key}-{self.salt}".encode()).digest()[:8],
            "big")
        arr, fmt = _image_to_array(data)
        ops = []
        if h64 & 1:
            arr = arr[:, ::-1]
            ops.append("hflip")
        hh, ww = arr.shape[:2]
        ch, cw = int(hh * self.crop_frac), int(ww * self.crop_frac)
        corner = (h64 >> 1) % 4
        oy = 0 if corner < 2 else hh - ch
        ox = 0 if corner % 2 == 0 else ww - cw
        arr = arr[oy:oy + ch, ox:ox + cw]
        ops.append(f"crop{corner}")
        bright = ((h64 >> 3) % 5) - 2  # -2..2 -> +-20%
        if bright:
            arr = np.clip(arr.astype(np.int32) * (10 + bright) // 10,
                          0, 255).astype(np.uint8)
            ops.append(f"bright{bright}")  # no '+' sign: '+' is the op joiner
        return _array_to_image(np.ascontiguousarray(arr), fmt), \
            "+".join(ops)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_img: list[bytes | None] = []
        out_ops: list[str | None] = []
        errs: list[str | None] = []
        for key, b in zip(batch[self.id_col].to_pylist(),
                          batch[self.col].to_pylist()):
            try:
                img, ops = self._augment(b, str(key))
                out_img.append(img)
                out_ops.append(ops)
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 — per-row capture
                out_img.append(None)
                out_ops.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
        out = batch.drop_columns([self.col])
        out = out.append_column("augmented", pa.array(out_img, pa.binary()))
        out = out.append_column("aug_ops", pa.array(out_ops, pa.string()))
        return out.append_column("error", pa.array(errs, pa.string()))


def split_ppm_stream(data: bytes) -> list[bytes]:
    """Split a concatenated-P6 stream (our codec-free stand-in for a video
    container) into frames using header-declared lengths — O(frames)."""
    frames = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 3] != b"P6\n":
            raise ValueError(f"bad frame header at byte {pos}")
        dim_end = data.index(b"\n", pos + 3)
        max_end = data.index(b"\n", dim_end + 1)
        w, h = (int(x) for x in data[pos + 3:dim_end].split())
        end = max_end + 1 + w * h * 3
        frames.append(bytes(data[pos:end]))
        pos = end
    return frames


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th frame (plus the last)
    from a video-like binary column, emitting one row per kept frame —
    the frame-sample step of a video pipeline. Real parsing/slicing over
    the concatenated-PPM container; swap ``split_ppm_stream`` for an
    ffmpeg demux in a full environment. Fan-out stage: run with small
    ``batch_size`` (large payloads in AND out). Poison-pill isolation:
    an undecodable container emits one marker row (``frame_index = -1``,
    empty frame) instead of failing the task."""

    def __init__(self, stride: int = 5, col: str = "payload"):
        self.stride = stride
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[str] = []
        fidx: list[int] = []
        blobs: list[bytes] = []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch[self.col].to_pylist()):
            try:
                frames = split_ppm_stream(payload or b"")
            except Exception:  # noqa: BLE001 — per-row capture
                ids.append(mid)
                fidx.append(-1)
                blobs.append(b"")
                continue
            keep = list(range(0, len(frames), self.stride))
            if frames and keep[-1] != len(frames) - 1:
                keep.append(len(frames) - 1)
            for k in keep:
                ids.append(mid)
                fidx.append(k)
                blobs.append(frames[k])
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_index": pa.array(fidx, pa.int64()),
            "frame": pa.array(blobs, pa.binary()),
        })


def resample_pcm(data: bytes, src_hz: int, dst_hz: int) -> bytes:
    """REAL audio resample without any codec: linear interpolation over
    raw mono PCM s16le samples, fully vectorized (np.interp). The audio
    analogue of ``resize_ppm`` — raw PCM is to audio what PPM is to
    images: a headerless format numpy can process directly; a compressed
    container would need the (absent) codec only for the decode step."""
    import numpy as np

    if len(data) % 2:
        raise ValueError("odd byte length for s16le PCM")
    x = np.frombuffer(data, dtype="<i2").astype(np.float64)
    if len(x) == 0 or src_hz == dst_hz:
        return data
    n_out = int(round(len(x) * dst_hz / src_hz))
    t_out = np.arange(n_out, dtype=np.float64) * (src_hz / dst_hz)
    y = np.interp(t_out, np.arange(len(x), dtype=np.float64), x)
    return np.clip(np.round(y), -32768, 32767).astype("<i2").tobytes()


class PcmResampler:
    """Actor-pool stage: resample a raw-PCM audio binary column (meta
    JSON carries ``sample_rate``); per-row error capture for malformed
    payloads. Large payloads: run with small ``batch_size``."""

    def __init__(self, dst_hz: int = 16_000, col: str = "payload"):
        self.dst_hz = dst_hz
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs: list[bytes | None] = []
        errs: list[str | None] = []
        n_samp: list[int | None] = []
        for payload, meta in zip(batch[self.col].to_pylist(),
                                 batch["meta"].to_pylist()):
            try:
                src_hz = int(json.loads(meta or "{}").get("sample_rate", 0))
                if src_hz <= 0:
                    raise ValueError("missing sample_rate in meta")
                out = resample_pcm(payload or b"", src_hz, self.dst_hz)
                outs.append(out)
                n_samp.append(len(out) // 2)
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 — per-row capture
                outs.append(None)
                n_samp.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
        return pa.table({
            "media_id": batch["media_id"],
            "resampled": pa.array(outs, pa.binary()),
            "n_samples": pa.array(n_samp, pa.int64()),
            "error": pa.array(errs, pa.string()),
        })


class AudioFeatureExtractor:
    """Actor-pool stage: windowed energy + zero-crossing features over
    int16 PCM — the VAD / silence-trim front of an audio training
    pipeline (which windows carry signal, which are dead air), all in
    EXACT integers so results pin bit-for-bit in tests: per
    ``window``-sample frame, energy = Σx² (int64-safe — 32767²·65536
    still < 2⁶³ so any practical window fits), zcr = count of sign
    transitions inside the frame; a frame is silent when its energy is
    below ``silence_energy``. The tail shorter than one window is
    ignored by contract. Per-row poison isolation (odd byte counts,
    None payloads → error column, task never dies); large payloads want
    a small ``batch_size``, the actor holds no per-batch state."""

    def __init__(self, window: int = 1024,
                 silence_energy: int = 1_000_000,
                 col: str = "payload"):
        if window < 2:
            raise ValueError("window must be >= 2")
        self.window = window
        self.silence_energy = silence_energy
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        n_w: list[int | None] = []
        n_sil: list[int | None] = []
        zcr: list[int | None] = []
        peak_e: list[int | None] = []
        peak_i: list[int | None] = []
        errs: list[str | None] = []
        for payload in batch[self.col].to_pylist():
            try:
                if payload is None or len(payload) % 2:
                    raise ValueError("payload is not int16 PCM")
                x = np.frombuffer(payload, "<i2").astype(np.int64)
                k = len(x) // self.window
                if k == 0:
                    n_w.append(0); n_sil.append(0); zcr.append(0)
                    peak_e.append(0); peak_i.append(-1)
                    errs.append(None)
                    continue
                fr = x[:k * self.window].reshape(k, self.window)
                e = (fr * fr).sum(axis=1)
                sgn = fr >= 0
                z = (sgn[:, 1:] != sgn[:, :-1]).sum(axis=1)
                n_w.append(k)
                n_sil.append(int((e < self.silence_energy).sum()))
                zcr.append(int(z.sum()))
                peak_e.append(int(e.max()))
                peak_i.append(int(e.argmax()))
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 — per-row capture
                n_w.append(None); n_sil.append(None); zcr.append(None)
                peak_e.append(None); peak_i.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
        return pa.table({
            "media_id": batch["media_id"],
            "n_windows": pa.array(n_w, pa.int64()),
            "n_silent": pa.array(n_sil, pa.int64()),
            "zcr_total": pa.array(zcr, pa.int64()),
            "peak_energy": pa.array(peak_e, pa.int64()),
            "peak_window": pa.array(peak_i, pa.int64()),
            "error": pa.array(errs, pa.string()),
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


class SceneCutDetector:
    """Actor-pool stage: scene-cut detection by frame differencing — for
    each video-like payload, demux the concatenated-PPM container, and
    flag frame k as a cut when the mean absolute pixel delta to frame
    k-1 exceeds ``threshold`` (0-255 scale). The shot-segmentation step
    of a video curation pipeline, as a REAL vectorized numpy kernel over
    the codec-free container (swap the demux for ffmpeg in a full
    environment; the Ray-side shape — small batches, per-row poison
    isolation, fixed-width output — is the deliverable). Emits one row
    per video: (media_id, n_frames, n_cuts, cut_indexes CSV string;
    n_frames = -1 marks an undecodable container)."""

    def __init__(self, threshold: float = 24.0, col: str = "payload"):
        self.threshold = threshold
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np  # function-local like the module's other kernels

        ids: list[str] = []
        nf: list[int] = []
        nc: list[int] = []
        cuts: list[str] = []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch[self.col].to_pylist()):
            try:
                frames = split_ppm_stream(payload or b"")
                mats = []
                for f in frames:
                    w, h, px = parse_ppm(f)
                    mats.append(np.frombuffer(px, np.uint8)
                                .astype(np.int16).reshape(h, w, 3))
            except Exception:  # noqa: BLE001 — per-row poison capture
                ids.append(mid); nf.append(-1); nc.append(0); cuts.append("")
                continue
            idxs = [
                k for k in range(1, len(mats))
                if mats[k].shape == mats[k - 1].shape
                and float(np.abs(mats[k] - mats[k - 1]).mean())
                > self.threshold
            ] + [
                k for k in range(1, len(mats))
                if mats[k].shape != mats[k - 1].shape  # resolution change
            ]
            idxs = sorted(set(idxs))
            ids.append(mid)
            nf.append(len(mats))
            nc.append(len(idxs))
            cuts.append(",".join(str(i) for i in idxs))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_frames": pa.array(nf, pa.int64()),
            "n_cuts": pa.array(nc, pa.int64()),
            "cut_indexes": pa.array(cuts, pa.string()),
        })


def dhash64(arr) -> int:
    """Difference hash (dHash, Krawetz) of an (h, w, 3) uint8 image in
    EXACT integer math: luma = (299r + 587g + 114b) // 1000, area-mean
    downsample onto an 8x9 grid via a 2-D cumulative sum (cell mean =
    block sum // block area — no float resize, so the hash is
    bit-reproducible across platforms), bit[i][j] = cell[i][j] >
    cell[i][j+1], packed row-major MSB-first into 64 bits. Robust to
    uniform brightness shifts and re-encodes (the near-dup signal);
    sensitive to crops/flips. Requires at least a 9x8 image."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    if h < 8 or w < 9:
        raise ValueError(f"dhash64: image {w}x{h} smaller than the 9x8 grid")
    a = arr.astype(np.int64)
    luma = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    # exclusive 2-D prefix sum -> any block sum in O(1)
    cs = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(luma, axis=0), axis=1, out=cs[1:, 1:])
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(10) * w) // 9
    blk = (cs[ys[1:, None], xs[None, 1:]] - cs[ys[:-1, None], xs[None, 1:]]
           - cs[ys[1:, None], xs[None, :-1]]
           + cs[ys[:-1, None], xs[None, :-1]])
    area = ((ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :])
    cell = blk // area
    bits = (cell[:, :-1] > cell[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class ImagePHasher:
    """Actor-pool stage: perceptual dHash over an image binary column
    (PNG/PPM via the real codecs). Per-row poison isolation (the
    ThumbnailMaker policy): a row that fails to decode gets a null
    ``phash`` and the error string instead of killing the task. Output
    adds (phash: uint64, error: string)."""

    def __init__(self, col: str = "payload"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        hashes: list[int | None] = []
        errs: list[str | None] = []
        for b in batch[self.col].to_pylist():
            try:
                arr, _ = _image_to_array(b)
                hashes.append(dhash64(arr))
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 — per-row capture
                hashes.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
        out = batch.drop_columns([self.col])
        out = out.append_column(
            "phash", pa.array(hashes, pa.uint64()))
        return out.append_column("error", pa.array(errs, pa.string()))


def image_near_dups(ds, id_col: str = "media_id", col: str = "payload",
                    max_hamming: int = 6, concurrency: int = 4,
                    batch_size: int = 32) -> "pd.DataFrame":
    """Perceptual image near-duplicate pairs: dHash each image once in
    an actor pool (decode + hash, per-row poison isolation), then the
    generic 64-bit chunk-key banding (``dedup.signature_hamming_pairs``
    with ``max_hamming + 1`` chunks — pigeonhole-complete, exact
    full-hash verification in-bucket, never all-pairs). The image
    sibling of simhash text dedup; only (id, phash) rows ever shuffle —
    pixels stay on the worker that decoded them."""
    from credit_ocr_backend_ray.stages.dedup import signature_hamming_pairs

    # batch-level Arrow filter, NOT ds.filter(row_fn): the row path
    # rebuilds blocks from python ints and re-infers the uint64 hash
    # column as int64, overflowing on hashes >= 2^63
    def drop_failed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return (t.filter(pc.is_valid(t["phash"]))
                 .select([id_col, "phash"]))

    hashed = (ds.map_batches(ImagePHasher,
                             fn_constructor_kwargs={"col": col},
                             batch_format="pyarrow",
                             batch_size=batch_size,
                             concurrency=concurrency)
                .map_batches(drop_failed, batch_format="pyarrow"))
    return signature_hamming_pairs(hashed, id_col, "phash",
                                   max_hamming=max_hamming)

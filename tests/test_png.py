"""Stdlib PNG codec + the PNG annotated-page sink (reference S13 parity:
the reference writes real PNGs, pdf_visualizer.py:186-189). Round-trip
through our own decoder pins validity; a hand-built PNG with all five
filter types pins decode generality; the renderer test pins pixels."""

import struct
import zlib

import numpy as np
import pytest

from credit_ocr_backend_ray.functions.png import (
    _SIG, _chunk, decode_png, encode_png)


def test_png_roundtrip_random_and_flat():
    rng = np.random.default_rng(3)
    for arr in (rng.integers(0, 256, (37, 53, 3)).astype(np.uint8),
                np.full((20, 30, 3), 255, np.uint8),
                np.zeros((1, 1, 3), np.uint8)):
        assert (decode_png(encode_png(arr)) == arr).all()


def test_png_header_fields():
    png = encode_png(np.zeros((7, 5, 3), np.uint8))
    assert png.startswith(_SIG)
    w, h, depth, ctype = struct.unpack_from(">IIBB", png, 16)
    assert (w, h, depth, ctype) == (5, 7, 8, 2)
    # chunk CRCs are real (a flipped byte must fail zlib.crc32 check)
    ihdr_crc = struct.unpack_from(">I", png, 8 + 4 + 4 + 13)[0]
    assert ihdr_crc == zlib.crc32(png[12:12 + 4 + 13]) & 0xFFFFFFFF


def test_png_decode_all_filter_types():
    """Decode a PNG whose rows cycle filters 0..4 (our encoder only emits
    Up, but third-party RGB8 PNGs use all five)."""
    rng = np.random.default_rng(5)
    h, w = 10, 7
    arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    flat = arr.reshape(h, w * 3).astype(np.int16)

    def filt_row(ft, cur, prev):
        out = np.empty_like(cur)
        for i in range(cur.shape[0]):
            a = int(cur[i - 3]) if i >= 3 else 0
            b = int(prev[i])
            c = int(prev[i - 3]) if i >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (a if (pa_ <= pb and pa_ <= pc)
                        else (b if pb <= pc else c))
            out[i] = (int(cur[i]) - pred) & 0xFF
        return out

    lines = []
    prev = np.zeros(w * 3, np.int16)
    for y in range(h):
        ft = y % 5
        lines.append(bytes([ft])
                     + filt_row(ft, flat[y], prev).astype(np.uint8).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + _chunk(b"IEND", b""))
    assert (decode_png(png) == arr).all()


def test_png_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"P6\n1 1\n255\n" + bytes(3))
    # grayscale (color type 0) is out of scope -> explicit error
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    png = (_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(png)


def test_render_annotation_png_pixels():
    """The PNG sink carries the exact raster: decode and assert the same
    pixels the PPM test pins (green border at the bbox, white corner)."""
    from credit_ocr_backend_ray.stages.multimodal import (
        PAGE_RENDER_DPI, render_annotation_png, render_annotation_ppm)

    fields = [{"name": "f", "page": 1, "confidence": 0.9,
               "bounding_box": [{"x": 1.0, "y": 1.0}, {"x": 2.0, "y": 1.0},
                                {"x": 2.0, "y": 1.5}, {"x": 1.0, "y": 1.5}]}]
    img = decode_png(render_annotation_png(fields))
    w, h = int(8.5 * PAGE_RENDER_DPI), int(11 * PAGE_RENDER_DPI)
    assert img.shape == (h, w, 3)
    y, x = int(1.0 * PAGE_RENDER_DPI), int(1.5 * PAGE_RENDER_DPI)
    assert tuple(img[y + 1, x]) == (0, 255, 0)
    assert tuple(img[0, 0]) == (255, 255, 255)
    # PNG and PPM encode the SAME raster bytes
    ppm = render_annotation_ppm(fields)
    hdr = f"P6\n{w} {h}\n255\n".encode()
    assert img.tobytes() == ppm[len(hdr):]
    # and the compressed page is orders of magnitude smaller
    assert len(render_annotation_png(fields)) < len(ppm) // 100


def test_resize_image_png_path():
    from credit_ocr_backend_ray.stages.multimodal import resize_image

    px = np.zeros((2, 4, 3), np.uint8)
    px[:, :2] = 10
    px[:, 2:] = 200
    out = decode_png(resize_image(encode_png(px), 2))
    assert out.shape == (1, 2, 3)
    assert (out[0, 0] == 10).all() and (out[0, 1] == 200).all()


def test_media_feature_extractor_real_png_decode(ray_session):
    """The feature extractor REALLY decodes PNG/PPM payloads (width/height
    from pixels); unknown formats keep the sha+size record."""
    import ray.data as rd
    from credit_ocr_backend_ray.stages.multimodal import MediaFeatureExtractor

    png = encode_png(np.zeros((12, 9, 3), np.uint8))
    ppm = b"P6\n4 2\n255\n" + bytes(24)
    rows = [
        {"media_id": "a", "media_type": "image", "payload": png,
         "meta": "{}"},
        {"media_id": "b", "media_type": "image", "payload": ppm,
         "meta": "{}"},
        {"media_id": "c", "media_type": "image", "payload": b"JPEGISH",
         "meta": "{}"},
    ]
    out = (rd.from_items(rows)
           .map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                        batch_size=8, concurrency=1)
           .to_pandas().set_index("media_id"))
    assert (out.loc["a", "width"], out.loc["a", "height"]) == (9, 12)
    assert (out.loc["b", "width"], out.loc["b", "height"]) == (4, 2)
    assert out.loc["b", "n_frames"] == 1
    assert pd_isna(out.loc["c", "width"]) and out.loc["c", "decode_ok"]


def pd_isna(v):
    import pandas as pd
    return pd.isna(v)

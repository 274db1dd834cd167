"""dHash perceptual image hashing + banded near-dup pairs
(stages/multimodal.py: dhash64 / ImagePHasher / image_near_dups)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_dhash64_exact_and_brightness_invariance():
    from credit_ocr_backend_ray.stages.multimodal import dhash64

    # decreasing horizontal gradient: every left cell brighter -> all 1s
    g = np.tile((np.arange(18, 0, -1) * 10).astype(np.uint8)[None, :, None],
                (16, 1, 3))
    assert dhash64(g) == 0xFFFFFFFFFFFFFFFF
    # increasing gradient -> all 0s
    assert dhash64(g[:, ::-1]) == 0

    # a uniform +8 brightness shift moves every luma by exactly +8
    # (integer identity: (num + 8*1000)//1000 = num//1000 + 8), so the
    # hash is IDENTICAL while no channel clips
    rng = np.random.default_rng(3)
    img = rng.integers(0, 200, (40, 53, 3)).astype(np.uint8)
    assert dhash64(img) == dhash64(img + 8)

    # a horizontal flip is a different image
    d = bin(dhash64(img) ^ dhash64(img[:, ::-1])).count("1")
    assert d > 10

    with pytest.raises(ValueError, match="smaller than"):
        dhash64(np.zeros((4, 4, 3), np.uint8))


def test_image_phasher_poison_isolation(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.functions.png import encode_png
    from credit_ocr_backend_ray.stages.multimodal import (
        ImagePHasher, dhash64)

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 30, 3)).astype(np.uint8)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_png(img), b"not an image"],
                            pa.binary())})
    # read rows Arrow-side: a null in a uint64 column would force
    # pandas to float64 and silently round the hash
    out = sorted((rd.from_arrow(t)
                  .map_batches(ImagePHasher, batch_format="pyarrow",
                               batch_size=2, concurrency=1)
                  .take_all()), key=lambda r: r["media_id"])
    assert out[0]["phash"] == dhash64(img)
    assert out[0]["error"] is None
    assert out[1]["phash"] is None
    assert out[1]["error"]


def test_image_near_dups_planted(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.functions.png import encode_png
    from credit_ocr_backend_ray.stages.multimodal import image_near_dups

    rows = []
    for i in range(12):
        rng = np.random.default_rng(100 + i)
        img = rng.integers(0, 200, (32, 36, 3)).astype(np.uint8)
        rows.append({"media_id": 2 * i,
                     "payload": encode_png(img)})
        rows.append({"media_id": 2 * i + 1,
                     "payload": encode_png(img + 8)})  # exact twin
    # concurrency=2: the 4-CPU test session can't host a 4-actor pool
    # plus the shuffle tasks
    pairs = image_near_dups(rd.from_items(rows).repartition(4),
                            max_hamming=6, concurrency=2)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    planted = {(2 * i, 2 * i + 1) for i in range(12)}
    assert planted <= got, planted - got
    # twins hash identically (exact +8 luma shift) -> distance 0
    d = {(a, b): h for a, b, h in pairs.itertuples(index=False)}
    assert all(d[p] == 0 for p in planted)
    # independent noise images are far apart: no cross-doc pairs
    assert got == planted

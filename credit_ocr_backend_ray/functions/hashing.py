"""Content hashing & near-dup signatures: sha256, shingles, MinHash,
SimHash, n-gram Jaccard.

Exact dedup parity: the reference stores one sha256 per document and
dedups on conflict (/root/reference/src/dms_mock/service.py:26-32,
/root/reference/schema.sql:8). Near-dup signatures are our scale
additions (MinHash+LSH banding, SimHash, n-gram Jaccard) — standard
public constructions (Broder '97; Charikar '02), deterministic seeds.

All signature math is vectorized numpy over uint64 with explicit
wraparound; per-batch entry points live in stages/dedup.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

MERSENNE61 = (1 << 61) - 1
_RNG_SEED = 0x5EED_CAFE

_NUM_PERM = 128
_rng = np.random.default_rng(_RNG_SEED)
# fixed affine permutation bank for MinHash: (a*h + b) mod p
_MH_A = _rng.integers(1, MERSENNE61, size=_NUM_PERM, dtype=np.uint64)
_MH_B = _rng.integers(0, MERSENNE61, size=_NUM_PERM, dtype=np.uint64)
# fixed random hyperplane signs come from hashing, not stored matrices


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.sha256(data).hexdigest()


def _hash64(s: str) -> np.uint64:
    return np.uint64(
        int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")
    )


def word_shingles(text: str, n: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def hash_strings_u64(strings: list[str]) -> np.ndarray:
    """Stable-within-run uint64 hashes of a string list, vectorized through
    pandas' siphash kernel (one call per batch instead of one hashlib
    object per shingle — measured ~10x on the minhash stage vs blake2b).

    Deliberately NOT polars: a lazy `import polars` inside a forked Ray
    worker can observe a partially-initialized module (AttributeError
    mid-batch), and any per-worker fallback would mix two hash functions
    within one run — which silently breaks LSH co-bucketing and the
    bloom_semi_join no-false-negatives contract. pandas is fully imported
    before any UDF runs and its siphash is deterministic per process
    fleet. Only feeds LSH bucketing/minhash permutations/bloom bitmaps,
    so cross-version hash drift is harmless (verify steps are exact)."""
    if not strings:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(strings, dtype=object),
                              categorize=False)


def shingle_hashes_batch(texts: list[str], n: int = 3) -> list[np.ndarray]:
    """Per-text arrays of UNIQUE shingle hashes, one vectorized hash call
    for the whole batch."""
    all_sh: list[str] = []
    offsets = [0]
    for t in texts:
        sh = set(word_shingles(t or "", n))
        all_sh.extend(sh)
        offsets.append(len(all_sh))
    h = hash_strings_u64(all_sh)
    return [h[offsets[i]:offsets[i + 1]] for i in range(len(texts))]


def minhash_signature_from_hashes(base: np.ndarray) -> np.ndarray:
    """uint64[_NUM_PERM] MinHash signature from precomputed shingle hashes.
    (a*h + b) computed in python-int free numpy with u64 wraparound
    (wraparound keeps determinism; uniformity is ample for banding)."""
    if base.size == 0:
        return np.full(_NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    prod = base[None, :] * _MH_A[:, None] + _MH_B[:, None]
    return prod.min(axis=1)


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """uint64[_NUM_PERM] MinHash signature over word n-gram shingles."""
    return minhash_signature_from_hashes(shingle_hashes_batch([text], n)[0])


def minhash_bands(sig: np.ndarray, bands: int = 16) -> list[int]:
    """LSH band keys: hash of each contiguous r-row slice (r = perms/bands).
    Docs sharing any band key are near-dup candidates."""
    r = sig.shape[0] // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * r:(b + 1) * r].tobytes()
        h = hashlib.blake2b(chunk, digest_size=8, salt=b.to_bytes(8, "big")).digest()
        keys.append(int.from_bytes(h, "big"))
    return keys


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (Charikar '02)."""
    toks = text.split()
    if not toks:
        return 0
    hashes = hash_strings_u64(toks)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    # signed arithmetic: uint64 subtraction would wrap below zero
    votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
    out = np.uint64(0)
    for k in range(64):
        if votes[k] > 0:
            out |= np.uint64(1) << np.uint64(k)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(word_shingles(a, n)), set(word_shingles(b, n))
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0

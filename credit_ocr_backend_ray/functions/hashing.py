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


# order-sensitive polynomial shingle/band combine over uint64 with
# wraparound (golden-ratio odd multiplier) + splitmix64-style finalizer
# for the band keys (their LOW bits feed `% shards` bucketing)
_POLY_B = np.uint64(0x9E3779B97F4A7C15)
_MIX_1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_2 = np.uint64(0x94D049BB133111EB)
_BK_SALT = np.random.default_rng(_RNG_SEED ^ 0xB4D5).integers(
    0, np.iinfo(np.uint64).max, size=64, dtype=np.uint64)


def shingle_hashes_batch(texts: list[str], n: int = 3) -> list[np.ndarray]:
    """Per-text arrays of UNIQUE shingle hashes: ONE vectorized string-hash
    call for the whole batch's TOKENS, then a numpy rolling polynomial
    combine per n-window — no shingle strings are ever constructed (the
    r4 shape built ``" ".join(...)`` per position, which dominated the
    minhash stage's profile; same semantics, ~3x less hashed bytes and
    zero per-shingle Python allocations)."""
    tok_lists = [(t or "").split() for t in texts]
    th = hash_strings_u64([tok for toks in tok_lists for tok in toks])
    out: list[np.ndarray] = []
    pos = 0
    for toks in tok_lists:
        m = len(toks)
        h = th[pos:pos + m]
        pos += m
        if m == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        w = min(m, n)  # parity with word_shingles: short text = 1 shingle
        acc = h[0:m - w + 1].copy()
        for j in range(1, w):
            acc = acc * _POLY_B + h[j:m - w + 1 + j]
        out.append(np.unique(acc))
    return out


def minhash_signatures_batch(hash_arrays: list[np.ndarray],
                             chunk_hashes: int = 1 << 17) -> np.ndarray:
    """(T, _NUM_PERM) uint64 MinHash signatures for a batch of
    precomputed shingle-hash arrays: texts are concatenated and the
    whole (perm x hash) affine bank + per-text min runs as two numpy
    kernels (``np.minimum.reduceat`` over text offsets), chunked to
    ~``chunk_hashes`` shingles so the (128 x K) product stays ~128 MB
    regardless of batch size. Empty texts get the all-max signature."""
    T = len(hash_arrays)
    sigs = np.full((T, _NUM_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    pend: list[int] = []
    tot = 0

    def flush() -> None:
        nonlocal pend, tot
        if not pend:
            return
        cat = np.concatenate([hash_arrays[t] for t in pend])
        prod = cat[None, :] * _MH_A[:, None] + _MH_B[:, None]
        sz = np.array([hash_arrays[t].size for t in pend], dtype=np.int64)
        offs = np.zeros(len(sz), dtype=np.int64)
        np.cumsum(sz[:-1], out=offs[1:])
        sigs[np.asarray(pend)] = np.minimum.reduceat(prod, offs, axis=1).T
        pend, tot = [], 0

    for t in range(T):
        s = hash_arrays[t].size
        if not s:
            continue
        pend.append(t)
        tot += s
        if tot >= chunk_hashes:
            flush()
    flush()
    return sigs


def minhash_band_keys_batch(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """(T, bands) uint64 LSH band keys — a salted polynomial combine of
    each contiguous r-perm slice plus a splitmix64-style finalizer, all
    vectorized (the r4 shape ran 16 blake2b calls PER DOC). Docs sharing
    any band key are near-dup candidates; any uniform 64-bit mix serves
    (the verify step is exact), so banding only needs determinism."""
    t, p = sigs.shape
    r = p // bands
    v = sigs[:, :bands * r].reshape(t, bands, r)
    acc = np.broadcast_to(_BK_SALT[:bands], (t, bands)).copy()
    for k in range(r):
        acc = acc * _POLY_B + v[:, :, k]
    acc ^= acc >> np.uint64(33)
    acc *= _MIX_1
    acc ^= acc >> np.uint64(29)
    acc *= _MIX_2
    acc ^= acc >> np.uint64(32)
    return acc


def minhash_band_keys_for_texts(texts: list[str], n: int = 3,
                                bands: int = 16) -> np.ndarray:
    """(T, bands) uint64 band keys straight from texts — the whole
    shingle -> minhash -> band pipeline in four vectorized kernels; the
    one per-batch entry point the LSH stages share."""
    return minhash_band_keys_batch(
        minhash_signatures_batch(shingle_hashes_batch(texts, n)), bands)


def minhash_signature_from_hashes(base: np.ndarray) -> np.ndarray:
    """uint64[_NUM_PERM] MinHash signature from precomputed shingle
    hashes (single-text wrapper over the batch kernel, so both paths
    produce identical values by construction)."""
    return minhash_signatures_batch([base])[0]


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """uint64[_NUM_PERM] MinHash signature over word n-gram shingles."""
    return minhash_signature_from_hashes(shingle_hashes_batch([text], n)[0])


def minhash_bands(sig: np.ndarray, bands: int = 16) -> list[int]:
    """LSH band keys of one signature (wrapper over the batch kernel)."""
    return [int(x) for x in minhash_band_keys_batch(sig[None, :], bands)[0]]


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

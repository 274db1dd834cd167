"""Deduplication stages: exact (hash / latest-wins) and near-dup
(MinHash+LSH, SimHash, n-gram Jaccard).

Exact dedup parity: the reference's upsert/`ON CONFLICT` semantics keyed by
document id + sha256 content hash (/root/reference/src/ocr/extraction.py:
524-548, schema.sql:8). Near-dup is our scale addition (SURVEY §2.7 marks it
absent in the reference).

Scale notes (the partitioning assumptions, per north rule):
- ``dedup_latest`` default path avoids shuffling multi-MB payloads: it
  aggregates winners over a (key, order) projection — a small all-to-all —
  then broadcast-filters the payload stream (``ray.put`` once). Ties on
  (key, order) both survive; ``strict=True`` instead hash-shuffles whole
  rows through ``groupby(key).map_groups`` with a total tie-break.
- MinHash/SimHash banding shuffles only (band_key, id) pairs — signatures,
  never text. Candidate verification broadcasts the id->text map; at 100 TB
  replace with a bucket-partitioned self-join on id (same band keys), noted
  inline.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Max

from credit_ocr_backend_ray.functions.hashing import (
    jaccard, minhash_bands, minhash_signature, simhash64,
)


# ---------------------------------------------------------------- exact

def dedup_latest(ds: "rd.Dataset", key: str = "url",
                 order_col: str = "warc_ts", strict: bool = False) -> "rd.Dataset":
    """Keep the newest row per key (reference J4/S12: latest job per
    document, last-write-wins upsert)."""
    if strict:
        def pick_latest(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values([order_col, key], ascending=False).head(1)
        return ds.groupby(key).map_groups(pick_latest, batch_format="pandas")

    winners = (ds.select_columns([key, order_col])
                 .groupby(key).aggregate(Max(order_col, alias_name="__max_ord")))
    wmap = {row[key]: row["__max_ord"] for row in winners.iter_rows()}
    ref = ray.put(wmap)

    def keep_winner(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        keys = batch[key].to_pylist()
        orders = batch[order_col].to_pylist()
        mask = pa.array([w.get(k) == o for k, o in zip(keys, orders)])
        return batch.filter(mask)

    return ds.map_batches(keep_winner, batch_format="pyarrow")


def dedup_exact(ds: "rd.Dataset", hash_col: str,
                tie_col: str) -> "rd.Dataset":
    """Hash-partition by content hash, keep the smallest ``tie_col`` row of
    each group (deterministic representative)."""
    def first_of(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(tie_col, ascending=True).head(1)
    return ds.groupby(hash_col).map_groups(first_of, batch_format="pandas")


# ---------------------------------------------------------------- minhash

def add_minhash(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id", bands: int = 16) -> pa.Table:
    """(id, band_id, band_key) exploded rows — bands*n output rows of three
    small columns; the LSH shuffle moves only these."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_id, out_band, out_key = [], [], []
    for i, t in zip(ids, texts):
        keys = minhash_bands(minhash_signature(t or ""), bands=bands)
        for b, bk in enumerate(keys):
            out_id.append(i)
            out_band.append(b)
            out_key.append(bk)
    return pa.table({
        id_col: pa.array(out_id, pa.int64()),
        "band_id": pa.array(out_band, pa.int32()),
        "band_key": pa.array(out_key, pa.uint64()),
    })


def _bucket_pairs(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    ids = sorted(set(g[id_col].tolist()))
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    a, b = [], []
    # buckets are tiny by construction; cap blowup from a degenerate hot
    # bucket (salting alternative documented in SURVEY §2.7)
    for i in range(min(len(ids), 200)):
        for j in range(i + 1, min(len(ids), 200)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"id_a": a, "id_b": b})


def minhash_candidate_pairs(ds: "rd.Dataset", text_col: str = "text",
                            id_col: str = "doc_id", bands: int = 16) -> "rd.Dataset":
    sig = ds.map_batches(
        lambda b: add_minhash(b, text_col=text_col, id_col=id_col, bands=bands),
        batch_format="pyarrow")
    pairs = sig.groupby(["band_id", "band_key"]).map_groups(
        lambda g: _bucket_pairs(g, id_col), batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def minhash_dedup_pairs(ds: "rd.Dataset", text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.8,
                        bands: int = 16) -> pd.DataFrame:
    """Verified near-dup pairs (jaccard >= threshold) as a small driver-side
    DataFrame. Text lookup is broadcast (fine while the corpus of *texts in
    candidate pairs* fits the object store; at larger scale join candidates
    back by id via a bucket-partitioned shuffle instead)."""
    texts = {r[id_col]: r[text_col] for r in
             ds.select_columns([id_col, text_col]).iter_rows()}
    ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        t = ray.get(ref)
        ja = [jaccard(t.get(a, "") or "", t.get(b, "") or "")
              for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())]
        out = batch.append_column("jaccard", pa.array(ja, pa.float64()))
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    cands = minhash_candidate_pairs(ds, text_col, id_col, bands)
    return cands.map_batches(verify, batch_format="pyarrow").to_pandas()


def cluster_pairs(pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find over the (small, verified) pair set -> id -> cluster rep
    (min id). Driver-side by design: the candidate set after verification is
    orders of magnitude smaller than the corpus."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


# ---------------------------------------------------------------- simhash

def add_simhash(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    ids = batch[id_col]
    sh = [simhash64(t or "") for t in batch[text_col].to_pylist()]
    arr = np.array(sh, dtype=np.uint64)
    tbl = {id_col: ids, "simhash": pa.array(arr, pa.uint64())}
    # 4x16-bit chunks: two docs within hamming distance 3 share >=1 chunk
    for c in range(4):
        chunk = (arr >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        tbl[f"sim_chunk{c}"] = pa.array(chunk.astype(np.int64), pa.int64())
    return pa.table(tbl)


def simhash_candidates(ds: "rd.Dataset", text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3) -> pd.DataFrame:
    sigs = ds.map_batches(
        lambda b: add_simhash(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")
    frames = []
    for c in range(4):
        def chunk_pairs(g: pd.DataFrame, c=c) -> pd.DataFrame:
            rows = sorted(zip(g[id_col], g["simhash"]))
            a, b, h = [], [], []
            for i in range(min(len(rows), 200)):
                for j in range(i + 1, min(len(rows), 200)):
                    d = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                    if d <= max_hamming:
                        a.append(rows[i][0]); b.append(rows[j][0]); h.append(d)
            return pd.DataFrame({"id_a": pd.Series(a, dtype="int64"),
                                 "id_b": pd.Series(b, dtype="int64"),
                                 "hamming": pd.Series(h, dtype="int64")})
        frames.append(
            sigs.groupby(f"sim_chunk{c}")
                .map_groups(chunk_pairs, batch_format="pandas").to_pandas())
    allp = pd.concat(frames, ignore_index=True)
    if allp.empty:
        return allp
    return (allp.sort_values(["id_a", "id_b"])
                .drop_duplicates(["id_a", "id_b"]).reset_index(drop=True))

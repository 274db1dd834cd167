"""Cross-run incremental exact dedup: a persisted content-hash index.

At 100 TB a crawl arrives in increments; re-deduplicating the full corpus
per increment is O(corpus) every run. Instead the engine persists each
run's content hashes as a bucket-partitioned parquet INDEX and each new
increment:

1. dedups within itself (``dedup_exact`` — combiner-pruned shuffle),
2. anti-joins its hashes against the index — broadcast set filter when
   the index slice is small (size read from parquet metadata, no data
   I/O), hash-shuffle LEFT ANTI join otherwise,
3. appends its surviving hashes to the index under a fresh ``run=<id>``
   directory — append-only, so a crashed run never corrupts prior state
   and re-running an increment is idempotent at the directory level.

The index stores only (bucket, hash) — a 100 TB corpus of ~40 KB pages is
~2.5e9 hashes ≈ 80 GB of index, which the bucket partitioning spreads so
the anti-join prunes both sides to matching buckets. This extends the
reference's single-database ON CONFLICT dedup (schema.sql:8,
src/dms_mock/service.py:26-32) to the multi-run setting it cannot reach.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

_N_BUCKETS = 64
_BROADCAST_INDEX_BYTES = 512 << 20


def _bucket_of(hashes: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Bucket id from the hash hex prefix — stable across runs/engines."""
    return np.array([int(h[:4], 16) % _N_BUCKETS
                     for h in hashes.to_pylist()], dtype=np.int32)


def index_files(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(index_dir, "run=*", "*.parquet")))


def hash_index_append(ds: "rd.Dataset", index_dir: str, run_id: str,
                      hash_col: str = "text_hash") -> int:
    """Append ``ds``'s hash column to the index under ``run=<run_id>``.
    Returns the number of hashes written. Existing run directories are
    left untouched (append-only contract); re-appending the same run_id
    overwrites only that run's files (idempotent resume)."""
    out_dir = os.path.join(index_dir, f"run={run_id}")
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": pa.array(_bucket_of(t[hash_col])),
            "hash": t[hash_col],
        })

    hashes = ds.map_batches(project, batch_format="pyarrow")
    hashes.write_parquet(out_dir)
    import pyarrow.parquet as pq
    return sum(pq.read_metadata(f).num_rows
               for f in glob.glob(os.path.join(out_dir, "*.parquet")))


def dedup_against_index(ds: "rd.Dataset", index_dir: str,
                        hash_col: str = "text_hash",
                        num_partitions: int | None = None) -> "rd.Dataset":
    """Keep only rows whose ``hash_col`` is NOT in the persisted index.
    Empty/missing index passes everything through. Broadcast set filter
    when the on-disk index is small; LEFT ANTI hash join otherwise."""
    files = index_files(index_dir)
    if not files:
        return ds

    total_bytes = sum(os.path.getsize(f) for f in files)
    if total_bytes < _BROADCAST_INDEX_BYTES:
        import pyarrow.parquet as pq
        seen = set()
        for f in files:
            seen.update(pq.read_table(f, columns=["hash"])
                        .column("hash").to_pylist())
        ref = ray.put(seen)

        def filt(t: pa.Table) -> pa.Table:
            s = ray.get(ref)
            mask = pa.array([h not in s for h in t[hash_col].to_pylist()])
            return t.filter(mask)

        return ds.map_batches(filt, batch_format="pyarrow")

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(4, min(cpus, 64))
    from credit_ocr_backend_ray.sources.pq_read import read_parquet_clean
    idx = read_parquet_clean(files, columns=["hash"])
    return ds.join(idx, join_type="left_anti",
                   num_partitions=num_partitions,
                   on=(hash_col,), right_on=("hash",))


def incremental_dedup_run(ds: "rd.Dataset", index_dir: str, run_id: str,
                          hash_col: str = "text_hash",
                          tie_col: str = "doc_id") -> "rd.Dataset":
    """One increment end-to-end: within-run exact dedup -> anti-join
    against prior runs' index -> append survivors' hashes to the index.
    Returns the surviving rows (materialized — the index append must
    complete before the caller's next increment starts)."""
    from credit_ocr_backend_ray.stages.dedup import dedup_exact

    within = dedup_exact(ds, hash_col=hash_col, tie_col=tie_col)
    fresh = dedup_against_index(within, index_dir, hash_col).materialize()
    hash_index_append(fresh, index_dir, run_id, hash_col)
    return fresh

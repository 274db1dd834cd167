"""The flagship pipeline: web pages Parquet -> extraction -> partitioned
Parquet + lineage.

Ray-Data restatement of the reference's whole Celery chain
(/root/reference/src/tasks/pipeline_tasks.py:147-166) as ONE lazy Dataset
plan — the five blob round-trips per document become Arrow columns flowing
through the streaming executor:

    read_parquet(shards)                      url warc_ts html text lang
      -> map_batches(prepass)                 n_bytes sha256 size_bucket part_id
      -> [optional] dedup by url              keep latest warc_ts (stages/dedup)
      -> map_batches(DocExtractor, pool)      extracted_text fields ... status
      -> write_parquet(out/group=K/)          + per-partition lineage manifest

Resume: shard-group manifests (state/manifest.py). Skew: oversized payloads
are flagged by ``size_bucket`` and the extract stage sub-batches each block
by a PAYLOAD BYTE budget (DocExtractor yields per-chunk tables), so worker heap
and output block size are bounded regardless of page-size skew; blocks are
further split by Ray's ``target_max_block_size``.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass

import pyarrow as pa

import ray.data as rd

def _settle_fsspec_http_import() -> None:
    """Make the fsspec http-filesystem probe race-free for concurrent group
    executions. Without aiohttp, ``fsspec.implementations.http`` raises on
    EVERY import (never cached in sys.modules), and Ray's path resolution
    probes it per read/write; two threads racing the failing import can see
    a partially-initialized module and get a plain ImportError that escapes
    Ray's ``except ModuleNotFoundError`` guard. Caching a sentinel module
    (HTTPFileSystem exists only for isinstance checks, which stay False)
    makes every later import an instant cache hit."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel: no aiohttp -> none can exist
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
    except ImportError:
        pass  # real fsspec/http import issues: leave as-is


_settle_fsspec_http_import()

from credit_ocr_backend_ray.stages.extract import DocExtractor
from credit_ocr_backend_ray.stages.prepass import DEFAULT_NUM_PARTS, make_prepass
from credit_ocr_backend_ray.state.manifest import (
    RunManifest, shard_groups, write_lineage,
)


@dataclass
class ExtractionConfig:
    doc_type: str = "credit_request"
    num_parts: int = DEFAULT_NUM_PARTS
    chunk_budget_mb: int = 32     # per-sub-batch payload byte budget (skew)
    concurrency: int | None = None  # actor pool size; None = CPUs-2 heuristic
    dedup: bool = False           # exact dedup by url (keep latest warc_ts)
    with_result_json: bool = False


def _pool_size(requested: int | None) -> int:
    if requested is not None:
        return requested
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # cpus-2: leave exactly two scheduler slots for read/write tasks. Swept
    # on 32 CPUs / 100k pages (column-pruned read, per-shard blocks):
    # 24 actors -> 2256 docs/s, 28 -> 2597, 30 -> 3221, 31+ -> starvation
    # crawl (zero slots left, pipeline advances only via backpressure).
    return max(2, cpus - 2)


def _resolve_files(paths: list[str] | str) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(glob.glob(os.path.join(paths, "*.parquet")))
        return [paths]
    return list(paths)


def build_extraction_ds(paths: list[str] | str,
                        cfg: ExtractionConfig | None = None) -> "rd.Dataset":
    """The lazy extraction plan (no sink) — shared by entry(), queries(),
    tests and the writer below."""
    cfg = cfg or ExtractionConfig()
    files = _resolve_files(paths)
    # one read block per shard: letting Ray re-slice multi-MB-binary blocks
    # (SplitBlocks) serializes the whole backing buffer per slice — measured
    # 300+ CPU-s of pure overhead on a 0.8 GB input. Shard size (synth
    # ROWS_PER_FILE, ~20 MB) is the block-size knob; at 100 TB the same rule
    # holds per input shard, with oversized shards handled by
    # target_max_block_size dynamic splitting after the extract stage.
    # prune at the read: the extraction path never touches the pre-extracted
    # `text` column, so don't decode or ship it (input_hint schema keeps it
    # for other consumers)
    ds = rd.read_parquet(files, override_num_blocks=max(len(files), 1),
                         columns=["url", "warc_ts", "html", "lang"])
    ds = ds.map_batches(make_prepass(cfg.num_parts), batch_format="pyarrow")
    if cfg.dedup:
        from credit_ocr_backend_ray.stages.dedup import dedup_latest
        ds = dedup_latest(ds, key="url", order_col="warc_ts")

    if cfg.concurrency is None:
        # Stateless tasks, NOT an actor pool: the extractor's state is a
        # small picklable config + compiled regexes, and Ray deserializes
        # a task UDF once per worker PROCESS (cloudpickle cache), so the
        # "state built once per worker" property holds without a pool.
        # Measured at 32 CPUs / 100k docs: the fixed-size pool cost 18.1 s
        # vs 12.8 s stateless — pool ramp (~2 s for 30 actors), rigid
        # block->actor assignment (no work stealing => stragglers), and
        # per-actor queue overhead. An actor pool remains the right shape
        # when the state is a real model (set cfg.concurrency explicitly).
        extractor = DocExtractor(doc_type=cfg.doc_type,
                                 with_result_json=cfg.with_result_json,
                                 chunk_budget_mb=cfg.chunk_budget_mb)

        def extract_batches(t: pa.Table):
            yield from extractor(t)  # byte-budget sub-batching preserved

        ds = ds.map_batches(extract_batches, batch_format="pyarrow",
                            batch_size=None, num_cpus=1)
    else:
        ds = ds.map_batches(
            DocExtractor,
            fn_constructor_kwargs={
                "doc_type": cfg.doc_type,
                "with_result_json": cfg.with_result_json,
                "chunk_budget_mb": cfg.chunk_budget_mb,
            },
            batch_format="pyarrow",
            batch_size=None,  # whole block; DocExtractor sub-batches by BYTES
            concurrency=_pool_size(cfg.concurrency),
            num_cpus=1,
        )
    return ds


def run_extraction(input_paths: list[str] | str, out_dir: str,
                   cfg: ExtractionConfig | None = None,
                   n_groups: int = 1,
                   concurrent_groups: int | None = None) -> dict:
    """Execute with shard-group checkpointing; returns a run summary.

    ``concurrent_groups`` > 1 pipelines that many group executions at once
    (each a separate streaming Dataset run): one group's write tail and the
    next group's read/actor ramp overlap, which recovers the spin-up cost
    that sequential groups pay at every boundary (measured: 400k docs in 8
    sequential groups ran at 0.47x the single-group rate). The per-group
    actor pool is scaled down so the total stays at cpus-2. Default: 2
    when there is more than one group to run."""
    cfg = cfg or ExtractionConfig()
    files = _resolve_files(input_paths)

    os.makedirs(out_dir, exist_ok=True)
    manifest = RunManifest(out_dir)
    summary = {"groups_total": 0, "groups_skipped": 0, "groups_run": 0,
               "rows": 0,
               # wall_s: ONE elapsed measurement around this invocation's
               # whole todo batch — the throughput denominator even when
               # groups overlap (summing per-group walls double-counts
               # overlapped wall-clock). group_wall_s keeps the per-group
               # sum as detail.
               "wall_s": 0.0, "group_wall_s": 0.0,
               # metrics survive resume: completed groups contribute their
               # recorded wall/docs-rate from the manifest (north rule:
               # "resumed from checkpoint with metrics intact")
               "completed_wall_s": 0.0, "completed_docs_per_s": 0.0}

    todo: list[tuple[str, list[str]]] = []
    for k, group in enumerate(shard_groups(files, n_groups)):
        key = f"{k:05d}"
        summary["groups_total"] += 1
        if manifest.is_complete(key):
            entry = manifest.entries[key]
            summary["groups_skipped"] += 1
            summary["rows"] += entry["rows"]
            summary["completed_wall_s"] += entry.get("wall_s", 0.0)
            continue
        manifest.reset_incomplete(key)
        todo.append((key, group))

    if not todo:
        if summary["completed_wall_s"] > 0:
            summary["completed_docs_per_s"] = round(
                summary["rows"] / summary["completed_wall_s"], 1)
        return summary

    k_eff = (concurrent_groups if concurrent_groups is not None
             else (2 if len(todo) > 1 else 1))
    k_eff = max(1, min(k_eff, len(todo)))
    gcfg = cfg
    if k_eff > 1 and cfg.concurrency is not None:
        # explicit actor pools must share the cluster between groups;
        # the default stateless-task path needs no split (tasks from all
        # groups schedule onto the same CPU pool)
        gcfg = ExtractionConfig(**{**cfg.__dict__,
                                   "concurrency": max(2, _pool_size(cfg.concurrency) // k_eff)})

    import threading
    lock = threading.Lock()

    def run_group(item: tuple[str, list[str]]) -> None:
        key, group = item
        t0 = time.perf_counter()
        ds = build_extraction_ds(group, gcfg)
        gdir = manifest.group_dir(key)
        ds.write_parquet(gdir)
        lineage_dir, rows = write_lineage(gdir)
        wall = time.perf_counter() - t0

        with lock:
            manifest.mark_complete(key, {
                "files": group, "rows": rows, "wall_s": wall,
                "lineage": lineage_dir,
            })
            summary["groups_run"] += 1
            summary["rows"] += rows
            summary["group_wall_s"] += wall

    t_batch = time.perf_counter()
    if k_eff == 1:
        for item in todo:
            run_group(item)
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=k_eff) as pool:
            list(pool.map(run_group, todo))
    summary["wall_s"] = time.perf_counter() - t_batch
    # resumed-run continuity: prior groups' recorded walls + this batch's
    # single elapsed wall (NOT the overlap-double-counting per-group sum)
    summary["completed_wall_s"] += summary["wall_s"]

    if summary["completed_wall_s"] > 0:
        summary["completed_docs_per_s"] = round(
            summary["rows"] / summary["completed_wall_s"], 1)

    return summary

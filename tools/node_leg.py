"""One simulated cluster 'node' for the multi-node scaling evidence
(bench.py --scaling-nodes): a fully independent local Ray cluster
(own raylet, scheduler, object store via a private temp dir) with
``--cpus`` CPUs, running the extraction job over a shard slice.

Prints one JSON line: {"wall_s": ..., "rows": ..., "shards": N}.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--slice", type=int, default=0, help="k of k::n shards")
    ap.add_argument("--nslices", type=int, default=1)
    ap.add_argument("--tmp", required=True, help="private Ray temp dir")
    args = ap.parse_args()

    import logging

    import ray
    os.makedirs(args.tmp, exist_ok=True)
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR", _temp_dir=args.tmp,
             object_store_memory=4 << 30)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from credit_ocr_backend_ray.pipelines.extraction import (
        ExtractionConfig, build_extraction_ds, run_extraction)

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    shard = files[args.slice::args.nslices]
    shutil.rmtree(args.out, ignore_errors=True)

    # warm every worker process once (spawn + UDF deserialize, ~7 s of
    # per-cluster fixed cost) before timing: a real node in a long job
    # amortizes this to nothing, and the same warm-up runs in run_bench
    build_extraction_ds(files[:2 * max(2, args.cpus - 2)],
                        ExtractionConfig()).count()

    t0 = time.perf_counter()
    summary = run_extraction(shard, args.out, n_groups=1)
    wall = time.perf_counter() - t0
    print(json.dumps({"wall_s": round(wall, 3), "rows": summary["rows"],
                      "shards": len(shard)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""1M-row scale probe for the r5 range-bucket prefix-scan ops:
watermark_late_events (global prefix-MAX) and global_row_number
(global prefix-SUM). Correctness at this scale is pinned by a local
single-process restatement of each result (md5-arrival cummax / a
lexsort permutation check); wall time is warm best-of-2 with peak host
memory sampled from /proc/meminfo (stress_shuffle_ops' protocol).

Usage: python tools/stress_prefix_ops.py [--append-baseline]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from tools.stress_shuffle_ops import MemSampler, timed  # noqa: E402


def _events(n_rows: int) -> pd.DataFrame:
    rng = np.random.default_rng(23)
    t0 = pd.Timestamp("2025-01-01").value // 1000
    span_us = 30 * 24 * 3600 * 1_000_000
    return pd.DataFrame({
        "event_id": np.arange(n_rows, dtype=np.int64),
        "ts": pd.to_datetime(
            (t0 + rng.integers(0, span_us, n_rows)) * 1000),
    })


def stress_watermark(n_rows: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.relational import (
        watermark_late_events)

    df = _events(n_rows)
    ds = rd.from_pandas(df).repartition(64).materialize()

    t1 = time.perf_counter()
    out = watermark_late_events(ds, n_buckets=4096).to_pandas()
    wall = round(time.perf_counter() - t1, 2)

    # local restatement: cummax over md5-arrival order
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big")
         for i in df["event_id"]), dtype=np.int64, count=n_rows)
    o = df.assign(__h=h, tus=df["ts"].astype("datetime64[us]")
                  .astype("int64")).sort_values(["__h", "event_id"])
    hw = o["tus"].cummax().to_numpy()
    late = int((o["tus"].to_numpy() < hw - 7 * 86_400 * 1_000_000).sum())

    got = out.sort_values("event_id")
    want = o.assign(hw=hw).sort_values("event_id")
    assert len(got) == n_rows
    assert (got["high_watermark_us"].to_numpy()
            == want["hw"].to_numpy()).all()
    assert int(got["late"].sum()) == late
    return {"op_s": wall, "rows": n_rows, "late": late}


def stress_row_number(n_rows: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.relational import global_row_number

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "id": np.arange(n_rows, dtype=np.int64),
        # ~100k distinct values -> ~10 ties per value, plus one hot
        # value repeated 50k times (a single bucket's worst case)
        "v": np.concatenate([
            rng.integers(0, 100_000, n_rows - 50_000),
            np.full(50_000, 42_000)]).astype(np.float64),
    })
    ds = rd.from_pandas(df).repartition(64).materialize()

    t1 = time.perf_counter()
    out = global_row_number(ds, "v", "id", n_buckets=4096).to_pandas()
    wall = round(time.perf_counter() - t1, 2)

    got = out.sort_values("row_num")["id"].to_numpy()
    want = df.iloc[np.lexsort((df["id"].to_numpy(),
                               df["v"].to_numpy()))]["id"].to_numpy()
    assert len(out) == n_rows
    assert (got == want).all()
    assert sorted(out["row_num"]) == list(range(1, n_rows + 1))
    return {"op_s": wall, "rows": n_rows}


def main() -> int:
    import logging

    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level=logging.ERROR)
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    recs = [timed("watermark_late_events_1M", stress_watermark),
            timed("global_row_number_1M", stress_row_number)]
    ray.shutdown()

    if "--append-baseline" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BASELINE.md")
        with open(path, "a") as f:
            f.write("\n### r5 prefix-scan ops at 1M rows "
                    "(tools/stress_prefix_ops.py, warm best-of-2)\n\n"
                    "| op | wall s (best) | runs s | spread % | "
                    "peak host GB |\n|---|---|---|---|---|\n")
            for r in recs:
                f.write(f"| {r['op']} | {r['wall_s']} | {r['runs_s']} | "
                        f"{r['spread_pct']} | {r['peak_host_gb']} |\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""1M-row scale probes for the r5 session-3 operators: exact ROC-AUC
(global range-bucket rank sums + grouped distinct-score fold), grouped
rank features, the equi-depth histogram, and SCD2 interval builds —
each at ~10x the sf0.1 width the driver benches, warm best-of-2, peak
host memory from /proc/meminfo, results pinned by local restatements
(pandas rank / window formulas on the same synthetic frame).

Inputs synthesize deterministically in memory (no /root/testdata
writes). Usage: python tools/stress_eval_ops.py [--append-baseline]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from tools.stress_shuffle_ops import MemSampler, timed  # noqa: E402


def _frame(n: int = 1_000_000) -> pd.DataFrame:
    rng = np.random.default_rng(23)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": pd.Series(rng.integers(0, 20, n)).map(lambda i: f"g{i:02d}"),
        "score": rng.integers(0, 10_000, n),
        "pos": rng.integers(0, 2, n)})


def stress_roc_auc_global(n: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.curate import roc_auc

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = roc_auc(ds, "score", "pos")
    wall = time.perf_counter() - t0
    # exact restatement: tie-averaged ranks via pandas
    r = df["score"].rank(method="average")
    npos = int(df["pos"].sum()); nneg = n - npos
    r2 = int(round(2 * r[df["pos"] == 1].sum()))
    want = (r2 - npos * (npos + 1)) * 1_000_000 // (2 * npos * nneg)
    got = int(out["auc_micro"].iloc[0])
    return {"n": n, "wall_s_inner": round(wall, 2), "auc_micro": got,
            "match": got == want}


def stress_roc_auc_grouped(n: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.curate import roc_auc

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = roc_auc(ds, "score", "pos", keys=["k"]).to_pandas()
    wall = time.perf_counter() - t0
    # spot-pin one group exactly
    g = df[df["k"] == "g07"]
    r = g["score"].rank(method="average")
    npos = int(g["pos"].sum()); nneg = len(g) - npos
    r2 = int(round(2 * r[g["pos"] == 1].sum()))
    want = (r2 - npos * (npos + 1)) * 1_000_000 // (2 * npos * nneg)
    got = int(out.loc[out["k"] == "g07", "auc_micro"].iloc[0])
    return {"n": n, "groups": int(out.shape[0]),
            "wall_s_inner": round(wall, 2), "g07_match": got == want}


def stress_rank_features(n: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.relational import (
        grouped_rank_features)

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = (grouped_rank_features(ds, ["k"], "score", "id", n_tiles=10)
           .to_pandas())
    wall = time.perf_counter() - t0
    # pin: per-key tile sizes differ by <= 1 and ranks cover 1..n_k
    sizes = out.groupby(["k", "tile"]).size()
    per_k = sizes.groupby("k")
    bal = bool(((per_k.max() - per_k.min()) <= 1).all())
    mx = out.groupby("k")["rnk"].max()
    cnt = out.groupby("k").size()
    return {"n": n, "rows_out": len(out),
            "wall_s_inner": round(wall, 2), "tiles_balanced": bal,
            "rank_max_le_n": bool((mx <= cnt).all())}


def stress_equidepth(n: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.relational import (
        equidepth_histogram)

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = equidepth_histogram(ds, "score", "id", n_bins=32)
    wall = time.perf_counter() - t0
    return {"n": n, "bins": len(out),
            "wall_s_inner": round(wall, 2),
            "depth_exact": bool((out["n"].max() - out["n"].min()) <= 1),
            "mono": bool(out["min_v"].is_monotonic_increasing)}


def stress_scd2(n: int = 1_000_000, users: int = 10_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.relational import scd2_intervals

    rng = np.random.default_rng(29)
    t0v = pd.Timestamp("2025-01-01").value // 1000
    offs = np.sort(rng.integers(0, 30 * 24 * 3600 * 1_000_000, n))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime((t0v + offs) * 1000),
        "u": rng.integers(0, users, n),
        "st": pd.Series(rng.integers(0, 5, n)).map("s{}".format)})
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = scd2_intervals(ds, "u", "ts", "st", "event_id").to_pandas()
    wall = time.perf_counter() - t0
    # local restatement on one user
    g = df[df["u"] == 7].sort_values(["ts", "event_id"])
    changes = int((g["st"] != g["st"].shift()).sum())
    got = int((out["u"] == 7).sum())
    cur = int(out["valid_to"].isna().sum())
    return {"n": n, "rows_out": len(out),
            "wall_s_inner": round(wall, 2),
            "u7_match": got == changes, "open_intervals": cur,
            "one_current_per_user": cur == out["u"].nunique()}


def stress_gini(n: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.relational import (
        gini_concentration)

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = gini_concentration(ds, "score", scale=1)
    wall = time.perf_counter() - t0
    # exact local restatement with Python big ints
    c = np.sort(df["score"].to_numpy(np.int64))
    s = int(c.sum()); w = int(np.sum((np.arange(n) + 1) * c))
    want = (2 * w - (n + 1) * s) * 1_000_000 // (n * s)
    got = int(out["gini_micro"].iloc[0])
    return {"n": n, "wall_s_inner": round(wall, 2),
            "gini_micro": got, "match": got == want}


def stress_grouped_moments(n: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.relational import grouped_moments

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = grouped_moments(ds, ["k"], "score", scale=1).to_pandas()
    wall = time.perf_counter() - t0
    # pin one group with Python big-int power sums
    g = df.loc[df["k"] == "g07", "score"].to_numpy(np.int64)
    want = (str(int(g.sum())),
            str(sum(int(v) ** 2 for v in g)),
            str(sum(int(v) ** 3 for v in g)))
    row = out[out["k"] == "g07"].iloc[0]
    got = (row["s1_scaled"], row["s2_scaled"], row["s3_scaled"])
    return {"n": n, "groups": len(out),
            "wall_s_inner": round(wall, 2), "g07_match": got == want}


def stress_snm_pairs(n: int = 1_000_000, window: int = 2) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.dedup import snm_pairs

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = snm_pairs(ds, "score", "id", window=window)
    cnt = out.count()
    wall = time.perf_counter() - t0
    # exactly n*window - window*(window+1)/2 pairs on dense ranks
    want = n * window - window * (window + 1) // 2
    return {"n": n, "pairs": cnt, "wall_s_inner": round(wall, 2),
            "count_match": cnt == want}


def stress_calibration(n: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.curate import calibration_bins

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = calibration_bins(ds, "score", "pos", n_bins=10)
    wall = time.perf_counter() - t0
    lo = int(df["score"].min()); span = int(df["score"].max()) - lo + 1
    bins = (df["score"].to_numpy(np.int64) - lo) * 10 // span
    want_n = pd.Series(bins).value_counts().sort_index()
    match = (out["n"].tolist() == want_n.tolist()
             and int(out["n"].sum()) == n
             and out["sum_score_micro"].map(int).sum()
                 == int(df["score"].sum()))
    return {"n": n, "bins": len(out),
            "wall_s_inner": round(wall, 2), "match": bool(match)}


def stress_global_cumsum(n: int = 1_000_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.relational import global_cumsum

    df = _frame(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = (global_cumsum(ds, "score", "id", "pos", alias="cum")
           .to_pandas())
    wall = time.perf_counter() - t0
    # exact restatement: pandas sort + cumsum
    want = df.sort_values(["score", "id"])["pos"].cumsum()
    want.index = df.sort_values(["score", "id"])["id"].to_numpy()
    got = out.set_index("id")["cum"]
    match = bool((got.loc[want.index.to_numpy()].to_numpy()
                  == want.to_numpy()).all())
    return {"n": n, "wall_s_inner": round(wall, 2), "match": match}


def stress_containment(n_docs: int = 100_000) -> dict:
    import ray.data as rd
    from credit_ocr_backend_ray.stages.dedup import containment_join

    rng = np.random.default_rng(41)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz 0123456789"))
    texts = ["".join(rng.choice(alpha, 64)) for _ in range(n_docs)]
    # plant 200 quote pairs: doc i+n_docs is a substring of doc i
    planted = []
    for i in range(200):
        texts.append(texts[i][8:40])
        planted.append((n_docs + i, i))
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(64).materialize()
    t0 = time.perf_counter()
    out = containment_join(ds, threshold_micro=900_000, gram_n=8)
    wall = time.perf_counter() - t0
    got = set(zip(out["id_a"], out["id_b"]))
    recall = sum(1 for p in planted if p in got) / len(planted)
    return {"docs": len(texts), "pairs": len(out),
            "wall_s_inner": round(wall, 2),
            "planted_recall_match": recall == 1.0}


def main() -> int:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import logging
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    recs = [
        timed("roc_auc_global_1M", stress_roc_auc_global),
        timed("roc_auc_grouped_1M", stress_roc_auc_grouped),
        timed("rank_features_1M", stress_rank_features),
        timed("equidepth_1M", stress_equidepth),
        timed("scd2_1M", stress_scd2),
        timed("gini_1M", stress_gini),
        timed("grouped_moments_1M", stress_grouped_moments),
        timed("snm_pairs_1M", stress_snm_pairs),
        timed("calibration_1M", stress_calibration),
        timed("global_cumsum_1M", stress_global_cumsum),
        timed("containment_100k", stress_containment),
    ]
    ok = all(all(bool(v) for kk, v in r["result"].items()
                 if kk.endswith(("match", "balanced", "exact", "mono",
                                 "rank_max_le_n", "one_current_per_user")))
             for r in recs)
    print(json.dumps({"ok": ok}))
    if "--append-baseline" in sys.argv:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "BASELINE.md"), "a") as f:
            f.write(f"\n## Eval-op 1M stress {stamp} "
                    f"(tools/stress_eval_ops.py, warm best-of-2)\n\n")
            f.write("| op | wall s (best) | runs s | peak host GB |"
                    " detail |\n|---|---|---|---|---|\n")
            for r in recs:
                f.write(f"| {r['op']} | {r['wall_s']} | {r['runs_s']} |"
                        f" {r['peak_host_gb']} |"
                        f" `{json.dumps(r['result'])}` |\n")
    import ray
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

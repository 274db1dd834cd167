"""Scale stress for the r5 final-session text-dedup family:
substring_dedup, winnow_fingerprints, winnow_overlap, nb_source_score
at 100k and 1M documents (20x / 200x shifted copies of the sf0.1
documents table, the sf1_bench replication), with peak host memory
sampled from /proc/meminfo. The 100k-vs-1M pair is the linearity
ratio; warm best-of-2 per op (the r4 bench lesson — single cold runs
swing 2x with page-cache state).

Two deliberate worst/degenerate cases are part of the probe:
- substring_dedup on REPLICATED docs is the worst case by construction
  (every window repeats across copies, so every position is covered and
  the dup-starts stream is the full token stream).
- winnow_overlap on replicated docs is pathological BY DESIGN (each
  fingerprint bucket grows with the duplication factor, pairs grow
  quadratically); the probe asserts the explicit max_bucket guard TRIPS
  at 1M instead of exploding, then measures pure fingerprint/shard
  throughput on a token-salted variant (distinct tokens per copy ->
  near-zero pairs).

Usage: python tools/stress_textdedup.py [--small]  (--small = 100k only)
Prints one JSON line; exit 0 when every leg behaves.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = "/tmp/sf1_tables"


def build_docs_salted(copies: int, src: str = "/root/testdata/sf0.1") -> str:
    """Copies of the sf0.1 documents table with every TOKEN prefixed by
    the copy id — distinct vocabularies per copy, so cross-copy overlap
    is zero and winnow_overlap measures machinery, not pair explosion."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(SF1_DIR, f"docs{copies}x_salted")
    marker = os.path.join(out_dir, "_done")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(os.path.join(src, "documents.parquet"),
                        columns=["doc_id", "text", "source"])
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    srcs = tbl.column("source").to_pylist()
    parts = []
    for c in range(copies):
        salt = f"c{c}"
        parts.append(pa.table({
            "doc_id": pa.array([i + c * 100_000 for i in ids], pa.int64()),
            "text": pa.array(
                [" ".join(f"{salt}{w}" for w in (t or "").split())
                 for t in texts], pa.string()),
            "source": pa.array(srcs, pa.string()),
        }))
    out = pa.concat_tables(parts)
    pq.write_table(out, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=50_000)
    print(f"built docs{copies}x_salted: {out.num_rows} rows",
          file=sys.stderr)
    with open(marker, "w", encoding="utf-8") as f:
        f.write("ok")
    return out_dir


def main() -> int:
    small = "--small" in sys.argv
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import logging

    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rdd

    from tools.sf1_bench import build_docs_big
    from tools.stress_shuffle_ops import MemSampler

    results: dict = {"metric": "textdedup_stress", "unit": "sec",
                     "num_cpus": 32, "legs": {}}
    failures: list[str] = []

    def timed(name: str, fn, best_of: int = 2):
        best, peak, rows = None, 0.0, None
        for _ in range(best_of):
            with MemSampler() as mem:
                t0 = time.perf_counter()
                rows = fn()
                wall = time.perf_counter() - t0
            peak = max(peak, mem.peak_gb)
            best = wall if best is None else min(best, wall)
        results["legs"][name] = {"wall_s": round(best, 2),
                                 "rows": rows,
                                 "peak_mem_gb": round(peak, 1)}
        print(f"{name}: {best:.2f}s rows={rows} peak={peak:.1f}GB",
              file=sys.stderr)

    scales = [(20, "100k")] if small else [(20, "100k"), (200, "1M")]
    for copies, tag in scales:
        docs_dir = build_docs_big(copies)
        path = os.path.join(docs_dir, "documents.parquet")

        def sub():
            from credit_ocr_backend_ray.stages.curate import substring_dedup
            ds = rdd.read_parquet(path, columns=["doc_id", "text"])
            out = substring_dedup(ds, n=5)
            return out.count()

        def winfp():
            from credit_ocr_backend_ray.stages.text import winnow_fingerprints
            ds = rdd.read_parquet(path, columns=["doc_id", "text"])
            return winnow_fingerprints(ds, k=4, w=4).count()

        def nbscore():
            from credit_ocr_backend_ray.stages.curate import nb_source_score
            ds = rdd.read_parquet(path,
                                  columns=["doc_id", "text", "source"])
            return nb_source_score(ds, pos_source="src7").count()

        timed(f"substring_dedup_{tag}", sub)
        timed(f"winnow_fingerprints_{tag}", winfp)
        timed(f"nb_source_score_{tag}", nbscore)

    # winnow_overlap legs: (a) the max_bucket guard must TRIP on the
    # replicated 1M corpus (every fp bucket ~6*200 docs > 1024) instead
    # of exploding quadratically; (b) throughput on the salted variant.
    if not small:
        from credit_ocr_backend_ray.stages.text import winnow_overlap
        big = os.path.join(build_docs_big(200), "documents.parquet")
        try:
            ds = rdd.read_parquet(big, columns=["doc_id", "text"])
            winnow_overlap(ds, k=4, w=4).count()
            failures.append("winnow_overlap_1M_replicated: cap did "
                            "NOT trip")
        except Exception as exc:
            tripped = "max_bucket" in str(exc)
            results["legs"]["winnow_overlap_1M_cap"] = {
                "guard_tripped": tripped}
            print(f"winnow_overlap 1M replicated: guard tripped="
                  f"{tripped}", file=sys.stderr)
            if not tripped:
                failures.append(
                    f"winnow_overlap_1M_replicated: wrong error {exc}")

        salted = os.path.join(build_docs_salted(200),
                              "documents.parquet")

        def wover():
            ds = rdd.read_parquet(salted, columns=["doc_id", "text"])
            return winnow_overlap(ds, k=4, w=4).count()

        timed("winnow_overlap_1M_salted", wover)

    # linearity ratios (10x rows -> wall ratio; at-or-below ~linear)
    if not small:
        for op in ("substring_dedup", "winnow_fingerprints",
                   "nb_source_score"):
            a = results["legs"][f"{op}_100k"]["wall_s"]
            b = results["legs"][f"{op}_1M"]["wall_s"]
            ratio = round(b / a, 1) if a else None
            results["legs"][f"{op}_1M"]["ratio_vs_100k"] = ratio
            if ratio is not None and ratio > 15:
                failures.append(f"{op}: super-linear ratio {ratio}")

    results["failures"] = failures
    ray.shutdown()
    print(json.dumps(results))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Bounded-vocab stress for learn_bpe (VERDICT r04 item 1): a synthetic
corpus with ~10M DISTINCT whitespace tokens (the web-corpus regime —
typos/URLs/hex ids, almost all singletons) plus a 10k-word repeated
core. Demonstrates that

  1. the distributed ``min_word_count`` prune keeps the driver fold
     bounded (only the repeated core reaches the driver: ~10k rows vs
     ~10M distinct), with driver peak RSS recorded, and
  2. with the prune disabled (``min_word_count=1``) the ``max_vocab_rows``
     cap raises the documented ValueError instead of OOMing the fold.

Inputs are synthesized deterministically in memory (no /root/testdata
writes). Usage: python tools/stress_bpe.py [--append-baseline]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_corpus(n_singletons: int = 10_000_000, core_vocab: int = 10_000,
                 core_occurrences: int = 2_000_000, tokens_per_doc: int = 20):
    """Rows of whitespace-joined tokens: every singleton token appears
    exactly once (hex ids — never twice by construction) interleaved
    with draws from a small repeated core vocabulary."""
    import ray.data as rd

    rng = np.random.default_rng(51)
    core = np.array([f"w{j}x" for j in range(core_vocab)])
    core_draws = core[rng.integers(0, core_vocab, core_occurrences)]
    singles = np.char.add("s", np.char.mod("%x", np.arange(n_singletons)))
    toks = np.concatenate([core_draws, singles])
    rng.shuffle(toks)
    n_docs = len(toks) // tokens_per_doc
    toks = toks[: n_docs * tokens_per_doc].reshape(n_docs, tokens_per_doc)
    texts = [" ".join(row) for row in toks]
    import pandas as pd
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                       "text": texts})
    return rd.from_pandas(df).repartition(64).materialize(), n_docs


def main() -> int:
    import logging

    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from credit_ocr_backend_ray.stages.text import learn_bpe

    t0 = time.perf_counter()
    ds, n_docs = synth_corpus()
    synth_s = round(time.perf_counter() - t0, 2)
    rss0_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    # 1) pruned path: the driver fold sees only the repeated core
    t1 = time.perf_counter()
    merges = learn_bpe(ds, n_merges=30, min_word_count=2,
                       max_vocab_rows=2_000_000)
    learn_s = round(time.perf_counter() - t1, 2)
    rss1_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    # 2) cap path: unpruned 10M-row vocab must raise, never to_pandas
    t2 = time.perf_counter()
    try:
        learn_bpe(ds, n_merges=30, min_word_count=1,
                  max_vocab_rows=2_000_000)
        cap = "MISSED (no error raised)"
    except ValueError as e:
        cap = f"raised: {str(e)[:80]}..."
    cap_s = round(time.perf_counter() - t2, 2)
    rss2_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    rec = {"op": "learn_bpe_10M_distinct", "n_docs": n_docs,
           "synth_s": synth_s, "learn_s": learn_s, "cap_check_s": cap_s,
           "n_merges": len(merges),
           "driver_rss_gb_after_synth": round(rss0_gb, 2),
           "driver_rss_gb_after_learn": round(rss1_gb, 2),
           "driver_rss_gb_after_cap": round(rss2_gb, 2),
           "cap": cap}
    print(json.dumps(rec))
    ray.shutdown()

    if "--append-baseline" in sys.argv:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE.md"), "a") as f:
            f.write(f"\n## learn_bpe bounded-vocab stress {stamp} "
                    f"(tools/stress_bpe.py, 32 CPUs)\n\n"
                    f"`{json.dumps(rec)}`\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Text-analysis stages over a text column: token/char stats, quality
score, language ID, fingerprints. Stateless vectorized ``map_batches``
kernels (regexes compiled at module import, once per worker process).
"""

from __future__ import annotations

import pyarrow as pa

from credit_ocr_backend_ray.functions.textstats import (
    bpe_token_count, char_stats, fingerprint_md5, lang_id, quality_score,
    rolling_fingerprint, token_count,
)


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = [t or "" for t in batch[text_col].to_pylist()]
    stats = [char_stats(t) for t in texts]
    return (batch
            .append_column("n_chars_calc",
                           pa.array([s[0] for s in stats], pa.int64()))
            .append_column("n_tokens",
                           pa.array([token_count(t) for t in texts], pa.int64()))
            .append_column("n_bpe_tokens",
                           pa.array([bpe_token_count(t) for t in texts],
                                    pa.int64()))
            .append_column("n_digits",
                           pa.array([s[1] for s in stats], pa.int64()))
            .append_column("n_upper",
                           pa.array([s[2] for s in stats], pa.int64()))
            .append_column("n_punct",
                           pa.array([s[3] for s in stats], pa.int64())))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = [t or "" for t in batch[text_col].to_pylist()]
    return batch.append_column(
        "quality", pa.array([quality_score(t) for t in texts], pa.float64()))


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = [t or "" for t in batch[text_col].to_pylist()]
    return batch.append_column(
        "pred_lang", pa.array([lang_id(t) for t in texts], pa.string()))


def top_terms(ds, k: int = 50, text_col: str = "text"):
    """Global top-k most frequent whitespace tokens across the corpus:
    per-batch ``Counter`` partials (one (token, n) row per distinct token
    per batch crosses the shuffle — the classic combiner word-count), a
    grouped sum, then a cluster sort + limit. Ties break token-ascending
    for a deterministic cut. Empty tokens are dropped on both the Ray and
    the SQL side."""
    import re
    from collections import Counter

    import pandas as pd

    from credit_ocr_backend_ray.stages.relational import grouped_agg

    ws = re.compile(r"\s+")

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t[text_col].to_pylist():
            if txt:
                c.update(tok for tok in ws.split(txt.strip()) if tok)
        return pa.table({
            "token": pa.array(list(c.keys()), pa.string()),
            "__pn": pa.array(list(c.values()), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    counts = grouped_agg(partials, ["token"], {"__pn": "n"},
                         count_alias="__nbatch")

    def drop_extra(b: pd.DataFrame) -> pd.DataFrame:
        return b[["token", "n"]]

    return (counts.map_batches(drop_extra, batch_format="pandas")
                  .sort(["n", "token"], descending=[True, False]).limit(k))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = [t or "" for t in batch[text_col].to_pylist()]
    return (batch
            .append_column("fingerprint",
                           pa.array([fingerprint_md5(t) for t in texts],
                                    pa.string()))
            .append_column("rolling_fp",
                           pa.array([rolling_fingerprint(t) for t in texts],
                                    pa.uint64())))

"""Cross-run incremental dedup (stages/incremental.py): persisted hash
index, anti-join paths, append-only idempotence."""

import hashlib

import numpy as np

import pandas as pd
import pyarrow as pa
import pytest


def _hashed_ds(rows):
    import ray.data as rd

    df = pd.DataFrame(rows)
    df["text_hash"] = df["text"].map(
        lambda t: hashlib.sha256(t.encode()).hexdigest())
    return rd.from_pandas(df).repartition(4)


@pytest.fixture()
def corpus():
    run1 = [{"doc_id": i, "text": f"document number {i}"} for i in range(20)]
    # run 2: 10 re-crawled duplicates of run 1 + 10 new + 2 in-run dups
    run2 = ([{"doc_id": 100 + i, "text": f"document number {i}"}
             for i in range(10)]
            + [{"doc_id": 200 + i, "text": f"fresh document {i}"}
               for i in range(10)]
            + [{"doc_id": 300, "text": "fresh document 0"},
               {"doc_id": 301, "text": "fresh document 1"}])
    return run1, run2


def _run_both(tmp_path, corpus):
    from credit_ocr_backend_ray.stages.incremental import (
        incremental_dedup_run)

    run1, run2 = corpus
    idx = str(tmp_path / "index")
    out1 = incremental_dedup_run(_hashed_ds(run1), idx, "001").to_pandas()
    out2 = incremental_dedup_run(_hashed_ds(run2), idx, "002").to_pandas()
    return out1, out2


def test_incremental_dedup_broadcast_path(ray_session, tmp_path, corpus):
    out1, out2 = _run_both(tmp_path, corpus)
    assert len(out1) == 20
    # run 2 keeps only the 10 fresh texts, each at its smallest doc_id
    assert sorted(out2["doc_id"]) == list(range(200, 210))


def test_incremental_dedup_join_path(ray_session, tmp_path, corpus,
                                     monkeypatch):
    """Force the LEFT ANTI shuffle-join path (index 'too big' to
    broadcast) and require identical survivors."""
    from credit_ocr_backend_ray.stages import incremental

    monkeypatch.setattr(incremental, "_BROADCAST_INDEX_BYTES", 0)
    out1, out2 = _run_both(tmp_path, corpus)
    assert len(out1) == 20
    assert sorted(out2["doc_id"]) == list(range(200, 210))


def test_index_append_idempotent(ray_session, tmp_path, corpus):
    from credit_ocr_backend_ray.stages.incremental import (
        hash_index_append, index_files)

    run1, _ = corpus
    idx = str(tmp_path / "index")
    n1 = hash_index_append(_hashed_ds(run1), idx, "001")
    n2 = hash_index_append(_hashed_ds(run1), idx, "001")  # resume/replay
    assert n1 == n2 == 20
    import pyarrow.parquet as pq
    total = sum(pq.read_metadata(f).num_rows for f in index_files(idx))
    assert total == 20  # re-running a run id does not double the index


def test_minhash_index_write_query(ray_session, tmp_path):
    """Persisted LSH index: plant near-dups of indexed docs in the new
    increment; the query must recover them reading only probed buckets,
    and report exact jaccard values."""
    import ray.data as rd
    from credit_ocr_backend_ray.functions.hashing import jaccard
    from credit_ocr_backend_ray.stages.incremental import (
        minhash_index_write, minhash_index_query)

    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(400)]
    corpus = [{"doc_id": i,
               "text": " ".join(rng.choice(vocab, 60))}
              for i in range(200)]
    idx_dir = str(tmp_path / "lshidx")
    n = minhash_index_write(rd.from_items(corpus).repartition(8), idx_dir)
    assert n == 200

    # new increment: 10 unrelated docs + 5 near-dups of indexed docs
    new_rows = [{"doc_id": 1000 + i,
                 "text": " ".join(rng.choice(vocab, 60))}
                for i in range(10)]
    for i in range(5):
        base = corpus[i]["text"].split()
        new_rows.append({"doc_id": 2000 + i,
                         "text": " ".join(base[:-2])})  # drop 2 words
    pairs = minhash_index_query(rd.from_items(new_rows).repartition(4),
                                idx_dir, threshold=0.8)
    got = set(zip(pairs["new_id"], pairs["idx_id"]))
    assert {(2000 + i, i) for i in range(5)} <= got
    # jaccard values are exact
    for r in pairs.itertuples():
        if (r.new_id, r.idx_id) in {(2000 + i, i) for i in range(5)}:
            exp = jaccard(new_rows[10 + r.new_id - 2000]["text"],
                          corpus[r.idx_id]["text"])
            assert r.jaccard == exp
    # no verified pair below threshold
    assert (pairs["jaccard"] >= 0.8).all()

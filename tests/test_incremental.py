"""Cross-run incremental dedup (stages/incremental.py): persisted hash
index, anti-join paths, append-only idempotence."""

import hashlib

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

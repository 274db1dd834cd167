"""Chunking/packing operators (stages/chunking.py): fixed-window
chunking, duplicate-passage removal, distributed-prefix-sum packing."""

import pandas as pd


def test_chunk_documents_windows_and_stride(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.stages.chunking import chunk_documents
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e", "x y", None],  # doc 3 emits nothing
    })
    out = chunk_documents(rd.from_pandas(docs).repartition(2),
                          window=3, stride=2) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    # doc 1: starts 0,2,4 -> "a b c", "c d e", "e" (trailing short window)
    assert out.loc[out["doc_id"] == 1, "chunk_text"].tolist() == \
        ["a b c", "c d e", "e"]
    assert out.loc[out["doc_id"] == 1, "n_tokens"].tolist() == [3, 3, 1]
    assert out.loc[out["doc_id"] == 1, "chunk_idx"].tolist() == [0, 1, 2]
    assert out.loc[out["doc_id"] == 2, "chunk_text"].tolist() == ["x y"]
    assert 3 not in set(out["doc_id"])


def test_chunk_dedup_keeps_first_occurrence(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.stages.chunking import chunk_dedup
    # window=2, non-overlapping: doc1 -> ["a b","c d"], doc2 -> ["a b"],
    # doc3 -> ["c d","a b"]; "a b" first at (1,0), "c d" first at (1,1)
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d", "a b", "c d a b"],
    })
    out = chunk_dedup(rd.from_pandas(docs).repartition(3), window=2) \
        .to_pandas().sort_values("chunk_text").reset_index(drop=True)
    assert out["chunk_text"].tolist() == ["a b", "c d"]
    assert out["doc_id"].tolist() == [1, 1]
    assert out["chunk_idx"].tolist() == [0, 1]


def test_chunk_dedup_partitioning_independent(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.stages.chunking import chunk_dedup
    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": ["dup dup" if i % 3 == 0 else f"u{i} v{i}"
                 for i in range(20)],
    })
    a = chunk_dedup(rd.from_pandas(docs).repartition(7), window=2) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    b = chunk_dedup(rd.from_pandas(docs).repartition(2), window=2) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    # the planted duplicate chunk survives exactly once, at doc 0
    assert (a["chunk_text"] == "dup dup").sum() == 1
    assert a.loc[a["chunk_text"] == "dup dup", "doc_id"].iloc[0] == 0


def test_pack_sequences_crosses_shards_and_bins(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.stages.chunking import pack_sequences
    # token counts: doc0=3, doc1=4, doc2=2, doc3=5 (doc4 empty, excluded)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a a a", "b b b b", "c c", "d d d d d", "   "],
    })
    # shard_width=2 forces the cross-shard offset path; budget=4
    out = pack_sequences(rd.from_pandas(docs).repartition(3), budget=4,
                         shard_width=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1, 2, 3]
    assert out["n_tokens"].tolist() == [3, 4, 2, 5]
    # cum_before: 0, 3, 7, 9 -> pack 0,0,1,2; offset 0,3,3,1
    assert out["pack_id"].tolist() == [0, 0, 1, 2]
    assert out["pack_offset"].tolist() == [0, 3, 3, 1]


def test_pack_sequences_partitioning_independent(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.stages.chunking import pack_sequences
    docs = pd.DataFrame({
        "doc_id": range(50),
        "text": [" ".join(["w"] * (1 + i % 7)) for i in range(50)],
    })
    a = pack_sequences(rd.from_pandas(docs).repartition(9), budget=16,
                       shard_width=8).to_pandas().sort_values("doc_id")
    b = pack_sequences(rd.from_pandas(docs).repartition(2), budget=16,
                       shard_width=8).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    # stream invariant: sorted by doc_id, (pack_id, offset) never go back
    stream = a["pack_id"].to_numpy() * 16 + a["pack_offset"].to_numpy()
    assert (stream[1:] > stream[:-1]).all()
    assert stream[0] == 0


def test_intra_doc_dedup_removes_repeats_in_order(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.stages.chunking import intra_doc_dedup
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        # window=2: doc1 chunks ["a b","c d","a b","e"] -> "a b c d e"
        "text": ["a b c d a b e", "x y", None],
    })
    out = intra_doc_dedup(rd.from_pandas(docs).repartition(2), window=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["clean_text"].tolist() == ["a b c d e", "x y"]
    assert out["n_chunks_removed"].tolist() == [1, 0]


def test_intra_doc_dedup_scope_is_per_document(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.stages.chunking import intra_doc_dedup
    # the same chunk in two DIFFERENT docs survives in both
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b"]})
    out = intra_doc_dedup(rd.from_pandas(docs), window=2).to_pandas()
    assert out["clean_text"].tolist() == ["a b", "a b"]
    assert out["n_chunks_removed"].tolist() == [0, 0]


def test_curate_pack_gates_and_packs(ray_session):
    import ray.data as rd

    from credit_ocr_backend_ray.pipelines.curation import curate_pack
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "source": ["good", "good", "good", "spam"],
        "text": [
            " ".join(f"w{i}" for i in range(30)),   # clean, 30 tokens
            "a b c",                                # too short -> dropped
            # 40 tokens, window=4 chunks all identical -> high dup frac
            " ".join(["x y z w"] * 10),
            " ".join(f"s{i}" for i in range(30)),   # bad source
        ],
    })
    # source means: good = (0 + 900000 + 0) // 3 = 300000, spam = 0.
    # Threshold 100000 drops every 'good' doc, keeps 'spam'.
    out = curate_pack(rd.from_pandas(docs).repartition(2), min_tokens=10,
                      max_dup_micro=500_000,
                      max_source_mean_dup_micro=100_000, window=4,
                      budget=16, shard_width=2).to_pandas()
    assert out["doc_id"].tolist() == [3]

    out2 = curate_pack(rd.from_pandas(docs).repartition(2), min_tokens=10,
                       max_dup_micro=500_000,
                       max_source_mean_dup_micro=400_000, window=4,
                       budget=16, shard_width=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc1 short, doc2 dup frac 900000 > 500000; doc0 and doc3 survive
    # (both source means <= 400000)
    assert out2["doc_id"].tolist() == [0, 3]
    assert out2["n_tokens"].tolist() == [30, 30]
    # packed stream: doc0 at (0,0); doc3 starts at token 30 -> pack 1
    assert out2["pack_id"].tolist() == [0, 1]
    assert out2["pack_offset"].tolist() == [0, 14]

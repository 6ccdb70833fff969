"""Checkpoint-restart index build: merged scoring == one-shot, resume skips
completed chunks, interruption loses at most one chunk."""

import numpy as np

from openintel_tpu.index.build import build_postings_index
from openintel_tpu.index.pipeline import build_index_checkpointed
from openintel_tpu.index.synthetic import synthetic_token_corpus
from openintel_tpu.ops import reference as ref
from openintel_tpu.ops.bm25 import encode_query


def test_merged_index_scores_identical_to_one_shot(tmp_path):
    docs = synthetic_token_corpus(300, vocab_size=150, seed=61)
    merged, dense = build_index_checkpointed(docs, tmp_path, chunk_docs=64)
    oneshot = build_postings_index(docs)
    assert dense is None
    assert merged.n_docs == oneshot.n_docs == 300
    np.testing.assert_allclose(merged.avgdl, oneshot.avgdl)
    # vocab id ASSIGNMENT may differ (first-seen order per chunk); scoring
    # must not: compare by token
    queries = ["t3 t17 t90", "t5", "t140 t2 t2"]
    for q in queries:
        sm = ref.bm25_scores(merged, encode_query(merged, q))
        so = ref.bm25_scores(oneshot, encode_query(oneshot, q))
        np.testing.assert_allclose(sm, so, rtol=1e-6, atol=1e-7)


def test_resume_skips_completed_chunks(tmp_path):
    docs = synthetic_token_corpus(200, vocab_size=100, seed=62)
    calls = []

    def counting_embedder(texts):
        calls.append(len(texts))
        rng = np.random.default_rng(len(texts))
        return rng.standard_normal((len(texts), 16)).astype(np.float32)

    logs = []
    p1, d1 = build_index_checkpointed(
        docs, tmp_path, chunk_docs=50, embedder=counting_embedder, log=logs.append
    )
    assert len(calls) == 4 and d1 is not None and d1.n_docs == 200
    # second run: all chunks exist, embedder never called again
    calls.clear()
    p2, d2 = build_index_checkpointed(
        docs, tmp_path, chunk_docs=50, embedder=counting_embedder
    )
    assert calls == []
    np.testing.assert_array_equal(p1.doc_ids, p2.doc_ids)
    np.testing.assert_allclose(d1.embeddings, d2.embeddings)


def test_partial_build_resumes_remaining(tmp_path):
    docs = synthetic_token_corpus(120, vocab_size=80, seed=63)
    # simulate an interrupted run: only the first chunk exists
    from openintel_tpu.index.pipeline import _build_chunk, _chunk_path

    chunk = _build_chunk(docs[:40])
    np.savez(
        _chunk_path(tmp_path, 0),
        **{k: v for k, v in chunk.items() if k != "tokens"},
        tokens=chunk["tokens"].astype(str),
    )
    import json

    (tmp_path / "meta.json").write_text(
        json.dumps({"n_docs": 120, "chunk_docs": 40})
    )
    logs = []
    merged, _ = build_index_checkpointed(
        docs, tmp_path, chunk_docs=40, log=logs.append
    )
    assert len(logs) == 2  # chunks 2 and 3 built; chunk 1 reused
    oneshot = build_postings_index(docs)
    q = encode_query(merged, "t1 t9 t33")
    np.testing.assert_allclose(
        ref.bm25_scores(merged, q),
        ref.bm25_scores(oneshot, encode_query(oneshot, "t1 t9 t33")),
        rtol=1e-6,
    )


def test_mismatched_checkpoint_dir_rejected(tmp_path):
    docs = synthetic_token_corpus(50, vocab_size=40, seed=64)
    build_index_checkpointed(docs, tmp_path, chunk_docs=25)
    import pytest

    with pytest.raises(AssertionError):
        build_index_checkpointed(docs + ["extra doc"], tmp_path, chunk_docs=25)


def test_producer_exception_surfaces_not_deadlocks(tmp_path, monkeypatch):
    """A chunk-build failure must raise in the caller (sentinel always
    enqueued), never hang the consumer on an empty queue."""
    from openintel_tpu.index import pipeline

    docs = synthetic_token_corpus(120, vocab_size=60, seed=63)

    def boom(texts):
        raise RuntimeError("tokeniser exploded")

    monkeypatch.setattr(pipeline, "_build_chunk", boom)
    import pytest

    with pytest.raises(RuntimeError, match="tokeniser exploded"):
        build_index_checkpointed(docs, tmp_path, chunk_docs=50)


def test_consumer_exception_unblocks_producer(tmp_path):
    """An embedder failure must raise AND let the producer thread exit (it
    would otherwise stay blocked on the size-1 queue)."""
    import threading

    import pytest

    docs = synthetic_token_corpus(300, vocab_size=100, seed=64)
    before = threading.active_count()

    def bad_embedder(texts):
        raise ValueError("device OOM")

    with pytest.raises(ValueError, match="device OOM"):
        build_index_checkpointed(
            docs, tmp_path, chunk_docs=50, embedder=bad_embedder
        )
    # the worker joined (with margin for scheduling)
    import time

    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_embedder_resume_guards(tmp_path):
    """Resuming with a different embedder config must refuse loudly — a
    defaulted meta comparison would pass vacuously and silently mix chunks
    with and without embeddings (review finding)."""
    import json

    import numpy as np
    import pytest

    from openintel_tpu.index.pipeline import build_index_checkpointed

    texts = [f"alpha doc{i}" for i in range(30)]

    def embedder(ts):
        return np.ones((len(ts), 8), np.float32)

    embedder.dim = 8

    # built WITHOUT an embedder -> resume WITH one refuses
    d1 = tmp_path / "no_emb"
    build_index_checkpointed(texts, d1, chunk_docs=10)
    with pytest.raises(RuntimeError, match="embedder"):
        build_index_checkpointed(texts, d1, chunk_docs=10, embedder=embedder)

    # legacy meta.json without the embedder key: unverifiable -> refuse
    # when an embedder is requested, allow embedder-less resume
    d2 = tmp_path / "legacy"
    build_index_checkpointed(texts, d2, chunk_docs=10)
    meta = json.loads((d2 / "meta.json").read_text())
    del meta["embedder"]
    (d2 / "meta.json").write_text(json.dumps(meta))
    with pytest.raises(RuntimeError, match="predates embedder tracking"):
        build_index_checkpointed(texts, d2, chunk_docs=10, embedder=embedder)
    build_index_checkpointed(texts, d2, chunk_docs=10)  # no embedder: fine


def test_merge_rejects_mixed_embedding_chunks(tmp_path):
    """merge_chunks must not silently drop (or crash on) a mix of chunks
    with and without embeddings."""
    import numpy as np
    import pytest

    from openintel_tpu.index.pipeline import (
        _chunk_path,
        build_index_checkpointed,
        merge_chunks,
    )

    texts = [f"beta doc{i}" for i in range(30)]

    def embedder(ts):
        return np.ones((len(ts), 8), np.float32)

    embedder.dim = 8
    d = tmp_path / "mixed"
    build_index_checkpointed(texts, d, chunk_docs=10, embedder=embedder)
    # strip embeddings from chunk 1 (simulating a legacy/mixed dir)
    p = _chunk_path(d, 1)
    old = dict(np.load(p, allow_pickle=False))
    del old["embeddings"]
    np.savez(p, **old)
    with pytest.raises(RuntimeError, match="disagree on embeddings"):
        merge_chunks(d, 3)


def test_save_index_rejects_misaligned_docs_sidecar(tmp_path):
    """save_index must refuse a docs list whose length differs from the
    index's n_docs — a short/stale sidecar silently shifts every later
    snippet by one id on reload (advisor finding r3)."""
    import pytest

    from openintel_tpu.index.checkpoint import (
        load_dense,
        load_postings,
        save_index,
    )
    from openintel_tpu.index.schema import DenseIndex

    docs = ["alpha beta", "beta gamma", "gamma delta"]
    postings = build_postings_index(docs)
    rng = np.random.default_rng(0)
    dense = DenseIndex.from_embeddings(rng.normal(size=(3, 32)))
    with pytest.raises(ValueError, match="misaligned"):
        save_index(tmp_path / "idx", postings, dense, docs=docs[:2])
    # the aligned save still round-trips
    save_index(tmp_path / "idx", postings, dense, docs=docs)
    p2 = load_postings(tmp_path / "idx.postings.npz")
    d2 = load_dense(tmp_path / "idx.dense.npz")
    assert p2.n_docs == 3 and d2.n_docs == 3

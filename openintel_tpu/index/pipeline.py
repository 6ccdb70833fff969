"""Checkpoint-restart index build pipeline (map -> checkpoint -> reduce).

The reference is stateless by design; the rebuild's indexes are expensive to
recompute, so long builds must survive interruption (SURVEY.md §5 "standard
checkpoint-restart for long index builds"). Shape:

- MAP: the corpus streams in document chunks; each chunk is tokenised
  (C++ fast path when available), counted into a chunk-local CSR with a
  chunk-local vocabulary, optionally embedded, and written to
  ``ckpt_dir/chunk_{i:05d}.npz``. A restart skips every chunk already on
  disk — the unit of lost work is one chunk.
- REDUCE: chunk vocabularies union into the global one; per-term postings
  concatenate in chunk order (doc ids are globally ascending by
  construction); df sums; idf and impacts are computed at the end against
  corpus-wide stats (global avgdl), so the merged index scores IDENTICALLY
  to a one-shot build (asserted in tests).

Multi-host builds shard chunks across hosts and reduce df/len stats with the
psum collectives in openintel_tpu.parallel.sharded.global_bm25_stats.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

from openintel_tpu.index.build import bm25_idf, bm25_impact
from openintel_tpu.index.schema import BM25Config, DenseIndex, PostingsIndex
from openintel_tpu.ops.tokenizer import Vocab


def _chunk_path(ckpt_dir: Path, i: int) -> Path:
    return ckpt_dir / f"chunk_{i:05d}.npz"


def _build_chunk(texts: Sequence[str]) -> dict:
    """Chunk-local counts: local vocab + term-major (doc, tf) pairs.

    Delegates to build_postings_index (one implementation of the counting
    loop, C++ streaming builder when available); impacts/idf computed there
    are discarded — the reduce step recomputes them against global stats."""
    from openintel_tpu.index.build import build_postings_index

    idx = build_postings_index(texts)
    tokens = sorted(idx.vocab.token_to_id, key=idx.vocab.token_to_id.get)
    return {
        "term_offsets": idx.term_offsets,
        "doc_ids": idx.doc_ids,
        "tf": idx.tf,
        "doc_len": idx.doc_len,
        "tokens": np.array(tokens, dtype=object),
    }


def build_index_checkpointed(
    texts: Sequence[str],
    ckpt_dir: str | Path,
    *,
    chunk_docs: int = 10_000,
    config: BM25Config = BM25Config(),
    embedder: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
    log: Optional[Callable[[str], None]] = None,
) -> tuple[PostingsIndex, Optional[DenseIndex]]:
    """Chunked, resumable build; returns (postings, dense-or-None).

    Interrupt at any point and call again with the same ``ckpt_dir`` — only
    missing chunks are rebuilt."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    n_chunks = max(1, -(-len(texts) // chunk_docs))
    emb_id = (
        f"{type(embedder).__name__}:{getattr(embedder, 'dim', '?')}"
        if embedder is not None
        else "none"
    )
    meta_p = ckpt_dir / "meta.json"
    if meta_p.exists():
        meta = json.loads(meta_p.read_text())
        assert meta["n_docs"] == len(texts) and meta["chunk_docs"] == chunk_docs, (
            "checkpoint dir belongs to a different corpus/chunking"
        )
        # a resume with a different embedder would silently mix embedding
        # spaces across chunks — refuse. A legacy meta.json without the
        # key predates embedder tracking: its chunks' embedding state is
        # unverifiable, so only an embedder-less resume may proceed (a
        # defaulted comparison would pass vacuously and mix chunks with
        # and without embeddings).
        stored = meta.get("embedder")
        if stored is None and emb_id != "none":
            raise RuntimeError(
                f"checkpoint dir {ckpt_dir} predates embedder tracking; "
                f"cannot verify its chunks against embedder {emb_id!r} — "
                "rebuild into a fresh directory"
            )
        if stored is not None and stored != emb_id:
            raise RuntimeError(
                f"checkpoint dir was built with embedder {stored!r}, "
                f"resume requested {emb_id!r}"
            )
    else:
        meta_p.write_text(
            json.dumps(
                {
                    "n_docs": len(texts),
                    "chunk_docs": chunk_docs,
                    "embedder": emb_id,
                }
            )
        )

    # Producer/consumer: the host tokenises+counts chunk i+1 in a worker
    # thread while chunk i embeds (the device-bound stage with a neural
    # embedder) — host CSR assembly never starves the device (SURVEY.md §7
    # hard part (c)). One chunk of lookahead bounds memory.
    import queue
    import threading

    todo = [
        i for i in range(n_chunks) if not _chunk_path(ckpt_dir, i).exists()
    ]
    chunks_q: "queue.Queue" = queue.Queue(maxsize=1)
    stop = threading.Event()  # consumer died: let the producer bail out

    def _put(item) -> bool:
        """put() that gives up when the consumer has stopped draining —
        otherwise a consumer exception would leave the producer blocked on
        the size-1 queue forever."""
        while True:
            try:
                chunks_q.put(item, timeout=0.1)
                return True
            except queue.Full:
                if stop.is_set():
                    return False

    def producer():
        # The sentinel (None on success, ("error", exc) on failure) is ALWAYS
        # enqueued — a producer exception must surface in the consumer, never
        # deadlock it on an empty queue.
        try:
            for i in todo:
                if stop.is_set():
                    return
                lo, hi = i * chunk_docs, min(len(texts), (i + 1) * chunk_docs)
                if not _put((i, lo, hi, _build_chunk(texts[lo:hi]))):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            _put(("error", e))
        else:
            _put(None)

    worker = threading.Thread(target=producer, daemon=True)
    worker.start()
    try:
        while True:
            item = chunks_q.get()
            if item is None:
                break
            if item[0] == "error":
                raise item[1]
            i, lo, hi, chunk = item
            if embedder is not None:
                chunk["embeddings"] = np.asarray(embedder(texts[lo:hi]), np.float32)
            path = _chunk_path(ckpt_dir, i)
            tmp = path.with_suffix(".tmp.npz")
            np.savez(tmp, **{k: v for k, v in chunk.items() if k != "tokens"},
                     tokens=chunk["tokens"].astype(str))
            tmp.rename(path)  # atomic: a chunk file is always complete
            if log:
                log(f"chunk {i + 1}/{n_chunks} ({hi - lo} docs) checkpointed")
    finally:
        stop.set()
        worker.join(timeout=30)

    return merge_chunks(ckpt_dir, n_chunks, config=config)


def merge_chunks(
    ckpt_dir: str | Path,
    n_chunks: int,
    *,
    config: BM25Config = BM25Config(),
) -> tuple[PostingsIndex, Optional[DenseIndex]]:
    """REDUCE: chunk checkpoints -> one global index (== one-shot scoring)."""
    ckpt_dir = Path(ckpt_dir)
    chunks = [np.load(_chunk_path(ckpt_dir, i), allow_pickle=False)
              for i in range(n_chunks)]

    # global vocab: union in first-seen order (chunk order, then local id).
    # tokens[j] carries chunk-local id j+1 (id 0 is the shared pad slot).
    token_to_id: dict[str, int] = {}
    for c in chunks:
        for tok in c["tokens"]:
            t = str(tok)
            if t not in token_to_id:
                token_to_id[t] = len(token_to_id) + 1
    vocab = Vocab(token_to_id=token_to_id)
    v_size = vocab.size

    doc_len = np.concatenate([c["doc_len"] for c in chunks])
    n_docs = int(doc_len.shape[0])
    avgdl = float(doc_len.astype(np.float64).mean()) if n_docs else 0.0

    # per-term concat in chunk order; chunk doc ids offset to global
    per_term_ids: list[list[np.ndarray]] = [[] for _ in range(v_size)]
    per_term_tf: list[list[np.ndarray]] = [[] for _ in range(v_size)]
    doc_base = 0
    for c in chunks:
        offs = c["term_offsets"]
        toks = c["tokens"]
        for j in range(len(toks)):
            lid = j + 1  # chunk-local term id
            gid = token_to_id[str(toks[j])]
            lo, hi = int(offs[lid]), int(offs[lid + 1])
            if hi > lo:
                per_term_ids[gid].append(c["doc_ids"][lo:hi] + doc_base)
                per_term_tf[gid].append(c["tf"][lo:hi])
        doc_base += int(c["doc_len"].shape[0])

    term_offsets = np.zeros(v_size + 1, np.int64)
    df = np.zeros(v_size, np.int32)
    ids_all, tf_all = [], []
    for tid in range(v_size):
        n = sum(len(a) for a in per_term_ids[tid])
        df[tid] = n
        term_offsets[tid + 1] = term_offsets[tid] + n
        ids_all.extend(per_term_ids[tid])
        tf_all.extend(per_term_tf[tid])
    doc_ids = np.concatenate(ids_all) if ids_all else np.zeros(0, np.int32)
    tf = np.concatenate(tf_all) if tf_all else np.zeros(0, np.float32)

    postings = PostingsIndex(
        term_offsets=term_offsets,
        doc_ids=doc_ids.astype(np.int32),
        tf=tf,
        impact=bm25_impact(tf, doc_len[doc_ids.astype(np.int64)], avgdl, config)
        if len(tf)
        else np.zeros(0, np.float32),
        df=df,
        idf=bm25_idf(df, n_docs),
        doc_len=doc_len,
        avgdl=avgdl,
        n_docs=n_docs,
        vocab=vocab,
        config=config,
    )
    dense = None
    have_emb = [bool("embeddings" in c) for c in chunks]
    if any(have_emb) and not all(have_emb):
        missing = [i for i, h in enumerate(have_emb) if not h]
        raise RuntimeError(
            "checkpoint chunks disagree on embeddings (missing in chunks "
            f"{missing}) — mixed-resume artifact; rebuild those chunks"
        )
    if n_chunks and all(have_emb):
        emb = np.concatenate([c["embeddings"] for c in chunks])
        dense = DenseIndex.from_embeddings(emb)
    return postings, dense

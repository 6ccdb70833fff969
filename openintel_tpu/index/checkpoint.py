"""Index checkpointing: serialize built indexes to disk, mmap-reload.

The reference is stateless by design (no persistence in v1 — SURVEY.md §5),
but a TPU index build is long-running state worth checkpointing: postings,
impacts, stats and embeddings persist as one .npz (+ vocab sidecar json) and
reload with ``mmap_mode`` so a 10M-doc index maps lazily instead of copying.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from openintel_tpu.index.schema import BM25Config, DenseIndex, PostingsIndex
from openintel_tpu.ops.tokenizer import Vocab

FORMAT_VERSION = 1


def save_postings(index: PostingsIndex, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        term_offsets=index.term_offsets,
        doc_ids=index.doc_ids,
        tf=index.tf,
        impact=index.impact,
        df=index.df,
        idf=index.idf,
        doc_len=index.doc_len,
        meta=np.array(
            [FORMAT_VERSION, index.n_docs], dtype=np.int64
        ),
        stats=np.array([index.avgdl, index.config.k1, index.config.b], np.float64),
    )
    vocab_path = path.with_suffix(".vocab.json")
    vocab_path.write_text(json.dumps(index.vocab.token_to_id))


def load_postings(path: str | Path, *, mmap: bool = True) -> PostingsIndex:
    path = Path(path)
    data = np.load(path if path.suffix == ".npz" else path.with_suffix(".npz"),
                   mmap_mode="r" if mmap else None)
    version, n_docs = (int(x) for x in np.asarray(data["meta"]))
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported index format version {version}")
    avgdl, k1, b = (float(x) for x in np.asarray(data["stats"]))
    vocab = Vocab(
        token_to_id={
            k: int(v)
            for k, v in json.loads(
                Path(path).with_suffix(".vocab.json").read_text()
            ).items()
        }
    )
    return PostingsIndex(
        term_offsets=data["term_offsets"],
        doc_ids=data["doc_ids"],
        tf=data["tf"],
        impact=data["impact"],
        df=data["df"],
        idf=data["idf"],
        doc_len=data["doc_len"],
        avgdl=avgdl,
        n_docs=n_docs,
        vocab=vocab,
        config=BM25Config(k1=k1, b=b),
    )


def save_dense(index: DenseIndex, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    emb = index.embeddings
    # bfloat16 has no numpy dtype; store as raw uint16 with a flag.
    is_bf16 = emb.dtype.str not in ("<f4", "<f8", "<f2")
    np.savez(
        path,
        embeddings=np.asarray(emb).view(np.uint16) if is_bf16 else emb,
        meta=np.array([FORMAT_VERSION, index.n_docs, index.dim, int(is_bf16)], np.int64),
    )


def load_dense(path: str | Path, *, mmap: bool = True) -> DenseIndex:
    path = Path(path)
    data = np.load(path if path.suffix == ".npz" else path.with_suffix(".npz"),
                   mmap_mode="r" if mmap else None)
    version, n_docs, dim, is_bf16 = (int(x) for x in np.asarray(data["meta"]))
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported index format version {version}")
    emb = data["embeddings"]
    if is_bf16:
        import jax.numpy as jnp

        emb = np.asarray(emb).view(jnp.bfloat16.dtype)
    return DenseIndex(embeddings=emb, n_docs=n_docs, dim=dim)

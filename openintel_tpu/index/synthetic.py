"""Synthetic corpora for scale tests and benchmarks (BEIR-scale analogue).

Deterministic given a seed: Zipf-distributed token streams over a configurable
vocabulary plus unit-norm embeddings, with query generators that draw terms
from documents (so BM25 has signal) and embeddings near document vectors (so
dense recall is measurable).
"""

from __future__ import annotations

import numpy as np


def synthetic_token_corpus(
    n_docs: int,
    *,
    vocab_size: int = 30_000,
    mean_len: int = 24,
    seed: int = 0,
) -> list[str]:
    """Zipf-ish synthetic posts as whitespace-joined pseudo-tokens ("t123")."""
    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.poisson(mean_len, size=n_docs), 3, 4 * mean_len)
    # Zipf over vocab ranks (s ~ 1.1), truncated to vocab_size.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    docs = []
    for n in lengths:
        ids = rng.choice(vocab_size, size=int(n), p=probs)
        docs.append(" ".join(f"t{i}" for i in ids))
    return docs


def synthetic_queries_from_docs(
    docs: list[str], n_queries: int, *, terms_per_query: int = 4, seed: int = 1
) -> list[str]:
    """Queries sampled from document tokens so lexical retrieval has signal."""
    rng = np.random.default_rng(seed)
    queries = []
    doc_idx = rng.integers(0, len(docs), size=n_queries)
    for d in doc_idx:
        tokens = docs[int(d)].split()
        take = min(terms_per_query, len(tokens))
        queries.append(" ".join(rng.choice(tokens, size=take, replace=False)))
    return queries


def synthetic_embeddings(
    n_docs: int, dim: int = 384, *, seed: int = 2, dtype=np.float32
) -> np.ndarray:
    """Unit-norm random document embeddings."""
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n_docs, dim)).astype(np.float32)
    e /= np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    return e.astype(dtype)


def synthetic_query_embeddings(
    doc_emb: np.ndarray,
    n_queries: int,
    *,
    noise: float = 0.6,
    seed: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Query embeddings near random docs; returns (queries, target_doc_ids)."""
    rng = np.random.default_rng(seed)
    targets = rng.integers(0, doc_emb.shape[0], size=n_queries)
    q = doc_emb[targets].astype(np.float32) + noise * rng.standard_normal(
        (n_queries, doc_emb.shape[1])
    ).astype(np.float32)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return q, targets.astype(np.int32)

"""BM25 device scoring: host query-plan gather -> device scatter-add + top-k.

Split of labour (TPU-first, SURVEY.md §7):
- the HOST does the irregular pointer-chasing it is good at: per query term,
  slice the CSR postings (contiguous memcpy) and assemble a padded, static-
  shape "query plan" of (doc_id, weight) pairs where
  weight = idf(term) * qtf * impact  (impact = precomputed saturated tf);
- the DEVICE does fixed-shape math: a batched scatter-add into the dense
  per-shard score vector followed by top-k. Padded entries target a sentinel
  row (index n_docs) and are sliced away, so padding never biases scores.

Plan widths are bucketed to powers of two (min 512) so jit recompiles are
bounded. The tf/idf saturation is fused into the index at build time
(openintel_tpu/index/schema.py), so query time is gather-scale-scatter only.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openintel_tpu.index.schema import PostingsIndex
from openintel_tpu.ops.tokenizer import tokenize


@dataclass
class QueryPlan:
    """Static-shape batched postings for a query batch."""

    doc_ids: np.ndarray  # (B, P) int32; padding rows point at n_docs (sentinel)
    weights: np.ndarray  # (B, P) float32; padding weight 0
    n_docs: int


def _bucket(width: int, minimum: int = 512) -> int:
    p = minimum
    while p < width:
        p *= 2
    return p


def encode_query(index: PostingsIndex, text: str) -> list[int]:
    """Tokenise query text into term ids over the index vocabulary (unknown
    tokens drop out — they can never score)."""
    get = index.vocab.token_to_id.get
    return [tid for tok in tokenize(text) if (tid := get(tok, 0))]


def build_query_plan(
    index: PostingsIndex, queries_term_ids: Sequence[Sequence[int]]
) -> QueryPlan:
    """Assemble the padded (doc_id, weight) plan for a batch of queries."""
    rows_ids: list[np.ndarray] = []
    rows_w: list[np.ndarray] = []
    for terms in queries_term_ids:
        qtf: dict[int, int] = {}
        for t in terms:
            if t > 0:
                qtf[t] = qtf.get(t, 0) + 1
        parts_ids = []
        parts_w = []
        for t, count in qtf.items():
            ids, impacts = index.postings(int(t))
            parts_ids.append(ids)
            parts_w.append(impacts * (float(index.idf[t]) * count))
        if parts_ids:
            rows_ids.append(np.concatenate(parts_ids))
            rows_w.append(np.concatenate(parts_w).astype(np.float32))
        else:
            rows_ids.append(np.zeros(0, np.int32))
            rows_w.append(np.zeros(0, np.float32))

    width = _bucket(max((len(r) for r in rows_ids), default=1))
    b = len(rows_ids)
    doc_ids = np.full((b, width), index.n_docs, dtype=np.int32)  # sentinel row
    weights = np.zeros((b, width), dtype=np.float32)
    for i, (ids, w) in enumerate(zip(rows_ids, rows_w)):
        doc_ids[i, : len(ids)] = ids
        weights[i, : len(w)] = w
    return QueryPlan(doc_ids=doc_ids, weights=weights, n_docs=index.n_docs)


@partial(jax.jit, static_argnames=("n_docs",))
def bm25_scores_device(
    doc_ids: jax.Array,  # (B, P) int32 with sentinel n_docs padding
    weights: jax.Array,  # (B, P) f32
    n_docs: int,
) -> jax.Array:
    """Batched scatter-add into dense (B, N) scores (sentinel row sliced off)."""
    b = doc_ids.shape[0]
    scores = jnp.zeros((b, n_docs + 1), dtype=jnp.float32)
    scores = scores.at[
        jnp.arange(b, dtype=jnp.int32)[:, None], doc_ids
    ].add(weights, mode="drop")
    return scores[:, :n_docs]


@partial(jax.jit, static_argnames=("n_docs", "k"))
def bm25_topk_device(
    doc_ids: jax.Array, weights: jax.Array, n_docs: int, k: int
) -> tuple[jax.Array, jax.Array]:
    scores = bm25_scores_device(doc_ids, weights, n_docs)
    vals, ids = jax.lax.top_k(scores, min(k, n_docs))
    return vals, ids.astype(jnp.int32)


def bm25_topk(
    index: PostingsIndex, queries_term_ids: Sequence[Sequence[int]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Host-facing batched BM25 top-k (plan on host, score on device)."""
    plan = build_query_plan(index, queries_term_ids)
    vals, ids = bm25_topk_device(plan.doc_ids, plan.weights, plan.n_docs, k)
    return np.asarray(vals), np.asarray(ids)

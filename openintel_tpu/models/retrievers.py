"""Retriever model families: BM25, dense cosine, and the flagship hybrid.

These are the host-facing handles around the device ops: they own the built
index (HBM-resident arrays), encode queries, and run the jitted score->top-k
programs. The hybrid retriever is the framework's flagship model — BM25 top-c
and dense top-c fused by RRF in one device program per arm
(BASELINE.json north star; SURVEY.md §7 step 5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openintel_tpu.index.schema import BM25Config, DenseIndex, PostingsIndex
from openintel_tpu.index.build import build_postings_index
from openintel_tpu.models.embedding import HashingEmbedder
from openintel_tpu.ops.bm25 import bm25_topk_device, build_query_plan, encode_query
from openintel_tpu.ops.dense import dense_topk_xla
from openintel_tpu.ops.fusion import RRF_K, rrf_fuse_device


@dataclass
class SearchResult:
    """Ranked results for a batch of queries; -1 ids pad short rankings."""

    ids: np.ndarray  # (B, k) int32
    scores: np.ndarray  # (B, k) float32


AUTO_PRUNE_DOCS = 100_000  # corpora above this default to pruned plans


def auto_prune_m(n_docs: int, k: int) -> Optional[int]:
    """Default impact-pruning budget for serving: above AUTO_PRUNE_DOCS a
    stop-wordy term would otherwise blow the plan to its full df (device
    cost is linear in plan width). M = max(128, k) keeps pruned top-k exact
    (the argument needs k <= min(M, multi_budget); build_query_plan's
    multi_budget default is 256, raised alongside k below)."""
    return max(128, k) if n_docs > AUTO_PRUNE_DOCS else None


class BM25Retriever:
    """Lexical retrieval over the CSR postings index."""

    def __init__(self, index: PostingsIndex):
        self.index = index

    @classmethod
    def build(cls, texts: Sequence[str], *, config: BM25Config = BM25Config()):
        return cls(build_postings_index(texts, config=config))

    def search(self, queries: Sequence[str], k: int = 10) -> SearchResult:
        term_ids = [encode_query(self.index, q) for q in queries]
        plan = build_query_plan(
            self.index,
            term_ids,
            max_postings_per_term=auto_prune_m(self.index.n_docs, k),
            multi_budget=max(256, k),
        )
        vals, ids = bm25_topk_device(
            plan.doc_ids,
            plan.weights,
            plan.n_docs,
            min(k, self.index.n_docs),
            presorted=plan.presorted,
            max_run=plan.max_terms,
        )
        return SearchResult(ids=np.asarray(ids), scores=np.asarray(vals))


class DenseRetriever:
    """Brute-force cosine retrieval over the dense index (MXU matmul +
    fused top-k; Pallas kernel on TPU, blocked XLA elsewhere)."""

    def __init__(
        self,
        index: DenseIndex,
        embedder: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
        *,
        use_pallas: Optional[bool] = None,
        kernel: Optional[str] = None,  # "xla" | "pallas" | "fast" | "int8" | None=auto
    ):
        self.index = index
        self.embedder = embedder or HashingEmbedder(dim=index.dim)
        if kernel is None:
            if use_pallas is None:
                use_pallas = jax.default_backend() not in ("cpu",)
            kernel = "pallas" if use_pallas else "xla"
        assert kernel in ("xla", "pallas", "fast", "int8"), kernel
        self.kernel = kernel
        self.use_pallas = kernel != "xla"
        # Pallas kernels run in interpreter mode on CPU hosts (hermetic tests)
        self._interpret = jax.default_backend() in ("cpu",)
        emb = jnp.asarray(index.embeddings)
        # The fast kernels stream the transposed (D, N) layout (MXU-native
        # stationary operand), block-padded so the hot path never copies the
        # corpus; transpose + pad once at load. The int8 kernel additionally
        # keeps the full-precision rows for the exact-rescore second stage.
        if kernel == "fast":
            from openintel_tpu.ops.pallas.dense_topk import pad_corpus_t

            self._emb_device = jax.device_put(
                pad_corpus_t(emb.T, self._fast_block_c())
            )
        elif kernel == "int8":
            from openintel_tpu.ops.pallas.dense_topk import (
                pad_corpus_t_i8,
                quantize_int8,
            )

            self._emb_device = jax.device_put(
                pad_corpus_t_i8(jnp.asarray(quantize_int8(emb).T))
            )
            self._rescore_emb = jax.device_put(emb)
        else:
            self._emb_device = jax.device_put(emb)

    @classmethod
    def build(
        cls,
        texts: Sequence[str],
        *,
        embedder: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
        dim: int = 384,
        dtype=np.float32,
    ):
        embedder = embedder or HashingEmbedder(dim=dim)
        emb = embedder(list(texts))
        return cls(DenseIndex.from_embeddings(emb, dtype=dtype), embedder)

    def _fast_block_c(self, k: int = 128) -> int:
        # turbo-style kernel: the candidate pool is 128 slots per 16,384-doc
        # super regardless of block_c (which is just the grid-step width);
        # 8192 is the measured sweet spot and divides the super
        del k
        return 8192

    def _topk(self, q: jax.Array, k: int):
        k = min(k, self.index.n_docs)
        if self.kernel == "int8":
            from openintel_tpu.ops.pallas.dense_topk import (
                dense_topk_fast_i8,
                exact_rescore,
                quantize_int8,
            )

            c = min(max(2 * k, 32), self.index.n_docs)
            q8 = jnp.asarray(quantize_int8(np.asarray(q, np.float32)))
            _, cids = dense_topk_fast_i8(
                self._emb_device, q8, k=c, n_docs=self.index.n_docs,
                interpret=self._interpret,
            )
            return exact_rescore(self._rescore_emb, q, cids, k)
        if self.kernel == "fast":
            from openintel_tpu.ops.pallas.dense_topk import dense_topk_fast

            return dense_topk_fast(
                self._emb_device,
                q,
                k=k,
                block_c=self._fast_block_c(),
                n_docs=self.index.n_docs,
            )
        if self.kernel == "pallas":
            from openintel_tpu.ops.pallas.dense_topk import dense_topk_pallas

            return dense_topk_pallas(self._emb_device, q, k=k)
        return dense_topk_xla(self._emb_device, q, k)

    def search_embeddings(self, query_emb: np.ndarray, k: int = 10) -> SearchResult:
        dtype = (
            self._rescore_emb.dtype
            if self.kernel == "int8"
            else self._emb_device.dtype
        )
        q = jnp.asarray(query_emb, dtype)
        vals, ids = self._topk(q, k)
        return SearchResult(ids=np.asarray(ids), scores=np.asarray(vals))

    def search(self, queries: Sequence[str], k: int = 10) -> SearchResult:
        return self.search_embeddings(self.embedder(list(queries)), k)


class HybridRetriever:
    """Flagship: BM25 + dense cosine fused with reciprocal-rank fusion."""

    def __init__(
        self,
        postings: PostingsIndex,
        dense: DenseIndex,
        embedder: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
        *,
        rrf_k: float = RRF_K,
        use_pallas: Optional[bool] = None,
    ):
        self.bm25 = BM25Retriever(postings)
        self.dense = DenseRetriever(dense, embedder, use_pallas=use_pallas)
        self.rrf_k = rrf_k

    @classmethod
    def build(
        cls,
        texts: Sequence[str],
        *,
        embedder: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
        config: BM25Config = BM25Config(),
        dim: int = 384,
        dtype=np.float32,
        rrf_k: float = RRF_K,
    ):
        embedder = embedder or HashingEmbedder(dim=dim)
        postings = build_postings_index(texts, config=config)
        dense = DenseIndex.from_embeddings(embedder(list(texts)), dtype=dtype)
        return cls(postings, dense, embedder, rrf_k=rrf_k)

    @property
    def n_docs(self) -> int:
        return self.bm25.index.n_docs

    def search(
        self,
        queries: Sequence[str],
        k: int = 10,
        *,
        query_embeddings: Optional[np.ndarray] = None,
        candidates_per_arm: Optional[int] = None,
    ) -> SearchResult:
        c = min(candidates_per_arm or k, self.n_docs)
        k = min(k, self.n_docs)
        lex = self.bm25.search(queries, k=c)
        if query_embeddings is None:
            query_embeddings = self.dense.embedder(list(queries))
        dn = self.dense.search_embeddings(query_embeddings, k=c)
        vals, ids = rrf_fuse_device(
            jnp.asarray(lex.ids), jnp.asarray(dn.ids), k, self.rrf_k
        )
        return SearchResult(ids=np.asarray(ids), scores=np.asarray(vals))

"""Dense cosine retrieval: blocked query x corpus matmul with running top-k.

Two device paths:
- :func:`dense_topk_xla` — pure-XLA ``lax.scan`` over corpus blocks with a
  running top-k carry. Never materialises the full (B, N) score matrix, so HBM
  traffic is one corpus read per query batch. This is the portable baseline
  and the oracle for the Pallas kernel.
- :mod:`openintel_tpu.ops.pallas.dense_topk` — the fused Pallas kernel
  (MXU matmul + on-chip threshold-gated top-k merge).

Tie-breaking matches the NumPy reference (descending score, ascending doc id):
``lax.top_k`` prefers the lower index on equal values, carries are ordered
before the current block, and blocks are scanned in ascending doc order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Host float, NOT jnp.float32(...): a module-level device scalar would
# initialize jax's backend at import time (measured: importing the CLI
# dialed the remote-TPU tunnel before argparse even ran, and hung when
# the tunnel was down). Library import must never touch a backend.
NEG_INF = float(-jnp.inf)


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


@partial(jax.jit, static_argnames=("k", "block_size", "precision"))
def dense_topk_xla(
    doc_emb: jax.Array,  # (N, D) unit-norm rows (f32 or bf16)
    queries: jax.Array,  # (B, D) unit-norm rows
    k: int,
    block_size: int = 4096,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """Blocked brute-force cosine top-k. Returns (vals (B,k), ids (B,k) int32)."""
    n_docs, dim = doc_emb.shape
    b = queries.shape[0]
    k = min(k, n_docs)

    n_pad = (-n_docs) % block_size
    if n_pad:
        doc_emb = jnp.concatenate(
            [doc_emb, jnp.zeros((n_pad, dim), doc_emb.dtype)], axis=0
        )
    n_blocks = doc_emb.shape[0] // block_size
    blocks = doc_emb.reshape(n_blocks, block_size, dim)
    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * block_size

    init = (
        jnp.full((b, k), NEG_INF, dtype=jnp.float32),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )
    local_ids = jnp.arange(block_size, dtype=jnp.int32)

    def body(carry, xs):
        vals, ids = carry
        emb_block, start = xs
        scores = jax.lax.dot_general(
            queries,
            emb_block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (B, block)
        gids = start + local_ids
        scores = jnp.where(gids[None, :] < n_docs, scores, NEG_INF)
        ext_vals = jnp.concatenate([vals, scores], axis=1)
        ext_ids = jnp.concatenate(
            [ids, jnp.broadcast_to(gids[None, :], (b, block_size))], axis=1
        )
        new_vals, sel = jax.lax.top_k(ext_vals, k)
        new_ids = jnp.take_along_axis(ext_ids, sel, axis=1)
        return (new_vals, new_ids), None

    (vals, ids), _ = jax.lax.scan(body, init, (blocks, block_starts))
    return vals, ids


@partial(jax.jit, static_argnames=("k", "block_size", "precision"))
def dense_topk_xla_masked(
    doc_emb: jax.Array,  # (N, D) unit-norm rows (f32 or bf16)
    queries: jax.Array,  # (B, D) unit-norm rows
    doc_mask: jax.Array,  # (N,) bool; False docs never rank
    k: int,
    block_size: int = 4096,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """Masked brute-force cosine top-k: exact filtered retrieval at any
    selectivity (the starved-query fallback of the filtered hybrid —
    docs/specs/filtered-search.md). Returns (vals (B,k), ids (B,k)) padded
    (0.0, -1) when fewer than k docs survive the mask."""
    n_docs, dim = doc_emb.shape
    b = queries.shape[0]
    k = min(k, n_docs)

    n_pad = (-n_docs) % block_size
    if n_pad:
        doc_emb = jnp.concatenate(
            [doc_emb, jnp.zeros((n_pad, dim), doc_emb.dtype)], axis=0
        )
    mask = jnp.pad(doc_mask.astype(bool), (0, n_pad))
    n_blocks = doc_emb.shape[0] // block_size
    blocks = doc_emb.reshape(n_blocks, block_size, dim)
    mask_blocks = mask.reshape(n_blocks, block_size)
    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * block_size

    init = (
        jnp.full((b, k), NEG_INF, dtype=jnp.float32),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )
    local_ids = jnp.arange(block_size, dtype=jnp.int32)

    def body(carry, xs):
        vals, ids = carry
        emb_block, mask_block, start = xs
        scores = jax.lax.dot_general(
            queries,
            emb_block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (B, block)
        gids = start + local_ids
        ok = mask_block[None, :] & (gids[None, :] < n_docs)
        scores = jnp.where(ok, scores, NEG_INF)
        ext_vals = jnp.concatenate([vals, scores], axis=1)
        ext_ids = jnp.concatenate(
            [ids, jnp.broadcast_to(gids[None, :], (b, block_size))], axis=1
        )
        new_vals, sel = jax.lax.top_k(ext_vals, k)
        new_ids = jnp.take_along_axis(ext_ids, sel, axis=1)
        return (new_vals, new_ids), None

    (vals, ids), _ = jax.lax.scan(
        body, init, (blocks, mask_blocks, block_starts)
    )
    pad = vals == NEG_INF
    return jnp.where(pad, 0.0, vals), jnp.where(pad, -1, ids)


@partial(jax.jit, static_argnames=("k", "n_docs", "block_size", "precision"))
def dense_topk_masked_t(
    doc_emb_t: jax.Array,  # (D, Np) transposed block-padded corpus
    queries: jax.Array,  # (B, D) unit-norm rows
    doc_mask: jax.Array,  # (n_docs,) bool
    k: int,
    *,
    n_docs: int,
    block_size: int = 8192,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """:func:`dense_topk_xla_masked` over the TRANSPOSED (D, Np) layout the
    fast kernels stream — the masked fallback when only that copy of the
    corpus is resident (kernel="fast"). Same (0.0, -1) padding contract."""
    dim, n_padded = doc_emb_t.shape
    b = queries.shape[0]
    k = min(k, n_docs)
    c_pad = (-n_padded) % block_size
    if c_pad:
        doc_emb_t = jnp.concatenate(
            [doc_emb_t, jnp.zeros((dim, c_pad), doc_emb_t.dtype)], axis=1
        )
    mask = jnp.pad(
        doc_mask.astype(bool), (0, doc_emb_t.shape[1] - n_docs)
    )
    n_blocks = doc_emb_t.shape[1] // block_size
    blocks = doc_emb_t.reshape(dim, n_blocks, block_size).transpose(1, 0, 2)
    mask_blocks = mask.reshape(n_blocks, block_size)
    block_starts = jnp.arange(n_blocks, dtype=jnp.int32) * block_size

    init = (
        jnp.full((b, k), NEG_INF, dtype=jnp.float32),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )
    local_ids = jnp.arange(block_size, dtype=jnp.int32)

    def body(carry, xs):
        vals, ids = carry
        emb_block, mask_block, start = xs  # emb_block (D, block)
        scores = jax.lax.dot_general(
            queries,
            emb_block,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (B, block)
        gids = start + local_ids
        ok = mask_block[None, :] & (gids[None, :] < n_docs)
        scores = jnp.where(ok, scores, NEG_INF)
        ext_vals = jnp.concatenate([vals, scores], axis=1)
        ext_ids = jnp.concatenate(
            [ids, jnp.broadcast_to(gids[None, :], (b, block_size))], axis=1
        )
        new_vals, sel = jax.lax.top_k(ext_vals, k)
        new_ids = jnp.take_along_axis(ext_ids, sel, axis=1)
        return (new_vals, new_ids), None

    (vals, ids), _ = jax.lax.scan(
        body, init, (blocks, mask_blocks, block_starts)
    )
    pad = vals == NEG_INF
    return jnp.where(pad, 0.0, vals), jnp.where(pad, -1, ids)


@partial(jax.jit, static_argnames=("k", "precision"))
def dense_topk_flat(
    doc_emb: jax.Array,
    queries: jax.Array,
    k: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """Unblocked variant: materialises (B, N) scores. Only for small corpora
    and as a cross-check oracle."""
    scores = jax.lax.dot_general(
        queries,
        doc_emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    vals, ids = jax.lax.top_k(scores, min(k, doc_emb.shape[0]))
    return vals, ids.astype(jnp.int32)

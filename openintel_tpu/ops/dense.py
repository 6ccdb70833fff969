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

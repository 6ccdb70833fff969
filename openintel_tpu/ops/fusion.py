"""Reciprocal-rank fusion on device.

Fuses ranked id lists from the lexical and dense arms into one ranking:
fused(d) = sum over lists with d at 1-based rank r of 1/(rrf_k + r).

Device formulation (all static shapes, one fused program):
- candidates = concat of the input id lists (B, C);
- per-list rank contributions via an equality matmul against the reciprocal
  rank vector (C x K comparisons — tiny);
- duplicates (same doc in several lists) keep their first occurrence, later
  occurrences are masked to -inf;
- final order via ``lax.sort`` with two keys (-fused, doc_id) — deterministic
  ties by ascending doc id, exactly the NumPy reference semantics
  (openintel_tpu/ops/reference.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

RRF_K = 60.0
# Host float, NOT jnp.float32(...): a module-level device scalar would
# initialize jax's backend at import time (measured: importing the CLI
# dialed the remote-TPU tunnel before argparse even ran, and hung when
# the tunnel was down). Library import must never touch a backend.
NEG_INF = float(-jnp.inf)


@partial(jax.jit, static_argnames=("c",))
def mask_compact_ranked(
    ids: jax.Array,  # (B, C) int32 ranked ids, best first; -1 = padding
    keep: jax.Array,  # (B, C) bool; False entries are filtered out
    c: int,
) -> tuple[jax.Array, jax.Array]:
    """Stable-compact the surviving entries of ranked id lists.

    Returns ((B, c) ids — survivors in their original rank order, -1
    padded; (B,) int32 survivor counts). Filtering cannot reorder
    survivors, so the compacted prefix of a filtered ranking IS the
    ranking of the filtered corpus restricted to this candidate pool —
    the exactness basis of oversample-then-compact filtered retrieval
    (docs/specs/filtered-search.md): when survivors >= c, the first c
    entries are exactly the filtered top-c."""
    cw = ids.shape[1]
    pos = jnp.arange(cw, dtype=jnp.int32)[None, :]
    key = jnp.where(keep, pos, cw + pos)  # survivors first, stable
    _, compacted = jax.lax.sort(
        (key, jnp.where(keep, ids, -1)), num_keys=1, dimension=1
    )
    surv = jnp.sum(keep.astype(jnp.int32), axis=1)
    if cw < c:
        compacted = jnp.pad(
            compacted, ((0, 0), (0, c - cw)), constant_values=-1
        )
    return compacted[:, :c], surv


@partial(jax.jit, static_argnames=("c",))
def mask_compact_ranked_vals(
    ids: jax.Array,  # (B, C) int32 ranked ids, best first; -1 = padding
    vals: jax.Array,  # (B, C) scores aligned with ids
    keep: jax.Array,  # (B, C) bool; False entries are filtered out
    c: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`mask_compact_ranked` carrying the scores through the compact
    (the sharded filtered program merges per-shard survivor lists by score,
    so the compacted prefix must keep (val, id) pairs together). Returns
    ((B, c) vals — -inf padded, (B, c) ids — -1 padded, (B,) survivors)."""
    cw = ids.shape[1]
    pos = jnp.arange(cw, dtype=jnp.int32)[None, :]
    key = jnp.where(keep, pos, cw + pos)  # survivors first, stable
    _, cvals, cids = jax.lax.sort(
        (
            key,
            jnp.where(keep, vals.astype(jnp.float32), NEG_INF),
            jnp.where(keep, ids, -1),
        ),
        num_keys=1,
        dimension=1,
    )
    surv = jnp.sum(keep.astype(jnp.int32), axis=1)
    if cw < c:
        cvals = jnp.pad(cvals, ((0, 0), (0, c - cw)), constant_values=NEG_INF)
        cids = jnp.pad(cids, ((0, 0), (0, c - cw)), constant_values=-1)
    return cvals[:, :c], cids[:, :c], surv


@partial(jax.jit, static_argnames=("k", "rrf_k"))
def rrf_fuse_device(
    ids_a: jax.Array,  # (B, Ka) int32 ranked ids (rank 1 first); -1 = padding
    ids_b: jax.Array,  # (B, Kb) int32
    k: int,
    rrf_k: float = RRF_K,
) -> tuple[jax.Array, jax.Array]:
    """Fuse two ranked lists; returns (fused_vals (B,k), ids (B,k), -1 padded)."""
    cand = jnp.concatenate([ids_a, ids_b], axis=1)  # (B, C)
    b, c = cand.shape

    def contribution(lst: jax.Array) -> jax.Array:
        klist = lst.shape[1]
        recip = 1.0 / (rrf_k + jnp.arange(1, klist + 1, dtype=jnp.float32))
        match = (cand[:, :, None] == lst[:, None, :]) & (lst[:, None, :] >= 0)
        return jnp.sum(match.astype(jnp.float32) * recip[None, None, :], axis=2)

    fused = contribution(ids_a) + contribution(ids_b)  # (B, C)

    # Mask padding and duplicate candidates (keep the first occurrence).
    col = jnp.arange(c, dtype=jnp.int32)
    earlier = col[None, :, None] > col[None, None, :]  # cand i dupes cand j<i
    dup = jnp.any((cand[:, :, None] == cand[:, None, :]) & earlier, axis=2)
    valid = (cand >= 0) & ~dup
    fused = jnp.where(valid, fused, NEG_INF)

    # Deterministic sort: primary key -fused, secondary key doc id (ascending).
    neg, ids_sorted = jax.lax.sort((-fused, cand), num_keys=2, dimension=1)
    fused_sorted = -neg
    if c < k:  # fewer candidates than requested: pad columns to the
        # reference's (B, k) contract instead of returning a short array
        # (a short array crashes run_prepared's reshape downstream)
        fused_sorted = jnp.pad(
            fused_sorted, ((0, 0), (0, k - c)), constant_values=-jnp.inf
        )
        ids_sorted = jnp.pad(
            ids_sorted, ((0, 0), (0, k - c)), constant_values=-1
        )
    vals = fused_sorted[:, :k]
    ids = ids_sorted[:, :k]
    invalid = vals == NEG_INF
    return jnp.where(invalid, 0.0, vals), jnp.where(invalid, -1, ids)

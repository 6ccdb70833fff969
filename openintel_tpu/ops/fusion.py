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

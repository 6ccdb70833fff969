"""On-chip A/B: dense-arm cost vs query sub-batch size (256 / 512 / 1024)
and candidate block width, at bench scale.

Motivation: at b=256 the int8 turbo candidate pass is roughly BALANCED
between its corpus stream (0.49 GB -> ~0.60 ms at v5e's 819 GB/s) and its
MXU volume (256x384x1.25M int8 MACs -> ~0.62 ms at 394 TOPS). If the
measured pass is stream-bound in a given ambient window (shared-HBM
tenants), doubling the queries amortised per stream halves the per-query
stream share: the b=512 program would serve the SAME offered load (the
bench scans 32k queries either way) at up to ~25% lower per-query cost in
the balanced case, and more when stream-bound. The cost is wave latency
(one sub-batch's device time doubles) and a 2x larger per-wave result
slab — both irrelevant at bench offered loads, stated for serving in
docs/operations.md.

Timing methodology = bench.py's (single jitted lax.scan over all
sub-batches, scalar readback, best-of-reps) so tunnel RTT amortises
identically across variants and the comparison is within-window.

Usage: python scripts/bench_batch_ab.py [N_DOCS] [TOTAL_Q]
Env: AB_REPS (default 5).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import functools
import os
import sys
import time

import numpy as np


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_250_000
    total_q = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    reps = int(os.environ.get("AB_REPS", "5"))
    dim = 384
    k = 10

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i8,
        exact_rescore,
        pad_corpus_t_i8,
        quantize_int8,
    )

    print(f"backend: {jax.default_backend()}; devices: {jax.devices()}", flush=True)
    interpret = jax.default_backend() != "tpu"

    rng = np.random.default_rng(1)
    t0 = time.time()
    emb = rng.standard_normal((n_docs, dim), dtype=np.float32)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    targets = rng.integers(0, n_docs, size=total_q)
    q = emb[targets] + 0.6 * rng.standard_normal((total_q, dim)).astype(
        np.float32
    )
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    print(f"corpus {n_docs}x{dim} + {total_q} queries ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    emb_t8 = jax.device_put(jnp.asarray(quantize_int8(emb).T))
    emb_t8 = jax.block_until_ready(pad_corpus_t_i8(emb_t8))
    rescore_rows = jax.device_put(jnp.asarray(emb))
    q8_flat = jax.device_put(jnp.asarray(quantize_int8(q)))
    qf_flat = jax.device_put(jnp.asarray(q))
    jax.block_until_ready((rescore_rows, q8_flat, qf_flat))
    print(f"device arrays staged ({time.time()-t0:.1f}s)", flush=True)

    # rescore_op as an explicit jit argument (closure capture turns the
    # 1.92 GB corpus into an HLO literal — the int4 A/B's recorded trap)
    @functools.partial(jax.jit, static_argnames=("bc", "full", "c"))
    def run(emb_op, rescore_op, q8b, qfb, bc, full, c):
        def body(acc, xs):
            q8, qf = xs
            _, cids = dense_topk_fast_i8(
                emb_op, q8, k=c, block_c=bc, n_docs=n_docs,
                interpret=interpret,
            )
            if full:
                _, ids = exact_rescore(rescore_op, qf, cids, k)
            else:
                ids = cids
            return acc + jnp.sum(ids), 0

        acc, _ = jax.lax.scan(body, jnp.int32(0), (q8b, qfb))
        return acc

    def timeit(batch, bc, full, c=32):
        nb = total_q // batch
        q8b = q8_flat.reshape(nb, batch, dim)
        qfb = qf_flat.reshape(nb, batch, dim)
        acc = run(emb_t8, rescore_rows, q8b, qfb, bc, full, c)
        _ = int(acc)  # compile + warm
        best = float("inf")
        for _ in range(reps):
            s = time.time()
            _ = int(run(emb_t8, rescore_rows, q8b, qfb, bc, full, c))
            best = min(best, time.time() - s)
        per_q_us = best / total_q * 1e6
        stage = "dense-arm" if full else "cand-only"
        print(
            f"b={batch:<5} bc={bc:<6} {stage:<9} c={c:<3} "
            f"{best/nb*1e3:8.3f} ms/sub-batch  {per_q_us:7.3f} us/q  "
            f"({total_q/best:>10,.0f} QPS)",
            flush=True,
        )
        return best

    # within-window sweep, cheapest-compile first
    for batch, bc in ((256, 4096), (256, 8192), (256, 16384),
                      (512, 8192), (512, 16384),
                      (1024, 8192), (1024, 16384)):
        timeit(batch, bc, full=False)
    print("--- full dense arm (cand + f32 rescore) ---", flush=True)
    for batch, bc in ((256, 8192), (512, 8192), (512, 16384),
                      (1024, 16384)):
        timeit(batch, bc, full=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

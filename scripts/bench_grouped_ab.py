"""On-chip A/B: per-super turbo kernel + approx_max_k (production) vs the
grouped-reduction kernel ``dense_topk_fast_i8_grouped`` at bench scale.

Adoption rule for the grouped kernel as the `auto`/int8 default:
>= 15% faster full dense arm AND recall@10 (after f32 rescore, vs the
exact f32 oracle) within 0.001 of the per-super kernel over >= 512
sampled queries. See the kernel docstring for the capacity tradeoff.

Timing methodology = bench.py's (single jitted lax.scan over NB
sub-batches, scalar readback, best-of-reps).

Usage: python scripts/bench_grouped_ab.py [N_DOCS] [BATCH] [NB]
Env: AB_REPS (default 5), AB_SAMPLE (default 512),
AB_GROUPS (default "4,8,16").
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
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(os.environ.get("AB_REPS", "5"))
    sample = int(os.environ.get("AB_SAMPLE", "512"))
    groups = [int(g) for g in os.environ.get("AB_GROUPS", "4,8,16").split(",")]
    dim = 384
    k = 10
    c = 32

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i8,
        dense_topk_fast_i8_grouped,
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
    total_q = nb * batch
    targets = rng.integers(0, n_docs, size=total_q)
    q = emb[targets] + 0.6 * rng.standard_normal((total_q, dim)).astype(
        np.float32
    )
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    emb_t8 = jax.device_put(jnp.asarray(quantize_int8(emb).T))
    emb_t8 = jax.block_until_ready(pad_corpus_t_i8(emb_t8))
    rescore_rows = jax.device_put(jnp.asarray(emb))
    q8s = jax.device_put(jnp.asarray(quantize_int8(q).reshape(nb, batch, dim)))
    qfs = jax.device_put(jnp.asarray(q.reshape(nb, batch, dim)))
    jax.block_until_ready((rescore_rows, q8s, qfs))
    print(f"corpus + queries staged ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    s_exact = emb @ q[:sample].T
    ref_ids = np.argsort(-s_exact, axis=0)[:k].T
    del s_exact
    print(f"exact reference over {sample} queries ({time.time()-t0:.1f}s)", flush=True)

    def recall(ids) -> float:
        got = np.asarray(ids)[:sample]
        return float(
            np.mean(
                [
                    len(set(map(int, got[i, :k])) & set(map(int, ref_ids[i])))
                    / k
                    for i in range(sample)
                ]
            )
        )

    @functools.partial(jax.jit, static_argnames=("group",))
    def run(emb_op, rescore_op, q8b, qfb, group):
        def body(acc, xs):
            q8i, qfi = xs
            if group == 0:
                _, cids = dense_topk_fast_i8(
                    emb_op, q8i, k=c, block_c=8192, n_docs=n_docs,
                    interpret=interpret,
                )
            else:
                _, cids = dense_topk_fast_i8_grouped(
                    emb_op, q8i, k=c, block_c=8192, n_docs=n_docs,
                    interpret=interpret, group=group,
                )
            _, ids = exact_rescore(rescore_op, qfi, cids, k)
            return acc + jnp.sum(ids), ids

        return jax.lax.scan(body, jnp.int32(0), (q8b, qfb))

    for group in [0] + groups:
        label = "int8 per-super+approx" if group == 0 else f"grouped g={group}"
        acc, outs = run(emb_t8, rescore_rows, q8s, qfs, group)
        _ = int(acc)
        best = float("inf")
        for _ in range(reps):
            s = time.time()
            acc, outs = run(emb_t8, rescore_rows, q8s, qfs, group)
            _ = int(acc)
            best = min(best, time.time() - s)
        rids = np.asarray(outs).reshape(total_q, k)
        r = recall(rids)
        print(
            f"{label:<24} dense-arm {best/nb*1e3:8.3f} ms/b  "
            f"({total_q/best:>10,.0f} QPS)  recall@10 {r:.4f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

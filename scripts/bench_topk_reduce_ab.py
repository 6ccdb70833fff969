"""On-chip A/B for the turbo kernel's POST-KERNEL reduction — the measured
wall (scripts/bench_kernel_decomp.py: the pallas pack+fold runs at ~97% of
the pure-dot floor; approx_max_k + decode then costs ~1.06 ms/sub-batch,
60% of the candidate pass).

Variants, all consuming the production top-2 packed buffers (B, half)x2:

- approx:     today's path — concat + jax.lax.approx_max_k(k_fetch) +
              decode + exact top_k trim.
- group<G>:   reshape the per-super candidates to (B, 2, n_super/G, G, 128),
              max+argmax over the G supers (XLA variadic reduce), exact
              top_k over the surviving 2*(n_super/G)*128 columns, decode
              with the argmax-recovered super index. Candidate capacity
              changes from top-2/lane/super to top-2/lane/G-super-group —
              a strictly weaker guarantee, so recall@10 after the f32
              rescore is asserted against the exact oracle per variant.
- topk:       exact jax.lax.top_k over the full 19,712 columns (baseline
              for why approx_max_k was chosen).

Timing methodology = bench.py's (single jitted lax.scan, scalar readback,
best-of-reps). Recall is measured on the SAME corpus/queries via the full
candidate->rescore pipeline vs the exact f32 oracle.

Usage: python scripts/bench_topk_reduce_ab.py [N_DOCS] [BATCH] [NB]
Env: AB_REPS (default 5), AB_SAMPLE (default 128).
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
    sample = int(os.environ.get("AB_SAMPLE", "128"))
    dim = 384
    k = 10
    c = 32  # rescore candidate count (production default)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        _I8_FLAG128,
        _TURBO_UNIT,
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
    n_padded = emb_t8.shape[1]
    n_super = n_padded // _TURBO_UNIT
    print(
        f"corpus {n_docs}->{n_padded} cols ({n_super} supers), "
        f"{nb}x{batch} queries ({time.time()-t0:.1f}s)",
        flush=True,
    )

    t0 = time.time()
    s_exact = emb @ q[:sample].T
    ref_ids = np.argsort(-s_exact, axis=0)[:k].T
    del s_exact
    print(f"exact reference ({time.time()-t0:.1f}s)", flush=True)

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

    # ---- variant reductions over the packed top-2 buffers --------------
    def reduce_grouped(p1, p2, g: int):
        """(B, half)x2 packed keys -> (ids (B, c)) via per-g-super-group
        max+argmax then exact top_k. Key bits: s*128 + FLAG + pos, pos in
        [0, 128) is the sub-dot index within the super; lane = column%128;
        id = super*16384 + pos*128 + lane."""
        b_ = p1.shape[0]
        ng = -(-n_super // g)  # ceil: pad the super axis with sentinel-0
        pk = jnp.stack([p1, p2], axis=1).reshape(b_, 2, n_super, 128)
        if ng * g != n_super:
            pk = jnp.pad(pk, ((0, 0), (0, 0), (0, ng * g - n_super), (0, 0)))
        pk = pk.reshape(b_, 2, ng, g, 128)
        best = jnp.max(pk, axis=3)  # (B, 2, ng, 128)
        arg = jnp.argmax(pk, axis=3).astype(jnp.int32)  # super-in-group
        width = 2 * ng * 128
        keys = best.reshape(b_, width)
        # decode ids: group index from the column, super = group*g + arg
        lane = jnp.arange(width, dtype=jnp.int32) % 128
        grp = (jnp.arange(width, dtype=jnp.int32) // 128) % ng
        sup = grp * g + arg.reshape(b_, width)
        pos = keys & 127
        ids = (sup * (_TURBO_UNIT // 128) + pos) * 128 + lane
        valid = (ids < n_docs) & (keys > 0)
        masked = jnp.where(valid, keys, jnp.int32(-(2 ** 31)))
        _, sel = jax.lax.top_k(masked, c)
        out = jnp.take_along_axis(
            jnp.where(valid, ids, -1), sel, axis=1
        )
        return out

    def reduce_approx(p1, p2):
        half = p1.shape[1]
        packed = jnp.concatenate([p1, p2], axis=1)
        gf = jax.lax.bitcast_convert_type(packed, jnp.float32)
        k_fetch = c + 32
        fv, pcols = jax.lax.approx_max_k(gf, k_fetch, recall_target=0.99)
        pvals = jax.lax.bitcast_convert_type(fv, jnp.int32)
        pos = pvals & 127
        col = pcols % half
        ids = (((col // 128) * 128 + pos) * 128 + col % 128).astype(jnp.int32)
        valid = (ids < n_docs) & (pvals > 0)
        key = jnp.where(valid, pvals, jnp.int32(-(2 ** 31)))
        _, sel = jax.lax.top_k(key, c)
        return jnp.take_along_axis(jnp.where(valid, ids, -1), sel, axis=1)

    def reduce_exact_topk(p1, p2):
        half = p1.shape[1]
        packed = jnp.concatenate([p1, p2], axis=1)
        vals, cols = jax.lax.top_k(packed, c)
        pos = vals & 127
        col = cols % half
        ids = (((col // 128) * 128 + pos) * 128 + col % 128).astype(jnp.int32)
        valid = (ids < n_docs) & (vals > 0)
        return jnp.where(valid, ids, -1)

    # packed production kernel (private surface, probe only)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from openintel_tpu.ops.pallas.dense_topk import _turbo_kernel_i8_top2

    block_c = 8192
    sub = block_c // 128
    steps = _TURBO_UNIT // block_c
    n_steps = n_padded // block_c
    half = n_super * 128

    def packed_kernel(qb, emb_op):
        out_block = pl.BlockSpec(
            (batch, 128), lambda j: (0, j // steps),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            functools.partial(_turbo_kernel_i8_top2, sub=sub, steps=steps),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((batch, dim), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dim, block_c), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_block, out_block],
            out_shape=[
                jax.ShapeDtypeStruct((batch, half), jnp.int32),
                jax.ShapeDtypeStruct((batch, half), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((batch, 256), jnp.int32)],
        )(qb, emb_op)

    REDUCERS = {
        "approx (production)": reduce_approx,
        "group4": lambda p1, p2: reduce_grouped(p1, p2, 4),
        "group8": lambda p1, p2: reduce_grouped(p1, p2, 8),
        "group16": lambda p1, p2: reduce_grouped(p1, p2, 16),
        "exact-topk-19712": reduce_exact_topk,
    }

    @functools.partial(jax.jit, static_argnames=("variant", "full"))
    def run(emb_op, rescore_op, q8b, qfb, variant, full):
        def body(acc, xs):
            q8i, qfi = xs
            p1, p2 = packed_kernel(q8i, emb_op)
            cids = REDUCERS[variant](p1, p2)
            if full:
                _, ids = exact_rescore(rescore_op, qfi, cids, k)
            else:
                ids = cids
            return acc + jnp.sum(ids), ids

        return jax.lax.scan(body, jnp.int32(0), (q8b, qfb))

    for name, fn in REDUCERS.items():
        if fn is None:
            print(f"{name}: skipped (n_super={n_super} not divisible)", flush=True)
            continue
        acc, outs = run(emb_t8, rescore_rows, q8s, qfs, name, True)
        _ = int(acc)
        best = float("inf")
        for _ in range(reps):
            s = time.time()
            acc, outs = run(emb_t8, rescore_rows, q8s, qfs, name, True)
            _ = int(acc)
            best = min(best, time.time() - s)
        rids = np.asarray(outs).reshape(total_q, k)
        r = recall(rids)
        print(
            f"{name:<22} dense-arm {best/nb*1e3:8.3f} ms/b  "
            f"({total_q/best:>10,.0f} QPS)  recall@10 {r:.4f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

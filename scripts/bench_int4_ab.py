"""On-chip A/B: int8 turbo (c=32) vs int4 nibble-packed turbo (wider c)
dense candidate + exact-rescore pipelines at bench scale.

The int8 turbo kernel sits at ~77% of its 0.49 GB corpus-stream floor at
1.25M docs (docs/benchmarks.md) — the int4 kernel halves the streamed
bytes at the cost of a coarser quantiser that needs a wider candidate
over-fetch (host sim: recall@10-in-top-256 = 1.0000 at N=1M, scale 24-32).

Timing methodology = bench.py's: each arm is a SINGLE jitted program that
``lax.scan``s over NB query sub-batches and reduces the ids to one scalar,
so the host->device tunnel RTT (~31 ms here, >> any per-batch time) is
paid once per dispatch and amortised across NB batches, and the scalar
readback forces completion without a result-slab copy. Per-call
``block_until_ready`` timing is meaningless over this tunnel (measured
sub-RTT in the first attempt — recorded dead end).

Usage: python scripts/bench_int4_ab.py  [N_DOCS] [BATCH] [NB]
Env: AB_REPS (default 6), AB_SAMPLE recall queries (default 128),
AB_VARIANTS comma-list to trim the sweep (default
"int8,int4c128,int4c256,int4s40,int4bc2048,int4bc8192" — first capture
attempt timed out compiling the full sweep over the tunnel, so reruns
should pass the 3-variant core: "int8,int4c256,int4s40").
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # allow `python scripts/<name>.py` from anywhere


import functools
import os
import sys
import time

import numpy as np


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_250_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(os.environ.get("AB_REPS", "6"))
    sample = int(os.environ.get("AB_SAMPLE", "128"))
    dim = 384
    k = 10

    import jax

    # Same persistent compile cache as bench.py: a rerun after a timeout
    # or transient tunnel failure skips every already-compiled program.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i4,
        dense_topk_fast_i8,
        exact_rescore,
        pack_corpus_t_i4,
        pad_corpus_t_i8,
        quantize_int4,
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
    print(
        f"corpus {n_docs}x{dim} + {nb}x{batch} queries ({time.time()-t0:.1f}s)",
        flush=True,
    )

    t0 = time.time()
    emb_t8 = jax.device_put(jnp.asarray(quantize_int8(emb).T))
    emb_t8 = jax.block_until_ready(pad_corpus_t_i8(emb_t8))
    packed4 = jax.device_put(jnp.asarray(pack_corpus_t_i4(quantize_int4(emb).T)))
    # scale 40 (clip at |x|=0.2): host sim reaches recall 1.000 already at
    # c=128 — half the rescore gather of the default scale-32 c=256 config.
    # Scale only changes the packed corpus content (candidate ORDERING);
    # the ids fed to exact_rescore are scale-agnostic.
    packed4_s40 = jax.device_put(
        jnp.asarray(pack_corpus_t_i4(quantize_int4(emb, scale=40.0).T))
    )
    rescore_rows = jax.device_put(jnp.asarray(emb))  # f32 (production rescore)
    q8s = jax.device_put(jnp.asarray(quantize_int8(q).reshape(nb, batch, dim)))
    qfs = jax.device_put(jnp.asarray(q.reshape(nb, batch, dim)))
    jax.block_until_ready((packed4, rescore_rows, q8s, qfs))
    print(
        f"device: int8 {emb_t8.nbytes/1e9:.2f} GB, int4 "
        f"{packed4.nbytes/1e9:.2f} GB, f32 rescore "
        f"{rescore_rows.nbytes/1e9:.2f} GB ({time.time()-t0:.1f}s)",
        flush=True,
    )

    # exact reference over the sample prefix
    t0 = time.time()
    s_exact = emb @ q[:sample].T
    ref_ids = np.argsort(-s_exact, axis=0)[:k].T  # (sample, k)
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

    # One jitted scan per (arm, stage): candidates only / + exact rescore.
    # rescore_op MUST be an explicit argument, not a closure capture: a
    # closed-over device array becomes an HLO *constant*, and XLA copies the
    # 1.92 GB literal through its passes — every earlier A/B attempt ground
    # to ~20 GB RSS / tens of minutes of single-thread CPU at exactly this
    # compile and never produced a measurement (bench.py passes rescore_op
    # explicitly, which is why the same program compiles there in seconds).
    @functools.partial(
        jax.jit, static_argnames=("arm", "c", "bc", "full")
    )
    def run(emb_op, rescore_op, q8b, qfb, arm, c, bc, full):
        def body(acc, xs):
            q8, qf = xs
            if arm == "int8":
                _, cids = dense_topk_fast_i8(
                    emb_op, q8, k=c, block_c=bc, n_docs=n_docs,
                    interpret=interpret,
                )
            else:
                _, cids = dense_topk_fast_i4(
                    emb_op, q8, k=c, block_c=bc, n_docs=n_docs,
                    interpret=interpret,
                )
            if full:
                _, ids = exact_rescore(rescore_op, qf, cids, k)
            else:
                ids = cids
            return acc + jnp.sum(ids), ids

        return jax.lax.scan(body, jnp.int32(0), (q8b, qfb))

    def timeit(emb_op, arm, c, bc, full):
        acc, _ = run(emb_op, rescore_rows, q8s, qfs, arm, c, bc, full)
        _ = int(acc)  # compile + warm + force
        best = float("inf")
        for _ in range(reps):
            s = time.time()
            acc, outs = run(emb_op, rescore_rows, q8s, qfs, arm, c, bc, full)
            _ = int(acc)
            best = min(best, time.time() - s)
        return best, outs

    results = {}

    def measure(name, emb_op, arm, c, bc):
        t_cand, _ = timeit(emb_op, arm, c, bc, full=False)
        t_full, outs = timeit(emb_op, arm, c, bc, full=True)
        rids = np.asarray(outs).reshape(total_q, k)
        r = recall(rids)
        results[name] = (c, t_cand, t_full, r)
        print(
            f"{name:<22} c={c:<4} cand {t_cand/nb*1e3:7.3f} ms/b  "
            f"dense-arm {t_full/nb*1e3:7.3f} ms/b  "
            f"({total_q/t_full:>10,.0f} QPS)  recall@10 {r:.4f}",
            flush=True,
        )

    variants = set(
        os.environ.get(
            "AB_VARIANTS",
            "int8,int4c128,int4c256,int4s40,int4bc2048,int4bc8192",
        ).split(",")
    )
    bc8 = 8192 if batch >= 128 else 4096
    if "int8" in variants:
        measure("int8 (production)", emb_t8, "int8", 32, bc8)
    for c in (128, 256):
        if f"int4c{c}" in variants:
            measure(f"int4 c={c}", packed4, "int4", c, 4096)
    if "int4s40" in variants:
        measure("int4 c=128 s=40", packed4_s40, "int4", 128, 4096)
    for bc in (2048, 8192):
        if f"int4bc{bc}" in variants:
            measure(f"int4 c=256 bc={bc}", packed4, "int4", 256, bc)
    return 0


def _main_with_retry() -> int:
    """Bounded retry on transient tunnel failures (shared classifier:
    openintel_tpu.utils.retry — same rationale as bench.py)."""
    from openintel_tpu.utils.retry import run_with_transient_retry

    return run_with_transient_retry(
        main, backoff_s=120.0, log=lambda m: print(m, flush=True)
    )


if __name__ == "__main__":
    sys.exit(_main_with_retry())

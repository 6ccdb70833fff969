"""Benchmark: hybrid retrieval QPS per chip (BASELINE.json north star).

Measures the full hybrid query step — BM25 (impact-pruned plans, sort +
segmented-scan reduction) + dense cosine (Pallas fused matmul/top-k kernel,
bf16) + RRF fusion — on this chip's shard of the 10M-doc target corpus
(10M / 8 chips = 1.25M docs x 384d), query batch 256, k=10.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": QPS, "unit": "queries/sec/chip", "vs_baseline": x}
vs_baseline is against the 100k QPS/chip north-star target.
Diagnostics (per-arm timings, recall parity) go to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the remote TPU compile helper takes minutes
    # per program; cache hits make repeat bench runs near-instant.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    log(f"backend: {backend}; devices: {jax.devices()}")

    import os

    # Shard of the 10M-doc target: 1.25M docs/chip on TPU; small on CPU.
    # BENCH_DOCS overrides (e.g. 10_000_000 fits one v5e chip in bf16 for a
    # single-chip capacity run: 7.7 GB corpus + plans).
    n_docs = int(os.environ.get("BENCH_DOCS", 0)) or (
        1_250_000 if on_tpu else 20_000
    )
    dim = 384
    batch = 256 if on_tpu else 32
    n_batches = 16 if on_tpu else 2
    k = 10
    c_arm = int(os.environ.get("BENCH_CARM", 0)) or 32
    # Impact pruning: exact for top-k with k <= min(M, multi_budget) (see
    # build_query_plan); round 1 over-provisioned at M=1024 — M=128 gives a
    # 4x exactness margin over c_arm=32 at ~1/8 the plan width.
    prune_m = int(os.environ.get("BENCH_PRUNE", 0)) or 128
    terms_per_query = 4
    vocab_size = 30_000 if on_tpu else 3_000

    from openintel_tpu.index.synthetic import synthetic_postings_index
    from openintel_tpu.ops.bm25 import bm25_topk_device, build_query_plan
    from openintel_tpu.ops.fusion import rrf_fuse_device
    from openintel_tpu.ops.dense import dense_topk_xla

    t0 = time.time()
    index = synthetic_postings_index(n_docs, vocab_size=vocab_size, seed=0)
    log(f"postings index: {n_docs} docs, nnz={index.nnz:,} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((n_docs, dim), dtype=np.float32)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    # Production dense path (BENCH_DENSE=int8, the default on TPU): int8
    # turbo candidate kernel over the (D, N) quantised transposed corpus +
    # exact bf16-row rescore — 11.5 GB total at 10M docs (fits one v5e).
    # BENCH_DENSE=bf16 falls back to the bf16 fast kernel. Transpose/pad/
    # cast on the HOST and push exactly one device copy per array — a
    # device-side transpose would briefly hold 2x the corpus in HBM.
    dense_mode = os.environ.get("BENCH_DENSE", "int8" if on_tpu else "bf16")
    block_c = 4096
    if on_tpu and dense_mode == "int8":
        import ml_dtypes

        from openintel_tpu.ops.pallas.dense_topk import (
            _TURBO_UNIT,
            quantize_int8,
        )

        block_c = 8192 if batch >= 128 else 4096  # measured optimum on v5e
        n_pad = -(-n_docs // _TURBO_UNIT) * _TURBO_UNIT
        emb_t8 = np.zeros((dim, n_pad), dtype=np.int8)
        emb_t8[:, :n_docs] = quantize_int8(emb.T)
        emb_t_dev = jax.device_put(jnp.asarray(emb_t8))
        del emb_t8
        rescore_dev = jax.device_put(
            jnp.asarray(emb.astype(ml_dtypes.bfloat16))
        )
        jax.block_until_ready(rescore_dev)
    elif on_tpu:
        import ml_dtypes

        unit = 4 * block_c
        n_pad = -(-n_docs // unit) * unit
        emb_t = np.zeros((dim, n_pad), dtype=ml_dtypes.bfloat16)
        emb_t[:, :n_docs] = emb.T.astype(ml_dtypes.bfloat16)
        emb_t_dev = jax.device_put(jnp.asarray(emb_t))
        del emb_t
        rescore_dev = None
    else:
        from openintel_tpu.ops.pallas.dense_topk import pad_corpus_t

        emb_t_dev = pad_corpus_t(jnp.asarray(emb.T), block_c)
        rescore_dev = None
    jax.block_until_ready(emb_t_dev)
    log(
        f"dense index [{dense_mode}]: {emb.nbytes/1e9:.2f} GB f32 host "
        f"({time.time()-t0:.1f}s)"
    )

    # Queries: mid-frequency terms (log-uniform rank 50..vocab) + embeddings
    # near random docs, so both arms have signal.
    t0 = time.time()
    total_q = batch * n_batches
    ranks = np.exp(
        rng.uniform(np.log(50), np.log(vocab_size - 1), size=(total_q, terms_per_query))
    ).astype(np.int64)
    term_ids = [list(row + 1) for row in ranks]  # term id = rank + 1
    targets = rng.integers(0, n_docs, size=total_q)
    q = emb[targets] + 0.6 * rng.standard_normal((total_q, dim)).astype(np.float32)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)

    index.ensure_impact_order()
    plans = [
        build_query_plan(
            index,
            term_ids[i * batch : (i + 1) * batch],
            max_postings_per_term=prune_m,
        )
        for i in range(n_batches)
    ]
    plan_w = max(p.doc_ids.shape[1] for p in plans)
    pdi = np.full((n_batches, batch, plan_w), n_docs, np.int32)
    pw = np.zeros((n_batches, batch, plan_w), np.float32)
    for i, p in enumerate(plans):
        w = p.doc_ids.shape[1]
        pdi[i, :, :w] = p.doc_ids
        pw[i, :, :w] = p.weights
    log(
        f"plans: width {plan_w} (pruned at {prune_m}/term), "
        f"{total_q} queries ({time.time()-t0:.1f}s)"
    )

    q_dev = jax.device_put(
        jnp.asarray(q.reshape(n_batches, batch, dim),
                    jnp.bfloat16 if on_tpu else jnp.float32)
    )
    if dense_mode == "int8":
        from openintel_tpu.ops.pallas.dense_topk import quantize_int8 as _qi8

        q8_dev = jax.device_put(
            jnp.asarray(_qi8(q.reshape(n_batches, batch, dim)))
        )
    else:  # uniform scan signature; tiny and unused
        q8_dev = jax.device_put(
            jnp.zeros((n_batches, batch, dim), jnp.int8)
        )
        rescore_dev = jax.device_put(jnp.zeros((1, dim), jnp.bfloat16))

    pdi_dev = jax.device_put(jnp.asarray(pdi))
    pw_dev = jax.device_put(jnp.asarray(pw))

    def dense_arm(embs_t, rescore, qb, qb8):
        if on_tpu and dense_mode == "int8":
            from openintel_tpu.ops.pallas.dense_topk import (
                dense_topk_fast_i8,
                exact_rescore,
            )

            _, cids = dense_topk_fast_i8(
                embs_t, qb8, k=c_arm, block_c=block_c, n_docs=n_docs
            )
            return exact_rescore(rescore, qb, cids, c_arm)
        if on_tpu:
            from openintel_tpu.ops.pallas.dense_topk import dense_topk_fast

            return dense_topk_fast(
                embs_t, qb, k=c_arm, block_c=block_c, n_docs=n_docs
            )
        # slice the block padding back off: zero-padded rows score 0 and
        # would otherwise enter the top-32 on the CPU path
        return dense_topk_xla(jnp.transpose(embs_t)[:n_docs], qb, c_arm, 4096)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run_batches(embs_t, rescore, qbs, qbs8, pdis, pws, mode="hybrid"):
        def body(carry, xs):
            qb, qb8, di, w = xs
            if mode in ("hybrid", "dense"):
                d_vals, d_ids = dense_arm(embs_t, rescore, qb, qb8)
            if mode in ("hybrid", "bm25"):
                b_vals, b_ids = bm25_topk_device(
                    di, w, n_docs, c_arm, presorted=True, max_run=terms_per_query
                )
            if mode == "hybrid":
                vals, ids = rrf_fuse_device(b_ids, d_ids, k)
            elif mode == "dense":
                vals, ids = d_vals, d_ids
            else:
                vals, ids = b_vals, b_ids
            return carry + jnp.sum(ids), (vals, ids)

        acc, outs = jax.lax.scan(body, jnp.int32(0), (qbs, qbs8, pdis, pws))
        return acc, outs

    # MEASURE the per-call dispatch/tunnel RTT instead of assuming it: a
    # trivial jitted op's round trip is pure overhead, amortised across the
    # 16-batch scan in the real programs. Reported separately in the JSON so
    # the adjustment is visible, never baked in.
    @jax.jit
    def _tiny(x):
        return x + 1

    _ = int(_tiny(jnp.int32(0)))
    rtt = min(
        (lambda t0: (int(_tiny(jnp.int32(0))), time.time() - t0)[1])(time.time())
        for _ in range(20)
    )
    log(f"measured dispatch RTT: {rtt*1e3:.1f} ms/call")

    def timeit(mode, reps=8):  # min-of-N rides out tunnel/ambient jitter
        args = (emb_t_dev, rescore_dev, q_dev, q8_dev, pdi_dev, pw_dev)
        acc, outs = run_batches(*args, mode=mode)
        _ = int(acc)  # device->host sync (block_until_ready alone is lazy here)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            acc, outs = run_batches(*args, mode=mode)
            _ = int(acc)
            best = min(best, time.time() - t0)
        per_batch_raw = best / n_batches
        per_batch = max(best - rtt, 1e-9) / n_batches
        return per_batch, per_batch_raw, outs

    per_dense, per_dense_raw, outs_d = timeit("dense")
    log(f"dense arm : {per_dense*1e3:8.3f} ms/batch  {batch/per_dense:>12,.0f} QPS")
    per_bm25, per_bm25_raw, outs_b = timeit("bm25")
    log(f"bm25 arm  : {per_bm25*1e3:8.3f} ms/batch  {batch/per_bm25:>12,.0f} QPS")
    outs_arms = {"dense": outs_d[1], "bm25": outs_b[1]}
    per_hybrid, per_hybrid_raw, outs = timeit("hybrid")
    qps = batch / per_hybrid
    qps_raw = batch / per_hybrid_raw
    log(
        f"hybrid    : {per_hybrid*1e3:8.3f} ms/batch  {qps:>12,.0f} QPS "
        f"(raw, RTT included: {qps_raw:,.0f})"
    )

    qps_b64 = None
    if on_tpu:  # batched multi-query scaling (BASELINE config 4)
        for small in (64,):
            nb2 = total_q // small
            q2 = q_dev.reshape(nb2, small, dim)
            q2_8 = q8_dev.reshape(nb2, small, dim)
            p2 = pdi_dev.reshape(nb2, small, -1)
            w2 = pw_dev.reshape(nb2, small, -1)

            @functools.partial(jax.jit, static_argnames=())
            def run_small(embs_t, rescore, qbs, qbs8, pdis, pws):
                def body(carry, xs):
                    qb, qb8, di, w = xs
                    _, d_ids = dense_arm(embs_t, rescore, qb, qb8)
                    _, b_ids = bm25_topk_device(
                        di, w, n_docs, c_arm, presorted=True,
                        max_run=terms_per_query,
                    )
                    _, ids = rrf_fuse_device(b_ids, d_ids, k)
                    return carry + jnp.sum(ids), None

                return jax.lax.scan(
                    body, jnp.int32(0), (qbs, qbs8, pdis, pws)
                )[0]

            args2 = (emb_t_dev, rescore_dev, q2, q2_8, p2, w2)
            acc = run_small(*args2)
            _ = int(acc)
            best = float("inf")
            for _ in range(4):
                t0 = time.time()
                _ = int(run_small(*args2))
                best = min(best, time.time() - t0)
            per = max(best - rtt, 1e-9) / nb2
            qps_b64 = small / per
            log(
                f"hybrid b={small:4d}: {per*1e3:8.3f} ms/batch "
                f"{qps_b64:>12,.0f} QPS (per-query efficiency vs b={batch}: "
                f"{qps_b64/qps:.2f}x)"
            )

    # Recall@10 parity vs the exact NumPy reference scorer on a query sample,
    # against two references: the f32 index (idealised) and the same
    # bf16-stored index scored exactly (equal-memory parity per BASELINE.md:
    # the production index IS bf16; this isolates kernel/pruning loss from
    # storage-precision loss).
    from openintel_tpu.ops import reference as ref

    sample = min(512, total_q)
    hyb_ids = np.asarray(outs[1]).reshape(total_q, k)[:sample]
    rec_f32, rec_stored, rec_arm_b, rec_arm_d = [], [], [], []
    # Dense reference rankings via the chunked portable oracle: f32-HIGHEST
    # dense_topk_xla over 256k-doc chunks, merged by global id on the host.
    # dense_topk_xla is independently asserted bit-equal to the NumPy
    # reference in the hermetic suite (tests/test_dense.py); a 512-query
    # NumPy matmul over 1.25M docs takes ~15 min single-threaded. The f32
    # corpus streams over the (slow) tunnel exactly ONCE: each chunk yields
    # BOTH the idealised-f32 ranking and the stored-bf16 ranking (the chunk
    # cast to bf16 on device, scored with exact f32 accumulation).
    def _merge(best, v, i):
        av = np.concatenate([best[0], v], axis=1)
        ai = np.concatenate([best[1], i], axis=1)
        # exact merge, ties by ascending doc id (reference semantics)
        order = np.lexsort((ai, -av), axis=1)[:, :c_arm]
        return (
            np.take_along_axis(av, order, axis=1),
            np.take_along_axis(ai, order, axis=1),
        )

    t0 = time.time()
    chunk = 262_144
    qs = jnp.asarray(q[:sample], jnp.float32)
    empty = (
        np.full((sample, c_arm), -np.inf, np.float32),
        np.full((sample, c_arm), -1, np.int64),
    )
    best32, best16 = empty, empty
    for lo in range(0, n_docs, chunk):
        ev = jnp.asarray(emb[lo : lo + chunk], jnp.float32)
        v, i = dense_topk_xla(ev, qs, c_arm, 4096)
        best32 = _merge(
            best32, np.asarray(v, np.float32), np.asarray(i, np.int64) + lo
        )
        # stored-index reference: docs rounded to bf16, queries f32, exact
        # f32 accumulation (same definition as round 1; CPU stores f32,
        # so its stored reference is the f32 chunk unrounded)
        ev16 = (
            ev.astype(jnp.bfloat16).astype(jnp.float32) if on_tpu else ev
        )
        v, i = dense_topk_xla(ev16, qs, c_arm, 4096)
        best16 = _merge(
            best16, np.asarray(v, np.float32), np.asarray(i, np.int64) + lo
        )
    dn_f32, dn_bf16 = best32[1], best16[1]
    log(f"reference dense rankings for {sample} queries ({time.time()-t0:.1f}s)")
    bm_exact = [ref.bm25_topk(index, term_ids[i], c_arm)[1] for i in range(sample)]
    b_ids_dev = np.asarray(outs_arms["bm25"]).reshape(total_q, -1)[:sample]
    d_ids_dev = np.asarray(outs_arms["dense"]).reshape(total_q, -1)[:sample]
    for i in range(sample):
        got = {int(d) for d in hyb_ids[i] if d >= 0}
        _, ri = ref.rrf_fuse([bm_exact[i], dn_f32[i]], k)
        exact = {int(d) for d in ri if d >= 0}
        if exact:
            rec_f32.append(len(exact & got) / len(exact))
        _, ri_s = ref.rrf_fuse([bm_exact[i], dn_bf16[i]], k)
        exact_s = {int(d) for d in ri_s if d >= 0}
        if exact_s:
            rec_stored.append(len(exact_s & got) / len(exact_s))
        # per-arm diagnostics (device top-c vs exact arm top-c)
        eb = {int(d) for d in bm_exact[i] if d >= 0}
        if eb:
            rec_arm_b.append(
                len(eb & {int(d) for d in b_ids_dev[i] if d >= 0}) / len(eb)
            )
        ed = {int(d) for d in dn_bf16[i] if d >= 0}
        if ed:
            rec_arm_d.append(
                len(ed & {int(d) for d in d_ids_dev[i] if d >= 0}) / len(ed)
            )
    recall = float(np.mean(rec_f32)) if rec_f32 else 1.0
    recall_min = float(np.min(rec_f32)) if rec_f32 else 1.0
    recall_stored = float(np.mean(rec_stored)) if rec_stored else 1.0
    log(
        f"recall@10 (n={sample}): {recall:.3f} mean / {recall_min:.3f} min "
        f"vs f32 index, {recall_stored:.3f} vs stored (bf16) index; "
        f"arm recall@{c_arm}: bm25 {np.mean(rec_arm_b):.3f}, "
        f"dense {np.mean(rec_arm_d):.3f}"
    )

    result = {
        "metric": f"hybrid_qps_per_chip_{n_docs/1e6:.2f}M_docs_d{dim}_b{batch}",
        "value": round(qps, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / 100_000.0, 4),
        # raw wall-clock (dispatch RTT included) and the measured RTT the
        # headline subtracts — the adjustment is visible, not baked in
        "value_raw": round(qps_raw, 1),
        "dispatch_rtt_ms": round(rtt * 1e3, 2),
        "recall_at_10_vs_exact": round(recall, 4),
        "recall_at_10_min": round(recall_min, 4),
        "recall_at_10_vs_stored": round(recall_stored, 4),
        "recall_sample_queries": sample,
        "dense_arm_qps": round(batch / per_dense, 1),
        "bm25_arm_qps": round(batch / per_bm25, 1),
        "dense_mode": dense_mode,
        "backend": backend,
    }
    if qps_b64 is not None:
        result["qps_b64"] = round(qps_b64, 1)
        result["b64_per_query_efficiency"] = round((qps_b64 / qps), 4)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

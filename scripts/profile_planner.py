"""Phase profile of the C++ query planner at bench scale.

Builds a -DOPENINTEL_PROFILE variant of the native library into /tmp (the
production .so carries no instrumentation), replays the exact bench query
distribution (bench.py: log-uniform term ranks 50..vocab over the seed-0
synthetic index), and prints the per-phase breakdown of plan assembly:

  0 term-dedup+prune-check   1 pairwise-intersections   2 multi-selection
  3 per-term-emission        4 k-way-merge-output

Env knobs: PROF_DOCS (default 1_250_000), PROF_QUERIES (default 4096),
PROF_VOCAB (default 30_000), PROF_REPEATS (default 3, best-of).
Single-threaded on purpose: the per-core rate is the serving budget unit.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PHASES = [
    "term-dedup+prune-check",
    "pairwise-intersections",
    "multi-selection",
    "per-term-emission",
    "k-way-merge-output",
]


def build_profile_lib() -> ctypes.CDLL:
    from openintel_tpu import native

    so = Path("/tmp/openintel_native_profile.so")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         "-DOPENINTEL_PROFILE",
         f'-DOPENINTEL_SRC_HASH="{native._src_hash()}"']
        + [str(s) for s in native._SRCS]
        + ["-o", str(so)],
        check=True,
    )
    lib = native._bind(ctypes.CDLL(str(so)))
    lib.planner_prof_reset.restype = None
    lib.planner_prof_read.restype = None
    lib.planner_prof_read.argtypes = [
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
    ]
    return lib


def main() -> None:
    n_docs = int(os.environ.get("PROF_DOCS", 0)) or 1_250_000
    total_q = int(os.environ.get("PROF_QUERIES", 0)) or 4096
    vocab_size = int(os.environ.get("PROF_VOCAB", 0)) or 30_000
    repeats = int(os.environ.get("PROF_REPEATS", 0)) or 3
    terms_per_query = 4
    k = 10

    from openintel_tpu.index.synthetic import synthetic_postings_index
    from openintel_tpu.models.retrievers import auto_prune_m

    t0 = time.time()
    index = synthetic_postings_index(n_docs, vocab_size=vocab_size, seed=0)
    index.ensure_impact_order()
    prune_m = auto_prune_m(n_docs, 32) or 128  # small corpora: force pruning
    multi_budget = max(256, 32)
    p_offs, p_doc, p_imp = index.pruned_cache(prune_m)
    # PROF_BITMAP: 0 = off, 1 = production threshold, N>1 = explicit min_df
    bm_env = int(os.environ.get("PROF_BITMAP", "1"))
    bm_slots = bm_words = None
    bm_stride = 0
    if bm_env:
        thr = bm_env if bm_env > 1 else max(8192, n_docs // 256)
        bm_slots, bm_words = index.bitmap_cache(thr)
        if bm_words is not None:
            bm_stride = bm_words.shape[1]
    print(
        f"index: {n_docs} docs nnz={index.nnz:,} prune_m={prune_m} "
        f"bitmaps={'off' if bm_words is None else bm_words.shape} "
        f"({time.time()-t0:.1f}s)"
    )

    rng = np.random.default_rng(1)
    ranks = np.exp(
        rng.uniform(
            np.log(50), np.log(vocab_size - 1),
            size=(total_q, terms_per_query),
        )
    ).astype(np.int64)
    q = np.ascontiguousarray(ranks + 1, dtype=np.int32)

    lib = build_profile_lib()
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)

    term_offsets = np.ascontiguousarray(index.term_offsets, dtype=np.int64)
    doc_ids = np.ascontiguousarray(index.doc_ids, dtype=np.int32)
    impact = np.ascontiguousarray(index.impact, dtype=np.float32)
    order = np.ascontiguousarray(index.ensure_impact_order(), dtype=np.int64)
    idf = np.ascontiguousarray(index.idf, dtype=np.float32)
    p_offs = np.ascontiguousarray(p_offs, dtype=np.int64)

    cap = int(terms_per_query * (prune_m + multi_budget))
    out_ids = np.full((total_q, cap), n_docs, dtype=np.int32)
    out_w = np.zeros((total_q, cap), dtype=np.float32)
    widths = np.zeros(total_q, dtype=np.int64)

    def run_once(slots, words, stride):
        lib.planner_prof_reset()
        s = time.time()
        rc = lib.plan_build_masked(
            term_offsets.ctypes.data_as(i64p), doc_ids.ctypes.data_as(i32p),
            impact.ctypes.data_as(f32p), order.ctypes.data_as(i64p),
            idf.ctypes.data_as(f32p), term_offsets.shape[0] - 1,
            q.ctypes.data_as(i32p), total_q, terms_per_query,
            prune_m, multi_budget, None,
            p_offs.ctypes.data_as(i64p), p_doc.ctypes.data_as(i32p),
            p_imp.ctypes.data_as(f32p),
            slots.ctypes.data_as(i32p) if slots is not None else None,
            words.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint64)
            ) if words is not None else None,
            stride,
            out_ids.ctypes.data_as(i32p), out_w.ctypes.data_as(f32p),
            cap, widths.ctypes.data_as(i64p), 1,
        )
        wall = time.time() - s
        assert rc >= 0, rc
        ns = (ctypes.c_longlong * 5)()
        lib.planner_prof_read(ns, 5)
        return wall, [int(x) for x in ns]

    # interleaved control arm (PROF_AB=1): the no-bitmap planner runs
    # alternately in the same process, so ambient drift hits both arms
    if os.environ.get("PROF_AB") == "1" and bm_words is not None:
        best_on = best_off = None
        for _ in range(repeats):
            w_on, _ = run_once(bm_slots, bm_words, bm_stride)
            w_off, _ = run_once(None, None, 0)
            best_on = w_on if best_on is None else min(best_on, w_on)
            best_off = w_off if best_off is None else min(best_off, w_off)
        print(
            f"A/B interleaved: bitmaps {best_on*1e3/total_q:.4f} vs "
            f"off {best_off*1e3/total_q:.4f} ms/query/core "
            f"({best_off/best_on:.2f}x)"
        )

    best_wall, best_ns = None, None
    for _ in range(repeats):
        wall, ns = run_once(bm_slots, bm_words, bm_stride)
        if best_wall is None or wall < best_wall:
            best_wall, best_ns = wall, ns

    print(
        f"plan assembly: {best_wall*1e3/total_q:.4f} ms/query/core "
        f"(best of {repeats}, {total_q} queries, width max {widths.max()})"
    )
    tot = sum(best_ns) or 1
    for name, ns in zip(PHASES, best_ns):
        print(
            f"  {name:24s} {ns/1e6/total_q:8.4f} ms/q  "
            f"{100*ns/tot:5.1f}% of instrumented"
        )
    print(
        f"  {'(uninstrumented rest)':24s} "
        f"{(best_wall*1e9-tot)/1e6/total_q:8.4f} ms/q"
    )


if __name__ == "__main__":
    main()

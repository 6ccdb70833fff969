"""Native (C++) host components, loaded via ctypes.

Build on demand with :func:`build` (g++ -O3 -shared); import side effect
installs the native batch tokenizer into :mod:`openintel_tpu.ops.tokenizer`
when the shared object exists. Python fallbacks keep everything working
without the toolchain — the native path is a throughput optimisation for
index builds, asserted byte-identical in tests.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

_DIR = Path(__file__).parent
_SRCS = [_DIR / "tokenizer.cpp", _DIR / "postings.cpp", _DIR / "planner.cpp"]
_SO = _DIR / "libopenintel_native.so"

_lib: Optional[ctypes.CDLL] = None


def _src_hash() -> str:
    """sha256 over the concatenated .cpp sources (build stamps it into the
    .so; the loader refuses a library whose stamp no longer matches)."""
    import hashlib

    h = hashlib.sha256()
    for s in _SRCS:
        h.update(s.read_bytes())
    return h.hexdigest()


def build(force: bool = False) -> Path:
    """Compile the native library (g++ -O3 -march=native -shared -fPIC).

    Freshness requires BOTH a not-older mtime and a matching source-hash
    stamp: mtimes are unreliable across git operations and copies, and a
    newer-mtime .so built from older sources would otherwise never be
    rebuilt here while _load (correctly) refuses its stale stamp — leaving
    the Python fallback serving forever with no path back to native."""
    fresh = _SO.exists() and all(
        _SO.stat().st_mtime >= s.stat().st_mtime for s in _SRCS
    )
    if fresh:
        # The stamp is a string literal in .rodata, so a byte search finds
        # it without dlopen — loading here would pin the old mapping for
        # the whole process (dlopen caches by path), poisoning the post-
        # rebuild _load() with the stale image.
        fresh = _src_hash().encode("ascii") in _SO.read_bytes()
    if fresh and not force:
        return _SO
    # Compile to a temp path and rename into place: dlopen caches by
    # dev/inode and ctypes never dlcloses, so rewriting the .so IN PLACE
    # (same inode) would hand every post-rebuild load the pinned stale
    # image — os.replace gives the fresh build a new inode. Also drop the
    # cached handle; the next _load() dlopens the new file.
    import os

    global _lib
    tmp = _SO.with_name(_SO.name + ".tmp")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         f'-DOPENINTEL_SRC_HASH="{_src_hash()}"']
        + [str(s) for s in _SRCS]
        + ["-o", str(tmp)],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, _SO)
    _lib = None
    # retire content-addressed aliases of older builds (_so_unique)
    keep = _so_unique().name
    for old in _SO.parent.glob(f".{_SO.stem}.*{_SO.suffix}"):
        if old.name != keep:
            try:
                old.unlink()
            except OSError:
                pass
    return _SO


def _so_unique(h: Optional[str] = None) -> Path:
    """Content-addressed alias of the canonical .so, used for dlopen.

    glibc's dlopen matches loaded libraries by PATHNAME before it ever
    looks at the file, and ctypes never dlcloses — so once a stale build
    has been opened under the canonical name (e.g. an import side effect
    before an explicit rebuild), every later dlopen of that name returns
    the pinned stale image, fresh inode or not. Loading through a name
    that embeds the source hash makes aliasing impossible."""
    return _SO.with_name(
        f".{_SO.stem}.{(h or _src_hash())[:16]}{_SO.suffix}"
    )


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        return None
    # NEVER compile here: _load() runs from import side effects and lazy
    # serving paths, and a surprise multi-second g++ run (or a crash on
    # toolchain-less hosts) inside a serving request is worse than the
    # Python fallback. A stale .so (missing symbol OR a source-hash stamp
    # that no longer matches the on-disk .cpp sources) degrades to the
    # Python path until an explicit build() — it can never silently serve
    # older planner semantics.
    h = _src_hash()
    if h.encode("ascii") not in _SO.read_bytes():
        return None  # stale stamp: refuse without pinning it into dlopen
    try:
        uniq = _so_unique(h)
        if not uniq.exists():
            import os
            import shutil

            tmp = uniq.with_name(uniq.name + f".{os.getpid()}.tmp")
            try:
                os.link(_SO, tmp)
            except OSError:
                shutil.copy2(_SO, tmp)
            os.replace(tmp, uniq)
        lib = _bind(ctypes.CDLL(str(uniq)))
        stamped = lib.openintel_src_hash()
        if (stamped or b"").decode("ascii", "replace") != h:
            return None
    except (AttributeError, OSError):
        # missing symbol / unloadable library: Python fallbacks take over
        return None
    _lib = lib
    return lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.tokenize_batch.restype = ctypes.c_int64
    lib.tokenize_batch.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int64, ctypes.c_char_p,
        ctypes.c_int64, i64p,
    ]
    lib.postings_build.restype = ctypes.c_void_p
    lib.postings_build.argtypes = [ctypes.c_char_p, i64p, ctypes.c_int64]
    lib.postings_n_terms.restype = ctypes.c_int64
    lib.postings_n_terms.argtypes = [ctypes.c_void_p]
    lib.postings_nnz.restype = ctypes.c_int64
    lib.postings_nnz.argtypes = [ctypes.c_void_p]
    lib.postings_vocab_bytes.restype = ctypes.c_int64
    lib.postings_vocab_bytes.argtypes = [ctypes.c_void_p]
    lib.postings_export.restype = None
    lib.postings_export.argtypes = [
        ctypes.c_void_p, i64p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p, i64p,
    ]
    lib.postings_free.restype = None
    lib.postings_free.argtypes = [ctypes.c_void_p]
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.plan_build.restype = ctypes.c_int64
    lib.plan_build.argtypes = [
        i64p, i32p, f32p, i64p, f32p, ctypes.c_int64,
        i32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        i32p, f32p, ctypes.c_int64, i64p, ctypes.c_int64,
    ]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.plan_build_masked.restype = ctypes.c_int64
    lib.plan_build_masked.argtypes = [
        i64p, i32p, f32p, i64p, f32p, ctypes.c_int64,
        i32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, u8p,
        i64p, i32p, f32p,  # pruned cache (nullable): offsets, doc_ids, impacts
        i32p, u64p, ctypes.c_int64,  # bitmap cache (nullable): slots, words, stride
        i32p, f32p, ctypes.c_int64, i64p, ctypes.c_int64,
    ]
    lib.openintel_src_hash.restype = ctypes.c_char_p
    lib.openintel_src_hash.argtypes = []
    return lib


def native_build_postings(texts: Sequence[str]):
    """Tokenize->vocab->CSR in C++; returns raw arrays or None if unavailable
    or the corpus is not pure ASCII (Python builder handles those).

    Returns (term_offsets, doc_ids, tf, doc_len, df, vocab_dict)."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    try:
        joined = "".join(texts).encode("ascii")
    except UnicodeEncodeError:
        return None
    n = len(texts)
    offs = np.zeros(n + 1, dtype=np.int64)
    # the joined encode above proved every text pure-ASCII, so char length
    # == byte length — no second full-corpus encode pass on the hot path
    np.cumsum([len(t) for t in texts], out=offs[1:])
    handle = lib.postings_build(
        joined, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n
    )
    try:
        n_terms = lib.postings_n_terms(handle)  # includes pad slot 0
        nnz = lib.postings_nnz(handle)
        vb = lib.postings_vocab_bytes(handle)
        term_offsets = np.zeros(n_terms + 1, dtype=np.int64)
        doc_ids = np.zeros(max(nnz, 1), dtype=np.int32)
        tf = np.zeros(max(nnz, 1), dtype=np.float32)
        doc_len = np.zeros(max(n, 1), dtype=np.float32)
        df = np.zeros(n_terms, dtype=np.int32)
        vocab_buf = ctypes.create_string_buffer(max(int(vb), 1))
        vocab_offs = np.zeros(n_terms + 1, dtype=np.int64)
        lib.postings_export(
            handle,
            term_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            doc_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            doc_len.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            df.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vocab_buf,
            vocab_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    finally:
        lib.postings_free(handle)
    raw = vocab_buf.raw
    vocab = {
        raw[vocab_offs[t] : vocab_offs[t + 1]].decode("ascii"): t
        for t in range(1, n_terms)
    }
    return term_offsets, doc_ids[:nnz], tf[:nnz], doc_len[:n], df, vocab


def native_tokenize_batch(texts: Sequence[str]) -> Optional[list[list[str]]]:
    """Batch tokenise via the C++ library; None if unavailable.

    Non-ASCII documents are routed to the Python tokenizer (identical
    semantics are only guaranteed for ASCII — see tokenizer.cpp)."""
    lib = _load()
    if lib is None:
        return None
    from openintel_tpu.ops.tokenizer import tokenize as py_tokenize

    encoded: list[Optional[bytes]] = []
    for t in texts:
        try:
            b = t.encode("ascii")
        except UnicodeEncodeError:
            b = None  # python fallback per document
        encoded.append(b)

    ascii_idx = [i for i, b in enumerate(encoded) if b is not None]
    out: list[list[str]] = [None] * len(texts)  # type: ignore[list-item]
    for i, b in enumerate(encoded):
        if b is None:
            out[i] = py_tokenize(texts[i])

    if ascii_idx:
        bufs = [encoded[i] for i in ascii_idx]
        joined = b"".join(bufs)  # type: ignore[arg-type]
        n = len(bufs)
        offs = (ctypes.c_int64 * (n + 1))()
        pos = 0
        for j, b in enumerate(bufs):
            offs[j] = pos
            pos += len(b)  # type: ignore[arg-type]
        offs[n] = pos
        out_buf = ctypes.create_string_buffer(max(pos, 1))
        out_offs = (ctypes.c_int64 * (n + 1))()
        written = lib.tokenize_batch(
            joined, offs, n, out_buf, max(pos, 1), out_offs
        )
        if written < 0:  # pragma: no cover - cap is provably sufficient
            raise RuntimeError("native tokenizer output buffer overflow")
        raw = out_buf.raw
        for j, i in enumerate(ascii_idx):
            chunk = raw[out_offs[j] : out_offs[j + 1]].decode("ascii")
            out[i] = chunk.split(" ") if chunk else []
    return out


def native_build_query_plan(
    index,
    queries_term_ids: Sequence[Sequence[int]],
    max_postings_per_term: int,
    multi_budget: int,
    n_threads: int = 0,  # 0 = hardware concurrency
    doc_mask=None,  # (n_docs,) bool — filtered plans (planner.cpp)
    bitmap_min_df: Optional[int] = None,  # df threshold override (tests)
):
    """C++ pruned-plan assembly (see planner.cpp); returns
    (doc_ids (B, W) int32 sentinel-padded, weights (B, W) f32, max_terms,
    max_width) or None when the library is unavailable. Candidate sets are
    identical to the NumPy path (asserted in tests), including under
    ``doc_mask`` (filtered-corpus plans, same per-term top-M-unmasked
    pruning and multi-term tie-breaking)."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    order = index.ensure_impact_order()
    b = len(queries_term_ids)
    t_max = max((len(t) for t in queries_term_ids), default=1) or 1
    q = np.zeros((b, t_max), dtype=np.int32)
    max_terms = 1
    for i, terms in enumerate(queries_term_ids):
        clean = [t for t in terms if t > 0]
        q[i, : len(clean)] = clean
        max_terms = max(max_terms, len(set(clean)))

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    term_offsets = np.ascontiguousarray(index.term_offsets, dtype=np.int64)
    doc_ids = np.ascontiguousarray(index.doc_ids, dtype=np.int32)
    impact = np.ascontiguousarray(index.impact, dtype=np.float32)
    order = np.ascontiguousarray(order, dtype=np.int64)
    idf = np.ascontiguousarray(index.idf, dtype=np.float32)
    n_terms_vocab = term_offsets.shape[0] - 1

    u8p = ctypes.POINTER(ctypes.c_uint8)
    mask_u8 = None
    if doc_mask is not None:
        mask_u8 = np.ascontiguousarray(doc_mask, dtype=np.uint8)
        if mask_u8.shape != (index.n_docs,):
            # the C side indexes doc_mask[d] for d < n_docs — a short
            # buffer would be an out-of-bounds read, not a Python error
            raise ValueError(
                f"doc_mask shape {mask_u8.shape} != ({index.n_docs},)"
            )
    # Prebuilt doc-sorted top-M cache (index.pruned_cache): the planner's
    # emit phase reads contiguous slices instead of random impact_order
    # gathers (~20% of plan cost at bench scale). Building it costs one
    # vectorized pass over the index, so gate on batches big enough to
    # amortize; once built, every later call (any B) reuses it. Filtered
    # plans can't use it (their top-M-unmasked selection differs).
    p_offs = p_doc = p_imp = None
    cached = getattr(index, "_pruned_cache", None)
    if doc_mask is None and (
        b >= 32 or (cached is not None and max_postings_per_term in cached)
    ):
        p_offs, p_doc, p_imp = index.pruned_cache(max_postings_per_term)
        p_offs = np.ascontiguousarray(p_offs, dtype=np.int64)

    # Postings membership bitmaps for high-df terms: the multi-term pair
    # intersections become O(smaller-df) bit probes instead of merges
    # (planner.cpp::bitmap_intersect). Mask-independent (intersections are
    # raw either way; the mask filters afterwards), so filtered plans use
    # them too. The df threshold bounds memory to a few hundred rows.
    bm_slots = bm_words = None
    bm_stride = 0
    bm_cached = getattr(index, "_bitmap_cache", None)
    forced = bitmap_min_df is not None
    if not forced:
        bitmap_min_df = max(8192, index.n_docs // 256)
    if forced or b >= 32 or (
        bm_cached is not None and bitmap_min_df in bm_cached
    ):
        bm_slots, bm_words = index.bitmap_cache(bitmap_min_df)
        if bm_words is not None:
            bm_stride = bm_words.shape[1]

    cap = int(t_max * (max_postings_per_term + multi_budget))
    while True:
        out_ids = np.full((b, cap), index.n_docs, dtype=np.int32)
        out_w = np.zeros((b, cap), dtype=np.float32)
        widths = np.zeros(b, dtype=np.int64)
        rc = lib.plan_build_masked(
            term_offsets.ctypes.data_as(i64p),
            doc_ids.ctypes.data_as(i32p),
            impact.ctypes.data_as(f32p),
            order.ctypes.data_as(i64p),
            idf.ctypes.data_as(f32p),
            n_terms_vocab,
            q.ctypes.data_as(i32p),
            b,
            t_max,
            max_postings_per_term,
            multi_budget,
            mask_u8.ctypes.data_as(u8p) if mask_u8 is not None else None,
            p_offs.ctypes.data_as(i64p) if p_offs is not None else None,
            p_doc.ctypes.data_as(i32p) if p_doc is not None else None,
            p_imp.ctypes.data_as(f32p) if p_imp is not None else None,
            bm_slots.ctypes.data_as(i32p) if bm_slots is not None else None,
            bm_words.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint64)
            ) if bm_words is not None else None,
            bm_stride,
            out_ids.ctypes.data_as(i32p),
            out_w.ctypes.data_as(f32p),
            cap,
            widths.ctypes.data_as(i64p),
            n_threads,
        )
        if rc >= 0:
            return out_ids, out_w, max_terms, int(rc)  # rc = exact max width
        cap = int(-rc)  # grow to the reported required width and retry


def install() -> bool:
    """Wire the native tokenizer into ops.tokenizer; True if active."""
    if _load() is None:
        return False
    from openintel_tpu.ops import tokenizer as tok

    tok._native_tokenize_batch = native_tokenize_batch
    return True


# Import side effect (as documented above): wire the native batch tokenizer
# whenever the shared object is already built. No compilation happens here;
# build() is explicit.
install()

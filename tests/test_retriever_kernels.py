"""Single-chip HybridRetriever kernel passthrough: the served config must be
able to run every dense-arm kernel — in particular the production int8 turbo
+ exact-rescore path that bench.py certifies (round-2 verdict: the
benchmarked config and the served config must be the same thing) — and the
fused multi-batch device program must chunk long query lists correctly."""

import numpy as np
import pytest

from openintel_tpu.index.build import build_postings_index
from openintel_tpu.index.schema import DenseIndex
from openintel_tpu.index.synthetic import (
    synthetic_embeddings,
    synthetic_queries_from_docs,
    synthetic_token_corpus,
)
from openintel_tpu.models.embedding import HashingEmbedder
from openintel_tpu.models.retrievers import DenseRetriever, HybridRetriever

N, D = 600, 64


@pytest.fixture(scope="module")
def corpus():
    docs = synthetic_token_corpus(N, vocab_size=400, seed=11)
    postings = build_postings_index(docs)
    dense = DenseIndex.from_embeddings(synthetic_embeddings(N, dim=D, seed=12))
    embedder = HashingEmbedder(dim=D)
    return docs, postings, dense, embedder


def _recall(got, want):
    return np.mean(
        [
            len({i for i in got.ids[b] if i >= 0} & {i for i in want.ids[b] if i >= 0})
            / max((want.ids[b] >= 0).sum(), 1)
            for b in range(got.ids.shape[0])
        ]
    )


def test_kernel_passthrough_int8(corpus):
    """HybridRetriever(kernel="int8") runs the production dense arm (turbo
    candidates + exact rescore; interpret mode on CPU hosts) end to end:
    the fused one-dispatch program must equal the same arms composed by
    hand (BM25 + int8 dense + device RRF)."""
    import jax.numpy as jnp

    from openintel_tpu.models.retrievers import BM25Retriever
    from openintel_tpu.ops.fusion import rrf_fuse_device

    docs, postings, dense, embedder = corpus
    queries = synthetic_queries_from_docs(docs, 5, seed=13)
    # fusion="rrf": rank fusion keeps the hand composition exactly
    # order-stable, isolating the KERNEL plumbing under test (z-blend's
    # fused-program parity is covered by test_fusion + the oracle tests)
    got = HybridRetriever(
        postings, dense, embedder, kernel="int8", fusion="rrf"
    ).search(queries, k=10, candidates_per_arm=20)
    lex = BM25Retriever(postings).search(queries, k=20)
    dn = DenseRetriever(dense, embedder, kernel="int8").search(queries, k=20)
    _, ids = rrf_fuse_device(jnp.asarray(lex.ids), jnp.asarray(dn.ids), 10)
    np.testing.assert_array_equal(got.ids, np.asarray(ids))
    assert got.ids.shape == (5, 10)


def test_kernel_property_reports_dense_arm(corpus):
    _, postings, dense, embedder = corpus
    h = HybridRetriever(postings, dense, embedder, kernel="int8")
    assert h.kernel == "int8"
    assert HybridRetriever(postings, dense, embedder).kernel == "xla"  # CPU auto


def test_dense_retriever_auto_default_cpu(corpus):
    _, _, dense, embedder = corpus
    assert DenseRetriever(dense, embedder).kernel == "xla"
    assert DenseRetriever(dense, embedder, use_pallas=True).kernel == "pallas"
    assert DenseRetriever(dense, embedder, use_pallas=False).kernel == "xla"


def test_fused_multibatch_chunks_match_single_batch(corpus):
    """A query list longer than device_batch scans over sub-batches inside
    ONE device program; results must equal the single-batch run."""
    docs, postings, dense, embedder = corpus
    queries = synthetic_queries_from_docs(docs, 23, seed=14)  # 23 % 8 != 0
    big = HybridRetriever(postings, dense, embedder, kernel="xla")
    chunked = HybridRetriever(
        postings, dense, embedder, kernel="xla", device_batch=8
    )
    want = big.search(queries, k=10, candidates_per_arm=20)
    got = chunked.search(queries, k=10, candidates_per_arm=20)
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-6)


def test_search_prepared_is_the_search_path(corpus):
    """bench.py drives search_prepared directly; it must equal search()."""
    docs, postings, dense, embedder = corpus
    from openintel_tpu.ops.bm25 import encode_query

    queries = synthetic_queries_from_docs(docs, 4, seed=15)
    h = HybridRetriever(postings, dense, embedder, kernel="xla")
    want = h.search(queries, k=10, candidates_per_arm=20)
    term_ids = [encode_query(postings, q) for q in queries]
    emb = embedder(list(queries))
    got = h.search_prepared(term_ids, emb, k=10, candidates_per_arm=20)
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-6)


def test_empty_query_list(corpus):
    _, postings, dense, embedder = corpus
    res = HybridRetriever(postings, dense, embedder).search([], k=7)
    assert res.ids.shape == (0, 7)


def test_turbo_lane_collision_mechanism_and_top2_fix():
    """Pin the turbo kernel's candidate-slot structure
    (docs/specs/turbo-kernel.md "Exactness limits"): with slots=1 each
    16,384-doc super emits 128 candidate slots, one per LANE — docs with
    equal id mod 128 inside the same super compete and only the lane's
    int8 max survives. This was the measured source of the bench's rare
    sub-1.0 recall@10 queries; the production slots=2 fold keeps the
    lane's TOP-2 keys and recovers the eclipsed doc."""
    import jax.numpy as jnp

    from openintel_tpu.ops.pallas.dense_topk import (
        dense_topk_fast_i8,
        pad_corpus_t_i8,
        quantize_int8,
    )

    rng = np.random.default_rng(5)
    n, dim = 512, 64
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((1, dim)).astype(np.float32)
    q /= np.linalg.norm(q)
    # plant three near-query docs: ids 10 and 138 share lane 10 of super 0
    # (138 = 10 + 128); id 200 lives on lane 72 — no competition
    for doc, strength in ((10, 0.985), (138, 0.99), (200, 0.98)):
        v = strength * q[0] + np.sqrt(1 - strength**2) * emb[doc]
        emb[doc] = v / np.linalg.norm(v)

    emb_t8 = pad_corpus_t_i8(jnp.asarray(quantize_int8(emb).T))
    q8 = jnp.asarray(quantize_int8(q))
    _, ids = dense_topk_fast_i8(
        emb_t8, q8, k=8, n_docs=n, interpret=True, slots=1
    )
    got = {int(d) for d in np.asarray(ids)[0] if d >= 0}
    # the lane-10 winner and the lane-72 doc are candidates...
    assert 138 in got and 200 in got
    # ...but doc 10 — a true top-3 doc — was eclipsed by doc 138 on its
    # own lane and CANNOT be a candidate with one slot per lane
    assert 10 not in got

    # the production top-2 fold recovers it
    _, ids2 = dense_topk_fast_i8(
        emb_t8, q8, k=8, n_docs=n, interpret=True, slots=2
    )
    got2 = {int(d) for d in np.asarray(ids2)[0] if d >= 0}
    assert {10, 138, 200} <= got2, got2
    # no duplicate candidates and no padding-doc leakage
    real = [int(d) for d in np.asarray(ids2)[0] if d >= 0]
    assert len(real) == len(set(real))
    assert max(real) < n


def test_rebatch_preserves_results(corpus):
    """rebatch() re-chunks a PreparedBatch without rebuilding the plan;
    results must be identical to the original chunking."""
    docs, postings, dense, embedder = corpus
    from openintel_tpu.ops.bm25 import encode_query

    queries = synthetic_queries_from_docs(docs, 16, seed=16)
    h = HybridRetriever(postings, dense, embedder, kernel="xla", device_batch=16)
    term_ids = [encode_query(postings, q) for q in queries]
    prep = h.prepare(term_ids, embedder(list(queries)), k=10, candidates_per_arm=20)
    want = h.run_prepared(prep)
    got = h.run_prepared(h.rebatch(prep, 4))
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-6)


def test_fast_and_pallas_kernels_interpret_on_cpu(corpus):
    """Explicit --kernel fast/pallas must serve on CPU hosts (interpret
    mode threaded through the shared dense_arm_topk dispatch — round-3
    review finding)."""
    docs, postings, dense, embedder = corpus
    queries = synthetic_queries_from_docs(docs, 3, seed=17)
    for kern in ("fast", "pallas"):
        res = DenseRetriever(dense, embedder, kernel=kern).search(queries, k=5)
        assert res.ids.shape == (3, 5)
        res_h = HybridRetriever(postings, dense, embedder, kernel=kern).search(
            queries, k=5, candidates_per_arm=10
        )
        assert res_h.ids.shape == (3, 5)


def test_prepare_empty_batch(corpus):
    _, postings, dense, embedder = corpus
    h = HybridRetriever(postings, dense, embedder, kernel="xla")
    prep = h.prepare([], np.zeros((0, D), np.float32), k=5)
    res = h.run_prepared(prep)
    assert res.ids.shape == (0, 5)


def test_kernel_passthrough_int4(corpus):
    """HybridRetriever(kernel="int4") — the nibble-packed candidate kernel
    + exact rescore — end to end: fused one-dispatch program == hand
    composition, and the dense arm alone recovers the exact ordering at
    high recall (N=600 -> the 256-wide int4 fetch covers ~half the corpus
    so rescore should be near-exact)."""
    import jax.numpy as jnp

    from openintel_tpu.models.retrievers import BM25Retriever
    from openintel_tpu.ops.fusion import rrf_fuse_device

    docs, postings, dense, embedder = corpus
    queries = synthetic_queries_from_docs(docs, 5, seed=23)
    got = HybridRetriever(
        postings, dense, embedder, kernel="int4", fusion="rrf"
    ).search(queries, k=10, candidates_per_arm=20)
    lex = BM25Retriever(postings).search(queries, k=20)
    dn = DenseRetriever(dense, embedder, kernel="int4").search(queries, k=20)
    _, ids = rrf_fuse_device(jnp.asarray(lex.ids), jnp.asarray(dn.ids), 10)
    np.testing.assert_array_equal(got.ids, np.asarray(ids))
    assert got.ids.shape == (5, 10)
    # dense arm vs exact
    exact = DenseRetriever(dense, embedder, kernel="xla").search(queries, k=10)
    d4 = DenseRetriever(dense, embedder, kernel="int4").search(queries, k=10)
    assert _recall(d4, exact) >= 0.9


def test_kernel_passthrough_int8_zblend_default_pairing(corpus):
    """The PRODUCTION TPU pairing is kernel=int8 + fusion=zblend (bench.py
    defaults) — cover it against the hand-composed arms fused through the
    device z-blend. Unlike rrf (rank-only), z-blend consumes the dense arm's
    SCORES, so this pins that the int8 turbo path feeds exact-rescored f32
    values into fusion (a regression to pre-rescore quantised scores would
    reorder the blend and fail here while every rrf test stays green)."""
    import jax.numpy as jnp

    from openintel_tpu.models.retrievers import BM25Retriever
    from openintel_tpu.ops.fusion import zblend_fuse_device

    docs, postings, dense, embedder = corpus
    queries = synthetic_queries_from_docs(docs, 5, seed=16)
    got = HybridRetriever(
        postings, dense, embedder, kernel="int8", fusion="zblend"
    ).search(queries, k=10, candidates_per_arm=20)
    lex = BM25Retriever(postings).search(queries, k=20)
    dn = DenseRetriever(dense, embedder, kernel="int8").search(queries, k=20)
    _, ids = zblend_fuse_device(
        jnp.asarray(lex.scores), jnp.asarray(lex.ids),
        jnp.asarray(dn.scores), jnp.asarray(dn.ids), 10,
    )
    np.testing.assert_array_equal(got.ids, np.asarray(ids))
    # and the dense scores the blend consumed are the EXACT f32 cosines of
    # the candidates, not quantised int8 approximations
    emb_q = np.asarray(embedder(list(queries)), np.float32)
    emb_d = np.asarray(dense.embeddings, np.float32)
    for b in range(5):
        for j, doc in enumerate(dn.ids[b]):
            if doc < 0:
                continue
            exact = float(emb_q[b] @ emb_d[doc])
            np.testing.assert_allclose(dn.scores[b, j], exact, rtol=2e-5,
                                       atol=2e-5)

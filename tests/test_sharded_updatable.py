"""The sharded live corpus (parallel/updatable.py): add/delete/compact
while serving over the virtual mesh, indistinguishable from the single-chip
updatable retriever — which is itself asserted indistinguishable from the
frozen-statistics combined-index oracle (tests/test_updatable.py). Closes
the round-3 gap: a live corpus no longer needs a compaction pause to serve
from a mesh. Design: docs/specs/incremental-updates.md."""

import numpy as np
import pytest

import jax

from openintel_tpu.index.build import build_postings_index
from openintel_tpu.index.schema import DenseIndex
from openintel_tpu.index.synthetic import (
    synthetic_embeddings,
    synthetic_queries_from_docs,
    synthetic_token_corpus,
)
from openintel_tpu.models.embedding import HashingEmbedder
from openintel_tpu.models.retrievers import HybridRetriever
from openintel_tpu.models.updatable import (
    UpdatableHybridRetriever,
    merge_postings,
)
from openintel_tpu.parallel.updatable import ShardedUpdatableHybridRetriever

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

N, D = 500, 64  # NOT divisible by 8 -> corpus padding path


@pytest.fixture(scope="module")
def corpus():
    docs = synthetic_token_corpus(N, vocab_size=350, seed=81)
    postings = build_postings_index(docs)
    dense = DenseIndex.from_embeddings(synthetic_embeddings(N, dim=D, seed=82))
    embedder = HashingEmbedder(dim=D)
    return docs, postings, dense, embedder


@pytest.fixture()
def extra_docs():
    docs = synthetic_token_corpus(40, vocab_size=350, seed=83)
    return [d + " freshterm" + str(i % 5) for i, d in enumerate(docs)]


def _pair(fixture, **mesh_kw):
    """(sharded updatable, single-chip updatable) over the same corpus."""
    _, postings, dense, embedder = fixture
    sharded = ShardedUpdatableHybridRetriever(
        postings, dense, embedder, kernel="xla", block_size=128,
        **(mesh_kw or {"data": 2, "corpus": 4}),
    )
    single = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    return sharded, single


def _oracle(upd):
    """HybridRetriever over the frozen-statistics combined index (hooks
    keep this generic over the main-segment type)."""
    st = upd._st
    merged = merge_postings(upd._base_postings(st), st.delta_postings, upd.n_docs)
    all_emb = np.concatenate([upd._base_dense_rows(st), st.delta_emb])
    dense = DenseIndex.from_embeddings(all_emb, dtype=upd._store_dtype)
    # fusion="rrf": the live path's rank-based cross-segment fusion
    return HybridRetriever(
        merged, dense, upd._embedder(st), kernel="xla", fusion="rrf"
    )


def _assert_same(got, want, rtol=1e-5, atol=1e-6):
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=rtol, atol=atol)


def test_no_updates_serves_fused_sharded_program(corpus):
    docs, *_ = corpus
    sharded, _ = _pair(corpus)
    queries = synthetic_queries_from_docs(docs, 5, seed=84)  # 5 % data(2) != 0
    got = sharded.search(queries, k=10, candidates_per_arm=20)
    want = sharded._st.base.search(queries, k=10, candidates_per_arm=20)
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_array_equal(got.scores, want.scores)


def test_adds_match_single_chip_and_oracle(corpus, extra_docs):
    docs, *_ = corpus
    sharded, single = _pair(corpus)
    ids_s = sharded.add_documents(extra_docs)
    ids_1 = single.add_documents(extra_docs)
    np.testing.assert_array_equal(ids_s, ids_1)

    queries = synthetic_queries_from_docs(docs, 5, seed=85)
    queries += ["freshterm1 freshterm3", extra_docs[7][:40]]
    got = sharded.search(queries, k=10, candidates_per_arm=20)
    _assert_same(got, single.search(queries, k=10, candidates_per_arm=20))
    _assert_same(
        got, _oracle(sharded).search(queries, k=10, candidates_per_arm=20)
    )
    assert (got.ids >= N).any()  # new docs surface through the mesh


def test_deletes_tombstone_on_the_mesh(corpus, extra_docs):
    docs, *_ = corpus
    sharded, single = _pair(corpus)
    sharded.add_documents(extra_docs)
    single.add_documents(extra_docs)
    dead = [0, 3, N - 1, N + 2, N + len(extra_docs) - 1]  # main AND delta
    sharded.delete_ids(dead)
    single.delete_ids(dead)
    assert sharded.n_alive == single.n_alive == N + len(extra_docs) - len(dead)

    queries = synthetic_queries_from_docs(docs, 6, seed=86)
    got = sharded.search(queries, k=12, candidates_per_arm=24)
    _assert_same(got, single.search(queries, k=12, candidates_per_arm=24))
    assert not np.isin(got.ids, dead).any()


def test_user_filters_and_groups_compose_with_tombstones(corpus, extra_docs):
    docs, *_ = corpus
    sharded, single = _pair(corpus)
    sharded.add_documents(extra_docs)
    single.add_documents(extra_docs)
    sharded.delete_ids([5, N + 1])
    single.delete_ids([5, N + 1])

    n_total = sharded.n_docs
    rng = np.random.default_rng(87)
    masks = np.zeros((2, n_total), bool)
    masks[0, rng.choice(n_total, 200, replace=False)] = True
    masks[1, ::3] = True
    groups = np.array([0, 1, 0, 1, 0], np.int32)
    queries = synthetic_queries_from_docs(docs, 5, seed=88)
    got = sharded.search(
        queries, k=8, candidates_per_arm=16,
        filter_mask=masks, filter_group=groups,
    )
    want = single.search(
        queries, k=8, candidates_per_arm=16,
        filter_mask=masks, filter_group=groups,
    )
    _assert_same(got, want)
    # the filter held per query
    for row, g in zip(got.ids, groups):
        real = row[row >= 0]
        assert masks[g, real].all()
        assert not np.isin(real, [5, N + 1]).any()


def test_single_arm_modes_match(corpus, extra_docs):
    docs, *_ = corpus
    sharded, single = _pair(corpus)
    sharded.add_documents(extra_docs)
    single.add_documents(extra_docs)
    sharded.delete_ids([2, N + 4])
    single.delete_ids([2, N + 4])
    queries = synthetic_queries_from_docs(docs, 5, seed=89)
    for mode in ("bm25", "dense"):
        got = sharded.search(queries, k=10, mode=mode)
        _assert_same(got, single.search(queries, k=10, mode=mode), atol=1e-5)


def test_compact_in_place_restages_on_same_mesh(corpus, extra_docs):
    docs, *_ = corpus
    sharded, single = _pair(corpus)
    sharded.add_documents(extra_docs)
    single.add_documents(extra_docs)
    sharded.delete_ids([1, N + 3])
    single.delete_ids([1, N + 3])
    mesh_before = sharded.mesh
    id_map_s = sharded.compact_in_place()
    id_map_1 = single.compact_in_place()
    np.testing.assert_array_equal(id_map_s, id_map_1)
    assert sharded.mesh is mesh_before  # corpus never migrates devices
    assert sharded._st.delta_postings is None  # fused path restored

    queries = synthetic_queries_from_docs(docs, 5, seed=90)
    got = sharded.search(queries, k=10, candidates_per_arm=20)
    _assert_same(got, single.search(queries, k=10, candidates_per_arm=20))
    # and further updates keep working after the swap
    more = ["postcompact doc alpha", "postcompact doc beta"]
    np.testing.assert_array_equal(
        sharded.add_documents(more), single.add_documents(more)
    )
    got = sharded.search(["postcompact alpha"], k=5)
    _assert_same(got, single.search(["postcompact alpha"], k=5))


def test_concurrent_searches_during_sharded_updates(corpus, extra_docs):
    """Searches from worker threads keep returning CONSISTENT epochs while
    adds/deletes/compaction land on the mesh-backed retriever."""
    import threading

    docs, *_ = corpus
    sharded, _ = _pair(corpus, **{"data": 1, "corpus": 8})
    queries = synthetic_queries_from_docs(docs, 3, seed=91)
    stop = threading.Event()
    errors = []

    def searcher():
        while not stop.is_set():
            try:
                res = sharded.search(queries, k=5, candidates_per_arm=10)
                assert res.ids.shape == (3, 5)
            except Exception as e:  # noqa: BLE001 - collected for the assert
                errors.append(e)
                return

    threads = [threading.Thread(target=searcher) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        sharded.add_documents(extra_docs[:10])
        sharded.delete_ids([0, 1])
        sharded.add_documents(extra_docs[10:20])
        sharded.compact_in_place()
        sharded.add_documents(extra_docs[20:])
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=120)
    assert not errors, errors[:1]


def test_unfiltered_live_hybrid_uses_fused_arms(corpus, extra_docs, monkeypatch):
    """With a delta and NO tombstones, the hybrid must answer through the
    ONE fused sharded dispatch (search_with_arms), never the two
    single-arm main dispatches; with tombstones it must fall back to the
    mask-aware paths (the fused program is unfiltered-only)."""
    sharded, single = _pair(corpus)
    sharded.add_documents(extra_docs)
    single.add_documents(extra_docs)
    docs, *_ = corpus
    queries = synthetic_queries_from_docs(docs, 3, seed=95)

    def forbid(name):
        def _boom(*a, **k):
            raise AssertionError(f"{name} must not run on the fused path")
        return _boom

    monkeypatch.setattr(sharded, "_main_bm25_ranked", forbid("bm25 hook"))
    monkeypatch.setattr(sharded, "_main_dense_ranked", forbid("dense hook"))
    got = sharded.search(queries, k=8, candidates_per_arm=16)
    _assert_same(got, single.search(queries, k=8, candidates_per_arm=16))
    monkeypatch.undo()

    # tombstones -> masks_main exists -> the fused hook declines and the
    # mask-aware single-arm hooks run
    sharded.delete_ids([1])
    single.delete_ids([1])
    ran = {"bm25": 0, "dense": 0}
    orig_b = type(sharded)._main_bm25_ranked
    orig_d = type(sharded)._main_dense_ranked
    monkeypatch.setattr(
        sharded, "_main_bm25_ranked",
        lambda *a, **k: (ran.__setitem__("bm25", ran["bm25"] + 1),
                         orig_b(sharded, *a, **k))[1],
    )
    monkeypatch.setattr(
        sharded, "_main_dense_ranked",
        lambda *a, **k: (ran.__setitem__("dense", ran["dense"] + 1),
                         orig_d(sharded, *a, **k))[1],
    )
    got = sharded.search(queries, k=8, candidates_per_arm=16)
    _assert_same(got, single.search(queries, k=8, candidates_per_arm=16))
    assert ran["bm25"] >= 1 and ran["dense"] >= 1

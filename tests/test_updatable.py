"""Incremental updates (add/delete) — the strong contract: the updatable
retriever is INDISTINGUISHABLE from a HybridRetriever over the equivalent
frozen-statistics combined index (models/updatable.py::merge_postings),
with tombstones behaving exactly like a filter over that index; and
compact() equals a true from-scratch rebuild of the surviving docs.
Design: docs/specs/incremental-updates.md."""

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
from openintel_tpu.models.retrievers import HybridRetriever, make_filter_mask
from openintel_tpu.models.updatable import (
    UpdatableHybridRetriever,
    merge_postings,
)

N, D = 500, 64


@pytest.fixture(scope="module")
def corpus():
    docs = synthetic_token_corpus(N, vocab_size=350, seed=71)
    postings = build_postings_index(docs)
    dense = DenseIndex.from_embeddings(synthetic_embeddings(N, dim=D, seed=72))
    embedder = HashingEmbedder(dim=D)
    return docs, postings, dense, embedder


@pytest.fixture()
def extra_docs(corpus):
    # overlapping vocabulary + some brand-new tokens
    docs = synthetic_token_corpus(40, vocab_size=350, seed=73)
    return [d + " freshterm" + str(i % 5) for i, d in enumerate(docs)]


def _oracle(upd):
    """HybridRetriever over the frozen-statistics combined index.

    Pins fusion="rrf" — the live path's fusion (models/updatable.py
    _new_base): the cross-segment merge is rank-based, so the oracle must
    fuse the same way even though the static flagship default is zblend."""
    merged = merge_postings(
        upd.base.bm25.index, upd._st.delta_postings, upd.n_docs
    )
    all_emb = np.concatenate(
        [np.asarray(upd.base.dense.index.embeddings, np.float32),
         upd._st.delta_emb]
    )
    dense = DenseIndex.from_embeddings(all_emb, dtype=upd._store_dtype)
    return HybridRetriever(
        merged, dense, upd.base.dense.embedder, kernel="xla", fusion="rrf"
    )


def test_no_updates_delegates_to_base(corpus):
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    queries = synthetic_queries_from_docs(docs, 4, seed=74)
    got = upd.search(queries, k=10, candidates_per_arm=20)
    want = upd.base.search(queries, k=10, candidates_per_arm=20)
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_array_equal(got.scores, want.scores)


def test_added_docs_match_combined_oracle(corpus, extra_docs):
    """After an add, results equal a from-scratch retriever over the
    frozen-statistics merged index — including queries that hit the new
    docs' brand-new vocabulary."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    ids = upd.add_documents(extra_docs)
    assert ids.tolist() == list(range(N, N + len(extra_docs)))
    assert upd.n_docs == N + len(extra_docs)

    oracle = _oracle(upd)
    queries = synthetic_queries_from_docs(docs, 4, seed=75)
    queries += ["freshterm1 freshterm2", extra_docs[3][:40]]
    got = upd.search(queries, k=10, candidates_per_arm=20)
    want = oracle.search(queries, k=10, candidates_per_arm=20)
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-7)
    # new docs are actually retrievable
    assert (got.ids >= N).any()


def test_multiple_add_batches_match_oracle(corpus, extra_docs):
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs[:15])
    upd.add_documents(extra_docs[15:])
    oracle = _oracle(upd)
    queries = synthetic_queries_from_docs(docs, 3, seed=76) + ["freshterm4"]
    got = upd.search(queries, k=10, candidates_per_arm=20)
    want = oracle.search(queries, k=10, candidates_per_arm=20)
    np.testing.assert_array_equal(got.ids, want.ids)


def test_deletes_are_tombstones(corpus, extra_docs):
    """Deleted docs (main AND delta) stop surfacing immediately; results
    equal the oracle filtered by the alive mask."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    queries = synthetic_queries_from_docs(docs, 5, seed=77)
    before = upd.search(queries, k=10, candidates_per_arm=20)
    victims = {int(before.ids[0, 0]), int(before.ids[1, 0]), N + 2}
    upd.delete_ids(sorted(victims))
    got = upd.search(queries, k=10, candidates_per_arm=20)
    surfaced = set(got.ids[got.ids >= 0].ravel().tolist())
    assert not (surfaced & victims)
    alive = np.ones(upd.n_docs, bool)
    alive[sorted(victims)] = False
    want = _oracle(upd).search(
        queries, k=10, candidates_per_arm=20, filter_mask=alive
    )
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-7)
    assert upd.stats["n_deleted"] == len(victims)


def test_deletes_only_use_filtered_base_path(corpus):
    """Tombstones with NO delta ride the base retriever's filtered
    program directly."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    queries = synthetic_queries_from_docs(docs, 4, seed=78)
    before = upd.search(queries, k=5)
    victim = int(before.ids[0, 0])
    upd.delete_ids([victim])
    got = upd.search(queries, k=5)
    assert victim not in set(got.ids.ravel().tolist())
    want = upd.base.search(
        queries, k=5, filter_mask=upd._st.alive
    )
    np.testing.assert_array_equal(got.ids, want.ids)


def test_user_filter_composes_with_tombstones(corpus, extra_docs):
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    upd.delete_ids([0, 1, N])
    user = make_filter_mask(upd.n_docs, exclude_ids=[2, 3, N + 1])
    queries = synthetic_queries_from_docs(docs, 4, seed=79)
    got = upd.search(queries, k=10, candidates_per_arm=20, filter_mask=user)
    surfaced = set(got.ids[got.ids >= 0].ravel().tolist())
    assert not (surfaced & {0, 1, 2, 3, N, N + 1})
    alive = upd._st.alive & user
    want = _oracle(upd).search(
        queries, k=10, candidates_per_arm=20, filter_mask=alive
    )
    np.testing.assert_array_equal(got.ids, want.ids)


def test_tiny_include_filter_starves_exactly(corpus, extra_docs):
    """Extreme selectivity across BOTH segments exercises the dense-arm
    starvation fallback on the updatable path."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    keep = [3, 77, 200, 333, N + 1, N + 17]
    user = make_filter_mask(upd.n_docs, include_ids=keep)
    queries = synthetic_queries_from_docs(docs, 4, seed=80)
    got = upd.search(queries, k=10, candidates_per_arm=20, filter_mask=user)
    want = _oracle(upd).search(
        queries, k=10, candidates_per_arm=20, filter_mask=user
    )
    np.testing.assert_array_equal(got.ids, want.ids)
    assert set(got.ids[got.ids >= 0].ravel().tolist()) <= set(keep)


def test_validation(corpus):
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    with pytest.raises(ValueError, match="out of range"):
        upd.delete_ids([N])
    with pytest.raises(ValueError, match="embeddings shape"):
        upd.add_documents(["a"], embeddings=np.zeros((2, D), np.float32))
    assert upd.add_documents([]).size == 0


def test_compact_equals_fresh_rebuild(corpus, extra_docs):
    """compact() == build_postings_index over the surviving texts (true
    statistics, dense renumbering), searched identically."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    dead = [0, 5, N + 3]
    upd.delete_ids(dead)
    cpost, cdense, id_map = upd.compact()

    all_texts = list(docs) + list(extra_docs)
    alive_texts = [t for i, t in enumerate(all_texts) if i not in set(dead)]
    want_post = build_postings_index(alive_texts)
    assert cpost.n_docs == len(alive_texts) == cdense.n_docs
    assert abs(cpost.avgdl - want_post.avgdl) < 1e-6
    np.testing.assert_array_equal(id_map[dead], -1)
    assert id_map.max() == len(alive_texts) - 1

    # identical search behavior through fresh retrievers (vocab ids differ
    # between the two builds, so compare RESULTS, not raw arrays)
    queries = synthetic_queries_from_docs(docs, 4, seed=81) + ["freshterm2"]
    got = HybridRetriever(cpost, cdense, embedder, kernel="xla").search(
        queries, k=10, candidates_per_arm=20
    )
    emb_alive = np.stack([
        np.asarray(dense.embeddings, np.float32)[i] if i < N
        else upd._st.delta_emb[i - N]
        for i in range(upd.n_docs) if id_map[i] >= 0
    ])
    want = HybridRetriever(
        want_post, DenseIndex.from_embeddings(emb_alive), embedder,
        kernel="xla",
    ).search(queries, k=10, candidates_per_arm=20)
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-7)


def test_int8_kernel_path_no_leaks(corpus, extra_docs):
    """Quantised main kernel (interpret mode): adds retrievable, deletes
    never surface, filters honored — the serving-kernel configuration."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="int8")
    upd.add_documents(extra_docs)
    upd.delete_ids([2, N + 1])
    queries = synthetic_queries_from_docs(docs, 3, seed=82) + ["freshterm3"]
    got = upd.search(queries, k=10, candidates_per_arm=20)
    surfaced = set(got.ids[got.ids >= 0].ravel().tolist())
    assert surfaced and not (surfaced & {2, N + 1})
    assert (got.ids >= N).any()


def test_pruned_plans_match_oracle(corpus, extra_docs, monkeypatch):
    """Force impact-ordered pruning (as at production corpus scale) so the
    pruned-plan + native-planner machinery runs against the vocab-extended
    main view and the delta segment — results must still equal the oracle
    (pruned top-k is exact for k <= min(M, multi_budget))."""
    import openintel_tpu.models.updatable as upd_mod

    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    upd.delete_ids([4, N + 7])
    monkeypatch.setattr(upd_mod, "auto_prune_m", lambda n, k: max(32, k))
    queries = synthetic_queries_from_docs(docs, 4, seed=83) + ["freshterm0"]
    got = upd.search(queries, k=10, candidates_per_arm=20)
    alive = np.ones(upd.n_docs, bool)
    alive[[4, N + 7]] = False
    want = _oracle(upd).search(
        queries, k=10, candidates_per_arm=20, filter_mask=alive
    )
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-7)


def test_multibatch_chunks_match_big(corpus, extra_docs):
    """The two-segment search honors device_batch: chunked == one batch."""
    docs, postings, dense, embedder = corpus
    big = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    small = UpdatableHybridRetriever(
        postings, dense, embedder, kernel="xla", device_batch=4
    )
    for u in (big, small):
        u.add_documents(extra_docs)
        u.delete_ids([9])
    queries = synthetic_queries_from_docs(docs, 11, seed=84)  # 11 % 4 != 0
    want = big.search(queries, k=10, candidates_per_arm=20)
    got = small.search(queries, k=10, candidates_per_arm=20)
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-6)


def test_concurrent_searches_during_updates(corpus, extra_docs):
    """Serving threads search while adds/deletes land: every search sees
    ONE consistent epoch (no torn state, no crashes), and ids it returns
    were alive in some epoch."""
    import threading

    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    queries = synthetic_queries_from_docs(docs, 3, seed=85)
    errors = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                r = upd.search(queries, k=5, candidates_per_arm=10)
                assert r.ids.shape == (3, 5)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for i in range(0, len(extra_docs), 8):
            upd.add_documents(extra_docs[i : i + 8])
            upd.delete_ids([i])
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors
    assert upd.stats["n_delta"] == len(extra_docs)


def test_compact_in_place_keeps_serving(corpus, extra_docs):
    """compact_in_place swaps the epoch: same results as a fresh retriever
    over compact()'s output, delta emptied, id space renumbered."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    upd.delete_ids([0, N + 1])
    want_post, want_dense, want_map = upd.compact()
    id_map = upd.compact_in_place()
    np.testing.assert_array_equal(id_map, want_map)
    assert upd.stats == {
        "n_main": want_post.n_docs, "n_delta": 0, "n_deleted": 0,
        "n_alive": want_post.n_docs,
    }
    queries = synthetic_queries_from_docs(docs, 4, seed=86)
    got = upd.search(queries, k=10, candidates_per_arm=20)
    # fusion="rrf": upd serves the live path's rank-based fusion
    want = HybridRetriever(
        want_post, want_dense, embedder, kernel="xla", fusion="rrf"
    ).search(
        queries, k=10, candidates_per_arm=20
    )
    np.testing.assert_array_equal(got.ids, want.ids)
    # and the compacted instance still accepts updates
    new = upd.add_documents(["post-compaction document"])
    assert new.tolist() == [want_post.n_docs]


def test_grouped_filters_match_per_mask(corpus, extra_docs):
    """Per-query mask groups on the updatable surface: each query equals
    a separate search with its own mask, across both segments, with
    tombstones composed into every group row."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    upd.delete_ids([7, N + 3])
    n = upd.n_docs
    rng = np.random.default_rng(95)
    masks = np.stack([
        rng.random(n) < 0.5,
        make_filter_mask(n, include_ids=[1, 2, 3, N + 1, N + 5]),  # starves
    ])
    queries = synthetic_queries_from_docs(docs, 6, seed=96)
    groups = np.arange(6, dtype=np.int32) % 2
    got = upd.search(
        queries, k=10, candidates_per_arm=20,
        filter_mask=masks, filter_group=groups,
    )
    for b, q in enumerate(queries):
        want = upd.search(
            [q], k=10, candidates_per_arm=20, filter_mask=masks[groups[b]]
        )
        np.testing.assert_array_equal(got.ids[b], want.ids[0])
        np.testing.assert_allclose(
            got.scores[b], want.scores[0], rtol=1e-5, atol=1e-7
        )
    kept = got.ids[got.ids >= 0]
    assert 7 not in kept and (N + 3) not in kept  # tombstones still win

    # grouped + chunked: small device_batch (padding rows, chunk-local
    # group slices) must equal the single-dispatch result
    small = UpdatableHybridRetriever(
        postings, dense, embedder, kernel="xla", device_batch=4
    )
    small.add_documents(extra_docs)
    small.delete_ids([7, N + 3])
    got_small = small.search(
        queries, k=10, candidates_per_arm=20,
        filter_mask=masks, filter_group=groups,
    )
    np.testing.assert_array_equal(got_small.ids, got.ids)
    np.testing.assert_allclose(got_small.scores, got.scores, rtol=1e-6)


def test_stale_epoch_mask_grace(corpus, extra_docs):
    """Masks (1-D and grouped) built one add earlier pad gracefully (the
    unknown new docs stay excluded); era-mismatched sizes raise the
    renumbering error; scalar masks get a clear validation error."""
    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs[:10])
    n_old = upd.n_docs
    stale_1d = np.ones(n_old, bool)
    stale_2d = np.ones((2, n_old), bool)
    upd.add_documents(extra_docs[10:20])
    queries = synthetic_queries_from_docs(docs, 2, seed=97)
    r1 = upd.search(queries, k=5, filter_mask=stale_1d)
    assert (r1.ids[r1.ids >= 0] < n_old).all()  # new docs excluded
    r2 = upd.search(
        queries, k=5, filter_mask=stale_2d, filter_group=[0, 1]
    )
    assert (r2.ids[r2.ids >= 0] < n_old).all()
    with pytest.raises(ValueError, match="renumbered"):
        upd.search(queries, k=5, filter_mask=np.ones(3, bool))
    with pytest.raises((TypeError, ValueError)):
        upd.search(queries, k=5, filter_mask=True)


def test_single_arm_modes_match_oracle(corpus, extra_docs):
    """mode="bm25" / "dense" on the updatable surface equal the single-arm
    retrievers over the frozen-statistics combined index (with tombstones
    as a filter) — the two-segment merge is arm-generic."""
    from openintel_tpu.models.retrievers import BM25Retriever, DenseRetriever

    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    upd.delete_ids([3, N + 2])
    merged = merge_postings(
        upd.base.bm25.index, upd._st.delta_postings, upd.n_docs
    )
    all_emb = np.concatenate(
        [np.asarray(upd.base.dense.index.embeddings, np.float32),
         upd._st.delta_emb]
    )
    alive = np.ones(upd.n_docs, bool)
    alive[[3, N + 2]] = False
    queries = synthetic_queries_from_docs(docs, 4, seed=98) + ["freshterm1"]

    got_b = upd.search(queries, k=10, mode="bm25")
    want_b = BM25Retriever(merged).search(queries, k=10, filter_mask=alive)
    np.testing.assert_array_equal(got_b.ids, want_b.ids)
    np.testing.assert_allclose(
        got_b.scores, want_b.scores, rtol=1e-5, atol=1e-6
    )

    got_d = upd.search(queries, k=10, mode="dense")
    want_d = DenseRetriever(
        DenseIndex.from_embeddings(all_emb, dtype=upd._store_dtype),
        embedder, kernel="xla",
    ).search(queries, k=10, filter_mask=alive)
    np.testing.assert_array_equal(got_d.ids, want_d.ids)
    np.testing.assert_allclose(
        got_d.scores, want_d.scores, rtol=1e-4, atol=1e-5
    )

    # no updates at all: modes delegate to the base single-arm surfaces
    clean = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    got = clean.search(queries, k=5, mode="bm25")
    want = BM25Retriever(postings).search(queries, k=5)
    np.testing.assert_array_equal(got.ids, want.ids)


def test_concurrent_searches_during_compaction(corpus, extra_docs):
    """The riskiest swap — compact_in_place replacing the BASE segment —
    under concurrent search load: every search completes on ONE epoch
    (old or new), no crashes, no torn state."""
    import threading

    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs[:20])
    queries = synthetic_queries_from_docs(docs, 3, seed=99)
    errors = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                r = upd.search(queries, k=5, candidates_per_arm=10)
                assert r.ids.shape == (3, 5)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        for round_i in range(3):
            upd.delete_ids([round_i])
            upd.compact_in_place()
            upd.add_documents(extra_docs[20 + round_i : 21 + round_i])
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors
    assert upd.stats["n_deleted"] == 0  # compactions folded them


def test_reranker_composes_with_updatable():
    """--rerank + --updatable: the cross-encoder second stage runs over
    the EPOCH's snippet store, including freshly added docs."""
    from openintel_tpu.mcp.tools import run_search_corpus

    docs = [f"document number {i} about topic{i % 3}" for i in range(12)]
    emb = HashingEmbedder(dim=32)
    upd = UpdatableHybridRetriever(
        build_postings_index(docs),
        DenseIndex.from_embeddings(emb(docs)), emb, kernel="xla",
        doc_store=docs,
    )
    upd.add_documents(["fresh topic1 addendum"])

    class FakeReranker:  # identity scores: proves the plumbing only
        def rerank(self, queries, cand_texts, ids, first_stage_weight=0.0):
            scores = np.array(
                [
                    [float(len(t)) for t in row]  # longer text ranks higher
                    for row in cand_texts
                ],
                np.float32,
            )
            order = np.argsort(-scores, axis=1, kind="stable")
            return (
                np.take_along_axis(scores, order, axis=1),
                np.take_along_axis(np.asarray(ids), order, axis=1),
            )

    out = run_search_corpus(
        {"queries": ["topic1"], "k": 4}, upd, None, reranker=FakeReranker()
    )
    hits = out["results"][0]["hits"]
    assert hits and all("text" in h for h in hits)
    # the fresh doc's text reached the reranker via the EPOCH store
    assert any(h["doc_id"] == 12 for h in hits)


@pytest.mark.skipif(
    __import__("jax").device_count() < 8, reason="needs 8 virtual devices"
)
def test_compact_output_serves_sharded(corpus, extra_docs):
    """The documented production path (spec 'Not in scope'): compact()'s
    output loads straight into the multi-chip component and serves
    bit-identically to a single-chip retriever over the same segment."""
    from openintel_tpu.parallel.retriever import ShardedHybridRetriever

    docs, postings, dense, embedder = corpus
    upd = UpdatableHybridRetriever(postings, dense, embedder, kernel="xla")
    upd.add_documents(extra_docs)
    upd.delete_ids([2, N + 4])
    cpost, cdense, _ = upd.compact()
    queries = synthetic_queries_from_docs(docs, 5, seed=100)
    sharded = ShardedHybridRetriever(
        cpost, cdense, embedder, data=2, corpus=4, kernel="xla",
        block_size=128,
    )
    got = sharded.search(queries, k=10, candidates_per_arm=20)
    want = HybridRetriever(cpost, cdense, embedder, kernel="xla").search(
        queries, k=10, candidates_per_arm=20
    )
    np.testing.assert_array_equal(got.ids, want.ids)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-6)

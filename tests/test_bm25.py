"""BM25: index build, reference scorer, and device parity."""

import numpy as np

from openintel_tpu.index.build import bm25_idf, build_postings_index
from openintel_tpu.ops import reference as ref
from openintel_tpu.ops.bm25 import (
    bm25_scores_device,
    bm25_topk,
    build_query_plan,
    encode_query,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick red fox",
    "lazy dogs sleep all day",
    "quick quick quick repetition",
    "completely unrelated text about markets",
    "fox dog fox dog fox",
]


def test_index_build_stats():
    idx = build_postings_index(DOCS)
    assert idx.n_docs == 6
    assert idx.doc_len[0] == 9
    assert idx.avgdl == np.mean([9, 4, 5, 4, 5, 5])
    fox_id = idx.vocab.token_to_id["fox"]
    ids, impacts = idx.postings(fox_id)
    np.testing.assert_array_equal(ids, [0, 1, 5])  # ascending doc ids
    assert idx.df[fox_id] == 3
    # idf formula
    np.testing.assert_allclose(
        idx.idf[fox_id], np.log1p((6 - 3 + 0.5) / (3 + 0.5)), rtol=1e-6
    )
    # impacts grow with tf but saturate
    assert impacts[2] > impacts[0]  # tf 3 in doc 5 vs tf 1 in doc 0


def test_idf_monotone_decreasing_in_df():
    idf = bm25_idf(np.array([1, 2, 5, 10]), 10)
    assert np.all(np.diff(idf) < 0)
    assert np.all(idf > 0)


def test_reference_scores_favor_matching_docs():
    idx = build_postings_index(DOCS)
    q = encode_query(idx, "quick fox")
    scores = ref.bm25_scores(idx, q)
    assert scores.shape == (6,)
    assert scores[1] > scores[2]  # doc 1 has both terms, doc 2 neither
    assert scores[4] == 0.0
    vals, ids = ref.bm25_topk(idx, q, 3)
    assert ids[0] in (0, 1, 5)


def test_device_scores_match_reference_exactly():
    idx = build_postings_index(DOCS)
    queries = ["quick fox", "lazy dog sleeps", "unrelated markets", "zzz unknown"]
    term_ids = [encode_query(idx, q) for q in queries]
    plan = build_query_plan(idx, term_ids)
    device = np.asarray(bm25_scores_device(plan.doc_ids, plan.weights, plan.n_docs))
    for b, tids in enumerate(term_ids):
        expected = ref.bm25_scores(idx, tids)
        np.testing.assert_allclose(device[b], expected, rtol=1e-6, atol=1e-7)


def test_device_topk_matches_reference_order():
    idx = build_postings_index(DOCS)
    queries = ["quick fox", "the dog", "quick quick", "zzz unknown"]
    term_ids = [encode_query(idx, q) for q in queries]
    vals, ids = bm25_topk(idx, term_ids, 4)
    for b, tids in enumerate(term_ids):
        rv, ri = ref.bm25_topk(idx, tids, 4)
        np.testing.assert_allclose(vals[b], rv, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(ids[b], ri)
    # the unknown-term query ranks nothing: all padding
    assert (ids[3] == -1).all() and (vals[3] == 0.0).all()


def test_repeated_query_terms_weight_by_qtf():
    idx = build_postings_index(DOCS)
    q1 = encode_query(idx, "fox")
    q2 = encode_query(idx, "fox fox")
    s1 = ref.bm25_scores(idx, q1)
    s2 = ref.bm25_scores(idx, q2)
    np.testing.assert_allclose(s2, 2 * s1, rtol=1e-6)


def test_scale_parity_on_synthetic_corpus():
    from openintel_tpu.index.synthetic import (
        synthetic_queries_from_docs,
        synthetic_token_corpus,
    )

    docs = synthetic_token_corpus(500, vocab_size=2000, seed=7)
    idx = build_postings_index(docs)
    queries = synthetic_queries_from_docs(docs, 8, seed=8)
    term_ids = [encode_query(idx, q) for q in queries]
    vals, ids = bm25_topk(idx, term_ids, 10)
    for b, tids in enumerate(term_ids):
        rv, ri = ref.bm25_topk(idx, tids, 10)
        np.testing.assert_allclose(vals[b], rv, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(ids[b], ri)


def test_pruned_plan_keeps_recall_on_topk():
    """Impact-ordered top-M pruning: recall@10 vs exact BM25 stays high."""
    from openintel_tpu.index.synthetic import (
        synthetic_queries_from_docs,
        synthetic_token_corpus,
    )
    from openintel_tpu.ops.bm25 import bm25_topk_device

    docs = synthetic_token_corpus(3000, vocab_size=1500, seed=21)
    idx = build_postings_index(docs)
    queries = synthetic_queries_from_docs(docs, 16, seed=22)
    term_ids = [encode_query(idx, q) for q in queries]

    exact_plan = build_query_plan(idx, term_ids)
    pruned_plan = build_query_plan(idx, term_ids, max_postings_per_term=256)
    assert pruned_plan.doc_ids.shape[1] <= exact_plan.doc_ids.shape[1]

    ve, ie = bm25_topk_device(exact_plan.doc_ids, exact_plan.weights, idx.n_docs, 10)
    vp, ip = bm25_topk_device(pruned_plan.doc_ids, pruned_plan.weights, idx.n_docs, 10)
    import numpy as np

    recalls = []
    for b in range(16):
        exact_set = {i for i in np.asarray(ie)[b] if i >= 0}
        pruned_set = {i for i in np.asarray(ip)[b] if i >= 0}
        if exact_set:
            recalls.append(len(exact_set & pruned_set) / len(exact_set))
    # This synthetic corpus is the worst case for impact pruning (near-flat
    # impacts: tf mostly 1, mild length variance) — recall still degrades
    # gracefully, and a large-enough M is lossless (checked below).
    assert np.mean(recalls) > 0.6

    lossless = build_query_plan(idx, term_ids, max_postings_per_term=idx.n_docs)
    vl, il = bm25_topk_device(lossless.doc_ids, lossless.weights, idx.n_docs, 10)
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ie))
    np.testing.assert_allclose(np.asarray(vl), np.asarray(ve), rtol=1e-6)


def test_multi_term_overlap_rescues_pruned_recall():
    """Pruning drops multi-term docs from every list; include_multi_term
    forces them back (WAND-style candidate generation)."""
    from openintel_tpu.index.synthetic import synthetic_postings_index
    from openintel_tpu.ops.bm25 import bm25_topk_device

    idx = synthetic_postings_index(20_000, vocab_size=300, mean_len=12, seed=41)
    rng = np.random.default_rng(42)
    term_ids = [list(rng.integers(1, 40, size=3)) for _ in range(12)]  # frequent terms

    def recall(plan):
        _, ids = bm25_topk_device(
            plan.doc_ids, plan.weights, idx.n_docs, 10,
            presorted=plan.presorted, max_run=plan.max_terms,
        )
        recs = []
        for b, tids in enumerate(term_ids):
            _, ri = ref.bm25_topk(idx, tids, 10)
            exact = {int(x) for x in ri if x >= 0}
            got = {int(x) for x in np.asarray(ids)[b] if x >= 0}
            if exact:
                recs.append(len(exact & got) / len(exact))
        return float(np.mean(recs))

    bare = build_query_plan(
        idx, term_ids, max_postings_per_term=64, include_multi_term=False
    )
    aug = build_query_plan(idx, term_ids, max_postings_per_term=64)
    r_bare, r_aug = recall(bare), recall(aug)
    assert r_aug > r_bare
    # exactness argument: k=10 <= min(M=64, multi_budget): a true top-k
    # single-term doc sits in its term's top-k impacts; a true top-k
    # multi-term doc sits in the top-k multi docs by true score
    assert r_aug >= 0.99, (r_bare, r_aug)
    # returned top-k docs carry their EXACT scores: single-term docs have
    # their one posting; forced multi docs have all their postings (docs
    # partially pruned may sit in the plan with partial scores, but they
    # can never reach the top-k past the exact candidates)
    vals, ids = bm25_topk_device(
        aug.doc_ids, aug.weights, idx.n_docs, 10,
        presorted=aug.presorted, max_run=aug.max_terms,
    )
    for b, tids in enumerate(term_ids[:4]):
        exact_scores = ref.bm25_scores(idx, tids)
        for v, doc in zip(np.asarray(vals)[b], np.asarray(ids)[b]):
            if doc >= 0:
                np.testing.assert_allclose(v, exact_scores[doc], rtol=1e-4)


def test_presorted_plan_matches_device_sort_path():
    """Host-sorted plans (production) == device-sort path, bit for bit."""
    from openintel_tpu.index.synthetic import (
        synthetic_queries_from_docs,
        synthetic_token_corpus,
    )
    from openintel_tpu.ops.bm25 import bm25_topk_device

    docs = synthetic_token_corpus(1000, vocab_size=800, seed=31)
    idx = build_postings_index(docs)
    queries = synthetic_queries_from_docs(docs, 8, seed=32)
    term_ids = [encode_query(idx, q) for q in queries]

    p_sorted = build_query_plan(idx, term_ids)  # sort=True default
    p_raw = build_query_plan(idx, term_ids, sort=False)
    assert p_sorted.presorted and not p_raw.presorted
    # host-sorted rows really are ascending (sentinel pads at the end)
    assert (np.diff(p_sorted.doc_ids, axis=1) >= 0).all()

    vs, is_ = bm25_topk_device(
        p_sorted.doc_ids, p_sorted.weights, idx.n_docs, 10, presorted=True
    )
    vr, ir = bm25_topk_device(p_raw.doc_ids, p_raw.weights, idx.n_docs, 10)
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ir))
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vr), rtol=1e-6)
    # and both match the NumPy oracle
    for b, tids in enumerate(term_ids):
        rv, ri = ref.bm25_topk(idx, tids, 10)
        np.testing.assert_array_equal(np.asarray(is_)[b], ri)


def test_impact_order_sorted_desc_with_id_ties():
    idx = build_postings_index(DOCS)
    fox = idx.vocab.token_to_id["fox"]
    ids, impacts = idx.pruned_postings(fox, 100)
    import numpy as np

    assert (np.diff(impacts) <= 1e-9).all()  # descending impact
    ids1, _ = idx.pruned_postings(fox, 1)
    assert len(ids1) == 1


def test_pruning_exact_at_small_m():
    """The exactness argument: pruned top-k == unpruned top-k whenever
    k <= min(M, multi_budget) — even at tight M (the production config runs
    M=128 for k=32; round 1 over-provisioned at M=1024)."""
    from openintel_tpu.index.synthetic import (
        synthetic_queries_from_docs,
        synthetic_token_corpus,
    )
    from openintel_tpu.index.build import build_postings_index
    from openintel_tpu.ops.bm25 import (
        bm25_topk_device,
        build_query_plan,
        encode_query,
    )

    docs = synthetic_token_corpus(3000, vocab_size=300, seed=77)  # df >> M
    idx = build_postings_index(docs)
    queries = synthetic_queries_from_docs(docs, 16, seed=78)
    term_ids = [encode_query(idx, q) for q in queries]
    assert max(int(idx.df[t]) for ts in term_ids for t in ts) > 64

    exact_plan = build_query_plan(idx, term_ids)
    ve, ie = bm25_topk_device(
        exact_plan.doc_ids, exact_plan.weights, idx.n_docs, 16,
        presorted=exact_plan.presorted, max_run=exact_plan.max_terms,
    )
    for m in (16, 32, 64):
        plan = build_query_plan(
            idx, term_ids, max_postings_per_term=m, multi_budget=256
        )
        vp, ip = bm25_topk_device(
            plan.doc_ids, plan.weights, idx.n_docs, 16,
            presorted=plan.presorted, max_run=plan.max_terms,
        )
        vp, ip = np.asarray(vp), np.asarray(ip)
        # Exactness under floats: the selected SCORES equal the true top-k
        # scores everywhere, and every doc strictly above the k-th boundary
        # is present. (Docs exactly TIED at the boundary may legitimately
        # differ: the C++ planner's f32 multiply order wobbles scores ~1 ULP
        # vs the numpy plan, re-cutting the tie cluster.)
        np.testing.assert_allclose(vp, np.asarray(ve), rtol=1e-5, atol=1e-6)
        for b in range(len(term_ids)):
            boundary = np.asarray(ve)[b, -1]
            tol = 1e-6 + 1e-5 * abs(boundary)
            must = {
                int(i)
                for i, v in zip(np.asarray(ie)[b], np.asarray(ve)[b])
                if v > boundary + tol
            }
            got = {int(i) for i in ip[b]}
            assert must <= got, (m, b, must - got)

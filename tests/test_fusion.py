"""Fusion ops (RRF + z-blend): device vs NumPy reference, dedupe and
tie-break semantics."""

import numpy as np

from openintel_tpu.ops import reference as ref
from openintel_tpu.ops.fusion import rrf_fuse_device, zblend_fuse_device


def test_rrf_reference_basic():
    a = np.array([3, 1, 2], np.int32)
    b = np.array([1, 3, 9], np.int32)
    vals, ids = ref.rrf_fuse([a, b], k=4)
    # doc 3: 1/61 + 1/62 ; doc 1: 1/62 + 1/61 -> tie, doc 1 wins by id
    assert ids[0] == 1 and ids[1] == 3
    assert vals[0] == vals[1]
    assert ids[2] == 2  # 1/63 beats 1/63? doc 2: 1/63, doc 9: 1/63 -> tie, id 2 wins
    assert ids[3] == 9


def test_device_matches_reference_randomized():
    rng = np.random.default_rng(0)
    B, K = 16, 10
    for trial in range(5):
        ids_a = np.stack(
            [rng.choice(100, size=K, replace=False) for _ in range(B)]
        ).astype(np.int32)
        ids_b = np.stack(
            [rng.choice(100, size=K, replace=False) for _ in range(B)]
        ).astype(np.int32)
        dv, di = rrf_fuse_device(ids_a, ids_b, k=K)
        rv, ri = ref.rrf_fuse([ids_a, ids_b], k=K)
        np.testing.assert_allclose(np.asarray(dv), rv, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(di), ri)


def test_device_dedupes_shared_docs():
    a = np.array([[5, 6, 7]], np.int32)
    b = np.array([[5, 8, 6]], np.int32)
    vals, ids = rrf_fuse_device(a, b, k=5)
    ids = np.asarray(ids)[0]
    # doc 5 appears once with summed contribution, not twice
    assert list(ids).count(5) == 1
    assert ids[0] == 5  # rank 1 in both lists -> highest fused score
    rv, ri = ref.rrf_fuse([a, b], k=5)
    np.testing.assert_array_equal(ids, ri[0])


def test_device_handles_padding_ids():
    a = np.array([[4, -1, -1]], np.int32)
    b = np.array([[-1, -1, -1]], np.int32)
    vals, ids = rrf_fuse_device(a, b, k=3)
    ids = np.asarray(ids)[0]
    vals = np.asarray(vals)[0]
    assert ids[0] == 4 and vals[0] > 0
    assert (ids[1:] == -1).all() and (vals[1:] == 0).all()


def test_rrf_pads_when_k_exceeds_candidate_pool():
    """k > Ka+Kb must return the reference's -1-padded (B, k) contract — a
    short array crashes run_prepared's reshape downstream (review
    finding)."""
    import jax.numpy as jnp
    import numpy as np

    from openintel_tpu.ops.fusion import rrf_fuse_device

    a = jnp.asarray([[3, 1], [0, -1]], jnp.int32)
    b = jnp.asarray([[1, 2], [-1, -1]], jnp.int32)
    vals, ids = rrf_fuse_device(a, b, k=7)
    assert np.asarray(ids).shape == (2, 7)
    row0 = list(np.asarray(ids)[0])
    assert row0[:3] and set(row0[:3]) == {1, 2, 3}
    assert row0[3:] == [-1] * 4
    assert list(np.asarray(ids)[1][1:]) == [-1] * 6
    assert (np.asarray(vals)[np.asarray(ids) == -1] == 0.0).all()


def _ranked_scored(rng, B, K, pool=100):
    ids = np.stack(
        [rng.choice(pool, size=K, replace=False) for _ in range(B)]
    ).astype(np.int32)
    vals = np.sort(
        rng.normal(size=(B, K)).astype(np.float32), axis=1
    )[:, ::-1].copy()
    return vals, ids


def test_zblend_device_matches_reference_randomized():
    rng = np.random.default_rng(1)
    B, K = 16, 10
    for alpha in (0.3, 0.5, 0.7):
        va, ia = _ranked_scored(rng, B, K)
        vb, ib = _ranked_scored(rng, B, K)
        dv, di = zblend_fuse_device(va, ia, vb, ib, k=K, alpha=alpha)
        rv, ri = ref.zblend_fuse(va, ia, vb, ib, k=K, alpha=alpha)
        np.testing.assert_array_equal(np.asarray(di), ri)
        np.testing.assert_allclose(np.asarray(dv), rv, rtol=1e-4, atol=1e-5)


def test_zblend_deterministic_tie_break_by_doc_id():
    """Two candidates with identical fused scores order by ascending doc
    id — the same determinism contract as RRF (VERDICT r4 item 4)."""
    # Disjoint arms, symmetric scores: docs 7 and 2 both score z_max in one
    # arm and take the other arm's min-z fill -> exact fused tie.
    va = np.array([[4.0, 1.0]], np.float32)
    ia = np.array([[7, 30]], np.int32)
    vb = np.array([[4.0, 1.0]], np.float32)
    ib = np.array([[2, 40]], np.int32)
    vals, ids = zblend_fuse_device(va, ia, vb, ib, k=4, alpha=0.5)
    vals, ids = np.asarray(vals)[0], np.asarray(ids)[0]
    assert vals[0] == vals[1]
    assert ids[0] == 2 and ids[1] == 7  # tie -> ascending doc id
    assert vals[2] == vals[3] and ids[2] == 30 and ids[3] == 40


def test_zblend_shared_doc_scores_once_per_arm():
    """A doc in both arms gets alpha*z_a + (1-alpha)*z_b, deduped."""
    va = np.array([[3.0, 1.0, 0.5]], np.float32)
    ia = np.array([[5, 6, 7]], np.int32)
    vb = np.array([[2.0, 1.5, 0.0]], np.float32)
    ib = np.array([[5, 8, 6]], np.int32)
    vals, ids = zblend_fuse_device(va, ia, vb, ib, k=6)
    ids = np.asarray(ids)[0]
    assert list(ids).count(5) == 1
    assert ids[0] == 5  # best in both arms -> best fused
    rv, ri = ref.zblend_fuse(va, ia, vb, ib, k=6)
    np.testing.assert_array_equal(ids, ri[0])


def test_zblend_padding_and_empty_arm():
    va = np.array([[2.0, -np.inf, -np.inf]], np.float32)
    ia = np.array([[4, -1, -1]], np.int32)
    vb = np.array([[-np.inf] * 3], np.float32)
    ib = np.array([[-1, -1, -1]], np.int32)
    vals, ids = zblend_fuse_device(va, ia, vb, ib, k=3)
    ids, vals = np.asarray(ids)[0], np.asarray(vals)[0]
    assert ids[0] == 4 and np.isfinite(vals[0])
    assert (ids[1:] == -1).all() and (vals[1:] == 0).all()


def test_hybrid_zblend_end_to_end_and_filtered():
    """fusion='zblend' serves the same surfaces as RRF: plain, filtered
    (compact carries scores through), and the starved-fallback path."""
    from openintel_tpu.models.retrievers import HybridRetriever

    texts = [f"word{i} alpha common beta{i % 7}" for i in range(80)]
    r = HybridRetriever.build(texts, fusion="zblend", dim=64)
    res = r.search(["alpha common", "word3 beta3"], k=5)
    assert res.ids.shape == (2, 5)
    assert 3 in res.ids[1]
    # filtered: even docs only
    mask = np.zeros(80, bool)
    mask[::2] = True
    resf = r.search(["word3 beta3"], k=5, filter_mask=mask)
    kept = resf.ids[0][resf.ids[0] >= 0]
    assert kept.size and (kept % 2 == 0).all()
    # tiny include-list starves the over-fetch pool -> exact fallback
    tiny = np.zeros(80, bool)
    tiny[[2, 4]] = True
    rest = r.search(["alpha common"], k=5, filter_mask=tiny)
    kept = rest.ids[0][rest.ids[0] >= 0]
    assert set(kept) <= {2, 4} and kept.size


def test_hybrid_rejects_unknown_fusion():
    import pytest

    from openintel_tpu.models.retrievers import HybridRetriever

    with pytest.raises(ValueError, match="unknown fusion"):
        HybridRetriever.build(["a b c"], fusion="combsum")


def test_hybrid_serves_candidates_smaller_than_half_k():
    """End-to-end: candidates_per_arm with 2*c < k must serve, -1 padded
    (the pre-fix crash repro: reshape of a short fused array)."""
    from openintel_tpu.models.retrievers import HybridRetriever

    texts = [f"word{i} alpha common" for i in range(50)]
    r = HybridRetriever.build(texts)
    res = r.search(["alpha common"], k=10, candidates_per_arm=4)
    assert res.ids.shape == (1, 10)
    real = res.ids[0][res.ids[0] >= 0]
    assert 1 <= len(real) <= 8

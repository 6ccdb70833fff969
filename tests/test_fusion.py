"""RRF fusion: device vs NumPy reference, dedupe and tie-break semantics."""

import numpy as np

from openintel_tpu.ops import reference as ref
from openintel_tpu.ops.fusion import rrf_fuse_device


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

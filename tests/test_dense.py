"""Dense cosine top-k: XLA blockwise vs flat vs NumPy reference."""

import numpy as np

from openintel_tpu.index.synthetic import (
    synthetic_embeddings,
    synthetic_query_embeddings,
)
from openintel_tpu.ops import reference as ref
from openintel_tpu.ops.dense import dense_topk_flat, dense_topk_xla, l2_normalize


def test_blockwise_matches_reference_exact_f32():
    emb = synthetic_embeddings(1000, dim=64, seed=0)
    q, _ = synthetic_query_embeddings(emb, 8, seed=1)
    vals, ids = dense_topk_xla(emb, q, k=10, block_size=256)
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 10)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


def test_blockwise_handles_non_divisible_corpus():
    emb = synthetic_embeddings(777, dim=32, seed=2)
    q, _ = synthetic_query_embeddings(emb, 3, seed=3)
    vals, ids = dense_topk_xla(emb, q, k=5, block_size=256)
    ref_vals, ref_ids = ref.cosine_topk(emb, q, 5)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    assert np.asarray(ids).max() < 777  # padding rows never surface


def test_blockwise_matches_flat():
    emb = synthetic_embeddings(512, dim=128, seed=4)
    q, _ = synthetic_query_embeddings(emb, 16, seed=5)
    v1, i1 = dense_topk_xla(emb, q, k=7, block_size=128)
    v2, i2 = dense_topk_flat(emb, q, k=7)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_self_query_ranks_self_first():
    emb = synthetic_embeddings(300, dim=48, seed=6)
    q = emb[:4]  # exact doc vectors
    _, ids = dense_topk_xla(emb, q, k=1, block_size=128)
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], [0, 1, 2, 3])


def test_k_larger_than_corpus_clamps():
    emb = synthetic_embeddings(5, dim=16, seed=7)
    q = emb[:2]
    vals, ids = dense_topk_xla(emb, q, k=10, block_size=128)
    assert np.asarray(vals).shape == (2, 5)


def test_l2_normalize():
    x = np.array([[3.0, 4.0], [0.0, 0.0]], np.float32)
    n = np.asarray(l2_normalize(x))
    np.testing.assert_allclose(n[0], [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(n[1], [0.0, 0.0])


def test_bf16_storage_recall_close_to_f32():
    """bf16 corpus storage must keep recall@10 near f32 (mixed-precision gate,
    SURVEY.md hard part (e))."""
    import jax.numpy as jnp

    emb = synthetic_embeddings(2000, dim=64, seed=8)
    q, _ = synthetic_query_embeddings(emb, 16, noise=0.4, seed=9)
    _, ids32 = dense_topk_xla(emb, q, k=10, block_size=512)
    _, ids16 = dense_topk_xla(jnp.asarray(emb, jnp.bfloat16), q.astype(np.float32), k=10, block_size=512)
    overlap = [
        len(set(np.asarray(ids32)[i]) & set(np.asarray(ids16)[i])) / 10
        for i in range(16)
    ]
    assert np.mean(overlap) > 0.9

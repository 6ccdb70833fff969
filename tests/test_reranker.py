"""Cross-encoder reranker: scoring shapes, padding, training, and end-to-end
improvement over a poisoned first-stage ranking (hermetic CPU, tiny config)."""

import numpy as np

from openintel_tpu.models.encoder import EncoderConfig
from openintel_tpu.models.reranker import CrossEncoderReranker, train_reranker

CFG = EncoderConfig(vocab_size=256, dim=32, depth=1, heads=2, max_len=32)
TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "lazy dogs sleep all day long in the sun",
    "market speculation calls puts options yolo",
    "earnings report scheduled for tuesday morning",
    "rocket moon breakout bull run momentum",
    "bearish drill crash dump sell everything",
] * 2


def test_rerank_shapes_and_padding_last():
    rr = CrossEncoderReranker(CFG)
    ids = np.array([[0, 1, -1]])
    scores, out = rr.rerank(
        ["quick fox"], [[TEXTS[0], TEXTS[1], ""]], ids
    )
    assert out.shape == (1, 3)
    assert out[0, 2] == -1  # padding stays at the tail
    assert set(out[0, :2].tolist()) == {0, 1}


def test_training_reduces_listwise_loss():
    """Compare a FIXED eval batch before vs after training (running losses
    are stochastic-batch noisy at this scale)."""
    import jax

    from openintel_tpu.models.reranker import listwise_loss

    rr0 = CrossEncoderReranker(CFG, seed=1)
    queries = ["quick brown fox", "lazy dogs sun", "calls puts yolo"]
    cands = [
        [TEXTS[0], TEXTS[3], TEXTS[5]],
        [TEXTS[1], TEXTS[2], TEXTS[4]],
        [TEXTS[2], TEXTS[0], TEXTS[3]],
    ]
    ids, mask = rr0.encode_pairs(queries, cands)
    l0 = float(listwise_loss(rr0.params, rr0.head, CFG, ids, mask, 3))
    rr, _ = train_reranker(
        TEXTS, CFG, steps=20, k=3, batch_queries=6, lr=3e-3, seed=1
    )
    l1 = float(listwise_loss(rr.params, rr.head, CFG, ids, mask, 3))
    assert l1 < l0, (l0, l1)


def test_trained_reranker_prefers_positive():
    rr, _ = train_reranker(
        TEXTS, CFG, steps=25, k=3, batch_queries=6, lr=3e-3, seed=2
    )
    # first-stage order deliberately wrong: positive (doc 0) listed last
    q = "quick brown fox"
    cands = [TEXTS[3], TEXTS[5], TEXTS[0]]
    ids = np.array([[3, 5, 0]])
    _, out = rr.rerank([q], [cands], ids)
    # the token-overlap positive should rise toward the front
    assert list(out[0]).index(0) <= 1

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
    """Window means of the running training loss (single fixed eval
    batches are noise-dominated at this 6-doc scale, especially under
    the mixed hard/random negative distribution)."""
    rr, losses = train_reranker(
        TEXTS, CFG, steps=60, k=3, batch_queries=6, lr=3e-3, seed=1
    )
    first, last = np.mean(losses[:15]), np.mean(losses[-15:])
    assert last < first - 0.05, (first, last)


def test_first_stage_blend_prior():
    """first_stage_weight=1.0 must reproduce the first-stage order exactly
    (the reciprocal-rank prior dominates); 0.0 is the pure cross-encoder.
    Padding stays at the tail in both."""
    rr = CrossEncoderReranker(CFG, seed=3)
    ids = np.array([[7, 3, 9, -1]])
    cands = [[TEXTS[1], TEXTS[2], TEXTS[4], ""]]
    _, out_prior = rr.rerank(["lazy dogs"], cands, ids, first_stage_weight=1.0)
    assert out_prior[0].tolist() == [7, 3, 9, -1]
    scores, out_pure = rr.rerank(["lazy dogs"], cands, ids)
    assert out_pure[0, 3] == -1  # padding last regardless of blend
    # half blend is a strict interpolation: it can only produce orders
    # between the two extremes; sanity-check it runs and pads correctly
    _, out_half = rr.rerank(["lazy dogs"], cands, ids, first_stage_weight=0.5)
    assert out_half[0, 3] == -1
    assert set(out_half[0, :3].tolist()) == {7, 3, 9}


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

"""Encoder training loop: loss goes down, checkpoints roundtrip, resume works,
trained embedder plugs into the retriever (hermetic CPU, tiny config)."""

import jax
import numpy as np

from openintel_tpu.models.checkpoint import load_meta, load_params, save_params
from openintel_tpu.models.encoder import EncoderConfig, init_params
from openintel_tpu.models.train import load_embedder, train_encoder

CFG = EncoderConfig(vocab_size=256, dim=32, depth=1, heads=2, max_len=16)
TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "lazy dogs sleep all day long in the sun",
    "market speculation calls puts options yolo",
    "earnings report scheduled for tuesday morning",
    "rocket moon breakout bull run momentum",
    "bearish drill crash dump sell everything",
] * 3


def test_training_reduces_loss():
    res = train_encoder(TEXTS, CFG, steps=15, batch_size=6, lr=3e-3, seed=1)
    assert len(res.losses) == 15
    assert np.mean(res.losses[-5:]) < np.mean(res.losses[:5])


def test_checkpoint_roundtrip_exact(tmp_path):
    params = init_params(jax.random.PRNGKey(3), CFG)
    save_params(params, tmp_path / "enc", config=CFG, step=7)
    loaded = load_params(params, tmp_path / "enc")
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_meta(tmp_path / "enc")["step"] == 7
    assert load_meta(tmp_path / "enc")["config"]["dim"] == CFG.dim


def test_resume_continues_from_checkpoint(tmp_path):
    train_encoder(
        TEXTS, CFG, steps=6, batch_size=4, seed=2, ckpt_dir=tmp_path, ckpt_every=3
    )
    logs = []
    res = train_encoder(
        TEXTS, CFG, steps=10, batch_size=4, seed=2,
        ckpt_dir=tmp_path, ckpt_every=100, log=logs.append,
    )
    assert any("resumed from step 6" in m for m in logs)
    assert len(res.losses) == 4  # only steps 6..9 run
    assert load_meta(tmp_path / "encoder")["step"] == 10


def test_trained_embedder_serves_retrieval(tmp_path):
    train_encoder(TEXTS, CFG, steps=4, batch_size=4, seed=4, ckpt_dir=tmp_path)
    emb = load_embedder(tmp_path)
    from openintel_tpu.models.retrievers import HybridRetriever

    r = HybridRetriever.build(TEXTS[:6], embedder=emb, dim=CFG.dim)
    res = r.search(["lazy dog"], k=2)
    assert res.ids.shape == (1, 2) and res.ids[0, 0] in (0, 1)

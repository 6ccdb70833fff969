"""Neural encoder: shapes, masking, training steps, TP sharding, retriever
plug-in. All hermetic on CPU with a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openintel_tpu.models.encoder import (
    EncoderConfig,
    NeuralEmbedder,
    analyzer_logits,
    distill_loss,
    encode,
    info_nce_loss,
    init_analyzer_head,
    init_params,
    param_partition_specs,
    sgd_train_step,
)

CFG = EncoderConfig(vocab_size=512, dim=32, depth=2, heads=2, max_len=16)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def _batch(rng, b, s):
    ids = rng.integers(1, CFG.vocab_size, size=(b, s)).astype(np.int32)
    lens = rng.integers(1, s + 1, size=b)
    mask = np.arange(s)[None] < lens[:, None]
    ids = np.where(mask, ids, 0)
    return jnp.asarray(ids), jnp.asarray(mask)


def test_encode_unit_norm_and_shape(params):
    ids, mask = _batch(np.random.default_rng(1), 5, 12)
    e = encode(params, CFG, ids, mask)
    assert e.shape == (5, CFG.dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=1), 1.0, rtol=1e-4)


def test_padding_invariance(params):
    """Extra padding columns must not change the embedding (mask works)."""
    rng = np.random.default_rng(2)
    ids, mask = _batch(rng, 3, 8)
    pad = jnp.zeros((3, 4), jnp.int32)
    padf = jnp.zeros((3, 4), bool)
    e1 = encode(params, CFG, ids, mask)
    e2 = encode(params, CFG, jnp.concatenate([ids, pad], 1), jnp.concatenate([mask, padf], 1))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_contrastive_training_reduces_loss(params):
    rng = np.random.default_rng(3)
    d_ids, d_mask = _batch(rng, 8, 12)
    # queries = prefixes of their positive docs
    q_ids = jnp.where(jnp.arange(12)[None] < 5, d_ids, 0)
    q_mask = d_mask & (jnp.arange(12)[None] < 5)
    batch = (q_ids, q_mask, d_ids, d_mask)
    step = jax.jit(lambda p, b: sgd_train_step(p, CFG, b, lr=0.05))
    p = params
    l0 = float(info_nce_loss(p, CFG, *batch))
    for _ in range(10):
        p, loss = step(p, batch)
    assert float(loss) < l0


def test_analyzer_head_distills_lexicon(params):
    from openintel_tpu.models.lexicon import score_texts

    texts = [
        "moon rocket calls yolo",
        "puts crash drill bearish",
        "earnings report scheduled today",
        "bull run breakout calls",
        "dump bagholder sell off",
    ]
    signals = score_texts(texts)
    emb = NeuralEmbedder(CFG, params)
    ids, mask = emb.tokenize(texts)
    tp = jnp.asarray([float(s.polarity.value) for s in signals])
    ts = jnp.asarray([1.0 if s.speculative else 0.0 for s in signals])
    head = init_analyzer_head(jax.random.PRNGKey(1), CFG)

    loss_fn = lambda h: distill_loss(params, h, CFG, ids, mask, tp, ts)
    l0 = float(loss_fn(head))
    g = jax.jit(jax.grad(loss_fn))
    for _ in range(30):
        head = jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, head, g(head))
    assert float(loss_fn(head)) < l0
    out = analyzer_logits(params, head, CFG, ids, mask)
    assert out.shape == (5, 2)


def test_tensor_parallel_encode_on_mesh(params):
    """TP-sharded params + DP batch on the 8-device virtual mesh; XLA
    derives the collectives from the shardings."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "corpus"))  # "corpus" doubles as model axis
    specs = param_partition_specs(CFG, model_axis="corpus")
    sharded = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    ids, mask = _batch(np.random.default_rng(5), 8, 16)
    ids = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    mask = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
    out = jax.jit(lambda p, i, m: encode(p, CFG, i, m))(sharded, ids, mask)
    ref = encode(params, CFG, np.asarray(ids), np.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_neural_embedder_plugs_into_hybrid_retriever():
    from openintel_tpu.models.retrievers import HybridRetriever

    texts = ["quick brown fox", "lazy dog sleeps", "fox dog fox", "market text"]
    emb = NeuralEmbedder(CFG)
    r = HybridRetriever.build(texts, embedder=emb, dim=CFG.dim)
    res = r.search(["quick fox"], k=2)
    assert res.ids.shape == (1, 2)
    assert res.ids[0, 0] in (0, 2)

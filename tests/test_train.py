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


def test_contrastive_training_generalises_past_lexical_overlap():
    """The hard case an untrained bag-of-embeddings CANNOT solve: queries
    share a topic with their target docs but ZERO tokens. Contrastive
    training over token-subset pairs makes co-occurring tokens embed close,
    so disjoint same-topic bags become near — real representation learning,
    not lexical matching."""
    import jax

    from openintel_tpu.models.encoder import NeuralEmbedder, init_params

    rng = np.random.default_rng(7)
    n_topics = 4
    # per topic: 4 query-only words + 12 doc words. TRAINING docs mix both
    # (so co-occurrence can link them); EVAL docs use doc-words only and
    # eval queries use query-words only -> zero lexical overlap at eval.
    qwords = [[f"q{t}_{i}" for i in range(4)] for t in range(n_topics)]
    dwords = [[f"d{t}_{i}" for i in range(12)] for t in range(n_topics)]
    train_docs = []
    for t in range(n_topics):
        for _ in range(16):
            toks = list(rng.choice(dwords[t], size=6, replace=False)) + list(
                rng.choice(qwords[t], size=2, replace=False)
            )
            rng.shuffle(toks)
            train_docs.append(" ".join(toks))
    eval_docs, labels = [], []
    for t in range(n_topics):
        for _ in range(8):
            eval_docs.append(
                " ".join(rng.choice(dwords[t], size=6, replace=False))
            )
            labels.append(t)
    labels = np.array(labels)
    queries = []
    q_topics = []
    for t in range(n_topics):
        for _ in range(6):
            queries.append(" ".join(rng.choice(qwords[t], size=3, replace=False)))
            q_topics.append(t)
    q_topics = np.array(q_topics)

    cfg = EncoderConfig(vocab_size=512, dim=32, depth=1, heads=2, max_len=16)

    def topic_precision(embedder):
        e_d = embedder(eval_docs)
        e_q = embedder(queries)
        nn = np.argmax(e_q @ e_d.T, axis=1)
        return float(np.mean(labels[nn] == q_topics))

    untrained = NeuralEmbedder(cfg, init_params(jax.random.PRNGKey(0), cfg))
    p_before = topic_precision(untrained)
    res = train_encoder(train_docs, cfg, steps=100, batch_size=16, lr=3e-3, seed=0)
    p_after = topic_precision(NeuralEmbedder(cfg, res.params))
    # chance = 0.25 and eval has ZERO lexical overlap: only learned
    # co-occurrence structure can beat it
    assert p_after > p_before + 0.2, (p_before, p_after)
    assert p_after >= 0.6, (p_before, p_after)


def test_mesh_training_matches_single_chip(tmp_path):
    """DP x TP training over the virtual 8-device mesh: the jitted global
    program with sharded inputs must follow the single-chip loss trajectory
    (same math, XLA-derived collectives; f32 reduction-order tolerance),
    and the gathered checkpoint must resume on a single chip."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from openintel_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, corpus=4)
    # heads=2 not divisible by model axis 4 -> clean error
    try:
        train_encoder(TEXTS, CFG, steps=1, batch_size=4, mesh=mesh)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    cfg = EncoderConfig(vocab_size=256, dim=32, depth=1, heads=4, max_len=16)
    single = train_encoder(TEXTS, cfg, steps=8, batch_size=4, lr=3e-3, seed=5)
    meshed = train_encoder(
        TEXTS, cfg, steps=8, batch_size=4, lr=3e-3, seed=5,
        mesh=mesh, ckpt_dir=tmp_path, ckpt_every=100,
    )
    np.testing.assert_allclose(
        np.asarray(meshed.losses), np.asarray(single.losses),
        rtol=2e-3, atol=2e-4,
    )
    # gathered checkpoint resumes single-chip (and on-mesh)
    logs = []
    res = train_encoder(
        TEXTS, cfg, steps=10, batch_size=4, lr=3e-3, seed=5,
        ckpt_dir=tmp_path, ckpt_every=100, log=logs.append,
    )
    assert any("resumed from step 8" in m for m in logs)
    assert len(res.losses) == 2


def test_synonym_flip_machinery():
    """flip_tokens: deterministic given an rng, substitutes only mapped
    tokens, flip_p=0 is identity; qrels + pair generators route through it
    (vocabulary-mismatch training/eval — docs/benchmarks.md)."""
    import numpy as np

    from openintel_tpu.index.synthetic import (
        flip_tokens,
        synthetic_synonym_corpus,
    )
    from openintel_tpu.models.eval import synthetic_qrels

    docs, syn = synthetic_synonym_corpus(50, n_concepts=20, seed=3)
    assert all(t.startswith("wa") for d in docs for t in d.split())
    assert syn["wa7"] == "wb7"

    rng = np.random.default_rng(0)
    toks = ["wa1", "unknown", "wa2"]
    assert flip_tokens(toks, syn, 0.0, rng) == toks
    flipped = flip_tokens(toks, syn, 1.0, rng)
    assert flipped == ["wb1", "unknown", "wb2"]  # unmapped survive

    # qrels at flip_p=1.0 never contain a document-surface mapped token
    qrels = synthetic_qrels(docs, 20, seed=4, synonym_map=syn, flip_p=1.0)
    for q, rel in qrels:
        assert rel and all(not t.startswith("wa") for t in q.split())
    # at flip_p=0 queries reuse document tokens verbatim
    qrels0 = synthetic_qrels(docs, 20, seed=4, synonym_map=syn, flip_p=0.0)
    for q, rel in qrels0:
        d = docs[next(iter(rel))]
        assert all(t in d.split() for t in q.split())


def test_make_pairs_synonym_substitution():
    """Training pairs under a synonym map: query-side tokens substitute at
    flip_p=1.0, and the substituted surface hashes to DIFFERENT encoder
    ids than the document surface (otherwise there is nothing to learn)."""
    import numpy as np

    from openintel_tpu.index.synthetic import synthetic_synonym_corpus
    from openintel_tpu.models.encoder import EncoderConfig, NeuralEmbedder
    from openintel_tpu.models.train import make_pairs

    docs, syn = synthetic_synonym_corpus(30, n_concepts=10, seed=5)
    emb = NeuralEmbedder(EncoderConfig(vocab_size=4096, dim=32, depth=1,
                                       heads=2, max_len=16), params={})
    rng = np.random.default_rng(6)
    q_ids, q_mask, d_ids, d_mask = make_pairs(
        docs, emb, 8, rng, synonym_map=syn, flip_p=1.0
    )
    doc_vocab = {
        int(i) for i in np.asarray(d_ids)[np.asarray(d_mask)] if i > 0
    }
    q_vocab = {
        int(i) for i in np.asarray(q_ids)[np.asarray(q_mask)] if i > 0
    }
    # fully-flipped queries share no token ids with the documents
    assert q_vocab and not (q_vocab & doc_vocab)


def test_template_corpus_composes_phrases():
    """The second mismatch family (VERDICT r4 item 3): doc surface is one
    token per concept; the query surface is a two-token phrase that never
    occurs in any document and uniquely determines the concept."""
    import numpy as np

    from openintel_tpu.index.synthetic import (
        flip_tokens,
        synthetic_template_corpus,
    )

    docs, phrase_map = synthetic_template_corpus(200, n_concepts=50, seed=3)
    assert len(docs) == 200 and len(phrase_map) == 50
    doc_vocab = {t for d in docs for t in d.split()}
    assert doc_vocab <= set(phrase_map)  # docs only use the ta-surface
    # phrases are two tokens, never document tokens, and injective
    seen = set()
    f = int(np.ceil(np.sqrt(50)))
    for tok, phrase in phrase_map.items():
        parts = phrase.split()
        assert len(parts) == 2
        assert not (set(parts) & doc_vocab)
        assert phrase not in seen
        seen.add(phrase)
        c = int(tok[2:])
        assert parts[0] == f"tb{c // f}" and parts[1] == f"tc{c % f}"
    # flip_tokens renders a flipped token as the two-token phrase on join
    rng = np.random.default_rng(0)
    q = " ".join(flip_tokens(["ta7", "ta3"], phrase_map, 1.0, rng))
    assert q == f"{phrase_map['ta7']} {phrase_map['ta3']}"
    assert len(q.split()) == 4

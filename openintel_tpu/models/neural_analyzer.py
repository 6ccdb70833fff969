"""Learned PostAnalyzer: the ML scorer the reference's analyzer port was
designed to swap in (reference: src/domain/ports/post_analyzer.rs:60-63,
README.md:190-191 "designed to be replaced by an ML/LLM scorer").

A 2-logit head on the shared transformer trunk (models/encoder.py) produces
(polarity ∈ [-1,1] via tanh, speculative logit). Trained by distillation
from the lexicon analyzer over any corpus — the lexicon provides free labels
with exactly the reference's semantics, and the neural head generalises past
its fixed term lists. Implements the same async PostAnalyzer contract as
LexiconAnalyzer: one signal per post, order-aligned.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openintel_tpu.domain.entities import SocialPost
from openintel_tpu.domain.values import Polarity, PostSignal
from openintel_tpu.models.checkpoint import load_meta, load_params, save_params
from openintel_tpu.models.encoder import (
    EncoderConfig,
    NeuralEmbedder,
    analyzer_logits,
    distill_loss,
    init_analyzer_head,
    init_params,
)


class NeuralAnalyzer:
    """PostAnalyzer port implementation backed by the neural head."""

    name = "neural"

    def __init__(self, cfg: EncoderConfig, params: dict, head: dict):
        self.cfg = cfg
        self.params = params
        self.head = head
        self._embedder = NeuralEmbedder(cfg, params={})  # tokenizer only
        self._logits = jax.jit(
            lambda p, h, ids, m: analyzer_logits(p, h, cfg, ids, m)
        )

    def score_texts(self, texts: Sequence[str]) -> list[PostSignal]:
        if not texts:
            return []
        ids, mask = self._embedder.tokenize(texts)
        out = np.asarray(self._logits(self.params, self.head, ids, mask))
        return [
            PostSignal(
                polarity=Polarity(float(out[i, 0])),
                speculative=bool(out[i, 1] > 0.0),
            )
            for i in range(len(texts))
        ]

    async def analyze(self, posts: Sequence[SocialPost]) -> list[PostSignal]:
        return self.score_texts([p.text.as_str() for p in posts])


def train_neural_analyzer(
    texts: Sequence[str],
    cfg: Optional[EncoderConfig] = None,
    *,
    params: Optional[dict] = None,
    steps: int = 60,
    lr: float = 3e-3,
    seed: int = 0,
    batch_size: int = 64,
) -> tuple[NeuralAnalyzer, list[float]]:
    """Distill the lexicon analyzer into the neural head (trunk frozen when
    ``params`` given, e.g. a retrieval-trained encoder)."""
    import optax

    from openintel_tpu.models.lexicon import score_texts as lexicon_score

    cfg = cfg or EncoderConfig()
    params = params if params is not None else init_params(
        jax.random.PRNGKey(seed), cfg
    )
    head = init_analyzer_head(jax.random.PRNGKey(seed + 1), cfg)
    emb = NeuralEmbedder(cfg, params={})
    signals = lexicon_score(list(texts))
    pol = np.array([float(s.polarity.value) for s in signals], np.float32)
    spec = np.array(
        [1.0 if s.speculative else 0.0 for s in signals], np.float32
    )

    tx = optax.adamw(lr)
    opt_state = tx.init(head)

    @jax.jit
    def step_fn(head, opt_state, ids, mask, tp, ts):
        loss, grads = jax.value_and_grad(
            lambda h: distill_loss(params, h, cfg, ids, mask, tp, ts)
        )(head)
        updates, opt_state = tx.update(grads, opt_state, head)
        return optax.apply_updates(head, updates), opt_state, loss

    # mini-batched: a full-corpus forward would bake (N, S) into the jit and
    # OOM at realistic corpus sizes
    rng = np.random.default_rng(seed)
    bsz = min(batch_size, len(texts))
    losses = []
    for _ in range(steps):
        idx = rng.integers(0, len(texts), size=bsz)
        # tokenize() already pads to pow2 length buckets (bounded retraces)
        ids, mask = emb.tokenize([texts[i] for i in idx])
        head, opt_state, loss = step_fn(
            head, opt_state, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pol[idx]), jnp.asarray(spec[idx]),
        )
        losses.append(float(loss))
    return NeuralAnalyzer(cfg, params, head), losses


def save_analyzer(analyzer: NeuralAnalyzer, ckpt_dir) -> None:
    save_params(
        {"params": analyzer.params, "head": analyzer.head},
        Path(ckpt_dir) / "analyzer",
        config=analyzer.cfg,
    )


def load_analyzer(ckpt_dir) -> NeuralAnalyzer:
    path = Path(ckpt_dir) / "analyzer"
    meta = load_meta(path)
    cfg = EncoderConfig(**meta["config"]) if "config" in meta else EncoderConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    head = init_analyzer_head(jax.random.PRNGKey(1), cfg)
    tree = load_params({"params": params, "head": head}, path)
    return NeuralAnalyzer(cfg, tree["params"], tree["head"])

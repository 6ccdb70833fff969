"""Encoder training loop: contrastive retrieval fine-tuning with optax,
checkpoint/resume, deterministic data generation.

Self-supervised pairs from any text corpus: the "query" for a document is a
random subset of its tokens (the lexical-overlap signal BM25 exploits, so
the dense arm learns to agree with it on easy cases while generalising).
One jitted step = loss + grads + optax update; checkpoints via
models/checkpoint.py every ``ckpt_every`` steps, resumable mid-run.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openintel_tpu.models.checkpoint import load_meta, load_params, save_params
from openintel_tpu.models.encoder import (
    EncoderConfig,
    NeuralEmbedder,
    info_nce_loss,
    init_params,
)


@dataclass
class TrainResult:
    params: dict
    losses: list[float]
    step: int


def make_pairs(
    texts: Sequence[str],
    embedder: NeuralEmbedder,
    batch_size: int,
    rng: np.random.Generator,
    synonym_map: Optional[dict] = None,
    flip_p: float = 0.5,
):
    """Sample a (query, doc) batch: queries are random token subsets.

    ``synonym_map`` teaches vocabulary mismatch: each query token is
    substituted by its synonym surface with probability ``flip_p``
    (index/synthetic.py::flip_tokens), so InfoNCE pulls the synonym's
    embedding toward the document surface it never co-occurs with —
    the capability token-overlap embedders cannot have."""
    from openintel_tpu.index.synthetic import flip_tokens

    idx = rng.integers(0, len(texts), size=batch_size)
    docs = [texts[i] for i in idx]
    queries = []
    for d in docs:
        toks = d.split()
        take = max(1, min(len(toks), int(rng.integers(1, 5))))
        chosen = list(rng.choice(toks, size=take, replace=False))
        if synonym_map:
            chosen = flip_tokens(chosen, synonym_map, flip_p, rng)
        queries.append(" ".join(chosen))
    q_ids, q_mask = embedder.tokenize(queries)
    d_ids, d_mask = embedder.tokenize(docs)
    # pad both to the doc width so shapes stay static across batches
    width = max(q_ids.shape[1], d_ids.shape[1])

    def pad(a, fill):
        out = np.full((a.shape[0], width), fill, a.dtype)
        out[:, : a.shape[1]] = a
        return out

    return (
        jnp.asarray(pad(q_ids, 0)),
        jnp.asarray(pad(q_mask, False)),
        jnp.asarray(pad(d_ids, 0)),
        jnp.asarray(pad(d_mask, False)),
    )


def train_encoder(
    texts: Sequence[str],
    cfg: Optional[EncoderConfig] = None,
    *,
    steps: int = 50,
    batch_size: int = 16,
    lr: float = 1e-3,
    seed: int = 0,
    ckpt_dir: Optional[str | Path] = None,
    ckpt_every: int = 25,
    log: Optional[Callable[[str], None]] = None,
    mesh=None,  # ("data", "corpus") Mesh -> DP batch x TP params
    synonym_map: Optional[dict] = None,  # query-side vocab mismatch
    flip_p: float = 0.5,
) -> TrainResult:
    """Train (or resume) the encoder; returns final params + loss history.

    With ``mesh``, params lay out tensor-parallel over the "corpus" axis
    (Megatron qkv/mlp split, ``encoder.param_partition_specs``) and batches
    data-parallel over "data"; the step stays the plain jitted global
    program — XLA derives the collectives from the input shardings (same
    discipline as the sharded retriever). AdamW moments shard exactly like
    the params they mirror, so resume works identically on a mesh."""
    import optax

    cfg = cfg or EncoderConfig()
    embedder = NeuralEmbedder(cfg, params={})  # tokenizer only; params below
    params = init_params(jax.random.PRNGKey(seed), cfg)
    tx = optax.adamw(lr)
    opt_state = tx.init(params)
    state = {"params": params, "opt": opt_state}

    start_step = 0
    ckpt_path = Path(ckpt_dir) / "encoder" if ckpt_dir is not None else None
    if ckpt_path is not None and ckpt_path.with_suffix(".npz").exists():
        # resume BOTH params and optimizer moments — restarting AdamW state
        # on trained params takes oversized early steps
        state = load_params(state, ckpt_path)
        params, opt_state = state["params"], state["opt"]
        start_step = int(load_meta(ckpt_path).get("step", 0))
        if log:
            log(f"resumed from step {start_step}")

    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from openintel_tpu.models.encoder import param_partition_specs

        msize, dsize = int(mesh.shape["corpus"]), int(mesh.shape["data"])
        if cfg.heads % msize or (4 * cfg.dim) % msize:
            raise ValueError(
                f"model axis {msize} must divide heads ({cfg.heads}) and "
                f"4*dim ({4 * cfg.dim})"
            )
        if batch_size % dsize:
            raise ValueError(
                f"batch size {batch_size} must divide by the data axis "
                f"({dsize})"
            )
        specs = param_partition_specs(cfg, model_axis="corpus")

        def put(tree):
            return jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                tree, specs,
            )

        params = put(params)
        rep = NamedSharding(mesh, P())
        # optax.adamw state = (ScaleByAdamState(count, mu, nu), *empty);
        # mu/nu mirror the param pytree -> shard identically (this is what
        # makes RESUME correct on a mesh, not just fresh runs)
        adam, *rest = opt_state
        opt_state = (
            adam._replace(
                count=jax.device_put(adam.count, rep),
                mu=put(adam.mu),
                nu=put(adam.nu),
            ),
            *rest,
        )
        batch_sharding = NamedSharding(mesh, P("data", None))

    @jax.jit
    def step_fn(params, opt_state, batch):
        loss, grads = jax.value_and_grad(info_nce_loss)(params, cfg, *batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # checkpoint already at/past the request: no-op — crucially, do NOT
    # rewrite the meta with a smaller step (that would corrupt provenance
    # and make a later longer run retrain on already-trained params)
    if start_step >= steps:
        return TrainResult(params=params, losses=[], step=start_step)

    rng = np.random.default_rng(seed + start_step)
    losses: list[float] = []
    step = start_step
    for step in range(start_step, steps):
        batch = make_pairs(
            texts, embedder, batch_size, rng,
            synonym_map=synonym_map, flip_p=flip_p,
        )
        if batch_sharding is not None:
            batch = tuple(jax.device_put(x, batch_sharding) for x in batch)
        params, opt_state, loss = step_fn(params, opt_state, batch)
        losses.append(float(loss))
        if log and (step % 10 == 0 or step == steps - 1):
            log(f"step {step}: loss {float(loss):.4f}")
        if ckpt_path is not None and (step + 1) % ckpt_every == 0:
            save_params(
                {"params": params, "opt": opt_state},
                ckpt_path, config=cfg, step=step + 1,
            )
    if ckpt_path is not None:
        save_params(
            {"params": params, "opt": opt_state},
            ckpt_path, config=cfg, step=steps,
        )
    return TrainResult(params=params, losses=losses, step=steps)


def load_embedder(ckpt_dir: str | Path) -> NeuralEmbedder:
    """Reload a trained encoder as a retriever-pluggable embedder."""
    import optax

    ckpt_path = Path(ckpt_dir) / "encoder"
    meta = load_meta(ckpt_path)
    cfg = EncoderConfig(**meta["config"]) if "config" in meta else EncoderConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    # checkpoints hold {params, opt}; the optimizer pytree structure does not
    # depend on the learning rate
    template = {"params": params, "opt": optax.adamw(1e-3).init(params)}
    return NeuralEmbedder(cfg, load_params(template, ckpt_path)["params"])

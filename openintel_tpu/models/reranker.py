"""Cross-encoder reranker: the second stage of production retrieval.

First-stage retrieval (BM25/dense/hybrid) optimises recall over millions of
docs; the reranker re-scores the top candidates with full query-document
interaction — one transformer pass over the CONCATENATED (query, doc) token
sequence per pair, so every query token attends to every doc token. This is
the standard two-stage stack (reference for the pattern: cross-encoders in
the retrieval literature; the reference CLI's analogue is the swappable
PostAnalyzer port, src/domain/ports/post_analyzer.rs:60-63).

Reuses the encoder trunk (models/encoder.py) with a scalar scoring head;
trained with listwise softmax cross-entropy over a candidate set containing
one positive. Batched on device: (B*k) pairs in one jitted forward.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openintel_tpu.models.encoder import (
    EncoderConfig,
    NeuralEmbedder,
    encode,
    init_params,
)

SEP_ID = 1  # reserved separator token between query and doc segments
# (NeuralEmbedder.tokenize hashes real tokens into [2, vocab-1], so id 1
# can only ever mean the segment boundary)


def init_rerank_head(key: jax.Array, cfg: EncoderConfig) -> dict:
    return {
        "w": jax.random.normal(key, (cfg.dim, 1)) * cfg.dim**-0.5,
        "b": jnp.zeros(1),
    }


def rerank_scores(params, head, cfg, pair_ids, pair_mask):
    """(P, S) concatenated query[SEP]doc token ids -> (P,) relevance scores."""
    e = encode(params, cfg, pair_ids, pair_mask)  # (P, dim), unit-norm pooled
    return (e @ head["w"])[:, 0] + head["b"][0]


def listwise_loss(params, head, cfg, pair_ids, pair_mask, k: int):
    """Softmax CE over each query's k candidates; positive at slot 0."""
    s = rerank_scores(params, head, cfg, pair_ids, pair_mask).reshape(-1, k)
    return -jnp.mean(jax.nn.log_softmax(s, axis=1)[:, 0])


class CrossEncoderReranker:
    """Host-facing reranker over raw texts; drop onto any SearchResult."""

    def __init__(
        self,
        cfg: Optional[EncoderConfig] = None,
        params: Optional[dict] = None,
        head: Optional[dict] = None,
        seed: int = 0,
    ):
        self.cfg = cfg or EncoderConfig()
        k_trunk, k_head = jax.random.split(jax.random.PRNGKey(seed))
        self.params = (
            params if params is not None else init_params(k_trunk, self.cfg)
        )
        self.head = (
            head if head is not None else init_rerank_head(k_head, self.cfg)
        )
        self._embedder = NeuralEmbedder(self.cfg, params={})  # tokenizer only
        self._score = jax.jit(
            lambda p, h, ids, m: rerank_scores(p, h, self.cfg, ids, m)
        )

    def encode_pairs(
        self, queries: Sequence[str], docs: Sequence[Sequence[str]]
    ) -> tuple[np.ndarray, np.ndarray]:
        """(query, candidates) -> (B*k, S) padded pair token matrix."""
        max_len = self.cfg.max_len
        q_budget = max_len // 4
        rows = []
        for q, cands in zip(queries, docs):
            q_ids, q_mask = self._embedder.tokenize([q])
            q_row = list(q_ids[0][q_mask[0]][:q_budget])
            for d in cands:
                d_ids, d_mask = self._embedder.tokenize([d])
                d_row = list(d_ids[0][d_mask[0]][: max_len - len(q_row) - 1])
                rows.append(q_row + [SEP_ID] + d_row)
        width = 8
        while width < max((len(r) for r in rows), default=1):
            width *= 2
        width = min(width, max_len)
        ids = np.zeros((len(rows), width), np.int32)
        mask = np.zeros((len(rows), width), bool)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r[:width]
            mask[i, : len(r)] = True
        return ids, mask

    def rerank(
        self,
        queries: Sequence[str],
        candidate_texts: Sequence[Sequence[str]],
        candidate_ids: np.ndarray,  # (B, k) first-stage ids (-1 padded)
        first_stage_weight: float = 0.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Re-score and re-order first-stage candidates.

        Returns (scores (B, k), ids (B, k)) sorted by reranker score
        descending; -1-padded slots stay at the tail.

        ``first_stage_weight`` in [0, 1] interpolates the cross-encoder's
        per-row z-scored output with the first stage's (z-scored)
        reciprocal-rank prior — candidate_ids arrive first-stage-sorted,
        so position IS the first-stage rank. 0 = pure cross-encoder
        (this method's default: unit-testable in isolation); the
        production composition (rerank_search_result) defaults to 0.5,
        the measured-best two-stage blend (docs/benchmarks.md "Reranker
        uplift"): the cross-encoder sees only a 32-token slate and cannot
        recover corpus statistics (IDF, length norm) from it, so keeping
        the first stage's evidence in the final score is what turns the
        reranker from ranking-destroying to ranking-improving."""
        b = len(queries)
        k = candidate_ids.shape[1]
        counts = [len(c) for c in candidate_texts]
        ids_m, mask_m = self.encode_pairs(queries, candidate_texts)
        flat = np.asarray(self._score(self.params, self.head, ids_m, mask_m))
        if all(c == k for c in counts):
            s = flat.reshape(b, k)
        else:
            # ragged rows: each row's texts must correspond one-to-one to
            # its leading real (non -1) candidates — a silent reshape here
            # would misassign scores across queries (review finding)
            real = (np.asarray(candidate_ids) >= 0).sum(axis=1)
            bad = [
                i for i, (c, r) in enumerate(zip(counts, real)) if c != r
            ]
            if bad:
                raise ValueError(
                    f"candidate_texts rows {bad} have "
                    f"{[counts[i] for i in bad]} texts but "
                    f"{[int(real[i]) for i in bad]} real candidate ids — "
                    f"pass either k={k} texts per row or exactly one per "
                    "real id"
                )
            s = np.full((b, k), -np.inf, flat.dtype)
            lo = 0
            for i, c in enumerate(counts):
                s[i, :c] = flat[lo : lo + c]
                lo += c
        if first_stage_weight > 0.0:
            real = np.isfinite(s) & (np.asarray(candidate_ids) >= 0)
            masked = np.where(real, s, np.nan)
            mu = np.nanmean(masked, axis=1, keepdims=True)
            sd = np.nanstd(masked, axis=1, keepdims=True) + 1e-9
            z = (s - mu) / sd
            prior = 1.0 / (np.arange(k, dtype=s.dtype) + 1.0)
            prior = (prior - prior.mean()) / (prior.std() + 1e-9)
            s = (1.0 - first_stage_weight) * z + first_stage_weight * prior
        s = np.where(candidate_ids >= 0, s, -np.inf)  # padding stays last
        order = np.argsort(-s, axis=1, kind="stable")
        out_ids = np.take_along_axis(candidate_ids, order, axis=1)
        out_s = np.take_along_axis(s, order, axis=1)
        return np.where(np.isfinite(out_s), out_s, 0.0), out_ids


def rerank_search_result(
    rr,
    queries: Sequence[str],
    res,
    docs: Sequence[str],
    first_stage_weight: float = 0.5,
):
    """Second-stage rerank of a first-stage SearchResult against the docs
    sidecar — the one shared implementation behind CLI ``search --rerank``
    and MCP ``search_corpus`` (duplicating the candidate-text gathering in
    each surface let them drift). ``first_stage_weight=0.5`` is the
    measured-best two-stage blend (see CrossEncoderReranker.rerank)."""
    from openintel_tpu.models.retrievers import SearchResult

    cand_texts = [
        [docs[int(d)] if 0 <= d < len(docs) else "" for d in res.ids[i]]
        for i in range(len(queries))
    ]
    scores, ids = rr.rerank(
        queries, cand_texts, res.ids, first_stage_weight=first_stage_weight
    )
    return SearchResult(ids=ids, scores=scores)


class RerankedRetriever:
    """Two-stage composition behind CLI ``search --rerank``, ``evaluate
    --rerank`` and the quality experiments: first-stage top-``2k`` (with a
    widened candidate pool) -> cross-encoder blend rerank -> top-``k``.
    Duck-types the SearchResult ``search`` surface so the eval harness and
    coalescer treat it like any retriever."""

    def __init__(
        self,
        rr: CrossEncoderReranker,
        first,
        docs: Sequence[str],
        first_stage_weight: float = 0.5,
    ):
        self.rr = rr
        self.first = first
        self.docs = docs
        self.first_stage_weight = first_stage_weight

    def search(self, queries: Sequence[str], k: int = 10, **kw):
        from openintel_tpu.models.retrievers import SearchResult

        kw.pop("mode", None)  # the composition is inherently hybrid+rerank
        # the composition owns its first-stage pool width (a caller's
        # 2*k-style default is sized for single-stage retrieval)
        kw["candidates_per_arm"] = max(4 * k, 40)
        res = self.first.search(queries, k=2 * k, **kw)
        out = rerank_search_result(
            self.rr, queries, res, self.docs,
            first_stage_weight=self.first_stage_weight,
        )
        return SearchResult(ids=out.ids[:, :k], scores=out.scores[:, :k])


def save_reranker(rr: CrossEncoderReranker, ckpt_dir) -> None:
    from pathlib import Path

    from openintel_tpu.models.checkpoint import save_params

    save_params(
        {"params": rr.params, "head": rr.head},
        Path(ckpt_dir) / "reranker",
        config=rr.cfg,
    )


def load_reranker(ckpt_dir) -> CrossEncoderReranker:
    from pathlib import Path

    from openintel_tpu.models.checkpoint import load_meta, load_params

    path = Path(ckpt_dir) / "reranker"
    meta = load_meta(path)
    cfg = EncoderConfig(**meta["config"]) if "config" in meta else EncoderConfig()
    rr = CrossEncoderReranker(cfg)
    tree = load_params({"params": rr.params, "head": rr.head}, path)
    rr.params, rr.head = tree["params"], tree["head"]
    return rr


def train_reranker(
    texts: Sequence[str],
    cfg: Optional[EncoderConfig] = None,
    *,
    steps: int = 30,
    k: int = 4,
    batch_queries: int = 8,
    lr: float = 1e-3,
    seed: int = 0,
    synonym_map: Optional[dict] = None,  # query-side vocab mismatch
    flip_p: float = 0.5,
    init_trunk: Optional[dict] = None,  # warm-start (e.g. trained encoder)
    hard_negatives: bool = True,
):
    """Self-supervised listwise training: for each sampled doc, the query is
    a token subset; candidates = [positive, k-1 negatives].

    ``hard_negatives`` (default) mines negatives from documents SHARING
    query tokens with the positive (a host inverted index over the corpus,
    sampled with multiplicity so docs matching several query terms — the
    hardest — are favoured). This matches the reranker's deployment
    distribution: at serving time every candidate it scores came out of
    first-stage retrieval and therefore overlaps the query. A reranker
    trained on RANDOM negatives only learns "any overlap => relevant",
    which cannot order a first-stage top-k and measurably *destroys* the
    ranking it reorders (docs/benchmarks.md "Reranker uplift": MRR@10
    0.52 -> 0.22 with random negatives, measured before this default).
    At most half the slate is hard; random negatives fill the rest, so
    the model keeps learning that overlap matters at all (the standard
    mixed-negative recipe — all-hard slates collapse at small scale).

    ``synonym_map`` trains under vocabulary mismatch (same semantics as
    models/train.py::make_pairs). ``init_trunk`` warm-starts the trunk
    from an already-trained encoder's params (the standard bi-encoder ->
    cross-encoder hand-off; a from-scratch trunk needs far more listwise
    steps than the head)."""
    import optax

    from openintel_tpu.index.synthetic import flip_tokens

    cfg = cfg or EncoderConfig()
    if init_trunk is not None:
        # host copies: a mesh-sharded trained encoder must not leak its
        # TP shardings into the reranker's single-device jit
        init_trunk = jax.tree_util.tree_map(np.asarray, init_trunk)
    rr = CrossEncoderReranker(cfg, params=init_trunk, seed=seed)
    tx = optax.adamw(lr)
    trainable = {"params": rr.params, "head": rr.head}
    opt_state = tx.init(trainable)

    @jax.jit
    def step_fn(tr, opt_state, ids, mask):
        def loss_fn(tr):
            return listwise_loss(tr["params"], tr["head"], cfg, ids, mask, k)

        loss, grads = jax.value_and_grad(loss_fn)(tr)
        updates, opt_state = tx.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    postings: Optional[dict] = None
    if hard_negatives:
        # token -> doc ids containing it; one host pass over the corpus
        postings = {}
        for i, t in enumerate(texts):
            for tok in set(t.split()):
                postings.setdefault(tok, []).append(i)
    losses = []
    for _ in range(steps):
        queries, cands = [], []
        for _ in range(batch_queries):
            pos = int(rng.integers(0, len(texts)))
            toks = texts[pos].split()
            take = max(1, min(len(toks), int(rng.integers(1, 5))))
            chosen = list(rng.choice(toks, size=take, replace=False))
            if synonym_map:
                # mine on the ORIGINAL surface (documents never carry the
                # synonym surface), flip only the rendered query
                queries.append(
                    " ".join(flip_tokens(chosen, synonym_map, flip_p, rng))
                )
            else:
                queries.append(" ".join(chosen))
            negs: list = []
            seen = {pos}
            if postings is not None and len(set(chosen)) >= 2:
                # single-token queries are excluded: a "hard negative"
                # containing the whole query is a false negative — pure
                # label noise. Same reason a multi-token full match (every
                # query token present) is skipped below.
                pool = []
                for tok in chosen:
                    pool.extend(postings.get(tok, ()))
                pool = np.asarray(pool, dtype=np.int64)
                qset = set(chosen)
                if pool.size:
                    # with-replacement draw keeps multiplicity: a doc
                    # matching several query terms is proportionally more
                    # likely — the first-stage-top-k-like hard negative
                    for d in rng.choice(pool, size=min(pool.size, 8 * k)):
                        d = int(d)
                        if len(negs) >= (k - 1 + 1) // 2:
                            break  # at most half the slate is hard
                        if d in seen or texts[d] == texts[pos]:
                            continue
                        seen.add(d)
                        if qset <= set(texts[d].split()):
                            continue  # full match: potential false negative
                        negs.append(texts[d])
            for _ in range(20 * k):  # bounded: degenerate corpora can't hang
                if len(negs) >= k - 1:
                    break
                cand = texts[int(rng.integers(0, len(texts)))]
                if cand != texts[pos]:  # a duplicate positive is label noise
                    negs.append(cand)
            if len(negs) < k - 1:
                raise ValueError(
                    "reranker training needs >= 2 distinct documents"
                )
            cands.append([texts[pos]] + negs)
        ids, mask = rr.encode_pairs(queries, cands)
        trainable, opt_state, loss = step_fn(trainable, opt_state, ids, mask)
        losses.append(float(loss))
    rr.params, rr.head = trainable["params"], trainable["head"]
    return rr, losses

"""Retrieval-quality evaluation harness (SURVEY.md §7 step 9).

Measures end-task quality — recall@k and MRR@k against labeled relevance —
for any retriever mode (bm25 / dense / hybrid) and any embedder (hashing or
a trained encoder checkpoint). This is the model-quality complement to
bench.py's kernel-recall parity: bench asks "does the device program
reproduce the exact ranking?", this asks "is the ranking any good?".

Label format (TSV, one judgment per line)::

    <query text> \t <relevant doc id> [\t <relevant doc id> ...]

Exposed as ``openintel evaluate CORPUS --queries QRELS [--encoder CK]``.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional, Sequence


@dataclass(frozen=True)
class EvalResult:
    mode: str
    k: int
    n_queries: int
    recall_at_k: float  # mean fraction of relevant docs retrieved in top-k
    mrr_at_k: float  # mean reciprocal rank of the FIRST relevant hit
    hit_rate: float  # fraction of queries with >= 1 relevant doc in top-k

    def to_dict(self) -> dict:
        return {
            "mode": self.mode,
            "k": self.k,
            "n_queries": self.n_queries,
            "recall_at_k": round(self.recall_at_k, 4),
            "mrr_at_k": round(self.mrr_at_k, 4),
            "hit_rate": round(self.hit_rate, 4),
        }


def parse_qrels(text: str) -> list[tuple[str, set[int]]]:
    """Parse the TSV label format; blank lines and #comments skipped."""
    out: list[tuple[str, set[int]]] = []
    for lineno, line in enumerate(text.splitlines(), 1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) < 2:
            raise ValueError(
                f"qrels line {lineno}: expected 'query<TAB>doc_id[...]', "
                f"got {line!r}"
            )
        try:
            rel = {int(p) for p in parts[1:]}
        except ValueError as e:
            raise ValueError(f"qrels line {lineno}: non-integer doc id ({e})")
        out.append((parts[0], rel))
    return out


def evaluate_retriever(
    retriever,
    qrels: Sequence[tuple[str, set[int]]],
    *,
    k: int = 10,
    mode: str = "hybrid",
    batch: int = 256,
) -> EvalResult:
    """Run every query through ``retriever`` (batched) and score the labels.

    ``retriever`` is anything with the SearchResult-returning ``search``
    surface (HybridRetriever, ShardedHybridRetriever, BM25Retriever,
    DenseRetriever, or a BatchCoalescer wrapping one)."""
    import numpy as np

    recalls, rrs, hits = [], [], 0
    for lo in range(0, len(qrels), batch):
        chunk = qrels[lo : lo + batch]
        queries = [q for q, _ in chunk]
        if hasattr(retriever, "bm25"):  # HybridRetriever: dispatch by mode
            # (its search() has no mode kwarg — running hybrid and labeling
            # it with the requested mode would silently misreport metrics)
            if mode == "bm25":
                res = retriever.bm25.search(queries, k=k)
            elif mode == "dense":
                res = retriever.dense.search(queries, k=k)
            else:
                res = retriever.search(
                    queries, k=k, candidates_per_arm=2 * k
                )
        else:
            # Detect kwarg support statically (a TypeError raised INSIDE a
            # mode-aware search must propagate, not silently re-run with
            # default parameters and skew the eval).
            import inspect

            try:
                params = inspect.signature(retriever.search).parameters
                has_var_kw = any(
                    p.kind is inspect.Parameter.VAR_KEYWORD
                    for p in params.values()
                )
            except (TypeError, ValueError):  # builtins / C callables
                params, has_var_kw = {}, False
            kwargs = {}
            if "mode" in params or has_var_kw:
                kwargs["mode"] = mode
            if "candidates_per_arm" in params or has_var_kw:
                kwargs["candidates_per_arm"] = 2 * k
            res = retriever.search(queries, k=k, **kwargs)
        for i, (_, rel) in enumerate(chunk):
            ranked = [int(d) for d in np.asarray(res.ids[i]) if d >= 0]
            got = set(ranked) & rel
            recalls.append(len(got) / len(rel))
            first = next(
                (r + 1 for r, d in enumerate(ranked) if d in rel), None
            )
            rrs.append(1.0 / first if first else 0.0)
            hits += bool(got)
    n = len(qrels)
    return EvalResult(
        mode=mode,
        k=k,
        n_queries=n,
        recall_at_k=float(np.mean(recalls)) if n else 0.0,
        mrr_at_k=float(np.mean(rrs)) if n else 0.0,
        hit_rate=hits / n if n else 0.0,
    )


def evaluate_corpus(
    texts: Sequence[str],
    qrels: Sequence[tuple[str, set[int]]],
    *,
    k: int = 10,
    modes: Sequence[str] = ("bm25", "dense", "hybrid"),
    embedder=None,
    dim: int = 384,
    kernel: Optional[str] = None,  # dense-arm kernel (None = auto)
) -> list[EvalResult]:
    """Build in-memory retrievers over ``texts`` and evaluate each mode."""
    from openintel_tpu.models.retrievers import HybridRetriever

    hybrid = HybridRetriever.build(
        texts, embedder=embedder, dim=dim, kernel=kernel
    )
    # reuse the hybrid's own arms: constructing fresh retrievers over the
    # same indexes would repeat the corpus quantise/transpose/upload and
    # hold a second full device copy for the whole eval
    by_mode = {
        "bm25": hybrid.bm25,
        "dense": hybrid.dense,
        "hybrid": hybrid,
    }
    return [
        evaluate_retriever(by_mode[m], qrels, k=k, mode=m) for m in modes
    ]


def synthetic_qrels(
    texts: Sequence[str],
    n: int,
    seed: int = 0,
    terms_per_query: int = 4,
    synonym_map: Optional[dict] = None,
    flip_p: float = 0.0,
) -> list[tuple[str, set[int]]]:
    """Self-labeled evaluation set: each query is drawn from one document's
    tokens, labeled with that document — the zero-annotation smoke eval.

    ``synonym_map`` + ``flip_p`` render queries under vocabulary mismatch
    (index/synthetic.py::flip_tokens — the same substitution the trainers
    use), measuring what token-overlap retrievers must miss."""
    import numpy as np

    from openintel_tpu.index.synthetic import flip_tokens

    rng = np.random.default_rng(seed)
    ids = rng.integers(0, len(texts), size=n)
    out = []
    for d in ids:
        tokens = texts[int(d)].split()
        take = min(terms_per_query, len(tokens))
        chosen = list(rng.choice(tokens, size=take, replace=False))
        if synonym_map:
            chosen = flip_tokens(chosen, synonym_map, flip_p, rng)
        out.append((" ".join(chosen), {int(d)}))
    return out

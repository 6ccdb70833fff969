"""Fusion A/B: RRF (rrf_k sweep) vs z-normalised score blend (alpha sweep).

Round-4 verdict item 4 ("earn the fusion function"): the repo inherited
rank-only RRF with rrf_k=60; the reference's own fusion ancestry is a
weighted, renormalised *score* blend (speculation_engine.rs:151-176), and
the reranker work showed score information beats rank-only downstream. This
experiment measures both families on the quality harness, per query
distribution (exact / vocabulary-mismatch) and per arm-quality regime
(hashing embedder always; a trained neural encoder when --encoder points at
a checkpoint), and prints the table for docs/benchmarks.md "Fusion". The
measured winner is wired as HybridRetriever's default; the loser stays
behind ``fusion=`` / ``--fusion``.

Usage (hermetic CPU, ~2-6 min at default scale):
    JAX_PLATFORMS=cpu python scripts/fusion_ab.py \
        [--n-docs 20000] [--queries 400] [--encoder CKPT_DIR]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import json
import time
from pathlib import Path

ARMS = (
    ("rrf", {"rrf_k": 20.0}),
    ("rrf", {"rrf_k": 60.0}),
    ("rrf", {"rrf_k": 120.0}),
    ("zblend", {"blend_alpha": 0.3}),
    ("zblend", {"blend_alpha": 0.5}),
    ("zblend", {"blend_alpha": 0.7}),
)


def arm_label(fusion: str, kw: dict) -> str:
    if fusion == "rrf":
        return f"rrf(k={int(kw['rrf_k'])})"
    return f"zblend(a={kw['blend_alpha']})"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20_000)
    ap.add_argument("--n-concepts", type=int, default=2000)
    ap.add_argument("--queries", type=int, default=400)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--candidates", type=int, default=20,
                    help="candidates per arm (2*k, the serving default)")
    ap.add_argument("--encoder", default=None,
                    help="trained encoder checkpoint dir (adds the neural "
                    "regime; hashing always runs)")
    ap.add_argument("--out", default=None, help="results JSON path")
    args = ap.parse_args()

    _os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from openintel_tpu.index.build import build_postings_index
    from openintel_tpu.index.schema import DenseIndex
    from openintel_tpu.index.synthetic import synthetic_synonym_corpus
    from openintel_tpu.models.embedding import HashingEmbedder
    from openintel_tpu.models.eval import evaluate_retriever, synthetic_qrels
    from openintel_tpu.models.retrievers import HybridRetriever

    t0 = time.time()

    def log(msg: str) -> None:
        print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)

    docs, syn = synthetic_synonym_corpus(
        args.n_docs, n_concepts=args.n_concepts, seed=41
    )
    log(f"corpus: {len(docs)} docs, {args.n_concepts} concepts")

    regimes: list[tuple[str, object]] = [
        ("hashing", HashingEmbedder(dim=args.dim))
    ]
    if args.encoder:
        from openintel_tpu.models.train import load_embedder

        regimes.append(("neural", load_embedder(args.encoder)))
        log(f"neural regime: encoder from {args.encoder}")

    qsets = {
        "exact": synthetic_qrels(
            docs, args.queries, seed=43, terms_per_query=4
        ),
        "mismatch": synthetic_qrels(
            docs, args.queries, seed=43, terms_per_query=4,
            synonym_map=syn, flip_p=1.0,
        ),
    }

    postings = build_postings_index(docs)
    results: dict = {
        "config": {
            k: getattr(args, k)
            for k in ("n_docs", "n_concepts", "queries", "dim", "candidates")
        },
        "tables": {},
    }
    for regime, embedder in regimes:
        dense = DenseIndex.from_embeddings(embedder(list(docs)))
        rows: dict = {}
        for fusion, kw in ARMS:
            r = HybridRetriever(
                postings, dense, embedder, fusion=fusion, kernel="xla", **kw
            )
            label = arm_label(fusion, kw)
            for dist, qrels in qsets.items():
                # same fixed candidate width for every arm: the A/B isolates
                # the fusion function, not the pool size
                res = evaluate_retriever(
                    _FixedCandidates(r, args.candidates), qrels, k=10,
                    mode="hybrid",
                )
                rows.setdefault(label, {})[dist] = {
                    "recall@10": round(res.recall_at_k, 4),
                    "mrr@10": round(res.mrr_at_k, 4),
                }
                log(
                    f"{regime:7s} {label:14s} {dist:8s}: "
                    f"R@10={res.recall_at_k:.3f} MRR={res.mrr_at_k:.3f}"
                )
        results["tables"][regime] = rows

    out_path = Path(
        args.out or Path(__file__).parent.parent / "docs" / "fusion_ab.json"
    )
    out_path.write_text(json.dumps(results, indent=2))
    log(f"wrote {out_path}")

    print("\n| regime | fusion | exact R@10 | exact MRR | mismatch R@10 "
          "| mismatch MRR |")
    print("|---|---|---|---|---|---|")
    for regime, rows in results["tables"].items():
        for label, m in rows.items():
            e, mm = m["exact"], m["mismatch"]
            print(
                f"| {regime} | {label} | {e['recall@10']:.3f} "
                f"| {e['mrr@10']:.3f} | {mm['recall@10']:.3f} "
                f"| {mm['mrr@10']:.3f} |"
            )
    return 0


class _FixedCandidates:
    """Adapter pinning candidates_per_arm so evaluate_retriever's 2*k
    default and the hybrid branch detection don't vary across arms."""

    def __init__(self, inner, c: int):
        self._inner, self._c = inner, c

    def search(self, queries, k=10, **kw):
        kw.pop("candidates_per_arm", None)
        kw.pop("mode", None)  # hybrid only; the inner search has no modes
        return self._inner.search(
            queries, k=k, candidates_per_arm=self._c, **kw
        )


if __name__ == "__main__":
    _sys.exit(main())

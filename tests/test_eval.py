"""Retrieval-quality harness: metric math on hand-checkable cases, qrels
parsing, self-labeled synthetic eval sanity, and the CLI surface."""

import json

import numpy as np
import pytest

from openintel_tpu.models.eval import (
    evaluate_corpus,
    evaluate_retriever,
    parse_qrels,
    synthetic_qrels,
)
from openintel_tpu.models.retrievers import SearchResult


class FixedRetriever:
    """Returns a canned ranking regardless of the query text."""

    def __init__(self, rows):
        self.rows = rows

    def search(self, queries, k=10, **kw):
        ids = np.asarray([self.rows[q] for q in queries], np.int32)
        return SearchResult(
            ids=ids, scores=np.zeros(ids.shape, np.float32)
        )


def test_metric_math_hand_checked():
    r = FixedRetriever({
        "q1": [5, 1, 2],   # rel {1}: recall 1, rr 1/2
        "q2": [9, 8, 7],   # rel {1}: recall 0, rr 0
        "q3": [3, 9, 4],   # rel {3, 4}: recall 1, rr 1/1
        "q4": [9, 9, 4],   # rel {3, 4}: recall 1/2, rr 1/3
    })
    qrels = [("q1", {1}), ("q2", {1}), ("q3", {3, 4}), ("q4", {3, 4})]
    res = evaluate_retriever(r, qrels, k=3, mode="dense")
    assert res.n_queries == 4
    np.testing.assert_allclose(res.recall_at_k, (1 + 0 + 1 + 0.5) / 4)
    np.testing.assert_allclose(res.mrr_at_k, (0.5 + 0 + 1 + 1 / 3) / 4)
    np.testing.assert_allclose(res.hit_rate, 3 / 4)


def test_parse_qrels_format():
    qrels = parse_qrels("q one\t3\n# comment\n\nq two\t1\t7\n")
    assert qrels == [("q one", {3}), ("q two", {1, 7})]
    with pytest.raises(ValueError, match="line 1"):
        parse_qrels("no tab here\n")
    with pytest.raises(ValueError, match="non-integer"):
        parse_qrels("q\tabc\n")


def test_self_labeled_eval_finds_source_docs():
    """Queries drawn from a document's own tokens must rank it highly —
    the zero-annotation smoke eval for the whole retrieval stack."""
    from openintel_tpu.index.synthetic import synthetic_token_corpus

    docs = synthetic_token_corpus(400, vocab_size=800, seed=5)
    qrels = synthetic_qrels(docs, 60, seed=6)
    results = evaluate_corpus(docs, qrels, k=10, dim=64)
    by_mode = {r.mode: r for r in results}
    assert by_mode["bm25"].recall_at_k >= 0.9  # lexical signal is strong
    assert by_mode["hybrid"].recall_at_k >= 0.9
    assert by_mode["hybrid"].mrr_at_k >= 0.45


def test_cli_evaluate(tmp_path, capsys):
    from openintel_tpu.cli.main import main

    corpus = tmp_path / "c.txt"
    corpus.write_text(
        "the quick brown fox jumps\n"
        "lazy dogs sleep all day\n"
        "market analysis of tech stocks\n"
        "foxes and dogs living together\n"
    )
    (tmp_path / "q.tsv").write_text(
        "quick fox\t0\nlazy dogs\t1\ntech stocks\t2\n"
    )
    code = main(
        [
            "evaluate", str(corpus), "--queries", str(tmp_path / "q.tsv"),
            "-k", "2", "--dim", "32", "--format", "json",
        ]
    )
    out = capsys.readouterr().out
    assert code == 0
    doc = json.loads(out)
    assert {r["mode"] for r in doc} == {"bm25", "dense", "hybrid"}
    hybrid = next(r for r in doc if r["mode"] == "hybrid")
    assert hybrid["recall_at_k"] == 1.0 and hybrid["mrr_at_k"] == 1.0

    # synthetic fallback + table format
    code = main(
        ["evaluate", str(corpus), "--n-synthetic", "8", "-k", "2",
         "--dim", "32", "--mode", "bm25"]
    )
    out = capsys.readouterr().out
    assert code == 0 and "recall@2" in out and "self-labeled" in out

    # out-of-range labels rejected
    (tmp_path / "bad.tsv").write_text("q\t99\n")
    code = main(
        ["evaluate", str(corpus), "--queries", str(tmp_path / "bad.tsv")]
    )
    out = capsys.readouterr().out
    assert code == 1 and "outside the corpus" in out


def test_internal_typeerror_propagates():
    """A TypeError raised INSIDE a mode-aware search must propagate — the
    old `except TypeError` fallback silently re-ran with default params and
    skewed the eval (round-2 advisor finding)."""
    import pytest

    from openintel_tpu.models.eval import evaluate_retriever

    class BuggyRetriever:
        def search(self, queries, k=10, mode="hybrid", candidates_per_arm=None):
            raise TypeError("bug inside a mode-aware search")

    with pytest.raises(TypeError, match="bug inside"):
        evaluate_retriever(BuggyRetriever(), [("q", {0})], k=2, mode="dense")


def test_kwarg_detection_for_plain_retriever():
    """A retriever without mode/candidates kwargs is called without them."""
    import numpy as np

    from openintel_tpu.models.eval import evaluate_retriever
    from openintel_tpu.models.retrievers import SearchResult

    class Plain:
        def search(self, queries, k=10):
            ids = np.zeros((len(queries), k), np.int32) - 1
            ids[:, 0] = 0
            return SearchResult(ids=ids, scores=np.zeros((len(queries), k), np.float32))

    res = evaluate_retriever(Plain(), [("q", {0})], k=3, mode="dense")
    assert res.recall_at_k == 1.0


def test_var_kwargs_retriever_receives_mode():
    """A search(self, queries, k=10, **kw) adapter must still receive
    mode/candidates_per_arm (round-3 review finding)."""
    import numpy as np

    from openintel_tpu.models.eval import evaluate_retriever
    from openintel_tpu.models.retrievers import SearchResult

    seen = {}

    class Wrapper:
        def search(self, queries, k=10, **kw):
            seen.update(kw)
            ids = np.zeros((len(queries), k), np.int32) - 1
            ids[:, 0] = 0
            return SearchResult(
                ids=ids, scores=np.zeros((len(queries), k), np.float32)
            )

    evaluate_retriever(Wrapper(), [("q", {0})], k=3, mode="dense")
    assert seen.get("mode") == "dense"
    assert seen.get("candidates_per_arm") == 6


def test_cli_evaluate_rerank(tmp_path, capsys):
    """--rerank CKPT adds the two-stage row (RerankedRetriever over the
    hybrid first stage) next to the first-stage rows."""
    from openintel_tpu.cli.main import main
    from openintel_tpu.models.encoder import EncoderConfig
    from openintel_tpu.models.reranker import save_reranker, train_reranker

    docs = [
        "alpha beta gamma delta",
        "epsilon zeta eta theta",
        "iota kappa lambda mu",
        "nu xi omicron pi",
        "rho sigma tau upsilon",
        "phi chi psi omega",
    ]
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join(docs) + "\n")
    cfg = EncoderConfig(vocab_size=128, dim=16, depth=1, heads=2, max_len=16)
    rr, _ = train_reranker(docs, cfg, steps=2, k=2, batch_queries=2, seed=0)
    save_reranker(rr, tmp_path / "ck")
    code = main(
        ["evaluate", str(corpus), "--n-synthetic", "4", "-k", "2",
         "--dim", "16", "--rerank", str(tmp_path / "ck"),
         "--format", "json"]
    )
    out = capsys.readouterr().out
    assert code == 0
    doc = json.loads(out)
    assert {r["mode"] for r in doc} == {"bm25", "dense", "hybrid", "rerank"}
    rer = next(r for r in doc if r["mode"] == "rerank")
    assert 0.0 <= rer["mrr_at_k"] <= 1.0


def test_reranked_retriever_blend_parity_with_script_composition():
    """RerankedRetriever == the inlined top-2k -> blend -> top-k recipe it
    replaced (scripts/encoder_quality.py round-4), on the same inputs."""
    from openintel_tpu.models.encoder import EncoderConfig
    from openintel_tpu.models.reranker import (
        CrossEncoderReranker,
        RerankedRetriever,
        rerank_search_result,
    )
    from openintel_tpu.models.retrievers import HybridRetriever

    docs = [f"tok{i} tok{(i*7)%23} tok{(i*3)%17} filler{i%5}" for i in range(60)]
    cfg = EncoderConfig(vocab_size=256, dim=16, depth=1, heads=2, max_len=16)
    rr = CrossEncoderReranker(cfg, seed=5)
    first = HybridRetriever.build(docs, dim=16, kernel="xla")
    queries = ["tok3 tok14", "tok7 filler2"]
    k = 5
    got = RerankedRetriever(rr, first, docs).search(queries, k=k)
    res = first.search(queries, k=2 * k, candidates_per_arm=max(4 * k, 40))
    want = rerank_search_result(rr, queries, res, docs)
    np.testing.assert_array_equal(got.ids, want.ids[:, :k])
    np.testing.assert_array_equal(got.scores, want.scores[:, :k])

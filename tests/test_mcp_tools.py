"""MCP tool logic + server protocol tests (reference: src/mcp/tools.rs tests)."""

import asyncio
import json

import pytest

from openintel_tpu.domain.entities import PostText, PulseFetch, PulsePost, Ticker
from openintel_tpu.mcp import tools
from openintel_tpu.mcp.server import OpenIntelServer, TOOL_SPECS
from openintel_tpu.sources.fixtures import MockMarketSource, fixture_social
from openintel_tpu.sources.yahoo import FixtureBars


def run(coro):
    return asyncio.run(coro)


def test_list_sources_reports_wired_adapters():
    out = tools.run_list_sources(fixture_social(), MockMarketSource())
    assert out == {"social": ["reddit", "bluesky"], "market": ["mock-market"]}


def test_run_analyze_returns_confirming_bullish_report():
    out = run(
        tools.run_analyze({"ticker": "AAPL"}, fixture_social(), MockMarketSource())
    )
    assert "confirming_bullish" in out["summary"]
    assert out["report"]["social"]["total_mentions"] == 10
    assert "Not financial advice" in out["disclaimer"]


def test_run_analyze_rejects_bad_ticker():
    with pytest.raises(Exception):
        run(tools.run_analyze({"ticker": "$$$"}, fixture_social(), MockMarketSource()))


def test_run_scan_handles_mixed_batch():
    out = run(
        tools.run_scan(
            {"tickers": ["AAPL", "$$$"]}, fixture_social(), MockMarketSource()
        )
    )
    assert len(out["entries"]) == 2
    assert "report" in out["entries"][0] and "error" not in out["entries"][0]
    assert "error" in out["entries"][1] and "report" not in out["entries"][1]


def test_run_scan_empty_list_is_empty():
    out = run(tools.run_scan({"tickers": []}, fixture_social(), MockMarketSource()))
    assert out["entries"] == []


def test_run_compare_partitions_and_ranks():
    out = run(
        tools.run_compare(
            {"tickers": ["AAPL", "$$$"], "rank_by": "crowding"},
            fixture_social(),
            MockMarketSource(),
        )
    )
    assert len(out["ranked"]) == 1
    assert len(out["errors"]) == 1
    assert out["errors"][0]["ticker"] == "$$$"
    assert out["ranked"][0]["rank_metric"] > 0


def test_sort_ranked_orders_by_metric_desc():
    ranked = [
        {"ticker": "LO", "rank_metric": 0.1, "report": {"fusion": {"alignment": "quiet"}}},
        {"ticker": "HI", "rank_metric": 0.9, "report": {"fusion": {"alignment": "quiet"}}},
    ]
    tools.sort_ranked(ranked, "crowding")
    assert [e["ticker"] for e in ranked] == ["HI", "LO"]


def test_sort_ranked_divergence_first():
    ranked = [
        {"ticker": "BIGC", "rank_metric": 0.9, "report": {"fusion": {"alignment": "quiet"}}},
        {"ticker": "DIV", "rank_metric": 0.2, "report": {"fusion": {"alignment": "diverging"}}},
    ]
    tools.sort_ranked(ranked, "divergence")
    assert [e["ticker"] for e in ranked] == ["DIV", "BIGC"]


class OnePostFeed:
    async def pulse(self, ticker, accounts, keywords, hours_back, limit):
        assert keywords == ["Tesla", "Robotaxi"] or keywords == []
        import datetime as dt

        return PulseFetch(
            posts=[
                PulsePost(
                    id="1",
                    author="jensenhuang",
                    text=PostText.parse("shipping"),
                    created_at=dt.datetime.now(dt.timezone.utc),
                    engagement=5,
                )
            ],
            posts_returned=1,
        )


def test_run_pulse_summarizes_and_costs():
    out = run(
        tools.run_pulse(
            {"ticker": "NVDA", "accounts": ["@jensenhuang"]}, OnePostFeed()
        )
    )
    assert "⚡ 1 high-impact post(s)" in out["summary"]
    assert out["report"]["accounts"] == ["jensenhuang"]  # @-stripped
    assert "Not financial advice" in out["disclaimer"]


def test_run_pulse_threads_keywords():
    out = run(
        tools.run_pulse(
            {
                "ticker": "TSLA",
                "accounts": ["elonmusk"],
                "keywords": ["Tesla", "Robotaxi"],
            },
            OnePostFeed(),
        )
    )
    assert out["report"]["keywords"] == ["Tesla", "Robotaxi"]


def test_run_risk_frame_summarizes_and_disclaims():
    out = run(
        tools.run_risk_frame(
            {
                "ticker": "NVDA",
                "budget_usd": 200.0,
                "direction": "long",
                "stop_multiple": 2.0,
            },
            FixtureBars(),
        )
    )
    assert "25 shares" in out["summary"]
    assert "calculator" in out["framing"]
    assert "Not financial advice" in out["disclaimer"]


# ---------- server protocol ----------


def make_server():
    return OpenIntelServer(
        social=fixture_social(),
        market=MockMarketSource(),
        bars=FixtureBars(),
        pulse_feed=None,
    )


def test_server_initialize_and_tools_list():
    server = make_server()
    resp = run(server.handle({"jsonrpc": "2.0", "id": 1, "method": "initialize"}))
    assert resp["result"]["serverInfo"]["name"] == "openintel-tpu"
    resp = run(server.handle({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}))
    names = [t["name"] for t in resp["result"]["tools"]]
    assert names == [
        "list_sources",
        "analyze_ticker",
        "scan_watchlist",
        "compare_tickers",
        "x_pulse",
        "risk_frame",
    ]
    assert len(TOOL_SPECS) == 6


def test_server_tools_call_analyze():
    server = make_server()
    resp = run(
        server.handle(
            {
                "jsonrpc": "2.0",
                "id": 3,
                "method": "tools/call",
                "params": {"name": "analyze_ticker", "arguments": {"ticker": "AAPL"}},
            }
        )
    )
    assert resp["result"]["isError"] is False
    payload = json.loads(resp["result"]["content"][0]["text"])
    assert payload["report"]["fusion"]["alignment"] == "confirming_bullish"


def test_server_tool_error_is_tool_result_not_rpc_error():
    server = make_server()
    resp = run(
        server.handle(
            {
                "jsonrpc": "2.0",
                "id": 4,
                "method": "tools/call",
                "params": {"name": "x_pulse", "arguments": {"ticker": "NVDA"}},
            }
        )
    )
    assert resp["result"]["isError"] is True
    assert "not configured" in resp["result"]["content"][0]["text"]


def test_server_unknown_method_is_rpc_error():
    server = make_server()
    resp = run(server.handle({"jsonrpc": "2.0", "id": 5, "method": "nope"}))
    assert resp["error"]["code"] == -32601


def test_server_notifications_get_no_response():
    server = make_server()
    resp = run(server.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}))
    assert resp is None


def test_search_corpus_tool():
    from openintel_tpu.mcp.tools import run_search_corpus
    from openintel_tpu.models.retrievers import HybridRetriever

    docs = ["the quick brown fox", "lazy dogs sleep", "fox dog fox", "markets"]
    r = HybridRetriever.build(docs, dim=32)
    out = run_search_corpus({"queries": ["quick fox"], "k": 2}, r, docs)
    hits = out["results"][0]["hits"]
    assert hits[0]["doc_id"] in (0, 2) and "text" in hits[0]
    out_b = run_search_corpus(
        {"queries": ["lazy dogs"], "mode": "bm25"}, r, docs
    )
    assert out_b["results"][0]["hits"][0]["doc_id"] == 1
    import pytest

    with pytest.raises(ValueError):
        run_search_corpus({"queries": []}, r, docs)
    with pytest.raises(ValueError):
        run_search_corpus({"queries": ["x"], "mode": "nope"}, r, docs)


def test_server_tool_specs_gated_on_retriever():
    from openintel_tpu.mcp.server import OpenIntelServer

    s = OpenIntelServer(social=[], market=None)
    assert all(t["name"] != "search_corpus" for t in s.tool_specs)
    s2 = OpenIntelServer(social=[], market=None, retriever=object())
    assert any(t["name"] == "search_corpus" for t in s2.tool_specs)


def test_search_corpus_routes_hybrid_through_coalescer():
    from openintel_tpu.mcp.tools import run_search_corpus
    from openintel_tpu.models.retrievers import HybridRetriever
    from openintel_tpu.serving import BatchCoalescer

    docs = ["the quick brown fox", "lazy dogs sleep", "fox dog fox", "markets"]
    r = HybridRetriever.build(docs, dim=32)
    co = BatchCoalescer(
        lambda queries, k=10: r.search(queries, k=k, candidates_per_arm=2 * k),
        max_batch=8, max_wait_ms=1.0,
    )
    out = run_search_corpus({"queries": ["quick fox"], "k": 2}, r, docs, None, co)
    assert out["results"][0]["hits"]
    assert co.queries_run == 1 and co.batches_run == 1
    # single-arm modes bypass the coalescer
    run_search_corpus({"queries": ["lazy dogs"], "mode": "bm25"}, r, docs, None, co)
    assert co.queries_run == 1


def test_run_server_stats():
    from openintel_tpu.mcp.tools import run_server_stats
    from openintel_tpu.models.retrievers import HybridRetriever
    from openintel_tpu.serving import BatchCoalescer

    docs = ["a b c", "b c d", "c d e"]
    r = HybridRetriever.build(docs, dim=16)
    out = run_server_stats(r)
    assert out["retriever"] == "HybridRetriever" and out["n_docs"] == 3
    assert "coalescer" not in out

    co = BatchCoalescer(lambda q, k=10: r.search(q, k=k), max_batch=4)
    co.search(["b c"], k=2)
    out = run_server_stats(r, co)
    assert out["coalescer"]["queries_run"] == 1
    assert out["coalescer"]["batches_run"] == 1
    assert out["coalescer"]["max_batch"] == 4
    assert "3 docs" in out["summary"]


def test_search_corpus_filtered():
    """include_ids/exclude_ids give exact filtered retrieval through the MCP
    tool; filtered calls ride the coalescer as grouped-filter waves; the
    mask reaches mesh-sharded retrievers too."""
    import pytest

    from openintel_tpu.mcp.tools import run_search_corpus
    from openintel_tpu.models.retrievers import HybridRetriever
    from openintel_tpu.serving import BatchCoalescer

    docs = ["the quick brown fox", "lazy dogs sleep", "fox dog fox", "markets"]
    r = HybridRetriever.build(docs, dim=32)
    out = run_search_corpus(
        {"queries": ["quick fox"], "k": 2, "exclude_ids": [0, 2]}, r, docs
    )
    hits = out["results"][0]["hits"]
    assert hits and all(h["doc_id"] not in (0, 2) for h in hits)
    out = run_search_corpus(
        {"queries": ["quick fox"], "k": 4, "include_ids": [1, 3]}, r, docs
    )
    assert {h["doc_id"] for h in out["results"][0]["hits"]} <= {1, 3}

    co = BatchCoalescer(
        lambda queries, k=10, **kw: r.search(
            queries, k=k, candidates_per_arm=2 * k, **kw
        ),
        max_batch=8, max_wait_ms=1.0,
    )
    out = run_search_corpus(
        {"queries": ["quick fox"], "exclude_ids": [0]}, r, docs, None, co
    )
    assert co.queries_run == 1  # filtered searches coalesce too
    assert all(
        h["doc_id"] != 0 for h in out["results"][0]["hits"]
    )

    with pytest.raises(ValueError, match="out of range"):
        run_search_corpus({"queries": ["x"], "include_ids": [99]}, r, docs)

    class FakeSharded:  # no .bm25 attr => treated as mesh-sharded
        n_docs = 4

        def search(self, queries, k=10, candidates_per_arm=None,
                   mode="hybrid", filter_mask=None, filter_group=None):
            assert filter_mask is not None and filter_mask.tolist() == [
                True, False, True, True,
            ]
            import numpy as np

            return type("R", (), {
                "ids": np.full((len(queries), k), -1, np.int32),
                "scores": np.zeros((len(queries), k), np.float32),
            })()

    out = run_search_corpus(
        {"queries": ["x"], "exclude_ids": [1]}, FakeSharded(), docs
    )
    assert out["results"][0]["hits"] == []  # mask reached the sharded surface


def test_build_filter_groups_dedup_and_validation():
    import numpy as np
    import pytest

    from openintel_tpu.mcp.tools import build_filter_groups

    masks, groups = build_filter_groups(
        [
            {"include_ids": [1, 3]},
            None,
            {"include_ids": [3, 1]},  # same set, different order -> dedupes
            {"exclude_ids": [0]},
        ],
        4,
        5,
    )
    assert masks.shape == (3, 5) and groups.tolist() == [0, 1, 0, 2]
    assert masks[1].all()  # null entry = whole corpus
    assert set(np.flatnonzero(masks[0]).tolist()) == {1, 3}
    assert not masks[2][0] and masks[2][1:].all()

    with pytest.raises(ValueError, match="one per query"):
        build_filter_groups([None], 2, 5)
    with pytest.raises(ValueError, match="object or null"):
        build_filter_groups([[1, 2]], 1, 5)
    with pytest.raises(ValueError, match="unknown keys"):
        build_filter_groups([{"ids": [1]}], 1, 5)
    with pytest.raises(ValueError, match=r"filters\[0\].*out of range"):
        build_filter_groups([{"include_ids": [9]}], 1, 5)


def test_search_corpus_per_query_filters():
    """The `filters` list applies a DIFFERENT mask per query in one call —
    and is mutually exclusive with the call-wide id lists."""
    import pytest

    from openintel_tpu.mcp.tools import run_search_corpus
    from openintel_tpu.models.retrievers import HybridRetriever

    docs = ["the quick brown fox", "lazy dogs sleep", "fox dog fox", "markets"]
    r = HybridRetriever.build(docs, dim=32)
    out = run_search_corpus(
        {
            "queries": ["fox", "fox", "fox"],
            "k": 4,
            "filters": [
                {"include_ids": [0, 1]},
                {"include_ids": [2, 3]},
                None,
            ],
        },
        r,
        docs,
    )
    ids = [
        {h["doc_id"] for h in row["hits"]} for row in out["results"]
    ]
    assert ids[0] <= {0, 1} and ids[1] <= {2, 3}
    assert ids[2] >= {0, 2}  # unfiltered row still sees every fox doc

    with pytest.raises(ValueError, match="not both"):
        run_search_corpus(
            {
                "queries": ["x"],
                "filters": [None],
                "exclude_ids": [0],
            },
            r,
            docs,
        )


def test_concurrent_filtered_searches_fuse_one_device_batch():
    """Serving integration: concurrent search_corpus calls with DIFFERENT
    filters coalesce into one grouped-filter device batch, and every
    caller's hits respect its own filter."""
    import threading

    from openintel_tpu.mcp.tools import run_search_corpus
    from openintel_tpu.models.retrievers import HybridRetriever
    from openintel_tpu.serving import BatchCoalescer

    docs = [f"fox document number {i}" for i in range(12)]
    r = HybridRetriever.build(docs, dim=32)
    co = BatchCoalescer(
        lambda queries, k=10, **kw: r.search(
            queries, k=k, candidates_per_arm=2 * k, **kw
        ),
        max_batch=3, max_wait_ms=50.0,
    )
    results = {}

    def call(name, args):
        results[name] = run_search_corpus(args, r, docs, None, co)

    threads = [
        threading.Thread(target=call, args=(
            "low", {"queries": ["fox document"], "k": 6,
                    "include_ids": [0, 1, 2, 3]},
        )),
        threading.Thread(target=call, args=(
            "high", {"queries": ["fox document"], "k": 6,
                     "include_ids": [8, 9, 10, 11]},
        )),
        threading.Thread(target=call, args=(
            "plain", {"queries": ["fox document"], "k": 6},
        )),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)

    assert co.batches_run == 1 and co.queries_run == 3
    low = {h["doc_id"] for h in results["low"]["results"][0]["hits"]}
    high = {h["doc_id"] for h in results["high"]["results"][0]["hits"]}
    plain = {h["doc_id"] for h in results["plain"]["results"][0]["hits"]}
    assert low == {0, 1, 2, 3} and high == {8, 9, 10, 11}
    assert len(plain) == 6  # unfiltered caller unaffected by the wave


def test_search_corpus_updatable_guards():
    """Updatable servers: hybrid only, per-query filters rejected with a
    clear message, call-wide id filters honored."""
    import numpy as np
    import pytest

    from openintel_tpu.index.build import build_postings_index
    from openintel_tpu.index.schema import DenseIndex
    from openintel_tpu.mcp.tools import (
        run_delete_documents,
        run_index_documents,
        run_search_corpus,
    )
    from openintel_tpu.models.embedding import HashingEmbedder
    from openintel_tpu.models.updatable import UpdatableHybridRetriever

    docs = ["quick brown fox", "lazy dog", "fox fox dog", "markets"]
    emb = HashingEmbedder(dim=32)
    upd = UpdatableHybridRetriever(
        build_postings_index(docs),
        DenseIndex.from_embeddings(emb(docs)), emb, kernel="xla",
        doc_store=docs,
    )
    # single-arm modes serve through the two-segment merge too
    out_b = run_search_corpus({"queries": ["fox"], "mode": "bm25"}, upd, docs)
    assert out_b["results"][0]["hits"]
    out = run_search_corpus(
        {"queries": ["fox"], "k": 4, "exclude_ids": [0]}, upd, docs
    )
    ids = {h["doc_id"] for h in out["results"][0]["hits"]}
    assert ids and 0 not in ids
    # per-query filters work on the updatable surface too
    out = run_search_corpus(
        {
            "queries": ["fox", "fox"], "k": 4,
            "filters": [{"include_ids": [0, 1]}, {"include_ids": [2, 3]}],
        },
        upd, docs,
    )
    rows = [
        {h["doc_id"] for h in r["hits"]} for r in out["results"]
    ]
    assert rows[0] <= {0, 1} and rows[1] <= {2, 3} and rows[0] and rows[1]

    with pytest.raises(ValueError, match="non-empty list"):
        run_index_documents({"texts": []}, upd, None)
    with pytest.raises(ValueError, match="line breaks"):
        run_index_documents({"texts": ["two\rlines"]}, upd, None)
    # a TRAILING line break is one "line" to splitlines() but round-trips
    # through '\n'.join as two sidecar rows — must be rejected too
    # (advisor finding r3: silent one-id snippet shift after save+reload)
    for bad in ("trailing newline\n", "trailing nel\x85"):
        with pytest.raises(ValueError, match="line breaks"):
            run_index_documents({"texts": [bad]}, upd, None)
    with pytest.raises(ValueError, match="non-empty list"):
        run_delete_documents({"ids": []}, upd)
    with pytest.raises(ValueError, match="list of integers"):
        run_delete_documents({"ids": [3.7]}, upd)
    # the retriever's epoch owns the snippet store: ids + texts atomic
    out = run_index_documents({"texts": ["new fox doc"]}, upd, None)
    assert out["ids"] == [4] and upd.docs[4] == "new fox doc"
    out = run_search_corpus({"queries": ["fox"], "k": 5}, upd, None)
    hits = out["results"][0]["hits"]
    assert 4 in {h["doc_id"] for h in hits}
    assert any(h.get("text") == "new fox doc" for h in hits)

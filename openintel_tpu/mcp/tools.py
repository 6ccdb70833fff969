"""Transport-free tool logic for the six MCP tools
(reference: src/mcp/tools.rs).

- list_sources reports the *wired* sources, not the full SourceKind set;
- analyze_ticker adds a one-line human ``summary`` gloss;
- scan_watchlist runs per-ticker concurrently; one bad ticker never fails the
  batch;
- compare_tickers ranks by crowding | speculation_index | net_sentiment |
  divergence (diverging-first, then crowding);
- x_pulse is the paid, cost-accounted catalyst feed;
- risk_frame is a calculator, never advice.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Optional, Sequence

from openintel_tpu.application import DISCLAIMER, analyze
from openintel_tpu.application.analyze import analyze_batch
from openintel_tpu.application.pulse import pulse as pulse_app
from openintel_tpu.application.request import AnalysisRequest
from openintel_tpu.application.risk import risk_frame as risk_app
from openintel_tpu.domain.entities import SpeculationReport
from openintel_tpu.domain.ports import (
    BarSource,
    InfluencerFeed,
    MarketDataSource,
    SocialDataSource,
)
from openintel_tpu.domain.risk import LONG, SHORT
from openintel_tpu.domain.values import ALL_SOURCES, Alignment, SourceKind

RANK_BY = ("crowding", "speculation_index", "net_sentiment", "divergence")


def run_list_sources(
    social_sources: Sequence[SocialDataSource],
    market_source: Optional[MarketDataSource],
) -> dict[str, Any]:
    return {
        "social": [s.kind.value for s in social_sources],
        "market": [market_source.name] if market_source else [],
    }


def request_from(
    ticker: str,
    enable_reddit: Optional[bool] = None,
    enable_bluesky: Optional[bool] = None,
    no_market: Optional[bool] = None,
    limit: Optional[int] = None,
) -> AnalysisRequest:
    enabled: list[SourceKind] = []
    if enable_reddit:
        enabled.append(SourceKind.REDDIT)
    if enable_bluesky:
        enabled.append(SourceKind.BLUESKY)
    if not enabled:
        enabled = list(ALL_SOURCES)
    return AnalysisRequest(
        ticker=ticker,
        enabled_sources=tuple(enabled),
        market_enabled=not bool(no_market),
        limit=limit if limit is not None else 50,
    )


def summarize(report: SpeculationReport) -> str:
    """One-line human gloss for the text side of a tool result."""
    return (
        f"{report.ticker.as_str()} — {report.fusion.alignment.value}"
        f" · crowding {report.fusion.crowding * 100.0:.0f}%"
        f" · {report.social.total_mentions} mentions"
        f" ({report.social_confidence.value})"
    )


async def run_analyze(
    args: dict[str, Any],
    social_sources: Sequence[SocialDataSource],
    market_source: Optional[MarketDataSource],
) -> dict[str, Any]:
    req = request_from(
        args["ticker"],
        args.get("enable_reddit"),
        args.get("enable_bluesky"),
        args.get("no_market"),
        args.get("limit"),
    )
    report = await analyze(req, social_sources, market_source)
    return {
        "summary": summarize(report),
        "report": report.to_dict(),
        "disclaimer": DISCLAIMER,
    }


async def run_scan(
    args: dict[str, Any],
    social_sources: Sequence[SocialDataSource],
    market_source: Optional[MarketDataSource],
) -> dict[str, Any]:
    """IO fans out per ticker; ALL tickers then fuse in one device program
    (engine_batch.aggregate_batch). One bad ticker never fails the batch."""
    tickers = list(args.get("tickers", []))
    reqs = [
        request_from(
            t,
            args.get("enable_reddit"),
            args.get("enable_bluesky"),
            args.get("no_market"),
            args.get("limit"),
        )
        for t in tickers
    ]
    results = await analyze_batch(reqs, social_sources, market_source)
    entries = [
        {"ticker": t, "error": str(r)}
        if isinstance(r, Exception)
        else {"ticker": t, "report": r.to_dict()}
        for t, r in zip(tickers, results)
    ]
    return {"entries": entries, "disclaimer": DISCLAIMER}


def rank_metric(report: SpeculationReport, rank_by: str) -> float:
    # `divergence` ranks categorically (diverging first) then by crowding,
    # so its numeric metric is crowding.
    if rank_by in ("crowding", "divergence"):
        return report.fusion.crowding
    if rank_by == "speculation_index":
        return report.social.speculation_index.value
    if rank_by == "net_sentiment":
        return report.social.net_sentiment.value
    raise ValueError(f"unknown rank_by {rank_by!r} (expected one of {RANK_BY})")


def sort_ranked(ranked: list[dict[str, Any]], rank_by: str) -> None:
    """Stable descending by metric; divergence mode puts diverging first."""
    if rank_by == "divergence":
        ranked.sort(
            key=lambda e: (
                e["report"]["fusion"]["alignment"] != Alignment.DIVERGING.value,
                -e["rank_metric"],
            )
        )
    else:
        ranked.sort(key=lambda e: -e["rank_metric"])


async def run_compare(
    args: dict[str, Any],
    social_sources: Sequence[SocialDataSource],
    market_source: Optional[MarketDataSource],
) -> dict[str, Any]:
    rank_by = args.get("rank_by") or "crowding"
    if rank_by not in RANK_BY:
        raise ValueError(f"unknown rank_by {rank_by!r} (expected one of {RANK_BY})")

    tickers = list(args.get("tickers", []))
    reqs = [
        request_from(
            t,
            args.get("enable_reddit"),
            args.get("enable_bluesky"),
            args.get("no_market"),
            args.get("limit"),
        )
        for t in tickers
    ]
    results = await analyze_batch(reqs, social_sources, market_source)
    ranked: list[dict[str, Any]] = []
    errors: list[dict[str, str]] = []
    for ticker, report in zip(tickers, results):
        if isinstance(report, Exception):
            errors.append({"ticker": ticker, "error": str(report)})
        else:
            ranked.append(
                {
                    "ticker": ticker,
                    "rank_metric": rank_metric(report, rank_by),
                    "report": report.to_dict(),
                }
            )
    sort_ranked(ranked, rank_by)
    return {
        "rank_by": rank_by,
        "ranked": ranked,
        "errors": errors,
        "disclaimer": DISCLAIMER,
    }


async def run_pulse(args: dict[str, Any], feed: InfluencerFeed) -> dict[str, Any]:
    report = await pulse_app(
        args["ticker"],
        args.get("accounts") or [],
        args.get("keywords") or [],
        24 if args.get("hours_back") is None else args["hours_back"],
        20 if args.get("limit") is None else args["limit"],
        feed,
        dt.datetime.now(dt.timezone.utc),
    )
    summary = (
        f"{report.ticker} — ⚡ {len(report.posts)} high-impact post(s) in last "
        f"{report.hours_back}h from {len(report.accounts)} account(s) · "
        f"{report.posts_read} posts read ≈ ${report.estimated_cost_usd:.2f}"
    )
    return {"summary": summary, "report": report.to_dict(), "disclaimer": DISCLAIMER}


def _filter_key(inc, exc) -> tuple:
    """Canonical hashable identity of an include/exclude filter spec —
    the coalescer dedupes waves by THIS key, so the per-query and
    whole-call paths must build it identically or cross-caller dedup
    silently degrades."""
    return (
        tuple(sorted(int(x) for x in inc)) if inc is not None else None,
        tuple(sorted(int(x) for x in exc)) if exc is not None else None,
    )


def build_filter_entries(filters, n_queries: int, n_docs: int):
    """Per-query filter specs -> a list of ``serving.FilterEntry`` (None
    for unfiltered queries, ``(hashable key, (n_docs,) bool mask)``
    otherwise) aligned with the query batch.

    ``filters`` is a list aligned with ``queries``: each entry an object
    ``{"include_ids"?, "exclude_ids"?}`` or null (that query searches the
    whole corpus). Identical specs share ONE key + mask object, so device
    operands and coalescer dedup scale with DISTINCT filters (the
    multi-tenant shape), never with the query count."""
    from openintel_tpu.models.retrievers import make_filter_mask

    if not isinstance(filters, list) or len(filters) != n_queries:
        raise ValueError(
            f"filters must be a list of {n_queries} entries — one per "
            "query, null for unfiltered"
        )
    cache: dict[tuple, Any] = {}
    entries = []
    for i, spec in enumerate(filters):
        if spec is None:
            spec = {}
        if not isinstance(spec, dict):
            raise ValueError(f"filters[{i}] must be an object or null")
        unknown = set(spec) - {"include_ids", "exclude_ids"}
        if unknown:
            raise ValueError(f"filters[{i}]: unknown keys {sorted(unknown)}")
        inc, exc = spec.get("include_ids"), spec.get("exclude_ids")
        key = _filter_key(inc, exc)
        if key == (None, None):
            entries.append(None)
            continue
        mask = cache.get(key)
        if mask is None:
            try:
                mask = cache[key] = make_filter_mask(
                    n_docs, include_ids=inc, exclude_ids=exc
                )
            except ValueError as e:
                raise ValueError(f"filters[{i}]: {e}") from e
        entries.append((key, mask))
    return entries


def build_filter_groups(filters, n_queries: int, n_docs: int):
    """Per-query filter specs -> ((G, n_docs) bool masks, (B,) int32
    groups) for the retrievers' grouped-filter surface — or (None, None)
    when every entry is null (plain unfiltered search). See
    :func:`build_filter_entries` for the spec format."""
    from openintel_tpu.serving import fuse_filter_entries

    return fuse_filter_entries(
        build_filter_entries(filters, n_queries, n_docs)
    )


def run_search_corpus(
    args: dict[str, Any], retriever, docs=None, reranker=None, coalescer=None
) -> dict[str, Any]:
    """Hybrid/bm25/dense retrieval over the server's indexed corpus, with an
    optional cross-encoder second stage when the server holds a reranker.

    When the server wires a ``BatchCoalescer`` (production default), hybrid
    searches route through it so concurrent callers fuse into one device
    batch — FILTERED ones included: per-query/per-call filters ride the
    wave as (key, mask) entries and fuse into one grouped-filter dispatch
    (``serving.fuse_filter_entries``), so concurrent tenants still share a
    device batch. The single-arm modes go straight to the retriever."""
    queries = list(args.get("queries") or [])
    if not queries:
        raise ValueError("queries must be a non-empty list of strings")
    # clamp k: it feeds jitted-program cache keys (a distinct program per
    # distinct k), so unbounded client values would grow compile caches
    k = max(1, min(int(args.get("k") or 10), 1000))
    mode = (args.get("mode") or "hybrid").lower()
    if mode not in ("hybrid", "bm25", "dense"):
        raise ValueError("mode must be hybrid, bm25, or dense")
    filter_entries = None
    single_mask = None  # the whole-call (n_docs,) mask, when given as ids
    if args.get("filters") is not None:
        if (
            args.get("include_ids") is not None
            or args.get("exclude_ids") is not None
        ):
            raise ValueError(
                "pass either filters (per-query) or include_ids/exclude_ids "
                "(whole call), not both"
            )
        filter_entries = build_filter_entries(
            args["filters"], len(queries), retriever.n_docs
        )
    elif args.get("include_ids") is not None or args.get("exclude_ids") is not None:
        from openintel_tpu.models.retrievers import make_filter_mask

        inc, exc = args.get("include_ids"), args.get("exclude_ids")
        single_mask = make_filter_mask(
            retriever.n_docs, include_ids=inc, exclude_ids=exc
        )
        filter_entries = [(_filter_key(inc, exc), single_mask)] * len(queries)

    def _direct_filter_kwargs() -> dict[str, Any]:
        # grouped operands for the NON-coalesced branches only — the
        # coalescer path fuses per wave, so stacking masks here would be
        # wasted work on the production hot path
        if filter_entries is None:
            return {}
        if single_mask is not None:
            return {"filter_mask": single_mask}
        from openintel_tpu.serving import fuse_filter_entries

        masks, groups = fuse_filter_entries(filter_entries)
        if masks is None:
            return {}
        return {"filter_mask": masks, "filter_group": groups}

    updatable = hasattr(retriever, "add_documents")
    if updatable:
        # ONE epoch for ids AND texts: a concurrent compaction renumbers
        # ids, so the snippet store must come from the same snapshot.
        # (Updatable servers run without a coalescer — a live corpus's
        # id space moves between waves.)
        res, epoch_docs = retriever.search_with_docs(
            queries, k=k, candidates_per_arm=2 * k, mode=mode,
            **_direct_filter_kwargs(),
        )
        if epoch_docs is not None:
            docs = epoch_docs
    elif mode == "hybrid" and coalescer is not None:
        res = coalescer.search(queries, k=k, filters=filter_entries)
    elif not hasattr(retriever, "bm25"):
        # mesh-sharded retriever: every arm serves through the one sharded
        # device program (parallel.retriever.ShardedHybridRetriever)
        res = retriever.search(
            queries, k=k, candidates_per_arm=2 * k, mode=mode,
            **_direct_filter_kwargs(),
        )
    elif mode == "bm25":
        res = retriever.bm25.search(queries, k=k, **_direct_filter_kwargs())
    elif mode == "dense":
        res = retriever.dense.search(queries, k=k, **_direct_filter_kwargs())
    else:
        res = retriever.search(
            queries, k=k, candidates_per_arm=2 * k, **_direct_filter_kwargs()
        )
    reranked = False
    if reranker is not None and docs is not None:
        from openintel_tpu.models.reranker import rerank_search_result

        res = rerank_search_result(reranker, queries, res, docs)
        reranked = True
    results = []
    for i, q in enumerate(queries):
        hits = []
        for d, s in zip(res.ids[i], res.scores[i]):
            if d < 0:
                continue
            hit = {"doc_id": int(d), "score": float(s)}
            if docs is not None and int(d) < len(docs):
                hit["text"] = docs[int(d)][:500]
            hits.append(hit)
        results.append({"query": q, "hits": hits})
    return {
        "summary": (
            f"{len(queries)} queries × top-{k} ({mode}"
            + (", cross-encoder reranked)" if reranked else ")")
        ),
        "results": results,
    }


def run_index_documents(
    args: dict[str, Any], retriever, docs: Optional[list] = None
) -> dict[str, Any]:
    """Add documents to an updatable server's corpus: searchable
    immediately via the incremental delta segment
    (models/updatable.py::UpdatableHybridRetriever.add_documents)."""
    texts = args.get("texts")
    if (
        not isinstance(texts, list)
        or not texts
        or not all(isinstance(t, str) and t.strip() for t in texts)
    ):
        raise ValueError("texts must be a non-empty list of non-empty strings")
    if any(t.splitlines() != [t] for t in texts):
        # the docs sidecar is newline-delimited and read back with
        # splitlines() (which also splits on \r, \v, \f, \x85, U+2028,
        # U+2029) — an embedded OR trailing line break ('abc\n' is one
        # "line" but round-trips through '\n'.join as two sidecar rows)
        # would silently shift every later snippet by one id on reload
        raise ValueError(
            "texts must not contain line breaks (one doc per entry)"
        )
    if len(texts) > 10_000:
        # the delta rebuild is O(delta) per call — a runaway add batch
        # should be chunked by the caller, not absorbed silently
        raise ValueError("at most 10000 texts per call (batch your adds)")
    # the retriever's epoch carries the id-aligned snippet store, so ids
    # and texts move together atomically (models/updatable.py::_Epoch)
    del docs
    ids = retriever.add_documents(texts)
    stats = retriever.stats
    return {
        "ids": [int(i) for i in ids],
        "summary": (
            f"indexed {len(texts)} docs (ids {int(ids[0])}..{int(ids[-1])}); "
            f"{stats['n_alive']} alive of {stats['n_main'] + stats['n_delta']}"
        ),
        "stats": stats,
    }


def run_delete_documents(args: dict[str, Any], retriever) -> dict[str, Any]:
    """Tombstone documents by id — they stop surfacing immediately."""
    ids = args.get("ids")
    if not isinstance(ids, list) or not ids or not all(
        isinstance(i, int) and not isinstance(i, bool) for i in ids
    ):
        # int(3.7) would silently tombstone doc 3 — an irreversible
        # wrong-doc delete must be a rejection, never a truncation
        raise ValueError("ids must be a non-empty list of integers")
    retriever.delete_ids(ids)
    stats = retriever.stats
    return {
        "summary": (
            f"deleted {len(ids)} doc(s); {stats['n_alive']} alive of "
            f"{stats['n_main'] + stats['n_delta']}"
        ),
        "stats": stats,
    }


def run_compact_corpus(
    args: dict[str, Any],
    retriever,
    docs: Optional[list] = None,
    index_prefix: Optional[str] = None,
    encoder_dir: Optional[str] = None,
) -> dict[str, Any]:
    """Fold the delta + tombstones into one fresh served segment
    (models/updatable.py::compact_in_place) and optionally persist it to
    the server's OWN --index prefix (never a caller-supplied path — an
    agent must not get filesystem write primitives through a search
    server). The snippet store lives in the retriever's epoch and
    renumbers with the ids; the WHOLE operation — fold, stats, save —
    runs under the update lock, so what lands on disk is exactly the
    state the response describes."""
    import numpy as np

    del docs  # the epoch carries the snippet store
    if args.get("save") and not index_prefix:
        raise ValueError("this server has no --index prefix to save to")
    with retriever.update_lock:
        stats_before = retriever.stats
        id_map = retriever.compact_in_place()
        stats_after = retriever.stats
        n_docs = retriever.n_docs
        saved = False
        if args.get("save"):
            from openintel_tpu.index.checkpoint import save_index

            # main_postings/main_dense: segment-type-agnostic (the mesh
            # subclass's base has no .bm25/.dense attributes)
            save_index(
                index_prefix, retriever.main_postings,
                retriever.main_dense, retriever.docs,
                encoder=encoder_dir,
            )
            saved = True
    survivors = np.flatnonzero(id_map >= 0)
    renumbered = bool((id_map[survivors] != survivors).any())
    out: dict[str, Any] = {
        "summary": (
            f"compacted: folded {stats_before['n_delta']} delta docs, "
            f"dropped {stats_before['n_deleted']} deleted; now "
            f"{n_docs} docs in one segment"
            + ("; DOC IDS RENUMBERED" if renumbered else "")
        ),
        "n_docs": int(n_docs),
        "ids_renumbered": renumbered,
        "stats": stats_after,
    }
    if saved:
        out["saved_to"] = index_prefix
        out["summary"] += f"; saved to {index_prefix}"
    return out


def run_server_stats(
    retriever, coalescer=None, inflight_s=None
) -> dict[str, Any]:
    """Serving observability: coalescer counters + retriever configuration.
    ``inflight_s`` is the server-level oldest in-flight search age — the
    backend-hang detector for coalescer-less (e.g. --updatable) servers."""
    out: dict[str, Any] = {
        "retriever": type(retriever).__name__,
        "n_docs": int(getattr(retriever, "n_docs", 0)),
        "kernel": getattr(retriever, "kernel", None),
    }
    if coalescer is None:
        out["oldest_inflight_s"] = (
            round(inflight_s, 3) if inflight_s is not None else None
        )
    if hasattr(retriever, "add_documents"):  # --updatable
        out["updatable"] = retriever.stats
    if coalescer is not None:
        batches = coalescer.batches_run
        queries = coalescer.queries_run
        oldest = coalescer.oldest_inflight_s()
        out["coalescer"] = {
            "batches_run": batches,
            "queries_run": queries,
            "avg_queries_per_batch": (
                round(queries / batches, 2) if batches else None
            ),
            "max_batch": coalescer.max_batch,
            "max_wait_ms": coalescer.max_wait * 1e3,
            # health: seconds the oldest in-flight device call has been
            # out (null = idle). Far above normal batch latency => the
            # backend hung mid-call; orchestrators should restart.
            "oldest_inflight_s": (
                round(oldest, 3) if oldest is not None else None
            ),
        }
    out["summary"] = (
        f"{out['n_docs']} docs via {out['retriever']}"
        + (
            f"; {queries} queries in {batches} device batches"
            if coalescer is not None
            else ""
        )
    )
    return out


RISK_FRAMING = (
    "risk_frame is a calculator, not advice — it never recommends taking a trade."
)


async def run_risk_frame(args: dict[str, Any], bars: BarSource) -> dict[str, Any]:
    direction = (args.get("direction") or LONG).lower()
    if direction not in (LONG, SHORT):
        raise ValueError(f"direction must be '{LONG}' or '{SHORT}'")
    frame = await risk_app(
        args["ticker"],
        direction,
        float(args["budget_usd"]),
        args.get("stop_multiple"),
        args.get("entry"),
        bars,
        dt.datetime.now(dt.timezone.utc),
    )
    summary = (
        f"{frame.ticker} {frame.direction} — entry {frame.entry:.2f} · "
        f"stop {frame.stop:.2f} · {frame.shares} shares · "
        f"max loss ${frame.max_loss_usd:.2f} (≤ ${frame.budget_usd:.2f}) · "
        f"1R {frame.targets[0]:.2f}"
    )
    return {
        "summary": summary,
        "frame": frame.to_dict(),
        "framing": RISK_FRAMING,
        "disclaimer": DISCLAIMER,
    }

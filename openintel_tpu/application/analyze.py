"""The analyze use case: concurrent source fan-out -> analyzer -> engine.

Graceful-degradation semantics (reference: src/application/analyze.rs:16-73):
- enabled-but-unwired source -> note;
- per-source fetch failure -> note, never a crash;
- market failure -> note + social-only report;
- all-empty input -> NoData;
- orchestration notes are prepended to engine notes.
"""

from __future__ import annotations

import asyncio
import datetime as dt
from typing import Optional, Sequence

from openintel_tpu.application.request import AnalysisRequest
from openintel_tpu.domain.engine import SpeculationEngine
from openintel_tpu.domain.entities import (
    MarketSnapshot,
    SocialPost,
    SpeculationReport,
    Ticker,
)
from openintel_tpu.domain.ports import MarketDataSource, PostAnalyzer, SocialDataSource
from openintel_tpu.errors import NoData


async def analyze(
    req: AnalysisRequest,
    social_sources: Sequence[SocialDataSource],
    market_source: Optional[MarketDataSource],
    analyzer: Optional[PostAnalyzer] = None,
    now: Optional[dt.datetime] = None,
) -> SpeculationReport:
    ticker = Ticker.parse(req.ticker)

    notes: list[str] = []
    for kind in req.enabled_sources:
        if not any(s.kind == kind for s in social_sources):
            notes.append(f"{kind.value} enabled but not configured")

    enabled = [s for s in social_sources if s.kind in req.enabled_sources]

    async def fetch_one(source: SocialDataSource):
        try:
            return source.kind, await source.fetch(ticker, req.limit), None
        except Exception as e:  # graceful degradation: failure -> note
            return source.kind, None, e

    results = await asyncio.gather(*(fetch_one(s) for s in enabled))

    posts: list[SocialPost] = []
    for kind, fetched, err in results:
        if err is not None:
            notes.append(f"source {kind.value} failed: {err}")
        else:
            posts.extend(fetched)

    market: Optional[MarketSnapshot] = None
    if req.market_enabled and market_source is not None:
        try:
            market = await market_source.snapshot(ticker)
        except Exception as e:
            notes.append(f"market source failed: {e}")

    if not posts and market is None:
        raise NoData()

    if analyzer is None:
        from openintel_tpu.models.lexicon import LexiconAnalyzer

        analyzer = LexiconAnalyzer()
    signals = await analyzer.analyze(posts)

    report = SpeculationEngine.aggregate(
        ticker,
        posts,
        signals,
        market,
        now or dt.datetime.now(dt.timezone.utc),
        req.engine,
    )
    report.fusion.notes = notes + report.fusion.notes
    return report

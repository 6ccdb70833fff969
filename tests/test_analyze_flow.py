"""End-to-end analyze flow on the fixture corpus — the reference's integration
suite (tests/analyze_flow.rs:118-154) plus the BASELINE.md derived goldens:

- all fixtures + mock market: 10 mentions, confirming_bullish, net +0.50,
  spec index 0.30, crowding ~0.4967, pct_change +4.05%, confidence medium;
- reddit-only: 4 mentions;
- no market: quiet.
"""

import asyncio

import pytest

from openintel_tpu.application import analyze
from openintel_tpu.application.request import AnalysisRequest
from openintel_tpu.domain.values import Alignment, Confidence, SourceKind
from openintel_tpu.errors import NoData
from openintel_tpu.sources.fixtures import (
    FailingSource,
    MockMarketSource,
    bluesky_fixture,
    fixture_social,
    reddit_fixture,
)


def run(req, social, market, **kw):
    return asyncio.run(analyze(req, social, market, **kw))


def test_full_fixture_run_confirming_bullish():
    report = run(AnalysisRequest(ticker="AAPL"), fixture_social(), MockMarketSource())
    assert report.social.total_mentions == 10
    assert report.social.mentions_by_source == {"reddit": 4, "bluesky": 6}
    assert report.fusion.alignment is Alignment.CONFIRMING_BULLISH
    assert abs(report.social.net_sentiment.value - 0.50) < 1e-9
    assert report.social.bullish == 7
    assert report.social.bearish == 2
    assert report.social.neutral == 1
    assert abs(report.social.bull_bear_ratio - 3.5) < 1e-9
    assert abs(report.social.speculation_index.value - 0.30) < 1e-9
    # crowding = 0.5*0.3 + 0.3*(1.8269.../3) + 0.2*0.82 ~ 0.4967
    expected_crowding = 0.5 * 0.3 + 0.3 * ((95 / 52) / 3.0) + 0.2 * 0.82
    assert abs(report.fusion.crowding - expected_crowding) < 1e-9
    assert abs(report.market.pct_change - (192.50 - 185.00) / 185.00 * 100.0) < 1e-9
    assert report.social_confidence is Confidence.MEDIUM


def test_reddit_only_counts_four_mentions():
    req = AnalysisRequest(ticker="AAPL", enabled_sources=(SourceKind.REDDIT,))
    report = run(req, fixture_social(), MockMarketSource())
    assert report.social.total_mentions == 4
    assert report.social.mentions_by_source == {"reddit": 4}


def test_no_market_is_quiet():
    req = AnalysisRequest(ticker="AAPL", market_enabled=False)
    report = run(req, fixture_social(), MockMarketSource())
    assert report.market is None
    assert report.fusion.alignment is Alignment.QUIET


def test_invalid_ticker_errors():
    from openintel_tpu.errors import InvalidTicker

    with pytest.raises(InvalidTicker):
        run(AnalysisRequest(ticker="$$$"), fixture_social(), MockMarketSource())


def test_enabled_source_absent_is_noted():
    report = run(
        AnalysisRequest(ticker="AAPL", market_enabled=False), [bluesky_fixture()], None
    )
    assert report.social.total_mentions == 6
    assert any("reddit enabled but not configured" in n for n in report.fusion.notes)


def test_failed_source_becomes_note_not_crash():
    social = [reddit_fixture(), FailingSource(SourceKind.BLUESKY)]
    report = run(AnalysisRequest(ticker="AAPL"), social, MockMarketSource())
    assert report.social.total_mentions == 4
    assert any("source bluesky failed" in n for n in report.fusion.notes)


def test_market_failure_degrades_to_social_only():
    class FailingMarket:
        @property
        def name(self):
            return "failing"

        async def snapshot(self, ticker):
            raise RuntimeError("market down")

    report = run(AnalysisRequest(ticker="AAPL"), fixture_social(), FailingMarket())
    assert report.market is None
    assert any("market source failed" in n for n in report.fusion.notes)
    assert report.fusion.alignment is Alignment.QUIET


def test_zero_sources_and_no_market_is_no_data():
    with pytest.raises(NoData):
        run(AnalysisRequest(ticker="AAPL", market_enabled=False), [], None)


def test_limit_honored():
    req = AnalysisRequest(ticker="AAPL", limit=2)
    report = run(req, fixture_social(), MockMarketSource())
    assert report.social.total_mentions == 4  # 2 per source

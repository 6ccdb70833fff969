"""SpeculationEngine parity tests with hand-computed goldens.

Mirrors the reference's colocated engine tests
(src/domain/engine/speculation_engine.rs:219-555), including the crowding
renormalisation goldens 0.2 vs 0.125.
"""

import datetime as dt

import pytest

from openintel_tpu.domain.engine import EngineConfig, SpeculationEngine
from openintel_tpu.domain.entities import (
    MarketSnapshot,
    PostText,
    SocialPost,
    Ticker,
)
from openintel_tpu.domain.values import Alignment, Confidence, PostSignal, SourceKind
from openintel_tpu.errors import AnalyzerMismatch, MarketTickerMismatch

TICKER = Ticker.parse("AAPL")
NOW = dt.datetime(2026, 6, 24, tzinfo=dt.timezone.utc)
CFG = EngineConfig()


def post(source=SourceKind.REDDIT):
    return SocialPost(
        id="x",
        source=source,
        author="a",
        text=PostText.parse("placeholder"),
        created_at=NOW,
        engagement=0,
    )


def sig(polarity, speculative):
    return PostSignal.of(polarity, speculative)


def snapshot(last, prev, vol, avg, iv=None, ticker=TICKER):
    return MarketSnapshot(
        ticker=ticker,
        as_of=NOW,
        last_price=last,
        previous_close=prev,
        volume=vol,
        avg_volume=avg,
        realized_vol=None,
        put_call_ratio=None,
        iv_rank=iv,
    )


def bullish_batch():
    """12 posts: 9 bullish (+0.8), 3 neutral — net ~0.6, all reddit."""
    posts = [post() for _ in range(12)]
    signals = [sig(0.8, True)] * 9 + [sig(0.0, False)] * 3
    return posts, signals


def test_engine_config_defaults_match_spec():
    c = EngineConfig()
    assert c.bull_bear_threshold == 0.2
    assert c.net_sentiment_threshold == 0.05
    assert c.price_move_threshold == 1.0
    assert c.crowding_weight_spec == 0.5
    assert c.crowding_weight_rvol == 0.3
    assert c.crowding_weight_iv == 0.2
    assert c.rvol_cap == 3.0
    assert c.min_sample == 10
    assert c.confidence_low == 10
    assert c.confidence_high == 50


def test_confirming_bullish_when_sentiment_and_price_agree():
    posts, signals = bullish_batch()
    m = snapshot(110.0, 100.0, 1, 1, iv=0.5)  # +10%
    report = SpeculationEngine.aggregate(TICKER, posts, signals, m, NOW, CFG)
    assert report.fusion.alignment is Alignment.CONFIRMING_BULLISH
    assert report.social.bullish == 9
    assert report.social_confidence is Confidence.MEDIUM  # 12 mentions
    assert report.market is not None


def test_diverging_when_sentiment_up_but_price_down():
    posts, signals = bullish_batch()
    m = snapshot(90.0, 100.0, 1, 1)  # -10%
    report = SpeculationEngine.aggregate(TICKER, posts, signals, m, NOW, CFG)
    assert report.fusion.alignment is Alignment.DIVERGING


def test_confirming_bearish_when_sentiment_and_price_agree_down():
    posts = [post() for _ in range(12)]
    signals = [sig(-0.8, True)] * 9 + [sig(0.0, False)] * 3
    m = snapshot(90.0, 100.0, 1, 1)
    report = SpeculationEngine.aggregate(TICKER, posts, signals, m, NOW, CFG)
    assert report.fusion.alignment is Alignment.CONFIRMING_BEARISH


def test_empty_input_is_quiet_and_zeroed():
    report = SpeculationEngine.aggregate(TICKER, [], [], None, NOW, CFG)
    assert report.social.total_mentions == 0
    assert report.social.net_sentiment.value == 0.0
    assert report.social.speculation_index.value == 0.0
    assert report.fusion.alignment is Alignment.QUIET
    assert report.fusion.crowding == 0.0
    assert report.social_confidence is Confidence.LOW


def test_no_market_forces_quiet_alignment():
    posts, signals = bullish_batch()
    report = SpeculationEngine.aggregate(TICKER, posts, signals, None, NOW, CFG)
    assert report.market is None
    assert report.fusion.alignment is Alignment.QUIET
    assert any("social-only" in n for n in report.fusion.notes)


def test_length_mismatch_errors():
    posts = [post(), post()]
    with pytest.raises(AnalyzerMismatch) as exc:
        SpeculationEngine.aggregate(TICKER, posts, [sig(0.5, False)], None, NOW, CFG)
    assert exc.value.expected == 2 and exc.value.got == 1


def test_market_ticker_mismatch_errors():
    msft = snapshot(100.0, 100.0, 1, 1, ticker=Ticker.parse("MSFT"))
    with pytest.raises(MarketTickerMismatch):
        SpeculationEngine.aggregate(TICKER, [], [], msft, NOW, CFG)


def test_bull_bear_ratio_is_none_without_bears():
    report = SpeculationEngine.aggregate(
        TICKER, [post()], [sig(0.9, False)], None, NOW, CFG
    )
    assert report.social.bull_bear_ratio is None


def test_rvol_guarded_when_avg_volume_zero():
    m = snapshot(100.0, 100.0, 10, 0)
    report = SpeculationEngine.aggregate(
        TICKER, [post()], [sig(0.0, False)], m, NOW, CFG
    )
    assert report.market.rvol is None
    assert any("avg_volume" in n for n in report.fusion.notes)


def test_previous_close_zero_guarded():
    m = snapshot(100.0, 0.0, 10, 10)
    report = SpeculationEngine.aggregate(
        TICKER, [post()], [sig(0.0, False)], m, NOW, CFG
    )
    assert report.market.pct_change == 0.0
    assert any("previous_close" in n for n in report.fusion.notes)


def test_crowding_renormalizes_when_rvol_unavailable():
    # 1 speculative post (spec_index 1.0), avg_volume=0, iv absent:
    # only spec weight present -> 0.5*1.0 / 0.5 = 1.0.
    m = snapshot(100.0, 100.0, 0, 0)
    report = SpeculationEngine.aggregate(
        TICKER, [post()], [sig(0.0, True)], m, NOW, CFG
    )
    assert abs(report.fusion.crowding - 1.0) < 1e-9


def test_crowding_renormalizes_without_market():
    posts = [post() for _ in range(3)]
    signals = [sig(0.0, True)] * 3
    report = SpeculationEngine.aggregate(TICKER, posts, signals, None, NOW, CFG)
    assert report.fusion.crowding == 1.0


def test_crowding_uses_market_and_iv_branch_and_renormalizes():
    # Reference golden (speculation_engine.rs:519-555): with iv -> 0.2; without -> 0.125.
    posts, signals = [post()], [sig(0.0, False)]
    with_iv = snapshot(100.0, 100.0, 10, 10, iv=0.5)
    r1 = SpeculationEngine.aggregate(TICKER, posts, signals, with_iv, NOW, CFG)
    assert abs(r1.fusion.crowding - 0.2) < 1e-9
    no_iv = snapshot(100.0, 100.0, 10, 10)
    r2 = SpeculationEngine.aggregate(TICKER, posts, signals, no_iv, NOW, CFG)
    assert abs(r2.fusion.crowding - 0.125) < 1e-9


def test_min_sample_gate_quiet_even_with_agreeing_market():
    posts = [post() for _ in range(5)]
    signals = [sig(0.8, True)] * 5
    m = snapshot(110.0, 100.0, 1, 1, iv=0.5)
    report = SpeculationEngine.aggregate(TICKER, posts, signals, m, NOW, CFG)
    assert report.market is not None
    assert report.fusion.alignment is Alignment.QUIET


def test_report_serializes_with_enum_source_keys():
    import json

    posts = [post(), post()]
    signals = [sig(0.4, False), sig(0.4, True)]
    report = SpeculationEngine.aggregate(TICKER, posts, signals, None, NOW, CFG)
    blob = json.dumps(report.to_dict())
    assert '"reddit": 2' in blob
    assert '"speculation_index": 0.5' in blob
    assert '"alignment": "quiet"' in blob

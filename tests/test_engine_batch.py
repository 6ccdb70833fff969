"""Cross-check the jittable batch engine against the pure-Python engine on
randomised inputs — the array path must be semantics-identical
(reference behavior: src/domain/engine/speculation_engine.rs:70-208)."""

import datetime as dt

import numpy as np

from openintel_tpu.domain.engine import EngineConfig, SpeculationEngine
from openintel_tpu.domain.engine_batch import (
    ALIGNMENT_CODES,
    CONFIDENCE_CODES,
    BatchMarket,
    BatchSignals,
    aggregate_batch,
)
from openintel_tpu.domain.entities import MarketSnapshot, PostText, SocialPost, Ticker
from openintel_tpu.domain.values import PostSignal, SourceKind

NOW = dt.datetime(2026, 6, 24, tzinfo=dt.timezone.utc)
CFG = EngineConfig()


def _random_case(rng, n_max=24):
    n = int(rng.integers(0, n_max))
    pol = rng.uniform(-1, 1, size=n)
    spec = rng.random(n) < 0.3
    has_market = rng.random() < 0.8
    market = None
    if has_market:
        prev = float(rng.choice([0.0, 100.0, 185.0]))
        iv = float(rng.uniform(0, 1)) if rng.random() < 0.5 else None
        market = MarketSnapshot(
            ticker=Ticker.parse("AAPL"),
            as_of=NOW,
            last_price=float(rng.uniform(50, 250)),
            previous_close=prev,
            volume=int(rng.integers(0, 10**8)),
            avg_volume=int(rng.choice([0, 52_000_000])),
            iv_rank=iv,
        )
    return pol, spec, market


def test_batch_engine_matches_pure_engine():
    rng = np.random.default_rng(0)
    B, N = 64, 24
    cases = [_random_case(rng, N) for _ in range(B)]

    polarity = np.zeros((B, N), np.float32)
    speculative = np.zeros((B, N), bool)
    valid = np.zeros((B, N), bool)
    present = np.zeros(B, bool)
    last = np.zeros(B, np.float32)
    prev = np.zeros(B, np.float32)
    vol = np.zeros(B, np.float32)
    avg = np.zeros(B, np.float32)
    iv = np.zeros(B, np.float32)
    iv_present = np.zeros(B, bool)

    for i, (pol, spec, market) in enumerate(cases):
        n = len(pol)
        polarity[i, :n] = pol
        speculative[i, :n] = spec
        valid[i, :n] = True
        if market is not None:
            present[i] = True
            last[i] = market.last_price
            prev[i] = market.previous_close
            vol[i] = market.volume
            avg[i] = market.avg_volume
            if market.iv_rank is not None:
                iv[i] = market.iv_rank
                iv_present[i] = True

    out = aggregate_batch(
        BatchSignals(polarity=polarity, speculative=speculative, valid=valid),
        BatchMarket(
            present=present,
            last_price=last,
            previous_close=prev,
            volume=vol,
            avg_volume=avg,
            iv_rank=iv,
            iv_present=iv_present,
        ),
        CFG,
    )

    ticker = Ticker.parse("AAPL")
    for i, (pol, spec, market) in enumerate(cases):
        posts = [
            SocialPost(
                id=str(j),
                source=SourceKind.REDDIT,
                author="a",
                text=PostText.parse("x"),
                created_at=NOW,
                engagement=0,
            )
            for j in range(len(pol))
        ]
        signals = [PostSignal.of(float(p), bool(s)) for p, s in zip(pol, spec)]
        ref = SpeculationEngine.aggregate(ticker, posts, signals, market, NOW, CFG)

        assert int(out.total_mentions[i]) == ref.social.total_mentions
        np.testing.assert_allclose(
            float(out.net_sentiment[i]), ref.social.net_sentiment.value, atol=1e-5
        )
        assert int(out.bullish[i]) == ref.social.bullish
        assert int(out.bearish[i]) == ref.social.bearish
        assert int(out.neutral[i]) == ref.social.neutral
        np.testing.assert_allclose(
            float(out.speculation_index[i]),
            ref.social.speculation_index.value,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            float(out.crowding[i]), ref.fusion.crowding, atol=1e-5
        )
        assert ALIGNMENT_CODES[int(out.alignment[i])] is ref.fusion.alignment
        assert CONFIDENCE_CODES[int(out.confidence[i])] is ref.social_confidence
        if market is not None:
            np.testing.assert_allclose(
                float(out.pct_change[i]), ref.market.pct_change, rtol=1e-5, atol=1e-4
            )
            if ref.market.rvol is None:
                assert np.isnan(float(out.rvol[i]))
            else:
                np.testing.assert_allclose(
                    float(out.rvol[i]), ref.market.rvol, rtol=1e-6
                )


def _random_posts_signals(rng, n):
    from openintel_tpu.domain.values import Polarity

    posts, signals = [], []
    for j in range(n):
        kind = SourceKind.REDDIT if rng.random() < 0.5 else SourceKind.BLUESKY
        posts.append(
            SocialPost(
                id=f"p{j}",
                source=kind,
                author=f"user{j}",
                text=PostText.parse(f"post {j}"),
                created_at=NOW,
                engagement=int(rng.integers(0, 100)),
            )
        )
        signals.append(
            PostSignal(
                polarity=Polarity(float(np.float32(rng.uniform(-1, 1)))),
                speculative=bool(rng.random() < 0.3),
            )
        )
    return posts, signals


def _random_market(rng):
    if rng.random() < 0.2:
        return None
    return MarketSnapshot(
        ticker=Ticker.parse("AAPL"),
        as_of=NOW,
        last_price=float(np.float32(rng.uniform(50, 250))),
        previous_close=float(rng.choice([0.0, 100.0, 185.0])),
        volume=int(rng.integers(0, 10**8)),
        avg_volume=float(rng.choice([0.0, 0.5, 52_000_000.0])),
        iv_rank=float(np.float32(rng.uniform(0, 1))) if rng.random() < 0.5 else None,
    )


def test_production_batch_path_matches_scalar_engine_100_batches():
    """pack_batch -> aggregate_batch -> reports_from_batch (the run_scan /
    run_compare path) must reproduce SpeculationEngine.aggregate field by
    field on >=100 random batches — incl. notes, ratios, market passthrough."""
    from openintel_tpu.domain.engine_batch import pack_batch, reports_from_batch

    rng = np.random.default_rng(1234)
    ticker = Ticker.parse("AAPL")
    for _ in range(100):
        b = int(rng.integers(1, 9))
        inputs = []
        for _ in range(b):
            posts, signals = _random_posts_signals(rng, int(rng.integers(0, 24)))
            inputs.append((posts, signals, _random_market(rng)))
        sig, mkt = pack_batch(inputs)
        cols = aggregate_batch(sig, mkt, CFG)
        got = reports_from_batch([ticker] * b, inputs, cols, NOW)
        for i, (posts, signals, market) in enumerate(inputs):
            want = SpeculationEngine.aggregate(
                ticker, posts, signals, market, NOW, CFG
            )
            g, w = got[i], want
            assert g.social.total_mentions == w.social.total_mentions
            assert g.social.mentions_by_source == w.social.mentions_by_source
            assert g.social.bullish == w.social.bullish
            assert g.social.bearish == w.social.bearish
            assert g.social.neutral == w.social.neutral
            if w.social.bull_bear_ratio is None:
                assert g.social.bull_bear_ratio is None
            else:
                np.testing.assert_allclose(
                    g.social.bull_bear_ratio, w.social.bull_bear_ratio
                )
            np.testing.assert_allclose(
                g.social.net_sentiment.value,
                w.social.net_sentiment.value,
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                g.social.speculation_index.value,
                w.social.speculation_index.value,
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                g.fusion.crowding, w.fusion.crowding, rtol=1e-5, atol=1e-6
            )
            assert g.fusion.alignment == w.fusion.alignment, (
                i, g.fusion.alignment, w.fusion.alignment
            )
            assert g.fusion.notes == w.fusion.notes
            assert g.social_confidence == w.social_confidence
            if w.market is None:
                assert g.market is None
            else:
                np.testing.assert_allclose(
                    g.market.pct_change, w.market.pct_change,
                    rtol=1e-4, atol=1e-5,
                )
                if w.market.rvol is None:
                    assert g.market.rvol is None
                else:
                    np.testing.assert_allclose(
                        g.market.rvol, w.market.rvol, rtol=1e-5
                    )
                assert g.market.last_price == w.market.last_price
                assert g.market.iv_rank == w.market.iv_rank


def test_analyze_batch_equals_scalar_analyze_offline():
    """run_scan's production path: analyze_batch over the fixture sources
    must reproduce analyze() per ticker exactly (reports serialise equal,
    modulo f32 rounding in the float fields)."""
    import asyncio

    from openintel_tpu.application.analyze import analyze, analyze_batch
    from openintel_tpu.application.request import AnalysisRequest
    from openintel_tpu.domain.values import ALL_SOURCES
    from openintel_tpu.sources.fixtures import MockMarketSource, fixture_social

    social, market = fixture_social(), MockMarketSource()
    reqs = [
        AnalysisRequest(
            ticker=t, enabled_sources=tuple(ALL_SOURCES),
            market_enabled=True, limit=50,
        )
        for t in ("AAPL", "TSLA", "NVDA")
    ] + [
        AnalysisRequest(
            ticker="GME", enabled_sources=tuple(ALL_SOURCES),
            market_enabled=False, limit=50,
        )
    ]
    batch = asyncio.run(analyze_batch(reqs, social, market, now=NOW))
    for req, got in zip(reqs, batch):
        want = asyncio.run(analyze(req, social, market, now=NOW))
        gd, wd = got.to_dict(), want.to_dict()
        for key in ("social", "fusion", "market"):
            g, w = gd.get(key), wd.get(key)
            if key == "market" and w is None:
                assert g is None
                continue
            for f in w:
                if isinstance(w[f], float):
                    np.testing.assert_allclose(
                        g[f], w[f], rtol=1e-5, atol=1e-6, err_msg=f"{key}.{f}"
                    )
                else:
                    assert g[f] == w[f], (key, f, g[f], w[f])


def test_analyze_batch_isolates_bad_tickers():
    import asyncio

    from openintel_tpu.application.analyze import analyze_batch
    from openintel_tpu.application.request import AnalysisRequest
    from openintel_tpu.domain.values import ALL_SOURCES
    from openintel_tpu.sources.fixtures import MockMarketSource, fixture_social

    reqs = [
        AnalysisRequest(
            ticker=t, enabled_sources=tuple(ALL_SOURCES),
            market_enabled=True, limit=50,
        )
        for t in ("AAPL", "not a ticker!", "TSLA")
    ]
    out = asyncio.run(
        analyze_batch(reqs, fixture_social(), MockMarketSource(), now=NOW)
    )
    assert isinstance(out[1], Exception)
    assert out[0].social.total_mentions == 10
    assert out[2].social.total_mentions == 10

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

"""Risk math parity tests with the reference goldens (src/domain/risk.rs:170-257),
including the BASELINE.md golden case: ATR=4.0, stop=98.0, 25 shares, $200 max
loss, targets 114/122/130."""

import datetime as dt
import math

import numpy as np
import pytest

from openintel_tpu.domain.risk import LONG, SHORT, atr, atr_batch, frame, true_ranges
from openintel_tpu.domain.values import Bar
from openintel_tpu.errors import SourceFailure

AT = dt.datetime(2026, 7, 16, tzinfo=dt.timezone.utc)


def bar(high, low, close):
    return Bar(high=high, low=low, close=close)


def bars():
    """16 bars: prev_close 100, then 15 identical bars; TR dominated by a gap
    on bar 2 (|high - prev_close| = 8 > high - low = 4)."""
    v = [bar(101.0, 99.0, 100.0), bar(108.0, 104.0, 106.0)]  # gap day TR = 8
    v += [bar(108.0, 104.0, 106.0)] * 14  # TR = 4
    return v


def test_true_range_counts_gaps():
    trs = true_ranges(bars())
    assert len(trs) == 15
    assert abs(trs[0] - 8.0) < 1e-12
    assert abs(trs[1] - 4.0) < 1e-12


def test_atr_is_mean_of_last_period():
    assert abs(atr(bars(), 14) - 4.0) < 1e-12
    assert atr(bars()[:14], 14) is None  # 13 TRs < 14


def test_long_frame_math_golden():
    f = frame("NVDA", bars(), LONG, 106.0, 200.0, 2.0, AT)
    assert abs(f.atr - 4.0) < 1e-12
    assert abs(f.risk_per_share - 8.0) < 1e-12
    assert abs(f.stop - 98.0) < 1e-12
    assert f.shares == 25
    assert abs(f.max_loss_usd - 200.0) < 1e-12
    assert f.max_loss_usd <= f.budget_usd
    assert abs(f.targets[0] - 114.0) < 1e-12
    assert abs(f.targets[1] - 122.0) < 1e-12
    assert abs(f.targets[2] - 130.0) < 1e-12
    assert abs(f.notional_usd - 2650.0) < 1e-12
    assert f.note is None


def test_short_frame_flips_signs():
    f = frame("NVDA", bars(), SHORT, 106.0, 100.0, 1.0, AT)
    assert abs(f.stop - 110.0) < 1e-12
    assert abs(f.targets[0] - 102.0) < 1e-12
    assert f.shares == 25


def test_short_targets_clamped_at_zero():
    f = frame("NVDA", bars(), SHORT, 10.0, 100.0, 2.0, AT)
    assert abs(f.targets[0] - 2.0) < 1e-12
    assert f.targets[2] == 0.0


def test_zero_shares_is_valid_with_note():
    f = frame("NVDA", bars(), LONG, 106.0, 5.0, 2.0, AT)
    assert f.shares == 0
    assert f.max_loss_usd == 0.0
    assert "too small" in f.note


def test_clamps_and_errors():
    assert abs(frame("N", bars(), LONG, 106.0, 100.0, 0.1, AT).stop_multiple - 0.5) < 1e-12
    assert abs(frame("N", bars(), LONG, 106.0, 100.0, 9.0, AT).stop_multiple - 5.0) < 1e-12
    with pytest.raises(SourceFailure):
        frame("N", bars(), LONG, 106.0, 0.0, 2.0, AT)
    with pytest.raises(SourceFailure):
        frame("N", bars(), LONG, -1.0, 100.0, 2.0, AT)
    with pytest.raises(SourceFailure):
        frame("N", bars()[:10], LONG, 106.0, 100.0, 2.0, AT)
    with pytest.raises(SourceFailure):  # long stop below zero
        frame("N", bars(), LONG, 3.0, 100.0, 5.0, AT)
    with pytest.raises(SourceFailure):  # flat history -> ATR 0
        frame("N", [bar(100.0, 100.0, 100.0)] * 16, LONG, 100.0, 100.0, 2.0, AT)


def test_nan_inputs_error_instead_of_poisoning_output():
    with pytest.raises(SourceFailure):
        frame("N", bars(), LONG, 106.0, 100.0, math.nan, AT)
    with pytest.raises(SourceFailure):
        frame("N", bars(), LONG, math.nan, 100.0, 2.0, AT)
    with pytest.raises(SourceFailure):
        frame("N", bars(), LONG, 106.0, math.nan, 2.0, AT)
    poisoned = bars()
    poisoned[8] = bar(math.nan, 104.0, 106.0)
    with pytest.raises(SourceFailure):
        frame("N", poisoned, LONG, 106.0, 100.0, 2.0, AT)


def test_implausible_share_count_errors():
    with pytest.raises(SourceFailure):
        frame("N", bars(), LONG, 106.0, 1e12, 2.0, AT)


def test_atr_batch_matches_scalar_path():
    history = bars()
    high = np.array([[b.high for b in history]] * 3, dtype=np.float32)
    low = np.array([[b.low for b in history]] * 3, dtype=np.float32)
    close = np.array([[b.close for b in history]] * 3, dtype=np.float32)
    out = np.asarray(atr_batch(high, low, close))
    assert out.shape == (3,)
    np.testing.assert_allclose(out, 4.0, rtol=1e-6)


def test_risk_screen_matches_scalar_risk_frame():
    """The production batch screen (one device atr_batch call) must agree
    with per-ticker risk_frame on every field, across ragged history lengths
    and error isolation (randomised, seeded)."""
    import asyncio
    import datetime as dt

    import numpy as np

    from openintel_tpu.application.risk import risk_frame, risk_screen
    from openintel_tpu.domain.values import Bar

    rng = np.random.default_rng(7)
    now = dt.datetime(2026, 6, 24, tzinfo=dt.timezone.utc)

    histories = {}
    for i, t in enumerate(["AAA", "BBB", "CCC", "DDD", "EEE"]):
        n = int(rng.integers(15, 60))  # >= ATR period + 1
        closes = 100 + np.cumsum(rng.normal(0, 2, size=n))
        closes = np.maximum(closes, 5.0)
        histories[t] = [
            Bar(
                high=float(c + abs(rng.normal(0, 1)) + 0.5),
                low=float(max(c - abs(rng.normal(0, 1)) - 0.5, 1.0)),
                close=float(c),
            )
            for c in closes
        ]
    histories["FFF"] = [Bar(high=10.0, low=9.0, close=9.5)] * 5  # too thin

    class Src:
        async def bars(self, ticker):
            return histories[ticker.as_str()]

    tickers = list(histories)
    frames = asyncio.run(risk_screen(tickers, "long", 500.0, 2.0, Src(), now))
    for t, got in zip(tickers, frames):
        if t == "FFF":
            assert isinstance(got, Exception) and "not enough history" in str(got)
            continue
        want = asyncio.run(risk_frame(t, "long", 500.0, 2.0, None, Src(), now))
        np.testing.assert_allclose(got.atr, want.atr, rtol=1e-5)
        np.testing.assert_allclose(got.stop, want.stop, rtol=1e-5)
        np.testing.assert_allclose(
            got.risk_per_share, want.risk_per_share, rtol=1e-5
        )
        assert got.shares == want.shares
        assert got.direction == want.direction
        assert got.entry == want.entry
        assert got.bars_used == want.bars_used
        np.testing.assert_allclose(got.targets, want.targets, rtol=1e-5)


def test_risk_screen_isolates_bad_tickers():
    import asyncio
    import datetime as dt

    from openintel_tpu.application.risk import risk_screen
    from openintel_tpu.sources.yahoo import FixtureBars

    now = dt.datetime(2026, 6, 24, tzinfo=dt.timezone.utc)
    frames = asyncio.run(
        risk_screen(["NVDA", "bad ticker!", "AMD"], "long", 200.0, 2.0,
                    FixtureBars(), now)
    )
    assert isinstance(frames[1], Exception)
    assert frames[0].stop == 98.0 and frames[2].stop == 98.0  # golden ATR=4.0

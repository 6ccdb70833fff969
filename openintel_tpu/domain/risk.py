"""Deterministic per-trade risk math: ATR(14) stop, budget-capped whole-share
size, R-multiple reference levels. Pure and synchronous — a calculator, never
an advisor. The clock is stamped by the application layer.

Parity targets (reference file:line):
- true_ranges: gap-aware max of H-L, |H-PC|, |L-PC| (src/domain/risk.rs:49-59)
- atr: mean of the last `period` true ranges, None if history too thin (:62-69)
- frame: stop = entry -/+ k*ATR with k clamped [0.5, 5]; shares =
  floor(budget / risk-per-share) with a 10M sanity cap; 1R/2R/3R targets
  clamped >= 0; NaN-poisoned inputs rejected (:71-126)

A vectorised jnp ATR (for batch risk screens on device) is provided as
:func:`atr_batch`.
"""

from __future__ import annotations

import datetime as dt
import math
from dataclasses import dataclass
from typing import Any, Optional, Sequence

from openintel_tpu.errors import SourceFailure
from openintel_tpu.domain.values import Bar

ATR_PERIOD = 14
MAX_SHARES = 10_000_000  # sanity bound: anything above this is an input error

LONG = "long"
SHORT = "short"


@dataclass
class RiskFrame:
    ticker: str
    direction: str  # "long" | "short"
    entry: float
    atr: float
    stop_multiple: float
    stop: float
    risk_per_share: float
    shares: int
    max_loss_usd: float  # shares x risk_per_share — the ACTUAL capped loss
    budget_usd: float
    targets: tuple[float, float, float]  # 1R / 2R / 3R reference exits
    notional_usd: float
    bars_used: int
    note: Optional[str]
    generated_at: dt.datetime

    def to_dict(self) -> dict[str, Any]:
        return {
            "ticker": self.ticker,
            "direction": self.direction,
            "entry": self.entry,
            "atr": self.atr,
            "stop_multiple": self.stop_multiple,
            "stop": self.stop,
            "risk_per_share": self.risk_per_share,
            "shares": self.shares,
            "max_loss_usd": self.max_loss_usd,
            "budget_usd": self.budget_usd,
            "targets": list(self.targets),
            "notional_usd": self.notional_usd,
            "bars_used": self.bars_used,
            "note": self.note,
            "generated_at": self.generated_at.isoformat(),
        }


def _fail(message: str) -> SourceFailure:
    return SourceFailure(name="risk", message=message)


def true_ranges(bars: Sequence[Bar]) -> list[float]:
    """True ranges for bars[1:] (each needs the previous close)."""
    out: list[float] = []
    for prev, b in zip(bars, bars[1:]):
        out.append(max(b.high - b.low, abs(b.high - prev.close), abs(b.low - prev.close)))
    return out


def atr(bars: Sequence[Bar], period: int) -> Optional[float]:
    """Simple mean of the last ``period`` true ranges; None if history too thin."""
    trs = true_ranges(bars)
    if len(trs) < period or period == 0:
        return None
    tail = trs[len(trs) - period :]
    return sum(tail) / period


def frame(
    ticker: str,
    bars: Sequence[Bar],
    direction: str,
    entry: float,
    budget_usd: float,
    stop_multiple: float,
    generated_at: dt.datetime,
    atr_value: Optional[float] = None,
) -> RiskFrame:
    """``atr_value``: precomputed ATR (e.g. one device ``atr_batch`` call over
    a whole screen); when None the scalar ATR is computed from ``bars``.
    All validation still runs either way."""
    if direction not in (LONG, SHORT):
        raise _fail(f"direction must be '{LONG}' or '{SHORT}'")
    if not (math.isfinite(budget_usd) and budget_usd > 0.0):
        raise _fail("budget must be a positive number")
    if not (math.isfinite(entry) and entry > 0.0):
        raise _fail("entry must be a positive price")
    if not (math.isfinite(stop_multiple) and stop_multiple > 0.0):
        raise _fail("stop multiple must be a positive number")
    stop_multiple = min(max(stop_multiple, 0.5), 5.0)
    if any(
        not (math.isfinite(b.high) and math.isfinite(b.low) and math.isfinite(b.close))
        for b in bars
    ):
        raise _fail("price history contains invalid values")

    a = atr_value if atr_value is not None else atr(bars, ATR_PERIOD)
    if a is None or len(bars) < ATR_PERIOD + 1:
        raise _fail(f"not enough history for ATR({ATR_PERIOD})")
    if not (math.isfinite(a) and a > 0.0):
        raise _fail("degenerate price history — ATR is zero or invalid")

    risk_per_share = stop_multiple * a
    stop = entry - risk_per_share if direction == LONG else entry + risk_per_share
    if not (math.isfinite(stop) and stop > 0.0):
        raise _fail("stop below zero — use a smaller multiple")

    shares = int(budget_usd // risk_per_share)
    if shares > MAX_SHARES:
        raise _fail("share size implausibly large — check budget and stop multiple")
    note = (
        "budget too small for one share at this stop distance" if shares == 0 else None
    )

    def signed(n: float) -> float:
        if direction == LONG:
            return entry + n * risk_per_share
        return entry - n * risk_per_share

    targets = tuple(max(signed(n), 0.0) for n in (1.0, 2.0, 3.0))

    return RiskFrame(
        ticker=ticker,
        direction=direction,
        entry=entry,
        atr=a,
        stop_multiple=stop_multiple,
        stop=stop,
        risk_per_share=risk_per_share,
        shares=shares,
        max_loss_usd=shares * risk_per_share,
        budget_usd=budget_usd,
        targets=targets,  # type: ignore[arg-type]
        notional_usd=shares * entry,
        bars_used=len(bars),
        note=note,
        generated_at=generated_at,
    )


def atr_batch(high, low, close, period: int = ATR_PERIOD):
    """Vectorised ATR over a batch of bar histories.

    Args:
        high/low/close: ``(B, T)`` arrays of T bars per ticker.
        period: ATR window.

    Returns:
        ``(B,)`` ATR values (NaN where fewer than ``period`` true ranges exist).
    """
    import jax.numpy as jnp

    prev_close = close[:, :-1]
    h, l = high[:, 1:], low[:, 1:]
    tr = jnp.maximum(
        h - l, jnp.maximum(jnp.abs(h - prev_close), jnp.abs(l - prev_close))
    )
    n_tr = tr.shape[1]
    if n_tr < period:
        return jnp.full(high.shape[0], jnp.nan, dtype=jnp.float32)
    return jnp.mean(tr[:, n_tr - period :], axis=1)

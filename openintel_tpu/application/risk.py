"""The risk use case: fetch bars, default entry to last close, run the pure
frame math (reference: src/application/risk.rs:12-44)."""

from __future__ import annotations

import datetime as dt
from typing import Optional

from openintel_tpu.domain.entities import Ticker
from openintel_tpu.domain.ports import BarSource
from openintel_tpu.domain.risk import RiskFrame, frame
from openintel_tpu.errors import SourceFailure

DEFAULT_STOP_MULTIPLE = 2.0


async def risk_frame(
    ticker_raw: str,
    direction: str,
    budget_usd: float,
    stop_multiple: Optional[float],
    entry: Optional[float],
    bars: BarSource,
    now: dt.datetime,
) -> RiskFrame:
    ticker = Ticker.parse(ticker_raw)
    history = await bars.bars(ticker)
    if entry is None:
        if not history:
            raise SourceFailure(name="risk", message="no price history")
        entry = history[-1].close
    return frame(
        ticker.as_str(),
        history,
        direction,
        entry,
        budget_usd,
        stop_multiple if stop_multiple is not None else DEFAULT_STOP_MULTIPLE,
        now,
    )

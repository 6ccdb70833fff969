"""Yahoo Finance market adapter: keyless chart endpoint, snapshot + bars.

Parity targets (reference: src/adapters/market/yahoo/mod.rs,
yahoo/response.rs):
- one endpoint (v8 chart, range=3mo interval=1d) backs BOTH the
  MarketDataSource and BarSource ports;
- snapshot: last price meta -> series fallback; prev close = 2nd-to-last
  non-null close -> meta fallback; avg volume = mean of non-null volumes;
  realized vol = sample stdev of log returns x sqrt(252), gated at >= 20
  returns; HTTP-status-enriched parse errors;
- bars: zip high/low/close skipping rows with any null leg.

Parse functions are pure str -> result, tested on canned JSON bodies.
"""

from __future__ import annotations

import datetime as dt
import json
import math
from typing import Optional

from openintel_tpu.domain.entities import MarketSnapshot, Ticker
from openintel_tpu.domain.values import Bar
from openintel_tpu.errors import SourceFailure
from openintel_tpu.sources import http

BASE_URL = "https://query1.finance.yahoo.com/v8/finance/chart"
MIN_RETURNS_FOR_VOL = 20
TRADING_DAYS = 252


def _fail(message: str) -> SourceFailure:
    return SourceFailure(name="yahoo", message=message)


def _result(body: str, status: int) -> dict:
    try:
        doc = json.loads(body)
    except json.JSONDecodeError as e:
        raise _fail(f"malformed response (HTTP {status}): {e}")
    chart = doc.get("chart") or {}
    if chart.get("error"):
        raise _fail(f"API error (HTTP {status}): {chart['error']}")
    results = chart.get("result") or []
    if not results:
        raise _fail(f"empty chart result (HTTP {status})")
    return results[0]


def parse_snapshot(
    body: str, ticker: Ticker, as_of: dt.datetime, status: int = 200
) -> MarketSnapshot:
    result = _result(body, status)
    meta = result.get("meta") or {}
    quote = ((result.get("indicators") or {}).get("quote") or [{}])[0]
    closes = [c for c in (quote.get("close") or []) if c is not None]
    volumes = [v for v in (quote.get("volume") or []) if v is not None]

    last = meta.get("regularMarketPrice")
    if last is None:
        if not closes:
            raise _fail(f"no price data (HTTP {status})")
        last = closes[-1]

    # Previous close: second-to-last non-null close, falling back to meta.
    if len(closes) >= 2:
        prev_close = closes[-2]
    else:
        prev_close = meta.get("chartPreviousClose") or meta.get("previousClose")
        if prev_close is None:
            raise _fail(f"no previous close (HTTP {status})")

    volume = int(volumes[-1]) if volumes else 0
    avg_volume = int(sum(volumes) / len(volumes)) if volumes else 0

    realized_vol: Optional[float] = None
    if len(closes) >= MIN_RETURNS_FOR_VOL + 1:
        returns = [
            math.log(b / a)
            for a, b in zip(closes, closes[1:])
            if a > 0.0 and b > 0.0
        ]
        if len(returns) >= MIN_RETURNS_FOR_VOL:
            mean = sum(returns) / len(returns)
            var = sum((r - mean) ** 2 for r in returns) / (len(returns) - 1)
            realized_vol = math.sqrt(var) * math.sqrt(TRADING_DAYS)

    return MarketSnapshot(
        ticker=ticker,
        as_of=as_of,
        last_price=float(last),
        previous_close=float(prev_close),
        volume=volume,
        avg_volume=avg_volume,
        realized_vol=realized_vol,
        put_call_ratio=None,  # not available from this endpoint
        iv_rank=None,
    )


def parse_bars(body: str, status: int = 200) -> list[Bar]:
    result = _result(body, status)
    quote = ((result.get("indicators") or {}).get("quote") or [{}])[0]
    highs = quote.get("high") or []
    lows = quote.get("low") or []
    closes = quote.get("close") or []
    bars: list[Bar] = []
    for h, l, c in zip(highs, lows, closes):
        if h is None or l is None or c is None:  # skip null-padded rows
            continue
        bars.append(Bar(high=float(h), low=float(l), close=float(c)))
    return bars


class YahooMarketSource:
    """Implements BOTH MarketDataSource and BarSource from one endpoint."""

    def __init__(self, fetch=http.request):
        self._fetch = fetch

    @property
    def name(self) -> str:
        return "yahoo"

    def _url(self, ticker: Ticker) -> str:
        return f"{BASE_URL}/{ticker.as_str()}?range=3mo&interval=1d"

    async def snapshot(self, ticker: Ticker) -> MarketSnapshot:
        resp = await self._fetch(
            self._url(ticker), headers={"User-Agent": "openintel-tpu"}
        )
        return parse_snapshot(
            resp.body, ticker, dt.datetime.now(dt.timezone.utc), resp.status
        )

    async def bars(self, ticker: Ticker) -> list[Bar]:
        resp = await self._fetch(
            self._url(ticker), headers={"User-Agent": "openintel-tpu"}
        )
        return parse_bars(resp.body, resp.status)


class FixtureBars:
    """Deterministic bar history (the risk-math golden case: ATR(14)=4.0)."""

    @property
    def name(self) -> str:
        return "fixture-bars"

    async def bars(self, ticker: Ticker) -> list[Bar]:
        history = [Bar(high=101.0, low=99.0, close=100.0)]
        history += [Bar(high=108.0, low=104.0, close=106.0)] * 15
        return history

    async def snapshot(self, ticker: Ticker):  # pragma: no cover - unused
        raise SourceFailure(name="fixture-bars", message="snapshot not supported")

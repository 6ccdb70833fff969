"""Entities: validated newtypes and report aggregates.

Parity targets (reference file:line):
- Ticker: trim, uppercase, 1-5 ASCII uppercase letters, optional single-letter
  ``.X`` class suffix, rejects non-ASCII (src/domain/entities/ticker.rs:10-36)
- PostText: trim, reject empty, cap at 10,000 characters (not bytes)
  (src/domain/entities/social_post.rs:7-23)
- MarketSnapshot (src/domain/entities/market_snapshot.rs:7-17)
- SpeculationReport + sub-summaries with lowercase/snake_case enum serialisation
  (src/domain/entities/speculation_report.rs:12-48)
- Pulse entities: PulsePost is deliberately NOT a SocialPost — pulse posts never
  enter sentiment averaging; PulseFetch carries the billed count
  (src/domain/entities/pulse.rs:1-26)
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from typing import Any, Optional

from openintel_tpu.errors import InvalidPostText, InvalidTicker
from openintel_tpu.domain.values import (
    Alignment,
    Confidence,
    Polarity,
    SourceKind,
    SpeculationIndex,
)

MAX_POST_LEN = 10_000


@dataclass(frozen=True)
class Ticker:
    """Validated symbol newtype. Construct via :meth:`parse`."""

    symbol: str

    @staticmethod
    def parse(raw: str) -> "Ticker":
        trimmed = raw.strip()
        if not trimmed:
            raise InvalidTicker("empty")
        if not trimmed.isascii():
            raise InvalidTicker(raw)
        symbol = trimmed.upper()
        base, dot, cls = symbol.partition(".")
        base_ok = 1 <= len(base) <= 5 and base.isalpha() and base.isupper()
        cls_ok = (not dot) or (len(cls) == 1 and cls.isalpha() and cls.isupper())
        if not (base_ok and cls_ok):
            raise InvalidTicker(raw)
        return Ticker(symbol)

    def as_str(self) -> str:
        return self.symbol


@dataclass(frozen=True)
class PostText:
    """Trimmed, non-empty post text capped at 10,000 characters."""

    text: str

    @staticmethod
    def parse(raw: str) -> "PostText":
        trimmed = raw.strip()
        if not trimmed:
            raise InvalidPostText("empty")
        if len(trimmed) > MAX_POST_LEN:
            raise InvalidPostText("exceeds max length")
        return PostText(trimmed)

    def as_str(self) -> str:
        return self.text


@dataclass(frozen=True)
class SocialPost:
    id: str
    source: SourceKind
    author: str
    text: PostText
    created_at: dt.datetime
    engagement: int


@dataclass(frozen=True)
class MarketSnapshot:
    ticker: Ticker
    as_of: dt.datetime
    last_price: float
    previous_close: float
    volume: int
    avg_volume: int
    realized_vol: Optional[float] = None
    put_call_ratio: Optional[float] = None
    iv_rank: Optional[float] = None


@dataclass
class SocialSummary:
    total_mentions: int
    mentions_by_source: dict[str, int]
    net_sentiment: Polarity
    bullish: int
    bearish: int
    neutral: int
    bull_bear_ratio: Optional[float]
    speculation_index: SpeculationIndex

    def to_dict(self) -> dict[str, Any]:
        return {
            "total_mentions": self.total_mentions,
            "mentions_by_source": dict(sorted(self.mentions_by_source.items())),
            "net_sentiment": self.net_sentiment.value,
            "bullish": self.bullish,
            "bearish": self.bearish,
            "neutral": self.neutral,
            "bull_bear_ratio": self.bull_bear_ratio,
            "speculation_index": self.speculation_index.value,
        }


@dataclass
class MarketSummary:
    last_price: float
    pct_change: float
    rvol: Optional[float]
    realized_vol: Optional[float]
    put_call_ratio: Optional[float]
    iv_rank: Optional[float]

    def to_dict(self) -> dict[str, Any]:
        return {
            "last_price": self.last_price,
            "pct_change": self.pct_change,
            "rvol": self.rvol,
            "realized_vol": self.realized_vol,
            "put_call_ratio": self.put_call_ratio,
            "iv_rank": self.iv_rank,
        }


@dataclass
class FusionSignals:
    alignment: Alignment
    crowding: float
    notes: list[str] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {
            "alignment": self.alignment.value,
            "crowding": self.crowding,
            "notes": list(self.notes),
        }


@dataclass
class SpeculationReport:
    ticker: Ticker
    generated_at: dt.datetime
    social: SocialSummary
    market: Optional[MarketSummary]
    fusion: FusionSignals
    social_confidence: Confidence

    def to_dict(self) -> dict[str, Any]:
        return {
            "ticker": self.ticker.as_str(),
            "generated_at": self.generated_at.isoformat(),
            "social": self.social.to_dict(),
            "market": self.market.to_dict() if self.market is not None else None,
            "fusion": self.fusion.to_dict(),
            "social_confidence": self.social_confidence.value,
        }


@dataclass(frozen=True)
class PulsePost:
    """Catalyst post from a high-impact account. NOT a SocialPost — never averaged."""

    id: str
    author: str
    text: PostText
    created_at: dt.datetime
    engagement: int

    def to_dict(self) -> dict[str, Any]:
        return {
            "id": self.id,
            "author": self.author,
            "text": self.text.as_str(),
            "created_at": self.created_at.isoformat(),
            "engagement": self.engagement,
        }


@dataclass
class PulseFetch:
    """One feed call's yield: kept posts plus the upstream-billed count,
    which can exceed ``len(posts)`` due to client-side truncation/skips."""

    posts: list[PulsePost]
    posts_returned: int


@dataclass
class PulseReport:
    ticker: str
    accounts: list[str]
    keywords: list[str]
    hours_back: int
    posts: list[PulsePost]
    posts_read: int
    estimated_cost_usd: float
    generated_at: dt.datetime

    def to_dict(self) -> dict[str, Any]:
        return {
            "ticker": self.ticker,
            "accounts": list(self.accounts),
            "keywords": list(self.keywords),
            "hours_back": self.hours_back,
            "posts": [p.to_dict() for p in self.posts],
            "posts_read": self.posts_read,
            "estimated_cost_usd": self.estimated_cost_usd,
            "generated_at": self.generated_at.isoformat(),
        }

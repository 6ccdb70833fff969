"""Deterministic in-memory social sources and mock market snapshot.

The 10-post fixture corpus is the framework's canonical golden corpus: 4 Reddit
+ 6 Bluesky posts whose lexicon signals are +1,+1,+1,-1,+1,-1,+1,+1,0,+1 —
10 posts = exactly min_sample, so fusion assertions sit on the behavior
threshold (reference: src/adapters/sources/test_fixtures.rs:46-117,
src/adapters/market/mock_market.rs:17-29).
"""

from __future__ import annotations

import datetime as dt

from openintel_tpu.domain.entities import (
    MarketSnapshot,
    PostText,
    SocialPost,
    Ticker,
)
from openintel_tpu.domain.values import SourceKind

FIXTURE_TIME = dt.datetime(2026, 6, 24, 15, 0, 0, tzinfo=dt.timezone.utc)

# (id, author, text template, engagement)
REDDIT_ROWS: tuple[tuple[str, str, str, int], ...] = (
    ("reddit-1", "dudebro", "{sym} to the moon, loading calls all day", 420),
    ("reddit-2", "valuepicker", "{sym} earnings look strong, going long here", 88),
    ("reddit-3", "chartwatcher", "{sym} breakout confirmed, rocket time", 51),
    ("reddit-4", "shortking", "{sym} is going to dump, buying puts", 31),
)

BLUESKY_ROWS: tuple[tuple[str, str, str, int], ...] = (
    ("bsky-1", "indexfan", "{sym} looking bullish into the print", 22),
    ("bsky-2", "skeptic", "not sold on {sym}, might sell my shares", 9),
    ("bsky-3", "daytripper", "{sym} green day, up big", 14),
    ("bsky-4", "quanttrader", "${sym} squeeze incoming, buying calls", 1200),
    ("bsky-5", "macroowl", "watching ${sym} but staying cautious", 64),
    ("bsky-6", "trendrider", "${sym} rally looks strong", 240),
)


class FixtureSource:
    """Deterministic SocialDataSource serving canned rows with ``{sym}`` templating."""

    def __init__(self, kind: SourceKind, rows: tuple[tuple[str, str, str, int], ...]):
        self._kind = kind
        self._rows = rows

    @property
    def kind(self) -> SourceKind:
        return self._kind

    async def fetch(self, ticker: Ticker, limit: int) -> list[SocialPost]:
        sym = ticker.as_str()
        return [
            SocialPost(
                id=pid,
                source=self._kind,
                author=author,
                text=PostText.parse(template.replace("{sym}", sym)),
                created_at=FIXTURE_TIME,
                engagement=engagement,
            )
            for pid, author, template, engagement in self._rows[:limit]
        ]


def reddit_fixture() -> FixtureSource:
    return FixtureSource(SourceKind.REDDIT, REDDIT_ROWS)


def bluesky_fixture() -> FixtureSource:
    return FixtureSource(SourceKind.BLUESKY, BLUESKY_ROWS)


def fixture_social() -> list[FixtureSource]:
    return [reddit_fixture(), bluesky_fixture()]


class MockMarketSource:
    """Fixed snapshot (192.50 / 185.00, vol 95M / 52M avg -> rvol ~1.827,
    iv_rank 0.82) — the canonical market fixture."""

    @property
    def name(self) -> str:
        return "mock-market"

    async def snapshot(self, ticker: Ticker) -> MarketSnapshot:
        return MarketSnapshot(
            ticker=ticker,
            as_of=dt.datetime(2026, 6, 24, 20, 0, 0, tzinfo=dt.timezone.utc),
            last_price=192.50,
            previous_close=185.00,
            volume=95_000_000,
            avg_volume=52_000_000,
            realized_vol=0.38,
            put_call_ratio=0.7,
            iv_rank=0.82,
        )


class FailingSource:
    """Test fake: a source whose fetch always fails (graceful-degradation tests)."""

    def __init__(self, kind: SourceKind, message: str = "boom"):
        self._kind = kind
        self._message = message

    @property
    def kind(self) -> SourceKind:
        return self._kind

    async def fetch(self, ticker: Ticker, limit: int) -> list[SocialPost]:
        from openintel_tpu.errors import SourceFailure

        raise SourceFailure(name=self._kind.value, message=self._message)

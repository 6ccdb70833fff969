"""Opt-in live-network tests (reference test strategy item 7: #[ignore]d
live tests run explicitly, asserting well-formedness invariants, never exact
values — reference: src/adapters/sources/reddit/mod.rs:157-176,
bluesky/mod.rs:159-174, yahoo/mod.rs:123-141).

Run with OPENINTEL_LIVE=1 on a machine with egress; CI and the hermetic
suite always skip them. The X test is omitted entirely (paid API)."""

import asyncio
import os

import pytest

from openintel_tpu.domain.entities import Ticker

live = pytest.mark.skipif(
    os.environ.get("OPENINTEL_LIVE") != "1",
    reason="live-network test; opt in with OPENINTEL_LIVE=1",
)


@live
def test_yahoo_snapshot_live():
    from openintel_tpu.sources.yahoo import YahooMarketSource

    snap = asyncio.run(YahooMarketSource().snapshot(Ticker.parse("AAPL")))
    assert snap.last > 0 and snap.prev_close > 0
    assert snap.volume >= 0 and snap.avg_volume > 0


@live
def test_yahoo_bars_live():
    from openintel_tpu.sources.yahoo import YahooMarketSource

    bars = asyncio.run(YahooMarketSource().bars(Ticker.parse("MSFT")))
    assert len(bars) >= 15
    assert all(b.high >= b.low for b in bars)


@live
def test_reddit_fetch_live():
    from openintel_tpu.config.secrets import Credentials
    from openintel_tpu.config.store import KeychainStore
    from openintel_tpu.sources.reddit import RedditSource

    creds = Credentials.load(KeychainStore())
    if not (creds.reddit_client_id and creds.reddit_client_secret):
        pytest.skip("reddit credentials not configured")
    posts = asyncio.run(
        RedditSource(creds.reddit_client_id, creds.reddit_client_secret).fetch(
            Ticker.parse("AAPL"), 5
        )
    )
    assert len(posts) <= 5
    assert all(p.text.value for p in posts)


@live
def test_bluesky_fetch_live():
    from openintel_tpu.config.secrets import Credentials
    from openintel_tpu.config.store import KeychainStore
    from openintel_tpu.sources.bluesky import BlueskySource

    creds = Credentials.load(KeychainStore())
    if not (creds.bluesky_handle and creds.bluesky_app_password):
        pytest.skip("bluesky credentials not configured")
    posts = asyncio.run(
        BlueskySource(creds.bluesky_handle, creds.bluesky_app_password).fetch(
            Ticker.parse("TSLA"), 5
        )
    )
    assert len(posts) <= 5

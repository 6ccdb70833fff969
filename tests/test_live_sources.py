"""Opt-in live tests (reference test strategy item 7: #[ignore]d live tests
run explicitly, asserting well-formedness invariants, never exact values —
reference: src/adapters/sources/reddit/mod.rs:157-176,
bluesky/mod.rs:159-174, yahoo/mod.rs:123-141, x/mod.rs:262-279,
config/store.rs:158-171).

Run with OPENINTEL_LIVE=1 on a machine with egress; CI and the hermetic
suite always skip them. The X probe is PAID (~$0.05 per run: up to 10 reads
at $0.005) and additionally requires OPENINTEL_LIVE_PAID=1, mirroring the
reference's explicit cost warning in its #[ignore] attribute. The keystore
round-trip needs a real OS keychain backend, not egress."""

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


@live
@pytest.mark.skipif(
    os.environ.get("OPENINTEL_LIVE_PAID") != "1",
    reason="PAID X API probe (~$0.05: up to 10 reads at $0.005); "
    "opt in with OPENINTEL_LIVE_PAID=1",
)
def test_x_pulse_live_paid():
    """PAID probe (reference: src/adapters/sources/x/mod.rs:262-279 —
    '#[ignore] paid: ≈$0.05'). One recent-search call against the default
    macro accounts; asserts billing accounting and post well-formedness,
    never exact values."""
    from openintel_tpu.application.pulse import DEFAULT_PULSE_ACCOUNTS
    from openintel_tpu.config.secrets import Credentials
    from openintel_tpu.config.store import KeychainStore
    from openintel_tpu.sources.x import XPulseSource

    creds = Credentials.load(KeychainStore())
    if not creds.x_bearer:
        pytest.skip("x bearer not configured")
    fetch = asyncio.run(
        XPulseSource(creds.x_bearer).pulse(
            Ticker.parse("AAPL"), list(DEFAULT_PULSE_ACCOUNTS), [], 24, 10
        )
    )
    # posts_returned is what X bills (counted before client truncation) —
    # it can exceed what we keep, never the reverse.
    assert fetch.posts_returned >= len(fetch.posts)
    assert len(fetch.posts) <= 10
    assert all(p.text.value for p in fetch.posts)


@live
def test_keystore_round_trip_live():
    """Real-keychain round trip (reference: src/config/store.rs:158-171):
    set → get → delete → get-None → idempotent re-delete, under a test key
    that never collides with real credentials."""
    from openintel_tpu.config.store import KeychainStore, StoreError

    store = KeychainStore()
    key = "live-test-round-trip"
    try:
        store.set(key, "s3cret-value")
    except StoreError:
        pytest.skip("no usable OS keychain backend on this machine")
    try:
        assert store.get(key) == "s3cret-value"
        store.set(key, "rotated")  # overwrite, not append
        assert store.get(key) == "rotated"
    finally:
        store.delete(key)
    assert store.get(key) is None
    store.delete(key)  # idempotent second delete

"""Pulse use-case money-safety tests (reference: src/application/pulse.rs tests)."""

import asyncio
import datetime as dt

import pytest

from openintel_tpu.application.pulse import (
    DEFAULT_PULSE_ACCOUNTS,
    normalize_accounts,
    normalize_keywords,
    pulse,
)
from openintel_tpu.domain.entities import PostText, PulseFetch, PulsePost
from openintel_tpu.errors import SourceFailure

AT = dt.datetime(2026, 7, 16, 12, 0, 0, tzinfo=dt.timezone.utc)


class FakeFeed:
    """Records the call; returns n canned posts with an overridable billed count."""

    def __init__(self, n, posts_returned=None):
        self.n = n
        self.posts_returned = n if posts_returned is None else posts_returned
        self.seen = None

    async def pulse(self, ticker, accounts, keywords, hours_back, limit):
        self.seen = (ticker.as_str(), list(accounts), list(keywords), hours_back, limit)
        return PulseFetch(
            posts=[
                PulsePost(
                    id=f"p{i}",
                    author="someone",
                    text=PostText.parse("hello market"),
                    created_at=AT,
                    engagement=1,
                )
                for i in range(self.n)
            ],
            posts_returned=self.posts_returned,
        )


def run(coro):
    return asyncio.run(coro)


def test_normalize_strips_at_and_defaults():
    raw = ["@jensenhuang", "  elonmusk ", ""]
    assert normalize_accounts(raw) == ["jensenhuang", "elonmusk"]
    assert normalize_accounts([]) == list(DEFAULT_PULSE_ACCOUNTS)


def test_normalize_mixed_keeps_valid():
    raw = [
        "jensenhuang",
        "jensen huang",  # space -> invalid
        "way_too_long_a_handle_over_15",  # > 15 chars
        "elon-musk",  # hyphen -> invalid
        "elonmusk",
    ]
    assert normalize_accounts(raw) == ["jensenhuang", "elonmusk"]


def test_normalize_all_invalid_nonempty_errors():
    with pytest.raises(SourceFailure, match="no valid X handles"):
        normalize_accounts(["@", "  ", "bad handle"])


def test_normalize_keywords_trims_and_drops_invalid():
    raw = ["  Tesla ", 'say "hi"', "FSD"]
    assert normalize_keywords(raw) == ["Tesla", "FSD"]
    assert normalize_keywords([]) == []


def test_normalize_keywords_keeps_multi_word_and_leading_dash():
    assert normalize_keywords(["  General Motors "]) == ["General Motors"]
    assert normalize_keywords(["-recall"]) == ["-recall"]


def test_normalize_keywords_drops_tab_and_emoji():
    with pytest.raises(SourceFailure, match="no valid keywords"):
        normalize_keywords(["ta\tb", "🚀rocket"])


def test_pulse_clamps_and_computes_cost():
    feed = FakeFeed(3)
    report = run(pulse("nvda", [], [], 500, 900, feed, AT))
    ticker, accounts, keywords, hours, limit = feed.seen
    assert ticker == "NVDA"
    assert accounts == list(DEFAULT_PULSE_ACCOUNTS)
    assert keywords == []
    assert hours == 167 and limit == 100
    assert report.posts_read == 3
    assert report.estimated_cost_usd == pytest.approx(0.015)
    assert report.generated_at == AT


def test_pulse_bills_what_x_returned_not_what_we_kept():
    feed = FakeFeed(2, posts_returned=10)
    report = run(pulse("AAPL", [], [], 24, 2, feed, AT))
    assert len(report.posts) == 2
    assert report.posts_read == 10
    assert report.estimated_cost_usd == pytest.approx(0.05)


def test_pulse_clamps_low_bounds_and_zero_posts_ok():
    feed = FakeFeed(0)
    report = run(pulse("AAPL", ["a"], [], 0, 0, feed, AT))
    _, _, _, hours, limit = feed.seen
    assert hours == 1 and limit == 1
    assert report.posts_read == 0
    assert report.estimated_cost_usd == 0.0


def test_pulse_rejects_invalid_input_before_paid_call():
    feed = FakeFeed(0)
    with pytest.raises(SourceFailure):
        run(pulse("AAPL", ["bad handle"], [], 24, 20, feed, AT))
    assert feed.seen is None  # never reached the paid call
    with pytest.raises(SourceFailure):
        run(pulse("AAPL", ["a"], ['say "hi"'], 24, 20, feed, AT))
    assert feed.seen is None
    with pytest.raises(Exception):
        run(pulse("$$$", [], [], 24, 20, feed, AT))


def test_pulse_threads_keywords_to_feed_and_report():
    feed = FakeFeed(1)
    report = run(
        pulse("TSLA", ["elonmusk"], ["Tesla", "Robotaxi"], 24, 20, feed, AT)
    )
    assert feed.seen[2] == ["Tesla", "Robotaxi"]
    assert report.keywords == ["Tesla", "Robotaxi"]

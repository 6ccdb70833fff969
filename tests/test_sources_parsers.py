"""Parser tests on canned JSON bodies — every external API shape pinned as a
fixture string and driven through edge cases (reference test strategy:
reddit/response.rs:110-205, bluesky/response.rs:122-194, x/response.rs:145-206,
yahoo/response.rs:219-334)."""

import datetime as dt
import json

import pytest

from openintel_tpu.domain.entities import Ticker
from openintel_tpu.errors import SourceFailure
from openintel_tpu.sources import bluesky, reddit, x, yahoo

NOW = dt.datetime(2026, 7, 16, 12, 0, 0, tzinfo=dt.timezone.utc)
AAPL = Ticker.parse("AAPL")

# ---------- Reddit ----------

REDDIT_LISTING = json.dumps(
    {
        "data": {
            "children": [
                {
                    "data": {
                        "name": "t3_abc",
                        "title": "AAPL to the moon",
                        "selftext": "calls all day",
                        "author": "dudebro",
                        "created_utc": 1780000000,
                        "score": 42,
                    }
                },
                {
                    "data": {  # no name -> fall back to id
                        "id": "xyz",
                        "title": "second",
                        "selftext": "",
                        "author": "a2",
                        "score": -5,  # negative -> clamp to 0
                    }
                },
                {"data": {"title": "no id at all"}},  # skipped
                {"data": {"name": "t3_empty", "title": "   "}},  # unparseable text
            ]
        }
    }
)


def test_reddit_parse_posts_edge_cases():
    posts = reddit.parse_posts(REDDIT_LISTING, NOW, 50)
    assert len(posts) == 2
    assert posts[0].id == "t3_abc"
    assert posts[0].text.as_str() == "AAPL to the moon\ncalls all day"
    assert posts[0].engagement == 42
    assert posts[0].created_at == dt.datetime.fromtimestamp(
        1780000000, dt.timezone.utc
    )
    assert posts[1].id == "xyz"
    assert posts[1].engagement == 0  # negative score clamped
    assert posts[1].created_at == NOW  # created_utc fallback


def test_reddit_parse_honors_limit_and_truncates():
    body = json.dumps(
        {
            "data": {
                "children": [
                    {"data": {"name": f"t3_{i}", "title": "x" * 20_000}}
                    for i in range(5)
                ]
            }
        }
    )
    posts = reddit.parse_posts(body, NOW, 3)
    assert len(posts) == 3
    assert all(len(p.text.as_str()) == 10_000 for p in posts)


def test_reddit_parse_malformed_errors():
    with pytest.raises(SourceFailure):
        reddit.parse_posts("{not json", NOW, 10)


def test_reddit_token_parse():
    token, ttl = reddit.parse_token(
        json.dumps({"access_token": "tok", "expires_in": 1200})
    )
    assert token == "tok" and ttl == 1200
    _, ttl = reddit.parse_token(json.dumps({"access_token": "tok"}))
    assert ttl == 3600  # default
    with pytest.raises(SourceFailure):
        reddit.parse_token(json.dumps({"error": "invalid_grant"}))
    with pytest.raises(SourceFailure):
        reddit.parse_token("{}")


def test_reddit_cached_token_skew():
    t = reddit.CachedToken("tok", expires_at=1000.0)
    assert not t.is_expired(now=900.0)  # 100s left > 60s skew
    assert t.is_expired(now=941.0)  # inside the 60s skew window
    assert t.is_expired(now=2000.0)


# ---------- Bluesky ----------

BSKY_SEARCH = json.dumps(
    {
        "posts": [
            {
                "uri": "at://did:plc:x/app.bsky.feed.post/1",
                "record": {"text": "AAPL looking bullish", "createdAt": "2026-07-16T10:00:00Z"},
                "author": {"handle": "indexfan.bsky.social"},
                "likeCount": 3,
                "repostCount": 2,
                "replyCount": 1,
            },
            {
                "uri": "at://2",
                "record": {"text": "ok"},
                "indexedAt": "2026-07-16T09:00:00Z",
            },
            {"uri": "", "record": {"text": "no uri"}},  # skipped
            {"uri": "at://3", "record": {"text": "   "}},  # unparseable text
        ]
    }
)


def test_bluesky_parse_posts():
    posts = bluesky.parse_posts(BSKY_SEARCH, NOW, 50)
    assert len(posts) == 2
    assert posts[0].id == "at://did:plc:x/app.bsky.feed.post/1"
    assert posts[0].engagement == 6  # likes + reposts + replies
    assert posts[0].created_at.hour == 10
    assert posts[1].created_at.hour == 9  # createdAt -> indexedAt fallback
    assert posts[1].author == "unknown"


def test_bluesky_jwt_exp_decodes_without_verification():
    import base64

    payload = base64.urlsafe_b64encode(json.dumps({"exp": 12345}).encode()).decode().rstrip("=")
    jwt = f"header.{payload}.sig"
    assert bluesky.parse_jwt_exp(jwt) == 12345.0
    assert bluesky.parse_jwt_exp("not-a-jwt") is None


def test_bluesky_session_parse_fallback_ttl():
    jwt_no_exp = "a.e30.c"  # payload {} -> no exp
    tok, expires_at = bluesky.parse_session(json.dumps({"accessJwt": jwt_no_exp}))
    import time

    assert tok == jwt_no_exp
    assert expires_at > time.time() + 500  # ~600s fallback
    with pytest.raises(SourceFailure):
        bluesky.parse_session("{}")


def test_bluesky_limit_zero_short_circuits_without_network():
    import asyncio

    async def boom(*a, **k):
        raise AssertionError("network must not be touched at limit=0")

    src = bluesky.BlueskySource("h", "p", fetch=boom)
    assert asyncio.run(src.fetch(AAPL, 0)) == []


# ---------- X ----------

X_RESPONSE = json.dumps(
    {
        "data": [
            {
                "id": "1",
                "text": "robotaxi launch",
                "author_id": "u1",
                "created_at": "2026-07-16T11:00:00.000Z",
                "public_metrics": {"like_count": 10, "retweet_count": 5, "reply_count": 2},
            },
            {"id": "2", "text": "second post", "author_id": "u2"},
            {"id": "3", "text": "third kept out by limit"},
        ],
        "includes": {"users": [{"id": "u1", "username": "elonmusk"}]},
    }
)


def test_x_parse_posts_author_join_and_billing():
    fetch = x.parse_posts(X_RESPONSE, NOW, 2)
    assert len(fetch.posts) == 2
    assert fetch.posts_returned == 3  # billed BEFORE client truncation
    assert fetch.posts[0].author == "elonmusk"  # id->username join
    assert fetch.posts[0].engagement == 17
    assert fetch.posts[1].author == "u2"  # no user record -> raw id


def test_x_build_query_quotes_keywords():
    q = x.build_query(AAPL, ["tim_cook", "apple"], ["Apple", "Vision Pro"])
    assert q == (
        '($AAPL OR AAPL OR "Apple" OR "Vision Pro") '
        "(from:tim_cook OR from:apple) -is:retweet"
    )


def test_x_query_length_guard_pre_network():
    import asyncio

    async def boom(*a, **k):
        raise AssertionError("must fail before the network/billing")

    src = x.XPulseSource("bearer", fetch=boom)
    many = [f"handle{i:08d}" for i in range(60)]
    with pytest.raises(SourceFailure, match="query too long"):
        asyncio.run(src.pulse(AAPL, many, [], 24, 10))


def test_x_status_errors_distinguished():
    import asyncio
    from openintel_tpu.sources.http import HttpResponse

    async def status(code, headers=None):
        async def fetch(*a, **k):
            return HttpResponse(status=code, body="{}", headers=headers or {})

        return fetch

    for code, needle in ((401, "unauthorized"), (403, "forbidden")):
        fetch = asyncio.run(status(code))
        with pytest.raises(SourceFailure, match=needle):
            asyncio.run(x.XPulseSource("b", fetch=fetch).pulse(AAPL, ["a"], [], 24, 10))
    fetch = asyncio.run(status(429, {"x-rate-limit-reset": "123"}))
    with pytest.raises(SourceFailure, match="retry after epoch 123"):
        asyncio.run(x.XPulseSource("b", fetch=fetch).pulse(AAPL, ["a"], [], 24, 10))


# ---------- Yahoo ----------


def yahoo_body(closes, volumes, meta=None, highs=None, lows=None):
    n = len(closes)
    return json.dumps(
        {
            "chart": {
                "result": [
                    {
                        "meta": meta or {},
                        "indicators": {
                            "quote": [
                                {
                                    "close": closes,
                                    "volume": volumes,
                                    "high": highs or closes,
                                    "low": lows or closes,
                                }
                            ]
                        },
                    }
                ],
                "error": None,
            }
        }
    )


def test_yahoo_snapshot_basic():
    closes = [100.0, 101.0, None, 103.0, 104.0]
    volumes = [10, 20, None, 30, 40]
    snap = yahoo.parse_snapshot(
        yahoo_body(closes, volumes, meta={"regularMarketPrice": 105.0}), AAPL, NOW
    )
    assert snap.last_price == 105.0
    assert snap.previous_close == 103.0  # 2nd-to-last non-null close
    assert snap.volume == 40
    assert snap.avg_volume == 25
    assert snap.realized_vol is None  # < 20 returns


def test_yahoo_snapshot_meta_fallbacks():
    closes = [100.0]
    snap = yahoo.parse_snapshot(
        yahoo_body(closes, [5], meta={"chartPreviousClose": 99.0}), AAPL, NOW
    )
    assert snap.last_price == 100.0  # series fallback (no meta price)
    assert snap.previous_close == 99.0


def test_yahoo_realized_vol_gated_at_20_returns():
    import math

    closes = [100.0 * math.exp(0.01 * i) for i in range(25)]
    snap = yahoo.parse_snapshot(yahoo_body(closes, [1] * 25), AAPL, NOW)
    # constant log-returns -> zero stdev
    assert snap.realized_vol == pytest.approx(0.0, abs=1e-9)
    snap_short = yahoo.parse_snapshot(yahoo_body(closes[:20], [1] * 20), AAPL, NOW)
    assert snap_short.realized_vol is None


def test_yahoo_bars_skip_null_legs():
    body = yahoo_body(
        [100.0, 101.0, 102.0],
        [1, 1, 1],
        highs=[101.0, None, 103.0],
        lows=[99.0, 100.0, 101.0],
    )
    bars = yahoo.parse_bars(body)
    assert len(bars) == 2
    assert bars[0].high == 101.0 and bars[1].close == 102.0


def test_yahoo_error_paths():
    with pytest.raises(SourceFailure, match="malformed"):
        yahoo.parse_snapshot("{bad", AAPL, NOW, status=500)
    with pytest.raises(SourceFailure, match="API error"):
        yahoo.parse_snapshot(
            json.dumps({"chart": {"error": {"code": "Not Found"}}}), AAPL, NOW, 404
        )
    with pytest.raises(SourceFailure, match="empty chart"):
        yahoo.parse_snapshot(json.dumps({"chart": {"result": []}}), AAPL, NOW)

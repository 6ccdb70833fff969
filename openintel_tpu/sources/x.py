"""X (Twitter) paid pulse feed: recent search over curated accounts.

Parity targets (reference: src/adapters/sources/x/*):
- query builder: ($TICK OR TICK OR "kw"...) (from:a OR ...) -is:retweet,
  keywords phrase-quoted as injection defense;
- 512-char query cap checked BEFORE the network call (never bill a doomed
  request); max_results clamped [10, 100] (the API bills a minimum of 10);
- 401/403 distinguished; 429 carries a reset hint from x-rate-limit-reset;
- parse: tweets + includes.users author-id -> username join;
  posts_returned counted BEFORE client truncation = what X bills.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.parse
from typing import Sequence

from openintel_tpu.domain.entities import PostText, PulseFetch, PulsePost, Ticker
from openintel_tpu.errors import InvalidPostText, SourceFailure
from openintel_tpu.sources import http

SEARCH_URL = "https://api.x.com/2/tweets/search/recent"
MAX_QUERY_CHARS = 512
MIN_RESULTS = 10  # API minimum — X bills at least this many reads
MAX_RESULTS = 100


def _fail(message: str) -> SourceFailure:
    return SourceFailure(name="x", message=message)


def build_query(
    ticker: Ticker, accounts: Sequence[str], keywords: Sequence[str]
) -> str:
    sym = ticker.as_str()
    terms = [f"${sym}", sym]
    # Phrase-quote every keyword: charset-validated upstream (no '"'), so a
    # keyword can never break out of the quotes or act as a query operator.
    terms += [f'"{k}"' for k in keywords]
    froms = " OR ".join(f"from:{a}" for a in accounts)
    return f"({' OR '.join(terms)}) ({froms}) -is:retweet"


def parse_posts(body: str, fetched_at: dt.datetime, limit: int) -> PulseFetch:
    try:
        doc = json.loads(body)
    except json.JSONDecodeError as e:
        raise _fail(f"malformed response: {e}")
    data = doc.get("data") or []
    users = {
        u.get("id"): u.get("username")
        for u in ((doc.get("includes") or {}).get("users") or [])
    }
    posts: list[PulsePost] = []
    for tweet in data:
        if len(posts) >= limit:
            break
        tid = tweet.get("id") or ""
        if not tid:
            continue
        try:
            text = PostText.parse(str(tweet.get("text") or ""))
        except InvalidPostText:
            continue
        created_at = fetched_at
        raw_created = tweet.get("created_at")
        if isinstance(raw_created, str):
            try:
                created_at = dt.datetime.fromisoformat(
                    raw_created.replace("Z", "+00:00")
                )
            except ValueError:
                pass
        metrics = tweet.get("public_metrics") or {}
        engagement = sum(
            int(metrics.get(k) or 0)
            for k in ("like_count", "retweet_count", "reply_count")
        )
        author = users.get(tweet.get("author_id")) or str(
            tweet.get("author_id") or "unknown"
        )
        posts.append(
            PulsePost(
                id=str(tid),
                author=str(author),
                text=text,
                created_at=created_at,
                engagement=max(engagement, 0),
            )
        )
    # Billing truth: what X returned, not what we kept after truncation/skips.
    return PulseFetch(posts=posts, posts_returned=len(data))


class XPulseSource:
    def __init__(self, bearer: str, fetch=http.request):
        if not bearer:
            raise _fail("empty bearer token")
        self._bearer = bearer
        self._fetch = fetch

    async def pulse(
        self,
        ticker: Ticker,
        accounts: Sequence[str],
        keywords: Sequence[str],
        hours_back: int,
        limit: int,
    ) -> PulseFetch:
        query = build_query(ticker, accounts, keywords)
        if len(query) > MAX_QUERY_CHARS:
            raise _fail(
                f"query too long ({len(query)} > {MAX_QUERY_CHARS} chars) — "
                "fewer accounts/keywords"
            )
        start = dt.datetime.now(dt.timezone.utc) - dt.timedelta(hours=hours_back)
        max_results = min(max(limit, MIN_RESULTS), MAX_RESULTS)
        params = urllib.parse.urlencode(
            {
                "query": query,
                "max_results": max_results,
                "start_time": start.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "tweet.fields": "created_at,public_metrics,author_id",
                "expansions": "author_id",
                "user.fields": "username",
            }
        )
        resp = await self._fetch(
            f"{SEARCH_URL}?{params}",
            headers={"Authorization": f"Bearer {self._bearer}"},
        )
        if resp.status == 401:
            raise _fail("unauthorized (HTTP 401) — check OPENINTEL_X_BEARER")
        if resp.status == 403:
            raise _fail("forbidden (HTTP 403) — your plan may not include search")
        if resp.status == 429:
            reset = resp.headers.get("x-rate-limit-reset")
            hint = f"; retry after epoch {reset}" if reset else ""
            raise _fail(f"rate limited (HTTP 429){hint}")
        if resp.status != 200:
            raise _fail(f"search failed (HTTP {resp.status})")
        return parse_posts(resp.body, dt.datetime.now(dt.timezone.utc), limit)

"""Reddit social source: OAuth2 client-credentials + cashtag search.

Parity targets (reference: src/adapters/sources/reddit/*):
- token POST with basic auth + form body; expires_in default 3600; `error`
  field raises; cached bearer with 60s expiry skew behind an async lock
  (the double-checked-lock analogue, reddit/mod.rs:53-80);
- search 5 subreddits for the $TICKER cashtag, sort=new, limit <= 100;
  HTTP 429 -> rate-limit error;
- listing parse: id = name|id (skip if both empty), text = title + "\\n" +
  selftext truncated to 10k chars, skip unparseable posts, created_utc
  falls back to fetch time, engagement = max(score, 0), honor limit.
"""

from __future__ import annotations

import asyncio
import base64
import datetime as dt
import json
import time
import urllib.parse
from dataclasses import dataclass
from typing import Optional

from openintel_tpu.domain.entities import PostText, SocialPost, Ticker
from openintel_tpu.domain.values import SourceKind
from openintel_tpu.errors import InvalidPostText, SourceFailure
from openintel_tpu.sources import http

SUBREDDITS = "wallstreetbets+stocks+options+investing+StockMarket"
TOKEN_URL = "https://www.reddit.com/api/v1/access_token"
SEARCH_URL = f"https://oauth.reddit.com/r/{SUBREDDITS}/search"
SKEW_SECS = 60.0
MAX_TEXT_CHARS = 10_000


def _fail(message: str) -> SourceFailure:
    return SourceFailure(name="reddit", message=message)


def parse_token(body: str) -> tuple[str, float]:
    """-> (access_token, expires_in seconds; default 3600)."""
    try:
        doc = json.loads(body)
    except json.JSONDecodeError as e:
        raise _fail(f"malformed token response: {e}")
    if doc.get("error"):
        raise _fail(f"auth error: {doc['error']}")
    token = doc.get("access_token")
    if not token:
        raise _fail("token response missing access_token")
    return token, float(doc.get("expires_in") or 3600)


@dataclass
class CachedToken:
    token: str
    expires_at: float  # epoch seconds

    def is_expired(self, now: Optional[float] = None) -> bool:
        return (now if now is not None else time.time()) >= self.expires_at - SKEW_SECS


def parse_posts(
    body: str, fetched_at: dt.datetime, limit: int
) -> list[SocialPost]:
    try:
        doc = json.loads(body)
    except json.JSONDecodeError as e:
        raise _fail(f"malformed listing: {e}")
    children = ((doc.get("data") or {}).get("children")) or []
    posts: list[SocialPost] = []
    for child in children:
        if len(posts) >= limit:
            break
        data = child.get("data") or {}
        pid = data.get("name") or data.get("id") or ""
        if not pid:
            continue  # skip unidentifiable posts
        title = data.get("title") or ""
        selftext = data.get("selftext") or ""
        raw = f"{title}\n{selftext}" if selftext else title
        try:
            text = PostText.parse(raw[:MAX_TEXT_CHARS])
        except InvalidPostText:
            continue  # skip unparseable posts, never fail the batch
        created = data.get("created_utc")
        created_at = (
            dt.datetime.fromtimestamp(float(created), dt.timezone.utc)
            if isinstance(created, (int, float))
            else fetched_at
        )
        score = data.get("score")
        engagement = max(int(score), 0) if isinstance(score, (int, float)) else 0
        posts.append(
            SocialPost(
                id=str(pid),
                source=SourceKind.REDDIT,
                author=str(data.get("author") or "unknown"),
                text=text,
                created_at=created_at,
                engagement=engagement,
            )
        )
    return posts


class RedditSource:
    def __init__(self, client_id: str, client_secret: str, fetch=http.request):
        self._client_id = client_id
        self._client_secret = client_secret
        self._fetch = fetch
        self._token: Optional[CachedToken] = None
        self._lock = asyncio.Lock()

    @property
    def kind(self) -> SourceKind:
        return SourceKind.REDDIT

    async def _ensure_token(self) -> str:
        # Double-checked locking: fast path without the lock, recheck under it.
        cached = self._token
        if cached is not None and not cached.is_expired():
            return cached.token
        async with self._lock:
            cached = self._token
            if cached is not None and not cached.is_expired():
                return cached.token
            basic = base64.b64encode(
                f"{self._client_id}:{self._client_secret}".encode()
            ).decode()
            resp = await self._fetch(
                TOKEN_URL,
                method="POST",
                headers={
                    "Authorization": f"Basic {basic}",
                    "Content-Type": "application/x-www-form-urlencoded",
                    "User-Agent": "openintel-tpu",
                },
                data=b"grant_type=client_credentials",
            )
            if resp.status != 200:
                raise _fail(f"token request failed (HTTP {resp.status})")
            token, expires_in = parse_token(resp.body)
            self._token = CachedToken(token, time.time() + expires_in)
            return token

    async def fetch(self, ticker: Ticker, limit: int) -> list[SocialPost]:
        token = await self._ensure_token()
        query = urllib.parse.quote(f"${ticker.as_str()}")
        url = (
            f"{SEARCH_URL}?q={query}&sort=new&restrict_sr=true"
            f"&limit={min(max(limit, 1), 100)}"
        )
        resp = await self._fetch(
            url,
            headers={
                "Authorization": f"Bearer {token}",
                "User-Agent": "openintel-tpu",
            },
        )
        if resp.status == 429:
            raise _fail("rate limited (HTTP 429)")
        if resp.status != 200:
            raise _fail(f"search failed (HTTP {resp.status})")
        return parse_posts(resp.body, dt.datetime.now(dt.timezone.utc), limit)

"""Bluesky social source: ATProto session auth + post search.

Parity targets (reference: src/adapters/sources/bluesky/*):
- createSession auth; token expiry read by decoding the JWT `exp` claim
  WITHOUT verification (refresh hint only), 600s fallback TTL, 60s skew;
- searchPosts?q=TICKER&sort=latest; limit=0 short-circuits without network;
  HTTP 400/401 both mean unauthorized (ATProto quirk);
- parse: uri as id, record.text, createdAt -> indexedAt -> fetched_at
  fallback chain, engagement = likes + reposts + replies saturating at
  u32::MAX.
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

BASE_URL = "https://bsky.social/xrpc"
SKEW_SECS = 60.0
FALLBACK_TTL_SECS = 600.0
U32_MAX = 2**32 - 1


def _fail(message: str) -> SourceFailure:
    return SourceFailure(name="bluesky", message=message)


def parse_jwt_exp(jwt: str) -> Optional[float]:
    """Decode the unverified `exp` claim (refresh hint only, never trust)."""
    parts = jwt.split(".")
    if len(parts) != 3:
        return None
    payload = parts[1]
    padded = payload + "=" * (-len(payload) % 4)
    try:
        claims = json.loads(base64.urlsafe_b64decode(padded))
    except Exception:
        return None
    exp = claims.get("exp")
    return float(exp) if isinstance(exp, (int, float)) else None


def parse_session(body: str) -> tuple[str, float]:
    """-> (accessJwt, expires_at epoch seconds)."""
    try:
        doc = json.loads(body)
    except json.JSONDecodeError as e:
        raise _fail(f"malformed session response: {e}")
    jwt = doc.get("accessJwt")
    if not jwt:
        raise _fail("session response missing accessJwt")
    exp = parse_jwt_exp(jwt)
    expires_at = exp if exp is not None else time.time() + FALLBACK_TTL_SECS
    return jwt, expires_at


@dataclass
class CachedSession:
    jwt: str
    expires_at: float

    def is_expired(self, now: Optional[float] = None) -> bool:
        return (now if now is not None else time.time()) >= self.expires_at - SKEW_SECS


def parse_posts(body: str, fetched_at: dt.datetime, limit: int) -> list[SocialPost]:
    try:
        doc = json.loads(body)
    except json.JSONDecodeError as e:
        raise _fail(f"malformed search response: {e}")
    out: list[SocialPost] = []
    for post in doc.get("posts") or []:
        if len(out) >= limit:
            break
        uri = post.get("uri") or ""
        if not uri:
            continue
        record = post.get("record") or {}
        try:
            text = PostText.parse(str(record.get("text") or ""))
        except InvalidPostText:
            continue
        created_raw = record.get("createdAt") or post.get("indexedAt")
        created_at = fetched_at
        if isinstance(created_raw, str):
            try:
                created_at = dt.datetime.fromisoformat(
                    created_raw.replace("Z", "+00:00")
                )
            except ValueError:
                pass
        engagement = 0
        for key in ("likeCount", "repostCount", "replyCount"):
            v = post.get(key)
            if isinstance(v, (int, float)) and v > 0:
                engagement = min(engagement + int(v), U32_MAX)
        author = (post.get("author") or {}).get("handle") or "unknown"
        out.append(
            SocialPost(
                id=str(uri),
                source=SourceKind.BLUESKY,
                author=str(author),
                text=text,
                created_at=created_at,
                engagement=engagement,
            )
        )
    return out


class BlueskySource:
    def __init__(self, handle: str, app_password: str, fetch=http.request):
        self._handle = handle
        self._app_password = app_password
        self._fetch = fetch
        self._session: Optional[CachedSession] = None
        self._lock = asyncio.Lock()

    @property
    def kind(self) -> SourceKind:
        return SourceKind.BLUESKY

    async def _ensure_session(self) -> str:
        cached = self._session
        if cached is not None and not cached.is_expired():
            return cached.jwt
        async with self._lock:
            cached = self._session
            if cached is not None and not cached.is_expired():
                return cached.jwt
            resp = await self._fetch(
                f"{BASE_URL}/com.atproto.server.createSession",
                method="POST",
                headers={"Content-Type": "application/json"},
                data=json.dumps(
                    {"identifier": self._handle, "password": self._app_password}
                ).encode(),
            )
            if resp.status in (400, 401):  # ATProto quirk: both = unauthorized
                raise _fail(f"unauthorized (HTTP {resp.status}) — check credentials")
            if resp.status != 200:
                raise _fail(f"createSession failed (HTTP {resp.status})")
            jwt, expires_at = parse_session(resp.body)
            self._session = CachedSession(jwt, expires_at)
            return jwt

    async def fetch(self, ticker: Ticker, limit: int) -> list[SocialPost]:
        if limit == 0:  # short-circuit without network
            return []
        jwt = await self._ensure_session()
        q = urllib.parse.quote(ticker.as_str())
        url = (
            f"{BASE_URL}/app.bsky.feed.searchPosts?q={q}&sort=latest"
            f"&limit={min(max(limit, 1), 100)}"
        )
        resp = await self._fetch(url, headers={"Authorization": f"Bearer {jwt}"})
        if resp.status in (400, 401):
            raise _fail(f"unauthorized (HTTP {resp.status})")
        if resp.status != 200:
            raise _fail(f"searchPosts failed (HTTP {resp.status})")
        return parse_posts(resp.body, dt.datetime.now(dt.timezone.utc), limit)

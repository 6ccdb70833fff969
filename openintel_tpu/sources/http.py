"""Minimal async HTTP helper over stdlib urllib (10s timeout, zero deps).

Network adapters take an injectable ``fetch`` callable so tests drive parse
logic with canned bodies and never touch the network (reference test strategy
SURVEY.md §4: parse functions are pure str -> result)."""

from __future__ import annotations

import asyncio
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Mapping, Optional

DEFAULT_TIMEOUT_SECS = 10.0


@dataclass
class HttpResponse:
    status: int
    body: str
    headers: Mapping[str, str]


def _request_sync(
    url: str,
    *,
    method: str = "GET",
    headers: Optional[Mapping[str, str]] = None,
    data: Optional[bytes] = None,
    timeout: float = DEFAULT_TIMEOUT_SECS,
) -> HttpResponse:
    req = urllib.request.Request(url, data=data, method=method)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return HttpResponse(
                status=resp.status,
                body=resp.read().decode("utf-8", errors="replace"),
                headers=dict(resp.headers),
            )
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        return HttpResponse(
            status=e.code,
            body=(e.read() or b"").decode("utf-8", errors="replace"),
            headers=dict(e.headers or {}),
        )


async def request(
    url: str,
    *,
    method: str = "GET",
    headers: Optional[Mapping[str, str]] = None,
    data: Optional[bytes] = None,
    timeout: float = DEFAULT_TIMEOUT_SECS,
) -> HttpResponse:
    return await asyncio.to_thread(
        _request_sync, url, method=method, headers=headers, data=data, timeout=timeout
    )

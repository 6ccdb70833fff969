"""Ingest adapters: deterministic fixtures, live social/market clients.

``build_social_sources`` wires a source only when its full credential set is
present; partial credentials warn on stderr and omit the source — never crash
(reference: src/adapters/sources/mod.rs:19-48).
"""

from __future__ import annotations

import sys

from openintel_tpu.config.secrets import Credentials
from openintel_tpu.domain.ports import SocialDataSource


def build_social_sources(credentials: Credentials) -> list[SocialDataSource]:
    """Wire Reddit/Bluesky iff both of their credentials are present."""
    from openintel_tpu.sources.bluesky import BlueskySource
    from openintel_tpu.sources.reddit import RedditSource

    sources: list[SocialDataSource] = []

    reddit_id, reddit_secret = credentials.reddit_client_id, credentials.reddit_client_secret
    if reddit_id and reddit_secret:
        sources.append(RedditSource(reddit_id, reddit_secret))
    elif reddit_id or reddit_secret:
        print(
            "warning: reddit partially configured (need both client id and secret); skipping",
            file=sys.stderr,
        )

    handle, app_password = credentials.bluesky_handle, credentials.bluesky_app_password
    if handle and app_password:
        sources.append(BlueskySource(handle, app_password))
    elif handle or app_password:
        print(
            "warning: bluesky partially configured (need both handle and app password); skipping",
            file=sys.stderr,
        )

    return sources

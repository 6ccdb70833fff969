"""Credential resolution: env (non-empty) -> OS keychain -> unset.

Parity targets (reference: src/config/secrets.rs:6-76):
- six optional secrets (Reddit id/secret, Bluesky handle/app-password, market
  key, X bearer);
- env vars win when set and non-empty;
- a broken keychain warns once and degrades to env-only — never fatal;
- reprs never leak secret values (the analogue of ``secrecy``'s leak-safe Debug).
"""

from __future__ import annotations

import os
import sys
from typing import Optional

from openintel_tpu.config.store import CredentialStore, StoreError

ENV_REDDIT_CLIENT_ID = "OPENINTEL_REDDIT_CLIENT_ID"
ENV_REDDIT_CLIENT_SECRET = "OPENINTEL_REDDIT_CLIENT_SECRET"
ENV_BLUESKY_HANDLE = "OPENINTEL_BLUESKY_HANDLE"
ENV_BLUESKY_APP_PASSWORD = "OPENINTEL_BLUESKY_APP_PASSWORD"
ENV_MARKET_API_KEY = "OPENINTEL_MARKET_API_KEY"
ENV_X_BEARER = "OPENINTEL_X_BEARER"

# Keychain key names (stable storage identifiers).
KEY_REDDIT_CLIENT_ID = "reddit_client_id"
KEY_REDDIT_CLIENT_SECRET = "reddit_client_secret"
KEY_BLUESKY_HANDLE = "bluesky_handle"
KEY_BLUESKY_APP_PASSWORD = "bluesky_app_password"
KEY_MARKET_API_KEY = "market_api_key"
KEY_X_BEARER = "x_bearer"

_FIELD_KEYS = (
    ("reddit_client_id", ENV_REDDIT_CLIENT_ID, KEY_REDDIT_CLIENT_ID),
    ("reddit_client_secret", ENV_REDDIT_CLIENT_SECRET, KEY_REDDIT_CLIENT_SECRET),
    ("bluesky_handle", ENV_BLUESKY_HANDLE, KEY_BLUESKY_HANDLE),
    ("bluesky_app_password", ENV_BLUESKY_APP_PASSWORD, KEY_BLUESKY_APP_PASSWORD),
    ("market_api_key", ENV_MARKET_API_KEY, KEY_MARKET_API_KEY),
    ("x_bearer", ENV_X_BEARER, KEY_X_BEARER),
)


class Credentials:
    """Six optional secrets with leak-safe repr."""

    __slots__ = tuple(f for f, _, _ in _FIELD_KEYS)

    def __init__(
        self,
        reddit_client_id: Optional[str] = None,
        reddit_client_secret: Optional[str] = None,
        bluesky_handle: Optional[str] = None,
        bluesky_app_password: Optional[str] = None,
        market_api_key: Optional[str] = None,
        x_bearer: Optional[str] = None,
    ) -> None:
        self.reddit_client_id = reddit_client_id
        self.reddit_client_secret = reddit_client_secret
        self.bluesky_handle = bluesky_handle
        self.bluesky_app_password = bluesky_app_password
        self.market_api_key = market_api_key
        self.x_bearer = x_bearer

    def __repr__(self) -> str:  # leak-safe: values are never rendered
        parts = []
        for field, _, _ in _FIELD_KEYS:
            value = getattr(self, field)
            parts.append(f"{field}={'[REDACTED]' if value else 'None'}")
        return f"Credentials({', '.join(parts)})"

    @staticmethod
    def load(store: CredentialStore) -> "Credentials":
        """Resolve each secret: env (non-empty) -> keychain -> unset.

        A broken keychain warns once on stderr and degrades to env-only."""
        creds = Credentials()
        store_broken = False
        for field, env_name, key_name in _FIELD_KEYS:
            env_value = os.environ.get(env_name)
            if env_value:  # non-empty env wins
                setattr(creds, field, env_value)
                continue
            if store_broken:
                continue
            try:
                stored = store.get(key_name)
            except StoreError as e:
                print(
                    f"warning: credential store unavailable ({e}); using env only",
                    file=sys.stderr,
                )
                store_broken = True
                continue
            if stored:
                setattr(creds, field, stored)
        return creds

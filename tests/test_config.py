"""Config/secrets/store tests (reference: src/config/*.rs colocated tests)."""

import pytest

from openintel_tpu.config.secrets import (
    ENV_REDDIT_CLIENT_ID,
    ENV_X_BEARER,
    KEY_REDDIT_CLIENT_ID,
    KEY_X_BEARER,
    Credentials,
)
from openintel_tpu.config.settings import AppConfig, OutputFormat
from openintel_tpu.config.store import InMemoryStore, StoreError
from openintel_tpu.domain.values import SourceKind


def test_env_wins_over_store(monkeypatch):
    store = InMemoryStore()
    store.set(KEY_REDDIT_CLIENT_ID, "from-store")
    monkeypatch.setenv(ENV_REDDIT_CLIENT_ID, "from-env")
    creds = Credentials.load(store)
    assert creds.reddit_client_id == "from-env"


def test_empty_env_falls_through_to_store(monkeypatch):
    store = InMemoryStore()
    store.set(KEY_X_BEARER, "stored-bearer")
    monkeypatch.setenv(ENV_X_BEARER, "")  # empty -> not set
    monkeypatch.delenv(ENV_REDDIT_CLIENT_ID, raising=False)
    creds = Credentials.load(store)
    assert creds.x_bearer == "stored-bearer"
    assert creds.reddit_client_id is None


def test_broken_store_degrades_to_env_only(monkeypatch, capsys):
    monkeypatch.setenv(ENV_REDDIT_CLIENT_ID, "env-id")
    creds = Credentials.load(InMemoryStore.failing())
    assert creds.reddit_client_id == "env-id"
    assert "credential store unavailable" in capsys.readouterr().err


def test_repr_never_leaks_secrets():
    creds = Credentials(x_bearer="SUPER-SECRET-TOKEN")
    text = repr(creds)
    assert "SUPER-SECRET-TOKEN" not in text
    assert "[REDACTED]" in text


def test_in_memory_store_roundtrip_and_idempotent_delete():
    store = InMemoryStore()
    assert store.get("k") is None
    store.set("k", "v")
    assert store.get("k") == "v"
    store.delete("k")
    store.delete("k")  # idempotent
    assert store.get("k") is None


def test_failing_store_raises():
    store = InMemoryStore.failing()
    with pytest.raises(StoreError):
        store.get("k")
    with pytest.raises(StoreError):
        store.set("k", "v")


def test_app_config_defaults_all_sources():
    c = AppConfig.new("AAPL", False, False, False, 50, OutputFormat.TABLE)
    assert c.enabled_sources == (SourceKind.REDDIT, SourceKind.BLUESKY)
    assert c.market_enabled
    c2 = AppConfig.new("AAPL", True, False, True, 10, OutputFormat.JSON)
    assert c2.enabled_sources == (SourceKind.REDDIT,)
    assert not c2.market_enabled
    assert c2.engine.min_sample == 10


def test_build_social_sources_partial_credentials_warns(capsys):
    from openintel_tpu.sources import build_social_sources

    creds = Credentials(reddit_client_id="id-only")
    sources = build_social_sources(creds)
    assert sources == []
    assert "partially configured" in capsys.readouterr().err

    creds = Credentials(
        reddit_client_id="id",
        reddit_client_secret="sec",
        bluesky_handle="h",
        bluesky_app_password="p",
    )
    sources = build_social_sources(creds)
    assert [s.kind.value for s in sources] == ["reddit", "bluesky"]

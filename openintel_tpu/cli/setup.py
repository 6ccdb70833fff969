"""Guided credential setup with live verification.

Parity targets (reference: src/cli/setup.rs):
- TTY: condensed guide -> prompts (secrets hidden) -> live probe -> save to
  keychain ONLY after the probe succeeds, identifier written before secret;
- <= 3 attempts (MAX_ATTEMPTS), bounded empty-input re-asks;
- paid-source pre-probe cost confirmation for X;
- --forget: idempotent delete;
- non-TTY: print the guide and current env state instead of prompting;
- all IO injected through SetupIo so tests script the interactive loop.
"""

from __future__ import annotations

import asyncio
import os
import sys
from dataclasses import dataclass, field
from typing import Callable, Optional

from openintel_tpu.config import secrets as sec
from openintel_tpu.config.store import CredentialStore, KeychainStore, StoreError
from openintel_tpu.domain.entities import Ticker

MAX_ATTEMPTS = 3
MAX_EMPTY_REASKS = 3

GUIDES = {
    "reddit": (
        "Reddit setup: create a 'script' app at reddit.com/prefs/apps; you need "
        "the client id (under the app name) and the client secret."
    ),
    "bluesky": (
        "Bluesky setup: create an app password at bsky.app Settings -> App "
        "Passwords; you need your handle (e.g. you.bsky.social) and that app "
        "password — never your main password."
    ),
    "x": (
        "X setup: create a project+app at developer.x.com and copy the Bearer "
        "Token. NOTE: X search is PAID (~$0.005 per post read, min 10 reads "
        "per call)."
    ),
}

FIELDS = {
    "reddit": [
        ("client id", sec.KEY_REDDIT_CLIENT_ID, False),
        ("client secret", sec.KEY_REDDIT_CLIENT_SECRET, True),
    ],
    "bluesky": [
        ("handle", sec.KEY_BLUESKY_HANDLE, False),
        ("app password", sec.KEY_BLUESKY_APP_PASSWORD, True),
    ],
    "x": [("bearer token", sec.KEY_X_BEARER, True)],
}


@dataclass
class SetupIo:
    """Injected IO so the interactive loop is testable without a TTY."""

    read_line: Callable[[], str] = lambda: sys.stdin.readline()
    read_secret: Callable[[], str] = None  # type: ignore[assignment]
    write: Callable[[str], None] = lambda s: print(s, end="")
    is_tty: Callable[[], bool] = lambda: sys.stdin.isatty()

    def __post_init__(self):
        if self.read_secret is None:
            import getpass

            def _read_secret() -> str:
                try:
                    return getpass.getpass("")
                except EOFError:  # Ctrl-D at a hidden prompt: graceful abort
                    return ""

            self.read_secret = _read_secret


async def _probe_reddit(client_id: str, client_secret: str) -> None:
    from openintel_tpu.sources.reddit import RedditSource

    await RedditSource(client_id, client_secret).fetch(Ticker.parse("AAPL"), 1)


async def _probe_bluesky(handle: str, app_password: str) -> None:
    from openintel_tpu.sources.bluesky import BlueskySource

    await BlueskySource(handle, app_password).fetch(Ticker.parse("AAPL"), 1)


async def _probe_x(bearer: str) -> None:
    from openintel_tpu.sources.x import XPulseSource

    await XPulseSource(bearer).pulse(
        Ticker.parse("AAPL"), ["elonmusk"], [], 1, 10
    )


PROBES = {"reddit": _probe_reddit, "bluesky": _probe_bluesky, "x": _probe_x}


def run_setup(
    source: str,
    *,
    forget: bool = False,
    store: Optional[CredentialStore] = None,
    io: Optional[SetupIo] = None,
    probe=None,
) -> tuple[str, int]:
    store = store if store is not None else KeychainStore()
    io = io or SetupIo()
    probe = probe or PROBES[source]
    fields = FIELDS[source]

    if forget:
        try:
            for _, key, _ in fields:
                store.delete(key)  # idempotent
        except StoreError as e:
            return f"error: credential store unavailable ({e})\n", 1
        return f"{source}: stored credentials removed (if any)\n", 0

    if not io.is_tty():
        # Non-TTY: report the guide + env state instead of prompting.
        lines = [GUIDES[source], ""]
        env_names = {
            "reddit": (sec.ENV_REDDIT_CLIENT_ID, sec.ENV_REDDIT_CLIENT_SECRET),
            "bluesky": (sec.ENV_BLUESKY_HANDLE, sec.ENV_BLUESKY_APP_PASSWORD),
            "x": (sec.ENV_X_BEARER,),
        }[source]
        for name in env_names:
            state = "set" if os.environ.get(name) else "unset"
            lines.append(f"  {name}: {state}")
        lines.append(
            "\nnon-interactive session: export the env vars above, or re-run "
            "`openintel setup` in a terminal for the guided flow."
        )
        return "\n".join(lines) + "\n", 0

    # Replace-or-keep: stored credentials are detected up front; declining
    # keeps them untouched (reference: src/cli/setup.rs:698+ replace-declined).
    # A broken store degrades to "nothing stored" — setup must stay usable.
    try:
        existing = [key for _, key, _ in fields if store.get(key)]
    except StoreError:
        existing = []
    if existing:
        io.write(
            f"{source} already has stored credentials. Replace them? [y/N]: "
        )
        answer = io.read_line().strip().lower()
        if answer not in ("y", "yes"):
            return (
                f"{source}: keeping existing credentials (nothing changed)\n",
                0,
            )

    io.write(GUIDES[source] + "\n\n")
    for attempt in range(1, MAX_ATTEMPTS + 1):
        values: list[tuple[str, str]] = []
        aborted = False
        for label, key, hidden in fields:
            got: Optional[str] = None
            for _ in range(MAX_EMPTY_REASKS):
                io.write(f"{label}: ")
                raw = io.read_secret() if hidden else io.read_line()
                if raw == "":  # EOF
                    aborted = True
                    break
                raw = raw.strip()
                if raw:
                    got = raw
                    break
                io.write("(input was empty — try again)\n")
            if aborted or got is None:
                aborted = True
                break
            values.append((key, got))
        if aborted:
            return "setup aborted (no input)\n", 1

        if source == "x":
            io.write(
                "X search is paid: this verification will read up to 10 posts "
                "(≈ $0.05). Proceed? [y/N]: "
            )
            confirm = io.read_line().strip().lower()
            if confirm not in ("y", "yes"):
                return "setup cancelled before any paid call\n", 1

        io.write("verifying credentials with a live probe...\n")
        try:
            asyncio.run(probe(*(v for _, v in values)))
        except Exception as e:
            io.write(f"verification failed: {e}\n")
            if attempt < MAX_ATTEMPTS:
                io.write(f"attempt {attempt}/{MAX_ATTEMPTS} — try again.\n")
                continue
            return f"setup failed after {MAX_ATTEMPTS} attempts\n", 1

        # Save only after success; identifier before secret so a partial write
        # never leaves a secret without its identifier.
        try:
            for key, value in values:
                store.set(key, value)
        except StoreError as e:
            return (
                f"verified OK but could not save to keychain ({e}); export the "
                "env vars instead\n",
                1,
            )
        return f"{source}: verified and saved to keychain\n", 0

    return f"setup failed after {MAX_ATTEMPTS} attempts\n", 1

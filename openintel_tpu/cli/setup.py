"""Guided credential setup with live verification.

Parity targets (reference: src/cli/setup.rs):
- TTY: condensed guide -> prompts (secrets hidden) -> live probe -> save to
  keychain ONLY after the probe succeeds, identifier written before secret;
- <= 3 attempts (MAX_ATTEMPTS), bounded empty-input re-asks;
- paid-source pre-probe cost confirmation for X;
- --forget: idempotent delete;
- non-TTY (setup.rs:36-43, 287-293): the classic guide / partial / verify
  plan over env+keychain credentials — both creds set live-probes and exits
  by the probe result (CI-friendly); one set names the missing variable;
  none prints the guide. `--verify` forces this path even on a TTY;
- all IO injected through SetupIo so tests script the interactive loop.
"""

from __future__ import annotations

import asyncio
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


async def _probe_reddit(client_id: str, client_secret: str) -> int:
    """One live round trip through the full Reddit path (OAuth + search);
    returns the post count for the verify-ok evidence line
    (setup.rs:95-101)."""
    from openintel_tpu.sources.reddit import RedditSource

    posts = await RedditSource(client_id, client_secret).fetch(
        Ticker.parse("AAPL"), 1
    )
    return len(posts)


async def _probe_bluesky(handle: str, app_password: str) -> int:
    from openintel_tpu.sources.bluesky import BlueskySource

    posts = await BlueskySource(handle, app_password).fetch(
        Ticker.parse("AAPL"), 1
    )
    return len(posts)


async def _probe_x(bearer: str) -> int:
    """One PAID round trip: the default macro accounts for AAPL, max 10
    reads (~$0.05). Display count, not billing count (setup.rs:650-659)."""
    from openintel_tpu.application.pulse import DEFAULT_PULSE_ACCOUNTS
    from openintel_tpu.sources.x import XPulseSource

    fetch = await XPulseSource(bearer).pulse(
        Ticker.parse("AAPL"), list(DEFAULT_PULSE_ACCOUNTS), [], 24, 10
    )
    return len(fetch.posts)


PROBES = {"reddit": _probe_reddit, "bluesky": _probe_bluesky, "x": _probe_x}

#: (env var, Credentials attr) per credential slot, in prompt order.
CRED_SLOTS = {
    "reddit": (
        (sec.ENV_REDDIT_CLIENT_ID, "reddit_client_id"),
        (sec.ENV_REDDIT_CLIENT_SECRET, "reddit_client_secret"),
    ),
    "bluesky": (
        (sec.ENV_BLUESKY_HANDLE, "bluesky_handle"),
        (sec.ENV_BLUESKY_APP_PASSWORD, "bluesky_app_password"),
    ),
    "x": ((sec.ENV_X_BEARER, "x_bearer"),),
}

TRY_CMDS = {
    "reddit": "openintel analyze GME --enable-reddit",
    "bluesky": "openintel analyze GME --enable-bluesky",
    "x": "openintel pulse NVDA --accounts jensenhuang",
}

LABELS = {"reddit": "Reddit", "bluesky": "Bluesky", "x": "X"}

UNAUTHORIZED_HINTS = {
    "reddit": (
        "Your client id or secret looks wrong. Re-copy both from "
        "reddit.com/prefs/apps (the id is the short string under the app "
        "name; the secret is labelled \"secret\")."
    ),
    "bluesky": (
        "Your handle or app password looks wrong. Check the handle (e.g. "
        "yourname.bsky.social) and generate a fresh app password at "
        "bsky.app/settings/app-passwords (the value is shown only once)."
    ),
    "x": (
        "Your bearer token looks wrong or lacks access. In the X developer "
        "console, regenerate the Bearer Token and make sure API credits "
        "are loaded."
    ),
}


def plan(first_set: bool, second_set: bool) -> str:
    """Which non-interactive mode applies, given which credentials resolve
    (setup.rs:36-43). First/second = the source's (identifier-like,
    secret-like) pair."""
    if first_set and second_set:
        return "verify"
    if second_set:
        return "missing_first"
    if first_set:
        return "missing_second"
    return "guide"


def partial_text(label: str, missing_env: str) -> str:
    return (
        f"warning: {label} is half-configured: {missing_env} is not set.\n"
        f"Set it, then re-run. (Run `openintel setup {label.lower()}` with "
        "neither variable set to see the full setup guide.)"
    )


def verify_ok_text(label: str, count: int, try_cmd: str) -> str:
    evidence = (
        f"pulled {count} recent post(s) for a test query"
        if count > 0
        else "credentials work — the test query just had no recent posts, "
        "which is fine"
    )
    return (
        f"OK: {label} is configured and working ({evidence}).\n"
        f"Real {label} data is active. Try:  {try_cmd}"
    )


def verify_err_text(err: Exception, unauthorized_hint: str) -> str:
    """Per-cause hint selection (setup.rs:150-163). The reference matches
    on message substrings; our adapters phrase some failures by HTTP status
    (reddit.py raises "token request failed (HTTP 401)" without the word
    "unauthorized"), so the status codes are matched too — otherwise a
    wrong client secret gets the generic connectivity hint."""
    msg = str(err)
    if "unauthorized" in msg or "HTTP 401" in msg:
        hint = unauthorized_hint
    elif "rate limited" in msg or "HTTP 429" in msg:
        hint = "You're being rate-limited right now — wait a minute and re-run."
    elif "forbidden" in msg or "HTTP 403" in msg:
        hint = (
            "Your token authenticated but access was refused — most often "
            "exhausted API credits. Check Billing -> Credits in the X "
            "developer console."
        )
    else:
        hint = "Check your internet connection and try again."
    return f"FAILED: {msg}\n{hint}"


def _run_noninteractive(
    source: str, store: CredentialStore, probe
) -> tuple[str, int]:
    """The classic guide / partial / verify plan over resolved (env ->
    keychain) credentials — what a pipe, CI job, or `--verify` gets.
    Verify mode live-probes and exits by the probe result; X announces its
    cost up front but cannot confirm interactively (setup.rs:662-686)."""
    creds = sec.Credentials.load(store)
    slots = CRED_SLOTS[source]
    values = [getattr(creds, attr) for _, attr in slots]
    label = LABELS[source]
    mode = plan(
        values[0] is not None,
        values[-1] is not None if len(values) > 1 else values[0] is not None,
    )
    if mode == "guide":
        extra = (
            f"\nSet {slots[0][0]} (or run `openintel setup {source}` in a "
            "terminal), then re-run."
            if len(slots) == 1
            else "\nnon-interactive session: export the env vars above, or "
            "re-run `openintel setup` in a terminal for the guided flow."
        )
        env_state = "\n".join(
            f"  {env}: {'set' if v else 'unset'}"
            for (env, _), v in zip(slots, values)
        )
        return f"{GUIDES[source]}\n\n{env_state}{extra}\n", 1
    if mode == "missing_first":
        return partial_text(label, slots[0][0]) + "\n", 1
    if mode == "missing_second":
        return partial_text(label, slots[1][0]) + "\n", 1
    cost = " (reads up to 10 posts ~ $0.05)" if source == "x" else ""
    prefix = f"Checking your {label} credentials...{cost}\n"
    try:
        count = asyncio.run(probe(*values))
    except Exception as e:  # noqa: BLE001 — rendered with a per-cause hint
        return (
            prefix + verify_err_text(e, UNAUTHORIZED_HINTS[source]) + "\n",
            1,
        )
    return (
        prefix + verify_ok_text(label, count or 0, TRY_CMDS[source]) + "\n",
        0,
    )


def run_setup(
    source: str,
    *,
    forget: bool = False,
    verify: bool = False,
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

    if verify or not io.is_tty():
        # Non-interactive plan: guide / partial / verify by which credentials
        # resolve (env -> keychain), per setup.rs:36-43. `--verify` forces
        # this path even on a TTY so CI and scripts probe deterministically.
        return _run_noninteractive(source, store, probe)

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

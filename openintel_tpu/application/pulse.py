"""The pulse use case: cost-accounted catalyst feed from high-impact accounts.

Money-safety semantics (reference: src/application/pulse.rs:25-125):
- handle/keyword charset whitelists; all-invalid input errors rather than
  silently falling back (never spend money on accounts the user didn't choose);
- clamps hours to [1, 167] and limit to [1, 100];
- default macro account list only when no accounts were given at all;
- cost = posts_returned x $0.005 (what X bills, not what we kept).
"""

from __future__ import annotations

import datetime as dt
from typing import Sequence

from openintel_tpu.domain.entities import PulseReport, Ticker
from openintel_tpu.domain.ports import InfluencerFeed
from openintel_tpu.errors import SourceFailure

X_COST_PER_READ_USD = 0.005

DEFAULT_PULSE_ACCOUNTS = (
    "realDonaldTrump",
    "WhiteHouse",
    "elonmusk",
    "federalreserve",
)

# X recent search covers 7 days; cap below the boundary so start_time never
# lands outside the window mid-flight.
MAX_HOURS_BACK = 167
MAX_PULSE_LIMIT = 100


def _is_valid_handle(a: str) -> bool:
    """X username charset: letters, digits, underscore, max 15 chars."""
    return 0 < len(a) <= 15 and all(c.isascii() and (c.isalnum() or c == "_") for c in a)


def _is_valid_keyword(k: str) -> bool:
    """Letters, digits, spaces, underscore, hyphen, dot, max 30 chars. No
    double-quote — the adapter wraps keywords in "…" as a literal phrase."""
    return 0 < len(k) <= 30 and all(
        c.isascii() and (c.isalnum() or c in " _-.") for c in k
    )


def normalize_accounts(raw: Sequence[str]) -> list[str]:
    """Trim, strip a leading '@', drop invalid handles; empty raw input -> the
    default macro list. Non-empty raw with zero valid handles errors."""
    if not raw:
        return list(DEFAULT_PULSE_ACCOUNTS)
    cleaned = [a.strip().lstrip("@") for a in raw]
    cleaned = [a for a in cleaned if _is_valid_handle(a)]
    if not cleaned:
        raise SourceFailure(
            name="x",
            message=(
                f"no valid X handles in {list(raw)!r} "
                "(letters, digits, underscore, max 15 chars)"
            ),
        )
    return cleaned


def normalize_keywords(raw: Sequence[str]) -> list[str]:
    """Trim keywords, drop invalid; empty raw -> [] (keywords are optional).
    Non-empty raw with zero valid keywords errors."""
    if not raw:
        return []
    cleaned = [k.strip() for k in raw]
    cleaned = [k for k in cleaned if _is_valid_keyword(k)]
    if not cleaned:
        raise SourceFailure(
            name="x",
            message=(
                f"no valid keywords in {list(raw)!r} "
                "(letters, digits, spaces, _ . -, max 30 chars)"
            ),
        )
    return cleaned


async def pulse(
    ticker_raw: str,
    accounts_raw: Sequence[str],
    keywords_raw: Sequence[str],
    hours_back: int,
    limit: int,
    feed: InfluencerFeed,
    now: dt.datetime,
) -> PulseReport:
    ticker = Ticker.parse(ticker_raw)
    accounts = normalize_accounts(accounts_raw)
    keywords = normalize_keywords(keywords_raw)
    hours_back = min(max(hours_back, 1), MAX_HOURS_BACK)
    limit = min(max(limit, 1), MAX_PULSE_LIMIT)
    fetch = await feed.pulse(ticker, accounts, keywords, hours_back, limit)
    return PulseReport(
        ticker=ticker.as_str(),
        accounts=accounts,
        keywords=keywords,
        hours_back=hours_back,
        posts=fetch.posts,
        posts_read=fetch.posts_returned,
        estimated_cost_usd=float(fetch.posts_returned) * X_COST_PER_READ_USD,
        generated_at=now,
    )

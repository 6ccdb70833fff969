"""Domain error hierarchy.

Capability parity with the reference's six-variant ``DomainError``
(reference: src/domain/error.rs:4-22). Each exception renders a clean,
user-facing message; the application layer converts per-source failures into
report notes instead of crashes (reference: src/application/analyze.rs:40-45).
"""

from __future__ import annotations


class DomainError(Exception):
    """Base class for all domain-level failures."""


class InvalidTicker(DomainError):
    def __init__(self, raw: str) -> None:
        super().__init__(f"invalid ticker: {raw}")
        self.raw = raw


class InvalidPostText(DomainError):
    def __init__(self, reason: str) -> None:
        super().__init__(f"invalid post text: {reason}")
        self.reason = reason


class AnalyzerMismatch(DomainError):
    """Analyzer returned a signal list whose length differs from the post list."""

    def __init__(self, expected: int, got: int) -> None:
        super().__init__(f"analyzer returned {got} signals for {expected} posts")
        self.expected = expected
        self.got = got


class MarketTickerMismatch(DomainError):
    def __init__(self, expected: str, got: str) -> None:
        super().__init__(f"market snapshot is for {got}, expected {expected}")
        self.expected = expected
        self.got = got


class SourceFailure(DomainError):
    """A named data source failed; carries the source name for note rendering."""

    def __init__(self, name: str, message: str) -> None:
        super().__init__(f"{name}: {message}")
        self.name = name
        self.message = message


class NoData(DomainError):
    """Every enabled source returned nothing and no market snapshot is available."""

    def __init__(self) -> None:
        super().__init__(
            "no data: every enabled source returned nothing and market data is unavailable"
        )

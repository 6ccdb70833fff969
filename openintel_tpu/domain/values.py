"""Value objects: clamped scalars, enums, per-post signals, OHLC bars.

Parity targets (reference file:line):
- Polarity clamps to [-1, 1], NaN -> 0 (src/domain/values/polarity.rs:8-14)
- SpeculationIndex clamps to [0, 1], NaN -> 0 (src/domain/values/speculation.rs:8-14)
- Confidence::from_sample bucketing, reversed-threshold tolerant
  (src/domain/values/speculation.rs:32-41)
- Alignment enum (src/domain/values/speculation.rs:46-51)
- PostSignal {polarity, speculative} (src/domain/values/post_signal.rs:4-7)
- SourceKind {Reddit, Bluesky} with canonical ALL (src/domain/values/source_kind.rs:5-21)
- Bar {high, low, close} (src/domain/values/bar.rs:2-7)
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass


def _clamp(value: float, lo: float, hi: float) -> float:
    if math.isnan(value):
        return 0.0
    return min(max(value, lo), hi)


@dataclass(frozen=True)
class Polarity:
    """Per-post or aggregate sentiment in [-1, 1]; NaN collapses to 0."""

    value: float

    def __post_init__(self) -> None:
        object.__setattr__(self, "value", _clamp(float(self.value), -1.0, 1.0))


@dataclass(frozen=True)
class SpeculationIndex:
    """Share of speculative posts in [0, 1]; NaN collapses to 0."""

    value: float

    def __post_init__(self) -> None:
        object.__setattr__(self, "value", _clamp(float(self.value), 0.0, 1.0))


class Confidence(str, enum.Enum):
    LOW = "low"
    MEDIUM = "medium"
    HIGH = "high"

    @staticmethod
    def from_sample(n: int, low: int, high: int) -> "Confidence":
        """``n < low`` -> LOW, ``low <= n < high`` -> MEDIUM, ``n >= high`` -> HIGH.

        Tolerates reversed thresholds by normalising them first
        (reference: src/domain/values/speculation.rs:32-41).
        """
        low, high = min(low, high), max(low, high)
        if n < low:
            return Confidence.LOW
        if n < high:
            return Confidence.MEDIUM
        return Confidence.HIGH


class Alignment(str, enum.Enum):
    CONFIRMING_BULLISH = "confirming_bullish"
    CONFIRMING_BEARISH = "confirming_bearish"
    DIVERGING = "diverging"
    QUIET = "quiet"


class SourceKind(str, enum.Enum):
    REDDIT = "reddit"
    BLUESKY = "bluesky"


# Canonical "all sources" set (reference: src/domain/values/source_kind.rs:15-21).
ALL_SOURCES: tuple[SourceKind, ...] = (SourceKind.REDDIT, SourceKind.BLUESKY)


@dataclass(frozen=True)
class PostSignal:
    """One analyzer verdict per post, order-aligned with the post list."""

    polarity: Polarity
    speculative: bool

    @staticmethod
    def of(polarity: float, speculative: bool) -> "PostSignal":
        return PostSignal(Polarity(polarity), speculative)


@dataclass(frozen=True)
class Bar:
    """A single OHLC-ish bar; only the fields ATR needs."""

    high: float
    low: float
    close: float

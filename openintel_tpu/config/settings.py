"""CLI-level configuration (reference: src/config/settings.rs:20-49).

No source flags -> ALL sources enabled; market on unless --no-market; embeds
the default EngineConfig.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from openintel_tpu.domain.engine import EngineConfig
from openintel_tpu.domain.values import ALL_SOURCES, SourceKind


class OutputFormat(str, enum.Enum):
    TABLE = "table"
    JSON = "json"


@dataclass
class AppConfig:
    ticker: str
    enabled_sources: tuple[SourceKind, ...]
    market_enabled: bool
    limit: int
    format: OutputFormat
    engine: EngineConfig = field(default_factory=EngineConfig)

    @staticmethod
    def new(
        ticker: str,
        reddit: bool,
        bluesky: bool,
        no_market: bool,
        limit: int,
        format: OutputFormat,
    ) -> "AppConfig":
        enabled: list[SourceKind] = []
        if reddit:
            enabled.append(SourceKind.REDDIT)
        if bluesky:
            enabled.append(SourceKind.BLUESKY)
        if not enabled:
            enabled = list(ALL_SOURCES)
        return AppConfig(
            ticker=ticker,
            enabled_sources=tuple(enabled),
            market_enabled=not no_market,
            limit=limit,
            format=format,
        )

"""Presentation-free input DTO for the analysis use case
(reference: src/application/request.rs:8-14)."""

from __future__ import annotations

from dataclasses import dataclass, field

from openintel_tpu.domain.engine import EngineConfig
from openintel_tpu.domain.values import ALL_SOURCES, SourceKind


@dataclass
class AnalysisRequest:
    ticker: str
    enabled_sources: tuple[SourceKind, ...] = ALL_SOURCES
    market_enabled: bool = True
    limit: int = 50
    engine: EngineConfig = field(default_factory=EngineConfig)

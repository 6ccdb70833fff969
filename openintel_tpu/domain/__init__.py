"""Pure domain core: entities, value objects, fusion engine, risk math.

Deterministic and IO-free — the clock is always injected
(reference: src/domain/engine/speculation_engine.rs:21-28, src/domain/risk.rs:78).
"""

from openintel_tpu.domain.values import (  # noqa: F401
    Alignment,
    Bar,
    Confidence,
    Polarity,
    PostSignal,
    SourceKind,
    SpeculationIndex,
)
from openintel_tpu.domain.entities import (  # noqa: F401
    MarketSnapshot,
    PostText,
    PulseFetch,
    PulsePost,
    PulseReport,
    SocialPost,
    Ticker,
)
from openintel_tpu.domain.engine import EngineConfig, SpeculationEngine  # noqa: F401

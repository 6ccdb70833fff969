"""Use-case layer: orchestrates ports, owns graceful degradation.

DISCLAIMER is the single source of truth appended to every analysis-bearing
output (reference: src/application/mod.rs:9-12).
"""

DISCLAIMER = (
    "Not financial advice. OpenIntel is a research/screening tool; markets are "
    "risky and social data is easily manipulated. Do your own diligence."
)

from openintel_tpu.application.analyze import analyze  # noqa: E402,F401
from openintel_tpu.application.request import AnalysisRequest  # noqa: E402,F401

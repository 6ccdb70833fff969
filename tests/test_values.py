"""Value-object parity tests (reference: src/domain/values/*.rs colocated tests)."""

import math

from openintel_tpu.domain.values import (
    ALL_SOURCES,
    Alignment,
    Confidence,
    Polarity,
    SourceKind,
    SpeculationIndex,
)


def test_polarity_clamps_out_of_range():
    assert Polarity(5.0).value == 1.0
    assert Polarity(-5.0).value == -1.0
    assert Polarity(0.3).value == 0.3


def test_polarity_nan_becomes_zero():
    assert Polarity(math.nan).value == 0.0


def test_speculation_index_clamps():
    assert SpeculationIndex(1.5).value == 1.0
    assert SpeculationIndex(-0.2).value == 0.0
    assert SpeculationIndex(0.5).value == 0.5
    assert SpeculationIndex(math.nan).value == 0.0


def test_confidence_buckets():
    assert Confidence.from_sample(5, 10, 50) is Confidence.LOW
    assert Confidence.from_sample(10, 10, 50) is Confidence.MEDIUM
    assert Confidence.from_sample(49, 10, 50) is Confidence.MEDIUM
    assert Confidence.from_sample(50, 10, 50) is Confidence.HIGH


def test_confidence_reversed_thresholds_match_ordered():
    assert Confidence.from_sample(30, 50, 10) == Confidence.from_sample(30, 10, 50)


def test_enum_serialization_values():
    assert Confidence.LOW.value == "low"
    assert Alignment.CONFIRMING_BULLISH.value == "confirming_bullish"
    assert Alignment.QUIET.value == "quiet"
    assert SourceKind.REDDIT.value == "reddit"
    assert ALL_SOURCES == (SourceKind.REDDIT, SourceKind.BLUESKY)

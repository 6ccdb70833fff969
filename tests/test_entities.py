"""Entity newtype parity tests (reference: src/domain/entities/*.rs colocated tests)."""

import pytest

from openintel_tpu.domain.entities import PostText, Ticker
from openintel_tpu.errors import InvalidPostText, InvalidTicker


def test_ticker_accepts_valid_symbols():
    assert Ticker.parse("aapl").as_str() == "AAPL"
    assert Ticker.parse("BRK.B").as_str() == "BRK.B"
    assert Ticker.parse("  msft ").as_str() == "MSFT"


@pytest.mark.parametrize(
    "bad", ["", "   ", "TOOLONG", "A1", "AB.CD", "AAPL.", "$AAPL", "ß", "ﬁ"]
)
def test_ticker_rejects_invalid_symbols(bad):
    with pytest.raises(InvalidTicker):
        Ticker.parse(bad)


def test_post_text_trims_and_rejects_empty():
    assert PostText.parse("  hello  ").as_str() == "hello"
    with pytest.raises(InvalidPostText):
        PostText.parse("   ")
    with pytest.raises(InvalidPostText):
        PostText.parse("x" * 10_001)


def test_post_text_length_limit_counts_chars_not_bytes():
    # 10,000 two-byte chars = 20,000 bytes but exactly 10,000 chars -> accepted.
    assert PostText.parse("é" * 10_000)
    with pytest.raises(InvalidPostText):
        PostText.parse("é" * 10_001)

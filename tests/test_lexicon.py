"""Lexicon analyzer parity (reference: src/adapters/analyzer/lexicon.rs tests)
plus tokenizer semantics."""

import asyncio
import datetime as dt

import numpy as np

from openintel_tpu.domain.entities import PostText, SocialPost
from openintel_tpu.domain.values import SourceKind
from openintel_tpu.models.lexicon import score_texts
from openintel_tpu.ops.tokenizer import Vocab, encode_padded, tokenize

NOW = dt.datetime(2026, 6, 24, tzinfo=dt.timezone.utc)


def post(text: str) -> SocialPost:
    return SocialPost(
        id="1",
        source=SourceKind.REDDIT,
        author="a",
        text=PostText.parse(text),
        created_at=NOW,
        engagement=0,
    )


def test_tokenize_matches_reference_semantics():
    # lowercase, split on non-ASCII-alphanumeric, drop empties.
    assert tokenize("AAPL to the MOON!!") == ["aapl", "to", "the", "moon"]
    assert tokenize("0dte-YOLO_calls") == ["0dte", "yolo", "calls"]
    assert tokenize("") == []
    assert tokenize("éclair café") == ["clair", "caf"]  # non-ASCII separates
    assert tokenize("$TSLA") == ["tsla"]


def test_scores_sentiment_and_speculation():
    signals = score_texts(
        [
            "to the moon, buying calls",  # bullish + speculative
            "this will dump, buying puts",  # bearish + speculative
            "the company released a quarterly report",  # neutral, no jargon
        ]
    )
    assert len(signals) == 3
    assert signals[0].polarity.value > 0.0 and signals[0].speculative
    assert signals[1].polarity.value < 0.0 and signals[1].speculative
    assert signals[2].polarity.value == 0.0 and not signals[2].speculative


def test_fixture_corpus_signals_are_the_reference_goldens():
    """BASELINE.md: fixture signals are +1,+1,+1,-1,+1,-1,+1,+1,0,+1."""
    from openintel_tpu.sources.fixtures import bluesky_fixture, reddit_fixture
    from openintel_tpu.domain.entities import Ticker

    async def fetch_all():
        posts = await reddit_fixture().fetch(Ticker.parse("AAPL"), 50)
        posts += await bluesky_fixture().fetch(Ticker.parse("AAPL"), 50)
        return posts

    posts = asyncio.run(fetch_all())
    signals = score_texts([p.text.as_str() for p in posts])
    polarities = [s.polarity.value for s in signals]
    assert polarities == [1.0, 1.0, 1.0, -1.0, 1.0, -1.0, 1.0, 1.0, 0.0, 1.0]
    assert [s.speculative for s in signals] == [
        True, False, False, True, False, False, False, True, False, False,
    ]


def test_analyzer_port_is_order_aligned():
    from openintel_tpu.models.lexicon import LexiconAnalyzer

    posts = [post("moon"), post("crash"), post("nothing")]
    signals = asyncio.run(LexiconAnalyzer().analyze(posts))
    assert len(signals) == len(posts)
    assert signals[0].polarity.value == 1.0
    assert signals[1].polarity.value == -1.0
    assert signals[2].polarity.value == 0.0


def test_encode_padded_shapes_and_mask():
    v = Vocab.build([["a", "b"], ["c"]])
    ids, mask = encode_padded([["a", "b", "zzz"], ["c"]], v)
    assert ids.shape == mask.shape
    assert ids.shape[1] % 128 == 0
    assert mask[0, :3].all() and not mask[0, 3:].any()
    assert ids[0, 2] == 0  # unknown token -> PAD_ID but still valid
    assert mask[0, 2]
    np.testing.assert_array_equal(ids[1, :1], [v.token_to_id["c"]])


def test_numpy_and_device_scorers_identical():
    import numpy as np
    from openintel_tpu.models.lexicon import (
        _LEX_FLAGS,
        _LEX_VOCAB,
        score_token_ids,
        score_token_ids_np,
    )
    from openintel_tpu.ops.tokenizer import encode_padded, tokenize_batch

    texts = [
        "moon calls rally", "dump puts crash", "neutral words only",
        "bull bear", "squeeze yolo 0dte", "",
    ]
    texts = [t or "x" for t in texts]
    ids, mask = encode_padded(tokenize_batch(texts), _LEX_VOCAB)
    p_np, s_np = score_token_ids_np(ids, mask, _LEX_FLAGS)
    p_dev, s_dev = score_token_ids(ids, mask, _LEX_FLAGS)
    np.testing.assert_allclose(p_np, np.asarray(p_dev), atol=1e-7)
    np.testing.assert_array_equal(s_np, np.asarray(s_dev))

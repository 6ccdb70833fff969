"""Neural PostAnalyzer: distillation fidelity vs the lexicon teacher, port
contract, checkpoint roundtrip, CLI integration (hermetic CPU)."""

import asyncio

import numpy as np

from openintel_tpu.models.encoder import EncoderConfig
from openintel_tpu.models.lexicon import score_texts as lexicon_score
from openintel_tpu.models.neural_analyzer import (
    load_analyzer,
    save_analyzer,
    train_neural_analyzer,
)

CFG = EncoderConfig(vocab_size=512, dim=32, depth=1, heads=2, max_len=16)
TEXTS = [
    "moon rocket calls yolo tendies",
    "breakout rally bull momentum calls",
    "crash dump bearish puts drill",
    "sell off bagholder rug short",
    "earnings report scheduled tuesday",
    "market update regular filing",
] * 2


def test_distillation_matches_lexicon_polarity_sign():
    an, losses = train_neural_analyzer(TEXTS, CFG, steps=80, lr=5e-3, seed=3)
    assert losses[-1] < losses[0]
    teacher = lexicon_score(TEXTS[:6])
    student = an.score_texts(TEXTS[:6])
    agree = sum(
        1
        for t, s in zip(teacher, student)
        if np.sign(t.polarity.value) == np.sign(round(s.polarity.value, 1))
        or abs(t.polarity.value) < 0.1
    )
    assert agree >= 4  # small head + tiny corpus: directional fidelity


def test_port_contract_and_roundtrip(tmp_path):
    from openintel_tpu.domain.entities import PostText, SocialPost
    from openintel_tpu.domain.values import SourceKind
    import datetime as dt

    an, _ = train_neural_analyzer(TEXTS, CFG, steps=5, seed=4)
    save_analyzer(an, tmp_path)
    an2 = load_analyzer(tmp_path)
    posts = [
        SocialPost(
            id="1",
            source=SourceKind.REDDIT,
            author="tester",
            text=PostText.parse("moon rocket calls"),
            created_at=dt.datetime.now(dt.timezone.utc),
            engagement=1,
        )
    ]
    sigs = asyncio.run(an2.analyze(posts))
    assert len(sigs) == 1 and -1.0 <= sigs[0].polarity.value <= 1.0
    # determinism across save/load
    s1 = an.score_texts(["moon rocket calls"])[0]
    s2 = an2.score_texts(["moon rocket calls"])[0]
    assert abs(s1.polarity.value - s2.polarity.value) < 1e-6


def test_analyze_use_case_accepts_neural_analyzer():
    from openintel_tpu.application.analyze import analyze
    from openintel_tpu.application.request import AnalysisRequest
    from openintel_tpu.domain.values import SourceKind
    from openintel_tpu.sources.fixtures import MockMarketSource, fixture_social

    an, _ = train_neural_analyzer(TEXTS, CFG, steps=5, seed=5)
    req = AnalysisRequest(ticker="AAPL")
    report = asyncio.run(
        analyze(req, fixture_social(), MockMarketSource(), analyzer=an)
    )
    assert report.social.total_mentions == 10  # 10 fixture posts scored

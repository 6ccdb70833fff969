"""SpeculationEngine: pure fusion of social signals and market action.

The engine never does IO and the clock is a parameter — this is the invariant
the whole framework preserves (reference: src/domain/engine/speculation_engine.rs:21-28).

Parity targets (reference file:line):
- aggregate: length/ticker validation then summary+fusion
  (src/domain/engine/speculation_engine.rs:21-68)
- social_summary: net sentiment = mean polarity; bull/bear/neutral at +-tau;
  speculation index = speculative share (:70-125)
- market_summary: pct_change with zero-guard, rvol with zero-guard (:127-149)
- crowding: weight-renormalised blend of spec-index / rvol-norm / iv-rank,
  clamped to [0, 1] (:151-176)
- alignment: Confirming/Diverging/Quiet via sigma, delta and min-sample gates (:178-208)
- EngineConfig defaults: tau=0.2, sigma=0.05, delta=1.0%, weights 0.5/0.3/0.2,
  rvol_cap=3.0, min_sample=10, confidence 10/50 (src/domain/engine/config.rs:18-33)

A vectorised, jittable batch variant for device-side multi-ticker scans lives in
:mod:`openintel_tpu.domain.engine_batch`.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Optional, Sequence

from openintel_tpu.errors import AnalyzerMismatch, MarketTickerMismatch
from openintel_tpu.domain.entities import (
    FusionSignals,
    MarketSnapshot,
    MarketSummary,
    SocialPost,
    SocialSummary,
    SpeculationReport,
    Ticker,
)
from openintel_tpu.domain.values import (
    Alignment,
    Confidence,
    Polarity,
    PostSignal,
    SpeculationIndex,
)


@dataclass(frozen=True)
class EngineConfig:
    """All engine thresholds and weights, named and defaulted.

    Every threshold is a named, defaulted, tested field — the reference's config
    discipline (src/domain/engine/config.rs:18-33).
    """

    bull_bear_threshold: float = 0.2  # tau — per-post bull/bear classification
    net_sentiment_threshold: float = 0.05  # sigma — aggregate sentiment gate
    price_move_threshold: float = 1.0  # delta — min |pct_change| (percent)
    crowding_weight_spec: float = 0.5
    crowding_weight_rvol: float = 0.3
    crowding_weight_iv: float = 0.2
    rvol_cap: float = 3.0
    min_sample: int = 10
    confidence_low: int = 10
    confidence_high: int = 50


class SpeculationEngine:
    """Pure fusion: posts + signals + optional market snapshot -> report."""

    @staticmethod
    def aggregate(
        ticker: Ticker,
        posts: Sequence[SocialPost],
        signals: Sequence[PostSignal],
        market: Optional[MarketSnapshot],
        now: dt.datetime,
        cfg: EngineConfig,
    ) -> SpeculationReport:
        if len(signals) != len(posts):
            raise AnalyzerMismatch(expected=len(posts), got=len(signals))
        if market is not None and market.ticker.as_str() != ticker.as_str():
            raise MarketTickerMismatch(
                expected=ticker.as_str(), got=market.ticker.as_str()
            )

        notes: list[str] = []
        social = SpeculationEngine.social_summary(posts, signals, cfg)
        market_summary = (
            SpeculationEngine.market_summary(market, notes) if market is not None else None
        )
        crowding = SpeculationEngine.crowding(social, market_summary, cfg)
        alignment = SpeculationEngine.alignment(social, market_summary, cfg, notes)
        confidence = Confidence.from_sample(
            social.total_mentions, cfg.confidence_low, cfg.confidence_high
        )
        return SpeculationReport(
            ticker=ticker,
            generated_at=now,
            social=social,
            market=market_summary,
            fusion=FusionSignals(alignment=alignment, crowding=crowding, notes=notes),
            social_confidence=confidence,
        )

    @staticmethod
    def social_summary(
        posts: Sequence[SocialPost],
        signals: Sequence[PostSignal],
        cfg: EngineConfig,
    ) -> SocialSummary:
        total = len(posts)
        by_source: dict[str, int] = {}
        for p in posts:
            by_source[p.source.value] = by_source.get(p.source.value, 0) + 1

        bullish = bearish = neutral = spec_count = 0
        polarity_sum = 0.0
        for s in signals:
            v = s.polarity.value
            polarity_sum += v
            if v > cfg.bull_bear_threshold:
                bullish += 1
            elif v < -cfg.bull_bear_threshold:
                bearish += 1
            else:
                neutral += 1
            if s.speculative:
                spec_count += 1

        net = polarity_sum / total if total else 0.0
        spec_index = spec_count / total if total else 0.0
        bull_bear_ratio = None if bearish == 0 else bullish / bearish
        return SocialSummary(
            total_mentions=total,
            mentions_by_source=by_source,
            net_sentiment=Polarity(net),
            bullish=bullish,
            bearish=bearish,
            neutral=neutral,
            bull_bear_ratio=bull_bear_ratio,
            speculation_index=SpeculationIndex(spec_index),
        )

    @staticmethod
    def market_summary(m: MarketSnapshot, notes: list[str]) -> MarketSummary:
        if m.previous_close == 0.0:
            notes.append("previous_close is 0; pct_change set to 0")
            pct_change = 0.0
        else:
            pct_change = (m.last_price - m.previous_close) / m.previous_close * 100.0
        if m.avg_volume == 0:
            notes.append("avg_volume is 0; rvol unavailable")
            rvol = None
        else:
            rvol = m.volume / m.avg_volume
        return MarketSummary(
            last_price=m.last_price,
            pct_change=pct_change,
            rvol=rvol,
            realized_vol=m.realized_vol,
            put_call_ratio=m.put_call_ratio,
            iv_rank=m.iv_rank,
        )

    @staticmethod
    def crowding(
        social: SocialSummary,
        market: Optional[MarketSummary],
        cfg: EngineConfig,
    ) -> float:
        """Weighted blend of the *available* components, renormalised over the
        weights actually present — a missing component never deflates the score."""
        weighted = 0.0
        weight_sum = 0.0
        if social.total_mentions > 0:
            weighted += cfg.crowding_weight_spec * social.speculation_index.value
            weight_sum += cfg.crowding_weight_spec
        if market is not None:
            if market.rvol is not None:
                rvol_norm = min(max(market.rvol / cfg.rvol_cap, 0.0), 1.0)
                weighted += cfg.crowding_weight_rvol * rvol_norm
                weight_sum += cfg.crowding_weight_rvol
            if market.iv_rank is not None:
                weighted += cfg.crowding_weight_iv * min(max(market.iv_rank, 0.0), 1.0)
                weight_sum += cfg.crowding_weight_iv
        if weight_sum == 0.0:
            return 0.0
        return min(max(weighted / weight_sum, 0.0), 1.0)

    @staticmethod
    def alignment(
        social: SocialSummary,
        market: Optional[MarketSummary],
        cfg: EngineConfig,
        notes: list[str],
    ) -> Alignment:
        if market is None:
            notes.append("social-only, no price reference")
            return Alignment.QUIET
        if social.total_mentions < cfg.min_sample:
            return Alignment.QUIET
        s = social.net_sentiment.value
        p = market.pct_change
        if abs(s) < cfg.net_sentiment_threshold or abs(p) < cfg.price_move_threshold:
            return Alignment.QUIET
        if s > 0.0 and p > 0.0:
            return Alignment.CONFIRMING_BULLISH
        if s < 0.0 and p < 0.0:
            return Alignment.CONFIRMING_BEARISH
        return Alignment.DIVERGING

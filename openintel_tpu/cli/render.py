"""Rendering: leaf modules return strings; only main() prints
(reference discipline: src/cli/pulse.rs:1-2, src/main.rs:38-41).

Table layout mirrors the reference renderer (src/cli/run.rs:48-115): SOCIAL /
MARKET / FUSION sections, the market "disabled" vs "unavailable" distinction,
and the disclaimer on every analysis-bearing output.
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Any

from openintel_tpu.application import DISCLAIMER
from openintel_tpu.domain.entities import PulseReport, SpeculationReport
from openintel_tpu.domain.risk import RiskFrame


def render_report_json(report: SpeculationReport) -> str:
    envelope = report.to_dict()
    envelope["disclaimer"] = DISCLAIMER
    return json.dumps(envelope, indent=2)


def render_report_table(report: SpeculationReport) -> str:
    s = report.social
    lines = [
        f"=== OpenIntel — {report.ticker.as_str()} ===",
        f"generated: {report.generated_at.isoformat()}",
        f"confidence (social sample): {report.social_confidence.value}",
        "",
        "SOCIAL",
        (
            f"  mentions: {s.total_mentions} (bull {s.bullish} / "
            f"bear {s.bearish} / neutral {s.neutral})"
        ),
        f"  net sentiment: {s.net_sentiment.value:+.2f}",
        f"  speculation index: {s.speculation_index.value * 100:.0f}%",
    ]
    if s.bull_bear_ratio is not None:
        lines.append(f"  bull/bear ratio: {s.bull_bear_ratio:.2f}")
    else:
        lines.append("  bull/bear ratio: n/a (no bearish posts)")

    lines.append("")
    lines.append("MARKET")
    if report.market is not None:
        m = report.market
        rvol = f"{m.rvol:.2f}x" if m.rvol is not None else "n/a"
        lines.append(
            f"  last: {m.last_price:.2f}  change: {m.pct_change:+.2f}%  rvol: {rvol}"
        )
    else:
        failed = any("market source failed" in n for n in report.fusion.notes)
        lines.append(
            "  (unavailable — fetch failed; see notes)" if failed else "  (disabled)"
        )

    lines += [
        "",
        "FUSION",
        f"  alignment: {report.fusion.alignment.value}",
        f"  crowding: {report.fusion.crowding * 100:.0f}%",
    ]
    for note in report.fusion.notes:
        lines.append(f"  note: {note}")
    lines += ["", DISCLAIMER]
    return "\n".join(lines) + "\n"


def _age_bucket(created_at: dt.datetime, now: dt.datetime) -> str:
    """45m / 3h / 3d ago buckets (reference: src/cli/pulse.rs:62-71)."""
    delta = now - created_at
    minutes = int(delta.total_seconds() // 60)
    if minutes < 60:
        return f"{max(minutes, 0)}m ago"
    hours = minutes // 60
    if hours < 24:
        return f"{hours}h ago"
    return f"{hours // 24}d ago"


def render_pulse_table(report: PulseReport, now: dt.datetime) -> str:
    lines = [
        f"=== X Pulse — {report.ticker} (last {report.hours_back}h) ===",
        f"accounts: {', '.join(report.accounts)}",
    ]
    if report.keywords:
        lines.append(f"keywords: {', '.join(report.keywords)}")
    lines.append("")
    if not report.posts:
        lines.append("no posts in window")
    for p in report.posts:
        lines.append(f"@{p.author} · {_age_bucket(p.created_at, now)} · ♥{p.engagement}")
        lines.append(f"  {p.text.as_str()}")
    lines += [
        "",
        (
            f"posts shown: {len(report.posts)} · posts billed: {report.posts_read} "
            f"≈ ${report.estimated_cost_usd:.2f}"
        ),
        "",
        DISCLAIMER,
    ]
    return "\n".join(lines) + "\n"


def render_pulse_json(report: PulseReport) -> str:
    envelope = report.to_dict()
    envelope["disclaimer"] = DISCLAIMER
    return json.dumps(envelope, indent=2)


def render_risk_table(frame: RiskFrame) -> str:
    lines = [
        f"=== Risk frame — {frame.ticker} ({frame.direction}) ===",
        "a calculator, not advice — it never recommends taking a trade",
        "",
        f"entry: {frame.entry:.2f}",
        f"ATR(14): {frame.atr:.2f}  stop multiple: {frame.stop_multiple:.1f}",
        f"stop: {frame.stop:.2f}  risk/share: {frame.risk_per_share:.2f}",
        f"shares: {frame.shares}  notional: ${frame.notional_usd:.2f}",
        f"max loss: ${frame.max_loss_usd:.2f} (budget ${frame.budget_usd:.2f})",
        (
            f"targets: 1R {frame.targets[0]:.2f} · 2R {frame.targets[1]:.2f} · "
            f"3R {frame.targets[2]:.2f}"
        ),
        f"bars used: {frame.bars_used}",
    ]
    if frame.note:
        lines.append(f"note: {frame.note}")
    lines += ["", DISCLAIMER]
    return "\n".join(lines) + "\n"


def render_risk_json(frame: RiskFrame) -> str:
    envelope = frame.to_dict()
    envelope["framing"] = (
        "risk_frame is a calculator, not advice — it never recommends taking a trade."
    )
    envelope["disclaimer"] = DISCLAIMER
    return json.dumps(envelope, indent=2)


def render_json(payload: dict[str, Any]) -> str:
    return json.dumps(payload, indent=2)

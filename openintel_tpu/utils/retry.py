"""Transient-backend-failure classification and bounded retry.

One home for the knowledge of what a remote-TPU tunnel flap looks like
(bench.py and scripts/bench_int4_ab.py both retry on it; two copies of the
substring list would drift — the same argument as the shared
``dense_arm_topk`` kernel dispatcher). See docs/specs/serving-resilience.md.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

#: Substrings that mark a transient transport/tunnel failure (observed live:
#: UNAVAILABLE 'Connection refused' from the remote-compile endpoint minutes
#: into an otherwise healthy run). Anything else re-raises immediately.
TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "Connection refused",
    "Connection Failed",
    "DEADLINE_EXCEEDED",
    "transport:",
)


def is_transient_backend_error(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(marker in msg for marker in TRANSIENT_MARKERS)


def run_with_transient_retry(
    fn: Callable[[], object],
    *,
    backoff_s: float = 120.0,
    log: Optional[Callable[[str], None]] = None,
):
    """Run ``fn``; on ONE transient backend failure, back off and rerun.

    A tunnel flap costs a delay instead of the artifact; a hard outage
    still fails loudly on the second attempt, and non-transient errors
    propagate immediately."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 — classified, re-raised if real
        if not is_transient_backend_error(e):
            raise
        if log is not None:
            log(
                "transient backend failure, retrying once in "
                f"{backoff_s:.0f}s: {type(e).__name__}: {str(e)[:300]}"
            )
        time.sleep(backoff_s)
        return fn()

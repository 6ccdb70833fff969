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
#: into an otherwise healthy run). Markers are anchored to the gRPC status
#: formats PJRT surfaces ("UNAVAILABLE: ...", "transport: Error while
#: dialing: ..."), and only checked on backend/runtime exception TYPES —
#: an unrelated ValueError that merely mentions one of these words must
#: not eat a 120 s backoff before the real failure surfaces.
TRANSIENT_MARKERS = (
    "UNAVAILABLE: ",
    "DEADLINE_EXCEEDED: ",
    "Connection refused",
    "Connection Failed",
    "transport: ",
)

#: Exception type names raised by the jax/PJRT dispatch path on tunnel
#: flaps (XlaRuntimeError is jaxlib's; RuntimeError covers older wrappers).
_BACKEND_EXC_NAMES = frozenset({"XlaRuntimeError", "RuntimeError"})


def is_transient_backend_error(exc: BaseException) -> bool:
    if isinstance(exc, ConnectionError):  # includes ConnectionRefusedError
        return True
    if not isinstance(exc, (RuntimeError, OSError)) and (
        type(exc).__name__ not in _BACKEND_EXC_NAMES
    ):
        return False
    msg = str(exc)
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

"""utils: device timer and trace annotations (hermetic, CPU)."""

import jax.numpy as jnp
import numpy as np

from openintel_tpu.utils import DeviceTimer, trace_annotation


def test_device_timer_times_and_syncs():
    t = DeviceTimer(reps=3, warmup=1)
    x = jnp.ones((64, 64))
    best = t.timeit(lambda: x @ x)
    assert best > 0 and len(t.samples_ms) == 3
    assert t.best_ms <= t.median_ms


def test_trace_annotation_is_transparent():
    with trace_annotation("unit-test-region"):
        out = jnp.sum(jnp.arange(8))
    assert int(out) == 28


def test_device_timer_handles_pytrees():
    t = DeviceTimer(reps=2, warmup=0)
    best = t.timeit(lambda: {"a": jnp.ones(4), "b": (jnp.zeros(2),)})
    assert np.isfinite(best)

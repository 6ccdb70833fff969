"""Mesh construction helpers.

One canonical layout: ("data", "corpus") — query batches shard over "data"
(pure data parallelism), documents shard over "corpus" (the model-parallel
axis of a retrieval engine). Single-chip degenerates to a 1x1 mesh, so all
code paths are mesh-generic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
CORPUS_AXIS = "corpus"


def make_mesh(
    *,
    data: int = 1,
    corpus: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "corpus") mesh over the available devices.

    ``corpus`` defaults to all remaining devices after the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if corpus is None:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        corpus = n // data
    if data * corpus != n:
        raise ValueError(f"mesh {data}x{corpus} != {n} devices")
    arr = np.asarray(devices).reshape(data, corpus)
    return Mesh(arr, (DATA_AXIS, CORPUS_AXIS))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0, fill=0):
    """Pad an array along ``axis`` to a multiple (shard-even corpora)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill), n

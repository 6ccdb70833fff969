"""Model checkpointing: param pytrees to a single .npz + json config.

The reference persists nothing but credentials (stateless CLI by design —
reference: docs design spec "No persistence/DB in v1"; SURVEY.md §5); the
rebuild adds real checkpoint/resume for the pieces that are expensive to
recompute: the built index (index/checkpoint.py) and trained model params
(here). Deliberately dependency-light: flattened key-path -> array in npz,
exact roundtrip asserted in tests.
"""

from __future__ import annotations

import json
from dataclasses import asdict
from pathlib import Path

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_params(tree, path: str | Path, config=None, step: int | None = None):
    """Serialise a param pytree (and optional dataclass config + step).

    Writes are atomic (tmp + rename, npz before meta) so an interrupted run
    never leaves a truncated checkpoint or params newer than their meta."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **_flatten(tree))
    tmp.rename(path.with_suffix(".npz"))
    meta = {}
    if config is not None:
        meta["config"] = asdict(config)
    if step is not None:
        meta["step"] = step
    if meta:
        tmp_meta = path.with_suffix(".tmp.json")
        tmp_meta.write_text(json.dumps(meta))
        tmp_meta.rename(path.with_suffix(".json"))


def load_params(template, path: str | Path):
    """Load into the structure of ``template`` (exact roundtrip)."""
    data = np.load(Path(path).with_suffix(".npz"))
    flat = _flatten(template)
    assert set(flat) == set(data.files), "checkpoint/template structure mismatch"
    leaves_paths = jax.tree_util.tree_flatten_with_path(template)
    out_leaves = []
    for path_keys, leaf in leaves_paths[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path_keys
        )
        arr = data[key]
        assert arr.shape == np.shape(leaf), (key, arr.shape, np.shape(leaf))
        out_leaves.append(arr)
    return jax.tree_util.tree_unflatten(leaves_paths[1], out_leaves)


def load_meta(path: str | Path) -> dict:
    p = Path(path).with_suffix(".json")
    return json.loads(p.read_text()) if p.exists() else {}

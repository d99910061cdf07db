"""Checkpoint / resume for params pytrees.

The reference's persistence story is config-dict serialization only
(``MsaHMMLayer.py:210-224``, ``Emitter.py:199-224``) with weight files that
are absent from its repo; here checkpoints are first-class: any params
pytree (nested dicts/lists of arrays) round-trips through a single ``.npz``
file with path-encoded keys plus a JSON sidecar for configs/metadata.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["save_checkpoint", "load_checkpoint", "save_config", "load_config"]

_SEP = "/"


def _flatten(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = _SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def _meta_path(path: str) -> str:
    """Sidecar path, independent of whether ``path`` carries the ``.npz``
    suffix (``np.savez`` appends it when absent)."""
    base = path[: -len(".npz")] if path.endswith(".npz") else path
    return base + ".meta.json"


def save_checkpoint(path: str, params, step: int | None = None, **metadata):
    """Write a params pytree (and optional metadata) to ``path`` (.npz)."""
    arrays = _flatten(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)
    meta = dict(metadata)
    if step is not None:
        meta["step"] = step
    if meta:
        with open(_meta_path(path), "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, like):
    """Load arrays saved by :func:`save_checkpoint` into the structure of
    the ``like`` pytree (e.g. a freshly-initialized params tree)."""
    if not path.endswith(".npz"):
        path = path + ".npz" if os.path.exists(path + ".npz") else path
    data = np.load(path)
    flat_like = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for pth, leaf in flat_like[0]:
        key = _SEP.join(str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
        if key not in data:
            raise KeyError(f"checkpoint missing parameter {key!r}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {arr.shape} vs "
                f"model {np.shape(leaf)}"
            )
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(flat_like[1], leaves)


def load_metadata(path: str) -> dict:
    """Metadata sidecar for a checkpoint, accepting the path with or
    without the ``.npz`` suffix (mirrors :func:`load_checkpoint`'s
    normalization; the suffix-appended legacy sidecar name is also read)."""
    for candidate in (_meta_path(path), path + ".meta.json"):
        if os.path.exists(candidate):
            with open(candidate) as f:
                return json.load(f)
    return {}


def save_config(path: str, config: dict):
    with open(path, "w") as f:
        json.dump(config, f, indent=2, default=_np_default)


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _np_default(o):
    if isinstance(o, (np.ndarray, jnp.ndarray)):
        return np.asarray(o).tolist()
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    raise TypeError(f"not JSON serializable: {type(o)}")

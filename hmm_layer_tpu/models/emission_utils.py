"""Helpers shared by the emission model families."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_end_hints"]


def apply_end_hints(emit, end_hints):
    """Mask the chunk-border emissions with caller-provided state hints.

    ``end_hints``: (m, b·P, 2, q) — multiplicative state masks for the
    first/last position of every chunk (the reference's border clamping,
    ``gene_pred_hmm_emitter.py:117-120`` / ``MsaHMMLayer.py:104``); one
    shared implementation so a chunk-boundary convention change cannot
    silently diverge between the model families.
    """
    if end_hints is None:
        return emit
    left = end_hints[..., :1, :] * emit[..., :1, :]
    right = end_hints[..., 1:, :] * emit[..., -1:, :]
    return jnp.concatenate([left, emit[..., 1:-1, :], right], axis=-2)

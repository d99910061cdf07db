"""Helpers shared by the emission model families."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_end_hints"]


def apply_end_hints(emit, end_hints):
    """Mask border emissions with caller-provided state hints.

    The reference clamps the border states of every *chunk* of the chunked
    parallel algorithm: emissions are scored on the chunk-reshaped
    ``(m, b·P, L/P, q)`` tensor and ``end_hints`` of shape ``(m, b·P, 2, q)``
    multiply each chunk's first/last position
    (``/root/reference/hmm_layer/gene_pred_hmm_emitter.py:117-120``,
    threaded via ``MsaHMMLayer.py:104``). Here emissions are scored on the
    un-chunked ``(m, b, L, q)`` tensor (chunking happens inside the scan
    engine), so the same semantics take an explicit chunk axis:

    * ``end_hints`` of shape ``(m, b, 2, q)`` — mask the first/last
      position of the **whole sequence** (the ``parallel_factor == 1``
      case of the reference).
    * ``end_hints`` of shape ``(m, b, P, 2, q)`` — mask the first/last
      position of **every chunk** in row-major ``(b, P)`` order, matching
      the reference's ``b·P`` chunk-batch layout. ``P`` must divide ``L``
      and each chunk must be at least 2 positions long. Conventionally
      ``P`` equals the layer's ``parallel_factor``, but mathematically the
      mask is a pure emission-tensor transform and is exact under any
      engine dispatch.

    One shared implementation so a chunk-boundary convention change cannot
    silently diverge between the model families. Multiplicative and
    differentiable in both ``emit`` and ``end_hints``.
    """
    if end_hints is None:
        return emit
    end_hints = jnp.asarray(end_hints)
    if end_hints.ndim == emit.ndim + 1:
        # Per-chunk hints: (m, b, P, 2, q) against emit (m, b, L, q).
        m, b, L, q = emit.shape
        P = end_hints.shape[-3]
        if L % P != 0:
            raise ValueError(
                f"end_hints chunk count P={P} does not divide L={L}"
            )
        c = L // P
        if c < 2:
            raise ValueError(
                f"end_hints chunks must span >= 2 positions, got L/P={c}"
            )
        chunks = emit.reshape(*emit.shape[:-2], P, c, q)
        left = end_hints[..., :1, :] * chunks[..., :1, :]
        right = end_hints[..., 1:, :] * chunks[..., -1:, :]
        chunks = jnp.concatenate([left, chunks[..., 1:-1, :], right], axis=-2)
        return chunks.reshape(*emit.shape)
    if end_hints.shape[-2] != 2:
        raise ValueError(
            "end_hints must be (m, b, 2, q) sequence-level or "
            f"(m, b, P, 2, q) per-chunk masks; got shape {end_hints.shape}"
        )
    left = end_hints[..., :1, :] * emit[..., :1, :]
    right = end_hints[..., 1:, :] * emit[..., -1:, :]
    return jnp.concatenate([left, emit[..., 1:-1, :], right], axis=-2)

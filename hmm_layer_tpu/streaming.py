"""Streaming (online) forward filtering over unbounded sequences.

Production serving of chromosome-scale inputs cannot hold the full sequence
in device memory; this module exposes the forward recursion as an
incremental block API (cf. the on-line Viterbi literature, PAPERS.md —
filtering is the streamable part of HMM inference; smoothing/posterior
needs future context by definition).

The carried state is the log forward vector at the last consumed position,
``log P(x_{1..t}, s_t)`` — O(q) per sequence, independent of how much has
been consumed. Each block is reduced with the same chunked engine the batch
API uses (``parallel_factor`` chunks per block, Pallas-accelerated where
supported), so streaming throughput matches the offline engine.

No reference counterpart: the reference holds the whole sequence in memory
(``MsaHMMLayer.py:253-255``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops.recursion import (
    _chunk_summaries_dispatch,
    _clamped,
)
from .ops.semiring import logmatmul

__all__ = [
    "StreamingForwardState",
    "streaming_init",
    "streaming_update",
    "streaming_log_likelihood",
    "streaming_filter_log_probs",
]


class StreamingForwardState(NamedTuple):
    """``log_v[m, b, q] = log P(x_{1..t}, s_t)`` at the stream head."""

    log_v: jax.Array


def _fold_block(log_v, init, A, E_block, parallel_factor):
    """Fold a block's chunk operators into the carried forward vector.

    The block's chunk 0 is identity-start (conditioned on the state AT the
    block's first position, first emission included), so the caller must
    fold the inter-block transition into ``log_v`` beforehand.
    """
    C = _chunk_summaries_dispatch(init, A, E_block, parallel_factor)

    def fold(v, C_p):
        return logmatmul(v[..., None, :], C_p)[..., 0, :], None

    v, _ = lax.scan(fold, log_v, C)
    return v


def streaming_init(
    init, A, E_block, parallel_factor: int = 1
) -> StreamingForwardState:
    """Start a stream with its first emission block.

    Args:
        init: (m, q) initial distribution; A: (m, q, q); E_block:
            (m, b, L_block, q) linear emission probabilities
            (``parallel_factor`` must divide ``L_block``).
    """
    m, b = E_block.shape[:2]
    q = E_block.shape[-1]
    log_init = jnp.broadcast_to(
        jnp.log(_clamped(init))[:, None, :], (m, b, q)
    )
    v = _fold_block(log_init, init, A, E_block, parallel_factor)
    return StreamingForwardState(v)


def streaming_update(
    state: StreamingForwardState, init, A, E_block, parallel_factor: int = 1
) -> StreamingForwardState:
    """Consume the next emission block; O(q) carried state per sequence."""
    # Inter-block transition, then the block fold (identity-start chunks).
    u = logmatmul(
        state.log_v[..., None, :], jnp.log(_clamped(A))[:, None]
    )[..., 0, :]
    v = _fold_block(u, init, A, E_block, parallel_factor)
    return StreamingForwardState(v)


def streaming_log_likelihood(state: StreamingForwardState) -> jax.Array:
    """``log P(x_{1..t})`` of everything consumed so far, shape (m, b)."""
    return jax.nn.logsumexp(state.log_v, axis=-1)


def streaming_filter_log_probs(state: StreamingForwardState) -> jax.Array:
    """Filtered state posterior ``log P(s_t | x_{1..t})``, shape (m, b, q)."""
    return state.log_v - streaming_log_likelihood(state)[..., None]

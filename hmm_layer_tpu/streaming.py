"""Streaming (online) forward filtering over unbounded sequences.

Production serving of chromosome-scale inputs cannot hold the full sequence
in device memory; this module exposes the forward recursion as an
incremental block API (cf. the on-line Viterbi literature, PAPERS.md —
filtering is the streamable part of HMM inference; smoothing/posterior
needs future context by definition).

The carried state is the *normalized* filter distribution
``log P(s_t | x_{1..t})`` plus a scalar running log-likelihood — O(q) per
sequence, independent of how much has been consumed, and immune to f32
quantization of the growing joint probability (carrying the raw
``log P(x_{1..t}, s_t)`` would lose all state resolution once
|loglik| ~ 1e7, i.e. after ~10 Mbp). Each block is reduced with the same
chunked engine the batch API uses (``parallel_factor`` chunks per block,
Pallas-accelerated where supported), so streaming throughput matches the
offline engine.

No reference counterpart: the reference holds the whole sequence in memory
(``MsaHMMLayer.py:253-255``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops.recursion import _chunk_summaries_dispatch, _clamped
from .ops.semiring import logmatmul

__all__ = [
    "StreamingForwardState",
    "streaming_init",
    "streaming_update",
    "streaming_log_likelihood",
    "streaming_filter_log_probs",
]


class StreamingForwardState(NamedTuple):
    """Filter ``log P(s_t | x_{1..t})`` (m, b, q) + loglik (m, b)."""

    log_filter: jax.Array
    log_lik: jax.Array


def _fold_block(log_v, A, E_block, parallel_factor):
    """Fold a block's chunk operators into the carried forward vector.

    The block's chunk 0 is identity-start (conditioned on the state AT the
    block's first position, first emission included), so the caller must
    fold the inter-block transition into ``log_v`` beforehand. Returns the
    unnormalized update of ``log_v`` (magnitude grows by the block's
    emission mass only — renormalized by the caller).
    """
    C = _chunk_summaries_dispatch(A, E_block, parallel_factor)

    def fold(v, C_p):
        return logmatmul(v[..., None, :], C_p)[..., 0, :], None

    v, _ = lax.scan(fold, log_v, C)
    return v


def _normalize(v, log_lik):
    lse = jax.nn.logsumexp(v, axis=-1, keepdims=True)
    return StreamingForwardState(v - lse, log_lik + lse[..., 0])


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
    v = _fold_block(log_init, A, E_block, parallel_factor)
    return _normalize(v, jnp.zeros((m, b), E_block.dtype))


def streaming_update(
    state: StreamingForwardState, A, E_block, parallel_factor: int = 1
) -> StreamingForwardState:
    """Consume the next emission block; O(q) carried state per sequence."""
    # Inter-block transition, then the block fold (identity-start chunks).
    u = logmatmul(
        state.log_filter[..., None, :], jnp.log(_clamped(A))[:, None]
    )[..., 0, :]
    v = _fold_block(u, A, E_block, parallel_factor)
    return _normalize(v, state.log_lik)


def streaming_log_likelihood(state: StreamingForwardState) -> jax.Array:
    """``log P(x_{1..t})`` of everything consumed so far, shape (m, b)."""
    return state.log_lik


def streaming_filter_log_probs(state: StreamingForwardState) -> jax.Array:
    """Filtered state posterior ``log P(s_t | x_{1..t})``, shape (m, b, q)."""
    return state.log_filter

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

from .ops.recursion import (
    _PRECISION,
    _chunk_summaries_dispatch,
    _clamped,
    backward,
    forward,
)
from .ops.semiring import logmatmul, maxargmatvec

__all__ = [
    "StreamingForwardState",
    "streaming_init",
    "streaming_update",
    "streaming_log_likelihood",
    "streaming_filter_log_probs",
    "sparse_streaming_init",
    "sparse_streaming_update",
    "StreamingViterbiState",
    "streaming_viterbi_init",
    "streaming_viterbi_update",
    "streaming_viterbi_finalize",
    "StreamingSmootherState",
    "streaming_smoother_init",
    "streaming_smoother_update",
    "streaming_smoother_finalize",
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


# ---------------------------------------------------------------------------
# Streaming forward filter over sparse edge lists (config-5 q regimes)
# ---------------------------------------------------------------------------


def _sparse_block_fold(alpha, log_lik, plan, edge_probs, E_block, q):
    """Scaled sparse forward over a block from a normalized filter carry.

    Every step applies transition-then-emission (the carry is the filter at
    the previous position), so the caller handles the first-emission /
    no-transition special case of stream start.
    """
    from .ops.sparse import _scaled_fwd_step

    w = edge_probs[..., plan.perm_d][:, None, :]
    Et = jnp.moveaxis(E_block, 2, 0)
    # The canonical single-sourced forward step — blockwise parity with
    # sparse_log_likelihood depends on using exactly this recursion.
    step = _scaled_fwd_step(w, plan.src_d, plan.dst_d, q, emit_log=False)
    (a, ll), _ = lax.scan(step, (alpha, log_lik), Et)
    return StreamingForwardState(jnp.log(a), ll)


def sparse_streaming_init(
    init, indices, edge_probs, E_block
) -> StreamingForwardState:
    """Start a stream with the edge-list engine (no dense ``A`` is ever
    built — the only streaming route past the dense ``(q, q)`` wall at
    config-5 state counts). Same state/type as :func:`streaming_init`;
    blockwise loglik matches :func:`ops.sparse.sparse_log_likelihood` of
    the concatenated blocks to fp tolerance."""
    from .ops.sparse import EdgePlan

    plan = EdgePlan.cached(indices)
    m, b, Lb, q = E_block.shape
    s0 = _clamped(E_block[:, :, 0]) * _clamped(init)[:, None, :]
    z0 = jnp.sum(s0, axis=-1, keepdims=True)
    alpha0, ll0 = s0 / z0, jnp.log(z0[..., 0])
    if Lb == 1:
        return StreamingForwardState(jnp.log(alpha0), ll0)
    return _sparse_block_fold(
        alpha0, ll0, plan, edge_probs, E_block[:, :, 1:], q
    )


def sparse_streaming_update(
    state: StreamingForwardState, indices, edge_probs, E_block
) -> StreamingForwardState:
    """Consume the next block over the edge list; O(q) carried state."""
    from .ops.sparse import EdgePlan

    plan = EdgePlan.cached(indices)
    q = E_block.shape[-1]
    return _sparse_block_fold(
        jnp.exp(state.log_filter), state.log_lik, plan, edge_probs,
        E_block, q,
    )


# ---------------------------------------------------------------------------
# Streaming (bounded-lag, online) Viterbi decode
# ---------------------------------------------------------------------------


class StreamingViterbiState(NamedTuple):
    """Decision-feedback fixed-lag decoder state.

    ``buf_log_E``: (m, b, lag, q) log emissions of the last ``lag``
    positions (not yet committed). ``seam_state``: (m, b) int32 — the
    decoded state at the last committed position. ``started``: () bool —
    False until the first block (the recursion then starts from ``init``
    instead of the seam conditioning).
    """

    buf_log_E: jax.Array
    seam_state: jax.Array
    started: jax.Array


def _viterbi_window_decode(log_init, log_A, start_onehot, started, log_E_win):
    """Conditional delta pass + backtrace over a window of emissions.

    ``log_E_win``: (m, b, W, q). The recursion starts from ``log_init``
    (stream head) or from the seam state's A-row (``start_onehot`` one-hot
    over states) — decision feedback keeps every committed transition
    valid, exactly like the chunked decoder's conditional chunk starts
    (``ops.recursion._conditional_viterbi_starts``).

    Returns states (m, b, W) int32 for the whole window (backtraced from
    the window-end argmax).
    """
    m, b, W, q = log_E_win.shape
    Et = jnp.moveaxis(log_E_win, 2, 0)  # (W, m, b, q)
    seam_row = jnp.einsum(
        "mbi,miq->mbq", start_onehot, log_A, precision=_PRECISION
    )
    start = jnp.where(started, seam_row, log_init[:, None, :])
    delta0 = start + Et[0]

    def step(delta, e_t):
        best, _ = maxargmatvec(delta, log_A[:, None, :, :])
        new = best + e_t
        return new, new

    _, deltas_rest = lax.scan(step, delta0, Et[1:])
    deltas = jnp.concatenate([delta0[None], deltas_rest], axis=0)  # (W,m,b,q)

    last = jnp.argmax(deltas[-1], axis=-1).astype(jnp.int32)

    def backstep(state, delta_prev):
        onehot = jax.nn.one_hot(state, q, dtype=delta_prev.dtype)
        acol = jnp.einsum(
            "miq,mbq->mbi", log_A, onehot, precision=_PRECISION
        )  # A[:, state]
        prev = jnp.argmax(delta_prev + acol, axis=-1).astype(jnp.int32)
        return prev, prev

    _, rest = lax.scan(backstep, last, deltas[:-1], reverse=True)
    states = jnp.concatenate([rest, last[None]], axis=0)  # (W, m, b)
    return jnp.moveaxis(states, 0, 2)


def streaming_viterbi_init(
    init, A, E_block, lag: int
) -> tuple[StreamingViterbiState, jax.Array]:
    """Start a bounded-lag streaming decode with the first emission block.

    Args:
        init: (m, q); A: (m, q, q); E_block: (m, b, L_block, q) linear
            emissions with ``L_block >= lag``.
        lag: decision lag D — positions are committed once D future
            positions have been consumed. Commitments are the fixed-lag
            (on-line Viterbi) approximation: exact whenever all survivor
            paths merge within D steps (choose D ~ a few times the model's
            mixing length); the emitted sequence is ALWAYS one valid path
            (decision-feedback seam conditioning).

    Returns:
        (state, committed (m, b, L_block - lag) int32).
    """
    m, b, L_block, q = E_block.shape
    if lag < 1:
        raise ValueError(
            f"lag must be >= 1, got {lag} (a zero-lag stream leaves an "
            "empty buffer that finalize cannot decode)"
        )
    if L_block < lag:
        raise ValueError(f"first block length {L_block} must be >= lag {lag}")
    log_E = jnp.log(_clamped(E_block))
    log_init = jnp.log(_clamped(init))
    log_A = jnp.log(_clamped(A))
    dummy = jnp.zeros((m, b, q), log_E.dtype)
    states = _viterbi_window_decode(
        log_init, log_A, dummy, jnp.asarray(False), log_E
    )
    n_commit = L_block - lag
    state = StreamingViterbiState(
        buf_log_E=log_E[:, :, n_commit:],
        seam_state=states[:, :, n_commit - 1]
        if n_commit
        else jnp.zeros((m, b), jnp.int32),
        started=jnp.asarray(n_commit > 0),
    )
    return state, states[:, :, :n_commit]


def streaming_viterbi_update(
    state: StreamingViterbiState, init, A, E_block
) -> tuple[StreamingViterbiState, jax.Array]:
    """Consume the next block; returns (state, committed (m, b, L_block)).

    Decodes the (lag + L_block) window from the seam conditioning and
    commits the oldest ``L_block`` positions.
    """
    m, b, L_block, q = E_block.shape
    lag = state.buf_log_E.shape[2]
    log_E = jnp.log(_clamped(E_block))
    log_A = jnp.log(_clamped(A))
    log_init = jnp.log(_clamped(init))
    win = jnp.concatenate([state.buf_log_E, log_E], axis=2)
    onehot = jax.nn.one_hot(state.seam_state, q, dtype=log_E.dtype)
    states = _viterbi_window_decode(
        log_init, log_A, onehot, state.started, win
    )
    committed = states[:, :, :L_block]
    new_state = StreamingViterbiState(
        buf_log_E=win[:, :, L_block:],
        seam_state=committed[:, :, -1],
        started=jnp.asarray(True),
    )
    return new_state, committed


def streaming_viterbi_finalize(
    state: StreamingViterbiState, init, A
) -> jax.Array:
    """End the stream: decode and commit the remaining ``lag`` buffered
    positions (exact for the tail, given the seam)."""
    m, b, lag, q = state.buf_log_E.shape
    log_A = jnp.log(_clamped(A))
    log_init = jnp.log(_clamped(init))
    onehot = jax.nn.one_hot(state.seam_state, q, dtype=state.buf_log_E.dtype)
    return _viterbi_window_decode(
        log_init, log_A, onehot, state.started, state.buf_log_E
    )


# ---------------------------------------------------------------------------
# Streaming fixed-lag smoothing (online posterior marginals)
# ---------------------------------------------------------------------------


class StreamingSmootherState(NamedTuple):
    """Fixed-lag smoother state.

    ``buf_E``: (m, b, lag, q) linear emissions of the last ``lag`` positions
    (consumed but not yet committed). ``log_filter_seam``: (m, b, q) —
    normalized filter ``log P(s_c | x_{1..c})`` at the last committed
    position ``c``. ``log_lik``: (m, b) — ``log P(x_{1..c})``.
    """

    buf_E: jax.Array
    log_filter_seam: jax.Array
    log_lik: jax.Array


def _pf_eff(length: int, parallel_factor: int) -> int:
    """Chunked engine needs the factor to divide the scan length; windows of
    awkward length fall back to the sequential recursion."""
    return parallel_factor if length % parallel_factor == 0 else 1


def _window_posteriors(init, A, E_win, parallel_factor):
    """Exact forward/backward over one window.

    Returns (post, la): per-position normalized posterior log-marginals
    ``log P(s_t | window)`` (m, b, W, q) and the raw log-forward variables
    (m, b, W, q) the caller uses for the seam filter / loglik bookkeeping.
    """
    pf = _pf_eff(E_win.shape[2], parallel_factor)
    la, _ = forward(init, A, E_win, pf)
    lb = backward(init, A, E_win, pf)
    post = la + lb
    post = post - jax.nn.logsumexp(post, axis=-1, keepdims=True)
    return post, la


def streaming_smoother_init(
    init, A, E_block, lag: int, parallel_factor: int = 1
) -> tuple[StreamingSmootherState, jax.Array]:
    """Start a fixed-lag smoothing stream with the first emission block.

    Online posterior decoding: position ``t`` is committed once ``lag``
    future positions have been consumed, with marginal
    ``log P(s_t | x_{1..t+D_t})`` where ``D_t >= lag`` (positions early in a
    block see up to a whole block of extra context). This is the classical
    fixed-lag smoother; the truncation error vs full smoothing decays
    geometrically in ``lag`` at the rate the chain mixes, and the carried
    state stays O(lag·q) per sequence regardless of stream length.
    Complements :func:`streaming_viterbi_init` (decode) and
    :func:`streaming_init` (filtering); no reference counterpart
    (``MsaHMMLayer.py:253-255`` holds the whole sequence in memory).

    Args:
        init: (m, q); A: (m, q, q); E_block: (m, b, L_block, q) linear
            emissions with ``L_block > lag >= 1``.
        parallel_factor: within-window chunk parallelism (used whenever it
            divides the window length, else that window runs sequentially).

    Returns:
        (state, committed (m, b, L_block - lag, q) posterior log-marginals).
    """
    m, b, L_block, q = E_block.shape
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    if L_block <= lag:
        raise ValueError(
            f"first block length {L_block} must be > lag {lag} (the seam "
            "filter needs at least one committed position)"
        )
    post, la = _window_posteriors(init, A, E_block, parallel_factor)
    n_commit = L_block - lag
    seam = la[:, :, n_commit - 1]
    lse = jax.nn.logsumexp(seam, axis=-1)
    state = StreamingSmootherState(
        buf_E=E_block[:, :, n_commit:],
        log_filter_seam=seam - lse[..., None],
        log_lik=lse,
    )
    return state, post[:, :, :n_commit]


def _augmented_window(state: StreamingSmootherState, E_block):
    """Window emissions with the seam filter folded in as a pseudo-position.

    Prepending ``exp(log_filter_seam)`` as an emission vector under a
    uniform initial distribution makes the engine's recursion over the
    window exactly the continuation of the stream: the engine applies one
    transition between the pseudo-position and the first real position, so
    ``alpha_t`` within the window is ``(1/q) * P(x_win_{1..t}, s_t |
    x_{1..c})`` — the constant drops out of every normalized quantity and
    is subtracted from the loglik bookkeeping.
    """
    m, b, _, q = E_block.shape
    pseudo = jnp.exp(state.log_filter_seam)[:, :, None, :]
    E_win = jnp.concatenate([state.buf_E, E_block], axis=2)
    E_aug = jnp.concatenate([pseudo, E_win], axis=2)
    uniform = jnp.full((m, q), 1.0 / q, E_block.dtype)
    return E_aug, E_win, uniform


def streaming_smoother_update(
    state: StreamingSmootherState, A, E_block, parallel_factor: int = 1
) -> tuple[StreamingSmootherState, jax.Array]:
    """Consume the next block; returns (state, committed (m, b, L_block, q)).

    Smooths the (lag + L_block) window from the seam filter and commits the
    oldest ``L_block`` positions.
    """
    m, b, L_block, q = E_block.shape
    E_aug, E_win, uniform = _augmented_window(state, E_block)
    post, la = _window_posteriors(uniform, A, E_aug, parallel_factor)
    seam = la[:, :, L_block]  # augmented index: window position L_block - 1
    lse = jax.nn.logsumexp(seam, axis=-1)
    new_state = StreamingSmootherState(
        buf_E=E_win[:, :, L_block:],
        log_filter_seam=seam - lse[..., None],
        log_lik=state.log_lik + lse + jnp.log(jnp.asarray(q, lse.dtype)),
    )
    return new_state, post[:, :, 1 : L_block + 1]


def streaming_smoother_finalize(
    state: StreamingSmootherState, A, parallel_factor: int = 1
) -> jax.Array:
    """End the stream: commit the ``lag`` buffered positions.

    The tail marginals are exact (the window ends at the stream end, so
    there is no truncation), shape (m, b, lag, q).
    """
    m, b, lag, q = state.buf_E.shape
    pseudo = jnp.exp(state.log_filter_seam)[:, :, None, :]
    E_aug = jnp.concatenate([pseudo, state.buf_E], axis=2)
    uniform = jnp.full((m, q), 1.0 / q, state.buf_E.dtype)
    post, _ = _window_posteriors(uniform, A, E_aug, parallel_factor)
    return post[:, :, 1:]

"""Classical Baum-Welch (EM) re-estimation for dense HMMs.

The reference trains only by gradient descent; a general HMM engine also
needs the closed-form EM updates. These reuse the chunked engine's
forward/backward quantities and the balanced-shift xi contraction from the
analytic VJPs — O(L·q) memory, chunk-parallel depth, Pallas-accelerated
where supported.

Emissions here are per-position probabilities produced by arbitrary
parameterized emitters (not free lookup tables), so the M-step for emission
parameters is the emitter's own job: maximize ``sum_t gamma_t(j) *
log E_t(j)`` — for gradient emitters just train with
:func:`hmm_layer_tpu.posterior`; for free categorical tables accumulate
``gamma`` against observed symbols. This module provides the exact E-step
statistics plus the closed-form init/transition M-step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .recursion import (
    EPS,
    _backward_outputs,
    _boundary_values,
    _chunk_summaries_dispatch,
    _clamped,
    _forward_outputs,
    _forward_seq,
    _backward_seq,
    _PRECISION,
)

__all__ = [
    "expected_statistics",
    "em_step",
    "categorical_emission_m_step",
    "em_step_categorical",
]


def expected_statistics(init, A, E, parallel_factor: int = 1):
    """E-step: posterior statistics of the hidden chain.

    Args:
        init: (m, q); A: (m, q, q); E: (m, b, L, q) linear emission probs.

    Returns:
        gamma: (m, b, L, q) posterior state probabilities (linear space).
        xi_sum: (m, q, q) expected transition counts, summed over batch and
            time: ``sum_{b,t} P(s_{t-1}=i, s_t=j | x)``.
        loglik: (m, b).
    """
    if parallel_factor == 1:
        la, ll = _forward_seq(init, A, E)
        lb = _backward_seq(A, E)
    else:
        # ONE summary pass serves both directions (same structure as
        # recursion._loglik_fast_bwd) — the dominant O(L·q²) scan would
        # otherwise run twice per E-step.
        C = _chunk_summaries_dispatch(A, E, parallel_factor)
        T, S, ll = _boundary_values(init, C)
        la = _forward_outputs(init, A, E, T, parallel_factor)
        lb = _backward_outputs(A, E, S, parallel_factor)
    log_E = jnp.log(_clamped(E))
    gamma = jnp.exp(la + lb - ll[..., None, None])

    # xi_sum(i, j) = A(i, j) * sum_{b,t} exp(la_{t-1}(i) + log_E_t(j)
    #                                        + lb_t(j) - ll), balanced-shift
    # einsum (the factors alone would under/overflow at |ll| ~ L).
    csh = jnp.max(la[:, :, :-1], axis=-1, keepdims=True)
    F = jnp.exp(la[:, :, :-1] - csh)
    U = jnp.exp(lb[:, :, 1:] + log_E[:, :, 1:] - ll[..., None, None] + csh)
    xi_sum = A * jnp.einsum("mbti,mbtj->mij", F, U, precision=_PRECISION)
    return gamma, xi_sum, ll


def _m_step_init_from_counts(init_counts, init, pseudocount):
    """Closed-form init update from (m, q) summed t=0 posterior counts."""
    counts = (init_counts + pseudocount) * (init > 0)
    return counts / jnp.maximum(jnp.sum(counts, axis=-1, keepdims=True), EPS)


def _m_step_init(gamma, init, pseudocount):
    return _m_step_init_from_counts(
        jnp.sum(gamma[:, :, 0], axis=1), init, pseudocount
    )


def _m_step_A(xi_sum, A, pseudocount):
    structure = (A > 0).astype(A.dtype)
    counts = (xi_sum + pseudocount) * structure
    row = jnp.sum(counts, axis=-1, keepdims=True)
    return jnp.where(row > 0, counts / jnp.maximum(row, EPS), A)


def em_step(init, A, E, parallel_factor: int = 1, pseudocount: float = 0.0):
    """One Baum-Welch update of the initial distribution and transitions.

    ``new_init(i) ∝ sum_b gamma_0(i)``; ``new_A(i, j) ∝ xi_sum(i, j)``.
    ``pseudocount`` adds Dirichlet-style smoothing to both updates.
    Transition entries that are exactly zero stay zero (structural grammar
    edges are preserved).

    Returns:
        (new_init (m, q), new_A (m, q, q), loglik (m, b)) — loglik is the
        pre-update likelihood (monotonically non-decreasing across steps).
    """
    gamma, xi_sum, ll = expected_statistics(init, A, E, parallel_factor)
    return (
        _m_step_init(gamma, init, pseudocount),
        _m_step_A(xi_sum, A, pseudocount),
        ll,
    )


def categorical_emission_m_step(gamma, x, pseudocount: float = 0.0):
    """M-step for free categorical emission tables.

    ``new_B(j, s) ∝ sum_{b,t} gamma_t(j) * x_t(s)`` — the classical
    Baum-Welch emission update for lookup-table HMMs.

    Args:
        gamma: (m, b, L, q) posterior state probabilities.
        x: (m, b, L, s) one-hot (or soft) observed symbols.

    Returns:
        new_B: (m, q, s) row-stochastic emission table.
    """
    return _m_step_B_from_counts(_emission_counts(gamma, x), pseudocount)


def _emission_counts(gamma, x):
    """(m, q, s) expected symbol counts per state, summed over batch/time."""
    return jnp.einsum("mblq,mbls->mqs", gamma, x, precision=_PRECISION)


def _m_step_B_from_counts(counts, pseudocount):
    counts = counts + pseudocount
    return counts / jnp.maximum(jnp.sum(counts, axis=-1, keepdims=True), EPS)


def em_step_categorical(
    init, A, B, x, parallel_factor: int = 1, pseudocount: float = 0.0
):
    """One FULL classical Baum-Welch step for a lookup-table HMM.

    The observation model is ``E_t = x_t @ B^T`` (categorical symbols, B a
    free (m, q, s) row-stochastic table); updates init, A AND B from one
    E-step — the textbook algorithm the reference leaves entirely to
    gradient descent.

    Returns:
        (new_init, new_A, new_B, loglik) — loglik is pre-update.
    """
    E = jnp.einsum("mbls,mqs->mblq", x, B, precision=_PRECISION)
    gamma, xi_sum, ll = expected_statistics(init, A, E, parallel_factor)
    return (
        _m_step_init(gamma, init, pseudocount),
        _m_step_A(xi_sum, A, pseudocount),
        categorical_emission_m_step(gamma, x, pseudocount),
        ll,
    )

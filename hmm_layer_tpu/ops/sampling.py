"""Exact posterior path sampling (forward-filter backward-sample).

Draws joint hidden-state paths ``s ~ P(s | x)`` — the stochastic
counterpart of Viterbi decoding and the third classical HMM inference op
(the reference implements neither; capability superset like
``ops.recursion.viterbi``). Gumbel-max categorical draws over the standard
FFBS conditionals:

    s_{L-1} ~ softmax(log alpha_{L-1})
    s_t     ~ softmax(log alpha_t + log A[:, s_{t+1}])

Chunk-parallel variant (exact, not approximate): the states at the P
chunk-end positions form their own Markov chain whose transition operators
are the chunk summaries ``C[p](i, j) = log P(chunk-p emissions,
right-border j | left-border i)``, so they are FFBS-sampled first from the
boundary forward values (``P(s at chunk p's end = i | s at chunk p+1's
end = j, x) ∝ exp(T[p](i) + C[p+1](i, j))``). Conditioned on BOTH sampled
borders, chunk interiors are mutually independent, so every chunk then
runs (batched) a *conditional* forward recursion started from its sampled
left-border state followed by within-chunk backward sampling — two
c-length scans over all chunks at once, the same parallel depth as the
engine's output passes. Transitions with exactly zero probability are
never sampled (log-masked, same invariant as the recursions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .recursion import _PRECISION
from .recursion import (
    _chunk_summaries_dispatch,
    _clamped,
    _forward_boundaries,
    _forward_seq,
)

__all__ = ["sample_posterior"]

# Tropical sentinel for structurally-impossible transitions. Sampling is
# gradient-free, so a hard mask is safe — and necessary for the exactness
# guarantee: the soft LOG_ZERO (-1e3) used by the differentiable recursions
# could in principle lose an argmax to accumulated within-chunk log-alpha
# deficits of the same magnitude. Not -inf: the one-hot row-select einsums
# below would turn 0 * -inf into NaN; -1e30 is unbeatable by any real path
# score (bounded by ~L·|log EPS| ≈ 4e5) yet stays finite under adds.
_MASK = -1e30


def _masked_log(A):
    return jnp.where(A > 0, jnp.log(_clamped(A)), _MASK)


def _bool_matpower(Ab, n: int):
    """Support of ``A^n`` per model: (m, q, q) bool, exponentiation by
    squaring (n is a static chunk length)."""
    m, q = Ab.shape[0], Ab.shape[-1]
    out = jnp.broadcast_to(jnp.eye(q, dtype=jnp.float32), (m, q, q))
    base = Ab.astype(jnp.float32)
    while n:
        if n & 1:
            out = (out @ base > 0).astype(jnp.float32)
        base = ((base @ base) > 0).astype(jnp.float32)
        n >>= 1
    return out > 0


def _boundary_masks(init, A, P: int, c: int):
    """Hard structural masks for the chunk-boundary Markov chain.

    The summary scan EPS-clamps its per-step operators, so structurally
    impossible entries of ``C``/``T`` are *soft* floors (~36.8 log-units
    below the running scale per step) — close enough for Gumbel-max to
    sample in adversarially sparse models. Exactness needs true masks:

    Returns ``reach_c`` (m, q, q) — the support of chunk-(p>0) operators
    (``c`` A-factors: the transition-applied start plus c-1 steps) — and
    ``fmask`` (P, m, q) — forward reachability at each chunk's last
    position (chunk 0 reaches through c-1 A-factors from the init support).
    Emissions and init are EPS-clamped by the engine (only ``A`` carries
    structural zeros), so A-support reachability is the exact criterion.
    """
    Ab = A > 0
    reach_c = _bool_matpower(Ab, c)
    R0 = _bool_matpower(Ab, c - 1).astype(jnp.float32)
    f0 = ((init > 0).astype(jnp.float32)[:, None, :] @ R0)[:, 0] > 0  # (m, q)
    reach_f = reach_c.astype(jnp.float32)

    def fstep(fv, _):
        nxt = (fv.astype(jnp.float32)[:, None, :] @ reach_f)[:, 0] > 0
        return nxt, nxt

    _, frest = lax.scan(fstep, f0, None, length=P - 1)
    return reach_c, jnp.concatenate([f0[None], frest], axis=0)


def _gumbel_argmax(logits, g):
    return jnp.argmax(logits + g, axis=-1)


def sample_posterior(init, A, E, key, num_samples: int = 1, parallel_factor: int = 1):
    """Joint posterior path samples by forward-filter backward-sampling.

    Args:
        init: (m, q); A: (m, q, q); E: (m, b, L, q) linear emission probs.
        key: PRNG key.
        num_samples: independent paths per sequence.
        parallel_factor: chunked-parallel factor (must divide L).

    Returns:
        paths: (m, b, num_samples, L) int32, exact draws from P(s | x).
    """
    m, b, L, q = E.shape
    S = num_samples
    log_A = _masked_log(A)
    if parallel_factor == 1:
        la, _ = _forward_seq(init, A, E)
        return _sample_backward_seq(la, log_A, key, S)
    return _sample_backward_chunked(init, A, E, log_A, key, S, parallel_factor)


def _sample_backward_seq(la, log_A, key, S):
    m, b, L, q = la.shape
    g = jax.random.gumbel(key, (L, m, b, S, q), la.dtype)
    s_last = _gumbel_argmax(la[:, :, -1][:, :, None, :], g[-1])  # (m, b, S)
    la_t = jnp.moveaxis(la, 2, 0)  # (L, m, b, q)

    def step(s_next, inp):
        la_tm, g_t = inp
        oh = jax.nn.one_hot(s_next, q, dtype=la.dtype)  # (m, b, S, j)
        w = jnp.einsum("mbsj,mij->mbsi", oh, log_A, precision=_PRECISION)
        s = _gumbel_argmax(la_tm[:, :, None, :] + w, g_t)
        return s, s

    _, path = lax.scan(step, s_last, (la_t[:-1], g[:-1]), reverse=True)
    paths = jnp.concatenate([path, s_last[None]], axis=0)  # (L, m, b, S)
    return jnp.moveaxis(paths, 0, -1)


def _sample_backward_chunked(init, A, E, log_A, key, S, P):
    m, b, L, q = E.shape
    c = L // P
    C = _chunk_summaries_dispatch(A, E, P)  # (P, m, b, q, q)
    # Prefix-only fold: sampling needs the forward boundary values only —
    # the fused fwd+bwd stream of _boundary_values would pay for a suffix
    # pass that is not reliably DCE'd.
    T = _forward_boundaries(init, C)  # log-forward at chunk ends
    # Hard structural masks: C/T from the EPS-clamped summary scan floor
    # impossible entries softly; mask them so the exactness invariant
    # ("zero-probability transitions are never sampled") holds across
    # chunk boundaries, not just within chunks.
    reach_c, fmask = _boundary_masks(init, A, P, c)
    T = jnp.where(fmask[:, :, None, :], T, _MASK)
    C_next = jnp.where(reach_c[None, :, None], C[1:], _MASK)
    kb, kw = jax.random.split(key)

    # -- boundary pass: exact FFBS over the chunk-end Markov chain -------------
    gb = jax.random.gumbel(kb, (P, m, b, S, q), E.dtype)
    s_P = _gumbel_argmax(T[-1][:, :, None, :], gb[-1])

    def bstep(s_next, inp):
        T_p, C_p1, g_p = inp
        oh = jax.nn.one_hot(s_next, q, dtype=E.dtype)
        w = jnp.einsum(
            "mbsj,mbij->mbsi", oh, C_p1, precision=_PRECISION
        )
        s = _gumbel_argmax(T_p[:, :, None, :] + w, g_p)
        return s, s

    _, sbs = lax.scan(bstep, s_P, (T[:-1], C_next, gb[:-1]), reverse=True)
    s_bounds = jnp.concatenate([sbs, s_P[None]], axis=0)  # (P, m, b, S)

    if c == 1:
        return jnp.moveaxis(s_bounds, 0, -1)  # every position is a boundary

    # -- conditional forward within each chunk from its sampled left border ----
    log_Et = jnp.moveaxis(
        jnp.log(_clamped(E)).reshape(m, b, P, c, q), 3, 0
    )  # (c, m, b, P, q)
    oh_l = jax.nn.one_hot(
        jnp.moveaxis(s_bounds[:-1], 0, 2), q, dtype=E.dtype
    )  # (m, b, P-1, S, j) — left border of chunks 1..P-1
    start_rest = jnp.einsum(
        "mbpsj,mji->mbpsi", oh_l, log_A, precision=_PRECISION
    )
    start0 = jnp.broadcast_to(
        jnp.log(_clamped(init))[:, None, None, None, :], (m, b, 1, S, q)
    )
    la0 = (
        jnp.concatenate([start0, start_rest], axis=2)
        + log_Et[0][:, :, :, None, :]
    )  # (m, b, P, S, q)

    def fstep(la_t, log_e_next):
        la_next = (
            jax.nn.logsumexp(
                la_t[..., :, None] + log_A[:, None, None, None, :, :], axis=-2
            )
            + log_e_next[:, :, :, None, :]
        )
        return la_next, la_t  # emit la at t, carry la at t+1

    _, la_hist = lax.scan(fstep, la0, log_Et[1:])  # (c-1, m, b, P, S, q)

    # -- within-chunk backward sampling from the sampled right border ----------
    g_w = jax.random.gumbel(kw, (c - 1, m, b, P, S, q), E.dtype)
    s_end = jnp.moveaxis(s_bounds, 0, 2)  # (m, b, P, S)

    def wstep(s_next, inp):
        la_t, g_t = inp  # (m, b, P, S, q)
        oh = jax.nn.one_hot(s_next, q, dtype=E.dtype)
        w = jnp.einsum(
            "mbpsj,mij->mbpsi", oh, log_A, precision=_PRECISION
        )
        s = _gumbel_argmax(la_t + w, g_t)
        return s, s

    _, ws = lax.scan(wstep, s_end, (la_hist, g_w), reverse=True)
    path = jnp.concatenate([ws, s_end[None]], axis=0)  # (c, m, b, P, S)
    return jnp.moveaxis(path, (0, 3), (4, 3)).reshape(m, b, S, L)

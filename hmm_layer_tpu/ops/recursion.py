"""Core HMM recursions: forward, backward, posterior, log-likelihood, Viterbi.

TPU-first redesign of the reference's recursion stack
(``/root/reference/hmm_layer/BaseRNN.py:217-227`` Python time loop,
``MsaHmmCell.py:73-106`` scaled forward cell, ``Bidirectional.py:113-164``,
``TotalProbabilityCell.py:30-49`` chunk combine,
``MsaHMMLayer.py:227-521`` orchestration). Capabilities are identical; the
architecture is not a port:

* The per-timestep recursion is a ``jax.lax.scan`` over a time-major emission
  tensor — XLA compiles it to a single fused loop on device; the hot op is a
  batched ``(m, b, q) @ (m, q, q)`` matmul on the MXU.
* ``parallel_factor > 1`` activates a **two-pass chunked scan**:

  - **Summary pass** — all ``P`` chunks run batched with a ``q x q``
    row-scaled carry, producing per-chunk transfer operators
    ``C_p[i, j] = log P(chunk-p emissions, right-border state j | left-border
    state i)``. One pass serves *both* directions (the reference runs two).
  - **Combine** — chunk operators are reduced with a log-matmul
    ``jax.lax.associative_scan`` (the associative combine the reference
    implements sequentially in ``TotalProbabilityCell``), yielding exact
    forward values at every chunk boundary (prefix) and exact backward values
    (reverse/suffix scan).
  - **Output pass** — each chunk re-runs a cheap ``q``-vector recursion from
    its now-known boundary value. Peak memory is ``O(b·L·q)`` instead of the
    reference's ``O(b·L·q²)`` materialization (``MsaHMMLayer.py:296-315``).

* Viterbi decoding (max-plus semiring + backtrace) is provided — the
  reference only mentions it (``MsaHmmCell.py:13``) but never implements it.

Shapes and conventions
----------------------
``init``: (m, q) linear-space initial state distribution per model.
``A``:    (m, q, q) linear-space transition matrix per model (rows sum to 1).
``E``:    (m, b, L, q) linear-space per-state emission probabilities.
All outputs are in log space. ``m`` = number of models, ``b`` = batch.
Models with fewer than ``q`` states are padded; padded states must have zero
emission probability and zero initial probability (the EPS clamp keeps the
scaled recursion finite, matching ``MsaHmmCell.py:87-88``).
"""

from __future__ import annotations

import os

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from functools import partial

from .semiring import EPS, logmatmul, maxargmatvec, maxmatmul
from . import pallas_adjoint, pallas_forward, pallas_mxu, pallas_viterbi

# The DP recursions are numerically sensitive: on TPU the default matmul
# precision is bfloat16, whose per-step rounding accumulates linearly in L
# (observed ~0.13 log-space error at L=1200). Force full f32 MXU passes.
# One-hot SELECTION einsums (backtraces/sampling) use _PRECISION and are
# always HIGHEST — operands are O(hundreds of nats) and bf16 rounding
# corrupts argmaxes.
_PRECISION = lax.Precision.HIGHEST

# DP-recursion / adjoint-statistic einsums use _dp_prec(), switchable to
# the reduced-pass mode for the measured precision/speed trade
# (HMM_DP_PRECISION=high -> 3-pass bf16x3 instead of HIGHEST's 6 passes).
# The round-4 sweep (BASELINE.md; benchmarks/precision_sweep.py) decided
# the defaults per workload: `high` is 1.28x on the profile MAP step with
# loglik error SATURATING at the f32-ulp level (0.004/0.017/0.016 nats at
# L=400/1600/6400 on |ll| ~ 1.3e3/5.4e3/2.2e4), but 0.76x (a regression)
# on the small-q gene-pred CE step — so the global default stays
# `highest` and the profile-family training paths opt into `high` via
# set_dp_precision / dp_precision (the env var seeds the initial mode).
_DP_MODES = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}
_DP_PRECISION_MODE = _DP_MODES[
    os.environ.get("HMM_DP_PRECISION", "highest").lower()
]


def _dp_prec():
    return _DP_PRECISION_MODE


def set_dp_precision(mode: str):
    """Set the DP-einsum precision mode ('highest' | 'high' | 'default').

    Returns the previous mode name. Read at TRACE time: call before the
    first jitted call of the functions it should affect — already-cached
    jit traces keep the precision they were traced with.
    """
    global _DP_PRECISION_MODE
    prev = _DP_PRECISION_MODE
    _DP_PRECISION_MODE = _DP_MODES[mode.lower()]
    return {v: k for k, v in _DP_MODES.items()}[prev]


class dp_precision:
    """Context manager form of :func:`set_dp_precision` (trace-time).

    The mode is read when a function is TRACED, not when it runs: a
    function first traced inside the context keeps that precision after
    the context exits (jit caches the trace), and wrapping an
    already-traced jitted call does nothing. Use it around the *first*
    call of the functions it should affect, or call
    :func:`set_dp_precision` before building any traces.
    """

    def __init__(self, mode: str):
        self.mode = mode

    def __enter__(self):
        self._prev = set_dp_precision(self.mode)
        return self

    def __exit__(self, *exc):
        set_dp_precision(self._prev)
        return False

# The Mosaic kernels only lower on TPU backends; dispatch on an explicit
# allowlist (not a "anything unknown must be TPU" sniff) so a future backend
# falls back to the always-correct XLA path instead of failing to lower.
_TPU_BACKENDS = ("tpu", "axon")

# Unroll factor for the sequential (parallel_factor == 1) per-timestep scans.
# MEASURED NEGATIVE (TPU v5e, profile-HMM train step m=5 q<=155 b=64 L=400):
# HMM_SEQ_UNROLL=4 gives 11.2 ms/step vs 10.1 at unroll=1 — the scans are NOT
# loop-management-bound; the per-step cost is the dependent matmul chain
# itself (f32 HIGHEST = 6 MXU passes over q padded to 256 lanes), which
# unrolling only duplicates. Knob kept (default 1) for future shapes/chips;
# TPU-only so the CPU test-suite compile cache stays valid.
_SEQ_UNROLL_TPU = int(os.environ.get("HMM_SEQ_UNROLL", "1"))


def _seq_unroll() -> int:
    return (
        _SEQ_UNROLL_TPU if jax.default_backend() in _TPU_BACKENDS else 1
    )

__all__ = [
    "forward",
    "backward",
    "posterior",
    "log_likelihood",
    "viterbi",
    "recommended_parallel_factor",
    "ForwardResult",
]


class ForwardResult(NamedTuple):
    log_alpha: jax.Array  # (m, b, L, q) — log P(x_{1..t}, s_t = j)
    log_lik: jax.Array  # (m, b) — log P(x_{1..L})


def _clamped(x):
    return jnp.maximum(x, EPS)


# ---------------------------------------------------------------------------
# Sequential (parallel_factor == 1) recursions
# ---------------------------------------------------------------------------


def _forward_seq(init, A, E):
    """Scaled sequential forward. Returns (log_alpha (m,b,L,q), loglik (m,b))."""
    m, b, L, q = E.shape
    Et = jnp.moveaxis(E, 2, 0)  # (L, m, b, q)

    def first(e0):
        s = _clamped(e0) * _clamped(init)[:, None, :]
        z = jnp.sum(s, axis=-1, keepdims=True)
        return s / z, jnp.log(z[..., 0])

    alpha0, ll0 = first(Et[0])

    def step(carry, e_t):
        alpha, ll = carry
        r = jnp.einsum("mbq,mqp->mbp", alpha, A, precision=_dp_prec())
        s = _clamped(e_t) * _clamped(r)
        z = jnp.sum(s, axis=-1, keepdims=True)
        alpha_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        out = jnp.log(alpha_new) + ll_new[..., None]
        return (alpha_new, ll_new), out

    (alpha, ll), outs = lax.scan(
        step, (alpha0, ll0), Et[1:], unroll=_seq_unroll()
    )
    log_alpha0 = jnp.log(alpha0) + ll0[..., None]
    log_alpha = jnp.concatenate([log_alpha0[None], outs], axis=0)
    return jnp.moveaxis(log_alpha, 0, 2), ll


def _backward_seq(A, E):
    """Scaled sequential backward. Returns log_beta (m, b, L, q).

    beta_L = 1; beta_t(i) = sum_j A[i, j] * E_{t+1}(j) * beta_{t+1}(j).
    """
    m, b, L, q = E.shape
    Et = jnp.moveaxis(E, 2, 0)  # (L, m, b, q)

    beta_last = jnp.ones((m, b, q), E.dtype)
    ll_last = jnp.zeros((m, b), E.dtype)

    def step(carry, e_next):
        beta, ll = carry  # scaled beta at t+1, log-scale
        r = _clamped(e_next) * beta
        s = jnp.einsum("mbq,mpq->mbp", r, A, precision=_dp_prec())  # sum_j A[p, j] r[j]
        s = _clamped(s)
        z = jnp.max(s, axis=-1, keepdims=True)
        beta_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        out = jnp.log(beta_new) + ll_new[..., None]
        return (beta_new, ll_new), out

    # Consume emissions at positions L..2 (time-reversed), producing beta at
    # positions L-1..1.
    _, outs = lax.scan(
        step, (beta_last, ll_last), Et[1:], reverse=True,
        unroll=_seq_unroll(),
    )
    log_beta_last = jnp.zeros((1, m, b, q), E.dtype)
    log_beta = jnp.concatenate([outs, log_beta_last], axis=0)
    return jnp.moveaxis(log_beta, 0, 2)


def _viterbi_seq(init, A, E):
    """Max-plus Viterbi with backtrace. Returns state paths (m, b, L) int32."""
    log_A = jnp.log(_clamped(A))
    log_E = jnp.log(_clamped(E))
    log_init = jnp.log(_clamped(init))
    Et = jnp.moveaxis(log_E, 2, 0)  # (L, m, b, q)

    delta0 = log_init[:, None, :] + Et[0]  # (m, b, q)

    def step(delta, e_t):
        # scores[i, j] = delta[i] + log_A[i, j]; keep max and argmax over i.
        best, arg = maxargmatvec(delta, log_A[:, None, :, :])
        return best + e_t, arg

    delta_final, backptrs = lax.scan(
        step, delta0, Et[1:], unroll=_seq_unroll()
    )  # bp: (L-1, m, b, q)
    last_state = jnp.argmax(delta_final, axis=-1).astype(jnp.int32)  # (m, b)

    def backstep(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[..., None], axis=-1)[..., 0]
        return prev, prev

    _, path_rev = lax.scan(
        backstep, last_state, backptrs, reverse=True, unroll=_seq_unroll()
    )
    path = jnp.concatenate([path_rev, last_state[None]], axis=0)  # (L, m, b)
    return jnp.moveaxis(path, 0, 2)


# ---------------------------------------------------------------------------
# Chunked parallel recursions (parallel_factor > 1)
# ---------------------------------------------------------------------------


def _split_chunks(E, parallel_factor):
    m, b, L, q = E.shape
    if L % parallel_factor:
        raise ValueError(
            f"parallel_factor={parallel_factor} must divide seq_len={L}"
        )
    c = L // parallel_factor
    return E.reshape(m, b * parallel_factor, c, q), c


def _chunk_summaries(A, E, parallel_factor, first_chunk_identity=True):
    """Summary pass: per-chunk transfer operators.

    Returns ``C`` of shape (P, m, b, q, q) with
    ``C[p, ..., i, j] = log P(chunk-p emissions, right-border state j |
    left-border state i)`` where the left border is the state at the *first*
    position for chunk 0 (identity start) and the state at the last position
    of the previous chunk otherwise (transition-applied start) — the same
    conditioning scheme as ``MsaHmmCell.get_initial_state``
    (``MsaHmmCell.py:121-142``), built here without materializing per-position
    q² tensors.

    ``first_chunk_identity`` may be a traced boolean; sequence-sharded
    callers pass ``device_index == 0`` so that only the global first block
    uses the identity start.
    """
    m, b, L, q = E.shape
    P = parallel_factor
    Ec, c = _split_chunks(E, P)  # (m, bP, c, q)
    Et = jnp.moveaxis(Ec, 2, 0)  # (c, m, bP, q)

    eye = jnp.eye(q, dtype=E.dtype)
    # First-step operator rows: identity for chunk 0, A-rows for chunks > 0.
    is_first = jnp.asarray(
        (jnp.arange(P) == 0) & first_chunk_identity, E.dtype
    )[None, None, :, None, None]  # (1, 1, P, 1, 1)
    R0 = is_first * eye + (1.0 - is_first) * A[:, None, None]  # (m, 1|b, P, q, q)
    R0 = jnp.broadcast_to(R0, (m, b, P, q, q)).reshape(m, b * P, q, q)

    C = _summaries_from_rows(A, Et, R0)  # (m, bP, q, q)
    C = C.reshape(m, b, P, q, q)
    return jnp.moveaxis(C, 2, 0), c  # (P, m, b, q, q)


def _summaries_from_rows(A, Et, R0):
    """Scaled summary scan from arbitrary first-step operator rows.

    ``Et``: (c, m, bP, q) linear emissions; ``R0``: (m, bP, r, q) — ``r``
    border rows per chunk element (the full ``q`` for the dense engine; a
    local row block for border-sharded state parallelism, where each device
    owns a slice of the left-border conditioning axis and the scan needs no
    collectives at all). Returns log-space operators (m, bP, r, q).
    """

    def scale_rows(s):
        z = jnp.sum(s, axis=-1, keepdims=True)
        z = _clamped(z)
        return s / z, jnp.log(z[..., 0])

    M0, ll0 = scale_rows(_clamped(Et[0])[..., None, :] * _clamped(R0))

    def step(carry, e_t):
        M, ll = carry  # (m, bP, r, q) row-scaled, (m, bP, r)
        r = jnp.einsum("mbiq,mqp->mbip", M, A, precision=_dp_prec())
        s = _clamped(e_t)[..., None, :] * _clamped(r)
        M_new, dll = scale_rows(s)
        return (M_new, ll + dll), None

    (M, ll), _ = lax.scan(
        step, (M0, ll0), Et[1:], unroll=_seq_unroll()
    )
    return jnp.log(M) + ll[..., None]


def _boundary_values(init, C):
    """Exact forward/backward values at chunk boundaries.

    Two regimes, both serving prefix AND suffix in ONE batched stream (the
    suffix of ``C`` equals the flipped prefix of the flipped, transposed
    operators):

    * P <= 64 — a sequential VECTOR fold (one ``lax.scan`` of log-matvec
      steps): O(P·q²) work. The log-depth alternative below costs
      O(P log P · q³) matrix products plus their q³ exp/LSE broadcasts —
      measured 0.42 ms of a 1.36 ms flagship posterior at P=33 before this
      fold replaced it.
    * P > 64 — the log-matmul associative scan (sequential depth log P),
      worth its extra FLOPs only once P is large.

    Args:
        init: (m, q) linear initial distribution.
        C: (P, m, b, q, q) chunk operators from :func:`_chunk_summaries`.

    Returns:
        T: (P, m, b, q) — log forward at the *last* position of each chunk.
        S: (P, m, b, q) — log backward at the *last* position of each chunk
           (S[P-1] = 0).
        loglik: (m, b).
    """
    P, m, b, q = C.shape[:4]
    log_init = jnp.log(_clamped(init))  # (m, q)

    if P <= 64:
        D = jnp.flip(C, axis=0).swapaxes(-1, -2)
        v0 = jnp.broadcast_to(log_init[:, None, :], (m, b, q))
        u0 = jnp.concatenate([v0, jnp.zeros_like(v0)], axis=1)  # (m, 2b, q)

        def fold(u, X):
            u_new = logmatmul(u[..., None, :], X)[..., 0, :]
            return u_new, u_new

        _, outs = lax.scan(fold, u0, jnp.concatenate([C, D], axis=2))
        T = outs[:, :, :b]  # (P, m, b, q)
        W = outs[:, :, b:]  # W[k] = backward at the start of chunk P-1-k
        S = jnp.concatenate(
            [jnp.flip(W, axis=0)[1:], jnp.zeros_like(T[:1])], axis=0
        )
        loglik = jax.nn.logsumexp(T[-1], axis=-1)
        return T, S, loglik

    D = jnp.flip(C, axis=0).swapaxes(-1, -2)
    Y = lax.associative_scan(
        logmatmul, jnp.concatenate([C, D], axis=2), axis=0
    )
    # Pi[p] = C_0 ∘ ... ∘ C_p; suffix^T[p] = C_p ∘ ... ∘ C_{P-1} transposed.
    prefix = Y[:, :, :b]
    suffix_T = jnp.flip(Y[:, :, b:], axis=0)

    T = jax.nn.logsumexp(
        log_init[None, :, None, :, None] + prefix, axis=-2
    )  # (P, m, b, q)
    S_inner = jax.nn.logsumexp(suffix_T[1:], axis=-2)  # (P-1, m, b, q)
    S = jnp.concatenate(
        [S_inner, jnp.zeros_like(S_inner[:1])], axis=0
    )  # (P, m, b, q)

    loglik = jax.nn.logsumexp(T[-1], axis=-1)
    return T, S, loglik


def _forward_boundary_starts(init, A, T, first_start_log=None):
    """Per-chunk pre-emission start vectors, flattened to (m, bP, q).

    Chunk 0 starts from ``log(init)`` (or ``first_start_log`` — sequence-
    sharded callers pass the propagated boundary value entering their device
    block); chunk p > 0 from ``T[p-1]`` propagated through ``A``.
    """
    P, m, b, q = T.shape
    r_later = logmatmul(
        T[:-1][..., None, :], jnp.log(_clamped(A))[None, :, None]
    )[..., 0, :]
    if first_start_log is None:
        first_start_log = jnp.broadcast_to(
            jnp.log(_clamped(init))[:, None, :], (m, b, q)
        )
    R0_log = jnp.concatenate([first_start_log[None], r_later], axis=0)
    return jnp.moveaxis(R0_log, 0, 2).reshape(m, b * P, q)


def _forward_outputs(init, A, E, T, parallel_factor, first_start_log=None):
    """Output pass: exact log-forward at every position from boundary values."""
    m, b, L, q = E.shape
    P = parallel_factor
    Ec, c = _split_chunks(E, P)
    Et = jnp.moveaxis(Ec, 2, 0)  # (c, m, bP, q)

    R0_log = _forward_boundary_starts(init, A, T, first_start_log)
    ll0 = jax.nn.logsumexp(R0_log, axis=-1)  # (m, bP)
    r0 = jnp.exp(R0_log - ll0[..., None])

    def first(e0):
        s = _clamped(e0) * _clamped(r0)
        z = jnp.sum(s, axis=-1, keepdims=True)
        return s / z, ll0 + jnp.log(z[..., 0])

    alpha0, llc0 = first(Et[0])

    def step(carry, e_t):
        alpha, ll = carry
        r = jnp.einsum("mbq,mqp->mbp", alpha, A, precision=_dp_prec())
        s = _clamped(e_t) * _clamped(r)
        z = jnp.sum(s, axis=-1, keepdims=True)
        alpha_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        return (alpha_new, ll_new), jnp.log(alpha_new) + ll_new[..., None]

    _, outs = lax.scan(
        step, (alpha0, llc0), Et[1:], unroll=_seq_unroll()
    )
    first_out = (jnp.log(alpha0) + llc0[..., None])[None]
    log_alpha = jnp.concatenate([first_out, outs], axis=0)  # (c, m, bP, q)
    log_alpha = jnp.moveaxis(log_alpha, 0, 2).reshape(m, b, P, c, q)
    return log_alpha.reshape(m, b, L, q)


def _backward_outputs(A, E, S, parallel_factor):
    """Output pass: exact log-backward at every position from boundary values."""
    m, b, L, q = E.shape
    P = parallel_factor
    Ec, c = _split_chunks(E, P)
    Et = jnp.moveaxis(Ec, 2, 0)  # (c, m, bP, q)

    # Right-boundary beta per chunk (at the chunk's last position).
    S_flat = jnp.moveaxis(S, 0, 2).reshape(m, b * P, q)  # (m, bP, q)
    ll0 = jnp.max(S_flat, axis=-1)
    beta0 = jnp.exp(S_flat - ll0[..., None])

    def step(carry, e_next):
        beta, ll = carry
        r = _clamped(e_next) * beta
        s = jnp.einsum("mbq,mpq->mbp", r, A, precision=_dp_prec())
        s = _clamped(s)
        z = jnp.max(s, axis=-1, keepdims=True)
        beta_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        return (beta_new, ll_new), jnp.log(beta_new) + ll_new[..., None]

    # Consume within-chunk emissions at positions c-1..1 (of the chunk),
    # producing beta at positions c-2..0.
    _, outs = lax.scan(
        step, (beta0, ll0), Et[1:], reverse=True, unroll=_seq_unroll()
    )
    last = (jnp.log(beta0) + ll0[..., None])[None]
    log_beta = jnp.concatenate([outs, last], axis=0)  # (c, m, bP, q)
    log_beta = jnp.moveaxis(log_beta, 0, 2).reshape(m, b, P, c, q)
    return log_beta.reshape(m, b, L, q)


# ---------------------------------------------------------------------------
# Pallas fast path for the sum-product chunked pipeline (inference-speed
# posterior/log-likelihood; gradients are analytic custom_vjp adjoints —
# see _loglik_chunked_fast / _posterior_chunked_fast below).
# ---------------------------------------------------------------------------


def _pallas_backend_ok() -> bool:
    return (
        pallas_viterbi.FORCE_INTERPRET
        or jax.default_backend() in _TPU_BACKENDS
    )


def _use_pallas(q: int, m: int) -> bool:
    return pallas_forward.supported(q, m) and _pallas_backend_ok()


def _pallas_chunk_inputs(E, P):
    """Emissions in the kernels' (m, c, q, R_pad) lane layout."""
    m, b, L, q = E.shape
    Ec, c = _split_chunks(E, P)
    R = b * P
    R_pad = pallas_viterbi.pad_chunk_elements(R)
    # (m, bP, c, q) -> (m, c, q, R): states on sublanes, chunk elems on lanes.
    E_T = _pad_lanes(jnp.moveaxis(_clamped(Ec), 1, -1), R_pad, value=1.0)
    return E_T, c, R, R_pad


def _chunk_summaries_pallas(A, E_T, P, m, b, R):
    """vmap over models: the model axis becomes a leading grid dimension."""
    q = A.shape[-1]
    C_flat = jax.vmap(
        lambda A1, E1: pallas_forward.sum_chunk_summaries(
            A1, E1, P, interpret=pallas_viterbi.FORCE_INTERPRET
        )
    )(A, E_T)[:, :R]  # (m, R, q, q), lanes b-major chunk-minor
    return jnp.moveaxis(C_flat.reshape(m, b, P, q, q), 2, 0)


def _pad_lanes(x, R_pad, value=0.0):
    R = x.shape[-1]
    if R_pad == R:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, R_pad - R)]
    return jnp.pad(x, pad, constant_values=value)


def _posterior_chunked_pallas(init, A, E, P, no_loglik):
    m, b, L, q = E.shape
    E_T, c, R, R_pad = _pallas_chunk_inputs(E, P)
    C = _chunk_summaries_pallas(A, E_T, P, m, b, R)
    T, S, ll = _boundary_values(init, C)
    interpret = pallas_viterbi.FORCE_INTERPRET

    R0_log = _forward_boundary_starts(init, A, T)
    ll0 = jax.nn.logsumexp(R0_log, axis=-1)  # (m, R)
    r0 = jnp.exp(R0_log - ll0[..., None])
    log_alpha = jax.vmap(
        lambda A1, E1, r1, l1: pallas_forward.sum_fwd_outputs(
            A1, E1, r1, l1, interpret=interpret
        )
    )(
        A,
        E_T,
        _pad_lanes(jnp.swapaxes(r0, -1, -2), R_pad, 1.0),
        _pad_lanes(ll0, R_pad),
    )  # (m, c, PAD, R_pad)

    # Backward boundary starts (same construction as _backward_outputs).
    S_flat = jnp.moveaxis(S, 0, 2).reshape(m, b * P, q)
    ll0b = jnp.max(S_flat, axis=-1)
    beta0 = jnp.exp(S_flat - ll0b[..., None])
    log_beta = jax.vmap(
        lambda A1, E1, b1, l1: pallas_forward.beta_bwd_outputs(
            A1, E1, b1, l1, interpret=interpret
        )
    )(
        A,
        E_T,
        _pad_lanes(jnp.swapaxes(beta0, -1, -2), R_pad, 1.0),
        _pad_lanes(ll0b, R_pad),
    )
    # Posterior combine in XLA (one fused elementwise pass).
    log_gamma = (log_alpha + log_beta)[:, :, :q, :R]  # (m, c, q, R)
    if not no_loglik:
        ll_lane = jnp.broadcast_to(ll[..., None], (m, b, P)).reshape(m, R)
        log_gamma = log_gamma - ll_lane[:, None, None, :]

    def to_mblq(x):  # (m, c, q, R) -> (m, b, L, q); lanes are b-major
        return jnp.moveaxis(x, (1, 2, 3), (2, 3, 1)).reshape(m, b, L, q)

    return (
        to_mblq(log_gamma),
        ll,
        to_mblq(log_alpha[:, :, :q, :R]),
    )


def _posterior_chunked_xla(init, A, E, P, no_loglik):
    C, _ = _chunk_summaries(A, E, P)
    T, S, ll = _boundary_values(init, C)
    la = _forward_outputs(init, A, E, T, P)
    lb = _backward_outputs(A, E, S, P)
    log_gamma = la + lb
    if not no_loglik:
        log_gamma = log_gamma - ll[..., None, None]
    return log_gamma, ll, la



def _forward_adjoint_weights(la, log_E):
    """(u, v) diagonals of the log-forward adjoint maps ``diag(u) A diag(v)``.

    ``v`` (gbar) is pre-shifted by one step and zeroed at t = L-1 (terminal
    condition x_L = 0). These softmax-weight constructions are the
    numerically sensitive core of every analytic VJP — keep single-sourced.
    """
    m, b, L, q = la.shape
    s = jnp.max(la, axis=-1, keepdims=True)
    f = jnp.exp(la - s)
    gbar = jnp.concatenate(
        [
            jnp.exp(log_E[:, :, 1:] + s[:, :, :-1] - la[:, :, 1:]),
            jnp.zeros((m, b, 1, q), la.dtype),
        ],
        axis=2,
    )
    return f, gbar


def _backward_adjoint_weights(lb, log_E):
    """(u, v) diagonals of the log-backward adjoint maps (time-flipped use).

    Returns (fp, gp, sp, elb); ``fp`` is zero at t = 0.
    """
    m, b, L, q = lb.shape
    elb = log_E + lb
    sp = jnp.max(elb, axis=-1, keepdims=True)
    fp = jnp.concatenate(
        [
            jnp.zeros((m, b, 1, q), lb.dtype),
            jnp.exp(sp[:, :, 1:] - lb[:, :, :-1]),
        ],
        axis=2,
    )
    gp = jnp.exp(elb - sp)
    return fp, gp, sp, elb


def _forward_gA_factors(la, log_E):
    """Balanced-shift factors for the xi-style gA einsum of the la adjoint:
    ``gA = einsum(F, x[1:] * exp(log_E - la + csh)[1:])``."""
    csh = jnp.max(la[:, :, :-1], axis=-1, keepdims=True)
    F = jnp.exp(la[:, :, :-1] - csh)

    def G_of(x):
        return x[:, :, 1:] * jnp.exp(log_E[:, :, 1:] - la[:, :, 1:] + csh)

    return F, G_of, csh


def _backward_gA_factors(lb, sp, elb):
    """Balanced-shift factors for the gA einsum of the lb adjoint."""

    def Fp_of(x):
        return x[:, :, :-1] * jnp.exp(sp[:, :, 1:] - lb[:, :, :-1])

    Gp = jnp.exp(elb[:, :, 1:] - sp[:, :, 1:])
    return Fp_of, Gp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _forward_chunked_fast(init, A, E, P):
    """Chunked forward values with an analytic adjoint VJP.

    Same memory argument as the loglik/posterior VJPs: autodiff through the
    summary scan tapes O(L·q²); the adjoint of the log-forward recursion is
    one chunked affine solve over O(L·q) residuals. Unlike the posterior
    VJP no gamma-centering is needed — without the loglik normalization the
    adjoint's O(L) growth is the true gradient magnitude, representable
    directly in f32. Reverse-mode only (parallel_factor=1 for jvp/jacfwd).
    """
    return _forward_chunked_primal(init, A, E, P)


def _forward_chunked_primal(init, A, E, P):
    C = _chunk_summaries_dispatch(A, E, P)
    T, _, ll = _boundary_values(init, C)
    la = _forward_outputs(init, A, E, T, P)
    return la, ll


def _forward_fast_fwd(init, A, E, P):
    la, ll = _forward_chunked_primal(init, A, E, P)
    return (la, ll), (init, A, E, la, ll)


def _forward_fast_bwd(P, res, cts):
    init, A, E, la, ll = res
    ct_la, ct_ll = cts
    m, b, L, q = E.shape
    log_E = jnp.log(_clamped(E))
    maskE = E >= EPS

    # Fold the loglik cotangent into the terminal source:
    # ll = LSE(la_{L-1}) -> d ll / d la_{L-1} = softmax(la_{L-1}).
    src = ct_la.at[:, :, L - 1].add(
        ct_ll[..., None] * jnp.exp(la[:, :, L - 1] - ll[..., None])
    )
    f, gbar = _forward_adjoint_weights(la, log_E)
    bar = _chunked_affine_reverse(A, f, gbar, src, P)

    gE = bar / _clamped(E) * maskE
    ginit = jnp.sum(bar[:, :, 0], axis=1) / _clamped(init) * (init >= EPS)
    F, G_of, _ = _forward_gA_factors(la, log_E)
    gA = jnp.einsum("mbti,mbtj->mij", F, G_of(bar), precision=_dp_prec())
    return ginit, gA, gE


_forward_chunked_fast.defvjp(_forward_fast_fwd, _forward_fast_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _backward_chunked_fast(init, A, E, P):
    """Chunked backward values with an analytic adjoint VJP (see
    :func:`_forward_chunked_fast`)."""
    return _backward_chunked_primal(init, A, E, P)


def _backward_chunked_primal(init, A, E, P):
    C = _chunk_summaries_dispatch(A, E, P)
    _, S, _ = _boundary_values(init, C)
    return _backward_outputs(A, E, S, P)


def _backward_fast_fwd(init, A, E, P):
    lb = _backward_chunked_primal(init, A, E, P)
    return lb, (init, A, E, lb)


def _backward_fast_bwd(P, res, ct):
    init, A, E, lb = res
    m, b, L, q = E.shape
    log_E = jnp.log(_clamped(E))
    maskE = E >= EPS

    fp, gp, sp, elb = _backward_adjoint_weights(lb, log_E)
    A_T = jnp.swapaxes(A, -1, -2)
    flip = lambda x: jnp.flip(x, axis=2)
    cb = flip(_chunked_affine_reverse(A_T, flip(gp), flip(fp), flip(ct), P))
    cbhat = cb - ct

    gE = cbhat / _clamped(E) * maskE
    Fp_of, Gp = _backward_gA_factors(lb, sp, elb)
    gA = jnp.einsum("mbti,mbtj->mij", Fp_of(cb), Gp, precision=_dp_prec())
    return jnp.zeros_like(init), gA, gE


_backward_chunked_fast.defvjp(_backward_fast_fwd, _backward_fast_bwd)


def _use_pallas_affine(q: int) -> bool:
    return pallas_adjoint.supported(q) and _pallas_backend_ok()


def _affine_lanes(x, P, R_pad):
    """(m, b, L, q) -> (m, c, q, R_pad) kernel lane layout, zero-padded."""
    m, b, L, q = x.shape
    c = L // P
    xc = jnp.moveaxis(x.reshape(m, b * P, c, q), 1, -1)  # (m, c, q, R)
    return _pad_lanes(xc, R_pad)


def _affine_composites(B, u, v, cvec, P):
    """Per-chunk composite affine maps ``[K | o]`` of the reverse adjoint
    recursion; (P, m, b, q, q+1). Dispatches to the Pallas kernel on TPU."""
    m, b, L, q = cvec.shape
    if _use_pallas_affine(q):
        R = b * P
        R_pad = pallas_viterbi.pad_chunk_elements(R)
        interpret = pallas_viterbi.FORCE_INTERPRET
        U, V, S = (
            _affine_lanes(u, P, R_pad),
            _affine_lanes(v, P, R_pad),
            _affine_lanes(cvec, P, R_pad),
        )
        comp = jax.vmap(
            lambda B1, U1, V1, S1: pallas_adjoint.affine_chunk_composites(
                B1, U1, V1, S1, interpret=interpret
            )
        )(B, U, V, S)[:, :R]  # (m, R, q, q+1)
        return jnp.moveaxis(comp.reshape(m, b, P, q, q + 1), 2, 0)

    c = L // P

    def to_chunks(x):
        return jnp.moveaxis(x.reshape(m, b * P, c, q), 2, 0)  # (c, m, bP, q)

    ut, vt, ctt = to_chunks(u), to_chunks(v), to_chunks(cvec)

    def apply_M(u_t, v_t, X):
        Y = v_t[..., :, None] * X
        Z = jnp.einsum("miq,mbqk->mbik", B, Y, precision=_dp_prec())
        return u_t[..., :, None] * Z

    eye = jnp.broadcast_to(jnp.eye(q, dtype=cvec.dtype), (m, b * P, q, q))
    X0 = jnp.concatenate(
        [eye, jnp.zeros((m, b * P, q, 1), cvec.dtype)], axis=-1
    )

    def sum_step(X, inp):
        u_t, v_t, c_t = inp
        Z = apply_M(u_t, v_t, X)
        Z = Z.at[..., -1].add(c_t)
        return Z, None

    X, _ = lax.scan(
        sum_step, X0, (ut, vt, ctt), reverse=True, unroll=_seq_unroll()
    )
    return jnp.moveaxis(X.reshape(m, b, P, q, q + 1), 2, 0)


def _affine_boundary_fold(comp, x_term):
    """Right-to-left fold over chunk composites from terminal ``x_term``.

    Returns ``rights`` (P, m, b, q): the adjoint entering each chunk's
    right edge (rights[P-1] = x_term).
    """
    q = comp.shape[-2]

    def fold(vb, comp_p):
        x_start = comp_p[..., -1] + jnp.einsum(
            "mbij,mbj->mbi", comp_p[..., :q], vb, precision=_dp_prec()
        )
        return x_start, vb

    _, rights = lax.scan(fold, x_term, comp, reverse=True)
    return rights


def _affine_outputs(B, u, v, cvec, P, rights):
    """Per-position adjoints from per-chunk right-edge values ``rights``
    (P, m, b, q). Dispatches to the Pallas kernel on TPU."""
    m, b, L, q = cvec.shape
    if _use_pallas_affine(q):
        R = b * P
        R_pad = pallas_viterbi.pad_chunk_elements(R)
        interpret = pallas_viterbi.FORCE_INTERPRET
        U, V, S = (
            _affine_lanes(u, P, R_pad),
            _affine_lanes(v, P, R_pad),
            _affine_lanes(cvec, P, R_pad),
        )
        x_right = jnp.moveaxis(rights, 0, 2).reshape(m, R, q)
        x0 = _pad_lanes(
            jnp.pad(
                jnp.swapaxes(x_right, -1, -2),
                ((0, 0), (0, pallas_viterbi.PAD - q), (0, 0)),
            ),
            R_pad,
        )
        out = jax.vmap(
            lambda B1, U1, V1, S1, x1: pallas_adjoint.affine_reverse_outputs(
                B1, U1, V1, S1, x1, interpret=interpret
            )
        )(B, U, V, S, x0)  # (m, c, PAD, R_pad)
        x = jnp.moveaxis(out[:, :, :q, :R], (1, 2, 3), (2, 3, 1))
        return x.reshape(m, b, L, q)

    c = L // P

    def to_chunks(x):
        return jnp.moveaxis(x.reshape(m, b * P, c, q), 2, 0)

    ut, vt, ctt = to_chunks(u), to_chunks(v), to_chunks(cvec)
    x_right = jnp.moveaxis(rights, 0, 2).reshape(m, b * P, q)

    def out_step(x, inp):
        u_t, v_t, c_t = inp
        x_new = c_t + u_t * jnp.einsum(
            "miq,mbq->mbi", B, v_t * x, precision=_dp_prec()
        )
        return x_new, x_new

    _, xs = lax.scan(
        out_step, x_right, (ut, vt, ctt), reverse=True, unroll=_seq_unroll()
    )
    return jnp.moveaxis(xs, 0, 2).reshape(m, b, L, q)


def _chunked_affine_reverse(B, u, v, cvec, P, x_term=None):
    """Chunked solve of ``x_t = cvec_t + u_t * (B @ (v_t * x_{t+1}))``
    (terminal ``x_L = x_term``, default 0) — composites, boundary fold,
    output passes; Pallas kernels on TPU."""
    m, b, _, q = cvec.shape
    comp = _affine_composites(B, u, v, cvec, P)
    if x_term is None:
        x_term = jnp.zeros((m, b, q), cvec.dtype)
    rights = _affine_boundary_fold(comp, x_term)
    return _affine_outputs(B, u, v, cvec, P, rights)


def _posterior_vjp_residuals(no_loglik, saved):
    """la, lb, ll for the adjoint pass, recovered from the saved primal
    outputs: lb = lg - la [+ ll]."""
    la, lg, ll = saved
    lb = lg - la
    if not no_loglik:
        lb = lb + ll[..., None, None]
    return la, lb, ll


def _posterior_analytic_vjp(init, A, E, P, no_loglik, ct, ct_ll_direct, saved):
    """Analytic VJP of the chunked posterior (chunked adjoint scans).

    ``log_gamma = la + lb [- ll]``; the pullbacks are assembled from one
    primal recompute plus two chunked affine adjoint solves — O(L·q)
    residual memory and chunk-parallel depth, vs. taping the O(L·q²)
    summary-scan carries under autodiff.

    Stability: the raw adjoints grow O(L) along the ``gamma`` direction
    (the adjoint maps are sum-preserving with ``M γ_{t+1} = γ_t`` /
    ``Nᵀ γ_{t-1} = γ_t`` as exact flow identities) and those parts cancel
    against the loglik-normalization pullback only at the very end — a
    catastrophic f32 cancellation at L ≳ 1000. So each adjoint is solved in
    the decomposition ``adjoint_t = γ_t · (cumulative scalar) + residual``
    with a CENTERED source (zero-sum, preserved by the maps, hence bounded
    residuals); the scalar parts combine in closed form. Validated against
    an f64 autodiff oracle at L=1200.
    """
    m, b, L, q = E.shape
    la, lb, ll = _posterior_vjp_residuals(no_loglik, saved)
    log_E = jnp.log(_clamped(E))
    maskE = E >= EPS
    gam = jnp.exp(la + lb - ll[..., None, None])  # (m, b, L, q)

    # Scalar bookkeeping (exact cumsums; no large-term cancellation is ever
    # evaluated numerically — see the closed forms below).
    sig = jnp.sum(ct, axis=-1)  # (m, b, L)
    sig_tot = jnp.sum(sig, axis=-1)  # (m, b)
    ct_ll_eff = ct_ll_direct if no_loglik else ct_ll_direct - sig_tot

    # --- centered adjoints of la and lb, solved as ONE batched call -----------
    # la adjoint: reverse-time with maps diag(f) A diag(gbar); the terminal
    # ll-fold (ll = LSE(la_{L-1})) adds ct_ll_eff * gamma_{L-1} to the
    # source, whose centered part is identically zero — it enters only via
    # the cumulative scalar R below.
    src = ct - gam * sig[..., None]  # centered (same for both adjoints)
    f, gbar = _forward_adjoint_weights(la, log_E)
    # lb adjoint: forward-time with maps diag(gp) A^T diag(fp) — a reverse
    # recursion on the flipped time axis. Stacking it as extra "models"
    # (B = [A; A^T]) halves the scan count and doubles the matmul batch.
    fp, gp, sp, elb = _backward_adjoint_weights(lb, log_E)
    A_T = jnp.swapaxes(A, -1, -2)
    flip = lambda x: jnp.flip(x, axis=2)

    B2 = jnp.concatenate([A, A_T], axis=0)
    u2 = jnp.concatenate([f, flip(gp)], axis=0)
    v2 = jnp.concatenate([gbar, flip(fp)], axis=0)
    c2 = jnp.concatenate([src, flip(src)], axis=0)
    x2 = _chunked_affine_reverse(B2, u2, v2, c2, P)
    bhat, chat = x2[:m], flip(x2[m:])
    # Project out numerical drift along the growing gamma mode: the exact
    # residuals have zero sum (the maps conserve the sum functional), so any
    # accumulated sum is f32 flow error riding the gamma direction.
    bhat = bhat - gam * jnp.sum(bhat, axis=-1, keepdims=True)
    chat = chat - gam * jnp.sum(chat, axis=-1, keepdims=True)
    # bar_t = gam_t * R_t + bhat_t with R_t = sum_{s>=t} sig_s + ct_ll_eff;
    # cb_t = gam_t * S_t + chat_t with S_t = sum_{s<=t} sig_s. R and S enter
    # only through the closed forms below (K, R0, kappa) — the large
    # cumulative parts are never materialized against each other.

    # --- assemble --------------------------------------------------------------
    # bar + cb - ct = gam*(R + S) + bhat + chat - ct, with the closed form
    # R_t + S_t = sig_t + ct_ll_direct [+ sig_tot if no_loglik].
    K = sig + ct_ll_direct[..., None]
    if no_loglik:
        K = K + sig_tot[..., None]
    gE = (gam * K[..., None] + bhat + chat - ct) / _clamped(E) * maskE

    # ginit: bar_0 with R_0 = sig_tot + ct_ll_eff (= ct_ll_direct when the
    # normalization is active).
    R0 = sig_tot + ct_ll_eff
    bar0 = gam[:, :, 0] * R0[..., None] + bhat[:, :, 0]
    ginit = jnp.sum(bar0, axis=1) / _clamped(init) * (init >= EPS)

    # gA: the gamma parts of both adjoints reduce to the Baum-Welch xi
    # statistic weighted by the constant R_t + S_{t-1} = K_t - sig_t.
    kappa = ct_ll_direct + (sig_tot if no_loglik else 0.0)  # (m, b)
    F, G_of, csh = _forward_gA_factors(la, log_E)
    xi_u = (
        jnp.exp(lb[:, :, 1:] + log_E[:, :, 1:] - ll[..., None, None] + csh)
        * kappa[..., None, None]
    )
    # Residual of the lb adjoint only — its gamma*S part is inside kappa.
    Fp_of, Gp = _backward_gA_factors(lb, sp, elb)
    gA = (
        jnp.einsum("mbti,mbtj->mij", F, xi_u + G_of(bhat), precision=_dp_prec())
        + jnp.einsum("mbti,mbtj->mij", Fp_of(chat), Gp, precision=_dp_prec())
    )
    return ginit, gA, gE


def _posterior_chunked_primal(init, A, E, P, no_loglik):
    m, _, _, q = E.shape
    if _use_pallas(q, m):
        return _posterior_chunked_pallas(init, A, E, P, no_loglik)
    return _posterior_chunked_xla(init, A, E, P, no_loglik)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _posterior_chunked_fast(init, A, E, P, no_loglik):
    """Chunked posterior (Pallas where supported) with analytic gradients.

    The VJP runs chunked adjoint recursions
    (:func:`_posterior_analytic_vjp`) over residuals saved from the primal
    (log-forward comes out of the forward output pass; log-backward is
    recovered as ``lg - la [+ ll]``) — reverse-mode only, like every
    custom_vjp (use ``parallel_factor=1`` for jax.jvp/jacfwd).
    """
    lg, ll, _ = _posterior_chunked_primal(init, A, E, P, no_loglik)
    return lg, ll


def _posterior_fast_fwd(init, A, E, P, no_loglik):
    lg, ll, la = _posterior_chunked_primal(init, A, E, P, no_loglik)
    return (lg, ll), (init, A, E, la, lg, ll)


def _posterior_fast_bwd(P, no_loglik, res, cts):
    init, A, E, la, lg, ll = res
    ct, ct_ll_direct = cts  # cotangents of (log_gamma, loglik)
    return _posterior_analytic_vjp(
        init, A, E, P, no_loglik, ct, ct_ll_direct, saved=(la, lg, ll)
    )


_posterior_chunked_fast.defvjp(_posterior_fast_fwd, _posterior_fast_bwd)


def _chunk_summaries_dispatch(A, E, P):
    m, b, L, q = E.shape
    if _use_pallas(q, m):
        E_T, c, R, R_pad = _pallas_chunk_inputs(E, P)
        return _chunk_summaries_pallas(A, E_T, P, m, b, R)
    if (
        pallas_mxu.MXU_KERNELS
        and pallas_mxu.mxu_supported(q)
        and _pallas_backend_ok()
    ):
        # Dormant MXU formulation (HMM_PALLAS_MXU=1) — see ops.pallas_mxu.
        Ec, _ = _split_chunks(_clamped(E), P)  # (m, bP, c, q)
        E_S = jnp.moveaxis(Ec, 2, 1)  # (m, c, bP, q): states on lanes
        C_flat = jax.vmap(
            lambda A1, E1: pallas_mxu.sum_chunk_summaries_mxu(
                A1, E1, P, interpret=pallas_viterbi.FORCE_INTERPRET
            )
        )(A, E_S)  # (m, R, q, q)
        return jnp.moveaxis(C_flat.reshape(m, b, P, q, q), 2, 0)
    return _chunk_summaries(A, E, P)[0]


def _forward_boundaries(init, C):
    """Prefix-only fold of chunk operators: ``T`` (log forward at each
    chunk's last position) without the suffix products — for callers that
    do not need the backward direction (the fused prefix+suffix stream in
    :func:`_boundary_values` is not reliably DCE'd down to one direction)."""
    log_init = jnp.log(_clamped(init))
    m, b = C.shape[1:3]
    v0 = jnp.broadcast_to(log_init[:, None], (m, b, log_init.shape[-1]))

    def fold(v, C_p):
        v_new = logmatmul(v[..., None, :], C_p)[..., 0, :]
        return v_new, v_new

    _, T = lax.scan(fold, v0, C)
    return T


def _loglik_from_C(init, C):
    return jax.nn.logsumexp(_forward_boundaries(init, C)[-1], axis=-1)


def _loglik_chunked_primal(init, A, E, P):
    return _loglik_from_C(init, _chunk_summaries_dispatch(A, E, P))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _loglik_chunked_fast(init, A, E, P):
    """Chunked log-likelihood with an analytic (Baum-Welch) VJP.

    Autodiff through the summary scan would tape the O(L·q²) operator
    carries; the analytic gradient needs only one forward + one backward
    pass (cf. the linear-memory Baum-Welch formulation, PAPERS.md):

        dll/dE_t(j)  = gamma_t(j) / E_t(j)
        dll/dA(i,j)  = sum_t alpha_{t-1}(i) E_t(j) beta_t(j) / P(x)
        dll/dpi(i)   = E_0(i) beta_0(i) / P(x)

    with zero gradient where the init/E EPS clamps bind (A is not clamped
    by the recursion, so exact-zero transitions still receive their true
    nonzero gradient, matching autodiff). Matches autodiff of the scaled
    sequential recursion to fp tolerance (~1e-6 rel). Reverse-mode only:
    custom_vjp functions do not support jax.jvp/jacfwd — use
    ``parallel_factor=1`` for forward-mode differentiation.
    """
    return _loglik_chunked_primal(init, A, E, P)


# Save the chunk operators as VJP residuals when small (~1 MB at the
# flagship shape; ~1 GB at profile shapes, where the chunked path is not
# used anyway) — the backward then skips the whole summary pass.
_LOGLIK_RESIDUAL_C_MAX_BYTES = 32 * 1024 * 1024


def _save_C(E, P):
    m, b, L, q = E.shape
    return P * m * b * q * q * 4 <= _LOGLIK_RESIDUAL_C_MAX_BYTES


def _loglik_fast_fwd(init, A, E, P):
    C = _chunk_summaries_dispatch(A, E, P)
    ll = _loglik_from_C(init, C)
    return ll, (init, A, E, C if _save_C(E, P) else None)


def _loglik_bw_stats(init, A, E, la, lb, ll, ct):
    """Baum-Welch gradient statistics shared by the chunked and sequential
    analytic log-likelihood VJPs."""
    log_E = jnp.log(_clamped(E))

    lgam = la + lb - ll[..., None, None]
    gE = jnp.exp(lgam - log_E) * (E >= EPS) * ct[..., None, None]
    ginit = (
        jnp.sum(
            jnp.exp(log_E[:, :, 0] + lb[:, :, 0] - ll[..., None])
            * ct[..., None],
            axis=1,
        )
        * (init >= EPS)
    )
    # Expected transition statistics: shift each timestep by the row max of
    # log alpha so both einsum factors stay in f32 range (their product is
    # O(1); the factors alone would over/underflow at |ll| ~ L).
    cshift = jnp.max(la[:, :, :-1], axis=-1, keepdims=True)
    w = jnp.exp(la[:, :, :-1] - cshift)
    u = (
        jnp.exp(lb[:, :, 1:] + log_E[:, :, 1:] - ll[..., None, None] + cshift)
        * ct[..., None, None]
    )
    gA = jnp.einsum("mbti,mbtj->mij", w, u, precision=_dp_prec())
    return ginit, gA, gE


def _loglik_fast_bwd(P, res, ct):
    init, A, E, C = res
    if C is None:
        # One summary pass serves both directions.
        C = _chunk_summaries_dispatch(A, E, P)
    T, S, ll = _boundary_values(init, C)
    la = _forward_outputs(init, A, E, T, P)
    lb = _backward_outputs(A, E, S, P)
    return _loglik_bw_stats(init, A, E, la, lb, ll, ct)


_loglik_chunked_fast.defvjp(_loglik_fast_fwd, _loglik_fast_bwd)


@jax.custom_vjp
def _loglik_seq_fast(init, A, E):
    """Sequential log-likelihood with an analytic Baum-Welch VJP.

    The profile-HMM training regime (large q, multi-model) runs
    ``parallel_factor=1`` (sequential scans beat the O(q³)-per-position
    chunk operators there, BASELINE.md round-2 table); its gradient through
    taped autodiff costs ~3x the forward pass AND tapes O(L·b·q) alphas.
    The analytic VJP needs one forward + one backward pass plus the shared
    Baum-Welch statistics (:func:`_loglik_bw_stats`).
    """
    return _loglik_seq_primal(init, A, E)


def _loglik_seq_primal(init, A, E):
    Et = jnp.moveaxis(E, 2, 0)
    s0 = _clamped(Et[0]) * _clamped(init)[:, None, :]
    z0 = jnp.sum(s0, axis=-1, keepdims=True)
    carry0 = (s0 / z0, jnp.log(z0[..., 0]))

    def step(carry, e_t):
        alpha, ll = carry
        r = jnp.einsum("mbq,mqp->mbp", alpha, A, precision=_dp_prec())
        s = _clamped(e_t) * _clamped(r)
        z = jnp.sum(s, axis=-1, keepdims=True)
        return (s / z, ll + jnp.log(z[..., 0])), None

    (alpha, ll), _ = lax.scan(
        step, carry0, Et[1:], unroll=_seq_unroll()
    )
    return ll


def _loglik_seq_fwd(init, A, E):
    return _loglik_seq_primal(init, A, E), (init, A, E)


def _loglik_seq_bwd(res, ct):
    init, A, E = res
    la, ll = _forward_seq(init, A, E)
    lb = _backward_seq(A, E)
    return _loglik_bw_stats(init, A, E, la, lb, ll, ct)


_loglik_seq_fast.defvjp(_loglik_seq_fwd, _loglik_seq_bwd)


# ---------------------------------------------------------------------------
# Chunked parallel Viterbi (max-plus two-pass scan)
# ---------------------------------------------------------------------------

# Sentinel for impossible paths in the tropical semiring. Unlike LOG_ZERO
# (soft, gradient-friendly) this must never win an argmax against any real
# path score, including paths of clamped-EPS steps over long chunks. A plain
# Python float, NOT a jnp constant: materializing a device array at module
# scope would initialize the backend on import (and hang imports entirely
# when the device transport is unreachable).
_NEG = -1e30


def _viterbi_seq_pallas(init, A, E):
    """Sequential Pallas decode: delta pass + backtrace kernels over the
    full sequence (lanes = batch).

    The tropical semiring has no MXU mapping in ANY formulation (max-plus
    is not a matmul), so at 16 < q <= 64 the VPU max-tree with pinned
    layouts is the fastest decode. Measured on TPU v5e at b=32, L=3069
    (vs the best XLA alternative, the sequential scan; the chunked XLA
    path is 18-1700 ms at these q — O(q^3) per position is algorithmically
    wrong above ~16 states, benchmarks/largeq_probe.py):

        q=33 m=1: 2.99 ms vs 6.47 ms (2.2x)
        q=33 m=5: 16.9 ms vs 18.3 ms (1.1x)
        q=64 m=1: 7.97 ms vs 8.37 ms (1.05x)
    """
    m, b, L, q = E.shape
    interpret = pallas_viterbi.FORCE_INTERPRET
    log_A = jnp.log(_clamped(A))
    log_init = jnp.log(_clamped(init))
    log_E = jnp.log(_clamped(E))
    R_pad = pallas_viterbi.pad_chunk_elements(b)
    E_T = jnp.moveaxis(log_E, 1, -1)  # (m, L, q, b)
    if R_pad != b:
        E_T = jnp.pad(
            E_T, ((0, 0), (0, 0), (0, 0), (0, R_pad - b)), constant_values=_NEG
        )
    delta0 = log_init[:, :, None] + E_T[:, 0]  # (m, q, R_pad)
    deltas = jax.vmap(
        lambda A1, E1, d1: pallas_viterbi.maxplus_deltas(
            A1, E1, d1, interpret=interpret
        )
    )(log_A, E_T, delta0)  # (m, L, qp, R_pad)
    last = jnp.argmax(deltas[:, -1, :q, :], axis=1).astype(jnp.int32)
    states = jax.vmap(
        lambda A1, d1, s1: pallas_viterbi.maxplus_backtrace(
            A1, d1, s1, interpret=interpret
        )
    )(log_A, deltas, last)  # (m, L, R_pad)
    return jnp.swapaxes(states, -1, -2)[:, :b, :]


def _use_pallas_seq_viterbi(q: int) -> bool:
    return (
        pallas_viterbi.PAD < q <= pallas_viterbi.MAX_BLOCKED_Q
        and _pallas_backend_ok()
    )


def _viterbi_chunked(init, A, E, parallel_factor):
    """Parallel Viterbi: identical two-pass structure as the sum-product
    engine, with the tropical semiring ``(max, +)`` in log space.

    Decode = chunk-level backtrace over the transfer operators, then
    per-chunk *conditional* delta recursions and within-chunk backtraces
    (see :func:`_boundary_backtrace` for why a positionwise
    ``argmax(delta + psi)`` is not f32-safe). Sequential depth is
    O(L/P + log P).
    """
    m, b, L, q = E.shape
    P = parallel_factor
    log_A = jnp.log(_clamped(A))  # (m, q, q)
    log_init = jnp.log(_clamped(init))  # (m, q)
    log_E = jnp.log(_clamped(E))
    Ec, c = _split_chunks(log_E, P)  # (m, bP, c, q) — reshape only
    Et = jnp.moveaxis(Ec, 2, 0)  # (c, m, bP, q)

    # -- summary pass: per-chunk max-plus transfer operators -----------------
    # Everything below stays in the TRANSPOSED convention ``X_T[..., j, i] =
    # X[..., i, j]``. Two TPU layout reasons: (a) the step contraction is
    # unrolled into sublane slices + scalar log_A broadcasts (lane slicing
    # relayouts every term — measured 5.6x slower at q=15); (b) no transpose
    # may follow the scan: XLA propagates the consumer layout into the loop
    # and would relayout the carry on every step (measured ~3x on the whole
    # decode).
    log_A_T = jnp.swapaxes(log_A, -1, -2)

    if _use_pallas(q, m):
        # Pallas TPU kernel: pins the carry layout (operators on sublanes,
        # chunk elements on lanes) that XLA's layout assignment keeps
        # pessimizing in the composed pipeline — 0.73 ms vs ~12 ms for the
        # XLA scan at q=15, b=32, L=9999, P=99 on TPU v5e. Multi-model
        # batches vmap over the wrappers (leading grid dimension).
        interpret = pallas_viterbi.FORCE_INTERPRET
        R = b * P
        R_pad = pallas_viterbi.pad_chunk_elements(R)
        E_T = _pad_lanes(jnp.moveaxis(Ec, 1, -1), R_pad, value=_NEG)
        C_T_flat = jax.vmap(
            lambda A1, E1: pallas_viterbi.maxplus_chunk_summaries(
                A1, E1, P, interpret=interpret
            )
        )(log_A, E_T)[:, :R]  # (m, R, q, q) transposed, b-major chunk-minor
        C_T = jnp.moveaxis(
            C_T_flat.reshape(m, b, P, q, q), 2, 0
        )  # (P, m, b, q, q)
        T = _viterbi_boundaries(log_init, C_T)
        j_end = _boundary_backtrace(T, C_T)  # (P, m, b) int32

        # Conditional per-chunk start vectors in the kernel's (q, R) layout
        # (see _viterbi_chunked_combine for why conditioning on the decoded
        # border state is required for a valid-path guarantee).
        first_start = jnp.broadcast_to(log_init[:, None, :], (m, b, q))
        r0, last_state = _conditional_viterbi_starts(
            first_start, log_A, j_end
        )  # (m, bP, q), (m, bP)
        delta0 = jnp.swapaxes(r0, -1, -2) + E_T[:, 0, :, :R]  # (m, q, R)
        if R_pad != R:
            delta0 = jnp.pad(
                delta0, ((0, 0), (0, 0), (0, R_pad - R)), constant_values=_NEG
            )
            last_state = jnp.pad(last_state, ((0, 0), (0, R_pad - R)))
        states = jax.vmap(
            lambda A1, E1, d1, s1: pallas_viterbi.maxplus_decode(
                A1, E1, d1, s1, interpret=interpret
            )
        )(log_A, E_T, delta0, last_state)[:, :, :R]  # (m, c, R)
        return jnp.swapaxes(states, -1, -2).reshape(m, b, L)

    C_T = _viterbi_chunk_summaries(log_A, log_A_T, Et, m, b, q, P)
    return _viterbi_chunked_combine(
        init, log_init, log_A, log_A_T, Et, C_T, m, b, L, q, P, c
    )


def _viterbi_chunk_summaries(
    log_A, log_A_T, Et, m, b, q, P, first_chunk_identity=True
):
    """XLA max-plus chunk transfer operators (transposed convention).

    ``first_chunk_identity`` may be traced (sequence-sharded callers pass
    ``device_index == 0``).
    """
    eye = jnp.where(jnp.eye(q, dtype=bool), 0.0, _NEG).astype(Et.dtype)
    is_first = ((jnp.arange(P) == 0) & first_chunk_identity)[
        None, None, :, None, None
    ]
    R0_T = jnp.where(is_first, eye, log_A_T[:, None, None])
    R0_T = jnp.broadcast_to(R0_T, (m, b, P, q, q)).reshape(m, b * P, q, q)
    Et_s = Et[..., None]  # (c, m, bP, q, 1) — emissions on sublanes
    M0_T = R0_T + Et_s[0]

    if q <= 32:
        # Per output row p, a max-tree over sublane slices of the carry and
        # scalar log_A broadcasts; rows are then stacked on the sublane axis.
        # Measured fastest of the XLA formulations at q=15 (36 us/step vs
        # 101 us/step for a single fused broadcast max-tree over k).

        def sum_step(M_T, e_t):
            cols = []
            for p in range(q):
                acc = M_T[..., 0, :] + log_A[:, 0, p][..., None, None]
                for k in range(1, q):
                    acc = jnp.maximum(
                        acc, M_T[..., k, :] + log_A[:, k, p][..., None, None]
                    )
                cols.append(acc)
            return jnp.stack(cols, axis=-2) + e_t, None

    else:

        def sum_step(M_T, e_t):
            return maxmatmul(log_A_T[:, None], M_T) + e_t, None

    M_T, _ = lax.scan(
        sum_step, M0_T, Et_s[1:], unroll=_seq_unroll()
    )
    return jnp.moveaxis(M_T.reshape(m, b, P, q, q), 2, 0)  # (P, m, b, q, q)


def _viterbi_boundaries(log_v, C_T):
    """Max-plus forward values at every chunk's last position.

    ``log_v``: the start vector, shape (m, q) or (m, b, q) — sharded callers
    pass the per-sequence boundary value entering their block.

    A sequential VECTOR fold for P <= 64 (O(P·q²), same economics as the
    sum-product :func:`_boundary_values`: the log-depth matrix scan costs
    O(P log P · q³) for tiny operands); associative scan above.

    Returns ``T`` of shape (P, m, b, q): ``T[p](j)`` is the best path score
    over positions up to the end of chunk ``p`` ending in state ``j``.
    """
    P, m, b, q = C_T.shape[:4]
    if log_v.ndim == 2:
        log_v = log_v[:, None]  # (m, 1, q) — broadcast over batch
    if P <= 64:
        v0 = jnp.broadcast_to(log_v, (m, b, q))

        def fold(v, C_T_p):
            # v_new[j] = max_i v[i] + C_p[i, j] = max_i C_T_p[j, i] + v[i].
            v_new = jnp.max(C_T_p + v[..., None, :], axis=-1)
            return v_new, v_new

        _, T = lax.scan(fold, v0, C_T)
        return T
    # prefix_T[p] = (C_0 ∘ … ∘ C_p)^T = C_p^T ∘ … ∘ C_0^T.
    prefix_T = lax.associative_scan(lambda x, y: maxmatmul(y, x), C_T, axis=0)
    return jnp.max(prefix_T + log_v[None, :, :, None, :], axis=-1)


def _boundary_backtrace(T, C_T, j_last=None):
    """Optimal state at the last position of every chunk.

    A positionwise ``argmax(delta + psi)`` decode is exact only in exact
    arithmetic: at |score| ~ L in f32, independent per-position rounding
    splices states from different near-optimal paths, producing invalid
    transitions (observed at ~0.2% of positions at L=10k). A backtrace
    always returns one *valid* optimal path, so the decode is a chunk-level
    backtrace here followed by within-chunk backtraces from stored deltas.

    Args:
        T: (P, m, b, q) chunk-end forward values.
        C_T: (P, m, b, q, q) transposed chunk operators.
        j_last: optional (m, b) int32 — fixed state at the last chunk's end
            (sequence-sharded callers pass the cross-device boundary state);
            defaults to ``argmax(T[-1])``.

    Returns:
        (P, m, b) int32 — the optimal path's state at each chunk's end.
    """
    if j_last is None:
        j_last = jnp.argmax(T[-1], axis=-1).astype(jnp.int32)  # (m, b)
    q = T.shape[-1]

    def backstep(j_next, xs):
        T_prev, C_T_next = xs
        # row j_next of C_next, i.e. C_next[i, j_next] over i.
        onehot = jax.nn.one_hot(j_next, q, dtype=C_T_next.dtype)
        # precision: an MXU-lowered one-hot select would round the scores
        # to bf16 (~nat-scale errors at |C| ~ hundreds of nats) and corrupt
        # the argmax — same rule as every DP matmul in this module.
        row = jnp.einsum(
            "mbji,mbj->mbi", C_T_next, onehot, precision=_PRECISION
        )
        j_prev = jnp.argmax(T_prev + row, axis=-1).astype(jnp.int32)
        return j_prev, j_prev

    _, j_rest = lax.scan(
        backstep, j_last, (T[:-1], C_T[1:]), reverse=True
    )  # (P-1, m, b)
    return jnp.concatenate([j_rest, j_last[None]], axis=0)


def _viterbi_chunked_combine(
    init, log_init, log_A, log_A_T, Et, C_T, m, b, L, q, P, c
):
    """Boundary combine + output passes of the chunked Viterbi decode.

    ``C_T`` holds the per-chunk tropical transfer operators in transposed
    convention ``C_T[p, ..., j, i] = C[p, ..., i, j]`` (see the layout notes
    in :func:`_viterbi_chunked`); ``Et`` is (c, m, bP, q) log emissions.

    Decode = chunk-level backtrace (:func:`_boundary_backtrace`) + per-chunk
    *conditional* delta recursions started from the decoded left-border state
    + within-chunk backtraces — every splice carries an explicit transition,
    so the result is always one valid optimal path (see the f32 note in
    :func:`_boundary_backtrace`). Conditioning also keeps within-chunk delta
    magnitudes O(c) rather than O(L).
    """
    T = _viterbi_boundaries(log_init, C_T)
    j_end = _boundary_backtrace(T, C_T)  # (P, m, b) int32
    first_start = jnp.broadcast_to(log_init[:, None, :], (m, b, q))
    return _viterbi_outputs(first_start, log_A, Et, j_end, m, b, L, q, P)


def _conditional_viterbi_starts(first_start_log, log_A, j_end):
    """Per-chunk conditional start vectors + decoded chunk-end states.

    Returns ``r0`` (m, bP, q): chunk 0 starts from ``first_start_log``,
    chunk p > 0 from the row ``A[j_end[p-1], :]`` — conditioning on the
    decoded border state guarantees valid splices; and ``last_state``
    (m, bP) int32.
    """
    P, m, b = j_end.shape
    q = log_A.shape[-1]
    onehot_prev = jax.nn.one_hot(j_end[:-1], q, dtype=log_A.dtype)
    r_later = jnp.einsum(
        "pmbi,miq->pmbq", onehot_prev, log_A, precision=_PRECISION
    )  # A[j_end, :]
    r0 = jnp.moveaxis(
        jnp.concatenate([first_start_log[None], r_later], axis=0), 0, 2
    ).reshape(m, b * P, q)
    last_state = jnp.moveaxis(j_end, 0, 2).reshape(m, b * P)
    return r0, last_state


def _viterbi_outputs(first_start_log, log_A, Et, j_end, m, b, L, q, P):
    """Conditional delta passes + within-chunk backtraces (XLA path).

    ``first_start_log`` (m, b, q): pre-emission start vector of chunk 0
    (``log_init`` single-device; the propagated boundary-state row for
    sequence-sharded blocks). ``j_end`` (P, m, b): decoded state at each
    chunk's end.
    """
    # -- conditional forward pass per chunk -----------------------------------
    r0, last_state = _conditional_viterbi_starts(
        first_start_log, log_A, j_end
    )

    def fwd_step(delta, e_t):
        new = maxmatmul(delta[..., None, :], log_A[:, None])[..., 0, :] + e_t
        return new, new

    delta0 = r0 + Et[0]
    _, delta_rest = lax.scan(
        fwd_step, delta0, Et[1:], unroll=_seq_unroll()
    )
    delta = jnp.concatenate([delta0[None], delta_rest], axis=0)  # (c, m, bP, q)

    # -- within-chunk backtrace ------------------------------------------------
    def backstep(state, delta_prev):
        onehot = jax.nn.one_hot(state, q, dtype=delta_prev.dtype)
        acol = jnp.einsum(
            "miq,mbq->mbi", log_A, onehot, precision=_PRECISION
        )  # A[:, state]
        prev = jnp.argmax(delta_prev + acol, axis=-1).astype(jnp.int32)
        return prev, prev

    _, rest = lax.scan(
        backstep, last_state, delta[:-1], reverse=True, unroll=_seq_unroll()
    )
    states = jnp.concatenate([rest, last_state[None]], axis=0)  # (c, m, bP)
    states = jnp.moveaxis(states, 0, 2).reshape(m, b, P, L // P)
    return states.reshape(m, b, L)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def recommended_parallel_factor(
    L: int, q: int, m: int = 1, for_viterbi: bool = False
) -> int:
    """Measured-dispatch advice: the ``parallel_factor`` to use per shape.

    Derived from TPU v5e measurements (``benchmarks/largeq_probe.py`` and
    ``bench.py``); returns a divisor of ``L``:

    * q <= 16 — the Pallas chunked engine; chunk length ~300 optimal
      (pf=33 at L=9999: boundary-combine cost grows with P, output passes
      are P-independent).
    * 16 < q <= 64, m == 1, sum-product — the XLA chunked engine on the
      MXU still beats the sequential scan (2.49 vs 4.77 ms at q=33,
      L=3069); chunk length ~340 optimal.
    * larger q or m — sequential (1): the O(q^3)-per-position summary pass
      overtakes the scan-latency saving (q=127: 22 ms chunked vs 4.4 ms
      sequential), and multi-model batches amortize the scan overhead.
    * Viterbi at q > 16 — always 1: :func:`viterbi` routes to the blocked
      sequential Pallas decode (or the XLA scan above 64 states)
      regardless of ``parallel_factor``.
    """
    if for_viterbi and q > pallas_viterbi.PAD:
        return 1
    if q <= pallas_viterbi.PAD:
        target_c = 300
    elif q <= 64 and m == 1 and not for_viterbi:
        target_c = 340
    else:
        return 1
    best, best_err = 1, abs(L - target_c)
    d = 1
    while d * d <= L:
        if L % d == 0:
            for p in (d, L // d):
                err = abs(L / p - target_c)
                if err < best_err:
                    best, best_err = p, err
        d += 1
    return best


def forward(init, A, E, parallel_factor: int = 1) -> ForwardResult:
    """Forward algorithm.

    Mirrors ``MsaHmmLayer.forward_recursion`` (``MsaHMMLayer.py:98-114``)
    semantics: returns per-position log-forward variables
    ``log P(x_{1..t}, s_t)`` and per-sequence log-likelihood.
    """
    if parallel_factor == 1:
        la, ll = _forward_seq(init, A, E)
        return ForwardResult(la, ll)
    la, ll = _forward_chunked_fast(init, A, E, parallel_factor)
    return ForwardResult(la, ll)


def backward(init, A, E, parallel_factor: int = 1) -> jax.Array:
    """Backward algorithm: ``log_beta[t, i] = log P(x_{t+1..L} | s_t = i)``.

    Mirrors ``MsaHmmLayer.backward_recursion`` (``MsaHMMLayer.py:116-132``).
    """
    if parallel_factor == 1:
        return _backward_seq(A, E)
    return _backward_chunked_fast(init, A, E, parallel_factor)


def log_likelihood(
    init, A, E, parallel_factor: int = 1, analytic_vjp: bool = True
) -> jax.Array:
    """Per-sequence log-likelihood ``log P(x_{1..L})``, shape (m, b).

    The training-loss path (``MsaHmmLayer.forward`` → loglik,
    ``MsaHMMLayer.py:180-208``). Reverse-mode gradients use analytic
    Baum-Welch VJPs at EVERY ``parallel_factor`` (chunked:
    :func:`_loglik_chunked_fast`, summary pass + prefix fold only;
    sequential: :func:`_loglik_seq_fast`, one fwd + one bwd pass instead
    of taped autodiff). Forward-mode differentiation (``jax.jvp`` /
    ``jacfwd``) requires ``parallel_factor=1`` AND ``analytic_vjp=False``
    (custom_vjp functions are reverse-mode only).
    """
    if parallel_factor == 1:
        if analytic_vjp:
            return _loglik_seq_fast(init, A, E)
        return _loglik_seq_primal(init, A, E)
    return _loglik_chunked_fast(init, A, E, parallel_factor)


def posterior(
    init,
    A,
    E,
    parallel_factor: int = 1,
    no_loglik: bool = False,
):
    """State posterior log-probabilities ``log P(s_t = j | x)``.

    Mirrors ``MsaHmmLayer.state_posterior_log_probs``
    (``MsaHMMLayer.py:134-153``), including the ``no_loglik`` flag used for
    end-to-end softmax training (``MsaHMMLayer.py:142-143,513-514``).

    Returns (log_gamma (m, b, L, q), loglik (m, b)).
    """
    if parallel_factor == 1:
        la, ll = _forward_seq(init, A, E)
        lb = _backward_seq(A, E)
        log_gamma = la + lb
        if not no_loglik:
            log_gamma = log_gamma - ll[..., None, None]
        return log_gamma, ll
    return _posterior_chunked_fast(init, A, E, parallel_factor, no_loglik)


def viterbi(init, A, E, parallel_factor: int = 1) -> jax.Array:
    """Most likely state path, shape (m, b, L) int32.

    A capability the reference only names (``MsaHmmCell.py:13``); required by
    BASELINE.json. ``parallel_factor == 1`` runs a sequential max-plus scan
    with backpointer trace; ``parallel_factor > 1`` runs the chunked max-plus
    engine — chunk-level backtrace over transfer operators, then per-chunk
    conditional delta passes and within-chunk backtraces — with
    O(L/P + log P) sequential depth and a valid-optimal-path guarantee.

    Engine parity: every engine returns ONE VALID optimal path. When
    distinct paths tie within f32 rounding (inevitable at |score| ~ L for
    dense emissions — observed on ~0.2% of positions at L=10k), engines may
    break the tie differently; the returned paths' true scores agree to
    ~1e-7 relative.

    At 16 < q <= 64 on TPU, BOTH settings route to the sequential Pallas
    delta/backtrace kernels (:func:`_viterbi_seq_pallas`): the tropical
    semiring has no MXU mapping, chunked operators cost O(q^3) per position,
    and the kernels beat the best XLA alternative ~6x (measured, see the
    function's docstring). The decoded path is identical either way.
    """
    q = E.shape[-1]
    if _use_pallas_seq_viterbi(q):
        return _viterbi_seq_pallas(init, A, E)
    if parallel_factor == 1:
        return _viterbi_seq(init, A, E)
    return _viterbi_chunked(init, A, E, parallel_factor)

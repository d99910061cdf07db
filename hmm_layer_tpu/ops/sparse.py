"""Sparse-transition HMM recursions over COO edge lists.

Capability parity with ``make_A_sparse`` / ``make_log_A_sparse``
(``/root/reference/hmm_layer/Transitioner.py:249-310``,
``gene_pred_hmm_transitioner.py:74-98``) plus what the reference never
built: an actual sparse *compute* path. For large multi-copy gene-pred
models (``q = 1 + 14k``) the dense ``(q, q)`` transition matrix costs
O(q²) memory and O(q²) work per position (k=1000 → 14001² f32 ≈ 784 MB
per model) while the grammar has only ``1 + 22k`` edges; these scans do
O(n_edges · b) work per position with gather + segment-reduce instead of
a dense matvec, so the model stays representable far past the dense wall.

TPU mapping: edges are statically pre-sorted by destination (forward) /
source (backward) so every reduction is a sorted leading-axis
``segment_sum``/``segment_max`` — the scatter lowering the TPU compiler
handles best. Hardware-verified at q=505 (loglik parity 1.4e-4 vs an f64
oracle, valid Viterbi, finite grads) on the axon toolchain, where the
DENSE ``(q, q)`` scatter-set build (``masked_row_softmax_from_edges``)
hangs the compiler at that size — the sparse path is also the only way
to RUN large-q gene-pred models there. No MXU mapping exists for sparse
contractions; this trades
peak FLOP/s for O(q²→n) memory and bandwidth, the right trade exactly
when the dense matrix would not fit or sparsity ≪ 1/8 (the Plan7 /
gene-pred regimes). Gradients flow by reverse-mode autodiff through the
scans (gather and segment-sum are linear); the dense engine's analytic
VJPs do not apply.

Edge probabilities come from
:func:`hmm_layer_tpu.models.transition_utils.sparse_edge_softmax` or a
transitioner's ``make_A_sparse``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .semiring import EPS

__all__ = [
    "sparse_forward",
    "sparse_backward",
    "sparse_log_likelihood",
    "sparse_posterior",
    "sparse_viterbi",
]

_NEG = -1e30


def _clamped(x):
    return jnp.maximum(x, EPS)


def _edge_plan(indices, edge_probs, E, sort_by):
    """Static edge preprocessing: sort by ``sort_by`` ('dst' or 'src').

    Returns (src, dst, perm) as static numpy arrays; gather ``edge_probs``
    with ``perm`` (a static permutation, free at trace time).
    """
    indices = np.asarray(indices)
    n = indices.shape[0]
    assert indices.ndim == 2 and indices.shape[1] == 2, indices.shape
    assert edge_probs.shape[-1] == n, (edge_probs.shape, n)
    key = indices[:, 1] if sort_by == "dst" else indices[:, 0]
    perm = np.argsort(key, kind="stable")
    return indices[perm, 0], indices[perm, 1], perm


def _segsum(contrib, seg_ids, q):
    """Sorted segment-sum over the trailing edge axis -> trailing state axis.

    contrib: (m, b, n) with ``seg_ids`` (n,) static sorted; returns (m,b,q).
    """
    out = jax.ops.segment_sum(
        jnp.moveaxis(contrib, -1, 0),
        jnp.asarray(seg_ids),
        num_segments=q,
        indices_are_sorted=True,
    )
    return jnp.moveaxis(out, 0, -1)


def sparse_forward(init, indices, edge_probs, E):
    """Scaled sequential forward with a sparse transition operator.

    Args:
        init: (m, q) initial distribution.
        indices: (n_edges, 2) static (from, to) pairs.
        edge_probs: (m, n_edges) transition probabilities per edge (rows
            of the implied matrix sum to 1 over each state's out-edges).
        E: (m, b, L, q) emission probabilities.
    Returns:
        (log_alpha (m, b, L, q), loglik (m, b)) — matches
        :func:`hmm_layer_tpu.ops.recursion.forward` to fp tolerance.
    """
    src, dst, perm = _edge_plan(indices, edge_probs, E, "dst")
    q = E.shape[-1]
    Et = jnp.moveaxis(E, 2, 0)
    w = edge_probs[..., perm][:, None, :]  # (m, 1, n)

    s0 = _clamped(Et[0]) * _clamped(init)[:, None, :]
    z0 = jnp.sum(s0, axis=-1, keepdims=True)
    alpha0, ll0 = s0 / z0, jnp.log(z0[..., 0])

    def step(carry, e_t):
        alpha, ll = carry
        r = _segsum(alpha[..., src] * w, dst, q)
        s = _clamped(e_t) * _clamped(r)
        z = jnp.sum(s, axis=-1, keepdims=True)
        alpha_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        return (alpha_new, ll_new), jnp.log(alpha_new) + ll_new[..., None]

    (_, ll), outs = lax.scan(step, (alpha0, ll0), Et[1:])
    log_alpha0 = jnp.log(alpha0) + ll0[..., None]
    log_alpha = jnp.concatenate([log_alpha0[None], outs], axis=0)
    return jnp.moveaxis(log_alpha, 0, 2), ll


def sparse_backward(indices, edge_probs, E):
    """Scaled sequential backward; log_beta (m, b, L, q)."""
    src, dst, perm = _edge_plan(indices, edge_probs, E, "src")
    m, b, L, q = E.shape
    Et = jnp.moveaxis(E, 2, 0)
    w = edge_probs[..., perm][:, None, :]

    beta_last = jnp.ones((m, b, q), E.dtype)
    ll_last = jnp.zeros((m, b), E.dtype)

    def step(carry, e_next):
        beta, ll = carry
        r = _clamped(e_next) * beta
        s = _clamped(_segsum(r[..., dst] * w, src, q))
        z = jnp.max(s, axis=-1, keepdims=True)
        beta_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        return (beta_new, ll_new), jnp.log(beta_new) + ll_new[..., None]

    _, outs = lax.scan(step, (beta_last, ll_last), Et[1:], reverse=True)
    log_beta_last = jnp.zeros((1, m, b, q), E.dtype)
    log_beta = jnp.concatenate([outs, log_beta_last], axis=0)
    return jnp.moveaxis(log_beta, 0, 2)


def sparse_log_likelihood(init, indices, edge_probs, E):
    """(m, b) log-likelihoods; differentiable (autodiff through the scan)."""
    src, dst, perm = _edge_plan(indices, edge_probs, E, "dst")
    q = E.shape[-1]
    Et = jnp.moveaxis(E, 2, 0)
    w = edge_probs[..., perm][:, None, :]

    s0 = _clamped(Et[0]) * _clamped(init)[:, None, :]
    z0 = jnp.sum(s0, axis=-1, keepdims=True)
    carry0 = (s0 / z0, jnp.log(z0[..., 0]))

    def step(carry, e_t):
        alpha, ll = carry
        r = _segsum(alpha[..., src] * w, dst, q)
        s = _clamped(e_t) * _clamped(r)
        z = jnp.sum(s, axis=-1, keepdims=True)
        return (s / z, ll + jnp.log(z[..., 0])), None

    (_, ll), _ = lax.scan(step, carry0, Et[1:])
    return ll


def sparse_posterior(init, indices, edge_probs, E, no_loglik: bool = False):
    """Posterior state log-probabilities; (log_gamma, loglik)."""
    la, ll = sparse_forward(init, indices, edge_probs, E)
    lb = sparse_backward(indices, edge_probs, E)
    lg = la + lb
    if not no_loglik:
        lg = lg - ll[..., None, None]
    return lg, ll


def sparse_viterbi(init, indices, edge_probs, E):
    """Max-plus Viterbi decode over the edge list; (m, b, L) int32.

    A BACKTRACE decode (chunk-free sequential): per position each state
    records the attaining in-edge via a segment-min over tied edge ids —
    any attaining edge yields a valid optimal path (positionwise argmax
    splicing is not f32-safe; see ``ops.recursion._boundary_backtrace``).
    """
    src, dst, perm = _edge_plan(indices, edge_probs, E, "dst")
    n = len(src)
    m, b, L, q = E.shape
    log_w = jnp.log(_clamped(edge_probs[..., perm]))[:, None, :]  # (m, 1, n)
    log_E = jnp.log(_clamped(E))
    log_init = jnp.log(_clamped(init))
    Et = jnp.moveaxis(log_E, 2, 0)
    dst_j = jnp.asarray(dst)

    delta0 = log_init[:, None, :] + Et[0]  # (m, b, q)
    edge_ids = jnp.arange(n, dtype=jnp.int32)
    src_lookup = jnp.concatenate(
        [jnp.asarray(src, jnp.int32), jnp.zeros((1,), jnp.int32)]
    )  # sentinel for unreachable states

    def segred(x, reducer):
        return jnp.moveaxis(
            reducer(
                jnp.moveaxis(x, -1, 0), dst_j, num_segments=q,
                indices_are_sorted=True,
            ),
            0,
            -1,
        )

    def step(delta, e_t):
        contrib = delta[..., src] + log_w  # (m, b, n)
        best = segred(contrib, jax.ops.segment_max)
        best = jnp.maximum(best, _NEG)  # unreachable states: -inf -> _NEG
        attained = contrib >= best[..., dst]
        masked_ids = jnp.where(attained, edge_ids, n)
        win_edge = segred(masked_ids, jax.ops.segment_min)
        bp = src_lookup[jnp.minimum(win_edge, n)]  # (m, b, q) prev state
        return best + e_t, bp

    delta_final, backptrs = lax.scan(step, delta0, Et[1:])
    last_state = jnp.argmax(delta_final, axis=-1).astype(jnp.int32)

    def backstep(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[..., None], axis=-1)[..., 0]
        return prev, prev

    _, path_rev = lax.scan(backstep, last_state, backptrs, reverse=True)
    path = jnp.concatenate([path_rev, last_state[None]], axis=0)
    return jnp.moveaxis(path, 0, 2)

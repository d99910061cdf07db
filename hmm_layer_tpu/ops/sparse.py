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
oracle, valid Viterbi, finite grads). No MXU mapping exists for sparse
contractions; this trades peak FLOP/s for O(q²→n) memory and bandwidth.
WHEN TO USE (round-5 guidance): the scatter-free dense build
(``models.transition_utils.dense_from_edge_probs``) unlocked the DENSE
engine at config-5 state counts, and it is 3.5-11.7x faster there (a
505² A is 1 MB; BASELINE.md round 5). The measured crossover sits at
q ≈ 4-8k (dense still 1.4x at q=4089; sparse wins by q=8191 where the
256 MB A's per-step HBM traffic dominates) — choose ``sparse_forward``
beyond that, for edge-sharded capacity scaling
(``parallel.sparse_sharding``), or for the fused/blocked CE memory
modes below.

Gradients: :func:`sparse_log_likelihood` and :func:`sparse_posterior`
carry analytic ``custom_vjp`` adjoints over the edge lists (Baum-Welch
statistics for the loglik; the gamma-centered adjoint recursions of the
dense engine with the dense matvec/einsum replaced by gather +
segment-reduce, so the backward pass is O(L·n_edges·b) work and O(L·q)
residual memory — never O(q²)). ``analytic_vjp=False`` selects the taped
reverse-mode autodiff path (also the forward-mode route).

Edge probabilities come from
:func:`hmm_layer_tpu.models.transition_utils.sparse_edge_softmax` or a
transitioner's ``make_A_sparse``.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .semiring import EPS

# Unroll factor for the sequential time scans. Unlike the dense engine's
# matmul-chain scans (HMM_SEQ_UNROLL measured negative, CLAUDE.md), the
# sparse step bodies are tiny gather/segment-sum ops where loop overhead
# could matter — knob for measurement; see BASELINE.md round 4.
_UNROLL = int(os.environ.get("HMM_SPARSE_UNROLL", "1"))

__all__ = [
    "sparse_forward",
    "sparse_backward",
    "sparse_log_likelihood",
    "sparse_posterior",
    "sparse_viterbi",
    "sparse_sample_paths",
    "sparse_expected_statistics",
    "sparse_em_step",
    "sparse_posterior_cross_entropy",
    "set_sparse_posterior_block",
]

_NEG = -1e30


def _clamped(x):
    return jnp.maximum(x, EPS)


class EdgePlan:
    """Hashable static edge preprocessing for the custom-VJP fast paths.

    Precomputes both sort orders (by destination for forward-direction
    reductions, by source for backward-direction ones) plus the inverse
    permutations mapping sorted-edge gradients back to the caller's edge
    order. Hashable so it can ride ``jax.custom_vjp`` ``nondiff_argnums``.
    """

    __slots__ = (
        "n", "indices", "src_d", "dst_d", "perm_d", "inv_d",
        "src_s", "dst_s", "perm_s", "_key",
    )

    def __init__(self, indices):
        if isinstance(indices, jax.core.Tracer):
            raise TypeError(
                "sparse edge `indices` must be a static (numpy) array — it "
                "is preprocessed on the host at trace time (sort orders, "
                "segment ids); a traced array cannot parameterize the "
                "static edge plan. Pass the indices from "
                "make_transition_indices()/make_A_sparse() outside of jit."
            )
        indices = np.asarray(indices)
        assert indices.ndim == 2 and indices.shape[1] == 2, indices.shape
        self.indices = indices
        self.n = indices.shape[0]
        perm_d = np.argsort(indices[:, 1], kind="stable")
        self.src_d = indices[perm_d, 0]
        self.dst_d = indices[perm_d, 1]
        self.perm_d = perm_d
        inv = np.empty(self.n, np.int64)
        inv[perm_d] = np.arange(self.n)
        self.inv_d = inv
        perm_s = np.argsort(indices[:, 0], kind="stable")
        self.src_s = indices[perm_s, 0]
        self.dst_s = indices[perm_s, 1]
        self.perm_s = perm_s
        self._key = (indices.shape[0], indices.tobytes())

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, EdgePlan) and self._key == other._key

    @staticmethod
    def cached(indices) -> "EdgePlan":
        """Memoized constructor (keyed on the index bytes): avoids the two
        host-side argsorts per call on eager/CPU paths; under jit the plan
        is trace-time-only anyway."""
        if isinstance(indices, jax.core.Tracer):
            return EdgePlan(indices)  # raises the clear TypeError
        arr = np.asarray(indices, np.int64)
        return _edge_plan_cached(arr.shape[0], arr.tobytes())

    def matvec(self, edge_probs, y, q, transpose: bool = False):
        """``A @ y`` (or ``A.T @ y``) over the edge list; y: (..., q).

        ``(A @ y)[i] = sum_{e: src=i} w_e y[dst_e]`` — gather at dst,
        segment-sum by src (src-sorted); transpose swaps the roles.
        """
        if transpose:
            w = edge_probs[..., self.perm_d][:, None, :]
            contrib = y[..., self.src_d] * w
            return _segsum(contrib, self.dst_d, q)
        w = edge_probs[..., self.perm_s][:, None, :]
        contrib = y[..., self.dst_s] * w
        return _segsum(contrib, self.src_s, q)


from functools import lru_cache


@lru_cache(maxsize=32)
def _edge_plan_cached(n, index_bytes):
    return EdgePlan(np.frombuffer(index_bytes, np.int64).reshape(n, 2))


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


def _scaled_fwd_step(w, gather_idx, seg_idx, q, emit_log: bool):
    """THE sum-normalized sparse forward step — single source for
    :func:`sparse_forward`, the taped loglik, the blocked-adjoint
    recompute (:func:`_blk_la`) and the streaming fold. The blocked
    backward's checkpoint reconstruction and the streaming filter are
    exact ONLY because their recompute is this same function (clamp
    placement and the sum normalizer must match bit-for-bit); do not
    re-implement the body elsewhere."""

    def step(carry, e_t):
        alpha, ll = carry
        r = _segsum(alpha[..., gather_idx] * w, seg_idx, q)
        s = _clamped(e_t) * _clamped(r)
        z = jnp.sum(s, axis=-1, keepdims=True)
        alpha_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        out = (
            jnp.log(alpha_new) + ll_new[..., None] if emit_log else None
        )
        return (alpha_new, ll_new), out

    return step


def _scaled_bwd_step(w, gather_idx, seg_idx, q, emit_log: bool):
    """THE max-normalized sparse backward step — single source for
    :func:`sparse_backward` and the blocked-adjoint recompute
    (:func:`_blk_lb`); same single-sourcing contract as
    :func:`_scaled_fwd_step`."""

    def step(carry, e_next):
        beta, ll = carry
        r = _clamped(e_next) * beta
        s = _clamped(_segsum(r[..., gather_idx] * w, seg_idx, q))
        z = jnp.max(s, axis=-1, keepdims=True)
        beta_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        out = (
            jnp.log(beta_new) + ll_new[..., None] if emit_log else None
        )
        return (beta_new, ll_new), out

    return step


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

    step = _scaled_fwd_step(w, src, dst, q, emit_log=True)
    (_, ll), outs = lax.scan(step, (alpha0, ll0), Et[1:], unroll=_UNROLL)
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

    step = _scaled_bwd_step(w, dst, src, q, emit_log=True)
    _, outs = lax.scan(step, (beta_last, ll_last), Et[1:], reverse=True, unroll=_UNROLL)
    log_beta_last = jnp.zeros((1, m, b, q), E.dtype)
    log_beta = jnp.concatenate([outs, log_beta_last], axis=0)
    return jnp.moveaxis(log_beta, 0, 2)


def sparse_log_likelihood(init, indices, edge_probs, E, analytic_vjp=True):
    """(m, b) log-likelihoods over the edge list.

    ``analytic_vjp=True`` (default) attaches the Baum-Welch adjoint
    (one forward + one backward recompute, O(L·q) residuals, reverse-mode
    only); ``False`` tapes the scan (forward-mode capable, O(L·n_edges·b)
    residuals).
    """
    if analytic_vjp:
        return _sparse_loglik_fast(EdgePlan.cached(indices), init, edge_probs, E)
    return _sparse_loglik_taped(init, indices, edge_probs, E)


def _sparse_loglik_taped(init, indices, edge_probs, E):
    src, dst, perm = _edge_plan(indices, edge_probs, E, "dst")
    q = E.shape[-1]
    Et = jnp.moveaxis(E, 2, 0)
    w = edge_probs[..., perm][:, None, :]

    s0 = _clamped(Et[0]) * _clamped(init)[:, None, :]
    z0 = jnp.sum(s0, axis=-1, keepdims=True)
    carry0 = (s0 / z0, jnp.log(z0[..., 0]))

    step = _scaled_fwd_step(w, src, dst, q, emit_log=False)
    (_, ll), _ = lax.scan(step, carry0, Et[1:], unroll=_UNROLL)
    return ll


def sparse_posterior(
    init,
    indices,
    edge_probs,
    E,
    no_loglik: bool = False,
    analytic_vjp=True,
    backward_block: int | None = None,
):
    """Posterior state log-probabilities; (log_gamma, loglik).

    ``analytic_vjp=True`` (default) attaches the gamma-centered analytic
    adjoint (edge-list port of the dense engine's
    ``_posterior_analytic_vjp``; reverse-mode only); ``False`` tapes the
    forward/backward scans. ``backward_block`` (or the trace-time
    :func:`set_sparse_posterior_block` global, env
    ``HMM_SPARSE_POSTERIOR_BLOCK``) selects the time-blocked recompute
    backward — same math, O(L/c) checkpoints instead of O(L·q) residuals
    and block-local intermediates, for CE training at config-5 memory
    scale; costs ~2 extra recursion scans per step.
    """
    if not analytic_vjp and backward_block is not None:
        raise ValueError(
            "backward_block requires analytic_vjp=True — the taped path "
            "stores its own O(L·q) scan residuals and would silently "
            "ignore the memory mode (the set_sparse_posterior_block "
            "global only applies to the analytic path for the same "
            "reason)"
        )
    if analytic_vjp:
        block = backward_block if backward_block is not None else _POSTERIOR_BLOCK
        if block:
            L = E.shape[2]
            if L % int(block):
                raise ValueError(
                    f"backward_block {block} must divide L={L}"
                )
            return _sparse_posterior_blocked(
                EdgePlan.cached(indices), bool(no_loglik), int(block),
                init, edge_probs, E,
            )
        return _sparse_posterior_fast(
            EdgePlan.cached(indices), bool(no_loglik), init, edge_probs, E
        )
    return _sparse_posterior_taped(init, indices, edge_probs, E, no_loglik)


def _sparse_posterior_taped(init, indices, edge_probs, E, no_loglik=False):
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

    delta_final, backptrs = lax.scan(step, delta0, Et[1:], unroll=_UNROLL)
    last_state = jnp.argmax(delta_final, axis=-1).astype(jnp.int32)

    def backstep(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[..., None], axis=-1)[..., 0]
        return prev, prev

    _, path_rev = lax.scan(backstep, last_state, backptrs, reverse=True, unroll=_UNROLL)
    path = jnp.concatenate([path_rev, last_state[None]], axis=0)
    return jnp.moveaxis(path, 0, 2)


# ---------------------------------------------------------------------------
# Analytic custom-VJP fast paths (edge-list Baum-Welch / adjoint recursions)
# ---------------------------------------------------------------------------
#
# These mirror the dense engine's analytic VJPs (ops/recursion.py
# _loglik_bw_stats / _posterior_analytic_vjp) with the two dense-A
# touchpoints replaced by edge-list primitives: the affine adjoint solves
# use EdgePlan.matvec (gather + sorted segment-sum) and the gA einsums
# become per-edge gathered outer-product sums accumulated in a scan — so
# the backward pass never materializes anything O(q^2) or O(L * n_edges).


def _sparse_affine_reverse(plan, edge_probs, u, v, c, transpose):
    """Sequential solve of ``x_t = c_t + u_t * (B @ (v_t * x_{t+1}))`` with
    terminal ``x_L = 0``; B is the edge-list operator (or its transpose)."""
    m, b, L, q = c.shape
    tm = lambda x: jnp.moveaxis(x, 2, 0)

    def step(x_next, inp):
        u_t, v_t, c_t = inp
        x_t = c_t + u_t * plan.matvec(edge_probs, v_t * x_next, q, transpose)
        return x_t, x_t

    x_term = jnp.zeros((m, b, q), c.dtype)
    _, xs = lax.scan(step, x_term, (tm(u), tm(v), tm(c)), reverse=True, unroll=_UNROLL)
    return jnp.moveaxis(xs, 0, 2)


def _edge_outer_sum(plan, F, G):
    """``sum_{t,b} F[m,b,t,src_e] * G[m,b,t,dst_e]`` per edge; (m, n) in
    the caller's edge order. O(T * b * n) work, O(b * n) peak memory."""
    m = F.shape[0]
    src = jnp.asarray(plan.src_d)
    dst = jnp.asarray(plan.dst_d)

    def step(acc, inp):
        f_t, g_t = inp  # (m, b, q) each
        return acc + jnp.sum(f_t[..., src] * g_t[..., dst], axis=1), None

    acc0 = jnp.zeros((m, plan.n), F.dtype)
    acc, _ = lax.scan(
        step, acc0, (jnp.moveaxis(F, 2, 0), jnp.moveaxis(G, 2, 0)),
        unroll=_UNROLL,
    )
    return acc[:, plan.inv_d]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sparse_loglik_fast(plan, init, edge_probs, E):
    return _sparse_loglik_taped(init, plan.indices, edge_probs, E)


def _sparse_loglik_fast_fwd(plan, init, edge_probs, E):
    ll = _sparse_loglik_taped(init, plan.indices, edge_probs, E)
    return ll, (init, edge_probs, E)


def _sparse_loglik_fast_bwd(plan, res, ct):
    """Baum-Welch statistics over the edge list (cf. _loglik_bw_stats):

        dll/dE_t(j) = gamma_t(j) / E_t(j)
        dll/dw_e    = sum_t alpha_{t-1}(src_e) E_t(dst_e) beta_t(dst_e) / P(x)
        dll/dpi(i)  = E_0(i) beta_0(i) / P(x)

    with zero gradient where the init/E EPS clamps bind (edge probs are
    not clamped by the recursions, matching the dense engine's A).
    """
    init, edge_probs, E = res
    la, ll = sparse_forward(init, plan.indices, edge_probs, E)
    lb = sparse_backward(plan.indices, edge_probs, E)
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
    # Balanced per-step shifts keep both factors in f32 range (their
    # product is O(1); either alone would over/underflow at |ll| ~ L).
    csh = jnp.max(la[:, :, :-1], axis=-1, keepdims=True)
    W = jnp.exp(la[:, :, :-1] - csh)
    U = (
        jnp.exp(lb[:, :, 1:] + log_E[:, :, 1:] - ll[..., None, None] + csh)
        * ct[..., None, None]
    )
    g_edge = _edge_outer_sum(plan, W, U)
    return ginit, g_edge, gE


_sparse_loglik_fast.defvjp(_sparse_loglik_fast_fwd, _sparse_loglik_fast_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sparse_posterior_fast(plan, no_loglik, init, edge_probs, E):
    return _sparse_posterior_taped(
        init, plan.indices, edge_probs, E, no_loglik
    )


def _sparse_posterior_fast_fwd(plan, no_loglik, init, edge_probs, E):
    la, ll = sparse_forward(init, plan.indices, edge_probs, E)
    lb = sparse_backward(plan.indices, edge_probs, E)
    lg = la + lb
    if not no_loglik:
        lg = lg - ll[..., None, None]
    return (lg, ll), (init, edge_probs, E, la, lg, ll)


def _sparse_posterior_fast_bwd(plan, no_loglik, res, cts):
    """Edge-list port of the dense gamma-centered posterior adjoint
    (ops/recursion.py _posterior_analytic_vjp — see there for the
    stability derivation; everything except the two affine solves and the
    gA contractions is elementwise in q and carries over verbatim)."""
    from . import recursion as _rec

    init, edge_probs, E, la, lg, ll = res
    ct, ct_ll_direct = cts
    lb = lg - la
    if not no_loglik:
        lb = lb + ll[..., None, None]
    m, b, L, q = E.shape
    log_E = jnp.log(_clamped(E))
    maskE = E >= EPS
    gam = jnp.exp(la + lb - ll[..., None, None])

    sig = jnp.sum(ct, axis=-1)
    sig_tot = jnp.sum(sig, axis=-1)
    ct_ll_eff = ct_ll_direct if no_loglik else ct_ll_direct - sig_tot

    src_c = ct - gam * sig[..., None]
    f, gbar = _rec._forward_adjoint_weights(la, log_E)
    fp, gp, sp, elb = _rec._backward_adjoint_weights(lb, log_E)
    flip = lambda x: jnp.flip(x, axis=2)

    bhat = _sparse_affine_reverse(
        plan, edge_probs, f, gbar, src_c, transpose=False
    )
    chat = flip(
        _sparse_affine_reverse(
            plan, edge_probs, flip(gp), flip(fp), flip(src_c), transpose=True
        )
    )
    # Project out numerical drift along the growing gamma mode (the exact
    # residuals are zero-sum; see the dense derivation).
    bhat = bhat - gam * jnp.sum(bhat, axis=-1, keepdims=True)
    chat = chat - gam * jnp.sum(chat, axis=-1, keepdims=True)

    K = sig + ct_ll_direct[..., None]
    if no_loglik:
        K = K + sig_tot[..., None]
    gE = (gam * K[..., None] + bhat + chat - ct) / _clamped(E) * maskE

    R0 = sig_tot + ct_ll_eff
    bar0 = gam[:, :, 0] * R0[..., None] + bhat[:, :, 0]
    ginit = jnp.sum(bar0, axis=1) / _clamped(init) * (init >= EPS)

    kappa = ct_ll_direct + (sig_tot if no_loglik else 0.0)
    F, G_of, csh = _rec._forward_gA_factors(la, log_E)
    xi_u = (
        jnp.exp(lb[:, :, 1:] + log_E[:, :, 1:] - ll[..., None, None] + csh)
        * kappa[..., None, None]
    )
    Fp_of, Gp = _rec._backward_gA_factors(lb, sp, elb)
    g_edge = _edge_outer_sum(plan, F, xi_u + G_of(bhat)) + _edge_outer_sum(
        plan, Fp_of(chat), Gp
    )
    return ginit, g_edge, gE


_sparse_posterior_fast.defvjp(
    _sparse_posterior_fast_fwd, _sparse_posterior_fast_bwd
)


# ---------------------------------------------------------------------------
# FFBS posterior path sampling over edge lists
# ---------------------------------------------------------------------------

# Hard mask for structurally-absent transitions (cf. ops/sampling.py _MASK:
# sampling is gradient-free, so hard masks are safe — and necessary for the
# "zero-probability transitions are never sampled" guarantee; the EPS clamps
# of the recursions only soft-floor impossible entries).
_SAMPLE_MASK = -1e30


def sparse_sample_paths(init, indices, edge_probs, E, key, num_samples=1):
    """Exact posterior path samples over the edge list; (m, b, S, L) int32.

    Forward-filter backward-sample (the sequential FFBS of
    ``ops.sampling.sample_posterior``) with the dense ``log A[:, s_{t+1}]``
    column replaced by a per-step segment-max over the src-sorted edges
    whose destination equals the sampled next state — at most one edge per
    (src, dst) pair exists, so the max selects exactly that edge's
    log-weight and every absent transition stays at the -1e30 mask (hard
    guarantee: transitions outside the edge list, or with exactly zero
    probability, are never sampled). Gumbel noise is generated per step
    inside the scan (O(q) live, not O(L·q) — matters at config-5 q).
    """
    plan = EdgePlan.cached(indices)
    la, _ = sparse_forward(init, indices, edge_probs, E)
    m, b, L, q = E.shape
    S = num_samples
    src_s = jnp.asarray(plan.src_s)
    dst_s = jnp.asarray(plan.dst_s)
    w_s = edge_probs[:, plan.perm_s]  # (m, n) in src-sorted order
    log_w = jnp.where(w_s > 0, jnp.log(_clamped(w_s)), _SAMPLE_MASK)

    keys = jax.random.split(key, L)
    g_last = jax.random.gumbel(keys[-1], (m, b, S, q), la.dtype)
    s_last = jnp.argmax(la[:, :, -1][:, :, None, :] + g_last, axis=-1)
    la_t = jnp.moveaxis(la, 2, 0)  # (L, m, b, q)

    def _segmax(x):
        out = jax.ops.segment_max(
            jnp.moveaxis(x, -1, 0), src_s, num_segments=q,
            indices_are_sorted=True,
        )
        return jnp.moveaxis(out, 0, -1)

    def step(s_next, inp):
        la_tm, key_t = inp
        g = jax.random.gumbel(key_t, (m, b, S, q), la.dtype)
        hit = dst_s[None, None, None, :] == s_next[..., None]  # (m,b,S,n)
        contrib = jnp.where(hit, log_w[:, None, None, :], _SAMPLE_MASK)
        w_col = jnp.maximum(_segmax(contrib), _SAMPLE_MASK)  # (m,b,S,q)
        s = jnp.argmax(la_tm[:, :, None, :] + w_col + g, axis=-1)
        return s, s

    _, path = lax.scan(step, s_last, (la_t[:-1], keys[:-1]), reverse=True)
    paths = jnp.concatenate([path, s_last[None]], axis=0)  # (L, m, b, S)
    return jnp.moveaxis(paths, 0, -1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Baum-Welch EM over edge lists
# ---------------------------------------------------------------------------


def sparse_expected_statistics(init, indices, edge_probs, E):
    """E-step statistics over the edge list.

    Returns:
        gamma: (m, b, L, q) posterior state probabilities (linear).
        xi_edge: (m, n_edges) expected transition counts per edge, summed
            over batch and time (caller edge order) — the edge-list form
            of ``ops.em.expected_statistics``'s dense ``xi_sum``; its
            accumulation is exactly the balanced-shift ``_edge_outer_sum``
            the analytic loglik VJP uses.
        loglik: (m, b).
    """
    plan = EdgePlan.cached(indices)
    la, ll = sparse_forward(init, plan.indices, edge_probs, E)
    lb = sparse_backward(plan.indices, edge_probs, E)
    log_E = jnp.log(_clamped(E))
    gamma = jnp.exp(la + lb - ll[..., None, None])

    csh = jnp.max(la[:, :, :-1], axis=-1, keepdims=True)
    W = jnp.exp(la[:, :, :-1] - csh)
    U = jnp.exp(lb[:, :, 1:] + log_E[:, :, 1:] - ll[..., None, None] + csh)
    xi_edge = edge_probs * _edge_outer_sum(plan, W, U)
    return gamma, xi_edge, ll


def sparse_em_step(init, indices, edge_probs, E, pseudocount: float = 0.0):
    """One Baum-Welch update of the init distribution and edge probabilities.

    ``new_init(i) ∝ sum_b gamma_0(i)``; ``new_w_e ∝ xi_edge(e)`` normalized
    over each source state's out-edges (rows stay stochastic over the edge
    support — the grammar cannot gain transitions, matching the dense
    ``em_step``'s structure preservation). Edges with zero expected count
    and zero pseudocount keep probability 0.

    Returns:
        (new_init (m, q), new_edge_probs (m, n), loglik (m, b)) — loglik is
        the pre-update likelihood (monotone non-decreasing across steps).
    """
    plan = EdgePlan.cached(indices)
    q = E.shape[-1]
    gamma, xi_edge, ll = sparse_expected_statistics(
        init, indices, edge_probs, E
    )

    init_counts = (jnp.sum(gamma[:, :, 0], axis=1) + pseudocount) * (init > 0)
    new_init = init_counts / jnp.maximum(
        jnp.sum(init_counts, axis=-1, keepdims=True), EPS
    )

    counts = xi_edge + pseudocount
    counts_s = counts[:, plan.perm_s]  # src-sorted
    row = jax.ops.segment_sum(
        jnp.moveaxis(counts_s, -1, 0),
        jnp.asarray(plan.src_s),
        num_segments=q,
        indices_are_sorted=True,
    )  # (q, m)
    row_per_edge = jnp.moveaxis(row, 0, -1)[:, jnp.asarray(plan.indices[:, 0])]
    new_w = jnp.where(
        row_per_edge > 0, counts / jnp.maximum(row_per_edge, EPS), edge_probs
    )
    return new_init, new_w, ll


# ---------------------------------------------------------------------------
# Time-blocked recompute backward for the posterior adjoint (memory mode)
# ---------------------------------------------------------------------------
#
# The default posterior custom-VJP saves `la` and `lg` residuals and its
# backward materializes ~a dozen O(m·b·L·q) intermediates at once — at
# config-5 scale (q=505, L=10k) posterior-CE training OOMs at b=64
# (33 G > 15.75 G HBM, BASELINE.md round 4). This variant applies the
# gradient-checkpointing trick the dense chunked VJP plays with its C
# residuals (ops/recursion.py): the forward saves only O(L/c) boundary
# columns of the forward/backward variables; the backward runs two static
# passes over time blocks — a forward pass solving the `chat` adjoint
# recursion and a reverse pass solving `bhat` — recomputing la/lb WITHIN
# each block from the checkpoints, so peak memory is the unavoidable
# O(m·b·L·q) tensors (E, ct, gE) plus an O(m·b·c·q) working set. Cost: la
# and lb are recomputed twice each (once per pass) — ~2 extra recursion
# scans per step. Select with ``backward_block`` (or the
# ``set_sparse_posterior_block`` trace-time global, env-seeded by
# ``HMM_SPARSE_POSTERIOR_BLOCK``).

_POSTERIOR_BLOCK = int(os.environ.get("HMM_SPARSE_POSTERIOR_BLOCK", "0")) or None


def set_sparse_posterior_block(block):
    """Set the default time-block size of the sparse posterior backward
    (``None`` = unblocked fast path). Read at TRACE time, like
    :func:`hmm_layer_tpu.ops.recursion.set_dp_precision`."""
    global _POSTERIOR_BLOCK
    prev = _POSTERIOR_BLOCK
    _POSTERIOR_BLOCK = block
    return prev


def _blk_la(plan, w_d, init, E, k, c, la_ckpt):
    """Recompute the log-forward column block k from its left checkpoint."""
    q = E.shape[-1]
    Et = jnp.moveaxis(E[:, :, k * c:(k + 1) * c], 2, 0)
    step = _scaled_fwd_step(w_d, plan.src_d, plan.dst_d, q, emit_log=True)

    if k == 0:
        s0 = _clamped(Et[0]) * _clamped(init)[:, None, :]
        z0 = jnp.sum(s0, axis=-1, keepdims=True)
        a, l = s0 / z0, jnp.log(z0[..., 0])
        la0 = (jnp.log(a) + l[..., None])[None]
        if c == 1:
            out = la0
        else:
            _, rest = lax.scan(step, (a, l), Et[1:])
            out = jnp.concatenate([la0, rest], axis=0)
    else:
        prev = la_ckpt[:, :, k - 1]  # la at position k*c - 1
        l = jax.nn.logsumexp(prev, axis=-1)
        a = jnp.exp(prev - l[..., None])
        _, out = lax.scan(step, (a, l), Et)
    return jnp.moveaxis(out, 0, 2)  # (m, b, c, q)


def _blk_lb(plan, w_s, E, k, c, nb, lb_ckpt):
    """Recompute the log-backward column block k from its right checkpoint."""
    m, b, L, q = E.shape
    step = _scaled_bwd_step(w_s, plan.dst_s, plan.src_s, q, emit_log=True)

    if k == nb - 1:
        beta, l = jnp.ones((m, b, q), E.dtype), jnp.zeros((m, b), E.dtype)
        lb_last = jnp.zeros((1, m, b, q), E.dtype)
        if c == 1:
            out = lb_last
        else:
            Et = jnp.moveaxis(E[:, :, k * c + 1:], 2, 0)
            _, rest = lax.scan(step, (beta, l), Et, reverse=True)
            out = jnp.concatenate([rest, lb_last], axis=0)
    else:
        nxt = lb_ckpt[:, :, k]  # lb at position (k+1)*c
        l = jnp.max(nxt, axis=-1)
        beta = jnp.exp(nxt - l[..., None])
        Et = jnp.moveaxis(E[:, :, k * c + 1:(k + 1) * c + 1], 2, 0)
        _, out = lax.scan(step, (beta, l), Et, reverse=True)
    return jnp.moveaxis(out, 0, 2)  # (m, b, c, q)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sparse_posterior_blocked(plan, no_loglik, block, init, edge_probs, E):
    return _sparse_posterior_taped(
        init, plan.indices, edge_probs, E, no_loglik
    )


def _sparse_posterior_blocked_fwd(plan, no_loglik, block, init, edge_probs, E):
    la, ll = sparse_forward(init, plan.indices, edge_probs, E)
    lb = sparse_backward(plan.indices, edge_probs, E)
    lg = la + lb
    if not no_loglik:
        lg = lg - ll[..., None, None]
    L, c = E.shape[2], block
    la_ckpt = la[:, :, c - 1:L - 1:c]  # la at k*c-1, k = 1..nb-1
    lb_ckpt = lb[:, :, c::c]           # lb at (k+1)*c, k = 0..nb-2
    return (lg, ll), (init, edge_probs, E, ll, la_ckpt, lb_ckpt)


def _sparse_posterior_blocked_bwd(plan, no_loglik, block, res, cts):
    """Two-pass blocked form of ``_sparse_posterior_fast_bwd`` — same
    gamma-centered math (see there and ops/recursion.py
    ``_posterior_analytic_vjp`` for the derivation), restructured so only
    block-local O(m·b·c·q) intermediates are live at a time."""
    init, edge_probs, E, ll, la_ckpt, lb_ckpt = res
    ct, ct_ll_direct = cts
    c = block
    sig = jnp.sum(ct, axis=-1)  # (m, b, L)
    return _blocked_posterior_adjoint(
        plan, no_loglik, block, init, edge_probs, E, ll, la_ckpt, lb_ckpt,
        lambda k: ct[:, :, k * c:(k + 1) * c], sig, ct_ll_direct,
    )


def _blocked_posterior_adjoint(
    plan, no_loglik, block, init, edge_probs, E, ll, la_ckpt, lb_ckpt,
    ct_blk, sig, ct_ll_direct,
):
    """Core of the blocked posterior backward, parameterized over the
    posterior cotangent: ``ct_blk(k) -> (m, b, c, q)`` materializes one
    block of it at a time and ``sig`` is its per-position sum over states
    (O(m·b·L), no q axis). The fused CE objective exploits this: its
    cotangent is a scaled one-hot of the labels, so the full (m,b,L,q)
    tensor never exists."""
    m, b, L, q = E.shape
    c = block
    assert L % c == 0, f"backward_block {c} must divide L={L}"
    nb = L // c
    w_d = edge_probs[..., plan.perm_d][:, None, :]
    w_s = edge_probs[..., plan.perm_s][:, None, :]

    sig_tot = jnp.sum(sig, axis=-1)             # (m, b)
    ct_ll_eff = ct_ll_direct if no_loglik else ct_ll_direct - sig_tot
    K = sig + ct_ll_direct[..., None]
    if no_loglik:
        K = K + sig_tot[..., None]
    kappa = ct_ll_direct + (sig_tot if no_loglik else 0.0)

    def blk(x, k):
        return x[:, :, k * c:(k + 1) * c]

    def proj(x, gam):
        return x - gam * jnp.sum(x, axis=-1, keepdims=True)

    # ---- pass A (forward over blocks): chat adjoint + its contributions ----
    chat_raw = jnp.zeros((m, b, q), E.dtype)      # chat at k*c - 1
    chat_prev_proj = jnp.zeros((m, b, q), E.dtype)
    lb_prev = jnp.zeros((m, b, q), E.dtype)
    g_edge2 = jnp.zeros((m, plan.n), E.dtype)
    gE_A_blocks = []
    for k in range(nb):
        la_b = _blk_la(plan, w_d, init, E, k, c, la_ckpt)
        lb_b = _blk_lb(plan, w_s, E, k, c, nb, lb_ckpt)
        lE_b = jnp.log(_clamped(blk(E, k)))  # block-local, not O(L·q)
        ct_b = ct_blk(k)
        gam_b = jnp.exp(la_b + lb_b - ll[..., None, None])
        src_c_b = ct_b - gam_b * blk(sig[..., None], k)
        elb_b = lE_b + lb_b
        sp_b = jnp.max(elb_b, axis=-1, keepdims=True)
        gp_b = jnp.exp(elb_b - sp_b)
        # fp[t] = exp(sp[t] - lb[t-1]); t = k*c uses the carry (0 for k=0)
        lb_shift = jnp.concatenate(
            [lb_prev[:, :, None], lb_b[:, :, :-1]], axis=2
        )
        fp_b = jnp.exp(sp_b - lb_shift)
        if k == 0:
            fp_b = fp_b.at[:, :, 0].set(0.0)

        def astep(x_prev, inp):
            gp_t, fp_t, c_t = inp
            x_t = c_t + gp_t * plan.matvec(
                edge_probs, fp_t * x_prev, q, transpose=True
            )
            return x_t, x_t

        tm = lambda x: jnp.moveaxis(x, 2, 0)
        chat_raw, chat_b = lax.scan(
            astep, chat_raw, (tm(gp_b), tm(fp_b), tm(src_c_b))
        )
        chat_b = jnp.moveaxis(chat_b, 0, 2)
        chat_pb = proj(chat_b, gam_b)
        gE_A_blocks.append(
            (gam_b * blk(K[..., None], k) + chat_pb - ct_b)
            / _clamped(blk(E, k)) * (blk(E, k) >= EPS)
        )
        # g_edge term 2 pairs owned by this block: t in [k*c-1, k*c+c-2]
        Fp_pair = jnp.concatenate(
            [chat_prev_proj[:, :, None], chat_pb[:, :, :-1]], axis=2
        ) * jnp.exp(sp_b - lb_shift)
        Gp_pair = jnp.exp(elb_b - sp_b)
        if k == 0:  # no pair at t = -1
            Fp_pair = Fp_pair[:, :, 1:]
            Gp_pair = Gp_pair[:, :, 1:]
        g_edge2 = g_edge2 + _edge_outer_sum(plan, Fp_pair, Gp_pair)
        chat_prev_proj = chat_pb[:, :, -1]
        lb_prev = lb_b[:, :, -1]

    # ---- pass B (reverse over blocks): bhat adjoint + its contributions ----
    bhat_raw = jnp.zeros((m, b, q), E.dtype)      # bhat at (k+1)*c
    bhat_next_proj = jnp.zeros((m, b, q), E.dtype)
    la_next = jnp.zeros((m, b, q), E.dtype)
    lb_next = jnp.zeros((m, b, q), E.dtype)
    lE_next = jnp.zeros((m, b, q), E.dtype)
    g_edge1 = jnp.zeros((m, plan.n), E.dtype)
    gE_B_blocks = [None] * nb
    ginit = None
    for k in range(nb - 1, -1, -1):
        la_b = _blk_la(plan, w_d, init, E, k, c, la_ckpt)
        lb_b = _blk_lb(plan, w_s, E, k, c, nb, lb_ckpt)
        lE_b = jnp.log(_clamped(blk(E, k)))
        gam_b = jnp.exp(la_b + lb_b - ll[..., None, None])
        src_c_b = ct_blk(k) - gam_b * blk(sig[..., None], k)
        s_b = jnp.max(la_b, axis=-1, keepdims=True)
        f_b = jnp.exp(la_b - s_b)
        # gbar[t] = exp(logE[t+1] + s[t] - la[t+1]); t = (k+1)c-1 uses carry
        la_shift = jnp.concatenate(
            [la_b[:, :, 1:], la_next[:, :, None]], axis=2
        )
        lE_shift = jnp.concatenate(
            [lE_b[:, :, 1:], lE_next[:, :, None]], axis=2
        )
        gbar_b = jnp.exp(lE_shift + s_b - la_shift)
        if k == nb - 1:
            gbar_b = gbar_b.at[:, :, -1].set(0.0)

        def bstep(x_next, inp):
            f_t, gbar_t, c_t = inp
            x_t = c_t + f_t * plan.matvec(
                edge_probs, gbar_t * x_next, q, transpose=False
            )
            return x_t, x_t

        tm = lambda x: jnp.moveaxis(x, 2, 0)
        bhat_raw, bhat_b = lax.scan(
            bstep, bhat_raw, (tm(f_b), tm(gbar_b), tm(src_c_b)),
            reverse=True,
        )
        bhat_b = jnp.moveaxis(bhat_b, 0, 2)
        bhat_pb = proj(bhat_b, gam_b)
        # fold this block's pass-A part in here: ONE final concat, not two
        gE_B_blocks[k] = gE_A_blocks[k] + bhat_pb / _clamped(
            blk(E, k)
        ) * (blk(E, k) >= EPS)
        # g_edge term 1 pairs owned by this block: t in [k*c, (k+1)c-1]
        # (the t = (k+1)c-1 pair pulls position (k+1)c from the carries;
        # for the last block that pair does not exist)
        csh_b = s_b  # max over q of la[t]
        F_pair = jnp.exp(la_b - csh_b)
        lb_shift = jnp.concatenate(
            [lb_b[:, :, 1:], lb_next[:, :, None]], axis=2
        )
        bh_shift = jnp.concatenate(
            [bhat_pb[:, :, 1:], bhat_next_proj[:, :, None]], axis=2
        )
        xi_u_b = (
            jnp.exp(lb_shift + lE_shift - ll[..., None, None] + csh_b)
            * kappa[..., None, None]
        )
        G1_pair = xi_u_b + bh_shift * jnp.exp(lE_shift - la_shift + csh_b)
        if k == nb - 1:  # no pair at t = L-1
            F_pair = F_pair[:, :, :-1]
            G1_pair = G1_pair[:, :, :-1]
        g_edge1 = g_edge1 + _edge_outer_sum(plan, F_pair, G1_pair)
        bhat_next_proj = bhat_pb[:, :, 0]
        la_next = la_b[:, :, 0]
        lb_next = lb_b[:, :, 0]
        lE_next = lE_b[:, :, 0]
        if k == 0:
            R0 = sig_tot + ct_ll_eff
            bar0 = gam_b[:, :, 0] * R0[..., None] + bhat_pb[:, :, 0]
            ginit = (
                jnp.sum(bar0, axis=1) / _clamped(init) * (init >= EPS)
            )

    gE = jnp.concatenate(gE_B_blocks, axis=2)
    return ginit, g_edge1 + g_edge2, gE


_sparse_posterior_blocked.defvjp(
    _sparse_posterior_blocked_fwd, _sparse_posterior_blocked_bwd
)


# ---------------------------------------------------------------------------
# Fused posterior cross-entropy (supervised training at config-5 memory scale)
# ---------------------------------------------------------------------------


def sparse_posterior_cross_entropy(
    init,
    indices,
    edge_probs,
    E,
    labels,
    label_mask=None,
    no_loglik: bool = False,
    backward_block: int | None = None,
):
    """Mean label cross-entropy of the sparse posterior, fused to a scalar.

    Exactly ``-mean(take_along_axis(sparse_posterior(...)[0], labels))``
    (mask-weighted when ``label_mask`` is given), but the (m, b, L, q)
    posterior and its cotangent are NEVER materialized: the backward runs
    the blocked gamma-centered adjoint with the cotangent generated
    per block as a scaled one-hot of the labels. Peak memory is E + gE
    plus the transient forward variables — at config-5 scale (q=505,
    L=10k, b=64) XLA's own memory analysis puts the unfused unblocked
    objective at 20.5 GiB temp vs ~a quarter of that fused+blocked.
    ``backward_block`` defaults to the :func:`set_sparse_posterior_block`
    global, else one block (no recompute, still fused).
    """
    plan = EdgePlan.cached(indices)
    L = E.shape[2]
    block = backward_block if backward_block is not None else _POSTERIOR_BLOCK
    block = int(block) if block else L
    if L % block:
        raise ValueError(f"backward_block {block} must divide L={L}")
    labels = jnp.asarray(labels)
    if labels.ndim == E.ndim - 2:
        labels = labels[None]
    labels = jnp.broadcast_to(labels, E.shape[:3]).astype(jnp.int32)
    if label_mask is None:
        w = jnp.ones(E.shape[:3], E.dtype)
    else:
        w = jnp.broadcast_to(
            jnp.asarray(label_mask, E.dtype), E.shape[:3]
        )
    return _sparse_ce_fused(
        plan, bool(no_loglik), block, init, edge_probs, E, labels, w
    )


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _sparse_ce_fused(plan, no_loglik, block, init, edge_probs, E, labels, w):
    la, ll = sparse_forward(init, plan.indices, edge_probs, E)
    lb = sparse_backward(plan.indices, edge_probs, E)
    lg_lab = jnp.take_along_axis(la + lb, labels[..., None], axis=-1)[..., 0]
    if not no_loglik:
        lg_lab = lg_lab - ll[..., None]
    return -jnp.sum(lg_lab * w) / jnp.maximum(jnp.sum(w), 1.0)


def _sparse_ce_fused_fwd(plan, no_loglik, block, init, edge_probs, E, labels, w):
    la, ll = sparse_forward(init, plan.indices, edge_probs, E)
    lb = sparse_backward(plan.indices, edge_probs, E)
    lg_lab = jnp.take_along_axis(la + lb, labels[..., None], axis=-1)[..., 0]
    if not no_loglik:
        lg_lab = lg_lab - ll[..., None]
    ce = -jnp.sum(lg_lab * w) / jnp.maximum(jnp.sum(w), 1.0)
    L, c = E.shape[2], block
    la_ckpt = la[:, :, c - 1:L - 1:c]
    lb_ckpt = lb[:, :, c::c]
    # lg_lab/ce ride along for the label_mask gradient — O(m·b·L), no q.
    return ce, (init, edge_probs, E, ll, la_ckpt, lb_ckpt, labels, w,
                lg_lab, ce)


def _sparse_ce_fused_bwd(plan, no_loglik, block, res, g):
    init, edge_probs, E, ll, la_ckpt, lb_ckpt, labels, w, lg_lab, ce = res
    m, b, L, q = E.shape
    c = block
    N = jnp.maximum(jnp.sum(w), 1.0)
    scale = -g / N
    sig = w * scale  # per-position sum over q of the one-hot cotangent

    def ct_blk(k):
        lab_b = labels[:, :, k * c:(k + 1) * c]
        w_b = sig[:, :, k * c:(k + 1) * c]
        return jax.nn.one_hot(lab_b, q, dtype=E.dtype) * w_b[..., None]

    ginit, g_edge, gE = _blocked_posterior_adjoint(
        plan, no_loglik, c, init, edge_probs, E, ll, la_ckpt, lb_ckpt,
        ct_blk, sig, jnp.zeros(ll.shape, E.dtype),
    )
    f0 = np.zeros(labels.shape, jax.dtypes.float0)
    # d ce / d w_t: quotient rule on -S_lg/N with N = max(sum(w), 1) —
    # the -ce/N term exists only while the clamp is INACTIVE (sum(w) > 1;
    # below it N is the constant 1 and only the numerator varies). The
    # mask is a real operand of the objective, so a soft/learned mask
    # must receive its true gradient (the unfused path does).
    dN = (jnp.sum(w) > 1.0).astype(w.dtype)
    g_w = g * (-lg_lab - ce * dN) / N
    return ginit, g_edge, gE, f0, g_w


_sparse_ce_fused.defvjp(_sparse_ce_fused_fwd, _sparse_ce_fused_bwd)

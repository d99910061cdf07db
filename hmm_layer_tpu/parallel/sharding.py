"""Multi-device sharding for HMM inference and training.

The reference is single-process, single-device eager PyTorch with no
distributed code at all (SURVEY.md §2); this module provides the TPU-native
scaling design demanded by BASELINE.json:

* **Data parallelism** — batches sharded over a ``data`` mesh axis with
  ``jax.jit`` + ``NamedSharding``; loss/gradient reductions become XLA
  ``psum`` collectives over ICI/DCN automatically.
* **State parallelism (TP analog)** — for large state counts (q >= 500,
  BASELINE config 5) the transition matrix columns, emission columns and the
  alpha carry are sharded over a ``state`` axis; each scan step computes a
  partial ``alpha @ A`` and reduces with ``psum`` (``shard_map``).
* **Sequence parallelism (SP/CP analog)** — the sequence axis is sharded
  over a ``seq`` axis; each device computes one ``q x q`` log-space block
  summary (the same operator the chunked engine uses per chunk,
  :mod:`hmm_layer_tpu.ops.recursion`), summaries are ``all_gather``-ed
  (tiny, off the critical path) and combined device-locally.

All functions take explicit ``jax.sharding.Mesh`` handles and are pure.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.recursion import (
    _affine_boundary_fold,
    _affine_composites,
    _affine_outputs,
    _backward_adjoint_weights,
    _backward_gA_factors,
    _backward_outputs,
    _boundary_backtrace,
    _chunk_summaries,
    _clamped,
    _forward_adjoint_weights,
    _forward_gA_factors,
    _forward_outputs,
    _loglik_bw_stats,
    _split_chunks,
    _summaries_from_rows,
    _viterbi_boundaries,
    _viterbi_chunk_summaries,
    _viterbi_outputs,
)
from ..ops.semiring import EPS, logmatmul, maxmatmul

_PRECISION = lax.Precision.HIGHEST

__all__ = [
    "init_distributed",
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_fn",
    "data_parallel_em_step",
    "data_parallel_em_step_categorical",
    "state_sharded_log_likelihood",
    "state_sharded_posterior",
    "state_sharded_viterbi",
    "seq_sharded_log_likelihood",
    "seq_sharded_posterior",
    "seq_sharded_viterbi",
]


def _plogsumexp(x, axis_name):
    """Elementwise log-sum-exp reduction across a mesh axis.

    The max shift is wrapped in stop_gradient (exact for any constant
    shift) so the reduction stays differentiable — ``lax.pmax`` has no
    differentiation rule (it raises NotImplementedError at trace time even
    under stop_gradient, because the JVP rule is looked up regardless), so
    the cross-device max runs as all_gather + max."""
    m = lax.stop_gradient(jnp.max(lax.all_gather(x, axis_name), axis=0))
    safe = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.log(lax.psum(jnp.exp(x - safe), axis_name)) + safe


def init_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (TPU pod slices).

    Thin wrapper over ``jax.distributed.initialize`` — on TPU pods the
    coordinator address, process count and process id are discovered from
    the environment, so call this with no arguments before any backend use;
    kwargs pass through for manual setups. After initialization,
    :func:`make_mesh` over ``jax.devices()`` spans all hosts and the
    sharded functions below run with ICI/DCN collectives unchanged.
    """
    jax.distributed.initialize(**kwargs)


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Create a mesh from ``{"data": 2, "state": 2, ...}``.

    Axis order follows dict order; total size must not exceed available
    devices.
    """
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"mesh {axis_sizes} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, names)


def shard_batch(x, mesh: Mesh, axis: str = "data", batch_dim: int = 1):
    """Place an (m, b, L, s) batch with ``b`` sharded over ``axis``."""
    spec = [None] * x.ndim
    spec[batch_dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(tree, mesh: Mesh):
    """Replicate a params pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def data_parallel_fn(
    fn,
    mesh: Mesh,
    axis: str = "data",
    batch_dim: int = 1,
    donate_params: bool = False,
):
    """Jit ``fn(params, x, ...)`` with ``x`` batch-sharded over ``axis``.

    Params are constrained to replicated sharding and the batch to
    ``axis``-sharded, so XLA inserts the cross-device reductions (mean/sum
    over batch, gradient psums) and no accidental resharding happens at the
    call boundary. ``donate_params=True`` donates the params buffers — the
    right setting for ``new_params = step(params, batch)`` training loops,
    where it makes the update in-place on device (do not reuse the donated
    ``params`` afterwards).
    """
    repl = NamedSharding(mesh, P())

    def x_sharding(x_ndim):
        spec = [None] * x_ndim
        spec[batch_dim] = axis
        return NamedSharding(mesh, P(*spec))

    @partial(jax.jit, donate_argnums=(0,) if donate_params else ())
    def wrapped(params, x, *args, **kwargs):
        params = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, repl), params
        )
        x = jax.lax.with_sharding_constraint(x, x_sharding(x.ndim))
        return fn(params, x, *args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# State-sharded forward (tensor-parallel analog)
# ---------------------------------------------------------------------------


def _border_sharded_chunk_operators(
    A_l, E_l, P_local, n_state, idx, state_axis, first_chunk_identity=True
):
    """Chunk transfer operators with the left-border axis sharded.

    The chunk-summary scan conditions on every possible left-border state —
    an embarrassingly parallel axis: each device computes the operator ROWS
    for its border-state block using the full (replicated, tiny) ``A`` and
    full emissions, with **zero per-step collectives**. This is the
    state-sharded path that keeps the O(b·P·q²) operator carry partitioned
    (the q² carry is the memory hog at 500+ states, BASELINE config 5).

    Returns C_l: (P, m, b, q_l, q) log-space operator row-blocks.
    """
    m, b, L, q = E_l.shape
    q_l = q // n_state
    col0 = idx * q_l
    Ec, c = _split_chunks(E_l, P_local)
    Et = jnp.moveaxis(Ec, 2, 0)  # (c, m, bP, q)

    rows = col0 + jnp.arange(q_l)
    eye_rows = jax.nn.one_hot(rows, q, dtype=E_l.dtype)  # (q_l, q)
    A_rows = lax.dynamic_slice_in_dim(A_l, col0, q_l, axis=1)  # (m, q_l, q)
    is_first = jnp.asarray(
        (jnp.arange(P_local) == 0) & first_chunk_identity, E_l.dtype
    )[None, None, :, None, None]
    R0 = (
        is_first * eye_rows[None, None, None]
        + (1.0 - is_first) * A_rows[:, None, None]
    )
    R0 = jnp.broadcast_to(R0, (m, b, P_local, q_l, q)).reshape(
        m, b * P_local, q_l, q
    )
    C_l = _summaries_from_rows(A_l, Et, R0)  # (m, bP, q_l, q)
    return jnp.moveaxis(C_l.reshape(m, b, P_local, q_l, q), 2, 0)


def _sharded_boundary_folds(
    init_l, C_l, state_axis, q_l, idx, want_backward=True
):
    """Forward/backward values at chunk boundaries from row-sharded operators.

    Sequential log-matvec folds over the P chunks (O(P·q²) — cheaper than
    the dense engine's associative matmul scan at large q) with one tiny
    collective per chunk: the forward fold contracts over the sharded
    border axis (partial LSE + cross-device LSE), the backward fold
    contracts over the full column axis and all-gathers its q_l-row result.

    Returns (T, S, ll) with the `_boundary_values` conventions; S is None
    when ``want_backward=False``.
    """
    P_, m, b = C_l.shape[:3]
    q = C_l.shape[-1]
    col0 = idx * q_l
    log_init = jnp.log(_clamped(init_l))  # (m, q)
    v0 = jnp.broadcast_to(log_init[:, None, :], (m, b, q))

    def fstep(v, C_p):
        v_rows = lax.dynamic_slice_in_dim(v, col0, q_l, axis=-1)
        part = jax.nn.logsumexp(v_rows[..., :, None] + C_p, axis=-2)
        v_new = _plogsumexp(part, state_axis)
        return v_new, v_new

    _, T = lax.scan(fstep, v0, C_l)  # (P, m, b, q)
    ll = jax.nn.logsumexp(T[-1], axis=-1)
    if not want_backward:
        return T, None, ll

    w0 = jnp.zeros((m, b, q), C_l.dtype)

    def bstep(w, C_p):
        # Emit S[p] = w (backward at chunk p's end), then fold chunk p.
        w_rows = jax.nn.logsumexp(C_p + w[..., None, :], axis=-1)  # (m,b,q_l)
        w_new = lax.all_gather(w_rows, state_axis, axis=-1, tiled=True)
        return w_new, w

    _, S = lax.scan(bstep, w0, C_l, reverse=True)  # (P, m, b, q)
    return T, S, ll


def state_sharded_log_likelihood(
    init,
    A,
    E,
    mesh: Mesh,
    state_axis: str = "state",
    data_axis: str | None = None,
    parallel_factor: int = 1,
):
    """Log-likelihood with the state dimension sharded across devices.

    ``parallel_factor == 1``: sequential scaled scan; each device holds the
    row block ``A[shard_i, :]`` and the alpha/emission column block; every
    step computes the partial product ``alpha_local @ A_local`` and
    ``psum``s over the state axis.

    ``parallel_factor > 1``: chunk-parallel engine with the *left-border*
    axis of the chunk operators sharded
    (:func:`_border_sharded_chunk_operators`) — the summary pass runs with
    zero per-step collectives and the O(b·P·q²) operator carry partitioned;
    only the O(P) boundary fold communicates (one tiny LSE-reduce per
    chunk).

    Args:
        init: (m, q); A: (m, q, q); E: (m, b, L, q). ``q`` must be divisible
            by the state-axis size (pad upstream if necessary).
    Returns:
        (m, b) log-likelihoods, replicated.
    """
    n_state = mesh.shape[state_axis]
    q = E.shape[-1]
    assert q % n_state == 0, f"q={q} not divisible by state axis size {n_state}"
    batch_spec = data_axis

    if parallel_factor > 1:

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(None, None),
                P(None, None, None),
                P(None, batch_spec, None, None),
            ),
            out_specs=P(None, batch_spec),
            check_vma=False,
        )
        def _ll_chunked(init_l, A_l, E_l):
            idx = lax.axis_index(state_axis)
            C_l = _border_sharded_chunk_operators(
                A_l, E_l, parallel_factor, n_state, idx, state_axis
            )
            _, _, ll = _sharded_boundary_folds(
                init_l, C_l, state_axis, q // n_state, idx, want_backward=False
            )
            return ll

        return _ll_chunked(init, A, E)

    in_specs = (
        P(None, state_axis),  # init (m, q)
        P(None, state_axis, None),  # A rows sharded (m, q, q)
        P(None, batch_spec, None, state_axis),  # E (m, b, L, q)
    )
    out_specs = P(None, batch_spec)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    def _ll(init_l, A_l, E_l):
        # Local shapes: init_l (m, q_l); A_l (m, q_l, q); E_l (m, b_l, L, q_l).
        m, b, L, q_l = E_l.shape
        idx = lax.axis_index(state_axis)
        Et = jnp.moveaxis(E_l, 2, 0)  # (L, m, b, q_l)

        s0 = _clamped(Et[0]) * _clamped(init_l)[:, None, :]
        z0 = lax.psum(jnp.sum(s0, axis=-1, keepdims=True), state_axis)
        carry0 = (s0 / z0, jnp.log(z0[..., 0]))

        def step(carry, e_t):
            alpha_l, ll = carry  # alpha_l: local columns (m, b, q_l)
            partial_r = jnp.einsum(
                "mbq,mqp->mbp", alpha_l, A_l, precision=_PRECISION
            )  # (m, b, q) partial over local contraction rows
            r_full = lax.psum(partial_r, state_axis)
            r_l = lax.dynamic_slice_in_dim(r_full, idx * q_l, q_l, axis=-1)
            s = _clamped(e_t) * _clamped(r_l)
            z = lax.psum(jnp.sum(s, axis=-1, keepdims=True), state_axis)
            return (s / z, ll + jnp.log(z[..., 0])), None

        (alpha_l, ll), _ = lax.scan(step, carry0, Et[1:])
        return ll

    return _ll(init, A, E)


def state_sharded_posterior(
    init,
    A,
    E,
    mesh: Mesh,
    state_axis: str = "state",
    data_axis: str | None = None,
    no_loglik: bool = False,
    parallel_factor: int = 1,
):
    """Posterior state log-probabilities with the state dimension sharded.

    For 500+-state models (multi-copy gene-pred HMMs, BASELINE config 5)
    where a q x q chunk operator would not fit.

    ``parallel_factor == 1``: sequential scaled forward and backward scans
    with alpha/beta columns sharded over ``state_axis``; each step computes
    the partial contraction against the local A block and reduces with
    ``psum``. The transition matrix is consumed twice — row-sharded
    (forward) and column-sharded (backward).

    ``parallel_factor > 1``: chunk-parallel engine with the operator rows
    border-sharded (zero per-step collectives in the dominant O(L·q³/P·P)
    summary pass, :func:`_border_sharded_chunk_operators`); the cheap
    O(L·q²) output passes run redundantly on full state vectors (a few
    percent of the summary FLOPs at q >= 500) and each device emits its
    posterior column block.

    Returns:
        (log_gamma (m, b, L, q) sharded on q, loglik (m, b)).
    """
    n_state = mesh.shape[state_axis]
    q = E.shape[-1]
    assert q % n_state == 0, f"q={q} not divisible by state axis size {n_state}"

    if parallel_factor > 1:
        q_l = q // n_state

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(None, None),
                P(None, None, None),
                P(None, data_axis, None, None),
            ),
            out_specs=(
                P(None, data_axis, None, state_axis),
                P(None, data_axis),
            ),
            check_vma=False,
        )
        def _post_chunked(init_l, A_l, E_l):
            idx = lax.axis_index(state_axis)
            col0 = idx * q_l
            C_l = _border_sharded_chunk_operators(
                A_l, E_l, parallel_factor, n_state, idx, state_axis
            )
            T, S, ll = _sharded_boundary_folds(
                init_l, C_l, state_axis, q_l, idx
            )
            la = _forward_outputs(init_l, A_l, E_l, T, parallel_factor)
            lb = _backward_outputs(A_l, E_l, S, parallel_factor)
            log_gamma = la + lb
            if not no_loglik:
                log_gamma = log_gamma - ll[..., None, None]
            return (
                lax.dynamic_slice_in_dim(log_gamma, col0, q_l, axis=-1),
                ll,
            )

        return _post_chunked(init, A, E)

    in_specs = (
        P(None, state_axis),  # init (m, q)
        P(None, state_axis, None),  # A rows sharded (forward contraction)
        P(None, None, state_axis),  # A cols sharded (backward contraction)
        P(None, data_axis, None, state_axis),  # E (m, b, L, q)
    )
    out_specs = (P(None, data_axis, None, state_axis), P(None, data_axis))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    def _post(init_l, A_r, A_c, E_l):
        m, b, L, q_l = E_l.shape
        idx = lax.axis_index(state_axis)
        Et = jnp.moveaxis(E_l, 2, 0)  # (L, m, b, q_l)

        # -- scaled forward with per-position outputs ---------------------------
        s0 = _clamped(Et[0]) * _clamped(init_l)[:, None, :]
        z0 = lax.psum(jnp.sum(s0, axis=-1, keepdims=True), state_axis)
        carry0 = (s0 / z0, jnp.log(z0[..., 0]))

        def fstep(carry, e_t):
            alpha_l, ll = carry
            partial_r = jnp.einsum(
                "mbq,mqp->mbp", alpha_l, A_r, precision=_PRECISION
            )
            r_full = lax.psum(partial_r, state_axis)
            r_l = lax.dynamic_slice_in_dim(r_full, idx * q_l, q_l, axis=-1)
            s = _clamped(e_t) * _clamped(r_l)
            z = lax.psum(jnp.sum(s, axis=-1, keepdims=True), state_axis)
            alpha_new, ll_new = s / z, ll + jnp.log(z[..., 0])
            return (alpha_new, ll_new), jnp.log(alpha_new) + ll_new[..., None]

        (alpha_l, ll), fouts = lax.scan(fstep, carry0, Et[1:])
        la0 = jnp.log(carry0[0]) + carry0[1][..., None]
        log_alpha = jnp.concatenate([la0[None], fouts], axis=0)  # (L, m, b, q_l)

        # -- scaled backward ------------------------------------------------------
        beta_last = jnp.ones((m, b, q_l), E_l.dtype)
        bll_last = jnp.zeros((m, b), E_l.dtype)

        def bstep(carry, e_next):
            beta, bll = carry
            r = _clamped(e_next) * beta  # local columns j
            partial_s = jnp.einsum(
                "mbq,mpq->mbp", r, A_c, precision=_PRECISION
            )  # contraction over local j -> full p
            s_full = lax.psum(partial_s, state_axis)
            s_l = _clamped(
                lax.dynamic_slice_in_dim(s_full, idx * q_l, q_l, axis=-1)
            )
            # The rescale factor cancels identically in the emitted
            # log-beta (log(s/z) + (ll + log z)), so it carries ZERO true
            # gradient. lax.pmax has no differentiation rule (it errors
            # even under stop_gradient), so the cross-device max runs as
            # all_gather + max — differentiable, wrapped in stop_gradient
            # to skip the dead backward terms.
            z_loc = jnp.max(s_l, axis=-1, keepdims=True)
            z = lax.stop_gradient(
                jnp.max(lax.all_gather(z_loc, state_axis), axis=0)
            )
            beta_new, bll_new = s_l / z, bll + jnp.log(z[..., 0])
            return (beta_new, bll_new), jnp.log(beta_new) + bll_new[..., None]

        _, bouts = lax.scan(bstep, (beta_last, bll_last), Et[1:], reverse=True)
        lb_last = jnp.zeros((1, m, b, q_l), E_l.dtype)
        log_beta = jnp.concatenate([bouts, lb_last], axis=0)

        log_gamma = jnp.moveaxis(log_alpha + log_beta, 0, 2)  # (m, b, L, q_l)
        if not no_loglik:
            log_gamma = log_gamma - ll[..., None, None]
        return log_gamma, ll

    return _post(init, A, A, E)


def state_sharded_viterbi(
    init,
    A,
    E,
    mesh: Mesh,
    state_axis: str = "state",
    data_axis: str | None = None,
):
    """Viterbi decode with the state dimension sharded across devices.

    The 500+-state decode path (BASELINE config 5): a sequential max-plus
    scan with the delta columns and ``A`` row-blocks sharded over
    ``state_axis``. Each step reduces the partial per-column maxima with
    ``pmax`` and resolves the *global* argmax with a ``pmin`` over
    tied candidates (device d's global state indices all precede device
    d+1's, so the min over tied first-attaining indices reproduces
    ``jnp.argmax`` tie-breaking exactly). Backpointer columns stay local;
    the backtrace walks the chain with one masked ``psum`` per step to
    fetch the pointer from its owning device.

    The result is a BACKTRACE (valid-path guarantee preserved — see
    ``ops.recursion._boundary_backtrace`` for why positionwise argmax
    decoding is not f32-safe).

    Returns:
        states (m, b, L) int32, replicated over the state axis.
    """
    n_state = mesh.shape[state_axis]
    q = E.shape[-1]
    assert q % n_state == 0, f"q={q} not divisible by state axis size {n_state}"
    q_l = q // n_state

    in_specs = (
        P(None, state_axis),  # init columns
        P(None, state_axis, None),  # A rows sharded (contraction dim)
        P(None, data_axis, None, state_axis),  # E columns sharded
    )
    out_specs = P(None, data_axis, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    def _vit(init_l, A_l, E_l):
        m, b, L, _ = E_l.shape
        idx = lax.axis_index(state_axis)
        col0 = idx * q_l
        log_A_l = jnp.log(_clamped(A_l))  # (m, q_l, q) rows local
        log_E = jnp.log(_clamped(E_l))
        Et = jnp.moveaxis(log_E, 2, 0)  # (L, m, b, q_l)
        delta0 = jnp.log(_clamped(init_l))[:, None, :] + Et[0]  # (m, b, q_l)

        def resolve_argmax(best_l, arg_l):
            best = lax.pmax(best_l, state_axis)
            arg = lax.pmin(
                jnp.where(best_l >= best, arg_l, q), state_axis
            )
            return best, arg

        def step(delta_l, e_t):
            # scores[k_local, p] = delta[k] + log_A[k, p] over all columns p.
            scores = delta_l[..., :, None] + log_A_l[:, None]  # (m,b,q_l,q)
            best_l = jnp.max(scores, axis=-2)
            arg_l = (col0 + jnp.argmax(scores, axis=-2)).astype(jnp.int32)
            best, arg = resolve_argmax(best_l, arg_l)
            delta_new = (
                lax.dynamic_slice_in_dim(best, col0, q_l, axis=-1) + e_t
            )
            bp_cols = lax.dynamic_slice_in_dim(arg, col0, q_l, axis=-1)
            return delta_new, bp_cols

        delta_l, bps = lax.scan(step, delta0, Et[1:])  # bps (L-1, m, b, q_l)

        best_l = jnp.max(delta_l, axis=-1)
        arg_l = (col0 + jnp.argmax(delta_l, axis=-1)).astype(jnp.int32)
        _, last = resolve_argmax(best_l, arg_l)  # (m, b) global last state

        def backstep(state, bp_t):
            local = state - col0
            in_range = (local >= 0) & (local < q_l)
            val = jnp.take_along_axis(
                bp_t, jnp.clip(local, 0, q_l - 1)[..., None], axis=-1
            )[..., 0]
            prev = lax.psum(jnp.where(in_range, val, 0), state_axis)
            return prev, prev

        _, path_rev = lax.scan(backstep, last, bps, reverse=True)
        path = jnp.concatenate([path_rev, last[None]], axis=0)  # (L, m, b)
        return jnp.moveaxis(path, 0, 2)

    return _vit(init, A, E)


# ---------------------------------------------------------------------------
# Sequence-sharded forward (sequence/context-parallel analog)
# ---------------------------------------------------------------------------


def seq_sharded_log_likelihood(
    init,
    A,
    E,
    mesh: Mesh,
    seq_axis: str = "seq",
    data_axis: str | None = None,
    local_parallel_factor: int = 1,
):
    """Log-likelihood with the sequence axis sharded across devices.

    Each device reduces its sequence block to a ``q x q`` log-space transfer
    operator (optionally using the intra-device chunked engine with
    ``local_parallel_factor``), the tiny summaries are all-gathered over the
    ``seq`` axis, and the final product is folded locally — one collective
    per sequence, off the per-step critical path.

    Differentiable: reverse-mode gradients run an analytic shard_map-aware
    Baum-Welch VJP (:func:`_seq_ll_bwd`) — device-local expected statistics
    from one boundary exchange, psum'd over the mesh — instead of taping the
    O(L·q²) summary-scan carries. Distributed training at long L therefore
    costs one extra boundary exchange, not extra memory.
    """
    n_seq = mesh.shape[seq_axis]
    L = E.shape[2]
    assert L % n_seq == 0, f"L={L} not divisible by seq axis size {n_seq}"
    return _seq_ll(
        init, A, E, mesh, seq_axis, data_axis, max(local_parallel_factor, 1)
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _seq_ll(init, A, E, mesh, seq_axis, data_axis, P_local):
    return _seq_ll_primal(init, A, E, mesh, seq_axis, data_axis, P_local)


def _seq_ll_primal(init, A, E, mesh, seq_axis, data_axis, P_local):
    n_seq = mesh.shape[seq_axis]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P(None, None, None),
            P(None, data_axis, seq_axis, None),
        ),
        out_specs=P(None, data_axis),
        check_vma=False,
    )
    def _ll(init_l, A_l, E_l):
        m, b, L_l, q = E_l.shape
        idx = lax.axis_index(seq_axis)

        _, block = _local_block_operator(A_l, E_l, P_local, idx, seq_axis)

        # Exchange block summaries (q x q, tiny) and fold left-to-right.
        blocks = lax.all_gather(block, seq_axis)  # (n_seq, m, b, q, q)
        log_init = jnp.log(_clamped(init_l))
        v = log_init[None, :, None, :]  # (1, m, 1, q) -> broadcast over b
        v = jnp.broadcast_to(v[0], (m, b, q))
        for d in range(n_seq):
            v = logmatmul(v[..., None, :], blocks[d])[..., 0, :]
        return jax.nn.logsumexp(v, axis=-1)

    return _ll(init, A, E)


def _seq_ll_fwd(init, A, E, mesh, seq_axis, data_axis, P_local):
    ll = _seq_ll_primal(init, A, E, mesh, seq_axis, data_axis, P_local)
    return ll, (init, A, E)


def _seq_ll_bwd(mesh, seq_axis, data_axis, P_local, res, ct):
    """Analytic Baum-Welch VJP, sharded: each device computes the expected
    statistics of its block from boundary values (one all-gather), the
    cross-device transition pair rides the already-known ``v_enter``, and
    gA/ginit reduce with psum. Mirrors ``recursion._loglik_fast_bwd``."""
    init, A, E = res
    n_seq = mesh.shape[seq_axis]
    reduce_axes = (
        (seq_axis,) if data_axis is None else (seq_axis, data_axis)
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P(None, None, None),
            P(None, data_axis, seq_axis, None),
            P(None, data_axis),
        ),
        out_specs=(
            P(None, None),
            P(None, None, None),
            P(None, data_axis, seq_axis, None),
        ),
        check_vma=False,
    )
    def _bwd(init_l, A_l, E_l, ct_l):
        m, b, L_l, q = E_l.shape
        idx = lax.axis_index(seq_axis)
        la, lb, ll, v_enter = _seq_local_forward_backward(
            init_l, A_l, E_l, idx, n_seq, P_local, seq_axis
        )
        log_E = jnp.log(_clamped(E_l))

        # Within-block statistics are exactly the dense Baum-Welch VJP's
        # (single-sourced); ginit is only meaningful on the first device.
        ginit0, gA, gE = _loglik_bw_stats(
            init_l, A_l, E_l, la, lb, ll, ct_l
        )
        ginit = lax.psum(
            jnp.where(idx == 0, ginit0, jnp.zeros_like(ginit0)), reduce_axes
        )

        # Cross-device pair: forward at the previous block's end IS v_enter.
        csp = jnp.max(v_enter, axis=-1, keepdims=True)
        wp = jnp.exp(v_enter - csp)
        up = (
            jnp.exp(lb[:, :, 0] + log_E[:, :, 0] - ll[..., None] + csp)
            * ct_l[..., None]
        )
        gA_pair = jnp.einsum("mbi,mbj->mij", wp, up, precision=_PRECISION)
        gA = gA + jnp.where(idx > 0, 1.0, 0.0) * gA_pair
        gA = lax.psum(gA, reduce_axes)
        return ginit, gA, gE

    return _bwd(init, A, E, ct)


_seq_ll.defvjp(_seq_ll_fwd, _seq_ll_bwd)



def _local_block_operator(A_l, E_l, P_local, idx, seq_axis):
    """This device's sequence block reduced to ONE q x q log-space transfer
    operator (chunk summaries folded), conditioned like the chunked engine:
    only the globally-first block starts from identity."""
    C, _ = _chunk_summaries(A_l, E_l, P_local, first_chunk_identity=(idx == 0))
    block = C[0]
    for p in range(1, P_local):
        block = logmatmul(block, C[p])
    return C, block

def _seq_local_forward_backward(init_l, A_l, E_l, idx, n_seq, P_local, seq_axis):
    """Device-local log-forward/backward variables from boundary exchange.

    The core of the sequence-sharded engine: ONE all-gather of q x q block
    operators, redundant boundary folds, then intra-device chunked output
    passes. Returns (la, lb (m, b, L_local, q), ll (m, b), v_enter
    (m, b, q) — the log-forward entering this device's block).
    """
    m, b, L_l, q = E_l.shape
    log_A = jnp.log(_clamped(A_l))
    log_init_b = jnp.broadcast_to(
        jnp.log(_clamped(init_l))[:, None, :], (m, b, q)
    )
    C, _ = _chunk_summaries(
        A_l, E_l, P_local, first_chunk_identity=(idx == 0)
    )
    # The device block operator IS the last prefix product — reuse it
    # instead of folding C a second time (_local_block_operator exists for
    # the loglik-only path, which never forms the prefix scan).
    prefix = lax.associative_scan(logmatmul, C, axis=0)
    blocks = lax.all_gather(prefix[-1], seq_axis)  # (n, m, b, q, q)
    v_ends, w_ends, ll = _device_boundary_values(blocks, log_init_b, n_seq)

    v_all = jnp.stack([log_init_b] + v_ends[:-1], axis=0)
    v_enter = lax.dynamic_index_in_dim(v_all, idx, 0, keepdims=False)
    w_exit = lax.dynamic_index_in_dim(
        jnp.stack(w_ends, axis=0), idx, 0, keepdims=False
    )
    T = jax.nn.logsumexp(v_enter[None, ..., None] + prefix, axis=-2)
    suffix = lax.associative_scan(
        lambda x, y: logmatmul(y, x), C, axis=0, reverse=True
    )
    S_inner = logmatmul(suffix[1:], w_exit[None, ..., None])[..., 0]
    S = jnp.concatenate([S_inner, w_exit[None]], axis=0)

    first_start = jnp.where(
        idx == 0,
        log_init_b,
        logmatmul(v_enter[..., None, :], log_A[:, None])[..., 0, :],
    )
    la = _forward_outputs(
        init_l, A_l, E_l, T, P_local, first_start_log=first_start
    )
    lb = _backward_outputs(A_l, E_l, S, P_local)
    return la, lb, ll, v_enter


def _device_boundary_values(blocks, log_init_b, n_seq):
    """Forward/backward values at every device-block boundary.

    Each device computes the (tiny, O(n q²)) fold over the gathered block
    operators redundantly rather than communicating per step.

    Args:
        blocks: (n_seq, m, b, q, q) log-space block transfer operators.
        log_init_b: (m, b, q) log initial distribution.

    Returns:
        v_ends: list of n (m, b, q) — log forward at each block's end.
        w_ends: list of n (m, b, q) — log backward at each block's end
            (w_ends[-1] = 0).
        loglik: (m, b).
    """
    v = log_init_b
    v_ends = []
    for d in range(n_seq):
        v = logmatmul(v[..., None, :], blocks[d])[..., 0, :]
        v_ends.append(v)
    loglik = jax.nn.logsumexp(v_ends[-1], axis=-1)

    w = jnp.zeros_like(log_init_b)
    w_ends = [None] * n_seq
    w_ends[n_seq - 1] = w
    for d in range(n_seq - 2, -1, -1):
        w = logmatmul(blocks[d + 1], w[..., :, None])[..., 0]
        w_ends[d] = w
    return v_ends, w_ends, loglik


def seq_sharded_posterior(
    init,
    A,
    E,
    mesh: Mesh,
    seq_axis: str = "seq",
    data_axis: str | None = None,
    local_parallel_factor: int = 1,
    no_loglik: bool = False,
):
    """Posterior state log-probabilities with the sequence axis sharded.

    Exact (not approximate): each device reduces its block to a ``q x q``
    transfer operator, operators are all-gathered (ONE tiny collective),
    every device folds the global boundary values locally, then runs the
    intra-device chunked output passes conditioned on its entering/exiting
    boundary values. Matches the dense :func:`hmm_layer_tpu.posterior` to
    fp tolerance.

    Differentiable: reverse-mode gradients run shard_map-aware analytic
    adjoints (:func:`_seq_post_bwd`) — the chunked affine adjoint solves of
    the dense engine with one extra device level of composite folding, plus
    ppermute exchanges of the boundary-adjacent adjoint weights — instead
    of taping the O(L·q²) summary carries.

    Returns:
        (log_gamma (m, b, L, q) sharded over ``seq`` on L, loglik (m, b)).
    """
    n_seq = mesh.shape[seq_axis]
    L = E.shape[2]
    assert L % n_seq == 0, f"L={L} not divisible by seq axis size {n_seq}"
    return _seq_post(
        init,
        A,
        E,
        mesh,
        seq_axis,
        data_axis,
        max(local_parallel_factor, 1),
        no_loglik,
    )


def _seq_post_primal(init, A, E, mesh, seq_axis, data_axis, P_local, no_loglik):
    n_seq = mesh.shape[seq_axis]
    long_spec = P(None, data_axis, seq_axis, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(None, None, None), long_spec),
        out_specs=(long_spec, P(None, data_axis), long_spec),
        check_vma=False,
    )
    def _post(init_l, A_l, E_l):
        idx = lax.axis_index(seq_axis)
        la, lb, ll, _ = _seq_local_forward_backward(
            init_l, A_l, E_l, idx, n_seq, P_local, seq_axis
        )
        log_gamma = la + lb
        if not no_loglik:
            log_gamma = log_gamma - ll[..., None, None]
        return log_gamma, ll, la

    return _post(init, A, E)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _seq_post(init, A, E, mesh, seq_axis, data_axis, P_local, no_loglik):
    lg, ll, _ = _seq_post_primal(
        init, A, E, mesh, seq_axis, data_axis, P_local, no_loglik
    )
    return lg, ll


def _seq_post_fwd(init, A, E, mesh, seq_axis, data_axis, P_local, no_loglik):
    lg, ll, la = _seq_post_primal(
        init, A, E, mesh, seq_axis, data_axis, P_local, no_loglik
    )
    return (lg, ll), (init, A, E, la, lg, ll)


def _shift_from_next(x, seq_axis, n_seq):
    """Each device receives ``x`` from its RIGHT neighbor (device n-1 gets
    zeros)."""
    return lax.ppermute(
        x, seq_axis, [(d, d - 1) for d in range(1, n_seq)]
    )


def _shift_from_prev(x, seq_axis, n_seq):
    """Each device receives ``x`` from its LEFT neighbor (device 0 gets
    zeros)."""
    return lax.ppermute(
        x, seq_axis, [(d, d + 1) for d in range(n_seq - 1)]
    )


def _fold_device_composite(comp):
    """Affine composition of a device's chunk composites (right-to-left)."""
    q = comp.shape[-2]
    D = comp[-1]
    for p in range(comp.shape[0] - 2, -1, -1):
        K = jnp.einsum(
            "mbij,mbjk->mbik", comp[p][..., :q], D[..., :q],
            precision=_PRECISION,
        )
        o = comp[p][..., -1] + jnp.einsum(
            "mbij,mbj->mbi", comp[p][..., :q], D[..., -1],
            precision=_PRECISION,
        )
        D = jnp.concatenate([K, o[..., None]], axis=-1)
    return D


def _global_right_edge(Dall, n_seq, idx, flipped):
    """This device's right-edge adjoint from the all-gathered device
    composites: a redundant right-to-left fold in EFFECTIVE device order
    (O(n q^2 b) — tiny).

    ``flipped``: the lb-adjoint runs on the flipped time axis, which
    reverses the device order of the global fold (device 0 holds the
    flipped-rightmost block).
    """
    n, m, b, q = Dall.shape[:4]
    x = jnp.zeros((m, b, q), Dall.dtype)
    rights_dev = [None] * n_seq
    rights_dev[n_seq - 1] = x
    for dd in range(n_seq - 1, 0, -1):
        src = dd if not flipped else n_seq - 1 - dd
        Dd = Dall[src]
        x = Dd[..., -1] + jnp.einsum(
            "mbij,mbj->mbi", Dd[..., :q], x, precision=_PRECISION
        )
        rights_dev[dd - 1] = x
    my_eff = idx if not flipped else n_seq - 1 - idx
    return lax.dynamic_index_in_dim(
        jnp.stack(rights_dev, axis=0), my_eff, 0, keepdims=False
    )


def _seq_affine_solve2(B2, u2, v2, s2, P_local, seq_axis, n_seq, idx):
    """Both posterior adjoint solves as ONE stacked batch (B2 = [A; A^T]),
    like the dense VJP — halving the sequential composite/output scans.
    The first m models run in device order (la adjoint), the last m on the
    flipped time axis (lb adjoint); only the tiny global edge fold differs
    per half. Returns (x_fwd, x_bwd_flipped), each (m, b, L_local, q).
    """
    m = B2.shape[0] // 2
    comp = _affine_composites(B2, u2, v2, s2, P_local)
    Dall = lax.all_gather(_fold_device_composite(comp), seq_axis)
    x_right = jnp.concatenate(
        [
            _global_right_edge(Dall[:, :m], n_seq, idx, flipped=False),
            _global_right_edge(Dall[:, m:], n_seq, idx, flipped=True),
        ],
        axis=0,
    )
    rights = _affine_boundary_fold(comp, x_right)
    x2 = _affine_outputs(B2, u2, v2, s2, P_local, rights)
    return x2[:m], x2[m:]


def _seq_post_bwd(mesh, seq_axis, data_axis, P_local, no_loglik, res, cts):
    """Sequence-sharded analytic VJP of the chunked posterior.

    Mirrors ``recursion._posterior_analytic_vjp`` (same gamma-scalar +
    centered-residual decomposition — see its stability notes) with three
    distributed ingredients: (a) the two affine adjoint solves gain a device
    level and run stacked as one batch (:func:`_seq_affine_solve2`), (b)
    the boundary-adjacent adjoint
    weights (``gbar`` at a block's last step, ``fp`` at a block's first)
    come from one ppermute of the neighbor's edge values, and (c) the
    expected-transition einsums add the cross-device (last, first) pair and
    psum over the mesh.
    """
    init, A, E, la_res, lg_res, ll_res = res
    ct, ct_ll_direct = cts
    n_seq = mesh.shape[seq_axis]
    reduce_axes = (seq_axis,) if data_axis is None else (seq_axis, data_axis)
    long_spec = P(None, data_axis, seq_axis, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P(None, None, None),
            long_spec,
            long_spec,
            long_spec,
            P(None, data_axis),
            long_spec,
            P(None, data_axis),
        ),
        out_specs=(P(None, None), P(None, None, None), long_spec),
        check_vma=False,
    )
    def _bwd(init_l, A_l, E_l, la, lg, ll, ct_l, ct_ll_l):
        m, b, L_l, q = E_l.shape
        idx = lax.axis_index(seq_axis)
        lb = lg - la
        if not no_loglik:
            lb = lb + ll[..., None, None]
        log_E = jnp.log(_clamped(E_l))
        maskE = E_l >= EPS
        gam = jnp.exp(la + lb - ll[..., None, None])

        # -- scalars ---------------------------------------------------------
        sig = jnp.sum(ct_l, axis=-1)  # (m, b, L_l)
        sig_tot = lax.psum(jnp.sum(sig, axis=-1), seq_axis)  # (m, b)
        ct_ll_eff = ct_ll_l if no_loglik else ct_ll_l - sig_tot
        src = ct_l - gam * sig[..., None]

        # -- adjoint weights: the dense single-sourced constructions, with
        # their zeroed terminal/initial slot overwritten by the neighbor
        # exchange (gbar at a block's LAST step needs the right neighbor's
        # first-position (la, log_E); fp at a block's FIRST step the left
        # neighbor's last-position lb; the global edges stay zero).
        la_next0 = _shift_from_next(la[:, :, 0], seq_axis, n_seq)
        logE_next0 = _shift_from_next(log_E[:, :, 0], seq_axis, n_seq)
        f, gbar = _forward_adjoint_weights(la, log_E)
        sM_last = jnp.max(la[:, :, -1], axis=-1, keepdims=True)  # (m, b, 1)
        gbar_last = jnp.where(
            idx == n_seq - 1,
            jnp.zeros_like(la_next0),
            jnp.exp(logE_next0 + sM_last - la_next0),
        )
        gbar = gbar.at[:, :, -1].set(gbar_last)

        lb_prev_last = _shift_from_prev(lb[:, :, -1], seq_axis, n_seq)
        fp, gp, sp, elb = _backward_adjoint_weights(lb, log_E)
        fp_first = jnp.where(
            idx == 0,
            jnp.zeros_like(lb_prev_last),
            jnp.exp(sp[:, :, 0] - lb_prev_last),
        )
        fp = fp.at[:, :, 0].set(fp_first)

        # -- the two device-level affine solves, stacked like the dense VJP --
        flip = lambda x: jnp.flip(x, axis=2)
        A_T = jnp.swapaxes(A_l, -1, -2)
        bhat, chat_f = _seq_affine_solve2(
            jnp.concatenate([A_l, A_T], axis=0),
            jnp.concatenate([f, flip(gp)], axis=0),
            jnp.concatenate([gbar, flip(fp)], axis=0),
            jnp.concatenate([src, flip(src)], axis=0),
            P_local, seq_axis, n_seq, idx,
        )
        chat = flip(chat_f)
        # Project out numerical drift along the growing gamma mode (the
        # exact residuals are zero-sum; see the dense VJP).
        bhat = bhat - gam * jnp.sum(bhat, axis=-1, keepdims=True)
        chat = chat - gam * jnp.sum(chat, axis=-1, keepdims=True)

        # -- assemble --------------------------------------------------------
        K = sig + ct_ll_l[..., None]
        if no_loglik:
            K = K + sig_tot[..., None]
        gE = (gam * K[..., None] + bhat + chat - ct_l) / _clamped(E_l) * maskE

        R0 = sig_tot + ct_ll_eff
        bar0 = gam[:, :, 0] * R0[..., None] + bhat[:, :, 0]
        ginit0 = jnp.sum(bar0, axis=1) / _clamped(init_l) * (init_l >= EPS)
        ginit = lax.psum(
            jnp.where(idx == 0, ginit0, jnp.zeros_like(ginit0)), reduce_axes
        )

        # gA: within-block pairs (single-sourced factor constructions) +
        # the cross-device (last, first) pair.
        kappa = ct_ll_l + (sig_tot if no_loglik else 0.0)
        F, G_of, csh = _forward_gA_factors(la, log_E)
        xi_u = (
            jnp.exp(lb[:, :, 1:] + log_E[:, :, 1:] - ll[..., None, None] + csh)
            * kappa[..., None, None]
        )
        Fp_of, Gp = _backward_gA_factors(lb, sp, elb)
        gA = jnp.einsum(
            "mbti,mbtj->mij", F, xi_u + G_of(bhat), precision=_PRECISION
        ) + jnp.einsum(
            "mbti,mbtj->mij", Fp_of(chat), Gp, precision=_PRECISION
        )

        # Cross-device pair (t = left neighbor's last, t+1 = own first).
        la_prev_last = _shift_from_prev(la[:, :, -1], seq_axis, n_seq)
        chat_prev_last = _shift_from_prev(chat[:, :, -1], seq_axis, n_seq)
        cshp = jnp.max(la_prev_last, axis=-1, keepdims=True)  # (m, b, 1)
        F_pair = jnp.exp(la_prev_last - cshp)
        xi_u_pair = (
            jnp.exp(lb[:, :, 0] + log_E[:, :, 0] - ll[..., None] + cshp)
            * kappa[..., None]
        )
        G_pair = bhat[:, :, 0] * jnp.exp(
            log_E[:, :, 0] - la[:, :, 0] + cshp
        )
        Fp_pair = chat_prev_last * jnp.exp(sp[:, :, 0] - lb_prev_last)
        Gp_pair = jnp.exp(elb[:, :, 0] - sp[:, :, 0])
        gA_pair = jnp.einsum(
            "mbi,mbj->mij", F_pair, xi_u_pair + G_pair, precision=_PRECISION
        ) + jnp.einsum(
            "mbi,mbj->mij", Fp_pair, Gp_pair, precision=_PRECISION
        )
        gA = gA + jnp.where(idx > 0, 1.0, 0.0) * gA_pair
        gA = lax.psum(gA, reduce_axes)
        return ginit, gA, gE

    return _bwd(init, A, E, la_res, lg_res, ll_res, ct, ct_ll_direct)


_seq_post.defvjp(_seq_post_fwd, _seq_post_bwd)


def seq_sharded_viterbi(
    init,
    A,
    E,
    mesh: Mesh,
    seq_axis: str = "seq",
    data_axis: str | None = None,
    local_parallel_factor: int = 1,
):
    """Viterbi decode with the sequence axis sharded across devices.

    Same structure as :func:`seq_sharded_posterior` in the tropical
    semiring: one all-gather of max-plus block operators, a redundant
    device-boundary backtrace computed locally on every device, then the
    intra-device conditional decode (chunk-level backtrace + within-chunk
    backtraces) — the spliced result is one valid optimal path.

    Returns:
        states (m, b, L) int32, sharded over ``seq`` on L.
    """
    n_seq = mesh.shape[seq_axis]
    L = E.shape[2]
    assert L % n_seq == 0, f"L={L} not divisible by seq axis size {n_seq}"

    in_specs = (
        P(None, None),
        P(None, None, None),
        P(None, data_axis, seq_axis, None),
    )
    out_specs = P(None, data_axis, seq_axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    def _vit(init_l, A_l, E_l):
        m, b, L_l, q = E_l.shape
        idx = lax.axis_index(seq_axis)
        P_local = max(local_parallel_factor, 1)
        log_A = jnp.log(_clamped(A_l))
        log_A_T = jnp.swapaxes(log_A, -1, -2)
        log_init = jnp.log(_clamped(init_l))
        log_init_b = jnp.broadcast_to(log_init[:, None, :], (m, b, q))
        log_E = jnp.log(_clamped(E_l))
        Ec, c = _split_chunks(log_E, P_local)
        Et = jnp.moveaxis(Ec, 2, 0)  # (c, m, bP, q)

        C_T = _viterbi_chunk_summaries(
            log_A, log_A_T, Et, m, b, q, P_local,
            first_chunk_identity=(idx == 0),
        )
        # Fold the transposed chunk operators into one block operator:
        # (C_0 ∘ ... ∘ C_p)^T = C_p^T ∘ (...)^T.
        block_T = C_T[0]
        for p in range(1, P_local):
            block_T = maxmatmul(C_T[p], block_T)
        blocks_T = lax.all_gather(block_T, seq_axis)  # (n, m, b, q, q)

        # Device-boundary forward values and state chain (computed
        # redundantly on every device from the gathered operators).
        v = log_init_b
        v_ends = []
        for d in range(n_seq):
            v = jnp.max(blocks_T[d] + v[..., None, :], axis=-1)
            v_ends.append(v)
        j_dev = [None] * n_seq
        j_dev[n_seq - 1] = jnp.argmax(v_ends[-1], axis=-1).astype(jnp.int32)
        for d in range(n_seq - 1, 0, -1):
            onehot = jax.nn.one_hot(j_dev[d], q, dtype=blocks_T.dtype)
            row = jnp.einsum(
                "mbji,mbj->mbi", blocks_T[d], onehot, precision=_PRECISION
            )
            j_dev[d - 1] = jnp.argmax(v_ends[d - 1] + row, axis=-1).astype(
                jnp.int32
            )

        v_all = jnp.stack([log_init_b] + v_ends[:-1], axis=0)
        v_enter = lax.dynamic_index_in_dim(v_all, idx, 0, keepdims=False)
        j_exit = lax.dynamic_index_in_dim(
            jnp.stack(j_dev, axis=0), idx, 0, keepdims=False
        )
        j_enter = lax.dynamic_index_in_dim(
            jnp.stack([jnp.zeros_like(j_dev[0])] + j_dev[:-1], axis=0),
            idx,
            0,
            keepdims=False,
        )

        # Intra-device decode conditioned on the boundary states. T must be
        # computed from a start vector MASKED to the decoded entry state
        # (not the unconditional v_enter): under f32 near-ties the chunk
        # chain could otherwise be optimal for a different entry state than
        # the one the first chunk's delta pass is conditioned on, breaking
        # the valid-splice guarantee at the device boundary.
        entry_onehot = jax.nn.one_hot(j_enter, q, dtype=v_enter.dtype)
        v_masked = jnp.where(entry_onehot > 0, v_enter, -1e30)
        v_start = jnp.where(idx == 0, log_init_b, v_masked)
        T = _viterbi_boundaries(v_start, C_T)
        j_end = _boundary_backtrace(T, C_T, j_last=j_exit)
        enter_row = jnp.einsum(
            "miq,mbi->mbq",
            log_A,
            jax.nn.one_hot(j_enter, q, dtype=log_A.dtype),
            precision=_PRECISION,
        )  # A[j_enter, :]
        first_start = jnp.where(idx == 0, log_init_b, enter_row)
        return _viterbi_outputs(
            first_start, log_A, Et, j_end, m, b, L_l, q, P_local
        )

    return _vit(init, A, E)


# ---------------------------------------------------------------------------
# Data-parallel Baum-Welch (EM) — distributed sufficient statistics
# ---------------------------------------------------------------------------


def data_parallel_em_step(
    init,
    A,
    E,
    mesh: Mesh,
    parallel_factor: int = 1,
    pseudocount: float = 0.0,
    data_axis: str = "data",
):
    """One Baum-Welch update of ``init``/``A`` with the batch sharded.

    Classical distributed EM: each device runs the exact E-step
    (:func:`hmm_layer_tpu.ops.em.expected_statistics`, chunk-parallel when
    ``parallel_factor > 1``) on its batch shard, the sufficient statistics
    — (m, q) t=0 posterior counts and (m, q, q) expected transition counts,
    tiny compared to the per-device DP work — are ``psum``-reduced over
    ``data_axis``, and the closed-form M-step is applied identically on
    every device. Bit-for-bit the semantics of
    :func:`hmm_layer_tpu.ops.em.em_step` on the gathered batch (up to
    reduction order).

    Args:
        init: (m, q); A: (m, q, q); E: (m, b, L, q) with ``b`` divisible by
            the ``data_axis`` size.

    Returns:
        (new_init (m, q), new_A (m, q, q), loglik (m, b)) — params
        replicated, loglik batch-sharded over ``data_axis``.
    """
    from ..ops.em import (
        _m_step_A,
        _m_step_init_from_counts,
        expected_statistics,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P(None, None, None),
            P(None, data_axis, None, None),
        ),
        out_specs=(P(None, None), P(None, None, None), P(None, data_axis)),
        check_vma=False,
    )
    def _step(init_l, A_l, E_l):
        gamma, xi_sum, ll = expected_statistics(
            init_l, A_l, E_l, parallel_factor
        )
        init_counts = lax.psum(jnp.sum(gamma[:, :, 0], axis=1), data_axis)
        xi_sum = lax.psum(xi_sum, data_axis)
        return (
            _m_step_init_from_counts(init_counts, init_l, pseudocount),
            _m_step_A(xi_sum, A_l, pseudocount),
            ll,
        )

    return _step(init, A, E)


def data_parallel_em_step_categorical(
    init,
    A,
    B,
    x,
    mesh: Mesh,
    parallel_factor: int = 1,
    pseudocount: float = 0.0,
    data_axis: str = "data",
):
    """One FULL Baum-Welch step for a lookup-table HMM, batch-sharded.

    Distributed counterpart of
    :func:`hmm_layer_tpu.ops.em.em_step_categorical`: updates ``init``,
    ``A`` AND the free categorical emission table ``B`` from one sharded
    E-step; only the (m, q·(q + s + 1)) summed statistics cross devices.

    Args:
        init: (m, q); A: (m, q, q); B: (m, q, s); x: (m, b, L, s) one-hot
            (or soft) symbols, ``b`` divisible by the ``data_axis`` size.

    Returns:
        (new_init, new_A, new_B, loglik) — params replicated, loglik
        batch-sharded over ``data_axis``.
    """
    from ..ops.em import (
        _emission_counts,
        _m_step_A,
        _m_step_B_from_counts,
        _m_step_init_from_counts,
        expected_statistics,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None),
            P(None, None, None),
            P(None, None, None),
            P(None, data_axis, None, None),
        ),
        out_specs=(
            P(None, None),
            P(None, None, None),
            P(None, None, None),
            P(None, data_axis),
        ),
        check_vma=False,
    )
    def _step(init_l, A_l, B_l, x_l):
        E_l = jnp.einsum("mbls,mqs->mblq", x_l, B_l, precision=_PRECISION)
        gamma, xi_sum, ll = expected_statistics(
            init_l, A_l, E_l, parallel_factor
        )
        init_counts = lax.psum(jnp.sum(gamma[:, :, 0], axis=1), data_axis)
        xi_sum = lax.psum(xi_sum, data_axis)
        b_counts = lax.psum(_emission_counts(gamma, x_l), data_axis)
        return (
            _m_step_init_from_counts(init_counts, init_l, pseudocount),
            _m_step_A(xi_sum, A_l, pseudocount),
            _m_step_B_from_counts(b_counts, pseudocount),
            ll,
        )

    return _step(init, A, B, x)

"""State-sharded sparse HMM recursions over partitioned COO edge lists.

The distributed story for the large-q sparse engine (BASELINE config 5 —
``q = 1 + 14k`` multi-copy gene-pred grammars where the dense ``(q, q)``
matrix cannot be built; SURVEY §2 parallelism table, TP row). The edge
list is partitioned by DESTINATION state block for the forward direction
(by SOURCE block for the backward), so each device computes exactly its
``q_local = q_pad / n_shards`` slice of every DP vector with a sorted
segment-sum over its own edges; the only per-step collectives are one
``all_gather`` of the ``(m, b, q_local)`` carry and one scalar ``psum``
for the normalizer — the same O(q) bytes per step as the dense
state-sharded scan (``sharding.state_sharded_log_likelihood``), but with
O(n_edges / n_shards · b) compute instead of O(q²/n · b).

What state-sharding buys the sparse engine (and what it doesn't):

* CAPACITY, not speed. Sparse grammars have ``n_edges ≈ 1.6·q`` edges, so
  per-device compute per step is microscopic (hundreds of VPU flops) and
  the scan is latency-bound; adding per-step collectives can only slow a
  single step down. The win is memory: every O(L·q) tensor — emissions,
  the forward/backward variables, posterior outputs, Viterbi backpointers,
  and (through the sharded Baum-Welch VJP) the training residuals — is
  partitioned ``1/n_shards`` per device. At the probed design point
  (q=14,001, L=2000) emissions alone are 112 MB per batch element; an
  8-way state shard turns a 16 GB HBM bound of b≈18 into b≈140.
* Training: :func:`edge_sharded_log_likelihood` carries an analytic
  sharded Baum-Welch custom-VJP (per-device residuals O(L·q_local·b));
  :func:`edge_sharded_posterior` differentiates by taping the scans
  (its per-step residual includes the gathered full-q alpha, so CE
  training does NOT get the memory win — use the MAP objective or
  batch/microbatch sharding for supervised training at extreme q).

``q`` need not divide the shard count: states are padded up to a multiple
(``q_pad``) with edge-less, zero-init, zero-emission states whose scaled
mass underflows to ~1e-32 per step (f32-invisible against normalizers of
order the mean emission); outputs are sliced back to ``q``.

Reference anchor: the reference has no distributed code at all (SURVEY §0);
the capability target is BASELINE config 5 "state-sharded multi-host".
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.semiring import EPS

__all__ = [
    "ShardedEdgePlan",
    "edge_sharded_log_likelihood",
    "edge_sharded_posterior",
    "edge_sharded_viterbi",
]


def _clamped(x):
    return jnp.maximum(x, EPS)


_NEG = -1e30


class ShardedEdgePlan:
    """Static host-side partition of a COO edge list over state blocks.

    For each direction the edges are bucketed by the block of their
    reduction key (dst for the forward direction, src for the backward),
    sorted by that key within the bucket (sorted segment reductions), and
    padded to the max bucket size with weight-0 edges whose local key is
    ``q_local - 1`` (keeps the sorted invariant). ``wsel``/``mask`` gather
    the caller-order edge probabilities into each shard.
    """

    def __init__(self, indices, q: int, n_shards: int):
        if isinstance(indices, jax.core.Tracer):
            raise TypeError(
                "sparse edge `indices` must be a static (numpy) array; "
                "pass them from make_transition_indices()/make_A_sparse() "
                "outside of jit"
            )
        indices = np.asarray(indices, np.int64)
        assert indices.ndim == 2 and indices.shape[1] == 2, indices.shape
        self.indices = indices
        self.n = indices.shape[0]
        self.q = int(q)
        self.n_shards = int(n_shards)
        self.q_pad = -(-self.q // self.n_shards) * self.n_shards
        self.q_local = self.q_pad // self.n_shards
        assert indices.max(initial=0) < q, (indices.max(), q)
        self.fwd = self._partition(key_col=1)
        self.bwd = self._partition(key_col=0)
        # Hashable: rides jax.custom_vjp nondiff_argnums (static argument).
        self._key = (self.n, indices.tobytes(), self.q, self.n_shards)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return (
            isinstance(other, ShardedEdgePlan) and self._key == other._key
        )

    def _partition(self, key_col: int) -> dict:
        idx, qb, S = self.indices, self.q_local, self.n_shards
        blocks = idx[:, key_col] // qb
        counts = [int(np.sum(blocks == d)) for d in range(S)]
        n_max = max(max(counts), 1)
        src = np.zeros((S, n_max), np.int32)
        key_loc = np.full((S, n_max), qb - 1, np.int32)
        other = np.zeros((S, n_max), np.int32)
        wsel = np.zeros((S, n_max), np.int32)
        mask = np.zeros((S, n_max), np.float32)
        for d in range(S):
            sel = np.nonzero(blocks == d)[0]
            sel = sel[np.argsort(idx[sel, key_col], kind="stable")]
            k = len(sel)
            key_loc[d, :k] = idx[sel, key_col] - d * qb
            other[d, :k] = idx[sel, 1 - key_col]
            src[d, :k] = idx[sel, 0]
            wsel[d, :k] = sel
            mask[d, :k] = 1.0
        return {
            "key_loc": key_loc,  # local reduction key (dst_loc fwd / src_loc bwd)
            "other": other,      # global other endpoint (src fwd / dst bwd)
            "wsel": wsel,
            "mask": mask,
            "n_max": n_max,
        }

    @staticmethod
    @lru_cache(maxsize=16)
    def _cached(n, index_bytes, q, n_shards):
        return ShardedEdgePlan(
            np.frombuffer(index_bytes, np.int64).reshape(n, 2), q, n_shards
        )

    @staticmethod
    def cached(indices, q: int, n_shards: int) -> "ShardedEdgePlan":
        if isinstance(indices, jax.core.Tracer):
            raise TypeError(
                "sparse edge `indices` must be a static (numpy) array; "
                "pass them from make_transition_indices()/make_A_sparse() "
                "outside of jit"
            )
        arr = np.asarray(indices, np.int64)
        return ShardedEdgePlan._cached(
            arr.shape[0], arr.tobytes(), int(q), int(n_shards)
        )


def _pad_q(x, q_pad):
    q = x.shape[-1]
    if q == q_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, q_pad - q)]
    return jnp.pad(x, pad)


def _plan_args(part):
    """(key_loc, other, wsel, mask) as (S, n_max) jnp arrays + their specs."""
    arrs = tuple(
        jnp.asarray(part[k]) for k in ("key_loc", "other", "wsel", "mask")
    )
    specs = tuple(P("__STATE__", None) for _ in arrs)
    return arrs, specs


def _local_segsum(contrib, key_loc, q_local):
    """(m, b, n_max) -> (m, b, q_local), sorted local segment-sum."""
    out = jax.ops.segment_sum(
        jnp.moveaxis(contrib, -1, 0),
        key_loc,
        num_segments=q_local,
        indices_are_sorted=True,
    )
    return jnp.moveaxis(out, 0, -1)


def _shard_weights(edge_probs, wsel, mask):
    """Caller-order (m, n) edge probs -> this shard's (m, 1, n_max)."""
    return (edge_probs[:, wsel] * mask)[:, None, :]


def _fwd_scan(init_l, w, other, key_loc, Et_l, state_axis, q_local):
    """Local slice of the scaled forward; returns (log_alpha_l, ll)."""
    s0 = _clamped(Et_l[0]) * _clamped(init_l)[:, None, :]
    z0 = lax.psum(jnp.sum(s0, axis=-1, keepdims=True), state_axis)
    alpha0, ll0 = s0 / z0, jnp.log(z0[..., 0])

    def step(carry, e_t):
        alpha_l, ll = carry
        alpha_full = lax.all_gather(alpha_l, state_axis, axis=2, tiled=True)
        r = _local_segsum(alpha_full[..., other] * w, key_loc, q_local)
        s = _clamped(e_t) * _clamped(r)
        z = lax.psum(jnp.sum(s, axis=-1, keepdims=True), state_axis)
        alpha_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        return (alpha_new, ll_new), jnp.log(alpha_new) + ll_new[..., None]

    (_, ll), outs = lax.scan(step, (alpha0, ll0), Et_l[1:])
    la0 = (jnp.log(alpha0) + ll0[..., None])[None]
    return jnp.concatenate([la0, outs], axis=0), ll


def _bwd_scan(w, other, key_loc, Et_l, state_axis, q_local):
    """Local slice of the scaled backward; returns log_beta_l (L, m, b, ql)."""
    m, b, ql = Et_l.shape[1], Et_l.shape[2], q_local
    beta_last = jnp.ones((m, b, ql), Et_l.dtype)
    ll_last = jnp.zeros((m, b), Et_l.dtype)

    def step(carry, e_next):
        beta, ll = carry
        r = _clamped(e_next) * beta
        r_full = lax.all_gather(r, state_axis, axis=2, tiled=True)
        s = _clamped(_local_segsum(r_full[..., other] * w, key_loc, q_local))
        # Global max via all_gather+max — lax.pmax has no JVP rule and
        # errors at trace time inside differentiated code (CLAUDE.md).
        z_all = lax.all_gather(
            jnp.max(s, axis=-1, keepdims=True), state_axis, axis=2, tiled=True
        )
        z = jnp.max(z_all, axis=-1, keepdims=True)
        beta_new = s / z
        ll_new = ll + jnp.log(z[..., 0])
        return (beta_new, ll_new), jnp.log(beta_new) + ll_new[..., None]

    _, outs = lax.scan(
        step, (beta_last, ll_last), Et_l[1:], reverse=True
    )
    lb_last = jnp.zeros((1, m, b, ql), Et_l.dtype)
    return jnp.concatenate([outs, lb_last], axis=0)


def _rename_specs(specs, state_axis):
    def sub(spec):
        return P(*(state_axis if s == "__STATE__" else s for s in spec))

    if isinstance(specs, P):
        return sub(specs)
    return tuple(sub(s) for s in specs)


def _sharded(fn, mesh, in_specs, out_specs, state_axis):
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=_rename_specs(in_specs, state_axis),
        out_specs=_rename_specs(out_specs, state_axis),
        check_vma=False,
    )


def edge_sharded_log_likelihood(
    init,
    indices,
    edge_probs,
    E,
    mesh: Mesh,
    state_axis: str = "state",
    data_axis: str | None = None,
):
    """(m, b) log-likelihoods with states sharded over ``state_axis``.

    Differentiable via an analytic sharded Baum-Welch custom-VJP whose
    per-device residuals are O(L·q_local·b) — training memory scales down
    with the shard count, unlike taped autodiff through the gathered
    carries.
    """
    plan = ShardedEdgePlan.cached(indices, E.shape[-1], mesh.shape[state_axis])
    return _edge_ll_vjp(plan, mesh, state_axis, data_axis, init, edge_probs, E)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _edge_ll_vjp(plan, mesh, state_axis, data_axis, init, edge_probs, E):
    return _edge_ll_primal(
        plan, mesh, state_axis, data_axis, init, edge_probs, E
    )


def _edge_ll_primal(plan, mesh, state_axis, data_axis, init, edge_probs, E):
    (key_loc, other, wsel, mask), plan_specs = _plan_args(plan.fwd)
    ql = plan.q_local

    def _ll(init_l, ep, E_l, key_loc, other, wsel, mask):
        w = _shard_weights(ep, wsel[0], mask[0])
        Et_l = jnp.moveaxis(E_l, 2, 0)
        _, ll = _fwd_scan(
            init_l, w, other[0], key_loc[0], Et_l, state_axis, ql
        )
        return ll

    f = _sharded(
        _ll,
        mesh,
        in_specs=(
            P(None, "__STATE__"),
            P(None, None),
            P(None, data_axis, None, "__STATE__"),
            *plan_specs,
        ),
        out_specs=P(None, data_axis),
        state_axis=state_axis,
    )
    return f(
        _pad_q(init, plan.q_pad),
        edge_probs,
        _pad_q(E, plan.q_pad),
        key_loc,
        other,
        wsel,
        mask,
    )


def _edge_ll_fwd(plan, mesh, state_axis, data_axis, init, edge_probs, E):
    ll = _edge_ll_primal(
        plan, mesh, state_axis, data_axis, init, edge_probs, E
    )
    return ll, (init, edge_probs, E, ll)


def _edge_ll_bwd(plan, mesh, state_axis, data_axis, res, ct):
    """Sharded Baum-Welch statistics (edge-sharded port of
    ``ops.sparse._sparse_loglik_fast_bwd`` — see there for the formulas).

    Recomputes the forward and backward variables as LOCAL blocks inside
    one shard_map, so nothing O(L·q_pad) is ever materialized per device;
    the edge gradient accumulates per-shard over the forward partition and
    is psum'd across shards (each edge lives in exactly one dst bucket, so
    the psum is a sum of disjoint contributions).
    """
    init, edge_probs, E, ll = res
    (fkey, fother, fwsel, fmask), fspecs = _plan_args(plan.fwd)
    (bkey, bother, bwsel, bmask), bspecs = _plan_args(plan.bwd)
    ql, n = plan.q_local, plan.n

    def _bwd(init_l, ep, E_l, ll, ct, fkey, fother, fwsel, fmask,
             bkey, bother, bwsel, bmask):
        fkey, fother, fwsel, fmask = fkey[0], fother[0], fwsel[0], fmask[0]
        bkey, bother, bwsel, bmask = bkey[0], bother[0], bwsel[0], bmask[0]
        wf = _shard_weights(ep, fwsel, fmask)
        wb = _shard_weights(ep, bwsel, bmask)
        Et_l = jnp.moveaxis(E_l, 2, 0)
        la_l, _ = _fwd_scan(init_l, wf, fother, fkey, Et_l, state_axis, ql)
        lb_l = _bwd_scan(wb, bother, bkey, Et_l, state_axis, ql)
        log_E_l = jnp.log(_clamped(E_l))
        log_Et = jnp.moveaxis(log_E_l, 2, 0)

        lgam = la_l + lb_l - ll[None, ..., None]
        gE = (
            jnp.moveaxis(jnp.exp(lgam - log_Et), 0, 2)
            * (E_l >= EPS)
            * ct[..., None, None]
        )
        ginit_part = (
            jnp.sum(
                jnp.exp(log_Et[0] + lb_l[0] - ll[..., None]) * ct[..., None],
                axis=1,
            )
            * (init_l >= EPS)
        )
        if data_axis is not None:
            # The batch-sum above only covers this shard's batch slice.
            ginit_part = lax.psum(ginit_part, data_axis)
        # Edge gradient: per-step balanced-shift outer sums over this
        # shard's dst-bucket edges (src gathered from the full alpha).
        csh = jnp.max(la_l[:-1], axis=-1, keepdims=True)
        csh_all = lax.all_gather(csh, state_axis, axis=3, tiled=True)
        csh_g = jnp.max(csh_all, axis=-1, keepdims=True)  # global shift
        W = jnp.exp(la_l[:-1] - csh_g)
        U = (
            jnp.exp(lb_l[1:] + log_Et[1:] - ll[None, ..., None] + csh_g)
            * ct[None, ..., None]
        )

        def acc_step(acc, inp):
            w_t, u_t = inp  # (m, b, ql) each
            w_full = lax.all_gather(w_t, state_axis, axis=2, tiled=True)
            return acc + jnp.sum(w_full[..., fother] * u_t[..., fkey], axis=1), None

        acc0 = jnp.zeros((E_l.shape[0], fkey.shape[0]), E_l.dtype)
        acc, _ = lax.scan(acc_step, acc0, (W, U))
        # Scatter this shard's bucket gradients back to caller edge order;
        # psum merges the disjoint buckets (mask zeroes the padding).
        g_edge = lax.psum(
            jnp.zeros((E_l.shape[0], n), E_l.dtype)
            .at[:, fwsel]
            .add(acc * fmask),
            (state_axis,) if data_axis is None else (state_axis, data_axis),
        )
        return ginit_part, g_edge, gE

    f = _sharded(
        _bwd,
        mesh,
        in_specs=(
            P(None, "__STATE__"),
            P(None, None),
            P(None, data_axis, None, "__STATE__"),
            P(None, data_axis),
            P(None, data_axis),
            *fspecs,
            *bspecs,
        ),
        out_specs=(
            P(None, "__STATE__"),
            P(None, None),
            P(None, data_axis, None, "__STATE__"),
        ),
        state_axis=state_axis,
    )
    ginit, g_edge, gE = f(
        _pad_q(init, plan.q_pad),
        edge_probs,
        _pad_q(E, plan.q_pad),
        ll,
        ct,
        fkey, fother, fwsel, fmask,
        bkey, bother, bwsel, bmask,
    )
    q = plan.q
    return ginit[..., :q], g_edge, gE[..., :q]


_edge_ll_vjp.defvjp(_edge_ll_fwd, _edge_ll_bwd)


def edge_sharded_posterior(
    init,
    indices,
    edge_probs,
    E,
    mesh: Mesh,
    state_axis: str = "state",
    data_axis: str | None = None,
    no_loglik: bool = False,
):
    """Posterior state log-probs with states sharded; ((m,b,L,q), (m,b)).

    Differentiable by TAPING the sharded scans (reverse-mode): exact, but
    each step's residuals include the gathered full-q carry, so training
    through the posterior does not get the per-device memory win — prefer
    the MAP objective (:func:`edge_sharded_log_likelihood`) at extreme q.
    """
    plan = ShardedEdgePlan.cached(indices, E.shape[-1], mesh.shape[state_axis])
    (fkey, fother, fwsel, fmask), fspecs = _plan_args(plan.fwd)
    (bkey, bother, bwsel, bmask), bspecs = _plan_args(plan.bwd)
    ql = plan.q_local

    def _post(init_l, ep, E_l, fkey, fother, fwsel, fmask,
              bkey, bother, bwsel, bmask):
        fkey, fother, fwsel, fmask = fkey[0], fother[0], fwsel[0], fmask[0]
        bkey, bother, bwsel, bmask = bkey[0], bother[0], bwsel[0], bmask[0]
        wf = _shard_weights(ep, fwsel, fmask)
        wb = _shard_weights(ep, bwsel, bmask)
        Et_l = jnp.moveaxis(E_l, 2, 0)
        la_l, ll = _fwd_scan(init_l, wf, fother, fkey, Et_l, state_axis, ql)
        lb_l = _bwd_scan(wb, bother, bkey, Et_l, state_axis, ql)
        lg = la_l + lb_l
        if not no_loglik:
            lg = lg - ll[None, ..., None]
        return jnp.moveaxis(lg, 0, 2), ll

    f = _sharded(
        _post,
        mesh,
        in_specs=(
            P(None, "__STATE__"),
            P(None, None),
            P(None, data_axis, None, "__STATE__"),
            *fspecs,
            *bspecs,
        ),
        out_specs=(
            P(None, data_axis, None, "__STATE__"),
            P(None, data_axis),
        ),
        state_axis=state_axis,
    )
    lg, ll = f(
        _pad_q(init, plan.q_pad),
        edge_probs,
        _pad_q(E, plan.q_pad),
        fkey, fother, fwsel, fmask,
        bkey, bother, bwsel, bmask,
    )
    return lg[..., : plan.q], ll


def edge_sharded_viterbi(
    init,
    indices,
    edge_probs,
    E,
    mesh: Mesh,
    state_axis: str = "state",
    data_axis: str | None = None,
):
    """Max-plus Viterbi decode with states sharded; (m, b, L) int32.

    The delta recursion and per-state winning-edge selection run sharded
    (backpointers materialize q-sharded); the O(L·b) backtrace runs on the
    global view outside the shard_map. Padded states never win: their
    scores stay at the -1e30 floor.
    """
    plan = ShardedEdgePlan.cached(indices, E.shape[-1], mesh.shape[state_axis])
    (fkey, fother, fwsel, fmask), fspecs = _plan_args(plan.fwd)
    ql, q_pad = plan.q_local, plan.q_pad
    n = plan.n

    def _deltas(init_l, ep, E_l, fkey, fother, fwsel, fmask):
        fkey, fother, fwsel, fmask = fkey[0], fother[0], fwsel[0], fmask[0]
        idx = lax.axis_index(state_axis)
        w = (ep[:, fwsel] * fmask)[:, None, :]
        log_w = jnp.where(fmask[None, None, :] > 0, jnp.log(_clamped(w)), _NEG)
        log_E_l = jnp.log(_clamped(E_l))
        Et = jnp.moveaxis(log_E_l, 2, 0)
        # Padded states (no emissions written) sit at log(EPS)·2 ≈ -73;
        # push them to the floor so they cannot tie real states.
        state_ids = idx * ql + jnp.arange(ql)
        real = (state_ids < plan.q)[None, None, :]

        delta0 = jnp.where(
            real, jnp.log(_clamped(init_l))[:, None, :] + Et[0], _NEG
        )
        edge_ids = jnp.arange(fkey.shape[0], dtype=jnp.int32)
        src_lookup = jnp.concatenate(
            [jnp.asarray(fother, jnp.int32), jnp.zeros((1,), jnp.int32)]
        )

        def segred(x, reducer):
            # empty segments get the reducer's identity; the jnp.maximum/
            # jnp.minimum after each call clamps them to the sentinels
            out = reducer(
                jnp.moveaxis(x, -1, 0), fkey, num_segments=ql,
                indices_are_sorted=True,
            )
            return jnp.moveaxis(out, 0, -1)

        def step(delta_l, e_t):
            delta_full = lax.all_gather(delta_l, state_axis, axis=2, tiled=True)
            contrib = delta_full[..., fother] + log_w  # (m, b, n_max)
            best = segred(contrib, jax.ops.segment_max)
            best = jnp.maximum(best, _NEG)
            attained = (contrib >= best[..., fkey]) & (fmask[None, None, :] > 0)
            masked_ids = jnp.where(attained, edge_ids, fkey.shape[0])
            win_edge = segred(masked_ids, jax.ops.segment_min)
            bp = src_lookup[jnp.minimum(win_edge, fkey.shape[0])]
            new_delta = jnp.where(real, best + e_t, _NEG)
            return new_delta, bp

        delta_final, backptrs = lax.scan(step, delta0, Et[1:])
        return delta_final, backptrs

    f = _sharded(
        _deltas,
        mesh,
        in_specs=(
            P(None, "__STATE__"),
            P(None, None),
            P(None, data_axis, None, "__STATE__"),
            *fspecs,
        ),
        out_specs=(
            P(None, data_axis, "__STATE__"),
            P(None, None, data_axis, "__STATE__"),
        ),
        state_axis=state_axis,
    )
    delta_final, backptrs = f(
        _pad_q(init, q_pad),
        edge_probs,
        _pad_q(E, q_pad),
        fkey, fother, fwsel, fmask,
    )
    last_state = jnp.argmax(delta_final, axis=-1).astype(jnp.int32)

    def backstep(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[..., None], axis=-1)[..., 0]
        return prev, prev

    _, path_rev = lax.scan(backstep, last_state, backptrs, reverse=True)
    path = jnp.concatenate([path_rev, last_state[None]], axis=0)
    return jnp.moveaxis(path, 0, 2)

"""Pallas TPU kernel: max-plus (tropical) chunk-summary scan for Viterbi.

The chunked Viterbi decode (``ops.recursion._viterbi_chunked``) needs, per
sequence chunk, the tropical transfer operator

    C_p[i, j] = max-plus product over the chunk's positions of
                (diag(e_t) . A)  conditioned on left-border state i,

i.e. a scan over time with a ``q x q`` carry per chunk. On the VPU this is
``q_p * q_k`` fused add/max ops per position; XLA's layout assignment keeps
relayouting the carry when the scan is composed with its consumers (measured
13-17 ms for the summary pass at q=15, b=32, L=9999 in situ versus a ~2.7 ms
VPU roofline). This kernel pins the layout explicitly:

* carry scratch ``M[(k, i), r]``: sublanes = the 16x16-padded operator entry
  (k = current state, contracted each step; i = left-border state), lanes =
  chunk elements ``r``. One (256, br) f32 tile block holds br
  operators.
* per step, for each output state p: ``acc = max_k (M[k*16:(k+1)*16, :] +
  A[k, p])`` — sublane-contiguous slices plus SMEM scalars, written back to
  sublanes ``p*16..p*16+15``. All shapes are full (sublane, lane) tiles.
* emissions stream in as ``E_T (c, q, R)`` blocks (one DMA per step,
  double-buffered by the Pallas pipeline).

The kernel is exact (no rescaling is needed in the tropical semiring — path
scores only accumulate adds). Reference for the algorithm being accelerated:
the two-pass chunked scan of ``MsaHMMLayer.py:285-319`` (sum-product
version), transplanted to (max, +).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "maxplus_chunk_summaries",
    "maxplus_decode",
    "maxplus_deltas",
    "maxplus_backtrace",
    "supported",
    "supported_decode",
]

_NEG = np.float32(-1e30)
PAD = 16  # padded state count (sublane quantum); chunked kernels need q <= 16
# The blocked (multi-sublane-tile) delta/backtrace kernels extend the
# *sequential* decode to larger state counts; beyond ~64 states the VPU
# max-tree (q^2 element ops per step) falls behind the XLA sequential scan.
MAX_BLOCKED_Q = 64
MAX_SINGLE_BLOCK_R = 4096  # one right-sized lane block when it fits in VMEM
# Test hook: route the chunked-Viterbi dispatch through the kernel in
# interpreter mode even on CPU (see ops.recursion._viterbi_chunked).
FORCE_INTERPRET = False


def _pad_states(q: int) -> int:
    """Sublane-padded state count: 16 for the chunked-kernel layout, else
    the next multiple of 8 (f32 sublane quantum)."""
    return PAD if q <= PAD else -(-q // 8) * 8


def supported_decode(q: int) -> bool:
    """Shapes covered by the sequential Pallas delta/backtrace decode."""
    return q <= MAX_BLOCKED_Q


def choose_block_r(R: int) -> int:
    """Lane-block size for the chunk-element axis.

    One right-sized block (lanes a multiple of 128) avoids both tile padding
    waste (R=352 at parallel_factor=11 would waste 31% of every 512-lane
    tile) and multi-block grid overhead; above the VMEM budget, fall back to
    512-lane tiling. Callers pad R with this same function so the wrapper's
    recomputation agrees (R already a block multiple resolves to itself or
    512).
    """
    rounded = -(-R // 128) * 128
    return rounded if rounded <= MAX_SINGLE_BLOCK_R else 512


def pad_chunk_elements(R: int) -> int:
    """Padded chunk-element count: the smallest block multiple >= R."""
    br = choose_block_r(R)
    return -(-R // br) * br


def supported(q: int, num_models: int) -> bool:
    """The specialized kernels cover the flagship decode shapes.

    Multi-model batches are handled by ``jax.vmap`` over the wrappers (the
    model axis becomes a leading grid dimension); per-block VMEM usage is
    model-count independent, so any ``num_models >= 1`` lowers.
    """
    return q <= PAD and num_models >= 1


def _kernel(c: int, P: int, q: int, br: int, A_ref, Av_ref, e_ref, out_ref, M):
    """Grid = (R // br, c); one grid step = one timestep of one block.

    A_ref: (PAD, PAD) SMEM — log transition matrix (padded rows/cols _NEG),
        read as per-step scalar broadcasts.
    Av_ref: (PAD, PAD) VMEM — same matrix, read as column vectors at t==0
        (SMEM only allows scalar loads).
    e_ref: (1, PAD, br) VMEM — log emissions of this step, transposed.
    out_ref: (PAD * PAD, br) VMEM — final operators, written at t==c-1.
    M: (PAD * PAD, br) f32 VMEM scratch — the running operators.
    """
    t = pl.program_id(1)
    jblk = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        # M0[(j, i), r] = R0[i, j] + e0[j]; R0 = identity for the first chunk
        # of every sequence (lane r with r % P == 0), A-rows otherwise.
        lane = jax.lax.broadcasted_iota(jnp.int32, (PAD, br), 1)
        is_first = ((jblk * br + lane) % P) == 0
        sub = jax.lax.broadcasted_iota(jnp.int32, (PAD, 1), 0)
        for j in range(PAD):
            e_j = e_ref[0, j, :][None, :]  # (1, br)
            a_col = Av_ref[:, j][:, None]  # A[i, j] on sublanes i: (PAD, 1)
            eye_col = jnp.where(sub == j, 0.0, _NEG)
            rows = jnp.where(is_first, eye_col, a_col) + e_j
            M[j * PAD : (j + 1) * PAD, :] = rows

    @pl.when(t > 0)
    def _step():
        for p in range(q):
            acc = M[0:PAD, :] + A_ref[0, p]
            for k in range(1, q):
                acc = jnp.maximum(acc, M[k * PAD : (k + 1) * PAD, :] + A_ref[k, p])
            e_p = e_ref[0, p, :][None, :]  # (1, br) -> bcast sublanes
            out_ref[p * PAD : (p + 1) * PAD, :] = acc + e_p
        for p in range(q, PAD):
            out_ref[p * PAD : (p + 1) * PAD, :] = jnp.full(
                (PAD, br), _NEG
            )
        M[:, :] = out_ref[:, :]

    @pl.when(t == c - 1)
    def _flush():
        out_ref[:, :] = M[:, :]


@partial(jax.jit, static_argnames=("P", "interpret"))
def maxplus_chunk_summaries(log_A, log_E_T, P: int, interpret: bool = False):
    """Tropical chunk transfer operators.

    Args:
        log_A: (q, q) log transition matrix.
        log_E_T: (c, q, R) log emissions, time-major and state-transposed,
            with ``R = b * P`` chunk elements (b-major, chunk-minor) — lane
            ``r`` is the ``(r // P)``-th sequence's ``(r % P)``-th chunk.
        P: chunks per sequence (``R % P == 0``; the first chunk of a sequence
            starts from the identity operator, later chunks from A-rows).
        interpret: run in the Pallas interpreter (CPU tests).

    Returns:
        C_T: (R, q, q) with ``C_T[r, j, i] = log max-path(chunk r emissions,
        right-border state j | left-border state i)`` — note the transposed
        (j, i) order.
    """
    c, q, R = log_E_T.shape
    br = choose_block_r(R)
    if q > PAD:
        raise ValueError(f"pallas viterbi kernel supports q <= {PAD}, got {q}")
    if R % br:
        raise ValueError(f"R={R} must be padded to a multiple of {br}")

    A_pad = jnp.full((PAD, PAD), _NEG, jnp.float32)
    A_pad = A_pad.at[:q, :q].set(log_A.astype(jnp.float32))
    E_pad = log_E_T
    if q < PAD:
        E_pad = jnp.pad(
            log_E_T, ((0, 0), (0, PAD - q), (0, 0)), constant_values=_NEG
        )

    grid = (R // br, c)
    out = pl.pallas_call(
        partial(_kernel, c, P, q, br),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # A (PAD, PAD) scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A (PAD, PAD) vectors
            pl.BlockSpec(
                (1, PAD, br),
                lambda j, t: (t, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (PAD * PAD, br), lambda j, t: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((PAD * PAD, R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PAD * PAD, br), jnp.float32)],
        interpret=interpret,
    )(A_pad, A_pad, E_pad)

    # (PAD*PAD, R) rows are (j, i) pairs -> (R, q, q) transposed operators.
    C_T = out.reshape(PAD, PAD, R)[:q, :q]
    return jnp.moveaxis(C_T, -1, 0)


# ---------------------------------------------------------------------------
# Output passes: per-position delta (forward) and fused psi+decode (backward)
# ---------------------------------------------------------------------------


def _fwd_kernel(c: int, q: int, br: int, A_ref, d0_ref, e_ref, out_ref, D):
    """delta_t[p, r] = max_k delta_{t-1}[k, r] + A[k, p] + e_t[p, r].

    Carry ``D``: (PAD, br) — states on sublanes, chunk elements on
    lanes. Grid = (R // br, c), one step per (block, timestep).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        D[:, :] = d0_ref[:, :]
        out_ref[0] = d0_ref[:, :]

    @pl.when(t > 0)
    def _step():
        for p in range(q):
            acc = D[0:1, :] + A_ref[0, p]
            for k in range(1, q):
                acc = jnp.maximum(acc, D[k : k + 1, :] + A_ref[k, p])
            out_ref[0, p : p + 1, :] = acc + e_ref[0, p : p + 1, :]
        for p in range(q, PAD):
            out_ref[0, p : p + 1, :] = jnp.full((1, br), _NEG)
        D[:, :] = out_ref[0]


def _backtrace_kernel(c: int, q: int, br: int, Av_ref, j_ref, d_ref, out_ref, S):
    """Within-chunk Viterbi backtrace from stored deltas.

    ``state_{t} = argmax_k delta_t[k, r] + A[k, state_{t+1}]`` walking the
    grid's second axis in reverse time via the index maps (block ``c-1-g``);
    no backpointers are stored — the decision is re-derived from the delta
    pass. Carry ``S``: (1, br) int32 — the current state per lane.
    """
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        S[:, :] = j_ref[:, :]

    @pl.when(g > 0)
    def _step():
        st = S[:, :]  # (1, br) — state_{t+1}
        # acc[k, r] = A[k, st[r]] via a select tree over the q columns.
        acc = jnp.full((PAD, br), _NEG)
        for p in range(q):
            acc = jnp.where(st == p, Av_ref[:, p][:, None], acc)
        w = d_ref[0] + acc
        vmax = jnp.max(w, axis=0, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, (PAD, br), 0)
        # First index attaining the max (matches jnp.argmax tie-breaking).
        S[:, :] = jnp.min(jnp.where(w >= vmax, idx, PAD), axis=0, keepdims=True)

    out_ref[0] = S[:, :]


def _time_block(c: int) -> int:
    """Timesteps per grid step for the blocked kernels — per-grid-step
    overhead dominates the small per-step VPU work, so batch several
    timesteps per DMA block (largest of 8..1 dividing c)."""
    for tb in (8, 6, 4, 3, 2):
        if c % tb == 0:
            return tb
    return 1


def _fwd_kernel_blocked(TB: int, q: int, qp: int, br: int, At_ref, d0_ref, e_ref, out_ref, D):
    """Blocked-state delta pass for q > 16 (qp = 8-padded state count).

    Output states are processed 8 sublanes at a time against a VMEM-resident
    transposed transition matrix: ``acc8 = max_k (At[p8, k] + delta[k])``
    with (8, 1) x (1, br) broadcast terms — full sublane utilization vs the
    per-row formulation of :func:`_fwd_kernel` (q^2 single-row ops). Each
    grid step advances ``TB`` timesteps (e/out blocks are (TB, qp, br)).
    """
    g = pl.program_id(1)

    def step(tt):
        for pt in range(qp // 8):
            ps = pt * 8
            acc = At_ref[ps : ps + 8, 0:1] + D[0:1, :]
            for k in range(1, q):
                acc = jnp.maximum(
                    acc, At_ref[ps : ps + 8, k : k + 1] + D[k : k + 1, :]
                )
            out_ref[tt, ps : ps + 8, :] = acc + e_ref[tt, ps : ps + 8, :]
        D[:, :] = out_ref[tt]

    for tt in range(TB):
        if tt == 0:

            @pl.when(g == 0)
            def _init():
                D[:, :] = d0_ref[:, :]
                out_ref[0] = d0_ref[:, :]

            @pl.when(g > 0)
            def _step0():
                step(0)

        else:
            step(tt)


def _backtrace_kernel_blocked(TB: int, q: int, qp: int, br: int, Av_ref, j_ref, d_ref, out_ref, S):
    """Blocked-state within-sequence backtrace (select tree over columns).

    Walks time in reverse; grid step ``g`` covers the TB positions of time
    block ``n_blocks - 1 - g`` (via the index maps), innermost reversed.
    """
    g = pl.program_id(1)

    def step(tt):
        st = S[:, :]  # (1, br) — state_{t+1}
        acc = jnp.full((qp, br), _NEG)
        for p in range(q):
            acc = jnp.where(st == p, Av_ref[:, p : p + 1], acc)
        w = d_ref[tt] + acc
        vmax = jnp.max(w, axis=0, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, (qp, br), 0)
        S[:, :] = jnp.min(jnp.where(w >= vmax, idx, qp), axis=0, keepdims=True)
        out_ref[tt] = S[:, :]

    for tt in reversed(range(TB)):
        if tt == TB - 1:

            @pl.when(g == 0)
            def _init():
                S[:, :] = j_ref[:, :]
                out_ref[TB - 1] = S[:, :]

            @pl.when(g > 0)
            def _stepl():
                step(TB - 1)

        else:
            step(tt)


@partial(jax.jit, static_argnames=("interpret",))
def maxplus_deltas(log_A, log_E_T, delta0, interpret: bool = False):
    """Max-plus forward (delta) values at every position.

    Args:
        log_A: (q, q) log transition matrix.
        log_E_T: (c, q, R) log emissions, time-major and state-transposed
            (lanes = chunk elements, or plain batch for sequential decode).
        delta0: (q, R) max-plus forward value at the first position
            (conditional start + first emission).

    Returns:
        deltas: (c, qp, R) f32 — rows >= q are garbage (sliced by caller);
        ``qp`` is the sublane-padded state count.
    """
    c, q, R = log_E_T.shape
    br = choose_block_r(R)
    qp = _pad_states(q)
    if q > MAX_BLOCKED_Q:
        raise ValueError(
            f"pallas viterbi decode supports q <= {MAX_BLOCKED_Q}, got {q}"
        )
    if R % br:
        raise ValueError(f"R={R} must be padded to a multiple of {br}")

    A_pad = jnp.full((qp, qp), _NEG, jnp.float32)
    A_pad = A_pad.at[:q, :q].set(log_A.astype(jnp.float32))
    pad_rows = ((0, 0), (0, qp - q), (0, 0))
    E_pad = log_E_T
    if q < qp:
        E_pad = jnp.pad(log_E_T, pad_rows, constant_values=_NEG)
    d0 = jnp.pad(delta0[None], pad_rows, constant_values=_NEG)[0]

    if q <= PAD:
        return pl.pallas_call(
            partial(_fwd_kernel, c, q, br),
            grid=(R // br, c),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (qp, br), lambda j, t: (0, j), memory_space=pltpu.VMEM
                ),  # delta0
                pl.BlockSpec(
                    (1, qp, br),
                    lambda j, t: (t, 0, j),
                    memory_space=pltpu.VMEM,
                ),  # emissions at t
            ],
            out_specs=pl.BlockSpec(
                (1, qp, br), lambda j, t: (t, 0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((c, qp, R), jnp.float32),
            scratch_shapes=[pltpu.VMEM((qp, br), jnp.float32)],
            interpret=interpret,
        )(A_pad, d0, E_pad)

    TB = _time_block(c)
    return pl.pallas_call(
        partial(_fwd_kernel_blocked, TB, q, qp, br),
        grid=(R // br, c // TB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A^T column broadcasts
            pl.BlockSpec(
                (qp, br), lambda j, g: (0, j), memory_space=pltpu.VMEM
            ),  # delta0
            pl.BlockSpec(
                (TB, qp, br),
                lambda j, g: (g, 0, j),
                memory_space=pltpu.VMEM,
            ),  # emissions of this time block
        ],
        out_specs=pl.BlockSpec(
            (TB, qp, br), lambda j, g: (g, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, qp, R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((qp, br), jnp.float32)],
        interpret=interpret,
    )(A_pad.T, d0, E_pad)


@partial(jax.jit, static_argnames=("interpret",))
def maxplus_backtrace(log_A, deltas, last_state, interpret: bool = False):
    """Backtrace decode from stored deltas (see :func:`maxplus_deltas`).

    Args:
        log_A: (q, q); deltas: (c, qp, R); last_state: (R,) int32.

    Returns:
        states: (c, R) int32 — always one valid optimal path.
    """
    q = log_A.shape[-1]
    c, qp, R = deltas.shape
    br = choose_block_r(R)
    A_pad = jnp.full((qp, qp), _NEG, jnp.float32)
    A_pad = A_pad.at[:q, :q].set(log_A.astype(jnp.float32))
    j_last = last_state[None].astype(jnp.int32)  # (1, R)

    if q <= PAD:
        states = pl.pallas_call(
            partial(_backtrace_kernel, c, q, br),
            grid=(R // br, c),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # A (column selects)
                pl.BlockSpec(
                    (1, br), lambda j, g: (0, j), memory_space=pltpu.VMEM
                ),  # last_state
                pl.BlockSpec(
                    (1, qp, br),
                    lambda j, g: (c - 1 - g, 0, j),
                    memory_space=pltpu.VMEM,
                ),  # delta at t
            ],
            out_specs=pl.BlockSpec(
                (1, 1, br),
                lambda j, g: (c - 1 - g, 0, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((c, 1, R), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, br), jnp.int32)],
            interpret=interpret,
        )(A_pad, j_last, deltas)
        return states[:, 0, :]

    TB = _time_block(c)
    nb = c // TB
    states = pl.pallas_call(
        partial(_backtrace_kernel_blocked, TB, q, qp, br),
        grid=(R // br, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A (column selects)
            pl.BlockSpec(
                (1, br), lambda j, g: (0, j), memory_space=pltpu.VMEM
            ),  # last_state
            pl.BlockSpec(
                (TB, qp, br),
                lambda j, g: (nb - 1 - g, 0, j),
                memory_space=pltpu.VMEM,
            ),  # deltas of this time block
        ],
        out_specs=pl.BlockSpec(
            (TB, 1, br),
            lambda j, g: (nb - 1 - g, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, 1, R), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, br), jnp.int32)],
        interpret=interpret,
    )(A_pad, j_last, deltas)
    return states[:, 0, :]


@partial(jax.jit, static_argnames=("interpret",))
def maxplus_decode(log_A, log_E_T, delta0, last_state, interpret: bool = False):
    """Chunk-local delta pass + within-chunk backtrace decode.

    Args:
        log_A: (q, q) log transition matrix.
        log_E_T: (c, q, R) log emissions (layout as in
            :func:`maxplus_chunk_summaries`).
        delta0: (q, R) conditional max-plus forward value at each chunk's
            first position (decoded-border start + first emission).
        last_state: (R,) int32 — the decoded optimal state at each chunk's
            last position (from the chunk-level boundary backtrace).

    Returns:
        states: (c, R) int32 — decoded state at every chunk position; always
        one valid optimal path (backtrace, not positionwise argmax).
    """
    deltas = maxplus_deltas(log_A, log_E_T, delta0, interpret=interpret)
    return maxplus_backtrace(log_A, deltas, last_state, interpret=interpret)

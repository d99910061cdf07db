"""Pallas TPU kernels: sum-product chunked forward/backward/posterior.

Same two-level decomposition as the XLA engine (``ops.recursion``): a
chunk-summary pass producing ``q x q`` transfer operators, a (XLA-side)
boundary combine, then per-chunk output passes. These kernels pin the VMEM
layout that XLA's layout assignment keeps pessimizing for the composed scan
pipeline (states/operators on sublanes, chunk elements on lanes) — the same
treatment that took the chunked Viterbi decode from 17.2ms to 1.7ms at
q=15, b=32, L=9999, P=99 on TPU v5e.

Numerics mirror the scaled recursions of the reference
(``MsaHmmCell.py:87-103``): linear-space carries rescaled every step, a
log-scale accumulator per lane, log-space outputs. The kernels are forward
(primal) only — gradients are provided by ``ops.recursion``'s analytic
``jax.custom_vjp`` adjoints.

Layouts (R = b * P chunk elements, padded to br):

* summary carry ``M[(j, i), r]``: sublanes = 16x16-padded operator entry
  (j = current state, i = left-border state), lanes = chunk elements.
* output carries ``alpha[p, r]`` / ``beta[p, r]``: (PAD, br) tiles
  plus a (1, br) log-scale row.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_viterbi import PAD, choose_block_r, supported  # shared tiling

__all__ = [
    "sum_chunk_summaries",
    "sum_fwd_outputs",
    "beta_bwd_outputs",
    "supported",
]

_EPS = np.float32(1e-16)  # semiring.EPS — probability clamp
_TINY = np.float32(1e-30)  # rescale floor (avoids 0/0 in dead rows)


def _sum_summary_kernel(
    c: int, P: int, q: int, br: int, A_ref, Av_ref, e_ref, out_ref, M, LL
):
    """Scaled linear-space chunk-operator scan.

    M[(j, i), r]: running scaled P(emissions so far, state j | border i).
    LL[i, r]: accumulated log-scale per (border state, chunk element).
    Grid = (R // br, c); out written at t == c-1 as log(M) + LL.
    """
    t = pl.program_id(1)
    jblk = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        lane = jax.lax.broadcasted_iota(jnp.int32, (PAD, br), 1)
        is_first = ((jblk * br + lane) % P) == 0
        sub = jax.lax.broadcasted_iota(jnp.int32, (PAD, 1), 0)
        z = jnp.zeros((PAD, br), jnp.float32)
        for j in range(q):
            e_j = e_ref[0, j, :][None, :]  # (1, br)
            a_col = Av_ref[:, j][:, None]  # A[i, j] on sublanes i
            eye_col = jnp.where(sub == j, 1.0, 0.0)
            rows = jnp.where(is_first, eye_col, a_col) * e_j
            M[j * PAD : (j + 1) * PAD, :] = rows
            z = z + rows
        for j in range(q, PAD):
            M[j * PAD : (j + 1) * PAD, :] = jnp.zeros((PAD, br))
        z = jnp.maximum(z, _TINY)
        for j in range(q):
            M[j * PAD : (j + 1) * PAD, :] = M[j * PAD : (j + 1) * PAD, :] / z
        LL[:, :] = jnp.log(z)

    @pl.when(t > 0)
    def _step():
        # out_ref doubles as scratch for the unnormalized update.
        z = jnp.zeros((PAD, br), jnp.float32)
        for p in range(q):
            acc = M[0:PAD, :] * A_ref[0, p]
            for k in range(1, q):
                acc = acc + M[k * PAD : (k + 1) * PAD, :] * A_ref[k, p]
            acc = jnp.maximum(acc, _EPS) * e_ref[0, p, :][None, :]
            out_ref[p * PAD : (p + 1) * PAD, :] = acc
            z = z + acc
        z = jnp.maximum(z, _TINY)
        for p in range(q):
            M[p * PAD : (p + 1) * PAD, :] = (
                out_ref[p * PAD : (p + 1) * PAD, :] / z
            )
        LL[:, :] = LL[:, :] + jnp.log(z)

    @pl.when(t == c - 1)
    def _flush():
        for j in range(q):
            out_ref[j * PAD : (j + 1) * PAD, :] = (
                jnp.log(jnp.maximum(M[j * PAD : (j + 1) * PAD, :], _TINY))
                + LL[:, :]
            )
        for j in range(q, PAD):
            out_ref[j * PAD : (j + 1) * PAD, :] = jnp.full(
                (PAD, br), -1e30
            )


@partial(jax.jit, static_argnames=("P", "interpret"))
def sum_chunk_summaries(A, E_T, P: int, interpret: bool = False):
    """Log-space chunk transfer operators (sum-product semiring).

    Args:
        A: (q, q) linear transition matrix.
        E_T: (c, q, R) linear emission probabilities, time-major and
            state-transposed; lane ``r`` = sequence ``r // P``, chunk
            ``r % P``. Values should be pre-clamped to >= EPS; padded lanes
            may hold any positive value.
        P: chunks per sequence.

    Returns:
        C: (R, q, q) with ``C[r, i, j] = log P(chunk-r emissions,
        right-border state j | left-border state i)``.
    """
    c, q, R = E_T.shape
    br = choose_block_r(R)
    if q > PAD:
        raise ValueError(f"pallas forward kernel supports q <= {PAD}, got {q}")
    if R % br:
        raise ValueError(f"R={R} must be padded to a multiple of {br}")

    A_pad = jnp.zeros((PAD, PAD), jnp.float32)
    A_pad = A_pad.at[:q, :q].set(A.astype(jnp.float32))
    E_pad = E_T
    if q < PAD:
        E_pad = jnp.pad(E_T, ((0, 0), (0, PAD - q), (0, 0)))

    grid = (R // br, c)
    out = pl.pallas_call(
        partial(_sum_summary_kernel, c, P, q, br),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # A scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A column vectors
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
        scratch_shapes=[
            pltpu.VMEM((PAD * PAD, br), jnp.float32),
            pltpu.VMEM((PAD, br), jnp.float32),
        ],
        interpret=interpret,
    )(A_pad, A_pad, E_pad)

    # rows are (j, i) pairs -> (R, i, j).
    C_ji = out.reshape(PAD, PAD, R)[:q, :q]
    return jnp.moveaxis(C_ji, -1, 0).swapaxes(-1, -2)


def _sum_fwd_kernel(c: int, q: int, br: int, A_ref, r0_ref, l0_ref, e_ref, out_ref, AL, LL):
    """Scaled forward output pass: emits log alpha at every position.

    AL[p, r] scaled alpha; LL[1, r] log-scale. r0/l0 are the per-chunk
    boundary starts (pre-emission, scaled/log-mass split).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        s = r0_ref[:, :] * e_ref[0]
        z = jnp.maximum(jnp.sum(s, axis=0, keepdims=True), _TINY)
        AL[:, :] = s / z
        LL[:, :] = l0_ref[:, :] + jnp.log(z)

    @pl.when(t > 0)
    def _step():
        acc_rows = []
        for p in range(q):
            acc = AL[0:1, :] * A_ref[0, p]
            for k in range(1, q):
                acc = acc + AL[k : k + 1, :] * A_ref[k, p]
            acc_rows.append(jnp.maximum(acc, _EPS))
        for p in range(q, PAD):
            acc_rows.append(jnp.zeros((1, br)))
        s = jnp.concatenate(acc_rows, axis=0) * e_ref[0]
        z = jnp.maximum(jnp.sum(s, axis=0, keepdims=True), _TINY)
        AL[:, :] = s / z
        LL[:, :] = LL[:, :] + jnp.log(z)

    out_ref[0] = jnp.log(jnp.maximum(AL[:, :], _TINY)) + LL[:, :]


def _beta_bwd_kernel(
    c: int, q: int, br: int, A_ref, b0_ref, l0_ref, e_ref, out_ref, BE, LL
):
    """Scaled backward output pass: emits log beta at every position.

    Reverse-time grid via index maps; ``e_ref`` streams e_{t+1}. (The
    posterior combine ``la + lb - ll`` happens in XLA — streaming log_alpha
    through the kernel as a third HBM input measured slower than one fused
    elementwise pass outside.)
    """
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        BE[:, :] = b0_ref[:, :]
        LL[:, :] = l0_ref[:, :]

    @pl.when(g > 0)
    def _step():
        r = BE[:, :] * e_ref[0]  # (PAD, br): beta_{t+1} * e_{t+1}
        rows = []
        for p in range(q):
            acc = r[0:1, :] * A_ref[p, 0]
            for k in range(1, q):
                acc = acc + r[k : k + 1, :] * A_ref[p, k]
            rows.append(jnp.maximum(acc, _EPS))
        for p in range(q, PAD):
            rows.append(jnp.zeros((1, br)))
        s = jnp.concatenate(rows, axis=0)
        z = jnp.maximum(jnp.max(s, axis=0, keepdims=True), _TINY)
        BE[:, :] = s / z
        LL[:, :] = LL[:, :] + jnp.log(z)

    out_ref[0] = jnp.log(jnp.maximum(BE[:, :], _TINY)) + LL[:, :]


@partial(jax.jit, static_argnames=("interpret",))
def sum_fwd_outputs(A, E_T, r0, ll0, interpret: bool = False):
    """Per-position log-forward variables from per-chunk boundary starts.

    Args:
        A: (q, q) linear transition matrix.
        E_T: (c, q, R) linear emissions (as in :func:`sum_chunk_summaries`).
        r0: (q, R) scaled pre-emission start distribution per chunk.
        ll0: (R,) log-mass of the start (log alpha = log(r0) + ll0).

    Returns:
        log_alpha: (c, PAD, R) — rows >= q are garbage (sliced by caller).
    """
    c, q, R = E_T.shape
    br = choose_block_r(R)
    A_pad = jnp.zeros((PAD, PAD), jnp.float32)
    A_pad = A_pad.at[:q, :q].set(A.astype(jnp.float32))
    E_pad = E_T
    if q < PAD:
        E_pad = jnp.pad(E_T, ((0, 0), (0, PAD - q), (0, 0)))
    r0_pad = jnp.pad(r0, ((0, PAD - q), (0, 0)))
    l0 = ll0[None].astype(jnp.float32)

    grid = (R // br, c)
    return pl.pallas_call(
        partial(_sum_fwd_kernel, c, q, br),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # A scalars
            pl.BlockSpec(
                (PAD, br), lambda j, t: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, br), lambda j, t: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, PAD, br),
                lambda j, t: (t, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PAD, br), lambda j, t: (t, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, PAD, R), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((PAD, br), jnp.float32),
            pltpu.VMEM((1, br), jnp.float32),
        ],
        interpret=interpret,
    )(A_pad, r0_pad, l0, E_pad)


@partial(jax.jit, static_argnames=("interpret",))
def beta_bwd_outputs(A, E_T, beta0, ll0, interpret=False):
    """Per-position log-backward from per-chunk backward boundary starts.

    Args:
        A: (q, q) linear transition matrix.
        E_T: (c, q, R) linear emissions.
        beta0: (q, R) scaled backward value at each chunk's last position.
        ll0: (R,) its log-mass.

    Returns:
        log_beta: (c, PAD, R) — rows >= q are garbage (sliced by caller).
    """
    c, q, R = E_T.shape
    br = choose_block_r(R)
    A_pad = jnp.zeros((PAD, PAD), jnp.float32)
    A_pad = A_pad.at[:q, :q].set(A.astype(jnp.float32))
    E_pad = E_T
    if q < PAD:
        E_pad = jnp.pad(E_T, ((0, 0), (0, PAD - q), (0, 0)))
    b0_pad = jnp.pad(beta0, ((0, PAD - q), (0, 0)))
    l0 = ll0[None].astype(jnp.float32)

    grid = (R // br, c)
    return pl.pallas_call(
        partial(_beta_bwd_kernel, c, q, br),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # A scalars (A[p, k])
            pl.BlockSpec(
                (PAD, br), lambda j, g: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, br), lambda j, g: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, PAD, br),
                # e_{t+1} with t = c-1-g; block 0 is unused at g == 0.
                lambda j, g: ((c - g) % c, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PAD, br),
            lambda j, g: (c - 1 - g, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, PAD, R), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((PAD, br), jnp.float32),
            pltpu.VMEM((1, br), jnp.float32),
        ],
        interpret=interpret,
    )(A_pad, b0_pad, l0, E_pad)

"""MXU Pallas summary kernel — MEASURED NEGATIVE, kept as the record.

Staged rounds 2-4 while MXU matmuls inside Pallas kernels hung the axon
toolchain; the fix landed 2026-08-20 and the kernel was benchmarked the
same day (BASELINE.md round 5): **0.11-0.61x the XLA chunked path at every
supported q** (q=33: 15.4 vs 1.7 ms; q=127: 42 vs 21 ms; b=32, L=3069).
Why it loses: the grid processes ``eb`` chunk elements per block, so the
sequential TPU grid issues ~R/eb x c tiny (128, qp)x(qp, qp) matmuls
(~32k dispatches at q=33) where the XLA scan batches each timestep into
ONE (R·qb)-row einsum; and the roofline of the ideal all-rows-per-step
formulation (~2 ms at q=33) only TIES XLA — there is no headroom. Two
hardware-only findings the interpret tests could not catch: the in-kernel
``dot_general`` defaulted to bf16 (loglik error 0.66 nats at q=33 —
fixed, HIGHEST, the engine-wide DP-precision rule), and the residual
parity gap after fixing the step matmul traced to the SAME default in the
one-hot emission/init selections (now all HIGHEST). ``HMM_PALLAS_MXU=1`` still enables the dispatch
(``ops.recursion._chunk_summaries_dispatch``) for re-measurement, but
don't retry without the all-rows redesign.

Layout (states on LANES — the transpose of the VPU kernels):

* carry ``M[(el, i), k]``: rows = (chunk element, border state) pairs
  (``eb`` elements x ``qb`` 8-padded border rows = one 128-row tile),
  lanes = current state ``k`` (q <= 128 on one lane tile).
* step: ``M_new = (M @ A) * e`` — ONE (rows, qp) x (qp, qp) MXU matmul per
  step plus a static one-hot row-broadcast matmul for the emissions,
  row-rescaled with a lane reduction. MXU utilization grows with q
  (~50% at q=64, full at q=128) — exactly the regime where the VPU
  max-trees fall behind.

Parity with the XLA summary scan is tested in interpreter mode
(tests/test_recursion.py::TestMxuSummaryKernel).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["MXU_KERNELS", "mxu_supported", "sum_chunk_summaries_mxu"]

# Opt-in only: flip HMM_PALLAS_MXU=1 once the axon Mosaic toolchain stops
# hanging on in-kernel dot_general.
MXU_KERNELS = os.environ.get("HMM_PALLAS_MXU", "0") == "1"

_EPS = np.float32(1e-16)
_TINY = np.float32(1e-30)


def mxu_supported(q: int) -> bool:
    return 16 < q <= 128


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _mxu_summary_kernel(
    c: int, P: int, q: int, qp: int, qb: int, eb: int,
    A_ref, Av_ref, e_ref, out_ref, M, LL,
):
    """Grid = (R // eb, c); one step = one timestep of ``eb`` chunk elements.

    A_ref: (qp, qp) VMEM — linear transition matrix, lanes = target state.
    Av_ref: (qp, qp) VMEM — same matrix (read as rows at init).
    e_ref: (1, 1, eb, qp) VMEM — emissions of this step, rows = elements
        (4D so the block's trailing dims EQUAL the array dims — Mosaic
        requires trailing block dims divisible by (8, 128) or full).
    out_ref: (eb * qb, qp) — final log operators, written at t == c-1.
    M: (eb * qb, qp) scratch — row-scaled running operators.
    LL: (eb * qb, 1) scratch — accumulated log-scale per row.
    """
    t = pl.program_id(1)
    blk = pl.program_id(0)
    rows = eb * qb
    row_el = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // qb
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % qb
    # Static one-hot row->element matrix for emission broadcasts.
    onehot_el = (
        row_el == jax.lax.broadcasted_iota(jnp.int32, (rows, eb), 1)
    ).astype(jnp.float32)

    def e_rows():
        # One-hot SELECTION is structurally exact, but the MXU rounds the
        # OTHER operand (the emissions) to bf16 under default precision —
        # the engine-wide HIGHEST rule applies to every device einsum.
        return jax.lax.dot_general(
            onehot_el, e_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (rows, qp): e[k] broadcast over the border rows of each element

    def rescale(s):
        z = jnp.maximum(jnp.sum(s, axis=1, keepdims=True), _TINY)
        M[:, :] = s / z
        return jnp.log(z)

    @pl.when(t == 0)
    def _init():
        # Row (el, i) starts as identity row e_i (first chunk of a
        # sequence) or A[i, :] otherwise, times the first emission.
        el_global = blk * eb + row_el
        is_first = ((el_global % P) == 0).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
        eye_rows = (lane == row_i).astype(jnp.float32)
        # A rows gathered by border index: onehot(i) @ A.
        onehot_i = (
            row_i == jax.lax.broadcasted_iota(jnp.int32, (rows, qp), 1)
        ).astype(jnp.float32)
        a_rows = jax.lax.dot_general(
            onehot_i, Av_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        R0 = is_first * eye_rows + (1.0 - is_first) * a_rows
        s = jnp.maximum(R0, 0.0) * jnp.maximum(e_rows(), _EPS)
        LL[:, :] = rescale(s)

    @pl.when(t > 0)
    def _step():
        # DP-recursion matmul: must be HIGHEST like every engine einsum
        # (CLAUDE.md precision rule). First hardware run of this kernel
        # measured |dll| = 0.66 nats at q=33 from the bf16 default.
        r = jax.lax.dot_general(
            M[:, :], A_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s = jnp.maximum(r, _EPS) * jnp.maximum(e_rows(), _EPS)
        LL[:, :] = LL[:, :] + rescale(s)

    @pl.when(t == c - 1)
    def _flush():
        out_ref[:, :] = jnp.log(jnp.maximum(M[:, :], _TINY)) + LL[:, :]


@partial(jax.jit, static_argnames=("P", "interpret"))
def sum_chunk_summaries_mxu(A, E_S, P: int, interpret: bool = False):
    """Log-space chunk transfer operators via the MXU formulation.

    Args:
        A: (q, q) linear transition matrix.
        E_S: (c, R, q) linear emissions, time-major with STATES ON LANES
            (the natural layout — no host-side transpose); lane padding to
            qp and element padding of R to a multiple of ``eb`` happen
            here. Values should be pre-clamped to > 0.
        P: chunks per sequence (element r = sequence r // P, chunk r % P).

    Returns:
        C: (R, q, q) with ``C[r, i, j] = log P(chunk-r emissions,
        right-border state j | left-border state i)``.
    """
    c, R, q = E_S.shape
    if not mxu_supported(q):
        raise ValueError(f"MXU summary kernel needs 16 < q <= 128, got {q}")
    qp = max(128, _round8(q))  # one full lane tile
    qb = _round8(q)  # border rows per element
    eb = max(1, 128 // qb)  # elements per 128-row block
    R_pad = -(-R // eb) * eb

    A_pad = jnp.zeros((qp, qp), jnp.float32)
    A_pad = A_pad.at[:q, :q].set(A.astype(jnp.float32))
    E_pad = jnp.pad(
        E_S, ((0, 0), (0, R_pad - R), (0, qp - q)), constant_values=1.0
    ).reshape(c, R_pad // eb, eb, qp)

    grid = (R_pad // eb, c)
    out = pl.pallas_call(
        partial(_mxu_summary_kernel, c, P, q, qp, qb, eb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A (init rows)
            pl.BlockSpec(
                (1, 1, eb, qp),
                lambda j, t: (t, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (eb * qb, qp), lambda j, t: (j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R_pad * qb, qp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((eb * qb, qp), jnp.float32),
            pltpu.VMEM((eb * qb, 1), jnp.float32),
        ],
        interpret=interpret,
    )(A_pad, A_pad, E_pad)

    C = out.reshape(R_pad, qb, qp)[:R, :q, :q]
    return C

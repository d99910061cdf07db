"""Pallas TPU kernels: chunked affine adjoint solves.

Solves the adjoint recursion shared by the analytic VJPs of the chunked
engine (``ops.recursion._chunked_affine_reverse``),

    x_t = s_t + u_t * (B @ (v_t * x_{t+1})),   x_L = 0,

with the same two-level decomposition as the primal kernels in
``ops.pallas_forward``: a reverse per-chunk summary pass producing
composite affine maps ``[K | o]`` (``x_chunk_start = K @ x_chunk_end + o``,
shape q x (q+1)), an XLA-side boundary fold over the P chunk boundaries,
then a reverse per-chunk output pass. The per-step map entries
``u_i B[i,k] v_k`` are softmax weights in [0, 1] and the sources are
bounded (centered) residuals, so no per-step rescaling is needed — matching
the XLA path's numerics exactly.

Layouts (R = b * P chunk elements, padded to br lanes):

* summary carry ``X[(p, col), r]``: sublanes = 16x16-padded (p = state,
  col = composite column; col q holds the affine offset o), lanes = chunk
  elements. Requires q + 1 <= PAD, i.e. q <= 15.
* output carry ``x[p, r]``: (PAD, br) plus streamed (u, v, s) tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_viterbi import PAD, choose_block_r  # shared tiling

__all__ = ["affine_chunk_composites", "affine_reverse_outputs", "supported"]


def supported(q: int) -> bool:
    """The composite carry needs q states + 1 offset column <= PAD."""
    return q + 1 <= PAD


def _affine_summary_kernel(
    c: int, q: int, br: int, B_ref, Bt_ref, u_ref, v_ref, s_ref, out_ref, X
):
    """Reverse scan of composite affine maps within each chunk.

    X[(p, col), r]: running composite; col q is the offset column.
    Grid = (R // br, c); grid step g processes t = c-1-g; out written at
    g == c-1 (t == 0) as the full-chunk composite.
    """
    g = pl.program_id(1)
    colsub = jax.lax.broadcasted_iota(jnp.int32, (PAD, br), 0)
    off = jnp.where(colsub == q, 1.0, 0.0)

    @pl.when(g == 0)
    def _init():
        # One step applied to [I | 0]: X[p, col<q] = u_p B[p, col] v_col
        # (v_ref's tile already carries v_col on sublanes); X[p, q] = s_p.
        for p in range(q):
            rows = Bt_ref[:, p][:, None] * v_ref[0]
            rows = rows * u_ref[0, p, :][None, :]
            X[p * PAD : (p + 1) * PAD, :] = (
                rows + off * s_ref[0, p, :][None, :]
            )
        for p in range(q, PAD):
            X[p * PAD : (p + 1) * PAD, :] = jnp.zeros((PAD, br), jnp.float32)

    @pl.when(g > 0)
    def _step():
        # Stage W_k = v_k * X_k in out_ref (scratch), then
        # X_new[p] = u_p * sum_k B[p, k] W_k + (col == q) s_p.
        for k in range(q):
            out_ref[k * PAD : (k + 1) * PAD, :] = (
                v_ref[0, k, :][None, :] * X[k * PAD : (k + 1) * PAD, :]
            )
        for p in range(q):
            acc = out_ref[0:PAD, :] * B_ref[p, 0]
            for k in range(1, q):
                acc = acc + out_ref[k * PAD : (k + 1) * PAD, :] * B_ref[p, k]
            X[p * PAD : (p + 1) * PAD, :] = (
                u_ref[0, p, :][None, :] * acc + off * s_ref[0, p, :][None, :]
            )

    @pl.when(g == c - 1)
    def _flush():
        for p in range(PAD):
            out_ref[p * PAD : (p + 1) * PAD, :] = X[p * PAD : (p + 1) * PAD, :]


@partial(jax.jit, static_argnames=("interpret",))
def affine_chunk_composites(B, U_T, V_T, S_T, interpret: bool = False):
    """Per-chunk composite affine maps of the reverse adjoint recursion.

    Args:
        B: (q, q) linear map (A or A^T of the HMM).
        U_T, V_T, S_T: (c, q, R) per-step diagonals / sources, time-major
            and state-transposed (lane r = sequence r // P, chunk r % P).

    Returns:
        comp: (R, q, q+1) with ``x_start = comp[:, :, :q] @ x_end +
        comp[:, :, q]`` over one chunk.
    """
    c, q, R = U_T.shape
    br = choose_block_r(R)
    if not supported(q):
        raise ValueError(f"pallas affine kernel needs q + 1 <= {PAD}, got q={q}")
    if R % br:
        raise ValueError(f"R={R} must be padded to a multiple of {br}")

    B_pad = jnp.zeros((PAD, PAD), jnp.float32)
    B_pad = B_pad.at[:q, :q].set(B.astype(jnp.float32))

    def pad_states(x):
        return jnp.pad(x, ((0, 0), (0, PAD - q), (0, 0))) if q < PAD else x

    U, V, S = pad_states(U_T), pad_states(V_T), pad_states(S_T)
    stream = pl.BlockSpec(
        (1, PAD, br), lambda j, g: (c - 1 - g, 0, j), memory_space=pltpu.VMEM
    )
    grid = (R // br, c)
    out = pl.pallas_call(
        partial(_affine_summary_kernel, c, q, br),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # B scalars
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B^T column vectors
            stream,
            stream,
            stream,
        ],
        out_specs=pl.BlockSpec(
            (PAD * PAD, br), lambda j, g: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((PAD * PAD, R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PAD * PAD, br), jnp.float32)],
        interpret=interpret,
    )(B_pad, B_pad.T, U, V, S)

    comp = out.reshape(PAD, PAD, R)[:q, : q + 1]  # [p, col, r]
    return jnp.moveaxis(comp, -1, 0)


def _affine_out_kernel(
    c: int, q: int, br: int, B_ref, x0_ref, u_ref, v_ref, s_ref, out_ref, XV
):
    """Reverse output pass from the right-boundary adjoint of each chunk."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        XV[:, :] = x0_ref[:, :]

    r = v_ref[0] * XV[:, :]
    rows = []
    for p in range(q):
        acc = r[0:1, :] * B_ref[p, 0]
        for k in range(1, q):
            acc = acc + r[k : k + 1, :] * B_ref[p, k]
        rows.append(acc)
    for p in range(q, PAD):
        rows.append(jnp.zeros((1, br), jnp.float32))
    x_new = jnp.concatenate(rows, axis=0) * u_ref[0] + s_ref[0]
    XV[:, :] = x_new
    out_ref[0] = x_new


@partial(jax.jit, static_argnames=("interpret",))
def affine_reverse_outputs(B, U_T, V_T, S_T, x_right, interpret: bool = False):
    """Per-position adjoints from per-chunk right-boundary values.

    Args:
        B: (q, q); U_T, V_T, S_T: (c, q, R) as in
            :func:`affine_chunk_composites`.
        x_right: (PAD, R) adjoint at each chunk's one-past-the-end position
            (rows >= q must be zero).

    Returns:
        x: (c, PAD, R) — rows >= q are zero (sliced by caller).
    """
    c, q, R = U_T.shape
    br = choose_block_r(R)
    B_pad = jnp.zeros((PAD, PAD), jnp.float32)
    B_pad = B_pad.at[:q, :q].set(B.astype(jnp.float32))

    def pad_states(x):
        return jnp.pad(x, ((0, 0), (0, PAD - q), (0, 0))) if q < PAD else x

    U, V, S = pad_states(U_T), pad_states(V_T), pad_states(S_T)
    stream = pl.BlockSpec(
        (1, PAD, br), lambda j, g: (c - 1 - g, 0, j), memory_space=pltpu.VMEM
    )
    grid = (R // br, c)
    return pl.pallas_call(
        partial(_affine_out_kernel, c, q, br),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # B scalars
            pl.BlockSpec(
                (PAD, br), lambda j, g: (0, j), memory_space=pltpu.VMEM
            ),
            stream,
            stream,
            stream,
        ],
        out_specs=pl.BlockSpec(
            (1, PAD, br), lambda j, g: (c - 1 - g, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, PAD, R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PAD, br), jnp.float32)],
        interpret=interpret,
    )(B_pad, x_right, U, V, S)

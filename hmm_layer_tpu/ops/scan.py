"""Generic sequence-scan drivers for custom recurrent cells.

Capability parity with the reference's recurrence layer
(``/root/reference/hmm_layer/BaseRNN.py:149-321`` and
``Bidirectional.py:6-207``): run an arbitrary cell over the time axis of a
batch, forwards or backwards, optionally returning the full output sequence
and/or final state, and combine a forward and a backward pass with a merge
mode. The HMM engine itself does not use these (it has specialized scans in
:mod:`hmm_layer_tpu.ops.recursion`); they exist for users who drove custom
cells through ``BaseRNN``.

A cell is a pure function ``cell(x_t, state) -> (output_t, new_state)``;
state is any pytree. The time loop is ``jax.lax.scan`` — compiled once,
no per-step Python dispatch (the reference loops in Python,
``BaseRNN.py:217-227``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["rnn_scan", "bidirectional_scan"]


def rnn_scan(
    cell,
    inputs,
    initial_state,
    time_axis: int = 1,
    reverse: bool = False,
    return_sequences: bool = True,
    return_state: bool = False,
):
    """Run ``cell`` over ``inputs`` along ``time_axis``.

    Args:
        cell: ``cell(x_t, state) -> (output_t, new_state)``.
        inputs: array with a time axis (default axis 1 = batch-first, like
            the reference's ``batch_first=True``).
        initial_state: pytree carried through the scan.
        reverse: consume the sequence last-to-first; outputs are returned in
            original time order (matching ``BaseRNN.py:198-200,228-230``).
        return_sequences: return outputs for every step, else the last step.
        return_state: additionally return the final state.

    Returns:
        outputs [, final_state]
    """
    xs = jnp.moveaxis(inputs, time_axis, 0)

    def step(state, x_t):
        out, new_state = cell(x_t, state)
        return new_state, out

    final_state, outs = lax.scan(step, initial_state, xs, reverse=reverse)
    if return_sequences:
        outputs = jax.tree.map(lambda o: jnp.moveaxis(o, 0, time_axis), outs)
    else:
        idx = 0 if reverse else -1
        outputs = jax.tree.map(lambda o: o[idx], outs)
    if return_state:
        return outputs, final_state
    return outputs


def bidirectional_scan(
    forward_cell,
    backward_cell,
    inputs,
    forward_initial_state,
    backward_initial_state,
    time_axis: int = 1,
    merge_mode: str | None = "concat",
    return_state: bool = False,
):
    """Forward + backward pass with output merging.

    ``merge_mode``: ``"sum"``, ``"concat"``, ``"mul"``, ``"ave"`` or ``None``
    (return the pair), matching ``Bidirectional.forward``
    (``Bidirectional.py:152-160``).
    """
    fwd, fwd_state = rnn_scan(
        forward_cell,
        inputs,
        forward_initial_state,
        time_axis=time_axis,
        return_state=True,
    )
    bwd, bwd_state = rnn_scan(
        backward_cell,
        inputs,
        backward_initial_state,
        time_axis=time_axis,
        reverse=True,
        return_state=True,
    )
    if merge_mode == "sum":
        merged = jax.tree.map(jnp.add, fwd, bwd)
    elif merge_mode == "mul":
        merged = jax.tree.map(jnp.multiply, fwd, bwd)
    elif merge_mode == "ave":
        merged = jax.tree.map(lambda a, b: (a + b) / 2, fwd, bwd)
    elif merge_mode == "concat":
        merged = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-1), fwd, bwd
        )
    elif merge_mode is None:
        merged = (fwd, bwd)
    else:
        raise ValueError(f"unknown merge_mode: {merge_mode}")
    if return_state:
        return merged, fwd_state, bwd_state
    return merged

"""Shared machinery for sparse-edge-parameterized transition matrices.

Equivalent capability to ``make_transition_matrix_from_indices``
(``/root/reference/hmm_layer/Transitioner.py:337-380``): transition
probabilities live as one logit per allowed edge; each state's outgoing
edges compete through a softmax restricted to the allowed sparsity pattern.
Implemented as a dense masked scatter + masked softmax — dense (q, q) work is
negligible at build time and XLA-friendly (no sparse formats on TPU).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.semiring import LOG_ZERO


def masked_row_softmax_from_edges(indices, values, num_states):
    """Build a dense row-stochastic matrix from edge logits.

    Args:
        indices: (n_edges, 2) int array of (from_state, to_state) — static.
        values: (n_edges,) traced logits.
        num_states: q.

    Returns:
        (q, q) matrix; each row softmaxes its allowed edges, rows without any
        edge are all-zero.

    Note (axon toolchain): the dense scatter-set build hangs the TPU
    compiler at q ~ 500 (observed 2026-08-19, q=505: >20 min compile /
    worker crash). For large multi-copy models use
    :func:`sparse_edge_softmax` + :mod:`hmm_layer_tpu.ops.sparse`, which
    are hardware-verified at q=505.
    """
    indices = np.asarray(indices)
    dense = jnp.full((num_states, num_states), LOG_ZERO, values.dtype)
    dense = dense.at[indices[:, 0], indices[:, 1]].set(
        jnp.maximum(values, LOG_ZERO + 1.0)
    )
    mask = np.zeros((num_states, num_states), np.float32)
    mask[indices[:, 0], indices[:, 1]] = 1.0
    probs = jnp.exp(dense - jnp.max(dense, axis=-1, keepdims=True)) * mask
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    return probs / jnp.maximum(denom, 1e-16)


def gather_edge_probs(A, indices):
    """Read back per-edge probabilities from a dense matrix."""
    indices = np.asarray(indices)
    return A[..., indices[:, 0], indices[:, 1]]


def sparse_edge_softmax(indices, values, num_states):
    """Per-edge probabilities WITHOUT densifying (``Transitioner.py:249-310``
    capability, ``make_A_sparse``).

    Each state's outgoing edges compete through a softmax restricted to the
    sparsity pattern, computed with segment reductions over the edge list —
    O(n_edges) work and memory, so multi-copy models whose dense ``(q, q)``
    matrix would not fit (1+14k states at large k) stay representable.

    Args:
        indices: (n_edges, 2) int array of (from_state, to_state) — static.
        values: (..., n_edges) traced logits (leading axes broadcast).
        num_states: q.

    Returns:
        (..., n_edges) probabilities; rows with no edges contribute nothing.
    """
    import jax

    rows = np.asarray(indices)[:, 0]
    row_max = jax.ops.segment_max(
        jnp.moveaxis(values, -1, 0), rows, num_states
    )  # (q, ...)
    shifted = values - jnp.moveaxis(row_max, 0, -1)[..., rows]
    e = jnp.exp(jnp.maximum(shifted, LOG_ZERO))
    denom = jax.ops.segment_sum(jnp.moveaxis(e, -1, 0), rows, num_states)
    return e / jnp.maximum(jnp.moveaxis(denom, 0, -1)[..., rows], 1e-16)

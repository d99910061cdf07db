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
import jax
import jax.numpy as jnp

from ..ops.semiring import LOG_ZERO


def dense_from_edge_probs(indices, edge_probs, num_states):
    """Densify per-edge values WITHOUT any scatter: one one-hot matmul.

    ``A[..., i, j] = sum_{e: src=i, dst=j} w_e`` computed as
    ``(OneHotSrc ⊙ w)ᵀ @ OneHotDst`` with iota-comparison one-hots — the
    ``.at[src, dst].set`` scatter build crashes/hangs the axon TPU
    compiler at q ≈ 500 (BASELINE.md round 3), while this formulation is
    one MXU-friendly ``(q, n) x (n, q)`` contraction that compiles and
    runs at config-5 state counts. HIGHEST precision: the one-hots are
    exact in any precision but bf16 would round the *values* operand.

    Args:
        indices: (n_edges, 2) static int array of (from, to) pairs.
        edge_probs: (..., n_edges) traced values (leading axes broadcast).
        num_states: q.

    Returns:
        (..., q, q) dense matrix; entries off the edge support are 0.
    """
    indices = np.asarray(indices)
    states = jnp.arange(num_states)
    oh_src = (
        jnp.asarray(indices[:, 0])[:, None] == states[None, :]
    ).astype(edge_probs.dtype)  # (n, q)
    oh_dst = (
        jnp.asarray(indices[:, 1])[:, None] == states[None, :]
    ).astype(edge_probs.dtype)
    return jnp.einsum(
        "...e,eq,er->...qr",
        edge_probs,
        oh_src,
        oh_dst,
        precision=jax.lax.Precision.HIGHEST,
    )


def masked_row_softmax_from_edges(indices, values, num_states):
    """Build a dense row-stochastic matrix from edge logits.

    Args:
        indices: (n_edges, 2) int array of (from_state, to_state) — static.
        values: (n_edges,) traced logits.
        num_states: q.

    Returns:
        (q, q) matrix; each row softmaxes its allowed edges, rows without any
        edge are all-zero.

    Implementation: per-edge softmax over each row's out-edges
    (:func:`sparse_edge_softmax`, O(n) segment ops) densified by the
    scatter-free one-hot matmul (:func:`dense_from_edge_probs`) — the
    previous ``.at[].set`` scatter build crashed the axon TPU compiler at
    q ≈ 500 and capped the DENSE engine below config-5 state counts;
    this build compiles there (hardware-verified at q=505).
    """
    # Clamp like the old scatter build did: a row whose edge logits are
    # ALL -inf would make the per-row softmax NaN (shifted = -inf+inf);
    # clamped it degrades to a uniform row over that row's edges.
    values = jnp.maximum(values, LOG_ZERO + 1.0)
    probs = sparse_edge_softmax(indices, values, num_states)
    return dense_from_edge_probs(indices, probs, num_states)


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

"""Log-semiring and max-plus (tropical) semiring primitives.

These are the algebraic building blocks of every HMM recursion in this
framework:

* ``(logsumexp, +)`` — the *log semiring* used by the forward/backward
  algorithms (sum-product in log space).
* ``(max, +)`` — the *tropical semiring* used by Viterbi decoding
  (max-product in log space).

The reference implementation (``/root/reference/hmm_layer/TotalProbabilityCell.py:44-46``)
performs the log-matrix-vector product only at chunk granularity; here the
same combine is exposed as a first-class, batched, associative operator so it
can be driven by ``jax.lax.associative_scan`` and fused by XLA.

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference's approx_log_zero (Transitioner.py:36); used to
# represent impossible transitions in dense log-matrices without producing
# -inf (which poisons gradients through logsumexp).
LOG_ZERO = -1e3

# Probability clamp used by the scaled recursions, mirroring
# MsaHmmCell.epsilon (MsaHmmCell.py:33).
EPS = 1e-16


def logmatmul(x: jax.Array, y: jax.Array) -> jax.Array:
    """Log-space matrix product: ``Z = log(exp(x) @ exp(y))``.

    x: (..., n, k), y: (..., k, m) -> (..., n, m)

    Computed with a numerically stable two-sided max-shift so each operand
    is rescaled independently (important when both factors carry large
    accumulated log-likelihood offsets).
    """
    # Shift each row of x and each column of y by its max.
    x_max = jnp.max(x, axis=-1, keepdims=True)  # (..., n, 1)
    y_max = jnp.max(y, axis=-2, keepdims=True)  # (..., 1, m)
    x_max = jnp.where(jnp.isfinite(x_max), x_max, 0.0)
    y_max = jnp.where(jnp.isfinite(y_max), y_max, 0.0)
    ex = jnp.exp(x - x_max)
    ey = jnp.exp(y - y_max)
    prod = jnp.matmul(
        ex,
        ey,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.log(jnp.maximum(prod, EPS)) + x_max + y_max


def logmatvec(v: jax.Array, m: jax.Array) -> jax.Array:
    """Log-space row-vector × matrix: ``log(exp(v) @ exp(m))``.

    v: (..., k), m: (..., k, n) -> (..., n)
    """
    return logmatmul(v[..., None, :], m)[..., 0, :]


def maxmatmul(x: jax.Array, y: jax.Array) -> jax.Array:
    """Tropical (max, +) matrix product.

    x: (..., n, k), y: (..., k, m) -> (..., n, m)
    ``Z[i, j] = max_k x[i, k] + y[k, j]``.

    For small contraction dims the product is unrolled into an elementwise
    max-tree of ``(..., n, m)`` terms — XLA fuses the whole tree in VMEM,
    whereas the broadcast form materializes an ``(..., n, k, m)`` tensor in
    HBM every call (measured 20x slower in the chunked Viterbi summary pass
    at q=15, L=9999).
    """
    k = x.shape[-1]
    if k <= 128:
        it = (x[..., :, t, None] + y[..., t, None, :] for t in range(k))
        out = next(it)
        for term in it:
            out = jnp.maximum(out, term)
        return out
    return jnp.max(x[..., :, :, None] + y[..., None, :, :], axis=-2)


def maxargmatvec(v: jax.Array, m: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Tropical vector-matrix product with argmax.

    v: (..., k), m: (..., k, n) -> (scores (..., n), argmax (..., n) int32)
    ``scores[j] = max_i v[i] + m[i, j]``; argmax records the maximizing i.
    """
    s = v[..., :, None] + m  # (..., k, n)
    return jnp.max(s, axis=-2), jnp.argmax(s, axis=-2).astype(jnp.int32)


def log_normalize(x: jax.Array, axis: int = -1) -> tuple[jax.Array, jax.Array]:
    """Split log-weights into a normalized log-distribution and its log-mass.

    Returns ``(x - lse, lse)`` with ``lse = logsumexp(x, axis)``.
    """
    lse = jax.nn.logsumexp(x, axis=axis, keepdims=True)
    return x - lse, jnp.squeeze(lse, axis=axis)

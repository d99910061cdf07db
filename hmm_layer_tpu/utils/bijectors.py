"""Bijectors and triangular-matrix utilities for covariance parameterization.

Functional JAX equivalents of the reference utilities
(``/root/reference/hmm_layer/Utility.py:22-150``): ``inverse_softplus``,
``DefaultDiagBijector`` (softplus with offset so kernel 0 maps to a chosen
base variance), ``fill_triangular(_inverse)`` (vector <-> lower-triangular
packing, TFP layout) and ``FillScaleTriL``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def inverse_softplus(x):
    x = jnp.asarray(x)
    # log(expm1(x)) computed stably for large x.
    return x + jnp.log(-jnp.expm1(-x))


class DefaultDiagBijector:
    """Softplus bijector with an offset so that kernel 0 maps to
    sqrt(base_variance) (``Utility.py:31-45``)."""

    def __init__(self, base_variance: float, epsilon: float = 1e-5):
        base_std = math.sqrt(base_variance)
        self.scale_diag_init = float(inverse_softplus(jnp.float32(base_std)))
        self.epsilon = epsilon

    def forward(self, x):
        return jax.nn.softplus(x + self.scale_diag_init) + self.epsilon

    def inverse(self, y):
        return inverse_softplus(y - self.epsilon) - self.scale_diag_init


def _tri_n(m: int) -> int:
    n = int((math.sqrt(8 * m + 1) - 1) / 2)
    if n * (n + 1) // 2 != m:
        raise ValueError(f"last dimension ({m}) is not a triangular number")
    return n


def fill_triangular(x, upper: bool = False):
    """Pack a (..., n(n+1)/2) vector into a (..., n, n) triangular matrix
    using the TFP layout (``Utility.py:47-89``)."""
    x = jnp.asarray(x)
    n = _tri_n(x.shape[-1])
    if upper:
        rows, cols = np.triu_indices(n)
    else:
        rows, cols = np.tril_indices(n)
    out = jnp.zeros(x.shape[:-1] + (n, n), x.dtype)
    return out.at[..., rows, cols].set(x)


def fill_triangular_inverse(x, upper: bool = False):
    """Inverse of :func:`fill_triangular` (``Utility.py:91-127``)."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    if upper:
        rows, cols = np.triu_indices(n)
    else:
        rows, cols = np.tril_indices(n)
    return x[..., rows, cols]


class FillScaleTriL:
    """Vector -> lower-triangular scale matrix with a positive diagonal
    (``Utility.py:131-150``)."""

    def __init__(self, diag_bijector: DefaultDiagBijector):
        self.diag_bijector = diag_bijector

    def forward(self, x):
        y = fill_triangular(x)
        diag = jnp.diagonal(y, axis1=-2, axis2=-1)
        d = self.diag_bijector.forward(diag)
        n = y.shape[-1]
        idx = np.arange(n)
        return y.at[..., idx, idx].set(d)

    def inverse(self, y):
        diag = jnp.diagonal(y, axis1=-2, axis2=-1)
        d = self.diag_bijector.inverse(diag)
        n = y.shape[-1]
        idx = np.arange(n)
        y = y.at[..., idx, idx].set(d)
        return fill_triangular_inverse(y)


def make_kernel(mean, scale, diag_bijector=None):
    """Pack (mean, scale) into an MVN kernel vector (``Utility.py:152-173``)."""
    mean = jnp.asarray(mean)
    scale = jnp.asarray(scale)
    if scale.ndim == mean.ndim:  # diagonal scale
        if diag_bijector is None:
            return jnp.concatenate([mean, scale], axis=-1)
        return jnp.concatenate([mean, diag_bijector.inverse(scale)], axis=-1)
    if scale.ndim == mean.ndim + 1:  # full scale_tril
        tril = FillScaleTriL(diag_bijector=diag_bijector)
        return jnp.concatenate([mean, tril.inverse(scale)], axis=-1)
    raise ValueError(f"invalid scale shape: {scale.shape}")

"""Multivariate-normal mixture distributions over embedding vectors.

Functional JAX equivalent of ``/root/reference/hmm_layer/MvnMixture.py``:
kernels of shape ``(k1, k2, components, 2d)`` (diagonal) or
``(k1, k2, components, d + d(d+1)/2)`` (full scale-TriL), log-pdf via
Mahalanobis distance with inverse scales, optional mixture coefficients,
and the L2 variance-kernel regularizer (``MvnMixture.py:177-180``).

The class holds static configuration only; the kernel is passed to each
method so it can live in a trainable params pytree.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils.bijectors import DefaultDiagBijector, FillScaleTriL

__all__ = ["MvnMixture"]


class MvnMixture:
    def __init__(
        self,
        dim: int,
        diag_only: bool = True,
        diag_bijector: DefaultDiagBijector | None = None,
    ):
        self.dim = dim
        self.diag_only = diag_only
        self.diag_bijector = diag_bijector or DefaultDiagBijector(1.0)
        self.scale_tril = FillScaleTriL(self.diag_bijector)
        self.constant = self.dim * math.log(2 * math.pi)

    def num_params(self) -> int:
        d = self.dim
        return 2 * d if self.diag_only else d + d * (d + 1) // 2

    def _validate(self, kernel):
        assert kernel.ndim == 4, f"kernel must be 4D, got {kernel.shape}"
        assert kernel.shape[-1] == self.num_params(), (
            f"kernel last dim {kernel.shape[-1]} != {self.num_params()}"
        )

    def component_expectations(self, kernel):
        """(k1, k2, c, d) means."""
        return kernel[..., : self.dim]

    def expectation(self, kernel, mixture_kernel=None):
        comp = self.component_expectations(kernel)
        if kernel.shape[2] == 1:
            return comp[..., 0, :]
        mix = self.mixture_coefficients(mixture_kernel)
        return jnp.sum(comp * mix[..., None], axis=-2)

    def component_scale_diag(self, kernel):
        """Diagonal of the scale matrix, (k1, k2, c, d)."""
        if self.diag_only:
            return self.diag_bijector.forward(kernel[..., self.dim :]) + 1e-8
        tril = self.scale_tril.forward(kernel[..., self.dim :])
        return jnp.diagonal(tril, axis1=-2, axis2=-1)

    def component_covariances(self, kernel):
        if self.diag_only:
            return jnp.square(self.component_scale_diag(kernel))
        tril = self.scale_tril.forward(kernel[..., self.dim :])
        return jnp.matmul(tril, jnp.swapaxes(tril, -1, -2))

    def mixture_coefficients(self, mixture_kernel):
        if mixture_kernel is None:
            raise ValueError(
                "mixture_kernel is required for multi-component mixtures "
                "(kernel has more than one component)"
            )
        return jax.nn.softmax(mixture_kernel, axis=-1)

    def component_log_pdf(self, kernel, inputs):
        """All-pairs component log-densities.

        Args:
            kernel: (k1, k2, c, p).
            inputs: (k1, batch, d).
        Returns:
            (k1, batch, k2, c).
        """
        self._validate(kernel)
        mu = self.component_expectations(kernel)  # (k1, k2, c, d)
        diff = inputs[:, None, None] - mu[..., None, :]  # (k1, k2, c, b, d)
        if self.diag_only:
            scale_diag = self.component_scale_diag(kernel)
            log_det = 2.0 * jnp.sum(jnp.log(scale_diag), axis=-1)  # (k1, k2, c)
            pinv_sq = jnp.square(1.0 / scale_diag)
            md_sq = jnp.sum(jnp.square(diff) * pinv_sq[..., None, :], axis=-1)
        else:
            tril = self.scale_tril.forward(kernel[..., self.dim :])
            log_det = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(tril, axis1=-2, axis2=-1)), axis=-1
            )
            # Solve L y = diff  =>  y = L^{-1} diff; Mahalanobis = |y|^2.
            y = jax.scipy.linalg.solve_triangular(
                tril[..., None, :, :], diff[..., None], lower=True
            )[..., 0]
            md_sq = jnp.sum(jnp.square(y), axis=-1)
        # (k1, k2, c, b) -> (k1, b, k2, c)
        md_sq = jnp.moveaxis(md_sq, -1, 1)
        log_det = log_det[:, None]  # (k1, 1, k2, c)
        return -0.5 * (self.constant + log_det + md_sq)

    def log_pdf(self, kernel, inputs, mixture_kernel=None):
        """Mixture log-density; (k1, batch, k2)."""
        comp = self.component_log_pdf(kernel, inputs)
        if kernel.shape[2] == 1:
            return comp[..., 0]
        log_mix = jnp.log(self.mixture_coefficients(mixture_kernel))
        return jax.nn.logsumexp(comp + log_mix[:, None], axis=-1)

    def regularization_l2_loss(self, kernel):
        return jnp.mean(jnp.sum(jnp.square(kernel[..., self.dim :]), axis=-1))

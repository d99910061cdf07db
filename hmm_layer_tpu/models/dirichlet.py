"""Dirichlet mixture densities over probability vectors.

Functional JAX equivalent of ``/root/reference/hmm_layer/DirichletMixture.py``:
the mixture log-pdf (``DirichletMixture.py:6-23``), the trainable mixture
layer with the Dirichlet-process prior used during prior training
(``:97-115``), and (de)serialization of trained mixtures (``:128-133``,
as ``.npz`` instead of torch state dicts).

Used as the amino-acid and transition priors of the profile-HMM family.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = ["dirichlet_log_pdf", "DirichletMixture", "load_mixture_model", "save_mixture_model"]


def dirichlet_log_pdf(p, alpha, q):
    """Log-density of a Dirichlet mixture.

    Args:
        p: (b, s) probability vectors.
        alpha: (k, s) component concentration parameters.
        q: (k,) mixture weights.
    Returns:
        (b,) log-densities.
    """
    logZ = jnp.sum(gammaln(alpha), axis=-1) - gammaln(jnp.sum(alpha, axis=-1))
    log_p_alpha = jnp.log(jnp.maximum(p, 1e-16))[:, None] * (alpha - 1.0)[None]
    log_p_alpha = jnp.sum(log_p_alpha, axis=-1) - logZ
    return jax.nn.logsumexp(log_p_alpha + jnp.log(q), axis=-1)


class DirichletMixture:
    """Trainable Dirichlet mixture over ``alphabet_size``-dim simplices."""

    def __init__(
        self,
        num_components: int,
        alphabet_size: int,
        use_dirichlet_process: bool = True,
        number_of_examples: int = -1,
        trainable: bool = True,
    ):
        self.num_components = num_components
        self.alphabet_size = alphabet_size
        self.use_dirichlet_process = use_dirichlet_process
        self.number_of_examples = number_of_examples
        self.trainable = trainable

    def init_params(self, key) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "alpha_kernel": jax.random.normal(
                k1, (self.num_components, self.alphabet_size)
            ),
            "mix_kernel": jax.random.normal(k2, (self.num_components,)),
        }
        if self.use_dirichlet_process:
            params.update(
                {
                    "gamma_kernel": jnp.asarray([50.0]),
                    "beta_kernel": jnp.asarray([100.0]),
                    "lambda_kernel": jnp.ones((1,)),
                    "background_kernel": jax.random.normal(
                        k3, (self.alphabet_size,)
                    ),
                }
            )
        return params

    def make_alpha(self, params):
        return jax.nn.softplus(params["alpha_kernel"])

    def make_mix(self, params):
        return jax.nn.softmax(params["mix_kernel"], axis=-1)

    def log_pdf(self, params, p):
        return dirichlet_log_pdf(p, self.make_alpha(params), self.make_mix(params))

    def component_distributions(self, params):
        alpha = self.make_alpha(params)
        return alpha / jnp.sum(alpha, axis=-1, keepdims=True)

    def expectation(self, params):
        return jnp.sum(
            self.component_distributions(params)
            * self.make_mix(params)[..., None],
            axis=0,
        )

    def loss(self, params, p, training: bool = True):
        """Negative (regularized) mean log-likelihood for prior training
        (``DirichletMixture.py:97-115``)."""
        alpha = self.make_alpha(params)
        mix = self.make_mix(params)
        loglik = jnp.mean(dirichlet_log_pdf(p, alpha, mix))
        if not (training and self.use_dirichlet_process):
            return -loglik
        sum_alpha = jnp.sum(alpha, axis=-1, keepdims=True)
        lamb = jax.nn.softplus(params["lambda_kernel"])
        sum_alpha_prior = jnp.sum(jnp.log(lamb) - lamb * sum_alpha)
        gamma = jax.nn.softplus(params["gamma_kernel"])
        mix_dist = jnp.ones_like(mix) * gamma / self.num_components
        mix_prior = dirichlet_log_pdf(mix[None], mix_dist[None], jnp.ones(1))[0]
        beta = jax.nn.softplus(params["beta_kernel"])
        background = jax.nn.softmax(params["background_kernel"], axis=-1)
        comp_dist = background * beta
        comp_prior = jnp.sum(
            dirichlet_log_pdf(alpha / sum_alpha, comp_dist[None], jnp.ones(1))
        )
        joint = loglik + (
            sum_alpha_prior + mix_prior + comp_prior
        ) / self.number_of_examples
        return -joint


def save_mixture_model(path, params):
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_mixture_model(path, num_components, alphabet_size, trainable=False):
    """Load a trained Dirichlet mixture; returns (model, params)."""
    data = np.load(path)
    model = DirichletMixture(num_components, alphabet_size, trainable=trainable)
    params = {k: jnp.asarray(v) for k, v in data.items()}
    return model, params

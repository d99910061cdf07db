"""The code examples in docs/MIGRATION.md must actually run.

Each test mirrors one of the guide's snippets (shrunk shapes); if an API
in the guide drifts, the corresponding test breaks with the guide's text.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hmm_layer_tpu import HMMLayer, Trainer
from hmm_layer_tpu.models import (
    GenePredEmissions,
    GenePredTransitions,
    ProfileEmissions,
    ProfileTransitions,
)

START = [("ATG", 1.0)]
STOP = [("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)]
INTRON_BEGIN = [("NGT", 0.99), ("NGC", 0.005), ("NAT", 0.005)]
INTRON_END = [("AGN", 0.99), ("ACN", 0.01)]


def _gene_pred_inputs(key, b=2, L=60):
    k1, k2 = jax.random.split(key)
    probs = jax.random.dirichlet(k1, jnp.ones(15), shape=(1, b, L))
    nts = jax.nn.one_hot(
        jax.random.randint(k2, (1, b, L), 0, 4), 5, dtype=probs.dtype
    )
    return jnp.concatenate([probs, nts], axis=-1)


class TestGenePredSnippet:
    def test_flagship_calls(self):
        layer = HMMLayer(
            transitions=GenePredTransitions(),
            emissions=GenePredEmissions(START, STOP, INTRON_BEGIN, INTRON_END),
            parallel_factor="auto",
        )
        params = layer.init_params(jax.random.key(0), input_dim=15)
        inputs = _gene_pred_inputs(jax.random.key(1))

        post = layer.state_posterior_log_probs(params, inputs)
        assert post.shape == (1, 2, 60, 15)
        post_unnorm = layer.state_posterior_log_probs(
            params, inputs, no_loglik=True
        )
        assert post_unnorm.shape == post.shape
        ll = layer.log_likelihood(params, inputs)
        assert ll.shape == (1, 2)
        la, ll2 = layer.forward_recursion(params, inputs)
        assert la.shape == post.shape
        lb = layer.backward_recursion(params, inputs)
        assert lb.shape == post.shape

        paths = layer.viterbi(params, inputs)
        assert paths.shape == (1, 2, 60) and paths.dtype == jnp.int32
        samples = layer.sample_paths(params, inputs, jax.random.key(2))
        assert samples.shape == (1, 2, 1, 60)  # (m, b, num_samples, L)

        loss, grads = jax.value_and_grad(layer.loss)(params, inputs)
        assert np.isfinite(float(loss))


class TestTrainerSnippet:
    def test_fit_runs(self):
        layer = HMMLayer(
            transitions=GenePredTransitions(),
            emissions=GenePredEmissions(START, STOP, INTRON_BEGIN, INTRON_END),
            num_seqs=8,
        )
        trainer = Trainer(layer, optimizer=optax.adam(0.05))
        params, opt_state = trainer.init(jax.random.key(0), input_dim=15)
        batches = [_gene_pred_inputs(jax.random.key(i)) for i in range(2)]
        params, opt_state, loss = trainer.fit(
            params, opt_state, batches, steps=2
        )
        assert np.isfinite(float(loss))


class TestProfileSnippet:
    def test_two_model_layer(self):
        lengths = [4, 6]
        layer = HMMLayer(
            ProfileTransitions(lengths), ProfileEmissions(lengths)
        )
        params = layer.init_params(jax.random.key(0), input_dim=25)
        x = jax.random.dirichlet(
            jax.random.key(1), jnp.ones(25), shape=(2, 3, 12)
        )
        ll = layer.log_likelihood(params, x)
        assert ll.shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(ll)))

"""Supervised gene-prediction training: labels -> posterior-CE objective.

The Tiberius workflow the reference's gene-pred family plugs into trains
the HMM head against reference annotations with a cross-entropy on the
posterior state marginals (the reference exposes ``no_loglik`` for exactly
this and leaves the loss to the caller). Here the whole loop ships:
``genes_to_states`` renders GFF3-style annotations into state tracks,
``HMMLayer.posterior_cross_entropy`` is the objective, and ``Trainer``
drives it via ``loss_fn``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import (
    GenePredEmissions,
    GenePredTransitions,
    genes_to_states,
    paths_to_genes,
)
from hmm_layer_tpu.models.initializers import make_15_class_emission_kernel
from hmm_layer_tpu.training import Trainer

Ir, I0, I1, I2, E0, E1, E2 = range(7)
ST, EI0, EI1, EI2, IE0, IE1, IE2, SP = range(7, 15)

# Grammar-valid planted structure: one gene with a 4-base intron.
TRUE_PATH = np.array(
    [Ir, Ir, ST, E1, E2, E0, E1, EI1, I1, I1, I1, I1, IE1, E1, SP, Ir]
)


def _planted_batch(key, b=4, noise=0.35):
    """(1, b, L, 20) inputs + (1, b, L) labels around TRUE_PATH."""
    L = len(TRUE_PATH)
    rng = np.random.default_rng(int(key))
    nt = "ACGT"
    bases = [nt[i] for i in rng.integers(0, 4, size=L)]
    bases[2:5] = "ATG"
    bases[8:10] = "GT"
    bases[10:12] = "AG"
    bases[12:15] = "TAA"
    onehot = np.zeros((L, 5), np.float32)
    for t, ch in enumerate(bases):
        onehot[t, nt.index(ch)] = 1.0
    cls = np.full((b, L, 15), noise / 15.0, np.float32)
    cls[:, np.arange(L), TRUE_PATH] += 1.0 - noise
    cls += rng.uniform(0, noise, size=cls.shape).astype(np.float32)
    cls /= cls.sum(-1, keepdims=True)
    x = np.concatenate([cls, np.broadcast_to(onehot, (b, L, 5))], -1)
    labels = np.broadcast_to(TRUE_PATH, (b, L)).copy()
    return jnp.asarray(x[None]), jnp.asarray(labels[None])


def _layer():
    return HMMLayer(
        GenePredTransitions(),
        GenePredEmissions(
            start_codons=[("ATG", 1.0)],
            stop_codons=[("TAA", 1.0)],
            intron_begin_pattern=[("NGT", 1.0)],
            intron_end_pattern=[("AGN", 1.0)],
            init=make_15_class_emission_kernel(),
        ),
    )


class TestPosteriorCrossEntropy:
    def test_finite_and_differentiable(self):
        layer = _layer()
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        x, labels = _planted_batch(0)
        loss, grads = jax.value_and_grad(
            lambda p: layer.posterior_cross_entropy(p, x, labels)
        )(params)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_labels_broadcast_over_models(self):
        layer = _layer()
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        x, labels = _planted_batch(0)
        a = layer.posterior_cross_entropy(params, x, labels)  # (m, b, L)
        b = layer.posterior_cross_entropy(params, x, labels[0])  # (b, L)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_label_mask(self):
        layer = _layer()
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        x, labels = _planted_batch(0)
        full = layer.posterior_cross_entropy(params, x, labels)
        ones = jnp.ones(labels.shape, jnp.float32)
        masked_all = layer.posterior_cross_entropy(
            params, x, labels, label_mask=ones
        )
        np.testing.assert_allclose(float(full), float(masked_all), rtol=1e-6)
        # Masking out everything but intergenic positions changes the loss.
        mask = (labels == 0).astype(jnp.float32)
        part = layer.posterior_cross_entropy(
            params, x, labels, label_mask=mask
        )
        assert abs(float(part) - float(full)) > 1e-4

    def test_matches_manual_gather(self):
        layer = _layer()
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        x, labels = _planted_batch(0)
        lg = layer.state_posterior_log_probs(params, x, training=True)
        manual = -np.mean(
            np.take_along_axis(
                np.asarray(lg), np.asarray(labels)[..., None], axis=-1
            )
        )
        manual += -float(np.mean(np.asarray(layer.compute_prior(params))))
        manual += float(np.asarray(layer.aux_loss(params)))
        got = float(layer.posterior_cross_entropy(params, x, labels))
        np.testing.assert_allclose(got, manual, rtol=1e-5)

    def test_labels_from_annotation_pipeline(self):
        """GFF3-style GeneFeatures -> genes_to_states -> CE labels."""
        genes = paths_to_genes(TRUE_PATH, num_states=15)
        track = genes_to_states(genes, len(TRUE_PATH), num_states=15)
        np.testing.assert_array_equal(track, TRUE_PATH)
        layer = _layer()
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        x, _ = _planted_batch(0)
        loss = layer.posterior_cross_entropy(
            params, x, jnp.broadcast_to(jnp.asarray(track), x.shape[1:3])
        )
        assert np.isfinite(float(loss))


class TestSupervisedTrainer:
    def test_ce_training_decreases_loss(self):
        layer = _layer()
        trainer = Trainer(
            layer,
            optimizer=optax.adam(0.05),
            loss_fn=lambda p, batch, indices: layer.posterior_cross_entropy(
                p, batch["x"], batch["labels"]
            ),
        )
        params, opt_state = trainer.init(jax.random.PRNGKey(1), input_dim=15)
        x, labels = _planted_batch(1)
        batch = {"x": x, "labels": labels}

        first = float(
            layer.posterior_cross_entropy(params, x, labels)
        )
        params, opt_state, loss = trainer.fit(
            params, opt_state, batches=(batch for _ in range(15))
        )
        last = float(layer.posterior_cross_entropy(params, x, labels))
        assert last < first, (first, last)

    def test_trained_model_decodes_planted_gene(self):
        layer = _layer()
        trainer = Trainer(
            layer,
            optimizer=optax.adam(0.05),
            loss_fn=lambda p, batch, indices: layer.posterior_cross_entropy(
                p, batch["x"], batch["labels"]
            ),
        )
        params, opt_state = trainer.init(jax.random.PRNGKey(2), input_dim=15)
        x, labels = _planted_batch(2)
        batch = {"x": x, "labels": labels}
        params, _, _ = trainer.fit(
            params, opt_state, batches=(batch for _ in range(10))
        )
        decoded = np.asarray(layer.viterbi(params, x))[0, 0]
        np.testing.assert_array_equal(decoded, TRUE_PATH)

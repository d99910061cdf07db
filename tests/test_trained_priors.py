"""Trained Dirichlet priors: the full train -> save -> load -> MAP loop
(VERDICT round-2 item 6; reference design: ``Priors.py:48-66`` +
``DirichletMixture.py:128-133``, whose weight files the reference repo
does not ship)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.models import (
    AminoAcidPrior,
    DirichletMixture,
    ProfileEmissions,
    ProfileHMMTransitionPrior,
    ProfileTransitions,
)
from hmm_layer_tpu.models.dirichlet import save_mixture_model
from hmm_layer_tpu.models.priors import FixedDirichlet, load_trained_prior

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

KEY = jax.random.PRNGKey(0)


class TestShippedArtifacts:
    """The package ships trained mixtures and uses them by default."""

    def test_artifacts_exist_and_load(self):
        amino = load_trained_prior("amino_prior_9")
        assert amino.alpha.shape == (9, 20)
        for name, dim in [
            ("match_prior_1", 3),
            ("insert_prior_1", 2),
            ("delete_prior_1", 2),
        ]:
            fd = load_trained_prior(name)
            assert fd.alpha.shape == (1, dim)
            assert np.all(fd.alpha > 0)

    def test_default_priors_use_trained_artifacts(self):
        ap = AminoAcidPrior()
        assert ap.dirichlet.alpha.shape == (9, 20)
        tp = ProfileHMMTransitionPrior()
        assert tp.match_dirichlet.alpha.shape == (1, 3)
        assert tp.insert_dirichlet.alpha.shape == (1, 2)
        assert tp.delete_dirichlet.alpha.shape == (1, 2)

    def test_trained_amino_prior_is_informative(self):
        """The trained mixture must prefer plausible columns (a conserved
        residue / background-shaped) over adversarial ones — i.e. it
        actually learned the synthetic column statistics."""
        amino = load_trained_prior("amino_prior_9")
        conserved = np.full(20, 0.01)
        conserved[5] = 1 - 0.19
        uniform = np.full(20, 0.05)
        lp = np.asarray(
            amino.log_pdf(jnp.asarray([conserved, uniform], jnp.float32))
        )
        assert np.all(np.isfinite(lp))
        # trained on 60% conserved columns: conserved must not be dispreferred
        # by orders of magnitude (uniform columns virtually never occur)
        assert lp[0] > lp[1] - 5.0

    def test_map_objective_with_trained_priors(self):
        """Default-constructed profile layer (trained priors active) gives a
        finite MAP objective and finite gradients."""
        from hmm_layer_tpu.layer import HMMLayer

        trans = ProfileTransitions([4])
        em = ProfileEmissions([4])
        layer = HMMLayer(trans, em, use_prior=True, num_seqs=10)
        params = layer.init_params(KEY, input_dim=26)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.dirichlet(np.ones(26), (1, 3, 9)).astype(np.float32))
        loss, grads = jax.value_and_grad(layer.loss)(params, x)
        assert np.isfinite(float(loss))
        assert all(
            np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads)
        )


class TestTrainSaveLoadLoop:
    """The workflow itself, end to end on a tiny budget."""

    def test_train_save_load_plug(self, tmp_path):
        from train_dirichlet_priors import sample_transition_triples, train_mixture

        rng = np.random.default_rng(1)
        data = sample_transition_triples(rng, 400, "match")
        model, params = train_mixture(
            KEY, data, num_components=1, steps=150, log=lambda *_: None
        )
        # training must beat the uninitialized mixture by a clear margin
        loss0 = float(model.loss(model.init_params(KEY), jnp.asarray(data), training=False))
        loss1 = float(model.loss(params, jnp.asarray(data), training=False))
        assert loss1 < loss0 - 0.5

        path = tmp_path / "match_test.npz"
        save_mixture_model(path, params)
        fd = FixedDirichlet.from_params(model, params)
        data2 = np.load(path)
        alpha2 = np.asarray(model.make_alpha({k: jnp.asarray(v) for k, v in data2.items()}))
        np.testing.assert_allclose(np.asarray(fd.alpha), alpha2, rtol=1e-6)

        # plug into the transition prior and evaluate through a layer
        prior = ProfileHMMTransitionPrior(match_dirichlet=fd)
        trans = ProfileTransitions([4], prior=prior)
        params_t = trans.init_params(KEY)
        val = np.asarray(trans.prior_log_density(params_t))
        assert np.all(np.isfinite(val))

    def test_quick_cli_writes_artifacts(self, tmp_path):
        import train_dirichlet_priors as tdp

        tdp.main(["--quick", "--out", str(tmp_path)])
        for name in (
            "amino_prior_9",
            "match_prior_1",
            "insert_prior_1",
            "delete_prior_1",
        ):
            assert (tmp_path / f"{name}.npz").exists()

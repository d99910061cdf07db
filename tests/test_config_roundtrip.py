"""Profile-family config round-trip (VERDICT round-2 item 7).

Every component must reconstruct from its JSON-able config alone
(reference: ``Emitter.py:199-224``): config -> component -> identical
params (same PRNG key) and identical matrices.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.models import (
    AminoAcidPrior,
    FixedDirichlet,
    ProfileEmissions,
    ProfileHMMTransitionPrior,
    ProfileTransitions,
)
from hmm_layer_tpu.models import initializers as inits

KEY = jax.random.PRNGKey(7)


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestInitializerSpecs:
    @pytest.mark.parametrize(
        "factory,args",
        [
            (inits.constant_init, (0.5,)),
            (inits.tiled_dist_init, ([0.25, 0.25, 0.5],)),
            (inits.random_normal_init, (0.3, 0.2)),
            (inits.entry_init, ()),
            (inits.exit_init, ()),
            (inits.match_transition_init, ([1.0, -1.0, -1.0], 1, 0.2)),
        ],
    )
    def test_roundtrip_identical_values(self, factory, args):
        fn = factory(*args)
        spec = inits.init_to_config(fn)
        json.dumps(spec)  # must be JSON-able
        fn2 = inits.init_from_config(spec)
        shape = (4, 3) if factory is not inits.tiled_dist_init else (4, 3)
        if factory is inits.tiled_dist_init:
            shape = (4, 3)
        np.testing.assert_array_equal(
            np.asarray(fn(KEY, shape)), np.asarray(fn2(KEY, shape))
        )
        # re-serializable
        assert inits.init_to_config(fn2) == spec

    def test_unregistered_raises(self):
        with pytest.raises(ValueError, match="no serialization spec"):
            inits.init_to_config(lambda key, shape: jnp.zeros(shape))

    def test_unknown_kind_raises(self):
        with pytest.raises(ValueError, match="unknown initializer kind"):
            inits.init_from_config({"kind": "bogus"})


class TestPriorConfigs:
    def test_fixed_dirichlet(self):
        fd = FixedDirichlet([[3.0, 1.0], [1.0, 5.0]], mix=[0.7, 0.3])
        fd2 = FixedDirichlet.from_config(
            json.loads(json.dumps(fd.get_config()))
        )
        p = jnp.asarray([[0.4, 0.6]])
        np.testing.assert_allclose(
            np.asarray(fd.log_pdf(p)), np.asarray(fd2.log_pdf(p)), rtol=1e-6
        )

    def test_transition_prior(self):
        prior = ProfileHMMTransitionPrior(
            match_dirichlet=FixedDirichlet([5.0, 1.0, 1.0]), alpha_flank=123.0
        )
        config = json.loads(json.dumps(prior.get_config()))
        prior2 = ProfileHMMTransitionPrior.from_config(config)
        assert prior2.alpha_flank == 123.0
        np.testing.assert_array_equal(
            prior2.match_dirichlet.alpha, prior.match_dirichlet.alpha
        )

    def test_amino_acid_prior(self):
        prior = AminoAcidPrior(dirichlet=FixedDirichlet(np.full(20, 2.5)))
        prior2 = AminoAcidPrior.from_config(
            json.loads(json.dumps(prior.get_config()))
        )
        B = jax.random.uniform(KEY, (1, 13, 26), minval=0.1)
        np.testing.assert_allclose(
            np.asarray(prior(B, [5])), np.asarray(prior2(B, [5])), rtol=1e-6
        )


class TestProfileTransitionsRoundtrip:
    def test_identical_params_and_matrices(self):
        trans = ProfileTransitions(
            [4, 6],
            frozen_kernels={"insert_to_insert": True},
        )
        config = json.loads(json.dumps(trans.get_config()))
        trans2 = ProfileTransitions.from_config(config)
        params = trans.init_params(KEY)
        params2 = trans2.init_params(KEY)
        _tree_equal(params, params2)
        init, A = trans.matrices(params)
        init2, A2 = trans2.matrices(params2)
        np.testing.assert_array_equal(np.asarray(A), np.asarray(A2))
        np.testing.assert_array_equal(np.asarray(init), np.asarray(init2))
        # prior values reconstruct too
        np.testing.assert_allclose(
            np.asarray(trans.prior_log_density(params)),
            np.asarray(trans2.prior_log_density(params2)),
            rtol=1e-6,
        )
        assert trans2.frozen_kernels == {"insert_to_insert": True}

    def test_custom_nondefault_init(self):
        custom = inits.make_default_transition_init(MM=2.0, scale=0.05)
        trans = ProfileTransitions(5, transition_init=custom)
        trans2 = ProfileTransitions.from_config(
            json.loads(json.dumps(trans.get_config()))
        )
        _tree_equal(trans.init_params(KEY), trans2.init_params(KEY))


class TestProfileEmissionsRoundtrip:
    def test_identical_params_and_B(self):
        em = ProfileEmissions(
            [4, 6],
            emission_init=inits.random_normal_init(0.0, 0.3),
            insertion_init=inits.constant_init(0.1),
            frozen_insertions=False,
        )
        config = json.loads(json.dumps(em.get_config()))
        em2 = ProfileEmissions.from_config(config)
        params = em.init_params(KEY, input_dim=26)
        params2 = em2.init_params(KEY, input_dim=26)
        _tree_equal(params, params2)
        np.testing.assert_array_equal(
            np.asarray(em.make_B(params)), np.asarray(em2.make_B(params2))
        )
        assert em2.frozen_insertions is False

    def test_default_none_inits(self):
        em = ProfileEmissions(5)
        em2 = ProfileEmissions.from_config(
            json.loads(json.dumps(em.get_config()))
        )
        _tree_equal(em.init_params(KEY, 26), em2.init_params(KEY, 26))

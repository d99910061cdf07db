"""Posterior-occupancy length adaptation (the learnMSA loop).

The reference only re-targets lengths (``set_lengths``,
``/root/reference/hmm_layer/Transitioner.py:39-61``) and leaves the
proposal heuristic to the wrapping learnMSA project; here
``models/profile_adapt.py`` computes discard/expand proposals from
posterior state marginals and applies the param-preserving
:meth:`HMMLayer.resize`. These tests pin:

* ``match_statistics`` against a hand-built posterior (known layout);
* ``propose_keep`` behavior: identity, discard, expansion, degenerate
  floor;
* ``adapt_profile_layer`` end-to-end: a planted profile with one junk
  column is shrunk to the informative columns and the adapted model
  trains on (``Trainer.init_from_params``);
* ``HMMLayer.resize`` carries layer settings and composes with training.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import (
    ProfileEmissions,
    ProfileTransitions,
    adapt_profile_layer,
    match_statistics,
    propose_keep,
)
from hmm_layer_tpu.training import Trainer

KEY = jax.random.PRNGKey(0)


class TestMatchStatistics:
    def test_hand_built_posterior(self):
        # Lm=3 -> states: LF=0, M1..3=1..3, I1..2=4..5, UNA=6, RF=7, T=8.
        Lm, q, b, L = 3, 9, 2, 4
        gamma = np.zeros((b, L, q))
        # seq 0: M1 M2 M3 RF ; seq 1: M1 I1 I1 M2 (never M3).
        gamma[0, 0, 1] = gamma[0, 1, 2] = gamma[0, 2, 3] = gamma[0, 3, 7] = 1.0
        gamma[1, 0, 1] = gamma[1, 1, 4] = gamma[1, 2, 4] = gamma[1, 3, 2] = 1.0
        occ, load = match_statistics(np.log(gamma + 1e-30), Lm)
        np.testing.assert_allclose(occ, [1.0, 1.0, 0.5], atol=1e-12)
        # I1 absorbed 2 residues in seq 1, 0 in seq 0 -> mean 1.0.
        np.testing.assert_allclose(load, [0.0, 1.0, 0.0, 0.5], atol=1e-12)

    def test_seq_mask(self):
        Lm, q = 2, 7
        gamma = np.zeros((1, 3, q))
        gamma[0, :, 1] = 1.0  # M1 at every position
        mask = np.asarray([[1.0, 1.0, 0.0]])
        occ, _ = match_statistics(np.log(gamma + 1e-30), Lm, seq_mask=mask)
        # usage = 2 (masked), capped at 1.
        np.testing.assert_allclose(occ, [1.0, 0.0], atol=1e-12)


class TestProposeKeep:
    def test_identity(self):
        keep, n = propose_keep(np.ones(5), np.zeros(6))
        np.testing.assert_array_equal(keep, np.arange(5))
        assert n == 5

    def test_discard_low_occupancy(self):
        occ = np.asarray([0.9, 0.1, 0.9, 0.9])
        keep, n = propose_keep(occ, np.zeros(5), min_occupancy=0.3)
        np.testing.assert_array_equal(keep, [0, 2, 3])
        assert n == 3

    def test_expand_overloaded_insert(self):
        # Interior site between columns 1 and 2 absorbs ~2 residues/seq.
        occ = np.ones(4)
        load = np.asarray([0.0, 0.0, 2.2, 0.0, 0.0])
        keep, n = propose_keep(occ, load, expand_threshold=1.0)
        np.testing.assert_array_equal(keep, [0, 1, -1, -1, 2, 3])
        assert n == 6

    def test_expand_first_interior_site(self):
        # Regression (round-4 review): the site between match columns 0
        # and 1 (insert_load[1]) must be expandable too.
        occ = np.ones(4)
        load = np.asarray([0.0, 3.0, 0.0, 0.0, 0.0])
        keep, n = propose_keep(occ, load, expand_threshold=1.0)
        np.testing.assert_array_equal(keep, [0, -1, -1, -1, 1, 2, 3])
        assert n == 7

    def test_expansion_cap(self):
        occ = np.ones(4)
        load = np.asarray([0.0, 0.0, 9.0, 0.0, 0.0])
        keep, _ = propose_keep(occ, load, max_new_per_site=3)
        assert int(np.sum(keep == -1)) == 3

    def test_light_flank_loads_do_not_expand(self):
        occ = np.ones(3)
        # Short unaligned tails (below flank_threshold) are what the
        # flank states are FOR — no expansion.
        load = np.asarray([1.5, 0.0, 0.0, 1.5])
        keep, n = propose_keep(occ, load)
        np.testing.assert_array_equal(keep, [0, 1, 2])
        assert n == 3

    def test_heavy_flank_loads_grow_capped_end_columns(self):
        occ = np.ones(3)
        # A too-short model parks the rest of the motif in a flank
        # (measured: 12.7 residues/seq, BASELINE.md round 4): grow capped
        # fresh columns at that end.
        load = np.asarray([12.7, 0.0, 0.0, 0.0])
        keep, n = propose_keep(occ, load)
        np.testing.assert_array_equal(keep, [-1, -1, -1, -1, 0, 1, 2])
        assert n == 7
        keep, n = propose_keep(occ, np.asarray([0.0, 0.0, 0.0, 2.4]))
        np.testing.assert_array_equal(keep, [0, 1, 2, -1, -1])
        assert n == 5

    def test_degenerate_floor(self):
        occ = np.asarray([0.01, 0.2, 0.05, 0.1])
        keep, n = propose_keep(occ, np.zeros(5), min_occupancy=0.5,
                               min_length=2)
        # Keeps the 2 most-used columns, in order.
        np.testing.assert_array_equal(keep, [1, 3])
        assert n == 2


def _planted_layer(lengths, s=5):
    trans = ProfileTransitions(lengths)
    emit = ProfileEmissions(lengths)
    layer = HMMLayer(trans, emit, use_prior=False)
    params = layer.init_params(KEY, input_dim=s + 1)
    return layer, params


def _motif_inputs(motif, b=12, s=5, seed=0):
    """Sequences that all spell ``motif`` exactly (one-hot, + terminal)."""
    L = len(motif) + 1
    x = np.zeros((1, b, L, s + 1), np.float32)
    for j, c in enumerate(motif):
        x[0, :, j, c] = 1.0
    x[0, :, -1, -1] = 1.0
    return jnp.asarray(x)


class TestAdaptProfileLayer:
    def test_identity_adaptation_returns_inputs(self):
        layer, params = _planted_layer([3])
        # Sharpen the model on a 3-residue motif so every column is used.
        x = _motif_inputs([0, 1, 2])
        trainer = Trainer(layer, optimizer=optax.adam(0.2))
        opt_state = trainer.init_from_params(params)
        params, opt_state, _ = trainer.fit(
            params, opt_state, batches=(x for _ in range(60))
        )
        new_layer, new_params, info = adapt_profile_layer(
            layer, params, x, jax.random.PRNGKey(1)
        )
        assert new_layer is layer and new_params is params
        assert [d["new_length"] for d in info] == [3]

    def test_shrinks_unused_columns_and_trains_on(self):
        # 5-column model trained on a 3-residue motif: posterior mass
        # concentrates on 3 columns; adaptation should shrink and the
        # adapted model must keep training (init_from_params rebuild).
        layer, params = _planted_layer([5])
        x = _motif_inputs([0, 1, 2])
        trainer = Trainer(layer, optimizer=optax.adam(0.2))
        opt_state = trainer.init_from_params(params)
        params, opt_state, _ = trainer.fit(
            params, opt_state, batches=(x for _ in range(120))
        )
        new_layer, new_params, info = adapt_profile_layer(
            layer, params, x, jax.random.PRNGKey(1)
        )
        new_len = info[0]["new_length"]
        assert new_len < 5
        ll_before = float(
            np.mean(np.asarray(new_layer.log_likelihood(new_params, x)))
        )
        trainer2 = Trainer(new_layer, optimizer=optax.adam(0.1))
        opt2 = trainer2.init_from_params(new_params)
        new_params, opt2, _ = trainer2.fit(
            new_params, opt2, batches=(x for _ in range(40))
        )
        ll_after = float(
            np.mean(np.asarray(new_layer.log_likelihood(new_params, x)))
        )
        assert np.isfinite(ll_after) and ll_after >= ll_before - 1e-3

    def test_grows_toward_longer_motif(self):
        # Too-short model on a longer motif: the overflow parks in a
        # flank; adaptation must GROW the model (BASELINE.md round 4:
        # 12->16->20->24 recovers a planted Lm=24 exactly).
        layer, params = _planted_layer([3])
        x = _motif_inputs([0, 1, 2, 3, 4, 0, 1, 2])  # 8-residue motif
        trainer = Trainer(layer, optimizer=optax.adam(0.2))
        opt_state = trainer.init_from_params(params)
        params, opt_state, _ = trainer.fit(
            params, opt_state, batches=(x for _ in range(120))
        )
        new_layer, new_params, info = adapt_profile_layer(
            layer, params, x, jax.random.PRNGKey(1)
        )
        assert info[0]["new_length"] > 3
        ll = new_layer.log_likelihood(new_params, x)
        assert np.all(np.isfinite(np.asarray(ll)))

    def test_multi_model_independent_proposals(self):
        layer, params = _planted_layer([3, 5])
        x = jnp.broadcast_to(
            _motif_inputs([0, 1, 2]), (2,) + _motif_inputs([0, 1, 2]).shape[1:]
        )
        new_layer, new_params, info = adapt_profile_layer(
            layer, params, x, jax.random.PRNGKey(1), min_occupancy=0.0
        )
        # min_occupancy=0 -> nothing discarded; lengths can only grow.
        assert [d["old_length"] for d in info] == [3, 5]
        assert all(d["new_length"] >= d["old_length"] for d in info)
        ll = new_layer.log_likelihood(new_params, x)
        assert np.all(np.isfinite(np.asarray(ll)))


class TestLayerResize:
    def test_settings_carry_over(self):
        trans = ProfileTransitions([4])
        emit = ProfileEmissions([4])
        layer = HMMLayer(
            trans, emit, num_seqs=77, use_prior=True, parallel_factor=1
        )
        params = layer.init_params(KEY, input_dim=26)
        new_layer, new_params = layer.resize(
            params, [6], jax.random.PRNGKey(2)
        )
        assert new_layer.num_seqs == 77 and new_layer.use_prior
        assert new_layer.transitions.lengths == [6]
        assert new_layer.emissions[0].lengths == [6]
        # Old params untouched; new params have the new shapes.
        assert params["transitions"]["kernels"][0][
            "begin_to_match"
        ].shape == (4,)
        assert new_params["transitions"]["kernels"][0][
            "begin_to_match"
        ].shape == (6,)

    def test_resize_then_loss_grad(self):
        layer, params = _planted_layer([4])
        new_layer, new_params = layer.resize(
            params, [6], jax.random.PRNGKey(2)
        )
        x = _motif_inputs([0, 1, 2, 3])
        loss, grads = jax.value_and_grad(new_layer.loss)(new_params, x)
        assert np.isfinite(float(loss))
        assert all(
            np.all(np.isfinite(np.asarray(g)))
            for g in jax.tree.leaves(grads)
        )

"""Param-preserving profile resize (learnMSA length adaptation).

The reference's ``set_lengths`` re-targets a transitioner/emitter to new
model lengths but rebuilds all kernels from initializers
(``/root/reference/hmm_layer/Transitioner.py:39-61``, ``Emitter.py:36-50``);
``ProfileTransitions.resize`` / ``ProfileEmissions.resize`` instead carry
the trained logits of every surviving column/edge over, so iterative
length adaptation works on a trained model. These tests pin:

* identity resize == bitwise no-op (loglik unchanged);
* grow/shrink at the end and surgical middle insertion via ``keep`` maps;
* unchanged transition/emission *probabilities* for rows untouched by the
  resize (the "preserved columns contribute the same loglik" guarantee);
* config round-trip of the resized models.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import ProfileEmissions, ProfileTransitions

KEY = jax.random.PRNGKey(0)
RKEY = jax.random.PRNGKey(7)


def _model(lengths):
    trans = ProfileTransitions(lengths)
    emit = ProfileEmissions(lengths)
    tparams = trans.init_params(KEY)
    eparams = emit.init_params(KEY, input_dim=25)
    return trans, emit, tparams, eparams


def _inputs(b=3, L=12, s=25, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.dirichlet(np.ones(s - 1), size=(1, b, L)).astype(np.float32)
    x = np.concatenate([x, np.zeros((1, b, L, 1), np.float32)], axis=-1)
    x[:, :, -1] = 0.0
    x[:, :, -1, -1] = 1.0  # terminal at the last position
    return jnp.asarray(x)


class TestIdentityResize:
    def test_bitwise_noop(self):
        trans, emit, tparams, eparams = _model([5])
        trans2, tparams2 = trans.resize(tparams, [5], RKEY)
        emit2, eparams2 = emit.resize(eparams, [5], RKEY)
        for name, v in tparams["kernels"][0].items():
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(tparams2["kernels"][0][name])
            )
        np.testing.assert_array_equal(
            np.asarray(eparams["emission_kernel"][0]),
            np.asarray(eparams2["emission_kernel"][0]),
        )
        np.testing.assert_array_equal(
            np.asarray(eparams["insertion_kernel"][0]),
            np.asarray(eparams2["insertion_kernel"][0]),
        )

    def test_loglik_unchanged(self):
        trans, emit, tparams, eparams = _model([5])
        layer = HMMLayer(trans, emit, use_prior=False)
        params = {"transitions": tparams, "emissions": [eparams]}
        x = _inputs()
        ll = np.asarray(layer.log_likelihood(params, x))

        trans2, tparams2 = trans.resize(tparams, [5], RKEY)
        emit2, eparams2 = emit.resize(eparams, [5], RKEY)
        layer2 = HMMLayer(trans2, emit2, use_prior=False)
        ll2 = np.asarray(
            layer2.log_likelihood(
                {"transitions": tparams2, "emissions": [eparams2]}, x
            )
        )
        np.testing.assert_array_equal(ll, ll2)


class TestGrowShrink:
    def test_grow_preserves_kernels_and_probs(self):
        L, L2 = 6, 9
        trans, emit, tparams, eparams = _model([L])
        trans2, tparams2 = trans.resize(tparams, [L2], RKEY)
        emit2, eparams2 = emit.resize(eparams, [L2], RKEY)
        old_k, new_k = tparams["kernels"][0], tparams2["kernels"][0]
        # Column-keyed parts: full old vectors survive as the prefix.
        for name in ("begin_to_match", "match_to_end"):
            np.testing.assert_array_equal(
                np.asarray(old_k[name]), np.asarray(new_k[name])[:L]
            )
        # Pair-keyed parts: all old consecutive pairs survive.
        for name in (
            "match_to_match",
            "match_to_insert",
            "insert_to_match",
            "insert_to_insert",
            "delete_to_delete",
        ):
            np.testing.assert_array_equal(
                np.asarray(old_k[name]), np.asarray(new_k[name])[: L - 1]
            )
        np.testing.assert_array_equal(
            np.asarray(old_k["match_to_delete"]),
            np.asarray(new_k["match_to_delete"])[:L],
        )
        # delete_to_match: interior edges survive; the old D_L -> END edge
        # has no counterpart in the grown model (D_L -> M_{L+1} is new).
        np.testing.assert_array_equal(
            np.asarray(old_k["delete_to_match"])[: L - 1],
            np.asarray(new_k["delete_to_match"])[: L - 1],
        )
        # Emission rows of preserved columns are bitwise identical.
        np.testing.assert_array_equal(
            np.asarray(eparams["emission_kernel"][0]),
            np.asarray(eparams2["emission_kernel"][0])[:L],
        )
        # Transition probabilities of rows not touching new columns are
        # unchanged (row softmax sees the same edge set).
        old_p = trans.make_probs(tparams)[0]
        new_p = trans2.make_probs(tparams2)[0]
        np.testing.assert_allclose(
            np.asarray(old_p["match_to_match"])[: L - 2],
            np.asarray(new_p["match_to_match"])[: L - 2],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(old_p["insert_to_insert"])[: L - 1],
            np.asarray(new_p["insert_to_insert"])[: L - 1],
            rtol=1e-6,
        )
        # Emission matrix rows of preserved match columns are identical
        # (per-row softmax; match state j+1 is B row 1+j).
        B_old = np.asarray(emit.make_B(eparams))[0]
        B_new = np.asarray(emit2.make_B(eparams2))[0]
        np.testing.assert_allclose(
            B_old[1 : 1 + L], B_new[1 : 1 + L], rtol=1e-6
        )

    def test_shrink_preserves_prefix(self):
        L, L2 = 8, 5
        trans, emit, tparams, eparams = _model([L])
        trans2, tparams2 = trans.resize(tparams, [L2], RKEY)
        emit2, eparams2 = emit.resize(eparams, [L2], RKEY)
        old_k, new_k = tparams["kernels"][0], tparams2["kernels"][0]
        np.testing.assert_array_equal(
            np.asarray(old_k["begin_to_match"])[:L2],
            np.asarray(new_k["begin_to_match"]),
        )
        np.testing.assert_array_equal(
            np.asarray(old_k["match_to_match"])[: L2 - 1],
            np.asarray(new_k["match_to_match"]),
        )
        np.testing.assert_array_equal(
            np.asarray(eparams["emission_kernel"][0])[:L2],
            np.asarray(eparams2["emission_kernel"][0]),
        )
        # The shrunk model is a working model.
        layer2 = HMMLayer(trans2, emit2, use_prior=False)
        ll = layer2.log_likelihood(
            {"transitions": tparams2, "emissions": [eparams2]}, _inputs()
        )
        assert np.all(np.isfinite(np.asarray(ll)))

    def test_middle_insertion_keep_map(self):
        """keep=[0,1,-1,2,3]: a fresh column between old columns 1 and 2."""
        L, L2 = 4, 5
        trans, emit, tparams, eparams = _model([L])
        keep = [np.asarray([0, 1, -1, 2, 3])]
        trans2, tparams2 = trans.resize(tparams, [L2], RKEY, keep=keep)
        emit2, eparams2 = emit.resize(eparams, [L2], RKEY, keep=keep)
        old_k, new_k = tparams["kernels"][0], tparams2["kernels"][0]
        # Column-keyed: new positions 0,1,3,4 carry old 0,1,2,3.
        np.testing.assert_array_equal(
            np.asarray(old_k["begin_to_match"]),
            np.asarray(new_k["begin_to_match"])[[0, 1, 3, 4]],
        )
        # Pair-keyed: old pairs (0,1) and (2,3) survive at new 0 and 3;
        # pairs spanning the insertion (new 1 and 2) are fresh.
        np.testing.assert_array_equal(
            np.asarray(old_k["match_to_match"])[[0, 2]],
            np.asarray(new_k["match_to_match"])[[0, 3]],
        )
        np.testing.assert_array_equal(
            np.asarray(eparams["emission_kernel"][0]),
            np.asarray(eparams2["emission_kernel"][0])[[0, 1, 3, 4]],
        )
        # delete_to_match END anchor: old col 3 is last and survives as
        # new col 4 (also last), so D_last -> END carries over.
        np.testing.assert_array_equal(
            np.asarray(old_k["delete_to_match"])[L - 1],
            np.asarray(new_k["delete_to_match"])[L2 - 1],
        )

    def test_multi_model(self):
        trans, emit, tparams, eparams = _model([4, 6])
        trans2, tparams2 = trans.resize(tparams, [6, 5], RKEY)
        emit2, eparams2 = emit.resize(eparams, [6, 5], RKEY)
        assert trans2.lengths == [6, 5] and emit2.lengths == [6, 5]
        layer2 = HMMLayer(trans2, emit2, use_prior=False)
        x = jnp.broadcast_to(_inputs(), (2,) + _inputs().shape[1:])
        ll = layer2.log_likelihood(
            {"transitions": tparams2, "emissions": [eparams2]}, x
        )
        assert ll.shape == (2, 3) and np.all(np.isfinite(np.asarray(ll)))


class TestResizeValidation:
    def test_wrong_model_count(self):
        trans, emit, tparams, eparams = _model([4, 6])
        with pytest.raises(ValueError, match="new lengths"):
            trans.resize(tparams, [5], RKEY)
        with pytest.raises(ValueError, match="new lengths"):
            emit.resize(eparams, [5], RKEY)

    def test_bad_keep(self):
        trans, _, tparams, _ = _model([4])
        with pytest.raises(ValueError, match="shape"):
            trans.resize(tparams, [5], RKEY, keep=[np.asarray([0, 1])])
        with pytest.raises(ValueError, match="strictly"):
            trans.resize(
                tparams, [5], RKEY, keep=[np.asarray([1, 0, -1, 2, 3])]
            )
        with pytest.raises(ValueError, match="strictly"):
            trans.resize(
                tparams, [5], RKEY, keep=[np.asarray([0, 1, 2, 3, 9])]
            )


class TestResizedConfigRoundTrip:
    def test_config_round_trip(self):
        trans, emit, tparams, eparams = _model([5])
        trans2, tparams2 = trans.resize(tparams, [7], RKEY)
        emit2, eparams2 = emit.resize(eparams, [7], RKEY)
        trans3 = ProfileTransitions.from_config(trans2.get_config())
        emit3 = ProfileEmissions.from_config(emit2.get_config())
        assert trans3.lengths == [7] and emit3.lengths == [7]
        layer3 = HMMLayer(trans3, emit3, use_prior=False)
        ll = layer3.log_likelihood(
            {"transitions": tparams2, "emissions": [eparams2]}, _inputs()
        )
        assert np.all(np.isfinite(np.asarray(ll)))


class TestResizeGuard:
    def test_gene_pred_layer_raises_clearly(self):
        from hmm_layer_tpu.models import (
            SimpleGenePredEmissions,
            SimpleGenePredTransitions,
        )

        layer = HMMLayer(
            SimpleGenePredTransitions(),
            SimpleGenePredEmissions(),
            use_prior=False,
        )
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=7)
        with pytest.raises(NotImplementedError, match="profile-family"):
            layer.resize(params, [8], RKEY)

"""Per-chunk ``end_hints`` (chunk-border emission clamping).

The reference masks the border states of EVERY chunk when
``parallel_factor > 1`` (``gene_pred_hmm_emitter.py:117-120`` on the
chunk-reshaped ``(m, b·P, L/P, q)`` emissions, threaded via
``MsaHMMLayer.py:104``). Here the equivalent is a 5D
``(m, b, P, 2, q)`` hint tensor applied to the un-chunked emissions
(:func:`hmm_layer_tpu.models.emission_utils.apply_end_hints`); these tests
pin parity against a dense NumPy masking oracle at P ∈ {1, 3, 9},
differentiability, and both model families.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import (
    ProfileEmissions,
    SimpleGenePredEmissions,
    SimpleGenePredTransitions,
)
from hmm_layer_tpu.models.emission_utils import apply_end_hints
from hmm_layer_tpu.ops import recursion

KEY = jax.random.PRNGKey(0)


def mask_oracle(emit, hints):
    """Dense NumPy reference: mask each chunk's first/last position."""
    emit = np.array(emit)
    hints = np.asarray(hints)
    m, b, L, q = emit.shape
    P = hints.shape[2]
    c = L // P
    for p in range(P):
        emit[:, :, p * c, :] *= hints[:, :, p, 0, :]
        emit[:, :, (p + 1) * c - 1, :] *= hints[:, :, p, 1, :]
    return emit


class TestApplyEndHints:
    @pytest.mark.parametrize("P", [1, 3, 9])
    def test_per_chunk_parity_vs_oracle(self, P):
        rng = np.random.default_rng(P)
        emit = jnp.asarray(rng.uniform(0.1, 1.0, (2, 3, 18, 5)).astype(np.float32))
        hints = jnp.asarray(rng.uniform(0.0, 1.0, (2, 3, P, 2, 5)).astype(np.float32))
        out = np.asarray(apply_end_hints(emit, hints))
        np.testing.assert_allclose(out, mask_oracle(emit, hints), rtol=1e-6)

    def test_sequence_level_unchanged(self):
        rng = np.random.default_rng(0)
        emit = jnp.asarray(rng.uniform(0.1, 1.0, (1, 2, 6, 4)).astype(np.float32))
        hints = jnp.asarray(rng.uniform(size=(1, 2, 2, 4)).astype(np.float32))
        out = np.asarray(apply_end_hints(emit, hints))
        # 4D hints == 5D hints with P=1.
        out5 = np.asarray(apply_end_hints(emit, hints[:, :, None]))
        np.testing.assert_allclose(out, out5, rtol=1e-6)

    def test_errors(self):
        emit = jnp.ones((1, 2, 6, 4))
        with pytest.raises(ValueError, match="does not divide"):
            apply_end_hints(emit, jnp.ones((1, 2, 4, 2, 4)))
        with pytest.raises(ValueError, match=">= 2 positions"):
            apply_end_hints(emit, jnp.ones((1, 2, 6, 2, 4)))
        with pytest.raises(ValueError, match="sequence-level"):
            apply_end_hints(emit, jnp.ones((1, 2, 3, 4)))


class TestGenePredChunkHints:
    def _setup(self, P, L=18, b=3):
        em = SimpleGenePredEmissions()
        params = em.init_params(KEY, input_dim=7)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(0.1, 1.0, (1, b, L, 7)).astype(np.float32))
        hints = jnp.asarray(
            rng.uniform(0.2, 1.0, (1, b, P, 2, 7)).astype(np.float32)
        )
        return em, params, x, hints

    @pytest.mark.parametrize("P", [1, 3, 9])
    def test_emitter_parity(self, P):
        em, params, x, hints = self._setup(P)
        unmasked = em.emissions(params, x)
        masked = np.asarray(em.emissions(params, x, end_hints=hints))
        np.testing.assert_allclose(
            masked, mask_oracle(unmasked, hints), rtol=1e-6
        )

    def test_layer_posterior_parity(self):
        """Hints through the layer == recursion on an oracle-masked E."""
        P = 3
        em, eparams, x, hints = self._setup(P)
        layer = HMMLayer(
            SimpleGenePredTransitions(), em, use_prior=False, parallel_factor=P
        )
        params = {
            "transitions": layer.transitions.init_params(KEY),
            "emissions": [eparams],
        }
        lg = layer.state_posterior_log_probs(params, x, end_hints=hints)
        init, A = layer.transitions.matrices(params["transitions"])
        E_masked = jnp.asarray(mask_oracle(em.emissions(eparams, x), hints))
        lg_ref, _ = recursion.posterior(init, A, E_masked, P)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=2e-5, atol=2e-5
        )

    def test_differentiable(self):
        P = 3
        em, eparams, x, hints = self._setup(P)
        layer = HMMLayer(
            SimpleGenePredTransitions(), em, use_prior=False, parallel_factor=P
        )
        params = {
            "transitions": layer.transitions.init_params(KEY),
            "emissions": [eparams],
        }

        def loss(p, h):
            return -jnp.mean(layer.log_likelihood(p, x, end_hints=h))

        g_params, g_hints = jax.grad(loss, argnums=(0, 1))(params, hints)
        leaves = jax.tree.leaves(g_params) + [g_hints]
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert np.any(np.asarray(g_hints) != 0)


class TestThreadedEndHints:
    """``loss`` / ``viterbi`` / ``sample_paths`` forward the same hint
    tensors as ``state_posterior_log_probs`` (the reference threads
    ``end_hints`` through every recursion entry point,
    ``MsaHMMLayer.py:98-151``)."""

    def _setup(self, P=3, L=18, b=3):
        em = SimpleGenePredEmissions()
        eparams = em.init_params(KEY, input_dim=7)
        rng = np.random.default_rng(21)
        x = jnp.asarray(rng.uniform(0.1, 1.0, (1, b, L, 7)).astype(np.float32))
        hints = jnp.asarray(
            rng.uniform(0.2, 1.0, (1, b, P, 2, 7)).astype(np.float32)
        )
        layer = HMMLayer(
            SimpleGenePredTransitions(), em, use_prior=False, parallel_factor=P
        )
        params = {
            "transitions": layer.transitions.init_params(KEY),
            "emissions": [eparams],
        }
        E_masked = jnp.asarray(mask_oracle(em.emissions(eparams, x), hints))
        return layer, params, x, hints, E_masked

    def test_loss_parity(self):
        layer, params, x, hints, E_masked = self._setup()
        got = float(layer.loss(params, x, end_hints=hints))
        init, A = layer.transitions.matrices(params["transitions"])
        _, ll = recursion.forward(init, A, E_masked, layer.parallel_factor)
        want = -float(jnp.mean(ll)) + float(layer.aux_loss(params))
        np.testing.assert_allclose(got, want, rtol=2e-5)
        assert got != float(layer.loss(params, x))

    def test_viterbi_parity(self):
        layer, params, x, hints, E_masked = self._setup()
        got = np.asarray(layer.viterbi(params, x, end_hints=hints))
        init, A = layer.transitions.matrices(params["transitions"])
        ref = np.asarray(recursion.viterbi(init, A, E_masked, 1))
        np.testing.assert_array_equal(got, ref)

    def test_sample_paths_parity(self):
        from hmm_layer_tpu.ops import sampling

        layer, params, x, hints, E_masked = self._setup()
        key = jax.random.PRNGKey(5)
        got = np.asarray(
            layer.sample_paths(params, x, key, num_samples=4, end_hints=hints)
        )
        init, A = layer.transitions.matrices(params["transitions"])
        ref = np.asarray(
            sampling.sample_posterior(
                init, A, E_masked, key, 4, layer.parallel_factor
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_loss_differentiable_in_hints(self):
        layer, params, x, hints, _ = self._setup()
        g = jax.grad(lambda h: layer.loss(params, x, end_hints=h))(hints)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


class TestProfileChunkHints:
    @pytest.mark.parametrize("P", [1, 3])
    def test_emitter_parity(self, P):
        em = ProfileEmissions(4)  # q = 2*4+3 = 11
        params = em.init_params(KEY, input_dim=25)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.dirichlet(np.ones(25), (1, 2, 12)).astype(np.float32))
        q = 11
        hints = jnp.asarray(
            rng.uniform(0.2, 1.0, (1, 2, P, 2, q)).astype(np.float32)
        )
        unmasked = em.emissions(params, x)
        masked = np.asarray(em.emissions(params, x, end_hints=hints))
        np.testing.assert_allclose(
            masked, mask_oracle(unmasked, hints), rtol=1e-6
        )


class TestEndHintsSparseRoute:
    """end_hints apply to emissions BEFORE the engine, so the sparse
    edge-list route must honor them identically to the dense route."""

    def test_sparse_viterbi_and_ce_honor_hints(self):
        from hmm_layer_tpu.models import GenePredMultiTransitions

        class RawE:
            def init_params(self, key, input_dim):
                return {}

            def emissions(self, p, x, end_hints=None, training=False):
                from hmm_layer_tpu.models.emission_utils import (
                    apply_end_hints,
                )

                return apply_end_hints(x, end_hints)

            def prior_log_density(self, p):
                return jnp.zeros((1,))

            def aux_loss(self, p):
                return jnp.zeros(())

        trans_s = GenePredMultiTransitions(k=2, sparse_forward=True)
        trans_d = GenePredMultiTransitions(k=2)
        q = trans_s.num_states
        sparse_layer = HMMLayer(trans_s, RawE(), use_prior=False)
        dense_layer = HMMLayer(trans_d, RawE(), use_prior=False)
        params = sparse_layer.init_params(jax.random.PRNGKey(0), q)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0.1, 1.0, (1, 2, 12, q)), jnp.float32)
        # clamp the sequence borders to state 0 (intergenic)
        hints = (
            jnp.zeros((1, 2, 2, q))
            .at[:, :, 0, :].set(jax.nn.one_hot(0, q))
            .at[:, :, 1, :].set(jax.nn.one_hot(0, q))
        )
        v_s = np.asarray(sparse_layer.viterbi(params, x, end_hints=hints))
        v_d = np.asarray(dense_layer.viterbi(params, x, end_hints=hints))
        np.testing.assert_array_equal(v_s, v_d)
        assert (v_s[..., 0] == 0).all() and (v_s[..., -1] == 0).all()
        labels = jnp.asarray(rng.integers(0, q, (1, 2, 12)))
        ce_s = sparse_layer.posterior_cross_entropy(
            params, x, labels, end_hints=hints
        )
        ce_d = dense_layer.posterior_cross_entropy(
            params, x, labels, end_hints=hints
        )
        np.testing.assert_allclose(float(ce_s), float(ce_d), rtol=1e-5)

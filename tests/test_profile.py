"""Profile-HMM family: silent-state elimination correctness (vs an
(I - T_ss)^{-1} marginalization oracle), stochasticity invariants, priors,
emissions, end-to-end gradients (BASELINE config 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import initializers as inits
from hmm_layer_tpu.models.profile_emissions import ProfileEmissions
from hmm_layer_tpu.models.profile_transitions import (
    ProfileTransitions,
    explicit_transition_kernel_parts,
    get_num_states,
    get_num_states_implicit,
    sparse_transition_indices_explicit,
)
from hmm_layer_tpu.models.priors import AminoAcidPrior, ProfileHMMTransitionPrior

KEY = jax.random.PRNGKey(42)


def _marginalize_silent_states(trans, params, model_idx=0):
    """Oracle: eliminate silent states by matrix inversion.

    Builds the explicit transition matrix (3L+5 states incl BEGIN/END/DELETE)
    from the same per-edge probabilities, then computes
    P_implicit = T_ee + T_es (I - T_ss)^{-1} T_se over emitting states.
    """
    length = trans.lengths[model_idx]
    n_exp = get_num_states_implicit([length])[0]
    n_imp = get_num_states([length])[0]
    probs = trans.make_probs(params)[model_idx]
    idx = sparse_transition_indices_explicit(length)
    T = np.zeros((n_exp, n_exp))
    for name, _ in explicit_transition_kernel_parts(length):
        for (i, j), v in zip(idx[name], np.asarray(probs[name])):
            T[i, j] += v
    emitting = np.arange(n_imp)
    silent = np.arange(n_imp, n_exp)  # BEGIN, END, DELETE x L
    T_ee = T[np.ix_(emitting, emitting)]
    T_es = T[np.ix_(emitting, silent)]
    T_ss = T[np.ix_(silent, silent)]
    T_se = T[np.ix_(silent, emitting)]
    P = T_ee + T_es @ np.linalg.inv(np.eye(len(silent)) - T_ss) @ T_se
    P[n_imp - 1, n_imp - 1] = 1.0  # terminal self-loop
    return P


class TestSilentStateElimination:
    @pytest.mark.parametrize("length", [3, 5, 12])
    def test_implicit_A_matches_marginalization_oracle(self, length):
        trans = ProfileTransitions(length)
        params = trans.init_params(KEY)
        A = np.asarray(trans.make_A(params)[0])
        q = get_num_states([length])[0]
        P_oracle = _marginalize_silent_states(trans, params)
        np.testing.assert_allclose(A[:q, :q], P_oracle, rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("length", [3, 7, 20])
    def test_implicit_A_rows_stochastic(self, length):
        trans = ProfileTransitions(length)
        params = trans.init_params(KEY)
        A = np.asarray(trans.make_A(params)[0])
        q = get_num_states([length])[0]
        np.testing.assert_allclose(A[:q].sum(-1), 1.0, rtol=1e-4)
        # padded rows are zero
        assert np.all(A[q:] < 1e-10)

    def test_minimum_length_model(self):
        """L=2 has no match-skip edges; regression for empty-concat and
        div-by-zero in the default initializers."""
        trans = ProfileTransitions(2)
        params = trans.init_params(KEY)
        A = np.asarray(trans.make_A(params)[0])
        np.testing.assert_allclose(A[:7].sum(-1), 1.0, rtol=1e-4)

    def test_initial_distribution_sums_to_one(self):
        trans = ProfileTransitions([5, 9])
        params = trans.init_params(KEY)
        init = np.asarray(trans.make_initial_distribution(params))
        np.testing.assert_allclose(init.sum(-1), 1.0, rtol=1e-4)
        # no mass on padded states of the smaller model
        assert np.all(init[0, get_num_states([5])[0] :] < 1e-10)

    def test_flank_init_controls_left_flank_mass(self):
        trans = ProfileTransitions(6, flank_init=inits.constant_init(3.0))
        params = trans.init_params(KEY)
        init = np.asarray(trans.make_initial_distribution(params))
        assert init[0, 0] == pytest.approx(1.0 / (1.0 + np.exp(-3.0)), rel=1e-4)


class TestProfileEmissions:
    def test_B_rows_stochastic(self):
        em = ProfileEmissions([4, 6])
        params = em.init_params(KEY, input_dim=25)
        B = np.asarray(em.make_B(params))
        for i, length in enumerate([4, 6]):
            q = get_num_states([length])[0]
            np.testing.assert_allclose(B[i, :q].sum(-1), 1.0, rtol=1e-5)
            assert np.all(B[i, q:] == 0)
            # terminal state emits only the terminal symbol
            assert B[i, q - 1, -1] == 1.0

    def test_insertions_share_one_kernel(self):
        em = ProfileEmissions(5)
        params = em.init_params(KEY, input_dim=25)
        B = np.asarray(em.make_B(params))[0]
        # left flank row equals all insert rows (same kernel)
        for row in range(6, 6 + 4 + 2):  # inserts, unannotated, right flank
            np.testing.assert_allclose(B[0], B[row], rtol=1e-6)

    def test_emission_scoring(self):
        em = ProfileEmissions(4)
        params = em.init_params(KEY, input_dim=25)
        x = jax.nn.one_hot(
            jax.random.randint(KEY, (1, 2, 9), 0, 24), 25, dtype=jnp.float32
        )
        probs = em.emissions(params, x)
        assert probs.shape == (1, 2, 9, 11)
        assert np.all(np.asarray(probs) >= 0)

    def test_duplicate_surgery(self):
        em = ProfileEmissions([4, 6, 8])
        params = em.init_params(KEY, input_dim=25)
        sub_em, sub_params = em.duplicate(params, model_indices=[0, 2])
        assert sub_em.lengths == [4, 8]
        np.testing.assert_allclose(
            sub_params["emission_kernel"][1], params["emission_kernel"][2]
        )


class TestPriors:
    def test_transition_prior_finite_named(self):
        trans = ProfileTransitions([5, 8])
        params = trans.init_params(KEY)
        probs = trans.make_probs(params)
        flank = trans.make_flank_init_prob(params)
        prior = ProfileHMMTransitionPrior()(probs, flank)
        assert set(prior) == {
            "match_prior",
            "insert_prior",
            "delete_prior",
            "flank_prior",
            "hit_prior",
            "global_prior",
        }
        for v in prior.values():
            assert v.shape == (2,)
            assert np.all(np.isfinite(np.asarray(v)))

    def test_amino_acid_prior(self):
        em = ProfileEmissions([4, 7])
        params = em.init_params(KEY, input_dim=25)
        prior = AminoAcidPrior()(em.make_B(params), lengths=[4, 7])
        assert prior.shape == (2,)
        assert np.all(np.isfinite(np.asarray(prior)))

    def test_frozen_kernel_mask(self):
        trans = ProfileTransitions(5, frozen_kernels={"unannotated_segment_loop": True})
        params = trans.init_params(KEY)
        mask = trans.trainable_mask(params)
        assert mask["kernels"][0]["unannotated_segment_loop"] is False
        assert mask["kernels"][0]["match_to_match"] is True


class TestProfileLayerEndToEnd:
    """BASELINE config 4: profile HMM with priors, end-to-end gradients."""

    def _layer(self, lengths=[6, 9], parallel_factor=1):
        trans = ProfileTransitions(lengths)
        em = ProfileEmissions(lengths)
        return HMMLayer(
            trans, em, num_seqs=100, use_prior=True, parallel_factor=parallel_factor
        )

    def _protein_batch(self, m=2, b=4, L=12):
        x = jax.nn.one_hot(
            jax.random.randint(KEY, (1, b, L), 0, 20), 25, dtype=jnp.float32
        )
        return jnp.broadcast_to(x, (m, b, L, 25))

    def test_loglik_and_posterior(self):
        layer = self._layer()
        params = layer.init_params(KEY, input_dim=25)
        x = self._protein_batch()
        ll, ll_mean, prior, aux = layer(params, x)
        assert ll.shape == (2, 4)
        assert np.all(np.isfinite(np.asarray(ll)))
        assert prior.shape == (2,)
        lg = layer.state_posterior_log_probs(params, x)
        sums = np.asarray(jax.nn.logsumexp(lg, -1))
        np.testing.assert_allclose(sums, 0.0, atol=2e-3)

    def test_map_gradients(self):
        layer = self._layer(lengths=[5])
        params = layer.init_params(KEY, input_dim=25)
        x = self._protein_batch(m=1, b=3, L=10)
        loss, grads = jax.value_and_grad(lambda p: layer.loss(p, x))(params)
        assert np.isfinite(loss)
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # one step reduces the MAP loss
        params2 = jax.tree.map(lambda p, g: p - 1e-2 * g, params, grads)
        assert layer.loss(params2, x) < loss

    def test_viterbi_on_profile(self):
        layer = self._layer(lengths=[5])
        params = layer.init_params(KEY, input_dim=25)
        x = self._protein_batch(m=1, b=2, L=8)
        paths = np.asarray(layer.viterbi(params, x))
        A = np.asarray(layer.transitions.make_A(params["transitions"])[0])
        for bi in range(2):
            for t in range(7):
                assert A[paths[0, bi, t], paths[0, bi, t + 1]] > 0

    def test_chunked_parity(self):
        l1 = self._layer(lengths=[6], parallel_factor=1)
        lP = self._layer(lengths=[6], parallel_factor=4)
        params = l1.init_params(KEY, input_dim=25)
        x = self._protein_batch(m=1, b=2, L=16)
        np.testing.assert_allclose(
            l1.log_likelihood(params, x),
            lP.log_likelihood(params, x),
            rtol=1e-4,
        )


class TestBackgroundEmissionInit:
    """make_default_emission_init (SURVEY defect 8's intended capability):
    emission softmax starts exactly at the background distribution."""

    def test_match_rows_equal_background(self):
        from hmm_layer_tpu.models import initializers as inits
        from hmm_layer_tpu.utils.substitution import lg_matrix

        init = inits.make_default_emission_init()
        em = ProfileEmissions(5, emission_init=init)
        params = em.init_params(KEY, input_dim=26)
        B = np.asarray(em.make_B(params))
        _, bg = lg_matrix()
        bg = np.asarray(bg, np.float64)
        full = np.full(25, 1e-3)
        full[:20] = bg / bg.sum()
        full = full / full.sum()
        np.testing.assert_allclose(
            B[0, 1:6, :25], np.broadcast_to(full, (5, 25)), rtol=1e-5
        )

    def test_spec_roundtrip(self):
        import json

        from hmm_layer_tpu.models import initializers as inits

        init = inits.make_default_emission_init()
        spec = json.loads(json.dumps(inits.init_to_config(init)))
        init2 = inits.init_from_config(spec)
        a = np.asarray(init(KEY, (4, 25)))
        b = np.asarray(init2(KEY, (4, 25)))
        np.testing.assert_array_equal(a, b)

    def test_custom_background_and_size_check(self):
        import pytest

        from hmm_layer_tpu.models import initializers as inits

        init = inits.make_default_emission_init([0.5, 0.5], alphabet_size=4)
        v = np.exp(np.asarray(init(KEY, (2, 4))))
        np.testing.assert_allclose(v.sum(-1), 1.0, rtol=1e-5)
        with pytest.raises(ValueError, match="channels"):
            inits.make_default_emission_init(np.ones(30), alphabet_size=25)

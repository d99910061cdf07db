"""Multi-device sharding on the virtual 8-device CPU mesh: data-parallel,
state-sharded and sequence-sharded results must match single-device dense."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.ops import recursion
from hmm_layer_tpu.parallel import sharding
from oracle import random_hmm

RNG = np.random.default_rng(5)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _stack(init, A, E):
    return init[None], A[None], E[None]


class TestMeshCreation:
    def test_make_mesh(self):
        mesh = sharding.make_mesh({"data": 4, "state": 2})
        assert mesh.shape == {"data": 4, "state": 2}

    def test_too_many_devices_raises(self):
        # Explicit ValueError (not a bare assert, which python -O strips).
        with pytest.raises(ValueError, match="16 devices"):
            sharding.make_mesh({"data": 16})


class TestDataParallel:
    def test_loglik_matches_single_device(self):
        init, A, E = random_hmm(RNG, q=6, L=32, b=8)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 4})
        ll_ref = recursion.log_likelihood(init, A, E)
        fn = sharding.data_parallel_fn(
            lambda p, x: recursion.log_likelihood(p["init"], p["A"], x), mesh
        )
        x = sharding.shard_batch(jnp.asarray(E), mesh)
        ll = fn({"init": jnp.asarray(init), "A": jnp.asarray(A)}, x)
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-5)

    def test_gradients_match(self):
        init, A, E = random_hmm(RNG, q=4, L=16, b=8)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 4})

        def loss(p, x):
            return recursion.log_likelihood(p["init"], p["A"], x).mean()

        g_ref = jax.grad(loss)({"init": jnp.asarray(init), "A": jnp.asarray(A)}, E)
        fn = sharding.data_parallel_fn(jax.grad(loss), mesh)
        x = sharding.shard_batch(jnp.asarray(E), mesh)
        g = fn({"init": jnp.asarray(init), "A": jnp.asarray(A)}, x)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


class TestStateSharded:
    @pytest.mark.parametrize("n_state", [2, 4])
    def test_matches_dense(self, n_state):
        init, A, E = random_hmm(RNG, q=8, L=24, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": n_state})
        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sharding.state_sharded_log_likelihood(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)

    def test_composed_with_data_axis(self):
        init, A, E = random_hmm(RNG, q=8, L=16, b=4)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "state": 4})
        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sharding.state_sharded_log_likelihood(
            jnp.asarray(init),
            jnp.asarray(A),
            jnp.asarray(E),
            mesh,
            data_axis="data",
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)

    def test_indivisible_q_raises(self):
        init, A, E = random_hmm(RNG, q=6, L=8, b=2)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": 4})
        with pytest.raises(AssertionError):
            sharding.state_sharded_log_likelihood(
                jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh
            )


class TestSeqSharded:
    @pytest.mark.parametrize("n_seq", [2, 4])
    def test_matches_dense(self, n_seq):
        init, A, E = random_hmm(RNG, q=5, L=48, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"seq": n_seq})
        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sharding.seq_sharded_log_likelihood(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)

    def test_with_local_chunking(self):
        init, A, E = random_hmm(RNG, q=5, L=48, b=2)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"seq": 4})
        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sharding.seq_sharded_log_likelihood(
            jnp.asarray(init),
            jnp.asarray(A),
            jnp.asarray(E),
            mesh,
            local_parallel_factor=3,
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)

    def test_composed_with_data_axis(self):
        init, A, E = random_hmm(RNG, q=5, L=32, b=4)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "seq": 4})
        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sharding.seq_sharded_log_likelihood(
            jnp.asarray(init),
            jnp.asarray(A),
            jnp.asarray(E),
            mesh,
            data_axis="data",
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)


class TestSeqShardedPosterior:
    @pytest.mark.parametrize("n_seq", [2, 4])
    def test_matches_dense(self, n_seq):
        init, A, E = random_hmm(RNG, q=5, L=48, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"seq": n_seq})
        lg_ref, ll_ref = recursion.posterior(init, A, E)
        lg, ll = sharding.seq_sharded_posterior(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=1e-3, atol=2e-3
        )

    def test_with_local_chunking_and_data_axis(self):
        init, A, E = random_hmm(RNG, q=5, L=48, b=4)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "seq": 4})
        lg_ref, ll_ref = recursion.posterior(init, A, E)
        lg, ll = sharding.seq_sharded_posterior(
            jnp.asarray(init),
            jnp.asarray(A),
            jnp.asarray(E),
            mesh,
            data_axis="data",
            local_parallel_factor=3,
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=1e-3, atol=2e-3
        )

    def test_no_loglik(self):
        init, A, E = random_hmm(RNG, q=4, L=16, b=2)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"seq": 2})
        lg_ref, _ = recursion.posterior(init, A, E, no_loglik=True)
        lg, _ = sharding.seq_sharded_posterior(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh,
            no_loglik=True,
        )
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=1e-3, atol=2e-3
        )


class TestSeqShardedViterbi:
    @pytest.mark.parametrize("n_seq", [2, 4])
    def test_matches_dense(self, n_seq):
        init, A, E = random_hmm(RNG, q=5, L=48, b=3, peaked=True)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"seq": n_seq})
        ref = recursion.viterbi(init, A, E)
        paths = sharding.seq_sharded_viterbi(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh
        )
        np.testing.assert_array_equal(np.asarray(paths), np.asarray(ref))

    def test_with_local_chunking_and_data_axis(self):
        init, A, E = random_hmm(RNG, q=5, L=48, b=4, peaked=True)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "seq": 4})
        ref = recursion.viterbi(init, A, E)
        paths = sharding.seq_sharded_viterbi(
            jnp.asarray(init),
            jnp.asarray(A),
            jnp.asarray(E),
            mesh,
            data_axis="data",
            local_parallel_factor=3,
        )
        np.testing.assert_array_equal(np.asarray(paths), np.asarray(ref))


class TestStateShardedPosterior:
    @pytest.mark.parametrize("n_state", [2, 4])
    def test_matches_dense(self, n_state):
        init, A, E = random_hmm(RNG, q=8, L=24, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": n_state})
        lg_ref, ll_ref = recursion.posterior(init, A, E)
        lg, ll = sharding.state_sharded_posterior(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=1e-3, atol=2e-3
        )

    def test_composed_with_data_axis_no_loglik(self):
        init, A, E = random_hmm(RNG, q=8, L=16, b=4)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "state": 4})
        lg_ref, _ = recursion.posterior(init, A, E, no_loglik=True)
        lg, _ = sharding.state_sharded_posterior(
            jnp.asarray(init),
            jnp.asarray(A),
            jnp.asarray(E),
            mesh,
            data_axis="data",
            no_loglik=True,
        )
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=1e-3, atol=2e-3
        )


class TestStateShardedChunked:
    """parallel_factor > 1: border-sharded chunk operators (zero per-step
    collectives in the summary pass)."""

    @pytest.mark.parametrize("n_state", [2, 4])
    def test_loglik_matches_dense(self, n_state):
        init, A, E = random_hmm(RNG, q=8, L=24, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": n_state})
        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sharding.state_sharded_log_likelihood(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh,
            parallel_factor=4,
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)

    @pytest.mark.parametrize("n_state", [2, 4])
    def test_posterior_matches_dense(self, n_state):
        init, A, E = random_hmm(RNG, q=8, L=24, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": n_state})
        lg_ref, ll_ref = recursion.posterior(init, A, E)
        lg, ll = sharding.state_sharded_posterior(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh,
            parallel_factor=3,
        )
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=1e-3, atol=2e-3
        )

    def test_posterior_with_data_axis_no_loglik(self):
        init, A, E = random_hmm(RNG, q=8, L=16, b=4)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "state": 4})
        lg_ref, _ = recursion.posterior(init, A, E, no_loglik=True)
        lg, _ = sharding.state_sharded_posterior(
            jnp.asarray(init),
            jnp.asarray(A),
            jnp.asarray(E),
            mesh,
            data_axis="data",
            no_loglik=True,
            parallel_factor=2,
        )
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=1e-3, atol=2e-3
        )


class TestStateShardedViterbi:
    @pytest.mark.parametrize("n_state", [2, 4])
    def test_matches_dense(self, n_state):
        init, A, E = random_hmm(RNG, q=8, L=32, b=3, peaked=True)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": n_state})
        ref = recursion.viterbi(init, A, E)
        paths = sharding.state_sharded_viterbi(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh
        )
        np.testing.assert_array_equal(np.asarray(paths), np.asarray(ref))

    def test_composed_with_data_axis(self):
        init, A, E = random_hmm(RNG, q=8, L=24, b=4, peaked=True)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "state": 4})
        ref = recursion.viterbi(init, A, E)
        paths = sharding.state_sharded_viterbi(
            jnp.asarray(init),
            jnp.asarray(A),
            jnp.asarray(E),
            mesh,
            data_axis="data",
        )
        np.testing.assert_array_equal(np.asarray(paths), np.asarray(ref))

    def test_flat_scores_tie_break_matches_argmax(self):
        # Uniform-ish HMM: many near-ties; the pmin resolution must still
        # reproduce jnp.argmax (first index) semantics exactly.
        q, L, b = 8, 12, 2
        init = np.full((1, q), 1.0 / q, np.float32)
        A = np.full((1, q, q), 1.0 / q, np.float32)
        E = np.ones((1, b, L, q), np.float32) * 0.5
        mesh = sharding.make_mesh({"state": 4})
        ref = recursion.viterbi(jnp.asarray(init), jnp.asarray(A), jnp.asarray(E))
        paths = sharding.state_sharded_viterbi(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E), mesh
        )
        np.testing.assert_array_equal(np.asarray(paths), np.asarray(ref))


class TestConfig5Integration:
    """BASELINE config 5: multi-copy gene-pred HMM, state-sharded, padded q."""

    def test_multicopy_gene_pred_state_sharded(self):
        from hmm_layer_tpu.layer import HMMLayer
        from hmm_layer_tpu.models import (
            GenePredEmissions,
            GenePredMultiTransitions,
        )

        k = 9  # 1 + 14k = 127 states
        layer = HMMLayer(
            GenePredMultiTransitions(k=k),
            GenePredEmissions(
                start_codons=[("ATG", 1.0)],
                stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
                intron_begin_pattern=[("NGT", 0.99), ("NAT", 0.01)],
                intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
                num_copies=k,
            ),
            use_prior=False,
        )
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        rng = np.random.default_rng(3)
        b, L, q = 2, 12, 1 + 14 * k
        cls = jnp.asarray(
            rng.dirichlet(np.ones(15), size=(1, b, L)).astype(np.float32)
        )
        nucs = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 4, size=(1, b, L))), 5,
            dtype=jnp.float32,
        )
        x = jnp.concatenate([cls, nucs], axis=-1)
        init, A = layer.transitions.matrices(params["transitions"])
        E = layer.emission_probs(params, x)

        lg_ref, ll_ref = recursion.posterior(init, A, E)

        # Pad q -> 128 (divisible by the 4-way state axis); padded states get
        # zero emission/initial probability and arbitrary A rows.
        q_pad = 128
        init_p = jnp.pad(init, ((0, 0), (0, q_pad - q)))
        A_p = jnp.pad(A, ((0, 0), (0, q_pad - q), (0, q_pad - q)))
        E_p = jnp.pad(E, ((0, 0), (0, 0), (0, 0), (0, q_pad - q)))
        mesh = sharding.make_mesh({"state": 4})
        lg, ll = sharding.state_sharded_posterior(init_p, A_p, E_p, mesh)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(lg)[..., :q], np.asarray(lg_ref), rtol=1e-3, atol=2e-3
        )

        # Chunk-parallel state-sharded posterior (border-sharded operators).
        # Reference: the dense CHUNKED engine at the same parallel_factor —
        # sequential vs chunked differ by clamp noise on structurally-
        # impossible states (log-posterior ~ -64) of this sparse grammar.
        lg_cref, _ = recursion.posterior(init, A, E, 3)
        lg_c, ll_c = sharding.state_sharded_posterior(
            init_p, A_p, E_p, mesh, parallel_factor=3
        )
        np.testing.assert_allclose(
            np.asarray(ll_c), np.asarray(ll_ref), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(lg_c)[..., :q], np.asarray(lg_cref), rtol=1e-3, atol=2e-3
        )

        # 127-state decode: state-sharded Viterbi must equal dense decode.
        ref_paths = recursion.viterbi(init, A, E)
        paths = sharding.state_sharded_viterbi(init_p, A_p, E_p, mesh)
        np.testing.assert_array_equal(np.asarray(paths), np.asarray(ref_paths))

    def test_500plus_states_state_sharded(self):
        """BASELINE config 5 literally: a 500+-state multi-copy gene-pred HMM
        (k=36 -> 1+14k = 505 states), padded to 512 over an 8-way state mesh;
        loglik + decode must match the dense single-device engine."""
        from hmm_layer_tpu.layer import HMMLayer
        from hmm_layer_tpu.models import (
            GenePredEmissions,
            GenePredMultiTransitions,
        )

        k = 36  # 1 + 14k = 505 states
        layer = HMMLayer(
            GenePredMultiTransitions(k=k),
            GenePredEmissions(
                start_codons=[("ATG", 1.0)],
                stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
                intron_begin_pattern=[("NGT", 0.99), ("NAT", 0.01)],
                intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
                num_copies=k,
            ),
            use_prior=False,
        )
        params = layer.init_params(jax.random.PRNGKey(1), input_dim=15)
        rng = np.random.default_rng(11)
        b, L, q = 2, 9, 1 + 14 * k
        cls = jnp.asarray(
            rng.dirichlet(np.ones(15), size=(1, b, L)).astype(np.float32)
        )
        nucs = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 4, size=(1, b, L))), 5,
            dtype=jnp.float32,
        )
        x = jnp.concatenate([cls, nucs], axis=-1)
        init, A = layer.transitions.matrices(params["transitions"])
        E = layer.emission_probs(params, x)

        q_pad = 512
        init_p = jnp.pad(init, ((0, 0), (0, q_pad - q)))
        A_p = jnp.pad(A, ((0, 0), (0, q_pad - q), (0, q_pad - q)))
        E_p = jnp.pad(E, ((0, 0), (0, 0), (0, 0), (0, q_pad - q)))
        mesh = sharding.make_mesh({"state": 8})

        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sharding.state_sharded_log_likelihood(init_p, A_p, E_p, mesh)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=1e-4)

        ref_paths = recursion.viterbi(init, A, E)
        paths = sharding.state_sharded_viterbi(init_p, A_p, E_p, mesh)
        np.testing.assert_array_equal(np.asarray(paths), np.asarray(ref_paths))


class TestSeqShardedGradients:
    """Differentiable sequence-sharded paths: analytic shard_map-aware VJPs
    vs the dense analytic VJPs (VERDICT item 4)."""

    def _loss_weights(self, shape, seed=7):
        return jnp.asarray(
            np.random.default_rng(seed).normal(size=shape).astype(np.float32)
        )

    @pytest.mark.parametrize("n_seq,plocal", [(4, 1), (2, 3)])
    def test_loglik_grads_match_dense(self, n_seq, plocal):
        init, A, E = random_hmm(RNG, q=6, L=48, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"seq": n_seq})
        ct = self._loss_weights((1, 3))

        def dense(i, a, e):
            return jnp.sum(recursion.log_likelihood(i, a, e, 4) * ct)

        def shard(i, a, e):
            return jnp.sum(
                sharding.seq_sharded_log_likelihood(
                    i, a, e, mesh, local_parallel_factor=plocal
                )
                * ct
            )

        args = (jnp.asarray(init), jnp.asarray(A), jnp.asarray(E))
        g_ref = jax.grad(dense, argnums=(0, 1, 2))(*args)
        g = jax.grad(shard, argnums=(0, 1, 2))(*args)
        for a, r in zip(g, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-4
            )

    def test_loglik_grads_with_data_axis(self):
        init, A, E = random_hmm(RNG, q=5, L=32, b=4)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "seq": 4})

        def dense(i, a, e):
            return recursion.log_likelihood(i, a, e, 4).mean()

        def shard(i, a, e):
            return sharding.seq_sharded_log_likelihood(
                i, a, e, mesh, data_axis="data"
            ).mean()

        args = (jnp.asarray(init), jnp.asarray(A), jnp.asarray(E))
        g_ref = jax.grad(dense, argnums=(0, 1, 2))(*args)
        g = jax.grad(shard, argnums=(0, 1, 2))(*args)
        for a, r in zip(g, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-4
            )

    def test_loglik_grad_zero_transitions(self):
        # Structural zeros must keep their true nonzero gradient (A is not
        # clamped by the recursions), including across device boundaries.
        init, A, E = random_hmm(RNG, q=5, L=24, b=2)
        A = A.copy()
        A[0, 3] = 0.0
        A = A / A.sum(-1, keepdims=True)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"seq": 4})

        def dense(a):
            return recursion.log_likelihood(jnp.asarray(init), a, jnp.asarray(E), 4).sum()

        def shard(a):
            return sharding.seq_sharded_log_likelihood(
                jnp.asarray(init), a, jnp.asarray(E), mesh
            ).sum()

        g_ref = jax.grad(dense)(jnp.asarray(A))
        g = jax.grad(shard)(jnp.asarray(A))
        assert np.asarray(g)[0, 0, 3] != 0.0
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=2e-3, atol=2e-4
        )


class TestSeqShardedPosteriorGradients:
    """Posterior-CE-style training gradients through the sequence-sharded
    posterior: shard_map-aware analytic adjoints vs the dense analytic VJP."""

    @pytest.mark.parametrize(
        "n_seq,plocal,no_loglik", [(4, 1, False), (2, 3, False), (4, 1, True)]
    )
    def test_grads_match_dense(self, n_seq, plocal, no_loglik):
        init, A, E = random_hmm(RNG, q=6, L=48, b=2)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"seq": n_seq})
        w = jnp.asarray(
            np.random.default_rng(13).normal(size=(1, 2, 48, 6)).astype(np.float32)
        )

        def dense(i, a, e):
            lg, ll = recursion.posterior(i, a, e, 4, no_loglik=no_loglik)
            return jnp.sum(lg * w) + 0.3 * jnp.sum(ll)

        def shard(i, a, e):
            lg, ll = sharding.seq_sharded_posterior(
                i, a, e, mesh, local_parallel_factor=plocal,
                no_loglik=no_loglik,
            )
            return jnp.sum(lg * w) + 0.3 * jnp.sum(ll)

        args = (jnp.asarray(init), jnp.asarray(A), jnp.asarray(E))
        g_ref = jax.grad(dense, argnums=(0, 1, 2))(*args)
        g = jax.grad(shard, argnums=(0, 1, 2))(*args)
        for a, r in zip(g, g_ref):
            scale = max(np.abs(np.asarray(r)).max(), 1.0)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(r) / scale, atol=5e-4
            )

    def test_posterior_ce_loss_with_data_axis(self):
        # End-to-end CE-style objective (the Tiberius training mode) on a
        # data x seq mesh.
        init, A, E = random_hmm(RNG, q=5, L=32, b=4)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 2, "seq": 4})
        rng = np.random.default_rng(3)
        labels = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 5, size=(1, 4, 32))), 5
        )

        def dense(a):
            lg, _ = recursion.posterior(jnp.asarray(init), a, jnp.asarray(E), 4)
            return -jnp.mean(jnp.sum(labels * lg, axis=-1))

        def shard(a):
            lg, _ = sharding.seq_sharded_posterior(
                jnp.asarray(init), a, jnp.asarray(E), mesh, data_axis="data"
            )
            return -jnp.mean(jnp.sum(labels * lg, axis=-1))

        g_ref = jax.grad(dense)(jnp.asarray(A))
        g = jax.grad(shard)(jnp.asarray(A))
        scale = max(np.abs(np.asarray(g_ref)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(g_ref) / scale, atol=5e-4
        )


class TestStateShardedGradients:
    """State-sharded training: autodiff through the shard_map scans is the
    supported route (per-device taping is O(L·b·q/n) — the state axis
    SHRINKS the tape, unlike the seq-sharded case which needed analytic
    VJPs); collectives transpose automatically."""

    def test_loglik_autodiff_matches_dense(self):
        init, A, E = random_hmm(RNG, q=8, L=24, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": 4})

        def dense(a, e):
            return recursion.log_likelihood(
                jnp.asarray(init), a, e, analytic_vjp=False
            ).sum()

        def shard(a, e):
            return sharding.state_sharded_log_likelihood(
                jnp.asarray(init), a, e, mesh
            ).sum()

        args = (jnp.asarray(A), jnp.asarray(E))
        g_ref = jax.grad(dense, argnums=(0, 1))(*args)
        g = jax.grad(shard, argnums=(0, 1))(*args)
        for a, r in zip(g, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-4
            )

    def test_posterior_ce_autodiff_matches_dense(self):
        init, A, E = random_hmm(RNG, q=8, L=16, b=2)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": 4})
        w = jnp.asarray(
            np.random.default_rng(9).normal(size=(1, 2, 16, 8)).astype(np.float32)
        )

        def dense(a):
            lg, _ = recursion.posterior(jnp.asarray(init), a, jnp.asarray(E))
            return jnp.sum(lg * w)

        def shard(a):
            lg, _ = sharding.state_sharded_posterior(
                jnp.asarray(init), a, jnp.asarray(E), mesh
            )
            return jnp.sum(lg * w)

        g_ref = jax.grad(dense)(jnp.asarray(A))
        g = jax.grad(shard)(jnp.asarray(A))
        scale = max(np.abs(np.asarray(g_ref)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(g_ref) / scale, atol=5e-4
        )

    @pytest.mark.parametrize("pf", [4])
    def test_loglik_chunked_autodiff_matches_dense(self, pf):
        """parallel_factor > 1 grads route through _plogsumexp/_sharded
        folds — regression: lax.pmax in _plogsumexp raised
        NotImplementedError under jax.grad even inside stop_gradient."""
        init, A, E = random_hmm(RNG, q=8, L=24, b=3)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": 4})

        def dense(a, e):
            return recursion.log_likelihood(
                jnp.asarray(init), a, e, analytic_vjp=False
            ).sum()

        def shard(a, e):
            return sharding.state_sharded_log_likelihood(
                jnp.asarray(init), a, e, mesh, parallel_factor=pf
            ).sum()

        args = (jnp.asarray(A), jnp.asarray(E))
        g_ref = jax.grad(dense, argnums=(0, 1))(*args)
        g = jax.grad(shard, argnums=(0, 1))(*args)
        for a, r in zip(g, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-4
            )

    @pytest.mark.parametrize("pf", [4])
    def test_posterior_chunked_autodiff_matches_dense(self, pf):
        init, A, E = random_hmm(RNG, q=8, L=16, b=2)
        init, A, E = _stack(init, A, E)
        mesh = sharding.make_mesh({"state": 4})
        w = jnp.asarray(
            np.random.default_rng(9).normal(size=(1, 2, 16, 8)).astype(np.float32)
        )

        def dense(a):
            lg, _ = recursion.posterior(jnp.asarray(init), a, jnp.asarray(E))
            return jnp.sum(lg * w)

        def shard(a):
            lg, _ = sharding.state_sharded_posterior(
                jnp.asarray(init), a, jnp.asarray(E), mesh, parallel_factor=pf
            )
            return jnp.sum(lg * w)

        g_ref = jax.grad(dense)(jnp.asarray(A))
        g = jax.grad(shard)(jnp.asarray(A))
        scale = max(np.abs(np.asarray(g_ref)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(g_ref) / scale, atol=5e-4
        )


class TestShardedEdgeShapes:
    """m > 1 and b = 1 through every sharded path (the other tests mostly
    stack to m=1): posterior/loglik parity and Viterbi score parity."""

    def test_multi_model_single_sequence(self):
        rng = np.random.default_rng(0)
        m, q, b, L = 2, 8, 1, 24
        init = jnp.asarray(rng.dirichlet(np.ones(q), size=m).astype(np.float32))
        A = jnp.asarray(rng.dirichlet(np.ones(q), size=(m, q)).astype(np.float32))
        E = jnp.asarray(
            rng.uniform(0.05, 1.0, size=(m, b, L, q)).astype(np.float32)
        )
        lgd, lld = recursion.posterior(init, A, E, 4)
        pd = recursion.viterbi(init, A, E, 1)

        lgA = np.log(np.maximum(np.asarray(A), 1e-16))
        lgE = np.log(np.maximum(np.asarray(E), 1e-16))
        lgI = np.log(np.maximum(np.asarray(init), 1e-16))

        def score(paths):
            s, p = 0.0, np.asarray(paths)
            for mi in range(m):
                for bi in range(b):
                    s += lgI[mi, p[mi, bi, 0]] + lgE[mi, bi, 0, p[mi, bi, 0]]
                    for t in range(1, L):
                        s += (
                            lgA[mi, p[mi, bi, t - 1], p[mi, bi, t]]
                            + lgE[mi, bi, t, p[mi, bi, t]]
                        )
            return s

        mesh_s = sharding.make_mesh({"state": 4})
        lg, _ = sharding.state_sharded_posterior(
            init, A, E, mesh_s, parallel_factor=4
        )
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lgd), atol=3e-4
        )
        pv = sharding.state_sharded_viterbi(init, A, E, mesh_s)
        assert abs(score(pv) - score(pd)) < 1e-3

        mesh_q = sharding.make_mesh({"seq": 4})
        lg2, _ = sharding.seq_sharded_posterior(
            init, A, E, mesh_q, local_parallel_factor=2
        )
        np.testing.assert_allclose(
            np.asarray(lg2), np.asarray(lgd), atol=3e-4
        )
        pv2 = sharding.seq_sharded_viterbi(init, A, E, mesh_q)
        assert abs(score(pv2) - score(pd)) < 1e-3
        ll3 = sharding.seq_sharded_log_likelihood(init, A, E, mesh_q)
        np.testing.assert_allclose(
            np.asarray(ll3), np.asarray(lld), rtol=1e-4
        )


class TestDataParallelEM:
    def test_em_step_matches_single_device(self):
        from hmm_layer_tpu.ops import em

        init, A, E = random_hmm(RNG, q=5, L=24, b=8)
        ini, Aj, Ej = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 4})
        ref_init, ref_A, ref_ll = em.em_step(ini, Aj, Ej, parallel_factor=4)
        new_init, new_A, ll = sharding.data_parallel_em_step(
            jnp.asarray(ini), jnp.asarray(Aj), jnp.asarray(Ej),
            mesh, parallel_factor=4,
        )
        np.testing.assert_allclose(new_init, ref_init, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(new_A, ref_A, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(ll, ref_ll, rtol=1e-5)

    def test_em_step_categorical_matches(self):
        from hmm_layer_tpu.ops import em

        q, s, b, L = 4, 6, 8, 20
        init, A, _ = random_hmm(RNG, q=q, L=L, b=b)
        B = RNG.random((1, q, s)).astype(np.float32)
        B /= B.sum(-1, keepdims=True)
        sym = RNG.integers(0, s, size=(1, b, L))
        x = np.eye(s, dtype=np.float32)[sym]
        ini, Aj = init[None], A[None]
        mesh = sharding.make_mesh({"data": 4})
        ref = em.em_step_categorical(ini, Aj, B, x)
        out = sharding.data_parallel_em_step_categorical(
            jnp.asarray(ini), jnp.asarray(Aj), jnp.asarray(B),
            jnp.asarray(x), mesh,
        )
        for got, want in zip(out, ref):
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_em_improves_loglik_across_devices(self):
        from hmm_layer_tpu.ops import em

        init, A, E = random_hmm(RNG, q=4, L=16, b=8)
        ini, Aj, Ej = _stack(init, A, E)
        mesh = sharding.make_mesh({"data": 8})
        lls = []
        ini_j, Aj_j = jnp.asarray(ini), jnp.asarray(Aj)
        for _ in range(3):
            ini_j, Aj_j, ll = sharding.data_parallel_em_step(
                ini_j, Aj_j, jnp.asarray(Ej), mesh
            )
            lls.append(float(jnp.sum(ll)))
        assert lls[1] >= lls[0] - 1e-4 and lls[2] >= lls[1] - 1e-4

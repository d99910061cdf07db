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
        with pytest.raises(AssertionError):
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

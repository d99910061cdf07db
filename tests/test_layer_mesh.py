"""Mesh-aware HMMLayer: the flagship API routed through the distributed
engine (VERDICT round-2 item 1 — the one-stop role of the reference's
``MsaHmmLayer``, ``MsaHMMLayer.py:180-208``, extended to multi-chip).

A layer built with ``mesh`` + ``partition`` must give the SAME results as a
dense layer — including priors, sequence weights, multiple emitters and
gradients — on the virtual 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import (
    SimpleGenePredEmissions,
    SimpleGenePredTransitions,
)
from hmm_layer_tpu.parallel import sharding
from hmm_layer_tpu.training import Trainer

KEY = jax.random.PRNGKey(0)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class ConstEmitter:
    """Second emitter: a trainable per-state scale with a nonzero prior and
    aux loss — exercises multi-emitter product + prior/aux under sharding."""

    def __init__(self, q):
        self.q = q

    def init_params(self, key, input_dim):
        return {"scale": jnp.linspace(0.5, 1.5, self.q)[None]}

    def emissions(self, params, inputs, end_hints=None, training=False):
        m, b, L = 1, inputs.shape[1], inputs.shape[2]
        return jnp.broadcast_to(
            jax.nn.softplus(params["scale"])[:, None, None, :], (m, b, L, self.q)
        )

    def prior_log_density(self, params):
        return -jnp.sum(params["scale"] ** 2, axis=-1)

    def aux_loss(self, params):
        return 1e-3 * jnp.sum(jnp.abs(params["scale"]))


class DenseHMM:
    """Minimal generic transitions with a chosen state count (for the state
    route, which needs q divisible by the mesh axis)."""

    def __init__(self, q):
        self.q = q

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "init_logits": jax.random.normal(k1, (1, self.q)),
            "A_logits": jax.random.normal(k2, (1, self.q, self.q)),
        }

    def matrices(self, params):
        return (
            jax.nn.softmax(params["init_logits"], axis=-1),
            jax.nn.softmax(params["A_logits"], axis=-1),
        )

    def prior_log_density(self, params):
        return jnp.zeros((1,))


class IdentityEmitter:
    def __init__(self, q):
        self.q = q

    def init_params(self, key, input_dim):
        return {}

    def emissions(self, params, inputs, end_hints=None, training=False):
        return inputs

    def prior_log_density(self, params):
        return jnp.zeros((1,))

    def aux_loss(self, params):
        return jnp.zeros(())


def _gene_pred_layers(partition, mesh, weights=None, **kw):
    """(dense, meshed) layer pair sharing params: gene-pred transitions +
    class emitter + ConstEmitter, prior on, sequence weights optional."""
    q = 7
    trans = SimpleGenePredTransitions()
    ems = [SimpleGenePredEmissions(), ConstEmitter(q)]
    common = dict(
        num_seqs=100, use_prior=True, sequence_weights=weights, **kw
    )
    dense = HMMLayer(trans, ems, **common)
    meshed = HMMLayer(trans, ems, mesh=mesh, partition=partition, **common)
    params = dense.init_params(KEY, input_dim=q)
    return dense, meshed, params


def _inputs(b, L, q=7, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.1, 1.0, (1, b, L, q)).astype(np.float32))


class TestValidation:
    def test_partition_without_mesh(self):
        with pytest.raises(ValueError, match="without a `mesh`"):
            HMMLayer(DenseHMM(4), IdentityEmitter(4), partition={"batch": "data"})

    def test_unknown_axis(self):
        mesh = sharding.make_mesh({"data": 2})
        with pytest.raises(ValueError, match="unknown partition axes"):
            HMMLayer(
                DenseHMM(4), IdentityEmitter(4), mesh=mesh,
                partition={"bogus": "data"},
            )

    def test_seq_plus_state(self):
        mesh = sharding.make_mesh({"seq": 2, "state": 2})
        with pytest.raises(NotImplementedError, match="combined"):
            HMMLayer(
                DenseHMM(4), IdentityEmitter(4), mesh=mesh,
                partition={"seq": "seq", "state": "state"},
            )

    def test_axis_not_in_mesh(self):
        mesh = sharding.make_mesh({"data": 2})
        with pytest.raises(ValueError, match="not an axis"):
            HMMLayer(
                DenseHMM(4), IdentityEmitter(4), mesh=mesh,
                partition={"seq": "seq"},
            )

    def test_require_dense(self):
        mesh = sharding.make_mesh({"seq": 2})
        layer = HMMLayer(
            DenseHMM(4), IdentityEmitter(4), mesh=mesh,
            partition={"seq": "seq"},
        )
        params = layer.init_params(KEY, 4)
        x = _inputs(2, 8, 4)
        with pytest.raises(NotImplementedError, match="forward_recursion"):
            layer.forward_recursion(params, x)
        with pytest.raises(NotImplementedError, match="sample_paths"):
            layer.sample_paths(params, x, KEY)


class TestSeqShardedLayer:
    def _mesh(self):
        return sharding.make_mesh({"data": 2, "seq": 4})

    def test_loss_parity_full_surface(self):
        """Prior + sequence weights + two emitters: meshed == dense."""
        weights = np.linspace(0.5, 2.0, 100).astype(np.float32)
        mesh = self._mesh()
        dense, meshed, params = _gene_pred_layers(
            {"batch": "data", "seq": "seq"}, mesh, weights=weights
        )
        x = _inputs(4, 32)
        indices = jnp.arange(4)[None]  # (m, b)
        ref = dense.loss(params, x, indices=indices)
        got = meshed.loss(params, x, indices=indices)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)

    def test_loss_grads_parity(self):
        mesh = self._mesh()
        dense, meshed, params = _gene_pred_layers(
            {"batch": "data", "seq": "seq"}, mesh
        )
        x = _inputs(4, 32)
        g_ref = jax.grad(lambda p: dense.loss(p, x))(params)
        g = jax.grad(lambda p: meshed.loss(p, x))(params)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
            )

    def test_posterior_and_viterbi_parity(self):
        mesh = self._mesh()
        dense, meshed, params = _gene_pred_layers(
            {"batch": "data", "seq": "seq"}, mesh
        )
        x = _inputs(4, 32)
        lg_ref = dense.state_posterior_log_probs(params, x)
        lg = meshed.state_posterior_log_probs(params, x)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=2e-4, atol=2e-4
        )
        paths_ref = dense.viterbi(params, x)
        paths = meshed.viterbi(params, x)
        np.testing.assert_array_equal(np.asarray(paths), np.asarray(paths_ref))

    def test_posterior_cross_entropy_parity_and_grads(self):
        """The supervised CE objective rides the sharded posterior route:
        meshed value == dense value, grads finite and matching."""
        mesh = self._mesh()
        dense, meshed, params = _gene_pred_layers(
            {"batch": "data", "seq": "seq"}, mesh
        )
        x = _inputs(4, 32)
        rng = np.random.default_rng(7)
        labels = jnp.asarray(rng.integers(0, 7, size=(1, 4, 32)))
        ref = dense.posterior_cross_entropy(params, x, labels)
        got = meshed.posterior_cross_entropy(params, x, labels)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4
        )
        g_ref = jax.grad(
            lambda p: dense.posterior_cross_entropy(p, x, labels)
        )(params)
        g = jax.grad(
            lambda p: meshed.posterior_cross_entropy(p, x, labels)
        )(params)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
            )

    def test_end_hints_through_sharded_route(self):
        """Per-chunk end_hints compose with sequence sharding: hints mask
        emissions before the sharded recursion, so meshed == dense."""
        mesh = self._mesh()
        dense, meshed, params = _gene_pred_layers(
            {"batch": "data", "seq": "seq"}, mesh
        )
        x = _inputs(4, 32)
        rng = np.random.default_rng(11)
        hints = jnp.asarray(
            rng.uniform(0.2, 1.0, (1, 4, 4, 2, 7)).astype(np.float32)
        )
        ll_ref = dense.log_likelihood(params, x, end_hints=hints)
        ll = meshed.log_likelihood(params, x, end_hints=hints)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=2e-5)
        lg_ref = dense.state_posterior_log_probs(params, x, end_hints=hints)
        lg = meshed.state_posterior_log_probs(params, x, end_hints=hints)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=2e-4, atol=2e-4
        )

    def test_local_parallel_factor(self):
        """Explicit pf is device-local under seq sharding: L=32 over 4
        devices -> local 8, pf=2 divides it."""
        mesh = self._mesh()
        dense, meshed, params = _gene_pred_layers(
            {"batch": "data", "seq": "seq"}, mesh, parallel_factor=2
        )
        x = _inputs(4, 32)
        ll = meshed.log_likelihood(params, x)
        ll_ref = dense.log_likelihood(params, x)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=2e-5)


class TestStateShardedLayer:
    def test_ll_posterior_viterbi_parity(self):
        q = 8
        mesh = sharding.make_mesh({"data": 2, "state": 4})
        trans, em = DenseHMM(q), IdentityEmitter(q)
        dense = HMMLayer(trans, em, use_prior=False)
        meshed = HMMLayer(
            trans, em, use_prior=False, mesh=mesh,
            partition={"batch": "data", "state": "state"},
        )
        params = dense.init_params(KEY, q)
        x = _inputs(4, 24, q)
        np.testing.assert_allclose(
            np.asarray(meshed.log_likelihood(params, x)),
            np.asarray(dense.log_likelihood(params, x)),
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(meshed.state_posterior_log_probs(params, x)),
            np.asarray(dense.state_posterior_log_probs(params, x)),
            rtol=1e-4,
            atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(meshed.viterbi(params, x)),
            np.asarray(dense.viterbi(params, x)),
        )

    def test_loss_grads_parity(self):
        q = 8
        mesh = sharding.make_mesh({"state": 4})
        trans, em = DenseHMM(q), IdentityEmitter(q)
        dense = HMMLayer(trans, em, use_prior=False)
        meshed = HMMLayer(
            trans, em, use_prior=False, mesh=mesh, partition={"state": "state"}
        )
        params = dense.init_params(KEY, q)
        x = _inputs(3, 16, q)
        g_ref = jax.grad(lambda p: dense.loss(p, x))(params)
        g = jax.grad(lambda p: meshed.loss(p, x))(params)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
            )


class TestDataOnlyLayer:
    def test_loss_parity(self):
        mesh = sharding.make_mesh({"data": 8})
        dense, meshed, params = _gene_pred_layers({"batch": "data"}, mesh)
        x = _inputs(8, 16)
        ref = jax.jit(dense.loss)(params, x)
        got = jax.jit(meshed.loss)(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)


class TestTrainerMeshIntegration:
    def test_trainer_adopts_layer_mesh(self):
        """Trainer.fit over a seq+data-sharded layer: runs, loss drops."""
        mesh = sharding.make_mesh({"data": 2, "seq": 4})
        q = 7
        layer = HMMLayer(
            SimpleGenePredTransitions(),
            [SimpleGenePredEmissions(), ConstEmitter(q)],
            use_prior=True,
            num_seqs=64,
            mesh=mesh,
            partition={"batch": "data", "seq": "seq"},
        )
        trainer = Trainer(layer)
        params, opt_state = trainer.init(KEY, input_dim=q)
        x = _inputs(4, 32, q, seed=3)
        # go through fit() to cover the meter/logging path too
        batches = [x] * 6
        p, s, loss = trainer.fit(params, opt_state, batches, log_every=3)
        assert np.isfinite(float(np.asarray(loss)))
        loss0 = float(np.asarray(layer.loss(params, x)))
        loss1 = float(np.asarray(layer.loss(p, x)))
        assert loss1 < loss0


def _sparse_layers(partition, mesh, k=2):
    """(dense-route, meshed) sparse layer pair sharing params: multi-copy
    gene-pred grammar (q = 1 + 14k) + raw emitter."""
    from hmm_layer_tpu.models import GenePredMultiTransitions

    trans = GenePredMultiTransitions(k=k, sparse_forward=True)
    q = trans.num_states
    dense = HMMLayer(trans, IdentityEmitter(q), use_prior=False)
    meshed = HMMLayer(
        trans, IdentityEmitter(q), use_prior=False,
        mesh=mesh, partition=partition,
    )
    params = dense.init_params(KEY, input_dim=q)
    return dense, meshed, params, q


class TestSparseDataParallelLayer:
    """VERDICT round-4 item 1a: config-5 sparse training composed with
    data parallelism through the flagship layer API."""

    def test_loss_and_grad_parity(self):
        mesh = sharding.make_mesh({"data": 8})
        dense, meshed, params, q = _sparse_layers({"batch": "data"}, mesh)
        x = _inputs(8, 40, q)
        np.testing.assert_allclose(
            np.asarray(jax.jit(meshed.loss)(params, x)),
            np.asarray(jax.jit(dense.loss)(params, x)),
            rtol=2e-5,
        )
        g_ref = jax.grad(lambda p: dense.loss(p, x))(params)
        g_dp = jax.grad(lambda p: meshed.loss(p, x))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_dp)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6
            )

    def test_trainer_sparse_dp_step(self):
        mesh = sharding.make_mesh({"data": 4})
        _, meshed, params, q = _sparse_layers({"batch": "data"}, mesh)
        trainer = Trainer(meshed)
        p0, opt = trainer.init(KEY, input_dim=q)
        x = _inputs(4, 24, q)
        p1, opt, loss = trainer.fit(p0, opt, [x] * 4, log_every=2)
        assert np.isfinite(float(np.asarray(loss)))
        assert float(np.asarray(meshed.loss(p1, x))) < float(
            np.asarray(meshed.loss(p0, x))
        )


class TestSparseStateShardedLayer:
    """VERDICT round-4 item 1b: edge-sharded state-parallel sparse engine
    through the layer (q = 29 pads to 32 over 4 state shards)."""

    def test_ll_posterior_viterbi_parity(self):
        mesh = sharding.make_mesh({"data": 2, "state": 4})
        dense, meshed, params, q = _sparse_layers(
            {"batch": "data", "state": "state"}, mesh
        )
        x = _inputs(4, 40, q)
        np.testing.assert_allclose(
            np.asarray(meshed.log_likelihood(params, x)),
            np.asarray(dense.log_likelihood(params, x)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(meshed.state_posterior_log_probs(params, x)),
            np.asarray(dense.state_posterior_log_probs(params, x)),
            atol=5e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(meshed.viterbi(params, x)),
            np.asarray(dense.viterbi(params, x)),
        )

    def test_loss_grads_parity(self):
        """Grads through the sharded analytic Baum-Welch VJP (incl. the
        cross-batch psum of ginit/g_edge on the data x state mesh)."""
        mesh = sharding.make_mesh({"data": 2, "state": 4})
        dense, meshed, params, q = _sparse_layers(
            {"batch": "data", "state": "state"}, mesh
        )
        x = _inputs(4, 32, q)
        g_ref = jax.grad(lambda p: dense.loss(p, x))(params)
        g_st = jax.grad(lambda p: meshed.loss(p, x))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_st)
        ):
            scale = np.abs(np.asarray(a)).max() + 1e-9
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4
            )

    def test_posterior_ce_grads_taped(self):
        """Supervised CE through the taped edge-sharded posterior."""
        mesh = sharding.make_mesh({"state": 8})
        dense, meshed, params, q = _sparse_layers({"state": "state"}, mesh)
        x = _inputs(3, 24, q)
        rng = np.random.default_rng(0)
        labels = jnp.asarray(rng.integers(0, q, size=(1, 3, 24)))
        ref = jax.grad(
            lambda p: dense.posterior_cross_entropy(p, x, labels)
        )(params)
        got = jax.grad(
            lambda p: meshed.posterior_cross_entropy(p, x, labels)
        )(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)
        ):
            scale = np.abs(np.asarray(a)).max() + 1e-9
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4
            )

    def test_trainer_sparse_state_sharded_step(self):
        mesh = sharding.make_mesh({"data": 2, "state": 4})
        _, meshed, params, q = _sparse_layers(
            {"batch": "data", "state": "state"}, mesh
        )
        trainer = Trainer(meshed)
        p0, opt = trainer.init(KEY, input_dim=q)
        x = _inputs(4, 24, q)
        p1, opt, loss = trainer.fit(p0, opt, [x] * 4, log_every=2)
        assert np.isfinite(float(np.asarray(loss)))
        assert float(np.asarray(meshed.loss(p1, x))) < float(
            np.asarray(meshed.loss(p0, x))
        )

    def test_seq_plus_sparse_raises(self):
        mesh = sharding.make_mesh({"seq": 8})
        _, meshed, params, q = _sparse_layers({"seq": "seq"}, mesh)
        with pytest.raises(NotImplementedError, match="state"):
            meshed.log_likelihood(params, _inputs(2, 16, q))

    def test_indivisible_q_pads(self):
        """q=29 over 8 shards (q_pad=32, 3 dead states) stays exact."""
        mesh = sharding.make_mesh({"state": 8})
        dense, meshed, params, q = _sparse_layers({"state": "state"}, mesh)
        x = _inputs(2, 20, q)
        np.testing.assert_allclose(
            np.asarray(meshed.log_likelihood(params, x)),
            np.asarray(dense.log_likelihood(params, x)),
            rtol=1e-5, atol=1e-5,
        )


class TestSparseDataParallelAux:
    def test_sample_paths_and_ce_through_dp_route(self):
        """sample_paths + posterior_cross_entropy on a data-parallel
        sparse layer (both route through the edge-list implementations
        with the batch axis pinned to the mesh)."""
        mesh = sharding.make_mesh({"data": 4})
        dense, meshed, params, q = _sparse_layers({"batch": "data"}, mesh)
        x = _inputs(4, 24, q)
        paths = meshed.sample_paths(params, x, jax.random.PRNGKey(0), 2)
        assert paths.shape == (1, 4, 2, 24)
        assert int(np.asarray(paths).max()) < q
        rng = np.random.default_rng(0)
        labels = jnp.asarray(rng.integers(0, q, (1, 4, 24)))
        ce_dp = meshed.posterior_cross_entropy(params, x, labels)
        ce_ref = dense.posterior_cross_entropy(params, x, labels)
        np.testing.assert_allclose(
            float(ce_dp), float(ce_ref), rtol=1e-5
        )


class TestDenseStateAutoPad:
    """The dense state-sharded route auto-pads q to the axis size (the
    config-5 dense engine at q=505 over 8 shards needs 512; round 5)."""

    def test_indivisible_q_matches_dense(self):
        from hmm_layer_tpu.models import GenePredMultiTransitions

        trans = GenePredMultiTransitions(k=2)  # q = 29 -> pads to 32
        q = trans.num_states
        mesh = sharding.make_mesh({"state": 4})
        dense = HMMLayer(trans, IdentityEmitter(q), use_prior=False)
        meshed = HMMLayer(
            trans, IdentityEmitter(q), use_prior=False,
            mesh=mesh, partition={"state": "state"},
        )
        params = dense.init_params(KEY, input_dim=q)
        x = _inputs(3, 24, q)
        np.testing.assert_allclose(
            np.asarray(meshed.log_likelihood(params, x)),
            np.asarray(dense.log_likelihood(params, x)),
            rtol=1e-5, atol=1e-5,
        )
        lg_m = np.asarray(meshed.state_posterior_log_probs(params, x))
        lg_d = np.asarray(dense.state_posterior_log_probs(params, x))
        assert lg_m.shape == lg_d.shape  # padded states sliced away
        np.testing.assert_allclose(lg_m, lg_d, atol=5e-5)
        np.testing.assert_array_equal(
            np.asarray(meshed.viterbi(params, x)),
            np.asarray(dense.viterbi(params, x)),
        )

    def test_grads_through_padded_state_route(self):
        from hmm_layer_tpu.models import GenePredMultiTransitions

        trans = GenePredMultiTransitions(k=2)
        q = trans.num_states
        mesh = sharding.make_mesh({"state": 4})
        dense = HMMLayer(trans, IdentityEmitter(q), use_prior=False)
        meshed = HMMLayer(
            trans, IdentityEmitter(q), use_prior=False,
            mesh=mesh, partition={"state": "state"},
        )
        params = dense.init_params(KEY, input_dim=q)
        x = _inputs(3, 16, q)
        g_d = jax.grad(lambda p: dense.loss(p, x))(params)
        g_m = jax.grad(lambda p: meshed.loss(p, x))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_m)
        ):
            scale = np.abs(np.asarray(a)).max() + 1e-9
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4
            )

"""Sparse-transition capability (VERDICT round-2 missing item 4).

``make_A_sparse``/``make_log_A_sparse`` API parity with the reference
(``Transitioner.py:249-310``) plus the dense-free compute path in
:mod:`hmm_layer_tpu.ops.sparse` — parity vs the dense engine including the
505-state multi-copy model (BASELINE config 5) and gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.models import (
    GenePredMultiTransitions,
    ProfileTransitions,
    SimpleGenePredTransitions,
)
from hmm_layer_tpu.models.transition_utils import (
    gather_edge_probs,
    masked_row_softmax_from_edges,
    sparse_edge_softmax,
)
from hmm_layer_tpu.ops import recursion, sparse

KEY = jax.random.PRNGKey(0)


def _emissions(rng, m, b, L, q):
    return jnp.asarray(rng.uniform(0.05, 1.0, (m, b, L, q)).astype(np.float32))


class TestSparseEdgeSoftmax:
    @pytest.mark.parametrize("trans_cls,kw", [
        (SimpleGenePredTransitions, {}),
        (GenePredMultiTransitions, {"k": 3}),
    ])
    def test_matches_dense_masked_softmax(self, trans_cls, kw):
        trans = trans_cls(**kw)
        params = trans.init_params(KEY)
        A = trans.make_A(params)
        indices, probs = trans.make_A_sparse(params)
        dense_vals = gather_edge_probs(A, indices)
        np.testing.assert_allclose(
            np.asarray(probs), np.asarray(dense_vals), rtol=1e-6, atol=1e-7
        )
        # rows are stochastic over their out-edges
        rows = np.asarray(indices)[:, 0]
        sums = np.zeros(trans.num_states)
        np.add.at(sums, rows, np.asarray(probs)[0])
        present = np.unique(rows)
        np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)

    def test_log_A_sparse(self):
        trans = SimpleGenePredTransitions()
        params = trans.init_params(KEY)
        indices, logp = trans.make_log_A_sparse(params)
        _, p = trans.make_A_sparse(params)
        np.testing.assert_allclose(
            np.asarray(jnp.exp(logp)), np.asarray(p), rtol=1e-6
        )

    def test_grad_flows(self):
        trans = SimpleGenePredTransitions()
        params = trans.init_params(KEY)

        def f(kernel):
            return jnp.sum(
                sparse_edge_softmax(trans.indices, kernel, trans.num_states) ** 2
            )

        g = jax.grad(f)(params["transition_kernel"])
        assert np.all(np.isfinite(np.asarray(g))) and np.any(np.asarray(g) != 0)


class TestProfileSparseViews:
    def test_coo_matches_dense(self):
        trans = ProfileTransitions([4, 6])
        params = trans.init_params(KEY)
        log_A = np.asarray(trans.make_log_A(params))
        for i, (idx, vals) in enumerate(trans.make_log_A_sparse(params)):
            np.testing.assert_allclose(
                np.asarray(vals), log_A[i, idx[:, 0], idx[:, 1]], rtol=1e-6
            )
        for i, (idx, vals) in enumerate(trans.make_A_sparse(params)):
            np.testing.assert_allclose(
                np.asarray(vals),
                np.exp(log_A[i, idx[:, 0], idx[:, 1]]),
                rtol=1e-5,
            )


class TestSparseRecursions:
    def _setup(self, k=2, b=3, L=18, seed=1):
        trans = GenePredMultiTransitions(k=k)
        params = trans.init_params(jax.random.fold_in(KEY, seed))
        init, A = trans.matrices(params)
        indices, probs = trans.make_A_sparse(params)
        rng = np.random.default_rng(seed)
        E = _emissions(rng, trans.num_models, b, L, trans.num_states)
        return init, A, indices, probs, E

    def test_loglik_matches_dense(self):
        init, A, indices, probs, E = self._setup()
        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sparse.sparse_log_likelihood(init, indices, probs, E)
        np.testing.assert_allclose(
            np.asarray(ll), np.asarray(ll_ref), rtol=1e-5
        )

    def test_forward_backward_posterior_match_dense(self):
        init, A, indices, probs, E = self._setup()
        la_ref, ll_ref = recursion.forward(init, A, E)
        la, ll = sparse.sparse_forward(init, indices, probs, E)
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(la_ref), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=1e-5)
        lb_ref = recursion.backward(init, A, E)
        lb = sparse.sparse_backward(indices, probs, E)
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(lb_ref), rtol=2e-4, atol=2e-4
        )
        lg_ref, _ = recursion.posterior(init, A, E)
        lg, _ = sparse.sparse_posterior(init, indices, probs, E)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=2e-4, atol=2e-4
        )

    def test_505_state_config5(self):
        """BASELINE config 5 scale: 1+14k = 505 states, dense-free."""
        init, A, indices, probs, E = self._setup(k=36, b=2, L=12, seed=3)
        assert E.shape[-1] == 505
        ll_ref = recursion.log_likelihood(init, A, E)
        ll = sparse.sparse_log_likelihood(init, indices, probs, E)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref), rtol=1e-4)
        paths_ref = recursion.viterbi(init, A, E)
        paths = sparse.sparse_viterbi(init, indices, probs, E)
        # both decodes must achieve the same optimal score and be valid
        A_np = np.asarray(A)[0]
        for p in (np.asarray(paths), np.asarray(paths_ref)):
            for t in range(p.shape[-1] - 1):
                assert np.all(A_np[p[0, :, t], p[0, :, t + 1]] > 0)
        s_ref = _path_score(init, A, E, np.asarray(paths_ref))
        s = _path_score(init, A, E, np.asarray(paths))
        np.testing.assert_allclose(s, s_ref, rtol=1e-5, atol=1e-4)

    def test_viterbi_matches_dense(self):
        init, A, indices, probs, E = self._setup(b=2, L=14)
        paths_ref = np.asarray(recursion.viterbi(init, A, E))
        paths = np.asarray(sparse.sparse_viterbi(init, indices, probs, E))
        s_ref = _path_score(init, A, E, paths_ref)
        s = _path_score(init, A, E, paths)
        np.testing.assert_allclose(s, s_ref, rtol=1e-5, atol=1e-4)

    def test_grads_match_dense(self):
        """d loglik / d edge logits via the sparse path == via the dense
        path (chain through each builder)."""
        trans = SimpleGenePredTransitions()
        params = trans.init_params(KEY)
        rng = np.random.default_rng(5)
        E = _emissions(rng, 1, 2, 10, trans.num_states)
        init = trans.make_initial_distribution(params)

        def dense_loss(kernel):
            A = masked_row_softmax_from_edges(
                trans.indices, kernel, trans.num_states
            )[None]
            return recursion.log_likelihood(init, A, E).mean()

        def sparse_loss(kernel):
            probs = sparse_edge_softmax(
                trans.indices, kernel, trans.num_states
            )[None]
            return sparse.sparse_log_likelihood(
                init, trans.indices, probs, E
            ).mean()

        g_ref = jax.grad(dense_loss)(params["transition_kernel"])
        g = jax.grad(sparse_loss)(params["transition_kernel"])
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-6
        )


class TestSparseAnalyticVJP:
    """The analytic edge-list adjoints (default) match taped autodiff —
    at realistic sequence lengths (L=1200, the scale the dense analytic
    posterior adjoint was validated at), both objectives, both
    ``no_loglik`` modes, gradients wrt (init, edge_probs, E)."""

    def _setup(self, L, k=1, b=2, seed=11):
        trans = GenePredMultiTransitions(k=k)
        params = trans.init_params(jax.random.fold_in(KEY, seed))
        init = trans.make_initial_distribution(params)
        indices, probs = trans.make_A_sparse(params)
        rng = np.random.default_rng(seed)
        E = _emissions(rng, trans.num_models, b, L, trans.num_states)
        return init, indices, probs, E

    @staticmethod
    def _compare(g_fast, g_taped, rtol=5e-3):
        for a, b in zip(g_fast, g_taped):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-8)
            np.testing.assert_allclose(a, b, rtol=rtol, atol=rtol * scale)

    @pytest.mark.parametrize("L", [40, 1200])
    def test_loglik_grads_match_taped(self, L):
        init, indices, probs, E = self._setup(L)

        def f(analytic):
            return lambda i, p, e: jnp.sum(
                sparse.sparse_log_likelihood(
                    i, indices, p, e, analytic_vjp=analytic
                )
            )

        g_fast = jax.grad(f(True), argnums=(0, 1, 2))(init, probs, E)
        g_taped = jax.grad(f(False), argnums=(0, 1, 2))(init, probs, E)
        self._compare(g_fast, g_taped)

    @pytest.mark.parametrize("L", [40, 1200])
    @pytest.mark.parametrize("no_loglik", [False, True])
    def test_posterior_grads_match_taped(self, L, no_loglik):
        init, indices, probs, E = self._setup(L, seed=13)
        rng = np.random.default_rng(17)
        w = jnp.asarray(
            rng.uniform(0.0, 1.0, E.shape).astype(np.float32)
        )  # random cotangent weights on log_gamma

        def f(analytic):
            def loss(i, p, e):
                lg, ll = sparse.sparse_posterior(
                    i, indices, p, e,
                    no_loglik=no_loglik, analytic_vjp=analytic,
                )
                return jnp.sum(lg * w) + 0.25 * jnp.sum(ll)

            return loss

        g_fast = jax.grad(f(True), argnums=(0, 1, 2))(init, probs, E)
        g_taped = jax.grad(f(False), argnums=(0, 1, 2))(init, probs, E)
        self._compare(g_fast, g_taped)

    def test_posterior_grads_match_dense_engine(self):
        """Posterior-CE gradient through the sparse analytic adjoint ==
        through the dense engine's analytic adjoint (independent oracle)."""
        trans = SimpleGenePredTransitions()
        params = trans.init_params(KEY)
        rng = np.random.default_rng(23)
        E = _emissions(rng, 1, 2, 64, trans.num_states)
        init = trans.make_initial_distribution(params)
        labels = rng.integers(0, trans.num_states, size=(1, 2, 64))
        onehot = jnp.asarray(
            np.eye(trans.num_states, dtype=np.float32)[labels]
        )

        def dense_loss(kernel, e):
            A = masked_row_softmax_from_edges(
                trans.indices, kernel, trans.num_states
            )[None]
            lg, _ = recursion.posterior(init, A, e)
            return -jnp.mean(jnp.sum(lg * onehot, axis=-1))

        def sparse_loss(kernel, e):
            probs = sparse_edge_softmax(
                trans.indices, kernel, trans.num_states
            )[None]
            lg, _ = sparse.sparse_posterior(init, trans.indices, probs, e)
            return -jnp.mean(jnp.sum(lg * onehot, axis=-1))

        g_ref = jax.grad(dense_loss, argnums=(0, 1))(
            params["transition_kernel"], E
        )
        g = jax.grad(sparse_loss, argnums=(0, 1))(
            params["transition_kernel"], E
        )
        self._compare(g, g_ref, rtol=2e-3)

    def test_fast_primal_matches_taped_primal(self):
        init, indices, probs, E = self._setup(40)
        ll_f = sparse.sparse_log_likelihood(init, indices, probs, E)
        ll_t = sparse.sparse_log_likelihood(
            init, indices, probs, E, analytic_vjp=False
        )
        np.testing.assert_array_equal(np.asarray(ll_f), np.asarray(ll_t))
        lg_f, _ = sparse.sparse_posterior(init, indices, probs, E)
        lg_t, _ = sparse.sparse_posterior(
            init, indices, probs, E, analytic_vjp=False
        )
        np.testing.assert_array_equal(np.asarray(lg_f), np.asarray(lg_t))


class TestLayerSparseRoute:
    """HMMLayer(transitions with sparse_forward=True) routes loss /
    posterior / viterbi through the COO engine with identical results."""

    def _layers(self, k=2):
        from hmm_layer_tpu.layer import HMMLayer

        class RawEmitter:
            def init_params(self, key, input_dim):
                return {}

            def emissions(self, p, x, end_hints=None, training=False):
                return x

            def prior_log_density(self, p):
                return jnp.zeros((1,))

            def aux_loss(self, p):
                return jnp.zeros(())

        sparse_t = GenePredMultiTransitions(k=k, sparse_forward=True)
        dense_t = GenePredMultiTransitions(k=k)
        em = RawEmitter()
        q = sparse_t.num_states
        sparse_l = HMMLayer(sparse_t, em, use_prior=False)
        dense_l = HMMLayer(dense_t, em, use_prior=False)
        params = dense_l.init_params(KEY, q)
        params["transitions"] = sparse_t.init_params(KEY)
        rng = np.random.default_rng(2)
        x = _emissions(rng, 1, 3, 18, q)
        return sparse_l, dense_l, params, x

    def test_parity_and_routing(self, monkeypatch):
        sparse_l, dense_l, params, x = self._layers()
        calls = []
        orig = sparse.sparse_log_likelihood
        monkeypatch.setattr(
            sparse,
            "sparse_log_likelihood",
            lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1],
        )
        ll = sparse_l.log_likelihood(params, x)
        assert calls, "layer did not route through the sparse engine"
        ll_ref = dense_l.log_likelihood(params, x)
        np.testing.assert_allclose(
            np.asarray(ll), np.asarray(ll_ref), rtol=1e-5
        )
        lg = sparse_l.state_posterior_log_probs(params, x)
        lg_ref = dense_l.state_posterior_log_probs(params, x)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg_ref), rtol=2e-4, atol=2e-4
        )
        p = np.asarray(sparse_l.viterbi(params, x))
        p_ref = np.asarray(dense_l.viterbi(params, x))
        init, A = dense_l.transitions.matrices(params["transitions"])
        np.testing.assert_allclose(
            _path_score(init, A, x, p),
            _path_score(init, A, x, p_ref),
            rtol=1e-5,
            atol=1e-4,
        )

    def test_loss_grads(self):
        sparse_l, dense_l, params, x = self._layers()
        g = jax.grad(sparse_l.loss)(params, x)
        g_ref = jax.grad(dense_l.loss)(params, x)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
            )

    def test_config_roundtrip_carries_flag(self):
        t = GenePredMultiTransitions(k=2, sparse_forward=True)
        t2 = GenePredMultiTransitions.from_config(t.get_config())
        assert t2.sparse_forward is True


def _path_score(init, A, E, paths):
    """Joint log-prob of decoded paths (f64 NumPy)."""
    init = np.asarray(init, np.float64)
    A = np.asarray(A, np.float64)
    E = np.asarray(E, np.float64)
    m, b, L = paths.shape
    out = np.zeros((m, b))
    for i in range(m):
        for j in range(b):
            p = paths[i, j]
            s = np.log(init[i, p[0]]) + np.log(E[i, j, 0, p[0]])
            for t in range(1, L):
                s += np.log(A[i, p[t - 1], p[t]]) + np.log(E[i, j, t, p[t]])
            out[i, j] = s
    return out


def test_unroll_knob_parity(monkeypatch):
    """HMM_SPARSE_UNROLL changes scheduling only — values are identical.

    (On the axon TPU toolchain unroll>1 crashes the worker — BASELINE.md
    round 4; the knob stays default-1 there. This pins CPU semantics.)
    """
    from hmm_layer_tpu.ops import sparse as sp

    rng = np.random.default_rng(3)
    trans = SimpleGenePredTransitions()
    params = trans.init_params(KEY)
    indices, probs = trans.make_A_sparse(params)
    init = trans.make_initial_distribution(params)
    E = _emissions(rng, 1, 2, 40, trans.num_states)
    ll0 = np.asarray(sp.sparse_log_likelihood(init, indices, probs, E))
    lg0, _ = sp.sparse_posterior(init, indices, probs, E)
    monkeypatch.setattr(sp, "_UNROLL", 4)
    ll4 = np.asarray(sp.sparse_log_likelihood(init, indices, probs, E))
    lg4, _ = sp.sparse_posterior(init, indices, probs, E)
    np.testing.assert_allclose(ll0, ll4, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg4), atol=1e-5)


def test_edge_plan_cached_and_tracer_guard():
    from hmm_layer_tpu.ops.sparse import EdgePlan

    idx = np.array([[0, 0], [0, 1], [1, 1], [1, 0]])
    p1 = EdgePlan.cached(idx)
    p2 = EdgePlan.cached(np.array(idx, np.int32))
    assert p1 is p2  # memoized on normalized index bytes
    assert p1 == EdgePlan(idx)

    def f(traced_idx):
        return EdgePlan.cached(traced_idx)

    with pytest.raises(TypeError, match="static"):
        jax.jit(f)(jnp.asarray(idx))


class TestSparseSampling:
    """Edge-list FFBS (VERDICT round-4 item 4): exactness vs the sparse
    posterior and the hard zero-probability guarantee."""

    def _setup(self, k=1, b=1, L=8, seed=5):
        trans = GenePredMultiTransitions(k=k)
        params = trans.init_params(jax.random.fold_in(KEY, seed))
        init = trans.make_initial_distribution(params)
        indices, probs = trans.make_A_sparse(params)
        rng = np.random.default_rng(seed)
        E = _emissions(rng, 1, b, L, trans.num_states)
        return trans, init, indices, probs, E

    def test_marginals_match_posterior(self):
        trans, init, indices, probs, E = self._setup()
        S = 3000
        paths = jax.jit(
            lambda i, p, e, key: sparse.sparse_sample_paths(
                i, indices, p, e, key, num_samples=S
            )
        )(init, probs, E, jax.random.PRNGKey(0))
        q, L = trans.num_states, E.shape[2]
        assert paths.shape == (1, 1, S, L)
        emp = np.eye(q)[np.asarray(paths)].mean(axis=2)[0, 0]  # (L, q)
        lg, _ = sparse.sparse_posterior(init, indices, probs, E)
        np.testing.assert_allclose(
            emp, np.exp(np.asarray(lg))[0, 0], atol=4.5 / np.sqrt(S)
        )

    def test_pair_frequencies_match_xi(self):
        trans, init, indices, probs, E = self._setup(L=6)
        _, xi_edge, _ = sparse.sparse_expected_statistics(
            init, indices, probs, E
        )
        S = 3000
        paths = np.asarray(
            sparse.sparse_sample_paths(
                init, indices, probs, E, jax.random.PRNGKey(1), num_samples=S
            )
        )[0, 0]
        q = trans.num_states
        counts = np.zeros((q, q))
        for t in range(E.shape[2] - 1):
            np.add.at(counts, (paths[:, t], paths[:, t + 1]), 1.0)
        idx = np.asarray(indices)
        np.testing.assert_allclose(
            counts[idx[:, 0], idx[:, 1]] / S,
            np.asarray(xi_edge)[0],
            atol=5 * np.sqrt(E.shape[2] - 1) / np.sqrt(S),
        )
        # everything off the edge support has zero counts
        off = np.ones((q, q), bool)
        off[idx[:, 0], idx[:, 1]] = False
        assert counts[off].sum() == 0.0

    def test_never_samples_absent_or_zero_edges(self):
        trans, init, indices, probs, E = self._setup(k=2, b=2, L=24)
        # zero out one edge entirely: it must never be sampled
        probs = np.asarray(probs).copy()
        dead = 3
        probs[:, dead] = 0.0
        paths = np.asarray(
            sparse.sparse_sample_paths(
                init, indices, jnp.asarray(probs), E,
                jax.random.PRNGKey(2), num_samples=64,
            )
        )
        idx = np.asarray(indices)
        edge_ok = np.zeros((trans.num_states, trans.num_states), bool)
        edge_ok[idx[:, 0], idx[:, 1]] = True
        edge_ok[idx[dead, 0], idx[dead, 1]] = False
        pre = paths[..., :-1].ravel()
        nxt = paths[..., 1:].ravel()
        assert edge_ok[pre, nxt].all()

    def test_layer_route(self):
        from hmm_layer_tpu.layer import HMMLayer

        trans = GenePredMultiTransitions(k=2, sparse_forward=True)
        q = trans.num_states

        class RawE:
            def init_params(self, key, input_dim):
                return {}

            def emissions(self, p, x, end_hints=None, training=False):
                return x

            def prior_log_density(self, p):
                return jnp.zeros((1,))

            def aux_loss(self, p):
                return jnp.zeros(())

        layer = HMMLayer(trans, RawE(), use_prior=False)
        params = layer.init_params(KEY, input_dim=q)
        rng = np.random.default_rng(0)
        x = _emissions(rng, 1, 2, 16, q)
        paths = layer.sample_paths(params, x, jax.random.PRNGKey(3), 4)
        assert paths.shape == (1, 2, 4, 16) and paths.dtype == jnp.int32
        assert int(np.asarray(paths).max()) < q


class TestSparseEM:
    """Edge-list Baum-Welch (VERDICT round-4 item 4): parity with the
    dense em_step on the same grammar, monotonicity, structure."""

    def _setup(self, k=2, b=3, L=18, seed=7):
        trans = GenePredMultiTransitions(k=k)
        params = trans.init_params(jax.random.fold_in(KEY, seed))
        init, A = trans.matrices(params)
        indices, probs = trans.make_A_sparse(params)
        rng = np.random.default_rng(seed)
        E = _emissions(rng, 1, b, L, trans.num_states)
        return init, A, indices, probs, E

    def test_matches_dense_em_step(self):
        from hmm_layer_tpu.ops import em

        init, A, indices, probs, E = self._setup()
        ini_d, A_d, ll_d = em.em_step(init, A, E)
        ini_s, w_s, ll_s = sparse.sparse_em_step(init, indices, probs, E)
        np.testing.assert_allclose(
            np.asarray(ll_s), np.asarray(ll_d), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ini_s), np.asarray(ini_d), rtol=1e-4, atol=1e-6
        )
        idx = np.asarray(indices)
        np.testing.assert_allclose(
            np.asarray(w_s)[0],
            np.asarray(A_d)[0, idx[:, 0], idx[:, 1]],
            rtol=1e-4, atol=1e-6,
        )

    def test_monotonic_and_stochastic(self):
        init, A, indices, probs, E = self._setup(L=32)
        lls = []
        for _ in range(5):
            init, probs, ll = sparse.sparse_em_step(init, indices, probs, E)
            lls.append(float(np.asarray(ll).sum()))
        assert all(b2 >= a2 - 1e-3 for a2, b2 in zip(lls, lls[1:])), lls
        rows = np.asarray(indices)[:, 0]
        sums = np.zeros(E.shape[-1])
        np.add.at(sums, rows, np.asarray(probs)[0])
        present = np.unique(rows)
        np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(init).sum(-1), 1.0, rtol=1e-5)

    def test_zero_count_edges_stay_zero(self):
        init, A, indices, probs, E = self._setup()
        probs = np.asarray(probs).copy()
        dead = 5
        probs[:, dead] = 0.0
        # renormalize the dead edge's source row over remaining out-edges
        src = np.asarray(indices)[:, 0]
        row = src == src[dead]
        probs[:, row] /= probs[:, row].sum(-1, keepdims=True)
        _, w_new, _ = sparse.sparse_em_step(
            init, indices, jnp.asarray(probs), E
        )
        assert float(np.asarray(w_new)[0, dead]) == 0.0


class TestSparseStreaming:
    """Blockwise sparse filter == whole-sequence sparse loglik (the
    streaming route past the dense (q, q) wall; VERDICT round-4 item 2)."""

    def test_blockwise_matches_whole(self):
        from hmm_layer_tpu import streaming

        trans = GenePredMultiTransitions(k=2)
        params = trans.init_params(KEY)
        init = trans.make_initial_distribution(params)
        indices, probs = trans.make_A_sparse(params)
        rng = np.random.default_rng(3)
        q = trans.num_states
        E = _emissions(rng, 1, 2, 48, q)

        ll_ref = sparse.sparse_log_likelihood(init, indices, probs, E)
        la_ref, _ = sparse.sparse_forward(init, indices, probs, E)

        state = streaming.sparse_streaming_init(
            init, indices, probs, E[:, :, :16]
        )
        for s0 in (16, 32):
            state = streaming.sparse_streaming_update(
                state, indices, probs, E[:, :, s0:s0 + 16]
            )
        np.testing.assert_allclose(
            np.asarray(streaming.streaming_log_likelihood(state)),
            np.asarray(ll_ref),
            rtol=1e-4,
        )
        # the carried filter equals the normalized last forward column
        np.testing.assert_allclose(
            np.asarray(streaming.streaming_filter_log_probs(state)),
            np.asarray(la_ref[:, :, -1] - ll_ref[..., None]),
            atol=1e-4,
        )

    def test_single_position_blocks(self):
        from hmm_layer_tpu import streaming

        trans = SimpleGenePredTransitions()
        params = trans.init_params(KEY)
        init = trans.make_initial_distribution(params)
        indices, probs = trans.make_A_sparse(params)
        rng = np.random.default_rng(4)
        E = _emissions(rng, 1, 3, 6, trans.num_states)
        ll_ref = sparse.sparse_log_likelihood(init, indices, probs, E)
        state = streaming.sparse_streaming_init(
            init, indices, probs, E[:, :, :1]
        )
        for t in range(1, 6):
            state = streaming.sparse_streaming_update(
                state, indices, probs, E[:, :, t:t + 1]
            )
        np.testing.assert_allclose(
            np.asarray(state.log_lik), np.asarray(ll_ref), rtol=1e-4
        )


class TestBlockedPosteriorBackward:
    """Time-blocked recompute backward (VERDICT round-4 item 3): same
    gamma-centered math as the fast adjoint, O(L/c) checkpoints instead of
    O(L·q) residuals."""

    def _setup(self, b=3, L=48, seed=9):
        trans = GenePredMultiTransitions(k=2)
        params = trans.init_params(jax.random.fold_in(KEY, seed))
        init = trans.make_initial_distribution(params)
        indices, probs = trans.make_A_sparse(params)
        rng = np.random.default_rng(seed)
        E = _emissions(rng, 1, b, L, trans.num_states)
        labels = rng.integers(0, trans.num_states, size=(1, b, L))
        return init, indices, probs, E, jnp.asarray(labels)

    @pytest.mark.parametrize(
        "L,block,no_loglik",
        [(48, 12, False), (48, 12, True), (48, 48, False), (64, 8, False)],
    )
    def test_grads_match_fast_path(self, L, block, no_loglik):
        init, indices, probs, E, labels = self._setup(L=L)

        def ce(pr, ini, e, blk):
            lg, ll = sparse.sparse_posterior(
                ini, indices, pr, e, no_loglik=no_loglik, backward_block=blk
            )
            return -jnp.mean(
                jnp.take_along_axis(lg, labels[..., None], -1)
            ) + 0.3 * jnp.mean(ll)

        v1, g1 = jax.value_and_grad(
            lambda *a: ce(*a, None), argnums=(0, 1, 2)
        )(probs, init, E)
        v2, g2 = jax.value_and_grad(
            lambda *a: ce(*a, block), argnums=(0, 1, 2)
        )(probs, init, E)
        assert float(v1) == float(v2)  # identical primal
        for a, b2 in zip(g1, g2):
            scale = np.abs(np.asarray(a)).max() + 1e-9
            np.testing.assert_allclose(
                np.asarray(b2) / scale, np.asarray(a) / scale, atol=5e-5
            )

    def test_indivisible_block_raises(self):
        init, indices, probs, E, labels = self._setup(L=48)
        with pytest.raises(ValueError, match="divide"):
            sparse.sparse_posterior(
                init, indices, probs, E, backward_block=13
            )

    def test_global_knob(self):
        init, indices, probs, E, labels = self._setup(L=24)
        prev = sparse.set_sparse_posterior_block(12)
        try:
            def ce(pr):
                lg, _ = sparse.sparse_posterior(init, indices, pr, E)
                return -jnp.mean(
                    jnp.take_along_axis(lg, labels[..., None], -1)
                )

            g = jax.grad(ce)(probs)
            assert np.all(np.isfinite(np.asarray(g)))
        finally:
            sparse.set_sparse_posterior_block(prev)


class TestFusedPosteriorCE:
    """Fused sparse posterior cross-entropy: exact vs the unfused path,
    without ever materializing the (m,b,L,q) posterior or its cotangent."""

    def _setup(self, b=3, L=48, seed=11):
        trans = GenePredMultiTransitions(k=2)
        params = trans.init_params(jax.random.fold_in(KEY, seed))
        init = trans.make_initial_distribution(params)
        indices, probs = trans.make_A_sparse(params)
        rng = np.random.default_rng(seed)
        E = _emissions(rng, 1, b, L, trans.num_states)
        labels = jnp.asarray(rng.integers(0, trans.num_states, (1, b, L)))
        mask = jnp.asarray(
            (rng.random((1, b, L)) > 0.3).astype(np.float32)
        )
        return init, indices, probs, E, labels, mask

    @pytest.mark.parametrize(
        "block,no_loglik,use_mask",
        [(None, False, False), (12, False, True), (12, True, False)],
    )
    def test_matches_unfused(self, block, no_loglik, use_mask):
        init, indices, probs, E, labels, mask = self._setup()
        mask = mask if use_mask else None

        def unfused(pr, ini, e):
            lg, _ = sparse.sparse_posterior(
                ini, indices, pr, e, no_loglik=no_loglik
            )
            ce = -jnp.take_along_axis(lg, labels[..., None], -1)[..., 0]
            if mask is not None:
                return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            return jnp.mean(ce)

        def fused(pr, ini, e):
            return sparse.sparse_posterior_cross_entropy(
                ini, indices, pr, e, labels, label_mask=mask,
                no_loglik=no_loglik, backward_block=block,
            )

        v1, g1 = jax.value_and_grad(unfused, argnums=(0, 1, 2))(
            probs, init, E
        )
        v2, g2 = jax.value_and_grad(fused, argnums=(0, 1, 2))(probs, init, E)
        assert abs(float(v1) - float(v2)) < 1e-6
        for a, b2 in zip(g1, g2):
            scale = np.abs(np.asarray(a)).max() + 1e-9
            np.testing.assert_allclose(
                np.asarray(b2) / scale, np.asarray(a) / scale, atol=5e-5
            )

    def test_layer_routes_sparse_ce(self):
        from hmm_layer_tpu.layer import HMMLayer

        trans = GenePredMultiTransitions(k=2, sparse_forward=True)
        q = trans.num_states

        class RawE:
            def init_params(self, key, input_dim):
                return {}

            def emissions(self, p, x, end_hints=None, training=False):
                return x

            def prior_log_density(self, p):
                return jnp.zeros((1,))

            def aux_loss(self, p):
                return jnp.zeros(())

        sparse_layer = HMMLayer(trans, RawE(), use_prior=False)
        dense_layer = HMMLayer(
            GenePredMultiTransitions(k=2), RawE(), use_prior=False
        )
        params = sparse_layer.init_params(KEY, input_dim=q)
        rng = np.random.default_rng(0)
        x = _emissions(rng, 1, 2, 20, q)
        labels = jnp.asarray(rng.integers(0, q, (1, 2, 20)))
        v_s, g_s = jax.value_and_grad(
            lambda p: sparse_layer.posterior_cross_entropy(p, x, labels)
        )(params)
        v_d, g_d = jax.value_and_grad(
            lambda p: dense_layer.posterior_cross_entropy(p, x, labels)
        )(params)
        assert abs(float(v_s) - float(v_d)) < 1e-4
        for a, b2 in zip(
            jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_s)
        ):
            scale = np.abs(np.asarray(a)).max() + 1e-9
            np.testing.assert_allclose(
                np.asarray(b2) / scale, np.asarray(a) / scale, atol=1e-4
            )


def test_fused_ce_soft_mask_gradient():
    """The mask is a real operand of the CE objective: a soft/learned
    label_mask must receive its true (nonzero) gradient from the fused
    path, identical to the unfused formula (review finding round 5)."""
    trans = GenePredMultiTransitions(k=2)
    params = trans.init_params(KEY)
    init = trans.make_initial_distribution(params)
    indices, probs = trans.make_A_sparse(params)
    rng = np.random.default_rng(0)
    q = trans.num_states
    E = _emissions(rng, 1, 3, 24, q)
    lab = jnp.asarray(rng.integers(0, q, (1, 3, 24)))
    mask = jnp.asarray(rng.uniform(0.2, 1.0, (1, 3, 24)), jnp.float32)

    def unfused(mk):
        lg, _ = sparse.sparse_posterior(init, indices, probs, E)
        ce = -jnp.take_along_axis(lg, lab[..., None], -1)[..., 0]
        return jnp.sum(ce * mk) / jnp.maximum(jnp.sum(mk), 1.0)

    def fused(mk):
        return sparse.sparse_posterior_cross_entropy(
            init, indices, probs, E, lab, label_mask=mk, backward_block=12
        )

    g1 = np.asarray(jax.grad(unfused)(mask))
    g2 = np.asarray(jax.grad(fused)(mask))
    assert np.abs(g1).max() > 0
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-8)


def test_taped_plus_backward_block_raises():
    trans = GenePredMultiTransitions(k=2)
    params = trans.init_params(KEY)
    init = trans.make_initial_distribution(params)
    indices, probs = trans.make_A_sparse(params)
    rng = np.random.default_rng(0)
    E = _emissions(rng, 1, 2, 12, trans.num_states)
    with pytest.raises(ValueError, match="analytic_vjp"):
        sparse.sparse_posterior(
            init, indices, probs, E, analytic_vjp=False, backward_block=6
        )


def test_dense_from_edge_probs_matches_scatter_oracle():
    """The scatter-free one-hot-matmul densify (the build that compiles at
    config-5 q where .at[].set crashes the axon compiler) is exact vs the
    scatter construction."""
    from hmm_layer_tpu.models.transition_utils import dense_from_edge_probs

    rng = np.random.default_rng(0)
    q, n = 23, 61
    idx = np.stack(
        [rng.integers(0, q, n), rng.integers(0, q, n)], axis=1
    )
    idx = np.unique(idx, axis=0)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (2, len(idx))), jnp.float32)
    got = np.asarray(dense_from_edge_probs(idx, w, q))
    oracle = np.zeros((2, q, q), np.float32)
    oracle[:, idx[:, 0], idx[:, 1]] = np.asarray(w)
    np.testing.assert_allclose(got, oracle, atol=1e-7)


def test_fused_ce_mask_gradient_with_active_clamp():
    """sum(mask) <= 1 activates the max(sum, 1) clamp: N is then constant
    and the quotient-rule -ce/N term must vanish (second review finding)."""
    trans = GenePredMultiTransitions(k=2)
    params = trans.init_params(KEY)
    init = trans.make_initial_distribution(params)
    indices, probs = trans.make_A_sparse(params)
    rng = np.random.default_rng(0)
    q = trans.num_states
    E = _emissions(rng, 1, 1, 8, q)
    lab = jnp.asarray(rng.integers(0, q, (1, 1, 8)))
    mask = jnp.zeros((1, 1, 8)).at[0, 0, 2].set(0.3).at[0, 0, 5].set(0.2)

    def unfused(mk):
        lg, _ = sparse.sparse_posterior(init, indices, probs, E)
        ce = -jnp.take_along_axis(lg, lab[..., None], -1)[..., 0]
        return jnp.sum(ce * mk) / jnp.maximum(jnp.sum(mk), 1.0)

    def fused(mk):
        return sparse.sparse_posterior_cross_entropy(
            init, indices, probs, E, lab, label_mask=mk, backward_block=4
        )

    g1 = np.asarray(jax.grad(unfused)(mask))
    g2 = np.asarray(jax.grad(fused)(mask))
    np.testing.assert_allclose(g2, g1, rtol=1e-5, atol=1e-7)


def test_masked_row_softmax_all_neg_inf_row_stays_finite():
    """A row whose edge logits are all -inf degrades to a uniform row over
    its edges (the old scatter build's behavior), not NaN."""
    from hmm_layer_tpu.models.transition_utils import (
        masked_row_softmax_from_edges,
    )

    idx = np.array([[0, 0], [0, 1], [1, 0], [1, 1]])
    vals = jnp.asarray([-np.inf, -np.inf, 0.3, 0.7], jnp.float32)
    A = np.asarray(masked_row_softmax_from_edges(idx, vals, 3))
    assert np.all(np.isfinite(A))
    np.testing.assert_allclose(A[0, :2], 0.5, atol=1e-6)
    np.testing.assert_allclose(A.sum(-1)[:2], 1.0, atol=1e-6)

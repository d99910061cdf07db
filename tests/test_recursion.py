"""Engine correctness: forward/backward/posterior/viterbi vs NumPy oracle,
sequential vs chunked parity, gradients, multi-model padding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.ops import recursion
from oracle import (
    backward_np,
    brute_force_loglik,
    brute_force_viterbi,
    forward_np,
    posterior_np,
    random_hmm,
    viterbi_np,
)

RNG = np.random.default_rng(0)


def _stack(init, A, E):
    """Lift single-model numpy HMM to engine shapes (m=1)."""
    return init[None], A[None], E[None]


class TestForwardSequential:
    def test_matches_oracle(self):
        init, A, E = random_hmm(RNG, q=5, L=40, b=3)
        la, ll = recursion.forward(*_stack(init, A, E))
        for i in range(3):
            la_np, ll_np = forward_np(init, A, E[i])
            np.testing.assert_allclose(la[0, i], la_np, rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(ll[0, i], ll_np, rtol=1e-4)

    def test_matches_brute_force(self):
        init, A, E = random_hmm(RNG, q=3, L=6, b=1)
        _, ll = recursion.forward(*_stack(init, A, E))
        ll_bf = brute_force_loglik(init.astype(np.float64), A.astype(np.float64), E[0].astype(np.float64))
        np.testing.assert_allclose(ll[0, 0], ll_bf, rtol=1e-4)

    def test_long_sequence_stable(self):
        init, A, E = random_hmm(RNG, q=8, L=5000, b=2)
        la, ll = recursion.forward(*_stack(init, A, E))
        assert np.all(np.isfinite(ll))
        assert np.all(np.isfinite(la))


class TestBackward:
    def test_matches_oracle(self):
        init, A, E = random_hmm(RNG, q=5, L=30, b=2)
        lb = recursion.backward(*_stack(init, A, E))
        for i in range(2):
            lb_np = backward_np(A, E[i])
            np.testing.assert_allclose(lb[0, i], lb_np, rtol=2e-3, atol=2e-3)

    def test_forward_backward_identity(self):
        """logsumexp(alpha_t + beta_t) == loglik at every t."""
        init, A, E = random_hmm(RNG, q=6, L=25, b=2)
        la, ll = recursion.forward(*_stack(init, A, E))
        lb = recursion.backward(*_stack(init, A, E))
        check = jax.nn.logsumexp(la + lb, axis=-1)  # (1, b, L)
        np.testing.assert_allclose(
            check, np.broadcast_to(np.asarray(ll)[..., None], check.shape), rtol=1e-4
        )


class TestPosterior:
    def test_matches_oracle(self):
        init, A, E = random_hmm(RNG, q=5, L=30, b=2)
        lg, ll = recursion.posterior(*_stack(init, A, E))
        for i in range(2):
            lg_np, ll_np = posterior_np(init, A, E[i])
            np.testing.assert_allclose(lg[0, i], lg_np, rtol=2e-3, atol=2e-3)

    def test_normalized(self):
        init, A, E = random_hmm(RNG, q=7, L=50, b=3)
        lg, _ = recursion.posterior(*_stack(init, A, E))
        sums = jax.nn.logsumexp(lg, axis=-1)
        np.testing.assert_allclose(sums, np.zeros_like(sums), atol=1e-4)

    @pytest.mark.parametrize("P", [1, 5])
    def test_no_loglik(self, P):
        init, A, E = random_hmm(RNG, q=4, L=10, b=1)
        lg, ll = recursion.posterior(*_stack(init, A, E), parallel_factor=P, no_loglik=True)
        lg2, _ = recursion.posterior(*_stack(init, A, E), parallel_factor=P)
        np.testing.assert_allclose(lg - ll[..., None, None], lg2, rtol=1e-4, atol=1e-5)

    def test_no_loglik_pallas(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = random_hmm(RNG, q=8, L=12, b=2)
        lg, ll = recursion.posterior(*_stack(init, A, E), parallel_factor=4, no_loglik=True)
        lg1, ll1 = recursion.posterior(*_stack(init, A, E), parallel_factor=1, no_loglik=True)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll1), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lg1), rtol=1e-3, atol=1e-3
        )


class TestChunkedParity:
    @pytest.mark.parametrize("P", [2, 4, 8])
    def test_forward_parity(self, P):
        init, A, E = random_hmm(RNG, q=5, L=64, b=2)
        la1, ll1 = recursion.forward(*_stack(init, A, E), parallel_factor=1)
        laP, llP = recursion.forward(*_stack(init, A, E), parallel_factor=P)
        np.testing.assert_allclose(ll1, llP, rtol=1e-4)
        np.testing.assert_allclose(la1, laP, rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("P", [2, 4, 8])
    def test_backward_parity(self, P):
        init, A, E = random_hmm(RNG, q=5, L=64, b=2)
        lb1 = recursion.backward(*_stack(init, A, E), parallel_factor=1)
        lbP = recursion.backward(*_stack(init, A, E), parallel_factor=P)
        np.testing.assert_allclose(lb1, lbP, rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("P", [3, 11])
    def test_posterior_parity_uneven_q(self, P):
        # 99 = 3 * 33 = 11 * 9; chunk sizes not powers of two.
        init, A, E = random_hmm(RNG, q=9, L=99, b=2)
        lg1, ll1 = recursion.posterior(*_stack(init, A, E), parallel_factor=1)
        lgP, llP = recursion.posterior(*_stack(init, A, E), parallel_factor=P)
        np.testing.assert_allclose(ll1, llP, rtol=1e-4)
        np.testing.assert_allclose(lg1, lgP, rtol=1e-3, atol=1e-3)

    def test_loglik_only_path(self):
        init, A, E = random_hmm(RNG, q=5, L=60, b=2)
        ll1 = recursion.log_likelihood(*_stack(init, A, E), parallel_factor=1)
        llP = recursion.log_likelihood(*_stack(init, A, E), parallel_factor=6)
        np.testing.assert_allclose(ll1, llP, rtol=1e-4)

    def test_indivisible_factor_raises(self):
        init, A, E = random_hmm(RNG, q=4, L=10, b=1)
        with pytest.raises(ValueError):
            recursion.forward(*_stack(init, A, E), parallel_factor=3)


class TestViterbi:
    def test_matches_np_viterbi(self):
        init, A, E = random_hmm(RNG, q=5, L=40, b=3, peaked=True)
        paths = recursion.viterbi(*_stack(init, A, E))
        for i in range(3):
            np.testing.assert_array_equal(paths[0, i], viterbi_np(init, A, E[i]))

    def test_matches_brute_force(self):
        init, A, E = random_hmm(RNG, q=3, L=5, b=1, peaked=True)
        paths = recursion.viterbi(*_stack(init, A, E))
        bf_path, _ = brute_force_viterbi(
            init.astype(np.float64), A.astype(np.float64), E[0].astype(np.float64)
        )
        np.testing.assert_array_equal(paths[0, 0], bf_path)

    @pytest.mark.parametrize("P", [2, 4, 8])
    def test_chunked_matches_sequential(self, P):
        init, A, E = random_hmm(RNG, q=5, L=64, b=3, peaked=True)
        p1 = recursion.viterbi(*_stack(init, A, E), parallel_factor=1)
        pP = recursion.viterbi(*_stack(init, A, E), parallel_factor=P)
        np.testing.assert_array_equal(p1, pP)

    def test_chunked_matches_oracle_uneven(self):
        init, A, E = random_hmm(RNG, q=7, L=99, b=2, peaked=True)
        paths = recursion.viterbi(*_stack(init, A, E), parallel_factor=11)
        for i in range(2):
            np.testing.assert_array_equal(paths[0, i], viterbi_np(init, A, E[i]))

    def test_pallas_sum_product_dispatch(self, monkeypatch):
        # Posterior + loglik through the Pallas sum-product kernels
        # (interpreter mode) vs the sequential recursion, including
        # gradient flow through the analytic custom_vjp adjoints.
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = random_hmm(RNG, q=15, L=64, b=3)
        ini, Aj, Ej = _stack(init, A, E)

        lg1, ll1 = recursion.posterior(ini, Aj, Ej, parallel_factor=1)
        lgP, llP = recursion.posterior(ini, Aj, Ej, parallel_factor=8)
        np.testing.assert_allclose(np.asarray(llP), np.asarray(ll1), rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(lgP), np.asarray(lg1), rtol=1e-3, atol=2e-3
        )
        llo = recursion.log_likelihood(ini, Aj, Ej, parallel_factor=8)
        np.testing.assert_allclose(np.asarray(llo), np.asarray(ll1), rtol=2e-4)

        def loss(e, pf):
            lg, ll = recursion.posterior(ini, Aj, e, parallel_factor=pf)
            return jnp.sum(lg * lg) + jnp.sum(ll)

        g1 = jax.grad(lambda e: loss(e, 1))(Ej)
        gP = jax.grad(lambda e: loss(e, 8))(Ej)
        # The chunked path uses the analytic adjoint VJP; its f32 noise is
        # ~1e-4 of the gradient scale (measured vs an f64 oracle — autodiff
        # itself sits at ~1e-5), so compare scale-normalized.
        scale = np.abs(np.asarray(g1)).max()
        np.testing.assert_allclose(
            np.asarray(gP) / scale, np.asarray(g1) / scale, atol=5e-4
        )

    def test_pallas_dispatch_matches_sequential(self, monkeypatch):
        # Route the chunked decode through the Pallas TPU kernel in
        # interpreter mode (the CPU test platform never takes this path
        # otherwise) and check exact parity with the sequential backtrace.
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = random_hmm(RNG, q=15, L=64, b=3, peaked=True)
        p1 = recursion.viterbi(*_stack(init, A, E), parallel_factor=1)
        pP = recursion.viterbi(*_stack(init, A, E), parallel_factor=8)
        np.testing.assert_array_equal(p1, pP)


class TestGradients:
    @pytest.mark.parametrize("force_pallas", [False, True])
    def test_chunked_loglik_analytic_vjp(self, monkeypatch, force_pallas):
        # The chunked loglik uses an analytic Baum-Welch VJP; it must match
        # autodiff of the sequential recursion for init, A and E cotangents,
        # through both the XLA and the Pallas (interpret) primal.
        if force_pallas:
            from hmm_layer_tpu.ops import pallas_viterbi

            monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = random_hmm(RNG, q=6, L=24, b=3)
        # Structurally-forbidden transitions (gene-pred/Plan7 grammars have
        # many): A is unclamped in the recursion, so even exact zeros carry
        # their true nonzero gradient — the analytic VJP must match.
        A = A.copy()
        A[0, 3] = 0.0
        A[4, 1] = 0.0
        A = A / A.sum(-1, keepdims=True)
        ini, Aj, Ej = _stack(init, A, E)
        ct = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 3)).astype(np.float32)
        )

        def f(pf):
            def inner(i, a, e):
                return jnp.sum(recursion.log_likelihood(i, a, e, pf) * ct)

            return jax.grad(inner, argnums=(0, 1, 2))(ini, Aj, Ej)

        g_ref = f(1)
        g_chunk = f(4)
        for a, r in zip(g_chunk, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-4
            )

    @pytest.mark.parametrize("force_pallas", [False, True])
    def test_chunked_forward_backward_vjp(self, monkeypatch, force_pallas):
        # forward()/backward() chunked also carry analytic adjoint VJPs.
        if force_pallas:
            from hmm_layer_tpu.ops import pallas_viterbi

            monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = random_hmm(RNG, q=6, L=24, b=2)
        ini, Aj, Ej = _stack(init, A, E)
        w = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 2, 24, 6)).astype(np.float32)
        )

        def f_loss(pf):
            def inner(i, a, e):
                la, ll = recursion.forward(i, a, e, pf)
                return jnp.sum(la * w) + 0.3 * jnp.sum(ll)

            return jax.grad(inner, argnums=(0, 1, 2))(ini, Aj, Ej)

        def b_loss(pf):
            def inner(i, a, e):
                return jnp.sum(recursion.backward(i, a, e, pf) * w)

            return jax.grad(inner, argnums=(0, 1, 2))(ini, Aj, Ej)

        for fn in (f_loss, b_loss):
            g1, gP = fn(1), fn(4)
            for a, r in zip(gP, g1):
                scale = np.abs(np.asarray(r)).max() + 1e-9
                np.testing.assert_allclose(
                    np.asarray(a) / scale, np.asarray(r) / scale, atol=5e-4
                )

    def test_loglik_grad_matches_fd(self):
        init, A, E = random_hmm(RNG, q=3, L=8, b=1)

        def loss(logits_A):
            A_ = jax.nn.softmax(logits_A, axis=-1)
            return recursion.log_likelihood(init[None], A_[None], E[None]).sum()

        logits = jnp.log(jnp.asarray(A))
        g = jax.grad(loss)(logits)
        eps = 1e-3
        for idx in [(0, 1), (2, 2)]:
            lp = loss(logits.at[idx].add(eps))
            lm = loss(logits.at[idx].add(-eps))
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-4)

    def test_chunked_grad_matches_sequential_grad(self):
        init, A, E = random_hmm(RNG, q=4, L=24, b=2)

        def loss(E_, pf):
            return recursion.log_likelihood(init[None], A[None], E_[None], parallel_factor=pf).sum()

        g1 = jax.grad(loss)(jnp.asarray(E), 1)
        gP = jax.grad(loss)(jnp.asarray(E), 4)
        np.testing.assert_allclose(g1, gP, rtol=1e-3, atol=1e-4)


class TestMultiModelPadding:
    def test_padded_states_ignored(self):
        """A 3-state model padded to q=5 must give the same loglik."""
        init, A, E = random_hmm(RNG, q=3, L=12, b=2)
        q_pad = 5
        init_p = np.zeros(q_pad, np.float32)
        init_p[:3] = init
        A_p = np.zeros((q_pad, q_pad), np.float32)
        A_p[:3, :3] = A
        E_p = np.zeros((2, 12, q_pad), np.float32)
        E_p[..., :3] = E
        _, ll = recursion.forward(*_stack(init, A, E))
        _, ll_p = recursion.forward(*_stack(init_p, A_p, E_p))
        np.testing.assert_allclose(ll, ll_p, rtol=1e-4)

    def test_padded_chunked(self):
        init, A, E = random_hmm(RNG, q=3, L=16, b=2)
        q_pad = 6
        init_p = np.zeros(q_pad, np.float32)
        init_p[:3] = init
        A_p = np.zeros((q_pad, q_pad), np.float32)
        A_p[:3, :3] = A
        E_p = np.zeros((2, 16, q_pad), np.float32)
        E_p[..., :3] = E
        ll = recursion.log_likelihood(*_stack(init, A, E))
        ll_p = recursion.log_likelihood(*_stack(init_p, A_p, E_p), parallel_factor=4)
        np.testing.assert_allclose(ll, ll_p, rtol=1e-4)


class TestStreaming:
    def test_blockwise_matches_dense(self):
        from hmm_layer_tpu import streaming

        init, A, E = random_hmm(RNG, q=6, L=96, b=3)
        ini, Aj, Ej = _stack(init, A, E)
        ll_ref = recursion.log_likelihood(ini, Aj, Ej)
        la_ref, _ = recursion.forward(ini, Aj, Ej)

        st = streaming.streaming_init(ini, Aj, Ej[:, :, :32], parallel_factor=4)
        st = streaming.streaming_update(st, Aj, Ej[:, :, 32:80], parallel_factor=4)
        st = streaming.streaming_update(st, Aj, Ej[:, :, 80:])
        np.testing.assert_allclose(
            np.asarray(streaming.streaming_log_likelihood(st)),
            np.asarray(ll_ref),
            rtol=1e-4,
        )
        # Filter == dense log-forward at the last position, normalized.
        f = streaming.streaming_filter_log_probs(st)
        np.testing.assert_allclose(
            np.asarray(f),
            np.asarray(la_ref[:, :, -1] - ll_ref[..., None]),
            rtol=1e-3,
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(jax.nn.logsumexp(f, axis=-1)), 0.0, atol=1e-5
        )


class TestBaumWelch:
    def test_xi_matches_brute_force(self):
        from hmm_layer_tpu.ops import em
        from oracle import posterior_np
        from itertools import product

        init, A, E = random_hmm(RNG, q=3, L=5, b=1)
        gamma, xi_sum, ll = em.expected_statistics(*_stack(init, A, E))
        # brute force: enumerate all paths in f64
        q, L = 3, 5
        joint = np.zeros((q,) * L)
        for path in product(range(q), repeat=L):
            p = init[path[0]] * E[0, 0, path[0]]
            for t in range(1, L):
                p *= A[path[t - 1], path[t]] * E[0, t, path[t]]
            joint[path] = p
        Z = joint.sum()
        xi_bf = np.zeros((q, q))
        for t in range(1, L):
            marg = joint.sum(
                axis=tuple(k for k in range(L) if k not in (t - 1, t))
            )
            xi_bf += marg / Z
        np.testing.assert_allclose(np.asarray(xi_sum[0]), xi_bf, rtol=1e-4)
        gam_np, _ = posterior_np(init, A, E[0])
        np.testing.assert_allclose(
            np.asarray(gamma[0, 0]), np.exp(gam_np), rtol=1e-3, atol=1e-4
        )

    @pytest.mark.parametrize("P", [1, 4])
    def test_em_monotonic(self, P):
        from hmm_layer_tpu.ops import em

        init, A, E = random_hmm(RNG, q=4, L=32, b=3)
        ini, Aj, Ej = _stack(init, A, E)
        lls = []
        for _ in range(5):
            ini, Aj, ll = em.em_step(ini, Aj, Ej, parallel_factor=P)
            lls.append(float(np.asarray(ll).sum()))
        assert all(b2 >= a2 - 1e-3 for a2, b2 in zip(lls, lls[1:])), lls
        # updates stay stochastic
        np.testing.assert_allclose(np.asarray(Aj).sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ini).sum(-1), 1.0, rtol=1e-5)

    def test_structural_zeros_preserved(self):
        from hmm_layer_tpu.ops import em

        init, A, E = random_hmm(RNG, q=4, L=16, b=2)
        A = A.copy()
        A[0, 2] = 0.0
        A = A / A.sum(-1, keepdims=True)
        ini, Aj, _ = em.em_step(*_stack(init, A, E))
        assert float(np.asarray(Aj)[0, 0, 2]) == 0.0


class TestPallasAffineAdjoint:
    def test_matches_xla_solver(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi, recursion as rec

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        rng = np.random.default_rng(3)
        m, b, L, q, P = 2, 3, 24, 5, 4
        B = rng.dirichlet(np.ones(q), size=(m, q)).astype(np.float32)
        u = rng.uniform(0, 1, (m, b, L, q)).astype(np.float32)
        v = rng.uniform(0, 1, (m, b, L, q)).astype(np.float32)
        v[:, :, -1] = 0.0  # terminal condition x_L = 0
        s = rng.normal(size=(m, b, L, q)).astype(np.float32)
        args = tuple(map(jnp.asarray, (B, u, v, s)))
        x_pl = rec._chunked_affine_reverse(*args, P)
        monkeypatch.setattr(rec, "_use_pallas_affine", lambda q: False)
        x_xla = rec._chunked_affine_reverse(*args, P)
        np.testing.assert_allclose(
            np.asarray(x_pl), np.asarray(x_xla), rtol=1e-5, atol=1e-6
        )

    def test_single_chunk_and_q15(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi, recursion as rec

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        rng = np.random.default_rng(4)
        for q, P, L in ((15, 1, 6), (3, 6, 6)):
            B = rng.dirichlet(np.ones(q), size=(1, q)).astype(np.float32)
            u = rng.uniform(0, 1, (1, 2, L, q)).astype(np.float32)
            v = rng.uniform(0, 1, (1, 2, L, q)).astype(np.float32)
            v[:, :, -1] = 0.0
            s = rng.normal(size=(1, 2, L, q)).astype(np.float32)
            args = tuple(map(jnp.asarray, (B, u, v, s)))
            x_pl = rec._chunked_affine_reverse(*args, P)
            with pytest.MonkeyPatch.context() as mp:
                mp.setattr(rec, "_use_pallas_affine", lambda q: False)
                x_xla = rec._chunked_affine_reverse(*args, P)
            np.testing.assert_allclose(
                np.asarray(x_pl), np.asarray(x_xla), rtol=1e-5, atol=1e-6
            )

    def test_grad_posterior_through_pallas_adjoint(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = random_hmm(RNG, q=5, L=24, b=2)
        ini, Aj, Ej = _stack(init, A, E)
        w = jnp.asarray(
            np.random.default_rng(5).normal(size=(1, 2, 24, 5)).astype(np.float32)
        )

        def loss(P):
            def f(A_, E_):
                lg, ll = recursion.posterior(ini, A_, E_, parallel_factor=P)
                return jnp.sum(w * lg)
            return f

        gA_p, gE_p = jax.grad(loss(4), argnums=(0, 1))(Aj, Ej)
        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", False)
        gA_x, gE_x = jax.grad(loss(4), argnums=(0, 1))(Aj, Ej)
        gA_1, gE_1 = jax.grad(loss(1), argnums=(0, 1))(Aj, Ej)
        for got, ref in ((gA_p, gA_x), (gE_p, gE_x)):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
            )
        scale = float(jnp.abs(gA_1).max())
        np.testing.assert_allclose(
            np.asarray(gA_p) / scale, np.asarray(gA_1) / scale, atol=1e-4
        )


class TestPosteriorSampling:
    def _marginals(self, paths, q):
        # paths (m, b, S, L) -> empirical per-position state frequencies
        oh = np.eye(q)[np.asarray(paths)]  # (m, b, S, L, q)
        return oh.mean(axis=2)[0, 0]  # (L, q)

    @pytest.mark.parametrize("P", [1, 4])
    def test_marginals_match_posterior(self, P):
        from hmm_layer_tpu.ops import sampling
        from oracle import posterior_np

        init, A, E = random_hmm(RNG, q=3, L=8, b=1)
        key = jax.random.PRNGKey(0)
        S = 4000
        paths = jax.jit(
            lambda *a: sampling.sample_posterior(
                *a, num_samples=S, parallel_factor=P
            )
        )(*_stack(init, A, E), key)
        assert paths.shape == (1, 1, S, 8)
        emp = self._marginals(paths, 3)
        gam, _ = posterior_np(init, A, E[0])
        np.testing.assert_allclose(emp, np.exp(gam), atol=4.5 / np.sqrt(S))

    def test_pair_frequencies_match_xi(self):
        from hmm_layer_tpu.ops import em, sampling

        init, A, E = random_hmm(RNG, q=3, L=6, b=1)
        _, xi_sum, _ = em.expected_statistics(*_stack(init, A, E))
        S = 4000
        paths = np.asarray(
            jax.jit(
                lambda *a: sampling.sample_posterior(
                    *a, num_samples=S, parallel_factor=2
                )
            )(*_stack(init, A, E), jax.random.PRNGKey(1))
        )[0, 0]
        counts = np.zeros((3, 3))
        for t in range(5):
            np.add.at(counts, (paths[:, t], paths[:, t + 1]), 1.0)
        np.testing.assert_allclose(
            counts / S, np.asarray(xi_sum[0]), atol=5 * np.sqrt(5) / np.sqrt(S)
        )

    def test_structural_zeros_never_sampled(self):
        from hmm_layer_tpu.ops import sampling

        init, A, E = random_hmm(RNG, q=4, L=16, b=2)
        A = A.copy()
        A[1, :] = 0.0
        A[1, 2] = 1.0  # state 1 can only go to state 2
        for P in (1, 4):
            paths = np.asarray(
                sampling.sample_posterior(
                    *_stack(init, A, E),
                    jax.random.PRNGKey(2),
                    num_samples=64,
                    parallel_factor=P,
                )
            )
            pre = paths[..., :-1]
            nxt = paths[..., 1:]
            assert np.all(nxt[pre == 1] == 2), f"P={P}"

    def test_boundary_masks_are_exact(self):
        """The chunk-boundary FFBS factors must be HARD-masked where the
        structure forbids them — the EPS-clamped summary scan only
        soft-floors impossible entries of C/T (regression for the
        boundary-pass exactness gap)."""
        from hmm_layer_tpu.ops import sampling

        # Deterministic 3-cycle: at position t only state t mod 3 is
        # reachable; chunk length c=4 is coprime to the period.
        q, L, P, b = 3, 16, 4, 2
        c = L // P
        A = np.zeros((1, q, q), np.float32)
        A[0, 0, 1] = A[0, 1, 2] = A[0, 2, 0] = 1.0
        init = np.zeros((1, q), np.float32)
        init[0, 0] = 1.0
        rng2 = np.random.default_rng(5)
        E = rng2.uniform(0.2, 1.0, (1, b, L, q)).astype(np.float32)

        reach_c, fmask = sampling._boundary_masks(
            jnp.asarray(init), jnp.asarray(A), P, c
        )
        # A^c support for the cycle: i -> (i + c) mod 3, one entry per row.
        expect = np.zeros((q, q), bool)
        for i in range(q):
            expect[i, (i + c) % q] = True
        np.testing.assert_array_equal(np.asarray(reach_c[0]), expect)
        # Chunk p ends at position (p+1)*c - 1; only state ((p+1)*c-1) % 3
        # is forward-reachable there.
        fm = np.asarray(fmask[:, 0])
        for p in range(P):
            pos = (p + 1) * c - 1
            want = np.zeros(q, bool)
            want[pos % q] = True
            np.testing.assert_array_equal(fm[p], want, err_msg=f"p={p}")

        # End-to-end: every sampled path follows the cycle exactly.
        paths = np.asarray(
            sampling.sample_posterior(
                jnp.asarray(init),
                jnp.asarray(A),
                jnp.asarray(E),
                jax.random.PRNGKey(3),
                num_samples=16,
                parallel_factor=P,
            )
        )
        want = (np.arange(L) % q)[None, None, None]
        np.testing.assert_array_equal(paths, np.broadcast_to(want, paths.shape))

    @pytest.mark.parametrize("P", [1, 2])
    def test_joint_path_distribution_exact(self, P):
        from hmm_layer_tpu.ops import sampling
        from itertools import product

        init, A, E = random_hmm(RNG, q=2, L=4, b=1)
        probs = {}
        for path in product(range(2), repeat=4):
            p = init[path[0]] * E[0, 0, path[0]]
            for t in range(1, 4):
                p *= A[path[t - 1], path[t]] * E[0, t, path[t]]
            probs[path] = p
        Z = sum(probs.values())
        S = 8000
        paths = np.asarray(
            jax.jit(
                lambda *a: sampling.sample_posterior(
                    *a, num_samples=S, parallel_factor=P
                )
            )(*_stack(init, A, E), jax.random.PRNGKey(3))
        )[0, 0]
        for path, p in probs.items():
            emp = np.mean(np.all(paths == np.array(path), axis=-1))
            np.testing.assert_allclose(
                emp, p / Z, atol=4.5 * np.sqrt(0.25 / S)
            ), path


class TestMultiModelPallas:
    """Multi-model (m > 1) dispatch through the vmapped Pallas kernels —
    the model axis becomes a leading grid dimension. Covers the
    fit_select-style workload (n gene-pred models trained jointly)."""

    def _stack_m(self, m, q, L, b, peaked=False, seed=11):
        rng = np.random.default_rng(seed)
        hmms = [random_hmm(rng, q=q, L=L, b=b, peaked=peaked) for _ in range(m)]
        init = np.stack([h[0] for h in hmms])
        A = np.stack([h[1] for h in hmms])
        E = np.stack([h[2] for h in hmms])
        return jnp.asarray(init), jnp.asarray(A), jnp.asarray(E)

    def test_posterior_loglik_m3(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = self._stack_m(3, q=15, L=32, b=2)
        assert recursion._use_pallas(15, 3)
        lg1, ll1 = recursion.posterior(init, A, E, parallel_factor=1)
        lgP, llP = recursion.posterior(init, A, E, parallel_factor=4)
        np.testing.assert_allclose(np.asarray(llP), np.asarray(ll1), rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(lgP), np.asarray(lg1), rtol=1e-3, atol=2e-3
        )
        llo = recursion.log_likelihood(init, A, E, parallel_factor=4)
        np.testing.assert_allclose(np.asarray(llo), np.asarray(ll1), rtol=2e-4)

    def test_viterbi_m3(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = self._stack_m(3, q=15, L=32, b=2, peaked=True)
        p1 = recursion.viterbi(init, A, E, parallel_factor=1)
        pP = recursion.viterbi(init, A, E, parallel_factor=4)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(pP))

    def test_gradients_m2(self, monkeypatch):
        # Analytic VJPs (incl. the vmapped Pallas adjoint solves, which the
        # posterior VJP drives at 2m stacked models) vs sequential autodiff.
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        init, A, E = self._stack_m(2, q=15, L=24, b=2)

        def loss(e, pf):
            lg, ll = recursion.posterior(init, A, e, parallel_factor=pf)
            return jnp.sum(lg * lg) + jnp.sum(ll)

        g1 = jax.grad(lambda e: loss(e, 1))(E)
        gP = jax.grad(lambda e: loss(e, 4))(E)
        scale = np.abs(np.asarray(g1)).max()
        np.testing.assert_allclose(
            np.asarray(gP) / scale, np.asarray(g1) / scale, atol=5e-4
        )


class TestBlockedViterbiDecode:
    """Sequential Pallas delta/backtrace decode for 16 < q <= 64 (blocked
    multi-sublane-tile states). The tropical semiring has no MXU mapping,
    so this is the large-q decode fast path on TPU."""

    @pytest.mark.parametrize("q", [17, 33, 64])
    def test_matches_xla_sequential(self, monkeypatch, q):
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        rng = np.random.default_rng(q)
        init, A, E = random_hmm(rng, q=q, L=37, b=3, peaked=True)
        ini, Aj, Ej = init[None], A[None], E[None]
        assert recursion._use_pallas_seq_viterbi(q)
        ref = recursion._viterbi_seq(
            jnp.asarray(ini), jnp.asarray(Aj), jnp.asarray(Ej)
        )
        got = recursion.viterbi(jnp.asarray(ini), jnp.asarray(Aj), jnp.asarray(Ej))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # parallel_factor > 1 routes to the same decode at these q.
        got_p = recursion.viterbi(
            jnp.asarray(ini), jnp.asarray(Aj), jnp.asarray(Ej), parallel_factor=4
        )
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref))

    def test_multi_model_and_sparse_transitions(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        rng = np.random.default_rng(3)
        m, q, b, L = 3, 33, 2, 24
        init = rng.dirichlet(np.ones(q), size=m).astype(np.float32)
        A = rng.dirichlet(np.ones(q), size=(m, q)).astype(np.float32)
        A[:, :, q // 2] = 0.0  # structural zeros (grammar-like sparsity)
        A = A / A.sum(-1, keepdims=True)
        E = rng.dirichlet(np.ones(q) * 0.1, size=(m, b, L)).astype(np.float32)
        ref = recursion._viterbi_seq(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E)
        )
        got = recursion.viterbi(jnp.asarray(init), jnp.asarray(A), jnp.asarray(E))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_flat_ties_match_argmax_semantics(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        q, b, L = 20, 2, 9
        init = np.full((1, q), 1.0 / q, np.float32)
        A = np.full((1, q, q), 1.0 / q, np.float32)
        E = np.full((1, b, L, q), 0.5, np.float32)
        ref = recursion._viterbi_seq(
            jnp.asarray(init), jnp.asarray(A), jnp.asarray(E)
        )
        got = recursion.viterbi(jnp.asarray(init), jnp.asarray(A), jnp.asarray(E))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestStreamingViterbi:
    """Bounded-lag online decode: block-streamed fixed-lag Viterbi with
    decision-feedback seam conditioning."""

    def test_zero_lag_rejected(self):
        """lag=0 would leave an empty buffer that finalize cannot decode
        (regression: IndexError deep in the window decode)."""
        from hmm_layer_tpu import streaming

        rng = np.random.default_rng(0)
        init, A, E = random_hmm(rng, q=3, L=8, b=1)
        with pytest.raises(ValueError, match="lag"):
            streaming.streaming_viterbi_init(
                init[None], A[None], E[None], lag=0
            )

    def _decode_streamed(self, init, A, E, block, lag):
        from hmm_layer_tpu import streaming

        L = E.shape[2]
        state, out0 = streaming.streaming_viterbi_init(
            init, A, E[:, :, :block], lag
        )
        outs = [np.asarray(out0)]
        for s in range(block, L, block):
            state, out = streaming.streaming_viterbi_update(
                state, init, A, E[:, :, s : s + block]
            )
            outs.append(np.asarray(out))
        outs.append(
            np.asarray(streaming.streaming_viterbi_finalize(state, init, A))
        )
        return np.concatenate(outs, axis=-1)

    def test_matches_offline_with_sufficient_lag(self):
        init, A, E = random_hmm(RNG, q=5, L=96, b=3, peaked=True)
        ini, Aj, Ej = map(jnp.asarray, _stack(init, A, E))
        offline = np.asarray(recursion.viterbi(ini, Aj, Ej))
        streamed = self._decode_streamed(ini, Aj, Ej, block=24, lag=16)
        np.testing.assert_array_equal(streamed, offline)

    def test_first_block_equals_lag(self):
        # n_commit == 0 in init: everything buffered, stream still correct.
        init, A, E = random_hmm(RNG, q=4, L=48, b=2, peaked=True)
        ini, Aj, Ej = map(jnp.asarray, _stack(init, A, E))
        offline = np.asarray(recursion.viterbi(ini, Aj, Ej))
        streamed = self._decode_streamed(ini, Aj, Ej, block=12, lag=12)
        np.testing.assert_array_equal(streamed, offline)

    def test_small_lag_still_valid_path(self):
        # With an aggressive lag the decode may deviate from the offline
        # optimum, but every emitted transition must remain valid (the
        # decision-feedback conditioning guarantee).
        init, A, E = random_hmm(RNG, q=6, L=64, b=2)
        A = A.copy()
        A[0, 4] = 0.0
        A[2, 5] = 0.0
        A = A / A.sum(-1, keepdims=True)
        ini, Aj, Ej = map(jnp.asarray, _stack(init, A, E))
        streamed = self._decode_streamed(ini, Aj, Ej, block=16, lag=2)
        pre, nxt = streamed[..., :-1], streamed[..., 1:]
        probs = A[pre, nxt]
        assert (probs > 0).all()

    def test_score_near_optimal_small_lag(self):
        init, A, E = random_hmm(RNG, q=5, L=80, b=2, peaked=True)
        ini, Aj, Ej = map(jnp.asarray, _stack(init, A, E))
        offline = np.asarray(recursion.viterbi(ini, Aj, Ej))
        streamed = self._decode_streamed(ini, Aj, Ej, block=20, lag=4)

        def score(paths):
            lp = np.log(np.maximum(init[paths[0, :, 0]], 1e-30))
            lp = lp + np.log(
                np.maximum(
                    E[np.arange(2)[:, None], np.arange(80)[None], paths[0]], 1e-30
                )
            ).sum(-1)
            lp = lp + np.log(
                np.maximum(A[paths[0, :, :-1], paths[0, :, 1:]], 1e-30)
            ).sum(-1)
            return lp

        s_off, s_str = score(offline), score(streamed)
        assert (s_str <= s_off + 1e-3).all()
        assert (s_str >= s_off - 2.0).all()  # near-optimal


class TestMxuSummaryKernel:
    """Flag-gated MXU formulation of the chunk-summary scan (dormant until
    the axon toolchain stops hanging on in-kernel dot_general). Parity in
    interpreter mode."""

    @pytest.mark.parametrize("q", [17, 33, 64])
    def test_matches_xla_summaries(self, q):
        from hmm_layer_tpu.ops import pallas_mxu

        rng = np.random.default_rng(q)
        m, b, L, Pf = 1, 3, 24, 4
        A = jnp.asarray(rng.dirichlet(np.ones(q), size=(m, q)).astype(np.float32))
        E = jnp.asarray(
            rng.uniform(0.05, 1.0, size=(m, b, L, q)).astype(np.float32)
        )
        C_ref, _ = recursion._chunk_summaries(A, E, Pf)
        Ec, _ = recursion._split_chunks(E, Pf)
        E_S = jnp.moveaxis(Ec, 2, 1)[0]  # (c, bP, q)
        C = pallas_mxu.sum_chunk_summaries_mxu(A[0], E_S, Pf, interpret=True)
        C = jnp.moveaxis(C.reshape(b, Pf, q, q), 1, 0)  # (P, b, q, q)
        np.testing.assert_allclose(
            np.asarray(C), np.asarray(C_ref[:, 0]), rtol=2e-4, atol=2e-4
        )

    def test_flagged_dispatch_loglik(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_mxu, pallas_viterbi

        monkeypatch.setattr(pallas_mxu, "MXU_KERNELS", True)
        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        rng = np.random.default_rng(1)
        q, b, L = 33, 2, 24
        init = jnp.asarray(rng.dirichlet(np.ones(q), size=1).astype(np.float32))
        A = jnp.asarray(rng.dirichlet(np.ones(q), size=(1, q)).astype(np.float32))
        E = jnp.asarray(
            rng.uniform(0.05, 1.0, size=(1, b, L, q)).astype(np.float32)
        )
        ll_ref = recursion.log_likelihood(init, A, E, 1)
        ll = recursion.log_likelihood(init, A, E, 4)
        np.testing.assert_allclose(
            np.asarray(ll), np.asarray(ll_ref), rtol=2e-4
        )


class TestSequentialAnalyticVJP:
    def test_matches_autodiff(self):
        # The sequential loglik's analytic Baum-Welch VJP vs taped autodiff
        # of the plain scan, incl. structural-zero transitions.
        init, A, E = random_hmm(RNG, q=7, L=40, b=3)
        A = A.copy()
        A[1, 5] = 0.0
        A = A / A.sum(-1, keepdims=True)
        ini, Aj, Ej = map(jnp.asarray, _stack(init, A, E))
        ct = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 3)).astype(np.float32)
        )

        def f(analytic):
            def inner(i, a, e):
                return jnp.sum(
                    recursion.log_likelihood(i, a, e, 1, analytic_vjp=analytic)
                    * ct
                )

            return jax.grad(inner, argnums=(0, 1, 2))(ini, Aj, Ej)

        g_ref = f(False)
        g = f(True)
        for a, r in zip(g, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-4
            )
        assert np.asarray(g[1])[0, 1, 5] != 0.0


class TestCategoricalEM:
    def test_full_baum_welch_monotone_and_recovers(self):
        # Full classical EM (init + A + B) on symbols drawn from a known
        # 3-state HMM: likelihood must be monotonically non-decreasing and
        # the learned model must beat the random starting point by a wide
        # margin.
        from hmm_layer_tpu.ops import em

        rng = np.random.default_rng(0)
        q, s, b, L = 3, 5, 24, 60
        A_true = rng.dirichlet(np.ones(q) * 0.3, size=q)
        B_true = rng.dirichlet(np.ones(s) * 0.3, size=q)
        init_true = rng.dirichlet(np.ones(q))
        states = np.zeros((b, L), int)
        obs = np.zeros((b, L), int)
        for i in range(b):
            st = rng.choice(q, p=init_true)
            for t in range(L):
                obs[i, t] = rng.choice(s, p=B_true[st])
                states[i, t] = st
                st = rng.choice(q, p=A_true[st])
        x = jnp.asarray(np.eye(s, dtype=np.float32)[obs])[None]

        init = jnp.asarray(rng.dirichlet(np.ones(q)).astype(np.float32))[None]
        A = jnp.asarray(rng.dirichlet(np.ones(q), size=q).astype(np.float32))[None]
        B = jnp.asarray(rng.dirichlet(np.ones(s), size=q).astype(np.float32))[None]

        step = jax.jit(
            lambda i, a, bb: em.em_step_categorical(
                i, a, bb, x, parallel_factor=4, pseudocount=1e-3
            )
        )
        lls = []
        for _ in range(25):
            init, A, B, ll = step(init, A, B)
            lls.append(float(np.asarray(ll).sum()))
        diffs = np.diff(lls)
        assert (diffs > -1e-2).all(), diffs.min()  # monotone (fp tolerance)
        assert lls[-1] - lls[0] > 50.0  # learned something substantial
        # Rows remain stochastic.
        np.testing.assert_allclose(np.asarray(B).sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(A).sum(-1), 1.0, rtol=1e-5)


class TestEngineFuzz:
    """Randomized cross-engine sweep: sequential vs chunked XLA
    loglik/posterior/viterbi over assorted shapes, plus the f64 oracle on
    the smallest. Shapes chosen small for CI but covering odd q, odd chunk
    counts, multi-model, and sparse grammars."""

    CASES = [
        dict(q=2, L=30, b=1, P=5, m=1),
        dict(q=9, L=36, b=2, P=6, m=2),
        dict(q=16, L=24, b=4, P=3, m=3),
    ]

    @pytest.mark.parametrize("case", CASES)
    def test_cross_engine(self, case):
        # XLA engines only — the Pallas interpret-mode parity has its own
        # dedicated tests and is ~10x slower per case on the CI host.
        q, L, b, P, m = (case[k] for k in ("q", "L", "b", "P", "m"))
        rng = np.random.default_rng(q * 1000 + L)
        init = rng.dirichlet(np.ones(q), size=m).astype(np.float32)
        A = rng.dirichlet(np.ones(q) * 0.5, size=(m, q)).astype(np.float32)
        if q >= 7:  # sprinkle structural zeros
            A[:, 0, q - 1] = 0.0
            A = A / A.sum(-1, keepdims=True)
        E = rng.dirichlet(np.ones(q) * 0.4, size=(m, b, L)).astype(np.float32)
        ini, Aj, Ej = map(jnp.asarray, (init, A, E))

        ll1 = recursion.log_likelihood(ini, Aj, Ej, 1)
        llP = recursion.log_likelihood(ini, Aj, Ej, P)
        np.testing.assert_allclose(
            np.asarray(llP), np.asarray(ll1), rtol=3e-4
        )
        lg1, _ = recursion.posterior(ini, Aj, Ej, 1)
        lgP, llp = recursion.posterior(ini, Aj, Ej, P)
        np.testing.assert_allclose(np.asarray(llp), np.asarray(ll1), rtol=3e-4)
        np.testing.assert_allclose(
            np.asarray(lgP), np.asarray(lg1), rtol=2e-3, atol=3e-3
        )
        p1 = recursion.viterbi(ini, Aj, Ej, 1)
        pP = recursion.viterbi(ini, Aj, Ej, P)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(pP))
        # f64 DP oracle on model 0 / sequence 0. (NOT brute_force_loglik:
        # exhaustive enumeration is q^L paths — at q=2, L=30 that is 2^30,
        # effectively an infinite loop.)
        _, ll_np = forward_np(
            init[0].astype(np.float64),
            A[0].astype(np.float64),
            E[0, 0].astype(np.float64),
        )
        np.testing.assert_allclose(float(ll1[0, 0]), ll_np, rtol=1e-4)


class TestStreamingSmoother:
    def test_committed_match_truncated_offline(self):
        # Each committed marginal must equal the OFFLINE posterior of the
        # sequence truncated at that commit's window end — the fixed-lag
        # smoother is exact given its window by construction.
        from hmm_layer_tpu import streaming

        init, A, E = random_hmm(RNG, q=5, L=30, b=2)
        ini, Aj, Ej = _stack(init, A, E)
        lag = 4

        st, c0 = streaming.streaming_smoother_init(
            ini, Aj, Ej[:, :, :10], lag=lag
        )
        ref0, _ = recursion.posterior(ini, Aj, Ej[:, :, :10])
        np.testing.assert_allclose(c0, ref0[:, :, :6], atol=2e-4)

        st, c1 = streaming.streaming_smoother_update(st, Aj, Ej[:, :, 10:22])
        ref1, _ = recursion.posterior(ini, Aj, Ej[:, :, :22])
        np.testing.assert_allclose(c1, ref1[:, :, 6:18], atol=2e-4)

        st, c2 = streaming.streaming_smoother_update(st, Aj, Ej[:, :, 22:30])
        ref2, _ = recursion.posterior(ini, Aj, Ej)
        np.testing.assert_allclose(c2, ref2[:, :, 18:26], atol=2e-4)

        # Loglik bookkeeping tracks the committed prefix exactly.
        ll26 = recursion.log_likelihood(ini, Aj, Ej[:, :, :26])
        np.testing.assert_allclose(st.log_lik, ll26, rtol=1e-5, atol=1e-4)

        # The finalize tail is exact full smoothing (window end == L).
        tail = streaming.streaming_smoother_finalize(st, Aj)
        np.testing.assert_allclose(tail, ref2[:, :, 26:30], atol=2e-4)

    def test_chunked_windows_match_sequential(self):
        from hmm_layer_tpu import streaming

        init, A, E = random_hmm(RNG, q=4, L=31, b=2)
        ini, Aj, Ej = _stack(init, A, E)
        # lag=3, first block 16 (pf=4 divides), update 12 (augmented
        # window 3+12+1=16, pf=4 divides) — both windows run chunked.
        args = [(ini, Aj, Ej[:, :, :16]), (Aj, Ej[:, :, 16:28])]
        st1, a0 = streaming.streaming_smoother_init(*args[0], lag=3)
        st4, b0 = streaming.streaming_smoother_init(
            *args[0], lag=3, parallel_factor=4
        )
        st1, a1 = streaming.streaming_smoother_update(st1, *args[1])
        st4, b1 = streaming.streaming_smoother_update(
            st4, *args[1], parallel_factor=4
        )
        t1 = streaming.streaming_smoother_finalize(st1, Aj)
        t4 = streaming.streaming_smoother_finalize(st4, Aj, parallel_factor=4)
        for a, b in [(a0, b0), (a1, b1), (t1, t4)]:
            np.testing.assert_allclose(a, b, atol=2e-4)

    def test_bad_lag_raises(self):
        from hmm_layer_tpu import streaming

        init, A, E = random_hmm(RNG, q=4, L=8, b=1)
        ini, Aj, Ej = _stack(init, A, E)
        with pytest.raises(ValueError, match="lag"):
            streaming.streaming_smoother_init(ini, Aj, Ej, lag=0)
        with pytest.raises(ValueError, match="must be > lag"):
            streaming.streaming_smoother_init(ini, Aj, Ej, lag=8)


class TestDpPrecision:
    """Runtime-settable DP-einsum precision (round-4 sweep decision)."""

    def test_set_and_restore(self):
        from hmm_layer_tpu import dp_precision, set_dp_precision
        from hmm_layer_tpu.ops import recursion as rec
        from jax import lax

        base = rec._dp_prec()
        prev = set_dp_precision("high")
        assert rec._dp_prec() == lax.Precision.HIGH
        set_dp_precision(prev)
        assert rec._dp_prec() == base
        with dp_precision("high"):
            assert rec._dp_prec() == lax.Precision.HIGH
        assert rec._dp_prec() == base

    def test_bad_mode_raises(self):
        from hmm_layer_tpu import set_dp_precision

        with pytest.raises(KeyError):
            set_dp_precision("bf16")

    def test_loglik_matches_across_modes_on_cpu(self):
        # On CPU all precision modes lower to the same f32 kernels; the
        # knob must not change dispatch/values (TPU differences are
        # measured in benchmarks/precision_sweep.py).
        from hmm_layer_tpu import dp_precision
        from hmm_layer_tpu.ops import recursion

        init, A, E = random_hmm(RNG, q=5, L=16, b=2)
        ini, Aj, Ej = _stack(init, A, E)
        ll0 = np.asarray(recursion.log_likelihood(ini, Aj, Ej))
        with dp_precision("high"):
            ll1 = np.asarray(recursion.log_likelihood(ini, Aj, Ej))
        np.testing.assert_array_equal(ll0, ll1)

"""Dispatch-policy tests: Pallas backend gating and AD-mode contracts."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.ops import recursion


def _toy(q=5, b=2, L=8, m=1, seed=0):
    rng = np.random.default_rng(seed)
    init = jnp.asarray(rng.dirichlet(np.ones(q), size=m).astype(np.float32))
    A = jnp.asarray(
        rng.dirichlet(np.ones(q), size=(m, q)).astype(np.float32)
    )
    E = jnp.asarray(
        rng.uniform(0.05, 1.0, size=(m, b, L, q)).astype(np.float32)
    )
    return init, A, E


class TestPallasBackendGate:
    """The Mosaic kernels must only dispatch on an explicit TPU allowlist —
    an unknown future backend gets the always-correct XLA fallback."""

    def test_tpu_backends_allowed(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert recursion._use_pallas(15, 1)
        monkeypatch.setattr(jax, "default_backend", lambda: "axon")
        assert recursion._use_pallas(15, 1)

    def test_unknown_backend_falls_back(self, monkeypatch):
        for name in ("cpu", "gpu", "cuda", "rocm", "some_future_backend"):
            monkeypatch.setattr(jax, "default_backend", lambda n=name: n)
            assert not recursion._use_pallas(15, 1), name

    def test_unsupported_shape_falls_back(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert not recursion._use_pallas(10_000, 1)

    def test_force_interpret_overrides(self, monkeypatch):
        from hmm_layer_tpu.ops import pallas_viterbi

        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        monkeypatch.setattr(pallas_viterbi, "FORCE_INTERPRET", True)
        assert recursion._use_pallas(15, 1)


class TestSeqUnroll:
    """The staged HMM_SEQ_UNROLL knob (TPU-only scan unroll for the
    sequential paths) must be a pure perf knob: results identical to
    unroll=1, and inert on non-TPU backends."""

    def test_inert_off_tpu(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        monkeypatch.setattr(recursion, "_SEQ_UNROLL_TPU", 4)
        assert recursion._seq_unroll() == 1

    def test_unrolled_results_identical(self, monkeypatch):
        init, A, E = _toy(q=6, b=3, L=11, m=2, seed=3)  # L % unroll != 0
        base = {
            "ll": recursion.log_likelihood(init, A, E, 1),
            "post": recursion.posterior(init, A, E, 1)[0],
            "vit": recursion.viterbi(init, A, E, 1),
            "g": jax.grad(
                lambda a: jnp.sum(recursion.log_likelihood(init, a, E, 1))
            )(A),
        }
        monkeypatch.setattr(recursion, "_seq_unroll", lambda: 4)
        np.testing.assert_allclose(
            recursion.log_likelihood(init, A, E, 1), base["ll"], rtol=1e-6
        )
        np.testing.assert_allclose(
            recursion.posterior(init, A, E, 1)[0], base["post"], rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            recursion.viterbi(init, A, E, 1), base["vit"]
        )
        np.testing.assert_allclose(
            jax.grad(
                lambda a: jnp.sum(recursion.log_likelihood(init, a, E, 1))
            )(A),
            base["g"], rtol=1e-5, atol=1e-7,
        )


class TestForwardModeContract:
    """Chunked paths are reverse-mode only (custom_vjp); the error a jvp
    user sees must name the actual conflict, not fail obscurely."""

    def test_jvp_error_is_comprehensible(self):
        init, A, E = _toy(L=8)

        def loss(e):
            return jnp.sum(recursion.log_likelihood(init, A, e, 4))

        with pytest.raises(
            TypeError, match="(?i)forward-mode.*jvp.*custom_vjp"
        ):
            jax.jvp(loss, (E,), (jnp.ones_like(E),))

    def test_parallel_factor_one_supports_jvp(self):
        # pf=1 defaults to the analytic (reverse-mode-only) VJP too;
        # forward mode is the documented analytic_vjp=False escape hatch.
        init, A, E = _toy(L=8)

        def loss(e):
            return jnp.sum(
                recursion.log_likelihood(init, A, e, 1, analytic_vjp=False)
            )

        _, tangent = jax.jvp(loss, (E,), (jnp.ones_like(E),))
        assert np.isfinite(np.asarray(tangent))


class TestRecommendedParallelFactor:
    def test_divides_L(self):
        from hmm_layer_tpu.ops.recursion import recommended_parallel_factor

        for L in (9999, 3069, 1200, 1023, 97):
            for q, m in ((15, 1), (33, 1), (33, 5), (127, 1)):
                p = recommended_parallel_factor(L, q, m)
                assert L % p == 0, (L, q, m, p)

    def test_shape_regimes(self):
        from hmm_layer_tpu.ops.recursion import recommended_parallel_factor

        assert recommended_parallel_factor(9999, 15) == 33  # chunk ~300
        assert recommended_parallel_factor(3069, 33, 1) == 9  # chunk ~340
        assert recommended_parallel_factor(3069, 33, 5) == 1  # multi-model
        assert recommended_parallel_factor(3069, 127, 1) == 1  # large q
        assert recommended_parallel_factor(9999, 33, for_viterbi=True) == 1

    def test_layer_auto(self):
        import jax
        import jax.numpy as jnp
        from hmm_layer_tpu.layer import HMMLayer

        class _T:
            def init_params(self, key):
                return {}

            def matrices(self, p):
                init = jnp.full((1, 4), 0.25)
                A = jnp.full((1, 4, 4), 0.25)
                return init, A

            def prior_log_density(self, p):
                return jnp.zeros((1,))

        class _E:
            def init_params(self, key, input_dim):
                return {}

            def emissions(self, p, x, end_hints=None, training=False):
                return x

            def prior_log_density(self, p):
                return jnp.zeros((1,))

            def aux_loss(self, p):
                return jnp.zeros(())

        layer = HMMLayer(_T(), _E(), parallel_factor="auto", use_prior=False)
        params = layer.init_params(jax.random.PRNGKey(0), 4)
        x = jnp.full((1, 2, 300, 4), 0.5)
        ll = layer.log_likelihood(params, x)
        assert ll.shape == (1, 2)
        assert layer._pf(x) == 1 or 300 % layer._pf(x) == 0




class TestImportIsBackendFree:
    def test_import_does_not_initialize_backend(self):
        """Importing the package must not create device arrays: module-scope
        jnp constants would initialize the JAX backend at import time and
        hang the import entirely when the device transport is unreachable
        (regression: ops/recursion.py once held ``_NEG = jnp.float32(...)``).
        """
        import subprocess
        import sys

        code = (
            "import hmm_layer_tpu\n"
            "from jax._src import xla_bridge\n"
            "assert not xla_bridge._backends, list(xla_bridge._backends)\n"
        )
        env = dict(os.environ)
        # Run without the conftest's platform forcing; any platform config
        # is fine because the assertion is that NO backend gets touched.
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=300,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr

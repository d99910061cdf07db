"""Dispatch-policy tests: Pallas backend gating and AD-mode contracts."""

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
        init, A, E = _toy(L=8)

        def loss(e):
            return jnp.sum(recursion.log_likelihood(init, A, e, 1))

        _, tangent = jax.jvp(loss, (E,), (jnp.ones_like(E),))
        assert np.isfinite(np.asarray(tangent))

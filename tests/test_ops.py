"""Unit tests for semiring primitives, k-mer encoding and bijectors."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import logsumexp

from hmm_layer_tpu.ops import semiring
from hmm_layer_tpu.ops.kmer import encode_kmer_string, make_k_mers
from hmm_layer_tpu.utils import bijectors

RNG = np.random.default_rng(1)


class TestSemiring:
    def test_logmatmul(self):
        x = RNG.normal(size=(4, 5)).astype(np.float32)
        y = RNG.normal(size=(5, 3)).astype(np.float32)
        z = semiring.logmatmul(jnp.asarray(x), jnp.asarray(y))
        expect = logsumexp(x[:, :, None] + y[None, :, :], axis=1)
        np.testing.assert_allclose(z, expect, rtol=1e-5, atol=1e-5)

    def test_logmatmul_batched_offsets(self):
        # Large offsets on both operands must not overflow.
        x = RNG.normal(size=(2, 4, 5)).astype(np.float32) - 500.0
        y = RNG.normal(size=(2, 5, 3)).astype(np.float32) - 300.0
        z = semiring.logmatmul(jnp.asarray(x), jnp.asarray(y))
        expect = logsumexp(x[..., :, :, None] + y[..., None, :, :], axis=-2)
        np.testing.assert_allclose(z, expect, rtol=1e-4, atol=1e-4)

    def test_maxmatmul(self):
        x = RNG.normal(size=(4, 5)).astype(np.float32)
        y = RNG.normal(size=(5, 3)).astype(np.float32)
        z = semiring.maxmatmul(jnp.asarray(x), jnp.asarray(y))
        expect = np.max(x[:, :, None] + y[None, :, :], axis=1)
        np.testing.assert_allclose(z, expect, rtol=1e-6)

    def test_maxargmatvec(self):
        v = RNG.normal(size=(7,)).astype(np.float32)
        m = RNG.normal(size=(7, 4)).astype(np.float32)
        s, a = semiring.maxargmatvec(jnp.asarray(v), jnp.asarray(m))
        expect = v[:, None] + m
        np.testing.assert_allclose(s, expect.max(0), rtol=1e-6)
        np.testing.assert_array_equal(a, expect.argmax(0))


class TestKmer:
    def _one_hot(self, s):
        full = "ACGTN"
        return np.eye(5, dtype=np.float32)[[full.index(c) for c in s]]

    def test_shapes(self):
        seq = self._one_hot("ACGTACGTA")[None]
        km = make_k_mers(jnp.asarray(seq), k=3, pivot_left=True)
        assert km.shape == (1, 9, 16, 4)

    def test_normalized(self):
        seq = self._one_hot("ACGTNNACG")[None]
        for pivot in (True, False):
            km = np.asarray(make_k_mers(jnp.asarray(seq), k=3, pivot_left=pivot))
            np.testing.assert_allclose(km.reshape(1, 9, -1).sum(-1), 1.0, rtol=1e-5)

    def test_exact_kmer_classes(self):
        # "ACG": at position 0 with pivot_left the 3-mer is ACG ->
        # pivot=A (index 0), remainder CG -> 4*1+2 = 6.
        seq = self._one_hot("ACGT")[None]
        km = np.asarray(make_k_mers(jnp.asarray(seq), k=3, pivot_left=True))
        assert km[0, 0, 6, 0] == 1.0
        assert km[0, 0].sum() == 1.0
        # pivot_right at position 2: 3-mer is ACG -> pivot=G (index 2),
        # remainder AC with the char adjacent to the pivot most significant
        # -> 4*C+A = 4 (value verified against the reference implementation).
        km_r = np.asarray(make_k_mers(jnp.asarray(seq), k=3, pivot_left=False))
        assert km_r[0, 2, 4, 2] == 1.0

    def test_n_uniform(self):
        seq = self._one_hot("NAA")[None]
        km = np.asarray(make_k_mers(jnp.asarray(seq), k=3, pivot_left=True))
        # Position 0 pivot is N: uniform over the 4 pivots with remainder AA.
        np.testing.assert_allclose(km[0, 0, 0, :], 0.25, rtol=1e-6)

    def test_encode_kmer_string(self):
        enc = np.asarray(encode_kmer_string("ATG", pivot_left=True))
        assert enc.shape == (16, 4)
        # pivot A (0), remainder TG = 4*T+G = 14 (adjacent-to-pivot major).
        assert enc[14, 0] == 1.0
        enc_r = np.asarray(encode_kmer_string("ATG", pivot_left=False))
        # pivot G (2), remainder AT = 4*T+A = 12 (adjacent-to-pivot major;
        # verified against the reference implementation).
        assert enc_r[12, 2] == 1.0

    def test_encode_with_n(self):
        enc = np.asarray(encode_kmer_string("NGT", pivot_left=True))
        np.testing.assert_allclose(enc.sum(), 1.0, rtol=1e-6)
        # Four pivots each carry 1/4 on remainder GT = 4*2+3 = 11.
        np.testing.assert_allclose(enc[11], 0.25, rtol=1e-6)


class TestBijectors:
    def test_fill_triangular_roundtrip(self):
        x = RNG.normal(size=(3, 10)).astype(np.float32)  # n=4
        m = bijectors.fill_triangular(jnp.asarray(x))
        assert m.shape == (3, 4, 4)
        assert np.allclose(np.triu(np.asarray(m)[0], 1), 0)
        x2 = bijectors.fill_triangular_inverse(m)
        np.testing.assert_allclose(np.sort(x2, -1), np.sort(x, -1), rtol=1e-6)

    def test_diag_bijector(self):
        bij = bijectors.DefaultDiagBijector(base_variance=2.0)
        # kernel 0 -> std sqrt(2)
        np.testing.assert_allclose(bij.forward(jnp.zeros(3)), np.sqrt(2.0), rtol=1e-4)
        y = jnp.asarray([0.5, 1.0, 3.0])
        np.testing.assert_allclose(bij.forward(bij.inverse(y)), y, rtol=1e-5)

    def test_fill_scale_tril(self):
        bij = bijectors.DefaultDiagBijector(1.0)
        tril = bijectors.FillScaleTriL(bij)
        x = RNG.normal(size=(6,)).astype(np.float32)  # n=3
        m = np.asarray(tril.forward(jnp.asarray(x)))
        assert np.all(np.diag(m) > 0)
        x2 = tril.inverse(jnp.asarray(m))
        m2 = np.asarray(tril.forward(x2))
        np.testing.assert_allclose(m2, m, rtol=1e-5, atol=1e-6)

    def test_inverse_softplus(self):
        x = jnp.asarray([0.1, 1.0, 20.0, 100.0])
        np.testing.assert_allclose(
            jax.nn.softplus(bijectors.inverse_softplus(x)), x, rtol=1e-5
        )

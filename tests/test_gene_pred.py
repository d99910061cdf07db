"""Gene-prediction model family: grammar structure, codon constraints,
end-to-end layer inference (mirrors the reference's integration script
tests/parallel_rnn_forward.py shapes, scaled down)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models.gene_pred_transitions import (
    GenePredMultiTransitions,
    GenePredTransitions,
    SimpleGenePredTransitions,
)
from hmm_layer_tpu.models.gene_pred_emissions import (
    GenePredEmissions,
    SimpleGenePredEmissions,
)

KEY = jax.random.PRNGKey(0)

START = [("ATG", 1.0)]
STOP = [("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)]
INTRON_BEGIN = [("NGT", 0.99), ("NGC", 0.005), ("NAT", 0.005)]
INTRON_END = [("AGN", 0.99), ("ACN", 0.01)]


def _one_hot_nucs(s):
    full = "ACGTN"
    return np.eye(5, dtype=np.float32)[[full.index(c) for c in s]]


class TestTransitionGrammar:
    @pytest.mark.parametrize(
        "cls,kwargs,q,n_edges",
        [
            (SimpleGenePredTransitions, {}, 7, 15),
            (GenePredTransitions, {}, 15, 23),
            (GenePredMultiTransitions, {"k": 2}, 29, 45),
            (GenePredMultiTransitions, {"k": 3}, 43, 67),
        ],
    )
    def test_structure(self, cls, kwargs, q, n_edges):
        trans = cls(**kwargs)
        assert trans.num_states == q
        assert len(trans.indices) == n_edges
        params = trans.init_params(KEY)
        init, A = trans.matrices(params)
        assert A.shape == (1, q, q)
        # Rows with outgoing edges are stochastic; others are zero.
        rows_with_edges = np.unique(trans.indices[:, 0])
        sums = np.asarray(A[0].sum(-1))
        np.testing.assert_allclose(sums[rows_with_edges], 1.0, rtol=1e-5)
        # Probability mass only on allowed edges.
        mask = np.zeros((q, q))
        mask[trans.indices[:, 0], trans.indices[:, 1]] = 1
        assert np.all(np.asarray(A[0])[mask == 0] == 0)
        # Initial distribution is a distribution.
        np.testing.assert_allclose(np.asarray(init).sum(-1), 1.0, rtol=1e-5)

    def test_grammar_paths_15(self):
        """The 15-state grammar must route Ir -> START -> E1 ... E1 -> STOP -> Ir."""
        trans = GenePredTransitions()
        params = trans.init_params(KEY)
        A = np.asarray(trans.make_A(params)[0])
        Ir, E1, START_S, STOP_S = 0, 5, 7, 14
        assert A[Ir, START_S] > 0
        assert A[START_S, E1] > 0
        assert A[E1, STOP_S] > 0
        assert A[STOP_S, Ir] > 0
        # START must not go anywhere else.
        assert A[START_S].sum() == pytest.approx(A[START_S, E1], rel=1e-6)

    def test_length_geometry_init(self):
        trans = SimpleGenePredTransitions(
            initial_ir_len=1000, initial_intron_len=100, initial_exon_len=10
        )
        params = trans.init_params(KEY)
        A = np.asarray(trans.make_A(params)[0])
        # Self-loop probabilities approximately match 1 - 1/len.
        assert A[0, 0] == pytest.approx(1 - 1 / 1000, abs=2e-3)
        assert A[1, 1] == pytest.approx(1 - 1 / 100, abs=2e-2)

    def test_multi_copy_shares_ir(self):
        trans = GenePredMultiTransitions(k=2)
        params = trans.init_params(KEY)
        A = np.asarray(trans.make_A(params)[0])
        # Ir connects to both copies' START states.
        START = list(range(1 + 6 * 2, 1 + 7 * 2))
        assert all(A[0, s] > 0 for s in START)


class TestSimpleEmissions:
    def test_shapes_and_intron_sharing(self):
        em = SimpleGenePredEmissions(num_copies=2, share_intron_parameters=True)
        params = em.init_params(KEY, input_dim=15)
        assert params["emission_kernel"].shape == (1, 13 - 4, 15)
        x = jax.random.uniform(KEY, (1, 3, 11, 15))
        probs = em.emissions(params, x)
        assert probs.shape == (1, 3, 11, 13)
        # Shared introns: I0/I1/I2 copies produce identical emissions.
        p = np.asarray(probs)
        np.testing.assert_allclose(p[..., 1:3], p[..., 3:5], rtol=1e-6)
        np.testing.assert_allclose(p[..., 1:3], p[..., 5:7], rtol=1e-6)

    def test_end_hints_mask_borders(self):
        em = SimpleGenePredEmissions()
        params = em.init_params(KEY, input_dim=7)
        x = jnp.ones((1, 2, 5, 7))
        hints = jnp.zeros((1, 2, 2, 7)).at[..., 0, 3].set(1.0).at[..., 1, 2].set(1.0)
        probs = np.asarray(em.emissions(params, x, end_hints=hints))
        assert np.all(probs[..., 0, np.arange(7) != 3] == 0)
        assert np.all(probs[..., -1, np.arange(7) != 2] == 0)
        assert np.all(probs[..., 1:-1, :] > 0)

    def test_mvn_embeddings(self):
        em = SimpleGenePredEmissions(
            emit_embeddings=True, embedding_dim=4, temperature=2.0
        )
        params = em.init_params(KEY, input_dim=7)
        x = jax.random.uniform(KEY, (1, 2, 6, 7 + 4))
        probs = em.emissions(params, x, training=True)
        assert probs.shape == (1, 2, 6, 7)
        assert np.all(np.isfinite(np.asarray(probs)))
        assert np.all(np.asarray(probs) > 0)


class TestCodonConstraints:
    def _emitter(self, **kw):
        em = GenePredEmissions(START, STOP, INTRON_BEGIN, INTRON_END, **kw)
        params = em.init_params(KEY, input_dim=15)
        return em, params

    def _inputs(self, seq):
        L = len(seq)
        cls = np.full((1, 1, L, 15), 1.0 / 15, np.float32)
        nucs = _one_hot_nucs(seq)[None, None]
        return jnp.asarray(np.concatenate([cls, nucs], axis=-1))

    def test_start_state_requires_atg(self):
        em, params = self._emitter()
        probs = np.asarray(em.emissions(params, self._inputs("AATGCA")))[0, 0]
        START_STATE = 7
        # Position 1 starts ATG -> START possible; elsewhere impossible.
        assert probs[1, START_STATE] > 0
        for t in [0, 2, 3]:
            assert probs[t, START_STATE] == 0

    def test_stop_state_requires_stop_codon(self):
        em, params = self._emitter()
        probs = np.asarray(em.emissions(params, self._inputs("ACTAAG")))[0, 0]
        STOP_STATE = 14
        # Right-pivot 3-mer at position 4 is TAA... positions where the 3-mer
        # ending at t is a stop codon: t=4 ("TAA"), t=5 ("AAG" no).
        assert probs[4, STOP_STATE] > 0
        assert probs[5, STOP_STATE] == 0

    def test_e2_cannot_emit_stop(self):
        """E2 uses the not-stop table on the right pivot."""
        em, params = self._emitter()
        probs = np.asarray(em.emissions(params, self._inputs("ACTAAG")))[0, 0]
        E2 = 6
        assert probs[4, E2] == 0  # TAA ending here -> forbidden for E2
        assert probs[3, E2] > 0

    def test_intron_begin_gt(self):
        em, params = self._emitter()
        probs = np.asarray(em.emissions(params, self._inputs("AGTCAA")))[0, 0]
        EI0 = 8
        # Left 3-mer at position 0 is AGT; donor pattern NGT matches.
        assert probs[0, EI0] > 0
        assert probs[2, EI0] == 0

    def test_num_copies_repeat(self):
        em, params = self._emitter(num_copies=2)
        assert em.num_states == 29
        probs = em.emissions(params, self._inputs("AATGCA"))
        assert probs.shape == (1, 1, 6, 29)


class TestGenePredLayerIntegration:
    def _layer(self, parallel_factor=1):
        em = GenePredEmissions(START, STOP, INTRON_BEGIN, INTRON_END)
        trans = GenePredTransitions()
        return HMMLayer(trans, em, use_prior=False, parallel_factor=parallel_factor)

    def _random_inputs(self, b=4, L=120):
        k1, k2 = jax.random.split(KEY)
        cls = jax.nn.softmax(jax.random.normal(k1, (1, b, L, 15)), axis=-1)
        nucs = jax.nn.one_hot(
            jax.random.randint(k2, (1, b, L), 0, 4), 5, dtype=jnp.float32
        )
        return jnp.concatenate([cls, nucs], axis=-1)

    def test_posterior_pipeline(self):
        layer = self._layer(parallel_factor=4)
        params = layer.init_params(KEY, input_dim=15)
        x = self._random_inputs()
        lg = layer.state_posterior_log_probs(params, x)
        assert lg.shape == (1, 4, 120, 15)
        sums = np.asarray(jax.nn.logsumexp(lg, -1))
        np.testing.assert_allclose(sums, 0.0, atol=2e-3)

    def test_parallel_vs_sequential(self):
        x = self._random_inputs(b=2, L=60)
        l1 = self._layer(1)
        lP = self._layer(6)
        params = l1.init_params(KEY, input_dim=15)
        ll1 = l1.log_likelihood(params, x)
        llP = lP.log_likelihood(params, x)
        np.testing.assert_allclose(ll1, llP, rtol=1e-4)

    def test_viterbi_respects_grammar(self):
        layer = self._layer()
        params = layer.init_params(KEY, input_dim=15)
        x = self._random_inputs(b=2, L=50)
        paths = np.asarray(layer.viterbi(params, x))
        A = np.asarray(layer.transitions.make_A(params["transitions"])[0])
        for bi in range(2):
            for t in range(49):
                assert A[paths[0, bi, t], paths[0, bi, t + 1]] > 0, (
                    f"illegal transition at t={t}"
                )

    def test_training_step_decreases_loss(self):
        layer = self._layer()
        params = layer.init_params(KEY, input_dim=15)
        x = self._random_inputs(b=2, L=30)

        loss_fn = lambda p: layer.loss(p, x)
        l0, g = jax.value_and_grad(loss_fn)(params)
        params2 = jax.tree.map(lambda p, gr: p - 0.1 * gr, params, g)
        l1 = loss_fn(params2)
        assert np.isfinite(l0) and np.isfinite(l1)
        assert l1 < l0

    def test_multi_emitter_product(self):
        em1 = GenePredEmissions(START, STOP, INTRON_BEGIN, INTRON_END)
        em2 = SimpleGenePredEmissions(num_copies=1)

        class Lift:
            """Adapter: 7-state simple emitter scores lifted to 15 states."""

            def __init__(self, inner):
                self.inner = inner

            def init_params(self, key, input_dim):
                return self.inner.init_params(key, 7)

            def emissions(self, params, inputs, end_hints=None, training=False):
                e = self.inner.emissions(params, inputs[..., :15][..., :7])
                return jnp.concatenate(
                    [e, jnp.ones(e.shape[:-1] + (8,), e.dtype)], axis=-1
                )

            def prior_log_density(self, params):
                return self.inner.prior_log_density(params)

            def aux_loss(self, params):
                return self.inner.aux_loss(params)

        trans = GenePredTransitions()
        layer = HMMLayer(trans, [em1, Lift(em2)], use_prior=False)
        params = layer.init_params(KEY, input_dim=15)
        x = self._random_inputs(b=2, L=20)
        ll = layer.log_likelihood(params, x)
        assert ll.shape == (1, 2)
        assert np.all(np.isfinite(np.asarray(ll)))


class TestKmerBf16:
    def _emitter(self, **kw):
        from hmm_layer_tpu.models import GenePredEmissions

        return GenePredEmissions(
            start_codons=[("ATG", 1.0)],
            stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
            intron_begin_pattern=[("NGT", 0.99), ("NAT", 0.01)],
            intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
            **kw,
        )

    def test_bf16_kmers_exact_for_one_hot(self):
        # One-hot ACGTN 3-mer entries are powers of two — exactly
        # representable in bf16, so the default bf16 fast path must agree
        # with f32 to float rounding.
        import jax
        import jax.numpy as jnp

        em16 = self._emitter(compute_kmers_in_bf16=True)
        em32 = self._emitter(compute_kmers_in_bf16=False)
        params = em16.init_params(jax.random.PRNGKey(0), 15)
        rng = np.random.default_rng(0)
        cls = jnp.asarray(
            rng.dirichlet(np.ones(15), size=(1, 2, 30)).astype(np.float32)
        )
        nucs = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 5, size=(1, 2, 30))), 5,
            dtype=jnp.float32,
        )  # includes N columns
        x = jnp.concatenate([cls, nucs], axis=-1)
        E16 = np.asarray(em16.emissions(params, x))
        E32 = np.asarray(em32.emissions(params, x))
        np.testing.assert_allclose(E16, E32, rtol=1e-6, atol=1e-9)


class TestOnehotLookupKmers:
    """The base-5 codon-index lookup path must equal the f32 contraction
    EXACTLY on one-hot ACGTN inputs (incl. N letters and boundaries)."""

    def _pair(self):
        em_ref = GenePredEmissions(
            START, STOP, INTRON_BEGIN, INTRON_END, compute_kmers_in_bf16=False
        )
        em_lut = GenePredEmissions(
            START, STOP, INTRON_BEGIN, INTRON_END, onehot_lookup_kmers=True
        )
        params = em_ref.init_params(KEY, input_dim=15)
        return em_ref, em_lut, params

    def test_exact_on_onehot_inputs(self):
        em_ref, em_lut, params = self._pair()
        rng = np.random.default_rng(0)
        cls = rng.dirichlet(np.ones(15), (1, 3, 40)).astype(np.float32)
        letters = rng.integers(0, 5, (1, 3, 40))
        letters[0, 0, :3] = 4  # leading Ns
        letters[0, 1, -3:] = 4  # trailing Ns
        nucs = np.eye(5, dtype=np.float32)[letters]
        x = jnp.asarray(np.concatenate([cls, nucs], -1))
        E_ref = np.asarray(em_ref.emissions(params, x))
        E_lut = np.asarray(em_lut.emissions(params, x))
        np.testing.assert_allclose(E_ref, E_lut, atol=1e-6, rtol=1e-6)

    def test_class_input_grads_match(self):
        em_ref, em_lut, params = self._pair()
        rng = np.random.default_rng(1)
        cls = rng.dirichlet(np.ones(15), (1, 2, 12)).astype(np.float32)
        nucs = np.eye(5, dtype=np.float32)[rng.integers(0, 4, (1, 2, 12))]

        def loss(em, c):
            x = jnp.concatenate([jnp.asarray(c), jnp.asarray(nucs)], -1)
            return jnp.sum(em.emissions(params, x) ** 2)

        g_ref = np.asarray(jax.grad(lambda c: loss(em_ref, c))(cls))
        g_lut = np.asarray(jax.grad(lambda c: loss(em_lut, c))(cls))
        np.testing.assert_allclose(g_ref, g_lut, rtol=1e-5, atol=1e-7)

    def test_config_roundtrip(self):
        _, em_lut, _ = self._pair()
        em2 = GenePredEmissions.from_config(em_lut.get_config())
        assert em2.onehot_lookup_kmers is True
        np.testing.assert_allclose(em2.codon_lookup, em_lut.codon_lookup)

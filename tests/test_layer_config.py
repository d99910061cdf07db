"""Layer-level config round-trip (``MsaHMMLayer.py:210-224`` parity) and
full-training-state checkpointing (params + optimizer state)."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import (
    GenePredEmissions,
    GenePredTransitions,
    ProfileEmissions,
    ProfileTransitions,
    SimpleGenePredEmissions,
    SimpleGenePredTransitions,
)
from hmm_layer_tpu.training import Trainer

KEY = jax.random.PRNGKey(0)


def _roundtrip(layer):
    config = json.loads(json.dumps(layer.get_config()))
    return HMMLayer.from_config(config)


class TestLayerConfig:
    def test_gene_pred_layer(self):
        layer = HMMLayer(
            SimpleGenePredTransitions(initial_exon_len=50),
            SimpleGenePredEmissions(),
            num_seqs=123,
            use_prior=False,
            parallel_factor="auto",
        )
        layer2 = _roundtrip(layer)
        assert layer2.num_seqs == 123
        assert layer2.use_prior is False
        assert layer2.parallel_factor == "auto"
        assert layer2.transitions.initial_exon_len == 50
        params = layer.init_params(KEY, input_dim=7)
        params2 = layer2.init_params(KEY, input_dim=7)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0.1, 1.0, (1, 2, 12, 7)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(layer.log_likelihood(params, x)),
            np.asarray(layer2.log_likelihood(params2, x)),
        )

    def test_full_gene_pred_layer(self):
        em = GenePredEmissions(
            start_codons=[("ATG", 1.0)],
            stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
            intron_begin_pattern=[("NGT", 0.99), ("NGC", 0.005), ("NAT", 0.005)],
            intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
        )
        layer = HMMLayer(GenePredTransitions(), em, use_prior=False)
        layer2 = _roundtrip(layer)
        params = layer.init_params(KEY, input_dim=15)
        params2 = layer2.init_params(KEY, input_dim=15)
        rng = np.random.default_rng(1)
        cls = rng.dirichlet(np.ones(15), (1, 2, 9)).astype(np.float32)
        nucs = np.eye(5, dtype=np.float32)[rng.integers(0, 4, (1, 2, 9))]
        x = jnp.asarray(np.concatenate([cls, nucs], -1))
        np.testing.assert_array_equal(
            np.asarray(layer.viterbi(params, x)),
            np.asarray(layer2.viterbi(params2, x)),
        )

    def test_profile_layer_with_weights(self):
        weights = np.linspace(0.5, 2.0, 40).astype(np.float32)
        layer = HMMLayer(
            ProfileTransitions([4, 6]),
            ProfileEmissions([4, 6]),
            num_seqs=40,
            sequence_weights=weights,
        )
        layer2 = _roundtrip(layer)
        np.testing.assert_allclose(
            np.asarray(layer2.sequence_weights), weights, rtol=1e-6
        )
        params = layer.init_params(KEY, input_dim=26)
        params2 = layer2.init_params(KEY, input_dim=26)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.dirichlet(np.ones(26), (2, 3, 8)).astype(np.float32))
        idx = jnp.arange(3)[None]
        np.testing.assert_allclose(
            float(layer.loss(params, x, indices=idx)),
            float(layer2.loss(params2, x, indices=idx)),
            rtol=1e-6,
        )

    def test_unknown_class_raises(self):
        import pytest

        with pytest.raises(ValueError, match="unknown component class"):
            HMMLayer.from_config(
                {
                    "transitions": {"class": "Bogus", "config": {}},
                    "emissions": [],
                }
            )


class TestTrainerRestore:
    def test_checkpoint_includes_opt_state(self, tmp_path):
        layer = HMMLayer(
            SimpleGenePredTransitions(), SimpleGenePredEmissions(),
            use_prior=False,
        )
        trainer = Trainer(
            layer, checkpoint_dir=str(tmp_path), checkpoint_every=2
        )
        params, opt_state = trainer.init(KEY, input_dim=7)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0.1, 1.0, (1, 4, 16, 7)).astype(np.float32))
        params2, opt_state2, _ = trainer.fit(
            params, opt_state, [x] * 3, log_every=10
        )
        ckpts = sorted(tmp_path.glob("step_*.npz"))
        assert ckpts, "no checkpoint written"
        p_template, o_template = trainer.init(KEY, input_dim=7)
        p_r, o_r = trainer.restore(str(ckpts[-1]), p_template, o_template)
        # restored state equals the live state at the checkpointed step:
        # re-run from the restored pair and from scratch must agree.
        for a, b in zip(jax.tree.leaves(o_r), jax.tree.leaves(opt_state2)):
            assert np.shape(a) == np.shape(b)
        assert any(
            np.any(np.asarray(a) != 0)
            for a in jax.tree.leaves(o_r)
            if np.asarray(a).dtype.kind == "f"
        ), "optimizer moments were not persisted"

    def test_restore_legacy_params_only(self, tmp_path):
        from hmm_layer_tpu.utils import checkpoint as ckpt

        layer = HMMLayer(
            SimpleGenePredTransitions(), SimpleGenePredEmissions(),
            use_prior=False,
        )
        trainer = Trainer(layer)
        params, opt_state = trainer.init(KEY, input_dim=7)
        path = str(tmp_path / "legacy.npz")
        ckpt.save_checkpoint(path, params, step=5)
        p_r, o_r = trainer.restore(path, params, opt_state)
        for a, b in zip(jax.tree.leaves(p_r), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

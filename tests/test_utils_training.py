"""Generic scan drivers, checkpoint round-trip, trainer smoke test,
substitution models."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import SimpleGenePredEmissions, SimpleGenePredTransitions
from hmm_layer_tpu.ops.scan import bidirectional_scan, rnn_scan
from hmm_layer_tpu.training import Trainer, make_frozen_mask
from hmm_layer_tpu.utils import checkpoint as ckpt
from hmm_layer_tpu.utils.substitution import (
    lg4x_matrices,
    lg_matrix,
    make_rate_matrix,
    parse_paml,
    transition_probs,
)

KEY = jax.random.PRNGKey(3)


class TestGenericScan:
    def test_rnn_scan_cumsum_cell(self):
        def cell(x, s):
            new = s + x
            return new, new

        x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 6))
        out = rnn_scan(cell, x, jnp.zeros((2,)))
        np.testing.assert_allclose(out, np.cumsum(np.asarray(x), axis=1))

    def test_rnn_scan_reverse_order(self):
        def cell(x, s):
            new = s + x
            return new, new

        x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 6))
        out = rnn_scan(cell, x, jnp.zeros((1,)), reverse=True)
        # reverse cumsum, reported in original time order
        np.testing.assert_allclose(
            out, np.cumsum(np.asarray(x)[:, ::-1], axis=1)[:, ::-1]
        )

    def test_return_state_and_last(self):
        def cell(x, s):
            return s * 2 + x, s + 1

        x = jnp.ones((3, 4))
        out, state = rnn_scan(
            cell, x, jnp.zeros((3,)), return_sequences=False, return_state=True
        )
        np.testing.assert_allclose(state, 4.0)
        np.testing.assert_allclose(out, 3 * 2 + 1)

    def test_bidirectional_merges(self):
        def cell(x, s):
            new = s + x
            return new, new

        x = jnp.ones((1, 5))
        for mode, check in [
            ("sum", lambda f, b, m: np.allclose(m, f + b)),
            ("concat", lambda f, b, m: m.shape[-1] == 2 * f.shape[-1] if f.ndim > 1 else m.shape == (1, 10)),
            ("mul", lambda f, b, m: np.allclose(m, f * b)),
        ]:
            fwd = rnn_scan(cell, x, jnp.zeros((1,)))
            bwd = rnn_scan(cell, x, jnp.zeros((1,)), reverse=True)
            merged = bidirectional_scan(
                cell, cell, x, jnp.zeros((1,)), jnp.zeros((1,)), merge_mode=mode
            )
            assert check(np.asarray(fwd), np.asarray(bwd), np.asarray(merged))

    def test_bad_merge_mode(self):
        with pytest.raises(ValueError):
            bidirectional_scan(
                lambda x, s: (x, s),
                lambda x, s: (x, s),
                jnp.ones((1, 3)),
                0.0,
                0.0,
                merge_mode="bogus",
            )


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = {
            "transitions": {"kernel": jnp.arange(6.0).reshape(2, 3)},
            "emissions": [{"w": jnp.ones((4,))}, {"w": jnp.zeros((2, 2))}],
        }
        path = str(tmp_path / "ck.npz")
        ckpt.save_checkpoint(path, params, step=7, note="hello")
        like = jax.tree.map(jnp.zeros_like, params)
        restored = ckpt.load_checkpoint(path, like)
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
            np.testing.assert_allclose(a, b)
        meta = ckpt.load_metadata(path)
        assert meta["step"] == 7 and meta["note"] == "hello"

    def test_shape_mismatch_raises(self, tmp_path):
        params = {"w": jnp.ones((3,))}
        path = str(tmp_path / "ck.npz")
        ckpt.save_checkpoint(path, params)
        with pytest.raises(ValueError):
            ckpt.load_checkpoint(path, {"w": jnp.ones((4,))})

    def test_missing_key_raises(self, tmp_path):
        path = str(tmp_path / "ck.npz")
        ckpt.save_checkpoint(path, {"w": jnp.ones((3,))})
        with pytest.raises(KeyError):
            ckpt.load_checkpoint(path, {"v": jnp.ones((3,))})


class TestTrainer:
    def _layer(self, parallel_factor=1):
        return HMMLayer(
            SimpleGenePredTransitions(),
            SimpleGenePredEmissions(),
            use_prior=False,
            parallel_factor=parallel_factor,
        )

    def _batches(self, n, b=4, L=24):
        key = KEY
        for _ in range(n):
            key, sub = jax.random.split(key)
            yield jax.nn.softmax(jax.random.normal(sub, (1, b, L, 7)), axis=-1)

    def test_fit_reduces_loss(self, tmp_path):
        layer = self._layer()
        trainer = Trainer(
            layer,
            optimizer=optax.adam(5e-2),
            checkpoint_dir=str(tmp_path),
            checkpoint_every=5,
        )
        params, opt_state = trainer.init(KEY, input_dim=7)
        batch = next(iter(self._batches(1)))
        loss0 = float(layer.loss(params, batch))
        params, opt_state, loss = trainer.fit(
            params, opt_state, [batch] * 12, log_every=5
        )
        assert float(layer.loss(params, batch)) < loss0
        assert os.path.exists(tmp_path / "step_5.npz")
        assert os.path.exists(tmp_path / "step_10.npz")

    def test_fit_with_chunked_engine(self):
        # Training through the chunked engine exercises the analytic
        # Baum-Welch custom_vjp end-to-end with optax.
        layer = self._layer(parallel_factor=4)
        trainer = Trainer(layer, optimizer=optax.adam(5e-2))
        params, opt_state = trainer.init(KEY, input_dim=7)
        batch = next(iter(self._batches(1)))
        loss0 = float(layer.loss(params, batch))
        params, opt_state, loss = trainer.fit(
            params, opt_state, [batch] * 10
        )
        assert float(layer.loss(params, batch)) < loss0

    def test_microbatched_grad_matches_full(self):
        from hmm_layer_tpu.training import microbatched_value_and_grad

        layer = self._layer()
        params = layer.init_params(KEY, input_dim=7)
        batch = next(iter(self._batches(1, b=8)))
        loss_full, g_full = jax.value_and_grad(layer.loss)(params, batch)
        loss_mb, g_mb = microbatched_value_and_grad(
            lambda p, part: layer.loss(p, part), params, batch, micro=2
        )
        np.testing.assert_allclose(
            float(loss_full), float(loss_mb), rtol=1e-5
        )
        for a, b_ in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_mb)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6
            )

    def test_microbatched_trainer_step_matches_full(self):
        # SGD: updates proportional to grads, so fp-level accumulation
        # differences stay fp-level (adam's m/sqrt(v) amplifies noise on
        # near-zero gradient components to O(lr)).
        layer = self._layer()
        batch = next(iter(self._batches(1, b=8)))
        results = []
        for micro in (None, 4):
            trainer = Trainer(
                layer, optimizer=optax.sgd(0.5), microbatch=micro
            )
            params, opt_state = trainer.init(KEY, input_dim=7)
            params, opt_state, loss = trainer.fit(
                params, opt_state, [batch] * 3
            )
            results.append((params, float(loss)))
        (p_full, l_full), (p_mb, l_mb) = results
        np.testing.assert_allclose(l_full, l_mb, rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_mb)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6
            )

    def test_microbatch_indivisible_raises(self):
        from hmm_layer_tpu.training import microbatched_value_and_grad

        layer = self._layer()
        params = layer.init_params(KEY, input_dim=7)
        batch = next(iter(self._batches(1, b=6)))
        with pytest.raises(ValueError, match="divisible"):
            microbatched_value_and_grad(
                lambda p, part: layer.loss(p, part), params, batch, micro=4
            )

    def test_frozen_mask_keeps_params(self):
        from hmm_layer_tpu.models import ProfileEmissions, ProfileTransitions

        layer = HMMLayer(
            ProfileTransitions(4),
            ProfileEmissions(4, frozen_insertions=True),
            use_prior=False,
        )
        trainer = Trainer(layer, optimizer=optax.sgd(0.5))
        params, opt_state = trainer.init(KEY, input_dim=25)
        ins_before = np.asarray(params["emissions"][0]["insertion_kernel"][0])
        x = jax.nn.one_hot(
            jax.random.randint(KEY, (1, 2, 6), 0, 20), 25, dtype=jnp.float32
        )
        params, opt_state, _ = trainer.fit(params, opt_state, [x, x, x])
        ins_after = np.asarray(params["emissions"][0]["insertion_kernel"][0])
        np.testing.assert_array_equal(ins_before, ins_after)
        # but match kernels did move
        em_after = np.asarray(params["emissions"][0]["emission_kernel"][0])
        assert not np.allclose(em_after, 0.0)


class TestSubstitution:
    def test_lg(self):
        R, p = lg_matrix()
        assert R.shape == (20, 20) and np.allclose(R, R.T)
        assert abs(p.sum() - 1) < 1e-4

    def test_lg4x(self):
        mats = lg4x_matrices()
        assert len(mats) == 4
        for R, p in mats:
            assert abs(p.sum() - 1) < 1e-3

    def test_rate_matrix_and_expm(self):
        R, p = lg_matrix()
        Q = make_rate_matrix(R, p)
        assert np.allclose(Q.sum(-1), 0, atol=1e-5)
        P = np.asarray(transition_probs(Q, np.asarray(1.0)))
        assert np.allclose(P.sum(-1), 1, atol=1e-4)
        # t=0 -> identity
        P0 = np.asarray(transition_probs(Q, np.asarray(0.0)))
        assert np.allclose(P0, np.eye(20), atol=1e-5)

    def test_parse_paml_reorder(self):
        R, p = lg_matrix()
        # round-trip through parse_paml with a permuted alphabet
        alpha = "ACDEFGHIKLMNPQRSTVWY"
        R2, p2 = lg_matrix(alpha)
        assert R2.shape == (20, 20)
        assert not np.allclose(R, R2)  # reordered
        assert abs(p2.sum() - 1) < 1e-4


class TestFitSelect:
    """learnMSA-style model-selection workflow: train n models jointly,
    rank by held-out loglik, carve out the best via component surgery."""

    def test_profile_fit_select(self):
        from hmm_layer_tpu.models import ProfileEmissions, ProfileTransitions

        lengths = [4, 5, 6]
        layer = HMMLayer(
            ProfileTransitions(lengths),
            ProfileEmissions(lengths),
            use_prior=False,
        )
        params = layer.init_params(KEY, input_dim=26)
        rng = np.random.default_rng(0)
        x = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 25, size=(1, 8, 12))), 26,
            dtype=jnp.float32,
        )
        x = jnp.broadcast_to(x, (3, 8, 12, 26))
        trainer = Trainer(layer, optimizer=optax.adam(1e-2))
        params, opt_state = trainer.init(KEY, input_dim=26)
        res = trainer.fit_select(
            params, opt_state, [x] * 3, score_batches=[x], keep=1
        )
        assert res.scores.shape == (3,)
        best = int(res.ranking[0])
        assert res.layer.transitions.num_models == 1
        assert res.layer.transitions.lengths == [lengths[best]]
        # Selected single-model layer reproduces the joint layer's loglik
        # for the chosen model.
        ll_joint = np.asarray(layer.log_likelihood(res.params, x))
        q_best = 2 * lengths[best] + 3
        x_best = x[best : best + 1]
        ll_sel = np.asarray(
            res.layer.log_likelihood(res.selected_params, x_best)
        )
        np.testing.assert_allclose(ll_sel[0], ll_joint[best], rtol=1e-5)

    def test_gene_pred_fit_select_config_path(self):
        # SimpleGenePred components have no indexed duplicate — selection
        # goes through the config + leading-axis slice fallback.
        m = 3
        layer = HMMLayer(
            SimpleGenePredTransitions(num_models=m),
            SimpleGenePredEmissions(num_models=m),
            use_prior=False,
        )
        params = layer.init_params(KEY, input_dim=7)
        # Make per-model emissions differ so scores differ.
        params["emissions"][0]["emission_kernel"] = jnp.asarray(
            np.random.default_rng(1)
            .normal(size=np.asarray(params["emissions"][0]["emission_kernel"]).shape)
            .astype(np.float32)
        )
        rng = np.random.default_rng(2)
        x = jnp.asarray(
            rng.dirichlet(np.ones(7), size=(m, 4, 9)).astype(np.float32)
        )
        trainer = Trainer(layer, optimizer=optax.adam(1e-2))
        p2, opt_state = trainer.init(KEY, input_dim=7)
        p2["emissions"] = params["emissions"]
        res = trainer.fit_select(
            p2, opt_state, [x], score_batches=[x], keep=1
        )
        best = int(res.ranking[0])
        assert res.layer.emissions[0].num_models == 1
        ll_joint = np.asarray(layer.log_likelihood(res.params, x))
        ll_sel = np.asarray(
            res.layer.log_likelihood(res.selected_params, x[best : best + 1])
        )
        np.testing.assert_allclose(ll_sel[0], ll_joint[best], rtol=1e-5)


class TestResilience:
    def test_hang_watchdog_fires_and_dumps(self, capsys):
        import io
        import time as _time

        from hmm_layer_tpu.utils.resilience import HangWatchdog

        buf = io.StringIO()
        called = []
        wd = HangWatchdog(
            timeout_s=0.05, on_timeout=lambda: called.append(1), stream=buf
        )
        with wd:
            _time.sleep(0.2)
        assert wd.fired and called == [1]
        assert "thread stacks" in buf.getvalue()

    def test_hang_watchdog_disarms(self):
        from hmm_layer_tpu.utils.resilience import HangWatchdog

        wd = HangWatchdog(timeout_s=0.2)
        with wd:
            pass
        import time as _time

        _time.sleep(0.3)
        assert not wd.fired

    def test_latest_checkpoint_roundtrip(self, tmp_path):
        from hmm_layer_tpu.utils.resilience import latest_checkpoint

        params = {"a": jnp.arange(3.0), "b": [jnp.ones((2, 2))]}
        assert latest_checkpoint(str(tmp_path)) is None
        for step in (10, 200, 30):
            ckpt.save_checkpoint(
                str(tmp_path / f"step_{step}.npz"), params, step=step
            )
        path, step = latest_checkpoint(str(tmp_path))
        assert step == 200 and path.endswith("step_200.npz")
        restored = ckpt.load_checkpoint(path, like=params)
        np.testing.assert_allclose(restored["a"], np.arange(3.0))

    def test_init_distributed_retries_then_raises(self, monkeypatch):
        import jax

        from hmm_layer_tpu.utils import resilience

        calls = []

        def failing(**kw):
            calls.append(1)
            raise RuntimeError("coordinator unavailable")

        monkeypatch.setattr(jax.distributed, "initialize", failing)
        with pytest.raises(RuntimeError, match="coordinator"):
            resilience.init_distributed_with_retries(
                max_retries=2, backoff_s=0.01
            )
        assert len(calls) == 3


class TestCheckpointSuffixNormalization:
    def test_metadata_found_regardless_of_suffix(self, tmp_path):
        """np.savez appends .npz when absent; the metadata sidecar must be
        found whether the caller passes the suffix-less save path or the
        actual on-disk .npz filename (regression: load_metadata('x.npz')
        probed 'x.npz.meta.json' and silently returned {})."""
        from hmm_layer_tpu.utils import checkpoint as ckpt

        params = {"w": jnp.ones((3,))}
        base = str(tmp_path / "ck")
        ckpt.save_checkpoint(base, params, step=5)
        assert ckpt.load_metadata(base)["step"] == 5
        assert ckpt.load_metadata(base + ".npz")["step"] == 5
        restored = ckpt.load_checkpoint(base + ".npz", params)
        np.testing.assert_allclose(jax.tree.leaves(restored)[0], 1.0)


class TestTrainableMasks:
    def test_gene_pred_trainable_emissions_false_freezes_kernel(self):
        """Regression: SimpleGenePredEmissions stored trainable_emissions
        but exposed no trainable_mask, so the kernel always trained."""
        from hmm_layer_tpu.models import SimpleGenePredEmissions
        from hmm_layer_tpu.training import make_frozen_mask
        from hmm_layer_tpu import HMMLayer
        from hmm_layer_tpu.models import SimpleGenePredTransitions

        em = SimpleGenePredEmissions(trainable_emissions=False)
        layer = HMMLayer(SimpleGenePredTransitions(), em, use_prior=False)
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=7)
        mask = make_frozen_mask(layer, params)
        assert mask["emissions"][0]["emission_kernel"] is False

    def test_profile_frozen_kernel_alias_names(self):
        """frozen_kernels may name ANY member of a shared-kernel group
        (regression: only the canonical name froze the shared kernel)."""
        from hmm_layer_tpu.models import ProfileTransitions

        for name in ("left_flank_loop", "right_flank_loop"):
            trans = ProfileTransitions([4], frozen_kernels={name: True})
            params = trans.init_params(jax.random.PRNGKey(0))
            mask = trans.trainable_mask(params)
            assert mask["kernels"][0]["right_flank_loop"] is False, name
            assert mask["kernels"][0]["match_to_match"] is True


def test_microbatch_rejects_sequence_weight_indices():
    layer = HMMLayer(
        SimpleGenePredTransitions(),
        SimpleGenePredEmissions(),
        use_prior=False,
        sequence_weights=np.ones(8, np.float32),
    )
    trainer = Trainer(layer, optimizer=optax.sgd(0.1), microbatch=2)
    params, opt_state = trainer.init(KEY, input_dim=7)
    batch = jax.nn.softmax(jax.random.normal(KEY, (1, 4, 12, 7)), axis=-1)
    with pytest.raises(ValueError, match="microbatch"):
        trainer.fit(
            params, opt_state, [(batch, jnp.arange(4))], steps=1
        )

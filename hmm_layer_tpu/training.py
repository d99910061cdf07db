"""Gradient-based MAP training for HMM layers.

The reference ships no training loop, optimizer integration, checkpointing
or metrics (SURVEY.md §0); this provides the TPU-native equivalent: an
optax-based trainer over :class:`hmm_layer_tpu.layer.HMMLayer` with

* frozen-parameter support (``trainable_mask`` from transition/emission
  models — e.g. frozen insertions, ``Emitter.py:70-72``, and frozen kernel
  parts, ``Transitioner.py:22``);
* optional data-parallel execution over a mesh axis;
* periodic checkpointing (:mod:`hmm_layer_tpu.utils.checkpoint`) and
  JSON-lines metrics.
"""

from __future__ import annotations

import inspect
from typing import Iterable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .layer import HMMLayer
from .utils import checkpoint as ckpt
from .utils.metrics import MetricsLogger, Throughput

__all__ = [
    "Trainer",
    "make_frozen_mask",
    "microbatched_value_and_grad",
    "select_models",
    "FitSelectResult",
]


def select_models(component, params, indices):
    """Sub-select models from a transition/emission component.

    Uses the component's ``duplicate(params, model_indices=...)`` surgery
    hook where available (profile family); otherwise rebuilds from config
    with the new ``num_models`` and slices each param leaf whose leading
    axis carries the model count (gene-pred family — leaves without a model
    axis, e.g. shared transition kernels, pass through).
    """
    if hasattr(component, "duplicate"):
        sig = inspect.signature(component.duplicate)
        if "model_indices" in sig.parameters:
            return component.duplicate(params, model_indices=list(indices))
    n = getattr(component, "num_models", 1)
    config = component.get_config()
    if "num_models" in config:
        config["num_models"] = len(indices)
    copy = type(component).from_config(config)
    idx = jnp.asarray(list(indices))

    def take(x):
        x = jnp.asarray(x)
        if x.ndim and x.shape[0] == n:
            return jnp.take(x, idx, axis=0)
        return jnp.copy(x)

    return copy, jax.tree.map(take, params)


def microbatched_value_and_grad(loss_fn, params, batch, micro: int):
    """Gradient accumulation over the sequence-batch axis (axis 1).

    Computes ``mean_k loss_fn(params, batch[:, k*micro:(k+1)*micro])`` and
    its gradient via a ``lax.scan`` over micro-chunks, so the peak
    residual memory is one micro-batch's worth instead of the whole
    batch's (chunks are read from the original buffers with
    ``dynamic_slice`` — no rearranged copy of the batch is materialized).

    EXACT for objectives that are UNWEIGHTED means over the batch axis
    plus batch-independent terms (the MAP loss's scaled prior and the
    unmasked CE loss qualify: the mean over equal-size chunks averages to
    the full-batch mean, and the prior/aux terms appear once in the
    mean). NOT exact for per-batch-normalized weighted aggregates —
    ``sum(w*ll)/sum(w)`` or a ``label_mask``-normalized CE computed
    per chunk averages with uniform 1/k weights, which differs whenever
    chunk weight/mask sums differ (and can even flip gradient signs). For
    those, normalize inside ``loss_fn`` by the FULL-batch weight/mask sum
    (a constant you close over), not the chunk's own sum.

    Args:
        loss_fn: ``loss_fn(params, micro_batch) -> scalar``.
        batch: pytree of arrays shaped ``(m, b, ...)``; ``b`` must be
            divisible by ``micro``.
        micro: sequences per micro-batch.
    Returns:
        ``(loss, grads)`` matching ``jax.value_and_grad`` of the
        full-batch mean objective.
    """
    b = jax.tree_util.tree_leaves(batch)[0].shape[1]
    if b % micro:
        raise ValueError(
            f"batch axis ({b}) must be divisible by microbatch ({micro})"
        )
    k = b // micro
    if k == 1:
        return jax.value_and_grad(lambda p: loss_fn(p, batch))(params)

    def body(carry, i):
        loss_sum, grad_sum = carry
        part = jax.tree.map(
            lambda leaf: jax.lax.dynamic_slice_in_dim(
                leaf, i * micro, micro, axis=1
            ),
            batch,
        )
        l, g = jax.value_and_grad(lambda p: loss_fn(p, part))(params)
        return (
            loss_sum + l,
            jax.tree.map(jnp.add, grad_sum, g),
        ), None

    zero = (
        jnp.zeros((), jnp.result_type(float)),
        jax.tree.map(jnp.zeros_like, params),
    )
    (loss_sum, grad_sum), _ = jax.lax.scan(body, zero, jnp.arange(k))
    inv = 1.0 / k
    return loss_sum * inv, jax.tree.map(lambda g: g * inv, grad_sum)


class FitSelectResult(NamedTuple):
    """Result of :meth:`Trainer.fit_select`."""

    params: dict  # all-model params after training
    opt_state: object
    loss: object
    scores: np.ndarray  # (num_models,) mean per-model log-likelihood
    ranking: np.ndarray  # model indices, best first
    layer: HMMLayer  # layer holding only the kept model(s)
    selected_params: dict  # params of the kept model(s)


def make_frozen_mask(layer: HMMLayer, params) -> dict:
    """Boolean pytree: True = trainable. Uses each component's
    ``trainable_mask`` when available, else all-True."""

    def mask_of(component, p):
        if hasattr(component, "trainable_mask"):
            return component.trainable_mask(p)
        return jax.tree.map(lambda _: True, p)

    return {
        "transitions": mask_of(layer.transitions, params["transitions"]),
        "emissions": [
            mask_of(em, p) for em, p in zip(layer.emissions, params["emissions"])
        ],
    }


class Trainer:
    """MAP trainer for an :class:`HMMLayer`.

    Args:
        layer: the HMM layer (defines the loss). If the layer was built
            with ``mesh``/``partition`` (distributed routing), the trainer
            adopts them: each batch is placed with its sequence axis over
            the layer's ``seq`` axis and/or its batch axis over the
            ``batch`` axis, and the jitted ``value_and_grad`` step runs
            through the layer's sharded loss (seq/state-sharded paths use
            shard_map-aware analytic VJPs).
        optimizer: optax transform; default adam(1e-2).
        mesh / data_axis: legacy data-parallel-only alternative — shard
            batches over ``data_axis`` of ``mesh`` with a dense layer.
        checkpoint_dir: if set, checkpoints every ``checkpoint_every`` steps.
    """

    def __init__(
        self,
        layer: HMMLayer,
        optimizer=None,
        mesh=None,
        data_axis: str = "data",
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 100,
        metrics_path: str | None = None,
        loss_fn=None,
        microbatch: int | None = None,
    ):
        self.layer = layer
        #: optional objective override ``loss_fn(params, batch, indices)``;
        #: ``batch`` is whatever the fit iterable yields (any pytree of
        #: arrays — e.g. ``{"x": ..., "labels": ...}`` for the supervised
        #: posterior-CE objective). Default: ``layer.loss`` (MAP).
        self.loss_fn = loss_fn
        self.optimizer = optimizer or optax.adam(1e-2)
        self.mesh = mesh
        self.data_axis = data_axis
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        #: gradient accumulation: compute value_and_grad in micro-batches
        #: of this many sequences (batch axis 1) and average — identical
        #: objective, O(b/microbatch) smaller residual memory. Unlocks
        #: e.g. config-5 posterior-CE at b=64, which OOMs whole-batch
        #: (33 G > 15.75 G HBM, BASELINE.md round 4).
        self.microbatch = microbatch
        self.metrics = MetricsLogger(metrics_path)
        self._train_step = None

    def init(self, key, input_dim: int):
        params = self.layer.init_params(key, input_dim)
        return params, self.init_from_params(params)

    def init_from_params(self, params):
        """Fresh optimizer state for EXISTING params — after a checkpoint
        load into a new Trainer, or after model surgery that changes the
        param structure (``HMMLayer.resize``, ``select_models``)."""
        mask = make_frozen_mask(self.layer, params)
        labels = jax.tree.map(
            lambda trainable: "trainable" if trainable else "frozen", mask
        )
        tx = optax.multi_transform(
            {"trainable": self.optimizer, "frozen": optax.set_to_zero()},
            labels,
        )
        opt_state = tx.init(params)
        self._tx = tx
        self._train_step = None
        return opt_state

    def _build_step(self):
        layer, tx = self.layer, self._tx
        micro = self.microbatch
        loss_fn = self.loss_fn or (
            lambda p, batch, indices: layer.loss(p, batch, indices=indices)
        )

        def train_step(params, opt_state, batch, indices):
            if micro:
                if indices is not None:
                    raise ValueError(
                        "Trainer(microbatch=...) does not compose with "
                        "sequence-weight indices: the full-batch index "
                        "array cannot be applied to a micro-chunk's "
                        "logliks, and a per-chunk weighted mean would "
                        "average WRONGLY (uniform 1/k chunk weights). "
                        "Use a custom loss_fn that puts the per-sequence "
                        "weights into the batch pytree AND normalizes by "
                        "the full-batch weight sum (a constant), not the "
                        "chunk's own sum."
                    )
                loss, grads = microbatched_value_and_grad(
                    lambda p, part: loss_fn(p, part, None),
                    params,
                    batch,
                    micro,
                )
            else:
                loss, grads = jax.value_and_grad(
                    lambda p: loss_fn(p, batch, indices)
                )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        step = jax.jit(train_step)
        mesh = self.mesh if self.mesh is not None else getattr(layer, "mesh", None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if self.mesh is None and getattr(layer, "partition", None):
                # Adopt the layer's logical partition: batch dim 1, seq dim 2.
                dims = {
                    1: layer.partition.get("batch"),
                    2: layer.partition.get("seq"),
                }
            else:
                dims = {1: self.data_axis}

            def place(batch):
                spec = [None] * batch.ndim
                for d, name in dims.items():
                    if name is not None and d < batch.ndim:
                        spec[d] = name
                return jax.device_put(
                    batch, NamedSharding(mesh, PartitionSpec(*spec))
                )

            def sharded_step(params, opt_state, batch, indices=None):
                return step(
                    params, opt_state, jax.tree.map(place, batch), indices
                )

            return sharded_step
        return step

    def fit(
        self,
        params,
        opt_state,
        batches: Iterable,
        steps: int | None = None,
        log_every: int = 10,
        hang_timeout_s: float | None = None,
    ):
        """Run training over an iterable of (m, b, L, s) batches (or
        (batch, indices) pairs when sequence weights are used).

        ``hang_timeout_s`` arms a :class:`utils.resilience.HangWatchdog`
        around each host sync: a wedged device step dumps thread stacks and
        raises RuntimeError so an outer supervisor can restart from the
        latest checkpoint (``utils.resilience.latest_checkpoint``).
        """
        from .utils.resilience import HangWatchdog

        if self._train_step is None:
            self._train_step = self._build_step()
        watchdog = (
            HangWatchdog(hang_timeout_s) if hang_timeout_s else None
        )
        meter = Throughput()
        loss = None
        for step_idx, batch in enumerate(batches):
            if steps is not None and step_idx >= steps:
                break
            if isinstance(batch, tuple):
                batch, indices = batch
            else:
                indices = None
            params, opt_state, loss = self._train_step(
                params, opt_state, batch, indices
            )
            # batch is (m, b, L, s) (or a pytree of such — count the first
            # leaf): b sequences per step (each sequence is scored by every
            # model; models do not multiply the count).
            meter.update(jax.tree_util.tree_leaves(batch)[0].shape[1])
            if step_idx % log_every == 0:
                if watchdog is not None:
                    with watchdog:
                        loss_val = float(np.asarray(loss))  # host sync
                    if watchdog.fired:
                        raise RuntimeError(
                            f"training step {step_idx} exceeded "
                            f"{hang_timeout_s}s (stacks dumped); restart "
                            "from the latest checkpoint"
                        )
                else:
                    loss_val = float(np.asarray(loss))  # host sync
                self.metrics.log(
                    step_idx,
                    loss=loss_val,
                    seqs_per_sec=meter.seqs_per_sec,
                )
            if (
                self.checkpoint_dir
                and step_idx
                and step_idx % self.checkpoint_every == 0
            ):
                # Full training state: params AND optimizer state, so a
                # resumed run continues with intact moments/counters
                # instead of a cold optimizer.
                ckpt.save_checkpoint(
                    f"{self.checkpoint_dir}/step_{step_idx}.npz",
                    {"params": params, "opt_state": opt_state},
                    step=step_idx,
                )
        return params, opt_state, loss

    def restore(self, path: str, params, opt_state):
        """Load a :meth:`fit` checkpoint into (params, opt_state) templates.

        ``params``/``opt_state`` supply the pytree structure (e.g. from
        :meth:`init`); returns the restored pair. Accepts legacy
        params-only checkpoints (pre-round-3) transparently.
        """
        try:
            state = ckpt.load_checkpoint(
                path, {"params": params, "opt_state": opt_state}
            )
            return state["params"], state["opt_state"]
        except KeyError:
            return ckpt.load_checkpoint(path, params), opt_state

    def score_models(self, params, batches: Iterable) -> np.ndarray:
        """Mean per-model log-likelihood over ``batches``; (num_models,)."""
        score = jax.jit(
            lambda p, x: jnp.sum(self.layer.log_likelihood(p, x), axis=1)
        )
        total = count = 0
        for batch in batches:
            if isinstance(batch, tuple):
                batch = batch[0]
            total = total + np.asarray(score(params, batch))  # (m,)
            count += batch.shape[1]
        return total / max(count, 1)

    def fit_select(
        self,
        params,
        opt_state,
        batches: Iterable,
        score_batches: Iterable,
        steps: int | None = None,
        keep: int = 1,
        log_every: int = 10,
    ) -> FitSelectResult:
        """Train all models jointly, score them, keep the best.

        The learnMSA workflow (SURVEY §5 checkpoint row): n models train
        jointly on the engine's model axis, are ranked by held-out mean
        log-likelihood, and the best ``keep`` are carved out with the
        components' ``duplicate``/config surgery (:func:`select_models`)
        into a ready-to-use :class:`HMMLayer` + params.
        """
        params, opt_state, loss = self.fit(
            params, opt_state, batches, steps=steps, log_every=log_every
        )
        scores = self.score_models(params, score_batches)
        ranking = np.argsort(-scores)
        best = [int(i) for i in ranking[:keep]]

        new_trans, trans_params = select_models(
            self.layer.transitions, params["transitions"], best
        )
        new_emissions, em_params = [], []
        for em, p in zip(self.layer.emissions, params["emissions"]):
            ne, np_ = select_models(em, p, best)
            new_emissions.append(ne)
            em_params.append(np_)
        layer = HMMLayer(
            new_trans,
            new_emissions,
            num_seqs=self.layer.num_seqs,
            use_prior=self.layer.use_prior,
            sequence_weights=self.layer.sequence_weights,
            parallel_factor=self.layer.parallel_factor,
        )
        return FitSelectResult(
            params=params,
            opt_state=opt_state,
            loss=loss,
            scores=scores,
            ranking=ranking,
            layer=layer,
            selected_params={
                "transitions": trans_params,
                "emissions": em_params,
            },
        )

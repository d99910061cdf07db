"""Top-level HMM layer: batch-level likelihood / posterior orchestration.

Functional JAX equivalent of ``MsaHmmLayer``
(``/root/reference/hmm_layer/MsaHMMLayer.py:8-224``) — the same API surface
(forward/backward recursions, posterior state probs with ``no_loglik``,
sequence weights, prior scaling by ``num_seqs`` or weight sum, aux losses,
``parallel_factor``), but as a thin stateless orchestrator over the scan
engine in :mod:`hmm_layer_tpu.ops.recursion`; there is no RNN-cell /
Bidirectional / TotalProbabilityCell object graph to mirror because the
engine subsumes them.

Trainable state lives in a params pytree::

    params = {"transitions": ..., "emissions": [...]}

created by :meth:`HMMLayer.init_params` and consumed by pure, jittable
methods.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ops import recursion, sampling

__all__ = ["HMMLayer"]


class HMMLayer:
    """Computes log-likelihoods and posterior state probabilities for batches
    of observations under one or more HMMs.

    Args:
        transitions: transition model (``matrices(params) -> (init, A)``,
            ``init_params``, ``prior_log_density``).
        emissions: emission model or list of models; multiple emitters are
            multiplied (``MsaHmmCell.emission_probs``, ``MsaHmmCell.py:61-71``).
        num_seqs: dataset size used to scale the prior.
        use_prior: add the prior to the training objective.
        sequence_weights: optional per-sequence weights (indexed via the
            ``indices`` argument of :meth:`loss`).
        parallel_factor: chunked-parallel factor along the sequence axis
            (must divide the sequence length), or ``"auto"`` to pick the
            measured-optimal factor per call from the input shape
            (:func:`hmm_layer_tpu.ops.recursion.recommended_parallel_factor`).
            Under sequence sharding it is the *device-local* factor
            (applied to ``L / mesh.shape[seq_axis]``).
        mesh: optional :class:`jax.sharding.Mesh`; with ``partition`` it
            routes :meth:`loss` / :meth:`log_likelihood` /
            :meth:`state_posterior_log_probs` / :meth:`viterbi` through the
            distributed engine (:mod:`hmm_layer_tpu.parallel.sharding`) —
            the one-stop role of the reference's ``MsaHmmLayer``
            (``MsaHMMLayer.py:180-208``) extended to multi-chip.
        partition: maps logical axes to mesh axis names, e.g.
            ``{"batch": "data"}`` (data parallel),
            ``{"batch": "data", "seq": "seq"}`` (genome-length sequences;
            requires ``L`` divisible by the seq-axis size) or
            ``{"batch": "data", "state": "state"}`` (500+-state models;
            requires ``q`` divisible by the state-axis size). ``"seq"``
            and ``"state"`` are mutually exclusive. Sparse-forward
            transitions compose with ``"batch"`` (data-parallel edge
            scans) and ``"state"`` (edge-sharded state parallelism —
            ``q`` auto-pads; capacity lever, see
            ``parallel.sparse_sharding`` / docs/API.md), but not
            ``"seq"``.
    """

    _LOGICAL_AXES = ("batch", "seq", "state")

    def __init__(
        self,
        transitions,
        emissions,
        num_seqs: int | None = None,
        use_prior: bool = True,
        sequence_weights=None,
        parallel_factor: int | str = 1,
        mesh=None,
        partition: dict | None = None,
    ):
        self.transitions = transitions
        self.emissions = emissions if isinstance(emissions, list) else [emissions]
        self.num_seqs = num_seqs
        self.use_prior = use_prior
        self.sequence_weights = (
            None if sequence_weights is None else jnp.asarray(sequence_weights)
        )
        self.parallel_factor = parallel_factor
        self.mesh = mesh
        self.partition = dict(partition) if partition else {}
        if self.partition and mesh is None:
            raise ValueError("`partition` given without a `mesh`")
        unknown = set(self.partition) - set(self._LOGICAL_AXES)
        if unknown:
            raise ValueError(
                f"unknown partition axes {sorted(unknown)}; valid: "
                f"{self._LOGICAL_AXES}"
            )
        if "seq" in self.partition and "state" in self.partition:
            raise NotImplementedError(
                "combined sequence+state sharding is deliberately "
                "unsupported: the composition has no beneficial regime on "
                "the measured map (docs/API.md 'Combined seq+state "
                "sharding' — seq sharding's q*q chunk summaries cost O(q^3) "
                "and lose above q~16, exactly where state sharding starts "
                "to pay). Use state (+batch) sharding for big-q long-L "
                "models; either axis combines with 'batch'."
            )
        if mesh is not None:
            for logical, name in self.partition.items():
                if name not in mesh.shape:
                    raise ValueError(
                        f"partition {logical!r} -> {name!r} is not an axis "
                        f"of the mesh (axes: {dict(mesh.shape)})"
                    )

    def _pf(self, E, for_viterbi: bool = False) -> int:
        L = E.shape[2]
        if self._route() == "seq":
            # parallel_factor is device-local under sequence sharding.
            L = L // self.mesh.shape[self.partition["seq"]]
        if self.parallel_factor == "auto":
            m, b, _, q = E.shape
            return recursion.recommended_parallel_factor(L, q, m, for_viterbi)
        return self.parallel_factor

    # -- distributed routing ----------------------------------------------------

    def _route(self) -> str:
        if self.mesh is None:
            return "dense"
        if "state" in self.partition:
            return "state"
        if "seq" in self.partition:
            return "seq"
        if "batch" in self.partition:
            return "data"
        return "dense"

    def _constrain_data(self, E):
        """Pin the batch axis of E to its mesh axis (data-parallel route)."""
        from jax.sharding import NamedSharding, PartitionSpec

        spec = [None] * E.ndim
        spec[1] = self.partition["batch"]
        return jax.lax.with_sharding_constraint(
            E, NamedSharding(self.mesh, PartitionSpec(*spec))
        )

    def _require_dense(self, what: str):
        if self._route() in ("seq", "state"):
            raise NotImplementedError(
                f"{what} has no sequence/state-sharded implementation; "
                "construct a dense HMMLayer (mesh=None or batch-only "
                "partition) for it, or call the functions in "
                "hmm_layer_tpu.parallel.sharding directly"
            )

    def _pad_state(self, init, A, E):
        """Pad q up to a multiple of the state-axis size (the sharded
        engine requires divisibility). Pad states have zero init, all-zero
        A rows/columns and zero emissions: the engine's EPS clamps give
        them per-step mass ~1e-32 (f32-invisible against real
        normalizers) and max-plus scores ~-74/step below any real path —
        they never affect results. Returns the original q for slicing."""
        n = self.mesh.shape[self.partition["state"]]
        q = E.shape[-1]
        q_pad = -(-q // n) * n
        if q_pad == q:
            return init, A, E, q
        dp = q_pad - q
        init = jnp.pad(init, ((0, 0), (0, dp)))
        A = jnp.pad(A, ((0, 0), (0, dp), (0, dp)))
        E = jnp.pad(E, ((0, 0),) * (E.ndim - 1) + ((0, dp),))
        return init, A, E, q

    def _dispatch_log_likelihood(self, init, A, E):
        route = self._route()
        if route in ("dense", "data"):
            if route == "data":
                E = self._constrain_data(E)
            return recursion.log_likelihood(init, A, E, self._pf(E))
        from .parallel import sharding

        if route == "state":
            pf = self._pf(E)
            init, A, E, _ = self._pad_state(init, A, E)
            return sharding.state_sharded_log_likelihood(
                init, A, E, self.mesh,
                state_axis=self.partition["state"],
                data_axis=self.partition.get("batch"),
                parallel_factor=pf,
            )
        return sharding.seq_sharded_log_likelihood(
            init, A, E, self.mesh,
            seq_axis=self.partition["seq"],
            data_axis=self.partition.get("batch"),
            local_parallel_factor=self._pf(E),
        )

    def _dispatch_posterior(self, init, A, E, no_loglik):
        route = self._route()
        if route in ("dense", "data"):
            if route == "data":
                E = self._constrain_data(E)
            return recursion.posterior(
                init, A, E, self._pf(E), no_loglik=no_loglik
            )
        from .parallel import sharding

        if route == "state":
            pf = self._pf(E)
            init, A, E, q = self._pad_state(init, A, E)
            lg, ll = sharding.state_sharded_posterior(
                init, A, E, self.mesh,
                state_axis=self.partition["state"],
                data_axis=self.partition.get("batch"),
                no_loglik=no_loglik,
                parallel_factor=pf,
            )
            return lg[..., :q], ll
        return sharding.seq_sharded_posterior(
            init, A, E, self.mesh,
            seq_axis=self.partition["seq"],
            data_axis=self.partition.get("batch"),
            local_parallel_factor=self._pf(E),
            no_loglik=no_loglik,
        )

    def _dispatch_viterbi(self, init, A, E):
        route = self._route()
        if route in ("dense", "data"):
            if route == "data":
                E = self._constrain_data(E)
            return recursion.viterbi(init, A, E, self._pf(E, for_viterbi=True))
        from .parallel import sharding

        if route == "state":
            init, A, E, _ = self._pad_state(init, A, E)
            return sharding.state_sharded_viterbi(
                init, A, E, self.mesh,
                state_axis=self.partition["state"],
                data_axis=self.partition.get("batch"),
            )
        return sharding.seq_sharded_viterbi(
            init, A, E, self.mesh,
            seq_axis=self.partition["seq"],
            data_axis=self.partition.get("batch"),
            local_parallel_factor=self._pf(E, for_viterbi=True),
        )

    # -- params ---------------------------------------------------------------

    def init_params(self, key, input_dim: int) -> dict:
        keys = jax.random.split(key, 1 + len(self.emissions))
        return {
            "transitions": self.transitions.init_params(keys[0]),
            "emissions": [
                em.init_params(k, input_dim)
                for em, k in zip(self.emissions, keys[1:])
            ],
        }

    # -- building blocks -------------------------------------------------------

    def emission_probs(self, params, inputs, end_hints=None, training=False):
        """Product of all emitters' per-state probabilities; (m, b, L, q)."""
        probs = self.emissions[0].emissions(
            params["emissions"][0], inputs, end_hints=end_hints, training=training
        )
        for em, p in zip(self.emissions[1:], params["emissions"][1:]):
            probs = probs * em.emissions(
                p, inputs, end_hints=end_hints, training=training
            )
        return probs

    def _ingredients(self, params, inputs, end_hints, training):
        init, A = self.transitions.matrices(params["transitions"])
        E = self.emission_probs(params, inputs, end_hints, training)
        return init, A, E

    # -- inference -------------------------------------------------------------

    def forward_recursion(
        self, params, inputs, end_hints=None, return_prior=False, training=False
    ):
        """(log_forward (m,b,L,q), loglik (m,b)[, prior, aux_loss])."""
        self._require_dense("forward_recursion")
        init, A, E = self._ingredients(params, inputs, end_hints, training)
        la, ll = recursion.forward(init, A, E, self._pf(E))
        if return_prior:
            return la, ll, self.compute_prior(params, scaled=False), self.aux_loss(params)
        return la, ll

    def backward_recursion(
        self, params, inputs, end_hints=None, return_prior=False, training=False
    ):
        self._require_dense("backward_recursion")
        init, A, E = self._ingredients(params, inputs, end_hints, training)
        lb = recursion.backward(init, A, E, self._pf(E))
        if return_prior:
            return lb, self.compute_prior(params, scaled=False), self.aux_loss(params)
        return lb

    def state_posterior_log_probs(
        self,
        params,
        inputs,
        end_hints=None,
        return_prior=False,
        training=False,
        no_loglik=False,
    ):
        """log P(s_t = q | x); (m, b, L, q)."""
        if self._sparse_route() or self._sparse_state_route():
            init, indices, probs = self._sparse_matrices(params)
            E = self._sparse_E(params, inputs, end_hints, training)
            if self._sparse_state_route():
                from .parallel import sparse_sharding

                lg, _ = sparse_sharding.edge_sharded_posterior(
                    init, indices, probs, E, self.mesh,
                    state_axis=self.partition["state"],
                    data_axis=self.partition.get("batch"),
                    no_loglik=no_loglik,
                )
            else:
                from .ops import sparse

                lg, _ = sparse.sparse_posterior(
                    init, indices, probs, E, no_loglik=no_loglik
                )
            if return_prior:
                return (
                    lg,
                    self.compute_prior(params, scaled=False),
                    self.aux_loss(params),
                )
            return lg
        init, A, E = self._ingredients(params, inputs, end_hints, training)
        lg, _ = self._dispatch_posterior(init, A, E, no_loglik)
        if return_prior:
            return lg, self.compute_prior(params, scaled=False), self.aux_loss(params)
        return lg

    def log_likelihood(self, params, inputs, end_hints=None, training=False):
        """Per-model per-sequence loglik; (m, b).

        Profile-family transitions built with ``structured_forward=True``
        route the dense sequential path through the structured O(L) Plan7
        matvec (:mod:`hmm_layer_tpu.ops.plan7`) — the implicit transition
        matrix is never materialized. Opt-in: measured slower than the
        dense MXU engine at config-4 scale (BASELINE.md round 3).
        """
        if (
            getattr(self.transitions, "structured_forward", False)
            and self._route() == "dense"
        ):
            E = self.emission_probs(params, inputs, end_hints, training)
            if self._pf(E) == 1:
                from .ops import plan7

                return plan7.structured_log_likelihood(
                    self.transitions, params["transitions"], E
                )
            init, A = self.transitions.matrices(params["transitions"])
            return self._dispatch_log_likelihood(init, A, E)
        if self._sparse_route() or self._sparse_state_route():
            init, indices, probs = self._sparse_matrices(params)
            E = self._sparse_E(params, inputs, end_hints, training)
            if self._sparse_state_route():
                from .parallel import sparse_sharding

                return sparse_sharding.edge_sharded_log_likelihood(
                    init, indices, probs, E, self.mesh,
                    state_axis=self.partition["state"],
                    data_axis=self.partition.get("batch"),
                )
            from .ops import sparse

            return sparse.sparse_log_likelihood(init, indices, probs, E)
        init, A, E = self._ingredients(params, inputs, end_hints, training)
        return self._dispatch_log_likelihood(init, A, E)

    def _sparse_route(self) -> bool:
        """Single-device or data-parallel sparse edge-list routing."""
        if not getattr(self.transitions, "sparse_forward", False):
            return False
        route = self._route()
        if route == "seq":
            raise NotImplementedError(
                "sparse_forward does not compose with sequence sharding: "
                "the cross-device boundary combine carries dense (q, q) "
                "chunk summaries — O(q^2) memory/work per chunk, exactly "
                "what the sparse engine exists to avoid at large q. Use "
                "state (+batch) sharding for big-q models "
                "(partition={'state': ..., 'batch': ...})."
            )
        return route in ("dense", "data")

    def _sparse_state_route(self) -> bool:
        """Edge-sharded state-parallel sparse routing (big-q TP analog)."""
        return (
            getattr(self.transitions, "sparse_forward", False)
            and self._route() == "state"
        )

    def _sparse_E(self, params, inputs, end_hints, training):
        E = self.emission_probs(params, inputs, end_hints, training)
        if self._route() == "data":
            E = self._constrain_data(E)
        return E

    def _sparse_matrices(self, params):
        t = self.transitions
        indices, probs = t.make_A_sparse(params["transitions"])
        return t.make_initial_distribution(params["transitions"]), indices, probs

    def viterbi(self, params, inputs, end_hints=None):
        """Most likely state paths; (m, b, L) int32.

        ``end_hints`` clamp chunk-border emissions exactly as in
        :meth:`state_posterior_log_probs` (the reference threads them
        through every recursion entry point,
        ``MsaHMMLayer.py:98-151``) — hint-constrained MAP decoding.
        """
        if self._sparse_route() or self._sparse_state_route():
            init, indices, probs = self._sparse_matrices(params)
            E = self._sparse_E(params, inputs, end_hints, False)
            if self._sparse_state_route():
                from .parallel import sparse_sharding

                return sparse_sharding.edge_sharded_viterbi(
                    init, indices, probs, E, self.mesh,
                    state_axis=self.partition["state"],
                    data_axis=self.partition.get("batch"),
                )
            from .ops import sparse

            return sparse.sparse_viterbi(init, indices, probs, E)
        init, A, E = self._ingredients(params, inputs, end_hints, False)
        return self._dispatch_viterbi(init, A, E)

    def sample_paths(
        self, params, inputs, key, num_samples: int = 1, end_hints=None
    ):
        """Exact posterior path samples; (m, b, num_samples, L) int32.

        Sparse-forward transitions route through the edge-list FFBS
        (:func:`hmm_layer_tpu.ops.sparse.sparse_sample_paths` — sequential,
        ``parallel_factor`` ignored; the hard never-sample-zero-probability
        guarantee holds over the edge support).
        """
        if self._sparse_route():
            from .ops import sparse

            init, indices, probs = self._sparse_matrices(params)
            E = self._sparse_E(params, inputs, end_hints, False)
            return sparse.sparse_sample_paths(
                init, indices, probs, E, key, num_samples
            )
        self._require_dense("sample_paths")
        init, A, E = self._ingredients(params, inputs, end_hints, False)
        return sampling.sample_posterior(
            init, A, E, key, num_samples, self._pf(E)
        )

    # -- model surgery -----------------------------------------------------------

    def resize(self, params, new_lengths, key, keep=None):
        """Param-preserving profile length adaptation at the layer level.

        Profile-family only: requires every component (transitions and all
        emitters) to implement ``resize`` — see ``ProfileTransitions.resize``.
        Returns ``(new_layer, new_params)`` with all layer settings carried
        over. The learnMSA iterative length-adaptation hook (the
        reference's ``set_lengths`` rebuilds kernels from initializers,
        ``Transitioner.py:39-61``).
        """
        for comp in [self.transitions, *self.emissions]:
            if not hasattr(comp, "resize"):
                raise NotImplementedError(
                    f"{type(comp).__name__} does not support resize — "
                    "length adaptation is a profile-family capability "
                    "(ProfileTransitions/ProfileEmissions); gene-pred "
                    "components have fixed grammar-defined state counts"
                )
        keys = jax.random.split(key, 1 + len(self.emissions))
        new_trans, tparams = self.transitions.resize(
            params["transitions"], new_lengths, keys[0], keep
        )
        new_emits, eparams = [], []
        for i, (em, p) in enumerate(zip(self.emissions, params["emissions"])):
            ne, np_ = em.resize(p, new_lengths, keys[1 + i], keep)
            new_emits.append(ne)
            eparams.append(np_)
        new_layer = HMMLayer(
            new_trans,
            new_emits,
            num_seqs=self.num_seqs,
            use_prior=self.use_prior,
            sequence_weights=self.sequence_weights,
            parallel_factor=self.parallel_factor,
            mesh=self.mesh,
            partition=self.partition or None,
        )
        return new_layer, {"transitions": tparams, "emissions": eparams}

    # -- priors / weights / losses ----------------------------------------------

    def compute_prior(self, params, scaled: bool = True):
        """Summed parameter prior per model; (m,)."""
        prior = self.transitions.prior_log_density(params["transitions"])
        for em, p in zip(self.emissions, params["emissions"]):
            prior = prior + em.prior_log_density(p)
        return self._scale_prior(prior) if scaled else prior

    def _scale_prior(self, prior):
        if self.sequence_weights is not None:
            return prior / jnp.sum(self.sequence_weights)
        if self.num_seqs is not None:
            return prior / self.num_seqs
        return prior

    def aux_loss(self, params):
        return sum(
            em.aux_loss(p) for em, p in zip(self.emissions, params["emissions"])
        )

    def apply_sequence_weights(self, loglik, indices, aggregate: bool = False):
        if self.sequence_weights is not None:
            if indices is None:
                raise ValueError(
                    "sequence_weights are set but no batch `indices` were "
                    "passed — weights are looked up per sequence "
                    "(MsaHMMLayer.py:155-164 semantics); indexing with None "
                    "would silently add an axis instead"
                )
            weights = self.sequence_weights[indices]
            loglik = loglik * weights
            if aggregate:
                loglik = jnp.sum(loglik, axis=1) / jnp.sum(weights, axis=1)
                loglik = jnp.mean(loglik)
        elif aggregate:
            loglik = jnp.mean(loglik)
        return loglik

    def loss(self, params, inputs, indices=None, training=True, end_hints=None):
        """Negative (MAP) training objective, scalar.

        Mirrors ``MsaHmmLayer.forward`` (``MsaHMMLayer.py:180-208``):
        mean weighted loglik + scaled prior − aux losses, negated.
        ``end_hints`` clamp chunk-border emissions (hint-constrained MAP
        training, ``MsaHMMLayer.py:98-151``).
        """
        ll = self.log_likelihood(
            params, inputs, end_hints=end_hints, training=training
        )
        ll_mean = self.apply_sequence_weights(ll, indices, aggregate=True)
        objective = ll_mean
        if self.use_prior:
            objective = objective + jnp.mean(self.compute_prior(params))
        return -(objective) + self.aux_loss(params)

    def posterior_cross_entropy(
        self,
        params,
        inputs,
        labels,
        label_mask=None,
        end_hints=None,
        training=True,
        no_loglik=False,
    ):
        """Supervised training objective: mean cross-entropy between the
        posterior state marginals and per-position state labels, scalar.

        This is the Tiberius training mode of the gene-pred family — the
        reference's HMM head emits posteriors that an *external* CE
        consumes (its ``no_loglik`` flag exists for exactly this,
        ``/root/reference/hmm_layer/MsaHMMLayer.py:142-143,513-514``);
        here the whole objective ships in the layer so
        :class:`~hmm_layer_tpu.training.Trainer` can drive it. Labels come
        from reference annotations via
        :func:`~hmm_layer_tpu.models.annotation.genes_to_states`.

        Args:
          labels: int state tracks, ``(m, b, L)`` or ``(b, L)``
            (broadcast over models).
          label_mask: optional ``{0,1}`` weights of the same shape
            (mask padding / unannotated positions).
          no_loglik: skip the loglik normalization inside the posterior
            (reference semantics; the CE then also penalizes total mass).

        Returns:
          scalar loss: mean CE − scaled prior (if ``use_prior``) + aux.
        """
        if self._sparse_route():
            # Fused objective: the (m, b, L, q) posterior and its cotangent
            # are never materialized (the CE cotangent is a scaled one-hot
            # of the labels) — the memory-scalable route for supervised
            # training at config-5 state counts. Exact vs the unfused
            # path (tests/test_sparse.py::TestFusedPosteriorCE).
            from .ops import sparse

            init, indices, probs = self._sparse_matrices(params)
            E = self._sparse_E(params, inputs, end_hints, training)
            ce_mean = sparse.sparse_posterior_cross_entropy(
                init, indices, probs, E, labels,
                label_mask=label_mask, no_loglik=no_loglik,
            )
        else:
            lg = self.state_posterior_log_probs(
                params,
                inputs,
                end_hints=end_hints,
                training=training,
                no_loglik=no_loglik,
            )
            labels = jnp.asarray(labels)
            if labels.ndim == lg.ndim - 2:
                labels = jnp.broadcast_to(labels[None], lg.shape[:-1])
            ce = -jnp.take_along_axis(lg, labels[..., None], axis=-1)[..., 0]
            if label_mask is not None:
                mask = jnp.broadcast_to(
                    jnp.asarray(label_mask, ce.dtype), ce.shape
                )
                ce_mean = jnp.sum(ce * mask) / jnp.maximum(
                    jnp.sum(mask), 1.0
                )
            else:
                ce_mean = jnp.mean(ce)
        loss = ce_mean
        if self.use_prior:
            loss = loss - jnp.mean(self.compute_prior(params))
        return loss + self.aux_loss(params)

    def __call__(self, params, inputs, indices=None, training=False, end_hints=None):
        """(loglik (m, b), aggregated loglik[, prior (m,), aux_loss])."""
        ll = self.log_likelihood(
            params, inputs, end_hints=end_hints, training=training
        )
        ll_mean = self.apply_sequence_weights(ll, indices, aggregate=True)
        if self.use_prior:
            return ll, ll_mean, self.compute_prior(params), self.aux_loss(params)
        return ll, ll_mean

    # -- config round-trip --------------------------------------------------------

    def get_config(self) -> dict:
        """JSON-able config reconstructing the full layer
        (``MsaHMMLayer.py:210-224`` parity). Components serialize by class
        name + their own config; ``mesh``/``partition`` are runtime device
        objects and are re-supplied to :meth:`from_config`."""

        def spec(component):
            return {
                "class": type(component).__name__,
                "config": component.get_config(),
            }

        return {
            "transitions": spec(self.transitions),
            "emissions": [spec(em) for em in self.emissions],
            "num_seqs": self.num_seqs,
            "use_prior": self.use_prior,
            "sequence_weights": (
                None
                if self.sequence_weights is None
                else np.asarray(self.sequence_weights).tolist()
            ),
            "parallel_factor": self.parallel_factor,
        }

    @classmethod
    def from_config(cls, config: dict, mesh=None, partition=None):
        from . import models

        def build(spec):
            component_cls = getattr(models, spec["class"], None)
            if component_cls is None:
                raise ValueError(
                    f"unknown component class {spec['class']!r} (must be "
                    "exported from hmm_layer_tpu.models)"
                )
            return component_cls.from_config(spec["config"])

        return cls(
            build(config["transitions"]),
            [build(s) for s in config["emissions"]],
            num_seqs=config.get("num_seqs"),
            use_prior=config.get("use_prior", True),
            sequence_weights=config.get("sequence_weights"),
            parallel_factor=config.get("parallel_factor", 1),
            mesh=mesh,
            partition=partition,
        )

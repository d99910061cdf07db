"""Gene-prediction (Tiberius-style) HMM transition grammars.

Functional JAX re-design of
``/root/reference/hmm_layer/gene_pred_hmm_transitioner.py``. Three grammars
with identical capabilities:

* :class:`SimpleGenePredTransitions` — 7 states ``Ir, I0-2, E0-2``
  (15 edges, ``gene_pred_hmm_transitioner.py:132-148``).
* :class:`GenePredTransitions` — 15 states adding
  ``START, EI0-2, IE0-2, STOP`` enforcing the gene grammar
  (23 edges, ``gene_pred_hmm_transitioner.py:200-221``), with the optional
  experimental Dirichlet prior (``:243-261``).
* :class:`GenePredMultiTransitions` — ``k`` gene-model copies sharing one
  intergenic state, ``1 + 14k`` states, ``1 + 22k`` edges
  (``gene_pred_hmm_transitioner.py:279-303``).

Design: classes hold only *static* configuration (hashable, jit-friendly);
trainable state lives in a params pytree created by ``init_params`` and
consumed by pure methods.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .transition_utils import masked_row_softmax_from_edges, sparse_edge_softmax

__all__ = [
    "SimpleGenePredTransitions",
    "GenePredTransitions",
    "GenePredMultiTransitions",
]


class SimpleGenePredTransitions:
    """7-state exon/intron/intergenic grammar.

    State order: ``Ir, I0, I1, I2, E0, E1, E2``.
    """

    #: ``sparse_forward=True`` routes HMMLayer's dense-route inference
    #: through the COO engine (ops/sparse.py) — the dense (q, q) matrix is
    #: never built. The right setting for large multi-copy models
    #: (q = 1+14k): past ~500 states the dense scatter-set build also
    #: hangs the current axon TPU toolchain (see transition_utils).
    def __init__(
        self,
        num_models: int = 1,
        initial_exon_len: int = 100,
        initial_intron_len: int = 10000,
        initial_ir_len: int = 10000,
        starting_distribution_trainable: bool = True,
        transitions_trainable: bool = True,
        init_component_sd: float = 0.0,
        sparse_forward: bool = False,
    ):
        self.sparse_forward = sparse_forward
        self.num_models = num_models
        self.initial_exon_len = initial_exon_len
        self.initial_intron_len = initial_intron_len
        self.initial_ir_len = initial_ir_len
        self.starting_distribution_trainable = starting_distribution_trainable
        self.transitions_trainable = transitions_trainable
        self.init_component_sd = init_component_sd
        if not hasattr(self, "k"):
            self.k = 1
        if not hasattr(self, "num_states"):
            self.num_states = 7
        self.indices = self.make_transition_indices()
        self.num_transitions = len(self.indices)

    # -- static structure ---------------------------------------------------

    def make_transition_indices(self) -> np.ndarray:
        """(n_edges, 2) allowed (from, to) pairs."""
        Ir = 0
        I = list(range(1, 4))
        E = list(range(4, 7))
        edges = [(Ir, Ir), (Ir, E[0]), (E[2], Ir)]
        for cds in range(3):
            edges.append((E[cds], E[(cds + 1) % 3]))
            edges.append((E[cds], I[cds]))
            edges.append((I[cds], I[cds]))
            edges.append((I[cds], E[(cds + 1) % 3]))
        assert len(edges) == 15
        return np.asarray(edges, np.int64)

    # Edge classification predicates (mirror the biology-motivated init of
    # ``gene_pred_hmm_transitioner.py:46-64,150-170``).

    def _is_intergenic_loop(self, e):
        return e[0] == e[1] == 0

    def _is_intron_loop(self, e):
        return e[0] == e[1] and 0 < e[0] < 1 + 3 * self.k

    def _is_exon_transition(self, e):
        off = 1 + 3 * self.k
        return (
            off <= e[0] < off + 3 * self.k
            and e[1] - off == (e[0] - off + self.k) % (3 * self.k)
        )

    def _is_exon_1_out(self, e):
        return 1 + 4 * self.k <= e[0] < 1 + 5 * self.k and e[0] != e[1]

    def _is_intergenic_out(self, e):
        return e[0] == 0 and e[1] != 0

    def make_transition_init(self, key) -> np.ndarray:
        """Length-geometry logits: loops get logit(1 - 1/len)."""

        def geo(length):
            p = 1.0 - 1.0 / length
            return float(-np.log(1.0 / p - 1.0))

        noise = np.asarray(
            jax.random.normal(key, (len(self.indices),)) * self.init_component_sd
        )
        init = []
        for j, e in enumerate(self.indices):
            if self._is_intergenic_loop(e):
                init.append(geo(self.initial_ir_len))
            elif self._is_intron_loop(e):
                init.append(geo(self.initial_intron_len))
            elif self._is_exon_transition(e):
                init.append(geo(self.initial_exon_len))
            elif self._is_exon_1_out(e):
                init.append(float(np.log(0.5)))
            elif self._is_intergenic_out(e):
                init.append(float(np.log(1.0 / self.k)) + float(noise[j]))
            else:
                init.append(0.0)
        return np.asarray(init, np.float32)

    # -- params & matrices ---------------------------------------------------

    def init_params(self, key) -> dict:
        k1, k2 = jax.random.split(key)
        return {
            "transition_kernel": jnp.asarray(self.make_transition_init(k1)),
            "starting_distribution_kernel": jnp.zeros(
                (self.num_states,), jnp.float32
            ),
        }

    def make_A(self, params) -> jax.Array:
        """(num_models, q, q) row-stochastic transition matrix."""
        A = masked_row_softmax_from_edges(
            self.indices, params["transition_kernel"], self.num_states
        )
        return jnp.broadcast_to(A, (self.num_models,) + A.shape)

    def make_A_sparse(self, params):
        """COO transition probabilities WITHOUT densifying
        (``gene_pred_hmm_transitioner.py:74-98`` /
        ``Transitioner.py:292-310`` capability).

        Returns ``(indices (n_edges, 2) static, probs (num_models,
        n_edges))`` — consume with :mod:`hmm_layer_tpu.ops.sparse` for
        multi-copy models whose dense ``(q, q)`` matrix would not fit
        (``q = 1 + 14k`` at large ``k``).
        """
        probs = sparse_edge_softmax(
            self.indices, params["transition_kernel"], self.num_states
        )
        return self.indices, jnp.broadcast_to(
            probs, (self.num_models, self.num_transitions)
        )

    def make_log_A_sparse(self, params):
        """COO log-probabilities; same layout as :meth:`make_A_sparse`."""
        indices, probs = self.make_A_sparse(params)
        return indices, jnp.log(jnp.maximum(probs, 1e-32))

    def make_initial_distribution(self, params) -> jax.Array:
        """(num_models, q)."""
        p = jax.nn.softmax(params["starting_distribution_kernel"], axis=-1)
        return jnp.broadcast_to(p, (self.num_models, self.num_states))

    def matrices(self, params):
        return self.make_initial_distribution(params), self.make_A(params)

    def prior_log_density(self, params) -> jax.Array:
        return jnp.zeros((self.num_models,), jnp.float32)

    def get_config(self) -> dict:
        return {
            "num_models": self.num_models,
            "initial_exon_len": self.initial_exon_len,
            "initial_intron_len": self.initial_intron_len,
            "initial_ir_len": self.initial_ir_len,
            "starting_distribution_trainable": self.starting_distribution_trainable,
            "transitions_trainable": self.transitions_trainable,
            "init_component_sd": self.init_component_sd,
            "sparse_forward": self.sparse_forward,
        }

    @classmethod
    def from_config(cls, config):
        return cls(**config)


class GenePredTransitions(SimpleGenePredTransitions):
    """15-state grammar with START/donor/acceptor/STOP structure states.

    State order: ``Ir, I0-2, E0-2, START, EI0-2, IE0-2, STOP``.
    """

    def __init__(self, use_experimental_prior: bool = False, **kwargs):
        if not hasattr(self, "num_states"):
            self.num_states = 15
        if not hasattr(self, "k"):
            self.k = 1
        self.use_experimental_prior = use_experimental_prior
        super().__init__(**kwargs)

    def make_transition_indices(self) -> np.ndarray:
        Ir = 0
        I = list(range(1, 4))
        E = list(range(4, 7))
        START = 7
        EI = list(range(8, 11))
        IE = list(range(11, 14))
        STOP = 14
        edges = [(Ir, Ir), (Ir, START), (STOP, Ir), (START, E[1]), (E[1], STOP)]
        for cds in range(3):
            edges.append((E[cds], E[(cds + 1) % 3]))
            edges.append((E[cds], EI[cds]))
            edges.append((EI[cds], I[cds]))
            edges.append((I[cds], I[cds]))
            edges.append((I[cds], IE[cds]))
            edges.append((IE[cds], E[cds]))
        assert len(edges) == 23
        return np.asarray(edges, np.int64)

    # -- experimental Dirichlet prior (gene_pred_hmm_transitioner.py:223-261)

    def gather_binary_probs(self, A):
        """Binary (stay, leave) distributions for self-loop states and
        (advance, other) for exon states."""
        k = self.k
        m = 1 + 3 * k
        diag = jnp.diagonal(A[:m, :m])
        probs_loop = jnp.stack([diag, jnp.sum(A[:m, :], axis=-1) - diag], axis=1)
        rows = []
        for i in range(3):
            for j in range(k):
                e = 1 + (i + 3) * k + j
                next_e = 1 + 3 * k + ((i + 1) % 3) * k + j
                rows.append(jnp.stack([A[e, next_e], jnp.sum(A[e]) - A[e, next_e]]))
        probs_exon = jnp.stack(rows, axis=0)
        return jnp.concatenate([probs_loop, probs_exon], axis=0)  # (1+6k, 2)

    def make_prior_alpha(self, key, n=1e3):
        p0 = self.make_transition_init(key)
        A0 = masked_row_softmax_from_edges(
            self.indices, jnp.asarray(p0), self.num_states
        )
        return self.gather_binary_probs(A0) * n

    def init_params(self, key) -> dict:
        params = super().init_params(key)
        if self.use_experimental_prior:
            self._alpha = np.asarray(
                self.make_prior_alpha(jax.random.fold_in(key, 1))
            )
        return params

    def _prior_alpha(self) -> np.ndarray:
        """Dirichlet concentration anchored at the length-geometry init.

        Normally stashed by :meth:`init_params`; computed lazily with a
        fixed key otherwise, so restoring trained params from a checkpoint
        (no init_params call on the new instance) still has a prior.
        """
        if not hasattr(self, "_alpha"):
            self._alpha = np.asarray(
                self.make_prior_alpha(jax.random.PRNGKey(0))
            )
        return self._alpha

    def prior_log_density(self, params) -> jax.Array:
        if not self.use_experimental_prior:
            return jnp.zeros((self.num_models,), jnp.float32)
        A = self.make_A(params)[0]
        binary = self.gather_binary_probs(A)
        log_p = jnp.log(jnp.maximum(binary, 1e-16))
        pri = jnp.sum((jnp.asarray(self._prior_alpha()) - 1.0) * log_p)
        return jnp.full((self.num_models,), pri, jnp.float32)

    def get_config(self) -> dict:
        config = super().get_config()
        config["use_experimental_prior"] = self.use_experimental_prior
        return config


class GenePredMultiTransitions(GenePredTransitions):
    """``k`` gene-model copies sharing one intergenic state.

    State order: ``Ir, I0*k, I1*k, I2*k, E0*k, E1*k, E2*k, START*k,
    EI0*k, EI1*k, EI2*k, IE0*k, IE1*k, IE2*k, STOP*k``.
    """

    def __init__(self, k: int = 1, init_component_sd: float = 0.2, **kwargs):
        self.k = k
        self.num_states = 1 + 14 * k
        super().__init__(init_component_sd=init_component_sd, **kwargs)

    def make_transition_indices(self) -> np.ndarray:
        k = self.k
        Ir = 0
        I = list(range(1, 1 + 3 * k))
        E = list(range(1 + 3 * k, 1 + 6 * k))
        START = list(range(1 + 6 * k, 1 + 7 * k))
        EI = list(range(1 + 7 * k, 1 + 10 * k))
        IE = list(range(1 + 10 * k, 1 + 13 * k))
        STOP = list(range(1 + 13 * k, 1 + 14 * k))
        edges = [(Ir, Ir)]
        for h in range(k):
            edges.extend(
                [
                    (Ir, START[h]),
                    (STOP[h], Ir),
                    (START[h], E[k + h]),
                    (E[k + h], STOP[h]),
                ]
            )
            for cds in range(3):
                edges.extend(
                    [
                        (E[k * cds + h], E[k * ((cds + 1) % 3) + h]),
                        (E[k * cds + h], EI[k * cds + h]),
                        (EI[k * cds + h], I[k * cds + h]),
                        (I[k * cds + h], I[k * cds + h]),
                        (I[k * cds + h], IE[k * cds + h]),
                        (IE[k * cds + h], E[k * cds + h]),
                    ]
                )
        assert len(edges) == 1 + 22 * k
        return np.asarray(edges, np.int64)

    def get_config(self):
        config = super().get_config()
        config.update({"k": self.k})
        return config

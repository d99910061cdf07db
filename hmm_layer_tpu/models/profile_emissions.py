"""Profile-HMM emission model (match multinomials over amino acids).

Functional JAX re-design of ``ProfileHMMEmitter``
(``/root/reference/hmm_layer/Emitter.py:7-230``):

* per-model match kernel ``(L, s)`` plus one insertion kernel ``(s,)``
  (frozen by default, ``Emitter.py:70-72``);
* emission matrix rows ordered ``[insert(left flank), match x L,
  insert x (L-1), unannotated, right flank, terminal one-hot]``
  with a zero column appended for the terminal symbol
  (``Emitter.py:97-117``), padded and stacked across models;
* scoring = input distribution · Bᵀ (``Emitter.py:139-157``);
* Dirichlet amino-acid prior (the reference's default
  ``priors.AminoAcidPrior`` does not exist in its own ``Priors.py`` — a
  known defect; restored here from :mod:`hmm_layer_tpu.models.priors`);
* ``duplicate`` model surgery with optional kernel sharing
  (``Emitter.py:171-197``).

Note: the reference computes the padded state count as ``len(lengths) + 2``
(``Emitter.py:124``, a transcription bug); the correct count ``2L + 3`` is
used here.
"""

from __future__ import annotations

import enum

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .emission_utils import apply_end_hints
from .priors import AminoAcidPrior
from .profile_transitions import get_num_states

__all__ = ["ProfileEmissions", "TemperatureMode"]


class TemperatureMode(enum.Enum):
    """Softmax-temperature schedule SELECTORS (``Emitter.py:232-247``).

    Carried for config parity: in the reference too, the enum only labels
    which schedule an outer training loop (learnMSA's) should apply — no
    mode changes emission *scoring* in either implementation. A training
    loop can consume the value to scale emission kernels over time;
    :class:`ProfileEmissions` itself does not."""

    TRAINABLE = 1
    LENGTH_NORM = 2
    COLD_TO_WARM = 3
    WARM_TO_COLD = 4
    CONSTANT = 5
    NONE = 6

    @staticmethod
    def from_string(name: str) -> "TemperatureMode":
        return TemperatureMode[name.upper()]


class ProfileEmissions:
    """Multinomial amino-acid emissions for one or more profile HMMs.

    Args:
        lengths: model length or list of lengths.
        emission_init: initializer (or list, one per model) for the match
            kernels, ``f(key, (L, s))``.
        insertion_init: initializer (or list) for the insertion kernel,
            ``f(key, (s,))``.
        prior: emission prior; defaults to :class:`AminoAcidPrior`.
        frozen_insertions: exclude insertion kernels from training.
        alphabet_size: ``s`` (without the terminal symbol); learnMSA uses 25
            input channels = 24 alphabet + terminal, hence the default 23
            when ``input_dim`` is 24.
    """

    def __init__(
        self,
        lengths,
        emission_init=None,
        insertion_init=None,
        prior=None,
        frozen_insertions: bool = True,
    ):
        self.lengths = [lengths] if np.isscalar(lengths) else list(lengths)
        self.num_models = len(self.lengths)
        self.num_states = get_num_states(self.lengths)
        self.max_num_states = max(self.num_states)
        self.emission_init = (
            emission_init
            if isinstance(emission_init, list)
            else [emission_init] * self.num_models
        )
        self.insertion_init = (
            insertion_init
            if isinstance(insertion_init, list)
            else [insertion_init] * self.num_models
        )
        self.prior = AminoAcidPrior() if prior is None else prior
        self.frozen_insertions = frozen_insertions

    def init_params(self, key, input_dim: int) -> dict:
        """``input_dim`` includes the terminal channel (s = input_dim - 1)."""
        s = input_dim - 1
        em, ins = [], []
        for i, length in enumerate(self.lengths):
            k1 = jax.random.fold_in(key, 2 * i)
            k2 = jax.random.fold_in(key, 2 * i + 1)
            e_init = self.emission_init[i]
            i_init = self.insertion_init[i]
            em.append(
                e_init(k1, (length, s))
                if e_init is not None
                else jnp.zeros((length, s))
            )
            ins.append(
                i_init(k2, (s,)) if i_init is not None else jnp.zeros((s,))
            )
        return {"emission_kernel": em, "insertion_kernel": ins}

    def trainable_mask(self, params) -> dict:
        return {
            "emission_kernel": [True] * self.num_models,
            "insertion_kernel": [not self.frozen_insertions] * self.num_models,
        }

    def make_emission_matrix_from_kernels(self, em, ins, length):
        """(2L+3, s+1) emission matrix for one model (``Emitter.py:97-117``)."""
        s = em.shape[-1]
        i1 = ins[None]  # left flank
        i2 = jnp.broadcast_to(ins[None], (length + 1, s))  # inserts + unanno + rflank
        emissions = jnp.concatenate([i1, em, i2], axis=0)
        emissions = jax.nn.softmax(emissions, axis=-1)
        emissions = jnp.concatenate(
            [emissions, jnp.zeros_like(emissions[:, :1])], axis=-1
        )
        terminal = jax.nn.one_hot(jnp.asarray([s]), s + 1, dtype=em.dtype)
        return jnp.concatenate([emissions, terminal], axis=0)

    def make_B(self, params):
        """(num_models, q_max, s+1), padded with zero rows."""
        mats = []
        for i, length in enumerate(self.lengths):
            mat = self.make_emission_matrix_from_kernels(
                params["emission_kernel"][i],
                params["insertion_kernel"][i],
                length,
            )
            pad = self.max_num_states - mat.shape[0]
            if pad:
                mat = jnp.concatenate(
                    [mat, jnp.zeros((pad, mat.shape[-1]), mat.dtype)], axis=0
                )
            mats.append(mat)
        return jnp.stack(mats, axis=0)

    def emissions(self, params, inputs, end_hints=None, training: bool = False):
        """inputs: (m, ..., s_in) distributions over the alphabet; returns
        (m, ..., q_max)."""
        B = self.make_B(params)
        s_in = inputs.shape[-1]
        emit = jnp.einsum(
            "mbls,mqs->mblq", inputs, B[..., :s_in], precision=lax.Precision.HIGHEST
        )
        return apply_end_hints(emit, end_hints)

    def prior_log_density(self, params):
        return self.prior(self.make_B(params), lengths=self.lengths)

    def aux_loss(self, params):
        return jnp.zeros((), jnp.float32)

    def resize(self, params, new_lengths, key, keep=None):
        """Param-preserving re-target to new model lengths — the emitter
        half of learnMSA's iterative length adaptation (the reference's
        ``set_lengths`` re-targets but rebuilds kernels from initializers,
        ``/root/reference/hmm_layer/Emitter.py:36-50``). Match-kernel rows
        of surviving columns carry over; new columns draw fresh initializer
        values; the insertion kernel is column-independent and copies.

        Args:
            params: current parameter pytree.
            new_lengths: new match-state count per model.
            key: PRNG key for fresh rows.
            keep: per-model maps new column -> old column or -1
                (:meth:`ProfileTransitions._resize_keep` semantics);
                default grows/shrinks at the model end.

        Returns:
            ``(new_emissions, new_params)``.
        """
        from .profile_transitions import ProfileTransitions

        if np.isscalar(new_lengths):
            new_lengths = [new_lengths]
        new_lengths = list(new_lengths)
        if len(new_lengths) != self.num_models:
            raise ValueError(
                f"{len(new_lengths)} new lengths for {self.num_models} models"
            )
        keep = ProfileTransitions._resize_keep(self.lengths, new_lengths, keep)
        new_model = ProfileEmissions(
            new_lengths,
            emission_init=self.emission_init,
            insertion_init=self.insertion_init,
            prior=self.prior,
            frozen_insertions=self.frozen_insertions,
        )
        s = params["emission_kernel"][0].shape[-1]
        fresh = new_model.init_params(key, input_dim=s + 1)
        em = []
        for i in range(self.num_models):
            k = keep[i]
            rows = fresh["emission_kernel"][i]
            new_idx = np.flatnonzero(k >= 0)
            if new_idx.size:
                rows = rows.at[new_idx].set(
                    params["emission_kernel"][i][k[new_idx]]
                )
            em.append(rows)
        return new_model, {
            "emission_kernel": em,
            "insertion_kernel": [
                jnp.copy(v) for v in params["insertion_kernel"]
            ],
        }

    def duplicate(self, params, model_indices=None, share_kernels: bool = False):
        """Sub-select / copy models (``Emitter.py:171-197``)."""
        if model_indices is None:
            model_indices = list(range(self.num_models))
        copy = ProfileEmissions(
            [self.lengths[i] for i in model_indices],
            prior=self.prior,
            frozen_insertions=self.frozen_insertions,
        )
        sub = {
            "emission_kernel": [params["emission_kernel"][i] for i in model_indices],
            "insertion_kernel": [
                params["insertion_kernel"][i] for i in model_indices
            ],
        }
        if not share_kernels:
            sub = jax.tree.map(jnp.copy, sub)
        return copy, sub

    def get_config(self):
        """Full JSON-able config (``Emitter.py:199-224``); ``None``
        initializers (zero kernels) serialize as ``None``."""
        from . import initializers as inits

        return {
            "lengths": self.lengths,
            "frozen_insertions": self.frozen_insertions,
            "emission_init": [
                None if fn is None else inits.init_to_config(fn)
                for fn in self.emission_init
            ],
            "insertion_init": [
                None if fn is None else inits.init_to_config(fn)
                for fn in self.insertion_init
            ],
            "prior": self.prior.get_config(),
        }

    @classmethod
    def from_config(cls, config):
        from . import initializers as inits

        def restore(specs):
            if specs is None:
                return None
            return [
                None if spec is None else inits.init_from_config(spec)
                for spec in specs
            ]

        prior = config.get("prior")
        if prior is not None:
            prior = AminoAcidPrior.from_config(prior)
        return cls(
            config["lengths"],
            emission_init=restore(config.get("emission_init")),
            insertion_init=restore(config.get("insertion_init")),
            prior=prior,
            frozen_insertions=config.get("frozen_insertions", True),
        )

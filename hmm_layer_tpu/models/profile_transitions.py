"""Plan7 profile-HMM transitions with silent-state elimination.

Functional JAX re-design of ``ProfileHMMTransitioner``
(``/root/reference/hmm_layer/Transitioner.py:11-334``) with identical
capabilities:

* Parameters live as **named kernel parts** — one logit vector per edge type
  of the *explicit* model (18 types, ``Transitioner.py:383-402``), with
  left/right flank sharing (``:97-98``) and optional per-part freezing.
* Probabilities via per-row softmax over the explicit sparse pattern
  (states ``3L+5`` including BEGIN/END/DELETE, ``Transitioner.py:337-380``).
* **Silent-state elimination**: delete chains are marginalized into an
  implicit dense model over ``2L+3`` states using the cumulative-sum trick
  ``match_skip(i, j) = MD_i + (DD-cumsum_j - DD-cumsum_i) + DM_j``
  (``Transitioner.py:203-247``).
* Initial state distribution derived from a sigmoid flank-init plus the
  implicit entry probabilities (``Transitioner.py:123-160``).
* Multi-model support with padding to the largest state count
  (``Transitioner.py:249-318``).

Note: the reference transcription selects ``match_skip`` values with a
*lower*-triangular mask (``Transitioner.py:219,232``), which mis-aligns
values and indices; the upstream learnMSA semantics (and the edge list at
``Transitioner.py:448-451``) require the upper triangle including the
diagonal, which is what this implementation uses.

State order (implicit): ``LEFT_FLANK, MATCH x L, INSERT x L-1,
UNANNOTATED_SEGMENT, RIGHT_FLANK, TERMINAL``.
Explicit adds ``BEGIN, END, DELETE x L`` at the end.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.semiring import LOG_ZERO
from . import initializers as inits
from .priors import ProfileHMMTransitionPrior

__all__ = [
    "ProfileTransitions",
    "get_num_states",
    "get_num_states_implicit",
    "explicit_transition_kernel_parts",
    "implicit_transition_parts",
]


def get_num_states(lengths):
    """Implicit profile-HMM state count per model (``Utility.py:12-14``)."""
    return [2 * l + 3 for l in lengths]


def get_num_states_implicit(lengths):
    """Explicit state count incl. silent states (``Utility.py:16-18``)."""
    return [3 * l + 5 for l in lengths]


def explicit_transition_kernel_parts(length):
    return [
        ("begin_to_match", length),
        ("match_to_end", length),
        ("match_to_match", length - 1),
        ("match_to_insert", length - 1),
        ("insert_to_match", length - 1),
        ("insert_to_insert", length - 1),
        ("match_to_delete", length),
        ("delete_to_match", length),
        ("delete_to_delete", length - 1),
        ("left_flank_loop", 1),
        ("left_flank_exit", 1),
        ("unannotated_segment_loop", 1),
        ("unannotated_segment_exit", 1),
        ("right_flank_loop", 1),
        ("right_flank_exit", 1),
        ("end_to_unannotated_segment", 1),
        ("end_to_right_flank", 1),
        ("end_to_terminal", 1),
    ]


def implicit_transition_parts(length):
    return [
        ("left_flank_loop", 1),
        ("left_flank_to_match", length),
        ("left_flank_to_right_flank", 1),
        ("left_flank_to_unannotated_segment", 1),
        ("left_flank_to_terminal", 1),
        ("match_to_match", length - 1),
        ("match_skip", (length - 1) * (length - 2) // 2),
        ("match_to_unannotated", length),
        ("match_to_right_flank", length),
        ("match_to_terminal", length),
        ("match_to_insert", length - 1),
        ("insert_to_match", length - 1),
        ("insert_to_insert", length - 1),
        ("unannotated_segment_to_match", length),
        ("unannotated_segment_loop", 1),
        ("unannotated_segment_to_right_flank", 1),
        ("unannotated_segment_to_terminal", 1),
        ("right_flank_loop", 1),
        ("right_flank_exit", 1),
        ("terminal_self_loop", 1),
    ]


def sparse_transition_indices_implicit(length):
    """(from, to) index arrays per implicit part (``Transitioner.py:429-465``)."""
    a = np.arange(length + 1, dtype=np.int64)
    left_flank = 0
    first_insert = length + 1
    unanno = 2 * length
    right_flank = 2 * length + 1
    terminal = 2 * length + 2
    zeros = np.zeros(length, dtype=np.int64)
    return {
        "left_flank_loop": np.asarray([[left_flank, left_flank]]),
        "left_flank_to_match": np.stack([zeros + left_flank, a[1:]], axis=1),
        "left_flank_to_right_flank": np.asarray([[left_flank, right_flank]]),
        "left_flank_to_unannotated_segment": np.asarray([[left_flank, unanno]]),
        "left_flank_to_terminal": np.asarray([[left_flank, terminal]]),
        "match_to_match": np.stack([a[1:-1], a[1:-1] + 1], axis=1),
        "match_skip": (
            np.concatenate(
                [
                    np.stack(
                        [zeros[: -i - 1] + i, np.arange(i + 2, length + 1)], axis=1
                    )
                    for i in range(1, length - 1)
                ],
                axis=0,
            )
            if length > 2
            else np.zeros((0, 2), np.int64)
        ),
        "match_to_unannotated": np.stack([a[1:], zeros + unanno], axis=1),
        "match_to_right_flank": np.stack([a[1:], zeros + right_flank], axis=1),
        "match_to_terminal": np.stack([a[1:], zeros + terminal], axis=1),
        "match_to_insert": np.stack([a[1:-1], a[:-2] + first_insert], axis=1),
        "insert_to_match": np.stack([a[:-2] + first_insert, a[2:]], axis=1),
        "insert_to_insert": np.stack([a[:-2] + first_insert] * 2, axis=1),
        "unannotated_segment_to_match": np.stack([zeros + unanno, a[1:]], axis=1),
        "unannotated_segment_loop": np.asarray([[unanno, unanno]]),
        "unannotated_segment_to_right_flank": np.asarray([[unanno, right_flank]]),
        "unannotated_segment_to_terminal": np.asarray([[unanno, terminal]]),
        "right_flank_loop": np.asarray([[right_flank, right_flank]]),
        "right_flank_exit": np.asarray([[right_flank, terminal]]),
        "terminal_self_loop": np.asarray([[terminal, terminal]]),
    }


def sparse_transition_indices_explicit(length):
    """(from, to) index arrays per explicit part (``Transitioner.py:467-502``)."""
    a = np.arange(length + 1, dtype=np.int64)
    left_flank = 0
    first_insert = length + 1
    unanno = 2 * length
    right_flank = 2 * length + 1
    terminal = 2 * length + 2
    begin = 2 * length + 3
    end = 2 * length + 4
    first_delete = 2 * length + 5
    zeros = np.zeros(length, dtype=np.int64)
    return {
        "begin_to_match": np.stack([zeros + begin, a[1:]], axis=1),
        "match_to_end": np.stack([a[1:], zeros + end], axis=1),
        "match_to_match": np.stack([a[1:-1], a[1:-1] + 1], axis=1),
        "match_to_insert": np.stack([a[1:-1], a[:-2] + first_insert], axis=1),
        "insert_to_match": np.stack([a[:-2] + first_insert, a[2:]], axis=1),
        "insert_to_insert": np.stack([a[:-2] + first_insert] * 2, axis=1),
        "match_to_delete": np.stack(
            [np.insert(a[1:-1], 0, begin), a[:-1] + first_delete], axis=1
        ),
        "delete_to_match": np.stack(
            [a[:-1] + first_delete, np.append(a[:-2] + 2, end)], axis=1
        ),
        "delete_to_delete": np.stack(
            [a[:-2] + first_delete, a[:-2] + first_delete + 1], axis=1
        ),
        "left_flank_loop": np.asarray([[left_flank, left_flank]]),
        "left_flank_exit": np.asarray([[left_flank, begin]]),
        "unannotated_segment_loop": np.asarray([[unanno, unanno]]),
        "unannotated_segment_exit": np.asarray([[unanno, begin]]),
        "right_flank_loop": np.asarray([[right_flank, right_flank]]),
        "right_flank_exit": np.asarray([[right_flank, terminal]]),
        "end_to_unannotated_segment": np.asarray([[end, unanno]]),
        "end_to_right_flank": np.asarray([[end, right_flank]]),
        "end_to_terminal": np.asarray([[end, terminal]]),
    }


# Kernel parts that share one parameter vector (``Transitioner.py:97-98``).
_SHARED_KERNELS = [
    ["right_flank_loop", "left_flank_loop"],
    ["right_flank_exit", "left_flank_exit"],
]


def _canonical_name(part_name):
    for group in _SHARED_KERNELS:
        if part_name in group:
            return group[0]
    return part_name


def _logaddexp(x, y):
    return jnp.logaddexp(x, y)


class ProfileTransitions:
    """Plan7 profile-HMM transition model for one or more models.

    Args:
        lengths: model length (number of match states) or list of lengths.
        transition_init: dict (or list of dicts, one per model) mapping
            explicit edge-type names to initializers ``f(key, shape)``.
        flank_init: initializer (or list) for the left-flank initial logit.
        prior: transition prior; defaults to :class:`ProfileHMMTransitionPrior`.
        frozen_kernels: dict ``{part_name: True}`` marking parts excluded from
            training (consumed by :meth:`trainable_mask`).
    """

    #: ``structured_forward=True`` routes HMMLayer's sequential
    #: log-likelihood/loss through the structured O(L) Plan7 matvec
    #: (ops/plan7.py) instead of the dense engine. MEASURED NEGATIVE at
    #: config-4 scale on TPU v5e (m=5, q<=155, b=64, L=400: train step
    #: 19.1 ms vs 10.0 dense — see BASELINE.md round 3), so the default
    #: is False; the exact O(L) path remains available for the regimes
    #: it targets (very long single models / memory-bound settings).
    def __init__(
        self,
        lengths,
        transition_init=None,
        flank_init=None,
        prior=None,
        frozen_kernels=None,
        structured_forward: bool = False,
    ):
        self.structured_forward = structured_forward
        self.lengths = [lengths] if np.isscalar(lengths) else list(lengths)
        self.num_models = len(self.lengths)
        self.num_states = get_num_states(self.lengths)
        self.num_states_explicit = get_num_states_implicit(self.lengths)
        self.max_num_states = max(self.num_states)
        if transition_init is None:
            transition_init = inits.make_default_transition_init()
        self.transition_init = (
            [transition_init] * self.num_models
            if isinstance(transition_init, dict)
            else list(transition_init)
        )
        if flank_init is None:
            flank_init = inits.make_default_flank_init()
        self.flank_init = (
            [flank_init] * self.num_models
            if not isinstance(flank_init, list)
            else flank_init
        )
        self.prior = ProfileHMMTransitionPrior() if prior is None else prior
        self.frozen_kernels = frozen_kernels or {}
        assert len(self.transition_init) == self.num_models
        assert len(self.flank_init) == self.num_models

        self.explicit_parts = [
            explicit_transition_kernel_parts(l) for l in self.lengths
        ]
        self.implicit_parts = [implicit_transition_parts(l) for l in self.lengths]
        self.indices_explicit = [
            sparse_transition_indices_explicit(l) for l in self.lengths
        ]
        self.indices_implicit = [
            sparse_transition_indices_implicit(l) for l in self.lengths
        ]
        for init, parts in zip(self.transition_init, self.explicit_parts):
            for name, _ in parts:
                assert name in init, f"no initializer for kernel part {name}"

    # -- params ----------------------------------------------------------------

    def init_params(self, key) -> dict:
        kernels = []
        for i, (init, parts) in enumerate(
            zip(self.transition_init, self.explicit_parts)
        ):
            model_kernel = {}
            for j, (name, length) in enumerate(parts):
                canon = _canonical_name(name)
                if canon in model_kernel:
                    continue
                k = jax.random.fold_in(key, i * 100 + j)
                model_kernel[canon] = init[name](k, (length,))
            kernels.append(model_kernel)
        flank = [
            self.flank_init[i](jax.random.fold_in(key, 10_000 + i), (1,))
            for i in range(self.num_models)
        ]
        return {"kernels": kernels, "flank_init_kernel": flank}

    def duplicate(self, params, model_indices=None, share_kernels: bool = False):
        """Sub-select / copy models — the model-surgery hook mirroring
        ``ProfileEmissions.duplicate`` (reference: ``Emitter.py:171-197``;
        learnMSA trains several models and keeps the best)."""
        if model_indices is None:
            model_indices = list(range(self.num_models))
        copy = ProfileTransitions(
            [self.lengths[i] for i in model_indices],
            transition_init=[self.transition_init[i] for i in model_indices],
            flank_init=[self.flank_init[i] for i in model_indices],
            prior=self.prior,
            frozen_kernels=self.frozen_kernels,
        )
        sub = {
            "kernels": [params["kernels"][i] for i in model_indices],
            "flank_init_kernel": [
                params["flank_init_kernel"][i] for i in model_indices
            ],
        }
        if not share_kernels:
            sub = jax.tree.map(jnp.copy, sub)
        return copy, sub

    # -- param-preserving length adaptation ---------------------------------------

    @staticmethod
    def _resize_keep(old_lengths, new_lengths, keep):
        """Normalize/validate the per-model new-column -> old-column maps.

        Each map is an int array of length ``new_length``: entry ``j`` is
        the old match column (0-based) surviving at new position ``j``, or
        ``-1`` for a fresh column. Non-negative entries must be strictly
        increasing (columns keep their order). Default: identity prefix
        (grow/shrink at the model's end).
        """
        if keep is None:
            keep = []
            for lo, ln in zip(old_lengths, new_lengths):
                k = np.full(ln, -1, np.int64)
                n = min(lo, ln)
                k[:n] = np.arange(n)
                keep.append(k)
            return keep
        keep = [np.asarray(k, np.int64) for k in keep]
        for i, (k, lo, ln) in enumerate(zip(keep, old_lengths, new_lengths)):
            if k.shape != (ln,):
                raise ValueError(
                    f"keep[{i}] has shape {k.shape}, expected ({ln},)"
                )
            kept = k[k >= 0]
            if kept.size and (kept.max() >= lo or np.any(np.diff(kept) <= 0)):
                raise ValueError(
                    f"keep[{i}] must map to old columns < {lo} in strictly "
                    f"increasing order; got {k.tolist()}"
                )
        return keep

    # Entry-index semantics of the explicit kernel parts, used to carry
    # trained values across a resize. "col": entry j belongs to match
    # column j. "pair": entry j belongs to consecutive columns (j, j+1).
    # "mtd": match_to_delete, entry j is the edge (column j-1 | BEGIN) ->
    # delete shadow of column j. "dtm": delete_to_match, entry j is the
    # edge delete(j) -> (column j+1 | END).
    _RESIZE_PART_KINDS = {
        "begin_to_match": "col",
        "match_to_end": "col",
        "match_to_match": "pair",
        "match_to_insert": "pair",
        "insert_to_match": "pair",
        "insert_to_insert": "pair",
        "match_to_delete": "mtd",
        "delete_to_match": "dtm",
        "delete_to_delete": "pair",
    }

    @staticmethod
    def _resize_entry_map(kind, k, old_length):
        """(new_idx, old_idx) entry pairs preserved by the column map ``k``."""
        ln = len(k)
        new_idx, old_idx = [], []
        if kind == "col":
            for j in range(ln):
                if k[j] >= 0:
                    new_idx.append(j)
                    old_idx.append(int(k[j]))
        elif kind == "pair":
            for j in range(ln - 1):
                if k[j] >= 0 and k[j + 1] == k[j] + 1:
                    new_idx.append(j)
                    old_idx.append(int(k[j]))
        elif kind == "mtd":
            if ln and k[0] == 0:  # BEGIN -> delete(0) survives iff col 0 does
                new_idx.append(0)
                old_idx.append(0)
            for j in range(1, ln):
                if k[j - 1] >= 0 and k[j] == k[j - 1] + 1:
                    new_idx.append(j)
                    old_idx.append(int(k[j]))
        elif kind == "dtm":
            for j in range(ln - 1):
                if k[j] >= 0 and k[j + 1] == k[j] + 1:
                    new_idx.append(j)
                    old_idx.append(int(k[j]))
            if ln and k[ln - 1] == old_length - 1:  # delete(last) -> END
                new_idx.append(ln - 1)
                old_idx.append(old_length - 1)
        else:  # pragma: no cover
            raise AssertionError(kind)
        return np.asarray(new_idx, np.int64), np.asarray(old_idx, np.int64)

    def resize(self, params, new_lengths, key, keep=None):
        """Param-preserving re-target to new model lengths.

        The learnMSA iterative length-adaptation hook: the reference's
        ``set_lengths`` re-targets a transitioner but rebuilds every kernel
        from its initializers (``/root/reference/hmm_layer/Transitioner.py:
        39-61``); here the trained logits of every surviving edge carry
        over and only edges touching *new* columns draw fresh initializer
        values.

        Args:
            params: current parameter pytree.
            new_lengths: new match-state count per model (scalar or list of
                ``num_models`` ints).
            key: PRNG key for the fresh entries of grown kernels.
            keep: optional per-model maps new column -> old column
                (see :meth:`_resize_keep`); default grows/shrinks at the
                model end.

        Returns:
            ``(new_transitions, new_params)``.
        """
        if np.isscalar(new_lengths):
            new_lengths = [new_lengths]
        new_lengths = list(new_lengths)
        if len(new_lengths) != self.num_models:
            raise ValueError(
                f"{len(new_lengths)} new lengths for {self.num_models} models"
            )
        keep = self._resize_keep(self.lengths, new_lengths, keep)
        new_model = ProfileTransitions(
            new_lengths,
            transition_init=self.transition_init,
            flank_init=self.flank_init,
            prior=self.prior,
            frozen_kernels=self.frozen_kernels,
            structured_forward=self.structured_forward,
        )
        fresh = new_model.init_params(key)
        kernels = []
        for i, (lo, parts) in enumerate(
            zip(self.lengths, new_model.explicit_parts)
        ):
            k = keep[i]
            old_kernel = params["kernels"][i]
            new_kernel = {}
            seen = set()
            for name, _ in parts:
                canon = _canonical_name(name)
                if canon in seen:
                    continue
                seen.add(canon)
                vec = fresh["kernels"][i][canon]
                kind = self._RESIZE_PART_KINDS.get(canon)
                if kind is None:  # scalar flank/segment parts: copy
                    vec = old_kernel[canon]
                else:
                    new_idx, old_idx = self._resize_entry_map(kind, k, lo)
                    if new_idx.size:
                        vec = vec.at[new_idx].set(old_kernel[canon][old_idx])
                new_kernel[canon] = vec
            kernels.append(new_kernel)
        new_params = {
            "kernels": kernels,
            "flank_init_kernel": [
                jnp.copy(v) for v in params["flank_init_kernel"]
            ],
        }
        return new_model, new_params

    def trainable_mask(self, params) -> dict:
        """Boolean pytree marking trainable leaves (frozen kernel support).

        ``frozen_kernels`` may name ANY member of a shared-kernel group
        (the reference consults every explicit part name,
        ``Transitioner.py:109``); params store only the canonical name, so
        freezing e.g. ``left_flank_loop`` must freeze the shared
        ``right_flank_loop`` kernel."""
        frozen_canonical = {
            _canonical_name(name)
            for name, frozen in self.frozen_kernels.items()
            if frozen
        }
        mask_kernels = []
        for model_kernel in params["kernels"]:
            mask_kernels.append(
                {name: name not in frozen_canonical for name in model_kernel}
            )
        return {
            "kernels": mask_kernels,
            "flank_init_kernel": [True] * self.num_models,
        }

    def _kernel_for(self, params, i, name):
        return params["kernels"][i][_canonical_name(name)]

    # -- probability construction ------------------------------------------------

    def make_probs(self, params):
        """Per-model dict of per-edge-type probabilities over the explicit
        model (per-row softmax on the sparse pattern)."""
        out = []
        for i, (parts, idx, n_exp) in enumerate(
            zip(self.explicit_parts, self.indices_explicit, self.num_states_explicit)
        ):
            indices = np.concatenate([idx[name] for name, _ in parts], axis=0)
            values = jnp.concatenate(
                [self._kernel_for(params, i, name) for name, _ in parts], axis=0
            )
            dense = jnp.full((n_exp, n_exp), LOG_ZERO, values.dtype)
            dense = dense.at[indices[:, 0], indices[:, 1]].set(
                jnp.maximum(values, LOG_ZERO + 1.0)
            )
            mask = np.zeros((n_exp, n_exp), np.float32)
            mask[indices[:, 0], indices[:, 1]] = 1.0
            probs = jnp.exp(dense - jnp.max(dense, axis=-1, keepdims=True)) * mask
            probs = probs / jnp.maximum(
                jnp.sum(probs, axis=-1, keepdims=True), 1e-16
            )
            vec = probs[indices[:, 0], indices[:, 1]]
            model_probs, offset = {}, 0
            for name, length in parts:
                model_probs[name] = vec[offset : offset + length]
                offset += length
            out.append(model_probs)
        return out

    def make_implicit_log_probs(self, params):
        """Silent-state elimination; returns (implicit, log_probs, probs)."""
        probs = self.make_probs(params)
        log_probs = [
            {k: jnp.log(jnp.maximum(v, 1e-32)) for k, v in mp.items()}
            for mp in probs
        ]
        implicit = []
        for p, length in zip(log_probs, self.lengths):
            MD = p["match_to_delete"][:, None]  # (L, 1)
            DD = jnp.concatenate([jnp.zeros((1,)), p["delete_to_delete"]], axis=0)
            cs = jnp.cumsum(DD, axis=0)
            DDm = cs[None, :] - cs[:, None]  # (L, L): sum of DD on (i, j) path
            DM = p["delete_to_match"][None, :]
            M_skip = MD + DDm + DM  # (L, L); begin = M0, end = M(L+1)
            entry_add = _logaddexp(
                p["begin_to_match"],
                jnp.concatenate([jnp.asarray([LOG_ZERO]), M_skip[0, :-1]], axis=0),
            )
            exit_add = _logaddexp(
                p["match_to_end"],
                jnp.concatenate([M_skip[1:, -1], jnp.asarray([LOG_ZERO])], axis=0),
            )
            imp = {}
            imp["match_to_match"] = p["match_to_match"]
            imp["match_to_insert"] = p["match_to_insert"]
            imp["insert_to_match"] = p["insert_to_match"]
            imp["insert_to_insert"] = p["insert_to_insert"]
            imp["left_flank_loop"] = p["left_flank_loop"]
            imp["right_flank_loop"] = p["right_flank_loop"]
            imp["right_flank_exit"] = p["right_flank_exit"]
            if length > 2:
                rows, cols = np.triu_indices(length - 2)
                imp["match_skip"] = M_skip[1:-1, 1:-1][rows, cols]
            else:
                imp["match_skip"] = jnp.zeros((0,))
            imp["left_flank_to_match"] = p["left_flank_exit"] + entry_add
            imp["left_flank_to_right_flank"] = (
                p["left_flank_exit"] + M_skip[0, -1] + p["end_to_right_flank"]
            )
            imp["left_flank_to_unannotated_segment"] = (
                p["left_flank_exit"]
                + M_skip[0, -1]
                + p["end_to_unannotated_segment"]
            )
            imp["left_flank_to_terminal"] = (
                p["left_flank_exit"] + M_skip[0, -1] + p["end_to_terminal"]
            )
            imp["match_to_unannotated"] = exit_add + p["end_to_unannotated_segment"]
            imp["match_to_right_flank"] = exit_add + p["end_to_right_flank"]
            imp["match_to_terminal"] = exit_add + p["end_to_terminal"]
            imp["unannotated_segment_to_match"] = (
                p["unannotated_segment_exit"] + entry_add
            )
            imp["unannotated_segment_loop"] = _logaddexp(
                p["unannotated_segment_loop"],
                p["unannotated_segment_exit"]
                + M_skip[0, -1]
                + p["end_to_unannotated_segment"],
            )
            imp["unannotated_segment_to_right_flank"] = (
                p["unannotated_segment_exit"]
                + M_skip[0, -1]
                + p["end_to_right_flank"]
            )
            imp["unannotated_segment_to_terminal"] = (
                p["unannotated_segment_exit"] + M_skip[0, -1] + p["end_to_terminal"]
            )
            imp["terminal_self_loop"] = jnp.zeros((1,))
            implicit.append(imp)
        return implicit, log_probs, probs

    def make_log_A(self, params):
        """(num_models, q_max, q_max) dense log transition matrix, padded
        with ``LOG_ZERO``."""
        implicit, _, _ = self.make_implicit_log_probs(params)
        q = self.max_num_states
        rows = []
        for i, (imp, parts, idx) in enumerate(
            zip(implicit, self.implicit_parts, self.indices_implicit)
        ):
            indices = np.concatenate([idx[name] for name, _ in parts], axis=0)
            values = jnp.concatenate([imp[name] for name, _ in parts], axis=0)
            log_A = jnp.full((q, q), LOG_ZERO, values.dtype)
            log_A = log_A.at[indices[:, 0], indices[:, 1]].set(values)
            rows.append(log_A)
        return jnp.stack(rows, axis=0)

    def make_log_A_sparse(self, params):
        """Per-model COO views of the implicit transition matrix
        (``Transitioner.py:249-280`` parity): list of ``(indices
        (n_i, 2), log_values (n_i,))``, edge order following
        :func:`sparse_transition_indices_implicit`. Profile state spaces
        are small (2L+3), so this gathers from the dense build; the
        dense-free path for huge models is the gene-pred family's
        ``make_A_sparse``."""
        log_A = self.make_log_A(params)
        out = []
        for i, parts in enumerate(self.indices_implicit):
            idx = np.concatenate(list(parts.values()), axis=0)
            out.append((idx, log_A[i, idx[:, 0], idx[:, 1]]))
        return out

    def make_A_sparse(self, params):
        """Linear-space COO views; same layout as :meth:`make_log_A_sparse`."""
        return [
            (idx, jnp.exp(vals)) for idx, vals in self.make_log_A_sparse(params)
        ]

    def make_A(self, params):
        return jnp.exp(self.make_log_A(params))

    def make_flank_init_prob(self, params):
        return jax.nn.sigmoid(
            jnp.stack([k[0] for k in params["flank_init_kernel"]])
        )  # (m,)

    def make_initial_distribution(self, params):
        """(num_models, q_max) initial distribution
        (``Transitioner.py:123-160``)."""
        implicit, log_probs, _ = self.make_implicit_log_probs(params)
        flank_prob = self.make_flank_init_prob(params)
        log_flank = jnp.log(flank_prob)
        log_compl = jnp.log1p(-flank_prob)
        rows = []
        for i, (imp, lp, length) in enumerate(
            zip(implicit, log_probs, self.lengths)
        ):
            corr = log_compl[i] - lp["left_flank_exit"]
            log_init = jnp.concatenate(
                [
                    log_flank[i][None],
                    imp["left_flank_to_match"] + corr,
                    jnp.full((length - 1,), LOG_ZERO),
                    imp["left_flank_to_unannotated_segment"] + corr,
                    imp["left_flank_to_right_flank"] + corr,
                    imp["left_flank_to_terminal"] + corr,
                ],
                axis=0,
            )
            pad = self.max_num_states - self.num_states[i]
            if pad:
                log_init = jnp.concatenate(
                    [log_init, jnp.full((pad,), LOG_ZERO)], axis=0
                )
            rows.append(log_init)
        return jnp.exp(jnp.stack(rows, axis=0))

    def matrices(self, params):
        return self.make_initial_distribution(params), self.make_A(params)

    def prior_log_density(self, params):
        """(num_models,) summed transition prior."""
        probs = self.make_probs(params)
        flank = self.make_flank_init_prob(params)
        prior_dict = self.prior(probs, flank)
        return sum(prior_dict.values())

    def get_config(self):
        """Full JSON-able config — a checkpointed profile run reconstructs
        from config alone (reference: ``Emitter.py:199-224``). Initializers
        serialize via their spec (:func:`initializers.init_to_config`);
        reconstruction with the same PRNG key gives identical params."""
        return {
            "lengths": self.lengths,
            "frozen_kernels": self.frozen_kernels,
            "structured_forward": self.structured_forward,
            "transition_init": [
                {name: inits.init_to_config(fn) for name, fn in model_init.items()}
                for model_init in self.transition_init
            ],
            "flank_init": [inits.init_to_config(fn) for fn in self.flank_init],
            "prior": self.prior.get_config(),
        }

    @classmethod
    def from_config(cls, config):
        t_init = config.get("transition_init")
        if t_init is not None:
            t_init = [
                {name: inits.init_from_config(spec) for name, spec in mi.items()}
                for mi in t_init
            ]
        f_init = config.get("flank_init")
        if f_init is not None:
            f_init = [inits.init_from_config(spec) for spec in f_init]
        prior = config.get("prior")
        if prior is not None:
            prior = ProfileHMMTransitionPrior.from_config(prior)
        return cls(
            config["lengths"],
            transition_init=t_init,
            flank_init=f_init,
            prior=prior,
            frozen_kernels=config.get("frozen_kernels"),
            structured_forward=config.get("structured_forward", False),
        )

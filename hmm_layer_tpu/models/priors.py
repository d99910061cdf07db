"""MAP priors for profile-HMM parameters.

Functional JAX equivalents of ``/root/reference/hmm_layer/Priors.py``:

* :class:`ProfileHMMTransitionPrior` — Dirichlet priors on the
  match/insert/delete transition triples plus closed-form flank
  (``alpha_flank``), single-hit (``alpha_single``) and global entry/exit
  (``alpha_global``) terms (``Priors.py:68-136``).
* :class:`AminoAcidPrior` — Dirichlet mixture over match-state emission
  distributions. The reference *references* this class
  (``Emitter.py:33``) but never defines it (a known defect); the capability
  comes from upstream learnMSA and is restored here.

The reference loads trained Dirichlet-mixture weights from ``trained_prior/``
files that are absent from its repo (``Priors.py:52-64``); here each mixture
defaults to a documented single-component prior and can be replaced by
trained parameters via ``load_mixture_model`` (npz).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .dirichlet import DirichletMixture, dirichlet_log_pdf

__all__ = [
    "ProfileHMMTransitionPrior",
    "AminoAcidPrior",
    "FixedDirichlet",
    "load_trained_prior",
]

_TRAINED_PRIOR_DIR = os.path.join(
    os.path.dirname(__file__), "..", "trained_priors"
)


def _np_softplus(x):
    x = np.asarray(x, np.float64)
    return np.where(x > 30.0, x, np.log1p(np.exp(np.minimum(x, 30.0))))


def _np_softmax(x):
    x = np.asarray(x, np.float64)
    e = np.exp(x - x.max())
    return e / e.sum()


def load_trained_prior(name, fallback_alpha=None):
    """A :class:`FixedDirichlet` from a trained mixture artifact.

    Artifacts live in ``hmm_layer_tpu/trained_priors/<name>.npz`` (written
    by ``examples/train_dirichlet_priors.py`` via
    :func:`~hmm_layer_tpu.models.dirichlet.save_mixture_model`) — the
    equivalent of the reference's ``trained_prior/`` weight files, which
    its repo references but does not ship (``Priors.py:48-66``). Loads
    with NumPy only (import stays backend-free). Falls back to
    ``FixedDirichlet(fallback_alpha)`` when the artifact is absent.
    """
    path = os.path.join(_TRAINED_PRIOR_DIR, f"{name}.npz")
    if os.path.exists(path):
        data = np.load(path)
        alpha = _np_softplus(data["alpha_kernel"])
        mix = _np_softmax(data["mix_kernel"])
        return FixedDirichlet(alpha, mix)
    if fallback_alpha is None:
        raise FileNotFoundError(
            f"trained prior artifact {path} missing and no fallback given; "
            "run examples/train_dirichlet_priors.py to create it"
        )
    return FixedDirichlet(fallback_alpha)


class FixedDirichlet:
    """A fixed (non-trainable) Dirichlet mixture used as a prior component."""

    def __init__(self, alpha, mix=None):
        self.alpha = np.asarray(alpha, np.float32)
        if self.alpha.ndim == 1:
            self.alpha = self.alpha[None]
        self.mix = (
            np.full((self.alpha.shape[0],), 1.0 / self.alpha.shape[0], np.float32)
            if mix is None
            else np.asarray(mix, np.float32)
        )

    @classmethod
    def from_params(cls, model: DirichletMixture, params):
        return cls(
            np.asarray(model.make_alpha(params)), np.asarray(model.make_mix(params))
        )

    def log_pdf(self, p):
        return dirichlet_log_pdf(p, jnp.asarray(self.alpha), jnp.asarray(self.mix))

    def get_config(self):
        return {"alpha": self.alpha.tolist(), "mix": self.mix.tolist()}

    @classmethod
    def from_config(cls, config):
        return cls(config["alpha"], config.get("mix"))


class ProfileHMMTransitionPrior:
    """Default Dirichlet-mixture prior on profile-HMM transitions.

    Args:
        match_dirichlet / insert_dirichlet / delete_dirichlet: mixtures over
            the 3-dim (MM, MI, MD) / 2-dim (IM, II) / 2-dim (DM, DD)
            simplices. Defaults are mild single-component priors favoring
            match-to-match continuation (stand-ins for learnMSA's trained
            mixtures, which the reference repo does not ship).
        alpha_flank: biases flank-loop probabilities high.
        alpha_single: biases single main-model hits (no loops).
        alpha_global: biases entry at the first and exit at the last match.
    """

    def __init__(
        self,
        match_dirichlet=None,
        insert_dirichlet=None,
        delete_dirichlet=None,
        alpha_flank=7000.0,
        alpha_single=1e9,
        alpha_global=1e4,
        alpha_flank_compl=1.0,
        alpha_single_compl=1.0,
        alpha_global_compl=1.0,
        epsilon=1e-16,
    ):
        # Defaults are the TRAINED mixtures shipped with the package
        # (examples/train_dirichlet_priors.py), with the former mild
        # single-component values as fallback if artifacts are absent.
        self.match_dirichlet = match_dirichlet or load_trained_prior(
            "match_prior_1", [10.0, 2.0, 2.0]
        )
        self.insert_dirichlet = insert_dirichlet or load_trained_prior(
            "insert_prior_1", [2.0, 2.0]
        )
        self.delete_dirichlet = delete_dirichlet or load_trained_prior(
            "delete_prior_1", [2.0, 2.0]
        )
        self.alpha_flank = alpha_flank
        self.alpha_single = alpha_single
        self.alpha_global = alpha_global
        self.alpha_flank_compl = alpha_flank_compl
        self.alpha_single_compl = alpha_single_compl
        self.alpha_global_compl = alpha_global_compl
        self.epsilon = epsilon

    def get_config(self):
        return {
            "match_dirichlet": self.match_dirichlet.get_config(),
            "insert_dirichlet": self.insert_dirichlet.get_config(),
            "delete_dirichlet": self.delete_dirichlet.get_config(),
            "alpha_flank": self.alpha_flank,
            "alpha_single": self.alpha_single,
            "alpha_global": self.alpha_global,
            "alpha_flank_compl": self.alpha_flank_compl,
            "alpha_single_compl": self.alpha_single_compl,
            "alpha_global_compl": self.alpha_global_compl,
            "epsilon": self.epsilon,
        }

    @classmethod
    def from_config(cls, config):
        config = dict(config)
        for name in ("match_dirichlet", "insert_dirichlet", "delete_dirichlet"):
            if config.get(name) is not None:
                config[name] = FixedDirichlet.from_config(config[name])
        return cls(**config)

    def __call__(self, probs_list, flank_init_prob):
        """Per-prior values, each (num_models,) (``Priors.py:68-136``)."""
        eps = self.epsilon
        match_d, insert_d, delete_d = [], [], []
        flank_p, hit_p, global_p = [], [], []
        for i, probs in enumerate(probs_list):
            log_probs = {k: jnp.log(jnp.maximum(v, eps)) for k, v in probs.items()}
            p_match = (
                jnp.stack(
                    [
                        probs["match_to_match"],
                        probs["match_to_insert"],
                        probs["match_to_delete"][1:],
                    ],
                    axis=-1,
                )
                + eps
            )
            p_match = p_match / jnp.sum(p_match, axis=-1, keepdims=True)
            match_d.append(jnp.sum(self.match_dirichlet.log_pdf(p_match)))
            p_insert = jnp.stack(
                [probs["insert_to_match"], probs["insert_to_insert"]], axis=-1
            )
            insert_d.append(jnp.sum(self.insert_dirichlet.log_pdf(p_insert)))
            p_delete = jnp.stack(
                [probs["delete_to_match"][:-1], probs["delete_to_delete"]], axis=-1
            )
            delete_d.append(jnp.sum(self.delete_dirichlet.log_pdf(p_delete)))

            flank = (self.alpha_flank - 1) * log_probs["unannotated_segment_loop"]
            flank += (self.alpha_flank - 1) * log_probs["right_flank_loop"]
            flank += (self.alpha_flank - 1) * log_probs["left_flank_loop"]
            flank += (self.alpha_flank - 1) * log_probs["end_to_right_flank"]
            flank += (self.alpha_flank - 1) * jnp.log(flank_init_prob[i])
            flank += (self.alpha_flank_compl - 1) * log_probs[
                "unannotated_segment_exit"
            ]
            flank += (self.alpha_flank_compl - 1) * log_probs["right_flank_exit"]
            flank += (self.alpha_flank_compl - 1) * log_probs["left_flank_exit"]
            flank += (self.alpha_flank_compl - 1) * jnp.log(
                probs["end_to_unannotated_segment"] + probs["end_to_terminal"]
            )
            flank += (self.alpha_flank_compl - 1) * jnp.log(
                jnp.maximum(1 - flank_init_prob[i], eps)
            )
            flank_p.append(jnp.squeeze(flank))

            hit = (self.alpha_single - 1) * jnp.log(
                probs["end_to_right_flank"] + probs["end_to_terminal"]
            )
            hit += (self.alpha_single_compl - 1) * jnp.log(
                probs["end_to_unannotated_segment"]
            )
            hit_p.append(jnp.squeeze(hit))

            div = jnp.maximum(eps, 1 - probs["match_to_delete"][0])
            btm = probs["begin_to_match"] / div
            enex = btm[:, None] * probs["match_to_end"][None, :]
            enex = jnp.tril(enex)
            log_enex = jnp.log(jnp.maximum(eps, 1 - enex))
            log_enex_compl = jnp.log(jnp.maximum(eps, enex))
            glob = (self.alpha_global - 1) * (jnp.sum(log_enex) - log_enex[0, -1])
            glob += (self.alpha_global_compl - 1) * (
                jnp.sum(log_enex_compl) - log_enex_compl[0, -1]
            )
            global_p.append(glob)
        return {
            "match_prior": jnp.stack(match_d),
            "insert_prior": jnp.stack(insert_d),
            "delete_prior": jnp.stack(delete_d),
            "flank_prior": jnp.stack(flank_p),
            "hit_prior": jnp.stack(hit_p),
            "global_prior": jnp.stack(global_p),
        }


class AminoAcidPrior:
    """Dirichlet prior over match-state amino-acid distributions.

    Scores each match state's emission distribution (first 20 channels,
    renormalized) under a Dirichlet mixture. ``comp_count`` components with
    trained parameters may be supplied; the default is a mild uniform prior.
    """

    def __init__(self, dirichlet=None, epsilon=1e-16):
        self.dirichlet = dirichlet or load_trained_prior(
            "amino_prior_9", np.full((20,), 1.1)
        )
        self.epsilon = epsilon

    def get_config(self):
        return {
            "dirichlet": self.dirichlet.get_config(),
            "epsilon": self.epsilon,
        }

    @classmethod
    def from_config(cls, config):
        config = dict(config)
        if config.get("dirichlet") is not None:
            config["dirichlet"] = FixedDirichlet.from_config(config["dirichlet"])
        return cls(**config)

    def __call__(self, B, lengths):
        """Args: B (num_models, q_max, s); returns (num_models,).

        Match states occupy rows 1..L (state order LEFT_FLANK, MATCH x L,
        ...)."""
        vals = []
        for i, length in enumerate(lengths):
            match_rows = B[i, 1 : length + 1, :20]
            match_rows = match_rows / jnp.maximum(
                jnp.sum(match_rows, axis=-1, keepdims=True), self.epsilon
            )
            vals.append(jnp.sum(self.dirichlet.log_pdf(match_rows)))
        return jnp.stack(vals)

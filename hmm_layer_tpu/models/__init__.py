"""Model families: pluggable transition and emission parameterizations."""

from .dirichlet import DirichletMixture, dirichlet_log_pdf, load_mixture_model
from .gene_pred_emissions import GenePredEmissions, SimpleGenePredEmissions
from .gene_pred_transitions import (
    GenePredMultiTransitions,
    GenePredTransitions,
    SimpleGenePredTransitions,
)
from .msa import AMINO_ALPHABET, paths_to_msa, write_msa
from .mvn import MvnMixture
from .priors import AminoAcidPrior, FixedDirichlet, ProfileHMMTransitionPrior
from .profile_emissions import ProfileEmissions
from .profile_transitions import (
    ProfileTransitions,
    get_num_states,
    get_num_states_implicit,
)

__all__ = [
    "AMINO_ALPHABET",
    "AminoAcidPrior",
    "DirichletMixture",
    "FixedDirichlet",
    "GenePredEmissions",
    "GenePredMultiTransitions",
    "GenePredTransitions",
    "MvnMixture",
    "ProfileEmissions",
    "ProfileHMMTransitionPrior",
    "ProfileTransitions",
    "SimpleGenePredEmissions",
    "SimpleGenePredTransitions",
    "dirichlet_log_pdf",
    "get_num_states",
    "get_num_states_implicit",
    "load_mixture_model",
    "paths_to_msa",
    "write_msa",
]

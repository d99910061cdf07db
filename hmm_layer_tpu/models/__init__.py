"""Model families: pluggable transition and emission parameterizations."""

from .annotation import (
    GeneFeature,
    evaluate_annotation,
    flip_genes,
    genes_to_gff3,
    genes_to_states,
    paths_to_genes,
    read_gff3,
    write_gff3,
)
from .dirichlet import DirichletMixture, dirichlet_log_pdf, load_mixture_model
from .gene_pred_emissions import GenePredEmissions, SimpleGenePredEmissions
from .gene_pred_transitions import (
    GenePredMultiTransitions,
    GenePredTransitions,
    SimpleGenePredTransitions,
)
from .msa import (
    AMINO_ALPHABET,
    evaluate_msa,
    msa_column_maps,
    paths_to_msa,
    write_msa,
)
from .mvn import MvnMixture
from .priors import AminoAcidPrior, FixedDirichlet, ProfileHMMTransitionPrior
from .profile_emissions import ProfileEmissions
from .profile_transitions import (
    ProfileTransitions,
    get_num_states,
    get_num_states_implicit,
)
from .profile_adapt import adapt_profile_layer, match_statistics, propose_keep
from .simulate import (
    SimulatedGenome,
    sample_hmm_sequences,
    simulate_embeddings,
    simulate_genome,
)

__all__ = [
    "AMINO_ALPHABET",
    "AminoAcidPrior",
    "DirichletMixture",
    "FixedDirichlet",
    "GeneFeature",
    "GenePredEmissions",
    "GenePredMultiTransitions",
    "GenePredTransitions",
    "MvnMixture",
    "ProfileEmissions",
    "ProfileHMMTransitionPrior",
    "ProfileTransitions",
    "SimpleGenePredEmissions",
    "SimpleGenePredTransitions",
    "SimulatedGenome",
    "adapt_profile_layer",
    "dirichlet_log_pdf",
    "evaluate_annotation",
    "evaluate_msa",
    "flip_genes",
    "genes_to_gff3",
    "genes_to_states",
    "get_num_states",
    "get_num_states_implicit",
    "load_mixture_model",
    "match_statistics",
    "msa_column_maps",
    "paths_to_genes",
    "propose_keep",
    "paths_to_msa",
    "read_gff3",
    "sample_hmm_sequences",
    "simulate_genome",
    "simulate_embeddings",
    "write_gff3",
    "write_msa",
]

"""Compute primitives: semiring ops, HMM recursions, scan drivers, k-mers.

``recursion`` is the engine (forward/backward/posterior/viterbi with the
chunked parallel scan and Pallas TPU fast paths); ``semiring`` holds the
log-space / tropical building blocks; ``scan`` provides generic RNN-style
drivers for custom cells; ``kmer`` encodes one-hot nucleotide sequences;
``sparse`` runs the recursions over COO edge lists (huge multi-copy models);
``plan7`` applies the implicit profile operator in O(L) structured form.
"""

from . import em, kmer, plan7, recursion, sampling, scan, semiring, sparse
from .recursion import (
    ForwardResult,
    backward,
    forward,
    log_likelihood,
    posterior,
    viterbi,
)
from .em import em_step, expected_statistics
from .sampling import sample_posterior
from .scan import bidirectional_scan, rnn_scan
from .semiring import (
    EPS,
    LOG_ZERO,
    log_normalize,
    logmatmul,
    logmatvec,
    maxargmatvec,
    maxmatmul,
)

__all__ = [
    "ForwardResult",
    "forward",
    "backward",
    "posterior",
    "log_likelihood",
    "viterbi",
    "em_step",
    "expected_statistics",
    "sample_posterior",
    "rnn_scan",
    "bidirectional_scan",
    "logmatmul",
    "logmatvec",
    "maxmatmul",
    "maxargmatvec",
    "log_normalize",
    "EPS",
    "LOG_ZERO",
    "em",
    "kmer",
    "recursion",
    "sampling",
    "scan",
    "semiring",
    "sparse",
    "plan7",
]

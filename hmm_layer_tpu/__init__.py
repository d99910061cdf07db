"""hmm_layer_tpu — TPU-native differentiable HMM engine (JAX/XLA/Pallas).

A from-scratch framework with the capabilities of ``sukui-genomics-cn/hmm_layer``
(differentiable forward/backward/posterior HMM layer with profile-HMM and
gene-prediction model families), re-designed for TPU: log-semiring
associative scans over device meshes instead of per-timestep Python loops.
"""

from .ops.recursion import (
    ForwardResult,
    backward,
    dp_precision,
    forward,
    log_likelihood,
    posterior,
    set_dp_precision,
    viterbi,
)
from .layer import HMMLayer
from .training import Trainer
from . import data, models, streaming, utils

__version__ = "0.1.0"

__all__ = [
    "data",
    "streaming",
    "ForwardResult",
    "HMMLayer",
    "Trainer",
    "backward",
    "dp_precision",
    "forward",
    "log_likelihood",
    "models",
    "posterior",
    "set_dp_precision",
    "utils",
    "viterbi",
    "__version__",
]

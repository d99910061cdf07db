"""hmm_layer_tpu — TPU-native differentiable HMM engine (JAX/XLA/Pallas).

A from-scratch framework with the capabilities of ``sukui-genomics-cn/hmm_layer``
(differentiable forward/backward/posterior HMM layer with profile-HMM and
gene-prediction model families), re-designed for TPU: log-semiring
associative scans over device meshes instead of per-timestep Python loops.
"""

from .ops.recursion import (
    ForwardResult,
    backward,
    forward,
    log_likelihood,
    posterior,
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
    "forward",
    "log_likelihood",
    "models",
    "posterior",
    "utils",
    "viterbi",
    "__version__",
]

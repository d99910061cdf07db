"""Multi-device sharding: data / sequence / state parallelism over meshes."""

from .sharding import (
    data_parallel_fn,
    init_distributed,
    make_mesh,
    replicate,
    seq_sharded_log_likelihood,
    seq_sharded_posterior,
    seq_sharded_viterbi,
    shard_batch,
    state_sharded_log_likelihood,
    state_sharded_posterior,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_fn",
    "state_sharded_log_likelihood",
    "state_sharded_posterior",
    "seq_sharded_log_likelihood",
    "seq_sharded_posterior",
    "seq_sharded_viterbi",
]

"""Multi-device sharding: data / sequence / state parallelism over meshes."""

from .sparse_sharding import (
    ShardedEdgePlan,
    edge_sharded_log_likelihood,
    edge_sharded_posterior,
    edge_sharded_viterbi,
)
from .sharding import (
    data_parallel_em_step,
    data_parallel_em_step_categorical,
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
    state_sharded_viterbi,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_fn",
    "data_parallel_em_step",
    "data_parallel_em_step_categorical",
    "state_sharded_log_likelihood",
    "state_sharded_posterior",
    "state_sharded_viterbi",
    "seq_sharded_log_likelihood",
    "seq_sharded_posterior",
    "seq_sharded_viterbi",
    "ShardedEdgePlan",
    "edge_sharded_log_likelihood",
    "edge_sharded_posterior",
    "edge_sharded_viterbi",
]

"""Mesh + sharding helpers (DP over ICI)."""

from .mesh import (
    check_replication_consistency,
    data_parallel_mesh,
    initialize_distributed,
    make_sharded_train_step,
    replicate,
    shard_batch,
)

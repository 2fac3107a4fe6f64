"""Mesh + sharding helpers (DP over ICI)."""

from .mesh import (
    data_parallel_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)

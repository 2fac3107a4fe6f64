"""Device mesh + DP step wrappers — the TPU-native replacement for the
reference's DDP/NCCL layer (SURVEY.md section 2.9).

The reference shards data by `InfiniteSampler` rank striding and allreduces
grads via per-module DDP wrappers; here a 1-D `data` mesh over ICI carries the
batch, params stay replicated, and the gradient `lax.pmean` inside the step
(train/step.py) is the single collective — XLA schedules it on ICI.
Multi-host scaling is the same program over a larger mesh
(`jax.distributed.initialize` + the same shard_map).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

DATA_AXIS = "data"


def data_parallel_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the data axis of the mesh.

    Single-process: plain device_put.  Multi-process (jax.distributed): each
    process passes its LOCAL 1/world of the global batch (rank-strided by
    InfiniteLoader) and a global array is assembled from the process-local
    shards — the TPU-native equivalent of the reference's per-rank
    DataLoader + DDP input split (`torch_utils/misc.py:115-146`)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    # multi-process: every process supplies the identical full value
    return jax.tree_util.tree_map(
        lambda v: jax.make_array_from_process_local_data(
            sharding, np.asarray(v), np.shape(v)
        ),
        tree,
    )


def make_sharded_train_step(step_fn, mesh: Mesh):
    """Wrap a (state, batch, rng) -> (state, stats) step for DP execution.

    state/rng are replicated, batch is sharded on the data axis; the step_fn
    must already pmean its grads/stats over DATA_AXIS (GANTrainer does when
    constructed with axis_name=DATA_AXIS).
    """
    mapped = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def local_value(tree):
    """Host-read a (replicated) pytree in multi-process runs.

    `jax.device_get` refuses non-fully-addressable arrays; for replicated
    state every process can read its first local shard instead."""
    def _leaf(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return np.asarray(a.addressable_data(0))
        return np.asarray(a)

    return jax.tree_util.tree_map(_leaf, tree)


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (replaces the reference's file:// NCCL rendezvous,
    `train_wo_flow_fullbody.py:393-400`): `jax.distributed.initialize` wires
    the JAX coordinator service; afterwards `jax.devices()` spans all hosts
    and the same `data_parallel_mesh()` + shard_map program scales across DCN.
    No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def check_replication_consistency(tree, mesh: Mesh, rtol: float = 0.0) -> None:
    """TPU-native `misc.check_ddp_consistency` (`torch_utils/misc.py:184-196`):
    assert every leaf of a replicated pytree is bitwise identical across all
    devices of the mesh.  Raises AssertionError naming the first bad leaf."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for keypath, leaf in flat:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for i, s in enumerate(shards[1:], start=1):
            if rtol == 0.0:
                ok = np.array_equal(shards[0], s)
            else:
                ok = np.allclose(shards[0], s, rtol=rtol)
            if not ok:
                name = jax.tree_util.keystr(keypath)
                raise AssertionError(
                    f"replication mismatch at {name}: device 0 vs device {i}"
                )

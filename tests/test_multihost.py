"""Multi-host correctness: rank-strided loading + process-local global arrays.

The heavy check launches 2 REAL processes (jax.distributed over localhost,
4 virtual CPU devices each -> an 8-device global mesh), trains 2 steps with
rank-strided per-process batches, and asserts both processes hold identical
parameters afterwards (the gradient pmean is the only collective)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration scale; run with `-m slow` or no marker filter

from pasta_gan_tpu.train.loop import InfiniteLoader


class _IdxDataset:
    """Samples are just their index (as arrays) — exposes exactly which
    records each rank loaded."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray([i], np.int64)}


def test_loader_rank_striding_partitions_batches():
    n, B, world = 64, 4, 4
    loaders = [
        InfiniteLoader(_IdxDataset(n), B, seed=7, rank=r, world=world, num_workers=2)
        for r in range(world)
    ]
    for b in range(6):
        chunks = [next(ld)["idx"][:, 0] for ld in loaders]
        allidx = np.concatenate(chunks)
        # the global batch is a contiguous slice of the shared permutation
        # stream: no duplicates across ranks
        assert len(set(allidx.tolist())) == B * world, allidx
    # determinism: a fresh loader replays the same stream
    ld2 = InfiniteLoader(_IdxDataset(n), B, seed=7, rank=1, world=world, num_workers=3)
    ld1 = InfiniteLoader(_IdxDataset(n), B, seed=7, rank=1, world=world, num_workers=1)
    for _ in range(5):
        np.testing.assert_array_equal(next(ld1)["idx"], next(ld2)["idx"])


_WORKER = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if "__file__" in dir() else ".")
import numpy as np
import jax.numpy as jnp
from pasta_gan_tpu.runtime.config import TrainConfig, ModelConfig, LossConfig, AdaConfig
from pasta_gan_tpu.train.step import GANTrainer
from pasta_gan_tpu.train.loop import InfiniteLoader
from pasta_gan_tpu.parallel import data_parallel_mesh, make_sharded_train_step, replicate, shard_batch
from pasta_gan_tpu.parallel.mesh import local_value

assert jax.process_count() == 2 and len(jax.devices()) == 8

cfg = TrainConfig(
    model=ModelConfig(img_resolution=16, channel_base=256, channel_max=32,
                      mbstd_group_size=2, mapping_layers=1),
    loss=LossConfig(l1_weight=40.0, vgg_weight=0.0, mask_weight=20.0, r1_gamma=10.0),
    ada=AdaConfig(enabled=False),
    batch_size=8, ema_kimg=10.0,
)
res = 16

class DS:
    def __len__(self): return 32
    def __getitem__(self, i):
        r = np.random.default_rng(i)
        return {
            "real_img": r.normal(size=(res, res, 3)).astype(np.float32),
            "style_input": r.normal(size=(res, res, 42)).astype(np.float32),
            "retain": r.normal(size=(res, res, 3)).astype(np.float32),
            "pose": r.normal(size=(res, res, 6)).astype(np.float32),
            "denorm_upper_img": r.normal(size=(res, res, 3)).astype(np.float32),
            "denorm_lower_img": r.normal(size=(res, res, 3)).astype(np.float32),
            "denorm_upper_mask": (r.uniform(size=(res, res, 1)) > 0.5).astype(np.float32),
            "denorm_lower_mask": (r.uniform(size=(res, res, 1)) > 0.5).astype(np.float32),
            "gt_parsing": r.integers(0, 6, size=(res, res)).astype(np.int32),
        }

from pasta_gan_tpu.data.dataset import collate
world, prank = jax.process_count(), jax.process_index()
loader = InfiniteLoader(DS(), cfg.batch_size // world, seed=0, rank=prank, world=world)
mesh = data_parallel_mesh()
trainer = GANTrainer(cfg, axis_name="data")
b0 = next(loader)
state = trainer.init_state(jax.random.PRNGKey(0), {k: v[:1] for k, v in b0.items()})
state = replicate(state, mesh)
step = make_sharded_train_step(trainer.train_step, mesh)
batch = b0
for i in range(2):
    sb = shard_batch(batch, mesh)
    state, stats = step(state, sb, jax.random.PRNGKey(10 + i))
    batch = next(loader)
params = local_value(state.g_params)
leaves = jax.tree_util.tree_leaves(params)
checksum = float(sum(np.sum(np.abs(np.asarray(l, np.float64))) for l in leaves))
print(f"CHECKSUM {checksum:.6e}", flush=True)
"""


@pytest.mark.slow
def test_two_process_training_identical_params(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=repo,
            text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    sums = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("CHECKSUM")]
        assert lines, out[-3000:]
        sums.append(float(lines[-1].split()[1]))
    assert sums[0] == pytest.approx(sums[1], rel=1e-12)
    assert sums[0] > 0

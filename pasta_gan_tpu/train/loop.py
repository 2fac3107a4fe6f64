"""Training loop (reference `training/training_loop_wo_flow_fullbody.py:213-656`).

Single program over a data mesh: host workers decode samples, the device does
patch routing + the jitted train phases.  Phase schedule matches the
reference: Gmain+Dmain every step (one fused jit), Dreg/R1 every
d_reg_interval steps, EMA + w_avg + ADA controller inside the step.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import Optional

import jax
import numpy as np

from ..data.dataset import collate, prepare_train_batch
from ..io.checkpoints import restore_train_state, save_snapshot, save_train_state
from ..parallel import data_parallel_mesh, make_sharded_train_step, replicate, shard_batch
from ..parallel.mesh import local_value
from ..runtime.config import TrainConfig, to_json
from ..runtime.stats import Collector, JsonlLogger
from .step import GANTrainer


class InfiniteLoader:
    """Infinite shuffled host-side loader with multi-worker prefetch.

    Counterpart of the reference's `misc.InfiniteSampler` rank striding
    (`torch_utils/misc.py:115-146`) + DataLoader workers: every process draws
    the SAME shared-seed permutation stream and takes elements
    `rank::world` — each host decodes only its 1/world of the global batch.
    `batch_size` here is the PER-PROCESS batch.  Decode workers parallelize
    whole batches (deterministic order: worker w builds batches b with
    b % num_workers == w; emission is re-serialized by batch index)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0, prefetch: int = 4,
                 rank: int = 0, world: int = 1, num_workers: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.rank = rank
        self.world = world
        self.num_workers = max(1, num_workers)
        self._results: dict = {}
        self._lock = threading.Condition()
        self._next_emit = 0
        self._max_buffer = prefetch + self.num_workers
        for w in range(self.num_workers):
            threading.Thread(target=self._worker, args=(w,), daemon=True).start()

    def _batch_indices(self, b: int):
        """Global indices of per-process batch b (deterministic in (seed, b))."""
        n = len(self.dataset)
        out = []
        # epoch-wise permutations; rank r takes stream positions r::world
        global_bs = self.batch_size * self.world
        start = b * global_bs
        # materialize only the needed epochs
        first_epoch = start // n
        # regenerate permutations up to the needed epoch window
        perms = {}

        def perm(e):
            if e not in perms:
                r = np.random.default_rng((self.seed, e))
                perms[e] = r.permutation(n)
            return perms[e]

        for j in range(self.batch_size):
            pos = start + j * self.world + self.rank
            out.append(int(perm(pos // n)[pos % n]))
        return out

    def _worker(self, wid: int):
        b = wid
        while True:
            idx = self._batch_indices(b)
            batch = collate([self.dataset[i] for i in idx])
            with self._lock:
                while b > self._next_emit + self._max_buffer:
                    self._lock.wait()
                self._results[b] = batch
                self._lock.notify_all()
            b += self.num_workers

    def __next__(self):
        with self._lock:
            while self._next_emit not in self._results:
                self._lock.wait()
            batch = self._results.pop(self._next_emit)
            self._next_emit += 1
            self._lock.notify_all()
            return batch


def training_loop(
    run_dir: str,
    dataset,
    config: TrainConfig,
    total_kimg: Optional[int] = None,
    mesh=None,
    vgg_params=None,
    resume: Optional[str] = None,
    kimg_per_tick: Optional[int] = None,
    snapshot_ticks: Optional[int] = None,
    verbose: bool = True,
    abort_fn=None,
    progress_fn=None,
):
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "training_options.json"), "w") as f:
        f.write(to_json(config))

    total_kimg = total_kimg if total_kimg is not None else config.total_kimg
    kimg_per_tick = kimg_per_tick or config.kimg_per_tick
    snapshot_ticks = snapshot_ticks or config.network_snapshot_ticks

    use_mesh = mesh is not None and len(mesh.devices.flatten()) > 1
    axis_name = "data" if use_mesh else None
    trainer = GANTrainer(config, vgg_params=vgg_params, axis_name=axis_name)

    # Multi-host: each process decodes its rank-strided 1/world of the global
    # batch (reference InfiniteSampler striding, torch_utils/misc.py:115-146).
    rank, world = jax.process_index(), jax.process_count()
    is_main = rank == 0
    assert config.batch_size % world == 0, (config.batch_size, world)
    loader = InfiniteLoader(
        dataset, config.batch_size // world, seed=config.random_seed,
        rank=rank, world=world, num_workers=config.data_workers,
    )
    rng = jax.random.PRNGKey(config.random_seed)
    # device_get fails on non-fully-addressable (multi-host) arrays; read the
    # local replica instead
    get = jax.device_get if world == 1 else local_value

    # Init / resume.
    host_batch = next(loader)
    init_batch = jax.device_get(prepare_train_batch(host_batch, rng))
    # jitted: un-jitted init dispatches each op through the TPU transport
    # individually (minutes of per-op RTT on remote-tunnel backends)
    state = jax.jit(trainer.init_state)(rng, {k: v[:1] for k, v in init_batch.items()})
    if resume is not None:
        if os.path.isfile(resume):
            # transfer learning from a network pickle (reference resume_pkl,
            # training_loop_wo_flow_fullbody.py:280-285): name+shape-matching
            # params copy in, step/opt/controllers stay fresh
            from ..io.transfer import transfer_from_network_pickle

            state = transfer_from_network_pickle(state, resume, verbose=verbose)
        else:
            state = restore_train_state(resume, state)
            if verbose:
                print(f'Resumed from "{resume}" at step {int(jax.device_get(state.step))}')

    use_pl = config.loss.pl_weight > 0 and (config.g_reg_interval or 0) > 0
    if use_mesh:
        state = replicate(state, mesh)
        step_fn = make_sharded_train_step(trainer.train_step, mesh)
        r1_fn = make_sharded_train_step(trainer.d_r1_step, mesh)
        pl_fn = make_sharded_train_step(trainer.g_pl_step, mesh) if use_pl else None
    else:
        step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))
        r1_fn = jax.jit(trainer.d_r1_step, donate_argnums=(0,))
        pl_fn = jax.jit(trainer.g_pl_step, donate_argnums=(0,)) if use_pl else None

    collector = Collector()
    jsonl = JsonlLogger(os.path.join(run_dir, "stats.jsonl")) if is_main else None

    # Optional TensorBoard events (reference training loop :402-405,632-639).
    tb_writer = None
    if is_main:
        try:
            import tensorflow as _tf

            tb_writer = _tf.summary.create_file_writer(run_dir)
        except Exception:
            pass

    # Fixed snapshot batch for visual-regression grids (reference
    # setup_snapshot_image_grid, training loop :109-178,579-584).
    grid_n = min(16, config.batch_size, len(dataset))
    snap_host = collate([dataset[i] for i in range(grid_n)])
    snap_batch = jax.device_get(prepare_train_batch(snap_host, jax.random.PRNGKey(1234)))
    from ..utils import save_image_grid

    if is_main:
        save_image_grid(snap_batch["real_img"], os.path.join(run_dir, "reals.png"))
        save_image_grid(
            snap_batch["denorm_upper_img"], os.path.join(run_dir, "init_denorm_upper.png")
        )
        save_image_grid(
            snap_batch["denorm_lower_img"], os.path.join(run_dir, "init_denorm_lower.png")
        )
        save_image_grid(snap_batch["retain"], os.path.join(run_dir, "init_retain.png"))

    _snapshot_forward = None

    def save_fake_grid(state, tag):
        nonlocal _snapshot_forward
        if _snapshot_forward is None:
            gen = trainer.gen

            @jax.jit
            def fwd(g_params, b):
                img, ft, parsing = gen.apply(
                    g_params, None, b["style_input"], b["retain"], b["pose"],
                    b["denorm_upper_img"], b["denorm_lower_img"],
                    b["denorm_upper_mask"], b["denorm_lower_mask"],
                    noise_mode="const", rngs={"noise": jax.random.PRNGKey(0)},
                )
                return ft, parsing

            _snapshot_forward = fwd
        fakes, parsing = get(_snapshot_forward(local_value(state.g_ema_params), snap_batch))
        if is_main:
            save_image_grid(fakes, os.path.join(run_dir, f"fakes{tag}.png"))
            if parsing is not None:
                # predicted-parsing debug grid (reference util_functions
                # make_parts_shape palette, util_functions.py:11-79)
                from ..utils import parsing_to_rgb

                save_image_grid(
                    parsing_to_rgb(np.asarray(parsing)),
                    os.path.join(run_dir, f"parsing{tag}.png"),
                    drange=(0, 1),
                )

    # Cross-pair try-on matrix (reference setup_snapshot_image_grid,
    # `training_loop_wo_flow_fullbody.py:36-178`): gnum persons (rows) x gnum
    # garment providers (columns); the row range splits in thirds into
    # lower-swap / full-swap / upper-swap, so one PNG visualizes the actual
    # try-on behavior — not just reconstruction of the training batch.
    gnum = min(config.tryon_grid_n, grid_n)

    def save_tryon_grid(state, tag):
        if gnum < 2 or _snapshot_forward is None:
            return
        from ..data.dataset import prepare_tryon_grid_batch

        gap = max(gnum // 3, 1)
        params = local_value(state.g_ema_params)
        rows = []
        for r in range(gnum):
            person = {k: np.repeat(v[r : r + 1], gnum, axis=0) for k, v in snap_host.items()}
            garment = {k: v[:gnum] for k, v in snap_host.items()}
            swap = "lower" if r < gap else ("full" if r < 2 * gap else "upper")
            b = prepare_tryon_grid_batch(person, garment, swap=swap)
            rows.append(get(_snapshot_forward(params, b)[0]))
        if is_main:
            import numpy as _np

            save_image_grid(
                _np.concatenate(rows, axis=0),
                os.path.join(run_dir, f"tryon_grid{tag}.png"),
                grid_cols=gnum,
            )

    cur_nimg = int(get(state.step)) * config.batch_size
    cur_tick = 0
    tick_start_nimg = cur_nimg
    start_time = time.time()
    tick_start_time = start_time
    batch_idx = 0
    d_reg_interval = config.d_reg_interval or 0
    g_reg_interval = config.g_reg_interval or 0

    if verbose:
        print(f"Training for {total_kimg} kimg (batch {config.batch_size})...")

    while True:
        # Per-phase wall timing (reference `Timing/<phase>` telemetry via
        # training_stats.timer, training_loop...py:344-349,617-622).  The
        # G/D phases are fused into one jit here, so the visible phases are
        # data fetch+routing, the fused main step, and the lazy regularizers;
        # times are async-dispatch wall costs — the tick readback barrier
        # keeps them honest in aggregate (Timing/sec_per_tick is ground
        # truth; phase times show the host-side split).
        t_phase = time.time()
        host_batch = next(loader)
        # independent streams for PL vs R1 (a shared key correlated the two
        # regularizers' noise); data_rng folds in the process rank so random
        # erasure draws differ across hosts
        rng, data_rng, step_rng, r1_rng, pl_rng = jax.random.split(rng, 5)
        batch = prepare_train_batch(host_batch, jax.random.fold_in(data_rng, rank))
        if use_mesh:
            batch = shard_batch(jax.device_get(batch), mesh)
        t_data = time.time()

        state, stats = step_fn(state, batch, step_rng)
        t_main = time.time()
        t_greg = t_dreg = 0.0
        if pl_fn is not None and (batch_idx % g_reg_interval == 0):
            state, pl_stats = pl_fn(state, batch, pl_rng)
            stats = {**stats, **pl_stats}
            t_greg = time.time() - t_main
        if d_reg_interval and (batch_idx % d_reg_interval == 0):
            t0 = time.time()
            state, r1_stats = r1_fn(state, batch, r1_rng)
            stats = {**stats, **r1_stats}
            t_dreg = time.time() - t0
        collector.report_dict(get(stats))
        collector.report("Timing/data", t_data - t_phase)
        collector.report("Timing/Gmain_Dmain", t_main - t_data)
        if t_greg:
            collector.report("Timing/Greg", t_greg)
        if t_dreg:
            collector.report("Timing/Dreg", t_dreg)

        cur_nimg += config.batch_size
        batch_idx += 1

        done = cur_nimg >= total_kimg * 1000
        if abort_fn is not None and abort_fn():
            done = True
        if (not done) and (cur_tick != 0) and (cur_nimg < tick_start_nimg + kimg_per_tick * 1000):
            continue

        # ---- tick
        tick_end = time.time()
        collector.update()
        sec_per_tick = tick_end - tick_start_time
        sec_per_kimg = sec_per_tick / max((cur_nimg - tick_start_nimg) / 1000.0, 1e-8)
        if verbose and is_main:
            print(
                f"tick {cur_tick:<5d} kimg {cur_nimg / 1e3:<8.1f} "
                f"time {tick_end - start_time:<8.1f}s sec/tick {sec_per_tick:<7.1f} "
                f"sec/kimg {sec_per_kimg:<7.2f} "
                f"augment {collector.mean('Progress/augment_p'):.3f} "
                f"G/loss {collector.mean('Loss/G/loss'):.3f} "
                f"D/loss {collector.mean('Loss/D/loss'):.3f}"
            )
        if jsonl is not None:
            jsonl.write(
                collector,
                **{
                    "Progress/tick": cur_tick,
                    "Progress/kimg": cur_nimg / 1e3,
                    "Timing/sec_per_tick": sec_per_tick,
                    "Timing/sec_per_kimg": sec_per_kimg,
                    "Timing/total_sec": tick_end - start_time,
                },
            )
        if tb_writer is not None:
            with tb_writer.as_default():
                import tensorflow as _tf

                for name in collector.names():
                    _tf.summary.scalar(name, collector.mean(name), step=cur_nimg)
                _tf.summary.scalar("Timing/sec_per_kimg", sec_per_kimg, step=cur_nimg)
            tb_writer.flush()
        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, total_kimg)

        img_ticks = config.image_snapshot_ticks
        if img_ticks and (done or cur_tick % img_ticks == 0):
            save_fake_grid(state, f"{cur_nimg // 1000:06d}")
            save_tryon_grid(state, f"{cur_nimg // 1000:06d}")

        if snapshot_ticks and (done or cur_tick % snapshot_ticks == 0) and cur_tick > 0:
            if use_mesh:
                # reference misc.check_ddp_consistency before every snapshot
                from ..parallel.mesh import check_replication_consistency

                check_replication_consistency(state.g_params, mesh)
                check_replication_consistency(state.d_params, mesh)
            snap_dir = os.path.join(run_dir, f"network-snapshot-{cur_nimg // 1000:06d}")
            if is_main:
                save_snapshot(
                    snap_dir,
                    get(state.g_ema_params),
                    get(state.w_avg),
                    to_json(config),
                )
                save_train_state(
                    os.path.join(run_dir, "train-state-latest"), local_value(state)
                )
            if verbose and is_main:
                print(f"  saved {snap_dir}")

        cur_tick += 1
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()
        if done:
            break

    if jsonl is not None:
        jsonl.close()
    return state

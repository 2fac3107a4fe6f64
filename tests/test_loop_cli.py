"""Regression net for the training loop and the inference CLIs (VERDICT r1
weak #8): a real 2-tick training_loop run over the synthetic dataset with
snapshot + resume + jsonl assertions, and smoke runs of cli.test /
cli.test_512 against a saved snapshot."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration scale; run with `-m slow` or no marker filter

import jax

from pasta_gan_tpu.data.dataset import SyntheticUvitonDataset
from pasta_gan_tpu.runtime.config import (
    AdaConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)
from pasta_gan_tpu.train.loop import training_loop


def _loop_config():
    return TrainConfig(
        model=ModelConfig(
            img_resolution=256, channel_base=256, channel_max=32,
            mbstd_group_size=2, mapping_layers=1,
        ),
        loss=LossConfig(l1_weight=40.0, vgg_weight=0.0, mask_weight=20.0, r1_gamma=10.0),
        ada=AdaConfig(enabled=False),
        batch_size=4,
        ema_kimg=10.0,
        kimg_per_tick=1,  # overridden via the call below
        image_snapshot_ticks=1,
        network_snapshot_ticks=1,
        data_workers=2,
    )


@pytest.mark.slow
def test_training_loop_ticks_snapshot_resume(tmp_path):
    run_dir = str(tmp_path / "run")
    ds = SyntheticUvitonDataset(num_samples=6)
    cfg = _loop_config()

    state = training_loop(
        run_dir, ds, cfg,
        total_kimg=0.016,       # 16 imgs = 4 steps
        kimg_per_tick=0.008,    # 2 steps per tick -> 2+ ticks
        snapshot_ticks=1,
        verbose=False,
    )
    step1 = int(np.asarray(jax.device_get(state.step)))
    assert step1 == 4

    # artifacts: stats.jsonl rows, image grids, a network snapshot, train state
    with open(os.path.join(run_dir, "stats.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert len(rows) >= 2
    assert any("Loss/G/loss" in r for r in rows)
    assert os.path.exists(os.path.join(run_dir, "reals.png"))
    assert any(f.startswith("fakes") for f in os.listdir(run_dir))
    # cross-pair try-on swap matrix (reference setup_snapshot_image_grid)
    tryon = [f for f in os.listdir(run_dir) if f.startswith("tryon_grid")]
    assert tryon, os.listdir(run_dir)
    import PIL.Image

    g = np.asarray(PIL.Image.open(os.path.join(run_dir, tryon[0])))
    n = min(cfg.tryon_grid_n, min(16, cfg.batch_size, 6))
    assert g.shape[:2] == (n * 256, n * 256)
    snaps = [f for f in os.listdir(run_dir) if f.startswith("network-snapshot-")]
    assert snaps, os.listdir(run_dir)
    assert os.path.isdir(os.path.join(run_dir, "train-state-latest"))
    with open(os.path.join(run_dir, "training_options.json")) as f:
        assert json.load(f)["batch_size"] == 4

    # resume: picks up optimizer state + step and continues
    run_dir2 = str(tmp_path / "run2")
    state2 = training_loop(
        run_dir2, ds, cfg,
        total_kimg=0.024,
        kimg_per_tick=0.008,
        snapshot_ticks=1,
        resume=os.path.join(run_dir, "train-state-latest"),
        verbose=False,
    )
    step2 = int(np.asarray(jax.device_get(state2.step)))
    assert step2 == 6  # 4 resumed + 2 more (24 imgs total at batch 4)


@pytest.mark.slow
def test_cli_test_and_512_smoke(tmp_path):
    """cli.test and cli.test_512 end-to-end over the synthetic fixture."""
    import jax.numpy as jnp

    from pasta_gan_tpu.cli import test as cli_test
    from pasta_gan_tpu.cli import test_512 as cli_test_512
    from pasta_gan_tpu.io.checkpoints import save_snapshot
    from pasta_gan_tpu.models import GeneratorFull, Generator512

    rng = jax.random.PRNGKey(0)
    B, res = 1, 64

    # --- GeneratorFull snapshot for cli.test
    gen = GeneratorFull(img_resolution=256, channel_base=256, channel_max=32,
                        mapping_layers=1)
    variables = gen.init(
        {"params": rng, "noise": rng},
        None,
        jnp.zeros((B, 256, 256, 42)), jnp.zeros((B, 256, 256, 3)),
        jnp.zeros((B, 256, 256, 6)),
        jnp.zeros((B, 256, 256, 3)), jnp.zeros((B, 256, 256, 3)),
        jnp.zeros((B, 256, 256, 1)), jnp.zeros((B, 256, 256, 1)),
        noise_mode="none",
    )
    cfg = dict(model=dict(img_resolution=256, channel_base=256, channel_max=32,
                          mapping_layers=1, conv_clamp=256.0))
    snap = str(tmp_path / "snap_full")
    save_snapshot(snap, variables, np.zeros((512,), np.float32), json.dumps(cfg))

    out = str(tmp_path / "out_test")
    cli_test.main(["--network", snap, "--synthetic", "2", "--outdir", out,
                   "--batchsize", "2"])
    assert len(os.listdir(out)) >= 1

    # int8 serving mode: calibrate-then-freeze flow produces finite images
    out_q = str(tmp_path / "out_test_q")
    cli_test.main(["--network", snap, "--synthetic", "2", "--outdir", out_q,
                   "--batchsize", "2", "--quant", "int8_static",
                   "--calib_batches", "1"])
    assert sorted(os.listdir(out_q)) == sorted(os.listdir(out))

    # data-parallel serving over the 8 virtual devices (ragged tail padded
    # to the global batch); per-image outputs must match the single-device
    # run bit-for-near (conv reduction orders differ across shardings)
    out_dp = str(tmp_path / "out_test_dp")
    cli_test.main(["--network", snap, "--synthetic", "2", "--outdir", out_dp,
                   "--batchsize", "8", "--dp"])
    assert sorted(os.listdir(out_dp)) == sorted(os.listdir(out))
    import PIL.Image

    for f in os.listdir(out):
        a = np.asarray(PIL.Image.open(os.path.join(out, f)), np.float32)
        b = np.asarray(PIL.Image.open(os.path.join(out_dp, f)), np.float32)
        assert np.mean(np.abs(a - b)) < 1.5, f  # uint8 LSB-level agreement

    # --- Generator512 snapshot for cli.test_512 (at reduced resolution)
    g512 = Generator512(img_resolution=256, channel_base=2048, channel_max=64,
                        mapping_layers=1, style_input_nc=45)
    v512 = g512.init(
        {"params": rng, "noise": rng},
        None,
        jnp.zeros((B, 64, 64, 45)), jnp.zeros((B, 256, 256, 3)),
        jnp.zeros((B, 256, 256, 6)),
        jnp.zeros((B, 256, 256, 3)), jnp.zeros((B, 256, 256, 3)),
        jnp.zeros((B, 256, 256, 1)), jnp.zeros((B, 256, 256, 1)),
        noise_mode="none",
    )
    cfg512 = dict(model=dict(img_resolution=256, channel_base=2048, channel_max=64,
                             mapping_layers=1, style_input_nc=45, conv_clamp=256.0))
    snap512 = str(tmp_path / "snap_512")
    save_snapshot(snap512, v512, np.zeros((512,), np.float32), json.dumps(cfg512))

    out512 = str(tmp_path / "out_512")
    cli_test_512.main(["--network", snap512, "--synthetic", "2", "--outdir", out512,
                       "--batchsize", "2", "--change_region", "lowerbody"])
    assert len(os.listdir(out512)) == 2

    # data-parallel 512 serving over the 8 virtual devices (padded tail)
    out512_dp = str(tmp_path / "out_512_dp")
    cli_test_512.main(["--network", snap512, "--synthetic", "2",
                       "--outdir", out512_dp, "--batchsize", "8", "--dp",
                       "--change_region", "lowerbody"])
    assert sorted(os.listdir(out512_dp)) == sorted(os.listdir(out512))

    # --- PPL through the metrics CLI on the same GeneratorFull snapshot
    # (w-space pairs from mapped style codes; proxy distance; 4 samples)
    from pasta_gan_tpu.cli import calc_metrics as cli_metrics

    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli_metrics.main(["--metrics", "ppl2_wend", "--network", snap,
                          "--synthetic", "4", "--batch", "2",
                          "--ppl_samples", "4", "--run_dir", str(tmp_path)])
    row = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(row["results"]["ppl2_wend"])
    assert os.path.exists(os.path.join(str(tmp_path), "metric-ppl2_wend.jsonl"))

"""Training-step benchmark: full G+D step (optionally + ADA / + R1) on the
config of record (256px GeneratorFull + VGG losses, batch 8 — matching the
reference `train.sh` per-GPU load of 12 and BASELINE.md's round-2 protocol).

Usage:
    python scripts/bench_train_step.py [--dtype float32|bfloat16] [--ada]
        [--batch 8] [--iters 8] [--fast-geom]

Prints one JSON line.  Measurement protocol per .claude/skills/verify:
force a scalar readback per iteration (the axon relay's block_until_ready is
not a reliable barrier), discard iteration 0, report the median.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--ada", action="store_true")
    ap.add_argument("--fast-geom", action="store_true",
                    help="use the shear-decomposed fast ADA warp")
    ap.add_argument("--stack", action="store_true",
                    help="stack the per-loss ADA+D calls into one batched call")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    from pasta_gan_tpu.runtime.config import (
        AdaConfig,
        LossConfig,
        ModelConfig,
        TrainConfig,
    )
    from pasta_gan_tpu.train.step import GANTrainer
    from pasta_gan_tpu.train.vgg import init_vgg19

    cfg = TrainConfig(
        model=ModelConfig(
            img_resolution=args.res,
            channel_base=16384,
            channel_max=512,
            mbstd_group_size=4,
            mapping_layers=1,
        ),
        loss=LossConfig(l1_weight=40.0, vgg_weight=40.0, mask_weight=20.0, r1_gamma=10.0),
        ada=AdaConfig(enabled=args.ada, fast_geom=args.fast_geom,
                      stack_calls=args.stack),
        batch_size=args.batch,
        compute_dtype=args.dtype,
    )
    trainer = GANTrainer(cfg, vgg_params=init_vgg19(jax.random.PRNGKey(7)))

    N, res = args.batch, args.res
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    batch = {
        "real_img": jax.random.normal(k[0], (N, res, res, 3)),
        "style_input": jax.random.normal(k[1], (N, res, res, 42)),
        "retain": jax.random.normal(k[2], (N, res, res, 3)),
        "pose": jax.random.normal(k[3], (N, res, res, 6)),
        "denorm_upper_img": jax.random.normal(k[4], (N, res, res, 3)),
        "denorm_lower_img": jax.random.normal(k[5], (N, res, res, 3)),
        "denorm_upper_mask": (jax.random.uniform(k[6], (N, res, res, 1)) > 0.5).astype(jnp.float32),
        "denorm_lower_mask": (jax.random.uniform(k[7], (N, res, res, 1)) > 0.5).astype(jnp.float32),
        "gt_parsing": jax.random.randint(k[0], (N, res, res), 0, 6),
    }
    batch = jax.device_put(batch)

    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.train_step, donate_argnums=(0,))

    times = []
    for i in range(args.iters + 1):
        rng = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        state, stats = step(state, batch, rng)
        # scalar readback forces completion through the relay
        _ = float(jax.device_get(stats["Loss/G/loss"]))
        dt = time.perf_counter() - t0
        if i > 0:  # discard compile + flush iteration
            times.append(dt)
        print(f"iter {i}: {dt * 1e3:.1f} ms", file=sys.stderr)

    times.sort()
    med = times[len(times) // 2]
    print(json.dumps({
        "metric": "train_step_ms",
        "value": round(med * 1e3, 1),
        "unit": "ms/step",
        "batch": N,
        "dtype": args.dtype,
        "ada": args.ada,
        "fast_geom": args.fast_geom,
        "stack": args.stack,
        "imgs_per_sec": round(N / med, 1),
    }))


if __name__ == "__main__":
    main()

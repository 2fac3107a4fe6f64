"""Fixed-seed quality-regression smoke benchmark (VERDICT r2 next-round #6).

Without the reference detector weights (no egress), absolute FID is
unmeasurable — this script records a REPRODUCIBLE proxy so quality drift is
at least monitored round over round:

  synthetic fixture (fixed seed) -> train K steps of the config-of-record
  losses at small scale -> generate the training set back ->
  * fid_proxy   : FID formula under the deterministic SimpleConvFeatures
                  extractor (NOT comparable to reference FID numbers)
  * recon_l1    : mean |G(x) - real| over the fixture
  * psnr        : of the finetune output vs real

Usage:  python scripts/quality_regression.py [--steps 30] [--samples 32]
Prints one JSON line; record it in BASELINE.md each round.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--channel_base", type=int, default=4096)
    ap.add_argument("--channel_max", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ada", choices=["off", "exact", "fast"], default="off",
                    help="ADA mode for the regression run: 'exact' = the "
                    "single-pass reference-parity warp, 'fast' = the "
                    "fast_geom two-pass warp + stack_calls (the round-4 "
                    "default candidate).  Runs use a FIXED augment p "
                    "(--ada_p) so short runs exercise the pipe at all "
                    "(the adaptive controller would hold p~0 for 10s of "
                    "steps).")
    ap.add_argument("--ada_p", type=float, default=0.3)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    ap.add_argument("--seed_offset", type=int, default=0,
                    help="offset the per-step train RNG seeds: two exact runs "
                    "at different offsets give the noise scale that |fast - "
                    "exact| must stay within")
    ap.add_argument("--quant", choices=["int8", "int8_static"], default=None,
                    help="also evaluate the int8 serving mode (ops/quant.py): "
                    "reports fid_proxy_quant + pixel delta vs the fp forward")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pasta_gan_tpu.data.dataset import (
        SyntheticUvitonDataset,
        collate,
        prepare_train_batch,
    )
    from pasta_gan_tpu.metrics.extractors import SimpleConvFeatures
    from pasta_gan_tpu.metrics.formulas import fid_from_stats
    from pasta_gan_tpu.runtime.config import (
        AdaConfig,
        LossConfig,
        ModelConfig,
        TrainConfig,
    )
    from pasta_gan_tpu.train.step import GANTrainer

    cfg = TrainConfig(
        model=ModelConfig(
            img_resolution=args.res, channel_base=args.channel_base,
            channel_max=args.channel_max,
            mbstd_group_size=min(4, args.batch), mapping_layers=2,
        ),
        loss=LossConfig(l1_weight=40.0, vgg_weight=0.0, mask_weight=20.0, r1_gamma=10.0),
        ada=AdaConfig(
            enabled=args.ada != "off",
            # fixed p: initial_p with an effectively-frozen controller
            initial_p=args.ada_p,
            kimg=10**9,
            fast_geom=args.ada == "fast",
            stack_calls=args.ada == "fast",
        ),
        compute_dtype=args.dtype,
        batch_size=args.batch,
    )
    ds = SyntheticUvitonDataset(num_samples=args.samples, resolution=args.res, seed=123)
    trainer = GANTrainer(cfg)

    host = collate([ds[i] for i in range(args.samples)])
    batches = []
    for i in range(0, args.samples, args.batch):
        hb = {k: v[i : i + args.batch] for k, v in host.items()}
        batches.append(jax.device_get(prepare_train_batch(hb, jax.random.PRNGKey(i))))

    # jit the init: un-jitted dispatch through the axon TPU tunnel pays
    # ~per-op RTT and takes minutes (verify-skill round-2 lesson)
    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(0), batches[0])
    step = jax.jit(trainer.train_step, donate_argnums=(0,))
    t0 = time.time()
    for it in range(args.steps):
        state, stats = step(
            state, batches[it % len(batches)],
            jax.random.PRNGKey(100 + args.seed_offset + it),
        )
    jax.block_until_ready(state.g_params)
    train_s = time.time() - t0

    gen = trainer.gen

    @jax.jit
    def fwd(params, b):
        img, ft, _ = gen.apply(
            params, None, b["style_input"], b["retain"], b["pose"],
            b["denorm_upper_img"], b["denorm_lower_img"],
            b["denorm_upper_mask"], b["denorm_lower_mask"],
            noise_mode="const", rngs={"noise": jax.random.PRNGKey(0)},
        )
        return ft

    params = state.g_ema_params
    fakes, reals = [], []
    for b in batches:
        fakes.append(np.asarray(jax.device_get(fwd(params, b))))
        reals.append(np.asarray(b["real_img"]))
    fakes = np.concatenate(fakes)
    reals = np.concatenate(reals)

    l1 = float(np.mean(np.abs(fakes - reals)))
    mse = float(np.mean((fakes - reals) ** 2))
    psnr = float(10.0 * np.log10(4.0 / max(mse, 1e-12)))  # drange [-1,1] peak 2

    extractor = SimpleConvFeatures(seed=0)
    to_u8 = lambda x: np.clip((x + 1) * 127.5, 0, 255).astype(np.uint8)
    f_real = extractor(to_u8(reals))
    f_fake = extractor(to_u8(fakes))
    mu_r, cov_r = f_real.mean(0), np.cov(f_real, rowvar=False)
    mu_f, cov_f = f_fake.mean(0), np.cov(f_fake, rowvar=False)
    fid_proxy = float(fid_from_stats(mu_r, cov_r, mu_f, cov_f))

    out = {
        "metric": "fid_proxy",
        "value": round(fid_proxy, 3),
        "unit": "simpleconv-fid (NOT reference-comparable)",
        "recon_l1": round(l1, 4),
        "psnr_db": round(psnr, 2),
        "steps": args.steps,
        "samples": args.samples,
        "train_s": round(train_s, 1),
        "ada": args.ada,
        "dtype": args.dtype,
        "seed_offset": args.seed_offset,
    }

    if args.quant:
        # int8 serving-mode quality delta vs the fp forward on the same params
        gen_q = gen.clone(quant="int8" if args.quant == "int8" else "int8_static")
        if args.quant == "int8_static":
            gen_c = gen.clone(quant="int8_calib")

            @jax.jit
            def calib(v, b):
                _, mut = gen_c.apply(
                    v, None, b["style_input"], b["retain"], b["pose"],
                    b["denorm_upper_img"], b["denorm_lower_img"],
                    b["denorm_upper_mask"], b["denorm_lower_mask"],
                    noise_mode="const", rngs={"noise": jax.random.PRNGKey(0)},
                    mutable=["quant_scales"],
                )
                return mut["quant_scales"]

            v = dict(params)
            for b in batches:
                v["quant_scales"] = calib(v, b)
            params_q = v
        else:
            params_q = params

        @jax.jit
        def fwd_q(p, b):
            img, ft, _ = gen_q.apply(
                p, None, b["style_input"], b["retain"], b["pose"],
                b["denorm_upper_img"], b["denorm_lower_img"],
                b["denorm_upper_mask"], b["denorm_lower_mask"],
                noise_mode="const", rngs={"noise": jax.random.PRNGKey(0)},
            )
            return ft

        fakes_q = np.concatenate(
            [np.asarray(jax.device_get(fwd_q(params_q, b))) for b in batches])
        f_q = extractor(to_u8(fakes_q))
        mu_q, cov_q = f_q.mean(0), np.cov(f_q, rowvar=False)
        out["fid_proxy_quant"] = round(float(fid_from_stats(mu_r, cov_r, mu_q, cov_q)), 3)
        out["quant_pixel_l1"] = round(float(np.mean(np.abs(fakes_q - fakes))), 4)
        out["quant_mode"] = args.quant

    print(json.dumps(out))


if __name__ == "__main__":
    main()

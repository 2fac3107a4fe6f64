"""Score every network snapshot of a training run on a fixed eval set.

The quality trajectory a real training run should show (VERDICT r3 #1):
for each `network-snapshot-*` in RUN_DIR, rebuild the generator from the
snapshot's own config.json, run the training-style forward over a FIXED
synthetic eval set, and report fid_proxy / recon_l1 / psnr per snapshot —
one JSON line each, oldest first.  fid_proxy uses the same deterministic
SimpleConvFeatures extractor as scripts/quality_regression.py (NOT
comparable to reference FID; comparable across snapshots and rounds).

Usage: python scripts/eval_run_snapshots.py RUN_DIR [--samples 64] [--batch 8]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=123, help="eval fixture seed "
                    "(123 = the quality_regression fixture, held out from "
                    "the training run's seed-0 fixture)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pasta_gan_tpu.data.dataset import (
        SyntheticUvitonDataset, collate, prepare_train_batch)
    from pasta_gan_tpu.io.checkpoints import load_snapshot
    from pasta_gan_tpu.metrics.extractors import SimpleConvFeatures
    from pasta_gan_tpu.metrics.formulas import fid_from_stats
    from pasta_gan_tpu.models import GeneratorFull

    snaps = sorted(glob.glob(os.path.join(args.run_dir, "network-snapshot-*")))
    if not snaps:
        raise SystemExit(f"no network-snapshot-* under {args.run_dir}")

    ds = SyntheticUvitonDataset(num_samples=args.samples, seed=args.seed)
    host = collate([ds[i] for i in range(args.samples)])
    batches = []
    for i in range(0, args.samples, args.batch):
        hb = {k: v[i : i + args.batch] for k, v in host.items()}
        batches.append(jax.device_get(prepare_train_batch(hb, jax.random.PRNGKey(i))))
    reals = np.concatenate([b["real_img"] for b in batches])

    extractor = SimpleConvFeatures(seed=0)
    to_u8 = lambda x: np.clip((x + 1) * 127.5, 0, 255).astype(np.uint8)
    f_real = extractor(to_u8(reals))
    mu_r, cov_r = f_real.mean(0), np.cov(f_real, rowvar=False)

    fwd = None
    for snap in snaps:
        params, w_avg, config = load_snapshot(snap)
        mc = config.get("model", {})
        gen = GeneratorFull(
            z_dim=mc.get("z_dim", 0), c_dim=mc.get("c_dim", 512),
            w_dim=mc.get("w_dim", 512),
            img_resolution=mc.get("img_resolution", 256),
            channel_base=mc.get("channel_base", 16384),
            channel_max=mc.get("channel_max", 512),
            mapping_layers=mc.get("mapping_layers", 1),
            conv_clamp=mc.get("conv_clamp", 256.0),
            style_input_nc=mc.get("style_input_nc", 42),
        )
        if fwd is None:
            @jax.jit
            def fwd(p, b):
                img, ft, _ = gen.apply(
                    p, None, b["style_input"], b["retain"], b["pose"],
                    b["denorm_upper_img"], b["denorm_lower_img"],
                    b["denorm_upper_mask"], b["denorm_lower_mask"],
                    noise_mode="const", rngs={"noise": jax.random.PRNGKey(0)},
                )
                return ft

        fakes = np.concatenate(
            [np.asarray(jax.device_get(fwd(params, b))) for b in batches])
        l1 = float(np.mean(np.abs(fakes - reals)))
        mse = float(np.mean((fakes - reals) ** 2))
        psnr = float(10.0 * np.log10(4.0 / max(mse, 1e-12)))
        f_fake = extractor(to_u8(fakes))
        mu_f, cov_f = f_fake.mean(0), np.cov(f_fake, rowvar=False)
        fid = float(fid_from_stats(mu_r, cov_r, mu_f, cov_f))
        print(json.dumps({
            "snapshot": os.path.basename(snap),
            "fid_proxy": round(fid, 3),
            "recon_l1": round(l1, 4),
            "psnr_db": round(psnr, 2),
            "samples": args.samples,
        }), flush=True)


if __name__ == "__main__":
    main()

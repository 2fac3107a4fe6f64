"""256x192 unpaired try-on inference CLI (reference `test.py`).

Loads a network snapshot (G_ema), iterates person/garment pairs, routes the
garment patches into the person's pose on-device, synthesizes, un-pads the
256x256 canvas back to 256x192, and writes `person__garment.png` files.

  python -m pasta_gan_tpu.cli.test --network runs/.../network-snapshot-000123 \\
      --dataroot /data/UPT_test --outdir ./test_results --batchsize 16

Use --synthetic N for a data-free smoke run.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def save_image(arr: np.ndarray, path: str) -> None:
    import PIL.Image

    img = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    PIL.Image.fromarray(img).save(path)


def calibrate_int8_static(ctor, variables, w_avg, truncation_psi, batches):
    """int8_static serving: fold per-site activation amax over calibration
    batches (ops/quant.py int8_calib mode) through the try-on forward path,
    returning variables with the frozen "quant_scales" collection merged in."""
    from ..models import cat_feats_dict

    if not batches:
        raise SystemExit(
            "--quant int8_static: no calibration batches could be built "
            "(empty pairs list — check --dataroot / --synthetic)"
        )

    gen_c = ctor(quant="int8_calib")

    @jax.jit
    def calib_step(variables, batch):
        # Flax returns the FULL mutated collection each apply (fresh updates
        # plus every untouched entry carried from the input), so the three
        # sub-network applies must be CHAINED — a shallow merge of the three
        # returned collections lets the last apply's stale carried copies of
        # the encoder subtrees clobber the first two applies' fresh
        # running-amax folds on every calibration batch after the first.
        (stylecode, feats), m1 = gen_c.apply(
            variables, batch["style_input"], batch["retain"],
            method=gen_c.encode_style, mutable=["quant_scales"],
        )
        v1 = {**variables, **m1}
        pose_feat, m2 = gen_c.apply(
            v1, batch["pose"], method=gen_c.encode_pose,
            mutable=["quant_scales"],
        )
        v2 = {**variables, **m2}
        ws, _ = gen_c.apply(
            variables, None, stylecode,
            w_avg=w_avg, truncation_psi=truncation_psi, method=gen_c.map_ws,
        )
        _, m3 = gen_c.apply(
            v2, ws, pose_feat, cat_feats_dict(feats),
            batch["denorm_upper_img"], batch["denorm_lower_img"],
            batch["denorm_upper_mask"], batch["denorm_lower_mask"],
            method=gen_c.synthesize, noise_mode="none",
            mutable=["quant_scales"],
        )
        return m3["quant_scales"]

    v = dict(variables)
    for b in batches:
        v["quant_scales"] = calib_step(v, b)
    return v


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network", required=True, help="network snapshot dir")
    p.add_argument("--dataroot", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--outdir", required=True)
    p.add_argument("--batchsize", type=int, default=16)
    p.add_argument("--truncation_psi", type=float, default=1.0)
    p.add_argument(
        "--generator", choices=["full", "v18"], default="full",
        help="full: this framework's training target (42-ch styles); "
        "v18: the released-256 checkpoint interface (60-ch norm+stickman "
        "styles, reference test.py:121-128)",
    )
    p.add_argument(
        "--quant", choices=["int8", "int8_static"], default=None,
        help="int8 serving mode (ops/quant.py): 'int8' = dynamic per-sample "
        "activation scales; 'int8_static' = calibrate activation scales on "
        "the first --calib_batches batches, then serve with frozen scales "
        "(fastest). Quantization error ~1e-2 relative; see "
        "scripts/quality_regression.py --quant for the quality delta.",
    )
    p.add_argument("--calib_batches", type=int, default=2,
                   help="batches used to calibrate int8_static scales")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel serving over ALL local devices "
                   "(jax.sharding mesh; --batchsize must divide by the "
                   "device count — the global batch is split across chips)")
    args = p.parse_args(argv)

    os.makedirs(args.outdir, exist_ok=True)

    from ..data.dataset import (
        SyntheticUvitonDataset,
        UvitonDataset256Test,
        collate,
        prepare_tryon_batch,
        prepare_tryon_batch_v18,
    )
    from ..io.checkpoints import load_snapshot
    from ..models import GeneratorFull, GeneratorV18, cat_feats_dict
    from ..runtime.config import ModelConfig

    g_ema_params, w_avg, config = load_snapshot(args.network)
    mc = config.get("model", {})
    common = dict(
        z_dim=mc.get("z_dim", 0),
        c_dim=mc.get("c_dim", 512),
        w_dim=mc.get("w_dim", 512),
        img_resolution=mc.get("img_resolution", 256),
        channel_base=mc.get("channel_base", 16384),
        channel_max=mc.get("channel_max", 512),
        mapping_layers=mc.get("mapping_layers", 1),
        conv_clamp=mc.get("conv_clamp", 256.0),
    )
    if args.generator == "v18":
        ctor = lambda **kw: GeneratorV18(
            style_input_nc=mc.get("style_input_nc", 60), **common, **kw)
        prepare = prepare_tryon_batch_v18
    else:
        ctor = lambda **kw: GeneratorFull(
            style_input_nc=mc.get("style_input_nc", 42), **common, **kw)
        prepare = prepare_tryon_batch
    gen = ctor(quant=args.quant)
    w_avg = jnp.asarray(w_avg)

    def forward_impl(variables, batch):
        """Mirrors test.py:118-128: explicit style/const/mapping/synthesis calls."""
        stylecode, feats = gen.apply(
            variables, batch["style_input"], batch["retain"], method=gen.encode_style
        )
        pose_feat = gen.apply(variables, batch["pose"], method=gen.encode_pose)
        ws, _ = gen.apply(
            variables, None, stylecode,
            w_avg=w_avg, truncation_psi=args.truncation_psi,
            method=gen.map_ws,
        )
        out = gen.apply(
            variables,
            ws,
            pose_feat,
            cat_feats_dict(feats),
            batch["denorm_upper_img"],
            batch["denorm_lower_img"],
            batch["denorm_upper_mask"],
            batch["denorm_lower_mask"],
            method=gen.synthesize,
            noise_mode="none",
        )
        return out[1]  # finetune image (both interfaces)

    if args.dp:
        # data-parallel serving: one mesh over every local device; variables
        # replicate, the global batch splits on the data axis.  shard_map
        # (not bare jit sharding) so the routing Pallas kernels run
        # per-device blocks instead of relying on the SPMD partitioner to
        # split custom calls.
        from jax.sharding import PartitionSpec as PS

        from ..parallel.mesh import DATA_AXIS, data_parallel_mesh

        mesh = data_parallel_mesh()
        n_dev = len(mesh.devices.ravel())
        if args.batchsize % n_dev:
            raise SystemExit(
                f"--dp: --batchsize {args.batchsize} must divide by the "
                f"{n_dev} local devices"
            )
        forward = jax.jit(
            jax.shard_map(
                forward_impl, mesh=mesh,
                in_specs=(PS(), PS(DATA_AXIS)), out_specs=PS(DATA_AXIS),
                check_vma=False,
            )
        )
    else:
        forward = jax.jit(forward_impl)

    if args.synthetic:
        ds = SyntheticUvitonDataset(num_samples=args.synthetic)
        pairs = [(ds[i], ds[(i + 1) % len(ds)], f"s{i}.jpg", f"s{(i + 1) % len(ds)}.jpg")
                 for i in range(len(ds))]
    else:
        if args.dataroot is None:
            raise SystemExit("--dataroot or --synthetic required")
        test_ds = UvitonDataset256Test(args.dataroot)
        pairs = [
            (r["person"], r["garment"], r["person_name"], r["garment_name"])
            for r in (test_ds[i] for i in range(len(test_ds)))
        ]

    B = args.batchsize
    variables = g_ema_params
    if args.quant == "int8_static":
        calib_batches = []
        for i in range(0, min(len(pairs), args.calib_batches * B), B):
            chunk = pairs[i : i + B]
            calib_batches.append(prepare(collate([c[0] for c in chunk]),
                                         collate([c[1] for c in chunk])))
        variables = calibrate_int8_static(
            ctor, variables, w_avg, args.truncation_psi, calib_batches)
        print(f"calibrated int8 activation scales on {len(calib_batches)} batches")
    if args.dp:
        from ..parallel.mesh import replicate, shard_batch

        variables = replicate(variables, mesh)
    n_written = 0
    for i in range(0, len(pairs), B):
        chunk = pairs[i : i + B]
        person = collate([c[0] for c in chunk])
        garment = collate([c[1] for c in chunk])
        batch = prepare(person, garment)
        if args.dp:
            if len(chunk) < B:  # pad the ragged tail to the full global batch
                pad = B - len(chunk)
                batch = {
                    k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)])
                    for k, v in batch.items()
                }
            batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
        out = np.asarray(jax.device_get(forward(variables, batch)), np.float32)
        for j, (_, _, pname, gname) in enumerate(chunk):
            # un-pad 256x256 -> 256x192 (test.py:130-150 crop [:, 32:224])
            img = out[j][:, 32:224, :]
            name = f"{os.path.basename(pname).split('.')[0]}__{os.path.basename(gname).split('.')[0]}.png"
            save_image(img, os.path.join(args.outdir, name))
            n_written += 1
    print(f"wrote {n_written} try-on images to {args.outdir}")


if __name__ == "__main__":
    main()

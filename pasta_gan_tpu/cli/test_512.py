"""512x320 region-selectable try-on inference CLI (reference `test_512.py`).

Drives Generator512 over `UvitonDataset512Test` with
`--change_region {fullbody,upperbody,lowerbody}` selecting which garment
pieces route (reference `dataset.py:1679-1692`): the region picks which
keypoints (garment's vs person's) build the norm transforms and which
images feed the upper/lower patch sources — implemented exactly in
`data.warp.route_patches_512_batch` (vs reference `normalize_full/upper/
lower`, dataset.py:1967-2194).  Output is triptych strips
garment|person|result (`test_512.py:180-187`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from .test import calibrate_int8_static, save_image


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network", required=True)
    p.add_argument("--dataroot", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--outdir", required=True)
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--change_region", default="fullbody",
                   choices=["fullbody", "upperbody", "lowerbody"])
    p.add_argument("--truncation_psi", type=float, default=1.0)
    p.add_argument(
        "--quant", choices=["int8", "int8_static"], default=None,
        help="int8 serving mode (ops/quant.py); int8_static calibrates "
        "activation scales on the first --calib_batches batches",
    )
    p.add_argument("--calib_batches", type=int, default=2)
    p.add_argument("--dp", action="store_true",
                   help="data-parallel serving over ALL local devices "
                   "(--batchsize must divide by the device count)")
    args = p.parse_args(argv)

    os.makedirs(args.outdir, exist_ok=True)

    from ..data.dataset import (
        SyntheticUvitonDataset,
        UvitonDataset512Test,
        collate,
        prepare_tryon_batch_512,
    )
    from ..io.checkpoints import load_snapshot
    from ..models import Generator512, cat_feats_dict

    g_ema_params, w_avg, config = load_snapshot(args.network)
    mc = config.get("model", {})
    res = mc.get("img_resolution", 512)
    ctor = lambda **kw: Generator512(
        img_resolution=res,
        channel_base=mc.get("channel_base", 32768),
        channel_max=mc.get("channel_max", 512),
        mapping_layers=mc.get("mapping_layers", 1),
        conv_clamp=mc.get("conv_clamp", 256.0),
        style_input_nc=mc.get("style_input_nc", 45),
        **kw,
    )
    gen = ctor(quant=args.quant)
    w_avg = jnp.asarray(w_avg)

    def forward_impl(variables, batch):
        stylecode, feats = gen.apply(
            variables, batch["style_input"], batch["retain"], method=gen.encode_style
        )
        pose_feat = gen.apply(variables, batch["pose"], method=gen.encode_pose)
        ws, _ = gen.apply(
            variables, None, stylecode, w_avg=w_avg,
            truncation_psi=args.truncation_psi, method=gen.map_ws,
        )
        img, finetune_img, _ = gen.apply(
            variables, ws, pose_feat, cat_feats_dict(feats),
            batch["denorm_upper_img"], batch["denorm_lower_img"],
            batch["denorm_upper_mask"], batch["denorm_lower_mask"],
            method=gen.synthesize, noise_mode="none",
        )
        return finetune_img

    if args.dp:
        # data-parallel serving (see cli/test.py: shard_map so the routing
        # Pallas kernels run per-device blocks)
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
        ds = SyntheticUvitonDataset(num_samples=args.synthetic, resolution=res)
        pairs = [
            (ds[i], ds[(i + 1) % len(ds)], f"s{i}.jpg", f"s{(i + 1) % len(ds)}.jpg")
            for i in range(len(ds))
        ]
    else:
        if args.dataroot is None:
            raise SystemExit("--dataroot or --synthetic required")
        tds = UvitonDataset512Test(args.dataroot, change_region=args.change_region)
        pairs = [
            (r["person"], r["garment"], r["person_name"], r["garment_name"])
            for r in (tds[i] for i in range(len(tds)))
        ]

    B = args.batchsize

    def make_batch(chunk):
        """Returns (garment_collated, routed_batch)."""
        person = collate([c[0] for c in chunk])
        garment = collate([c[1] for c in chunk])
        # pad_x = square-padding x offset: 96 for 512x320, 32 for the 256 fixture
        pad_x = float(person["left_padding"][0])
        batch = dict(
            prepare_tryon_batch_512(
                person, garment, change_region=args.change_region, pad_x=pad_x
            )
        )
        # inputs may be produced at 256 (synthetic fixture); scale to model res
        if batch["pose"].shape[1] != res:
            batch = {
                k: (
                    jax.image.resize(v, (v.shape[0], res, res, v.shape[-1]), "nearest")
                    if v.ndim == 4
                    else v
                )
                for k, v in batch.items()
            }
        return garment, batch

    variables = g_ema_params
    if args.quant == "int8_static":
        calib = [make_batch(pairs[i : i + B])[1]
                 for i in range(0, min(len(pairs), args.calib_batches * B), B)]
        variables = calibrate_int8_static(
            ctor, variables, w_avg, args.truncation_psi, calib)
        print(f"calibrated int8 activation scales on {len(calib)} batches")

    if args.dp:
        from ..parallel.mesh import replicate, shard_batch

        variables = replicate(variables, mesh)
    n_written = 0
    for i in range(0, len(pairs), B):
        chunk = pairs[i : i + B]
        garment, batch = make_batch(chunk)
        if args.dp:
            if len(chunk) < B:  # pad the ragged tail to the full global batch
                pad = B - len(chunk)
                batch = {
                    k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)])
                    for k, v in batch.items()
                }
            batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
        out = np.asarray(jax.device_get(forward(variables, batch)), np.float32)
        g_img = np.asarray(garment["image"], np.float32) / 127.5 - 1.0
        p_img = np.asarray(jax.device_get(batch["person_img"]), np.float32)
        for j, (_, _, pname, gname) in enumerate(chunk):
            # un-pad square canvas back to the 512x320 aspect (96/512 each side)
            W = out.shape[2]
            crop = slice((W * 96) // 512, (W * (512 - 96)) // 512)
            gj = g_img[j]
            if gj.shape[0] != out.shape[1]:
                gj = np.asarray(
                    jax.image.resize(jnp.asarray(gj), (out.shape[1], W, 3), "nearest")
                )
            pj = p_img[j]
            if pj.shape[0] != out.shape[1]:
                pj = np.asarray(
                    jax.image.resize(jnp.asarray(pj), (out.shape[1], W, 3), "nearest")
                )
            strip = np.concatenate(
                [gj[:, crop], pj[:, crop], out[j][:, crop]], axis=1
            )
            name = f"{os.path.basename(pname).split('.')[0]}__{os.path.basename(gname).split('.')[0]}.png"
            save_image(strip, os.path.join(args.outdir, name))
            n_written += 1
    print(f"wrote {n_written} triptychs to {args.outdir}")


if __name__ == "__main__":
    main()

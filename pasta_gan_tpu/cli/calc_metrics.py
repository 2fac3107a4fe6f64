"""Metrics CLI (reference `calc_metrics.py`).

Computes FID/KID/IS/PR over generated try-on images vs dataset reals, and
PPL (ppl2_wend + aliases) over w-space paths of a network.  Sources:
--gen_dir (a folder of images, e.g. cli.test output) or --network (generate
on the fly over the test pairs); reals from --dataroot or --real_dir.
Detector: --detector (local TorchScript inception .pt for reference-exact
numbers) or the built-in deterministic conv extractor; PPL distance:
--ppl_detector (vgg16/LPIPS weights) or the float-path proxy.

  python -m pasta_gan_tpu.cli.calc_metrics --metrics fid50k_full,kid50k_full \\
      --gen_dir ./test_results --real_dir /data/UPT_256/.../image
  python -m pasta_gan_tpu.cli.calc_metrics --metrics ppl2_wend \\
      --network runs/.../network-snapshot-000123 --dataroot /data/UPT_test
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _folder_source(path: str, batch: int = 32, resolution=None):
    import PIL.Image

    exts = (".png", ".jpg", ".jpeg")
    fnames = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(path)
        for f in files
        if f.lower().endswith(exts)
    )
    if not fnames:
        raise SystemExit(f"no images under {path}")

    def source():
        buf = []
        for fn in fnames:
            img = PIL.Image.open(fn).convert("RGB")
            if resolution is not None:
                img = img.resize((resolution, resolution), PIL.Image.LANCZOS)
            buf.append(np.asarray(img, np.uint8))
            if len(buf) == batch:
                yield np.stack(buf)
                buf = []
        if buf:
            yield np.stack(buf)

    return source


def _network_source(network: str, dataroot, synthetic: int, batch: int):
    """Generate try-on images on the fly (the reference's generator path)."""
    import jax

    from ..cli.test import main as _  # noqa: reuse is structural; build inline instead
    from ..data.dataset import (
        SyntheticUvitonDataset,
        UvitonDataset256Test,
        collate,
        prepare_tryon_batch,
    )
    from ..io.checkpoints import load_snapshot
    from ..models import GeneratorFull, cat_feats_dict
    import jax.numpy as jnp

    g_ema_params, w_avg, config = load_snapshot(network)
    mc = config.get("model", {})
    gen = GeneratorFull(
        z_dim=mc.get("z_dim", 0), c_dim=mc.get("c_dim", 512), w_dim=mc.get("w_dim", 512),
        img_resolution=mc.get("img_resolution", 256),
        channel_base=mc.get("channel_base", 16384), channel_max=mc.get("channel_max", 512),
        mapping_layers=mc.get("mapping_layers", 1), conv_clamp=mc.get("conv_clamp", 256.0),
    )

    @jax.jit
    def forward(batch):
        stylecode, feats = gen.apply(
            g_ema_params, batch["style_input"], batch["retain"], method=gen.encode_style
        )
        pose_feat = gen.apply(g_ema_params, batch["pose"], method=gen.encode_pose)
        ws, _ = gen.apply(g_ema_params, None, stylecode, method=gen.map_ws)
        _, finetune_img, _ = gen.apply(
            g_ema_params, ws, pose_feat, cat_feats_dict(feats),
            batch["denorm_upper_img"], batch["denorm_lower_img"],
            batch["denorm_upper_mask"], batch["denorm_lower_mask"],
            method=gen.synthesize, noise_mode="none",
        )
        return finetune_img

    if synthetic:
        ds = SyntheticUvitonDataset(num_samples=synthetic)
        pairs = [(ds[i], ds[(i + 1) % len(ds)]) for i in range(len(ds))]
    else:
        tds = UvitonDataset256Test(dataroot)
        pairs = [(r["person"], r["garment"]) for r in (tds[i] for i in range(len(tds)))]

    def source():
        for i in range(0, len(pairs), batch):
            chunk = pairs[i : i + batch]
            b = prepare_tryon_batch(collate([c[0] for c in chunk]), collate([c[1] for c in chunk]))
            out = np.asarray(jax.device_get(forward(b)), np.float32)
            yield np.clip((out + 1) * 127.5, 0, 255).astype(np.uint8)

    return source


def _ppl_sampler(network: str, dataroot, synthetic: int, batch: int):
    """PPL sampler factory for MetricOptions (reference
    `perceptual_path_length.py:36-95` adapted to the style-conditioned
    generators): w-space pairs are the mapped codes of the SAME person worn
    with two different garments; pose/retain/denorm conditioning stays fixed
    from the first garment while w interpolates.  The pair stream cycles so
    any num_samples protocol is reachable from a finite pair list."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from ..data.dataset import (
        SyntheticUvitonDataset,
        UvitonDataset256Test,
        collate,
        prepare_tryon_batch,
    )
    from ..io.checkpoints import load_snapshot
    from ..models import GeneratorFull, cat_feats_dict

    g_ema_params, w_avg, config = load_snapshot(network)
    mc = config.get("model", {})
    gen = GeneratorFull(
        z_dim=mc.get("z_dim", 0), c_dim=mc.get("c_dim", 512), w_dim=mc.get("w_dim", 512),
        img_resolution=mc.get("img_resolution", 256),
        channel_base=mc.get("channel_base", 16384), channel_max=mc.get("channel_max", 512),
        mapping_layers=mc.get("mapping_layers", 1), conv_clamp=mc.get("conv_clamp", 256.0),
    )

    @jax.jit
    def embed(b):
        stylecode, feats = gen.apply(
            g_ema_params, b["style_input"], b["retain"], method=gen.encode_style
        )
        pose_feat = gen.apply(g_ema_params, b["pose"], method=gen.encode_pose)
        ws, _ = gen.apply(g_ema_params, None, stylecode, method=gen.map_ws)
        return ws, pose_feat, feats

    @jax.jit
    def synth(ws, aux):
        _, finetune_img, _ = gen.apply(
            g_ema_params, ws, aux["pose_feat"], aux["cat_feats"],
            aux["du"], aux["dl"], aux["dum"], aux["dlm"],
            method=gen.synthesize, noise_mode="none",
        )
        return finetune_img

    if synthetic:
        ds = SyntheticUvitonDataset(num_samples=synthetic)
        pairs = [(ds[i], ds[(i + 1) % len(ds)]) for i in range(len(ds))]
    else:
        if dataroot is None:
            raise SystemExit("PPL --network sampling needs --dataroot or --synthetic")
        tds = UvitonDataset256Test(dataroot)
        pairs = [(r["person"], r["garment"]) for r in (tds[i] for i in range(len(tds)))]

    def sampler(space: str):
        if space != "w":
            raise SystemExit(
                f"{space}-space PPL is unavailable: the config of record has "
                "z_dim=0 (style-conditioned mapping; metrics/ppl.py docstring) "
                "— use ppl2_wend / ppl_wfull / ppl_wend"
            )

        def pair_iter():
            n = len(pairs)
            while True:
                for i in range(0, n, batch):
                    idx_a = [(i + k) % n for k in range(batch)]
                    idx_b = [(i + k + 1) % n for k in range(batch)]
                    persons = collate([pairs[j][0] for j in idx_a])
                    b_a = prepare_tryon_batch(persons, collate([pairs[j][1] for j in idx_a]))
                    b_b = prepare_tryon_batch(persons, collate([pairs[j][1] for j in idx_b]))
                    ws0, pose_feat, feats = embed(b_a)
                    ws1, _, _ = embed(b_b)
                    aux = dict(
                        pose_feat=pose_feat, cat_feats=cat_feats_dict(feats),
                        du=b_a["denorm_upper_img"], dl=b_a["denorm_lower_img"],
                        dum=b_a["denorm_upper_mask"], dlm=b_a["denorm_lower_mask"],
                    )
                    yield ws0, ws1, aux

        return synth, pair_iter()

    return sampler


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metrics", default="fid50k_full", help="comma-separated metric list")
    p.add_argument("--gen_dir", default=None)
    p.add_argument("--network", default=None)
    p.add_argument("--dataroot", default=None)
    p.add_argument("--real_dir", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--detector", default=None,
                   help="local inception weights (TorchScript .pt / "
                        "state_dict / .npz) for reference-protocol FID/KID/IS; "
                        "'auto' searches $PASTA_GAN_DETECTORS, ./weights and "
                        "~/.cache/pasta_gan_tpu/detectors (metrics/"
                        "detectors_manifest.py)")
    p.add_argument("--run_dir", default=None, help="where to append metric-*.jsonl")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--resolution", type=int, default=None, help="resize folder images")
    p.add_argument("--conditional", action="store_true",
                   help="real source builds part images + pose heatmaps "
                        "(reference ImageFolderDataset preprocessing)")
    p.add_argument("--ppl_detector", default=None,
                   help="torch state_dict/.pt with vgg16 (+optional lin "
                        "heads) weights for the LPIPS distance "
                        "(metrics/ppl.py lpips_distance); without it PPL "
                        "uses the deterministic float-path proxy distance "
                        "(NOT LPIPS-calibrated)")
    p.add_argument("--ppl_samples", type=int, default=None,
                   help="override the 50k PPL sample protocol (smoke runs)")
    args = p.parse_args(argv)

    from ..metrics import calc_metric, default_extractor, is_valid_metric, report_metric
    from ..metrics.detectors_manifest import find_detector, verify_detector

    if args.detector == "auto":
        args.detector = find_detector("inception")
        if args.detector:
            print(f"inception detector: {args.detector} "
                  f"(sha256 {verify_detector('inception', args.detector)})")
        else:
            print("no inception weights found (see metrics/detectors_manifest.py); "
                  "falling back to the SimpleConvFeatures proxy — numbers are "
                  "NOT reference-comparable")
    if args.ppl_detector == "auto":
        args.ppl_detector = find_detector("vgg16")
        if args.ppl_detector:
            print(f"vgg16/LPIPS detector: {args.ppl_detector} "
                  f"(sha256 {verify_detector('vgg16', args.ppl_detector)})")
        else:
            print("no vgg16 weights found; PPL uses the float-path proxy "
                  "distance — NOT LPIPS-calibrated")

    metrics = [m.strip() for m in args.metrics.split(",")]
    ppl_only = all(m.startswith("ppl") for m in metrics)
    any_ppl = any(m.startswith("ppl") for m in metrics)

    ppl_kwargs = {}
    if any_ppl:
        if not args.network:
            raise SystemExit("PPL metrics need --network (w-space pairs come "
                             "from mapped style codes)")
        ppl_kwargs["ppl_sampler"] = _ppl_sampler(
            args.network, args.dataroot, args.synthetic, args.batch)
        if args.ppl_samples:
            ppl_kwargs["ppl_num_samples"] = args.ppl_samples
        if args.ppl_detector:
            from ..metrics.ppl import lpips_distance
            from ..metrics.vgg16 import load_state_dict_file

            # handles all manifest formats: .npz, plain state_dict
            # checkpoint, or the reference's TorchScript vgg16.pt (plain
            # torch.load dies on a TorchScript archive)
            ppl_kwargs["ppl_distance"] = lpips_distance(
                load_state_dict_file(args.ppl_detector)
            )

    if args.gen_dir:
        gen_source = _folder_source(args.gen_dir, args.batch, args.resolution)
    elif args.network and not ppl_only:
        gen_source = _network_source(args.network, args.dataroot, args.synthetic, args.batch)
    elif ppl_only:
        gen_source = None
    else:
        raise SystemExit("--gen_dir or --network required")

    if ppl_only:
        real_source = None
    elif args.real_dir:
        if args.conditional:
            # reference ImageFolderDataset (dataset.py:168-420): reals with
            # per-image part images + pose heatmaps; images feed the
            # extractor, the conditional stack is available to callers
            from ..data.parts import PartsFolderDataset

            ds = PartsFolderDataset(args.real_dir, resolution=args.resolution)

            def real_source():
                buf = []
                for i in range(len(ds)):
                    buf.append(ds[i]["image"])
                    if len(buf) == args.batch:
                        yield np.stack(buf)
                        buf = []
                if buf:
                    yield np.stack(buf)

        else:
            real_source = _folder_source(args.real_dir, args.batch, args.resolution)
    elif args.synthetic:
        from ..data.dataset import SyntheticUvitonDataset

        ds = SyntheticUvitonDataset(num_samples=args.synthetic)

        def real_source():
            imgs = np.stack([ds[i]["image"] for i in range(len(ds))])
            for i in range(0, len(imgs), args.batch):
                yield imgs[i : i + args.batch]
    else:
        raise SystemExit("--real_dir or --synthetic required")

    extractor = default_extractor(args.detector)
    for metric in metrics:
        if not is_valid_metric(metric):
            raise SystemExit(f"unknown metric {metric}")
        result = calc_metric(
            metric, real_source=real_source, gen_source=gen_source,
            extractor=extractor, **ppl_kwargs,
        )
        report_metric(result, run_dir=args.run_dir, snapshot=args.network or args.gen_dir)


if __name__ == "__main__":
    main()

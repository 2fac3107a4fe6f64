"""Training CLI (reference `train_wo_flow_fullbody.py`).

Flag-compatible with the reference where meaningful on TPU (no --gpus/NCCL:
parallelism is the device mesh).  Example (the train.sh config of record):

  python -m pasta_gan_tpu.cli.train --outdir ./runs --data /data/UPT_256 \\
      --cfg fashion --batch 96 --l1_weight 40 --vgg_weight 40 \\
      --contextual_weight 0 --pl_weight 0 --mask_weight 20

Use --synthetic for a data-free smoke run.
"""

from __future__ import annotations

import argparse
import os
import re

import jax


def make_run_dir(outdir: str, desc: str) -> str:
    """NNNNN-desc run-dir numbering (reference train_wo_flow_fullbody.py:525-532)."""
    os.makedirs(outdir, exist_ok=True)
    prev = [
        int(m.group(1))
        for d in os.listdir(outdir)
        if (m := re.match(r"^(\d+)-", d))
    ]
    run_id = max(prev, default=-1) + 1
    run_dir = os.path.join(outdir, f"{run_id:05d}-{desc}")
    os.makedirs(run_dir)
    return run_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outdir", required=True)
    p.add_argument("--data", default=None, help="UPT_256 dataset root")
    p.add_argument("--synthetic", type=int, default=0, help="use N synthetic samples instead of --data")
    p.add_argument("--cfg", default="fashion", help="config preset")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--kimg", type=int, default=None)
    p.add_argument("--gamma", type=float, default=None, help="R1 gamma override")
    p.add_argument("--l1_weight", type=float, default=40.0)
    p.add_argument("--vgg_weight", type=float, default=40.0)
    p.add_argument("--mask_weight", type=float, default=20.0)
    p.add_argument("--contextual_weight", type=float, default=0.0)
    p.add_argument("--pl_weight", type=float, default=0.0)
    p.add_argument("--aug", default="ada", choices=["ada", "noaug", "fixed"])
    p.add_argument("--p", type=float, default=0.0, help="fixed augment p (--aug fixed)")
    p.add_argument("--target", type=float, default=0.6, help="ADA target")
    p.add_argument("--augpipe", default="bgc")
    # Round-4 default flip: fast_geom + stack_calls are the config of record
    # (ADA step 448 vs 1210 ms at batch 8 bf16; exact-vs-fast fid_proxy delta
    # 0.07, WITHIN the 0.09 seed-to-seed noise over the same fixed 60-step
    # run — BASELINE.md round-4 ADA quality section).
    p.add_argument("--ada_fast_geom", action="store_true",
                   help="(default) two-pass affine ADA warp; kept for "
                   "backwards-compatible invocations")
    p.add_argument("--ada_exact_geom", action="store_true",
                   help="single-pass reference-parity ADA warp (the pre-r4 "
                   "default: ~2.7x slower step; also disables stack_calls "
                   "unless --ada_stack_calls is passed — the exact warp's "
                   "supersampled intermediates can OOM when stacked next to "
                   "the VGG backward)")
    p.add_argument("--ada_stack_calls", action="store_true",
                   help="batch the per-loss ADA+D calls into one invocation "
                   "(default with fast_geom)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", default=None,
                   help="train-state checkpoint dir (full resume), or a "
                   "network .pkl for transfer learning (name+shape-matching "
                   "params copy in; legacy TF StyleGAN2 exports — the "
                   "reference's ffhq/celebahq resume presets — and reference "
                   "torch snapshots both work)")
    p.add_argument("--vgg_ckpt", default=None, help="torch vgg19 state_dict path")
    p.add_argument("--snap", type=int, default=50, help="snapshot interval ticks")
    p.add_argument("--img_snap", type=int, default=None,
                   help="image-grid interval ticks (default: config preset, 50)")
    p.add_argument("--workers", type=int, default=None,
                   help="host decode worker threads (default: config preset)")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"],
                   help="compute dtype (fp32 master weights either way; the "
                   "bf16 policy is parity-tested incl. the R1 double-"
                   "backprop — tests/test_train.py).  Default bfloat16: "
                   "the TPU config of record (448 vs 505 ms ADA step)")
    p.add_argument("--fmaps", type=float, default=None, help="channel_base multiplier override (reference --fmaps)")
    p.add_argument("--accum", type=int, default=None,
                   help="gradient-accumulation microbatches per phase "
                   "(reference grad-accumulation rounds, training_loop_"
                   "wo_flow_fullbody.py:494-508).  batch must divide "
                   "evenly; e.g. --batch 96 --accum 12 runs the reference "
                   "global batch on one chip at microbatch 8")
    p.add_argument("--kimg_per_tick", type=int, default=None)
    p.add_argument("-n", "--dry-run", action="store_true")
    args = p.parse_args(argv)

    from ..runtime.config import from_preset, replace_nested, to_json

    config = from_preset(args.cfg, batch=args.batch)
    overrides = {
        "loss.l1_weight": args.l1_weight,
        "loss.vgg_weight": args.vgg_weight,
        "loss.mask_weight": args.mask_weight,
        "loss.contextual_weight": args.contextual_weight,
        "loss.pl_weight": args.pl_weight,
        "ada.enabled": args.aug != "noaug",
        "ada.target": args.target,
        "ada.pipe": args.augpipe,
        "ada.initial_p": args.p,
        "ada.fast_geom": not args.ada_exact_geom,
        "ada.stack_calls": args.ada_stack_calls or not args.ada_exact_geom,
        "random_seed": args.seed,
        "compute_dtype": args.dtype,
        "network_snapshot_ticks": args.snap,
    }
    if args.gamma is not None:
        overrides["loss.r1_gamma"] = args.gamma
    if args.kimg is not None:
        overrides["total_kimg"] = args.kimg
    if args.fmaps is not None:
        overrides["model.channel_base"] = int(args.fmaps * 32768)
    if args.accum is not None:
        if config.batch_size % args.accum:
            raise SystemExit(
                f"--accum {args.accum} must divide --batch {config.batch_size}"
            )
        overrides["accum_steps"] = args.accum
    if args.kimg_per_tick is not None:
        overrides["kimg_per_tick"] = args.kimg_per_tick
    if args.img_snap is not None:
        overrides["image_snapshot_ticks"] = args.img_snap
    if args.workers is not None:
        overrides["data_workers"] = args.workers
    config = replace_nested(config, **overrides)

    desc = f"{args.cfg}-batch{config.batch_size}"
    if args.synthetic:
        desc += "-synthetic"

    # Transfer-learning presets (reference train_wo_flow_fullbody.py:319-341):
    # preset name -> stock StyleGAN2-ADA pickle, resolved through open_url's
    # md5-keyed cache (no egress here — see WEIGHTS.md for pre-placing files).
    resume_specs = {
        "ffhq256": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/pretrained/transfer-learning-source-nets/ffhq-res256-mirror-paper256-noaug.pkl",
        "ffhq512": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/pretrained/transfer-learning-source-nets/ffhq-res512-mirror-stylegan2-noaug.pkl",
        "ffhq1024": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/pretrained/transfer-learning-source-nets/ffhq-res1024-mirror-stylegan2-noaug.pkl",
        "celebahq256": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/pretrained/transfer-learning-source-nets/celebahq-res256-mirror-paper256-kimg100000-ada-target0.5.pkl",
        "lsundog256": "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/pretrained/transfer-learning-source-nets/lsundog-res256-paper256-kimg100000-noaug.pkl",
    }
    resume = args.resume
    if resume is None or resume == "noresume":
        resume = None
        desc += "-noresume" if args.resume == "noresume" else ""
    elif resume in resume_specs:
        desc += f"-resume{resume}"
        from ..utils import open_url

        try:
            resume = open_url(resume_specs[resume], return_filename=True)
        except Exception as e:
            raise SystemExit(
                f"--resume {args.resume}: the preset pickle is not in the "
                f"open_url cache and this deployment has no egress "
                f"({e}); download {resume_specs[args.resume]} elsewhere and "
                "pre-place it (WEIGHTS.md), or pass a local .pkl path"
            )
    elif os.path.isfile(resume):
        desc += "-resumecustom"
    if resume is not None and not os.path.isdir(resume):
        # reference: ADA reacts faster at the start of a transfer run
        config = replace_nested(config, **{"ada.kimg": 100})

    if args.dry_run:
        print("Resolved training config:")
        print(to_json(config))
        print("\nDry run: exiting (reference --dry-run semantics).")
        return

    # dataset
    if args.synthetic:
        from ..data.dataset import SyntheticUvitonDataset

        dataset = SyntheticUvitonDataset(num_samples=args.synthetic, seed=args.seed)
    else:
        if args.data is None:
            raise SystemExit("--data or --synthetic required")
        from ..data.dataset import UvitonDatasetFull

        dataset = UvitonDatasetFull(args.data, random_seed=args.seed)

    vgg_params = None
    if config.loss.vgg_weight > 0:
        from ..train.vgg import init_vgg19, load_torch_vgg19

        if args.vgg_ckpt and os.path.exists(args.vgg_ckpt):
            vgg_params = load_torch_vgg19(args.vgg_ckpt)
            print(f"loaded VGG19 weights from {args.vgg_ckpt}")
        else:
            print("WARNING: no --vgg_ckpt; using randomly-initialized VGG features")
            vgg_params = init_vgg19(jax.random.PRNGKey(0))

    from ..parallel import data_parallel_mesh
    from ..train.loop import training_loop

    mesh = data_parallel_mesh() if len(jax.devices()) > 1 else None
    run_dir = make_run_dir(args.outdir, desc)
    print(f"run dir: {run_dir}; devices: {jax.devices()}")

    training_loop(
        run_dir=run_dir,
        dataset=dataset,
        config=config,
        mesh=mesh,
        vgg_params=vgg_params,
        resume=resume,
    )


if __name__ == "__main__":
    main()

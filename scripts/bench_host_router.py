"""Bounded synthetic benchmark for the host-side routing pipeline.

VERDICT r3 weak-spot #6: the host router's overlap benefit was a design
argument without a number.  This script produces the number the production
claim needs, within what a small container can measure:

  * T_route  : host-side routing cost per sample (native C++ warps +
               erosion/compositing, `route_patches_host_single`) —
               measured single-threaded, then under an N-thread pool
               (on a 1-vCPU container the pool curve is flat; the
               per-sample cost is the portable number).
  * T_decode : PNG decode+parse cost per sample (PIL), the other half of
               the reference DataLoader workers' job
               (`train_wo_flow_fullbody.py:379-383`, --workers 3).
  * T_step   : device step/forward time per batch (pass --device_ms from
               BASELINE.md, or measure live with --measure_device).

Overlap criterion: the pipeline hides the input path iff
    (T_route + T_decode) * batch / n_cores  <=  T_step
so the script reports `cores_needed`, the host-core count at which the
double-buffered `HostRoutingPipeline` fully overlaps the device — the
production-sizing number for real v5e hosts (~112 vCPU).

Usage:
  python scripts/bench_host_router.py [--samples 32] [--threads 1,2,4]
      [--device_ms 448] [--batch 8] [--measure_device]
Prints ONE JSON line; record in BASELINE.md.
"""

import argparse
import io
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8, help="training batch/chip")
    ap.add_argument("--threads", default="1,2,4")
    ap.add_argument("--device_ms", type=float, default=None,
                    help="device step ms/batch to size against (e.g. 448 = "
                    "bf16 ADA fast_geom train step at batch 8, BASELINE.md)")
    ap.add_argument("--measure_device", action="store_true",
                    help="measure the bf16 forward live instead")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import jax

    if not args.measure_device:
        # keep the whole host path on CPU: the batched DLT geometry inside
        # route_patches_host_batch is jitted, and on a remote-tunnel TPU
        # backend each call would pay transport RTT (and contend with
        # whatever is using the chip)
        jax.config.update("jax_platforms", "cpu")

    from pasta_gan_tpu.data.dataset import SyntheticUvitonDataset, collate
    from pasta_gan_tpu.data.host_router import training_route_fn

    ds = SyntheticUvitonDataset(num_samples=args.samples, resolution=256, seed=7)
    items = [ds[i] for i in range(args.samples)]

    # ---- PNG decode cost (the loader's other job): round-trip through an
    # in-memory PNG of the synthetic person image at the dataset's size.
    from PIL import Image

    bufs = []
    for it in items:
        b = io.BytesIO()
        Image.fromarray(np.asarray(it["image"], np.uint8)).save(b, format="PNG")
        bufs.append(b.getvalue())
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        for b in bufs:
            np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    t_decode = (time.perf_counter() - t0) / (args.repeat * len(bufs))

    # ---- host routing cost per sample (geometry batched once inside
    # route_patches_host_batch, warps/compositing per sample — the exact
    # HostRoutingPipeline inner call) under pools of N threads.
    host_batch = collate(items)
    route = training_route_fn()
    pool_ms = {}
    t_route = None
    for n in [int(x) for x in args.threads.split(",") if x]:
        with ThreadPoolExecutor(n) as pool:
            route(host_batch, pool)  # warm native lib + geometry jit
            t0 = time.perf_counter()
            for _ in range(args.repeat):
                route(host_batch, pool)
            pool_ms[n] = (time.perf_counter() - t0) / args.repeat / len(items) * 1e3
            if n == 1:
                t_route = pool_ms[n] / 1e3

    t_step = args.device_ms
    if args.measure_device:
        import jax

        from pasta_gan_tpu.data.dataset import collate, prepare_tryon_batch
        from pasta_gan_tpu.models import GeneratorFull
        import jax.numpy as jnp

        gen = GeneratorFull(img_resolution=256, channel_base=16384,
                            channel_max=512, dtype=jnp.bfloat16)
        person = collate(items[: args.batch])
        garment = collate([items[(i + 1) % args.samples] for i in range(args.batch)])
        b = jax.jit(prepare_tryon_batch)(person, garment)
        b = {k: v.astype(jnp.bfloat16) for k, v in b.items()}
        variables = jax.jit(lambda: gen.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            None, b["style_input"], b["retain"], b["pose"],
            b["denorm_upper_img"], b["denorm_lower_img"],
            b["denorm_upper_mask"], b["denorm_lower_mask"], noise_mode="none"))()

        @jax.jit
        def fwd(v, b):
            return gen.apply(v, None, b["style_input"], b["retain"], b["pose"],
                             b["denorm_upper_img"], b["denorm_lower_img"],
                             b["denorm_upper_mask"], b["denorm_lower_mask"],
                             noise_mode="none")[1]

        for _ in range(3):
            jax.block_until_ready(fwd(variables, b))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fwd(variables, b)
        jax.block_until_ready(out)
        t_step = (time.perf_counter() - t0) / 10 * 1e3

    out = {
        "metric": "host routing cost per sample (native warps + composite)",
        "value": round(t_route * 1e3, 2),
        "unit": "ms/sample/core",
        "decode_ms_per_sample": round(t_decode * 1e3, 2),
        "pool_ms_per_sample": {str(k): round(v, 2) for k, v in pool_ms.items()},
        "host_cores_visible": os.cpu_count(),
    }
    if t_step:
        if t_route is None:
            t_route = min(pool_ms.values()) / 1e3
        need = (t_route + t_decode) * 1e3 * args.batch / t_step
        out["device_step_ms"] = round(t_step, 1)
        out["batch"] = args.batch
        out["cores_needed_to_overlap"] = round(need, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

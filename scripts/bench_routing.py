"""Routing-only benchmark + tile-parameter sweep (VERDICT r3 weak #7).

Isolates the on-device batch-16 routing program (`prepare_tryon_batch`:
DLT transforms + 20 perspective warps/sample + erosion/compositing — the
part of the e2e benchmark that is NOT the generator forward) and sweeps
the Pallas warp kernels' tile parameters (ops/tuning.py):

  * denorm_rows_cap     — dst rows/tile of the patch->frame hat-matmul
                          kernel (finer tiles skip more support),
  * norm_rows_per_tile  — dst rows/tile of the frame->patch kernel,
  * norm_src_tiles      — source blocking of the norm contraction
                          (finer blocks skip more source, smaller K/pass).

The round-4 SMEM bitmask packing (ops/pallas_warp.py:_pack_bits) is what
makes caps below 8 representable at all.  Usage:

  python scripts/bench_routing.py            # sweep, print one line/config
  python scripts/bench_routing.py --single   # defaults only (regression)

Record the winning row in BASELINE.md and fold it into ops/tuning.py's
defaults.  Reference cost being replaced: the per-sample cv2 loop in
`/root/reference/training/dataset.py:873-927`.
"""

import argparse
import itertools
import json
import sys
import time

import os

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BATCH = 16
WARMUP = 3
ITERS = 20


def _time(fn, args, iters=ITERS):
    for _ in range(WARMUP):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    if dt / iters < BATCH * 1e-4:  # axon relay barrier hazard (verify skill)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            float(jnp.sum(out["style_input"]))
        dt = time.perf_counter() - t0
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", action="store_true", help="defaults only")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed region "
                    "(defaults-config only)")
    ap.add_argument("--denorm_rows", default="8,4,2")
    ap.add_argument("--norm_rows", default="16,8,4")
    ap.add_argument("--norm_src_tiles", default="4,8")
    args = ap.parse_args()

    from pasta_gan_tpu.data.dataset import (
        SyntheticUvitonDataset,
        collate,
        prepare_tryon_batch,
    )
    from pasta_gan_tpu.ops.tuning import TUNING, tuned

    ds = SyntheticUvitonDataset(num_samples=BATCH)
    person = collate([ds[i] for i in range(BATCH)])
    garment = collate([ds[(i + 1) % BATCH] for i in range(BATCH)])
    person = {k: jnp.asarray(v) for k, v in person.items()}
    garment = {k: jnp.asarray(v) for k, v in garment.items()}

    def prep(person, garment):
        b = prepare_tryon_batch(person, garment)
        return {k: v.astype(jnp.bfloat16) for k, v in b.items()}

    if args.single:
        combos = [(TUNING.denorm_rows_cap, TUNING.norm_rows_per_tile,
                   TUNING.norm_src_tiles)]
    else:
        combos = list(itertools.product(
            [int(x) for x in args.denorm_rows.split(",")],
            [int(x) for x in args.norm_rows.split(",")],
            [int(x) for x in args.norm_src_tiles.split(",")],
        ))

    best = None
    for dr, nr, st in combos:
        jax.clear_caches()
        with tuned(denorm_rows_cap=dr, norm_rows_per_tile=nr,
                   norm_src_tiles=st):
            if args.profile:
                fn = jax.jit(prep)
                for _ in range(WARMUP):
                    jax.block_until_ready(fn(person, garment))
                jax.profiler.start_trace(args.profile)
            ms = _time(jax.jit(prep), (person, garment)) * 1e3
            if args.profile:
                jax.profiler.stop_trace()
                from profile_forward import summarize

                summarize(args.profile, ITERS + WARMUP, 25)
        row = {"denorm_rows_cap": dr, "norm_rows_per_tile": nr,
               "norm_src_tiles": st, "ms_per_batch16": round(ms, 2)}
        print(json.dumps(row), flush=True)
        if best is None or ms < best["ms_per_batch16"]:
            best = row
    print(json.dumps({"metric": "256px routing program, batch 16",
                      "unit": "ms/batch", "best": best}))


if __name__ == "__main__":
    main()

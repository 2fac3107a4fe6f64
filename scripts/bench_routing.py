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
    # Verify-skill measurement rules, all of them at once:
    #  * scalar readback per iteration (block_until_ready may not barrier),
    #  * a THREADED DATA DEPENDENCY so no two iterations see identical input
    #    buffers (identical calls can be CSE'd/elided end-to-end: the naive
    #    per-iter-sync loop measured 1.9 ms for a program whose device
    #    profile shows ~12 ms),
    #  * MEDIAN of per-iteration times (one-off multi-second relay flushes
    #    must not average in; the old mean once read 8679 ms),
    #  * subtract the measured sync RTT floor (~28 ms tunnel round trip).
    person, garment = args
    fkey = next(
        k for k, v in person.items() if jnp.issubdtype(v.dtype, jnp.floating)
    )

    @jax.jit
    def step(p, g):
        out = fn(p, g)
        # reduce EVERY output — reducing one lets XLA dead-code the others
        s = sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())
        return s, p[fkey] + s * 0.0  # next iter's input depends on this one

    p = dict(person)
    for _ in range(WARMUP):
        s, p[fkey] = step(p, garment)
        float(s)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s, p[fkey] = step(p, garment)
        float(s)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    if times[-1] > 10 * med:
        print(f"# WARNING: relay stalls discarded (max {times[-1]:.3f}s vs "
              f"median {med:.3f}s)", flush=True)
    # sync-floor: dispatch + readback of a trivial computation (~pure RTT)
    tiny = jax.jit(lambda x: x + 1.0)
    x = s
    float(tiny(x))  # compile
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        x = tiny(x)
        float(x)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    return max(med - rtt, 1e-6)


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

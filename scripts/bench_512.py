"""512x320 try-on inference benchmark (BASELINE.json config #2 — the
reference `test_512.py` path: batch 8, Generator512, 3-region routing).

Prints one JSON line like bench.py.  Measurement protocol per
.claude/skills/verify: warm up, amortize over iterations, force scalar
readbacks if the queued timing is implausible.

Usage: python scripts/bench_512.py [--batch 8] [--quant int8_static]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BATCH = 8
RES = 512


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quant", default=None, choices=["int8", "int8_static"])
    ap.add_argument("--roofline", action="store_true",
                    help="also print cost_analysis-derived compute/bandwidth "
                    "floors for the FORWARD program (VERDICT r3 #6: is the "
                    "512 bf16 path at its own speed-of-light?)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="trace the forward and print the per-op device-time "
                    "aggregation (profile_forward.summarize)")
    args = ap.parse_args()
    B = args.batch

    from pasta_gan_tpu.data.dataset import (
        SyntheticUvitonDataset,
        collate,
        prepare_tryon_batch_512,
    )
    from pasta_gan_tpu.models import Generator512

    gen = Generator512(
        img_resolution=RES, channel_base=32768, channel_max=512,
        dtype=jnp.bfloat16, quant=args.quant,
    )
    # synthetic fixture produces 256-res inputs; scale to 512 like cli.test_512
    ds = SyntheticUvitonDataset(num_samples=B)
    person = collate([ds[i] for i in range(B)])
    garment = collate([ds[(i + 1) % B] for i in range(B)])
    pad_x = float(person["left_padding"][0])

    @jax.jit
    def prep(person, garment):
        b = dict(prepare_tryon_batch_512(
            person, garment, change_region="fullbody", pad_x=pad_x))
        out = {}
        for k, v in b.items():
            if v.ndim == 4 and v.shape[1] != RES:
                v = jax.image.resize(v, (v.shape[0], RES, RES, v.shape[-1]), "nearest")
            out[k] = v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
        return out

    person = {k: jnp.asarray(v) for k, v in person.items()}
    garment = {k: jnp.asarray(v) for k, v in garment.items()}
    batch0 = prep(person, garment)

    rng = jax.random.PRNGKey(0)
    base = Generator512(img_resolution=RES, channel_base=32768, channel_max=512,
                        dtype=jnp.bfloat16)
    variables = jax.jit(lambda b: base.init(
        {"params": rng, "noise": rng}, None,
        b["style_input"], b["retain"], b["pose"],
        b["denorm_upper_img"], b["denorm_lower_img"],
        b["denorm_upper_mask"], b["denorm_lower_mask"], noise_mode="none",
    ))(batch0)

    if args.quant == "int8_static":
        gen_c = Generator512(img_resolution=RES, channel_base=32768,
                             channel_max=512, dtype=jnp.bfloat16,
                             quant="int8_calib")

        @jax.jit
        def calib(v, b):
            _, mut = gen_c.apply(
                v, None, b["style_input"], b["retain"], b["pose"],
                b["denorm_upper_img"], b["denorm_lower_img"],
                b["denorm_upper_mask"], b["denorm_lower_mask"],
                noise_mode="none", mutable=["quant_scales"],
            )
            return mut

        variables = {**variables, **calib(variables, batch0)}

    @jax.jit
    def fwd(v, b):
        img, ft, _ = gen.apply(
            v, None, b["style_input"], b["retain"], b["pose"],
            b["denorm_upper_img"], b["denorm_lower_img"],
            b["denorm_upper_mask"], b["denorm_lower_mask"], noise_mode="none",
        )
        return ft

    def e2e(v, person, garment):
        return fwd(v, prep(person, garment))

    for _ in range(3):
        jax.block_until_ready(e2e(variables, person, garment))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = e2e(variables, person, garment)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    if dt < B * 1e-4:  # axon relay barrier hazard: force scalar readbacks
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = e2e(variables, person, garment)
            float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / args.iters

    row = {
        "metric": "512px end-to-end try-on throughput (3-region routing + Generator512, "
                  f"batch {B}, {'int8' if args.quant else 'bf16'})",
        "value": round(B / dt, 2),
        "unit": "images/sec/chip",
        "ms_per_batch": round(dt * 1e3, 1),
        "quant": args.quant,
    }

    if args.roofline:
        # Floors from the COMPILED forward's own post-fusion cost model:
        # t >= max(flops/peak_mxu, bytes/peak_hbm).  v5e peaks: ~197 TF/s
        # bf16 (394 TOPS int8), ~819 GB/s HBM.  "bytes accessed" counts
        # operand+output HBM traffic of each fusion after layout assignment —
        # the quantity the 512 path is bound by (BASELINE.md round-3: the
        # int8 quantize passes GROW this term, which is why int8 loses here).
        ca = fwd.lower(variables, batch0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops, byts = float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
        peak_tf = 394e12 if args.quant else 197e12
        t_mxu, t_hbm = flops / peak_tf, byts / 819e9
        # measure the forward alone so the floor compares like-for-like
        for _ in range(3):
            jax.block_until_ready(fwd(variables, batch0))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = fwd(variables, batch0)
        jax.block_until_ready(o)
        dtf = (time.perf_counter() - t0) / args.iters
        if dtf < B * 1e-4:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(jnp.sum(fwd(variables, batch0)))
            dtf = (time.perf_counter() - t0) / args.iters
        row["roofline"] = {
            "fwd_ms_measured": round(dtf * 1e3, 1),
            "tflops": round(flops / 1e12, 1),
            "hbm_gb": round(byts / 1e9, 2),
            "mxu_floor_ms": round(t_mxu * 1e3, 1),
            "hbm_floor_ms": round(t_hbm * 1e3, 1),
            "floor_ms": round(max(t_mxu, t_hbm) * 1e3, 1),
            "pct_of_roofline": round(100 * max(t_mxu, t_hbm) / dtf, 1),
        }

    print(json.dumps(row))

    if args.profile:
        import os

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_forward import summarize

        for _ in range(3):
            jax.block_until_ready(fwd(variables, batch0))
        jax.profiler.start_trace(args.profile)
        n = 3
        for _ in range(n):
            o = fwd(variables, batch0)
        jax.block_until_ready(o)
        jax.profiler.stop_trace()
        summarize(args.profile, n, 30)


if __name__ == "__main__":
    main()

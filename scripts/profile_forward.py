"""Trace + summarize the GeneratorFull forward on the current backend.

Captures a jax.profiler trace of the batch-16 forward (optionally under an
int8 serving mode), then prints per-op device time aggregated from the trace
(SURVEY.md section 5.1 tracing; the tensorboard plugin pipeline does not work
in this container, manual trace.json.gz aggregation does — see
.claude/skills/verify round-2 lessons).

Usage:
    python scripts/profile_forward.py [--quant int8|int8_static] [--top 25]
                                      [--trace-dir /tmp/trace_fwd]
"""

import argparse
import collections
import glob
import gzip
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def build(quant):
    from pasta_gan_tpu.models import GeneratorFull

    BATCH, RES = 16, 256
    kw = dict(img_resolution=RES, channel_base=16384, channel_max=512,
              dtype=jnp.bfloat16)
    gen = GeneratorFull(**kw, quant=quant)
    rng = jax.random.PRNGKey(0)
    k = jax.random.split(rng, 8)
    inputs = dict(
        z=None,
        c=jax.random.normal(k[0], (BATCH, RES // 4, RES // 4, 42), jnp.bfloat16),
        retain=jax.random.normal(k[1], (BATCH, RES, RES, 3), jnp.bfloat16),
        pose=jax.random.normal(k[2], (BATCH, RES, RES, 6), jnp.bfloat16),
        denorm_upper_input=jax.random.normal(k[3], (BATCH, RES, RES, 3), jnp.bfloat16),
        denorm_lower_input=jax.random.normal(k[4], (BATCH, RES, RES, 3), jnp.bfloat16),
        denorm_upper_mask=(jax.random.uniform(k[5], (BATCH, RES, RES, 1)) > 0.5).astype(jnp.bfloat16),
        denorm_lower_mask=(jax.random.uniform(k[6], (BATCH, RES, RES, 1)) > 0.5).astype(jnp.bfloat16),
    )
    base = GeneratorFull(**kw)
    variables = jax.jit(
        lambda: base.init({"params": rng, "noise": k[7]}, **inputs, noise_mode="none")
    )()
    args_in = (inputs["c"], inputs["retain"], inputs["pose"],
               inputs["denorm_upper_input"], inputs["denorm_lower_input"],
               inputs["denorm_upper_mask"], inputs["denorm_lower_mask"])

    if quant == "int8_static":
        gen_c = GeneratorFull(**kw, quant="int8_calib")

        @jax.jit
        def calib(variables, c, retain, pose, du, dl, dum, dlm):
            _, mut = gen_c.apply(variables, None, c, retain, pose, du, dl, dum, dlm,
                                 noise_mode="none", mutable=["quant_scales"])
            return mut

        variables = {**variables, **calib(variables, *args_in)}

    @jax.jit
    def fwd(variables, c, retain, pose, du, dl, dum, dlm):
        img, ft, parsing = gen.apply(variables, None, c, retain, pose, du, dl,
                                     dum, dlm, noise_mode="none")
        return ft

    return fwd, variables, args_in


def summarize(trace_dir, iters, top):
    f = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    agg = collections.Counter()
    cnt = collections.Counter()
    sample = {}
    total = 0
    for e in data["traceEvents"]:
        # pid 3 / tid 3 is the TensorCore op lane on the axon relay profile
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3:
            ln = (e.get("args") or {}).get("long_name", "")
            n = e["name"]
            agg[n] += e["dur"]
            cnt[n] += 1
            sample.setdefault(n, ln)
            total += e["dur"]
    print(f"device total: {total / iters / 1000:.1f} ms/iter")
    for n, d in agg.most_common(top):
        print(f"{d / iters / 1000:8.3f} ms x{cnt[n] // iters:3d}  {n[:28]:28s} {sample[n][:120]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default=None, choices=["int8", "int8_static"])
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/trace_fwd")
    args = ap.parse_args()

    fwd, variables, args_in = build(args.quant)
    for _ in range(3):
        jax.block_until_ready(fwd(variables, *args_in))
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        out = fwd(variables, *args_in)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    summarize(args.trace_dir, args.iters, args.top)


if __name__ == "__main__":
    main()

"""Benchmark: 256x192-class try-on inference throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The benchmark runs the flagship GeneratorFull (256px, production channel
config, bf16 compute) end-to-end — style encoding, pose encoding, mapping,
synthesis pyramid, SPADE refinement, texture finetune — at the reference's
inference batch size of record (16, `test.sh:3`).

The reference repo publishes no numbers (BASELINE.md); `vs_baseline` is
computed against a measured PyTorch-CPU-reference anchor when available, else
against the driver's >5x-A100 target expressed as a fixed anchor of
REF_ANCHOR_IMGS_PER_SEC (a single-A100 estimate for this exact G forward at
batch 16, fp16; documented in BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Anchor: estimated single-A100 images/sec for the reference 256x192 G_ema
# forward at batch 16 (PyTorch 1.7 + cuDNN). The reference publishes no
# number; this anchor makes vs_baseline a stable, documented ratio.
REF_ANCHOR_IMGS_PER_SEC = 250.0

BATCH = 16
RES = 256
WARMUP = 3
ITERS = 20


def main():
    """Set PASTA_PROFILE_DIR to also capture a jax.profiler trace of the
    timed region (SURVEY.md section 5.1 tracing equivalent)."""
    from pasta_gan_tpu.models import GeneratorFull

    gen = GeneratorFull(
        img_resolution=RES,
        channel_base=16384,
        channel_max=512,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    k = jax.random.split(rng, 8)
    inputs = dict(
        z=None,
        c=jax.random.normal(k[0], (BATCH, RES, RES, 42), jnp.bfloat16),
        retain=jax.random.normal(k[1], (BATCH, RES, RES, 3), jnp.bfloat16),
        pose=jax.random.normal(k[2], (BATCH, RES, RES, 6), jnp.bfloat16),
        denorm_upper_input=jax.random.normal(k[3], (BATCH, RES, RES, 3), jnp.bfloat16),
        denorm_lower_input=jax.random.normal(k[4], (BATCH, RES, RES, 3), jnp.bfloat16),
        denorm_upper_mask=(jax.random.uniform(k[5], (BATCH, RES, RES, 1)) > 0.5).astype(
            jnp.bfloat16
        ),
        denorm_lower_mask=(jax.random.uniform(k[6], (BATCH, RES, RES, 1)) > 0.5).astype(
            jnp.bfloat16
        ),
    )
    variables = jax.jit(
        lambda: gen.init({"params": rng, "noise": k[7]}, **inputs, noise_mode="none")
    )()

    @jax.jit
    def forward(variables, c, retain, pose, du, dl, dum, dlm):
        img, finetune_img, parsing = gen.apply(
            variables, None, c, retain, pose, du, dl, dum, dlm, noise_mode="none"
        )
        return finetune_img

    args = (
        variables,
        inputs["c"],
        inputs["retain"],
        inputs["pose"],
        inputs["denorm_upper_input"],
        inputs["denorm_lower_input"],
        inputs["denorm_upper_mask"],
        inputs["denorm_lower_mask"],
    )

    for _ in range(WARMUP):
        jax.block_until_ready(forward(*args))

    profile_dir = os.environ.get("PASTA_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    if profile_dir:
        jax.profiler.stop_trace()

    # Guard against the axon relay's unreliable completion barrier (see
    # .claude/skills/verify/SKILL.md): if the queued measurement is physically
    # implausible (model is ~364 GFLOP/img; < 1 ms/img is impossible), fall
    # back to forced per-iteration scalar readbacks.
    if dt / ITERS < BATCH * 1e-3:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = forward(*args)
            float(jnp.sum(out))  # true completion barrier (scalar readback)
        dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "256px try-on inference throughput (GeneratorFull, batch 16, bf16)",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / REF_ANCHOR_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""PASTA-GAN-TPU: a TPU-native (JAX / XLA / Pallas / pjit) virtual try-on framework.

A from-scratch rebuild of the capabilities of PASTA-GAN ("Towards Scalable
Unpaired Virtual Try-On via Patch-Routed Spatially-Adaptive GAN", NeurIPS 2021,
reference implementation: a StyleGAN2-ADA-PyTorch fork).  Nothing here is a
translation of the reference's CUDA/C++/torch code: the compute path is
jnp/lax/Pallas in NHWC layout, parallelism is `jax.sharding.Mesh` + `shard_map`
over ICI, and the runtime is functional (explicit param pytrees, optax, orbax).

Package map (mirrors SURVEY.md section 7):
    ops/       L0-L1: upfirdn2d / bias_act / conv2d_resample (+ Pallas kernels)
    nn/        L3 core modules: eq-lr layers, modulated conv, mapping,
               synthesis blocks, SPADE, encoders, discriminator
    models/    Generator/Discriminator assemblies + registry
    data/      patch routing (homography math + on-device warps), stickman,
               masks, datasets, packing tool
    train/     losses (GAN/L1/VGG/CE/R1), ADA, EMA, train steps, loop
    parallel/  mesh + sharding helpers (DP over ICI)
    metrics/   FID/KID/IS/PPL/PR + feature statistics
    io/        orbax checkpoints + PyTorch pickle converter
    runtime/   configs/presets, cross-device stats, logging
    cli/       train / test / test_512 / calc_metrics / dataset_tool
"""

__version__ = "0.1.0"

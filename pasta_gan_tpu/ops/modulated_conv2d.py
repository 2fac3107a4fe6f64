"""Style-modulated convolution — THE core StyleGAN2 op, redesigned for TPU.

Counterpart of `training/networks.py:36-94` (`modulated_conv2d`) and
`training/networks.py:1992-2056` (`spade_modulated_conv2d`).

TPU-first design notes
----------------------
The reference has two execution paths:

* "fused": materializes per-sample weights `[N, O, I, kh, kw]` and runs a
  grouped conv with `groups=N`.  Grouped convs fragment the MXU and the
  per-sample weight tensor is O(N·O·I·k²) HBM traffic — bad on TPU.
* "non-fused": scales activations by styles before the conv and by the
  demodulation coefficients after.  Mathematically identical (convolution is
  linear in per-input-channel scale), and it keeps ONE dense conv with shared
  weights — exactly what the MXU wants.

We therefore implement only the scaled-activation form.  Additionally, the
reference computes demodulation coefficients by materializing the modulated
per-sample weights even on this path (`networks.py:65-68`); we avoid that with
the algebraic identity

    dcoef[n,o] = rsqrt( sum_{i,k} (w[o,i,k] * s[n,i])^2 + eps )
               = rsqrt( sum_i s[n,i]^2 * (sum_k w[o,i,k]^2) + eps )

i.e. a single tiny `[N,I] @ [I,O]` matmul instead of an `[N,O,I,kh,kw]`
intermediate.  The `fused_modconv` argument is accepted for API parity and
ignored.

`prenorm_for_half` reproduces the reference's fp16 overflow pre-normalization
(`networks.py:56-59`) when computing in bf16/fp16; with bf16's fp32-range
exponent it is rarely needed but kept for parity/testing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .conv2d_resample import conv2d_resample


def modulated_conv2d(
    x: jax.Array,  # [N, H, W, I]
    weight: jax.Array,  # [kh, kw, I, O] (HWIO)
    styles: jax.Array,  # [N, I]
    noise: Optional[jax.Array] = None,  # broadcastable to the output
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jax.Array] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
    fused_modconv: bool = False,  # accepted for parity; scaled-activation path always
    spade_styles: Optional[jax.Array] = None,  # [N, H, W, I] spatial styles (SPADE variant)
    prenorm_for_half: bool = True,
) -> jax.Array:
    del fused_modconv
    N = x.shape[0]
    kh, kw, in_channels, out_channels = weight.shape
    assert x.shape[-1] == in_channels, (x.shape, weight.shape)
    assert styles.shape == (N, in_channels), (styles.shape, (N, in_channels))

    # Overflow pre-normalization for half-precision compute (networks.py:56-59).
    if prenorm_for_half and x.dtype in (jnp.float16, jnp.bfloat16) and demodulate:
        wmax = jnp.max(jnp.abs(weight), axis=(0, 1, 2), keepdims=True)  # per-O
        weight = weight * (
            1.0 / jnp.sqrt(jnp.asarray(in_channels * kh * kw, weight.dtype)) / (wmax + 1e-8)
        )
        smax = jnp.max(jnp.abs(styles), axis=1, keepdims=True)
        styles = styles / (smax + 1e-8)

    dcoefs = None
    if demodulate:
        w32 = weight.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        w_sq = jnp.sum(w32 * w32, axis=(0, 1))  # [I, O]
        dcoefs = jax.lax.rsqrt(
            jnp.matmul(s32 * s32, w_sq, preferred_element_type=jnp.float32) + 1e-8
        )  # [N, O]

    # Modulate activations (per-sample input-channel scale == per-sample weight).
    if spade_styles is not None:
        # SPADE variant (networks.py:2033-2036): blend spatial and channel styles.
        assert spade_styles.shape == x.shape, (spade_styles.shape, x.shape)
        x = x * ((spade_styles.astype(x.dtype) + styles.astype(x.dtype)[:, None, None, :]) * 0.5)
    else:
        x = x * styles.astype(x.dtype)[:, None, None, :]

    x = conv2d_resample(
        x,
        weight,
        f=resample_filter,
        up=up,
        down=down,
        padding=padding,
        flip_weight=flip_weight,
    )

    if demodulate:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x

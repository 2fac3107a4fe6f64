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

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .conv2d_resample import conv2d_resample
from .packing import conv_packed_same, conv_packed_up2, pack_vector


def modulated_conv2d(
    x: jax.Array,  # [N, H, W, I] (packed_in: [N, H, W/2, 2I])
    weight: jax.Array,  # [kh, kw, I, O] (HWIO) — always UNPACKED (checkpoint layout)
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
    packed_in: bool = False,  # x is W-packed (ops/packing.py)
    packed_out: bool = False,  # emit W-packed output
    quant: Optional[str] = None,  # int8 serving mode (ops/quant.py)
    quant_site: Optional[Callable] = None,  # called with the MODULATED tensor;
    # returns a precomputed act scale (static/calib modes) or None (dynamic).
    # Styles make per-sample ranges, so the caller owns the scale policy.
) -> jax.Array:
    """W-packed modes (TPU lane/MXU utilization for <=64-channel tensors, see
    ops/packing.py): supported combinations are (packed_in, packed_out) ==
    (True, True) for up=down=1 convs, and (False, True) for the up=2 path
    (the FIR low-pass folds into one lhs-dilated phase-split conv).  `noise`
    in packed mode must broadcast against the packed output
    ([N, H, W/2, 2] for per-pixel noise)."""
    del fused_modconv
    N = x.shape[0]
    kh, kw, in_channels, out_channels = weight.shape
    if packed_in:
        assert up == 1 and down == 1 and spade_styles is None
        assert x.shape[-1] == 2 * in_channels, (x.shape, weight.shape)
    else:
        assert x.shape[-1] == in_channels, (x.shape, weight.shape)
    if packed_out and not packed_in:
        assert up == 2 and down == 1 and not flip_weight and spade_styles is None
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
    elif packed_in:
        x = x * pack_vector(styles).astype(x.dtype)[:, None, None, :]
    else:
        x = x * styles.astype(x.dtype)[:, None, None, :]

    from .quant import is_int8

    def _site(xm):
        # only invoked on branches that run int8 (keeps calib/static site
        # sets identical and avoids dead amax passes on fp fallbacks)
        return quant_site(xm) if (quant_site is not None and is_int8(quant)) else None

    if packed_in and packed_out:
        x = conv_packed_same(x, weight, quant=quant, act_scale=_site(x))
    elif packed_out:  # up=2 folded path (asserts above pin the convention)
        assert resample_filter is not None and padding == kh // 2
        x = conv_packed_up2(x, weight, resample_filter, quant=quant, act_scale=_site(x))
    elif (
        up == 2 and down == 1 and not flip_weight and resample_filter is not None
        and kh == 3 and kw == 3 and padding == 1
        and resample_filter.shape == (4, 4)
        and x.shape[1] >= 32  # low-res blocks: the [6,6,I,O] fold tensor
        # would outweigh the tiny upfirdn intermediate it replaces
    ):
        # Fold the FIR into the conv (one lhs-dilated 6x6 conv) instead of
        # materializing the 2x-res in_channels upfirdn intermediate — the
        # dominant HBM cost of every up-layer (ops/packing.py docstring).
        from .packing import fold_up_weights

        G = fold_up_weights(weight, resample_filter, gain=4.0)
        if is_int8(quant):
            from .quant import int8_conv2d

            x = int8_conv2d(
                x, G, padding=(3, 3, 3, 3), lhs_dilation=(2, 2), out_dtype=x.dtype,
                act_scale=_site(x),
            )
        else:
            x = jax.lax.conv_general_dilated(
                x, G.astype(x.dtype), (1, 1), ((3, 3), (3, 3)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
    elif is_int8(quant) and up == 1 and down == 1:
        from .quant import int8_conv2d

        x = int8_conv2d(
            x,
            weight,
            padding=(padding, padding, padding, padding),
            flip_weight=flip_weight,
            out_dtype=x.dtype,
            act_scale=_site(x),
        )
    else:
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
        d = pack_vector(dcoefs) if packed_out else dcoefs
        x = x * d.astype(x.dtype)[:, None, None, :]
    if noise is not None:
        if packed_out and noise.shape[-1] == 2:
            # per-pixel noise in packed layout: channel block j gets noise[..., j]
            s = x.shape
            x = (x.reshape(s[:-1] + (2, out_channels)) + noise.astype(x.dtype)[..., None]).reshape(s)
        else:
            x = x + noise.astype(x.dtype)
    return x

"""int8 serving-mode convolution for the SPADE chain + synthesis pyramid.

The reference serves fp16 (`test.sh` batch-16 inference path,
`training/networks.py:56-59` fp16 pre-normalization).  On TPU v5e the MXU has
a 2x int8 mode (~394 TOPS vs ~197 bf16 TFLOPS), and XLA lowers
s8 x s8 -> s32 `conv_general_dilated` onto it natively — measured at ~383
effective TOP/s for the SPADE-chain conv shapes when the quantize /
dequantize elementwise work fuses into the surrounding ops.

Scheme (weight-static, activation-dynamic — standard W8A8):
* weights: symmetric per-OUTPUT-CHANNEL int8.  Scales come from the already
  gain-scaled fp32 weights, so equalized-LR is preserved exactly.
* activations: symmetric PER-SAMPLE dynamic int8 (`amax / 127`).  Convolution
  is linear per sample, so the scale factors out of the conv and the dequant
  is a cheap fused multiply.  Per-sample (not per-tensor) matters for
  style-modulated convs where per-sample style gains vary widely.
* accumulation on the MXU, emitted directly as the requested float dtype
  (`preferred_element_type=bf16/f32`): f32 emission is bit-identical to the
  s32 + dequant path, bf16 emission differs only by output rounding
  (~1.3e-3, K-independent — measured K=576..4608), and the dequant multiply
  plus the NEXT site's static quantize collapse into one elementwise fusion
  (the fused dequant-conv-quant epilogue; VERDICT r3 #6).

This is a SERVING mode: numerics differ from the bf16/fp32 parity contract
(quantization error ~1e-2 relative per conv), so it is opt-in via
`quant="int8"` on the generator configs and `--quant int8` on the test CLIs,
and is validated by distribution-level checks (pixel deltas + FID proxy in
`scripts/quality_regression.py`) rather than the elementwise parity suite.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp


class QuantizedActivation(NamedTuple):
    """An activation already quantized to int8 with its dequant scale.

    Pass this in place of a float activation to `int8_conv_like` /
    `int8_conv2d` to reuse ONE quantize pass across several consumer convs.
    Per-site scales defeat XLA CSE (quantize(x, s1) != quantize(x, s2)), so
    sharing must be structural: the profiled static-mode forward spent ~6 ms
    of 32 re-quantizing the same SPADE tensors per consumer (BASELINE.md
    round-3 serving section).
    """

    q: jax.Array  # int8, same shape as the original activation
    scale: jax.Array  # f32 dequant scale, broadcastable ([N,1,1,1] or scalar)


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of an HWIO weight.

    Returns (w_q int8 [kh,kw,I,O], scale fp32 [O]).
    """
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-sample dynamic int8 quantization of an NHWC activation.

    Returns (x_q int8, scale fp32 [N,1,1,1]).
    """
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return xq, s


INT8_MODES = ("int8", "int8_calib", "int8_static")


def is_int8(quant) -> bool:
    return quant in INT8_MODES


def module_act_scale(mod, x: jax.Array, quant: str):
    """Resolve the activation scale for a quantized conv site inside a Flax
    module.

    * "int8"        -> None (dynamic per-sample amax inside the op),
    * "int8_calib"  -> running per-site amax stored in the "quant_scales"
                       collection (apply with mutable=["quant_scales"]);
                       the scale USED is the current batch amax, so calib
                       outputs match the dynamic mode,
    * "int8_static" -> the frozen calibrated scale: quantization becomes a
                       pure elementwise op (no reduction pass — the dynamic
                       amax reductions measured ~15 ms/batch-16 on the
                       GeneratorFull forward, BASELINE.md round-3).
    """
    import jax.numpy as _jnp

    if quant == "int8":
        return None
    amax = mod.variable("quant_scales", "act_amax", lambda: _jnp.zeros((), _jnp.float32))
    if quant == "int8_calib":
        cur = _jnp.max(_jnp.abs(x.astype(_jnp.float32)))
        if not mod.is_initializing():
            amax.value = _jnp.maximum(amax.value, cur)
        return _jnp.maximum(cur, 1e-12) / 127.0
    assert quant == "int8_static", quant
    return _jnp.maximum(amax.value, 1e-12) / 127.0


def quantize_act_with_scale(x: jax.Array, s: jax.Array):
    """Quantize with a PRECOMPUTED scale (static serving mode): pure
    elementwise — fuses into the producer's epilogue, no reduction pass."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return xq, s


def quantize_act_for(mod, x: jax.Array, quant: str) -> QuantizedActivation:
    """Quantize an activation ONCE at a module site for sharing across all
    consumer convs (mode dispatch: dynamic / calib / static)."""
    s = module_act_scale(mod, x, quant)
    if s is None:
        xq, sx = quantize_act(x)
    else:
        xq, sx = quantize_act_with_scale(x, s)
    return QuantizedActivation(xq, sx)


def int8_conv_like(
    x: Union[jax.Array, QuantizedActivation],  # [N, H, W, I] float | pre-quantized
    w: jax.Array,  # [kh, kw, I, O] float (assembled/gain-scaled; correlation)
    *,
    window_strides: Tuple[int, int] = (1, 1),
    padding_hw=((0, 0), (0, 0)),  # ((py0, py1), (px0, px1)) — lax conv order
    lhs_dilation: Optional[Tuple[int, int]] = None,
    out_dtype=jnp.bfloat16,
    act_scale: Optional[jax.Array] = None,  # static scale; None -> dynamic amax
) -> jax.Array:
    """W8A8 drop-in for a `lax.conv_general_dilated(NHWC, HWIO)` call."""
    wq, sw = quantize_weight(w)
    if isinstance(x, QuantizedActivation):
        xq, sx = x
    elif act_scale is not None:
        xq, sx = quantize_act_with_scale(x, act_scale)
    else:
        xq, sx = quantize_act(x)
    # Emit the accumulator as the requested float dtype instead of s32: the
    # MXU still accumulates exactly (f32 emission is BIT-IDENTICAL to the
    # s32 path; bf16 emission differs only by output rounding, ~1.3e-3,
    # independent of K — measured across K=576..4608), but the conv writes
    # 2 B/elt instead of 4 and the dequant multiply + the NEXT site's
    # static quantize collapse into ONE elementwise fusion (read 2B,
    # write 1B).  This is the "fused dequant-conv-quant epilogue" — the
    # s32 path cost 13 B/elt of inter-conv HBM traffic (s32 out 4 +
    # dequant 4+2 + quantize 2+1), which is why int8 LOST to bf16 at 512
    # (BASELINE.md round-3/4 512 section).
    od = jnp.dtype(out_dtype)
    pet = od if od in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)) else jnp.float32
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=window_strides,
        padding=padding_hw,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    )
    return (y * (sx * sw)).astype(out_dtype)


def int8_conv2d(
    x: Union[jax.Array, QuantizedActivation],  # [N, H, W, I] float | pre-quantized
    w: jax.Array,  # [kh, kw, I, O] float (HWIO, already gain-scaled)
    *,
    padding: Tuple[int, int, int, int] = (0, 0, 0, 0),  # (px0, px1, py0, py1)
    stride: int = 1,
    lhs_dilation: Optional[Tuple[int, int]] = None,
    flip_weight: bool = True,
    out_dtype=jnp.bfloat16,
    act_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """W8A8 convolution with int32 accumulation and fused dequant.

    Matches `ops.conv2d_resample._conv2d` semantics (up to quantization
    error): `flip_weight=True` is correlation, False flips spatially.
    """
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    px0, px1, py0, py1 = padding
    return int8_conv_like(
        x,
        w,
        window_strides=(stride, stride),
        padding_hw=((py0, py1), (px0, px1)),
        lhs_dilation=lhs_dilation,
        out_dtype=out_dtype,
        act_scale=act_scale,
    )

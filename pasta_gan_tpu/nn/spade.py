"""SPADE texture-refinement blocks (reference `training/networks.py:4304-4426,5229-5273`).

`SpadeConv2dLayer` is an *act-then-conv* layer (the activation runs before the
convolution, gated by `no_act`), `SpadeNormBlock` is InstanceNorm modulated by
gamma/beta predicted from denormalized garment features, and `SpadeResBlock`
wires three of them with a gain-0.5 skip.  `feat_multiplier=2` gives the V2
blocks used by the Full cluster (upper+lower features concatenated,
`networks.py:5257-5260`).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import bias_act, conv2d_resample
from .layers import Conv2dLayer, activation_funcs, instance_norm_2d, _resample_filter_const


class SpadeConv2dLayer(nn.Module):
    """Act-then-conv equalized-LR layer (reference `networks.py:4304-4354`)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "relu"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    quant: Optional[str] = None  # "int8" serving mode (ops/quant.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, gain: float = 1.0, no_act: bool = False) -> jax.Array:
        """`x` may be a `QuantizedActivation` (shared pre-quantized input,
        int8 modes with no_act=True only)."""
        from ..ops.quant import QuantizedActivation, is_int8

        k = self.kernel_size
        w = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (k, k, self.in_channels, self.out_channels),
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        if not no_act:
            assert not isinstance(x, QuantizedActivation)
            act_gain = activation_funcs[self.activation].def_gain * gain
            act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
            x = bias_act(x, b, axis=-1, act=self.activation, gain=act_gain, clamp=act_clamp)

        if is_int8(self.quant) and self.up == 1 and self.down == 1:
            from ..ops.quant import int8_conv2d, module_act_scale

            return int8_conv2d(
                x,
                w * weight_gain,
                padding=(k // 2, k // 2, k // 2, k // 2),
                out_dtype=self.dtype,
                act_scale=None if isinstance(x, QuantizedActivation)
                else module_act_scale(self, x, self.quant),
            )
        assert not isinstance(x, QuantizedActivation)
        f = jnp.asarray(_resample_filter_const(self.resample_filter))
        return conv2d_resample(
            x.astype(self.dtype),
            (w * weight_gain).astype(self.dtype),
            f=f if (self.up > 1 or self.down > 1) else None,
            up=self.up,
            down=self.down,
            padding=k // 2,
            flip_weight=(self.up == 1),
        )


class SpadeNormBlock(nn.Module):
    """InstanceNorm * (1+gamma) + beta with gamma/beta from denorm features
    (reference `networks.py:4357-4379`)."""

    in_channels: int  # channels of the denorm feature map
    norm_channels: int  # channels of x
    quant: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, denorm_feats) -> jax.Array:
        """`denorm_feats` may arrive pre-quantized (QuantizedActivation) —
        SpadeResBlock shares one quantize pass across its three norm blocks."""
        from ..ops.quant import is_int8, quantize_act_for

        normalized = instance_norm_2d(x)
        common = dict(quant=self.quant, dtype=self.dtype)
        actv = SpadeConv2dLayer(
            self.in_channels, self.norm_channels, 3, use_bias=False,
            name="conv_mlp", **common,
        )(denorm_feats, no_act=True)
        actv = jax.nn.relu(actv)
        if is_int8(self.quant):
            # one quantize pass feeds both gamma and beta convs
            actv = quantize_act_for(self, actv, self.quant)
        gamma = SpadeConv2dLayer(
            self.norm_channels, self.norm_channels, 3, use_bias=False,
            name="conv_gamma", **common,
        )(actv, no_act=True)
        beta = SpadeConv2dLayer(
            self.norm_channels, self.norm_channels, 3, use_bias=False,
            name="conv_beta", **common,
        )(actv, no_act=True)
        return normalized * (1 + gamma) + beta


class QuantizeSite(nn.Module):
    """A named activation-quantization site: quantizes once (with its own
    calibrated scale in the "quant_scales" collection) so several consumer
    convs share one quantize pass (ops/quant.py QuantizedActivation)."""

    quant: str

    @nn.compact
    def __call__(self, x: jax.Array):
        from ..ops.quant import quantize_act_for

        return quantize_act_for(self, x, self.quant)


class SpadeResBlock(nn.Module):
    """SPADE residual block (reference `networks.py:4382-4426` / V2 `:5229-5273`).

    feat_multiplier=1 -> Spade_ResBlock; 2 -> Spade_ResBlockV2 (doubled denorm
    feature channels: upper and lower branches concatenated).
    """

    in_channels: int
    out_channels: int
    resolution: int = 128
    feat_multiplier: int = 1
    conv_clamp: Optional[float] = None
    quant: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, denorm_feat) -> jax.Array:
        from ..ops.quant import QuantizedActivation, is_int8, quantize_act_for

        feat_channels = (128 if self.resolution == 128 else 64) * self.feat_multiplier
        common = dict(conv_clamp=self.conv_clamp, quant=self.quant, dtype=self.dtype)

        if is_int8(self.quant) and not isinstance(denorm_feat, QuantizedActivation):
            # one quantize pass feeds all three norm blocks' conv_mlp
            # (callers may hoist further and pass a QuantizedActivation)
            denorm_feat = quantize_act_for(self, denorm_feat, self.quant)

        x = SpadeConv2dLayer(
            self.in_channels, self.in_channels, 3, use_bias=False, name="conv", **common
        )(x, no_act=True)

        y = SpadeNormBlock(
            feat_channels, self.in_channels, quant=self.quant, dtype=self.dtype, name="spade_skip"
        )(x, denorm_feat)
        y = SpadeConv2dLayer(
            self.in_channels, self.out_channels, 1, use_bias=False, name="skip", **common
        )(y, gain=math.sqrt(0.5))

        h = SpadeNormBlock(
            feat_channels, self.in_channels, quant=self.quant, dtype=self.dtype, name="spade0"
        )(x, denorm_feat)
        h = SpadeConv2dLayer(
            self.in_channels, self.out_channels, 3, use_bias=False, name="conv0", **common
        )(h)
        h = SpadeNormBlock(
            feat_channels, self.out_channels, quant=self.quant, dtype=self.dtype, name="spade1"
        )(h, denorm_feat)
        h = SpadeConv2dLayer(
            self.out_channels, self.out_channels, 3, use_bias=False, name="conv1", **common
        )(h, gain=math.sqrt(0.5))
        return y + h

"""Core equalized-LR building blocks (reference: `training/networks.py:30-660`).

All modules are flax.linen, NHWC activations, HWIO conv weights, fp32 params
with an optional compute `dtype` (bf16 on TPU).  Equalized learning rate is
implemented exactly like the reference: parameters are initialized N(0,1)
(divided by `lr_multiplier` for FC layers) and scaled at *runtime* by
`gain = lr_multiplier / sqrt(fan_in)`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.bias_act import activation_funcs, bias_act
from ..ops.conv2d_resample import conv2d_resample
from ..ops.upfirdn2d import setup_filter

Dtype = Any


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """PixelNorm (reference `networks.py:30-32`)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def instance_norm_2d(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d(affine=False) over NHWC (torch nn.InstanceNorm2d semantics)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _resample_filter_const(taps: Sequence[float]) -> np.ndarray:
    """Static [fh,fw] filter baked at trace time (reference setup_filter buffer)."""
    f = np.asarray(taps, dtype=np.float32)
    if f.ndim == 1:
        f = np.outer(f, f)
    f = f / f.sum()
    return f


class FullyConnectedLayer(nn.Module):
    """Equalized-LR linear (reference `networks.py:98-128`)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s, jnp.float32) / self.lr_multiplier,
            (self.out_features, self.in_features),
        )
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features)
        w = w.astype(self.dtype) * weight_gain
        x = jnp.matmul(x.astype(self.dtype), w.T)
        b = None
        if self.use_bias:
            b = self.param(
                "bias", lambda k, s: jnp.full(s, self.bias_init, jnp.float32), (self.out_features,)
            )
            if self.lr_multiplier != 1.0:
                b = b * self.lr_multiplier
        return bias_act(x, b, axis=-1, act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-LR conv + resample + bias_act (reference `networks.py:132-179`).

    `trainable=False` (freeze-D) is recorded; actual freezing is an optimizer
    mask concern in this framework (see train/).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True
    # W-packing (ops/packing.py): None | "same" (packed in&out, up=down=1) |
    # "out_stride" (unpacked in -> packed out, same res) | "in_down2"
    # (packed in -> unpacked out, down=2).  packed_groups: with "same" k=1,
    # the input is a plain concat of separately packed groups of these sizes.
    pack_mode: Optional[str] = None
    packed_groups: Optional[tuple] = None
    quant: Optional[str] = None  # "int8"|"int8_calib"|"int8_static" (ops/quant.py)
    dtype: Dtype = jnp.float32

    def _act_scale(self, x, q):
        if q is None:
            return None
        from ..ops.quant import module_act_scale

        return module_act_scale(self, x, q)

    @nn.compact
    def __call__(self, x, gain: float = 1.0) -> jax.Array:
        """`x` may be a `QuantizedActivation` (int8 modes only): a shared
        pre-quantized input, e.g. ResBlock feeding skip+conv0 one quantize."""
        from ..ops.quant import QuantizedActivation, is_int8

        k = self.kernel_size
        w = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (k, k, self.in_channels, self.out_channels),
        )
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        ws = (w * weight_gain).astype(self.dtype)
        packed_out = self.pack_mode in ("same", "out_stride")

        q = self.quant if is_int8(self.quant) else None
        xq_in = isinstance(x, QuantizedActivation)
        assert not xq_in or q is not None
        site = (lambda t: None if xq_in else self._act_scale(t, q))
        if self.pack_mode in ("same", "out_stride"):
            assert self.up == 1 and self.down == 1, self.pack_mode
            from ..ops import packing as pk

            if not xq_in:
                x = x.astype(self.dtype)
            if self.pack_mode == "out_stride":
                x = pk.conv_packed_out_stride(x, ws, quant=q, act_scale=site(x),
                                              out_dtype=self.dtype)
            elif self.packed_groups is not None:
                assert k == 1
                wp = pk.pack_conv1_weights_grouped(ws, self.packed_groups)
                if q is not None:
                    from ..ops.quant import int8_conv_like

                    x = int8_conv_like(
                        x, wp, out_dtype=self.dtype, act_scale=site(x)
                    )
                else:
                    x = jax.lax.conv_general_dilated(
                        x, wp, (1, 1), ((0, 0), (0, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
            else:
                x = pk.conv_packed_same(x, ws, quant=q, act_scale=site(x),
                                        out_dtype=self.dtype)
        elif self.pack_mode == "in_down2":
            assert self.up == 1 and self.down == 2
            from ..ops import packing as pk

            f = jnp.asarray(_resample_filter_const(self.resample_filter))
            if not xq_in:
                x = x.astype(self.dtype)
            x = pk.conv_packed_in_down2(
                x, ws, f, flip_weight=True, quant=q,
                act_scale=site(x), out_dtype=self.dtype,
            )
        elif q is not None and self.up == 1 and self.down == 1:
            from ..ops.quant import int8_conv2d

            x = int8_conv2d(
                x, w * weight_gain, padding=(k // 2,) * 4, out_dtype=self.dtype,
                act_scale=site(x),
            )
        elif q is not None and self.up == 1 and self.down == 2:
            assert not xq_in  # FIR pre-pass needs the float activation
            # FIR low-pass stays fp (depthwise, cheap); the dense strided conv
            # carries the FLOPs and runs int8 (same split as conv2d_resample).
            from ..ops.quant import int8_conv2d
            from ..ops.upfirdn2d import upfirdn2d

            fw = len(self.resample_filter)
            p = (
                k // 2 + (fw - 2 + 1) // 2,
                k // 2 + (fw - 2) // 2,
                k // 2 + (fw - 2 + 1) // 2,
                k // 2 + (fw - 2) // 2,
            )
            f = jnp.asarray(_resample_filter_const(self.resample_filter))
            xf = upfirdn2d(x.astype(self.dtype), f, padding=p)
            x = int8_conv2d(
                xf, w * weight_gain, stride=2, out_dtype=self.dtype,
                act_scale=self._act_scale(xf, q),
            )
        else:
            assert self.pack_mode is None, self.pack_mode
            assert not xq_in
            f = jnp.asarray(_resample_filter_const(self.resample_filter))
            x = conv2d_resample(
                x.astype(self.dtype),
                ws,
                f=f if (self.up > 1 or self.down > 1) else None,
                up=self.up,
                down=self.down,
                padding=k // 2,
                flip_weight=(self.up == 1),
            )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        if packed_out and b is not None:
            from ..ops.packing import pack_vector

            b = pack_vector(b)
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, axis=-1, act=self.activation, gain=act_gain, clamp=act_clamp)


class ResBlock(nn.Module):
    """Residual block with gain-0.5 skip (reference `networks.py:528-558`).

    Note: the reference accepts a `kernel_size` argument but hardcodes 3x3
    convolutions internally; we reproduce that behavior.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3  # accepted for parity; convs are 3x3 like the reference
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    # W-packing: None | "same" (packed in/out, up=down=1) | "in_down2"
    # (packed in, down=2, unpacked out — conv1 runs unpacked at half res)
    pack_mode: Optional[str] = None
    quant: Optional[str] = None  # "int8" serving mode
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.pack_mode == "same":
            assert self.up == 1 and self.down == 1
        elif self.pack_mode == "in_down2":
            assert self.up == 1 and self.down == 2
        common = dict(
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
            quant=self.quant, dtype=self.dtype,
        )
        pm_down = self.pack_mode  # skip/conv0 carry the down (or same) mode
        pm_conv1 = "same" if self.pack_mode == "same" else None

        from ..ops.quant import is_int8, quantize_act_for

        if (is_int8(self.quant) and self.up == 1
                and (self.down == 1 or self.pack_mode == "in_down2")):
            # skip and conv0 both consume x: one shared quantize pass
            # (per-site scales otherwise defeat CSE — two full passes)
            x = quantize_act_for(self, jnp.asarray(x).astype(self.dtype), self.quant)
        y = Conv2dLayer(
            self.in_channels, self.out_channels, 1, use_bias=False,
            up=self.up, down=self.down, pack_mode=pm_down, name="skip", **common,
        )(x, gain=math.sqrt(0.5))
        x = Conv2dLayer(
            self.in_channels, self.out_channels, 3, activation=self.activation,
            up=self.up, down=self.down, pack_mode=pm_down, name="conv0", **common,
        )(x)
        x = Conv2dLayer(
            self.out_channels, self.out_channels, 3, activation=self.activation,
            pack_mode=pm_conv1, name="conv1", **common,
        )(x, gain=math.sqrt(0.5))
        return y + x


class MinibatchStdLayer(nn.Module):
    """Minibatch standard deviation (reference `networks.py:1000-1022`).

    Group statistics are computed over the *local* (per-shard) batch, which
    under shard_map data-parallelism matches the reference's per-GPU behavior.
    """

    group_size: Optional[int] = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        N, H, W, C = x.shape
        G = min(self.group_size, N) if self.group_size is not None else N
        F = self.num_channels
        c = C // F
        y = x.reshape(G, N // G, H, W, F, c).astype(jnp.float32)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 4))  # [n, F]
        y = y.astype(x.dtype)
        y = jnp.tile(y[:, None, None, :], (G, H, W, 1))
        return jnp.concatenate([x, y], axis=-1)


class SpaceToDepth(nn.Module):
    """[N, H, W, C] -> [N, H/b, W/b, C*b*b] (reference `networks.py:583-591`,
    torch unfold order: channel-major within each block)."""

    block_size: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = self.block_size
        N, H, W, C = x.shape
        x = x.reshape(N, H // b, b, W // b, b, C)
        # torch unfold yields [C, b, b] blocks; channel-major first
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
        return x.reshape(N, H // b, W // b, C * b * b)


class DenseNorm(nn.Module):
    """Linear + InstanceNorm + LeakyReLU(0.01), the reference's `Dense`
    (`networks.py:594-611`; torch-default inits, not equalized-LR)."""

    in_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="linear")(x)
        x = instance_norm_2d(x)
        return jax.nn.leaky_relu(x, 0.01)


class SelfAttention(nn.Module):
    """Spatial self-attention with max-pooled phi/g (reference `networks.py:613-643`)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.channels
        N, H, W, C = x.shape
        conv = lambda c, name: nn.Conv(
            c, (1, 1), use_bias=False, dtype=self.dtype, name=name
        )
        theta = conv(ch // 8, "theta")(x)  # [N,H,W,ch/8]
        phi = nn.max_pool(conv(ch // 8, "phi")(x), (2, 2), strides=(2, 2))
        g = nn.max_pool(conv(ch // 2, "g")(x), (2, 2), strides=(2, 2))

        theta = theta.reshape(N, H * W, ch // 8)
        phi = phi.reshape(N, (H * W) // 4, ch // 8)
        g = g.reshape(N, (H * W) // 4, ch // 2)
        beta = jax.nn.softmax(
            jnp.einsum("nqc,nkc->nqk", theta, phi, preferred_element_type=jnp.float32), axis=-1
        ).astype(x.dtype)
        o = jnp.einsum("nqk,nkc->nqc", beta, g).reshape(N, H, W, ch // 2)
        o = conv(ch, "o")(o)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma.astype(x.dtype) * o + x

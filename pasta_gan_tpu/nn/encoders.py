"""Pose/style encoders (reference `training/networks.py:506-698,4836-4883`)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2dLayer, DenseNorm, FullyConnectedLayer, SelfAttention

Dtype = Any


class ConstEncoderNetwork(nn.Module):
    """Pose(+retain) image -> 4x4 feature map feeding the first synthesis block
    (reference `networks.py:560-579`; GeneratorFull uses n_downsampling=6:
    256 -> 4).  Channel schedule: 64,128,256,256,256,512,512."""

    input_nc: int
    output_nc: int = 512
    ngf: int = 64
    n_downsampling: int = 6
    pack_entry: bool = False  # W-pack the 64ch full-res stage (ops/packing.py)
    quant: Optional[str] = None  # "int8" serving mode
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pk = self.pack_entry
        mult_ins = [1, 2, 4, 4, 4, 8]
        mult_outs = [2, 4, 4, 4, 8, 8]
        x = Conv2dLayer(self.input_nc, self.ngf, 1,
                        pack_mode="out_stride" if pk else None,
                        quant=self.quant, dtype=self.dtype, name="stem")(x)
        for i in range(self.n_downsampling):
            x = Conv2dLayer(
                self.ngf * mult_ins[i],
                self.ngf * mult_outs[i],
                3,
                down=2,
                pack_mode="in_down2" if (pk and i == 0) else None,
                quant=self.quant,
                dtype=self.dtype,
                name=f"down{i}",
            )(x)
        # At the reference configuration (n_downsampling=6) the schedule already
        # ends at output_nc=512 and this projection is skipped, keeping exact
        # parameter-shape parity.  For reduced test/dry-run resolutions a 1x1
        # projection aligns channels with the synthesis pyramid's channels(4).
        last_nc = self.ngf * mult_outs[self.n_downsampling - 1]
        if last_nc != self.output_nc:
            x = Conv2dLayer(last_nc, self.output_nc, 1, dtype=self.dtype, name="proj")(x)
        return x


class FeatureEncoder(nn.Module):
    """Deep downsampling encoder (reference `networks.py:506-524`)."""

    input_nc: int
    output_nc: int = 512
    ngf: int = 64
    n_downsampling: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mult_ins = [1, 2, 4, 4, 8, 8, 8]
        mult_outs = [2, 4, 4, 8, 8, 8, 8]
        x = Conv2dLayer(self.input_nc, self.ngf, 1, dtype=self.dtype, name="stem")(x)
        for i in range(self.n_downsampling):
            x = Conv2dLayer(
                self.ngf * mult_ins[i],
                self.ngf * mult_outs[i],
                3,
                down=2,
                dtype=self.dtype,
                name=f"down{i}",
            )(x)
        return x


class _RetainFeatureEncoder(nn.Module):
    """The `feat_enc` branch shared by the style encoders: 4 convs over the
    retain image yielding multi-resolution cat_feat skip features
    (reference `networks.py:676-691,4861-4876`)."""

    ngf: int = 64
    pack_entry: bool = False  # W-pack the full-res stage (ops/packing.py);
    # feats[0] is then returned PACKED (consumers detect via shape)
    quant: Optional[str] = None  # "int8" serving mode
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, const_input: jax.Array):
        pk = self.pack_entry
        feats = []
        x = Conv2dLayer(3, self.ngf, 3, pack_mode="out_stride" if pk else None,
                        quant=self.quant, dtype=self.dtype, name="conv0")(const_input)
        feats.append(x)
        for i in range(3):
            x = Conv2dLayer(self.ngf, self.ngf, 3, down=2,
                            pack_mode="in_down2" if (pk and i == 0) else None,
                            quant=self.quant, dtype=self.dtype, name=f"down{i}")(x)
            feats.append(x)
        return feats


class StyleEncoderNetworkV16(nn.Module):
    """Patch stack -> 512-d style code + retain cat_feats (reference
    `networks.py:4836-4883`).  No attention (unlike the v1 style encoder).

    Input `x`: [N, 256, 256, input_nc] patch stack; `const_input`: retain image.
    Returns (style [N, output_nc], const_feats list at res /1,/2,/4,/8).
    """

    input_nc: int
    output_nc: int = 512
    ngf: int = 64
    use_attention: bool = False  # True reproduces StyleEncoderNetwork (networks.py:647-698)
    extra_convs: int = 3  # 0 reproduces StyleEncoderNetwork_512 (networks.py:3731-3754)
    pack_entry: bool = False  # W-pack feat_enc's full-res stage
    quant: Optional[str] = None  # "int8" serving mode
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, const_input: jax.Array):
        const_feats = _RetainFeatureEncoder(
            self.ngf, pack_entry=self.pack_entry, quant=self.quant,
            dtype=self.dtype, name="feat_enc"
        )(const_input)

        ngf = self.ngf
        # With attention (the v1 encoder) the torch Sequential indices shift,
        # so module names carry the literal reference indices (the converter's
        # dotted-name pass-through, io/torch_import.py) instead of the fixed
        # V16 name map.
        idx = [0]

        def nm(default: str) -> str:
            name = f"model.{idx[0]}" if self.use_attention else default
            idx[0] += 1
            return name

        x = Conv2dLayer(self.input_nc, ngf, 1, dtype=self.dtype, name=nm("stem"))(x)
        mult_ins = [1, 2, 4]
        mult_outs = [2, 4, 8]
        for i in range(3):
            if self.use_attention and i == 2:
                x = SelfAttention(ngf * mult_ins[i], dtype=self.dtype, name=nm(f"attn{i}"))(x)
            x = DenseNorm(ngf * mult_ins[i], ngf * mult_ins[i], dtype=self.dtype, name=nm(f"dense{i}"))(x)
            x = Conv2dLayer(
                ngf * mult_ins[i], ngf * mult_outs[i], 3, down=2,
                quant=self.quant, dtype=self.dtype, name=nm(f"down{i}")
            )(x)
        for i in range(self.extra_convs):
            x = DenseNorm(ngf * 8, ngf * 8, dtype=self.dtype, name=nm(f"dense{i + 3}"))(x)
            x = Conv2dLayer(ngf * 8, ngf * 8, 3, quant=self.quant,
                            dtype=self.dtype, name=nm(f"conv{i + 3}"))(x)

        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        x = FullyConnectedLayer(self.output_nc, self.output_nc, dtype=self.dtype, name="fc")(x)
        return x, const_feats


class StyleEncoderNetwork(StyleEncoderNetworkV16):
    """v1 style encoder = V16 + self-attention before the last downsampling
    (reference `networks.py:647-698`)."""

    use_attention: bool = True

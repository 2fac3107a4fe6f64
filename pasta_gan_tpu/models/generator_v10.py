"""GeneratorV10 — the spade-modulated-conv cluster.

Counterpart of reference `training/networks.py:2059-2448`: synthesis layers
whose modulation style is the AVERAGE of the per-sample channel style and a
SPATIAL style predicted from multi-scale denorm-garment features
(`spade_modulated_conv2d`, `networks.py:1992-2056` — our
ops/modulated_conv2d `spade_styles` path).  In this cluster only the res-64
block's two convs are spade-modulated (`:2092-2096,2252-2255`); the style
encoder carries three branches (style stack, retain cat_feats, denorm spade
pyramid `:2337-2400`), and the output is the coarse image only.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoders import ConstEncoderNetwork
from ..nn.layers import (
    Conv2dLayer,
    DenseNorm,
    FullyConnectedLayer,
    ResBlock,
    _resample_filter_const,
    activation_funcs,
)
from ..nn.mapping import MappingNetwork
from ..nn.synthesis import SynthesisLayer, ToRGBLayer
from ..ops import bias_act, modulated_conv2d, upsample2d

Dtype = Any


class SynthesisLayerSpade(nn.Module):
    """SynthesisLayerV10 (`networks.py:2059-2122`): modulated conv whose style
    blends with a spatial style from denorm features when provided."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    spade_feat_channels: Optional[int] = None  # channels of denorm_feat input
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w, denorm_feat=None, noise_mode="random", gain=1.0,
                 spade_mask=None):
        assert noise_mode in ("random", "const", "none")
        styles = FullyConnectedLayer(
            self.w_dim, self.in_channels, bias_init=1.0, dtype=self.dtype, name="affine"
        )(w)
        k = self.kernel_size
        weight = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (k, k, self.in_channels, self.out_channels),
        )
        spade_styles = None
        if self.spade_feat_channels is not None and denorm_feat is not None:
            s = Conv2dLayer(self.spade_feat_channels, self.in_channels, 1,
                            dtype=self.dtype, name="spade_affine_0")(denorm_feat)
            spade_styles = Conv2dLayer(self.in_channels, self.in_channels, 1,
                                       dtype=self.dtype, name="spade_affine_1")(s)
            if spade_mask is not None:  # V11/V12 gate (`networks.py:2551-2553`)
                spade_styles = spade_styles * spade_mask

        noise = None
        if self.use_noise and noise_mode != "none":
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            if noise_mode == "random":
                noise = (
                    jax.random.normal(
                        self.make_rng("noise"),
                        (x.shape[0], self.resolution, self.resolution, 1), self.dtype,
                    )
                    * noise_strength.astype(self.dtype)
                )
            else:
                noise_const = self.variable(
                    "buffers", "noise_const",
                    lambda: jax.random.normal(
                        self.make_rng("params"),
                        (self.resolution, self.resolution), jnp.float32,
                    ),
                )
                noise = (noise_const.value * noise_strength).astype(self.dtype)[None, :, :, None]

        f = jnp.asarray(_resample_filter_const((1, 3, 3, 1)))
        x = modulated_conv2d(
            x.astype(self.dtype), weight.astype(self.dtype), styles,
            spade_styles=spade_styles, noise=noise, up=self.up, padding=k // 2,
            resample_filter=f if self.up > 1 else None, flip_weight=(self.up == 1),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, axis=-1, act=self.activation, gain=act_gain, clamp=act_clamp)


# spade feature channels per INPUT resolution (`networks.py:2092`)
_SPADE_FEAT_CH = {32: 512, 64: 256, 128: 128, 256: 64}


class SynthesisBlockV10(nn.Module):
    """SynthesisBlockV10 (`networks.py:2151-2280`): the plain skip block of the
    V10 cluster — pose feature replaces the const, merge_conv on res > 16,
    and spade-modulated convs at resolution 64 only."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    dtype: Dtype = jnp.float32

    @property
    def num_conv(self):
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self):
        return 1

    @nn.compact
    def __call__(self, x, img, ws, pose_feature, cat_feat, spade_feats,
                 noise_mode="random"):
        common = dict(w_dim=self.w_dim, resolution=self.resolution,
                      conv_clamp=self.conv_clamp, use_noise=self.use_noise,
                      dtype=self.dtype)
        spade_here = self.resolution == 64
        w_idx = 0
        if self.in_channels == 0:
            self.param(
                "const",
                lambda key, s: jax.random.normal(key, s, jnp.float32),
                (self.resolution, self.resolution, self.out_channels),
            )
            x = pose_feature.astype(self.dtype)
            x = SynthesisLayerSpade(self.out_channels, self.out_channels,
                                    name="conv1", **common)(
                x, ws[:, w_idx], None, noise_mode=noise_mode)
            w_idx += 1
        else:
            f0 = spade_feats[str(self.resolution // 2)] if spade_here else None
            f1 = spade_feats[str(self.resolution)] if spade_here else None
            x = SynthesisLayerSpade(
                self.in_channels, self.out_channels, up=2,
                spade_feat_channels=_SPADE_FEAT_CH[self.resolution // 2] if spade_here else None,
                name="conv0", **common,
            )(x.astype(self.dtype), ws[:, w_idx], f0, noise_mode=noise_mode)
            w_idx += 1
            x = SynthesisLayerSpade(
                self.out_channels, self.out_channels,
                spade_feat_channels=_SPADE_FEAT_CH[self.resolution] if spade_here else None,
                name="conv1", **common,
            )(x, ws[:, w_idx], f1, noise_mode=noise_mode)
            w_idx += 1
            if self.resolution > 16:
                feat = cat_feat[str(self.resolution)].astype(self.dtype)
                x = jnp.concatenate([x, feat], axis=-1)
                x = Conv2dLayer(self.out_channels + feat.shape[-1], self.out_channels,
                                1, dtype=self.dtype, name="merge_conv")(x)

        if img is not None:
            f = jnp.asarray(_resample_filter_const((1, 3, 3, 1)))
            img = upsample2d(img, f)
        y = ToRGBLayer(self.out_channels, self.img_channels, w_dim=self.w_dim,
                       conv_clamp=self.conv_clamp, dtype=self.dtype, name="torgb")(
            x, ws[:, w_idx])
        img = img + y.astype(jnp.float32) if img is not None else y.astype(jnp.float32)
        return x, img


class StyleEncoderNetworkV10(nn.Module):
    """StyleEncoderNetworkV10 (`networks.py:2337-2400`): style branch +
    retain cat_feats (all-64ch feat_enc) + the denorm spade pyramid."""

    input_nc: int
    output_nc: int = 512
    ngf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, const_input, denorm_input):
        ngf = self.ngf
        # retain features (4 taps, 64ch at /1,/2,/4,/8)
        const_feats = []
        c = Conv2dLayer(3, ngf, 3, dtype=self.dtype, name="feat_enc_0")(const_input)
        const_feats.append(c)
        for i in range(3):
            c = Conv2dLayer(ngf, ngf, 3, down=2, dtype=self.dtype,
                            name=f"feat_enc_{i + 1}")(c)
            const_feats.append(c)

        # style branch
        x = Conv2dLayer(self.input_nc, ngf, 1, dtype=self.dtype, name="model_0")(x)
        mult_ins, mult_outs = [1, 2, 4], [2, 4, 8]
        li = 1
        for i in range(3):
            x = DenseNorm(ngf * mult_ins[i], ngf * mult_ins[i], dtype=self.dtype,
                          name=f"model_{li}")(x); li += 1
            x = Conv2dLayer(ngf * mult_ins[i], ngf * mult_outs[i], 3, down=2,
                            dtype=self.dtype, name=f"model_{li}")(x); li += 1
        for i in range(3):
            x = DenseNorm(ngf * 8, ngf * 8, dtype=self.dtype, name=f"model_{li}")(x); li += 1
            x = Conv2dLayer(ngf * 8, ngf * 8, 3, dtype=self.dtype,
                            name=f"model_{li}")(x); li += 1
        x = jnp.mean(x, axis=(1, 2))
        x = FullyConnectedLayer(self.output_nc, self.output_nc, dtype=self.dtype,
                                name="fc")(x)

        # denorm spade pyramid: taps after EVERY module (`:2394-2397`)
        denorm_feats = []
        d = Conv2dLayer(3, ngf, 7, activation="relu", dtype=self.dtype,
                        name="spade_encoder_0")(denorm_input)
        denorm_feats.append(d)
        for ii, (mi, mo) in enumerate(zip([1, 2, 4], [2, 4, 8])):
            d = ResBlock(ngf * mi, ngf * mo, kernel_size=4, activation="relu",
                         down=2, dtype=self.dtype, name=f"spade_encoder_{ii + 1}")(d)
            denorm_feats.append(d)
        return x, const_feats, denorm_feats


class GeneratorV10(nn.Module):
    """Reference GeneratorV10 (`networks.py:2403-2448`): coarse image only."""

    z_dim: int = 0
    c_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    mapping_layers: int = 1
    channel_base: int = 16384
    channel_max: int = 512
    conv_clamp: Optional[float] = 256.0
    use_noise: bool = True
    style_input_nc: int = 24 * 2
    dtype: Dtype = jnp.float32

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def block_resolutions(self):
        n = int(math.log2(self.img_resolution))
        return [2**i for i in range(2, n + 1)]

    @property
    def num_ws(self):
        return sum(1 if r == 4 else 2 for r in self.block_resolutions) + 1

    def setup(self):
        self.blocks = [
            SynthesisBlockV10(
                in_channels=self.channels(res // 2) if res > 4 else 0,
                out_channels=self.channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=res == self.img_resolution,
                conv_clamp=self.conv_clamp,
                use_noise=self.use_noise,
                dtype=self.dtype,
                name=f"synthesis_b{res}",
            )
            for res in self.block_resolutions
        ]
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_layers, dtype=self.dtype,
        )
        n_down = min(6, int(math.log2(self.img_resolution)) - 2)
        self.const_encoding = ConstEncoderNetwork(
            input_nc=6, output_nc=self.channels(4), ngf=64,
            n_downsampling=n_down, dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetworkV10(
            input_nc=self.style_input_nc, output_nc=512, dtype=self.dtype,
        )

    def __call__(self, z, c, retain, pose, denorm_input, truncation_psi=1.0,
                 truncation_cutoff=None, w_avg=None, noise_mode="random"):
        pose_feat = self.const_encoding(pose)
        stylecode, feats, denorm_feats = self.style_encoding(c, retain, denorm_input)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        cat_feats = {str(f.shape[1]): f for f in feats}
        spade_feats = {str(f.shape[1]): f for f in denorm_feats}

        block_ws = []
        w_idx = 0
        for block in self.blocks:
            block_ws.append(
                jax.lax.dynamic_slice_in_dim(
                    ws, w_idx, block.num_conv + block.num_torgb, axis=1
                )
            )
            w_idx += block.num_conv

        x = img = None
        for block, cur_ws in zip(self.blocks, block_ws):
            x, img = block(x, img, cur_ws, pose_feat, cat_feats, spade_feats,
                           noise_mode=noise_mode)
        return img

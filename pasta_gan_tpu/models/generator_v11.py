"""GeneratorV11 / GeneratorV12 — predicted-blending-mask clusters.

Counterpart of reference `training/networks.py:2449-3148`: the pyramid's
ToRGB additionally predicts a sigmoid blending MASK (a second demodulation-
free modconv head), and a spade-modulated copy of the last block re-runs as
a finetune branch with the mask gating the spatial styles:

* V11 (`:2449-2884`): the spade block re-runs FROM THE 128-RES capture
  (x_128/img_128, conv0 up=2) and SHARES the last block's ws; spade styles
  come from multi-res denorm features ({128: 2ngf, 256: ngf} from the style
  encoder's spade branch) gated by the (>0.9, detached) predicted mask.
* V12 (`:2885-3148`): the spade block consumes the FINAL 256-res x (conv0
  up=1, all spade feats at 256) and has ITS OWN ws slots (num_ws grows).

Both return (img, finetune_img, mask).
"""

from __future__ import annotations

import math
from typing import Any, Optional

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
)
from ..nn.mapping import MappingNetwork
from ..ops import bias_act, modulated_conv2d, upsample2d
from .generator_v10 import SynthesisLayerSpade

Dtype = Any

# spade feature channels per resolution (`networks.py:2538`, V11 encoder)
_SPADE_CH = {64: 256, 128: 128, 256: 64}


class ToRGBLayerV11(nn.Module):
    """`networks.py:2450-2498`: plain blocks predict (img, sigmoid mask) from
    two demod-free modconv heads; the spade block applies masked spatial
    styles to the img head only."""

    in_channels: int
    out_channels: int
    w_dim: int
    is_spade_block: bool = False
    spade_feat_channels: Optional[int] = None
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w, denorm_feat=None, denorm_feat_mask=None):
        weight_gain = 1.0 / math.sqrt(self.in_channels)
        styles = (
            FullyConnectedLayer(
                self.w_dim, self.in_channels, bias_init=1.0, dtype=self.dtype, name="affine"
            )(w)
            * weight_gain
        )
        weight = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (1, 1, self.in_channels, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        if self.is_spade_block:
            s = Conv2dLayer(self.spade_feat_channels, self.in_channels, 1,
                            dtype=self.dtype, name="spade_affine_0")(denorm_feat)
            spade_styles = Conv2dLayer(self.in_channels, self.in_channels, 1,
                                       dtype=self.dtype, name="spade_affine_1")(s)
            spade_styles = spade_styles * denorm_feat_mask
            y = modulated_conv2d(
                x.astype(self.dtype), weight.astype(self.dtype), styles,
                spade_styles=spade_styles, demodulate=False,
            )
            return bias_act(y, bias, axis=-1, clamp=self.conv_clamp), None

        m_weight = self.param(
            "m_weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (1, 1, self.in_channels, 1),
        )
        m_bias = self.param("m_bias", nn.initializers.zeros, (1,))
        mask = modulated_conv2d(
            x.astype(self.dtype), m_weight.astype(self.dtype), styles, demodulate=False
        )
        mask = bias_act(mask, m_bias, axis=-1, act="sigmoid", clamp=self.conv_clamp)
        y = modulated_conv2d(
            x.astype(self.dtype), weight.astype(self.dtype), styles, demodulate=False
        )
        return bias_act(y, bias, axis=-1, clamp=self.conv_clamp), mask


def _gate(mask, dtype):
    """(>0.9, detached) spatial gating (`networks.py:2671-2677`)."""
    return jax.lax.stop_gradient((mask > 0.9).astype(dtype))


class SynthesisBlockV11(nn.Module):
    """`networks.py:2571-2700` (v12=False) / `:2886-3029` (v12=True)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    is_spade_block: bool = False
    v12: bool = False
    use_atten: bool = False  # V13/V14 spade blocks: attention after conv1
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
                 spade_mask=None, noise_mode="random"):
        common = dict(w_dim=self.w_dim, resolution=self.resolution,
                      conv_clamp=self.conv_clamp, use_noise=self.use_noise,
                      dtype=self.dtype)
        spade = self.is_spade_block
        # V11's spade conv0 upsamples from the 128 capture; V12's runs at 256.
        conv0_up = 1 if (spade and self.v12) else 2
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
            if spade:
                res0 = self.resolution if self.v12 else self.resolution // 2
                f0 = spade_feats[str(res0)]
                f1 = spade_feats[str(self.resolution)]
                m0 = spade_mask if self.v12 else spade_mask[:, ::2, ::2, :]
                x = SynthesisLayerSpade(
                    self.in_channels, self.out_channels, up=conv0_up,
                    spade_feat_channels=_SPADE_CH[res0], name="conv0", **common,
                )(x.astype(self.dtype), ws[:, w_idx], f0,
                  spade_mask=_gate(m0, self.dtype), noise_mode=noise_mode)
                w_idx += 1
                x = SynthesisLayerSpade(
                    self.out_channels, self.out_channels,
                    spade_feat_channels=_SPADE_CH[self.resolution], name="conv1", **common,
                )(x, ws[:, w_idx], f1,
                  spade_mask=_gate(spade_mask, self.dtype), noise_mode=noise_mode)
                w_idx += 1
                if self.use_atten:  # networks.py:3368-3369,3965-3966
                    from ..nn.layers import SelfAttention

                    x = SelfAttention(self.out_channels, dtype=self.dtype,
                                      name="atten")(x)
            else:
                x = SynthesisLayerSpade(self.in_channels, self.out_channels, up=2,
                                        name="conv0", **common)(
                    x.astype(self.dtype), ws[:, w_idx], None, noise_mode=noise_mode)
                w_idx += 1
                x = SynthesisLayerSpade(self.out_channels, self.out_channels,
                                        name="conv1", **common)(
                    x, ws[:, w_idx], None, noise_mode=noise_mode)
                w_idx += 1
            if self.resolution > 16:
                feat = cat_feat[str(self.resolution)].astype(self.dtype)
                x = jnp.concatenate([x, feat], axis=-1)
                x = Conv2dLayer(self.out_channels + feat.shape[-1], self.out_channels,
                                1, dtype=self.dtype, name="merge_conv")(x)

        if img is not None and not (spade and self.v12):
            f = jnp.asarray(_resample_filter_const((1, 3, 3, 1)))
            img = upsample2d(img, f)
        y, mask = ToRGBLayerV11(
            self.out_channels, self.img_channels, w_dim=self.w_dim,
            is_spade_block=spade,
            spade_feat_channels=_SPADE_CH[self.resolution] if spade else None,
            conv_clamp=self.conv_clamp, dtype=self.dtype, name="torgb",
        )(x, ws[:, w_idx],
          spade_feats[str(self.resolution)] if spade else None,
          _gate(spade_mask, self.dtype) if spade else None)
        img = img + y.astype(jnp.float32) if img is not None else y.astype(jnp.float32)
        return x, img, mask


class StyleEncoderNetworkV11(nn.Module):
    """`networks.py:2774-2835`: V16-style style branch + all-64ch feat_enc +
    a 2-tap spade encoder ({256: ngf, 128: 2ngf})."""

    input_nc: int
    output_nc: int = 512
    ngf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, const_input, denorm_input):
        ngf = self.ngf
        const_feats = []
        c = Conv2dLayer(3, ngf, 3, dtype=self.dtype, name="feat_enc_0")(const_input)
        const_feats.append(c)
        for i in range(3):
            c = Conv2dLayer(ngf, ngf, 3, down=2, dtype=self.dtype,
                            name=f"feat_enc_{i + 1}")(c)
            const_feats.append(c)

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

        # spade branch: taps AFTER the first conv (`:2826-2830`, ii > 0)
        d = Conv2dLayer(3, ngf, 7, activation="relu", dtype=self.dtype,
                        name="spade_encoder_0")(denorm_input)
        denorm_feats = []
        d = ResBlock(ngf, ngf, kernel_size=4, activation="relu",
                     dtype=self.dtype, name="spade_encoder_1")(d)
        denorm_feats.append(d)
        d = ResBlock(ngf, ngf * 2, kernel_size=4, activation="relu", down=2,
                     dtype=self.dtype, name="spade_encoder_2")(d)
        denorm_feats.append(d)
        return x, const_feats, denorm_feats


class GeneratorV11(nn.Module):
    """Reference GeneratorV11 (`networks.py:2837-2884`); set v12=True for
    GeneratorV12 (`:3102-3148`)."""

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
    v12: bool = False
    dtype: Dtype = jnp.float32

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def block_resolutions(self):
        n = int(math.log2(self.img_resolution))
        return [2**i for i in range(2, n + 1)]

    @property
    def num_ws(self):
        base = sum(1 if r == 4 else 2 for r in self.block_resolutions) + 1
        if self.v12:  # the V12 spade block has its own ws slots (+2 conv +1 torgb)
            base += 3
        return base

    def setup(self):
        res_last = self.block_resolutions[-1]
        self.blocks = [
            SynthesisBlockV11(
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
        self.spade_block = SynthesisBlockV11(
            # V12 consumes the final 256-res x (networks.py:3068); V11 the
            # 128-res capture (:2738-2741)
            in_channels=self.channels(res_last if self.v12 else res_last // 2),
            out_channels=self.channels(res_last),
            w_dim=self.w_dim,
            resolution=res_last,
            img_channels=self.img_channels,
            is_last=True,
            is_spade_block=True,
            v12=self.v12,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            dtype=self.dtype,
            name="synthesis_spade_b256",
        )
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_layers, dtype=self.dtype,
        )
        n_down = min(6, int(math.log2(self.img_resolution)) - 2)
        self.const_encoding = ConstEncoderNetwork(
            input_nc=6, output_nc=self.channels(4), ngf=64,
            n_downsampling=n_down, dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetworkV11(
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

        x = img = mask = None
        x_128 = img_128 = None
        for block, cur_ws in zip(self.blocks, block_ws):
            x, img, mask = block(x, img, cur_ws, pose_feat, cat_feats, None,
                                 noise_mode=noise_mode)
            if block.resolution == self.img_resolution // 2:
                x_128, img_128 = x, img

        if self.v12:
            # the reference narrows at w_idx straight after the conv sum, so
            # the spade block's first w ALIASES the last torgb w
            # (`networks.py:3095-3096`)
            spade_ws = jax.lax.dynamic_slice_in_dim(ws, w_idx, 3, axis=1)
            _, finetune_img, _ = self.spade_block(
                x, img, spade_ws, pose_feat, cat_feats, spade_feats,
                spade_mask=mask, noise_mode=noise_mode,
            )
        else:
            _, finetune_img, _ = self.spade_block(
                x_128, img_128, block_ws[-1], pose_feat, cat_feats, spade_feats,
                spade_mask=mask, noise_mode=noise_mode,
            )
        return img, finetune_img, mask


def GeneratorV12(**kwargs):
    return GeneratorV11(v12=True, **kwargs)

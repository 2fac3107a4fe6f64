"""GeneratorV15 / V15_2 / V17 — SPADE-placement experiment clusters.

Counterpart of reference `training/networks.py:4174-4729` (V15/V15_2) and
`:4931-5228` (V17).  All three share the mask1-headed StyleGAN2 pyramid
(our SynthesisBlockFull with head_mode="mask1", head_always=True — the
ToRGBLayerV15 family) and a texture finetune branch from the 128-res
capture; they differ in WHERE the SPADE conditioning is applied:

* V15  (`:4430-4523`): spade feats come from the STYLE ENCODER's denorm
  branch; ONE Spade_ResBlock at 128 before texture_b256.
* V15_2 (`:4524-4622`): same with THREE chained Spade_ResBlocks.
* V17  (`:5077-5190`): the spade encoder lives in the synthesis network
  (applied to the mask-gated denorm input), and the SPADE blocks live
  INSIDE texture_b256 — at 128 before conv0 and at 256 before conv1
  (`SynthesisBlockV17`, `:4931-5076`).

All forwards return (img, finetune_img, mask) with the V15-style
masked-average valid-region fill of the spade features.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoders import ConstEncoderNetwork, StyleEncoderNetworkV16
from ..nn.layers import Conv2dLayer, ResBlock
from ..nn.mapping import MappingNetwork
from ..nn.spade import SpadeResBlock
from ..nn.synthesis import SynthesisBlockFull, SynthesisLayer
from .generator_v11 import StyleEncoderNetworkV11

Dtype = Any


def _thresh(m, dtype):
    return jax.lax.stop_gradient((m > 0.9).astype(dtype))


def _masked_avg_fill(denorm_feat, mask, denorm_mask, hw, pre_mask: bool):
    """The V15 valid-region average fill (`networks.py:4494-4516`):
    person-visible-but-garment-missing pixels get the spatial average of the
    valid features.  V15 pre-multiplies the features by the predicted mask
    (`:4512`), V17 does not (`:5030`)."""
    dtype = denorm_feat.dtype
    valid = ((mask + denorm_mask) == 2.0).astype(dtype)
    res_mask = jax.lax.stop_gradient(mask - valid)
    valid_feat_sum = jnp.sum(denorm_feat * valid, axis=(1, 2), keepdims=True)
    valid_sum = jnp.sum(valid, axis=(1, 2), keepdims=True)
    idx = (valid_sum > 10).astype(dtype)
    valid_sum = valid_sum * idx + float(hw * hw) * (1.0 - idx)
    avg = valid_feat_sum / valid_sum
    base = denorm_feat * mask if pre_mask else denorm_feat
    return base * (1.0 - res_mask) + avg * res_mask


class _SpadeEncoder(nn.Module):
    """[conv7-relu, ResBlock(ngf), ResBlock(2ngf, down)] with taps after the
    residual blocks (`networks.py:5101-5106`)."""

    ngf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ngf = self.ngf
        x = Conv2dLayer(3, ngf, 7, activation="relu", dtype=self.dtype,
                        name="spade_encoder_0")(x)
        f256 = ResBlock(ngf, ngf, kernel_size=4, activation="relu",
                        dtype=self.dtype, name="spade_encoder_1")(x)
        f128 = ResBlock(ngf, ngf * 2, kernel_size=4, activation="relu", down=2,
                        dtype=self.dtype, name="spade_encoder_2")(f256)
        return {"256": f256, "128": f128}


class TextureBlockV17(nn.Module):
    """SynthesisBlockV17 (`networks.py:4931-5076`): a last synthesis block
    whose convs are preceded by SPADE residual blocks at 128 and 256."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, img, ws, cat_feat, mask_256, denorm_mask,
                 denorm_feats, noise_mode="random"):
        common = dict(w_dim=self.w_dim, resolution=self.resolution,
                      conv_clamp=self.conv_clamp, use_noise=self.use_noise,
                      dtype=self.dtype)
        r = self.resolution
        h = r // 2
        mask_128 = _thresh(mask_256[:, ::2, ::2, :], self.dtype)
        denorm_mask_128 = _thresh(denorm_mask[:, ::2, ::2, :], self.dtype)
        spade_128 = _masked_avg_fill(
            denorm_feats[str(h)], mask_128, denorm_mask_128, h, pre_mask=False
        )
        x = SpadeResBlock(self.in_channels, self.in_channels, resolution=h,
                          feat_multiplier=1, dtype=self.dtype, name="spade_b128")(
            x, spade_128)
        x = SynthesisLayer(self.in_channels, self.out_channels, up=2,
                           name="conv0", **common)(
            x.astype(self.dtype), ws[:, 0], noise_mode=noise_mode)

        spade_256 = _masked_avg_fill(
            denorm_feats[str(r)], mask_256, denorm_mask, r, pre_mask=False
        )
        x = SpadeResBlock(self.out_channels, self.out_channels, resolution=r,
                          feat_multiplier=1, dtype=self.dtype, name="spade_b256")(
            x, spade_256)
        x = SynthesisLayer(self.out_channels, self.out_channels,
                           name="conv1", **common)(x, ws[:, 1], noise_mode=noise_mode)
        if r > 16:
            feat = cat_feat[str(r)].astype(self.dtype)
            x = jnp.concatenate([x, feat], axis=-1)
            x = Conv2dLayer(self.out_channels + feat.shape[-1], self.out_channels, 1,
                            dtype=self.dtype, name="merge_conv")(x)

        from ..nn.layers import _resample_filter_const
        from ..ops import upsample2d

        f = jnp.asarray(_resample_filter_const((1, 3, 3, 1)))
        img = upsample2d(img, f)
        from ..nn.synthesis import ToRGBLayerFull

        y, mask = ToRGBLayerFull(
            self.out_channels, self.img_channels, w_dim=self.w_dim,
            conv_clamp=self.conv_clamp, is_last=True, head_mode="mask1",
            head_always=True, dtype=self.dtype, name="torgb",
        )(x, ws[:, 2])
        img = img + y.astype(jnp.float32)
        return x, img, mask


class _GeneratorV15Base(nn.Module):
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
    # "mask1": ToRGBLayerV15-family heads on EVERY skip block; "masks2":
    # ToRGBLayerV18-family upper/lower heads on the last block only (the
    # ablation clusters at `networks.py:7010-7725` reuse SynthesisBlockV18)
    head_mode: str = "mask1"
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

    def _make_blocks(self):
        head_always = self.head_mode == "mask1"
        return [
            SynthesisBlockFull(
                in_channels=self.channels(res // 2) if res > 4 else 0,
                out_channels=self.channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=res == self.img_resolution,
                is_style=(res == self.img_resolution) and not head_always,
                head_mode=self.head_mode,
                head_always=head_always,
                conv_clamp=self.conv_clamp,
                use_noise=self.use_noise,
                packed=False,
                dtype=self.dtype,
                name=f"synthesis_b{res}",
            )
            for res in self.block_resolutions
        ]

    def _mapping_and_pose(self):
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_layers, dtype=self.dtype,
        )
        n_down = min(6, int(math.log2(self.img_resolution)) - 2)
        self.const_encoding = ConstEncoderNetwork(
            input_nc=6, output_nc=self.channels(4), ngf=64,
            n_downsampling=n_down, dtype=self.dtype,
        )

    def _pyramid(self, blocks, ws, pose_feat, cat_feats, noise_mode):
        block_ws = []
        w_idx = 0
        for block in blocks:
            block_ws.append(
                jax.lax.dynamic_slice_in_dim(
                    ws, w_idx, block.num_conv + block.num_torgb, axis=1
                )
            )
            w_idx += block.num_conv
        x = img = mask = None
        x_128 = img_128 = None
        for block, cur_ws in zip(blocks, block_ws):
            x, img, mask = block(x, img, cur_ws, pose_feat, cat_feats,
                                 noise_mode=noise_mode)
            if block.resolution == self.img_resolution // 2:
                x_128, img_128 = x, img
        return x, img, mask, x_128, img_128, block_ws


class GeneratorV15(_GeneratorV15Base):
    """Reference GeneratorV15 (`networks.py:4685-4729`); spade_count=3 gives
    the V15_2 network (`:4524-4622`)."""

    spade_count: int = 1

    def setup(self):
        self.blocks = self._make_blocks()
        self._mapping_and_pose()
        self.style_encoding = StyleEncoderNetworkV11(
            input_nc=self.style_input_nc, output_nc=512, dtype=self.dtype,
        )
        ch = self.channels(self.img_resolution // 2)
        # V15_2 suffixes its three blocks `spade_b128_{1,2,3}`
        # (`networks.py:4563-4565`); the single-block V15 uses `spade_b128`
        # (`:4468`) — mirror both so the checkpoint converter maps names 1:1.
        self.spade_blocks = [
            SpadeResBlock(
                ch, ch, resolution=128, feat_multiplier=1, dtype=self.dtype,
                name="synthesis_spade_b128" if self.spade_count == 1
                else f"synthesis_spade_b128_{i + 1}",
            )
            for i in range(self.spade_count)
        ]
        res = self.img_resolution
        self.texture_b256 = SynthesisBlockFull(
            in_channels=self.channels(res // 2),
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            is_last=True,
            is_style=False,
            head_mode="mask1",
            head_always=True,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            packed=False,
            dtype=self.dtype,
            name="synthesis_texture_b256",
        )

    def __call__(self, z, c, retain, pose, denorm_input, denorm_mask,
                 truncation_psi=1.0, truncation_cutoff=None, w_avg=None,
                 noise_mode="random"):
        pose_feat = self.const_encoding(pose)
        stylecode, feats, denorm_feats = self.style_encoding(c, retain, denorm_input)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        cat_feats = {str(f.shape[1]): f for f in feats}
        spade_feats = {str(f.shape[1]): f for f in denorm_feats}

        _, img, mask, x_128, img_128, block_ws = self._pyramid(
            self.blocks, ws, pose_feat, cat_feats, noise_mode
        )

        mask_256 = _thresh(mask, self.dtype)
        mask_128 = _thresh(mask_256[:, ::2, ::2, :], self.dtype)
        denorm_mask_128 = _thresh(denorm_mask[:, ::2, ::2, :], self.dtype)
        h = self.img_resolution // 2
        spade_feat = _masked_avg_fill(
            spade_feats[str(h)], mask_128, denorm_mask_128, h, pre_mask=True
        )

        xs = x_128
        for sb in self.spade_blocks:
            xs = sb(xs, spade_feat)
        _, finetune_img, _ = self.texture_b256(
            xs, img_128, block_ws[-1], pose_feat, cat_feats, noise_mode=noise_mode
        )
        return img, finetune_img, mask


def GeneratorV15_2(**kwargs):
    return GeneratorV15(spade_count=3, **kwargs)


class GeneratorV17(_GeneratorV15Base):
    """Reference GeneratorV17 (`networks.py:5191-5228`)."""

    def setup(self):
        self.blocks = self._make_blocks()
        self._mapping_and_pose()
        self.style_encoding = StyleEncoderNetworkV16(
            input_nc=self.style_input_nc, output_nc=512, ngf=64, dtype=self.dtype,
        )
        # named "synthesis" so params land at synthesis.spade_encoder.N like
        # the reference's SynthesisNetworkV17 (`networks.py:5125-5130`)
        self.spade_encoder = _SpadeEncoder(dtype=self.dtype, name="synthesis")
        res = self.img_resolution
        self.texture_b256 = TextureBlockV17(
            in_channels=self.channels(res // 2),
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            dtype=self.dtype,
            name="synthesis_texture_b256",
        )

    def __call__(self, z, c, retain, pose, denorm_input, denorm_mask,
                 truncation_psi=1.0, truncation_cutoff=None, w_avg=None,
                 noise_mode="random"):
        pose_feat = self.const_encoding(pose)
        stylecode, feats = self.style_encoding(c, retain)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        cat_feats = {str(f.shape[1]): f for f in feats}

        _, img, mask, x_128, img_128, block_ws = self._pyramid(
            self.blocks, ws, pose_feat, cat_feats, noise_mode
        )

        mask_256 = _thresh(mask, self.dtype)
        gated = denorm_input * mask_256 - (1.0 - mask_256)
        denorm_feats = self.spade_encoder(gated)
        # denorm_mask goes in RAW: the reference thresholds the 128-res copy
        # inside the block but compares the raw mask at 256 (`:5043-5044`)
        _, finetune_img, _ = self.texture_b256(
            x_128, img_128, block_ws[-1], cat_feats, mask_256, denorm_mask,
            denorm_feats, noise_mode=noise_mode,
        )
        return img, finetune_img, mask

"""Ablation-study generator clusters (reference `training/networks.py:6235-7725`).

The paper's ablations strip or substitute parts of the full model:

* **Raw / Patch** (`:6236-6621`): the mask1-headed V15 pyramid with NO
  texture-refinement branch — returns (img, img, img).  "Raw" feeds the
  whole garment image to a conv-only style encoder
  (`StyleEncoderNetworkRaw`, `:6236-6283`); "Patch" keeps the routed-patch
  stack + Dense encoder (identical body to StyleEncoderNetworkV16).
* **PatchDenorm / PatchDenormCat** (`:6622-7009`): pyramid + 3 refinement
  blocks at 128 + texture block.  "Denorm" conditions Spade_ResBlocks on the
  RAW spade-encoded denorm garment (no mask gating, `:6752-6762`); "Cat"
  replaces SPADE with plain concat residual blocks (`catResBlock`,
  `:6925-6970`) fed the valid-region-masked features (`:6890-6906`).
* **RawFull / PatchFull / AvgPatchFull** (`:7010-7309`, `:7635-7725`): the
  masks2-headed V18 pyramid with no refinement — returns (img,)*4; they
  differ only in the style encoder (conv-only raw 9ch / Dense 60ch / Dense
  78ch average-patch stack).
* **NoCoarse / NoCoarseNoMask** (`:7310-7634`): V18 pyramid whose COARSE
  output is discarded — returns (finetune,)*4 after 3 Spade_ResBlockV2 at
  128 + a V18 texture block; "NoMask" skips the mask gating + valid-region
  fill of the spade features (`:7525-7540`).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoders import StyleEncoderNetworkV16, _RetainFeatureEncoder
from ..nn.layers import Conv2dLayer
from ..nn.mapping import MappingNetwork  # noqa: F401  (re-export convenience)
from ..nn.spade import SpadeResBlock
from ..nn.synthesis import SynthesisBlockFull
from .generator_v15 import _GeneratorV15Base, _SpadeEncoder, _masked_avg_fill, _thresh

Dtype = Any


class StyleEncoderNetworkRaw(nn.Module):
    """Conv-only style encoder for the raw-garment ablations
    (`networks.py:6236-6283`, `:7125-7165`): 1x1 stem + six stride-2 convs
    (no Dense blocks) + global average pool + FC, plus the standard retain
    feat_enc.  Children carry literal `model.N` names for the checkpoint
    converter's dotted-name pass-through."""

    input_nc: int
    output_nc: int = 512
    ngf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, const_input):
        from ..nn.layers import FullyConnectedLayer

        const_feats = _RetainFeatureEncoder(self.ngf, dtype=self.dtype, name="feat_enc")(
            const_input
        )
        ngf = self.ngf
        x = Conv2dLayer(self.input_nc, ngf, 1, dtype=self.dtype, name="model.0")(x)
        mult_ins = [1, 2, 4, 8, 8, 8]
        mult_outs = [2, 4, 8, 8, 8, 8]
        for i in range(6):
            x = Conv2dLayer(
                ngf * mult_ins[i], ngf * mult_outs[i], 3, down=2,
                dtype=self.dtype, name=f"model.{i + 1}",
            )(x)
        x = jnp.mean(x, axis=(1, 2))
        x = FullyConnectedLayer(self.output_nc, self.output_nc, dtype=self.dtype, name="fc")(x)
        return x, const_feats


class CatResBlock(nn.Module):
    """Concat-conditioned residual block (`networks.py:6925-6970`): the SPADE
    normalization of Spade_ResBlock replaced by channel-concat of the denorm
    features into the entry conv.  All convs linear-activated."""

    in_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, denorm_feat):
        g = math.sqrt(0.5)
        x = Conv2dLayer(self.in_channels * 2, self.in_channels, 3, dtype=self.dtype,
                        name="conv")(jnp.concatenate([x, denorm_feat], axis=-1))
        y = Conv2dLayer(self.in_channels, self.out_channels, 1, dtype=self.dtype,
                        name="skip")(x, gain=g)
        x = Conv2dLayer(self.in_channels, self.out_channels, 3, dtype=self.dtype,
                        name="conv0")(x)
        x = Conv2dLayer(self.out_channels, self.out_channels, 3, dtype=self.dtype,
                        name="conv1")(x, gain=g)
        return y + x


class _BareAblationGenerator(_GeneratorV15Base):
    """Pyramid-only generators (no refinement branch)."""

    encoder_kind: str = "dense"  # "dense" (StyleEncoderNetworkV16 body) | "raw"

    def setup(self):
        self.blocks = self._make_blocks()
        self._mapping_and_pose()
        enc = StyleEncoderNetworkRaw if self.encoder_kind == "raw" else StyleEncoderNetworkV16
        self.style_encoding = enc(
            input_nc=self.style_input_nc, output_nc=512, ngf=64, dtype=self.dtype
        )

    def _common(self, z, c, retain, pose, truncation_psi, truncation_cutoff,
                w_avg, noise_mode):
        pose_feat = self.const_encoding(pose)
        stylecode, feats = self.style_encoding(c, retain)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        cat_feats = {str(f.shape[1]): f for f in feats}
        return self._pyramid(self.blocks, ws, pose_feat, cat_feats, noise_mode) + (
            pose_feat, cat_feats,
        )


class GeneratorRaw(_BareAblationGenerator):
    """`networks.py:6391-6426`: raw garment in, coarse img out x3."""

    encoder_kind: str = "raw"
    style_input_nc: int = 3 * 2

    def __call__(self, z, c, retain, pose, denorm_clothes=None, denorm_mask=None,
                 truncation_psi=1.0, truncation_cutoff=None, w_avg=None,
                 noise_mode="random"):
        _, img, _mask, *_ = self._common(
            z, c, retain, pose, truncation_psi, truncation_cutoff, w_avg, noise_mode
        )
        return img, img, img


class GeneratorPatch(GeneratorRaw):
    """`networks.py:6584-6620`: routed patches in, coarse img out x3."""

    encoder_kind: str = "dense"
    style_input_nc: int = 24 * 2


class GeneratorRawFull(_BareAblationGenerator):
    """`networks.py:7167-7211`: V18 masks2 pyramid, raw 9-ch garment stack,
    no refinement — returns the coarse img in all four slots (`:7096-7102`)."""

    encoder_kind: str = "raw"
    style_input_nc: int = 3 * 3
    head_mode: str = "masks2"

    def __call__(self, z, c, retain, pose, denorm_upper_input=None,
                 denorm_lower_input=None, denorm_upper_mask=None,
                 denorm_lower_mask=None, truncation_psi=1.0,
                 truncation_cutoff=None, w_avg=None, noise_mode="random"):
        _, img, _masks, *_ = self._common(
            z, c, retain, pose, truncation_psi, truncation_cutoff, w_avg, noise_mode
        )
        return img, img, img, img


class GeneratorPatchFull(GeneratorRawFull):
    """`networks.py:7263-7308`."""

    encoder_kind: str = "dense"
    style_input_nc: int = 30 * 2


class GeneratorAvgPatchFull(GeneratorRawFull):
    """`networks.py:7684-7725`: average-pooled patch styles (the averaging
    happens in the dataset; the network only differs by input width)."""

    encoder_kind: str = "dense"
    style_input_nc: int = 39 * 2


class GeneratorPatchDenorm(_GeneratorV15Base):
    """`networks.py:6779-6817` (cat_refine=False) and GeneratorPatchDenormCat
    `:6972-7008` (cat_refine=True)."""

    cat_refine: bool = False

    def setup(self):
        self.blocks = self._make_blocks()
        self._mapping_and_pose()
        self.style_encoding = StyleEncoderNetworkV16(
            input_nc=self.style_input_nc, output_nc=512, ngf=64, dtype=self.dtype
        )
        self.spade_encoder = _SpadeEncoder(dtype=self.dtype, name="synthesis")
        ch = self.channels(self.img_resolution // 2)
        if self.cat_refine:
            self.refine_blocks = [
                CatResBlock(ch, ch, dtype=self.dtype, name=f"synthesis_catRes_b128_{i + 1}")
                for i in range(3)
            ]
        else:
            self.refine_blocks = [
                SpadeResBlock(ch, ch, resolution=128, feat_multiplier=1,
                              dtype=self.dtype, name=f"synthesis_spade_b128_{i + 1}")
                for i in range(3)
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

    def __call__(self, z, c, retain, pose, denorm_clothes, denorm_mask,
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

        if self.cat_refine:
            # spade feats from the mask-gated garment, kept only where BOTH
            # the predicted and the denorm masks agree (`networks.py:6890-6906`)
            mask_256 = _thresh(mask, self.dtype)
            gated = denorm_clothes * mask_256 - (1.0 - mask_256)
            feat_128 = self.spade_encoder(gated)["128"]
            mask_128 = _thresh(mask_256[:, ::2, ::2, :], self.dtype)
            dm_128 = _thresh(denorm_mask[:, ::2, ::2, :], self.dtype)
            valid = ((mask_128 + dm_128) == 2.0).astype(self.dtype)
            spade_feat = feat_128 * valid
        else:
            # RAW spade-encoded denorm garment, no gating (`:6752-6762`)
            spade_feat = self.spade_encoder(denorm_clothes)["128"]

        h = x_128
        for blk in self.refine_blocks:
            h = blk(h, spade_feat)
        _, finetune_img, _ = self.texture_b256(
            h, img_128, block_ws[-1], pose_feat, cat_feats, noise_mode=noise_mode
        )
        return img, finetune_img, mask


def GeneratorPatchDenormCat(**kwargs):
    return GeneratorPatchDenorm(cat_refine=True, **kwargs)


class GeneratorNoCoarse(_GeneratorV15Base):
    """`networks.py:7425-7470` (and NoCoarseNoMask `:7587-7633` via
    mask_fill=False): V18 pyramid whose coarse output is DISCARDED — only the
    texture branch result is returned, in all four slots (`:7445-7447`)."""

    head_mode: str = "masks2"
    style_input_nc: int = 30 * 2
    mask_fill: bool = True  # False -> NoCoarseNoMask (raw spade feats)

    def setup(self):
        self.blocks = self._make_blocks()
        self._mapping_and_pose()
        self.style_encoding = StyleEncoderNetworkV16(
            input_nc=self.style_input_nc, output_nc=512, ngf=64, dtype=self.dtype
        )
        self.spade_encoder = _SpadeEncoder(dtype=self.dtype, name="synthesis")
        ch = self.channels(self.img_resolution // 2)
        self.spade_blocks = [
            SpadeResBlock(ch, ch, resolution=128, feat_multiplier=2,
                          dtype=self.dtype, name=f"synthesis_spade_b128_{i + 1}")
            for i in range(3)
        ]
        res = self.img_resolution
        self.texture_b256 = SynthesisBlockFull(
            in_channels=self.channels(res // 2),
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            is_last=True,
            is_style=True,
            head_mode="masks2",
            head_always=False,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            packed=False,
            dtype=self.dtype,
            name="synthesis_texture_b256",
        )

    def _spade_feat(self, mask, denorm_mask, denorm_input):
        if not self.mask_fill:
            return self.spade_encoder(denorm_input)["128"]
        mask_256 = (mask > 0.9).astype(self.dtype)
        mask_128 = _thresh(mask_256[:, ::2, ::2, :], self.dtype)
        dm_128 = _thresh(denorm_mask[:, ::2, ::2, :], self.dtype)
        gated = denorm_input * mask_256 - (1.0 - mask_256)
        feat = self.spade_encoder(gated)["128"]
        return _masked_avg_fill(feat, mask_128, dm_128, 128, pre_mask=False)

    def __call__(self, z, c, retain, pose, denorm_upper_input, denorm_lower_input,
                 denorm_upper_mask, denorm_lower_mask, truncation_psi=1.0,
                 truncation_cutoff=None, w_avg=None, noise_mode="random"):
        import jax

        pose_feat = self.const_encoding(pose)
        stylecode, feats = self.style_encoding(c, retain)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        cat_feats = {str(f.shape[1]): f for f in feats}

        _, _img, masks, x_128, img_128, block_ws = self._pyramid(
            self.blocks, ws, pose_feat, cat_feats, noise_mode
        )
        upper_mask = jax.lax.stop_gradient(masks[0])
        lower_mask = jax.lax.stop_gradient(masks[1])

        spade_feat = jnp.concatenate(
            [
                self._spade_feat(upper_mask, denorm_upper_mask, denorm_upper_input),
                self._spade_feat(lower_mask, denorm_lower_mask, denorm_lower_input),
            ],
            axis=-1,
        )
        h = x_128
        for blk in self.spade_blocks:
            h = blk(h, spade_feat)
        _, finetune_img, _ = self.texture_b256(
            h, img_128, block_ws[-1], pose_feat, cat_feats, noise_mode=noise_mode
        )
        return finetune_img, finetune_img, finetune_img, finetune_img


def GeneratorNoCoarseNoMask(**kwargs):
    return GeneratorNoCoarse(mask_fill=False, **kwargs)

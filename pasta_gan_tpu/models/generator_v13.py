"""GeneratorV13 / GeneratorV14 — mask-at-128 / attention-at-128 clusters.

Counterpart of reference `training/networks.py:3149-3576` (V13) and
`:3857-4173` (V14), built on the V11 block machinery (generator_v11.py):

* V13: at res 128 the NORMAL block runs on a fork of the stream purely to
  predict the blending mask (`mask_128`), while an attention-equipped spade
  block replaces it on the main stream gated by that mask
  (`networks.py:3450-3461`).  Forward returns (img, mask_128).
* V14: the pyramid runs plain to the end (mask from the final ToRGB); a
  finetune branch re-runs from the 64-res capture through spade_b128 (with
  attention) and spade_b256 using the last two blocks' ws
  (`networks.py:4053-4065`).  Forward returns (img, finetune_img, mask).

Both clusters' spade style encoders tap the denorm pyramid after every
residual block (V13: {128: 2ngf, 64: 4ngf}; V14: {256: ngf, 128: 2ngf,
64: 4ngf} — `networks.py:3494-3499,4092-4098`).
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
)
from ..nn.mapping import MappingNetwork
from .generator_v11 import SynthesisBlockV11


Dtype = Any


class StyleEncoderNetworkV13(nn.Module):
    """`networks.py:3470-3532` (V14 variant at `:4068-4130` adds the same-res
    first residual block)."""

    input_nc: int
    output_nc: int = 512
    ngf: int = 64
    v14: bool = False
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

        d = Conv2dLayer(3, ngf, 7, activation="relu", dtype=self.dtype,
                        name="spade_encoder_0")(denorm_input)
        denorm_feats = []
        si = 1
        if self.v14:  # same-res first residual block (networks.py:4093)
            d = ResBlock(ngf, ngf, kernel_size=4, activation="relu",
                         dtype=self.dtype, name=f"spade_encoder_{si}")(d)
            denorm_feats.append(d); si += 1
        d = ResBlock(ngf, ngf * 2, kernel_size=4, activation="relu", down=2,
                     dtype=self.dtype, name=f"spade_encoder_{si}")(d)
        denorm_feats.append(d); si += 1
        d = ResBlock(ngf * 2, ngf * 4, kernel_size=4, activation="relu", down=2,
                     dtype=self.dtype, name=f"spade_encoder_{si}")(d)
        denorm_feats.append(d)
        return x, const_feats, denorm_feats


class _GeneratorV1314Base(nn.Module):
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

    def _common_setup(self, v14: bool):
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
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_layers, dtype=self.dtype,
        )
        n_down = min(6, int(math.log2(self.img_resolution)) - 2)
        self.const_encoding = ConstEncoderNetwork(
            input_nc=6, output_nc=self.channels(4), ngf=64,
            n_downsampling=n_down, dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetworkV13(
            input_nc=self.style_input_nc, output_nc=512, v14=v14, dtype=self.dtype,
        )

    def _encode(self, z, c, retain, pose, denorm_input, w_avg,
                truncation_psi, truncation_cutoff):
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
        return pose_feat, cat_feats, spade_feats, block_ws


class GeneratorV13(_GeneratorV1314Base):
    """Reference GeneratorV13 (`networks.py:3533-3576`): (img, mask_128)."""

    def setup(self):
        self._common_setup(v14=False)
        self.spade_b128 = SynthesisBlockV11(
            in_channels=self.channels(64),
            out_channels=self.channels(128),
            w_dim=self.w_dim,
            resolution=128,
            img_channels=self.img_channels,
            is_last=False,
            is_spade_block=True,
            use_atten=True,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            dtype=self.dtype,
            name="synthesis_spade_b128",
        )

    def __call__(self, z, c, retain, pose, denorm_input, truncation_psi=1.0,
                 truncation_cutoff=None, w_avg=None, noise_mode="random"):
        pose_feat, cat_feats, spade_feats, block_ws = self._encode(
            z, c, retain, pose, denorm_input, w_avg, truncation_psi, truncation_cutoff
        )
        x = img = mask_128 = None
        for block, cur_ws in zip(self.blocks, block_ws):
            if block.resolution != 128:
                x, img, _ = block(x, img, cur_ws, pose_feat, cat_feats, None,
                                  noise_mode=noise_mode)
            else:
                # mask fork: the plain block predicts the mask; the spade
                # block replaces it on the main stream (networks.py:3453-3460)
                _, _, mask_128 = block(x, img, cur_ws, pose_feat, cat_feats, None,
                                       noise_mode=noise_mode)
                x, img, _ = self.spade_b128(
                    x, img, cur_ws, pose_feat, cat_feats, spade_feats,
                    spade_mask=mask_128, noise_mode=noise_mode,
                )
        return img, mask_128


class GeneratorV14(_GeneratorV1314Base):
    """Reference GeneratorV14 (`networks.py:4131-4173`):
    (img, finetune_img, mask)."""

    def setup(self):
        self._common_setup(v14=True)
        self.spade_b128 = SynthesisBlockV11(
            in_channels=self.channels(64),
            out_channels=self.channels(128),
            w_dim=self.w_dim,
            resolution=128,
            img_channels=self.img_channels,
            is_last=False,
            is_spade_block=True,
            use_atten=True,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            dtype=self.dtype,
            name="synthesis_spade_b128",
        )
        self.spade_b256 = SynthesisBlockV11(
            in_channels=self.channels(128),
            out_channels=self.channels(256),
            w_dim=self.w_dim,
            resolution=256,
            img_channels=self.img_channels,
            is_last=True,
            is_spade_block=True,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            dtype=self.dtype,
            name="synthesis_spade_b256",
        )

    def __call__(self, z, c, retain, pose, denorm_input, truncation_psi=1.0,
                 truncation_cutoff=None, w_avg=None, noise_mode="random"):
        pose_feat, cat_feats, spade_feats, block_ws = self._encode(
            z, c, retain, pose, denorm_input, w_avg, truncation_psi, truncation_cutoff
        )
        x = img = mask = None
        x_64 = img_64 = None
        for block, cur_ws in zip(self.blocks, block_ws):
            x, img, mask = block(x, img, cur_ws, pose_feat, cat_feats, None,
                                 noise_mode=noise_mode)
            if block.resolution == 64:
                x_64, img_64 = x, img

        mask_128 = mask[:, ::2, ::2, :]  # F.interpolate(scale=0.5) nearest
        ft_x, ft_img, _ = self.spade_b128(
            x_64, img_64, block_ws[-2], pose_feat, cat_feats, spade_feats,
            spade_mask=mask_128, noise_mode=noise_mode,
        )
        _, finetune_img, _ = self.spade_b256(
            ft_x, ft_img, block_ws[-1], pose_feat, cat_feats, spade_feats,
            spade_mask=mask, noise_mode=noise_mode,
        )
        return img, finetune_img, mask

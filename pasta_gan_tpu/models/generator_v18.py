"""GeneratorV18 — the released 256x192 checkpoint's interface
(reference `networks.py:5534-5577`; used by `test.py:121-128`).

Differences from GeneratorFull: the final ToRGB predicts upper & lower
sigmoid masks instead of a 6-class parsing map, the style encoder consumes a
60-channel stack (10 norm patches + stickman patches, `dataset.py:1513`), and
synthesis returns a 4-tuple (img, finetune_img, upper_mask, lower_mask).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoders import ConstEncoderNetwork, StyleEncoderNetworkV16
from ..nn.mapping import MappingNetwork
from ..nn.synthesis import SynthesisNetworkFull
from .generator_full import cat_feats_dict


class GeneratorV18(nn.Module):
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
    pack_tail: bool = True  # W-pack <=64ch last blocks (ops/packing.py; exact)
    quant: Optional[str] = None  # "int8" serving mode (ops/quant.py; inference only)
    style_input_nc: int = 30 * 2  # 60: norm patches + stickman patches
    dtype: Any = jnp.float32

    def setup(self):
        self.synthesis = SynthesisNetworkFull(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            variant="v18",
            pack_tail=self.pack_tail,
            quant=self.quant,
            dtype=self.dtype,
        )
        self.num_ws = self.synthesis.num_ws
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_layers, dtype=self.dtype,
        )
        self.const_encoding = ConstEncoderNetwork(
            input_nc=3 + 3, output_nc=self.synthesis.channels(4), ngf=64,
            n_downsampling=6 if self.img_resolution == 256 else
            max(2, min(6, self.img_resolution.bit_length() - 3)),
            pack_entry=self.pack_tail,
            quant=self.quant,
            dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetworkV16(
            input_nc=self.style_input_nc, output_nc=512, ngf=64,
            pack_entry=self.pack_tail, quant=self.quant, dtype=self.dtype
        )

    def encode_pose(self, pose):
        return self.const_encoding(pose)

    def encode_style(self, style_input, retain):
        return self.style_encoding(style_input, retain)

    def map_ws(self, z, c, w_avg=None, truncation_psi=1.0, truncation_cutoff=None):
        return self.mapping(z, c, w_avg=w_avg, truncation_psi=truncation_psi,
                            truncation_cutoff=truncation_cutoff)

    def synthesize(self, ws, pose_feat, cat_feats, denorm_upper_input, denorm_lower_input,
                   denorm_upper_mask, denorm_lower_mask, noise_mode="random"):
        img, finetune_img, masks = self.synthesis(
            ws, pose_feat, cat_feats, denorm_upper_input, denorm_lower_input,
            denorm_upper_mask, denorm_lower_mask, noise_mode=noise_mode,
        )
        return img, finetune_img, masks[0], masks[1]

    def __call__(self, z, c, retain, pose, denorm_upper_input, denorm_lower_input,
                 denorm_upper_mask, denorm_lower_mask, truncation_psi=1.0,
                 truncation_cutoff=None, w_avg=None, noise_mode="random"):
        pose_feat = self.const_encoding(pose)
        stylecode, feats = self.style_encoding(c, retain)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        img, finetune_img, masks = self.synthesis(
            ws, pose_feat, cat_feats_dict(feats), denorm_upper_input,
            denorm_lower_input, denorm_upper_mask, denorm_lower_mask,
            noise_mode=noise_mode,
        )
        return img, finetune_img, masks[0], masks[1]

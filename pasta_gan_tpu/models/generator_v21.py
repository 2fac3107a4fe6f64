"""Single-branch generator clusters: V16, V20, V21.

Counterparts of reference `training/networks.py`:
* GeneratorV16 (`:4887-4929`) — single denorm branch, per-block mask heads;
* GeneratorV20 (`:5888-5922`) — module-for-module identical to V16 (same
  SynthesisNetworkV16 + encoders; the V20 fork differs only in the training
  script/data wiring), provided as an alias class for checkpoint parity;
* GeneratorV21 (`:6198-6234`) — adds the hand-mask ToRGB head and the
  face-average spade fill (face_mask input).

All use the 48-channel style stack (24 patches x 2, `:5909`) and the
6-channel pose+retain const encoding.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoders import ConstEncoderNetwork, StyleEncoderNetworkV16
from ..nn.mapping import MappingNetwork
from ..nn.synthesis import SynthesisNetworkSingle
from .generator_full import cat_feats_dict

Dtype = Any


class GeneratorV16(nn.Module):
    """Reference GeneratorV16 (`networks.py:4887-4929`).

    forward(z, c=style stack, retain, pose, denorm_clothes, denorm_mask) ->
    (coarse_img, texture_img, mask)."""

    variant: str = "v16"
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
    pack_tail: bool = True
    style_input_nc: int = 24 * 2  # networks.py:4909
    dtype: Dtype = jnp.float32

    def setup(self):
        self.synthesis = SynthesisNetworkSingle(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            variant=self.variant,
            pack_tail=self.pack_tail,
            dtype=self.dtype,
        )
        self.num_ws = self.synthesis.num_ws
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim, num_ws=self.num_ws,
            num_layers=self.mapping_layers, dtype=self.dtype,
        )
        import math as _math

        n_down = min(6, int(_math.log2(self.img_resolution)) - 2)
        self.const_encoding = ConstEncoderNetwork(
            input_nc=3 + 3, output_nc=self.synthesis.channels(4), ngf=64,
            n_downsampling=n_down, pack_entry=self.pack_tail, dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetworkV16(
            input_nc=self.style_input_nc, output_nc=512, ngf=64,
            pack_entry=self.pack_tail, dtype=self.dtype,
        )

    def __call__(self, z, c, retain, pose, denorm_clothes, denorm_mask,
                 face_mask=None, truncation_psi=1.0, truncation_cutoff=None,
                 w_avg=None, noise_mode="random"):
        pose_feat = self.const_encoding(pose)
        stylecode, feats = self.style_encoding(c, retain)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        kwargs = dict(noise_mode=noise_mode)
        if self.variant == "v21":
            kwargs["face_mask"] = face_mask
        return self.synthesis(
            ws, pose_feat, cat_feats_dict(feats), denorm_clothes, denorm_mask,
            **kwargs,
        )


class GeneratorV20(GeneratorV16):
    """Reference GeneratorV20 (`networks.py:5888-5922`) — structurally
    identical to V16; kept as a distinct class for config/registry parity."""


class GeneratorV21(GeneratorV16):
    """Reference GeneratorV21 (`networks.py:6198-6234`): hand-mask head +
    face-average spade fill.  forward(..., face_mask) ->
    (coarse_img, texture_img, clothes_mask, hand_mask)."""

    variant: str = "v21"

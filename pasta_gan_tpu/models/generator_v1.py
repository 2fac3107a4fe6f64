"""GeneratorV1 — the original flow-based PASTA-GAN generator (reference
`training/networks.py:338-502,805-913`).

The earliest variant in the experiment history: a plain StyleGAN2 skip
pyramid (pose feature replaces the learned const, cat_feat merges at
res > 16) plus a FlowNet (nn/flow.py) that predicts a dense flow warping the
affine-aligned garment `aff_top`; the warped garment is mask-merged into the
synthesis features at 128 resolution (`networks.py:478-501`).  Forward
returns the single skip image.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoders import ConstEncoderNetwork, StyleEncoderNetwork
from ..nn.flow import FlowNet, grid_sample_border
from ..nn.layers import Conv2dLayer
from ..nn.mapping import MappingNetwork
from ..nn.synthesis import SynthesisBlockFull
from .generator_full import cat_feats_dict

Dtype = Any


class SynthesisNetworkV1(nn.Module):
    """Skip pyramid with the 128-res flow-warped-garment mask merge
    (reference `networks.py:444-502`)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    dtype: Dtype = jnp.float32

    @property
    def block_resolutions(self):
        n = int(math.log2(self.img_resolution))
        return [2**i for i in range(2, n + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        return sum(1 if res == 4 else 2 for res in self.block_resolutions) + 1

    @nn.compact
    def __call__(self, ws, pose_feat, cat_feat, rec_top, noise_mode="random"):
        merge_res = self.block_resolutions[-2]
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            is_last = res == self.img_resolution
            block = SynthesisBlockFull(
                in_channels=self.channels(res // 2) if res > 4 else 0,
                out_channels=self.channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=is_last,
                is_style=False,
                head_mode=None,
                conv_clamp=self.conv_clamp,
                use_noise=self.use_noise,
                packed=False,
                dtype=self.dtype,
                name=f"b{res}",
            )
            n_conv = block.num_conv
            x, img, _ = block(
                x, img, ws[:, w_idx : w_idx + n_conv + 1], pose_feat, cat_feat,
                noise_mode=noise_mode,
            )
            w_idx += n_conv
            if res == merge_res:
                # predicted blending of the flow-warped garment
                # (networks.py:496-501); F.interpolate default is nearest.
                ch = self.channels(res)
                mask = Conv2dLayer(ch, 1, 1, activation="sigmoid",
                                   dtype=self.dtype, name="mask_conv_0")(x)
                h, w = x.shape[1], x.shape[2]
                sy = rec_top.shape[1] // h
                sx = rec_top.shape[2] // w
                top = rec_top[:, ::sy, ::sx, :].astype(x.dtype)
                merge_top = mask * top - (1.0 - mask)
                x = Conv2dLayer(ch + 3, ch, 1, dtype=self.dtype, name="merge_conv_0")(
                    jnp.concatenate([x, merge_top], axis=-1)
                )
        return img


class GeneratorV1(nn.Module):
    """Reference `Generator` (`networks.py:871-913`)."""

    z_dim: int = 0
    c_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    mapping_layers: int = 1
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    style_input_nc: int = 24 * 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.synthesis = SynthesisNetworkV1(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            dtype=self.dtype,
        )
        self.num_ws = self.synthesis.num_ws
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_layers, dtype=self.dtype,
        )
        n_down = int(math.log2(self.img_resolution)) - 2
        self.const_encoding = ConstEncoderNetwork(
            input_nc=3 + 3, output_nc=self.synthesis.channels(4), ngf=64,
            n_downsampling=min(n_down, 6), pack_entry=False, dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetwork(
            input_nc=self.style_input_nc, output_nc=512, ngf=64,
            pack_entry=False, dtype=self.dtype,
        )
        self.flownet = FlowNet(3 + 3 + 3 + 3, dtype=self.dtype)

    def __call__(
        self,
        z: Optional[jax.Array],
        c: jax.Array,  # style patch stack [N, H, W, 48]
        retain: jax.Array,  # [N, H, W, 3]
        pose: jax.Array,  # stickman + head [N, H, W, 6]
        aff_pose: jax.Array,  # affine-aligned garment pose [N, H, W, >=3]
        aff_top: jax.Array,  # affine-aligned garment image [N, H, W, 3]
        lower: jax.Array,  # person's lower-clothes image [N, H, W, 3]
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        w_avg: Optional[jax.Array] = None,
        noise_mode: str = "random",
    ):
        pose_feat = self.const_encoding(pose)
        stylecode, feats = self.style_encoding(c, retain)
        ws, _ = self.mapping(
            z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff,
        )
        flow = self.flownet(
            jnp.concatenate(
                [lower, aff_top, aff_pose[..., :3], pose[..., :3]], axis=-1
            )
        )
        rec_top = grid_sample_border(aff_top, flow)
        img = self.synthesis(
            ws, pose_feat, cat_feats_dict(feats), rec_top, noise_mode=noise_mode
        )
        return img

"""Generator512 — the 512x320 inference path (reference `networks.py:3577-3853`
+ `test_512.py`).

The plain `Generator_512` cluster (pyramid starting at 8, cat_feat merge at
res>32, no SPADE branch) is what the code defines; the *released* 512
checkpoint's synthesis additionally takes denorm inputs and returns a 3-tuple
(`test_512.py:142`) — i.e. the Full wiring at 512.  We provide both:

* `Generator512Plain`  — the literal Generator_512/Generator_512_v2 classes,
* `Generator512`       — Full-style at 512 (SPADE + finetune + parsing head),
  matching the released checkpoint's interface; this is the production path
  used by cli/test_512.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoders import ConstEncoderNetwork, StyleEncoderNetworkV16
from ..nn.mapping import MappingNetwork
from ..nn.synthesis import SynthesisNetworkFull, SynthesisBlockFull
from .generator_full import cat_feats_dict


class _Synthesis512Plain(nn.Module):
    """SynthesisNetwork_512 (reference networks.py:3679-3728): skip pyramid
    8..512, merge at res>32, plain ToRGB, no refinement branch."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    dtype: Any = jnp.float32

    @property
    def block_resolutions(self):
        import math

        n = int(math.log2(self.img_resolution))
        return [2**i for i in range(3, n + 1)]

    def channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self):
        return sum(1 if r == 8 else 2 for r in self.block_resolutions) + 1

    @nn.compact
    def __call__(self, ws, pose_feat, cat_feat, noise_mode="random"):
        resolutions = self.block_resolutions
        x = img = None
        w_idx = 0
        for res in resolutions:
            block = SynthesisBlockFull(
                in_channels=self.channels(res // 2) if res > 8 else 0,
                out_channels=self.channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                is_style=False,
                merge_min_res=32,
                conv_clamp=self.conv_clamp,
                use_noise=self.use_noise,
                dtype=self.dtype,
                name=f"b{res}",
            )
            cur_ws = ws[:, w_idx : w_idx + block.num_conv + block.num_torgb]
            x, img, _ = block(x, img, cur_ws, pose_feat, cat_feat, noise_mode=noise_mode)
            w_idx += block.num_conv
        return img


class Generator512Plain(nn.Module):
    """reference Generator_512 (`networks.py:3781-3816`); v2 uses 60-ch style."""

    z_dim: int = 0
    c_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    mapping_layers: int = 1
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = 256.0
    use_noise: bool = True
    style_input_nc: int = 24 * 2  # Generator_512; _v2 uses 30*2
    dtype: Any = jnp.float32

    def setup(self):
        self.synthesis = _Synthesis512Plain(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, channel_base=self.channel_base,
            channel_max=self.channel_max, conv_clamp=self.conv_clamp,
            use_noise=self.use_noise, dtype=self.dtype,
        )
        self.num_ws = self.synthesis.num_ws
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim, num_ws=self.num_ws,
            num_layers=self.mapping_layers, dtype=self.dtype,
        )
        import math as _math

        n_down = min(6, int(_math.log2(self.img_resolution)) - 3)  # 512 -> 6 (8x8 feat)
        self.const_encoding = ConstEncoderNetwork(
            input_nc=6, output_nc=self.synthesis.channels(8), ngf=64, n_downsampling=n_down,
            dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetworkV16(
            input_nc=self.style_input_nc, output_nc=512, ngf=64, extra_convs=0,
            dtype=self.dtype,
        )

    def __call__(self, z, c, retain, pose, truncation_psi=1.0, truncation_cutoff=None,
                 w_avg=None, noise_mode="random"):
        pose_feat = self.const_encoding(pose)
        stylecode, feats = self.style_encoding(c, retain)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        return self.synthesis(ws, pose_feat, cat_feats_dict(feats), noise_mode=noise_mode)


class Generator512(nn.Module):
    """Full-style generator at 512 (the released-512-checkpoint interface:
    3-tuple synthesis with denorm inputs, `test_512.py:142`).

    Style input: 45 channels (30 upper-part + 15 lower-part patches,
    `test_512.py:121`)."""

    z_dim: int = 0
    c_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    mapping_layers: int = 1
    channel_base: int = 32768  # fmaps=1 at 512 per cfg auto rules
    channel_max: int = 512
    conv_clamp: Optional[float] = 256.0
    use_noise: bool = True
    pack_tail: bool = True  # W-pack <=64ch last blocks (ops/packing.py; exact)
    quant: Optional[str] = None  # "int8" serving mode (ops/quant.py; inference only)
    style_input_nc: int = 45
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
            variant="full",
            start_res=8,
            pack_tail=self.pack_tail,
            merge_min_res=32,
            quant=self.quant,
            dtype=self.dtype,
        )
        self.num_ws = self.synthesis.num_ws
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim, num_ws=self.num_ws,
            num_layers=self.mapping_layers, dtype=self.dtype,
        )
        import math as _math

        n_down = min(6, int(_math.log2(self.img_resolution)) - 3)  # 512 -> 6 (8x8 feat)
        self.const_encoding = ConstEncoderNetwork(
            input_nc=6, output_nc=self.synthesis.channels(8), ngf=64, n_downsampling=n_down,
            pack_entry=self.pack_tail,
            quant=self.quant,
            dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetworkV16(
            input_nc=self.style_input_nc, output_nc=512, ngf=64, extra_convs=0,
            pack_entry=self.pack_tail, quant=self.quant, dtype=self.dtype,
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
        return self.synthesis(
            ws, pose_feat, cat_feats, denorm_upper_input, denorm_lower_input,
            denorm_upper_mask, denorm_lower_mask, noise_mode=noise_mode,
        )

    def __call__(self, z, c, retain, pose, denorm_upper_input, denorm_lower_input,
                 denorm_upper_mask, denorm_lower_mask, truncation_psi=1.0,
                 truncation_cutoff=None, w_avg=None, noise_mode="random"):
        pose_feat = self.const_encoding(pose)
        stylecode, feats = self.style_encoding(c, retain)
        ws, _ = self.mapping(z, stylecode, w_avg=w_avg, truncation_psi=truncation_psi,
                             truncation_cutoff=truncation_cutoff)
        return self.synthesis(
            ws, pose_feat, cat_feats_dict(feats), denorm_upper_input,
            denorm_lower_input, denorm_upper_mask, denorm_lower_mask,
            noise_mode=noise_mode,
        )

"""GeneratorFull — the production training target (reference `networks.py:5843-5881`).

Assembly: const_encoding (pose+retain, 6ch -> 4x4x512), style_encoding
(42-channel patch stack + retain -> 512-d style + cat_feats), mapping
(z=0 + style code -> ws), SynthesisNetworkFull.

The exposed sub-callables (`encode_style`, `encode_pose`, `map_ws`,
`synthesize`) mirror the reference's G.style_encoding / G.const_encoding /
G.mapping / G.synthesis split that both the training loss
(`loss_wo_flow_fullbody.py:74-116`) and the test CLI (`test.py:121-128`) use.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.encoders import ConstEncoderNetwork, StyleEncoderNetworkV16
from ..nn.mapping import MappingNetwork
from ..nn.synthesis import SynthesisNetworkFull

Dtype = Any


def cat_feats_dict(feats) -> Dict[str, jax.Array]:
    """Index multi-resolution retain features by spatial size (networks.py:5874-5877)."""
    return {str(f.shape[1]): f for f in feats}


class GeneratorFull(nn.Module):
    z_dim: int = 0
    c_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    # mapping kwargs
    mapping_layers: int = 1
    # synthesis kwargs
    channel_base: int = 16384
    channel_max: int = 512
    conv_clamp: Optional[float] = 256.0
    use_noise: bool = True
    remat: bool = False  # rematerialize synthesis blocks (training memory)
    pack_tail: bool = True  # W-pack <=64ch last blocks (ops/packing.py; exact)
    quant: Optional[str] = None  # "int8" serving mode (ops/quant.py; inference only)
    # encoder kwargs
    style_input_nc: int = 10 * 3 + 4 * 3  # 42: ten upper patches + four lower patches
    dtype: Dtype = jnp.float32

    def setup(self):
        self.synthesis = SynthesisNetworkFull(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            remat=self.remat,
            pack_tail=self.pack_tail,
            quant=self.quant,
            dtype=self.dtype,
        )
        self.num_ws = self.synthesis.num_ws
        self.mapping = MappingNetwork(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            num_ws=self.num_ws,
            num_layers=self.mapping_layers,
            dtype=self.dtype,
        )
        # Pose encoder maps the img_resolution pose map to the 4x4 input of the
        # first synthesis block: log2(res)-2 stride-2 convs (6 at 256, matching
        # the reference's fixed n_downsampling=6 exactly).
        import math as _math

        n_down = int(_math.log2(self.img_resolution)) - 2
        self.const_encoding = ConstEncoderNetwork(
            input_nc=3 + 3,
            output_nc=self.synthesis.channels(4),
            ngf=64,
            n_downsampling=min(n_down, 6),
            pack_entry=self.pack_tail,
            quant=self.quant,
            dtype=self.dtype,
        )
        self.style_encoding = StyleEncoderNetworkV16(
            input_nc=self.style_input_nc, output_nc=512, ngf=64,
            pack_entry=self.pack_tail, quant=self.quant, dtype=self.dtype
        )

    # -- sub-network entry points (mirroring the reference's attribute access) --

    def encode_pose(self, pose: jax.Array) -> jax.Array:
        return self.const_encoding(pose)

    def encode_style(self, style_input: jax.Array, retain: jax.Array):
        return self.style_encoding(style_input, retain)

    def map_ws(self, z, c, w_avg=None, truncation_psi=1.0, truncation_cutoff=None):
        return self.mapping(
            z, c, w_avg=w_avg, truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff
        )

    def synthesize(self, ws, pose_feat, cat_feats, denorm_upper_input, denorm_lower_input,
                   denorm_upper_mask, denorm_lower_mask, noise_mode="random"):
        return self.synthesis(
            ws, pose_feat, cat_feats, denorm_upper_input, denorm_lower_input,
            denorm_upper_mask, denorm_lower_mask, noise_mode=noise_mode,
        )

    def __call__(
        self,
        z: Optional[jax.Array],
        c: jax.Array,  # style-encoder input stack [N,256,256,42]
        retain: jax.Array,  # retain image [N,256,256,3]
        pose: jax.Array,  # pose stickman + head [N,256,256,6]
        denorm_upper_input: jax.Array,
        denorm_lower_input: jax.Array,
        denorm_upper_mask: jax.Array,
        denorm_lower_mask: jax.Array,
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
        img, finetune_img, pred_parsing = self.synthesis(
            ws,
            pose_feat,
            cat_feats_dict(feats),
            denorm_upper_input,
            denorm_lower_input,
            denorm_upper_mask,
            denorm_lower_mask,
            noise_mode=noise_mode,
        )
        return img, finetune_img, pred_parsing

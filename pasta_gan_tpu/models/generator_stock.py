"""Stock (unconditional) StyleGAN2-ADA generator — the TF-legacy landing target.

Legacy TensorFlow StyleGAN2 pickles (reference `legacy.py:109-204`) hold the
UPSTREAM const-input generator: mapping z/c -> w plus a 4x4 const pyramid of
two-conv skip blocks.  The reference repo cannot actually land them: its
`networks.Generator` (`training/networks.py:339-560`) was rewritten for
PASTA-GAN (the const input is commented out in favor of a `pose_feature`
argument, `networks.py:368-371,405-410`, and every skip block grew a
`merge_conv` that no TF pickle provides, `networks.py:391-392`), so
`legacy.convert_tf_generator`'s pattern table (`legacy.py:170-202`) no longer
covers the module it builds.  This module restores the stock architecture —
exactly what a TF pickle contains — so `io.tf_legacy.convert_tf_generator`
has a real landing target and the reference's transfer-learning resume
presets (`train_wo_flow_fullbody.py:319-325`) work end-to-end here.

Block/network structure follows upstream StyleGAN2-ADA semantics as pinned
by the conversion pattern table (`legacy.py:170-202`): per-block
conv0(up=2)+conv1 (+resnet skip), skip-architecture ToRGB accumulation with
each block's torgb sharing the next block's first w, const input broadcast
over the batch.  Built from the zoo's parity-tested primitives
(SynthesisLayer / ToRGBLayer / Conv2dLayer / MappingNetwork).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Conv2dLayer
from ..nn.mapping import MappingNetwork
from ..nn.synthesis import SynthesisLayer, ToRGBLayer, _resample_filter_const
from ..ops.upfirdn2d import upsample2d

Dtype = Any


class SynthesisBlockStock(nn.Module):
    """Const-or-upsample input + two modulated convs + ToRGB skip."""

    in_channels: int  # 0 = first (const) block
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    activation: str = "lrelu"
    dtype: Dtype = jnp.float32

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        img: Optional[jax.Array],
        ws: jax.Array,  # [N, num_conv + num_torgb, w_dim]
        noise_mode: str = "random",
    ):
        assert self.architecture in ("orig", "skip", "resnet")
        layer_common = dict(
            w_dim=self.w_dim,
            resolution=self.resolution,
            resample_filter=self.resample_filter,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            activation=self.activation,
            dtype=self.dtype,
        )
        w_idx = 0

        if self.in_channels == 0:
            const = self.param(
                "const",
                lambda key, s: jax.random.normal(key, s, jnp.float32),
                (self.resolution, self.resolution, self.out_channels),
            )
            x = jnp.broadcast_to(
                const.astype(self.dtype)[None],
                (ws.shape[0], self.resolution, self.resolution, self.out_channels),
            )
            x = SynthesisLayer(
                self.out_channels, self.out_channels, name="conv1", **layer_common
            )(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
        elif self.architecture == "resnet":
            y = Conv2dLayer(
                self.in_channels, self.out_channels, 1, use_bias=False, up=2,
                resample_filter=self.resample_filter, dtype=self.dtype, name="skip",
            )(x, gain=math.sqrt(0.5))
            x = SynthesisLayer(
                self.in_channels, self.out_channels, up=2, name="conv0", **layer_common
            )(x.astype(self.dtype), ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
            x = SynthesisLayer(
                self.out_channels, self.out_channels, name="conv1", **layer_common
            )(x, ws[:, w_idx], noise_mode=noise_mode, gain=math.sqrt(0.5))
            w_idx += 1
            x = y + x
        else:
            x = SynthesisLayer(
                self.in_channels, self.out_channels, up=2, name="conv0", **layer_common
            )(x.astype(self.dtype), ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
            x = SynthesisLayer(
                self.out_channels, self.out_channels, name="conv1", **layer_common
            )(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1

        if img is not None:
            f = jnp.asarray(_resample_filter_const(self.resample_filter))
            img = upsample2d(img, f)
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(
                self.out_channels,
                self.img_channels,
                w_dim=self.w_dim,
                conv_clamp=self.conv_clamp,
                dtype=self.dtype,
                name="torgb",
            )(x, ws[:, w_idx])
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetworkStock(nn.Module):
    """4x4 -> img_resolution const-input skip pyramid (upstream semantics)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0  # parity only; compute dtype governed by `dtype`
    conv_clamp: Optional[float] = None
    architecture: str = "skip"
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    use_noise: bool = True
    activation: str = "lrelu"
    dtype: Dtype = jnp.float32

    @property
    def block_resolutions(self):
        n = int(math.log2(self.img_resolution))
        return [2**i for i in range(2, n + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        # 1 conv (b4) + 2 per upsampling block + the last block's torgb;
        # arithmetic (no module construction — flax forbids it in properties)
        return 2 * len(self.block_resolutions)

    @nn.compact
    def __call__(self, ws: jax.Array, noise_mode: str = "random") -> jax.Array:
        assert ws.shape[1] == self.num_ws, (ws.shape, self.num_ws)
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            block = SynthesisBlockStock(
                in_channels=self.channels(res // 2) if res > 4 else 0,
                out_channels=self.channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=res == self.img_resolution,
                architecture=self.architecture,
                resample_filter=self.resample_filter,
                conv_clamp=self.conv_clamp,
                use_noise=self.use_noise,
                activation=self.activation,
                dtype=self.dtype,
                name=f"b{res}",
            )
            # a skip block's torgb reads the NEXT block's first w (upstream
            # slicing: ws[:, w_idx : w_idx + num_conv + num_torgb])
            block_ws = jax.lax.dynamic_slice_in_dim(
                ws, w_idx, block.num_conv + block.num_torgb, axis=1
            )
            x, img = block(x, img, block_ws, noise_mode=noise_mode)
            w_idx += block.num_conv
        return img


class GeneratorStock(nn.Module):
    """mapping + stock synthesis; `legacy.py:131-146`'s converted kwargs land
    1:1 on these fields."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    mapping_kwargs: dict = dataclasses.field(default_factory=dict)
    synthesis_kwargs: dict = dataclasses.field(default_factory=dict)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.synthesis = SynthesisNetworkStock(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            dtype=self.dtype,
            **self.synthesis_kwargs,
        )
        self.mapping = MappingNetwork(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            num_ws=self.synthesis.num_ws,
            dtype=self.dtype,
            **self.mapping_kwargs,
        )

    @property
    def num_ws(self) -> int:
        return 2 * (int(math.log2(self.img_resolution)) - 1)

    def __call__(
        self,
        z: jax.Array,
        c: Optional[jax.Array] = None,
        w_avg: Optional[jax.Array] = None,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        noise_mode: str = "random",
    ):
        ws, w_raw = self.mapping(
            z, c, w_avg=w_avg,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
        )
        img = self.synthesis(ws, noise_mode=noise_mode)
        return img, w_raw

"""StyleGAN2 discriminator stack (reference `training/networks.py:916-1139`).

Conditioning: `c` is the 512-d style code produced by the generator's style
encoder; it is embedded by an internal MappingNetwork and projected against
the epilogue features (`networks.py:1074-1077`; c_dim is hardcoded to 512 by
the training loop, `training_loop_wo_flow_fullbody.py:274`).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2dLayer, FullyConnectedLayer, MinibatchStdLayer
from .mapping import MappingNetwork
from ..ops import downsample2d
from .layers import _resample_filter_const

Dtype = Any


class DiscriminatorBlock(nn.Module):
    """Resnet-down block (reference `networks.py:916-996`)."""

    in_channels: int  # 0 = first block (fromrgb)
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    first_layer_idx: int = 0
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    freeze_layers: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array]):
        assert self.architecture in ("orig", "skip", "resnet")
        layer_idx = self.first_layer_idx

        def trainable():
            nonlocal layer_idx
            t = layer_idx >= self.freeze_layers
            layer_idx += 1
            return t

        common = dict(conv_clamp=self.conv_clamp, dtype=self.dtype)

        if self.in_channels == 0 or self.architecture == "skip":
            y = Conv2dLayer(
                self.img_channels, self.tmp_channels, 1, activation=self.activation,
                trainable=trainable(), name="fromrgb", **common,
            )(img.astype(self.dtype))
            x = x + y if x is not None else y
            if self.architecture == "skip":
                f = jnp.asarray(_resample_filter_const(self.resample_filter))
                img = downsample2d(img, f)
            else:
                img = None

        if self.architecture == "resnet":
            y = Conv2dLayer(
                self.tmp_channels, self.out_channels, 1, use_bias=False, down=2,
                trainable=trainable(), resample_filter=self.resample_filter,
                dtype=self.dtype, name="skip",
            )(x, gain=math.sqrt(0.5))
            x = Conv2dLayer(
                self.tmp_channels, self.tmp_channels, 3, activation=self.activation,
                trainable=trainable(), name="conv0", **common,
            )(x)
            x = Conv2dLayer(
                self.tmp_channels, self.out_channels, 3, activation=self.activation, down=2,
                trainable=trainable(), resample_filter=self.resample_filter,
                name="conv1", **common,
            )(x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(
                self.tmp_channels, self.tmp_channels, 3, activation=self.activation,
                trainable=trainable(), name="conv0", **common,
            )(x)
            x = Conv2dLayer(
                self.tmp_channels, self.out_channels, 3, activation=self.activation, down=2,
                trainable=trainable(), resample_filter=self.resample_filter,
                name="conv1", **common,
            )(x)
        return x, img


class DiscriminatorEpilogue(nn.Module):
    """mbstd + conv + FCs + cmap projection (reference `networks.py:1026-1080`)."""

    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, img: Optional[jax.Array], cmap: Optional[jax.Array]):
        # Epilogue always runs fp32 in the reference (networks.py:1057).
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + Conv2dLayer(
                self.img_channels, self.in_channels, 1, activation=self.activation,
                name="fromrgb",
            )(img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(self.mbstd_group_size, self.mbstd_num_channels, name="mbstd")(x)
        x = Conv2dLayer(
            self.in_channels + self.mbstd_num_channels, self.in_channels, 3,
            activation=self.activation, conv_clamp=self.conv_clamp, name="conv",
        )(x)
        x = FullyConnectedLayer(
            self.in_channels * self.resolution**2, self.in_channels,
            activation=self.activation, name="fc",
        )(x.reshape(x.shape[0], -1))
        x = FullyConnectedLayer(
            self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim, name="out"
        )(x)
        if self.cmap_dim > 0:
            assert cmap is not None and cmap.shape[-1] == self.cmap_dim
            x = jnp.sum(x * cmap, axis=-1, keepdims=True) * (1.0 / math.sqrt(self.cmap_dim))
        return x


class Discriminator(nn.Module):
    """Full discriminator (reference `networks.py:1085-1139`)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0  # parity only
    conv_clamp: Optional[float] = None
    cmap_dim: Optional[int] = None
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    freeze_layers: int = 0
    dtype: Dtype = jnp.float32

    @property
    def block_resolutions(self):
        n = int(math.log2(self.img_resolution))
        return [2**i for i in range(n, 2, -1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @nn.compact
    def __call__(self, img: jax.Array, c: Optional[jax.Array]):
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else self.channels(4)
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        cur_layer_idx = 0
        for res in self.block_resolutions:
            in_channels = self.channels(res) if res < self.img_resolution else 0
            block = DiscriminatorBlock(
                in_channels,
                self.channels(res),
                self.channels(res // 2),
                resolution=res,
                img_channels=self.img_channels,
                first_layer_idx=cur_layer_idx,
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                freeze_layers=self.freeze_layers,
                dtype=self.dtype,
                name=f"b{res}",
            )
            x, img = block(x, img)
            # layer count: fromrgb (first block) + conv0/conv1 (+skip)
            cur_layer_idx += (1 if in_channels == 0 else 0) + (
                3 if self.architecture == "resnet" else 2
            )

        cmap = None
        if self.c_dim > 0:
            cmap, _ = MappingNetwork(
                z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim, num_ws=None, w_avg_beta=None,
                dtype=self.dtype, name="mapping",
            )(None, c)
        return DiscriminatorEpilogue(
            self.channels(4),
            cmap_dim=cmap_dim,
            resolution=4,
            img_channels=self.img_channels,
            architecture=self.architecture,
            mbstd_group_size=self.mbstd_group_size,
            mbstd_num_channels=self.mbstd_num_channels,
            conv_clamp=self.conv_clamp,
            name="b4",
        )(x, img, cmap)

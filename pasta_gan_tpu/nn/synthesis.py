"""Synthesis pyramid of the Full (training-target) generator cluster.

Counterpart of `training/networks.py:263-440` (core layers) and
`:5582-5840` (Full cluster: parsing-predicting ToRGB, cat_feat merges,
SPADE refinement branch, texture_b256 finetune head).

Block wiring notes preserved from the reference:
* the first (4x4) block takes the pose feature map as its input instead of a
  learned const (`networks.py:5682-5686`); the `const` parameter is still
  created for checkpoint compatibility but unused,
* at resolutions > 16 the person-retain features `cat_feat[res]` (64 channels)
  are concatenated and merged by a 1x1 conv (`networks.py:5703-5706`),
* each block consumes `num_conv` entries of ws and the skip-architecture ToRGB
  consumes the first w of the *next* block (w_idx advances by num_conv only,
  `networks.py:5809-5813`),
* the finetune branch re-uses the last block's ws (`networks.py:5837-5838`).
"""

from __future__ import annotations

import math

import numpy as np
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import bias_act, modulated_conv2d, upsample2d
from .layers import Conv2dLayer, FullyConnectedLayer, ResBlock, activation_funcs, _resample_filter_const
from .spade import QuantizeSite, SpadeResBlock

Dtype = Any


class SynthesisLayer(nn.Module):
    """Modulated conv + optional per-pixel noise + bias_act (reference `networks.py:263-315`)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    packed_in: bool = False  # x arrives W-packed (ops/packing.py)
    packed_out: bool = False  # emit W-packed output
    quant: Optional[str] = None  # "int8" serving mode (ops/quant.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, w: jax.Array, noise_mode: str = "random", gain: float = 1.0
    ) -> jax.Array:
        assert noise_mode in ("random", "const", "none")
        styles = FullyConnectedLayer(
            self.w_dim, self.in_channels, bias_init=1.0, dtype=self.dtype, name="affine"
        )(w)
        k = self.kernel_size
        weight = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (k, k, self.in_channels, self.out_channels),
        )

        noise = None
        if self.use_noise and noise_mode != "none":
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            if noise_mode == "random":
                shape = (
                    (x.shape[0], self.resolution, self.resolution // 2, 2)
                    if self.packed_out
                    else (x.shape[0], self.resolution, self.resolution, 1)
                )
                noise = (
                    jax.random.normal(self.make_rng("noise"), shape, self.dtype)
                    * noise_strength.astype(self.dtype)
                )
            else:  # const
                noise_const = self.variable(
                    "buffers",
                    "noise_const",
                    lambda: jax.random.normal(
                        self.make_rng("params"), (self.resolution, self.resolution), jnp.float32
                    ),
                )
                noise = (noise_const.value * noise_strength).astype(self.dtype)
                if self.packed_out:
                    # exact repack of the unpacked buffer (pair columns)
                    noise = noise.reshape(self.resolution, self.resolution // 2, 2)[None]
                else:
                    noise = noise[None, :, :, None]

        from ..ops.quant import is_int8, module_act_scale

        q = self.quant if is_int8(self.quant) else None
        f = jnp.asarray(_resample_filter_const(self.resample_filter))
        x = modulated_conv2d(
            x.astype(self.dtype),
            weight.astype(self.dtype),
            styles,
            noise=noise,
            up=self.up,
            padding=k // 2,
            resample_filter=f if self.up > 1 else None,
            flip_weight=(self.up == 1),
            packed_in=self.packed_in,
            packed_out=self.packed_out,
            quant=q,
            # the site sees the MODULATED tensor; in static mode the
            # calibrated amax absorbs the per-sample style range (dynamic
            # per-sample scales cost ~4 ms/batch-16 of fused reductions)
            quant_site=(lambda xm: module_act_scale(self, xm, q)) if q else None,
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if self.packed_out:
            b = jnp.concatenate([b, b], axis=-1)
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, axis=-1, act=self.activation, gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """1x1 modulated conv without demodulation (reference `networks.py:319-334`)."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        k = self.kernel_size
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        styles = (
            FullyConnectedLayer(
                self.w_dim, self.in_channels, bias_init=1.0, dtype=self.dtype, name="affine"
            )(w)
            * weight_gain
        )
        weight = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32),
            (k, k, self.in_channels, self.out_channels),
        )
        x = modulated_conv2d(
            x.astype(self.dtype), weight.astype(self.dtype), styles, demodulate=False
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return bias_act(x, b, axis=-1, clamp=self.conv_clamp)


class ToRGBLayerFull(nn.Module):
    """ToRGB with an optional auxiliary head on the final style block.

    head_mode:
      "parsing6"   — 6-class parsing logits head (Full cluster,
                     reference `networks.py:5582-5611`),
      "masks2"     — two 1-channel sigmoid masks (upper/lower, V18 cluster,
                     reference `networks.py:5276-5310`),
      "mask1"      — one sigmoid clothes mask named m_weight/m_bias
                     (V15/V16/V20 cluster, reference `networks.py:4175-4197`;
                     built on EVERY skip block there -> head_always=True),
      "masks_hand" — clothes + hand sigmoid masks named m_weight/hm_weight
                     (V21 cluster, reference `networks.py:5928-5962`),
      None         — plain ToRGB.
    The head is built when (is_last and is_style) or head_always.
    """

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None
    is_last: bool = False
    is_style: bool = False
    head_mode: Optional[str] = "parsing6"
    head_always: bool = False  # build heads on every block (V15/16/20 style)
    num_parsing_classes: int = 6
    packed_in: bool = False  # x arrives W-packed; output unpacked (img domain)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array):
        k = self.kernel_size
        weight_gain = 1.0 / math.sqrt(self.in_channels * k * k)
        styles = (
            FullyConnectedLayer(
                self.w_dim, self.in_channels, bias_init=1.0, dtype=self.dtype, name="affine"
            )(w)
            * weight_gain
        )

        # All heads share the input and styles and are demodulation-free 1x1
        # modconvs, so they fuse into ONE conv with output-channel-concatenated
        # weights (mathematically identical; per-head bias_act applied after).
        def head_param(name_w, name_b, out_ch):
            m_weight = self.param(
                name_w,
                lambda key, s: jax.random.normal(key, s, jnp.float32),
                (k, k, self.in_channels, out_ch),
            )
            m_bias = self.param(name_b, nn.initializers.zeros, (out_ch,))
            return m_weight, m_bias

        weight, b = head_param("weight", "bias", self.out_channels)
        weights = [weight]
        splits = [self.out_channels]
        head_acts = []
        if (self.is_last and self.is_style) or self.head_always:
            if self.head_mode == "parsing6":
                mw, mb = head_param("m_weight1", "m_bias1", self.num_parsing_classes)
                weights.append(mw)
                splits.append(self.num_parsing_classes)
                head_acts.append((mb, "linear"))
            elif self.head_mode == "masks2":
                for name_w, name_b in (("m_weight1", "m_bias1"), ("m_weight2", "m_bias2")):
                    mw, mb = head_param(name_w, name_b, 1)
                    weights.append(mw)
                    splits.append(1)
                    head_acts.append((mb, "sigmoid"))
            elif self.head_mode == "mask1":
                mw, mb = head_param("m_weight", "m_bias", 1)
                weights.append(mw)
                splits.append(1)
                head_acts.append((mb, "sigmoid"))
            elif self.head_mode == "masks_hand":
                for name_w, name_b in (("m_weight", "m_bias"), ("hm_weight", "hm_bias")):
                    mw, mb = head_param(name_w, name_b, 1)
                    weights.append(mw)
                    splits.append(1)
                    head_acts.append((mb, "sigmoid"))

        fused = jnp.concatenate(weights, axis=-1) if len(weights) > 1 else weights[0]
        y = modulated_conv2d(
            x.astype(self.dtype), fused.astype(self.dtype), styles, demodulate=False,
            packed_in=self.packed_in, packed_out=self.packed_in,
        )
        if self.packed_in:
            from ..ops.packing import unpack_w

            y = unpack_w(y)
        offs = np.cumsum(splits)
        img = bias_act(y[..., : offs[0]], b, axis=-1, clamp=self.conv_clamp)

        aux = None
        if head_acts:
            outs = [
                bias_act(y[..., offs[i] : offs[i + 1]], mb, axis=-1, act=act, clamp=self.conv_clamp)
                for i, (mb, act) in enumerate(head_acts)
            ]
            aux = outs[0] if len(outs) == 1 else tuple(outs)
        return img, aux


class SynthesisBlockFull(nn.Module):
    """Two synthesis layers + skip-ToRGB + cat_feat merge (reference `networks.py:5614-5719`)."""

    in_channels: int  # 0 = first block
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    is_style: bool = False
    head_mode: Optional[str] = "parsing6"
    head_always: bool = False  # heads on every skip block (V15/16/20 style)
    merge_min_res: int = 16  # cat_feat merge when resolution > this (512 cluster: 32)
    architecture: str = "skip"
    resample_filter: Sequence[float] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    packed: bool = False  # W-packed tail (<=64ch last blocks; ops/packing.py)
    quant: Optional[str] = None  # "int8" serving mode (unpacked conv paths)
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
        pose_feature: jax.Array,
        cat_feat: Dict[str, jax.Array],
        noise_mode: str = "random",
    ):
        assert self.architecture in ("orig", "skip", "resnet")
        layer_common = dict(
            w_dim=self.w_dim,
            resolution=self.resolution,
            resample_filter=self.resample_filter,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            quant=self.quant,
            dtype=self.dtype,
        )
        w_idx = 0

        if self.in_channels == 0:
            # Kept for checkpoint-shape parity with the reference; the forward
            # pass uses the pose feature instead (networks.py:5645-5647,5682-5686).
            self.param(
                "const",
                lambda key, s: jax.random.normal(key, s, jnp.float32),
                (self.resolution, self.resolution, self.out_channels),
            )
            x = pose_feature.astype(self.dtype)
            x = SynthesisLayer(self.out_channels, self.out_channels, name="conv1", **layer_common)(
                x, ws[:, w_idx], noise_mode=noise_mode
            )
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
            x = SynthesisLayer(self.out_channels, self.out_channels, name="conv1", **layer_common)(
                x, ws[:, w_idx], noise_mode=noise_mode, gain=math.sqrt(0.5)
            )
            w_idx += 1
            x = y + x
        else:
            pk = self.packed and self.architecture == "skip"
            x = SynthesisLayer(
                self.in_channels, self.out_channels, up=2, packed_out=pk,
                name="conv0", **layer_common
            )(x.astype(self.dtype), ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
            x = SynthesisLayer(
                self.out_channels, self.out_channels, packed_in=pk, packed_out=pk,
                name="conv1", **layer_common
            )(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1
            if self.resolution > self.merge_min_res:
                feat = cat_feat[str(self.resolution)].astype(self.dtype)
                feat_ch = feat.shape[-1]
                if pk:
                    # plain concat of separately packed tensors; the grouped
                    # 1x1 weights absorb the block layout (no channel shuffle
                    # — a 5-D interleave here cost ~3 ms of relayout copies)
                    from ..ops.packing import pack_w

                    if feat.shape[2] != x.shape[2]:
                        feat = pack_w(feat)  # producer may emit packed already
                    feat_ch = feat.shape[-1] // 2
                    x = jnp.concatenate([x, feat], axis=-1)
                else:
                    if feat.shape[1] == feat.shape[2] * 2:
                        # packed producer feeding an unpacked block (config
                        # with >64ch last blocks): unpack at the boundary
                        from ..ops.packing import unpack_w

                        feat = unpack_w(feat)
                        feat_ch = feat.shape[-1]
                    x = jnp.concatenate([x, feat], axis=-1)
                x = Conv2dLayer(
                    self.out_channels + feat_ch,
                    self.out_channels,
                    1,
                    resample_filter=self.resample_filter,
                    pack_mode="same" if pk else None,
                    packed_groups=(self.out_channels, feat_ch) if pk else None,
                    quant=self.quant,
                    dtype=self.dtype,
                    name="merge_conv",
                )(x)

        pred_parsing = None
        if img is not None:
            f = jnp.asarray(_resample_filter_const(self.resample_filter))
            img = upsample2d(img, f)
        if self.is_last or self.architecture == "skip":
            y, pred_parsing = ToRGBLayerFull(
                self.out_channels,
                self.img_channels,
                w_dim=self.w_dim,
                conv_clamp=self.conv_clamp,
                is_last=self.is_last,
                is_style=self.is_style,
                head_mode=self.head_mode,
                head_always=self.head_always,
                packed_in=self.packed and self.architecture == "skip" and self.in_channels != 0,
                dtype=self.dtype,
                name="torgb",
            )(x, ws[:, w_idx])
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img, pred_parsing


class SynthesisNetworkFull(nn.Module):
    """Skip-pyramid 4->img_resolution + SPADE refinement + texture finetune head
    (reference `networks.py:5722-5840`)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0  # parity only; compute dtype governed by `dtype`
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    variant: str = "full"  # "full" (parsing head) | "v18" (upper/lower mask heads)
    start_res: int = 4  # the 512 cluster starts its pyramid at 8 (networks.py:3696)
    merge_min_res: int = 16
    remat: bool = False  # jax.checkpoint each block (memory for FLOPs; SURVEY 7 hard-part 4)
    pack_tail: bool = True  # W-pack <=64-channel last blocks (ops/packing.py; exact)
    quant: Optional[str] = None  # "int8" serving mode (ops/quant.py)
    dtype: Dtype = jnp.float32

    @property
    def block_resolutions(self):
        n = int(math.log2(self.img_resolution))
        return [2**i for i in range(int(math.log2(self.start_res)), n + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        total = 0
        for res in self.block_resolutions:
            total += 1 if res == self.start_res else 2
        return total + 1  # + last block's torgb

    def _block(self, res: int, is_last: bool, is_style: bool, name: str) -> SynthesisBlockFull:
        cls = (
            nn.remat(SynthesisBlockFull, static_argnums=(6,))  # noise_mode (positional, incl self)
            if self.remat
            else SynthesisBlockFull
        )
        return cls(
            in_channels=self.channels(res // 2) if res > self.start_res else 0,
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            is_last=is_last,
            is_style=is_style,
            head_mode="masks2" if self.variant == "v18" else "parsing6",
            merge_min_res=self.merge_min_res,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            packed=self.pack_tail and is_last and self.channels(res) * 2 <= 128,
            quant=self.quant,
            dtype=self.dtype,
            name=name,
        )

    def get_spade_feat(self, mask: jax.Array, denorm_mask: jax.Array, denorm_input: jax.Array):
        """Fill person-visible-but-garment-missing regions with the average of
        valid denorm features (reference `networks.py:5777-5800`).  NHWC.

        All statistics are per-sample, so the upper and lower branches may be
        run separately or batch-stacked; batch-stacking measures faster on
        TPU (see the measurement note at the call site).
        """
        spade_encoder = self.spade_encoder  # bound submodule (see setup)
        mask = (mask > 0.9).astype(denorm_input.dtype)
        # F.interpolate(scale_factor=0.5) nearest == stride-2 subsample.
        mask_128 = mask[:, ::2, ::2, :]
        denorm_mask_128 = denorm_mask[:, ::2, ::2, :]
        mask_128 = (mask_128 > 0.9).astype(mask.dtype)
        denorm_mask_128 = (denorm_mask_128 > 0.9).astype(mask.dtype)

        valid_mask = ((mask_128 + denorm_mask_128) == 2.0).astype(mask.dtype)
        res_mask = mask_128 - valid_mask

        denorm_input = denorm_input * mask - (1.0 - mask)
        feat = spade_encoder(denorm_input)
        valid_feat = feat * valid_mask

        feat_hw = feat.shape[1] * feat.shape[2]
        valid_feat_sum = jnp.sum(valid_feat, axis=(1, 2), keepdims=True)
        valid_mask_sum = jnp.sum(valid_mask, axis=(1, 2), keepdims=True)
        valid_index = (valid_mask_sum > 10).astype(mask.dtype)
        valid_mask_sum = valid_mask_sum * valid_index + feat_hw * (1.0 - valid_index)
        avg_feat = valid_feat_sum / valid_mask_sum

        return feat * (1.0 - res_mask) + avg_feat * res_mask

    def setup(self):
        resolutions = self.block_resolutions
        blocks = []
        for res in resolutions:
            is_last = res == self.img_resolution
            blocks.append(self._block(res, is_last=is_last, is_style=True, name=f"b{res}"))
        self.blocks = blocks

        res_pre = resolutions[-2]
        ch = self.channels(res_pre)
        sp = dict(resolution=128, feat_multiplier=2, quant=self.quant, dtype=self.dtype)
        self.spade_b128_1 = SpadeResBlock(ch, ch, **sp)
        self.spade_b128_2 = SpadeResBlock(ch, ch, **sp)
        self.spade_b128_3 = SpadeResBlock(ch, ch, **sp)
        from ..ops.quant import is_int8 as _is_int8

        if _is_int8(self.quant):
            # one quantize pass of spade_feat shared by all nine conv_mlp
            # consumers across the three SPADE blocks
            self.spade_feat_quant = QuantizeSite(self.quant)

        res = resolutions[-1]
        # V18's texture block builds (and discards) the mask heads, the Full
        # cluster's does not (is_style=False) — keep shapes checkpoint-exact.
        self.texture_b256 = SynthesisBlockFull(
            in_channels=self.channels(res // 2),
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            is_last=True,
            is_style=(self.variant == "v18"),
            head_mode="masks2" if self.variant == "v18" else "parsing6",
            merge_min_res=self.merge_min_res,
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            packed=self.pack_tail and self.channels(res) * 2 <= 128,
            quant=self.quant,
            dtype=self.dtype,
            name="texture_b256",
        )

        ngf = 64
        # Boundary-free W-packing of the 64ch@full-res stages: the 7x7 entry
        # conv emits packed output via a stride-(1,2) phase kernel, the first
        # ResBlock runs packed, and the down-ResBlock's skip/conv0 consume
        # packed input with the FIR folded into stride-2 phase kernels —
        # no pack/unpack relayout copies anywhere (ops/packing.py).
        pk = self.pack_tail
        self.spade_encoder = nn.Sequential(
            [
                Conv2dLayer(3, ngf, 7, activation="relu",
                            pack_mode="out_stride" if pk else None,
                            quant=self.quant, dtype=self.dtype),
                ResBlock(ngf, ngf, kernel_size=4, activation="relu",
                         pack_mode="same" if pk else None,
                         quant=self.quant, dtype=self.dtype),
                ResBlock(ngf, ngf * 2, kernel_size=4, activation="relu", down=2,
                         pack_mode="in_down2" if pk else None,
                         quant=self.quant, dtype=self.dtype),
            ]
        )

    def __call__(
        self,
        ws: jax.Array,  # [N, num_ws, w_dim]
        pose_feat: jax.Array,
        cat_feat: Dict[str, jax.Array],
        denorm_upper_input: jax.Array,
        denorm_lower_input: jax.Array,
        denorm_upper_mask: jax.Array,
        denorm_lower_mask: jax.Array,
        noise_mode: str = "random",
    ):
        assert ws.shape[1] == self.num_ws, (ws.shape, self.num_ws)
        resolutions = self.block_resolutions

        # Split ws: each block reads num_conv + num_torgb entries but the index
        # only advances by num_conv (skip-torgb shares the next block's first w).
        block_ws = []
        w_idx = 0
        for res, block in zip(resolutions, self.blocks):
            block_ws.append(
                jax.lax.dynamic_slice_in_dim(ws, w_idx, block.num_conv + block.num_torgb, axis=1)
            )
            w_idx += block.num_conv

        x = img = None
        x_128 = img_128 = None
        aux = None
        for res, block, cur_ws in zip(resolutions, self.blocks, block_ws):
            # noise_mode passed positionally: remat static_argnums needs it there
            x, img, aux = block(x, img, cur_ws, pose_feat, cat_feat, noise_mode)
            if res == resolutions[-2]:
                x_128, img_128 = x, img

        if self.variant == "v18":
            # Direct predicted sigmoid masks (networks.py:5519-5520), detached.
            upper_mask = jax.lax.stop_gradient(aux[0])
            lower_mask = jax.lax.stop_gradient(aux[1])
        else:
            # Parsing -> upper/lower masks (argmax is not differentiated; the
            # reference detaches here too, networks.py:5822-5826).
            parsing_idx = jnp.argmax(jax.lax.stop_gradient(aux), axis=-1)[..., None]
            upper_mask = (parsing_idx == 1).astype(jnp.float32)
            lower_mask = (parsing_idx == 2).astype(jnp.float32)

        # one spade_encoder pass over both branches (batch-stacked).
        # (Measured twice — round 2: 245.6 vs 262.3 imgs/s, round 3 after the
        # routing rework: 342.9 vs 350.3 forward — separate batch-N passes
        # stay NET slower despite the 2N conv hitting a worse XLA batch
        # emitter; the doubled reduction/elementwise fusions cost more.)
        N = denorm_upper_input.shape[0]
        spade_both = self.get_spade_feat(
            jnp.concatenate([upper_mask, lower_mask], axis=0),
            jnp.concatenate([denorm_upper_mask, denorm_lower_mask], axis=0),
            jnp.concatenate([denorm_upper_input, denorm_lower_input], axis=0),
        )
        spade_feat = jnp.concatenate([spade_both[:N], spade_both[N:]], axis=-1)
        from ..ops.quant import is_int8 as _is_int8

        if _is_int8(self.quant):
            spade_feat = self.spade_feat_quant(spade_feat)

        h = self.spade_b128_1(x_128, spade_feat)
        h = self.spade_b128_2(h, spade_feat)
        h = self.spade_b128_3(h, spade_feat)

        _, finetune_img, _ = self.texture_b256(
            h, img_128, block_ws[-1], pose_feat, cat_feat, noise_mode=noise_mode
        )
        if self.variant == "v18":
            return img, finetune_img, (upper_mask, lower_mask)
        return img, finetune_img, aux


class SynthesisNetworkSingle(nn.Module):
    """Single-denorm-branch synthesis pyramid — the V15/V16/V20 and V21
    clusters (reference `networks.py:4731-4836` SynthesisNetworkV16,
    `:6071-6196` SynthesisNetworkV21).

    Differences from SynthesisNetworkFull:
    * ONE denorm garment branch (clothes + mask), SPADE blocks at
      feat_multiplier=1;
    * variant "v16": a sigmoid clothes-mask ToRGB head on EVERY skip block
      (head_mode "mask1", `networks.py:4185-4193`); forward returns
      (img, finetune_img, mask);
    * variant "v21": clothes + HAND mask heads on last blocks only
      (head_mode "masks_hand", `:5941-5947`), and the spade feature's
      hand region is filled with the average FACE feature —
      face_encoder(cat_feat[128]) masked by the face_mask input
      (`:6148-6188`); returns (img, finetune_img, mask, h_mask).
    """

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    variant: str = "v16"  # "v16" (V15/V16/V20) | "v21"
    pack_tail: bool = True
    dtype: Dtype = jnp.float32

    @property
    def block_resolutions(self):
        n = int(math.log2(self.img_resolution))
        return [2**i for i in range(2, n + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        return sum(1 if r == 4 else 2 for r in self.block_resolutions) + 1

    def _block(self, res: int, is_last: bool, name: str) -> SynthesisBlockFull:
        return SynthesisBlockFull(
            in_channels=self.channels(res // 2) if res > 4 else 0,
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            is_last=is_last,
            is_style=True,
            head_mode="masks_hand" if self.variant == "v21" else "mask1",
            head_always=(self.variant != "v21"),
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            packed=self.pack_tail and is_last and self.channels(res) * 2 <= 128,
            dtype=self.dtype,
            name=name,
        )

    def setup(self):
        resolutions = self.block_resolutions
        self.blocks = [
            self._block(res, is_last=res == self.img_resolution, name=f"b{res}")
            for res in resolutions
        ]

        res_pre = resolutions[-2]
        ch = self.channels(res_pre)
        self.spade_b128_1 = SpadeResBlock(ch, ch, resolution=128, feat_multiplier=1, dtype=self.dtype)
        self.spade_b128_2 = SpadeResBlock(ch, ch, resolution=128, feat_multiplier=1, dtype=self.dtype)
        self.spade_b128_3 = SpadeResBlock(ch, ch, resolution=128, feat_multiplier=1, dtype=self.dtype)

        res = resolutions[-1]
        self.texture_b256 = SynthesisBlockFull(
            in_channels=self.channels(res // 2),
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            is_last=True,
            is_style=True,
            head_mode="masks_hand" if self.variant == "v21" else "mask1",
            head_always=(self.variant != "v21"),
            conv_clamp=self.conv_clamp,
            use_noise=self.use_noise,
            packed=self.pack_tail and self.channels(res) * 2 <= 128,
            dtype=self.dtype,
            name="texture_b256",
        )

        ngf = 64
        self.spade_encoder = nn.Sequential(
            [
                Conv2dLayer(3, ngf, 7, activation="relu", dtype=self.dtype),
                ResBlock(ngf, ngf, kernel_size=4, activation="relu", dtype=self.dtype),
                ResBlock(ngf, ngf * 2, kernel_size=4, activation="relu", down=2, dtype=self.dtype),
            ]
        )
        if self.variant == "v21":
            self.face_encoder = Conv2dLayer(64, 128, 1, dtype=self.dtype)

    def __call__(
        self,
        ws: jax.Array,
        pose_feat: jax.Array,
        cat_feat: Dict[str, jax.Array],
        denorm_clothes: jax.Array,  # [N, H, W, 3]
        denorm_mask: jax.Array,  # [N, H, W, 1]
        face_mask: Optional[jax.Array] = None,  # [N, H, W, 1] (v21 only)
        noise_mode: str = "random",
    ):
        assert ws.shape[1] == self.num_ws, (ws.shape, self.num_ws)
        resolutions = self.block_resolutions

        block_ws = []
        w_idx = 0
        for res, block in zip(resolutions, self.blocks):
            block_ws.append(
                jax.lax.dynamic_slice_in_dim(ws, w_idx, block.num_conv + block.num_torgb, axis=1)
            )
            w_idx += block.num_conv

        x = img = None
        x_128 = img_128 = None
        aux = None
        for res, block, cur_ws in zip(resolutions, self.blocks, block_ws):
            x, img, cur_aux = block(x, img, cur_ws, pose_feat, cat_feat, noise_mode)
            if cur_aux is not None:
                aux = cur_aux
            if res == resolutions[-2]:
                x_128, img_128 = x, img

        if self.variant == "v21":
            mask = jax.lax.stop_gradient(aux[0])
            h_mask = jax.lax.stop_gradient(aux[1])
        else:
            mask = jax.lax.stop_gradient(aux)
            h_mask = None

        # ---- spade feature (reference `:4804-4826` / `:6160-6186`)
        mask_t = (mask > 0.9).astype(denorm_clothes.dtype)
        mask_128 = (mask_t[:, ::2, ::2, :] > 0.9).astype(mask_t.dtype)
        denorm_mask_128 = (denorm_mask[:, ::2, ::2, :] > 0.9).astype(mask_t.dtype)
        valid_mask = ((mask_128 + denorm_mask_128) == 2.0).astype(mask_t.dtype)
        res_mask = mask_128 - valid_mask

        dn = denorm_clothes * mask_t - (1.0 - mask_t)
        feat = self.spade_encoder(dn)
        feat_hw = feat.shape[1] * feat.shape[2]
        valid_sum = jnp.sum(feat * valid_mask, axis=(1, 2), keepdims=True)
        vmask_sum = jnp.sum(valid_mask, axis=(1, 2), keepdims=True)
        vidx = (vmask_sum > 10).astype(mask_t.dtype)
        vmask_sum = vmask_sum * vidx + feat_hw * (1.0 - vidx)
        avg_feat = valid_sum / vmask_sum
        spade_feat = feat * (1.0 - res_mask) + avg_feat * res_mask

        if self.variant == "v21":
            # hand regions take the average FACE feature (`:6148-6158,6186`)
            face_feat = self.face_encoder(cat_feat[str(resolutions[-2])].astype(self.dtype))
            fm_128 = (face_mask[:, ::2, ::2, :] > 0.9).astype(mask_t.dtype)
            f_sum = jnp.sum(face_feat * fm_128, axis=(1, 2), keepdims=True)
            fm_sum = jnp.sum(fm_128, axis=(1, 2), keepdims=True)
            fidx = (fm_sum > 10).astype(mask_t.dtype)
            fm_sum = fm_sum * fidx + feat_hw * (1.0 - fidx)
            face_avg = f_sum / fm_sum
            hm_256 = (h_mask > 0.9).astype(mask_t.dtype)
            hm_128 = (hm_256[:, ::2, ::2, :] > 0.9).astype(mask_t.dtype)
            spade_feat = spade_feat * (1.0 - hm_128) + face_avg * hm_128

        h = self.spade_b128_1(x_128, spade_feat)
        h = self.spade_b128_2(h, spade_feat)
        h = self.spade_b128_3(h, spade_feat)

        _, finetune_img, _ = self.texture_b256(
            h, img_128, block_ws[-1], pose_feat, cat_feat, noise_mode
        )
        if self.variant == "v21":
            return img, finetune_img, mask, h_mask
        return img, finetune_img, mask

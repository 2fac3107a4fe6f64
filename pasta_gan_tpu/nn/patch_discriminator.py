"""StyleGAN2-style patch discriminators (co-occurrence / swapping-autoencoder
family), NHWC/JAX.

Counterpart of reference `training/networks.py:1431-1655` (rosinality-style
Blur/EqualConv2d/ConvLayer/ResBlock_PD/EqualLinear building blocks),
`:1723-1807` (BasePatchDiscriminator: tile sampling + random spatial
transform), `:1808-1894` (StyleGAN2PatchDiscriminator: pairwise feature
discrimination) and `:1896-1991` (the _V2 single-feature variant).  These are
experiment-fork networks unreachable from the released entry points
(SURVEY.md scope note) — provided for zoo completeness with live-reference
parity tests (tests/test_patch_discriminator.py).

Semantics reproduced exactly:
* EqualConv2d: runtime weight scale 1/sqrt(in*k^2);
* FusedLeakyReLU: leaky_relu(x + bias, 0.2) * sqrt(2);
* downsampling ConvLayer: FIR blur (pad (p+1)//2, p//2 with
  p = len(kernel) - 2 + (k-1)) then stride-2 VALID conv;
* ResBlock_PD: (conv2(conv1(x)) + skip(x)) / sqrt(2);
* patch sampling: s x s tile grid with a random sub-tile offset when the
  image size is not divisible, a random tile subset (max_num_tiles), and a
  random reflection/rotation(+-30 deg) warp per patch (`:1145-1190`);
* V1 discriminates concatenated (real, rolled-target) feature pairs through
  the 4-layer EqualLinear head; V2 scores single patch features.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.upfirdn2d import upfirdn2d
from ..data.warp import warp_perspective_inv
from ..ops.matmul_warp import inv3x3

Dtype = Any


def _make_kernel(k: Sequence[float]) -> jnp.ndarray:
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    return k / jnp.sum(k)


def fused_leaky_relu(x: jax.Array, bias: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x + bias, 0.2) * math.sqrt(2.0)


class PDConvLayer(nn.Module):
    """rosinality ConvLayer (reference `networks.py:1528-1585`)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[float] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    pad: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (k - 1)
            pad0, pad1 = (p + 1) // 2, p // 2
            f = _make_kernel(self.blur_kernel)
            x = upfirdn2d(x, f, padding=(pad0, pad1, pad0, pad1))
            stride, padding = 2, 0
        else:
            stride, padding = 1, k // 2 if self.pad is None else self.pad

        w = self.param(
            "weight", lambda key, s: jax.random.normal(key, s, jnp.float32),
            (k, k, self.in_channels, self.out_channels),
        )
        scale = 1.0 / math.sqrt(self.in_channels * k * k)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (w * scale).astype(self.dtype),
            (stride, stride), ((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.activate:
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
                x = fused_leaky_relu(x, b)
            else:
                x = jax.nn.leaky_relu(x, 0.2) * math.sqrt(2.0)
        elif self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            x = x + b
        return x


class PDResBlock(nn.Module):
    """ResBlock_PD (reference `networks.py:1587-1610`)."""

    in_channels: int
    out_channels: int
    blur_kernel: Sequence[float] = (1, 3, 3, 1)
    downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = PDConvLayer(self.in_channels, self.in_channels, 3, dtype=self.dtype,
                          name="conv1")(x)
        out = PDConvLayer(self.in_channels, self.out_channels, 3,
                          downsample=self.downsample, blur_kernel=self.blur_kernel,
                          dtype=self.dtype, name="conv2")(out)
        skip = PDConvLayer(self.in_channels, self.out_channels, 1,
                           downsample=self.downsample, blur_kernel=self.blur_kernel,
                           activate=False, use_bias=False, dtype=self.dtype,
                           name="skip")(x)
        return (out + skip) / math.sqrt(2.0)


class EqualLinearPD(nn.Module):
    """EqualLinear (reference `networks.py:1611-1655`)."""

    in_dim: int
    out_dim: int
    lr_mul: float = 1.0
    activation: Optional[str] = None  # None | "fused_lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "weight",
            lambda key, s: jax.random.normal(key, s, jnp.float32) / self.lr_mul,
            (self.out_dim, self.in_dim),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        scale = (1.0 / math.sqrt(self.in_dim)) * self.lr_mul
        y = jnp.matmul(x.astype(self.dtype), (w * scale).T.astype(self.dtype))
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(y, b * self.lr_mul)
        return y + b * self.lr_mul


def random_patch_transform(patches: jax.Array, rng: jax.Array) -> jax.Array:
    """Random reflection + rotation(+-30 deg) per patch on normalized coords
    (reference RandomSpatialTransformer, `networks.py:1145-1190`; scale=1,
    translation=0; affine_grid/grid_sample align_corners=False, zero pad)."""
    B, s = patches.shape[0], patches.shape[1]
    k1, k2 = jax.random.split(rng)
    ref = jnp.round(jax.random.uniform(k1, (B,))) * 2.0 - 1.0
    max_rot = 30.0 * math.pi / 180.0
    rot = jax.random.uniform(k2, (B,)) * (2 * max_rot) - max_rot
    c, sn = jnp.cos(rot), jnp.sin(rot)
    zero = jnp.zeros_like(rot)
    one = jnp.ones_like(rot)
    # normalized-coords affine [2,3]: src_n = A @ [x_n, y_n, 1]
    A = jnp.stack(
        [
            jnp.stack([ref * c, -sn, zero], -1),
            jnp.stack([ref * sn, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )  # [B, 3, 3]
    # pixel-space dst->src: src_px = N^-1 A N dst_px with
    # N: px -> normalized (align_corners=False): u = (2x+1)/s - 1
    Nm = jnp.asarray([[2.0 / s, 0, 1.0 / s - 1], [0, 2.0 / s, 1.0 / s - 1], [0, 0, 1]])
    Ninv = inv3x3(Nm)
    M = jnp.einsum("ij,bjk,kl->bil", Ninv, A, Nm)
    return jax.vmap(warp_perspective_inv, in_axes=(0, 0, None, None))(
        patches, M, (s, s), "constant"
    )


class StyleGAN2PatchDiscriminator(nn.Module):
    """Reference StyleGAN2PatchDiscriminator (`networks.py:1808-1894`).

    `__call__(real, fake, rng)`: samples tile patches (shared tile indices),
    returns (pred_real, pred_fake) from the pairwise feature head; pass
    `fake=None` for (pred_real, real_patches).  V2 (`variant='v2'`) scores
    single patch features: `__call__(target, None, rng)` -> pred."""

    scale_capacity: float = 4.0
    max_nc: int = 256 + 128
    patch_size: int = 64
    max_num_tiles: int = 8
    use_antialias: bool = True
    variant: str = "v1"  # "v1" (pairwise) | "v2" (single-feature)
    dtype: Dtype = jnp.float32

    def channels(self, res: int) -> int:
        table = {
            4: min(self.max_nc, int(256 * self.scale_capacity)),
            8: min(self.max_nc, int(128 * self.scale_capacity)),
            16: min(self.max_nc, int(64 * self.scale_capacity)),
            32: int(32 * self.scale_capacity),
            64: int(16 * self.scale_capacity),
            128: int(8 * self.scale_capacity),
            256: int(4 * self.scale_capacity),
        }
        return table[res]

    def setup(self):
        size = self.patch_size
        log_size = int(math.ceil(math.log2(size)))
        blur = (1, 3, 3, 1) if self.use_antialias else (1,)

        convs = [("0", PDConvLayer(3, self.channels(2 ** log_size), 3, dtype=self.dtype))]
        in_ch = self.channels(2 ** log_size)
        for i in range(log_size, 2, -1):
            out_ch = self.channels(2 ** (i - 1))
            name = str(7 - i) if i <= 6 else f"{2 ** i}x{2 ** i}"
            convs.append((name, PDResBlock(in_ch, out_ch, blur, dtype=self.dtype)))
            in_ch = out_ch
        convs.append(("5", PDResBlock(in_ch, self.max_nc * 2, blur, downsample=False,
                                      dtype=self.dtype)))
        convs.append(("6", PDConvLayer(self.max_nc * 2, self.max_nc, 3, pad=0,
                                       dtype=self.dtype)))
        self.conv_names = tuple(n for n, _ in convs)
        self.convs = [m.clone(name=f"convs_{n}") for n, m in convs]

        feat_dim = self.channels(4) * 2 * 2
        pair_in = feat_dim * 2 if self.variant == "v1" else feat_dim
        self.pairlinear = [
            EqualLinearPD(pair_in, 2048, activation="fused_lrelu", dtype=self.dtype,
                          name="pairlinear_0"),
            EqualLinearPD(2048, 2048, activation="fused_lrelu", dtype=self.dtype,
                          name="pairlinear_1"),
            EqualLinearPD(2048, 1024, activation="fused_lrelu", dtype=self.dtype,
                          name="pairlinear_2"),
            EqualLinearPD(1024, 1, dtype=self.dtype, name="pairlinear_3"),
        ]

    def extract_features(self, patches: jax.Array, aggregate: bool = False) -> jax.Array:
        """patches: [B, T, s, s, 3] -> [B*T, h, w, C]."""
        B, T = patches.shape[0], patches.shape[1]
        x = patches.reshape((B * T,) + patches.shape[2:])
        for m in self.convs:
            x = m(x)
        if aggregate:
            x = x.reshape((B, T) + x.shape[1:])
            x = jnp.broadcast_to(jnp.mean(x, axis=1, keepdims=True), x.shape)
            x = x.reshape((B * T,) + x.shape[2:])
        return x

    def discriminate_features(self, f1: jax.Array, f2: Optional[jax.Array] = None) -> jax.Array:
        # torch flattens NCHW -> channel-major; match it so pairlinear weights
        # stay checkpoint-compatible
        def flat(f):
            return jnp.transpose(f, (0, 3, 1, 2)).reshape(f.shape[0], -1)

        f1 = flat(f1)
        if self.variant == "v1":
            assert f2 is not None
            x = jnp.concatenate([f1, flat(f2)], axis=-1)
        else:
            x = f1
        for m in self.pairlinear:
            x = m(x)
        return x

    def sample_patches(self, img: jax.Array, rng: jax.Array,
                       indices: Optional[jax.Array] = None,
                       transform: bool = True) -> Tuple[jax.Array, jax.Array]:
        """[B, H, W, 3] -> ([B, T, s, s, 3], tile indices) (ref `:1757-1775`)."""
        B, H, W, C = img.shape
        s = self.patch_size
        k_off, k_perm, k_tf = jax.random.split(rng, 3)
        if H % s > 0 or W % s > 0:
            oy = jax.random.randint(k_off, (), 0, max(H % s, 1))
            ox = jax.random.randint(k_off, (), 0, max(W % s, 1))
            img = jax.lax.dynamic_slice(
                img, (0, oy, ox, 0), (B, s * (H // s), s * (W // s), C)
            )
        ny, nx = H // s, W // s
        tiles = img.reshape(B, ny, s, nx, s, C).transpose(0, 1, 3, 2, 4, 5)
        tiles = tiles.reshape(B, ny * nx, s, s, C)
        if indices is None:
            indices = jax.random.permutation(k_perm, ny * nx)[: self.max_num_tiles]
        tiles = tiles[:, indices]
        if transform:
            T = tiles.shape[1]
            flat = tiles.reshape((B * T, s, s, C))
            flat = random_patch_transform(flat, k_tf)
            tiles = flat.reshape(B, T, s, s, C)
        return tiles, indices

    def __call__(self, real: jax.Array, fake: Optional[jax.Array] = None,
                 rng: Optional[jax.Array] = None, fake_only: bool = False):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if self.variant == "v2":
            # V2 forward(target): score sampled patches directly (`:1985-1989`)
            patches, _ = self.sample_patches(real, rng)
            feat = self.extract_features(patches)
            return self.discriminate_features(feat)

        real_patches, ids = self.sample_patches(real, rng)
        real_feat = self.extract_features(real_patches)
        B = real.shape[0]
        pred_real = None
        if fake is None or not fake_only:
            rolled = real_feat.reshape((B, -1) + real_feat.shape[1:])
            rolled = jnp.roll(rolled, 1, axis=1).reshape(real_feat.shape)
            pred_real = self.discriminate_features(real_feat, rolled).reshape(B, -1)
        if fake is None:
            return pred_real, real_patches
        fake_patches, _ = self.sample_patches(fake, jax.random.fold_in(rng, 1), indices=ids)
        fake_feat = self.extract_features(fake_patches)
        rolled_f = fake_feat.reshape((B, -1) + fake_feat.shape[1:])
        rolled_f = jnp.roll(rolled_f, 1, axis=1).reshape(fake_feat.shape)
        pred_fake = self.discriminate_features(real_feat, rolled_f).reshape(B, -1)
        if fake_only:
            return pred_fake
        return pred_real, pred_fake


class StyleGAN2PatchDiscriminatorV2(StyleGAN2PatchDiscriminator):
    """Reference StyleGAN2PatchDiscriminator_V2 (`networks.py:1896-1991`)."""

    variant: str = "v2"

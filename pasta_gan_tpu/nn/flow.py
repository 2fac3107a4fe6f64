"""FlowNet op family for the v1 Generator (reference `util_classes.py:17-178`
+ `training/networks.py:805-868`), NHWC/flax.

The v1 generator predicts a dense 2-ch flow with a UNet-ish encoder/decoder
(spectral-normalized convs, batch-stat norm) and warps the affine-aligned
garment with it before the synthesis pyramid's 128-res mask merge.  This
module re-derives that op family TPU-first:

* spectral normalization keeps torch's exact estimator (sigma = u . W2d v
  over the [out, -1] flattening, `torch.nn.utils.spectral_norm`) with u/v in
  a mutable 'spectral' collection; one power iteration per call when
  `update_sn` is set (training), frozen vectors otherwise (eval) — matching
  torch's do_power_iteration=module.training,
* BatchNorm2d(affine=True, track_running_stats=False) == pure batch-stat
  normalization in BOTH modes (torch uses batch stats whenever running
  stats are off) — a pure function here, no state,
* ConvTranspose2d(k3, s2, p1, output_padding=1) == lhs-dilated conv with
  flipped kernel and ((1,2),(1,2)) padding,
* apply_offset (`util_classes.py:17`) converts the predicted offset grid to
  align_corners=True-normalized coordinates which the reference then feeds
  to F.grid_sample's DEFAULT align_corners=False unnormalization — the
  mismatch is reproduced faithfully in `grid_sample_border`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.warp import _bilinear_sample

Dtype = Any


def l2_normalize_channels(x: jax.Array, eps: float = 1e-7) -> jax.Array:
    """`Normalize` (util_classes.py:6-14): x / (||x||_2 over channels + eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def apply_offset(offset: jax.Array) -> jax.Array:
    """Offset grid -> normalized sampling grid (util_classes.py:17-32).

    offset: [N, H, W, 2] (x-offset, y-offset in channel order, matching the
    reference's offset[:, 0]=x applied to the W grid).  Returns [N, H, W, 2]
    grid in [-1, 1] normalized as (pos / ((size-1)/2) - 1)."""
    H, W = offset.shape[1], offset.shape[2]
    gx = jnp.arange(W, dtype=offset.dtype)[None, None, :]
    gy = jnp.arange(H, dtype=offset.dtype)[None, :, None]
    x = (gx + offset[..., 0]) / ((W - 1.0) / 2.0) - 1.0
    y = (gy + offset[..., 1]) / ((H - 1.0) / 2.0) - 1.0
    return jnp.stack([x, y], axis=-1)


def grid_sample_border(img: jax.Array, grid: jax.Array) -> jax.Array:
    """F.grid_sample(img, grid, padding_mode='border') with the torch DEFAULT
    align_corners=False unnormalization (reference `networks.py:908`)."""
    H, W = img.shape[1], img.shape[2]
    sx = ((grid[..., 0] + 1.0) * W - 1.0) / 2.0
    sy = ((grid[..., 1] + 1.0) * H - 1.0) / 2.0
    return jax.vmap(
        lambda im, x, y: _bilinear_sample(im, x, y, "replicate", True)
    )(img, sx, sy)


def _sigma(w2d: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    return jnp.dot(u, w2d @ v)


class SpectralConv(nn.Module):
    """nn.Conv2d wrapped in torch spectral_norm.  Weight stored HWIO; the
    sigma estimator flattens to torch's [out, in*kh*kw] order exactly."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    update_sn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        w = self.param(
            "weight_orig",
            lambda key, s: _torch_conv_init(key, s),
            (k, k, self.in_ch, self.out_ch),
        )
        nflat = self.in_ch * k * k
        u = self.variable(
            "spectral", "weight_u",
            lambda: _normed_randn(self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0), (self.out_ch,)),
        )
        v = self.variable(
            "spectral", "weight_v",
            lambda: _normed_randn(jax.random.PRNGKey(1), (nflat,)),
        )
        w2d = jnp.transpose(w, (3, 2, 0, 1)).reshape(self.out_ch, nflat)
        uu, vv = u.value, v.value
        if self.update_sn:
            vv = _l2n(w2d.T @ uu)
            uu = _l2n(w2d @ vv)
            if not self.is_initializing():
                u.value = jax.lax.stop_gradient(uu)
                v.value = jax.lax.stop_gradient(vv)
            uu = jax.lax.stop_gradient(uu)
            vv = jax.lax.stop_gradient(vv)
        wbar = (w / _sigma(w2d, uu, vv)).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wbar, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            y = y + b.astype(self.dtype)
        return y


class SpectralConvTranspose(nn.Module):
    """nn.ConvTranspose2d(k, s=2, p=1, output_padding=1) + spectral_norm
    (dim=1 flattening for transposed convs, as torch does)."""

    in_ch: int
    out_ch: int
    kernel: int = 3
    update_sn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        # stored [kh, kw, out, in] == torch [in, out, kh, kw].transpose(2,3,1,0)
        w = self.param(
            "weight_orig",
            lambda key, s: _torch_conv_init(key, s),
            (k, k, self.out_ch, self.in_ch),
        )
        nflat = self.in_ch * k * k
        u = self.variable(
            "spectral", "weight_u", lambda: _normed_randn(jax.random.PRNGKey(0), (self.out_ch,))
        )
        v = self.variable(
            "spectral", "weight_v", lambda: _normed_randn(jax.random.PRNGKey(1), (nflat,))
        )
        w2d = jnp.transpose(w, (2, 3, 0, 1)).reshape(self.out_ch, nflat)
        uu, vv = u.value, v.value
        if self.update_sn:
            vv = _l2n(w2d.T @ uu)
            uu = _l2n(w2d @ vv)
            if not self.is_initializing():
                u.value = jax.lax.stop_gradient(uu)
                v.value = jax.lax.stop_gradient(vv)
            uu = jax.lax.stop_gradient(uu)
            vv = jax.lax.stop_gradient(vv)
        wbar = w / _sigma(w2d, uu, vv)
        # transposed conv == lhs-dilated conv with the flipped kernel in HWIO
        kern = jnp.flip(wbar, axis=(0, 1)).transpose(0, 1, 3, 2).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kern, (1, 1), [(1, 2), (1, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return y + b.astype(self.dtype)


def _l2n(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def _normed_randn(key, shape):
    return _l2n(jax.random.normal(key, shape))


def _torch_conv_init(key, shape):
    """kaiming_uniform(a=sqrt(5)) over fan_in — torch's Conv2d default."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def batch_norm_2d(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5):
    """BatchNorm2d(affine, track_running_stats=False): batch statistics in
    both train and eval (torch semantics without running stats)."""
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * weight + bias


class BatchNorm2dNoStats(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return batch_norm_2d(x, w, b)


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.01)  # torch LeakyReLU default slope


class AddCoords(nn.Module):
    """CoordConv coordinate channels (util_classes.py:43-73); with_r adds the
    radius channel.  Unused by the v1 config (use_coord=False) — kept for the
    op-family inventory."""

    with_r: bool = False

    def __call__(self, x: jax.Array) -> jax.Array:
        N, H, W, _ = x.shape
        # reference semantics (square inputs; util_classes.py:56-65): the
        # first coord channel varies along width, the second along height
        xx = jnp.broadcast_to(jnp.arange(W, dtype=x.dtype)[None, None, :], (N, H, W))
        yy = jnp.broadcast_to(jnp.arange(H, dtype=x.dtype)[None, :, None], (N, H, W))
        xx = xx / (W - 1.0) * 2.0 - 1.0
        yy = yy / (H - 1.0) * 2.0 - 1.0
        out = jnp.concatenate([x, xx[..., None], yy[..., None]], axis=-1)
        if self.with_r:
            rr = jnp.sqrt(jnp.square(xx) + jnp.square(yy))[..., None]
            out = jnp.concatenate([out, rr], axis=-1)
        return out


class EncoderBlock(nn.Module):
    """util_classes.py:103-125: [BN, lrelu, conv(4s2|3s1), BN, lrelu, conv3].
    Child names mirror the reference Sequential indices for checkpoint
    conversion (model.0 .. model.5)."""

    in_ch: int
    out_ch: int
    downsample: bool = True
    update_sn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = BatchNorm2dNoStats(self.in_ch, name="model_0")(x)
        x = _leaky(x)
        if self.downsample:
            x = SpectralConv(self.in_ch, self.out_ch, 4, 2, 1, update_sn=self.update_sn,
                             dtype=self.dtype, name="model_2")(x)
        else:
            x = SpectralConv(self.in_ch, self.out_ch, 3, 1, 1, update_sn=self.update_sn,
                             dtype=self.dtype, name="model_2")(x)
        x = BatchNorm2dNoStats(self.out_ch, name="model_3")(x)
        x = _leaky(x)
        x = SpectralConv(self.out_ch, self.out_ch, 3, 1, 1, update_sn=self.update_sn,
                         dtype=self.dtype, name="model_5")(x)
        return x


class ResBlockDecoder(nn.Module):
    """util_classes.py:128-157: residual upsampling decoder block."""

    in_ch: int
    out_ch: int
    hidden_ch: Optional[int] = None
    upsample: bool = True
    update_sn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hid = self.hidden_ch or self.in_ch
        y = BatchNorm2dNoStats(self.in_ch, name="model_0")(x)
        y = _leaky(y)
        y = SpectralConv(self.in_ch, hid, 3, 1, 1, update_sn=self.update_sn,
                         dtype=self.dtype, name="model_2")(y)
        y = BatchNorm2dNoStats(hid, name="model_3")(y)
        y = _leaky(y)
        if self.upsample:
            y = SpectralConvTranspose(hid, self.out_ch, 3, update_sn=self.update_sn,
                                      dtype=self.dtype, name="model_5")(y)
            s = SpectralConvTranspose(self.in_ch, self.out_ch, 3, update_sn=self.update_sn,
                                      dtype=self.dtype, name="shortcut_0")(x)
            return y + s
        y = SpectralConv(hid, self.out_ch, 3, 1, 1, update_sn=self.update_sn,
                         dtype=self.dtype, name="model_5")(y)
        return y + x


class Jump(nn.Module):
    """util_classes.py:160-179 with norm_layer=None (the FlowNet config):
    [lrelu, reflection-pad, conv k3 p0]."""

    in_ch: int
    out_ch: int
    kernel: int = 3
    update_sn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _leaky(x)
        p = self.kernel // 2
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        return SpectralConv(self.in_ch, self.out_ch, self.kernel, 1, 0,
                            update_sn=self.update_sn, dtype=self.dtype, name="conv1")(x)


class PlainConv(nn.Module):
    """nn.Conv2d (torch init) — the flow output heads."""

    in_ch: int
    out_ch: int
    kernel: int = 3
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        w = self.param(
            "weight", lambda key, s: _torch_conv_init(key, s), (k, k, self.in_ch, self.out_ch)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


class FlowNet(nn.Module):
    """Reference `networks.py:805-868`: 4-level encoder (spectral convs +
    batch-stat norm), 4 residual decoder blocks with Jump skips, and a 2-ch
    flow head converted to a sampling grid via apply_offset."""

    input_nc: int
    ngf: int = 64
    img_f: int = 512
    encoder_layer: int = 4
    update_sn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        E = self.encoder_layer
        results = []
        mult = 1
        out = EncoderBlock(self.input_nc, self.ngf, downsample=False,
                           update_sn=self.update_sn, dtype=self.dtype, name="encoder0")(x)
        results.append(out)
        for i in range(E - 1):
            mult_prev = mult
            mult = min(2 ** (i + 1), self.img_f // self.ngf)
            out = EncoderBlock(self.ngf * mult_prev, self.ngf * mult,
                               update_sn=self.update_sn, dtype=self.dtype,
                               name=f"encoder{i + 1}")(out)
            results.append(out)

        flow_in_ch = None
        for i in range(E):
            mult_prev = mult
            mult = min(2 ** (E - i - 2), self.img_f // self.ngf) if i != E - 1 else 1
            out = ResBlockDecoder(
                self.ngf * mult_prev, self.ngf * mult, self.ngf * mult,
                upsample=(i != E - 1), update_sn=self.update_sn, dtype=self.dtype,
                name=f"decoder{i}",
            )(out)
            if i != E - 1:
                jump = Jump(self.ngf * mult, self.ngf * mult, 3,
                            update_sn=self.update_sn, dtype=self.dtype, name=f"jump{i}")(
                    results[E - i - 2]
                )
                out = out + jump
            # the reference creates flow heads at every level but only uses
            # the last (networks.py:841-843,859-861); we build only the live
            # one (the converter ignores extra reference keys)
            if i == E - 1:
                flow_in_ch = self.ngf * mult_prev

        offset = PlainConv(flow_in_ch, 2, dtype=self.dtype, name=f"flow{E - 1}")(out)
        return apply_offset(offset)

"""ADA augmentation pipeline (reference `training/augment.py:117-431`), NHWC/JAX.

"Training Generative Adversarial Networks with Limited Data" pipeline: pixel
blitting + general geometric transforms composed into ONE inverse homography
executed with a sym6-lowpass 2x supersampled grid-sample, followed by a color
matrix, wavelet-band filtering, additive noise, and cutout — all gated per
sample by probability `p`.

TPU-specific divergence (documented): the reference computes a data-dependent
reflect-pad margin per batch (`augment.py:272-283`) — a dynamic shape XLA
cannot compile.  We use a static margin (default width//4 + filter pad);
results are identical whenever the dynamic margin would have been <= the
static one (covers the bgc pipe's typical draws; the reference clamps its
margin to width-1 for the extreme tail).  Raise `static_margin` when running
aggressive geometric settings.

Wavelet coefficient tables are the standard public Daubechies/symlet filters.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.warp import warp_perspective_inv
from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d

# Standard orthogonal wavelet filter coefficients (public constants).
WAVELETS = {
    "haar": [0.7071067811865476, 0.7071067811865476],
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469, 0.48296291314469025],
    "sym6": [
        0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
        -0.048311742585633, 0.4910559419267466, 0.787641141030194,
        0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
        0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
    ],
}

# augpipe presets (reference `train_wo_flow_fullbody.py:297-308`).
AUGPIPE_SPECS = {
    "blit": dict(xflip=1, rotate90=1, xint=1),
    "geom": dict(scale=1, rotate=1, aniso=1, xfrac=1),
    "color": dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
    "filter": dict(imgfilter=1),
    "noise": dict(noise=1),
    "cutout": dict(cutout=1),
    "bg": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1),
    "bgc": dict(
        xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
        brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1,
    ),
    "bgcf": dict(
        xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
        brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1, imgfilter=1,
    ),
    "bgcfn": dict(
        xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
        brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1, imgfilter=1, noise=1,
    ),
    "bgcfnc": dict(
        xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
        brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1, imgfilter=1,
        noise=1, cutout=1,
    ),
}


# ---- 2D/3D homogeneous matrix helpers (batched; reference augment.py:43-107)

def _translate2d(tx, ty):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack(
        [jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1), jnp.stack([z, z, o], -1)], -2
    )


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack(
        [jnp.stack([sx, z, z], -1), jnp.stack([z, sy, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def _rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def _translate3d(t):
    # t: [..., 3]
    eye = jnp.broadcast_to(jnp.eye(4), t.shape[:-1] + (4, 4))
    return eye.at[..., :3, 3].set(t)


def _scale3d(s):
    eye = jnp.broadcast_to(jnp.eye(4), s.shape[:-1] + (4, 4))
    return eye.at[..., 0, 0].set(s[..., 0]).at[..., 1, 1].set(s[..., 1]).at[..., 2, 2].set(s[..., 2])


def _rotate3d(v, theta):
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    rows = [
        jnp.stack([vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, z], -1),
        jnp.stack([vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, z], -1),
        jnp.stack([vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, z], -1),
        jnp.stack([z, z, z, o], -1),
    ]
    return jnp.stack(rows, -2)


def _build_fbank() -> np.ndarray:
    """4-band wavelet filter bank (reference augment.py:169-179)."""
    import scipy.signal

    Hz_lo = np.asarray(WAVELETS["sym2"])
    Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    Hz_fbank = np.eye(4, 1)
    for i in range(1, Hz_fbank.shape[0]):
        Hz_fbank = np.dstack([Hz_fbank, np.zeros_like(Hz_fbank)]).reshape(Hz_fbank.shape[0], -1)[:, :-1]
        Hz_fbank = scipy.signal.convolve(Hz_fbank, [Hz_lo2])
        Hz_fbank[i, (Hz_fbank.shape[1] - Hz_hi2.size) // 2 : (Hz_fbank.shape[1] + Hz_hi2.size) // 2] += Hz_hi2
    return Hz_fbank.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    """Stateless ADA pipe; `p` is passed at call time (it lives in TrainState)."""

    # pixel blitting
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    # geometric
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    # color
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # image-space filtering
    imgfilter: float = 0.0
    imgfilter_bands: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    # corruptions
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    # TPU static padding margin (see module docstring)
    static_margin: Optional[int] = None
    # Execute the geometric warp as a two-pass affine resample
    # (ops/shear_warp.py) instead of the single-pass supersampled
    # grid-sample.  ~100x fewer gather/scatter rows forward AND backward —
    # the single-pass form is the dominant ADA training cost (BASELINE.md).
    # EXACT for every axis-aligned draw (flips/rot90/scale/translate);
    # genuinely-rotated draws get a slightly different (still consistent)
    # linear reconstruction — opt-in, excluded from the reference
    # debug-percentile parity tests.
    fast_geom: bool = False

    @classmethod
    def from_spec(cls, name: str = "bgc", **kw) -> "AugmentPipe":
        return cls(**{**AUGPIPE_SPECS[name], **kw})

    def __call__(self, images: jnp.ndarray, p, rng: jax.Array, debug_percentile=None) -> jnp.ndarray:
        """images: [N, H, W, C] float; p: scalar augment probability.

        `debug_percentile` (reference augment.py:185+) replaces every random
        draw with a fixed percentile — the determinism hook used for parity
        testing against the reference pipe.
        """
        from jax.scipy.special import erfinv

        N, H, W, C = images.shape
        p = jnp.asarray(p, jnp.float32)
        keys = iter(jax.random.split(rng, 32))
        dp = None if debug_percentile is None else jnp.asarray(debug_percentile, jnp.float32)

        def gate(value, identity, prob, key, shape=(None,)):
            if dp is not None:
                return value  # debug mode: transform always applied
            sel = jax.random.uniform(key, value.shape[: len(shape)] if shape[0] else (N,)) < prob
            extra = value.ndim - sel.ndim
            sel = sel.reshape(sel.shape + (1,) * extra)
            return jnp.where(sel, value, identity)

        # ------------------------- geometric (inverse homography, per sample)
        G_inv = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
        any_geom = any(v > 0 for v in (self.xflip, self.rotate90, self.xint,
                                       self.scale, self.rotate, self.aniso, self.xfrac))

        if self.xflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (N,)) * 2)
            i = gate(i, jnp.zeros_like(i), self.xflip * p, next(keys))
            if dp is not None:
                i = jnp.full((N,), jnp.floor(dp * 2))
            G_inv = G_inv @ _scale2d(1.0 / (1 - 2 * i), jnp.ones_like(i))
        if self.rotate90 > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (N,)) * 4)
            i = gate(i, jnp.zeros_like(i), self.rotate90 * p, next(keys))
            if dp is not None:
                i = jnp.full((N,), jnp.floor(dp * 4))
            G_inv = G_inv @ _rotate2d(-(-np.pi / 2) * i)  # rotate2d_inv(-pi/2 * i)
        if self.xint > 0:
            t = (jax.random.uniform(next(keys), (N, 2)) * 2 - 1) * self.xint_max
            t = gate(t, jnp.zeros_like(t), self.xint * p, next(keys))
            if dp is not None:
                t = jnp.full((N, 2), (dp * 2 - 1) * self.xint_max)
            G_inv = G_inv @ _translate2d(-jnp.round(t[:, 0] * W), -jnp.round(t[:, 1] * H))
        if self.scale > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (N,)) * self.scale_std)
            s = gate(s, jnp.ones_like(s), self.scale * p, next(keys))
            if dp is not None:
                s = jnp.full((N,), jnp.exp2(erfinv(dp * 2 - 1) * self.scale_std))
            G_inv = G_inv @ _scale2d(1 / s, 1 / s)
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - self.rotate * p, 0, 1))
        if self.rotate > 0:
            theta = (jax.random.uniform(next(keys), (N,)) * 2 - 1) * np.pi * self.rotate_max
            theta = gate(theta, jnp.zeros_like(theta), p_rot, next(keys))
            if dp is not None:
                theta = jnp.full((N,), (dp * 2 - 1) * np.pi * self.rotate_max)
            G_inv = G_inv @ _rotate2d(theta)  # rotate2d_inv(-theta)
        if self.aniso > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (N,)) * self.aniso_std)
            s = gate(s, jnp.ones_like(s), self.aniso * p, next(keys))
            if dp is not None:
                s = jnp.full((N,), jnp.exp2(erfinv(dp * 2 - 1) * self.aniso_std))
            G_inv = G_inv @ _scale2d(1 / s, s)
        if self.rotate > 0:
            theta = (jax.random.uniform(next(keys), (N,)) * 2 - 1) * np.pi * self.rotate_max
            theta = gate(theta, jnp.zeros_like(theta), p_rot, next(keys))
            if dp is not None:
                theta = jnp.zeros((N,))  # reference zeroes the post-rotation in debug mode
            G_inv = G_inv @ _rotate2d(theta)
        if self.xfrac > 0:
            t = jax.random.normal(next(keys), (N, 2)) * self.xfrac_std
            t = gate(t, jnp.zeros_like(t), self.xfrac * p, next(keys))
            if dp is not None:
                t = jnp.full((N, 2), erfinv(dp * 2 - 1) * self.xfrac_std)
            G_inv = G_inv @ _translate2d(-t[:, 0] * W, -t[:, 1] * H)

        if any_geom:
            images = self._execute_geometric(images, G_inv)

        # --------------------------------------------- color matrix
        C4 = jnp.broadcast_to(jnp.eye(4), (N, 4, 4))
        any_color = any(
            v > 0 for v in (self.brightness, self.contrast, self.lumaflip, self.hue, self.saturation)
        )
        v_luma = jnp.asarray([1.0, 1.0, 1.0, 0.0]) / np.sqrt(3)

        if self.brightness > 0:
            b = jax.random.normal(next(keys), (N,)) * self.brightness_std
            b = gate(b, jnp.zeros_like(b), self.brightness * p, next(keys))
            if dp is not None:
                b = jnp.full((N,), erfinv(dp * 2 - 1) * self.brightness_std)
            C4 = _translate3d(jnp.stack([b, b, b], -1)) @ C4
        if self.contrast > 0:
            c = jnp.exp2(jax.random.normal(next(keys), (N,)) * self.contrast_std)
            c = gate(c, jnp.ones_like(c), self.contrast * p, next(keys))
            if dp is not None:
                c = jnp.full((N,), jnp.exp2(erfinv(dp * 2 - 1) * self.contrast_std))
            C4 = _scale3d(jnp.stack([c, c, c], -1)) @ C4
        if self.lumaflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (N,)) * 2)
            i = gate(i, jnp.zeros_like(i), self.lumaflip * p, next(keys))
            if dp is not None:
                i = jnp.full((N,), jnp.floor(dp * 2))
            vv = jnp.outer(v_luma, v_luma)
            C4 = (jnp.eye(4) - 2 * vv * i[:, None, None]) @ C4
        if self.hue > 0 and C > 1:
            theta = (jax.random.uniform(next(keys), (N,)) * 2 - 1) * np.pi * self.hue_max
            theta = gate(theta, jnp.zeros_like(theta), self.hue * p, next(keys))
            if dp is not None:
                theta = jnp.full((N,), (dp * 2 - 1) * np.pi * self.hue_max)
            C4 = _rotate3d(v_luma[:3] / jnp.linalg.norm(v_luma[:3]), theta) @ C4
        if self.saturation > 0 and C > 1:
            s = jnp.exp2(jax.random.normal(next(keys), (N,)) * self.saturation_std)
            s = gate(s, jnp.ones_like(s), self.saturation * p, next(keys))
            if dp is not None:
                s = jnp.full((N,), jnp.exp2(erfinv(dp * 2 - 1) * self.saturation_std))
            vv = jnp.outer(v_luma, v_luma)
            C4 = (vv + (jnp.eye(4) - vv) * s[:, None, None]) @ C4

        if any_color:
            flat = images.reshape(N, H * W, C)
            if C == 3:
                flat = jnp.einsum("nij,npj->npi", C4[:, :3, :3], flat) + C4[:, None, :3, 3]
            elif C == 1:
                Cm = jnp.mean(C4[:, :3, :], axis=1, keepdims=True)  # [N,1,4]
                flat = flat * jnp.sum(Cm[:, :, :3], axis=2, keepdims=True) + Cm[:, :, 3:]
            else:
                raise ValueError("images must be RGB or L")
            images = flat.reshape(N, H, W, C)

        # --------------------------------------------- wavelet-band filtering
        if self.imgfilter > 0:
            images = self._execute_imgfilter(images, p, next(keys), next(keys), dp)

        # --------------------------------------------- corruptions
        if self.noise > 0:
            sigma = jnp.abs(jax.random.normal(next(keys), (N, 1, 1, 1))) * self.noise_std
            sigma = gate(sigma, jnp.zeros_like(sigma), self.noise * p, next(keys), shape=(N, 1, 1, 1))
            if dp is not None:
                from jax.scipy.special import erfinv as _erfinv
                sigma = jnp.full((N, 1, 1, 1), _erfinv(dp) * self.noise_std)
            images = images + jax.random.normal(next(keys), images.shape) * sigma
        if self.cutout > 0:
            size = jnp.full((N, 2), self.cutout_size)
            sel = jax.random.uniform(next(keys), (N, 1)) < self.cutout * p
            size = jnp.where(sel, size, 0.0)
            center = jax.random.uniform(next(keys), (N, 2))
            if dp is not None:
                size = jnp.full((N, 2), self.cutout_size)
                center = jnp.full((N, 2), dp)
            cx = jnp.arange(W)[None, None, :]
            cy = jnp.arange(H)[None, :, None]
            mask_x = jnp.abs((cx + 0.5) / W - center[:, 0, None, None]) >= size[:, 0, None, None] / 2
            mask_y = jnp.abs((cy + 0.5) / H - center[:, 1, None, None]) >= size[:, 1, None, None] / 2
            images = images * (mask_x | mask_y)[..., None].astype(images.dtype)

        return images

    # -- geometric execution: reflect-pad, 2x supersample, grid-sample, downsample

    def _execute_geometric(self, images: jnp.ndarray, G_inv: jnp.ndarray) -> jnp.ndarray:
        N, H, W, C = images.shape
        Hz_geom = setup_filter(jnp.asarray(WAVELETS["sym6"], jnp.float32))
        Hz_pad = len(WAVELETS["sym6"]) // 4
        # Default margin W//4 + filter pad covers the bgc pipe's typical draws
        # (xint<=0.125W, xfrac ~N(0,0.125W), scale exp2(N(0,0.2))); the
        # supersampled grid-sample cost scales with (W+2m)^2, so a W//2 margin
        # quadruples-ish the warp cost for tail cases the reference clamps
        # anyway.  Override via static_margin for extreme augment settings.
        m = self.static_margin if self.static_margin is not None else W // 4 + Hz_pad * 2

        # symmetric static reflect pad (margin bookkeeping terms cancel)
        images = jnp.pad(images, ((0, 0), (m, m), (m, m), (0, 0)), mode="reflect")
        Hp, Wp = H + 2 * m, W + 2 * m

        # 2x supersample with the sym6 lowpass
        images = upsample2d(images, Hz_geom, up=2)
        Hu, Wu = Hp * 2, Wp * 2

        # Output grid (reference shape: (H + Hz_pad*2)*2): sample with the
        # composed normalized-coordinate transform, align_corners=False.
        Ho, Wo = (H + Hz_pad * 2) * 2, (W + Hz_pad * 2) * 2

        # Normalized-frame adjustments exactly as the reference (augment.py:287-296),
        # starting from G_inv in centered-pixel coordinates of the ORIGINAL image:
        # pad shift is symmetric -> no-op; upsample: scale(2,2) G scale(1/2,1/2)
        # then translate(-0.5) G translate(0.5).
        def t2(tx, ty):
            return _translate2d(jnp.full((N,), tx), jnp.full((N,), ty))

        def s2(sx, sy):
            return _scale2d(jnp.full((N,), sx), jnp.full((N,), sy))

        G = s2(2, 2) @ G_inv @ s2(0.5, 0.5)
        G = t2(-0.5, -0.5) @ G @ t2(0.5, 0.5)
        # to normalized [-1,1] frames of (output grid) -> (upsampled image)
        G = s2(2 / Wu, 2 / Hu) @ G @ s2(Wo / 2, Ho / 2)

        # pixel-space dst->src affine: src_px = Ninv_in @ G @ N_out(out_px)
        # N_out: out_px -> normalized: u = 2*(x+0.5)/Wo - 1
        N_out = t2(-1, -1) @ s2(2 / Wo, 2 / Ho) @ t2(0.5, 0.5)
        Ninv_in = t2(-0.5, -0.5) @ s2(Wu / 2, Hu / 2) @ t2(1, 1)
        A = Ninv_in @ G @ N_out  # [N,3,3]

        if self.fast_geom:
            from ..ops.shear_warp import affine_resample_two_pass_batch

            # remat: the pass intermediates (per-row window gathers) are
            # cheap to recompute but large to keep for the backward
            warped = jax.checkpoint(
                lambda im, a: affine_resample_two_pass_batch(im, a, (Ho, Wo))
            )(images, A[:, :2, :])
        else:
            warped = jax.vmap(warp_perspective_inv, in_axes=(0, 0, None, None, None))(
                images, A, (Ho, Wo), "constant", False  # coord_grads: A is RNG-derived
            )
        # Downsample and crop (augment.py:301)
        return downsample2d(warped, Hz_geom, down=2, padding=-Hz_pad * 2, flip_filter=True)

    def _execute_imgfilter(self, images, p, key_t, key_sel, dp=None):
        from jax.scipy.special import erfinv

        N, H, W, C = images.shape
        fbank = jnp.asarray(_build_fbank())  # [4, taps]
        num_bands = fbank.shape[0]
        expected_power = jnp.asarray([10.0, 1.0, 1.0, 1.0]) / 13.0

        g = jnp.ones((N, num_bands))
        keys_t = jax.random.split(key_t, num_bands)
        keys_s = jax.random.split(key_sel, num_bands)
        for i, band_strength in enumerate(self.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(keys_t[i], (N,)) * self.imgfilter_std)
            sel = jax.random.uniform(keys_s[i], (N,)) < self.imgfilter * p * band_strength
            t_i = jnp.where(sel, t_i, 1.0)
            if dp is not None:
                t_i = (
                    jnp.full((N,), jnp.exp2(erfinv(dp * 2 - 1) * self.imgfilter_std))
                    if band_strength > 0
                    else jnp.ones((N,))
                )
            t = jnp.ones((N, num_bands)).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1, keepdims=True))
            g = g * t

        Hz_prime = g @ fbank  # [N, taps]
        taps = fbank.shape[1]
        pad = taps // 2

        # per-(sample,channel) separable depthwise conv, reflect padded
        x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        x = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, H + 2 * pad, W + 2 * pad, N * C)
        kern = jnp.repeat(Hz_prime[:, None, :], C, axis=1).reshape(N * C, taps)  # [NC, taps]
        ky = jnp.transpose(kern)[:, None, None, :]  # [taps,1,1,NC]
        kx = jnp.transpose(kern)[None, :, None, :]  # [1,taps,1,NC]
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=N * C,
        )
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=N * C,
        )
        return jnp.transpose(x.reshape(H, W, N, C), (2, 0, 1, 3))

"""On-device perspective warps + the patch-routing pipeline.

Counterpart of `training/dataset.py:838-927` (`normalize`) and the unpaired
test-time transfer variant (`dataset.py:1467-1492`).  The reference issues 20
`cv2.warpPerspective` calls per sample on CPU DataLoader workers — the
measured input-pipeline bottleneck (SURVEY.md section 3.1).  Here the same
math is a batched bilinear gather on TPU: all 10 parts x {norm, denorm} x
batch are vmapped into a handful of fused XLA ops.

cv2 semantic details reproduced:
* `warpPerspective(img, M, (w,h))` samples src at M^{-1}(x, y) with bilinear
  interpolation at integer pixel coordinates,
* norm warps use BORDER_REPLICATE (clamp), denorm warps BORDER_CONSTANT(0),
* the denorm validity mask keeps only pixels whose warped mask is exactly
  saturated (`== 255` on uint8, dataset.py:886) — reproduced as >= 254.5/255,
* parts composite sequentially (later parts overwrite earlier ones).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .geometry import HAND_PARTS, LOWER_PART_START, NUM_PARTS, part_transforms

MASK_SATURATION_THRESHOLD = 254.5 / 255.0


def _bilinear_sample(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray, border: str):
    """Sample img [H,W,C] at float coords (sx, sy) [h,w]; cv2-style bilinear."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = img[yc, xc]  # [h,w,C]
        if border == "constant":
            inside = ((yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1))[..., None]
            vals = jnp.where(inside, vals, jnp.zeros_like(vals))
        return vals

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def warp_perspective_inv(
    img: jnp.ndarray,  # [H, W, C] float
    Minv: jnp.ndarray,  # [3, 3] mapping dst pixel -> src pixel directly
    out_hw: tuple[int, int],
    border: str = "constant",
) -> jnp.ndarray:
    """Warp with an explicit dst->src matrix (no inversion)."""
    h, w = out_hw
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [h,w]
    denom = Minv[2, 0] * gx + Minv[2, 1] * gy + Minv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    sx = (Minv[0, 0] * gx + Minv[0, 1] * gy + Minv[0, 2]) / denom
    sy = (Minv[1, 0] * gx + Minv[1, 1] * gy + Minv[1, 2]) / denom
    return _bilinear_sample(img, sx, sy, border)


def warp_perspective(
    img: jnp.ndarray,  # [H, W, C] float
    M: jnp.ndarray,  # [3, 3] src->dst (cv2 convention; inverted internally)
    out_hw: tuple[int, int],
    border: str = "constant",
) -> jnp.ndarray:
    """cv2.warpPerspective(img, M, (w, h)) with bilinear interpolation."""
    return warp_perspective_inv(img, jnp.linalg.inv(M), out_hw, border)


# vmap over the 10 parts (matrices differ, image shared).
_warp_parts = jax.vmap(warp_perspective, in_axes=(None, 0, None, None))


class RoutedPatches(NamedTuple):
    norm_img: jnp.ndarray  # [h, w, 30]  10 upper parts x 3ch
    norm_img_lower: jnp.ndarray  # [h, w, 12]  4 lower parts x 3ch
    denorm_upper_img: jnp.ndarray  # [H, W, 3]
    denorm_lower_img: jnp.ndarray  # [H, W, 3]
    M_invs: jnp.ndarray  # [10, 3, 3]
    denorm_hand_masks: jnp.ndarray  # [4, H, W, 1]
    norm_clothes_masks: jnp.ndarray  # [h, w, 30]
    norm_clothes_masks_lower: jnp.ndarray  # [h, w, 12]
    valid: jnp.ndarray  # [10] bool


def route_patches_single(
    upper_img: jnp.ndarray,  # [H, W, 3] in [0, 1]
    lower_img: jnp.ndarray,  # [H, W, 3]
    upper_clothes_mask: jnp.ndarray,  # [H, W, 1] in {0, 1}
    lower_clothes_mask: jnp.ndarray,  # [H, W, 1]
    M: jnp.ndarray,  # [10, 3, 3] norm transforms
    M_inv: jnp.ndarray,  # [10, 3, 3] denorm transforms (usually the person's)
    valid: jnp.ndarray,  # [10] bool (garment AND target validity)
    box_factor: int = 2,
) -> RoutedPatches:
    """The norm/denorm patch pipeline for one sample (dataset.py:863-927).

    For pose transfer (test path) pass the garment's M with the person's M_inv
    and the AND of both validity vectors (dataset.py:1467-1492).
    """
    H, W = upper_img.shape[0], upper_img.shape[1]
    h, w = H >> box_factor, W >> box_factor
    vmask = valid.astype(upper_img.dtype)[:, None, None, None]  # [10,1,1,1]

    # ---- norm: image + clothes-mask patches, BORDER_REPLICATE
    part_imgs = _warp_parts(upper_img, M, (h, w), "replicate") * vmask
    part_masks = _warp_parts(upper_clothes_mask, M, (h, w), "replicate") * vmask
    part_imgs_lower = (
        _warp_parts(lower_img, M[LOWER_PART_START:], (h, w), "replicate")
        * vmask[LOWER_PART_START:]
    )
    part_masks_lower = (
        _warp_parts(lower_clothes_mask, M[LOWER_PART_START:], (h, w), "replicate")
        * vmask[LOWER_PART_START:]
    )

    # ---- denorm: re-project each patch, keep only saturated-mask pixels,
    #      composite sequentially (later parts overwrite).
    denorm_patches = jax.vmap(warp_perspective, in_axes=(0, 0, None, None))(
        part_imgs, M_inv, (H, W), "constant"
    )
    denorm_mask_patches = jax.vmap(warp_perspective, in_axes=(0, 0, None, None))(
        part_masks, M_inv, (H, W), "constant"
    )
    denorm_valid = (
        (denorm_mask_patches[..., :1] >= MASK_SATURATION_THRESHOLD).astype(upper_img.dtype)
        * vmask
    )  # [10, H, W, 1]

    denorm_upper = jnp.zeros_like(upper_img)
    for p in range(NUM_PARTS):
        denorm_upper = denorm_patches[p] * denorm_valid[p] + denorm_upper * (1 - denorm_valid[p])

    denorm_patches_lower = jax.vmap(warp_perspective, in_axes=(0, 0, None, None))(
        part_imgs_lower, M_inv[LOWER_PART_START:], (H, W), "constant"
    )
    denorm_mask_patches_lower = jax.vmap(warp_perspective, in_axes=(0, 0, None, None))(
        part_masks_lower, M_inv[LOWER_PART_START:], (H, W), "constant"
    )
    denorm_valid_lower = (
        (denorm_mask_patches_lower[..., :1] >= MASK_SATURATION_THRESHOLD).astype(upper_img.dtype)
        * vmask[LOWER_PART_START:]
    )
    denorm_lower = jnp.zeros_like(lower_img)
    for p in range(NUM_PARTS - LOWER_PART_START):
        denorm_lower = (
            denorm_patches_lower[p] * denorm_valid_lower[p]
            + denorm_lower * (1 - denorm_valid_lower[p])
        )

    hand_masks = jnp.stack([denorm_valid[p] for p in HAND_PARTS], axis=0)  # [4,H,W,1]

    def stack_ch(x):  # [P,h,w,C] -> [h,w,P*C]
        return jnp.transpose(x, (1, 2, 0, 3)).reshape(x.shape[1], x.shape[2], -1)

    return RoutedPatches(
        norm_img=stack_ch(part_imgs),
        norm_img_lower=stack_ch(part_imgs_lower),
        denorm_upper_img=denorm_upper,
        denorm_lower_img=denorm_lower,
        M_invs=M_inv,
        denorm_hand_masks=hand_masks,
        norm_clothes_masks=stack_ch(jnp.repeat(part_masks, 3, axis=-1) if part_masks.shape[-1] == 1 else part_masks),
        norm_clothes_masks_lower=stack_ch(
            jnp.repeat(part_masks_lower, 3, axis=-1)
            if part_masks_lower.shape[-1] == 1
            else part_masks_lower
        ),
        valid=valid,
    )


@partial(jax.jit, static_argnames=("box_factor", "img_h", "pad_x"))
def route_patches_batch(
    upper_img: jnp.ndarray,  # [B, H, W, 3]
    lower_img: jnp.ndarray,
    upper_clothes_mask: jnp.ndarray,  # [B, H, W, 1]
    lower_clothes_mask: jnp.ndarray,
    keypoints: jnp.ndarray,  # [B, 18, 3]
    box_factor: int = 2,
    img_h: Optional[int] = None,
    pad_x: float = 32.0,
) -> RoutedPatches:
    """Batched self-routing (training path): norm and denorm share keypoints."""
    H = img_h or upper_img.shape[1]
    h = upper_img.shape[1] >> box_factor
    w = upper_img.shape[2] >> box_factor
    M, M_inv, valid = part_transforms(
        keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x
    )
    return jax.vmap(partial(route_patches_single, box_factor=box_factor))(
        upper_img, lower_img, upper_clothes_mask, lower_clothes_mask, M, M_inv, valid
    )


@partial(jax.jit, static_argnames=("box_factor", "img_h", "pad_x"))
def route_patches_transfer_batch(
    garment_upper_img: jnp.ndarray,  # [B, H, W, 3] garment person's image
    garment_lower_img: jnp.ndarray,
    garment_upper_mask: jnp.ndarray,
    garment_lower_mask: jnp.ndarray,
    garment_keypoints: jnp.ndarray,  # [B, 18, 3]
    person_keypoints: jnp.ndarray,  # [B, 18, 3] target pose
    box_factor: int = 2,
    img_h: Optional[int] = None,
    pad_x: float = 32.0,
) -> RoutedPatches:
    """Unpaired try-on: garment patches normalized with the garment's M and
    re-projected with the target person's M_inv (dataset.py:1467-1492)."""
    H = img_h or garment_upper_img.shape[1]
    h = garment_upper_img.shape[1] >> box_factor
    w = garment_upper_img.shape[2] >> box_factor
    Mg, _, valid_g = part_transforms(garment_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x)
    _, Mp_inv, valid_p = part_transforms(person_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x)
    valid = valid_g & valid_p
    return jax.vmap(partial(route_patches_single, box_factor=box_factor))(
        garment_upper_img,
        garment_lower_img,
        garment_upper_mask,
        garment_lower_mask,
        Mg,
        Mp_inv,
        valid,
    )

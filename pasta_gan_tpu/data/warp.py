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

from ..ops.matmul_warp import inv3x3, warp_perspective_matmul
from .geometry import HAND_PARTS, LOWER_PART_START, NUM_PARTS, part_transforms


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _use_fused_composite(n_parts: int, C: int, Hs: int, Ws: int) -> bool:
    """Gate for the fused denorm+erode+composite route branches.

    TPU (or the interpret-mode test hook) + TUNING.fused_composite, plus a
    VMEM residency guard: the kernel holds all N parts' sources resident
    per grid step ([1, N*C*Hs, Ws+Hs] fp32, double-buffered), so a custom
    route far bigger than the shipped ones must fall back to the
    separate-pass pipeline rather than overflow Mosaic's VMEM allocator."""
    from ..ops.tuning import TUNING

    if not ((_on_tpu() or TUNING.composite_interpret) and TUNING.fused_composite):
        return False
    src_bytes = 2 * n_parts * C * Hs * (Ws + Hs) * 4
    return src_bytes <= TUNING.fused_composite_src_budget


def denorm_warp_parts(
    src: jnp.ndarray,  # [P, h, w, C] patches ([P, C, h, w] if planar_in)
    M: jnp.ndarray,  # [P, 3, 3] patch->frame transforms
    valid: jnp.ndarray,  # [P] bool/float; invalid parts -> all-zero planes
    out_hw: tuple[int, int],
    planar_in: bool = False,  # src arrives planar (straight from the norm
    # kernels' planar output) — the input relayout disappears entirely
) -> jnp.ndarray:
    """All per-part denorm re-projections of one sample in one shot,
    constant-zero border, returned PLANAR [P, C, H, W] (the Pallas kernel's
    native layout — consumers composite planar and transpose only the final
    3-channel images, saving the 1.4 ms/batch-16 NHWC relayout).  On TPU
    this is the fused Pallas hat-matmul kernel (ops/pallas_warp.py — MXU
    contractions, per-tile support skipping); on CPU/interpret backends
    (unit tests, the multichip CPU dryrun) it falls back to the jnp matmul
    formulation.  Called under vmap over the batch."""
    if _on_tpu():
        from ..ops.pallas_warp import warp_parts_pallas
        from ..ops.tuning import TUNING

        # 8 dst rows/tile by default: finer tiles skip more of each part's
        # support (measured ~1.7x vs 16 on realistic denorm quads) while the
        # [C*Hs, P] half-contraction stays well inside VMEM
        C = src.shape[1] if planar_in else src.shape[-1]
        Hs = src.shape[2] if planar_in else src.shape[1]
        rows = max(1, min(TUNING.denorm_rows_cap, (1 << 20) // (C * Hs * out_hw[1])))
        while out_hw[0] % rows:
            rows -= 1

        # custom_vmap: vmapping a scalar-prefetch pallas_call falls back to
        # a serial lax.map (16 sequential dispatches measured 5.5 ms); the
        # batch rule flattens [B, P] -> [B*P] parts into ONE pipelined grid.
        @jax.custom_batching.custom_vmap
        def _dn(src, M, valid):
            return warp_parts_pallas(
                src, M, out_hw, "constant", valid=valid, rows_per_tile=rows,
                planar=True, planar_in=planar_in,
            )

        @_dn.def_vmap
        def _dn_vmap(axis_size, in_batched, src, M, valid):
            assert all(in_batched), in_batched
            B, N = src.shape[0], src.shape[1]
            out = warp_parts_pallas(
                src.reshape((B * N,) + src.shape[2:]),
                M.reshape(B * N, 3, 3),
                out_hw,
                "constant",
                valid=valid.reshape(B * N),
                rows_per_tile=rows,
                planar=True,
                planar_in=planar_in,
            )
            return out.reshape((B, N) + out.shape[1:]), True

        return _dn(src, M, valid)
    if planar_in:
        src = jnp.transpose(src, (0, 2, 3, 1))
    out = jax.vmap(
        lambda s, m: warp_perspective_matmul(s, m, out_hw, "constant")
    )(src, M)
    out = out * valid.astype(out.dtype)[:, None, None, None]
    return jnp.transpose(out, (0, 3, 1, 2))  # planar [P, C, H, W]

MASK_SATURATION_THRESHOLD = 254.5 / 255.0


def _stack_ch_nhwc(x):  # [P, h, w, C] -> [h, w, P*C] (part-major channels)
    return jnp.transpose(x, (1, 2, 0, 3)).reshape(x.shape[1], x.shape[2], -1)


def _composite_denorm(
    srcs: jnp.ndarray,  # [N, C, h, w] planar patches, mask last channel
    Ms: jnp.ndarray,  # [N, 3, 3] patch->frame
    valid: jnp.ndarray,  # [N] bool — part validity AND denorm mask
    out_hw: tuple[int, int],
    groups: tuple[int, ...],
    erode_parts: tuple[bool, ...],
    hand_parts: tuple[int, ...],
):
    """Fused denorm+erode+composite (ops/pallas_warp.py:_composite_kernel),
    TPU only — callers fall back to the separate-pass pipeline elsewhere
    (it is the parity oracle).  custom_vmap for the same reason as
    denorm_warp_parts: the batch rule must launch ONE (B, n_tiles) grid."""
    from ..ops.pallas_warp import warp_parts_composite_pallas
    from ..ops.tuning import TUNING

    C, Hs = srcs.shape[1], srcs.shape[2]
    rows = max(1, min(TUNING.denorm_rows_cap, (1 << 20) // (C * Hs * out_hw[1])))
    while out_hw[0] % rows:
        rows -= 1
    kw = dict(
        out_hw=out_hw, groups=groups, erode_parts=erode_parts,
        hand_parts=hand_parts, rows_per_tile=rows,
        interpret=TUNING.composite_interpret,
    )

    @jax.custom_batching.custom_vmap
    def _cp(srcs, Ms, valid):
        g, hn = warp_parts_composite_pallas(
            srcs[None], Ms[None], valid[None], **kw
        )
        return g[0], hn[0]

    @_cp.def_vmap
    def _cp_vmap(axis_size, in_batched, srcs, Ms, valid):
        assert all(in_batched), in_batched
        return warp_parts_composite_pallas(srcs, Ms, valid, **kw), (True, True)

    return _cp(srcs, Ms, valid)


def _gather_patches(imgp, y0i, x0i, offset, out_shape, C):
    starts = jnp.stack([y0i + offset, x0i + offset], axis=-1).reshape(-1, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    return jax.lax.gather(
        imgp, starts, dnums, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(out_shape + (2, 2, C))


def _bilinear_core(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray, border: str):
    """Patch-gather bilinear sample; returns (out, residuals for the VJP).

    TPU note: ONE `lax.gather` of (2,2,C) patches instead of four (1,1,C)
    point gathers — 4x fewer, 4x fatter DMA slices.  Border semantics are made
    exact by pre-padding: replicate == clamping the sample coords + edge-pad
    by 1; constant == zero-pad by 1, clamp coords to the 1px fade band, zero
    samples further outside.
    """
    H, W = img.shape[0], img.shape[1]
    out_shape = sx.shape

    if border == "replicate":
        sx = jnp.clip(sx, 0.0, W - 1)
        sy = jnp.clip(sy, 0.0, H - 1)
        imgp = jnp.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
        offset = 0
        outside = None
    else:  # constant zeros
        outside = (sx <= -1.0) | (sx >= W) | (sy <= -1.0) | (sy >= H)
        # keep the fractional fade-out band (W-1, W): x0 may reach W-1 with
        # its +1 neighbor landing on the zero pad; coords >= W are masked.
        sx = jnp.clip(sx, -1.0, float(W))
        sy = jnp.clip(sy, -1.0, float(H))
        imgp = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
        offset = 1

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    patches = _gather_patches(imgp, y0i, x0i, offset, out_shape, img.shape[2])

    top = patches[..., 0, 0, :] * (1 - fx) + patches[..., 0, 1, :] * fx
    bot = patches[..., 1, 0, :] * (1 - fx) + patches[..., 1, 1, :] * fx
    out = top * (1 - fy) + bot * fy
    if outside is not None:
        out = jnp.where(outside[..., None], jnp.zeros_like(out), out)
    return out, (patches, fx, fy, y0i, x0i, outside)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bilinear_sample(img, sx, sy, border: str, coord_grads: bool = True):
    """Bilinear sample with a hand-written VJP.

    The autodiff transpose of the patch gather is a scatter-add of
    OVERLAPPING (2,2,C) windows, which XLA serializes pathologically on TPU
    (measured ~20x slower than the forward).  TPU scatter cost is dominated
    by per-ROW latency (~45 ns/row regardless of payload width, measured),
    so the backward does ONE scatter of all four tap contributions as a
    [4C]-wide payload at the patch base index into per-tap planes, then
    composites the planes with four dense shifted adds — 4x fewer scatter
    rows than the classic four-tap grid_sample gradient (404 -> ~105 ms at
    the ADA supersample size).

    `coord_grads=False` skips the patch re-gather and the analytic dsx/dsy
    (the ADA pipe's warp matrices derive from RNG draws, not parameters, so
    their gradients are never consumed — saves a forward-sized gather).
    """
    return _bilinear_core(img, sx, sy, border)[0]


def _bilinear_fwd(img, sx, sy, border, coord_grads):
    out, (patches, fx, fy, y0i, x0i, outside) = _bilinear_core(img, sx, sy, border)
    # patches are NOT saved (they 4x the activation memory across the many
    # augment applications per step — measured HBM OOM); the backward
    # re-gathers them from `img`, which is alive anyway.
    return out, (img, fx, fy, y0i, x0i, outside)


def _bilinear_bwd(border, coord_grads, res, g):
    img, fx, fy, y0i, x0i, outside = res
    H, W, C = img.shape
    dtype = img.dtype
    if outside is not None:
        g = jnp.where(outside[..., None], jnp.zeros_like(g), g)

    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy

    # ---- image gradient: one plane-scatter + dense composition.
    # Planes P[tap] hold contributions for target (y0+dy, x0+dx) at base
    # index (y0+1, x0+1) in a pad-extended buffer (base in [-1, H] for the
    # constant border; out-of-image targets land in pad cells never read).
    payload = jnp.concatenate([g * w00, g * w01, g * w10, g * w11], axis=-1)
    P = jnp.zeros((H + 3, W + 3, 4 * C), g.dtype)
    P = P.at[y0i + 1, x0i + 1].add(payload)
    P = P.reshape(H + 3, W + 3, 4, C)
    # dimg[r, c] = sum_taps P[tap][r - dy + 1, c - dx + 1]
    dimg = (
        P[1 : H + 1, 1 : W + 1, 0]
        + P[1 : H + 1, 0:W, 1]
        + P[0:H, 1 : W + 1, 2]
        + P[0:H, 0:W, 3]
    )
    if border == "replicate":
        # clip semantics: taps that fell one past the edge add to the edge
        # (sx,sy were clamped to [0, size-1], so only the +1 side can spill)
        dimg = dimg.at[H - 1, :].add(P[H + 1, 1 : W + 1, 2] + P[H + 1, 0:W, 3])
        dimg = dimg.at[:, W - 1].add(P[1 : H + 1, W + 1, 1] + P[0:H, W + 1, 3])
        dimg = dimg.at[H - 1, W - 1].add(P[H + 1, W + 1, 3])

    if not coord_grads:
        zero = jnp.zeros_like(fx[..., 0])
        return dimg.astype(dtype), zero, zero

    if border == "replicate":
        imgp = jnp.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
        offset = 0
    else:
        imgp = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
        offset = 1
    patches = _gather_patches(imgp, y0i, x0i, offset, y0i.shape, C)

    # coordinate gradients from the re-gathered patches (elementwise)
    dfx = (
        (patches[..., 0, 1, :] - patches[..., 0, 0, :]) * (1 - fy)
        + (patches[..., 1, 1, :] - patches[..., 1, 0, :]) * fy
    )
    dfy = (
        patches[..., 1, 0, :] * (1 - fx) + patches[..., 1, 1, :] * fx
        - (patches[..., 0, 0, :] * (1 - fx) + patches[..., 0, 1, :] * fx)
    )
    dsx = jnp.sum(g * dfx, axis=-1)
    dsy = jnp.sum(g * dfy, axis=-1)
    if outside is not None:
        dsx = jnp.where(outside, 0.0, dsx)
        dsy = jnp.where(outside, 0.0, dsy)
    return dimg.astype(dtype), dsx, dsy


_bilinear_sample.defvjp(_bilinear_fwd, _bilinear_bwd)


def warp_perspective_inv(
    img: jnp.ndarray,  # [H, W, C] float
    Minv: jnp.ndarray,  # [3, 3] mapping dst pixel -> src pixel directly
    out_hw: tuple[int, int],
    border: str = "constant",
    coord_grads: bool = True,
) -> jnp.ndarray:
    """Warp with an explicit dst->src matrix (no inversion).

    `coord_grads=False` when Minv never needs gradients (e.g. the ADA pipe,
    whose matrices are RNG draws) — skips the backward's patch re-gather."""
    h, w = out_hw
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [h,w]
    denom = Minv[2, 0] * gx + Minv[2, 1] * gy + Minv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    sx = (Minv[0, 0] * gx + Minv[0, 1] * gy + Minv[0, 2]) / denom
    sy = (Minv[1, 0] * gx + Minv[1, 1] * gy + Minv[1, 2]) / denom
    if not coord_grads:
        sx = jax.lax.stop_gradient(sx)
        sy = jax.lax.stop_gradient(sy)
    return _bilinear_sample(img, sx, sy, border, coord_grads)


def warp_perspective(
    img: jnp.ndarray,  # [H, W, C] float
    M: jnp.ndarray,  # [3, 3] src->dst (cv2 convention; inverted internally)
    out_hw: tuple[int, int],
    border: str = "constant",
) -> jnp.ndarray:
    """cv2.warpPerspective(img, M, (w, h)) with bilinear interpolation."""
    # barrier: keep the 3x3 inverse out of the per-pixel coordinate fusion
    Minv = jax.lax.optimization_barrier(inv3x3(M))
    return warp_perspective_inv(img, Minv, out_hw, border)


# vmap over the 10 parts (matrices differ, image shared).
_warp_parts_gather = jax.vmap(warp_perspective, in_axes=(None, 0, None, None))


def _warp_parts(
    img: jnp.ndarray, Ms: jnp.ndarray, out_hw, border: str, planar: bool = False
):
    """Per-part NORM warps (full frame -> small patches).

    On TPU the bilinear gather is per-ROW latency bound (~21 ns/row;
    917k rows/batch-16 across the 14 norm warps = 19.3 of the 39 ms routing
    program, plus ~5 ms of gather-layout copies), and the plain jnp
    hat-matmul materializes a multi-GB half-contraction — the fused Pallas
    kernel (ops/pallas_warp.py:_norm_kernel) runs both contractions in VMEM
    with lossless 2D source-tile skipping.  CPU keeps the gather form (the
    routing parity suite runs on CPU and pins the gather semantics;
    tests/test_matmul_warp.py and test_norm_pallas.py pin gather == matmul
    == kernel)."""
    Hs, Ws = int(img.shape[0]), int(img.shape[1])
    h, w = out_hw
    from ..ops.tuning import TUNING

    rows, stiles = TUNING.norm_rows_per_tile, TUNING.norm_src_tiles
    if (
        _on_tpu()
        and Hs == Ws and Hs % stiles == 0 and stiles <= 16
        and (w & (w - 1)) == 0 and (h * w) % (rows * w) == 0
    ):
        from ..ops.pallas_warp import (
            warp_frame_to_parts_pallas,
            warp_frame_to_parts_pallas_batched,
        )

        # custom_vmap: route vmapped callers (route_patches_*_batch) into
        # ONE batched kernel grid instead of a serial per-sample lax.map
        @jax.custom_batching.custom_vmap
        def _norm(img, Ms):
            return warp_frame_to_parts_pallas(
                img, Ms, out_hw, border, rows_per_tile=rows, src_tiles=stiles,
                planar=planar,
            )

        @_norm.def_vmap
        def _norm_vmap(axis_size, in_batched, img, Ms):
            assert all(in_batched), in_batched
            return (
                warp_frame_to_parts_pallas_batched(
                    img, Ms, out_hw, border, rows_per_tile=rows, src_tiles=stiles,
                    planar=planar,
                ),
                True,
            )

        return _norm(img, Ms)
    out = _warp_parts_gather(img, Ms, out_hw, border)
    return jnp.transpose(out, (0, 3, 1, 2)) if planar else out


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
    M: jnp.ndarray,  # [10, 3, 3] norm transforms for the upper source
    M_inv: jnp.ndarray,  # [10, 3, 3] denorm transforms (usually the person's)
    valid: jnp.ndarray,  # [10] bool, validity of M
    box_factor: int = 2,
    M_lower: Optional[jnp.ndarray] = None,  # norm transforms for the lower source
    valid_lower: Optional[jnp.ndarray] = None,  # [10] validity of M_lower
    denorm_valid: Optional[jnp.ndarray] = None,  # [10] validity of M_inv
    erode_upper: bool = False,  # 5x5-erode upper denorm masks (test path, dataset.py:1485)
) -> RoutedPatches:
    """The norm/denorm patch pipeline for one sample (dataset.py:863-927).

    Training path: one keypoint set, so M == M_lower, all validities equal,
    no erosion.  Transfer path (test): the upper garment normalizes with the
    GARMENT's M while the lower garment is the person's own, self-routed with
    the person's M (dataset.py:1467-1492); everything denorms with the
    person's M_inv, and upper denorm masks are eroded before saturation.
    """
    H, W = upper_img.shape[0], upper_img.shape[1]
    h, w = H >> box_factor, W >> box_factor
    if M_lower is None:
        M_lower = M
    if valid_lower is None:
        valid_lower = valid
    if denorm_valid is None:
        denorm_valid = valid
    vmask = valid.astype(upper_img.dtype)[:, None, None, None]  # [10,1,1,1]
    vmask_lower = valid_lower.astype(upper_img.dtype)[:, None, None, None]
    dmask = denorm_valid.astype(upper_img.dtype)[:, None, None, None]

    # ---- norm: image + clothes-mask patches, BORDER_REPLICATE.
    # The mask rides as a 4th channel of ONE warp: XLA lowers 1-channel
    # patch gathers to a serialized per-point while loop (measured ~2.3 s
    # per batch-16 route vs ~24 ms for the 4-channel gather).  Both norm
    # warps emit PLANAR [P, 4, h, w] — the denorm kernel consumes planar
    # directly, so the NHWC roundtrip between the two kernels disappears.
    srcU = jnp.concatenate([upper_img, upper_clothes_mask[..., :1]], axis=-1)
    warpedU = _warp_parts(srcU, M, (h, w), "replicate", planar=True) * vmask
    part_imgs = warpedU[:, 0:3]  # planar [10, 3, h, w]
    part_masks = warpedU[:, 3:4]
    srcL = jnp.concatenate([lower_img, lower_clothes_mask[..., :1]], axis=-1)
    warpedL = (
        _warp_parts(srcL, M_lower[LOWER_PART_START:], (h, w), "replicate", planar=True)
        * vmask_lower[LOWER_PART_START:]
    )
    part_imgs_lower = warpedL[:, 0:3]
    part_masks_lower = warpedL[:, 3:4]

    # ---- denorm: re-project each patch, keep only saturated-mask pixels,
    #      composite sequentially (later parts overwrite).  The source is a
    #      small patch and the destination full-res, so ALL 14 warps run in
    #      one fused MXU hat-matmul kernel (denorm_warp_parts) — the gather
    #      form was per-row latency bound at ~1M rows/part/batch-16 (300 of
    #      the 330 ms round-2 routing cost).
    L = LOWER_PART_START
    # the [img|mask] 4-channel layout the denorm kernel wants IS the norm
    # kernels' output — srcs is a plain part-axis concat, no channel surgery
    srcs = jnp.concatenate([warpedU, warpedL], axis=0)  # [14, 4, h, w]
    Ms = jnp.concatenate([M_inv, M_inv[L:]], axis=0)
    vs = jnp.concatenate([denorm_valid, denorm_valid[L:]], axis=0)

    n_parts = NUM_PARTS + (NUM_PARTS - L)
    if _use_fused_composite(n_parts, srcs.shape[1], srcs.shape[2], srcs.shape[3]):
        # Fused denorm+erode+composite kernel: one grid step per dst
        # row-tile loops all 14 parts in VMEM and writes ONLY the two
        # composited planes + hand masks.  The separate-pass path below is
        # the oracle (tests/test_composite_pallas.py).
        groups = (0,) * NUM_PARTS + (1,) * (NUM_PARTS - L)
        ero = tuple(bool(erode_upper) and p < L for p in range(n_parts))
        g_imgs, hands = _composite_denorm(
            srcs, Ms, vs, (H, W), groups, ero, HAND_PARTS
        )
        denorm_upper = jnp.transpose(g_imgs[0], (1, 2, 0))
        denorm_lower = jnp.transpose(g_imgs[1], (1, 2, 0))
        hand_masks = hands[..., None]  # [4, H, W, 1]

        def stack_ch(x):  # planar [P,C,h,w] -> [h,w,P*C] (part-major)
            return jnp.transpose(x, (2, 3, 0, 1)).reshape(
                x.shape[2], x.shape[3], -1
            )

        return RoutedPatches(
            norm_img=stack_ch(part_imgs),
            norm_img_lower=stack_ch(part_imgs_lower),
            denorm_upper_img=denorm_upper,
            denorm_lower_img=denorm_lower,
            M_invs=M_inv,
            denorm_hand_masks=hand_masks,
            norm_clothes_masks=stack_ch(jnp.repeat(part_masks, 3, axis=1)),
            norm_clothes_masks_lower=stack_ch(
                jnp.repeat(part_masks_lower, 3, axis=1)
            ),
            valid=valid,
        )

    dn_all = denorm_warp_parts(srcs, Ms, vs, (H, W), planar_in=True)  # [14, 4, H, W]
    # sat masks as [14, H, W, 1] — a plain slice of the planar layout (no
    # relayout); compositing runs planar and only the final 3-channel images
    # transpose back to NHWC.
    sat_all = (dn_all[:, 3][..., None] >= MASK_SATURATION_THRESHOLD).astype(
        upper_img.dtype
    )
    if erode_upper:
        sat_all = jnp.concatenate(
            [erode_binary(sat_all[:L]), sat_all[L:]], axis=0
        )
    sat_pl = sat_all[..., 0][:, None]  # [14, 1, H, W]
    dmask_pl = dmask[..., 0]  # [10, 1, 1] -> broadcasts over [C, H, W]

    denorm_upper = jnp.zeros((3, H, W), upper_img.dtype)
    hand_masks_list = {}
    for p in range(NUM_PARTS):
        valid_p = sat_pl[p] * dmask_pl[p]  # [1, H, W]
        denorm_upper = dn_all[p, 0:3] * valid_p + denorm_upper * (1 - valid_p)
        if p in HAND_PARTS:
            hand_masks_list[p] = sat_all[p] * dmask[p]  # [H, W, 1]

    denorm_lower = jnp.zeros((3, H, W), lower_img.dtype)
    for i in range(NUM_PARTS - L):
        valid_p = sat_pl[NUM_PARTS + i] * dmask_pl[L + i]
        denorm_lower = dn_all[NUM_PARTS + i, 0:3] * valid_p + denorm_lower * (
            1 - valid_p
        )
    denorm_upper = jnp.transpose(denorm_upper, (1, 2, 0))
    denorm_lower = jnp.transpose(denorm_lower, (1, 2, 0))

    hand_masks = jnp.stack([hand_masks_list[p] for p in HAND_PARTS], axis=0)  # [4,H,W,1]

    def stack_ch(x):  # planar [P,C,h,w] -> [h,w,P*C] (part-major channels)
        return jnp.transpose(x, (2, 3, 0, 1)).reshape(x.shape[2], x.shape[3], -1)

    return RoutedPatches(
        norm_img=stack_ch(part_imgs),
        norm_img_lower=stack_ch(part_imgs_lower),
        denorm_upper_img=denorm_upper,
        denorm_lower_img=denorm_lower,
        M_invs=M_inv,
        denorm_hand_masks=hand_masks,
        norm_clothes_masks=stack_ch(
            jnp.repeat(part_masks, 3, axis=1) if part_masks.shape[1] == 1 else part_masks
        ),
        norm_clothes_masks_lower=stack_ch(
            jnp.repeat(part_masks_lower, 3, axis=1)
            if part_masks_lower.shape[1] == 1
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


def erode_binary(mask: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """cv2.erode with the default (+inf) border on a binary mask == min-pool
    with SAME padding.  Operates on the trailing [H, W, 1] dims of any rank.
    Separable (two 1-D min passes) — a box min-filter factorizes exactly."""
    ones = (1,) * (mask.ndim - 3)
    strides = (1,) * mask.ndim
    m = jax.lax.reduce_window(
        mask, jnp.inf, jax.lax.min, ones + (size, 1, 1), strides, "SAME"
    )
    return jax.lax.reduce_window(
        m, jnp.inf, jax.lax.min, ones + (1, size, 1), strides, "SAME"
    )


class RoutedPatchesV19(NamedTuple):
    norm_img: jnp.ndarray  # [h, w, 30] upper parts from garment, lower from person
    norm_pose: jnp.ndarray  # [h, w, 30] the per-part warped stickmen
    denorm_upper_img: jnp.ndarray  # [H, W, 3]
    denorm_lower_img: jnp.ndarray  # [H, W, 3]


def route_patches_v19_single(
    g_upper_img: jnp.ndarray,  # [H, W, 3] garment person's upper-clothes image, [0,1]
    g_upper_mask: jnp.ndarray,  # [H, W, 1]
    g_pose: jnp.ndarray,  # [H, W, 3] garment person's stickman, [0,1]
    p_lower_img: jnp.ndarray,  # [H, W, 3] target person's lower-clothes image
    p_lower_mask: jnp.ndarray,  # [H, W, 1]
    p_pose: jnp.ndarray,  # [H, W, 3] target person's stickman
    Mg: jnp.ndarray,  # [10, 3, 3] garment norm transforms
    valid_g: jnp.ndarray,  # [10]
    Mp: jnp.ndarray,  # [10, 3, 3] person norm transforms
    Mp_inv: jnp.ndarray,  # [10, 3, 3] person denorm transforms
    valid_p: jnp.ndarray,  # [10]
    box_factor: int = 2,
) -> RoutedPatchesV19:
    """The released-256 test-path routing (`UvitonDatasetV19_test.normalize`,
    reference `training/dataset.py:1427-1501`):

    * parts 0..5 (upper body) norm-warp the GARMENT's clothes image, stickman
      and mask with the garment's M;
    * parts 6..9 (lower body) norm-warp the TARGET PERSON's own lower-clothes
      image, stickman and mask with the person's M (self-routing);
    * every part denorm-warps with the person's M_inv — the pose transfer;
    * upper denorm masks are eroded 5x5 before the ==255 saturation test
      (`dataset.py:1485`); lower masks are not.

    Emits the 30-ch norm image + 30-ch norm stickman stacks that form the
    60-channel style-encoder input of the released checkpoint
    (`dataset.py:1513`, `test.py:121`).
    """
    H, W = g_upper_img.shape[0], g_upper_img.shape[1]
    h, w = H >> box_factor, W >> box_factor
    L = LOWER_PART_START

    def bcast(x, n):
        return jnp.broadcast_to(x[None], (n,) + x.shape)

    # Per-part source planes: img(3) + pose(3) + mask(1) packed into one warp.
    src = jnp.concatenate(
        [
            jnp.concatenate([g_upper_img, g_pose, g_upper_mask], axis=-1)[None]
            .repeat(L, axis=0),
            jnp.concatenate([p_lower_img, p_pose, p_lower_mask], axis=-1)[None]
            .repeat(NUM_PARTS - L, axis=0),
        ],
        axis=0,
    )  # [10, H, W, 7]
    M_norm = jnp.concatenate([Mg[:L], Mp[L:]], axis=0)
    src_valid = jnp.concatenate([valid_g[:L], valid_p[L:]], axis=0)
    vmask = src_valid.astype(g_upper_img.dtype)[:, None, None, None]

    warped = (
        jax.vmap(warp_perspective, in_axes=(0, 0, None, None))(
            src, M_norm, (h, w), "replicate"
        )
        * vmask
    )  # [10, h, w, 7]
    part_imgs = warped[..., 0:3]
    part_poses = warped[..., 3:6]
    part_masks = warped[..., 6:7]

    # Denorm: re-project image+mask into the person frame, saturation-gate.
    # All 10 warps in one fused MXU hat-matmul kernel (denorm_warp_parts).
    if _use_fused_composite(
        NUM_PARTS, 4, part_imgs.shape[1], part_imgs.shape[2]
    ):
        srcs = jnp.concatenate(
            [
                jnp.transpose(part_imgs, (0, 3, 1, 2)),
                jnp.transpose(part_masks, (0, 3, 1, 2)),
            ],
            axis=1,
        )  # planar [10, 4, h, w]
        g_imgs, _ = _composite_denorm(
            srcs, Mp_inv, valid_p, (H, W),
            groups=(0,) * L + (1,) * (NUM_PARTS - L),
            erode_parts=(True,) * L + (False,) * (NUM_PARTS - L),
            hand_parts=(),
        )
        return RoutedPatchesV19(
            norm_img=_stack_ch_nhwc(part_imgs),
            norm_pose=_stack_ch_nhwc(part_poses),
            denorm_upper_img=jnp.transpose(g_imgs[0], (1, 2, 0)),
            denorm_lower_img=jnp.transpose(g_imgs[1], (1, 2, 0)),
        )

    dn_valid_gate = valid_p.astype(g_upper_img.dtype)[:, None, None, None]
    dn_all = denorm_warp_parts(
        jnp.concatenate([part_imgs, part_masks], axis=-1), Mp_inv, valid_p, (H, W)
    )  # PLANAR [10, 4, H, W]
    sat_all = (dn_all[:, 3][..., None] >= MASK_SATURATION_THRESHOLD).astype(
        g_upper_img.dtype
    )  # [10, H, W, 1]
    sat_all = jnp.concatenate([erode_binary(sat_all[:L]), sat_all[L:]], axis=0)
    sat_all = sat_all * dn_valid_gate
    sat_pl = sat_all[..., 0][:, None]  # [10, 1, H, W]

    denorm_upper = jnp.zeros((3, H, W), g_upper_img.dtype)
    for p in range(L):
        denorm_upper = dn_all[p, 0:3] * sat_pl[p] + denorm_upper * (1 - sat_pl[p])
    denorm_lower = jnp.zeros((3, H, W), p_lower_img.dtype)
    for p in range(L, NUM_PARTS):
        denorm_lower = dn_all[p, 0:3] * sat_pl[p] + denorm_lower * (1 - sat_pl[p])
    denorm_upper = jnp.transpose(denorm_upper, (1, 2, 0))
    denorm_lower = jnp.transpose(denorm_lower, (1, 2, 0))

    def stack_ch(x):  # [P,h,w,C] -> [h,w,P*C]
        return jnp.transpose(x, (1, 2, 0, 3)).reshape(x.shape[1], x.shape[2], -1)

    return RoutedPatchesV19(
        norm_img=stack_ch(part_imgs),
        norm_pose=stack_ch(part_poses),
        denorm_upper_img=denorm_upper,
        denorm_lower_img=denorm_lower,
    )


@partial(jax.jit, static_argnames=("box_factor", "img_h", "pad_x"))
def route_patches_v19_batch(
    garment_upper_img: jnp.ndarray,  # [B, H, W, 3]
    garment_upper_mask: jnp.ndarray,  # [B, H, W, 1]
    garment_pose: jnp.ndarray,  # [B, H, W, 3]
    person_lower_img: jnp.ndarray,
    person_lower_mask: jnp.ndarray,
    person_pose: jnp.ndarray,
    garment_keypoints: jnp.ndarray,  # [B, 18, 3]
    person_keypoints: jnp.ndarray,  # [B, 18, 3]
    box_factor: int = 2,
    img_h: Optional[int] = None,
    pad_x: float = 32.0,
) -> RoutedPatchesV19:
    """Batched released-256 test routing (dataset.py:1427-1501)."""
    H = img_h or garment_upper_img.shape[1]
    h = garment_upper_img.shape[1] >> box_factor
    w = garment_upper_img.shape[2] >> box_factor
    Mg, _, valid_g = part_transforms(
        garment_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x,
        knee_fallbacks=True,
    )
    Mp, Mp_inv, valid_p = part_transforms(
        person_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x,
        knee_fallbacks=True,
    )
    return jax.vmap(partial(route_patches_v19_single, box_factor=box_factor))(
        garment_upper_img,
        garment_upper_mask,
        garment_pose,
        person_lower_img,
        person_lower_mask,
        person_pose,
        Mg,
        valid_g,
        Mp,
        Mp_inv,
        valid_p,
    )


# The 512 test path routes the lower garment through parts {0 (torso), 6..9
# (legs)} — reference `training/dataset.py:2023` (`if ii == 0 or ii >= 6`).
LOWER_PARTS_512 = (0, 6, 7, 8, 9)


class RoutedPatches512(NamedTuple):
    norm_img: jnp.ndarray  # [h, w, 30] 10 upper parts x 3ch
    norm_img_lower: jnp.ndarray  # [h, w, 15] parts {0,6..9} x 3ch
    denorm_upper_img: jnp.ndarray  # [H, W, 3]
    denorm_lower_img: jnp.ndarray  # [H, W, 3]


def route_patches_512_single(
    upper_img: jnp.ndarray,  # [H, W, 3] region-selected upper source, [0,1]
    lower_img: jnp.ndarray,  # [H, W, 3] region-selected lower source
    upper_mask: jnp.ndarray,  # [H, W, 1]
    lower_mask: jnp.ndarray,  # [H, W, 1]
    M_upper: jnp.ndarray,  # [10, 3, 3] norm transforms for the upper source
    valid_upper: jnp.ndarray,  # [10]
    M_lower: jnp.ndarray,  # [10, 3, 3] norm transforms for the lower source
    valid_lower: jnp.ndarray,  # [10]
    M_inv: jnp.ndarray,  # [10, 3, 3] person denorm transforms
    valid_inv: jnp.ndarray,  # [10]
    box_factor: int = 2,
) -> RoutedPatches512:
    """One 512-test sample through `normalize_full/upper/lower`
    (reference `training/dataset.py:1967-2194`).

    The three change_region modes differ ONLY in which keypoint set builds
    M_upper / M_lower (garment's vs person's) and which images feed
    upper_img / lower_img — the warp pipeline is shared:

    * all 10 parts norm-warp the upper source with M_upper (replicate border);
    * parts {0, 6..9} norm-warp the lower source with M_lower (`:2023`);
    * every patch denorm-warps with the person's M_inv, and ALL denorm masks
      (upper and lower) are 5x5-eroded before the ==255 saturation test
      (`:2015-2017`, unlike the 256 test path which erodes upper only);
    * parts composite sequentially in loop order — lower follows (0,6,7,8,9).
    """
    H, W = upper_img.shape[0], upper_img.shape[1]
    h, w = H >> box_factor, W >> box_factor
    LP = list(LOWER_PARTS_512)
    dtype = upper_img.dtype

    vU = valid_upper.astype(dtype)[:, None, None, None]
    srcU = jnp.concatenate([upper_img, upper_mask], axis=-1)  # [H,W,4]
    # planar norm -> planar denorm: no NHWC roundtrip between the kernels
    warpedU = _warp_parts(srcU, M_upper, (h, w), "replicate", planar=True) * vU
    part_imgs = warpedU[:, 0:3]  # planar [10, 3, h, w]
    part_masks = warpedU[:, 3:4]

    ML = M_lower[jnp.asarray(LP)]
    vL = valid_lower[jnp.asarray(LP)].astype(dtype)[:, None, None, None]
    srcL = jnp.concatenate([lower_img, lower_mask], axis=-1)
    warpedL = _warp_parts(srcL, ML, (h, w), "replicate", planar=True) * vL
    part_imgs_lower = warpedL[:, 0:3]
    part_masks_lower = warpedL[:, 3:4]

    # ---- denorm into the person frame; erode-then-saturate on every part.
    # All 15 warps in one fused MXU hat-matmul kernel (denorm_warp_parts).
    lp_idx = jnp.asarray(LP)
    srcs = jnp.concatenate([warpedU, warpedL], axis=0)  # [15, 4, h, w]
    Ms = jnp.concatenate([M_inv, M_inv[lp_idx]], axis=0)
    vs = jnp.concatenate([valid_inv, valid_inv[lp_idx]], axis=0)

    n15 = NUM_PARTS + len(LP)
    if _use_fused_composite(n15, srcs.shape[1], srcs.shape[2], srcs.shape[3]):
        g_imgs, _ = _composite_denorm(
            srcs, Ms, vs, (H, W),
            groups=(0,) * NUM_PARTS + (1,) * len(LP),
            erode_parts=(True,) * n15,  # the 512 path erodes EVERY mask
            hand_parts=(),
        )

        def stack_pl(x):  # planar [P,C,h,w] -> [h,w,P*C]
            return jnp.transpose(x, (2, 3, 0, 1)).reshape(
                x.shape[2], x.shape[3], -1
            )

        return RoutedPatches512(
            norm_img=stack_pl(part_imgs),
            norm_img_lower=stack_pl(part_imgs_lower),
            denorm_upper_img=jnp.transpose(g_imgs[0], (1, 2, 0)),
            denorm_lower_img=jnp.transpose(g_imgs[1], (1, 2, 0)),
        )

    dn_all = denorm_warp_parts(srcs, Ms, vs, (H, W), planar_in=True)  # [15, 4, H, W]
    sat_all = erode_binary(
        (dn_all[:, 3][..., None] >= MASK_SATURATION_THRESHOLD).astype(dtype)
    ) * vs.astype(dtype)[:, None, None, None]  # [15, H, W, 1]
    sat_pl = sat_all[..., 0][:, None]  # [15, 1, H, W]

    denorm_upper = jnp.zeros((3, H, W), dtype)
    for p in range(NUM_PARTS):
        denorm_upper = dn_all[p, 0:3] * sat_pl[p] + denorm_upper * (1 - sat_pl[p])

    denorm_lower = jnp.zeros((3, H, W), dtype)
    for i in range(len(LP)):
        q = NUM_PARTS + i
        denorm_lower = dn_all[q, 0:3] * sat_pl[q] + denorm_lower * (1 - sat_pl[q])
    denorm_upper = jnp.transpose(denorm_upper, (1, 2, 0))
    denorm_lower = jnp.transpose(denorm_lower, (1, 2, 0))

    def stack_ch(x):  # planar [P,C,h,w] -> [h,w,P*C] (part-major channels)
        return jnp.transpose(x, (2, 3, 0, 1)).reshape(x.shape[2], x.shape[3], -1)

    return RoutedPatches512(
        norm_img=stack_ch(part_imgs),
        norm_img_lower=stack_ch(part_imgs_lower),
        denorm_upper_img=denorm_upper,
        denorm_lower_img=denorm_lower,
    )


@partial(jax.jit, static_argnames=("box_factor", "img_h", "pad_x", "change_region"))
def route_patches_512_batch(
    person_upper_img: jnp.ndarray,  # [B, H, W, 3] person's own upper clothes
    person_lower_img: jnp.ndarray,  # person's own lower clothes
    person_upper_mask: jnp.ndarray,  # [B, H, W, 1]
    person_lower_mask: jnp.ndarray,
    garment_upper_img: jnp.ndarray,  # garment person's upper clothes
    garment_lower_img: jnp.ndarray,
    garment_upper_mask: jnp.ndarray,
    garment_lower_mask: jnp.ndarray,
    person_keypoints: jnp.ndarray,  # [B, 18, 3]
    garment_keypoints: jnp.ndarray,
    change_region: str = "fullbody",
    box_factor: int = 2,
    img_h: Optional[int] = None,
    pad_x: float = 96.0,
) -> RoutedPatches512:
    """Batched 512 region routing (reference `dataset.py:1679-1692`):

    * fullbody:  upper <- garment (garment M), lower <- garment (garment M);
    * upperbody: upper <- garment (garment M), lower <- person (person M);
    * lowerbody: upper <- person (person M),   lower <- garment (garment M);
    * denorm always via the person's M_inv.

    The 512 get_crop has NO knee->ankle fallback (commented out at
    `dataset.py:1894-1901`), so knee_fallbacks=False.
    """
    assert change_region in ("fullbody", "upperbody", "lowerbody")
    H = img_h or person_upper_img.shape[1]
    h = person_upper_img.shape[1] >> box_factor
    w = person_upper_img.shape[2] >> box_factor
    Mg, _, valid_g = part_transforms(
        garment_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x
    )
    Mp, Mp_inv, valid_p = part_transforms(
        person_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x
    )
    if change_region == "fullbody":
        up_img, up_mask, M_up, v_up = garment_upper_img, garment_upper_mask, Mg, valid_g
        lo_img, lo_mask, M_lo, v_lo = garment_lower_img, garment_lower_mask, Mg, valid_g
    elif change_region == "upperbody":
        up_img, up_mask, M_up, v_up = garment_upper_img, garment_upper_mask, Mg, valid_g
        lo_img, lo_mask, M_lo, v_lo = person_lower_img, person_lower_mask, Mp, valid_p
    else:  # lowerbody
        up_img, up_mask, M_up, v_up = person_upper_img, person_upper_mask, Mp, valid_p
        lo_img, lo_mask, M_lo, v_lo = garment_lower_img, garment_lower_mask, Mg, valid_g

    return jax.vmap(partial(route_patches_512_single, box_factor=box_factor))(
        up_img, lo_img, up_mask, lo_mask, M_up, v_up, M_lo, v_lo, Mp_inv, valid_p
    )


@partial(jax.jit, static_argnames=("box_factor", "img_h", "pad_x"))
def route_patches_transfer_batch(
    garment_upper_img: jnp.ndarray,  # [B, H, W, 3] garment person's upper clothes
    person_lower_img: jnp.ndarray,  # [B, H, W, 3] target person's own lower clothes
    garment_upper_mask: jnp.ndarray,
    person_lower_mask: jnp.ndarray,
    garment_keypoints: jnp.ndarray,  # [B, 18, 3]
    person_keypoints: jnp.ndarray,  # [B, 18, 3] target pose
    box_factor: int = 2,
    img_h: Optional[int] = None,
    pad_x: float = 32.0,
) -> RoutedPatches:
    """Unpaired try-on (42-ch Full-cluster layout): the upper garment
    normalizes with the garment's M, the person's own lower clothes self-route
    with the person's M, and everything re-projects with the person's M_inv
    with upper-mask erosion — the test-path semantics of dataset.py:1467-1492
    arranged into the training stack layout."""
    H = img_h or garment_upper_img.shape[1]
    h = garment_upper_img.shape[1] >> box_factor
    w = garment_upper_img.shape[2] >> box_factor
    Mg, _, valid_g = part_transforms(
        garment_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x,
        knee_fallbacks=True,
    )
    Mp, Mp_inv, valid_p = part_transforms(
        person_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x,
        knee_fallbacks=True,
    )
    return jax.vmap(
        partial(route_patches_single, box_factor=box_factor, erode_upper=True)
    )(
        garment_upper_img,
        person_lower_img,
        garment_upper_mask,
        person_lower_mask,
        Mg,
        Mp_inv,
        valid_g,
        M_lower=Mp,
        valid_lower=valid_p,
        denorm_valid=valid_p,
    )


@partial(jax.jit, static_argnames=("box_factor", "img_h", "pad_x", "swap"))
def route_patches_mix_batch(
    person_upper_img: jnp.ndarray,  # [B, H, W, 3] target person's own clothes
    person_lower_img: jnp.ndarray,
    person_upper_mask: jnp.ndarray,
    person_lower_mask: jnp.ndarray,
    garment_upper_img: jnp.ndarray,  # [B, H, W, 3] garment provider's clothes
    garment_lower_img: jnp.ndarray,
    garment_upper_mask: jnp.ndarray,
    garment_lower_mask: jnp.ndarray,
    person_keypoints: jnp.ndarray,  # [B, 18, 3] target pose (denorm geometry)
    garment_keypoints: jnp.ndarray,  # [B, 18, 3]
    swap: str = "upper",  # "upper" | "lower" | "full"
    box_factor: int = 2,
    img_h: Optional[int] = None,
    pad_x: float = 32.0,
) -> RoutedPatches:
    """Cross-pair routing for the snapshot try-on grid (reference
    `training_loop_wo_flow_fullbody.py:36-105` combine_parts/denorm_clothes):
    each garment region comes from either the person (self-routed with the
    person's M) or the garment provider (normalized with the garment's M);
    everything re-projects into the person's geometry with the person's
    M_inv.  `swap` selects the reference's row-third semantics: "lower"
    keeps the person's top and takes the provider's pants, "full" takes
    both, "upper" takes the provider's top and keeps the person's pants.
    """
    H = img_h or person_upper_img.shape[1]
    h = person_upper_img.shape[1] >> box_factor
    w = person_upper_img.shape[2] >> box_factor
    Mg, _, valid_g = part_transforms(
        garment_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x,
        knee_fallbacks=True,
    )
    Mp, Mp_inv, valid_p = part_transforms(
        person_keypoints, img_h=H, patch_w=w, patch_h=h, pad_x=pad_x,
        knee_fallbacks=True,
    )
    if swap == "full":
        up = (garment_upper_img, garment_upper_mask, Mg, valid_g)
        lo = (garment_lower_img, garment_lower_mask, Mg, valid_g)
    elif swap == "upper":
        up = (garment_upper_img, garment_upper_mask, Mg, valid_g)
        lo = (person_lower_img, person_lower_mask, Mp, valid_p)
    elif swap == "lower":
        up = (person_upper_img, person_upper_mask, Mp, valid_p)
        lo = (garment_lower_img, garment_lower_mask, Mg, valid_g)
    else:
        raise ValueError(f"swap must be upper|lower|full, got {swap!r}")

    return jax.vmap(
        partial(route_patches_single, box_factor=box_factor, erode_upper=True)
    )(
        up[0], lo[0], up[1], lo[1],
        up[2],
        Mp_inv,
        up[3],
        M_lower=lo[2],
        valid_lower=lo[3],
        denorm_valid=valid_p,
    )

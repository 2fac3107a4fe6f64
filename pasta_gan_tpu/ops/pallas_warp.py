"""Fused Pallas TPU kernel for the hat-matrix matmul warp.

The jnp formulation (ops/matmul_warp.py) is HBM-traffic bound: XLA
materializes the hat matrices and the half-contracted T [P_out, H_src*C]
per part — tens of GB per routed batch-16, measured ~7.6 ms/part.  This
kernel fuses hat construction + both contractions in VMEM; the only HBM
traffic is the small source patches in and the warped planes out.

Layout (chosen for TPU register tiling — see pallas_guide.md):
  * dst pixels ride the LANE axis as a flat [1, P] row per tile (P = a
    group of full output rows); coordinates come from a lane iota
    (x = p & (W-1), y = p >> log2(W); W is a power of two),
  * hat taps ride the SUBLANE axis: HJ [Ws + Hs, P] holds the x-hats
    stacked on the y-hats, built in one full-lane VPU pass via a
    sublane-index select,
  * the source rides channel-major [C*Hs, Ws] zero-padded to
    [C*Hs, Ws + Hs], so ONE K=(Ws+Hs) MXU matmul
        T = srcA @ HJ          # [C*Hs, P]
    x-interpolates every source row at every pixel (the zero block makes
    the y-hat rows inert) with zero K-padding waste,
  * the y-contraction out[ch, p] = sum_r B[r, p] * T[ch*Hs + r, p] is a
    sublane-tiled elementwise product followed by a tiny [C, C*Hs] 0/1
    segment matmul,
  * output is planar [N, C, H*W] (NCHW-ish) so every store is full-lane.

Per-tile skipping: the dst support of a patch is the convex quad image of
its (-1..Ws, -1..Hs) hat-support rectangle (projective maps send convex
polygons with positive denominator to convex polygons), so a row-tile whose
y-range misses the quad's bbox writes zeros without touching the MXU.  The
bbox test falls back to "compute everything" for degenerate matrices
(non-positive or non-finite corner denominators).

Numerics: matmuls run as manual bf16x3 passes — bf16 one-pass (~4e-3) would
break the ==255 mask-saturation margin (0.5/255); bf16x3 keeps both warp
paths within ~1e-5 (tests/test_matmul_warp.py, test_pallas_warp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul_warp import inv3x3

def _dot_bf16x3(a, b):
    """f32 matmul as three bf16 passes (a_hi@b_hi + a_hi@b_lo + a_lo@b_hi),
    ~1e-6 relative error at half the MXU passes of Precision.HIGHEST (Mosaic
    lowers no intermediate precision, so the split is done by hand)."""
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _pack_bits(flags: jnp.ndarray) -> jnp.ndarray:
    """Pack a [..., T] 0/1 int array into [..., ceil(T/32)] int32 bitmask
    words (bit t of word t//32 = flag t).  The per-(part, dst-tile) flag
    tables live in SMEM via scalar prefetch; packed words cut that footprint
    32x, which is what lets the dst tiles go below 8 rows (the round-3 norm
    kernel ran out of SMEM at 8)."""
    T = flags.shape[-1]
    pad = (-T) % 32
    f = jnp.pad(flags.astype(jnp.uint32), [(0, 0)] * (flags.ndim - 1) + [(0, pad)])
    f = f.reshape(flags.shape[:-1] + ((T + pad) // 32, 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(f << shifts, axis=-1).astype(jnp.int32)


def _warp_kernel(
    minv_ref, flags_ref, srcA_ref, out_ref, *, Hs, Ws, W, log2_w, C, P, border
):
    i = pl.program_id(0)
    t = pl.program_id(1)
    flag = (flags_ref[i, t >> 5] >> (t & 31)) & 1

    @pl.when(flag == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(flag != 0)
    def _():
        m00 = minv_ref[i, 0]
        m01 = minv_ref[i, 1]
        m02 = minv_ref[i, 2]
        m10 = minv_ref[i, 3]
        m11 = minv_ref[i, 4]
        m12 = minv_ref[i, 5]
        m20 = minv_ref[i, 6]
        m21 = minv_ref[i, 7]
        m22 = minv_ref[i, 8]

        pidx = t * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        gx = (pidx & (W - 1)).astype(jnp.float32)  # [1, P]
        gy = (pidx >> log2_w).astype(jnp.float32)

        denom = m20 * gx + m21 * gy + m22
        denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
        sx = (m00 * gx + m01 * gy + m02) / denom
        sy = (m10 * gx + m11 * gy + m12) / denom
        if border == "replicate":
            sx = jnp.clip(sx, 0.0, float(Ws - 1))
            sy = jnp.clip(sy, 0.0, float(Hs - 1))
        else:
            # constant-zero border: hats vanish outside [-1, size]; clamp
            # (and squash non-finite coords from degenerate matrices) into
            # the all-zero-weight band.
            sx = jnp.clip(sx, -2.0, float(Ws + 1))
            sy = jnp.clip(sy, -2.0, float(Hs + 1))
            sx = jnp.where(jnp.isfinite(sx), sx, -2.0)
            sy = jnp.where(jnp.isfinite(sy), sy, -2.0)

        K = Ws + Hs
        sub = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0)
        is_x = sub < Ws
        tap = jnp.where(is_x, sub, sub - Ws).astype(jnp.float32)
        s = jnp.where(is_x, sx, sy)  # [1,P] broadcasts over sublanes
        HJ = jnp.maximum(0.0, 1.0 - jnp.abs(s - tap))  # [K, P]

        T = _dot_bf16x3(srcA_ref[0], HJ)  # [C*Hs, P]

        B = HJ[Ws : Ws + Hs, :]  # [Hs, P]
        Bw = pltpu.repeat(B, C, axis=0)  # [C*Hs, P]
        X = Bw * T

        rows = jax.lax.broadcasted_iota(jnp.int32, (C, C * Hs), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (C, C * Hs), 1)
        # EC is 0/1 (bf16-exact); split X hi/lo for two exact-ish passes
        EC = (cols // Hs == rows).astype(jnp.bfloat16)  # [C, C*Hs]
        X_hi = X.astype(jnp.bfloat16)
        X_lo = (X - X_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[0] = (
            jnp.dot(EC, X_hi, preferred_element_type=jnp.float32)
            + jnp.dot(EC, X_lo, preferred_element_type=jnp.float32)
        )  # [C, P]


def _support_row_flags(M_fwd, valid, Hs, Ws, H, n_tiles, rows_per_tile):
    """[.., n_tiles] int32: does the dst support quad of each patch touch the
    tile's row range?  M_fwd maps patch->dst (cv2 convention)."""
    cs = jnp.asarray(
        [[-1.0, -1.0, 1.0], [Ws + 0.0, -1.0, 1.0], [-1.0, Hs + 0.0, 1.0],
         [Ws + 0.0, Hs + 0.0, 1.0]], jnp.float32
    )  # [4, 3] hat-support corners
    pc = jnp.einsum("ij,cj->ci", M_fwd, cs)  # [4, 3]
    w = pc[:, 2]
    safe = jnp.all(w > 1e-6) & jnp.all(jnp.isfinite(pc))
    y = pc[:, 1] / jnp.where(jnp.abs(w) < 1e-6, 1e-6, w)
    ymin = jnp.floor(jnp.min(y)) - 1.0
    ymax = jnp.ceil(jnp.max(y)) + 1.0
    # degenerate -> conservatively compute every tile
    ymin = jnp.where(safe, ymin, 0.0)
    ymax = jnp.where(safe, ymax, float(H))
    t0 = jnp.arange(n_tiles, dtype=jnp.float32) * rows_per_tile
    overlap = (ymin <= t0 + rows_per_tile - 1) & (ymax >= t0)
    return (overlap & valid).astype(jnp.int32)


_support_row_flags_v = jax.vmap(
    _support_row_flags, in_axes=(0, 0, None, None, None, None, None)
)


def _norm_kernel(
    minv_ref, flags_ref, srcA_ref, out_ref, t_ref, acc_ref,
    *, Hs, Ws, st, W, log2_w, C, P, border, n_y, n_x,
):
    """NORM direction (full frame -> small patch) with 2D source-tile
    skipping.  The contraction over the big source is blocked into
    [C*st, st] tiles; a (j, k) block whose source rows/cols lie outside the
    dst tile's projected sample bbox contributes exactly zero (every hat
    weight vanishes there), so skipping it is lossless — the flags are
    computed from projected corner bboxes in the wrapper."""
    i = pl.program_id(0)
    t = pl.program_id(1)

    m00 = minv_ref[i, 0]
    m01 = minv_ref[i, 1]
    m02 = minv_ref[i, 2]
    m10 = minv_ref[i, 3]
    m11 = minv_ref[i, 4]
    m12 = minv_ref[i, 5]
    m20 = minv_ref[i, 6]
    m21 = minv_ref[i, 7]
    m22 = minv_ref[i, 8]

    pidx = t * P + jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    gx = (pidx & (W - 1)).astype(jnp.float32)  # [1, P]
    gy = (pidx >> log2_w).astype(jnp.float32)

    denom = m20 * gx + m21 * gy + m22
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    sx = (m00 * gx + m01 * gy + m02) / denom
    sy = (m10 * gx + m11 * gy + m12) / denom
    if border == "replicate":
        sx = jnp.clip(sx, 0.0, float(Ws - 1))
        sy = jnp.clip(sy, 0.0, float(Hs - 1))
        sx = jnp.where(jnp.isfinite(sx), sx, 0.0)
        sy = jnp.where(jnp.isfinite(sy), sy, 0.0)
    else:
        sx = jnp.clip(sx, -2.0, float(Ws + 1))
        sy = jnp.clip(sy, -2.0, float(Hs + 1))
        sx = jnp.where(jnp.isfinite(sx), sx, -2.0)
        sy = jnp.where(jnp.isfinite(sy), sy, -2.0)

    sub = jax.lax.broadcasted_iota(jnp.int32, (st, P), 0).astype(jnp.float32)

    # one packed word per (part, dst-tile): bits 0..n_y-1 = y-tile flags,
    # bits 16..16+n_x-1 = x-tile flags (SMEM bitmask, see _pack_bits)
    word = flags_ref[i, t]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for j in range(n_y):
        @pl.when((word >> j) & 1 != 0)
        def _(j=j):
            B = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (sub + j * st)))  # [st, P]
            t_ref[...] = jnp.zeros_like(t_ref)
            for k in range(n_x):
                @pl.when((word >> (16 + k)) & 1 != 0)
                def _(j=j, k=k):
                    A = jnp.maximum(0.0, 1.0 - jnp.abs(sx - (sub + k * st)))
                    t_ref[...] += _dot_bf16x3(
                        srcA_ref[0, j][:, k * st : (k + 1) * st], A
                    )  # [C*st, P]
            Bw = pltpu.repeat(B, C, axis=0)  # [C*st, P]
            X = Bw * t_ref[...]
            # y-hat channel reassembly as an exact VPU sublane reduction
            # (same move as _composite_kernel: the former [C, C*st]
            # selector dot wasted the MXU on M=C and needed hi/lo splits)
            acc_ref[...] += jnp.concatenate(
                [
                    jnp.sum(X[c * st : (c + 1) * st], axis=0, keepdims=True)
                    for c in range(C)
                ],
                axis=0,
            )
    out_ref[0] = acc_ref[...]


def _tile_src_flags(Minv, valid, out_hw, rows_per_tile, Hs, Ws, st, n_y, n_x, border):
    """Per (dst row-tile) source-tile overlap flags from projected corners.

    Projects each dst tile's corner rectangle (extended 1px for the hat
    support) through the dst->src homography; a convex quad's bbox bounds
    every sample coordinate when all corner denominators are positive —
    degenerate cases fall back to "all tiles".  Returns (yflags [T, n_y],
    xflags [T, n_x]) int32."""
    h, w = out_hw
    n_t = (h * w) // (rows_per_tile * w)
    y0 = jnp.arange(n_t, dtype=jnp.float32) * rows_per_tile - 1.0
    y1 = y0 + rows_per_tile + 1.0
    ones = jnp.ones((n_t,), jnp.float32)
    corners = jnp.stack(
        [
            jnp.stack([-ones, y0, ones], -1),
            jnp.stack([ones * w, y0, ones], -1),
            jnp.stack([-ones, y1, ones], -1),
            jnp.stack([ones * w, y1, ones], -1),
        ],
        axis=1,
    )  # [T, 4, 3]
    pc = jnp.einsum("ij,tcj->tci", Minv, corners)  # [T, 4, 3]
    wd = pc[..., 2]
    safe = jnp.all(wd > 1e-6, axis=1) & jnp.all(jnp.isfinite(pc), axis=(1, 2))
    wd = jnp.where(jnp.abs(wd) < 1e-6, 1e-6, wd)
    xs = pc[..., 0] / wd
    ys = pc[..., 1] / wd
    if border == "replicate":
        xs = jnp.clip(xs, 0.0, Ws - 1.0)
        ys = jnp.clip(ys, 0.0, Hs - 1.0)
    xmin = jnp.where(safe, jnp.floor(jnp.min(xs, axis=1)) - 1.0, 0.0)
    xmax = jnp.where(safe, jnp.ceil(jnp.max(xs, axis=1)) + 1.0, float(Ws))
    ymin = jnp.where(safe, jnp.floor(jnp.min(ys, axis=1)) - 1.0, 0.0)
    ymax = jnp.where(safe, jnp.ceil(jnp.max(ys, axis=1)) + 1.0, float(Hs))
    ky = jnp.arange(n_y, dtype=jnp.float32) * st
    kx = jnp.arange(n_x, dtype=jnp.float32) * st
    yf = (ymin[:, None] <= ky[None] + st - 1) & (ymax[:, None] >= ky[None])
    xf = (xmin[:, None] <= kx[None] + st - 1) & (xmax[:, None] >= kx[None])
    yf = yf & valid
    xf = xf & valid
    return yf.astype(jnp.int32), xf.astype(jnp.int32)


_tile_src_flags_v = jax.vmap(
    _tile_src_flags, in_axes=(0, 0, None, None, None, None, None, None, None, None)
)


def _pack_yx_flags(yflags, xflags, n_y, n_x):
    """[N, T, n_y] + [N, T, n_x] 0/1 flags -> ONE int32 word per (part,
    dst-tile): bits 0..n_y-1 = y flags, bits 16..16+n_x-1 = x flags.  Cuts
    the norm kernel's SMEM flag footprint (n_y + n_x) * 32x."""
    assert n_y <= 16 and n_x <= 16, (n_y, n_x)
    sy = 1 << jnp.arange(n_y, dtype=jnp.int32)
    sx = 1 << jnp.arange(n_x, dtype=jnp.int32) << 16
    return (jnp.sum(yflags * sy, axis=-1) | jnp.sum(xflags * sx, axis=-1)).astype(
        jnp.int32
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_hw", "border", "rows_per_tile", "src_tiles", "interpret", "planar"
    ),
)
def warp_frame_to_parts_pallas(
    src: jnp.ndarray,  # [Hs, Ws, C] full source frame (shared by all parts)
    M_fwd: jnp.ndarray,  # [P_parts, 3, 3] frame->patch (cv2 convention)
    out_hw: tuple[int, int],
    border: str = "replicate",
    valid: jnp.ndarray | None = None,
    rows_per_tile: int = 16,
    src_tiles: int = 4,
    interpret: bool = False,  # run the kernel in interpret mode (CPU CI)
    planar: bool = False,  # return [N, C, h, w] (kernel-native; skips the
    # NHWC relayout when the consumer — the denorm kernel — reads planar)
) -> jnp.ndarray:
    """NORM-direction batched warp (one big frame -> N small patches),
    matching vmap(warp_perspective, (None, 0, None, None))(src, M_fwd) with
    constant/replicate borders.  The source contraction is blocked
    [src_tiles x src_tiles] with lossless per-(dst-tile) skipping — see
    _norm_kernel.  The gather formulation is per-row latency bound on TPU
    (~21 ns/row; BASELINE.md round-3); this runs on the MXU."""
    Hs, Ws, C = src.shape
    N = M_fwd.shape[0]
    h, w = out_hw
    assert w & (w - 1) == 0, f"out width {w} must be a power of two"
    assert Hs % src_tiles == 0 and Ws % src_tiles == 0, (Hs, Ws, src_tiles)
    st = Hs // src_tiles
    assert Ws // src_tiles == st, "square source tiling only"
    P = rows_per_tile * w
    assert (h * w) % P == 0
    log2_w = w.bit_length() - 1
    n_tiles = (h * w) // P
    n_y = n_x = src_tiles

    Minv = inv3x3(M_fwd)
    minv9 = Minv.reshape(N, 9)
    if valid is None:
        valid_b = jnp.ones((N,), bool)
    else:
        valid_b = valid.astype(bool)
    yflags, xflags = _tile_src_flags_v(
        Minv, valid_b, out_hw, rows_per_tile, Hs, Ws, st, n_y, n_x, border
    )  # [N, n_tiles, n_y], [N, n_tiles, n_x]
    flags = _pack_yx_flags(yflags, xflags, n_y, n_x)  # [N, n_tiles] words
    minv9, flags = jax.lax.optimization_barrier((minv9, flags))

    # [n_y, C*st, Ws]: block row j holds channel-major rows j*st..j*st+st
    srcA = (
        jnp.transpose(src.astype(jnp.float32), (2, 0, 1))  # [C, Hs, Ws]
        .reshape(C, n_y, st, Ws)
        .transpose(1, 0, 2, 3)
        .reshape(n_y, C * st, Ws)
    )

    kernel = functools.partial(
        _norm_kernel, Hs=Hs, Ws=Ws, st=st, W=w, log2_w=log2_w, C=C, P=P,
        border=border, n_y=n_y, n_x=n_x,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # minv9, packed flag words in SMEM
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1, n_y, C * st, Ws), lambda i, t, *_: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, P), lambda i, t, *_: (i, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((C * st, P), jnp.float32),
            pltpu.VMEM((C, P), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, C, h * w), jnp.float32),
        interpret=interpret,
    )(minv9, flags, srcA[None])
    out = out.reshape(N, C, h, w)
    return out if planar else jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_hw", "border", "rows_per_tile", "src_tiles", "interpret", "planar"
    ),
)
def warp_frame_to_parts_pallas_batched(
    src: jnp.ndarray,  # [B, Hs, Ws, C] source frames
    M_fwd: jnp.ndarray,  # [B, N, 3, 3] frame->patch (cv2 convention)
    out_hw: tuple[int, int],
    border: str = "replicate",
    valid: jnp.ndarray | None = None,  # [B, N]
    rows_per_tile: int = 16,
    src_tiles: int = 4,
    interpret: bool = False,
    planar: bool = False,  # return [B, N, C, h, w] (see single-frame entry)
) -> jnp.ndarray:
    """Batched NORM warp in ONE kernel launch: grid (B*N, n_tiles), each
    frame shared by its N part programs via the src index_map.  vmap of the
    single-frame entry falls back to a serial lax.map (scalar-prefetch
    operands have no batching rule) — 16 sequential dispatches measured
    ~2.9 ms vs one pipelined grid; data/warp.py routes vmapped callers here
    through a custom_vmap rule."""
    B, Hs, Ws, C = src.shape
    N = M_fwd.shape[1]
    h, w = out_hw
    assert w & (w - 1) == 0, f"out width {w} must be a power of two"
    st = Hs // src_tiles
    assert Ws // src_tiles == st and Hs % src_tiles == 0 and Ws % src_tiles == 0
    P = rows_per_tile * w
    assert (h * w) % P == 0
    log2_w = w.bit_length() - 1
    n_tiles = (h * w) // P
    n_y = n_x = src_tiles

    Minv = inv3x3(M_fwd)  # [B, N, 3, 3]
    minv9 = Minv.reshape(B * N, 9)
    if valid is None:
        valid_b = jnp.ones((B, N), bool)
    else:
        valid_b = valid.astype(bool)
    yflags, xflags = _tile_src_flags_v(
        Minv.reshape(B * N, 3, 3), valid_b.reshape(B * N), out_hw,
        rows_per_tile, Hs, Ws, st, n_y, n_x, border,
    )
    flags = _pack_yx_flags(yflags, xflags, n_y, n_x)
    minv9, flags = jax.lax.optimization_barrier((minv9, flags))

    srcA = (
        jnp.transpose(src.astype(jnp.float32), (0, 3, 1, 2))  # [B, C, Hs, Ws]
        .reshape(B, C, n_y, st, Ws)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, n_y, C * st, Ws)
    )

    kernel = functools.partial(
        _norm_kernel, Hs=Hs, Ws=Ws, st=st, W=w, log2_w=log2_w, C=C, P=P,
        border=border, n_y=n_y, n_x=n_x,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * N, n_tiles),
        in_specs=[
            pl.BlockSpec((1, n_y, C * st, Ws), lambda i, t, *_: (i // N, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, P), lambda i, t, *_: (i, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((C * st, P), jnp.float32),
            pltpu.VMEM((C, P), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * N, C, h * w), jnp.float32),
        interpret=interpret,
    )(minv9, flags, srcA)
    out = out.reshape(B, N, C, h, w)
    return out if planar else jnp.transpose(out, (0, 1, 3, 4, 2))


def _roll_lanes(x, shift, interpret):
    """Lane-axis roll of a [1, P] vector (erosion neighbor shifts).
    pltpu.roll rejects negative shifts; rolls are cyclic, so wrap."""
    if interpret:
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _composite_kernel(
    minv_ref, flags_ref, srcA_ref, *out_refs,
    Hs, Ws, W, H, log2_w, C, P, N, groups, erode_parts, hand_parts,
    thresh, interpret,
):
    """DENORM + erode + saturate + sequential composite, fused (one grid step
    per (sample, dst row-tile); the part loop is unrolled in-kernel).

    Replaces the three-pass XLA pipeline (denorm kernel writing all
    [N, C, H, W] planes -> reduce_window erosion -> 14-step select chain)
    with one kernel whose only HBM output is the composited group planes +
    hand masks — ~5.6x less output traffic, and (part, tile) programs whose
    support quad misses the tile cost nothing at all (the old kernel still
    zero-wrote their blocks).

    Per part: the image channels contract over the main tile range P; the
    MASK channel contracts over an extended range P + 4W rows (the 5x5
    erosion halo) so the binary erosion (min over the 24 neighbor shifts,
    out-of-frame neighbors neutral 1.0 — cv2's +inf border on a 0/1 mask)
    is exact across tile boundaries.  Reference semantics being fused:
    dataset.py:880-927 (warpPerspective + ==255 + sequential overwrite) and
    dataset.py:1485 (cv2.erode on the upper masks, test path)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    word = flags_ref[i, t]
    for r in out_refs:
        r[0] = jnp.zeros(r.shape[1:], r.dtype)
    hands_ref = out_refs[-1]
    n_hands = hands_ref.shape[1]

    for p in range(N):
        @pl.when(((word >> p) & 1) != 0)
        def _(p=p):
            b9 = p * 9
            m00 = minv_ref[i, b9 + 0]
            m01 = minv_ref[i, b9 + 1]
            m02 = minv_ref[i, b9 + 2]
            m10 = minv_ref[i, b9 + 3]
            m11 = minv_ref[i, b9 + 4]
            m12 = minv_ref[i, b9 + 5]
            m20 = minv_ref[i, b9 + 6]
            m21 = minv_ref[i, b9 + 7]
            m22 = minv_ref[i, b9 + 8]

            ero = bool(erode_parts[p])
            pad = 2 * W if ero else 0
            Pe = P + 2 * pad
            pidx = t * P - pad + jax.lax.broadcasted_iota(jnp.int32, (1, Pe), 1)
            # two's-complement & / arithmetic >> keep x/y exact for the
            # negative halo rows of tile 0 (discarded via the y-valid mask)
            gxi = pidx & (W - 1)
            gyi = pidx >> log2_w
            gx = gxi.astype(jnp.float32)
            gy = gyi.astype(jnp.float32)

            denom = m20 * gx + m21 * gy + m22
            denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
            sx = (m00 * gx + m01 * gy + m02) / denom
            sy = (m10 * gx + m11 * gy + m12) / denom
            # constant-zero border (denorm always): clamp into the
            # all-zero-weight band, squash non-finite coords
            sx = jnp.clip(sx, -2.0, float(Ws + 1))
            sy = jnp.clip(sy, -2.0, float(Hs + 1))
            sx = jnp.where(jnp.isfinite(sx), sx, -2.0)
            sy = jnp.where(jnp.isfinite(sy), sy, -2.0)

            K = Ws + Hs
            sub = jax.lax.broadcasted_iota(jnp.int32, (K, Pe), 0)
            is_x = sub < Ws
            tap = jnp.where(is_x, sub, sub - Ws).astype(jnp.float32)
            s = jnp.where(is_x, sx, sy)
            HJ = jnp.maximum(0.0, 1.0 - jnp.abs(s - tap))  # [K, Pe]
            HJm = HJ[:, pad : pad + P] if pad else HJ  # main-range slice

            Ci = C - 1  # image channels; the mask rides last
            base = p * C * Hs
            T = _dot_bf16x3(srcA_ref[0, base : base + Ci * Hs], HJm)  # [Ci*Hs, P]
            Bm = HJm[Ws : Ws + Hs, :]
            Bw = pltpu.repeat(Bm, Ci, axis=0)
            X = Bw * T
            # y-hat channel reassembly: img[c] = sum_i X[c*Hs+i].  A VPU
            # sublane reduction — the former [Ci, Ci*Hs] selector MXU dot
            # wasted 125/128 of the array on M=3 and needed an X hi/lo
            # split; this is exact fp32 at zero MXU passes.
            img = jnp.concatenate(
                [
                    jnp.sum(X[c * Hs : (c + 1) * Hs], axis=0, keepdims=True)
                    for c in range(Ci)
                ],
                axis=0,
            )  # [Ci, P]

            # Mask channel over the extended (halo) range, in DEFICIT form:
            # with d = 1-m (zeroed on the inert y-hat pad columns),
            #   mv = sum_ij w_ij m_ij = wx*wy - sum_ij w_ij d_ij
            # where wx[p] = sum_j hatx[j,p], wy[p] = sum_i haty[i,p] are
            # exact fp32 VPU column sums of HJ.  The remaining dot's error
            # is RELATIVE TO S = sum w*d, and sat flips only where
            # mv ~ thresh, i.e. S <= (1-thresh)*wx*wy ~ 2e-3 — so a single
            # bf16 MXU pass (abs err <~ 2^-8 * S <= 2e-8 there) replaces
            # the bf16x3 triple at full boundary fidelity; garment-interior
            # pixels (d = 0) are exact by construction.
            mrows = srcA_ref[0, base + Ci * Hs : base + C * Hs]  # [Hs, Ws+Hs]
            kcols = jax.lax.broadcasted_iota(jnp.int32, (Hs, Ws + Hs), 1)
            md = jnp.where(kcols < Ws, 1.0 - mrows, 0.0)
            Sd = jnp.dot(
                md.astype(jnp.bfloat16),
                HJ.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # [Hs, Pe]
            Bx = HJ[Ws : Ws + Hs, :]
            wx = jnp.sum(HJ[:Ws, :], axis=0, keepdims=True)  # [1, Pe]
            wy = jnp.sum(Bx, axis=0, keepdims=True)
            mv = wx * wy - jnp.sum(Bx * Sd, axis=0, keepdims=True)  # [1, Pe]
            sat = (mv >= thresh).astype(jnp.float32)

            if ero:
                xm = sat
                for dx in (-2, -1, 1, 2):
                    sh = _roll_lanes(sat, -dx, interpret)
                    ok = (gxi + dx >= 0) & (gxi + dx <= W - 1)
                    xm = jnp.minimum(xm, jnp.where(ok, sh, 1.0))
                ym = xm
                for dy in (-2, -1, 1, 2):
                    sh = _roll_lanes(xm, -dy * W, interpret)
                    ok = (gyi + dy >= 0) & (gyi + dy <= H - 1)
                    ym = jnp.minimum(ym, jnp.where(ok, sh, 1.0))
                satm = ym[:, pad : pad + P]
            else:
                satm = sat

            g = groups[p]
            acc = out_refs[g]
            acc[0] = img * satm + acc[0] * (1.0 - satm)
            if p in hand_parts:
                slot = hand_parts.index(p)
                ri = jax.lax.broadcasted_iota(jnp.int32, (n_hands, P), 0)
                hands_ref[0] = jnp.where(ri == slot, satm, hands_ref[0])


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_hw", "groups", "erode_parts", "hand_parts", "rows_per_tile",
        "thresh", "interpret",
    ),
)
def warp_parts_composite_pallas(
    src: jnp.ndarray,  # [B, N, C, h, w] PLANAR patches (mask = last channel)
    M_fwd: jnp.ndarray,  # [B, N, 3, 3] patch->frame (cv2 convention)
    valid: jnp.ndarray,  # [B, N] bool — validity AND denorm mask, pre-ANDed
    out_hw: tuple[int, int],
    groups: tuple[int, ...],  # per-part composite target (0=upper, 1=lower, ...)
    erode_parts: tuple[bool, ...],  # per-part: 5x5-erode the sat mask first
    hand_parts: tuple[int, ...],  # parts whose sat mask is also emitted
    rows_per_tile: int = 8,
    thresh: float = 254.5 / 255.0,
    interpret: bool = False,
):
    """Fused denorm -> erode -> saturate -> sequential composite.

    Returns (group_imgs [B, n_groups, 3, H, W], hand_masks [B, n_hands, H, W])
    == the XLA pipeline in data/warp.py:route_patches_single lines 413-456
    (its CPU path remains the oracle; tests/test_composite_pallas.py)."""
    B, N, C, Hs, Ws = src.shape
    H, W = out_hw
    assert W & (W - 1) == 0, f"out width {W} must be a power of two"
    assert len(groups) == N and len(erode_parts) == N
    P = rows_per_tile * W
    assert (H * W) % P == 0
    log2_w = W.bit_length() - 1
    n_tiles = (H * W) // P
    n_gr = max(groups) + 1
    assert N <= 32  # one flag word per (sample, tile)

    Minv = inv3x3(M_fwd)
    minv9 = Minv.reshape(B, N * 9)
    flags = _support_row_flags_v(
        M_fwd.reshape(B * N, 3, 3).astype(jnp.float32),
        valid.reshape(B * N).astype(bool),
        Hs, Ws, H, n_tiles, rows_per_tile,
    ).reshape(B, N, n_tiles)
    words = jnp.sum(
        flags * (1 << jnp.arange(N, dtype=jnp.int32))[None, :, None], axis=1
    ).astype(jnp.int32)  # [B, n_tiles]
    minv9, words = jax.lax.optimization_barrier((minv9, words))

    srcA = src.astype(jnp.float32).reshape(B, N * C * Hs, Ws)
    srcA = jnp.pad(srcA, ((0, 0), (0, 0), (0, Hs)))  # inert y-hat K-rows

    kernel = functools.partial(
        _composite_kernel,
        Hs=Hs, Ws=Ws, W=W, H=H, log2_w=log2_w, C=C, P=P, N=N,
        groups=groups, erode_parts=erode_parts, hand_parts=hand_parts,
        thresh=thresh, interpret=interpret,
    )
    n_hands = max(len(hand_parts), 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # minv9 [B, N*9] + flag words [B, n_tiles]
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, N * C * Hs, Ws + Hs), lambda i, t, *_: (i, 0, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, C - 1, P), lambda i, t, *_: (i, 0, t))
            for _ in range(n_gr)
        )
        + (pl.BlockSpec((1, n_hands, P), lambda i, t, *_: (i, 0, t)),),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, C - 1, H * W), jnp.float32)
            for _ in range(n_gr)
        )
        + (jax.ShapeDtypeStruct((B, n_hands, H * W), jnp.float32),),
        interpret=interpret,
    )(minv9, words, srcA)
    group_imgs = jnp.stack(
        [o.reshape(B, C - 1, H, W) for o in outs[:-1]], axis=1
    )  # [B, n_gr, C-1, H, W]
    hands = outs[-1].reshape(B, n_hands, H, W)[:, : len(hand_parts)]
    return group_imgs, hands


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_hw", "border", "rows_per_tile", "interpret", "planar", "planar_in"
    ),
)
def warp_parts_pallas(
    src: jnp.ndarray,  # [N, Hs, Ws, C] patches ([N, C, Hs, Ws] if planar_in)
    M_fwd: jnp.ndarray,  # [N, 3, 3] patch->dst (cv2 warpPerspective convention)
    out_hw: tuple[int, int],
    border: str = "constant",
    valid: jnp.ndarray | None = None,  # [N] bool; invalid -> all-zero output
    rows_per_tile: int = 16,
    interpret: bool = False,  # run the kernel in interpret mode (CPU CI)
    planar: bool = False,  # return [N, C, H, W] (the kernel-native layout;
    # skips the NHWC relayout copy — 1.4 ms/batch-16 when consumers can
    # composite planar)
    planar_in: bool = False,  # src arrives [N, C, Hs, Ws] (e.g. straight from
    # the planar-emitting norm kernels) — skips the input relayout too
) -> jnp.ndarray:
    """Batched perspective warp, NHWC in -> NHWC out, matching
    vmap(warp_perspective)(src, M_fwd) with constant/replicate borders.

    Requires the out width to be a power of two (true for every routing
    frame: the reference pads 256x192->256x256 and 512x320 images warp in
    the padded 512/256-wide frames)."""
    if planar_in:
        N, C, Hs, Ws = src.shape
    else:
        N, Hs, Ws, C = src.shape
    H, W = out_hw
    assert W & (W - 1) == 0, f"out width {W} must be a power of two"
    P = rows_per_tile * W
    assert (H * W) % P == 0
    log2_w = W.bit_length() - 1
    n_tiles = (H * W) // P

    Minv = inv3x3(M_fwd)
    minv9 = Minv.reshape(N, 9)
    if valid is None:
        valid_b = jnp.ones((N,), bool)
    else:
        valid_b = valid.astype(bool)
    if border == "replicate":
        # replicate clamps samples into range, so EVERY dst pixel has valid
        # content — support-quad skipping only applies to the constant-zero
        # border (outside the quad all hat weights vanish)
        flags = jnp.broadcast_to(valid_b.astype(jnp.int32)[:, None], (N, n_tiles))
    else:
        flags = _support_row_flags_v(
            M_fwd.astype(jnp.float32), valid_b, Hs, Ws, H, n_tiles, rows_per_tile
        )
    flags = _pack_bits(flags)  # [N, ceil(n_tiles/32)] SMEM bitmask words
    # keep the tiny per-part setup (inverse, corner projection) out of the
    # kernel's consumers — XLA otherwise re-evaluates it per fusion tile
    minv9, flags = jax.lax.optimization_barrier((minv9, flags))

    # channel-major [C*Hs, Ws], zero-padded on K to make the y-hat rows inert
    srcA = src.astype(jnp.float32)
    if not planar_in:
        srcA = jnp.transpose(srcA, (0, 3, 1, 2))
    srcA = srcA.reshape(N, C * Hs, Ws)
    srcA = jnp.pad(srcA, ((0, 0), (0, 0), (0, Hs)))

    kernel = functools.partial(
        _warp_kernel, Hs=Hs, Ws=Ws, W=W, log2_w=log2_w, C=C, P=P, border=border
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # minv9 [N,9] + flags [N,n_tiles] in SMEM
        grid=(N, n_tiles),
        in_specs=[
            pl.BlockSpec((1, C * Hs, Ws + Hs), lambda i, t, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, P), lambda i, t, *_: (i, 0, t)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, C, H * W), jnp.float32),
        interpret=interpret,
    )(minv9, flags, srcA)
    out = out.reshape(N, C, H, W)
    return out if planar else jnp.transpose(out, (0, 2, 3, 1))

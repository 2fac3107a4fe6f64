"""Pallas TPU kernels for the hot upfirdn2d cases: 2x up / 2x down, 4-tap FIR.

The StyleGAN2 resampling primitive runs dozens of times per forward (every
up-conv's pre-FIR, every skip-img upsample, every D downsample, the ADA
geometric pipe).  The general path (ops/upfirdn2d.py) is a depthwise
`conv_general_dilated`; these kernels exploit the polyphase structure of the
2x/4-tap case so each output pixel reads exactly the 2 (up) or 4 (down)
contributing input pixels per axis — one HBM read of x, one write of y,
nothing materialized at intermediate resolution.  Row halos are handled with
manual HBM->VMEM DMAs (the pallas_guide double-buffer pattern, simplified to
single-buffer since the grid already overlaps tiles across programs).

Math (separable, per axis, filter [1,3,3,1]):
  up2   (pad (2,1), gain 2/axis):  y[2u]   = 0.25 x[u-1] + 0.75 x[u]
                                   y[2u+1] = 0.75 x[u] + 0.25 x[u+1]
  down2 (pad (1,1), gain 1):       y[u] = (x[2u-1] + 3 x[2u] + 3 x[2u+1] + x[2u+2]) / 8
with zero padding outside the image — exactly `upsample2d(x, setup_filter([1,3,3,1]))`
and `downsample2d(...)` / the conv2d_resample up/down FIR pre/post passes.

Layout: NHWC; channels stay in lanes.

STATUS (v5e measurement, batch 16 x 128^2 x 128ch bf16, chained-op timing):
XLA's depthwise-conv lowering runs the up+down pair at ~1.1 ms/op; this
single-buffered kernel at ~4.4 ms/op — the DMA is not yet pipelined and the
in-kernel interleave materializes large stack temporaries.  The XLA path
therefore remains the production default; these kernels are kept as the
parity-tested starting point for a double-buffered revision.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The canonical StyleGAN2 resampling filter, pre-normalization.
CANONICAL_TAPS = (1.0, 3.0, 3.0, 1.0)


def is_canonical_filter(f) -> bool:
    if f is None:
        return False
    f = np.asarray(f)
    t = np.asarray(CANONICAL_TAPS)
    t = t / t.sum()
    if f.ndim == 1:
        return f.shape == (4,) and np.allclose(f, t)
    if f.ndim == 2:
        return f.shape == (4, 4) and np.allclose(f, np.outer(t, t), atol=1e-7)
    return False


# ------------------------------------------------------------------ up 2x


def _up2_kernel(x_hbm, o_hbm, scratch, out_scratch, sem_in, sem_out, *, th, w_used):
    n = pl.program_id(0)
    h = pl.program_id(1)

    # rows h*th .. h*th + th+1 of the (row+1 padded) input == x[u-1 .. u+th]
    in_dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(h * th, th + 2)], scratch, sem_in
    )
    in_dma.start()
    in_dma.wait()

    xb = scratch[:]  # [th+2, Wp, C] (cols pre-padded by 1 each side + alignment)
    W2 = w_used  # = W + 2 logical columns; the rest is alignment padding
    xm = xb[0:th]
    xc = xb[1 : th + 1]
    xp1 = xb[2 : th + 2]
    ve = 0.25 * xm + 0.75 * xc
    vo = 0.75 * xc + 0.25 * xp1
    v = jnp.stack([ve, vo], axis=1).reshape(2 * th, xb.shape[1], xb.shape[2])

    w = (W2 - 2)
    he = 0.25 * v[:, 0:w] + 0.75 * v[:, 1 : w + 1]
    ho = 0.75 * v[:, 1 : w + 1] + 0.25 * v[:, 2 : w + 2]
    out = jnp.stack([he, ho], axis=2).reshape(2 * th, 2 * w, v.shape[2])
    out_scratch[:] = out.astype(out_scratch.dtype)

    out_dma = pltpu.make_async_copy(
        out_scratch, o_hbm.at[n, pl.ds(h * 2 * th, 2 * th)], sem_out
    )
    out_dma.start()
    out_dma.wait()


def _pick_tile(H, W, C, itemsize, budget_bytes=4 << 20, tile_h=16):
    """Tile height whose in-kernel temporaries stay well under the ~16MB
    scoped-VMEM limit (Mosaic stack-allocates every intermediate)."""
    row_bytes = (W + 8) * C * itemsize
    th = max(1, min(tile_h, budget_bytes // max(row_bytes * 8, 1)))
    while H % th:
        th -= 1
    return th


@partial(jax.jit, static_argnames=("tile_h", "interpret"))
def upsample2x_pallas(x: jax.Array, tile_h: int = 16, interpret: bool = False) -> jax.Array:
    """== upsample2d(x, setup_filter([1,3,3,1])) for NHWC x; output [N,2H,2W,C]."""
    N, H, W, C = x.shape
    th = _pick_tile(H, W, C, x.dtype.itemsize, tile_h=tile_h)
    # Mosaic DMA slices need the sublane (second-to-last) dim aligned to 8:
    # pad columns to W+2 rounded up.
    Wp = -(-(W + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))
    import functools

    kernel = functools.partial(_up2_kernel, th=th, w_used=W + 2)
    return pl.pallas_call(
        kernel,
        grid=(N, H // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, 2 * H, 2 * W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, Wp, C), x.dtype),
            pltpu.VMEM((2 * th, 2 * W, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp)


# ------------------------------------------------------------------ down 2x


def _down2_kernel(x_hbm, o_hbm, scratch, out_scratch, sem_in, sem_out, *, th, w_used):
    n = pl.program_id(0)
    h = pl.program_id(1)

    # rows 2*(h*th) .. +2th+2 of the (row+1 padded) input == x[2u-1 .. 2u+2th+1]
    in_dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(h * 2 * th, 2 * th + 3)], scratch, sem_in
    )
    in_dma.start()
    in_dma.wait()

    xb = scratch[:]  # [2th+3, Wp, C] (logical cols: w_used = W+3)
    Wp, C = xb.shape[1], xb.shape[2]
    # strided slices lower to >2D gathers (unsupported in Mosaic); deinterleave
    # via reshape pairs instead.
    a = xb[0 : 2 * th].reshape(th, 2, Wp, C)
    b = xb[2 : 2 * th + 2].reshape(th, 2, Wp, C)
    r0, r1 = a[:, 0], a[:, 1]  # x[2u-1], x[2u]
    r2, r3 = b[:, 0], b[:, 1]  # x[2u+1], x[2u+2]
    v = 0.125 * r0 + 0.375 * r1 + 0.375 * r2 + 0.125 * r3  # [th, Wp, C]

    w = (w_used - 3) // 2  # logical output width
    wop = out_scratch.shape[1]
    va = v[:, 0 : 2 * w].reshape(th, w, 2, C)
    vb = v[:, 2 : 2 * w + 2].reshape(th, w, 2, C)
    res = 0.125 * va[:, :, 0] + 0.375 * va[:, :, 1] + 0.375 * vb[:, :, 0] + 0.125 * vb[:, :, 1]
    if wop != w:
        res = jnp.pad(res, ((0, 0), (0, wop - w), (0, 0)))
    out_scratch[:] = res.astype(out_scratch.dtype)

    out_dma = pltpu.make_async_copy(
        out_scratch, o_hbm.at[n, pl.ds(h * th, th)], sem_out
    )
    out_dma.start()
    out_dma.wait()


@partial(jax.jit, static_argnames=("tile_h", "interpret"))
def downsample2x_pallas(x: jax.Array, tile_h: int = 16, interpret: bool = False) -> jax.Array:
    """== downsample2d(x, setup_filter([1,3,3,1])) for NHWC x; output [N,H/2,W/2,C]."""
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0
    Ho, Wo = H // 2, W // 2
    th = _pick_tile(Ho, W, C, x.dtype.itemsize, tile_h=tile_h)
    # rows: top 1 (x[-1]) and bottom 2 (x[H], x[H+1]); cols 1 + 2, with the
    # sublane (second-to-last) dim padded to a multiple of 8 for Mosaic DMA.
    Wp = -(-(W + 3) // 8) * 8
    Wop = -(-Wo // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, Wp - W - 1), (0, 0)))
    import functools

    kernel = functools.partial(_down2_kernel, th=th, w_used=W + 3)
    out = pl.pallas_call(
        kernel,
        grid=(N, Ho // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wop, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * th + 3, Wp, C), x.dtype),
            pltpu.VMEM((th, Wop, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp)
    return out[:, :, :Wo]

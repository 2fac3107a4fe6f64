"""upfirdn2d: pad -> zero-upsample -> FIR filter -> downsample, NHWC, TPU-native.

Counterpart of the reference CUDA kernel pair
(`torch_utils/ops/upfirdn2d.{py,cpp,cu}`).  The reference needs ~500 lines of
templated CUDA (shared-memory tiles, separable two-pass specialization); on
TPU the *entire* operation is a single `lax.conv_general_dilated` call:

    zero-upsampling  == lhs_dilation
    pad / crop       == conv `padding` (negative allowed)
    FIR filter       == depthwise kernel (feature_group_count = C)
    downsampling     == window_strides

XLA lowers that to fused VPU code with the right HBM tiling, so the kernel
cache keyed on (up, down, pad, flip) from the reference (`upfirdn2d.py:212-225`)
becomes the XLA compilation cache.  Separable filters are run as two 1-D
passes just like the reference kernel's two-pass mode.

Semantics match `_upfirdn2d_ref` (`upfirdn2d.py:169-208`) exactly, including
`flip_filter` (False = convolution => the filter is flipped before the
correlation that conv_general_dilated performs) and the `gain ** (ndim/2)`
scaling convention of `setup_filter` (`upfirdn2d.py:72-116`).

All public helpers (`setup_filter`, `upfirdn2d`, `filter2d`, `upsample2d`,
`downsample2d`) keep the reference call signatures, but operate on NHWC.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Scaling = Union[int, Sequence[int]]
Padding = Union[int, Sequence[int]]


def _parse_scaling(scaling: Scaling) -> tuple[int, int]:
    if isinstance(scaling, (int, np.integer)):
        scaling = [int(scaling), int(scaling)]
    sx, sy = (int(s) for s in scaling)
    if sx < 1 or sy < 1:
        raise ValueError(f"scaling factors must be >= 1, got {(sx, sy)}")
    return sx, sy


def _parse_padding(padding: Padding) -> tuple[int, int, int, int]:
    if isinstance(padding, (int, np.integer)):
        padding = [int(padding), int(padding)]
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _get_filter_size(f: Optional[jax.Array]) -> tuple[int, int]:
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[-1]), int(f.shape[0])  # (fw, fh)


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> jax.Array:
    """Prepare a FIR filter for `upfirdn2d` (reference: `upfirdn2d.py:72-116`).

    Returns float32 `[fh, fw]` (non-separable) or `[taps]` (separable).
    """
    if f is None:
        f = 1
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 0:
        f = f[jnp.newaxis]
    assert f.ndim in (1, 2) and f.size > 0

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _depthwise_fir(
    x: jax.Array,
    f: jax.Array,
    up: tuple[int, int],
    down: tuple[int, int],
    padding: tuple[int, int, int, int],
    flip_filter: bool,
) -> jax.Array:
    """One fused conv_general_dilated implementing up/pad/FIR/down over NHWC."""
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    # Zero-insertion semantics: `up-1` zeros AFTER each pixel (upsampled size is
    # in*up), whereas lhs_dilation yields (in-1)*up+1 — add the trailing zeros
    # to the padding.
    px1 += upx - 1
    py1 += upy - 1
    num_channels = x.shape[-1]

    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    # Depthwise kernel in HWIO with I=1, O=C, feature_group_count=C.
    if f.ndim == 1:
        raise ValueError("_depthwise_fir expects a 2D filter")
    kern = jnp.tile(f.astype(x.dtype)[:, :, None, None], (1, 1, 1, num_channels))

    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(downy, downx),
        padding=((py0, py1), (px0, px1)),
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=num_channels,
    )


@partial(jax.jit, static_argnames=("up", "down", "padding", "flip_filter", "gain"))
def _upfirdn2d_impl(x, f, *, up, down, padding, flip_filter, gain):
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding

    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)

    if f.ndim == 2:
        fscaled = f * (gain ** (f.ndim / 2)) if gain != 1 else f
        return _depthwise_fir(x, fscaled, up, down, padding, flip_filter)

    # Separable: two 1-D passes (vertical with up/pad-y, then horizontal),
    # mirroring the reference's separable decomposition (`upfirdn2d.py:198-204`).
    g = gain ** 0.5
    fy = (f * g)[:, None]
    fx = (f * g)[None, :]
    x = _depthwise_fir(x, fy, (1, upy), (1, downy), (0, 0, py0, py1), flip_filter)
    x = _depthwise_fir(x, fx, (upx, 1), (downx, 1), (px0, px1, 0, 0), flip_filter)
    return x


def upfirdn2d(
    x: jax.Array,
    f: Optional[jax.Array],
    up: Scaling = 1,
    down: Scaling = 1,
    padding: Padding = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
    impl: str = "xla",
) -> jax.Array:
    """Pad, upsample, FIR-filter, and downsample a batch of NHWC images.

    Same contract as the reference `upfirdn2d()` (`upfirdn2d.py:120-164`) with
    NHWC layout.  `impl` is accepted for API parity; 'xla' and 'ref' both run
    the fused lax path (there is no slow path to fall back to on TPU).
    """
    assert x.ndim == 4, f"expected NHWC, got shape {x.shape}"
    assert impl in ("xla", "ref", "cuda")
    up = _parse_scaling(up)
    down = _parse_scaling(down)
    padding = _parse_padding(padding)
    return _upfirdn2d_impl(
        x, f, up=up, down=down, padding=padding, flip_filter=flip_filter, gain=float(gain)
    )


def filter2d(x, f, padding: Padding = 0, flip_filter=False, gain=1.0, impl="xla"):
    """Same-size FIR filtering (reference: `upfirdn2d.py:272-304`)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = (px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2)
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain, impl=impl)


def upsample2d(x, f, up: Scaling = 2, padding: Padding = 0, flip_filter=False, gain=1.0, impl="xla"):
    """FIR upsampling (reference: `upfirdn2d.py:308-343`)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = (
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy, impl=impl)


def downsample2d(x, f, down: Scaling = 2, padding: Padding = 0, flip_filter=False, gain=1.0, impl="xla"):
    """FIR downsampling (reference: `upfirdn2d.py:347-382`)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = (
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain, impl=impl)

"""2D convolution with optional FIR up/downsampling, NHWC, TPU-native.

Counterpart of `torch_utils/ops/conv2d_resample.py:59-154`.  The reference
implements five hand-picked cuDNN fast paths (1x1+down, 1x1+up, strided-down,
transpose-strided-up, plain) plus a generic fallback; under XLA there is no
reason to replicate that decision tree — `lax.conv_general_dilated` already
expresses strided, transposed (via lhs_dilation), and grouped convolution in
one primitive and the TPU backend picks the lowering.  What we keep from the
reference is the *semantics*: padding is computed once w.r.t. the upsampled
grid (`conv2d_resample.py:94-104`), the FIR low-pass runs after an upsampling
conv and before a downsampling conv, and upsampling multiplies signal gain by
`up**2`.

Weight layout is HWIO (`[kh, kw, in_channels // groups, out_channels]`).
`flip_weight=True` means correlation (the lax default); False flips spatially.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import upfirdn2d as _u


def _conv2d(x, w, stride=1, padding=(0, 0, 0, 0), groups=1, flip_weight=True):
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    py0, py1, px0, px1 = padding[2], padding[3], padding[0], padding[1]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((py0, py1), (px0, px1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


@partial(
    jax.jit,
    static_argnames=("up", "down", "padding", "groups", "flip_weight", "flip_filter"),
)
def _conv2d_resample_impl(x, w, f, *, up, down, padding, groups, flip_weight, flip_filter):
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = _u._get_filter_size(f)
    px0, px1, py0, py1 = _u._parse_padding(padding)

    # Padding adjustment w.r.t. up/downsampled grids (conv2d_resample.py:94-104).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1:
        # Zero-insert + FIR + pad in one fused depthwise conv, then the dense conv.
        x = _u.upfirdn2d(
            x, f, up=up, padding=(px0, px1, py0, py1), gain=up**2, flip_filter=flip_filter
        )
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        if down > 1:
            x = _u.upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        # FIR + pad first, then strided dense conv (conv2d_resample.py:118-122).
        x = _u.upfirdn2d(x, f, padding=(px0, px1, py0, py1), flip_filter=flip_filter)
        x = _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)
        return x

    # Plain conv: padding handled natively by XLA (negative padding crops).
    return _conv2d(x, w, padding=(px0, px1, py0, py1), groups=groups, flip_weight=flip_weight)


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """Conv with fused resampling; contract of `conv2d_resample.py:59-154` (NHWC/HWIO)."""
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    padding = _u._parse_padding(padding)
    return _conv2d_resample_impl(
        x,
        w,
        f,
        up=up,
        down=down,
        padding=padding,
        groups=groups,
        flip_weight=flip_weight,
        flip_filter=flip_filter,
    )

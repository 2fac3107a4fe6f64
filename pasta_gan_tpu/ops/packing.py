"""W-packing: fold pairs of adjacent pixel columns into the channel dim.

TPU motivation (measured on v5e, see BASELINE.md round-2 notes): bf16 arrays
tile as (8, 128) with the minor (channel) dim padded to 128 lanes, and the MXU
contracts 128-wide.  A 64-channel activation therefore wastes half of every
HBM line AND half of the systolic array.  The high-resolution tail of the
PASTA-GAN pyramid (256-res blocks, 64 channels at fmaps=0.5 — reference
`networks.py:5736`: `channel_base // res`) runs at ~55 TF/s while the
128-channel interior runs at ~190 TF/s (MXU peak).

Packing [N, H, W, C] -> [N, H, W/2, 2C] makes those ops full-width:

* a same-res 3x3 conv becomes a 3x3 conv over packed pixels whose
  [3, 3, 2C, 2C] kernel is assembled from the original taps by phase algebra
  (output phase b reading original offset dx lands on packed tap
  (b+dx-((b+dx)&1))/2 of input phase (b+dx)&1);
* a 1x1 conv becomes a block-diagonal [1, 1, 2C, 2C'] conv;
* the up=2 modulated conv + FIR low-pass (reference
  `torch_utils/ops/upfirdn2d.py` pipeline) FOLDS into one lhs-dilated conv:
  FIR-after-zero-insertion is depthwise-linear, so conv(w) after upfirdn(f)
  == one conv with kernel w (*) f ([3,3] (*) [4,4] -> [6,6]), and splitting
  the 6 x-taps by output parity emits the packed layout directly — no
  2x-resolution 128-channel intermediate is ever materialized.

All transforms are exact (same math, different summation order); parity is
enforced by tests/test_packing.py against the unpacked path.

Measured effect at the b256 shapes (batch 16, bf16): 3x3 64ch conv 1.394 ms ->
0.794 ms packed; merge concat+1x1 2.44 ms -> 0.79 ms packed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _materialize(w: jax.Array) -> jax.Array:
    """Force assembled weights to materialize as a standalone tensor.

    The .at[].set() assembly chains below otherwise fuse INTO the consuming
    conv fusion and are re-evaluated per output tile (measured: a packed
    3x3 conv at [32,256,128,128] ran 4.2 ms vs 1.6 ms with prebuilt
    weights).  An optimization barrier keeps the (tiny) assembly separate."""
    return jax.lax.optimization_barrier(w)


def pack_w(x: jax.Array) -> jax.Array:
    """[N, H, W, C] -> [N, H, W//2, 2C] (pure reshape; adjacent columns)."""
    N, H, W, C = x.shape
    assert W % 2 == 0, x.shape
    return x.reshape(N, H, W // 2, 2 * C)


def unpack_w(x: jax.Array) -> jax.Array:
    """[N, H, Wp, 2C] -> [N, H, 2*Wp, C]."""
    N, H, Wp, C2 = x.shape
    assert C2 % 2 == 0, x.shape
    return x.reshape(N, H, Wp * 2, C2 // 2)


def pack_conv_weights(w: jax.Array) -> jax.Array:
    """[kh, kw, I, O] (kw odd) -> [kh, kw, 2I, 2O] packed-domain kernel.

    Output phase b at packed column X is original column u = 2X + b; original
    tap dx reads column u + dx = 2(X + t) + a with a = (b+dx) mod 2,
    t = (b+dx-a)/2 — i.e. packed tap t of input phase a.
    """
    kh, kw, I, O = w.shape
    assert kw % 2 == 1
    r = kw // 2
    wp = jnp.zeros((kh, kw, 2 * I, 2 * O), w.dtype)
    for b in (0, 1):
        for dx in range(-r, r + 1):
            s = b + dx
            a = s % 2
            t = (s - a) // 2
            assert -r <= t <= r, (kw, b, dx)
            wp = wp.at[:, t + r, a * I : (a + 1) * I, b * O : (b + 1) * O].set(
                w[:, dx + r]
            )
    return _materialize(wp)


def fold_up_weights(w: jax.Array, f: jax.Array, gain: float = 4.0) -> jax.Array:
    """Fold the post-conv FIR of the up=2 path into the conv kernel.

    `w`: [3, 3, I, O] applied with flip_weight=False (true convolution);
    `f`: [4, 4] FIR applied by upfirdn with flip_filter=False and gain=up**2.
    Returns G = flip(w) * gain*flip(f) (full 2-D convolution) -> [6, 6, I, O],
    the correlation kernel of the fused operation.
    """
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fh, fw = int(f.shape[0]), int(f.shape[1])
    # fold in fp32 regardless of compute dtype (tap products stay exact-ish)
    Wf = jnp.flip(w, axis=(0, 1)).astype(jnp.float32)
    Ff = jnp.flip(f, axis=(0, 1)).astype(jnp.float32) * jnp.float32(gain)
    G = jnp.zeros((kh + fh - 1, kw + fw - 1) + w.shape[2:], jnp.float32)
    for p in range(kh):
        for q in range(kw):
            G = G.at[p : p + fh, q : q + fw].add(Ff[:, :, None, None] * Wf[p, q])
    return _materialize(G)


def phase_split_up(G: jax.Array) -> jax.Array:
    """[6, 6, I, O] folded up-kernel -> [6, 3, I, 2O] packed-output form.

    With lhs_dilation=(2,1) and x-padding (1,1), output phase b=0 uses the odd
    x-taps {1,3,5} and b=1 the even taps {0,2,4} (validated numerically vs the
    upfirdn reference path)."""
    kh, kw, I, O = G.shape
    assert kw == 6, G.shape
    Gp = jnp.zeros((kh, 3, I, 2 * O), G.dtype)
    for b in (0, 1):
        for t in range(3):
            k = 2 * t + 1 if b == 0 else 2 * t
            Gp = Gp.at[:, t, :, b * O : (b + 1) * O].set(G[:, k])
    return _materialize(Gp)


def pack_vector(v: jax.Array) -> jax.Array:
    """Per-channel vector [C] (bias, demod coefs along last axis) -> [2C]."""
    return jnp.concatenate([v, v], axis=-1)


def pack_conv1_weights_grouped(w: jax.Array, group_sizes) -> jax.Array:
    """1x1 packed weights for a PLAIN concat of separately-packed tensors.

    Input layout [g0_p0, g0_p1, g1_p0, g1_p1, ...] (concat of pack_w outputs)
    instead of the phase-interleaved layout pack_conv_weights expects —
    avoids the 5-D channel shuffle (measured ~3 ms of relayout copies at the
    b256 merge).  w: [1, 1, sum(group_sizes), O] -> [1, 1, 2*sum, 2O]."""
    _, _, I, O = w.shape
    assert sum(group_sizes) == I, (group_sizes, I)
    wp = jnp.zeros((1, 1, 2 * I, 2 * O), w.dtype)
    off = 0
    for s in group_sizes:
        for b in (0, 1):
            wp = wp.at[:, :, 2 * off + b * s : 2 * off + (b + 1) * s,
                       b * O : (b + 1) * O].set(w[:, :, off : off + s])
        off += s
    return _materialize(wp)


def conv_packed_out_stride(x, w: jax.Array,
                           quant: Optional[str] = None,
                           act_scale=None, out_dtype=None) -> jax.Array:
    """Same-res conv from UNPACKED input emitting PACKED output.

    Implemented as a stride-(1,2) conv with x-kernel k+1 (output phase b at
    packed col X reads input cols 2X+b+dx): kernel[ky, b+dx+r, :, b-block] =
    w[ky, dx+r].  x: [N, H, W, I]; w: [kh, kw, I, O] (kw odd) ->
    [N, H, W/2, 2O]."""
    kh, kw, I, O = (int(s) for s in w.shape)
    r = kw // 2
    wp = jnp.zeros((kh, kw + 1, I, 2 * O), w.dtype)
    for b in (0, 1):
        wp = wp.at[:, b : b + kw, :, b * O : (b + 1) * O].set(w)
    wp = _materialize(wp)
    if quant is not None:
        from .quant import int8_conv_like

        return int8_conv_like(
            x, wp, window_strides=(1, 2),
            padding_hw=((kh // 2, kh // 2), (r, r + 1)), out_dtype=(out_dtype or x.dtype),
            act_scale=act_scale,
        )
    return jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 2), ((kh // 2, kh // 2), (r, r + 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_packed_in_down2(x, w: jax.Array, f: jax.Array,
                         flip_weight: bool = True,
                         quant: Optional[str] = None,
                         act_scale=None, out_dtype=None) -> jax.Array:
    """FIR low-pass + stride-2 conv consuming PACKED input, UNPACKED output.

    Folds the reference down path (conv2d_resample down=2: upfirdn(f, pad
    px0=k//2+(fw-1)//2, px1=k//2+(fw-2)//2) then valid stride-2 conv) into
    one kernel G = conv_full(w_eff, f_eff) of size K = k+fw-1:
        y[v] = sum_s G[s] * x_unpacked[2v + s - px0]
    and phase-splits s over the packed input (col 2(v+t)+a):
        a = (s-px0) mod 2,  t = (s-px0-a)/2.
    x: [N, H, Wp, 2I]; w: [k, k, I, O]; f: [fh, fw] -> [N, H/2, Wp, O]
    (output width Wp == W/2: the downsampled, unpacked width).
    """
    kh, kw, I, O = (int(s) for s in w.shape)
    fh, fw = int(f.shape[0]), int(f.shape[1])
    Weff = (w if flip_weight else jnp.flip(w, axis=(0, 1))).astype(jnp.float32)
    Ff = jnp.flip(f, axis=(0, 1)).astype(jnp.float32)  # flip_filter=False
    Kx = kw + fw - 1
    Ky = kh + fh - 1
    G = jnp.zeros((Ky, Kx, I, O), jnp.float32)
    for p in range(kh):
        for q in range(kw):
            G = G.at[p : p + fh, q : q + fw].add(Ff[:, :, None, None] * Weff[p, q])
    px0 = kw // 2 + (fw - 1) // 2
    px1 = kw // 2 + (fw - 2) // 2
    py0 = kh // 2 + (fh - 1) // 2
    py1 = kh // 2 + (fh - 2) // 2
    ts = sorted({(s - px0 - ((s - px0) % 2)) // 2 for s in range(Kx)})
    Kt = ts[-1] - ts[0] + 1
    Gp = jnp.zeros((Ky, Kt, 2 * I, O), jnp.float32)
    for s in range(Kx):
        a = (s - px0) % 2
        t = (s - px0 - a) // 2
        Gp = Gp.at[:, t - ts[0], a * I : (a + 1) * I, :].add(G[:, s])
    Gp = _materialize(Gp)
    if quant is not None:
        from .quant import int8_conv_like

        return int8_conv_like(
            x, Gp, window_strides=(2, 1),
            padding_hw=((py0, py1), (-ts[0], Kt - 1 + ts[0])), out_dtype=(out_dtype or x.dtype),
            act_scale=act_scale,
        )
    return jax.lax.conv_general_dilated(
        x, Gp.astype(x.dtype), (2, 1), ((py0, py1), (-ts[0], Kt - 1 + ts[0])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_packed_same(x, w: jax.Array,
                     quant: Optional[str] = None,
                     act_scale=None, out_dtype=None) -> jax.Array:
    """Same-resolution conv in the packed domain.

    x: [N, H, Wp, 2I]; w: [kh, kw, I, O] UNPACKED weights (kw odd).
    Returns [N, H, Wp, 2O]."""
    kh, kw = int(w.shape[0]), int(w.shape[1])
    wp = pack_conv_weights(w)
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    if quant is not None:
        from .quant import int8_conv_like

        return int8_conv_like(x, wp, padding_hw=pad, out_dtype=(out_dtype or x.dtype),
                              act_scale=act_scale)
    return jax.lax.conv_general_dilated(
        x,
        wp.astype(x.dtype),
        (1, 1),
        pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_packed_up2(x, w: jax.Array, f: jax.Array,
                    quant: Optional[str] = None,
                    act_scale=None, out_dtype=None) -> jax.Array:
    """The up=2 modulated-conv resample path, emitting packed output.

    x: [N, H, W, I] UNPACKED input; w: [3, 3, I, O] (flip_weight=False
    convention of the up path); f: [4, 4] FIR (setup_filter output).
    Returns [N, 2H, W, 2O] == pack_w of conv2d_resample(x, w, f, up=2,
    padding=1, flip_weight=False)."""
    G = fold_up_weights(w, f, gain=4.0)
    Gp = phase_split_up(G)
    if quant is not None:
        from .quant import int8_conv_like

        return int8_conv_like(
            x, Gp, padding_hw=((3, 3), (1, 1)), lhs_dilation=(2, 1),
            out_dtype=(out_dtype or x.dtype), act_scale=act_scale,
        )
    return jax.lax.conv_general_dilated(
        x,
        Gp.astype(x.dtype),
        (1, 1),
        ((3, 3), (1, 1)),
        lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

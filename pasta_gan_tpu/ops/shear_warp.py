"""Two-pass affine resampling — the ADA pipe's fast warp mode.

The reference executes the composed ADA geometric transform as one bilinear
grid-sample over a 2x supersampled grid (`training/augment.py:287-301`).  On
TPU that sampling is gather/scatter ROW-latency bound: ~287k rows per image
forward and the same again (as scatters) in the backward — the dominant cost
of ADA training (BASELINE.md round 2: augment fwd/grad 91/357 ms at batch 8).

An affine warp factorizes into two 1-D resampling passes (Catmull & Smith
two-pass texture mapping): horizontal `sx = f(x, sy)` then vertical
`sy = g(x, y)`, each a 1-D affine resample whose positions share one SLOPE
across lines with only a per-line OFFSET:

    P[line, i] = slope * i + offset[line]

That structure needs only O(H + W) gather rows per pass — a per-line
integer-alignment gather plus three x'-indexed column gathers — with the
fractional interpolation done as dense VPU math, and its autodiff transpose
is scatters of the same tiny row counts.  ~100x fewer gather rows than the
single-pass form, forward and backward.

Semantics vs the single-pass warp:
  * axis-aligned maps (any combination of flips, rot90s, scales, integer or
    fractional translations — the `blit` pipe and most of `bgc`'s draws):
    EXACT — bilinear interpolation is separable, two-pass == one-pass.
  * genuinely rotated/sheared draws: a consistent linear-interp warp whose
    reconstruction kernel differs slightly from one-pass bilinear (measured
    sub-1% mean abs difference on smooth supersampled images).  This is why
    fast mode is OPT-IN (`AugmentPipe(fast_geom=True)`) and the exact path
    remains the default for the reference debug-percentile parity tests.

Conditioning: rotations near 90deg make the vertical pass degenerate
(|a11| -> 0).  A per-sample TRANSPOSE of the source (an exact permutation;
coordinate swap folded into the affine map) keeps
max(|a01|, |a11|) >= 0.707 * min_scale for any rotation angle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resample_lines(img: jnp.ndarray, slope: jnp.ndarray, offsets: jnp.ndarray, n_out: int):
    """1-D affine resample of every row of `img` along axis 1.

    img: [H, W, C]; positions P[y, i] = slope * i + offsets[y] for
    i in [0, n_out); constant-zero border.  Returns [H, n_out, C].

    Index structure: with base_y = floor(offsets[y]) and m0(i) =
    floor(slope*i), the tap column floor(P) = base_y + m0(i) + e with
    e in {0, 1} — so a per-ROW aligned window W_y[j] = row_y[base_y - j_off
    + j] followed by a 0/1 tap-selection MATMUL shared across rows; the
    fractional mix is dense VPU math.  The 3W+2 window covers every
    in-range tap for ANY slope; rows whose base leaves [-W, 2W]
    (far-offset tails, the analogue of the pipe's static-margin clamp)
    are zeroed.

    EVERY index-dependent step here is a 0/1-selection matmul, not a
    gather: XLA lowers a per-row wide-minor dynamic window (whether as
    lax.gather or a Pallas per-row DMA) to ~2.8 us/row serialized slices —
    ~47 ms per instance at ADA scale, the dominant ADA training cost
    (round-3 profile).  Instead the per-row integer shift splits as
    base*C = 128*b_y + r_y and runs as two batched one-hot contractions on
    the MXU: tile selection O[y, T, t] = [T == b_y + t] over 128-lane
    tiles of the UNPADDED source row (out-of-range tiles match nothing —
    the constant-zero border falls out for free, and no 7W-wide padded
    copy is ever materialized), then the sub-tile residual as a Toeplitz
    one-hot P[y, q, l] = [q == l + r_y] contracting lane pairs (t, t+1).
    Values ride as three bf16 slices (hi/mid/lo mantissa split — 0/1
    selection is exact per slice) through O, P, and the tap matmul, and
    reassemble in the f32 accumulator of the final dot.  The autodiff
    transpose of all three stages is again matmuls: the whole resample —
    forward AND backward — is gather/scatter-free.
    """
    H, W, C = img.shape
    dtype = img.dtype
    # keep index math finite for degenerate inputs
    slope = jnp.nan_to_num(slope, nan=0.0, posinf=float(W), neginf=-float(W))
    slope = jnp.clip(slope, -float(W), float(W))
    offsets = jnp.nan_to_num(offsets, nan=3.0 * W, posinf=3.0 * W, neginf=-3.0 * W)

    base = jnp.floor(offsets)  # [H]
    delta = jnp.clip(offsets - base, 0.0, 1.0).astype(dtype)  # [H] in [0, 1)
    row_ok = (base >= -float(W)) & (base <= 2.0 * W)
    base_i = jnp.clip(base, -float(W), 2.0 * W).astype(jnp.int32)

    # Slope-aware window placement: positions advance FROM the offset, so
    # the [3W+2] window sits ahead of base for positive slopes and behind it
    # for negative ones (a negative-slope row with base in (W, 2W] samples
    # valid content on its way left — the rotation-by-~180deg regime).
    j_off = jnp.where(slope >= 0, W + 1, 2 * W).astype(jnp.int32)

    Wg = 3 * W + 2
    starts = (base_i - j_off) * C  # flat channel-major units, may be negative

    L = 128
    WgC = Wg * C
    nt = -(-WgC // L)  # output window tiles
    Tg = nt + 1  # selected source tiles (t and t+1 feed the lane shift)
    Td = -(-(W * C) // L)  # data tiles (unpadded source row)
    flat = img.reshape(H, W * C)
    flatp = jnp.pad(flat, ((0, 0), (0, Td * L - W * C)))

    # hi/mid/lo bf16 mantissa slices at the source; 0/1 selection keeps each
    # slice exactly, so f32 precision survives all three matmuls.
    s_hi = flatp.astype(jnp.bfloat16)
    res1 = (flatp - s_hi.astype(flatp.dtype)).astype(flatp.dtype)
    s_mid = res1.astype(jnp.bfloat16)
    s_lo = (res1 - s_mid.astype(flatp.dtype)).astype(jnp.bfloat16)

    b = starts // L  # [H] floor division (starts may be negative)
    r = starts - b * L  # [H] in [0, L)

    # O[y, T, t] = [T == b[y] + t]: out-of-range b+t matches no tile -> 0
    T_i = jnp.arange(Td, dtype=jnp.int32)[None, :, None]
    t_i = jnp.arange(Tg, dtype=jnp.int32)[None, None, :]
    O = (T_i == b[:, None, None] + t_i).astype(jnp.bfloat16)  # [H, Td, Tg]

    # P[y, q, l] = [q == l + r[y]] (Toeplitz one-hot), q in [0, 2L)
    q_i = jnp.arange(2 * L, dtype=jnp.int32)[None, :, None]
    l_i = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    P = (q_i == l_i + r[:, None, None]).astype(jnp.bfloat16)  # [H, 2L, L]

    def window_slice(tiles_s):
        # tiles_s [H, Td, L] bf16 -> aligned window [H*C, Wg] bf16
        Gt = jax.lax.dot_general(
            O, tiles_s, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16,
        )  # [H, Tg, L] = tiles at b[y]+t
        Gs = jax.lax.dot_general(
            Gt[:, :nt, :], P[:, :L, :], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16,
        ) + jax.lax.dot_general(
            Gt[:, 1:, :], P[:, L:, :], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16,
        )  # [H, nt, L] lane-shifted by r[y]
        win = Gs.reshape(H, nt * L)[:, :WgC].reshape(H, Wg, C)
        return jnp.transpose(win, (0, 2, 1)).reshape(H * C, Wg)

    G_hi = window_slice(s_hi.reshape(H, Td, L))
    G_mid = window_slice(s_mid.reshape(H, Td, L))
    G_lo = window_slice(s_lo.reshape(H, Td, L))

    xi = jnp.arange(n_out, dtype=jnp.float32)
    sxi = slope * xi  # [n_out]
    m0f = jnp.floor(sxi)
    frx = (sxi - m0f).astype(dtype)  # [n_out] in [0, 1)
    m0 = m0f.astype(jnp.int32)

    wcol = jnp.arange(Wg, dtype=jnp.int32)[None, :, None]  # [1, Wg, 1]
    taps = (m0[None, None, :] + j_off) + jnp.asarray([0, 1, 2], jnp.int32)[:, None, None]
    # S[k, w, i] = [w == m0(i) + k + W + 1]; out-of-window taps match no w
    # and read as exact zeros (constant border preserved).
    S = (wcol == taps).astype(jnp.bfloat16)  # [3, Wg, n_out]; 0/1 is bf16-exact
    S2 = jnp.transpose(S, (1, 0, 2)).reshape(Wg, 3 * n_out)

    def d(a):
        return jax.lax.dot_general(
            a, S2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    CC = (d(G_hi) + d(G_mid) + d(G_lo)).reshape(H, C, 3, n_out)
    CC = jnp.transpose(CC, (2, 0, 3, 1))  # [3, H, n_out, C]
    C0, C1, C2 = CC[0], CC[1], CC[2]

    fr0 = frx[None, :] + delta[:, None]  # [H, n_out] in [0, 2)
    e1 = (fr0 >= 1.0)[..., None]
    fr = jnp.where(e1[..., 0], fr0 - 1.0, fr0)[..., None].astype(dtype)
    lo = jnp.where(e1, C1, C0)
    hi = jnp.where(e1, C2, C1)
    out = lo * (1.0 - fr) + hi * fr
    return out * row_ok[:, None, None].astype(dtype)


def affine_resample_two_pass(
    img: jnp.ndarray,  # [H, W, C] (square)
    A: jnp.ndarray,  # [2, 3] dst pixel -> src pixel affine map
    out_hw: tuple[int, int],
) -> jnp.ndarray:
    """out[y, x] = img(A @ (x, y, 1)) via two 1-D passes (module docstring).
    Constant-zero border, matching warp_perspective_inv(..., "constant")."""
    H, W, C = img.shape
    assert H == W, "two-pass rot90 factoring assumes square sources"
    Ho, Wo = out_hw

    # Conditioning: pass 2 needs |a11| large.  For a rotation-dominated map,
    # max(|a01|, |a11|) >= 0.707 * sigma_min always, so a TRANSPOSE of the
    # source (coordinate swap; an exact permutation) is the only factoring
    # needed — no rot90 stack (a 4-variant stack + dynamic take measured
    # ~31 ms/batch of pure relayout traffic).
    A3 = jnp.concatenate([A, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    SW = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    A_t = SW @ A3  # map into transposed-source coordinates
    use_t = jnp.abs(A_t[1, 1]) > jnp.abs(A3[1, 1])
    Ak = jnp.where(use_t, A_t, A3)
    src = jnp.where(use_t, jnp.transpose(img, (1, 0, 2)), img)

    a00, a01, a02 = Ak[0, 0], Ak[0, 1], Ak[0, 2]
    a10, a11, a12 = Ak[1, 0], Ak[1, 1], Ak[1, 2]
    safe_a11 = jnp.where(jnp.abs(a11) < 1e-6, 1e-6, a11)

    # pass 1 (horizontal over src rows): f(x, Y) = alpha*x + beta*Y + gamma
    beta = a01 / safe_a11
    alpha = a00 - beta * a10
    gamma = a02 - beta * a12
    rows_y = jnp.arange(H, dtype=jnp.float32)
    I1 = _resample_lines(src, alpha, beta * rows_y + gamma, Wo)  # [H, Wo, C]

    # pass 2 (vertical over I1 columns): g(x, y) = a11*y + (a10*x + a12)
    cols_x = jnp.arange(Wo, dtype=jnp.float32)
    I1t = jnp.transpose(I1, (1, 0, 2))  # [Wo, H, C]
    out_t = _resample_lines(I1t, a11, a10 * cols_x + a12, Ho)  # [Wo, Ho, C]
    return jnp.transpose(out_t, (1, 0, 2))


affine_resample_two_pass_batch = jax.vmap(
    affine_resample_two_pass, in_axes=(0, 0, None)
)

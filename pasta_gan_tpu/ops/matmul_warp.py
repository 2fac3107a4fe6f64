"""Perspective warps as MXU matmuls (the TPU-native answer to gather warps).

Counterpart of the reference's `cv2.warpPerspective` calls in
`training/dataset.py:873-927` — but expressed as dense contractions instead
of bilinear gathers.  Rationale (measured, BASELINE.md round 2): TPU gathers
cost ~20-40 ns per gather ROW regardless of payload, so a full-res warp from
a small source patch (the denorm re-projection: 64x64 patch -> 256x256
frame) is latency-bound at ~1M rows/batch — 14 such warps were 300 of the
330 ms routing cost.  For a small source, the same bilinear sample is exact
as two hat-function contractions that run on the MXU at compute speed:

    out[p, ch] = sum_r hat(sy[p] - r) * sum_c hat(sx[p] - c) * src[r, c, ch]

with hat(t) = max(0, 1 - |t|) — nonzero only at floor/ceil of the sample
coordinate, so the contraction IS bilinear interpolation, including
`BORDER_CONSTANT(0)` semantics for free (out-of-range taps simply never
enter the sum).  `BORDER_REPLICATE` == clamping the coordinates first.

Cost: O(P_out * W_src * H_src * C) MACs — use only when the source is small
(patches); for large sources the gather path in data/warp.py stays cheaper.

The backward (via plain JAX AD of the matmuls) is also matmuls — no
scatters at all, unlike the gather path whose adjoint needs the plane-
scatter workaround (data/warp.py:118-178).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# bf16x3 ("high") keeps the hat-weight products to ~1e-6 relative error —
# far inside the routing parity tolerances AND the ==255 mask-saturation
# margin (0.5/255 ~ 2e-3); plain bf16 (~4e-3) is NOT safe for the
# saturation test.  HIGHEST costs 2x more MXU passes for nothing here.
DEFAULT_PRECISION = jax.lax.Precision.HIGH


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det), [..., 3, 3].

    jnp.linalg.inv lowers every batch of tiny matrices to LU + two
    triangular-solve LAPACK-style custom calls whose fixed dispatch cost
    (~0.9 ms/batch-16 across the routing program's 5 inversion sites,
    BASELINE.md round 4) dwarfs the arithmetic.  The adjugate form is pure
    elementwise math that fuses into the surrounding setup for free, and
    for well-conditioned homographies (the only matrices routed here) it is
    as accurate as LU (~1e-7 relative; tests/test_matmul_warp.py).
    Singular input produces inf/nan exactly like jnp.linalg.inv — callers
    already squash non-finite coordinates for degenerate parts."""
    M = M.astype(jnp.float32)
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def warp_coords(Minv: jnp.ndarray, out_hw: tuple[int, int]):
    """Source-sample coordinates for a dst->src homography.

    Identical math to data/warp.py:warp_perspective_inv so the matmul and
    gather paths agree bit-for-bit on (sx, sy)."""
    h, w = out_hw
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    denom = Minv[2, 0] * gx + Minv[2, 1] * gy + Minv[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    sx = (Minv[0, 0] * gx + Minv[0, 1] * gy + Minv[0, 2]) / denom
    sy = (Minv[1, 0] * gx + Minv[1, 1] * gy + Minv[1, 2]) / denom
    return sx, sy


def _hat(coords: jnp.ndarray, n: int) -> jnp.ndarray:
    """[P] coords -> [P, n] bilinear hat weights max(0, 1 - |s - i|)."""
    idx = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - idx[None, :]))


def warp_perspective_inv_matmul(
    img: jnp.ndarray,  # [Hs, Ws, C] float
    Minv: jnp.ndarray,  # [3, 3] mapping dst pixel -> src pixel directly
    out_hw: tuple[int, int],
    border: str = "constant",
    precision=DEFAULT_PRECISION,
) -> jnp.ndarray:
    """Bilinear perspective warp as two hat-matrix contractions (see module
    docstring).  Semantics match data/warp.py:warp_perspective_inv exactly
    (same coords, same border behavior) up to matmul rounding."""
    Hs, Ws, C = img.shape
    sx, sy = warp_coords(Minv, out_hw)
    sx = sx.reshape(-1)
    sy = sy.reshape(-1)
    if border == "replicate":
        # nan_to_num first: invalid-part DLT matrices are singular and their
        # inverse yields nan coords; clip alone would propagate the nan into
        # the hats (the gather path is nan-safe via its int cast + CLIP mode)
        sx = jnp.clip(jnp.nan_to_num(sx, nan=0.0), 0.0, Ws - 1)
        sy = jnp.clip(jnp.nan_to_num(sy, nan=0.0), 0.0, Hs - 1)
    else:  # constant zeros: hats vanish outside [-1, size]; sanitize the
        # coords so degenerate matrices (inf/nan from near-zero denom or an
        # invalid-part DLT) zero out instead of poisoning the contraction.
        sx = jnp.clip(jnp.nan_to_num(sx, nan=-2.0, posinf=Ws + 1.0, neginf=-2.0), -2.0, Ws + 1.0)
        sy = jnp.clip(jnp.nan_to_num(sy, nan=-2.0, posinf=Hs + 1.0, neginf=-2.0), -2.0, Hs + 1.0)

    A = _hat(sx, Ws)  # [P, Ws]
    B = _hat(sy, Hs)  # [P, Hs]
    # T[p, r, ch] = sum_c A[p, c] * src[r, c, ch]
    srcT = jnp.transpose(img, (1, 0, 2)).reshape(Ws, Hs * C)
    T = jnp.dot(A, srcT, precision=precision).reshape(-1, Hs, C)
    out = jnp.sum(B[:, :, None] * T, axis=1)  # [P, C]
    return out.reshape(out_hw + (img.shape[-1],))


def warp_perspective_matmul(
    img: jnp.ndarray,
    M: jnp.ndarray,  # [3, 3] src->dst (cv2 convention; inverted internally)
    out_hw: tuple[int, int],
    border: str = "constant",
    precision=DEFAULT_PRECISION,
) -> jnp.ndarray:
    """cv2.warpPerspective(img, M, (w, h)) via the matmul formulation."""
    Minv = jax.lax.optimization_barrier(inv3x3(M))
    return warp_perspective_inv_matmul(img, Minv, out_hw, border, precision)

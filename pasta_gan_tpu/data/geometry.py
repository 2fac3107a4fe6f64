"""Keypoint-quad -> perspective-transform geometry for patch routing.

Counterpart of `training/dataset.py:751-836` (`get_crop`) — the core of
PASTA-GAN's patch-routed disentanglement: each of 10 keypoint-anchored body
parts defines a source quadrilateral in the image; a perspective transform M
normalizes it into a canonical patch frame, and M_inv re-projects it.

The reference runs 20 `cv2.warpPerspective` calls per sample on CPU workers
(the input-pipeline bottleneck, SURVEY.md section 3.1).  Here the geometry is
vectorized over batch x parts as pure array math so the warps can run on-TPU
(see data/warp.py): quads are built with `jnp.where` selects instead of python
fallback branches, and `cv2.getPerspectiveTransform` becomes a batched 8x8
linear solve (DLT).

Everything also works with numpy inputs for host-side use.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# OpenPose 18-keypoint order used by the dataset (dataset.py:858-860).
KEYPOINT_ORDER = [
    "cnose", "cneck", "rshoulder", "relbow", "rwrist", "lshoulder",
    "lelbow", "lwrist", "rhip", "rknee", "rankle", "lhip", "lknee",
    "lankle", "reye", "leye", "rear", "lear",
]
_IDX = {name: i for i, name in enumerate(KEYPOINT_ORDER)}

# The 10 body-part keypoint groups (dataset.py:846-856).
BPARTS = [
    ["lshoulder", "lhip", "rhip", "rshoulder"],
    ["lshoulder", "rshoulder", "cnose"],
    ["lshoulder", "lelbow"],
    ["lelbow", "lwrist"],
    ["rshoulder", "relbow"],
    ["relbow", "rwrist"],
    ["lhip", "lknee"],
    ["lknee", "lankle"],
    ["rhip", "rknee"],
    ["rknee", "rankle"],
]
NUM_PARTS = len(BPARTS)
# Lower-body parts additionally route the lower garment (dataset.py:890).
LOWER_PART_START = 6
# Hand parts whose denorm masks feed the random-erase augmentation (dataset.py:904).
HAND_PARTS = (2, 3, 4, 5)

BPART_INDICES = np.array(
    [[_IDX[n] for n in part] + [_IDX[part[-1]]] * (4 - len(part)) for part in BPARTS],
    dtype=np.int32,
)  # [10, 4] padded with repeats
BPART_SIZES = np.array([len(p) for p in BPARTS], dtype=np.int32)

VALID_CONF = 0.1
DEFAULT_AR = 0.5


def _segment_quad(a, b, alpha):
    """Box around segment a->b extruded by alpha * normal (dataset.py:820-829)."""
    seg = b - a
    normal = jnp.stack([-seg[..., 1], seg[..., 0]], axis=-1)
    return jnp.stack(
        [a + alpha * normal, a - alpha * normal, b - alpha * normal, b + alpha * normal],
        axis=-2,
    )  # [..., 4, 2]


def part_quads(
    keypoints: jnp.ndarray,  # [B, 18, 3] (x, y, confidence)
    img_h: int,
    pad_x: float = 32.0,
    ar: float = DEFAULT_AR,
    knee_fallbacks: bool = False,
):
    """Build the source quads for all 10 parts, vectorized over the batch.

    Returns (quads [B, 10, 4, 2], valid [B, 10] bool).  Implements the exact
    fallback ladder of `get_crop`:
      * lhip+lknee / rhip+rknee invalid -> single-hip vertical segment,
      * shoulders+nose invalid -> shoulders-only box (alpha=1, flipped normal),
      * anything else invalid -> part dropped (valid=False).
    With `knee_fallbacks` (the TEST-path get_crop, dataset.py:1356-1363 —
    commented out in the training one, dataset.py:765-772), lknee+lankle /
    rknee+rankle invalid additionally falls back to a single-knee vertical
    segment to the image bottom.
    """
    keypoints = jnp.asarray(keypoints, jnp.float32)
    B = keypoints.shape[0]
    pts = keypoints[..., :2] + jnp.asarray([pad_x, 0.0], jnp.float32)  # pad offset (dataset.py:780)
    conf = keypoints[..., 2]

    idx = jnp.asarray(BPART_INDICES)  # [10, 4]
    part_pts = pts[:, idx]  # [B, 10, 4, 2] (padded repeats for <4-point parts)
    part_conf = conf[:, idx]  # [B, 10, 4]

    sizes = jnp.asarray(BPART_SIZES)  # [10]
    slot = jnp.arange(4)[None, :]  # [1,4]
    used = slot < sizes[:, None]  # [10,4]
    primary_valid = jnp.all(
        jnp.where(used[None], part_conf >= VALID_CONF, True), axis=-1
    )  # [B,10]

    quads = jnp.zeros((B, NUM_PARTS, 4, 2), jnp.float32)
    valid = jnp.zeros((B, NUM_PARTS), dtype=bool)

    def kp(name):
        return pts[:, _IDX[name]]  # [B,2]

    def kconf(name):
        return conf[:, _IDX[name]]

    for p, names in enumerate(BPARTS):
        if len(names) == 4:
            quad = part_pts[:, p]  # direct quad (dataset.py:788-789)
            v = primary_valid[:, p]
        elif len(names) == 3:
            # torso-top: neck-nose segment box, order [b,c,d,a] (dataset.py:804-818)
            lsh, rsh, nose = kp("lshoulder"), kp("rshoulder"), kp("cnose")
            neck = 0.5 * (lsh + rsh)
            p0 = neck + 2.0 * (nose - neck)
            p1 = neck
            seg = p1 - p0
            normal = jnp.stack([-seg[..., 1], seg[..., 0]], axis=-1)
            alpha = 0.5
            quad3 = jnp.stack(
                [p0 - alpha * normal, p1 - alpha * normal, p1 + alpha * normal, p0 + alpha * normal],
                axis=-2,
            )  # [b,c,d,a]
            # fallback: shoulders-only box with alpha=1 and downward-flipped
            # normal, quad [a,b,c,d] = [p0+n, p0, p1, p1+n] (dataset.py:792-802)
            seg_f = rsh - lsh
            normal_f = jnp.stack([-seg_f[..., 1], seg_f[..., 0]], axis=-1)
            normal_f = jnp.where(normal_f[..., 1:2] > 0.0, -normal_f, normal_f)
            quad_fb = jnp.stack(
                [lsh + normal_f, lsh, rsh, rsh + normal_f], axis=-2
            )
            v3 = primary_valid[:, p]
            v_fb = (kconf("lshoulder") >= VALID_CONF) & (kconf("rshoulder") >= VALID_CONF)
            quad = jnp.where(v3[:, None, None], quad3, quad_fb)
            v = v3 | v_fb
        else:  # 2-point segment parts
            a, b = kp(names[0]), kp(names[1])
            quad2 = _segment_quad(a, b, ar / 2.0)
            v2 = primary_valid[:, p]
            has_fallback = names in (["lhip", "lknee"], ["rhip", "rknee"]) or (
                knee_fallbacks
                and names in (["lknee", "lankle"], ["rknee", "rankle"])
            )
            if has_fallback:
                # single-point fallback: vertical segment from the first joint
                # to the image bottom (dataset.py:757-772, 782-786)
                quad_fb = _segment_quad(
                    a,
                    jnp.stack([a[..., 0], jnp.full_like(a[..., 0], img_h - 1.0)], axis=-1),
                    ar / 2.0,
                )
                v_fb = kconf(names[0]) >= VALID_CONF
                quad = jnp.where(v2[:, None, None], quad2, quad_fb)
                v = v2 | v_fb
            else:
                quad = quad2
                v = v2
        quads = quads.at[:, p].set(quad)
        valid = valid.at[:, p].set(v)

    return quads, valid


def _solve8(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 8x8 linear solve as unrolled Gauss-Jordan with partial
    pivoting — pure vector ops, no LAPACK custom call.

    jnp.linalg.solve lowers each tiny DLT system to LU/triangular-solve
    custom calls whose fixed dispatch cost dominated the routing program
    (~2 ms/batch-16, BASELINE.md round 3); the unrolled elimination fuses
    into one VPU pass.  A: [..., 8, 8], b: [..., 8] -> x [..., 8]."""
    Ab = jnp.concatenate([A, b[..., None]], axis=-1)  # [..., 8, 9]
    rows = jnp.arange(8)
    for k in range(8):
        # partial pivot among rows >= k (one-hot algebra; no gathers)
        col = jnp.abs(Ab[..., :, k])
        piv = jnp.argmax(jnp.where(rows >= k, col, -1.0), axis=-1)  # [...]
        is_piv = jax.nn.one_hot(piv, 8, dtype=Ab.dtype)  # [..., 8]
        is_k = (rows == k).astype(Ab.dtype)  # [8]
        pivot_row = jnp.einsum("...r,...rc->...c", is_piv, Ab)  # [..., 9]
        row_k = Ab[..., k, :]  # [..., 9]
        # swap rows k <-> piv
        Ab = (
            Ab
            + is_k[:, None] * (pivot_row[..., None, :] - Ab[..., k : k + 1, :])
            + is_piv[..., :, None] * (row_k[..., None, :] - pivot_row[..., None, :])
        )
        pv = Ab[..., k, k]
        pv = jnp.where(jnp.abs(pv) < 1e-12, 1e-12, pv)
        norm_row = Ab[..., k, :] / pv[..., None]  # [..., 9]
        # eliminate column k from every other row, set row k to normalized
        factors = Ab[..., :, k] * (1.0 - is_k)
        Ab = Ab - factors[..., :, None] * norm_row[..., None, :]
        Ab = jnp.where((rows == k)[:, None], norm_row[..., None, :], Ab)
    return Ab[..., :, 8]


def perspective_transform(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Batched cv2.getPerspectiveTransform: solve for M with M@[sx,sy,1] ~ [dx,dy].

    src, dst: [..., 4, 2].  Returns [..., 3, 3] (last entry normalized to 1).
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    x, y = src[..., 0], src[..., 1]  # [..., 4]
    X, Y = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # rows for X equations: [x y 1 0 0 0 -X x -X y]
    rx = jnp.stack([x, y, ones, zeros, zeros, zeros, -X * x, -X * y], axis=-1)
    ry = jnp.stack([zeros, zeros, zeros, x, y, ones, -Y * x, -Y * y], axis=-1)
    A = jnp.concatenate([rx, ry], axis=-2)  # [..., 8, 8]
    rhs = jnp.concatenate([X, Y], axis=-1)  # [..., 8]
    m = _solve8(A, rhs)  # [..., 8]
    M = jnp.concatenate([m, jnp.ones_like(m[..., :1])], axis=-1)
    return M.reshape(M.shape[:-1] + (3, 3))


def dst_quad(w: int, h: int) -> np.ndarray:
    """Canonical patch frame corners (dataset.py:831-832): [0,0],[0,h],[w,h],[w,0]."""
    return np.asarray([[0.0, 0.0], [0.0, h], [w, h], [w, 0.0]], np.float32)


def part_transforms(
    keypoints: jnp.ndarray,  # [B, 18, 3]
    img_h: int,
    patch_w: int,
    patch_h: int,
    pad_x: float = 32.0,
    ar: float = DEFAULT_AR,
    knee_fallbacks: bool = False,
):
    """Full geometry for a batch: (M [B,10,3,3], M_inv [B,10,3,3], valid [B,10]).

    Invalid parts get identity matrices (callers mask their outputs), keeping
    the batched solve non-singular.
    """
    quads, valid = part_quads(
        keypoints, img_h=img_h, pad_x=pad_x, ar=ar, knee_fallbacks=knee_fallbacks
    )
    dq = jnp.asarray(dst_quad(patch_w, patch_h))
    dq = jnp.broadcast_to(dq, quads.shape)
    safe_quads = jnp.where(valid[..., None, None], quads, dq)
    M = perspective_transform(safe_quads, dq)
    M_inv = perspective_transform(dq, safe_quads)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), M.shape)
    M = jnp.where(valid[..., None, None], M, eye)
    M_inv = jnp.where(valid[..., None, None], M_inv, eye)
    # Materialize: without a barrier XLA fuses the 8x8 DLT solve into the
    # per-pixel warp coordinate computation downstream and re-evaluates it
    # per tile (measured: the batched norm warps ran ~2 s instead of ~25 ms).
    M, M_inv = jax.lax.optimization_barrier((M, M_inv))
    return M, M_inv, valid

"""Fused denorm+erode+composite kernel (ops/pallas_warp.py:_composite_kernel)
vs the separate-pass pipeline it replaces, in interpret mode (CPU CI; the
real-TPU lowering is exercised by bench.py and cli.test).

The oracle is the exact sequence of route_patches_single's non-fused branch:
warp_perspective_matmul (itself cv2-parity-tested) -> >= 254.5/255
saturation -> 5x5 binary erosion (erode_binary) on the flagged parts ->
sequential later-overwrites compositing + per-part hand masks.  Reference
semantics: /root/reference/training/dataset.py:880-927, 1485."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.data.warp import MASK_SATURATION_THRESHOLD, erode_binary
from pasta_gan_tpu.ops.matmul_warp import warp_perspective_matmul
from pasta_gan_tpu.ops.pallas_warp import warp_parts_composite_pallas

H, W = 64, 64
HS = WS = 32
N = 5
GROUPS = (0, 0, 0, 1, 1)
ERODE = (True, True, False, False, True)
HANDS = (1, 3)


def _patch_to_frame_transforms(rng, n):
    """Random patch->frame homographies with quads inside the frame."""
    Ms = []
    for _ in range(n):
        cx, cy = rng.uniform(16, 48, 2)
        wq, hq = rng.uniform(12, 30, 2)
        ang = rng.uniform(-0.5, 0.5)
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        base = np.array([[-wq / 2, -hq / 2], [wq / 2, -hq / 2],
                         [wq / 2, hq / 2], [-wq / 2, hq / 2]])
        dstq = (base @ R.T + [cx, cy]).astype(np.float32)
        srcq = np.array([[0, 0], [WS - 1, 0], [WS - 1, HS - 1], [0, HS - 1]],
                        np.float32)
        A = []
        for (x, y), (u, v) in zip(srcq, dstq):
            A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
            A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
        _, _, V = np.linalg.svd(np.asarray(A))
        M = V[-1].reshape(3, 3)
        Ms.append(M / M[2, 2])
    return jnp.asarray(np.stack(Ms), jnp.float32)


def _oracle(srcs, Ms, valid):
    """The separate-pass pipeline (route_patches_single's non-fused branch)."""
    dn = jax.vmap(
        lambda s, m: warp_perspective_matmul(
            jnp.transpose(s, (1, 2, 0)), m, (H, W), "constant"
        )
    )(srcs, Ms)  # [N, H, W, 4]
    dn = dn * valid.astype(dn.dtype)[:, None, None, None]
    sat = (dn[..., 3:] >= MASK_SATURATION_THRESHOLD).astype(jnp.float32)
    sat = jnp.stack(
        [erode_binary(sat[p]) if ERODE[p] else sat[p] for p in range(N)]
    )
    outs = {g: jnp.zeros((H, W, 3), jnp.float32) for g in set(GROUPS)}
    for p in range(N):
        v = sat[p] * valid[p].astype(jnp.float32)
        outs[GROUPS[p]] = dn[p, ..., :3] * v + outs[GROUPS[p]] * (1 - v)
    hands = jnp.stack([sat[p] * valid[p].astype(jnp.float32) for p in HANDS])
    return outs[0], outs[1], hands[..., 0]


@pytest.mark.parametrize("seed", [0, 1])
def test_composite_kernel_matches_pipeline(seed):
    rng = np.random.default_rng(seed)
    srcs = rng.uniform(0, 1, (N, 4, HS, WS)).astype(np.float32)
    # make mask channels mostly-saturated blobs so erosion has real edges
    srcs[:, 3] = (srcs[:, 3] > 0.35).astype(np.float32)
    srcs = jnp.asarray(srcs)
    Ms = _patch_to_frame_transforms(rng, N)
    valid = jnp.asarray([True, True, False, True, True])

    up_ref, lo_ref, hands_ref = _oracle(srcs, Ms, valid)
    g_imgs, hands = warp_parts_composite_pallas(
        srcs[None], Ms[None], valid[None], (H, W),
        GROUPS, ERODE, HANDS, rows_per_tile=8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(g_imgs[0, 0]),
        np.asarray(jnp.transpose(up_ref, (2, 0, 1))), atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_imgs[0, 1]),
        np.asarray(jnp.transpose(lo_ref, (2, 0, 1))), atol=5e-5,
    )
    np.testing.assert_allclose(np.asarray(hands[0]), np.asarray(hands_ref),
                               atol=5e-5)


def test_composite_kernel_degenerate_matrix():
    rng = np.random.default_rng(2)
    srcs = jnp.asarray(rng.uniform(0, 1, (N, 4, HS, WS)), jnp.float32)
    Ms = _patch_to_frame_transforms(rng, N).at[0].set(jnp.zeros((3, 3)))
    valid = jnp.ones((N,), bool)
    g_imgs, hands = warp_parts_composite_pallas(
        srcs[None], Ms[None], valid[None], (H, W),
        GROUPS, ERODE, HANDS, rows_per_tile=8, interpret=True,
    )
    assert bool(jnp.all(jnp.isfinite(g_imgs))) and bool(
        jnp.all(jnp.isfinite(hands))
    )

"""Hat-matrix matmul warp (ops/matmul_warp.py) vs the gather warp oracle.

The matmul formulation must reproduce data/warp.py's bilinear sampling —
itself parity-tested against cv2.warpPerspective (test_v19_routing.py /
test_512_routing.py) — for both border modes, including out-of-range and
degenerate transforms, and its AD must agree with the gather path's VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasta_gan_tpu.data.warp import warp_perspective_inv
from pasta_gan_tpu.ops.matmul_warp import (
    inv3x3,
    warp_coords,
    warp_perspective_inv_matmul,
)


def _rand_minv(rng, scale=0.25, persp=1e-3):
    M = np.eye(3) + rng.normal(0, scale, (3, 3))
    M[2, :2] = rng.normal(0, persp, 2)
    M[2, 2] = 1.0
    return jnp.asarray(M, jnp.float32)


@pytest.mark.parametrize("border", ["constant", "replicate"])
def test_matmul_warp_matches_gather_warp(border):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (64, 48, 4)), jnp.float32)
    for trial in range(4):
        Minv = _rand_minv(rng)
        ref = warp_perspective_inv(img, Minv, (96, 80), border)
        out = warp_perspective_inv_matmul(img, Minv, (96, 80), border)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_matmul_warp_far_offscreen_and_degenerate():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
    # translation far off the source: everything lands in the zero border
    Minv = jnp.asarray(np.diag([1.0, 1.0, 1.0]), jnp.float32).at[0, 2].set(1e5)
    out = warp_perspective_inv_matmul(img, Minv, (16, 16), "constant")
    assert float(jnp.max(jnp.abs(out))) == 0.0
    # all-zero matrix (invalid DLT) must stay finite
    out = warp_perspective_inv_matmul(jnp.zeros((3, 3), jnp.float32) + img[:3, :3] * 0, jnp.zeros((3, 3)), (8, 8), "constant")
    assert bool(jnp.all(jnp.isfinite(out)))


def test_matmul_warp_saturation_fidelity():
    """The ==255 saturation test (warp.py MASK_SATURATION_THRESHOLD) must see
    identical threshold decisions from both warp paths: interpolated mask
    values must agree to far better than the 0.5/255 margin."""
    rng = np.random.default_rng(2)
    mask = (rng.uniform(0, 1, (64, 64, 4)) > 0.3).astype(np.float32)
    img = jnp.asarray(mask)
    for _ in range(4):
        Minv = _rand_minv(rng)
        ref = warp_perspective_inv(img, Minv, (128, 128), "constant")
        out = warp_perspective_inv_matmul(img, Minv, (128, 128), "constant")
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_matmul_warp_image_gradient_matches_gather_vjp():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (32, 24, 4)), jnp.float32)
    Minv = _rand_minv(rng)
    g = jnp.asarray(rng.normal(0, 1, (40, 36, 4)), jnp.float32)

    def loss_gather(x):
        return jnp.sum(warp_perspective_inv(x, Minv, (40, 36), "constant") * g)

    def loss_matmul(x):
        return jnp.sum(warp_perspective_inv_matmul(x, Minv, (40, 36), "constant") * g)

    d_ref = jax.grad(loss_gather)(img)
    d_mm = jax.grad(loss_matmul)(img)
    np.testing.assert_allclose(np.asarray(d_mm), np.asarray(d_ref), atol=1e-4)


def test_inv3x3_matches_linalg_inv():
    """Adjugate inverse vs LU for the homography population the routing
    program actually produces (near-identity affine + small perspective)."""
    rng = np.random.default_rng(5)
    Ms = jnp.stack([_rand_minv(rng) for _ in range(64)])
    ref = jnp.linalg.inv(Ms)
    out = inv3x3(Ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)
    # round-trip: M @ inv(M) == I
    eye = jnp.einsum("bij,bjk->bik", Ms, out)
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-4
    )
    # arbitrary leading batch dims + unbatched
    np.testing.assert_allclose(
        np.asarray(inv3x3(Ms.reshape(8, 8, 3, 3))).reshape(64, 3, 3),
        np.asarray(ref),
        rtol=2e-5,
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(inv3x3(Ms[0])), np.asarray(ref[0]), rtol=2e-5, atol=2e-6
    )


def test_inv3x3_singular_is_nonfinite_like_linalg():
    """det==0 must produce non-finite entries (callers squash them), never
    silently-wrong finite values."""
    out = inv3x3(jnp.zeros((3, 3), jnp.float32))
    assert not bool(jnp.all(jnp.isfinite(out)))
    # rank-2 matrix (duplicate rows)
    M = jnp.asarray([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0], [0.0, 1.0, 4.0]])
    assert not bool(jnp.all(jnp.isfinite(inv3x3(M))))


def test_warp_coords_matches_inline_math():
    rng = np.random.default_rng(4)
    Minv = _rand_minv(rng)
    sx, sy = warp_coords(Minv, (8, 8))
    gx, gy = np.meshgrid(np.arange(8.0), np.arange(8.0))
    denom = np.asarray(Minv)[2, 0] * gx + np.asarray(Minv)[2, 1] * gy + np.asarray(Minv)[2, 2]
    ref_sx = (np.asarray(Minv)[0, 0] * gx + np.asarray(Minv)[0, 1] * gy + np.asarray(Minv)[0, 2]) / denom
    np.testing.assert_allclose(np.asarray(sx), ref_sx, rtol=1e-6)
    assert sy.shape == (8, 8)

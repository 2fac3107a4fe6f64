"""Two-pass affine resample (ops/shear_warp.py): exactness on axis-aligned
maps, boundedness on rotations, gradient flow, and the AugmentPipe fast_geom
wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.data.warp import warp_perspective_inv
from pasta_gan_tpu.ops.shear_warp import (
    affine_resample_two_pass,
    affine_resample_two_pass_batch,
)


def _exact(img, A2, out_hw):
    A3 = jnp.concatenate([A2, jnp.asarray([[0.0, 0.0, 1.0]])], axis=0)
    return warp_perspective_inv(img, A3, out_hw, "constant")


def _smooth(rng, n):
    x = rng.uniform(0, 1, (n // 8, n // 8, 3))
    up = np.repeat(np.repeat(x, 8, 0), 8, 1)
    k = np.ones((5, 5, 1)) / 25.0
    from scipy.ndimage import convolve

    return convolve(up, k, mode="nearest").astype(np.float32)


AXIS_ALIGNED = {
    "identity": [[1, 0, 0], [0, 1, 0.0]],
    "translate_frac": [[1, 0, 3.3], [0, 1, -2.7]],
    "scale": [[1.7, 0, -10], [0, 0.6, 4.0]],
    "xflip": [[-1, 0, 95], [0, 1, 0.0]],
    "yflip": [[1, 0, 0], [0, -1, 95.0]],
    "rot90_translate": [[0, -1, 80], [1, 0, 12.0]],
    "rot180": [[-1, 0, 95], [0, -1, 95.0]],
    "far_offscreen": [[1, 0, -400], [0, 1, 0.0]],
}


@pytest.mark.parametrize("name", sorted(AXIS_ALIGNED))
def test_axis_aligned_exact(name):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (96, 96, 3)), jnp.float32)
    A = jnp.asarray(AXIS_ALIGNED[name], jnp.float32)
    out = affine_resample_two_pass(img, A, (80, 88))
    ref = _exact(img, A, (80, 88))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rotation_close_on_smooth_images():
    rng = np.random.default_rng(1)
    img = jnp.asarray(_smooth(rng, 96))
    for deg in (30, 45, 100, -120):
        th = np.deg2rad(deg)
        A = jnp.asarray(
            [[np.cos(th), -np.sin(th), 30], [np.sin(th), np.cos(th), -10]], jnp.float32
        )
        out = affine_resample_two_pass(img, A, (80, 88))
        ref = _exact(img, A, (80, 88))
        d = np.abs(np.asarray(out) - np.asarray(ref))
        assert d.mean() < 5e-3, (deg, d.mean())


def test_batch_and_gradients():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 1, (3, 64, 64, 3)), jnp.float32)
    A = jnp.asarray(
        [
            [[1, 0, 2.5], [0, 1, -1.5]],
            [[0.8, -0.2, 10], [0.2, 0.9, 5]],
            [[-1, 0, 63], [0, 1, 0]],
        ],
        jnp.float32,
    )
    out = affine_resample_two_pass_batch(imgs, A, (64, 64))
    assert out.shape == (3, 64, 64, 3)

    g = jax.grad(
        lambda im: jnp.sum(jnp.square(affine_resample_two_pass_batch(im, A, (64, 64))))
    )(imgs)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_augment_pipe_fast_geom_close_to_exact():
    """The full bgc pipe in fast_geom mode tracks the exact pipe closely on
    smooth images over random draws (identical RNG consumption)."""
    from pasta_gan_tpu.train.augment import AugmentPipe

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(
        np.stack([_smooth(rng, 64) for _ in range(4)]), jnp.float32
    )
    exact_pipe = AugmentPipe.from_spec("bgc")
    fast_pipe = AugmentPipe.from_spec("bgc", fast_geom=True)
    key = jax.random.PRNGKey(7)
    a = exact_pipe(imgs, 0.7, key)
    b = fast_pipe(imgs, 0.7, key)
    d = np.abs(np.asarray(a) - np.asarray(b))
    assert d.mean() < 1e-2, d.mean()

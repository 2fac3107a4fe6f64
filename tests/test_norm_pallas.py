"""NORM-direction Pallas warp kernel (ops/pallas_warp.py:_norm_kernel) vs the
gather warp oracle, in interpret mode (CPU CI; the real-TPU lowering is
exercised by bench.py and the routing pipeline).

The kernel must reproduce vmap(warp_perspective)(frame, Ms) — itself
parity-tested against cv2 — including the lossless source-tile skipping,
replicate-border clamping, degenerate matrices, and the valid mask."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.data.warp import _warp_parts_gather
from pasta_gan_tpu.ops.pallas_warp import warp_frame_to_parts_pallas


def _part_transforms(rng, n, frame=128, patch=32):
    """Random part-box -> patch DLT homographies like geometry.part_transforms."""
    Ms = []
    for _ in range(n):
        cx, cy = rng.uniform(20, frame - 20, 2)
        wq, hq = rng.uniform(10, frame // 2, 2)
        ang = rng.uniform(-0.6, 0.6)
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        base = np.array([[-wq / 2, -hq / 2], [wq / 2, -hq / 2],
                         [wq / 2, hq / 2], [-wq / 2, hq / 2]])
        srcq = (base @ R.T + [cx, cy]).astype(np.float32)
        dstq = np.array([[0, 0], [patch - 1, 0], [patch - 1, patch - 1],
                         [0, patch - 1]], np.float32)
        A = []
        for (x, y), (u, v) in zip(srcq, dstq):
            A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
            A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
        _, _, V = np.linalg.svd(np.asarray(A))
        M = V[-1].reshape(3, 3)
        Ms.append(M / M[2, 2])
    return jnp.asarray(np.stack(Ms), jnp.float32)


@pytest.mark.parametrize("border", ["replicate", "constant"])
def test_norm_kernel_matches_gather(border):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (128, 128, 4)), jnp.float32)
    Ms = _part_transforms(rng, 6)
    ref = _warp_parts_gather(img, Ms, (32, 32), border)
    out = warp_frame_to_parts_pallas(img, Ms, (32, 32), border,
                                     rows_per_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_norm_kernel_degenerate_and_valid():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (128, 128, 4)), jnp.float32)
    Ms = _part_transforms(rng, 4).at[0].set(jnp.zeros((3, 3)))
    out = warp_frame_to_parts_pallas(img, Ms, (32, 32), "replicate",
                                     rows_per_tile=8, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    v = jnp.asarray([True, False, True, True])
    out_v = warp_frame_to_parts_pallas(img, Ms, (32, 32), "replicate",
                                       valid=v, rows_per_tile=8, interpret=True)
    assert float(jnp.max(jnp.abs(out_v[1]))) == 0.0
    np.testing.assert_allclose(np.asarray(out_v[2:]), np.asarray(out[2:]),
                               atol=1e-6)


def test_denorm_kernel_replicate_border_no_skipping():
    """warp_parts_pallas with border="replicate" must NOT apply support-quad
    skipping — every dst pixel has clamped-sample content (regression: tiles
    outside the quad were zeroed)."""
    from pasta_gan_tpu.ops.pallas_warp import warp_parts_pallas
    from pasta_gan_tpu.data.warp import warp_perspective

    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.uniform(0.2, 1, (2, 16, 16, 4)), jnp.float32)
    # small patch mapped into a corner of a much larger dst: most dst tiles
    # are outside the support quad but must hold replicate-clamped content
    M = jnp.asarray(np.stack([np.diag([1.0, 1.0, 1.0]),
                              np.diag([0.5, 0.5, 1.0])]), jnp.float32)
    out = warp_parts_pallas(src, M, (64, 64), "replicate", rows_per_tile=8,
                            interpret=True)
    ref = jnp.stack([warp_perspective(src[i], M[i], (64, 64), "replicate")
                     for i in range(2)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
    assert float(jnp.min(jnp.abs(out))) > 0.0  # no zeroed tiles


def test_norm_kernel_saturation_fidelity():
    """Binary-mask channels must interpolate identically across paths (the
    ==255 saturation margin in data/warp.py is 0.5/255)."""
    rng = np.random.default_rng(2)
    mask = (rng.uniform(0, 1, (128, 128, 4)) > 0.4).astype(np.float32)
    img = jnp.asarray(mask)
    Ms = _part_transforms(rng, 4)
    ref = _warp_parts_gather(img, Ms, (32, 32), "replicate")
    out = warp_frame_to_parts_pallas(img, Ms, (32, 32), "replicate",
                                     rows_per_tile=8, interpret=True)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


@pytest.mark.parametrize("rows,st", [(4, 8), (16, 2)])
def test_norm_kernel_swept_tile_configs(rows, st):
    """The tile parameters swept by scripts/bench_routing.py (ops/tuning.py)
    are pure scheduling choices — lossless at every (rows_per_tile,
    src_tiles), including src blockings finer and coarser than the default."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 4)), jnp.float32)
    Ms = _part_transforms(rng, 3, frame=64, patch=16)
    ref = _warp_parts_gather(img, Ms, (16, 16), "replicate")
    out = warp_frame_to_parts_pallas(img, Ms, (16, 16), "replicate",
                                     rows_per_tile=rows, src_tiles=st,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_norm_kernel_planar_output():
    """planar=True must be exactly the transpose of the NHWC output, for
    both the single-frame and the batched kernels."""
    from pasta_gan_tpu.ops.pallas_warp import warp_frame_to_parts_pallas_batched

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (128, 128, 4)), jnp.float32)
    Ms = _part_transforms(rng, 4)
    nhwc = warp_frame_to_parts_pallas(img, Ms, (32, 32), "replicate",
                                      rows_per_tile=8, interpret=True)
    pl = warp_frame_to_parts_pallas(img, Ms, (32, 32), "replicate",
                                    rows_per_tile=8, interpret=True, planar=True)
    np.testing.assert_array_equal(
        np.asarray(pl), np.asarray(nhwc).transpose(0, 3, 1, 2)
    )
    imgs = jnp.stack([img, img * 0.5])
    Msb = jnp.stack([Ms, Ms])
    nhwc_b = warp_frame_to_parts_pallas_batched(
        imgs, Msb, (32, 32), "replicate", rows_per_tile=8, interpret=True
    )
    pl_b = warp_frame_to_parts_pallas_batched(
        imgs, Msb, (32, 32), "replicate", rows_per_tile=8, interpret=True,
        planar=True,
    )
    np.testing.assert_array_equal(
        np.asarray(pl_b), np.asarray(nhwc_b).transpose(0, 1, 4, 2, 3)
    )


def test_denorm_kernel_planar_input():
    """warp_parts_pallas(planar_in=True) on transposed src must equal the
    NHWC-input call bit-for-bit."""
    from pasta_gan_tpu.ops.pallas_warp import warp_parts_pallas

    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 4)), jnp.float32)
    # patch -> frame: scale up and translate (denorm-like)
    Ms = jnp.asarray(
        np.stack([np.diag([4.0, 4.0, 1.0]) + rng.normal(0, 0.05, (3, 3)) * [[1, 1, 30], [1, 1, 30], [0, 0, 0]]
                  for _ in range(4)]).astype(np.float32)
    )
    ref = warp_parts_pallas(src, Ms, (128, 128), "constant",
                            rows_per_tile=8, interpret=True, planar=True)
    out = warp_parts_pallas(jnp.transpose(src, (0, 3, 1, 2)), Ms, (128, 128),
                            "constant", rows_per_tile=8, interpret=True,
                            planar=True, planar_in=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

"""Patch-routing geometry parity tests: our batched math vs cv2 and vs the
reference dataset's own `get_crop` (imported from the read-only mount)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.data.geometry import (
    BPARTS,
    KEYPOINT_ORDER,
    dst_quad,
    part_quads,
    part_transforms,
    perspective_transform,
)
from pasta_gan_tpu.data.warp import warp_perspective

cv2 = pytest.importorskip("cv2")


def _random_keypoints(rng, B=3, visible=True):
    """Plausible person keypoints in a 256x192 frame (pre-pad coords)."""
    base = {
        "cnose": (96, 40), "cneck": (96, 70), "rshoulder": (70, 72), "relbow": (60, 105),
        "rwrist": (56, 140), "lshoulder": (122, 72), "lelbow": (132, 105),
        "lwrist": (136, 140), "rhip": (78, 140), "rknee": (74, 190), "rankle": (72, 235),
        "lhip": (114, 140), "lknee": (118, 190), "lankle": (120, 235),
        "reye": (90, 34), "leye": (102, 34), "rear": (84, 38), "lear": (108, 38),
    }
    kps = np.zeros((B, 18, 3), np.float32)
    for i, name in enumerate(KEYPOINT_ORDER):
        x, y = base[name]
        kps[:, i, 0] = x + rng.normal(0, 5, B)
        kps[:, i, 1] = y + rng.normal(0, 5, B)
        kps[:, i, 2] = 0.9 if visible else 0.0
    return kps


def test_perspective_transform_matches_cv2():
    rng = np.random.default_rng(0)
    for _ in range(10):
        src = rng.uniform(0, 200, (4, 2)).astype(np.float32)
        # ensure non-degenerate quad
        src = src + np.asarray([[0, 0], [0, 100], [100, 100], [100, 0]], np.float32)
        dst = dst_quad(64, 64)
        M_ours = np.asarray(perspective_transform(jnp.asarray(src), jnp.asarray(dst)))
        M_cv = cv2.getPerspectiveTransform(src, dst)
        np.testing.assert_allclose(M_ours, M_cv, rtol=1e-3, atol=1e-4)


def test_part_quads_match_reference_get_crop():
    """Our vectorized quads == the reference dataset's get_crop quads.

    We can't call get_crop directly (it's a method reading self.keypoints), so
    we reproduce its observable output: the perspective matrices. Comparing
    M row-wise for every part on visible keypoints.
    """
    import os
    import sys
    import types

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # skimage isn't installed; the dataset module only uses it for stickman
    # drawing, which this test doesn't touch — stub it.
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        draw = types.ModuleType("skimage.draw")
        draw.circle = lambda *a, **k: (np.zeros(0, np.int64), np.zeros(0, np.int64))
        draw.line_aa = lambda *a, **k: (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0))
        skimage.draw = draw
        sys.modules["skimage"] = skimage
        sys.modules["skimage.draw"] = draw
    if "pycocotools" not in sys.modules:
        pyco = types.ModuleType("pycocotools")
        mask_mod = types.ModuleType("pycocotools.mask")
        mask_mod.frPyObjects = lambda *a, **k: None
        mask_mod.decode = lambda *a, **k: np.zeros((1, 1), np.uint8)
        mask_mod.merge = lambda *a, **k: None
        pyco.mask = mask_mod
        sys.modules["pycocotools"] = pyco
        sys.modules["pycocotools.mask"] = mask_mod
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        import importlib

        import torch

        if torch.version.cuda is None:
            torch.version.cuda = "0.0"
        ref_dataset = importlib.import_module("training.dataset")
    finally:
        os.chdir(cwd)

    # cv2 5.0 rejects the non-contiguous slices the reference passes; shim.
    _orig_gpt = cv2.getPerspectiveTransform
    ref_dataset.cv2.getPerspectiveTransform = lambda s, d: _orig_gpt(
        np.ascontiguousarray(s), np.ascontiguousarray(d)
    )

    rng = np.random.default_rng(1)
    kps = _random_keypoints(rng, B=2)
    h = w = 64
    wh = np.asarray([[w, h]], np.float32)

    # reference get_crop via a stub object
    class Stub:
        keypoints = None
        valid_joints = ref_dataset.UvitonDatasetFull.valid_joints
        get_crop = ref_dataset.UvitonDatasetFull.get_crop

    stub = Stub()
    order = KEYPOINT_ORDER

    M_ours, Minv_ours, valid = part_transforms(
        jnp.asarray(kps), img_h=256, patch_w=w, patch_h=h
    )
    M_ours = np.asarray(M_ours)
    Minv_ours = np.asarray(Minv_ours)
    valid = np.asarray(valid)

    for b in range(kps.shape[0]):
        stub.keypoints = kps[b]
        for p, bpart in enumerate(BPARTS):
            M_ref, Minv_ref = stub.get_crop(list(bpart), order, wh, 256, 256, ar=0.5)
            assert valid[b, p], f"part {p} unexpectedly invalid"
            np.testing.assert_allclose(M_ours[b, p], M_ref, rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(Minv_ours[b, p], Minv_ref, rtol=2e-3, atol=2e-2)


def test_part_quads_fallbacks():
    rng = np.random.default_rng(2)
    kps = _random_keypoints(rng, B=1)
    # Invalidate lknee -> part 6 (lhip,lknee) falls back to single-hip segment.
    kps[0, KEYPOINT_ORDER.index("lknee"), 2] = 0.0
    quads, valid = part_quads(jnp.asarray(kps), img_h=256)
    assert bool(valid[0, 6])
    # fallback quad reaches the image bottom
    assert np.max(np.asarray(quads[0, 6])[:, 1]) >= 255.0
    # part 7 (lknee,lankle) has no fallback -> invalid
    assert not bool(valid[0, 7])

    # Invalidate the nose -> part 1 falls back to the shoulders-only box.
    kps2 = _random_keypoints(rng, B=1)
    kps2[0, KEYPOINT_ORDER.index("cnose"), 2] = 0.0
    quads2, valid2 = part_quads(jnp.asarray(kps2), img_h=256)
    assert bool(valid2[0, 1])


def test_warp_perspective_matches_cv2():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (64, 48, 3)).astype(np.float32)
    src = np.asarray([[10, 8], [12, 50], [40, 52], [38, 6]], np.float32)
    dst = dst_quad(32, 32)
    M = cv2.getPerspectiveTransform(src, dst)

    ours_rep = np.asarray(
        warp_perspective(jnp.asarray(img), jnp.asarray(M, dtype=jnp.float32), (32, 32), "replicate")
    )
    cv_rep = cv2.warpPerspective(img, M, (32, 32), borderMode=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours_rep, cv_rep, rtol=1e-3, atol=2e-3)

    Minv = cv2.getPerspectiveTransform(dst, src)
    ours_const = np.asarray(
        warp_perspective(jnp.asarray(ours_rep), jnp.asarray(Minv, dtype=jnp.float32), (64, 48), "constant")
    )
    cv_const = cv2.warpPerspective(cv_rep, Minv, (48, 64), borderMode=cv2.BORDER_CONSTANT)
    np.testing.assert_allclose(ours_const, cv_const, rtol=1e-2, atol=5e-3)


@pytest.mark.slow
def test_route_patches_batch_runs():
    from pasta_gan_tpu.data.warp import route_patches_batch, route_patches_transfer_batch

    rng = np.random.default_rng(4)
    B, H, W = 2, 64, 64
    kps = _random_keypoints(rng, B) * np.asarray([[[W / 192.0, H / 256.0, 1.0]]], np.float32)
    upper = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    lower = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    um = jnp.ones((B, H, W, 1), jnp.float32)
    lm = jnp.ones((B, H, W, 1), jnp.float32)

    out = route_patches_batch(upper, lower, um, lm, jnp.asarray(kps), box_factor=2, pad_x=8.0)
    h = H >> 2
    assert out.norm_img.shape == (B, h, h, 30)
    assert out.norm_img_lower.shape == (B, h, h, 12)
    assert out.denorm_upper_img.shape == (B, H, W, 3)
    assert out.denorm_hand_masks.shape == (B, 4, H, W, 1)
    assert np.all(np.isfinite(np.asarray(out.denorm_upper_img)))
    # with fully-visible keypoints and full masks, some garment pixels survive
    assert float(jnp.sum(out.denorm_upper_img)) > 0

    out_t = route_patches_transfer_batch(
        upper, lower, um, lm, jnp.asarray(kps), jnp.asarray(kps[::-1].copy()),
        box_factor=2, pad_x=8.0,
    )
    assert out_t.norm_img.shape == (B, h, h, 30)

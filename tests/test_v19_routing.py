"""Released-256 test-path routing parity: route_patches_v19_batch vs the
reference `UvitonDatasetV19_test.normalize` (training/dataset.py:1427-1501)
executed live from the read-only mount with cv2."""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from pasta_gan_tpu.data.geometry import KEYPOINT_ORDER, part_quads
from pasta_gan_tpu.data.warp import route_patches_v19_batch

cv2 = pytest.importorskip("cv2")


def _load_ref_dataset():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if not os.path.isdir("/root/reference/training"):
        pytest.skip("reference mount not present")
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        draw = types.ModuleType("skimage.draw")
        draw.circle = lambda *a, **k: (np.zeros(0, np.int64), np.zeros(0, np.int64))
        draw.line_aa = lambda *a, **k: (
            np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0))
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
    _orig_gpt = cv2.getPerspectiveTransform
    ref_dataset.cv2.getPerspectiveTransform = lambda s, d: _orig_gpt(
        np.ascontiguousarray(s), np.ascontiguousarray(d)
    )
    return ref_dataset


def _padded_keypoints(rng, B=1):
    """Keypoints in the PADDED 256x256 frame (x already offset by 32), as the
    V19 dataset stores them (dataset.py:1100)."""
    base = {
        "cnose": (96, 40), "cneck": (96, 70), "rshoulder": (70, 72),
        "relbow": (60, 105), "rwrist": (56, 140), "lshoulder": (122, 72),
        "lelbow": (132, 105), "lwrist": (136, 140), "rhip": (78, 140),
        "rknee": (74, 190), "rankle": (72, 235), "lhip": (114, 140),
        "lknee": (118, 190), "lankle": (120, 235), "reye": (90, 34),
        "leye": (102, 34), "rear": (84, 38), "lear": (108, 38),
    }
    kps = np.zeros((B, 18, 3), np.float32)
    for i, name in enumerate(KEYPOINT_ORDER):
        x, y = base[name]
        kps[:, i, 0] = x + 32 + rng.normal(0, 5, B)
        kps[:, i, 1] = y + rng.normal(0, 5, B)
        kps[:, i, 2] = 0.9
    return kps


def _smooth_u8(rng, shape):
    x = rng.uniform(0, 255, (shape[0] // 8, shape[1] // 8, shape[2]))
    return np.clip(
        cv2.resize(x, (shape[1], shape[0]), interpolation=cv2.INTER_LINEAR), 0, 255
    ).astype(np.uint8)


def _rect_mask_u8(y0, y1, x0, x1, hw=(256, 256)):
    m = np.zeros(hw + (1,), np.uint8)
    m[y0:y1, x0:x1] = 255
    return m


class _StubV19:
    pass


@pytest.mark.slow
def test_route_v19_matches_reference_normalize():
    ref_dataset = _load_ref_dataset()
    stub = _StubV19()
    stub.valid_joints = ref_dataset.UvitonDatasetV19_test.valid_joints.__get__(stub)
    stub.get_crop = ref_dataset.UvitonDatasetV19_test.get_crop.__get__(stub)
    normalize = ref_dataset.UvitonDatasetV19_test.normalize.__get__(stub)

    rng = np.random.default_rng(7)
    g_kps = _padded_keypoints(rng)  # garment person
    p_kps = _padded_keypoints(rng)  # target person

    upper_mask = _rect_mask_u8(60, 150, 70, 190)
    lower_mask = _rect_mask_u8(135, 250, 85, 175)
    g_img_u8 = _smooth_u8(rng, (256, 256, 3)) * (upper_mask > 0)
    p_low_u8 = _smooth_u8(rng, (256, 256, 3)) * (lower_mask > 0)
    g_pose_u8 = _smooth_u8(rng, (256, 256, 3))
    p_pose_u8 = _smooth_u8(rng, (256, 256, 3))
    upper_mask3 = np.repeat(upper_mask, 3, axis=2)
    lower_mask3 = np.repeat(lower_mask, 3, axis=2)

    ref_norm_img, ref_norm_pose, ref_dn_up, ref_dn_low = normalize(
        g_img_u8, p_low_u8, upper_mask3, lower_mask3,
        g_pose_u8, p_pose_u8, g_kps[0], p_kps[0], 2,
    )

    ours = route_patches_v19_batch(
        jnp.asarray(g_img_u8[None], jnp.float32) / 255.0,
        jnp.asarray(upper_mask[None], jnp.float32) / 255.0,
        jnp.asarray(g_pose_u8[None], jnp.float32) / 255.0,
        jnp.asarray(p_low_u8[None], jnp.float32) / 255.0,
        jnp.asarray(lower_mask[None], jnp.float32) / 255.0,
        jnp.asarray(p_pose_u8[None], jnp.float32) / 255.0,
        jnp.asarray(g_kps), jnp.asarray(p_kps),
        box_factor=2, pad_x=0.0,  # keypoints already padded (V19 convention)
    )

    # norm stacks: bilinear-on-uint8 rounding + DLT fp differences
    np.testing.assert_allclose(
        np.asarray(ours.norm_img[0]) * 255.0, ref_norm_img.astype(np.float32),
        atol=16.0, rtol=0,
    )
    assert np.mean(np.abs(np.asarray(ours.norm_img[0]) * 255.0 - ref_norm_img)) < 0.5
    np.testing.assert_allclose(
        np.asarray(ours.norm_pose[0]) * 255.0, ref_norm_pose.astype(np.float32),
        atol=16.0, rtol=0,
    )

    # denorm composites: saturation thresholding flips isolated border pixels;
    # demand tight agreement everywhere else.
    for ours_dn, ref_dn in (
        (np.asarray(ours.denorm_upper_img[0]) * 255.0, ref_dn_up),
        (np.asarray(ours.denorm_lower_img[0]) * 255.0, ref_dn_low),
    ):
        diff = np.abs(ours_dn - ref_dn.astype(np.float32))
        frac_bad = float(np.mean(diff > 10.0))
        assert frac_bad < 0.01, f"denorm mismatch fraction {frac_bad}"
        assert float(np.mean(diff)) < 1.0
    # the transfer actually moved garment pixels into the person frame
    assert float(np.sum(np.asarray(ours.denorm_upper_img))) > 0


def test_knee_fallback_matches_reference():
    """lknee+lankle with an invisible ankle: valid only under the test-path
    fallback ladder (dataset.py:1356-1363)."""
    ref_dataset = _load_ref_dataset()
    stub = _StubV19()
    stub.valid_joints = ref_dataset.UvitonDatasetV19_test.valid_joints.__get__(stub)
    get_crop = ref_dataset.UvitonDatasetV19_test.get_crop.__get__(stub)

    rng = np.random.default_rng(11)
    kps = _padded_keypoints(rng)
    kps[0, KEYPOINT_ORDER.index("lankle"), 2] = 0.0

    quads, valid = part_quads(jnp.asarray(kps), img_h=256, pad_x=0.0, knee_fallbacks=True)
    assert bool(valid[0, 7])  # falls back to the single-knee segment
    _, valid_train = part_quads(jnp.asarray(kps), img_h=256, pad_x=0.0)
    assert not bool(valid_train[0, 7])  # training ladder has no such fallback

    wh = np.asarray([[48, 64]], np.float32)
    M_ref, _ = get_crop(kps[0], ["lknee", "lankle"], KEYPOINT_ORDER, wh, 256, 256, 0.5)
    assert M_ref is not None
    from pasta_gan_tpu.data.geometry import dst_quad, perspective_transform

    M_ours = perspective_transform(quads[0, 7], jnp.asarray(dst_quad(48, 64)))
    np.testing.assert_allclose(np.asarray(M_ours), M_ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_prepare_tryon_batch_v18_drives_generator():
    import jax

    from pasta_gan_tpu.data.dataset import (
        SyntheticUvitonDataset, collate, prepare_tryon_batch_v18)
    from pasta_gan_tpu.models import GeneratorV18

    ds = SyntheticUvitonDataset(num_samples=2)
    person = collate([ds[0], ds[1]])
    garment = collate([ds[1], ds[0]])
    batch = prepare_tryon_batch_v18(person, garment)
    assert batch["style_input"].shape == (2, 64, 64, 60)
    assert batch["pose"].shape == (2, 256, 256, 6)
    for k, v in batch.items():
        assert np.all(np.isfinite(np.asarray(v))), k

    gen = GeneratorV18(
        img_resolution=256, channel_base=1024, channel_max=64, mapping_layers=1
    )
    rng = jax.random.PRNGKey(0)
    variables = gen.init(
        {"params": rng, "noise": rng},
        None, batch["style_input"], batch["retain"], batch["pose"],
        batch["denorm_upper_img"], batch["denorm_lower_img"],
        batch["denorm_upper_mask"], batch["denorm_lower_mask"],
        noise_mode="none",
    )
    img, finetune, m_up, m_low = gen.apply(
        variables, None, batch["style_input"], batch["retain"], batch["pose"],
        batch["denorm_upper_img"], batch["denorm_lower_img"],
        batch["denorm_upper_mask"], batch["denorm_lower_mask"],
        noise_mode="none",
    )
    assert img.shape == (2, 256, 256, 3)
    assert finetune.shape == (2, 256, 256, 3)
    assert np.all(np.isfinite(np.asarray(finetune)))

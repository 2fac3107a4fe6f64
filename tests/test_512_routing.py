"""512 region-routing parity: route_patches_512_batch vs the reference
`UvitonDatasetFull_512_test.normalize_full/upper/lower`
(training/dataset.py:1967-2194) executed live from the read-only mount."""

import numpy as np
import pytest

import jax.numpy as jnp

from pasta_gan_tpu.data.geometry import KEYPOINT_ORDER
from pasta_gan_tpu.data.warp import route_patches_512_batch

from test_v19_routing import _StubV19, _load_ref_dataset

cv2 = pytest.importorskip("cv2")

H, W = 512, 512  # 512x320 white-padded to square (dataset.py:1616)


def _kps_512(rng, B=1):
    """Keypoints in the PADDED 512x512 frame (x offset by 96 already), as the
    512 test dataset stores them (dataset.py:1623)."""
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
        # scale the 256x192 skeleton into the 512x320 frame, then pad by 96
        kps[:, i, 0] = x * (320.0 / 192.0) + 96 + rng.normal(0, 8, B)
        kps[:, i, 1] = y * 2.0 + rng.normal(0, 8, B)
        kps[:, i, 2] = 0.9
    return kps


def _smooth_u8(rng, shape):
    x = rng.uniform(0, 255, (shape[0] // 8, shape[1] // 8, shape[2]))
    return np.clip(
        cv2.resize(x, (shape[1], shape[0]), interpolation=cv2.INTER_LINEAR), 0, 255
    ).astype(np.uint8)


def _rect_mask_u8(y0, y1, x0, x1):
    m = np.zeros((H, W, 1), np.uint8)
    m[y0:y1, x0:x1] = 255
    return m


def _stub_512(ref_dataset):
    stub = _StubV19()
    cls = ref_dataset.UvitonDatasetFull_512_test
    stub.valid_joints = cls.valid_joints.__get__(stub)
    stub.get_crop = cls.get_crop.__get__(stub)
    return stub, cls


def _synthetic_scene(seed):
    rng = np.random.default_rng(seed)
    p_kps = _kps_512(rng)
    g_kps = _kps_512(rng)
    p_up_mask = _rect_mask_u8(120, 300, 160, 360)
    p_low_mask = _rect_mask_u8(270, 500, 180, 340)
    g_up_mask = _rect_mask_u8(110, 310, 150, 370)
    g_low_mask = _rect_mask_u8(260, 490, 170, 350)
    p_img = _smooth_u8(rng, (H, W, 3))
    g_img = _smooth_u8(rng, (H, W, 3))
    return dict(
        p_kps=p_kps, g_kps=g_kps,
        p_up=p_img * (p_up_mask > 0), p_low=p_img * (p_low_mask > 0),
        g_up=g_img * (g_up_mask > 0), g_low=g_img * (g_low_mask > 0),
        p_up_mask=p_up_mask, p_low_mask=p_low_mask,
        g_up_mask=g_up_mask, g_low_mask=g_low_mask,
    )


def _run_ours(s, region):
    def f32(x):
        return jnp.asarray(x[None], jnp.float32) / 255.0

    return route_patches_512_batch(
        f32(s["p_up"]), f32(s["p_low"]), f32(s["p_up_mask"]), f32(s["p_low_mask"]),
        f32(s["g_up"]), f32(s["g_low"]), f32(s["g_up_mask"]), f32(s["g_low_mask"]),
        jnp.asarray(s["p_kps"]), jnp.asarray(s["g_kps"]),
        change_region=region, box_factor=2,
        pad_x=0.0,  # keypoints already padded (512 dataset convention)
    )


def _assert_close(ours, ref_tuple):
    ref_norm, ref_norm_lower, ref_dn_up, ref_dn_low = ref_tuple
    np.testing.assert_allclose(
        np.asarray(ours.norm_img[0]) * 255.0, ref_norm.astype(np.float32),
        atol=16.0, rtol=0,
    )
    assert np.mean(np.abs(np.asarray(ours.norm_img[0]) * 255.0 - ref_norm)) < 0.5
    np.testing.assert_allclose(
        np.asarray(ours.norm_img_lower[0]) * 255.0, ref_norm_lower.astype(np.float32),
        atol=16.0, rtol=0,
    )
    for ours_dn, ref_dn in (
        (np.asarray(ours.denorm_upper_img[0]) * 255.0, ref_dn_up),
        (np.asarray(ours.denorm_lower_img[0]) * 255.0, ref_dn_low),
    ):
        diff = np.abs(ours_dn - ref_dn.astype(np.float32))
        frac_bad = float(np.mean(diff > 10.0))
        assert frac_bad < 0.01, f"denorm mismatch fraction {frac_bad}"
        assert float(np.mean(diff)) < 1.0


@pytest.mark.slow
@pytest.mark.parametrize("region", ["fullbody", "upperbody", "lowerbody"])
def test_route_512_matches_reference_normalize(region):
    ref_dataset = _load_ref_dataset()
    stub, cls = _stub_512(ref_dataset)
    s = _synthetic_scene(seed=23)

    m3 = lambda m: np.repeat(m, 3, axis=2)
    if region == "fullbody":
        ref = cls.normalize_full.__get__(stub)(
            s["g_up"], s["g_low"], m3(s["g_up_mask"]), m3(s["g_low_mask"]),
            s["g_kps"][0], s["p_kps"][0], 2,
        )
    elif region == "upperbody":
        ref = cls.normalize_upper.__get__(stub)(
            s["g_up"], s["p_low"], m3(s["g_up_mask"]), m3(s["p_low_mask"]),
            s["g_kps"][0], s["p_kps"][0], 2,
        )
    else:
        ref = cls.normalize_lower.__get__(stub)(
            s["p_up"], s["g_low"], m3(s["p_up_mask"]), m3(s["g_low_mask"]),
            s["g_kps"][0], s["p_kps"][0], 2,
        )

    ours = _run_ours(s, region)
    assert ours.norm_img.shape == (1, 128, 128, 30)
    assert ours.norm_img_lower.shape == (1, 128, 128, 15)
    _assert_close(ours, ref)
    assert float(np.sum(np.asarray(ours.denorm_upper_img))) > 0
    assert float(np.sum(np.asarray(ours.denorm_lower_img))) > 0


@pytest.mark.slow
def test_regions_differ():
    """upper/lower region selection routes different sources — the zeroing
    approximation this replaced could not produce different norm stacks."""
    s = _synthetic_scene(seed=31)
    full = _run_ours(s, "fullbody")
    upper = _run_ours(s, "upperbody")
    lower = _run_ours(s, "lowerbody")
    # fullbody and upperbody share the upper stack but not the lower one
    np.testing.assert_allclose(
        np.asarray(full.norm_img), np.asarray(upper.norm_img), atol=1e-6
    )
    assert float(np.mean(np.abs(np.asarray(full.norm_img_lower)
                                - np.asarray(upper.norm_img_lower)))) > 1e-3
    # lowerbody swaps the upper source to the person's own clothes
    assert float(np.mean(np.abs(np.asarray(full.norm_img)
                                - np.asarray(lower.norm_img)))) > 1e-3


@pytest.mark.slow
def test_prepare_tryon_batch_512_drives_generator512():
    import jax

    from pasta_gan_tpu.data.dataset import (
        SyntheticUvitonDataset, collate, prepare_tryon_batch_512)
    from pasta_gan_tpu.models import Generator512, cat_feats_dict

    ds = SyntheticUvitonDataset(num_samples=2)
    person = collate([ds[0], ds[1]])
    garment = collate([ds[1], ds[0]])
    batch = prepare_tryon_batch_512(
        person, garment, change_region="upperbody", pad_x=32.0
    )
    assert batch["style_input"].shape == (2, 64, 64, 45)
    assert batch["pose"].shape == (2, 256, 256, 6)
    for k, v in batch.items():
        assert np.all(np.isfinite(np.asarray(v))), k

    gen = Generator512(
        img_resolution=256, channel_base=2048, channel_max=64,
        mapping_layers=1, style_input_nc=45,
    )
    rng = jax.random.PRNGKey(0)
    variables = gen.init(
        {"params": rng, "noise": rng},
        None, batch["style_input"], batch["retain"], batch["pose"],
        batch["denorm_upper_img"], batch["denorm_lower_img"],
        batch["denorm_upper_mask"], batch["denorm_lower_mask"],
        noise_mode="none",
    )
    img, finetune, _ = gen.apply(
        variables, None, batch["style_input"], batch["retain"], batch["pose"],
        batch["denorm_upper_img"], batch["denorm_lower_img"],
        batch["denorm_upper_mask"], batch["denorm_lower_mask"],
        noise_mode="none",
    )
    assert finetune.shape == (2, 256, 256, 3)
    assert np.all(np.isfinite(np.asarray(finetune)))

"""Conditional-metrics preprocessing (reference `training/dataset.py:279-420`):
part-image builders and radius-disc pose heatmaps, checked against
independent brute-force oracles on synthetic parsing maps."""

import json
import os

import numpy as np
import pytest

from pasta_gan_tpu.data.parts import (
    HEAD_PART_LABELS,
    PANT_PART_LABELS,
    TOP_PART_LABELS,
    PartsFolderDataset,
    build_part_images,
    build_part_masks,
    pose_disc_heatmap,
    sanitize_openpose_keypoints,
    square_pad,
)


def _synthetic_parsing(h=96, w=64, seed=0):
    rng = np.random.RandomState(seed)
    parsing = np.zeros((h, w), np.uint8)
    # blocks of the LIP labels the builders consume, plus distractors
    for label, (y0, y1, x0, x1) in {
        2: (0, 16, 16, 48),     # hair (head)
        13: (4, 12, 24, 40),    # face (head)
        5: (20, 44, 8, 56),     # upper clothes (top)
        7: (30, 40, 0, 8),      # coat (top)
        9: (48, 80, 12, 52),    # pants (pant)
        18: (80, 92, 10, 30),   # shoe (pant group)
        14: (40, 48, 2, 12),    # left hand
        15: (40, 48, 52, 62),   # right hand
        16: (60, 90, 0, 6),     # leg (not in any part group)
    }.items():
        parsing[y0:y1, x0:x1] = label
    # speckle of background
    parsing[rng.uniform(size=parsing.shape) > 0.995] = 1
    return parsing


def _keypoints(h=96, w=64):
    kps = np.zeros((18, 3), np.float32)
    kps[:, 0] = np.linspace(8, w - 8, 18)
    kps[:, 1] = np.linspace(8, h - 8, 18)
    kps[:, 2] = 0.9
    # arm chains used by the palm rectangles: shoulder/elbow/wrist
    kps[2] = [w - 10, 30, 0.9]
    kps[3] = [w - 8, 40, 0.9]
    kps[4] = [w - 6, 46, 0.9]
    kps[5] = [10, 30, 0.9]
    kps[6] = [8, 40, 0.9]
    kps[7] = [6, 46, 0.9]
    return kps


def test_square_pad_centering():
    x = np.ones((96, 64, 3), np.float32)
    p = square_pad(x)
    assert p.shape == (96, 96, 3)
    left = (96 - 64) // 2
    assert p[:, :left].sum() == 0 and p[:, left + 64 :].sum() == 0
    assert np.array_equal(p[:, left : left + 64], x)
    # h < w pads rows on top
    x2 = np.ones((64, 96), np.float32)
    p2 = square_pad(x2)
    assert p2.shape == (96, 96)
    top = (96 - 64) // 2
    assert p2[:top].sum() == 0 and np.array_equal(p2[top : top + 64], x2)


def test_part_masks_label_groups():
    parsing = _synthetic_parsing()
    kps = _keypoints()
    masks = build_part_masks(parsing, kps)
    S = max(parsing.shape)
    pad_left = (S - parsing.shape[1]) // 2

    padded = np.zeros((S, S), parsing.dtype)
    padded[:, pad_left : pad_left + parsing.shape[1]] = parsing

    for name, labels in (
        ("head", HEAD_PART_LABELS),
        ("top", TOP_PART_LABELS),
        ("pant", PANT_PART_LABELS),
    ):
        oracle = np.isin(padded, labels).astype(np.float32)[..., None]
        np.testing.assert_array_equal(masks[name], oracle, err_msg=name)

    # palm is a subset of hand parsing, nonempty for in-image hands
    hands = np.isin(padded, (14, 15)).astype(np.float32)[..., None]
    assert masks["palm"].max() <= 1.0
    assert np.all(masks["palm"] <= hands + 1e-6)


def test_part_images_mask_multiplication():
    parsing = _synthetic_parsing()
    kps = _keypoints()
    img = np.random.RandomState(1).uniform(0, 255, (96, 96, 3)).astype(np.float32)
    head, top, pant, palm = build_part_images(img, parsing, kps)
    masks = build_part_masks(parsing, kps)
    np.testing.assert_array_equal(head, img * masks["head"])
    np.testing.assert_array_equal(top, img * masks["top"])
    np.testing.assert_array_equal(pant, img * masks["pant"])
    np.testing.assert_array_equal(palm, img * masks["palm"])
    # parts are disjoint from background: a pixel outside every group is 0
    bg = (masks["head"] + masks["top"] + masks["pant"] + masks["palm"]) == 0
    assert np.all(head[np.broadcast_to(bg, head.shape)] == 0)


def test_pose_disc_heatmap_semantics():
    h, w, sigma = 96, 64, 8
    kps = _keypoints(h, w)
    kps[3, 2] = -1  # invalidated channel
    hm = pose_disc_heatmap(kps, (h, w), sigma=sigma)
    S = max(h, w)
    assert hm.shape == (S, S, 18)
    assert hm[..., 3].sum() == 0

    # brute-force oracle in PADDED coordinates
    pad_left = (S - w) // 2
    ys, xs = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    for k in (0, 4, 9, 17):
        px, py = kps[k, 0] + pad_left, kps[k, 1]
        oracle = (((xs - px) ** 2 + (ys - py) ** 2) < sigma**2).astype(np.uint8)
        # padding happens AFTER rasterization: discs clipped at the original
        # frame keep their clip (reference pads the rasterized map)
        oracle[:, :pad_left] = 0
        oracle[:, pad_left + w :] = 0
        np.testing.assert_array_equal(hm[..., k], oracle, err_msg=str(k))


def test_sanitize_openpose_keypoints():
    raw = [10, 20, 0.5, -3, 15, 0.9, 12, 0, 0.8, 5, 5, 0.001]
    kps = sanitize_openpose_keypoints(raw)
    assert kps.shape == (4, 3)
    assert kps[0, 2] == 0.5
    assert (kps[1:, 2] == -1).all()


def test_parts_folder_dataset(tmp_path):
    import PIL.Image

    h, w = 96, 64
    parsing = _synthetic_parsing(h, w)
    kps = _keypoints(h, w)
    rng = np.random.RandomState(0)
    for i in range(2):
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        stem = os.path.join(tmp_path, f"img{i}")
        PIL.Image.fromarray(img).save(stem + ".jpg")
        PIL.Image.fromarray(parsing).save(stem + "_label.png")
        flat = kps.copy()
        with open(stem + "_keypoints.json", "w") as f:
            json.dump({"people": [{"pose_keypoints_2d": flat.reshape(-1).tolist()}]}, f)

    ds = PartsFolderDataset(str(tmp_path))
    assert len(ds) == 2
    item = ds[0]
    S = max(h, w)
    assert item["image"].shape == (S, S, 3)
    assert item["pose_heatmap"].shape == (S, S, 18)
    for k in ("head_img", "top_img", "pant_img", "palm_img"):
        assert item[k].shape == (S, S, 3)
    assert item["head_img"].sum() > 0 and item["top_img"].sum() > 0
    # resolution resize path: the WHOLE conditional stack lands at one size
    ds64 = PartsFolderDataset(str(tmp_path), resolution=64)
    item64 = ds64[0]
    assert item64["image"].shape == (64, 64, 3)
    assert item64["pose_heatmap"].shape == (64, 64, 18)
    for k in ("head_img", "top_img", "pant_img", "palm_img"):
        assert item64[k].shape == (64, 64, 3), (k, item64[k].shape)
    assert item64["head_img"].sum() > 0  # content survives the resize


def test_pose_heatmap_downscale_keeps_all_keypoints(tmp_path):
    """Regression: index-subsampling the disc heatmap dropped whole
    keypoints once the stride exceeded a disc's diameter.  The resize path
    now regenerates discs from rescaled keypoints, so every valid keypoint
    must keep a nonzero channel at ANY downscale factor."""
    import PIL.Image

    h = w = 1024  # resolution=32 -> stride 32 > disc diameter 16 (sigma=8)
    kps = np.full((18, 3), -1.0, np.float32)
    # valid keypoints deliberately placed BETWEEN subsample lines
    for i, (x, y) in enumerate([(48, 48), (500, 300), (900, 700)]):
        kps[i] = (x + 16, y + 16, 0.9)
    stem = os.path.join(tmp_path, "img0")
    PIL.Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(stem + ".jpg")
    with open(stem + "_keypoints.json", "w") as f:
        json.dump({"people": [{"pose_keypoints_2d": kps.reshape(-1).tolist()}]}, f)

    ds = PartsFolderDataset(str(tmp_path), resolution=32, sigma=8)
    hm = ds[0]["pose_heatmap"]
    assert hm.shape == (32, 32, 18)
    per_ch = hm.reshape(-1, 18).sum(0)
    assert (per_ch[:3] > 0).all(), per_ch[:3]
    assert (per_ch[3:] == 0).all()

"""Conditional-metrics preprocessing: per-image garment part images and
radius-disc pose heatmaps.

Reference: `training/dataset.py:279-420` (`ImageFolderDataset`'s
`_load_person_parts_image` / `_load_raw_pose_heatmap` / `cords_to_map`) —
the real-side inputs for conditional metric evaluation: the person image
split into head / top / pant / palm part images by parsing labels (palm
refined by keypoint-derived arm rectangles), and an 18-channel binary
disc heatmap of radius `sigma` around each valid OpenPose keypoint.  Both
are center square-padded to the larger image side.

TPU-first layout: everything here is host-side numpy preprocessing (it
feeds the metrics input pipeline, not the compiled step) and returns NHWC.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from .masks import get_hand_mask, get_palm_mask

# LIP parsing label groups (reference dataset.py:297-300)
HEAD_PART_LABELS = (2, 13)
TOP_PART_LABELS = (5, 6, 7, 11)
PANT_PART_LABELS = (8, 9, 12, 18, 19)
LEFT_HAND_LABEL = 14
RIGHT_HAND_LABEL = 15


def square_pad(x: np.ndarray, value: float = 0.0) -> np.ndarray:
    """Center-pad [H,W,C] to [S,S,C] with S = max(H, W)
    (reference dataset.py:315-330)."""
    h, w = x.shape[:2]
    if h > w:
        left = (h - w) // 2
        pad = [(0, 0), (left, h - w - left)] + [(0, 0)] * (x.ndim - 2)
    elif w > h:
        top = (w - h) // 2
        pad = [(top, w - h - top), (0, 0)] + [(0, 0)] * (x.ndim - 2)
    else:
        return x
    return np.pad(x, pad, mode="constant", constant_values=value)


def build_part_masks(parsing: np.ndarray, keypoints: np.ndarray) -> Dict[str, np.ndarray]:
    """head/top/pant/palm binary masks [H,W,1] from an (unpadded) parsing map.

    Reference `_load_person_parts_image` (dataset.py:279-348): label-group
    masks for head/top/pant; palm = hand parsing minus the keypoint-derived
    arm rectangles (get_hand_mask/get_palm_mask), all computed at native
    resolution then center square-padded.
    """
    if parsing.ndim == 2:
        parsing = parsing[..., None]
    parsing = parsing[..., :1]

    def group(labels):
        m = np.zeros(parsing.shape, np.float32)
        for l in labels:
            m += (parsing == l).astype(np.float32)
        return m

    head = group(HEAD_PART_LABELS)
    top = group(TOP_PART_LABELS)
    pant = group(PANT_PART_LABELS)

    H, W = parsing.shape[:2]
    l_up, l_bot = get_hand_mask(keypoints[[5, 6, 7], :], H, W)
    r_up, r_bot = get_hand_mask(keypoints[[2, 3, 4], :], H, W)
    l_palm = get_palm_mask((parsing == LEFT_HAND_LABEL).astype(np.float32), l_up, l_bot)
    r_palm = get_palm_mask((parsing == RIGHT_HAND_LABEL).astype(np.float32), r_up, r_bot)
    palm = l_palm + r_palm

    out = {}
    for name, m in (("head", head), ("top", top), ("pant", pant), ("palm", palm)):
        out[name] = (square_pad(m) > 0).astype(np.float32)
    return out


def build_part_images(
    person_img: np.ndarray, parsing: np.ndarray, keypoints: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(head_img, top_img, pant_img, palm_img), each [S,S,C].

    `person_img` must already be square-padded (the reference multiplies the
    padded person image by the padded masks, dataset.py:336-346).
    """
    masks = build_part_masks(parsing, keypoints)
    return tuple(person_img * masks[k] for k in ("head", "top", "pant", "palm"))


def pose_disc_heatmap(
    keypoints: np.ndarray, img_size: Tuple[int, int], sigma: float = 8
) -> np.ndarray:
    """Binary radius-disc heatmap [S,S,K] (reference `cords_to_map`,
    dataset.py:384-410): channel k is 1 inside the open disc of radius
    `sigma` around keypoint k, 0 elsewhere; invalid keypoints
    (confidence flag == -1) give an all-zero channel; square-padded.
    """
    h, w = img_size
    K = keypoints.shape[0]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = np.zeros((h, w, K), np.uint8)
    for i, pt in enumerate(keypoints):
        if pt[2] == -1:
            continue
        out[..., i] = ((xs - pt[0]) ** 2 + (ys - pt[1]) ** 2) < sigma**2
    return square_pad(out)


def sanitize_openpose_keypoints(raw: np.ndarray) -> np.ndarray:
    """OpenPose triplets -> [K,3] with invalid points flagged -1
    (reference `get_pose_heatmaps`, dataset.py:412-420: nonpositive
    coordinates or confidence < 0.01 invalidate a keypoint)."""
    kps = np.asarray(raw, np.float32).reshape(-1, 3).copy()
    invalid = (kps[:, 0] <= 0) | (kps[:, 1] <= 0) | (kps[:, 2] < 0.01)
    kps[invalid, 2] = -1
    return kps


class PartsFolderDataset:
    """Folder-of-images real source with conditional part images + heatmaps.

    Reference `ImageFolderDataset` (dataset.py:168-420): images under
    `root`, per-image parsing maps `<stem>_label.png` (or under a sibling
    `parsing/` dir) and OpenPose JSON `<stem>_keypoints.json` (or under
    `keypoints/`).  Items are dicts so the metrics pipeline can feed either
    plain images or the conditional stack.
    """

    def __init__(self, root: str, resolution: Optional[int] = None, sigma: int = 8):
        import PIL.Image  # noqa: F401  (decode dependency surfaced early)

        self.root = root
        self.resolution = resolution
        self.sigma = sigma
        exts = (".png", ".jpg", ".jpeg")
        self.fnames = sorted(
            os.path.join(r, f)
            for r, _, files in os.walk(root)
            for f in files
            if f.lower().endswith(exts)
            and not f.lower().endswith(("_label.png", "_mask.png"))
        )
        if not self.fnames:
            raise FileNotFoundError(f"no images under {root}")

    def __len__(self):
        return len(self.fnames)

    def _sibling(self, fname: str, suffix: str, subdir: str) -> Optional[str]:
        stem = os.path.splitext(fname)[0]
        cand = stem + suffix
        if os.path.exists(cand):
            return cand
        rel = os.path.relpath(fname, self.root)
        cand = os.path.join(self.root, subdir, os.path.splitext(rel)[0] + suffix)
        return cand if os.path.exists(cand) else None

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import PIL.Image

        fname = self.fnames[idx]
        img = np.asarray(PIL.Image.open(fname).convert("RGB"), np.uint8)
        item: Dict[str, np.ndarray] = {}

        parsing_path = self._sibling(fname, "_label.png", "parsing")
        kps_path = self._sibling(fname, "_keypoints.json", "keypoints")
        kps = None
        if kps_path is not None:
            with open(kps_path) as f:
                data = json.load(f)
            kps = sanitize_openpose_keypoints(
                np.asarray(data["people"][0]["pose_keypoints_2d"], np.float32)
            )
            item["pose_heatmap"] = pose_disc_heatmap(kps, img.shape[:2], self.sigma)
            item["keypoints"] = kps

        padded = square_pad(img.astype(np.float32))
        if parsing_path is not None and kps is not None:
            parsing = np.asarray(PIL.Image.open(parsing_path), np.uint8)
            if parsing.ndim == 3:
                parsing = parsing[..., 0]
            head, top, pant, palm = build_part_images(padded, parsing, kps)
            item.update(head_img=head, top_img=top, pant_img=pant, palm_img=palm)

        if self.resolution is not None and padded.shape[0] != self.resolution:
            # the whole conditional stack must land at one size — resizing
            # only the image would leave part images / heatmaps at the
            # padded native size and break batching
            def _resize(a: np.ndarray) -> np.ndarray:
                pil = PIL.Image.fromarray(np.asarray(a, np.uint8))
                return np.asarray(
                    pil.resize((self.resolution, self.resolution), PIL.Image.LANCZOS),
                    np.float32,
                )

            S = padded.shape[0]
            padded = _resize(padded)
            for k in ("head_img", "top_img", "pant_img", "palm_img"):
                if k in item:
                    item[k] = _resize(item[k]).astype(np.asarray(item[k]).dtype)
            if "pose_heatmap" in item:
                # Regenerate the discs at the target resolution from the
                # rescaled keypoints: index-subsampling can skip a whole disc
                # when the stride exceeds its diameter, silently dropping
                # keypoints from the heatmap.  Offsets replay square_pad's
                # centering; sigma scales with the canvas so disc coverage
                # matches the native-resolution map.
                h0, w0 = img.shape[:2]
                scale = self.resolution / S
                kp = kps.copy()
                valid = kp[:, 2] != -1
                kp[valid, 0] = (kp[valid, 0] + (S - w0) // 2) * scale
                kp[valid, 1] = (kp[valid, 1] + (S - h0) // 2) * scale
                hm = pose_disc_heatmap(
                    kp, (self.resolution, self.resolution),
                    max(self.sigma * scale, 1.0),
                )
                # the native map clips discs at the unpadded image bounds
                # before padding — zero the padding region to match
                y0 = int(round((S - h0) // 2 * scale))
                x0 = int(round((S - w0) // 2 * scale))
                y1 = int(round(((S - h0) // 2 + h0) * scale))
                x1 = int(round(((S - w0) // 2 + w0) * scale))
                keep = np.zeros_like(hm)
                keep[y0:y1, x0:x1] = hm[y0:y1, x0:x1]
                item["pose_heatmap"] = keep
        item["image"] = padded.astype(np.uint8)
        return item

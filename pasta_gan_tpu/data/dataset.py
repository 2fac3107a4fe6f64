"""Datasets + the device-side batch preparation.

Counterpart of `training/dataset.py` (UvitonDatasetFull `:426-993`,
UvitonDatasetV19_test `:997-1524`), redesigned TPU-first:

* Host side (DataLoader workers / grain): decode images, parse keypoints,
  rasterize the stickman, build parsing masks — cheap per-sample work.
* Device side (`prepare_train_batch` / `prepare_tryon_batch`): ALL patch
  routing (the reference's 20 cv2.warpPerspective calls per sample) runs as
  batched jitted warps, plus normalization and the random-erasure
  augmentation.  This moves the reference's input-pipeline bottleneck
  (SURVEY.md section 3.1) onto the TPU.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from . import masks as masks_mod
from . import stickman
from .warp import (
    route_patches_512_batch,
    route_patches_batch,
    route_patches_mix_batch,
    route_patches_transfer_batch,
    route_patches_v19_batch,
)

# ----------------------------------------------------------------- host side


def pad_to_square(img: np.ndarray, value: int) -> tuple[np.ndarray, int]:
    """White-pad 256x192 -> 256x256 (reference dataset.py:515-524). Returns
    (padded, left_padding)."""
    h, w = img.shape[:2]
    left = (h - w) // 2
    right = h - w - left
    if img.ndim == 2:
        img = img[..., None]
    out = np.pad(img, ((0, 0), (left, right), (0, 0)), constant_values=value)
    return out, left


def load_sample(
    image_path: str,
    keypoints_path: str,
    parsing_path: str,
    size: tuple[int, int] = (256, 192),
) -> Dict[str, np.ndarray]:
    """Decode one person record into the host-side sample dict.

    `size` is the native (H, W) frame — (256, 192) for the 256 layout,
    (512, 320) for the 512 test layout (reference dataset.py:1878)."""
    import PIL.Image

    image = np.asarray(PIL.Image.open(image_path).convert("RGB"))
    image, left = pad_to_square(image, 255)

    keypoints = stickman.load_keypoints(keypoints_path)
    # the reference draws on the unpadded HxW then zero-pads (dataset.py:529-530)
    pose = stickman.draw_pose_from_cords(keypoints, size)
    pose, _ = pad_to_square(pose, 0)

    parsing = np.asarray(PIL.Image.open(parsing_path))
    if parsing.ndim == 3:
        parsing = parsing[..., 0]
    parsing, _ = pad_to_square(parsing.astype(np.uint8), 0)

    # keypoints are in unpadded coords; palm geometry offsets by left padding,
    # patch routing adds pad_x=left internally via part_transforms(pad_x).
    kps_padded = keypoints.copy()
    kps_padded[:, 0] += left
    m = masks_mod.build_sample_masks(kps_padded, parsing)

    return dict(
        image=image.astype(np.uint8),
        pose=pose.astype(np.uint8),
        keypoints=keypoints.astype(np.float32),  # UNPADDED coords (routing adds pad_x)
        retain_mask=m["retain"].astype(np.uint8),
        upper_mask=m["upper"].astype(np.uint8),
        lower_mask=m["lower"].astype(np.uint8),
        lower_test_mask=m["lower_test"].astype(np.uint8),
        gt_parsing=m["gt_parsing"][..., 0].astype(np.uint8),
        left_padding=np.int32(left),
    )


class UvitonDatasetFull:
    """Training dataset over the UPT 256x192 layout (reference dataset.py:426-486).

    Walks {Zalando,Zalora,Deepfashion,MPV}_256_192/train_pairs_front_list_0508.txt.
    """

    DATASETS = ["Zalando_256_192", "Zalora_256_192", "Deepfashion_256_192", "MPV_256_192"]

    def __init__(self, path: str, max_size: Optional[int] = None, random_seed: int = 0):
        self._path = path
        self._records: List[tuple[str, str, str]] = []
        for ds in self.DATASETS:
            txt = os.path.join(path, ds, "train_pairs_front_list_0508.txt")
            if not os.path.exists(txt):
                continue
            with open(txt) as f:
                for line in f:
                    person = line.strip().split()[0]
                    img = os.path.join(path, ds, "image", person)
                    kpt = os.path.join(
                        path, ds, "keypoints", person.replace(".jpg", "_keypoints.json")
                    )
                    suffix = ".png" if ds == "MPV_256_192" else "_label.png"
                    par = os.path.join(
                        path, ds, "parsing", person.replace(".jpg", suffix)
                    )
                    self._records.append((img, kpt, par))
        if not self._records:
            raise IOError(f"no training records found under {path}")
        if max_size is not None:
            self._records = self._records[:max_size]

        acgpn_dir = os.path.join(path, "train_random_mask_acgpn")
        self._acgpn_fnames = (
            sorted(os.path.join(acgpn_dir, f) for f in os.listdir(acgpn_dir))
            if os.path.isdir(acgpn_dir)
            else []
        )
        self._rng = np.random.default_rng(random_seed)

    def __len__(self):
        return len(self._records)

    def _load_acgpn_mask(self, idx: int) -> np.ndarray:
        if not self._acgpn_fnames:
            return np.zeros((256, 256, 1), np.uint8)
        import PIL.Image

        fname = self._acgpn_fnames[idx % len(self._acgpn_fnames)]
        m = np.asarray(PIL.Image.open(fname).convert("L").resize((256, 256)))
        return (m[..., None] > 0).astype(np.uint8)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        img, kpt, par = self._records[idx]
        sample = load_sample(img, kpt, par)
        sample["acgpn_mask"] = self._load_acgpn_mask(idx)
        return sample


class UvitonDataset256Test:
    """Unpaired 256 test pairs (reference UvitonDatasetV19_test, dataset.py:997-1035):
    person/garment pairs from UPT_subset*/test_pairs_front_list_shuffle_0508.txt."""

    SUBSETS = ["UPT_subset1_256_192", "UPT_subset2_256_192"]

    def __init__(self, path: str, max_size: Optional[int] = None):
        self._path = path
        self._pairs: List[tuple] = []
        for ds in self.SUBSETS:
            txt = os.path.join(path, ds, "test_pairs_front_list_shuffle_0508.txt")
            if not os.path.exists(txt):
                continue
            with open(txt) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) < 2:
                        continue
                    person, garment = parts[0], parts[1]
                    self._pairs.append((ds, person, garment))
        if not self._pairs:
            raise IOError(f"no test pairs found under {path}")
        if max_size is not None:
            self._pairs = self._pairs[:max_size]

    def __len__(self):
        return len(self._pairs)

    def _record(self, ds: str, person: str):
        base = os.path.join(self._path, ds)
        return (
            os.path.join(base, "image", person),
            os.path.join(base, "keypoints", person.replace(".jpg", "_keypoints.json")),
            os.path.join(base, "parsing", person.replace(".jpg", "_label.png")),
        )

    def __getitem__(self, idx: int):
        ds, person, garment = self._pairs[idx]
        p = load_sample(*self._record(ds, person))
        g = load_sample(*self._record(ds, garment))
        return dict(person=p, garment=g, person_name=person, garment_name=garment)


class UvitonDataset512Test:
    """Unpaired 512x320 test pairs (reference UvitonDatasetFull_512_test,
    `dataset.py:1528-1692`): person/garment pairs under the *_512_320 layout
    with `change_region` selecting which garment pieces route (fullbody /
    upperbody / lowerbody; lower-body uses parts {0, 6..9}, dataset.py:2023)."""

    SUBSETS = ["UPT_subset1_512_320", "UPT_subset2_512_320"]

    def __init__(self, path: str, change_region: str = "fullbody",
                 max_size: Optional[int] = None):
        assert change_region in ("fullbody", "upperbody", "lowerbody")
        self._path = path
        self.change_region = change_region
        self._pairs: List[tuple] = []
        for ds in self.SUBSETS:
            txt = os.path.join(path, ds, "test_pairs_front_list_shuffle_0508.txt")
            if not os.path.exists(txt):
                continue
            with open(txt) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) >= 2:
                        self._pairs.append((ds, parts[0], parts[1]))
        if not self._pairs:
            raise IOError(f"no 512 test pairs found under {path}")
        if max_size is not None:
            self._pairs = self._pairs[:max_size]

    def __len__(self):
        return len(self._pairs)

    def _record(self, ds: str, person: str):
        base = os.path.join(self._path, ds)
        return (
            os.path.join(base, "image", person),
            os.path.join(base, "keypoints", person.replace(".jpg", "_keypoints.json")),
            os.path.join(base, "parsing", person.replace(".jpg", "_label.png")),
        )

    def __getitem__(self, idx: int):
        ds, person, garment = self._pairs[idx]
        p = load_sample(*self._record(ds, person), size=(512, 320))
        g = load_sample(*self._record(ds, garment), size=(512, 320))
        return dict(person=p, garment=g, person_name=person, garment_name=garment,
                    change_region=self.change_region)


class SyntheticUvitonDataset:
    """Deterministic synthetic person fixture: plausible keypoints + simple
    parsing geometry, for tests/smoke-training without the real UPT data
    (SURVEY.md section 4: '2-sample CPU-dataset fixture with synthetic
    keypoints/parsing')."""

    BASE_KPS = {
        0: (96, 40), 1: (96, 70), 2: (70, 72), 3: (60, 105), 4: (56, 140),
        5: (122, 72), 6: (132, 105), 7: (136, 140), 8: (78, 140), 9: (74, 190),
        10: (72, 235), 11: (114, 140), 12: (118, 190), 13: (120, 235),
        14: (90, 34), 15: (102, 34), 16: (84, 38), 17: (108, 38),
    }

    def __init__(self, num_samples: int = 8, resolution: int = 256, seed: int = 0):
        self.n = num_samples
        self.res = resolution
        self.seed = seed

    def __len__(self):
        return self.n

    def _keypoints(self, rng) -> np.ndarray:
        scale = 192 / 192.0
        kps = np.zeros((18, 3), np.float32)
        for i, (x, y) in self.BASE_KPS.items():
            kps[i] = (x + rng.normal(0, 4), y + rng.normal(0, 4), 0.9)
        return kps * np.asarray([scale, 256 / 256.0, 1.0], np.float32)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        kps = self._keypoints(rng)
        H = W0 = 256  # native frame 256x192 then padded

        parsing = np.zeros((256, 192), np.uint8)

        def rect(x0, y0, x1, y1, label):
            parsing[max(0, int(y0)) : int(y1), max(0, int(x0)) : int(x1)] = label

        # head circle (label 13), torso garment (5), pants (9), arms (14/15),
        # legs (16/17), shoes (18/19)
        cx, cy = int(kps[0][0]), int(kps[0][1])
        yy, xx = np.ogrid[:256, :192]
        parsing[(yy - cy) ** 2 + (xx - cx) ** 2 < 18**2] = 13
        rect(kps[2][0], kps[2][1], kps[5][0], kps[8][1], 5)  # torso
        rect(kps[8][0] - 8, kps[8][1], kps[11][0] + 8, kps[9][1] + 20, 9)  # pants
        rect(kps[3][0] - 6, kps[3][1] - 10, kps[3][0] + 6, kps[4][1], 15)  # r arm
        rect(kps[6][0] - 6, kps[6][1] - 10, kps[6][0] + 6, kps[7][1], 14)  # l arm
        rect(kps[9][0] - 7, kps[9][1] + 20, kps[9][0] + 7, kps[10][1], 16)
        rect(kps[12][0] - 7, kps[12][1] + 20, kps[12][0] + 7, kps[13][1], 17)
        rect(kps[10][0] - 8, kps[10][1], kps[10][0] + 8, 255, 18)
        rect(kps[13][0] - 8, kps[13][1], kps[13][0] + 8, 255, 19)

        # image: colored regions + noise
        colors = rng.integers(40, 215, (20, 3))
        image = np.full((256, 192, 3), 255, np.uint8)
        for label in range(1, 20):
            m = parsing == label
            image[m] = colors[label % 20]
        image = np.clip(
            image.astype(np.int32) + rng.integers(-12, 12, image.shape), 0, 255
        ).astype(np.uint8)

        image_p, left = pad_to_square(image, 255)
        parsing_p, _ = pad_to_square(parsing, 0)
        pose = stickman.draw_pose_from_cords(kps, (256, 192))
        pose_p, _ = pad_to_square(pose, 0)

        kps_padded = kps.copy()
        kps_padded[:, 0] += left
        m = masks_mod.build_sample_masks(kps_padded, parsing_p)

        return dict(
            image=image_p,
            pose=pose_p,
            keypoints=kps,
            retain_mask=m["retain"].astype(np.uint8),
            upper_mask=m["upper"].astype(np.uint8),
            lower_mask=m["lower"].astype(np.uint8),
            lower_test_mask=m["lower_test"].astype(np.uint8),
            gt_parsing=m["gt_parsing"][..., 0].astype(np.uint8),
            acgpn_mask=np.zeros((256, 256, 1), np.uint8),
            left_padding=np.int32(left),
        )


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


# ---------------------------------------------------------------- device side


@partial(jax.jit, static_argnames=("box_factor",))
def prepare_train_batch(host_batch: Dict[str, jnp.ndarray], rng: jax.Array, box_factor: int = 2):
    """Host sample stack -> the train-step batch dict, all heavy work on device.

    Reproduces the reference's tensor assembly
    (`training_loop_wo_flow_fullbody.py:421-475` + `dataset.py:954-993`):
    normalization to [-1,1], patch routing, random hand/ACGPN erasure of the
    denorm garments, pose+head 6ch conditioning.
    """
    image = host_batch["image"].astype(jnp.float32) / 255.0  # [B,256,256,3] in [0,1]
    pose = host_batch["pose"].astype(jnp.float32) / 127.5 - 1.0
    retain_mask = host_batch["retain_mask"].astype(jnp.float32)
    upper_mask = host_batch["upper_mask"].astype(jnp.float32)
    lower_mask = host_batch["lower_mask"].astype(jnp.float32)
    kps = host_batch["keypoints"].astype(jnp.float32)
    acgpn = host_batch["acgpn_mask"].astype(jnp.float32)
    B = image.shape[0]

    upper_img = image * upper_mask
    lower_img = image * lower_mask

    routed = route_patches_batch(
        upper_img, lower_img, upper_mask, lower_mask, kps, box_factor=box_factor
    )

    # ---- random erasure (dataset.py:954-979): hand masks each kept with
    # p(all)=0.4 then p(each)=0.5; ACGPN mask with p=0.9.
    k1, k2, k3 = jax.random.split(rng, 3)
    use_hands = (jax.random.uniform(k1, (B, 1, 1, 1)) < 0.4).astype(jnp.float32)
    hand_sel = (jax.random.uniform(k2, (B, 4, 1, 1, 1)) < 0.5).astype(jnp.float32)
    hand_mask = jnp.sum(routed.denorm_hand_masks * hand_sel, axis=1) * use_hands
    use_acgpn = (jax.random.uniform(k3, (B, 1, 1, 1)) < 0.9).astype(jnp.float32)
    erase = ((hand_mask + acgpn * use_acgpn) > 0).astype(jnp.float32)

    denorm_upper = routed.denorm_upper_img * (1.0 - erase)
    denorm_lower = routed.denorm_lower_img * (1.0 - erase)
    denorm_upper_mask = (
        jnp.sum(denorm_upper, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)
    denorm_lower_mask = (
        jnp.sum(denorm_lower, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)

    real = image * 2.0 - 1.0
    head = retain_mask * real - (1.0 - retain_mask)
    pose6 = jnp.concatenate([pose, head], axis=-1)
    style_input = (
        jnp.concatenate([routed.norm_img, routed.norm_img_lower], axis=-1) * 2.0 - 1.0
    )

    return {
        "real_img": real,
        "style_input": style_input,
        "retain": head,
        "pose": pose6,
        "denorm_upper_img": denorm_upper * 2.0 - 1.0,
        "denorm_lower_img": denorm_lower * 2.0 - 1.0,
        "denorm_upper_mask": denorm_upper_mask,
        "denorm_lower_mask": denorm_lower_mask,
        "gt_parsing": host_batch["gt_parsing"].astype(jnp.int32),
    }


@partial(jax.jit, static_argnames=("box_factor",))
def prepare_tryon_batch(person: Dict[str, jnp.ndarray], garment: Dict[str, jnp.ndarray],
                        box_factor: int = 2):
    """Unpaired try-on batch (reference dataset.py:1080-1153,1428-1523):
    garment patches re-projected into the person's pose; person keeps only
    retain regions."""
    p_img = person["image"].astype(jnp.float32) / 255.0
    g_img = garment["image"].astype(jnp.float32) / 255.0
    p_pose = person["pose"].astype(jnp.float32) / 127.5 - 1.0
    p_retain = person["retain_mask"].astype(jnp.float32)

    p_lower_mask = person.get("lower_test_mask", person["lower_mask"]).astype(jnp.float32)
    routed = route_patches_transfer_batch(
        g_img * garment["upper_mask"].astype(jnp.float32),
        p_img * p_lower_mask,
        garment["upper_mask"].astype(jnp.float32),
        p_lower_mask,
        garment["keypoints"].astype(jnp.float32),
        person["keypoints"].astype(jnp.float32),
        box_factor=box_factor,
    )

    denorm_upper_mask = (
        jnp.sum(routed.denorm_upper_img, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)
    denorm_lower_mask = (
        jnp.sum(routed.denorm_lower_img, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)

    p_real = p_img * 2.0 - 1.0
    head = p_retain * p_real - (1.0 - p_retain)
    pose6 = jnp.concatenate([p_pose, head], axis=-1)
    style_input = (
        jnp.concatenate([routed.norm_img, routed.norm_img_lower], axis=-1) * 2.0 - 1.0
    )

    return {
        "style_input": style_input,
        "retain": head,
        "pose": pose6,
        "denorm_upper_img": routed.denorm_upper_img * 2.0 - 1.0,
        "denorm_lower_img": routed.denorm_lower_img * 2.0 - 1.0,
        "denorm_upper_mask": denorm_upper_mask,
        "denorm_lower_mask": denorm_lower_mask,
        "person_img": p_real,
    }


@partial(jax.jit, static_argnames=("box_factor", "swap"))
def prepare_tryon_grid_batch(person: Dict[str, jnp.ndarray], garment: Dict[str, jnp.ndarray],
                             swap: str = "upper", box_factor: int = 2):
    """Cross-pair batch for the snapshot try-on grid (reference
    `training_loop_wo_flow_fullbody.py:36-178`): the person's body with the
    garment provider's upper ("upper"), lower ("lower"), or both ("full")
    garments, built from TRAINING-path samples (so the same fixed vis set
    feeds both the plain fakes grid and the swap matrix)."""
    p_img = person["image"].astype(jnp.float32) / 255.0
    g_img = garment["image"].astype(jnp.float32) / 255.0
    p_pose = person["pose"].astype(jnp.float32) / 127.5 - 1.0
    p_retain = person["retain_mask"].astype(jnp.float32)
    p_up = person["upper_mask"].astype(jnp.float32)
    p_lo = person["lower_mask"].astype(jnp.float32)
    g_up = garment["upper_mask"].astype(jnp.float32)
    g_lo = garment["lower_mask"].astype(jnp.float32)

    routed = route_patches_mix_batch(
        p_img * p_up, p_img * p_lo, p_up, p_lo,
        g_img * g_up, g_img * g_lo, g_up, g_lo,
        person["keypoints"].astype(jnp.float32),
        garment["keypoints"].astype(jnp.float32),
        swap=swap, box_factor=box_factor,
    )

    denorm_upper_mask = (
        jnp.sum(routed.denorm_upper_img, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)
    denorm_lower_mask = (
        jnp.sum(routed.denorm_lower_img, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)

    p_real = p_img * 2.0 - 1.0
    head = p_retain * p_real - (1.0 - p_retain)
    pose6 = jnp.concatenate([p_pose, head], axis=-1)
    style_input = (
        jnp.concatenate([routed.norm_img, routed.norm_img_lower], axis=-1) * 2.0 - 1.0
    )

    return {
        "style_input": style_input,
        "retain": head,
        "pose": pose6,
        "denorm_upper_img": routed.denorm_upper_img * 2.0 - 1.0,
        "denorm_lower_img": routed.denorm_lower_img * 2.0 - 1.0,
        "denorm_upper_mask": denorm_upper_mask,
        "denorm_lower_mask": denorm_lower_mask,
        "person_img": p_real,
    }


@partial(jax.jit, static_argnames=("box_factor",))
def prepare_tryon_batch_v18(person: Dict[str, jnp.ndarray], garment: Dict[str, jnp.ndarray],
                            box_factor: int = 2):
    """The released-256 checkpoint's batch (reference `test.py:103-128` over
    `UvitonDatasetV19_test.__getitem__`, dataset.py:1503-1523):

    * style_input: 60ch = norm_img(30: garment upper patches + the person's
      own lower patches) ⊕ norm_pose(30: the matching warped stickmen);
    * retain: the person image keeping ONLY palm+head+shoes pixels
      (dataset.py:1117) — zeros elsewhere map to -1 after normalization;
    * pose: person stickman ⊕ retain (6ch);
    * denorms re-projected into the person pose with eroded upper masks.
    """
    p_img = person["image"].astype(jnp.float32) / 255.0
    g_img = garment["image"].astype(jnp.float32) / 255.0
    p_pose = person["pose"].astype(jnp.float32) / 255.0
    g_pose = garment["pose"].astype(jnp.float32) / 255.0
    p_retain = person["retain_mask"].astype(jnp.float32)
    g_upper_mask = garment["upper_mask"].astype(jnp.float32)
    p_lower_mask = person.get("lower_test_mask", person["lower_mask"]).astype(jnp.float32)

    routed = route_patches_v19_batch(
        g_img * g_upper_mask,
        g_upper_mask,
        g_pose,
        p_img * p_lower_mask,
        p_lower_mask,
        p_pose,
        garment["keypoints"].astype(jnp.float32),
        person["keypoints"].astype(jnp.float32),
        box_factor=box_factor,
    )

    denorm_upper_mask = (
        jnp.sum(routed.denorm_upper_img, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)
    denorm_lower_mask = (
        jnp.sum(routed.denorm_lower_img, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)

    p_real = p_img * 2.0 - 1.0
    retain = p_retain * p_real - (1.0 - p_retain)  # == masked image /127.5-1
    pose6 = jnp.concatenate([p_pose * 2.0 - 1.0, retain], axis=-1)
    style_input = (
        jnp.concatenate([routed.norm_img, routed.norm_pose], axis=-1) * 2.0 - 1.0
    )

    return {
        "style_input": style_input,
        "retain": retain,
        "pose": pose6,
        "denorm_upper_img": routed.denorm_upper_img * 2.0 - 1.0,
        "denorm_lower_img": routed.denorm_lower_img * 2.0 - 1.0,
        "denorm_upper_mask": denorm_upper_mask,
        "denorm_lower_mask": denorm_lower_mask,
        "person_img": p_real,
    }


@partial(jax.jit, static_argnames=("box_factor", "change_region", "pad_x"))
def prepare_tryon_batch_512(
    person: Dict[str, jnp.ndarray],
    garment: Dict[str, jnp.ndarray],
    change_region: str = "fullbody",
    box_factor: int = 2,
    pad_x: float = 96.0,
):
    """The 512 region-selectable try-on batch (reference `test_512.py:111-142`
    over `UvitonDatasetFull_512_test.__getitem__`, dataset.py:1605-2214):

    * style_input: 45ch = norm_img(30: all parts of the region's upper source)
      ⊕ norm_img_lower(15: parts {0,6..9} of the region's lower source);
    * change_region picks garment vs person sources/keypoints per branch
      (dataset.py:1679-1692); denorms always re-project into the person pose
      with 5x5-eroded saturation masks;
    * parsing groups: upper {5,6,7}, lower {9,12} (dataset.py:1636-1639) — the
      plain `upper`/`lower` masks, NOT the 256 test path's {6,9,12} grouping;
    * pad_x: the square-padding offset added to keypoint x (96 for 512x320,
      dataset.py:1616; 32 for the 256 fixture).
    """
    p_img = person["image"].astype(jnp.float32) / 255.0
    g_img = garment["image"].astype(jnp.float32) / 255.0
    p_pose = person["pose"].astype(jnp.float32) / 127.5 - 1.0
    p_retain = person["retain_mask"].astype(jnp.float32)
    p_upper_mask = person["upper_mask"].astype(jnp.float32)
    p_lower_mask = person["lower_mask"].astype(jnp.float32)
    g_upper_mask = garment["upper_mask"].astype(jnp.float32)
    g_lower_mask = garment["lower_mask"].astype(jnp.float32)

    routed = route_patches_512_batch(
        p_img * p_upper_mask,
        p_img * p_lower_mask,
        p_upper_mask,
        p_lower_mask,
        g_img * g_upper_mask,
        g_img * g_lower_mask,
        g_upper_mask,
        g_lower_mask,
        person["keypoints"].astype(jnp.float32),
        garment["keypoints"].astype(jnp.float32),
        change_region=change_region,
        box_factor=box_factor,
        pad_x=pad_x,
    )

    denorm_upper_mask = (
        jnp.sum(routed.denorm_upper_img, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)
    denorm_lower_mask = (
        jnp.sum(routed.denorm_lower_img, axis=-1, keepdims=True) > 0
    ).astype(jnp.float32)

    p_real = p_img * 2.0 - 1.0
    retain = p_retain * p_real - (1.0 - p_retain)
    pose6 = jnp.concatenate([p_pose, retain], axis=-1)
    style_input = (
        jnp.concatenate([routed.norm_img, routed.norm_img_lower], axis=-1) * 2.0 - 1.0
    )

    return {
        "style_input": style_input,
        "retain": retain,
        "pose": pose6,
        "denorm_upper_img": routed.denorm_upper_img * 2.0 - 1.0,
        "denorm_lower_img": routed.denorm_lower_img * 2.0 - 1.0,
        "denorm_upper_mask": denorm_upper_mask,
        "denorm_lower_mask": denorm_lower_mask,
        "person_img": p_real,
    }

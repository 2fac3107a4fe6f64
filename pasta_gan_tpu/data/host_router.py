"""Host-side patch routing — the production many-core input path.

The reference hides its entire routing cost inside DataLoader workers:
`cv2.warpPerspective` per part per sample on host CPUs, overlapped with the
GPU step by the loader's worker processes (`training/dataset.py:863-927`,
`train.sh --workers 3`).  This module is the TPU-native equivalent: the same
norm/denorm pipeline as `data/warp.py:route_patches_single`, but executed on
the host with the native C++ warp library (`native/host_ops.cpp`, internally
row-threaded) under a per-sample thread pool, plus a double-buffered prefetch
pipeline (`HostRoutingPipeline`) that routes batch i+1 while the device runs
the forward/step on batch i.

When to use which: the on-device route (`route_patches_batch`) keeps
everything in one jit and costs ~25 ms/batch-16 on a v5e chip; this host path
frees that device time entirely on many-core production hosts and is the
drop-in for loader-driven training.  Outputs are bit-compatible with the
device route up to bilinear rounding (parity-tested in
tests/test_host_router.py).

Geometry (the 8x8 DLT solves) is tiny and stays wherever it's cheapest: pass
precomputed (M, M_inv, valid) or let `part_transforms_np` run the existing
batched solver once per batch.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Callable, Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

from .. import native
from .geometry import HAND_PARTS, LOWER_PART_START, NUM_PARTS
from .warp import MASK_SATURATION_THRESHOLD

_pt_jit = None


def part_transforms_np(
    keypoints: np.ndarray,
    img_h: int,
    patch_w: int,
    patch_h: int,
    pad_x: float = 32.0,
    knee_fallbacks: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched (M, M_inv, valid) as numpy via the jitted DLT solver.

    One tiny kernel per batch — the only device touch in the host path (on a
    CPU backend it never leaves the host)."""
    global _pt_jit
    import jax

    from .geometry import part_transforms

    if _pt_jit is None:
        _pt_jit = jax.jit(
            part_transforms,
            static_argnames=("img_h", "patch_w", "patch_h", "pad_x", "ar", "knee_fallbacks"),
        )
    M, M_inv, valid = _pt_jit(
        np.asarray(keypoints, np.float32),
        img_h=img_h,
        patch_w=patch_w,
        patch_h=patch_h,
        pad_x=pad_x,
        knee_fallbacks=knee_fallbacks,
    )
    return np.asarray(M), np.asarray(M_inv), np.asarray(valid)


def _erode5(mask: np.ndarray) -> np.ndarray:
    """cv2.erode(5x5, +inf border) on a binary [H, W, 1] mask ==
    1 - dilate(1 - mask): the min-filter via the native box dilation."""
    return 1.0 - native.dilate_box(1.0 - mask, 5)


def route_patches_host_single(
    upper_img: np.ndarray,  # [H, W, 3] in [0, 1]
    lower_img: np.ndarray,
    upper_clothes_mask: np.ndarray,  # [H, W, 1] in {0, 1}
    lower_clothes_mask: np.ndarray,
    M: np.ndarray,  # [10, 3, 3]
    M_inv: np.ndarray,
    valid: np.ndarray,  # [10] bool
    box_factor: int = 2,
    M_lower: Optional[np.ndarray] = None,
    valid_lower: Optional[np.ndarray] = None,
    denorm_valid: Optional[np.ndarray] = None,
    erode_upper: bool = False,
) -> Dict[str, np.ndarray]:
    """Numpy/native mirror of `data/warp.py:route_patches_single`
    (reference dataset.py:863-927): norm warps with BORDER_REPLICATE, denorm
    re-projection with constant-zero border, ==255 mask saturation, and
    sequential later-part-overwrites compositing.  Returns the RoutedPatches
    fields as a dict of numpy arrays."""
    H, W = upper_img.shape[0], upper_img.shape[1]
    h, w = H >> box_factor, W >> box_factor
    if M_lower is None:
        M_lower = M
    if valid_lower is None:
        valid_lower = valid
    if denorm_valid is None:
        denorm_valid = valid
    L = NUM_PARTS - LOWER_PART_START  # lower part count

    srcU = np.concatenate(
        [np.asarray(upper_img, np.float32), np.asarray(upper_clothes_mask[..., :1], np.float32)],
        axis=-1,
    )
    srcL = np.concatenate(
        [np.asarray(lower_img, np.float32), np.asarray(lower_clothes_mask[..., :1], np.float32)],
        axis=-1,
    )

    warpedU = np.zeros((NUM_PARTS, h, w, 4), np.float32)
    for p in range(NUM_PARTS):
        if valid[p]:
            warpedU[p] = native.warp_perspective(srcU, M[p], (h, w), "replicate")
    warpedL = np.zeros((L, h, w, 4), np.float32)
    for i in range(L):
        if valid_lower[LOWER_PART_START + i]:
            warpedL[i] = native.warp_perspective(
                srcL, M_lower[LOWER_PART_START + i], (h, w), "replicate"
            )

    # denorm: re-project every patch into the person frame, constant border
    dn = np.zeros((NUM_PARTS + L, H, W, 4), np.float32)
    for p in range(NUM_PARTS):
        if denorm_valid[p]:
            dn[p] = native.warp_perspective(warpedU[p], M_inv[p], (H, W), "constant")
    for i in range(L):
        if denorm_valid[LOWER_PART_START + i]:
            dn[NUM_PARTS + i] = native.warp_perspective(
                warpedL[i], M_inv[LOWER_PART_START + i], (H, W), "constant"
            )

    sat = (dn[..., 3:4] >= MASK_SATURATION_THRESHOLD).astype(np.float32)
    if erode_upper:
        for p in range(LOWER_PART_START):
            sat[p] = _erode5(sat[p])

    denorm_upper = np.zeros((H, W, 3), np.float32)
    hand_masks = {}
    for p in range(NUM_PARTS):
        valid_p = sat[p] * float(denorm_valid[p])
        denorm_upper = dn[p, ..., 0:3] * valid_p + denorm_upper * (1.0 - valid_p)
        if p in HAND_PARTS:
            hand_masks[p] = valid_p
    denorm_lower = np.zeros((H, W, 3), np.float32)
    for i in range(L):
        valid_p = sat[NUM_PARTS + i] * float(denorm_valid[LOWER_PART_START + i])
        denorm_lower = dn[NUM_PARTS + i, ..., 0:3] * valid_p + denorm_lower * (
            1.0 - valid_p
        )

    def stack_ch(x):  # [P, h, w, C] -> [h, w, P*C]
        return np.transpose(x, (1, 2, 0, 3)).reshape(x.shape[1], x.shape[2], -1)

    part_masks3 = np.repeat(warpedU[..., 3:4], 3, axis=-1)
    part_masks3_l = np.repeat(warpedL[..., 3:4], 3, axis=-1)
    return {
        "norm_img": stack_ch(warpedU[..., 0:3]),
        "norm_img_lower": stack_ch(warpedL[..., 0:3]),
        "denorm_upper_img": denorm_upper,
        "denorm_lower_img": denorm_lower,
        "M_invs": np.asarray(M_inv, np.float32),
        "denorm_hand_masks": np.stack([hand_masks[p] for p in HAND_PARTS], axis=0),
        "norm_clothes_masks": stack_ch(part_masks3),
        "norm_clothes_masks_lower": stack_ch(part_masks3_l),
        "valid": np.asarray(valid),
    }


def _stack_samples(outs) -> Dict[str, np.ndarray]:
    return {k: np.stack([o[k] for o in outs], axis=0) for k in outs[0]}


def route_patches_host_batch(
    upper_img: np.ndarray,  # [B, H, W, 3]
    lower_img: np.ndarray,
    upper_clothes_mask: np.ndarray,
    lower_clothes_mask: np.ndarray,
    keypoints: np.ndarray,  # [B, 18, 3]
    box_factor: int = 2,
    img_h: Optional[int] = None,
    pad_x: float = 32.0,
    workers: Optional[int] = None,
    pool: Optional[ThreadPoolExecutor] = None,
) -> Dict[str, np.ndarray]:
    """Host mirror of `route_patches_batch` (training self-routing)."""
    B = upper_img.shape[0]
    H = img_h or upper_img.shape[1]
    h = upper_img.shape[1] >> box_factor
    w = upper_img.shape[2] >> box_factor
    M, M_inv, valid = part_transforms_np(keypoints, H, w, h, pad_x)
    fn = lambda i: route_patches_host_single(
        upper_img[i], lower_img[i], upper_clothes_mask[i], lower_clothes_mask[i],
        M[i], M_inv[i], valid[i], box_factor=box_factor,
    )
    if pool is not None:
        outs = list(pool.map(fn, range(B)))
    else:
        with ThreadPoolExecutor(max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
            outs = list(ex.map(fn, range(B)))
    return _stack_samples(outs)


def route_patches_host_transfer_batch(
    garment_upper_img: np.ndarray,
    person_lower_img: np.ndarray,
    garment_upper_mask: np.ndarray,
    person_lower_mask: np.ndarray,
    garment_keypoints: np.ndarray,
    person_keypoints: np.ndarray,
    box_factor: int = 2,
    img_h: Optional[int] = None,
    pad_x: float = 32.0,
    workers: Optional[int] = None,
    pool: Optional[ThreadPoolExecutor] = None,
) -> Dict[str, np.ndarray]:
    """Host mirror of `route_patches_transfer_batch` (unpaired try-on): the
    upper garment normalizes with the garment's M, the person's lower clothes
    self-route, everything denorms with the person's M_inv, eroded upper."""
    B = garment_upper_img.shape[0]
    H = img_h or garment_upper_img.shape[1]
    h = garment_upper_img.shape[1] >> box_factor
    w = garment_upper_img.shape[2] >> box_factor
    Mg, _, valid_g = part_transforms_np(garment_keypoints, H, w, h, pad_x, knee_fallbacks=True)
    Mp, Mp_inv, valid_p = part_transforms_np(person_keypoints, H, w, h, pad_x, knee_fallbacks=True)
    fn = lambda i: route_patches_host_single(
        garment_upper_img[i], person_lower_img[i],
        garment_upper_mask[i], person_lower_mask[i],
        Mg[i], Mp_inv[i], valid_g[i], box_factor=box_factor,
        M_lower=Mp[i], valid_lower=valid_p[i], denorm_valid=valid_p[i],
        erode_upper=True,
    )
    if pool is not None:
        outs = list(pool.map(fn, range(B)))
    else:
        with ThreadPoolExecutor(max_workers=workers or min(B, os.cpu_count() or 1)) as ex:
            outs = list(ex.map(fn, range(B)))
    return _stack_samples(outs)


_SENTINEL = object()


class HostRoutingPipeline:
    """Double-buffered host routing: a prefetch thread pulls raw host batches
    from `loader`, routes each on the shared thread pool, and keeps up to
    `depth` routed batches ready — so batch i+1's routing overlaps the
    device's step on batch i (the reference's DataLoader-worker overlap,
    `torch.utils.data.DataLoader(num_workers=...)`).

    `route_fn(host_batch, pool)` -> routed batch.  Iterate to consume;
    `close()` (or exhaustion) shuts the prefetcher down.
    """

    def __init__(
        self,
        loader: Iterable,
        route_fn: Callable,
        depth: int = 2,
        workers: Optional[int] = None,
    ):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._pool = ThreadPoolExecutor(max_workers=workers or (os.cpu_count() or 1))
        self._err: Optional[BaseException] = None

        def run():
            try:
                for hb in loader:
                    if self._stop.is_set():
                        return
                    routed = route_fn(hb, self._pool)
                    while not self._stop.is_set():
                        try:
                            self._q.put(routed, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                # The sentinel must NEVER be dropped: the consumer's get()
                # blocks indefinitely, so losing it (e.g. a full queue while
                # the consumer stalls in a multi-minute first-step compile)
                # would hang training forever.  Retry until delivered or the
                # pipeline is closed (close() drains via the stop flag).
                while not self._stop.is_set():
                    try:
                        self._q.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            self.close()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        self._pool.shutdown(wait=False)


def training_route_fn(box_factor: int = 2, pad_x: float = 32.0) -> Callable:
    """route_fn for HostRoutingPipeline over training host batches (the
    SyntheticUvitonDataset / UvitonDatasetFull collate dict layout)."""

    def fn(host_batch: Dict[str, np.ndarray], pool: ThreadPoolExecutor):
        img = np.asarray(host_batch["image"], np.float32) / 255.0
        up = np.asarray(host_batch["upper_mask"], np.float32)
        lo = np.asarray(host_batch["lower_mask"], np.float32)
        routed = route_patches_host_batch(
            img * up, img * lo, up, lo,
            np.asarray(host_batch["keypoints"], np.float32),
            box_factor=box_factor, pad_x=pad_x, pool=pool,
        )
        return {"host_batch": host_batch, "routed": routed}

    return fn

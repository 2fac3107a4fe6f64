"""Data pipeline: host decode + on-device patch routing."""

from .dataset import (
    SyntheticUvitonDataset,
    UvitonDataset256Test,
    UvitonDataset512Test,
    UvitonDatasetFull,
    collate,
    prepare_train_batch,
    prepare_tryon_batch,
    prepare_tryon_batch_v18,
)
from .geometry import BPARTS, KEYPOINT_ORDER, part_transforms
from .warp import (
    route_patches_batch,
    route_patches_transfer_batch,
    route_patches_v19_batch,
    warp_perspective,
    warp_perspective_inv,
)

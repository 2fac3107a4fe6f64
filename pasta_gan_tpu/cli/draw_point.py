"""Keypoint/stickman overlay debugging tool.

Counterpart of the reference's `draw_point.py` (a 13-line cv2 scratchpad for
eyeballing drawn points/lines); realized here as the tool it was evidently
used for: overlay OpenPose keypoints and the limb stickman onto an image for
routing/geometry debugging.

    python -m pasta_gan_tpu.cli.draw_point --image person.jpg \
        --keypoints person_keypoints.json --out overlay.png
"""

from __future__ import annotations

import argparse

import numpy as np


def overlay_keypoints(image: np.ndarray, keypoints: np.ndarray,
                      radius: int = 3, alpha: float = 0.6) -> np.ndarray:
    """Blend the stickman + numbered joints over an RGB uint8 image."""
    from ..data import stickman

    pose = stickman.draw_pose_from_cords(
        keypoints, image.shape[:2], radius=radius
    ).astype(np.float32)
    mask = (pose.sum(-1, keepdims=True) > 0).astype(np.float32)
    out = image.astype(np.float32) * (1 - alpha * mask) + pose * alpha * mask
    return np.clip(out, 0, 255).astype(np.uint8)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=True)
    p.add_argument("--keypoints", required=True, help="OpenPose-style json")
    p.add_argument("--out", required=True)
    p.add_argument("--radius", type=int, default=3)
    args = p.parse_args(argv)

    import PIL.Image

    from ..data import stickman

    image = np.asarray(PIL.Image.open(args.image).convert("RGB"))
    kps = stickman.load_keypoints(args.keypoints)
    out = overlay_keypoints(image, kps, radius=args.radius)
    PIL.Image.fromarray(out).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Framework utilities (reference `dnnlib/util.py` + `torch_utils/misc.py`)."""

from __future__ import annotations

import os
import sys
from typing import Any, Optional, Sequence

import numpy as np


class EasyDict(dict):
    """Attribute-access dict (reference `dnnlib/util.py:40-52`); kept for
    config interop, though the framework's own configs are typed dataclasses."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


class Logger:
    """stdout/stderr tee into a log file (reference `dnnlib/util.py:56-112`)."""

    def __init__(self, file_name: Optional[str] = None, mode: str = "w", should_flush: bool = True):
        self.file = open(file_name, mode) if file_name is not None else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        self.stderr = sys.stderr
        sys.stdout = self
        sys.stderr = self

    def write(self, text) -> None:
        if len(text) == 0:
            return
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self) -> None:
        self.flush()
        if self.file is not None:
            self.file.close()
            self.file = None
        if sys.stdout is self:
            sys.stdout = self.stdout
        if sys.stderr is self:
            sys.stderr = self.stderr


def assert_shape(tensor, ref_shape: Sequence[Optional[int]]) -> None:
    """Inline shape contract (reference `torch_utils/misc.py:86-101`);
    None entries are wildcards."""
    if tensor.ndim != len(ref_shape):
        raise AssertionError(f"wrong rank: got {tensor.ndim}, expected {len(ref_shape)}")
    for idx, (size, ref) in enumerate(zip(tensor.shape, ref_shape)):
        if ref is not None and int(size) != int(ref):
            raise AssertionError(f"wrong size for dim {idx}: got {size}, expected {ref}")


def print_module_summary(module, *init_args, rngs=None, **init_kwargs) -> str:
    """Parameter/shape table (reference `torch_utils/misc.py:201-269`) via
    flax's tabulate; returns the table string (and prints it)."""
    import jax
    from flax import linen as nn

    rngs = rngs or {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    table = nn.tabulate(module, rngs, depth=2)(*init_args, **init_kwargs)
    print(table)
    return table


def open_url(url_or_path: str, cache_dir: Optional[str] = None, **_):
    """Reference `dnnlib.util.open_url` surface (`dnnlib/util.py:382-477`).

    This deployment has no network egress: http(s) URLs resolve only through
    the local cache directory (md5-keyed file names, same scheme as the
    reference); local paths open directly.
    """
    import hashlib

    if not (url_or_path.startswith("http://") or url_or_path.startswith("https://")):
        return open(url_or_path, "rb")
    cache_dir = cache_dir or os.path.join(os.path.expanduser("~"), ".cache", "pasta_gan_tpu")
    md5 = hashlib.md5(url_or_path.encode()).hexdigest()
    if os.path.isdir(cache_dir):
        for fname in os.listdir(cache_dir):
            if fname.startswith(md5):
                return open(os.path.join(cache_dir, fname), "rb")
    raise IOError(
        f"no network egress and no cached copy of {url_or_path} under {cache_dir}; "
        "place the file there named '<md5(url)>-<anything>'"
    )


def save_image_grid(images: np.ndarray, path: str, drange=(-1, 1), grid_cols: Optional[int] = None):
    """Tile [N,H,W,C] images into one PNG (reference training loop
    `save_image_grid`, adapted to NHWC)."""
    import PIL.Image

    lo, hi = drange
    imgs = (np.asarray(images, np.float32) - lo) / (hi - lo) * 255.0
    imgs = np.clip(imgs, 0, 255).astype(np.uint8)
    N, H, W, C = imgs.shape
    cols = grid_cols or int(np.ceil(np.sqrt(N)))
    rows = int(np.ceil(N / cols))
    grid = np.zeros((rows * H, cols * W, C), np.uint8)
    for i in range(N):
        r, c = divmod(i, cols)
        grid[r * H : (r + 1) * H, c * W : (c + 1) * W] = imgs[i]
    PIL.Image.fromarray(grid.squeeze() if C == 1 else grid).save(path)
    return path


# LIP/CIHP human-parsing palette (reference `util_functions.py:18-20`
# label_colors; the colormap.mat alternative needs an unavailable data file).
PARSING_LABEL_COLORS = (
    (0, 0, 0), (128, 0, 0), (255, 0, 0), (0, 85, 0), (170, 0, 51),
    (255, 85, 0), (0, 0, 85), (0, 119, 221), (85, 85, 0), (0, 85, 85),
    (85, 51, 0), (52, 86, 128), (0, 128, 0), (0, 0, 255), (51, 170, 221),
    (0, 255, 255), (85, 255, 170), (170, 255, 85), (255, 255, 0), (255, 170, 0),
)


def parsing_to_rgb(parsing: np.ndarray) -> np.ndarray:
    """Class-index map (or logits stack) -> float RGB in [0,1].

    Reference `util_functions.make_parts_shape` (util_functions.py:71-77):
    argmax over the channel axis when given logits [..., H, W, K] (NHWC),
    then the label palette.  Accepts [H,W], [N,H,W], or [N,H,W,K].
    """
    x = np.asarray(parsing)
    if x.ndim >= 3 and x.shape[-1] > 1 and np.issubdtype(x.dtype, np.floating):
        x = np.argmax(x, axis=-1)
    elif x.ndim >= 3 and x.shape[-1] == 1:
        x = x[..., 0]
    x = x.astype(np.int64) % len(PARSING_LABEL_COLORS)
    palette = np.asarray(PARSING_LABEL_COLORS, np.float32) / 255.0
    return palette[x]

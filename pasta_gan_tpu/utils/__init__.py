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


def _default_fetch(url: str):
    """One GET returning (content bytes, headers dict). Split out so the
    downloader logic is unit-testable without egress (tests inject a fake)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=60) as res:
        return res.read(), {k.title(): v for k, v in res.headers.items()}


def open_url(
    url_or_path: str,
    cache_dir: Optional[str] = None,
    num_attempts: int = 10,
    verbose: bool = True,
    return_filename: bool = False,
    cache: bool = True,
    _fetch=None,  # test hook: (url) -> (bytes, headers)
):
    """Reference `dnnlib.util.open_url` (`dnnlib/util.py:382-477`): download
    with retries, Google-Drive nag/quota handling, Content-Disposition
    naming, and an atomic md5-keyed cache.  Local paths open directly.

    NOTE: this deployment has no network egress, so live downloads fail at
    the socket — the cache lookup (same `<md5(url)>_<name>` scheme as the
    reference) still resolves pre-placed files, and the full download logic
    is covered by injected-fetch unit tests (tests/test_io_utils.py).
    """
    import hashlib
    import html
    import io
    import re
    import uuid

    assert num_attempts >= 1
    assert not (return_filename and not cache)

    if not re.match(r"^[a-z]+://", url_or_path):
        return url_or_path if return_filename else open(url_or_path, "rb")
    if url_or_path.startswith("file://"):
        import urllib.parse

        filename = urllib.parse.urlparse(url_or_path).path
        if re.match(r"^/[a-zA-Z]:", filename):
            filename = filename[1:]  # windows file:///c:/foo.txt
        return filename if return_filename else open(filename, "rb")

    url = url_or_path
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "pasta_gan_tpu"
    )
    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    if cache and os.path.isdir(cache_dir):
        for fname in sorted(os.listdir(cache_dir)):
            if fname.startswith(url_md5) and not fname.startswith("tmp_"):
                path = os.path.join(cache_dir, fname)
                return path if return_filename else open(path, "rb")

    fetch = _fetch or _default_fetch
    url_name = None
    url_data = None
    for attempts_left in reversed(range(num_attempts)):
        try:
            content, headers = fetch(url)
            if len(content) == 0:
                raise IOError("No data received")
            if len(content) < 8192:
                content_str = content.decode("utf-8", errors="replace")
                if "download_warning" in headers.get("Set-Cookie", ""):
                    # Google Drive virus-check nag page: follow the real link
                    links = [
                        html.unescape(link)
                        for link in content_str.split('"')
                        if "export=download" in link
                    ]
                    if len(links) == 1:
                        import urllib.parse

                        url = urllib.parse.urljoin(url, links[0])
                        raise IOError("Google Drive virus checker nag")
                if "Google Drive - Quota exceeded" in content_str:
                    raise IOError(
                        "Google Drive download quota exceeded -- please try again later"
                    )
            match = re.search(
                r'filename="([^"]*)"', headers.get("Content-Disposition", "")
            )
            url_name = match[1] if match else url
            url_data = content
            break
        except KeyboardInterrupt:
            raise
        except Exception:
            if not attempts_left:
                raise

    if cache:
        safe_name = re.sub(r"[^0-9a-zA-Z-._]", "_", url_name)
        cache_file = os.path.join(cache_dir, url_md5 + "_" + safe_name)
        temp_file = os.path.join(
            cache_dir, "tmp_" + uuid.uuid4().hex + "_" + url_md5 + "_" + safe_name
        )
        os.makedirs(cache_dir, exist_ok=True)
        with open(temp_file, "wb") as f:
            f.write(url_data)
        os.replace(temp_file, cache_file)  # atomic
        if return_filename:
            return cache_file
    return io.BytesIO(url_data)


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
    if x.dtype.kind not in "iu":
        # bf16 arrives as ml_dtypes.bfloat16 (kind 'V'), which fails
        # np.issubdtype(..., np.floating) — normalize all non-integer
        # dtypes to float32 so the logits branch below triggers.
        x = x.astype(np.float32)
    if x.ndim >= 3 and x.shape[-1] > 1 and np.issubdtype(x.dtype, np.floating):
        x = np.argmax(x, axis=-1)
    elif x.ndim >= 3 and x.shape[-1] == 1:
        x = x[..., 0]
    x = x.astype(np.int64) % len(PARSING_LABEL_COLORS)
    palette = np.asarray(PARSING_LABEL_COLORS, np.float32) / 255.0
    return palette[x]

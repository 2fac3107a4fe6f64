"""Feature extractors for the metrics suite.

The reference downloads NVIDIA's TorchScript InceptionV3 / VGG16 detectors
(`metric_utils.py:40-51`); with zero egress those weights are unavailable at
build time, so the extractor is a pluggable interface:

* `load_torchscript_detector(path)` — adapts a locally-provided TorchScript
  detector (the reference's exact .pt files) via torch-CPU, giving bit-true
  detector parity when the user supplies the file,
* `SimpleConvFeatures` — a fixed-seed random-projection conv net; NOT an
  InceptionV3 substitute for publishable FID numbers, but a deterministic
  stand-in that makes the whole metrics pipeline runnable/testable offline
  (relative comparisons under the same extractor remain meaningful).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

# extractor signature: (uint8 images [N, H, W, 3]) -> np.ndarray [N, D]
FeatureExtractor = Callable[[np.ndarray], np.ndarray]


class SimpleConvFeatures:
    """Deterministic random conv features (fixed seed, 4 stride-2 convs +
    global mean/max pooling). tag: used for the stats cache key."""

    tag = "simpleconv-v1"

    def __init__(self, dim: int = 256, seed: int = 0):
        self.dim = dim
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 5)
        chans = [3, 32, 64, 128, 128]
        self.kernels = [
            jax.random.normal(ks[i], (3, 3, chans[i], chans[i + 1]), jnp.float32)
            / np.sqrt(9 * chans[i])
            for i in range(4)
        ]
        self.proj = jax.random.normal(ks[4], (256, dim), jnp.float32) / 16.0
        self._fn = jax.jit(self._forward)

    def _forward(self, x):
        x = x.astype(jnp.float32) / 127.5 - 1.0
        for k in self.kernels:
            x = jax.lax.conv_general_dilated(
                x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            x = jax.nn.leaky_relu(x, 0.2)
        feat = jnp.concatenate([jnp.mean(x, axis=(1, 2)), jnp.max(x, axis=(1, 2))], axis=-1)
        return jnp.matmul(feat, self.proj)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(images)))


class TorchScriptDetector:
    """Adapter for the reference's TorchScript detectors (runs on torch-CPU).

    Supply the file the reference downloads (inception-2015-12-05.pt or
    vgg16.pt) for detector-exact FID/KID/IS/PR numbers.
    """

    def __init__(self, path: str, return_features: bool = True, no_output_bias: bool = False):
        import torch

        self._torch = torch
        self.model = torch.jit.load(path).eval()
        self.kwargs = {}
        if return_features:
            self.kwargs["return_features"] = True
        if no_output_bias:
            self.kwargs = {"no_output_bias": True}
        self.tag = f"torchscript-{path.split('/')[-1]}"

    def __call__(self, images: np.ndarray) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            x = torch.from_numpy(np.ascontiguousarray(images.transpose(0, 3, 1, 2)))
            return self.model(x, **self.kwargs).numpy()


def default_extractor(
    detector_path: Optional[str] = None, jax_native: bool = True, **kwargs
) -> FeatureExtractor:
    """Pick the feature extractor.

    With a detector file: the JAX-native InceptionV3 (TPU-jitted; weights
    imported from a state_dict/TorchScript/npz file — metrics/inception.py)
    unless `jax_native=False`, which forces the torch-CPU TorchScript adapter
    (bit-true to the reference but slow).  Without a file: the offline
    SimpleConvFeatures stand-in (NOT FID-comparable)."""
    if detector_path:
        if jax_native:
            try:
                from .inception import InceptionV3Features

                return InceptionV3Features.from_file(detector_path)
            except Exception as e:  # not an inception graph (e.g. vgg16.pt)
                import logging

                logging.getLogger(__name__).warning(
                    "JAX-native import of %s failed (%s); using torch adapter",
                    detector_path, e,
                )
        return TorchScriptDetector(detector_path, **kwargs)
    return SimpleConvFeatures()

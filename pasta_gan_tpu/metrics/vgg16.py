"""JAX-native VGG16 feature extractors: PR-metric features + LPIPS.

Counterpart of the reference's `vgg16.pt` TorchScript detector
(`metrics/metric_utils.py:40-51`; used by `precision_recall.py` for the
4096-d fc7 features and by `perceptual_path_length.py:86-95` with
`return_lpips=True` for unit-normalized LPIPS features whose squared L2
distance IS the LPIPS-VGG distance).  As with metrics/inception.py the
weights cannot ship (zero egress); this module implements the graph and
imports torchvision-style `vgg16` state_dicts (`features.N.weight`,
`classifier.N.weight`) plus optional LPIPS linear heads (`lin0..lin4`,
pytorch-LPIPS naming `lins.N.model.1.weight`).

Graph (torchvision vgg16, configuration D):
  conv 3x3 x2 (64) - pool - x2 (128) - pool - x3 (256) - pool - x3 (512)
  - pool - x3 (512) - pool - adaptive-avg 7x7 - fc6(4096) - fc7(4096)

* `features` mode: relu(fc7) after mean-subtraction preprocessing
  ([123.68, 116.779, 103.939]) — the PR detector contract (uint8 input).
* `lpips` mode: activations at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3,
  channel-unit-normalized, scaled by sqrt(lin_k) and by 1/sqrt(H_k*W_k),
  flattened and concatenated — so ||f(a) - f(b)||^2 equals the standard
  spatially-averaged LPIPS distance.  Input preprocessing follows LPIPS:
  x in [-1, 1], shift/scale normalization.

Parity vs an independently written torch oracle: tests/test_vgg16.py.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

# conv layer indices in torchvision vgg16.features
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
# features indices AFTER whose relu LPIPS taps activations
_LPIPS_TAPS = {2: 0, 7: 1, 14: 2, 21: 3, 28: 4}
_POOL_AFTER = {2, 7, 14, 21, 28}  # maxpool after these conv indices

VGG_MEAN = np.asarray([123.68, 116.779, 103.939], np.float32)
# LPIPS input normalization (pytorch-LPIPS ScalingLayer constants)
LPIPS_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Flat state_dict from any accepted weight-file format
    (detectors_manifest.py contract): `.npz`, a plain torch state_dict
    checkpoint, or a TorchScript archive (the reference's `vgg16.pt`,
    `metrics/metric_utils.py:40-51`) — whose 'layers.'-wrapped names are
    stripped like metrics/inception.py:state_dict_from_torchscript."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # not a plain checkpoint -> TorchScript archive
        obj = torch.jit.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k.split("layers.", 1)[-1]: v for k, v in obj.items()}


def params_from_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    def np_(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, np.float32)

    if "features.0.weight" not in sd:
        raise ValueError(
            f"state_dict does not look like a torchvision vgg16 "
            f"(keys: {sorted(sd)[:5]}...)"
        )
    out: Dict[str, jnp.ndarray] = {}
    for i in _CONV_IDX:
        w = np_(sd[f"features.{i}.weight"])  # [O, I, kh, kw]
        out[f"conv{i}_w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        out[f"conv{i}_b"] = jnp.asarray(np_(sd[f"features.{i}.bias"]))
    for j, name in ((0, "fc6"), (3, "fc7")):
        if f"classifier.{j}.weight" in sd:
            out[f"{name}_w"] = jnp.asarray(np_(sd[f"classifier.{j}.weight"]).T)
            out[f"{name}_b"] = jnp.asarray(np_(sd[f"classifier.{j}.bias"]))
    # LPIPS linear heads: accept `linK.model.1.weight` / `lins.K.model.1.weight`
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in sd:
                out[f"lin{k}"] = jnp.asarray(np_(sd[key]).reshape(-1))  # [C_k]
                break
    return out


def _backbone(x: jax.Array, p: Mapping[str, jnp.ndarray], collect_taps: bool):
    taps = []
    for i in _CONV_IDX:
        x = jax.lax.conv_general_dilated(
            x, p[f"conv{i}_w"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p[f"conv{i}_b"]
        x = jax.nn.relu(x)
        if collect_taps and i in _LPIPS_TAPS:
            taps.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return x, taps


def _adaptive_avg_7(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d(7) for H, W divisible by 7 (224-input case: 7x7 in
    = identity); general multiples pool k=H//7."""
    N, H, W, C = x.shape
    if H == 7 and W == 7:
        return x
    assert H % 7 == 0 and W % 7 == 0, (H, W)
    kh, kw = H // 7, W // 7
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kh, kw, 1), (1, kh, kw, 1), "VALID"
    )
    return s / (kh * kw)


class VGG16Features:
    """PR-metric extractor: uint8 NHWC RGB -> [N, 4096] relu(fc7) features.
    Images are bilinearly resized to 224x224 (torch F.interpolate semantics)
    and mean-subtracted."""

    tag = "vgg16-jax-v1"

    def __init__(self, params: Mapping[str, jnp.ndarray]):
        self.params = dict(params)
        self._fn = jax.jit(self._forward)

    @classmethod
    def from_state_dict(cls, sd) -> "VGG16Features":
        return cls(params_from_state_dict(sd))

    @classmethod
    def from_file(cls, path: str) -> "VGG16Features":
        return cls.from_state_dict(load_state_dict_file(path))

    def _forward(self, images: jax.Array) -> jax.Array:
        x = images.astype(jnp.float32)
        if x.shape[1] != 224 or x.shape[2] != 224:
            x = jax.image.resize(
                x, (x.shape[0], 224, 224, x.shape[3]), "bilinear", antialias=False
            )
        x = x - VGG_MEAN
        x, _ = _backbone(x, self.params, collect_taps=False)
        x = _adaptive_avg_7(x)
        # torch flatten of NCHW [N, C, 7, 7] -> [N, C*49] (channel-major!)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = jax.nn.relu(jnp.matmul(x, self.params["fc6_w"]) + self.params["fc6_b"])
        x = jax.nn.relu(jnp.matmul(x, self.params["fc7_w"]) + self.params["fc7_b"])
        return x

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(images)))


class LPIPSFeatures:
    """LPIPS-VGG16 embedding: float [-1,1] NHWC -> [N, D] such that
    ||f(a)-f(b)||^2 == LPIPS(a, b) (spatial-mean, linear-head-weighted).

    Without imported lin heads (`lin0..lin4`), unit weights are used —
    relative comparisons remain meaningful but absolute scale differs from
    the published LPIPS calibration (documented; reference
    `perceptual_path_length.py:86-95` consumes exactly this embedding
    contract from vgg16.pt `return_lpips=True`)."""

    tag = "lpips-vgg16-jax-v1"

    def __init__(self, params: Mapping[str, jnp.ndarray]):
        self.params = dict(params)
        self._fn = jax.jit(self._forward)

    @classmethod
    def from_state_dict(cls, sd) -> "LPIPSFeatures":
        return cls(params_from_state_dict(sd))

    @classmethod
    def from_file(cls, path: str) -> "LPIPSFeatures":
        return cls.from_state_dict(load_state_dict_file(path))

    def _forward(self, images: jax.Array) -> jax.Array:
        x = (images.astype(jnp.float32) - LPIPS_SHIFT) / LPIPS_SCALE
        _, taps = _backbone(x, self.params, collect_taps=True)
        outs = []
        for k, t in enumerate(taps):
            n = t * jax.lax.rsqrt(jnp.sum(t * t, axis=-1, keepdims=True) + 1e-10)
            lin = self.params.get(f"lin{k}")
            if lin is not None:
                n = n * jnp.sqrt(jnp.maximum(lin, 0.0))
            N, H, W, C = n.shape
            outs.append((n / np.sqrt(H * W)).reshape(N, -1))
        return jnp.concatenate(outs, axis=-1)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(images)))

"""JAX-native InceptionV3 FID feature extractor.

Counterpart of the reference's NVIDIA TorchScript detector
(`metrics/metric_utils.py:40-51`, `frechet_inception_distance.py:22-29`):
the reference downloads `inception-2015-12-05.pt` and runs it under torch.
With zero egress the weights cannot ship with this repo, so this module
implements the detector *graph* natively (pure JAX, TPU-jittable) plus an
importer for externally supplied weights:

* torchvision `inception_v3` state_dicts (the naming used by pytorch-fid's
  `pt_inception-2015-12-05` port — `Conv2d_1a_3x3.conv.weight`,
  `Mixed_5b.branch1x1.bn.running_mean`, ...),
* TorchScript detector files via `state_dict_from_torchscript` (extracts
  named parameters/buffers with torch-CPU).

The graph follows the public FID-variant InceptionV3 (TF inception /
pytorch-fid): BasicConv2d = conv(no bias) + BN(eps=1e-3) + relu, InceptionA/
B/C/D/E mixes, with the FID pooling quirks — avg-pools count_include_pad=
False, and Mixed_7c's pool branch is a MAX pool.  Features are the 2048-dim
global-average pool ("pool3"), bit-comparable to pytorch-fid given the same
weights (parity-tested against a torch oracle in tests/test_inception.py).

Input contract matches the reference detector: uint8 RGB [N, H, W, 3],
resized internally to 299x299 (bilinear, half-pixel centers, no antialias —
torch F.interpolate semantics) and normalized to [-1, 1].
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

import jax
import jax.numpy as jnp

BN_EPS = 1e-3


def _conv(x, p, name, stride=(1, 1), padding=(0, 0)):
    """BasicConv2d: conv(no bias) + folded BN + relu.  p[name] holds
    {'w': HWIO kernel, 'scale': [O], 'shift': [O]}."""
    q = p[name]
    pad = padding if isinstance(padding[0], tuple) else ((padding[0], padding[0]), (padding[1], padding[1]))
    x = jax.lax.conv_general_dilated(
        x, q["w"], stride, pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jax.nn.relu(x * q["scale"] + q["shift"])


def _maxpool3(x, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def _avgpool3_noinc(x):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s / cnt


def _inception_a(x, p, prefix):
    b1 = _conv(x, p, f"{prefix}.branch1x1")
    b5 = _conv(x, p, f"{prefix}.branch5x5_1")
    b5 = _conv(b5, p, f"{prefix}.branch5x5_2", padding=(2, 2))
    b3 = _conv(x, p, f"{prefix}.branch3x3dbl_1")
    b3 = _conv(b3, p, f"{prefix}.branch3x3dbl_2", padding=(1, 1))
    b3 = _conv(b3, p, f"{prefix}.branch3x3dbl_3", padding=(1, 1))
    bp = _conv(_avgpool3_noinc(x), p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(x, p, prefix):
    b3 = _conv(x, p, f"{prefix}.branch3x3", stride=(2, 2))
    bd = _conv(x, p, f"{prefix}.branch3x3dbl_1")
    bd = _conv(bd, p, f"{prefix}.branch3x3dbl_2", padding=(1, 1))
    bd = _conv(bd, p, f"{prefix}.branch3x3dbl_3", stride=(2, 2))
    return jnp.concatenate([b3, bd, _maxpool3(x)], axis=-1)


def _inception_c(x, p, prefix):
    b1 = _conv(x, p, f"{prefix}.branch1x1")
    b7 = _conv(x, p, f"{prefix}.branch7x7_1")
    b7 = _conv(b7, p, f"{prefix}.branch7x7_2", padding=(0, 3))
    b7 = _conv(b7, p, f"{prefix}.branch7x7_3", padding=(3, 0))
    bd = _conv(x, p, f"{prefix}.branch7x7dbl_1")
    bd = _conv(bd, p, f"{prefix}.branch7x7dbl_2", padding=(3, 0))
    bd = _conv(bd, p, f"{prefix}.branch7x7dbl_3", padding=(0, 3))
    bd = _conv(bd, p, f"{prefix}.branch7x7dbl_4", padding=(3, 0))
    bd = _conv(bd, p, f"{prefix}.branch7x7dbl_5", padding=(0, 3))
    bp = _conv(_avgpool3_noinc(x), p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p, prefix):
    b3 = _conv(x, p, f"{prefix}.branch3x3_1")
    b3 = _conv(b3, p, f"{prefix}.branch3x3_2", stride=(2, 2))
    b7 = _conv(x, p, f"{prefix}.branch7x7x3_1")
    b7 = _conv(b7, p, f"{prefix}.branch7x7x3_2", padding=(0, 3))
    b7 = _conv(b7, p, f"{prefix}.branch7x7x3_3", padding=(3, 0))
    b7 = _conv(b7, p, f"{prefix}.branch7x7x3_4", stride=(2, 2))
    return jnp.concatenate([b3, b7, _maxpool3(x)], axis=-1)


def _inception_e(x, p, prefix, pool: str):
    b1 = _conv(x, p, f"{prefix}.branch1x1")
    b3 = _conv(x, p, f"{prefix}.branch3x3_1")
    b3 = jnp.concatenate(
        [
            _conv(b3, p, f"{prefix}.branch3x3_2a", padding=(0, 1)),
            _conv(b3, p, f"{prefix}.branch3x3_2b", padding=(1, 0)),
        ],
        axis=-1,
    )
    bd = _conv(x, p, f"{prefix}.branch3x3dbl_1")
    bd = _conv(bd, p, f"{prefix}.branch3x3dbl_2", padding=(1, 1))
    bd = jnp.concatenate(
        [
            _conv(bd, p, f"{prefix}.branch3x3dbl_3a", padding=(0, 1)),
            _conv(bd, p, f"{prefix}.branch3x3dbl_3b", padding=(1, 0)),
        ],
        axis=-1,
    )
    if pool == "max":  # FIDInceptionE_2 (Mixed_7c) uses max pooling
        pooled = _maxpool3(x, stride=1, pad=1)
    else:
        pooled = _avgpool3_noinc(x)
    bp = _conv(pooled, p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_features(x: jax.Array, p: Mapping[str, Dict[str, jax.Array]]) -> jax.Array:
    """x: float32 [N, 299, 299, 3] in [-1, 1] -> [N, 2048] pool3 features."""
    x = _conv(x, p, "Conv2d_1a_3x3", stride=(2, 2))
    x = _conv(x, p, "Conv2d_2a_3x3")
    x = _conv(x, p, "Conv2d_2b_3x3", padding=(1, 1))
    x = _maxpool3(x)
    x = _conv(x, p, "Conv2d_3b_1x1")
    x = _conv(x, p, "Conv2d_4a_3x3")
    x = _maxpool3(x)
    x = _inception_a(x, p, "Mixed_5b")
    x = _inception_a(x, p, "Mixed_5c")
    x = _inception_a(x, p, "Mixed_5d")
    x = _inception_b(x, p, "Mixed_6a")
    x = _inception_c(x, p, "Mixed_6b")
    x = _inception_c(x, p, "Mixed_6c")
    x = _inception_c(x, p, "Mixed_6d")
    x = _inception_c(x, p, "Mixed_6e")
    x = _inception_d(x, p, "Mixed_7a")
    x = _inception_e(x, p, "Mixed_7b", pool="avg")
    x = _inception_e(x, p, "Mixed_7c", pool="max")
    return jnp.mean(x, axis=(1, 2))


def params_from_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Fold a torchvision-style state_dict into {block: {w, scale, shift}}.

    Accepts torch tensors or numpy arrays; BN is folded for inference:
    scale = gamma / sqrt(var + eps), shift = beta - mean * scale.
    """

    def np_(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, np.float32)

    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    prefixes = sorted({k.rsplit(".conv.weight", 1)[0] for k in sd if k.endswith(".conv.weight")})
    for name in prefixes:
        w = np_(sd[f"{name}.conv.weight"])  # [O, I, kh, kw]
        gamma = np_(sd[f"{name}.bn.weight"])
        beta = np_(sd[f"{name}.bn.bias"])
        mean = np_(sd[f"{name}.bn.running_mean"])
        var = np_(sd[f"{name}.bn.running_var"])
        scale = gamma / np.sqrt(var + BN_EPS)
        shift = beta - mean * scale
        out[name] = dict(
            w=jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            scale=jnp.asarray(scale),
            shift=jnp.asarray(shift),
        )
    if "Conv2d_1a_3x3" not in out:
        raise ValueError(
            f"state_dict does not look like a torchvision inception_v3 "
            f"(found prefixes: {prefixes[:5]}...)"
        )
    return out


def state_dict_from_torchscript(path: str) -> Dict[str, np.ndarray]:
    """Extract a flat state_dict from a TorchScript detector file (torch-CPU)."""
    import torch

    mod = torch.jit.load(path, map_location="cpu")
    sd = {}
    for k, v in mod.state_dict().items():
        # NVIDIA's TorchScript wraps the graph in a 'layers' module; strip
        # leading wrappers so torchvision-style suffixes remain.
        sd[k.split("layers.", 1)[-1]] = v.detach().cpu().numpy()
    return sd


class InceptionV3Features:
    """Callable extractor: uint8 NHWC RGB -> [N, 2048] float32 (pool3).

    tag feeds the FeatureStats cache key (metrics/feature_stats.py)."""

    tag = "inception-jax-v1"

    def __init__(self, params: Mapping[str, Dict[str, jnp.ndarray]]):
        self.params = dict(params)
        self._fn = jax.jit(self._forward)

    @classmethod
    def from_state_dict(cls, sd) -> "InceptionV3Features":
        return cls(params_from_state_dict(sd))

    @classmethod
    def from_file(cls, path: str) -> "InceptionV3Features":
        """Load from a .pt/.pth state_dict or TorchScript file, or an .npz."""
        if path.endswith(".npz"):
            return cls.from_state_dict(dict(np.load(path)))
        import torch

        try:
            obj = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(obj, dict):
                return cls.from_state_dict(obj)
        except Exception:
            pass
        return cls.from_state_dict(state_dict_from_torchscript(path))

    def _forward(self, images: jax.Array) -> jax.Array:
        x = images.astype(jnp.float32)
        if x.shape[1] != 299 or x.shape[2] != 299:
            # torch F.interpolate(bilinear, align_corners=False) semantics
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), "bilinear", antialias=False
            )
        x = x / 127.5 - 1.0
        return inception_features(x, self.params)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(images)))

"""VGG19 feature extractor for the perceptual loss.

Counterpart of `training/loss_wo_flow_fullbody.py:259-400` (VGGLoss +
VGG19_Feature): features are tapped after relu1_1 / relu2_1 / relu3_1 /
relu4_1 / relu5_1 and compared with L1 at weights [1/32,1/16,1/8,1/4,1].
The reference feeds images in [-1,1] *without* ImageNet normalization; we
keep that behavior for parity.

Weights: the reference loads torchvision's `vgg19-dcbb9e9d.pth`.  With no
network egress, `load_torch_vgg19` imports that checkpoint if a local copy
exists (pasta_gan_tpu/io/torch_import.py); otherwise `init_vgg19` gives a
He-initialized network — still a structurally valid perceptual metric for
smoke training, clearly flagged via `pretrained=False` in the returned meta.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG19 ("E") conv plan: channels per conv, with 'M' = 2x2 maxpool between stages.
_VGG19_PLAN: List[Any] = [
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512, "M",
]

# Indices (in conv order, 0-based) after whose relu we tap features:
# relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 (the perceptual-loss slices).
_TAP_AFTER_CONV = (0, 2, 4, 8, 12)
# relu1_2, relu2_2, relu3_2, relu4_2, relu5_2 (the contextual-loss taps,
# reference loss file :71 `['r12','r22','r32','r42','r52']`).
CONTEXTUAL_TAPS = (1, 3, 5, 9, 13)


class VGG19Features(nn.Module):
    """Runs the VGG19 conv stack, returning the tapped feature maps (NHWC)."""

    taps: Tuple[int, ...] = _TAP_AFTER_CONV
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        taps = []
        conv_idx = 0
        for item in _VGG19_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding=1, dtype=self.dtype, name=f"conv{conv_idx}")(x)
            x = jax.nn.relu(x)
            if conv_idx in self.taps:
                taps.append(x)
            conv_idx += 1
            if len(taps) == len(self.taps) and conv_idx > max(self.taps):
                break
        return tuple(taps)


def vgg_preprocess_bgr_caffe(x: jax.Array) -> jax.Array:
    """[-1,1] RGB -> caffe-style BGR*255 (reference loss file :406-415),
    for the contextual-loss VGG."""
    x = (x + 1.0) / 2.0
    bgr = x[..., ::-1]
    mean = jnp.asarray([0.40760392, 0.45795686, 0.48501961], x.dtype)
    return (bgr - mean) * 255.0


def contextual_vgg_loss(vgg_params, x: jax.Array, y: jax.Array, h: float = 0.1,
                        dtype=jnp.float32) -> jax.Array:
    """CX loss summed over the r12..r52 taps (reference loss file :404-541)."""
    from .losses import contextual_loss

    model = VGG19Features(taps=CONTEXTUAL_TAPS, dtype=dtype)
    fx = model.apply(vgg_params, vgg_preprocess_bgr_caffe(x))
    fy = model.apply(vgg_params, vgg_preprocess_bgr_caffe(jax.lax.stop_gradient(y)))
    total = 0.0
    for a, b in zip(fx, fy):
        total = total + contextual_loss(a, jax.lax.stop_gradient(b), h=h)
    return total


VGG_SLICE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_perceptual_loss(vgg_params, x: jax.Array, y: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Weighted multi-scale L1 between VGG features; y is treated as constant
    (the reference detaches the target features, loss_wo_flow_fullbody.py:270)."""
    model = VGG19Features(dtype=dtype)
    fx = model.apply(vgg_params, x)
    fy = model.apply(vgg_params, jax.lax.stop_gradient(y))
    loss = 0.0
    for w, a, b in zip(VGG_SLICE_WEIGHTS, fx, fy):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss


def init_vgg19(rng: jax.Array, image_size: int = 64):
    """He-initialized VGG19 params (fallback when no torch checkpoint exists).

    Initialized through the deeper contextual tap set so the same params serve
    both the perceptual (conv0..12) and contextual (conv0..13) feature stacks.
    """
    model = VGG19Features(taps=CONTEXTUAL_TAPS)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    return model.init(rng, dummy)


def load_torch_vgg19(path: str):
    """Convert torchvision vgg19 `state_dict` (features.N.weight OIHW) to our params."""
    import torch

    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    # torchvision layer indices of the conv layers, in order.
    conv_layer_ids = []
    i = 0
    for item in _VGG19_PLAN:
        if item == "M":
            i += 1
            continue
        conv_layer_ids.append(i)
        i += 2  # conv + relu
    params = {}
    for conv_idx, layer_id in enumerate(conv_layer_ids):
        w = state[f"features.{layer_id}.weight"].numpy()  # OIHW
        b = state[f"features.{layer_id}.bias"].numpy()
        params[f"conv{conv_idx}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # -> HWIO
            "bias": jnp.asarray(b),
        }
    return {"params": params}

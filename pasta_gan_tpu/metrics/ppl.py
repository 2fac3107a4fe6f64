"""Perceptual Path Length sampler (reference `metrics/perceptual_path_length.py`).

The reference perturbs latents and measures LPIPS (VGG16) distance per unit
step.  This framework's generators are conditioned on style codes rather than
free latents (z_dim=0 in the config of record), so PPL is computed in
**w-space between the mapped codes of two data samples** (`sampling='end'`
uses t=0, `'full'` t~U(0,1); reference ppl2_wend == w-space, full-path,
epsilon 1e-4, crop).  The distance network is pluggable:

* `lpips_distance(state_dict)` — the reference's actual distance
  (LPIPS-VGG16, `perceptual_path_length.py:86-95`) via the JAX-native
  embedding in metrics/vgg16.py; supply vgg16 weights (+ lin heads for the
  published calibration),
* `vgg_feature_distance(vgg_params)` — offline fallback over the
  framework's VGG19 taps (documented substitution — comparable relative
  orderings, different absolute scale).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .formulas import ppl_from_distances


def center_crop_for_ppl(img: jnp.ndarray) -> jnp.ndarray:
    """The reference's face-region crop (ppl.py:141-144): rows 3/8..7/8,
    cols 2/8..6/8 of a square image; NHWC."""
    H = img.shape[1]
    c = H // 8
    return img[:, c * 3 : c * 7, c * 2 : c * 6, :]


def vgg_feature_distance(vgg_params):
    """Squared feature distance per sample using the VGG19 perceptual taps."""
    from ..train.vgg import VGG19Features

    model = VGG19Features()

    @jax.jit
    def dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = model.apply(vgg_params, a)
        fb = model.apply(vgg_params, b)
        total = 0.0
        for x, y in zip(fa, fb):
            total = total + jnp.mean(jnp.square(x - y), axis=(1, 2, 3))
        return total

    return dist


def lpips_distance(state_dict):
    """LPIPS-VGG16 squared distance per sample (the reference PPL metric's
    distance, `perceptual_path_length.py:86-95`).  `state_dict`: torchvision
    vgg16 weights (+ optional lin0..lin4 heads).  Input convention matches
    the embedding contract: images in [0, 255] are rescaled to [-1, 1]."""
    from .vgg16 import LPIPSFeatures

    model = LPIPSFeatures.from_state_dict(state_dict)

    @jax.jit
    def dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = model._forward(a / 127.5 - 1.0)
        fb = model._forward(b / 127.5 - 1.0)
        return jnp.sum(jnp.square(fa - fb), axis=-1)

    return dist


def compute_ppl(
    synthesize_from_ws: Callable[[jnp.ndarray], jnp.ndarray],  # ws[, *aux] -> [-1,1] NHWC images
    ws_pair_source: Iterable,  # yields (ws0, ws1[, *aux]) — ws [B, num_ws, w_dim]
    distance_fn: Callable,
    num_samples: int = 2000,
    epsilon: float = 1e-4,
    sampling: str = "end",
    crop: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> float:
    """Pairs may carry extra conditioning: a source yielding
    (ws0, ws1, aux...) has the aux forwarded to `synthesize_from_ws(ws, aux...)`
    unchanged while w interpolates — the try-on generators condition the
    synthesis on pose/retain/denorm inputs that must be held fixed along the
    w path (reference `perceptual_path_length.py:36-63` holds c fixed)."""
    assert sampling in ("full", "end")
    rng = rng or np.random.default_rng(0)
    dists = []
    n = 0
    for item in ws_pair_source:
        ws0, ws1, *aux = item
        B = ws0.shape[0]
        t = rng.uniform(size=(B, 1, 1)) if sampling == "full" else np.zeros((B, 1, 1))
        t = jnp.asarray(t, ws0.dtype)
        wt0 = ws0 + (ws1 - ws0) * t
        wt1 = ws0 + (ws1 - ws0) * (t + epsilon)
        img0 = synthesize_from_ws(wt0, *aux)
        img1 = synthesize_from_ws(wt1, *aux)
        if crop:
            img0, img1 = center_crop_for_ppl(img0), center_crop_for_ppl(img1)
        # scale to the reference's [0,255] convention before the distance net
        d = distance_fn((img0 + 1) * 127.5, (img1 + 1) * 127.5) / (epsilon**2)
        dists.append(np.asarray(d))
        n += B
        if n >= num_samples:
            break
    return ppl_from_distances(np.concatenate(dists)[:num_samples])

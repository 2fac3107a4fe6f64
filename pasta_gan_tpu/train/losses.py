"""Loss functions (reference `training/loss_wo_flow_fullbody.py`).

Pure functions over params; gradient plumbing lives in train/step.py.  Key
reference semantics preserved:
* non-saturating logistic GAN loss applied to BOTH the coarse and the finetune
  image and averaged (`loss_wo_flow_fullbody.py:173-175,226`),
* L1 and VGG perceptual losses against the real image on both outputs,
* parsing cross-entropy with class weights [1,2,2,3,3,3] and ignore_index 255
  (`:55-56,156-157`),
* R1 on D via grad-of-grad (`:244-251`) — native JAX AD, no gradfix needed,
* path-length regularization (`:184-205`; weight 0 in the config of record),
* contextual (CX) loss formula (`:487-541`; weight 0 in the config of record).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# ------------------------------------------------------------------ GAN terms


def g_nonsaturating(logits: jax.Array) -> jax.Array:
    """-log sigmoid(D(fake)) (softplus(-x))."""
    return jnp.mean(jax.nn.softplus(-logits))


def d_fake(logits: jax.Array) -> jax.Array:
    """-log(1 - sigmoid(D(fake))) (softplus(x))."""
    return jnp.mean(jax.nn.softplus(logits))


def d_real(logits: jax.Array) -> jax.Array:
    """-log sigmoid(D(real))."""
    return jnp.mean(jax.nn.softplus(-logits))


def r1_penalty(d_apply, d_params, real_img: jax.Array, c: Optional[jax.Array]) -> jax.Array:
    """R1 gradient penalty: ||grad_x D(x)||^2 per sample, batch-meaned."""

    def d_sum(x):
        return jnp.sum(d_apply(d_params, x, c))

    grads = jax.grad(d_sum)(real_img)
    return jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))


# ------------------------------------------------------------- pixel / parsing

def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


# class weights for {bg, upper, lower, hands, legs, neck} (loss file :55).
PARSING_CLASS_WEIGHTS = (1.0, 2.0, 2.0, 3.0, 3.0, 3.0)


def parsing_cross_entropy(
    logits: jax.Array,  # [N, H, W, K]
    labels: jax.Array,  # [N, H, W] int, 255 = ignore
    class_weights=PARSING_CLASS_WEIGHTS,
) -> jax.Array:
    """Weighted CE with ignore_index=255, matching torch CrossEntropyLoss
    semantics (weighted mean: sum(w_i * ce_i) / sum(w_i) over valid pixels)."""
    K = logits.shape[-1]
    labels = labels.astype(jnp.int32)
    valid = (labels != 255) & (labels >= 0) & (labels < K)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, jnp.float32)[safe_labels] * valid.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)


# --------------------------------------------------------------- path length

def pl_penalty_from_grads(pl_grads: jax.Array, pl_mean: jax.Array, pl_decay: float):
    """Path-length penalty given dL/dws grads (reference `:194-205`)."""
    lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
    new_mean = pl_mean + pl_decay * (jnp.mean(lengths) - pl_mean)
    penalty = jnp.square(lengths - new_mean)
    return jnp.mean(penalty), new_mean


# ---------------------------------------------------------------- contextual

def feature_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True)) + eps
    return x / norm


def contextual_loss(
    x_features: jax.Array,  # [N, H, W, C]
    y_features: jax.Array,  # [N, H, W, C]
    h: float = 0.1,
    pono: bool = True,
) -> jax.Array:
    """CX loss over cosine-affinity softmax (reference `:487-541`), NHWC."""
    N, H, W, C = x_features.shape
    if pono:
        mu = jnp.mean(y_features, axis=-1, keepdims=True)
        x_features = x_features - mu
        y_features = y_features - mu
    else:
        mu = jnp.mean(y_features, axis=(1, 2), keepdims=True)
        x_features = x_features - mu
        y_features = y_features - mu
    xf = feature_normalize(x_features).reshape(N, H * W, C)
    yf = feature_normalize(y_features).reshape(N, H * W, C)
    d = 1.0 - jnp.einsum("nqc,nkc->nqk", xf, yf, preferred_element_type=jnp.float32)
    d_norm = d / (jnp.min(d, axis=-1, keepdims=True) + 1e-3)
    w = jnp.exp((1.0 - d_norm) / h)
    a_ij = w / jnp.sum(w, axis=-1, keepdims=True)
    cx = jnp.mean(jnp.max(a_ij, axis=-1), axis=1)
    return jnp.mean(-jnp.log(cx))

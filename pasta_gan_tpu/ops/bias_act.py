"""Fused bias + activation + gain + clamp.

TPU-native counterpart of the reference CUDA op
(`torch_utils/ops/bias_act.py:23-33,55-124` + `bias_act.{cpp,cu}`): on TPU the
whole chain is elementwise VPU work that XLA fuses into the producing matmul /
conv, so no hand-written kernel is needed — the value of this module is the
*semantics*: the 9-entry activation table with per-activation default gains
(`def_gain`), the optional alpha parameter, and the output clamp.

Layout note: this package is NHWC, so the default bias axis is -1 (channels),
unlike the reference's NCHW `dim=1`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)


@dataclasses.dataclass(frozen=True)
class ActivationSpec:
    func: Callable  # (x, alpha) -> y
    def_alpha: float
    def_gain: float
    has_2nd_grad: bool  # informational: JAX differentiates everything natively


# Same 9 activations as the reference table (`bias_act.py:23-33`).
activation_funcs: dict[str, ActivationSpec] = {
    "linear": ActivationSpec(lambda x, a: x, 0.0, 1.0, False),
    "relu": ActivationSpec(lambda x, a: jax.nn.relu(x), 0.0, _SQRT2, False),
    "lrelu": ActivationSpec(lambda x, a: jax.nn.leaky_relu(x, a), 0.2, _SQRT2, False),
    "tanh": ActivationSpec(lambda x, a: jnp.tanh(x), 0.0, 1.0, True),
    "sigmoid": ActivationSpec(lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0, True),
    "elu": ActivationSpec(lambda x, a: jax.nn.elu(x), 0.0, 1.0, True),
    "selu": ActivationSpec(lambda x, a: jax.nn.selu(x), 0.0, 1.0, True),
    "softplus": ActivationSpec(lambda x, a: jax.nn.softplus(x), 0.0, 1.0, True),
    "swish": ActivationSpec(lambda x, a: jax.nn.sigmoid(x) * x, 0.0, _SQRT2, True),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    axis: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Add bias along `axis`, apply `act`, scale by `gain`, clamp to ±`clamp`.

    Matches the reference `bias_act()` contract (`bias_act.py:55-124`): each
    step is optional, `gain` defaults to the activation's `def_gain`, and
    `clamp` (if given, must be >= 0) bounds the output symmetrically.
    Arbitrary-order gradients come for free from JAX AD (the reference needed
    a dedicated 2nd-order CUDA kernel).
    """
    spec = activation_funcs[act]
    alpha_v = float(spec.def_alpha if alpha is None else alpha)
    gain_v = float(spec.def_gain if gain is None else gain)

    if b is not None:
        if b.ndim != 1:
            raise ValueError(f"bias must be 1D, got shape {b.shape}")
        ax = axis % x.ndim
        if b.shape[0] != x.shape[ax]:
            raise ValueError(f"bias size {b.shape[0]} != x.shape[{ax}] = {x.shape[ax]}")
        shape = [1] * x.ndim
        shape[ax] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha_v)
    if gain_v != 1.0:
        x = x * jnp.asarray(gain_v, dtype=x.dtype)
    if clamp is not None:
        if clamp < 0:
            raise ValueError("clamp must be non-negative")
        x = jnp.clip(x, -clamp, clamp)
    return x

"""Training state pytree.

Functional replacement for the reference's mutable module/optimizer/buffer
soup: everything the training loop mutates lives in this one struct —
generator/discriminator params, EMA params, mapping w_avg, optimizer moments,
the ADA controller state, and the PL running mean (SURVEY.md section 5.4).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    g_params: Any
    d_params: Any
    g_ema_params: Any
    w_avg: jnp.ndarray  # [w_dim]
    g_opt_state: Any
    d_opt_state: Any
    pl_mean: jnp.ndarray  # f32 scalar
    ada_p: jnp.ndarray  # f32 scalar, augment probability
    ada_signs_sum: jnp.ndarray  # f32 scalar, accumulated sign(D(real))
    ada_signs_count: jnp.ndarray  # f32 scalar

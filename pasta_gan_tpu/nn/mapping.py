"""Mapping network z/c -> w (reference `training/networks.py:183-259`).

Functional-state redesign: the reference mutates a `w_avg` buffer inside
forward; here the module is pure — it returns the broadcast ws *and* the batch
mean of w, and the training step owns the `w_avg` EMA (a leaf of the train
state).  Truncation takes `w_avg` as an explicit argument.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FullyConnectedLayer, normalize_2nd_moment


class MappingNetwork(nn.Module):
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995  # consumed by the train step, kept for config parity
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: Optional[jax.Array],
        c: Optional[jax.Array],
        w_avg: Optional[jax.Array] = None,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
    ):
        embed_features = self.embed_features
        if embed_features is None:
            embed_features = self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features or self.w_dim
        features_list = (
            [self.z_dim + embed_features] + [layer_features] * (self.num_layers - 1) + [self.w_dim]
        )

        x = None
        if self.z_dim > 0:
            assert z is not None and z.shape[-1] == self.z_dim
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            assert c is not None and c.shape[-1] == self.c_dim
            y = FullyConnectedLayer(
                self.c_dim, embed_features, dtype=self.dtype, name="embed"
            )(c.astype(jnp.float32))
            y = normalize_2nd_moment(y)
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y
        assert x is not None, "MappingNetwork needs z_dim > 0 or c_dim > 0"

        for idx in range(self.num_layers):
            x = FullyConnectedLayer(
                features_list[idx],
                features_list[idx + 1],
                activation=self.activation,
                lr_multiplier=self.lr_multiplier,
                dtype=self.dtype,
                name=f"fc{idx}",
            )(x)

        w_raw = x  # [N, w_dim]; train step uses mean(w_raw) for the w_avg EMA

        if self.num_ws is not None:
            x = jnp.tile(x[:, None, :], (1, self.num_ws, 1))

        if truncation_psi != 1.0:
            assert w_avg is not None, "truncation requires w_avg"
            w_avg = w_avg.astype(x.dtype)
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + truncation_psi * (x - w_avg)
            else:
                head = w_avg + truncation_psi * (x[:, : truncation_cutoff] - w_avg)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x, w_raw

"""Pallas resampling kernels: parity vs the XLA upfirdn2d path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.ops import downsample2d, setup_filter, upsample2d
from pasta_gan_tpu.ops.pallas_upfirdn import (
    downsample2x_pallas,
    is_canonical_filter,
    upsample2x_pallas,
)


@pytest.mark.parametrize("shape", [(2, 32, 24, 16), (1, 16, 16, 8), (3, 8, 40, 4)])
def test_up2_matches_xla(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f = setup_filter(jnp.asarray([1.0, 3.0, 3.0, 1.0]))
    ref = upsample2d(x, f)
    ours = upsample2x_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 32, 24, 16), (1, 16, 16, 8), (3, 8, 40, 4)])
def test_down2_matches_xla(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f = setup_filter(jnp.asarray([1.0, 3.0, 3.0, 1.0]))
    ref = downsample2d(x, f)
    ours = downsample2x_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_canonical_filter_detection():
    f1 = setup_filter(jnp.asarray([1.0, 3.0, 3.0, 1.0]))
    assert is_canonical_filter(np.asarray(f1))
    f2 = setup_filter(jnp.asarray([1.0, 2.0, 1.0]))
    assert not is_canonical_filter(np.asarray(f2))

"""W-packing parity (ops/packing.py): the packed tail must match the unpacked
path exactly (same params, same math, different summation order)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.ops.conv2d_resample import conv2d_resample
from pasta_gan_tpu.ops.packing import (
    conv_packed_same,
    conv_packed_up2,
    pack_w,
    unpack_w,
)
from pasta_gan_tpu.ops.upfirdn2d import setup_filter


@pytest.mark.parametrize("k", [1, 3])
def test_conv_packed_same_matches_dense(k):
    rng = np.random.default_rng(0)
    N, H, W, I, O = 2, 8, 12, 5, 7
    x = jnp.asarray(rng.normal(size=(N, H, W, I)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, I, O)) * 0.2, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = unpack_w(conv_packed_same(pack_w(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_conv_packed_up2_matches_resample():
    rng = np.random.default_rng(1)
    N, H, I, O = 2, 10, 6, 4
    f = setup_filter(jnp.asarray([1.0, 3.0, 3.0, 1.0]), separable=False)
    x = jnp.asarray(rng.normal(size=(N, H, H, I)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, I, O)) * 0.2, jnp.float32)
    ref = conv2d_resample(x, w, f=f, up=2, padding=1, flip_weight=False)
    got = unpack_w(conv_packed_up2(x, w, f))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("noise_mode", ["none", "const"])
@pytest.mark.slow
def test_synthesis_pack_tail_parity(noise_mode):
    """Full SynthesisNetworkFull: pack_tail on/off with identical params."""
    from pasta_gan_tpu.nn.synthesis import SynthesisNetworkFull

    kw = dict(
        w_dim=32, img_resolution=64, img_channels=3,
        channel_base=2048, channel_max=128,  # channels(64)=32 -> tail packs
    )
    net_off = SynthesisNetworkFull(pack_tail=False, **kw)
    net_on = SynthesisNetworkFull(pack_tail=True, **kw)

    rng = jax.random.PRNGKey(0)
    N = 2
    ws = jax.random.normal(rng, (N, net_off.num_ws, 32))
    pose_feat = jax.random.normal(jax.random.PRNGKey(1), (N, 4, 4, 128))
    cat_feat = {
        "32": jax.random.normal(jax.random.PRNGKey(2), (N, 32, 32, 64)),
        "64": jax.random.normal(jax.random.PRNGKey(3), (N, 64, 64, 64)),
    }
    du = jax.random.normal(jax.random.PRNGKey(4), (N, 64, 64, 3))
    dl = jax.random.normal(jax.random.PRNGKey(5), (N, 64, 64, 3))
    dum = (jax.random.uniform(jax.random.PRNGKey(6), (N, 64, 64, 1)) > 0.3).astype(jnp.float32)
    dlm = (jax.random.uniform(jax.random.PRNGKey(7), (N, 64, 64, 1)) > 0.3).astype(jnp.float32)
    args = (ws, pose_feat, cat_feat, du, dl, dum, dlm)

    variables = net_off.init({"params": rng, "noise": rng}, *args, noise_mode=noise_mode)
    out_off = net_off.apply(variables, *args, noise_mode=noise_mode)
    out_on = net_on.apply(variables, *args, noise_mode=noise_mode)

    for a, b, name in zip(out_off[:2], out_on[:2], ("img", "finetune")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3, err_msg=name
        )


@pytest.mark.slow
def test_generator_full_pack_tail_parity():
    from pasta_gan_tpu.models import GeneratorFull

    kw = dict(img_resolution=64, channel_base=2048, channel_max=128, mapping_layers=1)
    g_off = GeneratorFull(pack_tail=False, **kw)
    g_on = GeneratorFull(pack_tail=True, **kw)

    rng = jax.random.PRNGKey(0)
    N = 2
    inputs = dict(
        z=None,
        c=jax.random.normal(jax.random.PRNGKey(1), (N, 64, 64, 42)),
        retain=jax.random.normal(jax.random.PRNGKey(2), (N, 64, 64, 3)),
        pose=jax.random.normal(jax.random.PRNGKey(3), (N, 64, 64, 6)),
        denorm_upper_input=jax.random.normal(jax.random.PRNGKey(4), (N, 64, 64, 3)),
        denorm_lower_input=jax.random.normal(jax.random.PRNGKey(5), (N, 64, 64, 3)),
        denorm_upper_mask=(jax.random.uniform(jax.random.PRNGKey(6), (N, 64, 64, 1)) > 0.5).astype(jnp.float32),
        denorm_lower_mask=(jax.random.uniform(jax.random.PRNGKey(7), (N, 64, 64, 1)) > 0.5).astype(jnp.float32),
    )
    variables = g_off.init({"params": rng, "noise": rng}, **inputs, noise_mode="none")
    img_off, ft_off, _ = g_off.apply(variables, **inputs, noise_mode="none")
    img_on, ft_on, _ = g_on.apply(variables, **inputs, noise_mode="none")
    np.testing.assert_allclose(np.asarray(img_off), np.asarray(img_on), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ft_off), np.asarray(ft_on), atol=5e-4, rtol=1e-3)

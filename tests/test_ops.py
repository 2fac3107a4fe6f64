"""Parity tests for the L0 ops against the reference PyTorch implementations.

Oracle strategy per SURVEY.md section 4: the reference ships dual
implementations (`impl='ref'` slow paths); we import those directly from the
read-only mount and require our NHWC/JAX ops to match them numerically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.ops import (
    bias_act,
    conv2d_resample,
    downsample2d,
    filter2d,
    modulated_conv2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)

from _torch_oracle import load_reference

_REF = load_reference()
needs_ref = pytest.mark.skipif(_REF is None, reason="reference mount unavailable")


def _nchw(x_nhwc):
    import torch

    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


# ---------------------------------------------------------------- bias_act


@needs_ref
@pytest.mark.parametrize(
    "act", ["linear", "relu", "lrelu", "tanh", "sigmoid", "elu", "selu", "softplus", "swish"]
)
def test_bias_act_matches_reference(act):
    import torch

    ref_bias_act, _, _ = _REF
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 5, 9), dtype=np.float32) * 3
    b = rng.standard_normal((9,), dtype=np.float32)

    ours = bias_act(jnp.asarray(x), jnp.asarray(b), axis=-1, act=act, clamp=4.0)
    theirs = ref_bias_act._bias_act_ref(
        _nchw(x), torch.from_numpy(b), dim=1, act=act, clamp=4.0
    )
    # atol 1e-4: XLA and torch use different transcendental approximations.
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs), rtol=1e-4, atol=1e-4)


def test_bias_act_gain_and_defaults():
    x = jnp.ones((2, 4))
    y = bias_act(x, act="lrelu")  # def_gain = sqrt(2)
    np.testing.assert_allclose(np.asarray(y), np.sqrt(2.0), rtol=1e-6)
    y2 = bias_act(x, act="lrelu", gain=1.0)
    np.testing.assert_allclose(np.asarray(y2), 1.0, rtol=1e-6)


def test_bias_act_second_order_grad():
    # The reference needed a dedicated 2nd-order CUDA kernel; JAX AD is free.
    f = lambda x: jnp.sum(bias_act(x, act="swish") ** 2)
    g2 = jax.hessian(f)(jnp.asarray([0.3, -0.7]))
    assert np.all(np.isfinite(np.asarray(g2)))


# ---------------------------------------------------------------- upfirdn2d


@needs_ref
@pytest.mark.parametrize(
    "up,down,padding",
    [
        (1, 1, 0),
        (2, 1, (2, 1, 2, 1)),
        (1, 2, 1),
        (2, 2, (1, 1, 1, 1)),
        (4, 1, 3),
        (1, 1, (-1, 2, 0, -1)),  # negative padding = crop
    ],
)
@pytest.mark.parametrize("flip", [False, True])
def test_upfirdn2d_matches_reference(up, down, padding, flip):
    import torch

    _, ref_upfirdn2d, _ = _REF
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 10, 3), dtype=np.float32)
    f_np = np.asarray([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    f_t = ref_upfirdn2d.setup_filter(torch.from_numpy(f_np))
    f_j = setup_filter(jnp.asarray(f_np))
    np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(), rtol=1e-6)

    ours = upfirdn2d(
        jnp.asarray(x), f_j, up=up, down=down, padding=padding, flip_filter=flip, gain=2.0
    )
    theirs = ref_upfirdn2d._upfirdn2d_ref(
        _nchw(x), f_t, up=up, down=down, padding=padding, flip_filter=flip, gain=2.0
    )
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs), rtol=1e-4, atol=1e-5)


@needs_ref
def test_upfirdn2d_separable_matches_reference():
    import torch

    _, ref_upfirdn2d, _ = _REF
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, 16, 2), dtype=np.float32)
    taps = np.hanning(8).astype(np.float32) + 0.1
    f_t = ref_upfirdn2d.setup_filter(torch.from_numpy(taps))  # stays separable (>=8 taps)
    f_j = setup_filter(jnp.asarray(taps))
    assert f_j.ndim == 1
    ours = upfirdn2d(jnp.asarray(x), f_j, up=2, padding=(3, 2, 3, 2))
    theirs = ref_upfirdn2d._upfirdn2d_ref(_nchw(x), f_t, up=2, padding=(3, 2, 3, 2))
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs), rtol=1e-4, atol=1e-5)


@needs_ref
@pytest.mark.parametrize("helper", ["filter2d", "upsample2d", "downsample2d"])
def test_resample_helpers_match_reference(helper):
    import torch

    _, ref_upfirdn2d, _ = _REF
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    f_np = np.asarray([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    f_t = ref_upfirdn2d.setup_filter(torch.from_numpy(f_np))
    f_j = setup_filter(jnp.asarray(f_np))

    ours_fn = {"filter2d": filter2d, "upsample2d": upsample2d, "downsample2d": downsample2d}[helper]
    ref_fn = {
        "filter2d": ref_upfirdn2d.filter2d,
        "upsample2d": ref_upfirdn2d.upsample2d,
        "downsample2d": ref_upfirdn2d.downsample2d,
    }[helper]
    ours = ours_fn(jnp.asarray(x), f_j)
    theirs = ref_fn(_nchw(x), f_t, impl="ref")
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- conv2d_resample


@needs_ref
@pytest.mark.parametrize(
    "up,down,padding,kernel,groups",
    [
        (1, 1, 1, 3, 1),
        (2, 1, 1, 3, 1),
        (1, 2, 1, 3, 1),
        (1, 2, 0, 1, 1),  # 1x1 down fast path in the reference
        (2, 1, 0, 1, 1),  # 1x1 up fast path
        (1, 1, 0, 4, 2),  # grouped
    ],
)
@pytest.mark.parametrize("flip_weight", [True, False])
def test_conv2d_resample_matches_reference(up, down, padding, kernel, groups, flip_weight):
    import torch

    _, ref_upfirdn2d, ref_conv2d_resample = _REF
    rng = np.random.default_rng(4)
    N, I, O, H = 2, 6, 8, 10
    x = rng.standard_normal((N, H, H, I), dtype=np.float32)
    # ours: HWIO; theirs: OIkk (per-group input channels)
    w = rng.standard_normal((kernel, kernel, I // groups, O), dtype=np.float32) * 0.3
    f_np = np.asarray([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    f_t = ref_upfirdn2d.setup_filter(torch.from_numpy(f_np))
    f_j = setup_filter(jnp.asarray(f_np))

    ours = conv2d_resample(
        jnp.asarray(x), jnp.asarray(w), f=f_j, up=up, down=down, padding=padding,
        groups=groups, flip_weight=flip_weight,
    )
    w_t = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())  # HWIO -> OIkk
    theirs = ref_conv2d_resample.conv2d_resample(
        _nchw(x), w_t, f=f_t, up=up, down=down, padding=padding, groups=groups,
        flip_weight=flip_weight,
    )
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- modulated_conv2d


@needs_ref
@pytest.mark.parametrize("demodulate", [True, False])
@pytest.mark.parametrize("up", [1, 2])
@pytest.mark.parametrize("ref_fused", [True, False])
def test_modulated_conv2d_matches_reference(demodulate, up, ref_fused):
    """Our single scaled-activation path must match BOTH reference paths."""
    import torch

    sys_networks = _load_ref_networks()
    if sys_networks is None:
        pytest.skip("reference networks module unavailable")
    _, ref_upfirdn2d, _ = _REF

    rng = np.random.default_rng(5)
    N, I, O, H, k = 3, 4, 6, 8, 3
    x = rng.standard_normal((N, H, H, I), dtype=np.float32)
    w = rng.standard_normal((k, k, I, O), dtype=np.float32) * 0.4
    s = rng.standard_normal((N, I), dtype=np.float32) * 0.5 + 1.0
    f_np = np.asarray([1.0, 3.0, 3.0, 1.0], dtype=np.float32)

    ours = modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
        up=up, padding=k // 2,
        resample_filter=setup_filter(jnp.asarray(f_np)) if up > 1 else None,
        demodulate=demodulate, flip_weight=(up == 1),
    )
    theirs = sys_networks.modulated_conv2d(
        _nchw(x),
        torch.from_numpy(w.transpose(3, 2, 0, 1).copy()),
        torch.from_numpy(s),
        up=up,
        padding=k // 2,
        resample_filter=ref_upfirdn2d.setup_filter(torch.from_numpy(f_np)) if up > 1 else None,
        demodulate=demodulate,
        flip_weight=(up == 1),
        fused_modconv=ref_fused,
    )
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs), rtol=2e-3, atol=2e-4)


def _load_ref_networks():
    import os
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    try:
        # util_functions.py loads ./human_colormap.mat relative to the cwd, and
        # networks.py crashes on torch builds where torch.version.cuda is None.
        import torch

        if torch.version.cuda is None:
            torch.version.cuda = "0.0"
        os.chdir("/root/reference")
        from training import networks as ref_networks  # noqa

        return ref_networks
    except Exception:
        return None
    finally:
        os.chdir(cwd)

"""End-to-end torch parity for the v1 flow-based Generator vs the reference
executed live (random weights via io/torch_import), plus FlowNet-family unit
checks (spectral norm, transposed conv, batch-stat norm, grid_sample)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_torch_import import _REF, needs_ref

RES = 256
CBASE = 2048
CMAX = 512


def _state(mod):
    return {
        name: t.detach().numpy()
        for name, t in list(mod.named_parameters()) + list(mod.named_buffers())
    }


@needs_ref
@pytest.mark.slow
def test_flownet_forward_parity():
    import torch

    torch.manual_seed(0)
    ref = _REF.FlowNet(12).eval()

    from pasta_gan_tpu.io.torch_import import convert_generator_full
    from pasta_gan_tpu.nn.flow import FlowNet

    net = FlowNet(12)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 12)).astype(np.float32)

    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # reference names have no leading component; prefix to reuse the converter
    state = {f"flownet.{k}": v for k, v in _state(ref).items()}
    wrapped = {
        coll: {"flownet": tree} for coll, tree in variables.items()
    }
    wrapped = convert_generator_full(state, wrapped)
    variables = {coll: tree["flownet"] for coll, tree in wrapped.items()}

    flow_j = net.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        flow_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    # untrained spectral+BN stacks amplify to ~1e4 magnitudes, so compare by
    # normalized error (f32 accumulation differs across frameworks)
    a, b = np.asarray(flow_j), flow_t.numpy()
    denom = np.mean(np.abs(b))
    assert np.mean(np.abs(a - b)) / denom < 1e-3, np.mean(np.abs(a - b)) / denom
    assert np.max(np.abs(a - b)) / denom < 5e-2


@needs_ref
@pytest.mark.slow
def test_generator_v1_forward_parity():
    import torch

    from pasta_gan_tpu.io.torch_import import convert_generator_full
    from pasta_gan_tpu.models import GeneratorV1

    torch.manual_seed(0)
    G_ref = _REF.Generator(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=CBASE, channel_max=CMAX,
                              conv_clamp=256, use_noise=True),
    ).eval()

    gen = GeneratorV1(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES,
        channel_base=CBASE, channel_max=CMAX, conv_clamp=256.0,
        use_noise=True, mapping_layers=1,
    )

    rng = np.random.default_rng(0)
    N = 1
    c = rng.standard_normal((N, RES, RES, 48)).astype(np.float32) * 0.5
    retain = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5
    pose = rng.standard_normal((N, RES, RES, 6)).astype(np.float32) * 0.5
    aff_pose = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5
    aff_top = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5
    lower = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5

    args_j = tuple(jnp.asarray(a) for a in (c, retain, pose, aff_pose, aff_top, lower))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        None, *args_j, noise_mode="none",
    )
    variables = convert_generator_full(_state(G_ref), variables)

    img_j = gen.apply(variables, None, *args_j, noise_mode="none")

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        img_t = G_ref(
            torch.zeros(N, 0), t(c), t(retain), t(pose), t(aff_pose), t(aff_top),
            t(lower), noise_mode="none",
        )
    np.testing.assert_allclose(
        np.asarray(img_j), img_t.numpy().transpose(0, 2, 3, 1), rtol=1e-2, atol=5e-3
    )


@needs_ref
def test_spectral_conv_matches_torch():
    import torch

    from pasta_gan_tpu.nn.flow import SpectralConv

    torch.manual_seed(1)
    conv_t = torch.nn.utils.spectral_norm(torch.nn.Conv2d(8, 16, 3, 2, 1)).eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)

    conv_j = SpectralConv(8, 16, 3, 2, 1)
    variables = conv_j.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in conv_t.state_dict().items()}
    variables = {
        "params": {
            "weight_orig": jnp.asarray(sd["weight_orig"].transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(sd["bias"]),
        },
        "spectral": {
            "weight_u": jnp.asarray(sd["weight_u"]),
            "weight_v": jnp.asarray(sd["weight_v"]),
        },
    }
    y_j = conv_j.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        y_t = conv_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


@needs_ref
def test_grid_sample_border_matches_torch():
    import torch
    import torch.nn.functional as F

    from pasta_gan_tpu.nn.flow import apply_offset, grid_sample_border

    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    offset = (rng.standard_normal((2, 32, 32, 2)) * 4).astype(np.float32)

    grid_j = apply_offset(jnp.asarray(offset))
    out_j = grid_sample_border(jnp.asarray(img), grid_j)

    import sys
    sys.path.insert(0, "/root/reference")
    from util_classes import apply_offset as ref_apply_offset

    with torch.no_grad():
        flow_t = ref_apply_offset(torch.from_numpy(offset.transpose(0, 3, 1, 2)))
        out_t = F.grid_sample(
            torch.from_numpy(img.transpose(0, 3, 1, 2)), flow_t, padding_mode="border"
        )
    np.testing.assert_allclose(np.asarray(grid_j), flow_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )

"""End-to-end torch parity for the V10 spade-modulated cluster vs the
reference executed live (random weights via io/torch_import)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_torch_import import _REF, needs_ref

RES = 256
CBASE = 2048
CMAX = 512


@needs_ref
@pytest.mark.slow
def test_generator_v10_forward_parity():
    import torch

    from pasta_gan_tpu.io.torch_import import convert_generator_full
    from pasta_gan_tpu.models import GeneratorV10

    torch.manual_seed(0)
    G_ref = _REF.GeneratorV10(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=CBASE, channel_max=CMAX, conv_clamp=256, use_noise=True),
    ).eval()
    state = {
        name: t.detach().numpy()
        for name, t in list(G_ref.named_parameters()) + list(G_ref.named_buffers())
    }

    gen = GeneratorV10(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES,
        channel_base=CBASE, channel_max=CMAX, conv_clamp=256.0,
        use_noise=True, mapping_layers=1,
    )

    rng = np.random.default_rng(0)
    N = 1
    c = rng.standard_normal((N, RES, RES, 48)).astype(np.float32) * 0.5
    retain = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5
    pose = rng.standard_normal((N, RES, RES, 6)).astype(np.float32) * 0.5
    denorm = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5

    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        None, jnp.asarray(c), jnp.asarray(retain), jnp.asarray(pose),
        jnp.asarray(denorm), noise_mode="none",
    )
    variables = convert_generator_full(state, variables)

    img_j = gen.apply(
        variables, None, jnp.asarray(c), jnp.asarray(retain), jnp.asarray(pose),
        jnp.asarray(denorm), noise_mode="none",
    )

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        img_t = G_ref(torch.zeros(N, 0), t(c), t(retain), t(pose), t(denorm),
                      noise_mode="none")
    np.testing.assert_allclose(
        np.asarray(img_j), img_t.numpy().transpose(0, 2, 3, 1), rtol=1e-2, atol=5e-3
    )

"""End-to-end torch parity for the V11/V12 predicted-blending-mask clusters
vs the reference executed live (random weights via io/torch_import)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_torch_import import _REF, needs_ref

RES = 256
CBASE = 2048
CMAX = 512


def _run(ref_cls, our_gen):
    import torch

    from pasta_gan_tpu.io.torch_import import convert_generator_full

    torch.manual_seed(0)
    G_ref = ref_cls(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=CBASE, channel_max=CMAX,
                              conv_clamp=256, use_noise=True),
    ).eval()
    state = {
        name: t.detach().numpy()
        for name, t in list(G_ref.named_parameters()) + list(G_ref.named_buffers())
    }

    rng = np.random.default_rng(0)
    N = 1
    c = rng.standard_normal((N, RES, RES, 48)).astype(np.float32) * 0.5
    retain = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5
    pose = rng.standard_normal((N, RES, RES, 6)).astype(np.float32) * 0.5
    denorm = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5
    args_j = tuple(jnp.asarray(a) for a in (c, retain, pose, denorm))

    variables = our_gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        None, *args_j, noise_mode="none",
    )
    variables = convert_generator_full(state, variables)
    img_j, ft_j, mask_j = our_gen.apply(variables, None, *args_j, noise_mode="none")

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        img_t, ft_t, mask_t = G_ref(
            torch.zeros(N, 0), t(c), t(retain), t(pose), t(denorm), noise_mode="none"
        )
    for ours, ref in ((img_j, img_t), (ft_j, ft_t), (mask_j, mask_t)):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-2, atol=5e-3
        )


@needs_ref
@pytest.mark.slow
def test_generator_v11_forward_parity():
    from pasta_gan_tpu.models import GeneratorV11

    _run(
        _REF.GeneratorV11,
        GeneratorV11(
            z_dim=0, c_dim=512, w_dim=512, img_resolution=RES,
            channel_base=CBASE, channel_max=CMAX, conv_clamp=256.0,
            use_noise=True, mapping_layers=1,
        ),
    )


@needs_ref
@pytest.mark.slow
def test_generator_v12_forward_parity():
    from pasta_gan_tpu.models import GeneratorV12

    _run(
        _REF.GeneratorV12,
        GeneratorV12(
            z_dim=0, c_dim=512, w_dim=512, img_resolution=RES,
            channel_base=CBASE, channel_max=CMAX, conv_clamp=256.0,
            use_noise=True, mapping_layers=1,
        ),
    )

"""End-to-end torch parity for the V15/V15_2/V17 SPADE-placement clusters
vs the reference executed live (random weights via io/torch_import).

Reference classes: SynthesisNetworkV15/V15_2 + GeneratorV15
(`training/networks.py:4430-4729`), SynthesisBlockV17/SynthesisNetworkV17 +
GeneratorV17 (`:4931-5228`).  NOTE the reference GeneratorV15 instantiates
SynthesisNetworkV15_2 (the 1-spade-block V15 line is commented out at
`:4703-4704`); the single-block network is tested by grafting
SynthesisNetworkV15 into a freshly built reference generator.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_torch_import import _REF, needs_ref

RES = 256
CBASE = 2048
CMAX = 512


def _run(make_ref, our_gen):
    import torch

    from pasta_gan_tpu.io.torch_import import convert_generator_full

    torch.manual_seed(0)
    G_ref = make_ref().eval()
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
    denorm_mask = (rng.uniform(size=(N, RES, RES, 1)) < 0.5).astype(np.float32)
    args_j = tuple(jnp.asarray(a) for a in (c, retain, pose, denorm, denorm_mask))

    variables = our_gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        None, *args_j, noise_mode="none",
    )
    variables = convert_generator_full(state, variables)
    outs_j = our_gen.apply(variables, None, *args_j, noise_mode="none")

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        outs_t = G_ref(
            torch.zeros(N, 0), t(c), t(retain), t(pose), t(denorm),
            t(denorm_mask), noise_mode="none",
        )
    for ours, ref in zip(outs_j, outs_t):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-2, atol=5e-3
        )


def _ref_kwargs():
    return dict(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=CBASE, channel_max=CMAX,
                              conv_clamp=256, use_noise=True),
    )


def _our_kwargs():
    return dict(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES,
        channel_base=CBASE, channel_max=CMAX, conv_clamp=256.0,
        use_noise=True, mapping_layers=1,
    )


@needs_ref
@pytest.mark.slow
def test_generator_v15_2_forward_parity():
    from pasta_gan_tpu.models import GeneratorV15_2

    _run(lambda: _REF.GeneratorV15(**_ref_kwargs()), GeneratorV15_2(**_our_kwargs()))


@needs_ref
@pytest.mark.slow
def test_generator_v15_single_forward_parity():
    """The 1-spade-block SynthesisNetworkV15, grafted into the reference
    generator in place of the default V15_2 (`networks.py:4703-4704`)."""
    import torch

    from pasta_gan_tpu.models import GeneratorV15

    def make_ref():
        torch.manual_seed(0)
        G = _REF.GeneratorV15(**_ref_kwargs())
        G.synthesis = _REF.SynthesisNetworkV15(
            w_dim=512, img_resolution=RES, img_channels=3,
            channel_base=CBASE, channel_max=CMAX, conv_clamp=256, use_noise=True,
        )
        return G

    _run(make_ref, GeneratorV15(**_our_kwargs()))


@needs_ref
@pytest.mark.slow
def test_generator_v17_forward_parity():
    from pasta_gan_tpu.models import GeneratorV17

    _run(lambda: _REF.GeneratorV17(**_ref_kwargs()), GeneratorV17(**_our_kwargs()))

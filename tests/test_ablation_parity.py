"""End-to-end torch parity for the ablation-study clusters
(Raw/Patch/PatchDenorm/PatchDenormCat/RawFull/PatchFull/AvgPatchFull/
NoCoarse/NoCoarseNoMask, reference `training/networks.py:6235-7725`)
vs the reference executed live with random weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_torch_import import _REF, needs_ref

RES = 256
CBASE = 2048
CMAX = 512


def _run(ref_cls, our_gen, c_nc, pair_masks, cbase=CBASE, cmax=CMAX):
    import torch

    from pasta_gan_tpu.io.torch_import import convert_generator_full

    torch.manual_seed(0)
    G_ref = ref_cls(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=cbase, channel_max=cmax,
                              conv_clamp=256, use_noise=True),
    ).eval()
    state = {
        name: t.detach().numpy()
        for name, t in list(G_ref.named_parameters()) + list(G_ref.named_buffers())
    }

    rng = np.random.default_rng(0)
    N = 1
    c = rng.standard_normal((N, RES, RES, c_nc)).astype(np.float32) * 0.5
    retain = rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5
    pose = rng.standard_normal((N, RES, RES, 6)).astype(np.float32) * 0.5
    if pair_masks:  # (upper_input, lower_input, upper_mask, lower_mask)
        extra = [
            rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
            rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
            (rng.uniform(size=(N, RES, RES, 1)) < 0.5).astype(np.float32),
            (rng.uniform(size=(N, RES, RES, 1)) < 0.5).astype(np.float32),
        ]
    else:  # (denorm_clothes, denorm_mask)
        extra = [
            rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
            (rng.uniform(size=(N, RES, RES, 1)) < 0.5).astype(np.float32),
        ]
    args = (c, retain, pose, *extra)
    args_j = tuple(jnp.asarray(a) for a in args)

    variables = our_gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        None, *args_j, noise_mode="none",
    )
    variables = convert_generator_full(state, variables)
    outs_j = our_gen.apply(variables, None, *args_j, noise_mode="none")

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        outs_t = G_ref(torch.zeros(N, 0), *(t(a) for a in args), noise_mode="none")
    assert len(outs_j) == len(outs_t)
    for ours, ref in zip(outs_j, outs_t):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-2, atol=5e-3
        )


def _our_kwargs(cbase=CBASE, cmax=CMAX):
    return dict(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES,
        channel_base=cbase, channel_max=cmax, conv_clamp=256.0,
        use_noise=True, mapping_layers=1,
    )


@needs_ref
@pytest.mark.slow
def test_generator_raw_parity():
    from pasta_gan_tpu.models import GeneratorRaw

    _run(_REF.GeneratorRaw, GeneratorRaw(**_our_kwargs()), c_nc=6, pair_masks=False)


@needs_ref
@pytest.mark.slow
def test_generator_patch_parity():
    from pasta_gan_tpu.models import GeneratorPatch

    _run(_REF.GeneratorPatch, GeneratorPatch(**_our_kwargs()), c_nc=48, pair_masks=False)


@needs_ref
@pytest.mark.slow
def test_generator_patch_denorm_parity():
    from pasta_gan_tpu.models import GeneratorPatchDenorm

    _run(_REF.GeneratorPatchDenorm, GeneratorPatchDenorm(**_our_kwargs()),
         c_nc=48, pair_masks=False)


@needs_ref
@pytest.mark.slow
def test_generator_patch_denorm_cat_parity():
    """catResBlock concatenates channels(128) with the 128-ch spade features
    into a 2*channels(128) conv — it only type-checks when channels(128)==128,
    i.e. the production channel_base 16384 (reference `networks.py:6943`)."""
    from pasta_gan_tpu.models import GeneratorPatchDenormCat

    _run(_REF.GeneratorPatchDenormCat,
         GeneratorPatchDenormCat(**_our_kwargs(cbase=16384, cmax=512)),
         c_nc=48, pair_masks=False, cbase=16384, cmax=512)


@needs_ref
@pytest.mark.slow
def test_generator_rawfull_parity():
    from pasta_gan_tpu.models import GeneratorRawFull

    _run(_REF.GeneratorRawFull, GeneratorRawFull(**_our_kwargs()),
         c_nc=9, pair_masks=True)


@needs_ref
@pytest.mark.slow
def test_generator_patchfull_parity():
    from pasta_gan_tpu.models import GeneratorPatchFull

    _run(_REF.GeneratorPatchFull, GeneratorPatchFull(**_our_kwargs()),
         c_nc=60, pair_masks=True)


@needs_ref
@pytest.mark.slow
def test_generator_avgpatchfull_parity():
    from pasta_gan_tpu.models import GeneratorAvgPatchFull

    _run(_REF.GeneratorAvgPatchFull, GeneratorAvgPatchFull(**_our_kwargs()),
         c_nc=78, pair_masks=True)


@needs_ref
@pytest.mark.slow
def test_generator_nocoarse_parity():
    from pasta_gan_tpu.models import GeneratorNoCoarse

    _run(_REF.GeneratorNoCoarse, GeneratorNoCoarse(**_our_kwargs()),
         c_nc=60, pair_masks=True)


@needs_ref
@pytest.mark.slow
def test_generator_nocoarse_nomask_parity():
    from pasta_gan_tpu.models import GeneratorNoCoarseNoMask

    _run(_REF.GeneratorNoCoarseNoMask, GeneratorNoCoarseNoMask(**_our_kwargs()),
         c_nc=60, pair_masks=True)

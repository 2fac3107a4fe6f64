"""End-to-end torch parity for the single-branch clusters (V16/V20, V21)
vs the reference executed live (random weights converted through
io/torch_import)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_torch_import import _REF, CBASE, CMAX, RES, needs_ref


def _run_pair(ref_cls_name, ours_cls_name, variant_kwargs, with_face):
    import torch

    from pasta_gan_tpu.io.torch_import import convert_generator_full
    from pasta_gan_tpu import models as M

    torch.manual_seed(0)
    G_ref = getattr(_REF, ref_cls_name)(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=CBASE, channel_max=CMAX, conv_clamp=256, use_noise=True),
    ).eval()
    state = {
        name: t.detach().numpy()
        for name, t in list(G_ref.named_parameters()) + list(G_ref.named_buffers())
    }

    gen = getattr(M, ours_cls_name)(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES,
        channel_base=CBASE, channel_max=CMAX, conv_clamp=256.0,
        use_noise=True, mapping_layers=1, **variant_kwargs,
    )

    rng = np.random.default_rng(0)
    N = 1
    inputs_np = dict(
        c=rng.standard_normal((N, RES, RES, 48)).astype(np.float32) * 0.5,
        retain=rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
        pose=rng.standard_normal((N, RES, RES, 6)).astype(np.float32) * 0.5,
        denorm_clothes=rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
        denorm_mask=(rng.uniform(size=(N, RES, RES, 1)) > 0.4).astype(np.float32),
    )
    face = (rng.uniform(size=(N, RES, RES, 1)) > 0.6).astype(np.float32)

    extra = dict(face_mask=jnp.asarray(face)) if with_face else {}
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        None,
        *[jnp.asarray(inputs_np[k]) for k in
          ("c", "retain", "pose", "denorm_clothes", "denorm_mask")],
        **extra,
        noise_mode="none",
    )
    variables = convert_generator_full(state, variables)

    outs_j = gen.apply(
        variables,
        None,
        *[jnp.asarray(inputs_np[k]) for k in
          ("c", "retain", "pose", "denorm_clothes", "denorm_mask")],
        **extra,
        noise_mode="none",
    )

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    targs = [
        torch.zeros(N, 0),
        t(inputs_np["c"]),
        t(inputs_np["retain"]),
        t(inputs_np["pose"]),
        t(inputs_np["denorm_clothes"]),
        t(inputs_np["denorm_mask"]),
    ]
    if with_face:
        targs.append(t(face))
    with torch.no_grad():
        outs_t = G_ref(*targs, noise_mode="none")

    def n(x):
        return x.numpy().transpose(0, 2, 3, 1)

    assert len(outs_j) == len(outs_t)
    for k, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(
            np.asarray(a), n(b), rtol=1e-2, atol=1e-2, err_msg=f"output {k}"
        )


@needs_ref
@pytest.mark.slow
def test_generator_v16_forward_parity():
    _run_pair("GeneratorV16", "GeneratorV16", {}, with_face=False)


@needs_ref
@pytest.mark.slow
def test_generator_v21_forward_parity():
    _run_pair("GeneratorV21", "GeneratorV21", {}, with_face=True)

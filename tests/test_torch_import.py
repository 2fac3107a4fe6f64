"""FULL-MODEL numerical parity: reference torch GeneratorFull vs ours.

Constructs the reference GeneratorFull (torch CPU, random init), converts its
state_dict through io/torch_import, and compares end-to-end forward outputs
(coarse image, finetune image, predicted parsing) between frameworks.  This is
the strongest single parity check in the suite: it exercises every op, layer,
and wiring decision at once, and it IS the released-checkpoint import path.

Config note: the reference wiring requires channels(4) == 512 (the fixed
512-channel pose feature feeds the first block), so we shrink channel_base to
2048 (thin upper pyramid: 256px head runs at 8 channels) but keep
channel_max=512 and the full 256px resolution.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _load_ref_networks():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    for name, attrs in [
        ("skimage.draw", ["circle", "line_aa"]),
        ("pycocotools.mask", ["frPyObjects", "decode", "merge"]),
    ]:
        parent, child = name.split(".")
        if name not in sys.modules:
            pm = sys.modules.get(parent) or types.ModuleType(parent)
            cm = types.ModuleType(name)
            for a in attrs:
                setattr(cm, a, lambda *x, **k: None)
            setattr(pm, child, cm)
            sys.modules[parent] = pm
            sys.modules[name] = cm
    cwd = os.getcwd()
    try:
        import torch

        if torch.version.cuda is None:
            torch.version.cuda = "0.0"
        os.chdir("/root/reference")
        from training import networks as ref_networks

        return ref_networks
    except Exception:
        return None
    finally:
        os.chdir(cwd)


_REF = _load_ref_networks()
needs_ref = pytest.mark.skipif(_REF is None, reason="reference mount unavailable")

RES = 256
CBASE = 2048
CMAX = 512  # channels(4) must be 512: the pose feature is fixed 512-ch


@needs_ref
@pytest.mark.slow
def test_generator_full_forward_parity():
    import torch

    from pasta_gan_tpu.io.torch_import import convert_generator_full
    from pasta_gan_tpu.models import GeneratorFull

    torch.manual_seed(0)
    G_ref = _REF.GeneratorFull(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=CBASE, channel_max=CMAX, conv_clamp=256, use_noise=True),
    ).eval()
    state = {
        name: t.detach().numpy()
        for name, t in list(G_ref.named_parameters()) + list(G_ref.named_buffers())
    }

    gen = GeneratorFull(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES,
        channel_base=CBASE, channel_max=CMAX, conv_clamp=256.0,
        use_noise=True, mapping_layers=1,
    )

    rng = np.random.default_rng(0)
    N = 1
    inputs_np = dict(
        c=rng.standard_normal((N, RES, RES, 42)).astype(np.float32) * 0.5,
        retain=rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
        pose=rng.standard_normal((N, RES, RES, 6)).astype(np.float32) * 0.5,
        denorm_upper_input=rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
        denorm_lower_input=rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
        denorm_upper_mask=(rng.uniform(size=(N, RES, RES, 1)) > 0.4).astype(np.float32),
        denorm_lower_mask=(rng.uniform(size=(N, RES, RES, 1)) > 0.4).astype(np.float32),
    )
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        None,
        **{k: jnp.asarray(v) for k, v in inputs_np.items()},
        noise_mode="none",
    )
    variables = convert_generator_full(state, variables)

    img_j, ft_j, parsing_j = gen.apply(
        variables,
        None,
        **{k: jnp.asarray(v) for k, v in inputs_np.items()},
        noise_mode="none",
    )

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        img_t, ft_t, parsing_t = G_ref(
            torch.zeros(N, 0),
            t(inputs_np["c"]),
            t(inputs_np["retain"]),
            t(inputs_np["pose"]),
            t(inputs_np["denorm_upper_input"]),
            t(inputs_np["denorm_lower_input"]),
            t(inputs_np["denorm_upper_mask"]),
            t(inputs_np["denorm_lower_mask"]),
            noise_mode="none",
        )

    def n(x):
        return x.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(parsing_j), n(parsing_t), rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(img_j), n(img_t), rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(ft_j), n(ft_t), rtol=1e-2, atol=1e-2)


@needs_ref
@pytest.mark.slow
def test_generator_v18_forward_parity():
    """Same end-to-end parity for the V18 cluster (released-256-checkpoint
    interface: dual sigmoid mask heads, 60-ch style input)."""
    import torch

    from pasta_gan_tpu.io.torch_import import convert_generator_full
    from pasta_gan_tpu.models import GeneratorV18

    torch.manual_seed(0)
    G_ref = _REF.GeneratorV18(
        z_dim=0, c_dim=512, w_dim=512, img_resolution=RES, img_channels=3,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=CBASE, channel_max=CMAX, conv_clamp=256, use_noise=True),
    ).eval()
    state = {
        name: t.detach().numpy()
        for name, t in list(G_ref.named_parameters()) + list(G_ref.named_buffers())
    }

    gen = GeneratorV18(
        img_resolution=RES, channel_base=CBASE, channel_max=CMAX,
        conv_clamp=256.0, mapping_layers=1,
    )
    rng = np.random.default_rng(0)
    N = 1
    inp = dict(
        c=rng.standard_normal((N, RES, RES, 60)).astype(np.float32) * 0.5,
        retain=rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
        pose=rng.standard_normal((N, RES, RES, 6)).astype(np.float32) * 0.5,
        du=rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
        dl=rng.standard_normal((N, RES, RES, 3)).astype(np.float32) * 0.5,
        dum=(rng.uniform(size=(N, RES, RES, 1)) > 0.4).astype(np.float32),
        dlm=(rng.uniform(size=(N, RES, RES, 1)) > 0.4).astype(np.float32),
    )
    args = [jnp.asarray(inp[k]) for k in ("c", "retain", "pose", "du", "dl", "dum", "dlm")]
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        None, *args, noise_mode="none",
    )
    variables = convert_generator_full(state, variables)
    img_j, ft_j, um_j, lm_j = gen.apply(variables, None, *args, noise_mode="none")

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))

    def n(x):
        return x.numpy().transpose(0, 2, 3, 1)

    with torch.no_grad():
        img_t, ft_t, um_t, lm_t = G_ref(
            torch.zeros(N, 0), t(inp["c"]), t(inp["retain"]), t(inp["pose"]),
            t(inp["du"]), t(inp["dl"]), t(inp["dum"]), t(inp["dlm"]), noise_mode="none",
        )
    np.testing.assert_allclose(np.asarray(img_j), n(img_t), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ft_j), n(ft_t), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(um_j), n(um_t), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lm_j), n(lm_t), rtol=1e-3, atol=1e-4)

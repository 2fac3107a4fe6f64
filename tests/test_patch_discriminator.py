"""Patch-discriminator parity vs the reference executed live: the conv
feature stack and the pairwise linear head are compared on FIXED patches
(the random tile sampling/warp uses framework RNG and is covered by shape/
determinism checks instead)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_torch_import import _REF, needs_ref

from pasta_gan_tpu.nn.patch_discriminator import (
    StyleGAN2PatchDiscriminator,
    StyleGAN2PatchDiscriminatorV2,
)

PATCH = 32
MAX_NC = 64
CAP = 1.0


def _convert(ref_sd, variables):
    """Map reference names -> our param tree (test-local converter)."""
    params = jax.tree_util.tree_map(lambda x: x, variables)["params"]

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        assert path[-1] in node, path
        assert node[path[-1]].shape == val.shape, (path, node[path[-1]].shape, val.shape)
        node[path[-1]] = jnp.asarray(val)

    import flax
    import math

    # flax auto-names list submodules by POSITION; rebuild the reference's
    # layer-name order ('0', '128x128'/'1'/'2'..., '5', '6') -> position
    log_size = int(math.ceil(math.log2(PATCH)))
    ref_names = ["0"]
    for i in range(log_size, 2, -1):
        ref_names.append(str(7 - i) if i <= 6 else f"{2 ** i}x{2 ** i}")
    ref_names += ["5", "6"]
    pos = {n: i for i, n in enumerate(ref_names)}

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    for name, t in ref_sd.items():
        v = t.detach().numpy()
        parts = name.split(".")
        if parts[0] == "convs":
            layer = f"convs_{pos[parts[1]]}"
            rest = parts[2:]
            if rest[0] in ("conv1", "conv2", "skip"):
                sub = [layer, rest[0]]
                rest = rest[1:]
            else:
                sub = [layer]
            if rest[0] == "Conv" and rest[1] == "weight":
                put(params, sub + ["weight"], v.transpose(2, 3, 1, 0))
            elif rest[0] == "Conv" and rest[1] == "bias":
                put(params, sub + ["bias"], v)
            elif rest[0] == "Act" and rest[1] == "bias":
                put(params, sub + ["bias"], v)
            elif rest[0] == "Blur":
                pass  # FIR kernel buffer; we rebuild it from the static taps
            else:
                raise KeyError(name)
        elif parts[0] == "pairlinear":
            put(params, [f"pairlinear_{parts[1]}", parts[2]], v)
        else:
            raise KeyError(name)
    return {"params": params}


def _build(variant):
    import torch

    torch.manual_seed(0)
    ref_cls = (
        _REF.StyleGAN2PatchDiscriminator_V2 if variant == "v2"
        else _REF.StyleGAN2PatchDiscriminator
    )
    D_ref = ref_cls(
        netPatchD_scale_capacity=CAP, netPatchD_max_nc=MAX_NC,
        patch_size=PATCH, max_num_tiles=4, use_antialias=True,
    ).eval()
    ours_cls = (
        StyleGAN2PatchDiscriminatorV2 if variant == "v2" else StyleGAN2PatchDiscriminator
    )
    D = ours_cls(scale_capacity=CAP, max_nc=MAX_NC, patch_size=PATCH, max_num_tiles=4)
    return D_ref, D


@needs_ref
@pytest.mark.parametrize("variant", ["v1", "v2"])
@pytest.mark.slow
def test_patch_discriminator_features_and_head(variant):
    import torch

    D_ref, D = _build(variant)
    rng = np.random.default_rng(0)
    B, T = 2, 3
    patches = rng.standard_normal((B, T, PATCH, PATCH, 3)).astype(np.float32) * 0.5

    variables = D.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)),
        rng=jax.random.PRNGKey(1),
    )
    ref_sd = dict(D_ref.named_parameters())
    ref_sd.update(dict(D_ref.named_buffers()))
    variables = _convert(ref_sd, variables)

    feat_j = D.apply(variables, jnp.asarray(patches), method=D.extract_features)
    with torch.no_grad():
        t_patches = torch.from_numpy(
            np.ascontiguousarray(patches.transpose(0, 1, 4, 2, 3))
        )
        feat_t = D_ref.extract_features(t_patches).numpy()
    feat_j_nchw = np.asarray(feat_j).transpose(0, 3, 1, 2)
    scale = np.abs(feat_t).max() + 1e-9
    assert np.max(np.abs(feat_j_nchw - feat_t)) / scale < 2e-4

    # head
    if variant == "v1":
        f2 = np.roll(np.asarray(feat_j), 1, axis=0)
        pred_j = D.apply(
            variables, jnp.asarray(np.asarray(feat_j)), jnp.asarray(f2),
            method=D.discriminate_features,
        )
        with torch.no_grad():
            pred_t = D_ref.discriminate_features(
                torch.from_numpy(feat_j_nchw),
                torch.from_numpy(feat_j_nchw).roll(1, 0),
            ).numpy()
    else:
        pred_j = D.apply(
            variables, jnp.asarray(np.asarray(feat_j)), method=D.discriminate_features
        )
        with torch.no_grad():
            pred_t = D_ref.discriminate_features(torch.from_numpy(feat_j_nchw)).numpy()
    np.testing.assert_allclose(np.asarray(pred_j), pred_t, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_patch_sampling_shapes_and_determinism():
    D = StyleGAN2PatchDiscriminator(
        scale_capacity=CAP, max_nc=MAX_NC, patch_size=PATCH, max_num_tiles=4
    )
    img = jnp.asarray(np.random.default_rng(0).standard_normal((2, 96, 96, 3)), jnp.float32)
    variables = D.init({"params": jax.random.PRNGKey(0)}, img, rng=jax.random.PRNGKey(1))
    pred_real, patches = D.apply(variables, img, rng=jax.random.PRNGKey(2))
    assert patches.shape == (2, 4, PATCH, PATCH, 3)
    assert pred_real.shape == (2, 4)
    pr2, _ = D.apply(variables, img, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(pred_real), np.asarray(pr2))
    # pair version with fake
    fake = img * 0.5
    pr, pf = D.apply(variables, img, fake, rng=jax.random.PRNGKey(3))
    assert pr.shape == pf.shape == (2, 4)

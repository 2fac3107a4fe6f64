"""ADA pipe parity vs the reference AugmentPipe via its own debug_percentile
determinism hook (reference augment.py:185+)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.train.augment import AUGPIPE_SPECS, AugmentPipe


def _load_ref_augment():
    import os
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    try:
        import torch

        if torch.version.cuda is None:
            torch.version.cuda = "0.0"
        os.chdir("/root/reference")
        from training import augment as ref_augment

        return ref_augment
    except Exception:
        return None
    finally:
        os.chdir(cwd)


_REF = _load_ref_augment()
needs_ref = pytest.mark.skipif(_REF is None, reason="reference mount unavailable")


@needs_ref
@pytest.mark.parametrize("dp", [0.5, 0.31, 0.74])
@pytest.mark.parametrize("spec", ["blit", "color", "bgc"])
def test_ada_matches_reference_debug_mode(dp, spec):
    import torch

    rng = np.random.default_rng(0)
    N, H, W = 2, 32, 32
    imgs = rng.uniform(-1, 1, (N, H, W, 3)).astype(np.float32)

    ours_pipe = AugmentPipe.from_spec(spec)
    ours = np.asarray(
        ours_pipe(jnp.asarray(imgs), p=1.0, rng=jax.random.PRNGKey(0), debug_percentile=dp)
    )

    ref_pipe = _REF.AugmentPipe(**AUGPIPE_SPECS[spec])
    ref_pipe.p.copy_(torch.as_tensor(1.0))
    with torch.no_grad():
        theirs = ref_pipe(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy()), debug_percentile=dp
        )
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    assert ours.shape == theirs.shape
    # Interior comparison: our static reflect-pad margin can differ from the
    # reference's dynamic margin only near borders under large transforms.
    sl = np.s_[:, 4:-4, 4:-4, :]
    np.testing.assert_allclose(ours[sl], theirs[sl], rtol=5e-3, atol=5e-3)


@needs_ref
@pytest.mark.parametrize("spec", ["filter", "noise", "cutout"])
def test_ada_corruptions_match_reference(spec):
    import torch

    rng = np.random.default_rng(1)
    N, H, W = 2, 32, 32
    imgs = rng.uniform(-1, 1, (N, H, W, 3)).astype(np.float32)
    dp = 0.4

    ours_pipe = AugmentPipe.from_spec(spec)
    ours = np.asarray(
        ours_pipe(jnp.asarray(imgs), p=1.0, rng=jax.random.PRNGKey(0), debug_percentile=dp)
    )
    ref_pipe = _REF.AugmentPipe(**AUGPIPE_SPECS[spec])
    ref_pipe.p.copy_(torch.as_tensor(1.0))
    with torch.no_grad():
        theirs = ref_pipe(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy()), debug_percentile=dp
        ).numpy().transpose(0, 2, 3, 1)

    if spec == "noise":
        # additive noise uses different RNGs; compare statistics only
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours.std(), theirs.std(), rtol=0.2)
    else:
        np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-3)


def test_ada_p_zero_leaves_images_unchanged_statistically():
    """With p=0 every gate closes; geometric/color transforms are identity."""
    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    pipe = AugmentPipe.from_spec("bgc")
    out = np.asarray(pipe(jnp.asarray(imgs), p=0.0, rng=jax.random.PRNGKey(3)))
    # identity transform still round-trips through pad/upsample/warp/downsample;
    # require close agreement in the interior
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], imgs[:, 2:-2, 2:-2], rtol=1e-2, atol=1e-2)

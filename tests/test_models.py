"""Shape-contract and smoke tests for the model zoo (SURVEY.md section 4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasta_gan_tpu.models import Discriminator, GeneratorFull


def _gen_inputs(rng, N, res, style_nc=42):
    k = jax.random.split(rng, 8)
    return dict(
        z=None,
        c=jax.random.normal(k[0], (N, res, res, style_nc)),
        retain=jax.random.normal(k[1], (N, res, res, 3)),
        pose=jax.random.normal(k[2], (N, res, res, 6)),
        denorm_upper_input=jax.random.normal(k[3], (N, res, res, 3)),
        denorm_lower_input=jax.random.normal(k[4], (N, res, res, 3)),
        denorm_upper_mask=(jax.random.uniform(k[5], (N, res, res, 1)) > 0.5).astype(jnp.float32),
        denorm_lower_mask=(jax.random.uniform(k[6], (N, res, res, 1)) > 0.5).astype(jnp.float32),
    )


@pytest.mark.parametrize("res", [32])
@pytest.mark.slow
def test_generator_full_shapes(res):
    rng = jax.random.PRNGKey(0)
    N = 2
    gen = GeneratorFull(img_resolution=res, channel_base=1024, channel_max=128)
    inputs = _gen_inputs(rng, N, res)
    variables = gen.init(
        {"params": rng, "noise": jax.random.PRNGKey(1)}, **inputs, noise_mode="random"
    )
    img, finetune_img, pred_parsing = gen.apply(
        variables, **inputs, noise_mode="random", rngs={"noise": jax.random.PRNGKey(2)}
    )
    assert img.shape == (N, res, res, 3)
    assert finetune_img.shape == (N, res, res, 3)
    assert pred_parsing.shape == (N, res, res, 6)
    assert np.all(np.isfinite(np.asarray(img)))
    assert np.all(np.isfinite(np.asarray(finetune_img)))


def test_generator_num_ws():
    gen = GeneratorFull(img_resolution=256, channel_base=16384)
    # blocks 4(1 conv) + 8..256 (2 convs x 6) + final torgb = 14
    from pasta_gan_tpu.nn.synthesis import SynthesisNetworkFull

    net = SynthesisNetworkFull(w_dim=512, img_resolution=256, img_channels=3)
    assert net.num_ws == 14


@pytest.mark.parametrize("res,c_dim", [(32, 512), (32, 0)])
@pytest.mark.slow
def test_discriminator_shapes(res, c_dim):
    rng = jax.random.PRNGKey(0)
    N = 4
    disc = Discriminator(
        c_dim=c_dim, img_resolution=res, img_channels=3, channel_base=1024,
        channel_max=128, mbstd_group_size=2,
    )
    img = jax.random.normal(rng, (N, res, res, 3))
    c = jax.random.normal(rng, (N, c_dim)) if c_dim else None
    variables = disc.init(rng, img, c)
    logits = disc.apply(variables, img, c)
    assert logits.shape == (N, 1)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow
def test_discriminator_r1_grad():
    """R1 needs grad-of-grad through the whole D — free in JAX (SURVEY 2.2)."""
    rng = jax.random.PRNGKey(0)
    N, res = 2, 16
    disc = Discriminator(
        c_dim=0, img_resolution=res, img_channels=3, channel_base=512,
        channel_max=64, mbstd_group_size=2,
    )
    img = jax.random.normal(rng, (N, res, res, 3))
    variables = disc.init(rng, img, None)

    def d_sum(x):
        return jnp.sum(disc.apply(variables, x, None))

    r1_grads = jax.grad(d_sum)(img)
    r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))

    # and the training actually differentiates the penalty wrt params: emulate
    def loss_fn(v):
        g = jax.grad(lambda x: jnp.sum(disc.apply(v, x, None)))(img)
        return jnp.mean(jnp.sum(jnp.square(g), axis=(1, 2, 3)))

    grads = jax.grad(loss_fn)(variables)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert r1_penalty.shape == (N,)

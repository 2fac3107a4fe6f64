"""Training-step tests: single-device and 8-virtual-device data parallelism.

The 8-device test is the TPU-native version of the reference's multi-GPU
verification: sharded batch, pmean'd grads, and a replication consistency
check standing in for `misc.check_ddp_consistency` (SURVEY.md section 4).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration scale; run with `-m slow` or no marker filter

from pasta_gan_tpu.parallel import (
    data_parallel_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from pasta_gan_tpu.runtime.config import (
    AdaConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from pasta_gan_tpu.train.step import GANTrainer


def tiny_config(res=16, vgg=False):
    return TrainConfig(
        model=ModelConfig(
            img_resolution=res,
            channel_base=256,
            channel_max=32,
            mbstd_group_size=2,
            mapping_layers=1,
        ),
        loss=LossConfig(
            l1_weight=40.0,
            vgg_weight=40.0 if vgg else 0.0,
            mask_weight=20.0,
            r1_gamma=10.0,
        ),
        ada=AdaConfig(enabled=True, interval=2, kimg=1),
        batch_size=8,
        ema_kimg=10.0,
    )


def synth_batch(rng, N, res):
    k = jax.random.split(jax.random.PRNGKey(rng), 8)
    return {
        "real_img": jax.random.normal(k[0], (N, res, res, 3)),
        "style_input": jax.random.normal(k[1], (N, res, res, 42)),
        "retain": jax.random.normal(k[2], (N, res, res, 3)),
        "pose": jax.random.normal(k[3], (N, res, res, 6)),
        "denorm_upper_img": jax.random.normal(k[4], (N, res, res, 3)),
        "denorm_lower_img": jax.random.normal(k[5], (N, res, res, 3)),
        "denorm_upper_mask": (jax.random.uniform(k[6], (N, res, res, 1)) > 0.5).astype(
            jnp.float32
        ),
        "denorm_lower_mask": (jax.random.uniform(k[7], (N, res, res, 1)) > 0.5).astype(
            jnp.float32
        ),
        "gt_parsing": jax.random.randint(k[0], (N, res, res), 0, 6),
    }


def _finite(tree):
    return all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(tree))


def test_train_step_single_device():
    cfg = tiny_config()
    trainer = GANTrainer(cfg)
    batch = synth_batch(0, 4, cfg.model.img_resolution)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    step = jax.jit(trainer.train_step)
    state1, stats = step(state, batch, jax.random.PRNGKey(1))
    assert int(state1.step) == 1
    assert _finite(stats)
    assert _finite(state1.g_params)
    # params actually moved (look inside the 'params' collection — leaf 0 of
    # the full variables dict is a noise_const buffer, which must NOT move)
    g0 = jax.tree_util.tree_leaves(state.g_params["params"])[0]
    g1 = jax.tree_util.tree_leaves(state1.g_params["params"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    b0 = jax.tree_util.tree_leaves(state.g_params.get("buffers", {}))
    b1 = jax.tree_util.tree_leaves(state1.g_params.get("buffers", {}))
    for a, b in zip(b0, b1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    r1 = jax.jit(trainer.d_r1_step)
    state2, r1_stats = r1(state1, batch, jax.random.PRNGKey(2))
    assert _finite(r1_stats)
    assert float(r1_stats["Loss/r1_penalty"]) >= 0


def test_train_step_stacked_ada_calls():
    """ada.stack_calls batches the per-loss augment+D invocations into one
    call; the step must run and the un-stacked logits split must line up
    (mbstd groups align because each sub-batch is a group-size multiple)."""
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, ada=dataclasses.replace(cfg.ada, stack_calls=True))
    trainer = GANTrainer(cfg)
    batch = synth_batch(0, 4, cfg.model.img_resolution)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    state1, stats = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(1))
    assert _finite(stats)
    assert _finite(state1.g_params)

    # the stacked _run_D_multi splits back into per-batch logits that match
    # the sequential execution: at p=0 every gate draws the identity
    # transform, so both modes run the SAME (deterministic) pipe and only
    # the batching differs (mbstd groups align on sub-batch boundaries)
    trainer_seq = GANTrainer(tiny_config())
    imgs = [batch["real_img"], batch["real_img"][::-1]]
    c = jnp.zeros((4, 512))
    p0 = jnp.asarray(0.0)
    outs = trainer._run_D_multi(state1.d_params, imgs, c, p0, jax.random.PRNGKey(3))
    ref = trainer_seq._run_D_multi(state1.d_params, imgs, c, p0, jax.random.PRNGKey(4))
    assert len(outs) == 2 and all(o.shape[0] == 4 for o in outs)
    for o, r in zip(outs, ref):
        # batched-vs-sequential conv reduction orders differ by ~1e-3
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=5e-3, atol=5e-3)


def test_stack_perm_group_purity():
    """_stack_perm must make every strided mbstd stat group sub-batch-pure
    and reproduce the sequential per-call grouping {i, i + n/G, ...}
    (MinibatchStdLayer groups with stride N/G over the batch; a plain
    concat would pair gen/real samples in one stat group)."""
    cfg = tiny_config()
    trainer = GANTrainer(cfg)
    g = cfg.model.mbstd_group_size
    for n, k in [(4, 2), (4, 3), (8, 3), (2, 2)]:
        pos = trainer._stack_perm(n, k)
        assert pos is not None and sorted(pos) == list(range(k * n))
        stride = (k * n) // g  # stat set of position p: {p % stride + t*stride}
        for j in range(k):
            for i in range(n):
                p = pos[j * n + i]
                group_positions = [p % stride + t * stride for t in range(g)]
                # members, expressed as (sub-batch, sample) of the originals
                inv = np.argsort(pos)
                members = [divmod(int(inv[q]), n) for q in group_positions]
                assert all(m[0] == j for m in members), "group leaked across sub-batches"
                assert sorted(m[1] for m in members) == sorted(
                    (i % (n // g)) + t * (n // g) for t in range(g)
                ), "grouping differs from the sequential per-call layout"
    # no exact embedding at n % g != 0 (per-device batch 1 under DP)
    assert trainer._stack_perm(1, 3) is None


def test_train_step_data_parallel_8dev():
    assert len(jax.devices()) == 8
    cfg = tiny_config()
    mesh = data_parallel_mesh()
    trainer = GANTrainer(cfg, axis_name="data")
    batch = synth_batch(0, 8, cfg.model.img_resolution)

    state = trainer.init_state(jax.random.PRNGKey(0), synth_batch(0, 1, cfg.model.img_resolution))
    state = replicate(state, mesh)
    sharded_batch = shard_batch(batch, mesh)

    dp_step = make_sharded_train_step(trainer.train_step, mesh)
    state1, stats = dp_step(state, sharded_batch, jax.random.PRNGKey(1))
    assert _finite(stats)

    # Replication consistency: every leaf must be identical on all 8 devices
    # (the shard_map out_spec P() asserts this structurally; verify numerically
    # by comparing per-device shards of one representative leaf).
    leaf = jax.tree_util.tree_leaves(state1.g_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    # second step exercises donated buffers
    state2, _ = dp_step(state1, sharded_batch, jax.random.PRNGKey(2))
    assert int(jax.device_get(state2.step)) == 2


def test_dp_grads_equal_mean_of_shard_grads():
    """shard_map + pmean grads == the mean of per-shard grads computed by hand.

    The invariant is about the collective plumbing, not the model, so a small
    discriminator loss keeps this fast; the full train step's DP integration
    is covered by test_train_step_data_parallel_8dev.
    """
    from jax.sharding import PartitionSpec as P

    from pasta_gan_tpu.models import Discriminator

    shard_map = jax.shard_map
    n_dev = 2
    res = 16
    disc = Discriminator(
        c_dim=0, img_resolution=res, img_channels=3, channel_base=256,
        channel_max=32, mbstd_group_size=1,
    )
    imgs = jax.random.normal(jax.random.PRNGKey(0), (n_dev * 2, res, res, 3))
    params = disc.init(jax.random.PRNGKey(1), imgs, None)

    def loss_fn(params, imgs):
        return jnp.mean(jax.nn.softplus(disc.apply(params, imgs, None)))

    shard_grads = [
        jax.grad(loss_fn)(params, imgs[d * 2 : (d + 1) * 2]) for d in range(n_dev)
    ]
    grads_manual = jax.tree_util.tree_map(lambda *xs: sum(xs) / len(xs), *shard_grads)

    mesh = data_parallel_mesh(jax.devices()[:n_dev])

    def inner(params, imgs):
        return jax.lax.pmean(jax.grad(loss_fn)(params, imgs), "data")

    grads_dp = shard_map(
        inner, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(), check_vma=False
    )(params, imgs)

    for a, b in zip(
        jax.tree_util.tree_leaves(grads_manual), jax.tree_util.tree_leaves(grads_dp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_g_pl_step_runs():
    """Greg/path-length phase (pl_weight>0) produces finite penalty + updates."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, pl_weight=2.0, pl_batch_shrink=2)
    )
    trainer = GANTrainer(cfg)
    batch = synth_batch(0, 4, cfg.model.img_resolution)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state1, stats = jax.jit(trainer.g_pl_step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["Loss/pl_penalty"]))
    assert float(jax.device_get(state1.pl_mean)) != 0.0


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 grads == full-batch grads when the loss is a plain mean
    over per-sample terms (use mask/L1 only: batch-linear)."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_noise=False, mbstd_group_size=1),
        loss=dataclasses.replace(cfg.loss, l1_weight=1.0, mask_weight=1.0),
    )
    batch = synth_batch(5, 4, cfg.model.img_resolution)
    rng = jax.random.PRNGKey(9)

    t1 = GANTrainer(cfg)
    state = t1.init_state(jax.random.PRNGKey(0), batch)

    # pixel-only loss: strip the GAN terms by comparing the accumulation
    # machinery itself on g_loss; CE normalization is per-microbatch (like the
    # reference's per-round means), so compare against the mean of per-half
    # grads rather than the single full-batch call.
    g_half = []
    for lo in (0, 2):
        sub = {k: v[lo : lo + 2] for k, v in batch.items()}
        grads, _ = t1._grads_with_accum(
            lambda p, d, ap, b, r: t1.g_loss_fn(p, d, b, ap, r),
            state.g_params, sub, jax.random.fold_in(rng, lo // 2),
            state.d_params, state.ada_p,
        )
        g_half.append(grads)
    manual = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *g_half)

    cfg2 = dataclasses.replace(cfg, accum_steps=2)
    t2 = GANTrainer(cfg2)
    accum, _ = t2._grads_with_accum(
        lambda p, d, ap, b, r: t2.g_loss_fn(p, d, b, ap, r),
        state.g_params, batch, rng, state.d_params, state.ada_p,
    )
    # scan-vs-python-loop compilation reorders fp32 reductions; through the
    # GAN logits path that drift reaches ~3e-4 on small-magnitude grads —
    # compare with correspondingly loose tolerances (the semantic invariant is
    # the microbatch averaging itself).
    for a, b in zip(jax.tree_util.tree_leaves(manual), jax.tree_util.tree_leaves(accum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-4)


def test_train_step_bfloat16_policy():
    """bf16 compute / fp32 master-weight policy (reference analog: the
    `num_fp16_res` fp16 blocks + pre-normalization, `networks.py:56-59`):
    the full G/D step and the R1 double-backprop run under bf16 compute,
    params STAY fp32, and the reported losses track the fp32 run.
    """
    cfg = tiny_config(vgg=True)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    batch = synth_batch(0, 4, cfg.model.img_resolution)

    t32 = GANTrainer(cfg)
    t16 = GANTrainer(cfg16)
    state32 = t32.init_state(jax.random.PRNGKey(0), batch)
    state16 = t16.init_state(jax.random.PRNGKey(0), batch)

    # master weights are fp32 in both policies (identical init)
    for a, b in zip(
        jax.tree_util.tree_leaves(state32.g_params["params"]),
        jax.tree_util.tree_leaves(state16.g_params["params"]),
    ):
        assert b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s32, stats32 = jax.jit(t32.train_step)(state32, batch, jax.random.PRNGKey(1))
    s16, stats16 = jax.jit(t16.train_step)(state16, batch, jax.random.PRNGKey(1))
    assert _finite(stats16) and _finite(s16.g_params)
    # updated params remain fp32
    for leaf in jax.tree_util.tree_leaves(s16.g_params["params"]):
        assert leaf.dtype == jnp.float32

    # loss agreement: bf16 has ~8 mantissa bits; through a GAN step the
    # scalar losses track within ~15% relative (or 0.05 absolute near zero)
    for key in ("Loss/G/loss", "Loss/D/loss", "Loss/G/L1", "Loss/G/vgg"):
        a = float(jax.device_get(stats32[key]))
        b = float(jax.device_get(stats16[key]))
        assert abs(a - b) <= 0.15 * abs(a) + 0.05, (key, a, b)

    # R1 double-backprop under bf16 compute
    s16b, r1 = jax.jit(t16.d_r1_step)(s16, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(jax.device_get(r1["Loss/r1_penalty"])))
    r1_32 = float(jax.device_get(
        jax.jit(t32.d_r1_step)(s32, batch, jax.random.PRNGKey(2))[1]["Loss/r1_penalty"]
    ))
    r1_16 = float(jax.device_get(r1["Loss/r1_penalty"]))
    assert abs(r1_32 - r1_16) <= 0.2 * abs(r1_32) + 0.05, (r1_32, r1_16)

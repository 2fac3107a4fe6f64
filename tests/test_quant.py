"""int8 serving-mode quantization (ops/quant.py).

The serving mode trades exact bf16 parity for MXU int8 throughput
(BASELINE.md round-3 serving section), so these tests check
quantization-error BOUNDS and scheme invariants, not elementwise parity:
* per-output-channel weight scales are symmetric and exact at the scale point,
* int8 conv matches the fp32 conv within the analytic quantization bound,
* modulated_conv2d(quant="int8") tracks the fp32 path on realistic magnitudes,
* the quantized SpadeResBlock tracks its fp32 twin distribution-wise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pasta_gan_tpu.ops import modulated_conv2d
from pasta_gan_tpu.ops.quant import int8_conv2d, quantize_act, quantize_weight


def test_quantize_weight_roundtrip_bound():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 32, 16), jnp.float32) * jnp.exp(
        jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 16))
    )
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8 and s.shape == (16,)
    back = wq.astype(jnp.float32) * s
    # symmetric scheme: error <= scale/2 per element, exact at the per-channel amax
    err = np.abs(np.asarray(back - w))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()
    amax_idx = np.argmax(np.abs(np.asarray(w)).reshape(-1, 16), axis=0)
    flat_w = np.asarray(w).reshape(-1, 16)
    flat_b = np.asarray(back).reshape(-1, 16)
    for o in range(16):
        np.testing.assert_allclose(flat_b[amax_idx[o], o], flat_w[amax_idx[o], o], rtol=1e-6)


def test_quantize_act_per_sample():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, 8, 8, 32), jnp.float32)
    x = x * jnp.asarray([1.0, 10.0, 100.0, 0.01])[:, None, None, None]
    xq, s = quantize_act(x)
    assert xq.dtype == jnp.int8 and s.shape == (4, 1, 1, 1)
    # each sample saturates its own int8 range regardless of magnitude
    m = np.abs(np.asarray(xq)).reshape(4, -1).max(axis=1)
    assert (m == 127).all()
    err = np.abs(np.asarray(xq * s - x))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_int8_conv2d_matches_fp32_within_quant_bound():
    key = jax.random.PRNGKey(3)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (2, 16, 16, 64), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 64, 32), jnp.float32) / np.sqrt(64 * 9)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = int8_conv2d(x, w, padding=(1, 1, 1, 1), out_dtype=jnp.float32)
    # relative error vs output std: W8A8 on gaussian data lands ~0.5-1%
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.std(ref))
    assert rel < 0.03, rel


def test_int8_conv2d_flip_weight():
    key = jax.random.PRNGKey(4)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (1, 8, 8, 8), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 8, 8), jnp.float32) / np.sqrt(72)
    ref = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=(0, 1)),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = int8_conv2d(x, w, padding=(1, 1, 1, 1), flip_weight=False, out_dtype=jnp.float32)
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.std(ref))
    assert rel < 0.03, rel


def test_modulated_conv2d_int8_tracks_fp32():
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 3)
    N, H, W, I, O = 2, 16, 16, 32, 48
    x = jax.random.normal(ks[0], (N, H, W, I), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, I, O), jnp.float32)
    styles = jnp.exp(jax.random.normal(ks[2], (N, I)) * 0.3)
    ref = modulated_conv2d(x, w, styles, padding=1)
    got = modulated_conv2d(x, w, styles, padding=1, quant="int8")
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.std(ref))
    assert rel < 0.03, rel


def test_modulated_conv2d_int8_up2_folded_path():
    key = jax.random.PRNGKey(6)
    ks = jax.random.split(key, 3)
    N, H, W, I, O = 1, 32, 32, 16, 16
    x = jax.random.normal(ks[0], (N, H, W, I), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, I, O), jnp.float32)
    styles = jnp.exp(jax.random.normal(ks[2], (N, I)) * 0.3)
    f = jnp.outer(*(jnp.asarray([1.0, 3.0, 3.0, 1.0]) / 8.0,) * 2)
    common = dict(up=2, padding=1, resample_filter=f, flip_weight=False)
    ref = modulated_conv2d(x, w, styles, **common)
    got = modulated_conv2d(x, w, styles, **common, quant="int8")
    assert got.shape == ref.shape == (N, 2 * H, 2 * W, O)
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.std(ref))
    assert rel < 0.03, rel


def test_spade_resblock_int8_tracks_fp32():
    from pasta_gan_tpu.nn.spade import SpadeResBlock

    key = jax.random.PRNGKey(7)
    kx, kf, kp = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 16, 16, 32), jnp.float32)
    feat = jax.random.normal(kf, (2, 16, 16, 256), jnp.float32)
    blk = SpadeResBlock(32, 32, resolution=128, feat_multiplier=2)
    blk_q = SpadeResBlock(32, 32, resolution=128, feat_multiplier=2, quant="int8")
    variables = blk.init(kp, x, feat)
    ref = blk.apply(variables, x, feat)
    got = blk_q.apply(variables, x, feat)  # same param tree: quant is compute-only
    rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)) / jnp.std(ref))
    assert rel < 0.06, rel


def test_conv2d_layer_calib_then_static_matches_dynamic():
    """int8_calib collects per-site act amax; int8_static with those scales
    reproduces the dynamic-mode output exactly on the calibration batch
    (same scale -> same quantized values), with no reduction in the graph."""
    from pasta_gan_tpu.nn.layers import Conv2dLayer

    key = jax.random.PRNGKey(8)
    kx, kp = jax.random.split(key)
    x = jax.random.normal(kx, (2, 16, 16, 16), jnp.float32)

    mk = lambda q: Conv2dLayer(16, 16, 3, quant=q)
    v = mk(None).init(kp, x)

    y_dyn = mk("int8").apply(v, x)
    y_cal, mut = mk("int8_calib").apply(v, x, mutable=["quant_scales"])
    amax = jax.tree_util.tree_leaves(mut["quant_scales"])
    assert len(amax) == 1 and float(amax[0]) > 0.0
    v_s = {**v, **mut}
    y_st = mk("int8_static").apply(v_s, x)

    # calib uses the batch amax -> matches dynamic per-TENSOR... the dynamic
    # path is per-SAMPLE, so compare calib vs static (identical scales).
    np.testing.assert_allclose(np.asarray(y_cal), np.asarray(y_st), rtol=0, atol=0)
    # and both track the dynamic output within the quantization bound
    rel = float(jnp.sqrt(jnp.mean((y_st - y_dyn) ** 2)) / (jnp.std(y_dyn) + 1e-9))
    assert rel < 0.02, rel

    # a second calibration batch only ever GROWS the stored amax
    x2 = x * 0.1
    _, mut2 = mk("int8_calib").apply(v_s, x2, mutable=["quant_scales"])
    amax2 = jax.tree_util.tree_leaves(mut2["quant_scales"])
    assert float(amax2[0]) == float(amax[0])


@pytest.mark.slow
def test_generator_full_quant_same_param_tree():
    """quant="int8" must not change the param pytree (checkpoints interchange)."""
    from pasta_gan_tpu.models import GeneratorFull

    kw = dict(img_resolution=64, channel_base=2048, channel_max=128)
    gen = GeneratorFull(**kw)
    gen_q = GeneratorFull(**kw, quant="int8")
    rng = jax.random.PRNGKey(0)
    N, RES = 1, 64
    inputs = dict(
        z=None,
        c=jnp.zeros((N, RES // 4, RES // 4, 42)),
        retain=jnp.zeros((N, RES, RES, 3)),
        pose=jnp.zeros((N, RES, RES, 6)),
        denorm_upper_input=jnp.zeros((N, RES, RES, 3)),
        denorm_lower_input=jnp.zeros((N, RES, RES, 3)),
        denorm_upper_mask=jnp.zeros((N, RES, RES, 1)),
        denorm_lower_mask=jnp.zeros((N, RES, RES, 1)),
    )
    v = gen.init({"params": rng, "noise": rng}, **inputs, noise_mode="none")
    v_q = gen_q.init({"params": rng, "noise": rng}, **inputs, noise_mode="none")
    t1 = jax.tree_util.tree_structure(v)
    t2 = jax.tree_util.tree_structure(v_q)
    assert t1 == t2
    # and the quantized apply runs with the fp32-trained variables
    img, ft, parsing = gen_q.apply(
        v, None, inputs["c"], inputs["retain"], inputs["pose"],
        inputs["denorm_upper_input"], inputs["denorm_lower_input"],
        inputs["denorm_upper_mask"], inputs["denorm_lower_mask"], noise_mode="none",
    )
    assert ft.shape == (N, RES, RES, 3)
    assert bool(jnp.isfinite(ft).all())


@pytest.mark.slow
def test_calibrate_int8_static_multi_batch_all_subnets():
    """Regression for the calibration shallow-merge bug (cli/test.py):
    Flax apply returns the FULL collection including carried entries, so an
    unchained merge of the three sub-network applies let synthesize's stale
    encoder copies overwrite the fresh encoder amax folds on every batch
    after the first.  With a 2nd calibration batch 10x larger, EVERY
    sub-network subtree (style_encoding / const_encoding / synthesis) must
    grow at least one stored amax."""
    from pasta_gan_tpu.cli.test import calibrate_int8_static
    from pasta_gan_tpu.models import GeneratorFull

    kw = dict(img_resolution=64, channel_base=2048, channel_max=128)
    ctor = lambda **over: GeneratorFull(**kw, **over)
    N, RES = 1, 64

    def mk_batch(scale, seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 5)
        return dict(
            style_input=scale * jax.random.normal(ks[0], (N, RES // 4, RES // 4, 42)),
            retain=scale * jax.random.normal(ks[1], (N, RES, RES, 3)),
            pose=scale * jax.random.normal(ks[2], (N, RES, RES, 6)),
            denorm_upper_img=scale * jax.random.normal(ks[3], (N, RES, RES, 3)),
            denorm_lower_img=scale * jax.random.normal(ks[4], (N, RES, RES, 3)),
            denorm_upper_mask=jnp.zeros((N, RES, RES, 1)),
            denorm_lower_mask=jnp.zeros((N, RES, RES, 1)),
        )

    rng = jax.random.PRNGKey(0)
    gen = ctor()
    b1 = mk_batch(1.0, 1)
    v = gen.init(
        {"params": rng, "noise": rng},
        None, b1["style_input"], b1["retain"], b1["pose"],
        b1["denorm_upper_img"], b1["denorm_lower_img"],
        b1["denorm_upper_mask"], b1["denorm_lower_mask"], noise_mode="none",
    )
    w_avg = jnp.zeros((512,))

    v1 = calibrate_int8_static(ctor, v, w_avg, 1.0, [b1])
    v2 = calibrate_int8_static(ctor, v, w_avg, 1.0, [b1, mk_batch(10.0, 2)])

    flat1 = jax.tree_util.tree_flatten_with_path(v1["quant_scales"])[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(v2["quant_scales"])[0])
    assert flat1 and set(flat2) == {p for p, _ in flat1}
    grew = {}
    for path, a1 in flat1:
        a2 = flat2[path]
        assert float(a2) >= float(a1) - 1e-7, path  # amax only grows
        top = path[0].key
        grew[top] = grew.get(top, False) or float(a2) > float(a1) * 1.5
    assert set(grew) >= {"style_encoding", "const_encoding", "synthesis"}, grew
    for top, g in grew.items():
        assert g, f"sub-network {top} never folded the 2nd calibration batch"

    # the calibrated variables actually serve in static mode
    gen_s = ctor(quant="int8_static")
    (stylecode, feats) = gen_s.apply(
        v2, b1["style_input"], b1["retain"], method=gen_s.encode_style)
    assert bool(jnp.isfinite(stylecode).all())

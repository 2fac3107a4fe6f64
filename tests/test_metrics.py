"""Metric formula tests: mathematical invariants + pipeline smoke."""

import os

import numpy as np
import pytest

from pasta_gan_tpu.metrics import (
    FeatureStats,
    MetricOptions,
    calc_metric,
    fid_from_stats,
    inception_score_from_probs,
    kid_from_features,
    ppl_from_distances,
    precision_recall_from_features,
    slerp,
)


def test_fid_identity_is_zero():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 16))
    mu, sigma = x.mean(0), np.cov(x, rowvar=False, bias=True)
    assert abs(fid_from_stats(mu, sigma, mu, sigma)) < 1e-6

    y = x + 3.0
    mu2 = y.mean(0)
    fid = fid_from_stats(mu, sigma, mu2, sigma)
    np.testing.assert_allclose(fid, 9.0 * 16, rtol=1e-5)  # ||3||^2 per dim


def test_feature_stats_mean_cov_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((300, 8)).astype(np.float32)
    st = FeatureStats(capture_mean_cov=True)
    for i in range(0, 300, 64):
        st.append(x[i : i + 64])
    mu, cov = st.get_mean_cov()
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False, bias=True), atol=1e-4)


def test_feature_stats_max_items():
    st = FeatureStats(capture_all=True, max_items=10)
    st.append(np.ones((7, 4)))
    st.append(np.ones((7, 4)))
    assert st.num_items == 10 and st.get_all().shape == (10, 4)


def test_kid_identity_near_zero_and_positive_for_shift():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((400, 32)).astype(np.float32)
    kid_same = kid_from_features(x, x.copy(), num_subsets=10, max_subset_size=200,
                                 rng=np.random.default_rng(0))
    # unbiased MMD estimator: slightly negative values are expected on
    # identical sets with random subset sampling
    assert abs(kid_same) < 0.1
    y = x + 1.0
    kid_diff = kid_from_features(x, y, num_subsets=10, max_subset_size=200,
                                 rng=np.random.default_rng(0))
    assert kid_diff > kid_same


def test_inception_score_uniform_is_one():
    probs = np.full((100, 10), 0.1)
    mean, std = inception_score_from_probs(probs, num_splits=5)
    np.testing.assert_allclose(mean, 1.0, atol=1e-6)

    onehot = np.eye(10)[np.arange(100) % 10] * 0.999 + 1e-4
    onehot /= onehot.sum(1, keepdims=True)
    mean_sharp, _ = inception_score_from_probs(onehot, num_splits=5)
    assert mean_sharp > 5.0


def test_precision_recall_identical_sets():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((200, 16)).astype(np.float32)
    p, r = precision_recall_from_features(x, x.copy(), nhood_size=3)
    assert p == 1.0 and r == 1.0
    far = x + 100.0
    p2, r2 = precision_recall_from_features(x, far, nhood_size=3)
    assert p2 == 0.0 and r2 == 0.0


def test_ppl_trimmed_mean():
    # 1%-99% trim excludes the outlier tails only when they fall strictly
    # outside the percentile bounds (needs enough mass).
    # just-under-1% high outliers get trimmed (hi lands on a 1.0); zeros stay
    # (dist >= lo with lo == 0) but barely move the mean.
    d = np.concatenate([np.ones(9801), np.full(99, 1000.0), np.zeros(100)])
    val = ppl_from_distances(d)
    assert 0.9 < val < 1.1


def test_slerp_endpoints():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((5, 8))
    b = rng.standard_normal((5, 8))
    s0 = slerp(a, b, np.zeros((5, 1)))
    np.testing.assert_allclose(s0, a / np.linalg.norm(a, axis=-1, keepdims=True), atol=1e-6)


def test_calc_metric_pipeline_smoke():
    rng = np.random.default_rng(5)
    imgs_real = rng.integers(0, 255, (64, 32, 32, 3), dtype=np.uint8)
    imgs_gen = rng.integers(0, 255, (64, 32, 32, 3), dtype=np.uint8)

    def src(imgs):
        def gen():
            for i in range(0, len(imgs), 16):
                yield imgs[i : i + 16]

        return gen

    res = calc_metric(
        "fid50k_full", real_source=src(imgs_real), gen_source=src(imgs_gen), rng_seed=0
    )
    assert np.isfinite(res["results"]["fid50k_full"])
    res_same = calc_metric(
        "fid50k_full", real_source=src(imgs_real), gen_source=src(imgs_real), rng_seed=0
    )
    assert res_same["results"]["fid50k_full"] < res["results"]["fid50k_full"]


def test_ppl_sampler_identity_pairs_near_zero():
    """Identical ws pairs => zero path length; distinct pairs => positive."""
    import jax
    import jax.numpy as jnp

    from pasta_gan_tpu.metrics import compute_ppl

    def synth(ws):
        # toy 'generator': broadcast ws into an image deterministically
        B = ws.shape[0]
        base = jnp.tanh(ws[:, 0, :64])
        img = jnp.tile(base[:, None, None, :], (1, 32, 32, 1))[..., :3]
        return img

    def dist(a, b):
        return jnp.mean(jnp.square(a - b), axis=(1, 2, 3))

    rngk = jax.random.PRNGKey(0)
    ws = jax.random.normal(rngk, (8, 4, 128))

    same = compute_ppl(synth, [(ws, ws)], dist, num_samples=8, crop=False)
    assert same == 0.0

    ws2 = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 128))
    diff = compute_ppl(synth, [(ws, ws2)], dist, num_samples=8, crop=False)
    assert diff > 0.0


@pytest.mark.slow
def test_quality_regression_script():
    """The per-round quality-regression pipeline (scripts/quality_regression.py)
    runs end-to-end and prints a finite JSON record."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "scripts/quality_regression.py", "--cpu", "--steps", "2",
         "--samples", "4", "--batch", "2",
         "--channel_base", "256", "--channel_max", "32"],
        capture_output=True, text=True, timeout=1500, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "fid_proxy"
    assert np.isfinite(rec["value"]) and np.isfinite(rec["recon_l1"])


def test_ppl_registered_metrics_and_driver():
    """ppl2_wend + the four legacy aliases are registered metrics (reference
    metric_main.py:101-103,133-150) and run through calc_metric with a toy
    sampler carrying fixed conditioning aux."""
    import jax
    import jax.numpy as jnp

    from pasta_gan_tpu.metrics.metric_main import list_valid_metrics

    names = set(list_valid_metrics())
    assert {"ppl2_wend", "ppl_zfull", "ppl_wfull", "ppl_zend", "ppl_wend"} <= names

    proj = jax.random.normal(jax.random.PRNGKey(2), (128, 3))

    def synth(ws, aux):
        base = jnp.tanh(ws[:, 0, :] @ proj) + aux["bias"]
        return jnp.tile(base[:, None, None, :], (1, 64, 64, 1))

    def sampler(space):
        assert space == "w"

        def pair_iter():
            k = 0
            while True:
                ws0 = jax.random.normal(jax.random.PRNGKey(k), (4, 2, 128))
                ws1 = jax.random.normal(jax.random.PRNGKey(k + 1), (4, 2, 128))
                yield ws0, ws1, {"bias": jnp.float32(0.1)}
                k += 2

        return synth, pair_iter()

    res = calc_metric("ppl2_wend", ppl_sampler=sampler, ppl_num_samples=8, rng_seed=0)
    val = res["results"]["ppl2_wend"]
    assert np.isfinite(val) and val > 0.0, val

    # w-space aliases run too (crop=True path exercises center_crop_for_ppl)
    res2 = calc_metric("ppl_wend", ppl_sampler=sampler, ppl_num_samples=8, rng_seed=0)
    assert np.isfinite(res2["results"]["ppl_wend"])

    # without a sampler the error is actionable, not an attribute crash
    with pytest.raises(ValueError, match="ppl_sampler"):
        calc_metric("ppl2_wend")

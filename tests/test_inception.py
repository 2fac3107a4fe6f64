"""JAX InceptionV3 detector vs an independent torch oracle (random weights).

Validates graph wiring, BN folding, pooling semantics (count_include_pad,
the Mixed_7c max-pool quirk), the resize path, and the FID pipeline."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pasta_gan_tpu.metrics.inception import InceptionV3Features


def _randomized_oracle(seed=0):
    from _inception_oracle import FidInceptionOracle

    torch.manual_seed(seed)
    model = FidInceptionOracle().eval()
    # randomize BN stats so folding is actually exercised
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
    return model


def test_features_match_oracle_299():
    model = _randomized_oracle()
    jx = InceptionV3Features.from_state_dict(model.state_dict())

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 299, 299, 3), np.uint8)
    with torch.no_grad():
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float() / 127.5 - 1.0
        ref = model(x).numpy()
    got = jx(imgs)
    assert got.shape == (2, 2048)
    scale = np.abs(ref).max() + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 2e-4, np.max(np.abs(got - ref)) / scale


def test_features_match_oracle_resized_256():
    model = _randomized_oracle(seed=3)
    jx = InceptionV3Features.from_state_dict(model.state_dict())

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 256, 192, 3), np.uint8)
    with torch.no_grad():
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float()
        x = torch.nn.functional.interpolate(
            x, size=(299, 299), mode="bilinear", align_corners=False
        )
        ref = model(x / 127.5 - 1.0).numpy()
    got = jx(imgs)
    scale = np.abs(ref).max() + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 2e-4


@pytest.mark.slow
def test_fid_pipeline_with_jax_inception(tmp_path):
    """End-to-end: two image sets through the JAX detector -> FID formula.
    Identical sets give FID ~0; disjoint sets give FID > 0."""
    from pasta_gan_tpu.metrics.feature_stats import FeatureStats
    from pasta_gan_tpu.metrics.formulas import fid_from_stats

    model = _randomized_oracle(seed=7)
    jx = InceptionV3Features.from_state_dict(model.state_dict())

    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
    b = rng.integers(120, 256, (8, 64, 64, 3), np.uint8)

    def stats(images):
        s = FeatureStats(capture_mean_cov=True, max_items=len(images))
        s.append(jx(images))
        return s

    mu_a, cov_a = stats(a).get_mean_cov()
    mu_b, cov_b = stats(b).get_mean_cov()
    same = fid_from_stats(mu_a, cov_a, mu_a, cov_a)
    diff = fid_from_stats(mu_a, cov_a, mu_b, cov_b)
    assert abs(same) < 1e-3
    assert diff > same

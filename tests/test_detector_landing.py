"""Detector-weights LANDING PATH tests (VERDICT r4 #7).

tests/test_detector_weights.py stays skipped until the real NVIDIA files
arrive (no egress).  These tests make sure that first real-weights run
cannot die in a parser: they fabricate weight files in EVERY accepted
manifest format (detectors_manifest.py) — a TorchScript archive with the
NVIDIA-style 'layers.' wrapper, a plain torch state_dict checkpoint, and an
.npz export — and drive the FULL pipeline on tiny shapes:

    find_detector -> verify_detector -> from_file -> feature extraction
    -> FeatureStats -> fid_from_stats          (inception)
    find_detector -> load_state_dict_file -> lpips_distance   (vgg16/PPL,
    the exact cli.calc_metrics --ppl_detector code path)

All three formats must produce numerically identical features (same
underlying weights), so format-branch divergence is caught, not just
crashes.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pasta_gan_tpu.metrics.detectors_manifest import (
    DETECTORS,
    find_detector,
    verify_detector,
)

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def _nested_param_holder(sd):
    """A torch module tree registering every state_dict entry under its
    exact dotted name (parameters for weights, buffers for running stats),
    with a trivial scriptable forward — torch.jit.save of this produces a
    real TorchScript archive whose state_dict round-trips the names."""

    class Holder(torch.nn.Module):
        def forward(self, x):
            return x

    root = Holder()
    for key, val in sd.items():
        parts = key.split(".")
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p):
                setattr(mod, p, Holder())
            mod = getattr(mod, p)
        leaf = parts[-1]
        t = val.detach().clone()
        if "running_" in leaf or leaf == "num_batches_tracked":
            mod.register_buffer(leaf, t)
        else:
            mod.register_parameter(leaf, torch.nn.Parameter(t))
    return root


def _save_all_formats(sd, tmp_path, names):
    """names: (torchscript, state_dict, npz) filenames from the manifest."""
    ts_name, pth_name, npz_name = names
    # TorchScript with the NVIDIA-style 'layers.' wrapper the importers strip
    wrap = _nested_param_holder({f"layers.{k}": v for k, v in sd.items()})
    d = {}
    for fmt, fn in (("ts", ts_name), ("pth", pth_name), ("npz", npz_name)):
        sub = tmp_path / fmt
        sub.mkdir()
        p = sub / fn
        if fmt == "ts":
            torch.jit.save(torch.jit.script(wrap), str(p))
        elif fmt == "pth":
            torch.save(sd, str(p))
        else:
            np.savez(str(p), **{k: v.numpy() for k, v in sd.items()})
        d[fmt] = (str(sub), str(p))
    return d


@pytest.mark.slow
def test_inception_landing_all_formats(tmp_path, monkeypatch):
    from _inception_oracle import FidInceptionOracle

    from pasta_gan_tpu.metrics.feature_stats import FeatureStats
    from pasta_gan_tpu.metrics.formulas import fid_from_stats
    from pasta_gan_tpu.metrics.inception import InceptionV3Features

    torch.manual_seed(0)
    model = FidInceptionOracle().eval()
    # randomize BN stats so the folding branch is exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.8, 1.2)
    sd = dict(model.state_dict())

    files = _save_all_formats(
        sd, tmp_path, DETECTORS["inception"]["filenames"][:3]
    )

    rng = np.random.default_rng(0)
    imgs_a = rng.integers(0, 256, (4, 299, 299, 3), np.uint8)
    imgs_b = np.clip(imgs_a.astype(np.int32) + 40, 0, 255).astype(np.uint8)

    feats = {}
    for fmt, (d, path) in files.items():
        # full discovery chain exactly as cli.calc_metrics --detector auto
        monkeypatch.setenv("PASTA_GAN_DETECTORS", d)
        found = find_detector("inception")
        assert found == path, (fmt, found, path)
        assert len(verify_detector("inception", found)) == 64
        ext = InceptionV3Features.from_file(found)
        feats[fmt] = np.asarray(ext(imgs_a))

    np.testing.assert_allclose(feats["ts"], feats["pth"], rtol=0, atol=0)
    np.testing.assert_allclose(feats["npz"], feats["pth"], rtol=0, atol=1e-5)

    # FID end-to-end through FeatureStats on the state_dict-format detector
    ext = InceptionV3Features.from_file(files["pth"][1])
    sa, sb = FeatureStats(capture_mean_cov=True), FeatureStats(capture_mean_cov=True)
    sa.append(ext(imgs_a))
    sb.append(ext(imgs_b))
    fid = fid_from_stats(*sa.get_mean_cov(), *sb.get_mean_cov())
    assert np.isfinite(fid) and fid > 0.0
    same = fid_from_stats(*sa.get_mean_cov(), *sa.get_mean_cov())
    assert abs(same) < 1e-3


@pytest.mark.slow
def test_vgg16_ppl_landing_all_formats(tmp_path, monkeypatch):
    """The cli.calc_metrics --ppl_detector path: load_state_dict_file on
    every accepted format -> lpips_distance, conv-only torchvision naming
    (the classifier head is optional for LPIPS and would be ~400 MB)."""
    from pasta_gan_tpu.metrics.ppl import lpips_distance
    from pasta_gan_tpu.metrics.vgg16 import _CONV_IDX, load_state_dict_file

    torch.manual_seed(1)
    sd = {}
    cin = 3
    for i, cout in zip(_CONV_IDX, (64, 64, 128, 128, 256, 256, 256,
                                   512, 512, 512, 512, 512, 512)):
        sd[f"features.{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
        sd[f"features.{i}.bias"] = torch.randn(cout) * 0.01
        cin = cout
    for k in range(5):  # LPIPS linear heads, pytorch-LPIPS naming
        c = (64, 128, 256, 512, 512)[k]
        sd[f"lins.{k}.model.1.weight"] = torch.rand(1, c, 1, 1)

    files = _save_all_formats(sd, tmp_path, DETECTORS["vgg16"]["filenames"][:3])

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + 25.0, 0, 255).astype(np.float32)

    dists = {}
    for fmt, (d, path) in files.items():
        monkeypatch.setenv("PASTA_GAN_DETECTORS", d)
        found = find_detector("vgg16")
        assert found == path, (fmt, found, path)
        assert len(verify_detector("vgg16", found)) == 64
        dist = lpips_distance(load_state_dict_file(found))
        dists[fmt] = np.asarray(dist(a, b))
        assert np.all(np.isfinite(dists[fmt])) and np.all(dists[fmt] > 0)

    np.testing.assert_allclose(dists["ts"], dists["pth"], rtol=0, atol=0)
    np.testing.assert_allclose(dists["npz"], dists["pth"], rtol=1e-6, atol=1e-7)


def test_wrong_file_errors_clearly(tmp_path):
    """A mismatched weight file must raise the "does not look like" error,
    not an opaque KeyError mid-extraction."""
    from pasta_gan_tpu.metrics.inception import InceptionV3Features
    from pasta_gan_tpu.metrics.vgg16 import params_from_state_dict

    bogus = {"some.module.weight": np.zeros((4, 4), np.float32)}
    p = tmp_path / "inception.npz"
    np.savez(str(p), **bogus)
    with pytest.raises(ValueError, match="does not look like"):
        InceptionV3Features.from_file(str(p))
    with pytest.raises(ValueError, match="does not look like"):
        params_from_state_dict(bogus)

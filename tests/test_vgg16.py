"""JAX VGG16/LPIPS extractors vs an independent torch oracle (random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from pasta_gan_tpu.metrics.vgg16 import (
    LPIPS_SCALE,
    LPIPS_SHIFT,
    VGG_MEAN,
    LPIPSFeatures,
    VGG16Features,
)

_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
        512, 512, 512, "M"]


class _VGGOracle(nn.Module):
    """torchvision-vgg16-shaped oracle written independently for the test."""

    def __init__(self):
        super().__init__()
        layers = []
        cin = 3
        for v in _CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(inplace=False)]
                cin = v
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Linear(512 * 49, 4096), nn.ReLU(), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(),
        )

    def forward(self, x):  # x: preprocessed float NCHW at 224
        x = self.features(x)
        x = F.adaptive_avg_pool2d(x, 7)
        x = torch.flatten(x, 1)
        return self.classifier(x)

    def lpips_taps(self, x):
        taps = []
        relu_count = 0
        for m in self.features:
            x = m(x)
            if isinstance(m, nn.ReLU):
                relu_count += 1
                if relu_count in (2, 4, 7, 10, 13):
                    taps.append(x)
        return taps


def _model(seed=0):
    torch.manual_seed(seed)
    m = _VGGOracle().eval()
    return m


@pytest.mark.slow
def test_vgg16_pr_features_match_oracle():
    m = _model()
    jx = VGG16Features.from_state_dict(m.state_dict())
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 224, 224, 3), np.uint8)
    with torch.no_grad():
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float()
        x = x - torch.tensor(VGG_MEAN).view(1, 3, 1, 1)
        ref = m(x).numpy()
    got = jx(imgs)
    assert got.shape == (2, 4096)
    scale = np.abs(ref).max() + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 3e-4


@pytest.mark.slow
def test_vgg16_resize_path():
    m = _model(seed=2)
    jx = VGG16Features.from_state_dict(m.state_dict())
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 256, 192, 3), np.uint8)
    with torch.no_grad():
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float()
        x = F.interpolate(x, size=(224, 224), mode="bilinear", align_corners=False)
        x = x - torch.tensor(VGG_MEAN).view(1, 3, 1, 1)
        ref = m(x).numpy()
    got = jx(imgs)
    scale = np.abs(ref).max() + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 3e-4


def test_lpips_embedding_distance():
    """||f(a)-f(b)||^2 equals the hand-computed spatial-mean LPIPS with the
    same (random) lin weights."""
    m = _model(seed=5)
    sd = dict(m.state_dict())
    rng = np.random.default_rng(3)
    chans = [64, 128, 256, 512, 512]
    for k, c in enumerate(chans):
        sd[f"lin{k}.model.1.weight"] = torch.tensor(
            rng.uniform(0.0, 1.0, (1, c, 1, 1)).astype(np.float32)
        )
    jx = LPIPSFeatures.from_state_dict(sd)

    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    fa, fb = jx(a), jx(b)
    d_embed = np.sum((fa - fb) ** 2, axis=1)

    def taps(x):
        with torch.no_grad():
            t = torch.from_numpy(x.transpose(0, 3, 1, 2))
            t = (t - torch.tensor(LPIPS_SHIFT).view(1, 3, 1, 1)) / torch.tensor(
                LPIPS_SCALE
            ).view(1, 3, 1, 1)
            return [tt.numpy() for tt in m.lpips_taps(t)]

    ta, tb = taps(a), taps(b)
    d_ref = np.zeros(2)
    for k, (xa, xb) in enumerate(zip(ta, tb)):
        na = xa / np.sqrt((xa**2).sum(1, keepdims=True) + 1e-10)
        nb = xb / np.sqrt((xb**2).sum(1, keepdims=True) + 1e-10)
        w = sd[f"lin{k}.model.1.weight"].numpy().reshape(1, -1, 1, 1)
        d_ref += (w * (na - nb) ** 2).sum(1).mean((1, 2))
    np.testing.assert_allclose(d_embed, d_ref, rtol=1e-4)

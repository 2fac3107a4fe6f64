"""VGG19 perceptual loss vs an independent torch oracle (random weights):
validates the torchvision-naming importer, the conv/tap wiring, and the full
5-slice weighted-L1 loss of the reference VGGLoss
(`loss_wo_flow_fullbody.py:259-309`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

from pasta_gan_tpu.train.vgg import (
    VGG_SLICE_WEIGHTS,
    load_torch_vgg19,
    vgg_perceptual_loss,
)

_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
         512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _oracle(seed=0):
    torch.manual_seed(seed)
    layers = []
    cin = 3
    for v in _PLAN:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    return nn.Sequential(*layers).eval()


def _taps(model, x):
    """relu1_1/2_1/3_1/4_1/5_1 activations (the reference's slice ends:
    features[:2], [2:7], [7:12], [12:21], [21:30])."""
    outs = []
    ends = {2, 7, 12, 21, 30}
    with torch.no_grad():
        for i, m in enumerate(model):
            x = m(x)
            if i + 1 in ends:
                outs.append(x.numpy())
    return outs


def test_vgg19_importer_and_perceptual_loss(tmp_path):
    model = _oracle()
    # state_dict with torchvision "features.N" naming
    sd = {f"features.{k}": v for k, v in model.state_dict().items()}
    pth = tmp_path / "vgg19_random.pth"
    torch.save(sd, pth)

    params = load_torch_vgg19(str(pth))

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    # feature parity at each tap
    from pasta_gan_tpu.train.vgg import VGG19Features

    fx = VGG19Features().apply(params, jnp.asarray(a))
    ref = _taps(model, torch.from_numpy(a.transpose(0, 3, 1, 2)))
    assert len(fx) == len(ref) == 5
    for k, (ja, ta) in enumerate(zip(fx, ref)):
        ja = np.asarray(ja).transpose(0, 3, 1, 2)
        scale = np.abs(ta).max() + 1e-9
        assert np.max(np.abs(ja - ta)) / scale < 2e-5, k

    # full perceptual loss (reference VGGLoss: weighted L1 over the 5 slices)
    got = float(vgg_perceptual_loss(params, jnp.asarray(a), jnp.asarray(b)))
    ta = _taps(model, torch.from_numpy(a.transpose(0, 3, 1, 2)))
    tb = _taps(model, torch.from_numpy(b.transpose(0, 3, 1, 2)))
    want = sum(
        w * float(np.mean(np.abs(x - y)))
        for w, x, y in zip(VGG_SLICE_WEIGHTS, ta, tb)
    )
    assert got == pytest.approx(want, rel=1e-4)

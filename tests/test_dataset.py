"""End-to-end data pipeline tests on the synthetic fixture: host sample ->
device batch -> one G forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.data import (
    SyntheticUvitonDataset,
    collate,
    prepare_train_batch,
    prepare_tryon_batch,
)


def test_synthetic_dataset_sample_contract():
    ds = SyntheticUvitonDataset(num_samples=2)
    s = ds[0]
    assert s["image"].shape == (256, 256, 3) and s["image"].dtype == np.uint8
    assert s["pose"].shape == (256, 256, 3)
    assert s["keypoints"].shape == (18, 3)
    assert s["gt_parsing"].shape == (256, 256)
    assert s["gt_parsing"].max() <= 5
    assert s["upper_mask"].max() == 1
    assert s["retain_mask"].max() >= 1
    # deterministic
    s2 = SyntheticUvitonDataset(num_samples=2)[0]
    np.testing.assert_array_equal(s["image"], s2["image"])


@pytest.mark.slow
def test_prepare_train_batch_shapes_and_ranges():
    ds = SyntheticUvitonDataset(num_samples=2)
    host = collate([ds[0], ds[1]])
    batch = prepare_train_batch(host, jax.random.PRNGKey(0))
    B = 2
    assert batch["real_img"].shape == (B, 256, 256, 3)
    assert batch["style_input"].shape == (B, 64, 64, 42)
    assert batch["pose"].shape == (B, 256, 256, 6)
    assert batch["denorm_upper_img"].shape == (B, 256, 256, 3)
    assert batch["gt_parsing"].dtype == jnp.int32
    for k, v in batch.items():
        assert np.all(np.isfinite(np.asarray(v, dtype=np.float32))), k
    # the routed garment actually lands somewhere (masks non-empty)
    assert float(jnp.sum(batch["denorm_upper_mask"])) > 100
    r = np.asarray(batch["real_img"])
    assert r.min() >= -1.001 and r.max() <= 1.001


@pytest.mark.slow
def test_prepare_tryon_batch():
    ds = SyntheticUvitonDataset(num_samples=2)
    person = collate([ds[0]])
    garment = collate([ds[1]])
    batch = prepare_tryon_batch(person, garment)
    assert batch["style_input"].shape == (1, 64, 64, 42)
    assert float(jnp.sum(batch["denorm_upper_mask"])) > 50


@pytest.mark.slow
def test_train_batch_drives_generator():
    """The routed device batch feeds the 256px generator forward cleanly
    (training-step coverage at tiny shapes lives in test_train.py)."""
    from pasta_gan_tpu.models import GeneratorFull

    ds = SyntheticUvitonDataset(num_samples=2)
    host = collate([ds[0], ds[1]])
    batch = prepare_train_batch(host, jax.random.PRNGKey(0))

    gen = GeneratorFull(img_resolution=256, channel_base=512, channel_max=32)
    args = (None, batch["style_input"], batch["retain"], batch["pose"],
            batch["denorm_upper_img"], batch["denorm_lower_img"],
            batch["denorm_upper_mask"], batch["denorm_lower_mask"])
    v = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                 *args, noise_mode="none")
    img, ft, parsing = gen.apply(v, *args, noise_mode="none")
    assert img.shape == (2, 256, 256, 3)
    assert np.all(np.isfinite(np.asarray(ft)))

"""Checkpoint round-trips + utils coverage."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_snapshot_roundtrip(tmp_path):
    from pasta_gan_tpu.io.checkpoints import load_snapshot, save_snapshot

    params = {"params": {"layer": {"w": jnp.arange(6.0).reshape(2, 3)}}}
    w_avg = jnp.ones((4,))
    save_snapshot(str(tmp_path / "snap"), params, w_avg, '{"model": {"w_dim": 4}}')
    p2, w2, cfg = load_snapshot(str(tmp_path / "snap"))
    np.testing.assert_array_equal(np.asarray(p2["params"]["layer"]["w"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(w2), np.ones(4))
    assert cfg["model"]["w_dim"] == 4


@pytest.mark.slow
def test_train_state_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import synth_batch, tiny_config

    from pasta_gan_tpu.io.checkpoints import restore_train_state, save_train_state
    from pasta_gan_tpu.train.step import GANTrainer

    cfg = tiny_config()
    trainer = GANTrainer(cfg)
    batch = synth_batch(0, 2, cfg.model.img_resolution)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    save_train_state(str(tmp_path / "ts"), state)
    restored = restore_train_state(str(tmp_path / "ts"), state)
    a = jax.tree_util.tree_leaves(state.g_params)[3]
    b = jax.tree_util.tree_leaves(restored.g_params)[3]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(jax.device_get(restored.step)) == 0


def test_mapping_truncation():
    from pasta_gan_tpu.nn.mapping import MappingNetwork

    m = MappingNetwork(z_dim=0, c_dim=16, w_dim=8, num_ws=3, num_layers=1)
    c = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
    v = m.init(jax.random.PRNGKey(1), None, c)
    ws, w_raw = m.apply(v, None, c)
    assert ws.shape == (2, 3, 8) and w_raw.shape == (2, 8)
    # psi=0 collapses everything onto w_avg
    w_avg = jnp.full((8,), 0.5)
    ws0, _ = m.apply(v, None, c, w_avg=w_avg, truncation_psi=0.0)
    np.testing.assert_allclose(np.asarray(ws0), 0.5, atol=1e-6)
    # cutoff: only the first row truncated
    ws_cut, _ = m.apply(v, None, c, w_avg=w_avg, truncation_psi=0.0, truncation_cutoff=1)
    np.testing.assert_allclose(np.asarray(ws_cut[:, 0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ws_cut[:, 1:]), np.asarray(ws[:, 1:]), atol=1e-6)


def test_utils_assert_shape_and_grid(tmp_path):
    from pasta_gan_tpu.utils import assert_shape, save_image_grid

    x = jnp.zeros((2, 4, 4, 3))
    assert_shape(x, (2, None, 4, 3))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 4, 4, 1))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 4, 4))

    path = save_image_grid(np.zeros((5, 8, 8, 3), np.float32), str(tmp_path / "g.png"))
    import PIL.Image

    assert PIL.Image.open(path).size == (24, 16)  # 3x2 grid of 8x8


def test_parsing_to_rgb_bf16_logits(tmp_path):
    """bf16 logits must take the argmax branch (regression: the round-4
    training smoke run crashed at the first image snapshot because
    ml_dtypes.bfloat16 fails np.issubdtype(..., np.floating), so the
    [N,H,W,K] logits skipped argmax and palette[x] came out 5-D)."""
    from pasta_gan_tpu.utils import parsing_to_rgb, save_image_grid

    logits = jnp.zeros((2, 8, 8, 20), jnp.bfloat16)
    logits = logits.at[..., 3].set(1.0)
    rgb = parsing_to_rgb(np.asarray(jax.device_get(logits)))
    assert rgb.shape == (2, 8, 8, 3)
    # class 3 everywhere -> the palette row for label 3
    np.testing.assert_allclose(rgb[0, 0, 0], np.array([0, 85, 0]) / 255.0, atol=1e-6)
    # the save path the training loop uses must accept it end-to-end
    save_image_grid(rgb, str(tmp_path / "p.png"), drange=(0, 1))


def test_easydict_and_logger(tmp_path, capsys):
    from pasta_gan_tpu.utils import EasyDict, Logger

    d = EasyDict(a=1)
    d.b = 2
    assert d["b"] == 2 and d.a == 1
    del d.a
    assert "a" not in d

    log_file = str(tmp_path / "log.txt")
    logger = Logger(log_file)
    print("tee-check")
    logger.close()
    assert "tee-check" in open(log_file).read()


def test_open_url_downloader(tmp_path):
    """open_url's full download logic (dnnlib/util.py:382-477) with an
    injected fetch: retries, Content-Disposition naming, atomic md5 cache,
    cache hits, Google-Drive nag redirect and quota error."""
    import hashlib
    import io

    from pasta_gan_tpu.utils import open_url

    cache = str(tmp_path / "cache")
    url = "https://example.com/weights.pkl"
    md5 = hashlib.md5(url.encode()).hexdigest()

    # (1) retries then success + cache write with the content-disposition name
    calls = {"n": 0}

    def flaky(u):
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return b"PAYLOAD" * 2000, {"Content-Disposition": 'attachment; filename="net.pkl"'}

    f = open_url(url, cache_dir=cache, _fetch=flaky)
    assert f.read(7) == b"PAYLOAD" and calls["n"] == 3
    cached = os.listdir(cache)
    assert cached == [md5 + "_net.pkl"], cached

    # (2) cache hit: no fetch at all
    def boom(u):
        raise AssertionError("fetch must not be called on a cache hit")

    with open_url(url, cache_dir=cache, _fetch=boom) as f2:
        assert f2.read(7) == b"PAYLOAD"
    assert open_url(url, cache_dir=cache, _fetch=boom, return_filename=True).endswith(
        "_net.pkl"
    )

    # (3) exhausted retries raise
    with pytest.raises(IOError):
        open_url("https://example.com/other", cache_dir=cache, num_attempts=2,
                 _fetch=lambda u: (_ for _ in ()).throw(IOError("down")))

    # (4) Google Drive virus-check nag: follow the embedded export link
    nag_url = "https://drive.google.com/uc?id=abc"
    real = b"REALDATA" * 1500

    def gdrive(u):
        if "export=download" not in u:
            return (
                b'<a href="/uc?export=download&confirm=t&id=abc">download</a>',
                {"Set-Cookie": "download_warning_x=1"},
            )
        return real, {}

    out = open_url(nag_url, cache_dir=cache, cache=False, _fetch=gdrive)
    assert out.read() == real

    # (5) quota page raises with the reference's message
    def quota(u):
        return b"Google Drive - Quota exceeded", {}

    with pytest.raises(IOError, match="quota exceeded"):
        open_url("https://drive.google.com/uc?id=xyz", cache_dir=cache,
                 num_attempts=1, cache=False, _fetch=quota)

    # (6) local paths and file:// URLs bypass the downloader
    p = tmp_path / "local.bin"
    p.write_bytes(b"xyz")
    assert open_url(str(p)).read() == b"xyz"
    assert open_url("file://" + str(p)).read() == b"xyz"


def test_spacetodepth_matches_torch_unfold():
    import torch

    from pasta_gan_tpu.nn.layers import SpaceToDepth

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 6, 5)).astype(np.float32)
    ours = SpaceToDepth(block_size=2).apply({}, jnp.asarray(x))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())  # NCHW
    unfolded = torch.nn.functional.unfold(xt, 2, stride=2)
    ref = unfolded.view(2, 5 * 4, 4, 3).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

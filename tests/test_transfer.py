"""Transfer-learning resume (io/transfer.py vs reference
training_loop_wo_flow_fullbody.py:280-285 + train_wo_flow_fullbody.py:319-325):
require_all=False name+shape matching from a network pickle into a fresh
train state — legacy TF StyleGAN2 exports (the reference's resume presets)
end-to-end, including the loop wiring."""

import io
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.io.transfer import (
    copy_matching_leaves,
    transfer_from_network_pickle,
)
from pasta_gan_tpu.io.tf_legacy import TFNetworkStub, load_tf_network_stubs
from pasta_gan_tpu.models.generator_stock import GeneratorStock

sys.path.insert(0, "tests")
from test_tf_legacy import _fake_tf_pickle, _tf_gen_stub  # noqa: E402
from test_train import synth_batch, tiny_config  # noqa: E402


def test_copy_matching_leaves_semantics():
    dst = {
        "a": np.zeros((2, 2), np.float32),
        "b": {"c": np.zeros((3,), np.float32), "d": np.zeros((4,), np.float32)},
    }
    src = {
        "a": np.ones((2, 2), np.float32),       # matches -> copied
        "b": {"c": np.ones((5,), np.float32)},  # shape mismatch -> kept
        "e": np.ones((9,), np.float32),         # extra in src -> ignored
    }
    merged, copied, mismatched = copy_matching_leaves(dst, src)
    np.testing.assert_array_equal(merged["a"], 1.0)
    np.testing.assert_array_equal(merged["b"]["c"], 0.0)
    np.testing.assert_array_equal(merged["b"]["d"], 0.0)
    assert copied == ["a"] and mismatched == ["b.c"]


def _tf_pickle_for(res, w_dim, mapping_layers, channel_base, channel_max):
    """A fabricated legacy TF (G, D, Gs) pickle whose Gs is a stock generator
    of the given geometry and whose D matches our Discriminator layout."""
    gen = GeneratorStock(
        z_dim=w_dim, c_dim=0, w_dim=w_dim, img_resolution=res, img_channels=3,
        mapping_kwargs=dict(num_layers=mapping_layers),
        synthesis_kwargs=dict(channel_base=channel_base, channel_max=channel_max),
    )
    v = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, w_dim)), None, noise_mode="const")
    g_kw = dict(
        latent_size=w_dim, label_size=0, dlatent_size=w_dim, resolution=res,
        num_channels=3, mapping_layers=mapping_layers,
        fmap_base=channel_base // 2, fmap_max=channel_max,
    )
    g_stub, g_vars = _tf_gen_stub(v, g_kw)

    # discriminator TF variables from our D tree via the inverse name map
    from pasta_gan_tpu.io.tf_legacy import _tf_name_for
    from pasta_gan_tpu.nn.discriminator import Discriminator

    disc = Discriminator(
        c_dim=0, img_resolution=res, img_channels=3,
        channel_base=channel_base, channel_max=channel_max, mbstd_group_size=2,
    )
    dv = disc.init(jax.random.PRNGKey(2), jnp.zeros((2, res, res, 3)), None)
    rng = np.random.default_rng(3)
    d_vars = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(dv)[0]:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        name, transpose = _tf_name_for(path[1:], res)
        shape = tuple(np.asarray(leaf).shape)
        if transpose:
            shape = shape[::-1]
        d_vars[name] = rng.normal(0, 0.1, shape).astype(np.float32)
    d_stub_state = dict(
        version=4,
        static_kwargs=dict(label_size=0, resolution=res, num_channels=3,
                           fmap_base=channel_base // 2, fmap_max=channel_max,
                           mbstd_group_size=2),
        variables=list(d_vars.items()),
        components={},
    )
    return _fake_tf_pickle([dict(g_stub), d_stub_state, dict(g_stub)]), g_vars, d_vars


def test_transfer_from_tf_pickle_into_train_state(tmp_path):
    from pasta_gan_tpu.train.step import GANTrainer

    cfg = tiny_config(res=16)
    trainer = GANTrainer(cfg)
    batch = synth_batch(0, 2, 16)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    data, g_vars, d_vars = _tf_pickle_for(
        res=16, w_dim=cfg.model.w_dim, mapping_layers=cfg.model.mapping_layers,
        channel_base=cfg.model.channel_base, channel_max=cfg.model.channel_max,
    )
    pkl = tmp_path / "ffhq-tiny.pkl"
    pkl.write_bytes(data)

    new_state = transfer_from_network_pickle(state, str(pkl), verbose=False)

    # the discriminator matches the stock layout -> its conv weights transfer
    got = np.asarray(new_state.d_params["params"]["b16"]["conv0"]["weight"])
    np.testing.assert_array_equal(got, d_vars["16x16/Conv0/weight"])
    assert not np.array_equal(
        got, np.asarray(state.d_params["params"]["b16"]["conv0"]["weight"])
    )
    # G and G_ema both receive the transferred leaves (reference copies each)
    for tree in (new_state.g_params, new_state.g_ema_params):
        flat = {
            ".".join(str(getattr(k, "key", k)) for k in kp): leaf
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }
        # synthesis blocks whose names+shapes coincide must have moved;
        # collect any leaf that changed vs the fresh init
        fresh = {
            ".".join(str(getattr(k, "key", k)) for k in kp): leaf
            for kp, leaf in jax.tree_util.tree_flatten_with_path(state.g_params)[0]
        }
        changed = [
            n for n, v in flat.items()
            if n in fresh and not np.array_equal(np.asarray(v), np.asarray(fresh[n]))
        ]
        assert changed, "no generator leaves transferred"
    # w_avg picked up dlatent_avg
    assert not np.array_equal(np.asarray(new_state.w_avg), np.asarray(state.w_avg))
    # untouched controllers stay fresh
    assert int(new_state.step) == 0 and float(new_state.pl_mean) == 0.0

    # the transferred state still trains one step
    rng = jax.random.PRNGKey(3)
    state2, stats = jax.jit(trainer.train_step)(new_state, synth_batch(1, 2, 16), rng)
    assert np.isfinite(float(stats["Loss/G/loss"]))


def test_loop_resume_dispatches_on_file_vs_dir(tmp_path):
    """training_loop(resume=<file>) must take the transfer path (and a dir
    keeps the full-state restore path) — wiring smoke via os.path.isfile."""
    import os

    f = tmp_path / "net.pkl"
    f.write_bytes(b"x")
    assert os.path.isfile(str(f)) and not os.path.isfile(str(tmp_path))


def test_cli_resume_presets(tmp_path, monkeypatch):
    """The reference preset names resolve through the open_url cache and
    fail with a clear message when the pickle was never pre-placed
    (train_wo_flow_fullbody.py:319-341)."""
    from pasta_gan_tpu.cli import train as cli_train

    monkeypatch.setenv("HOME", str(tmp_path))  # empty open_url cache
    with pytest.raises(SystemExit, match="ffhq256"):
        cli_train.main([
            "--outdir", str(tmp_path), "--cfg", "fashion", "--synthetic", "4",
            "--resume", "ffhq256", "--dry-run",
        ])
    # 'noresume' and no --resume both proceed (dry-run exits cleanly)
    cli_train.main([
        "--outdir", str(tmp_path), "--cfg", "fashion", "--synthetic", "4",
        "--resume", "noresume", "--dry-run",
    ])

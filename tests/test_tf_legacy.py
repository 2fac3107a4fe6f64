"""Legacy TF StyleGAN2 pickle conversion (io/tf_legacy.py vs reference
legacy.py:20-28,64-110,207-287): restricted unpickling to a data stub (no
code execution), variable-tree flattening, the TF->our name map pinned
against the reference pattern table, layout transposes, and error paths."""

import io
import pickle
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pasta_gan_tpu.io.tf_legacy import (
    TFNetworkStub,
    collect_tf_params,
    convert_tf_discriminator,
    convert_tf_generator,
    discriminator_kwargs_from_tf,
    generator_kwargs_from_tf,
    generator_stock_from_tf,
    load_tf_network_stubs,
    _tf_gen_name_for,
    _tf_name_for,
)
from pasta_gan_tpu.models.generator_stock import GeneratorStock
from pasta_gan_tpu.nn.discriminator import Discriminator


def _fake_tf_pickle(payload):
    """Pickle `payload` with objects claiming dnnlib.tflib.network.Network."""
    mod = types.ModuleType("dnnlib.tflib.network")

    class Network:
        def __init__(self, state):
            self._state = state

        def __reduce__(self):
            return (_reconstruct, (self._state,))

    def _reconstruct(state):  # pragma: no cover - replaced by the stub
        n = Network(state)
        return n

    # the standard pickle path: instantiate via class lookup + __setstate__
    class NetworkPickled:
        pass

    NetworkPickled.__module__ = "dnnlib.tflib.network"
    NetworkPickled.__qualname__ = NetworkPickled.__name__ = "Network"
    mod.Network = NetworkPickled
    sys.modules["dnnlib"] = types.ModuleType("dnnlib")
    sys.modules["dnnlib.tflib"] = types.ModuleType("dnnlib.tflib")
    sys.modules["dnnlib.tflib.network"] = mod
    objs = []
    for state in payload:
        o = NetworkPickled()
        o.__dict__.update(state)
        objs.append(o)
    return pickle.dumps(tuple(objs))


def _tiny_disc():
    return Discriminator(
        c_dim=8, img_resolution=32, img_channels=3,
        channel_base=1024, channel_max=64, mbstd_group_size=2,
    )


def _our_variables():
    disc = _tiny_disc()
    v = disc.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 8))
    )
    return disc, v


def test_name_map_matches_reference_patterns():
    """Pin the generated TF names for the tiny config to the reference's
    pattern table (legacy.py:266-285)."""
    _, v = _our_variables()
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    names = set()
    for keypath, _ in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        names.add(_tf_name_for(path[1:], 32)[0])
    for expected in [
        "32x32/FromRGB/weight", "32x32/FromRGB/bias",
        "32x32/Conv0/weight", "32x32/Conv1_down/weight", "32x32/Skip/weight",
        "16x16/Conv0/weight", "8x8/Conv1_down/bias",
        "4x4/Conv/weight", "4x4/Dense0/weight", "Output/weight",
        "LabelEmbed/weight", "Mapping0/weight",
    ]:
        assert expected in names, (expected, sorted(names))


def test_convert_tf_discriminator_roundtrip():
    disc, v = _our_variables()
    rng = np.random.default_rng(0)

    # build the TF variable list from the inverse name map with TF layouts
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    tf_vars = {}
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        name, transpose = _tf_name_for(path[1:], 32)
        shape = tuple(np.asarray(leaf).shape)
        if transpose:
            shape = shape[::-1]
        tf_vars[name] = rng.normal(0, 1, shape).astype(np.float32)

    stub = TFNetworkStub(
        version=4,
        static_kwargs=dict(label_size=8, resolution=32, num_channels=3,
                           fmap_base=512, fmap_max=64, mbstd_group_size=2),
        variables=list(tf_vars.items()),
        components={},
    )
    out = convert_tf_discriminator(stub, v)

    # conv weights land in HWIO untransposed; dense weights transposed
    np.testing.assert_array_equal(
        np.asarray(out["params"]["b32"]["conv0"]["weight"]),
        tf_vars["32x32/Conv0/weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["b4"]["fc"]["weight"]),
        tf_vars["4x4/Dense0/weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["mapping"]["embed"]["weight"]),
        tf_vars["LabelEmbed/weight"].T,
    )
    # the converted tree still drives our discriminator
    logits = disc.apply(out, jnp.ones((2, 32, 32, 3)), jnp.ones((2, 8)))
    assert logits.shape == (2, 1) and bool(jnp.all(jnp.isfinite(logits)))

    # kwargs extraction mirrors legacy.py:211-247
    kw = discriminator_kwargs_from_tf(stub)
    assert kw["c_dim"] == 8 and kw["channel_base"] == 1024

    # unknown TF kwargs and old versions are rejected like the reference
    bad = TFNetworkStub(version=4, static_kwargs=dict(bogus=1), variables=[],
                        components={})
    with pytest.raises(ValueError, match="Unknown TensorFlow kwarg"):
        discriminator_kwargs_from_tf(bad)
    old = TFNetworkStub(version=3, static_kwargs={}, variables=[], components={})
    with pytest.raises(ValueError, match="version too low"):
        discriminator_kwargs_from_tf(old)


def test_legacy_unpickler_and_components():
    data = _fake_tf_pickle([
        dict(version=4, static_kwargs={}, variables=[("w", np.ones((2, 2)))],
             components={}),
        dict(version=4, static_kwargs={}, variables=[],
             components=dict(sub=TFNetworkStub(
                 variables=[("v", np.zeros(3))], components={}))),
        dict(version=4, static_kwargs={}, variables=[], components={}),
    ])
    stubs = load_tf_network_stubs(io.BytesIO(data))
    assert stubs is not None and len(stubs) == 3
    assert all(isinstance(s, TFNetworkStub) for s in stubs)
    p = collect_tf_params(stubs[0])
    assert set(p) == {"w"}
    p2 = collect_tf_params(stubs[1])
    assert set(p2) == {"sub/v"} and p2["sub/v"].shape == (3,)

    # non-TF payloads pass through as "not legacy"
    assert load_tf_network_stubs(io.BytesIO(pickle.dumps({"G": 1}))) is None

    # the unpickler is restricted: a payload smuggling a callable global
    # (the classic pickle RCE) must be rejected, not executed
    class Evil:
        def __reduce__(self):
            import os

            return (os.getenv, ("HOME",))

    assert load_tf_network_stubs(io.BytesIO(pickle.dumps(Evil()))) is None
    with pytest.raises(pickle.UnpicklingError, match="not allowed"):
        from pasta_gan_tpu.io.tf_legacy import _LegacyUnpickler

        _LegacyUnpickler(io.BytesIO(pickle.dumps(Evil()))).load()

    # the generator conversion validates its input like the reference
    with pytest.raises(ValueError, match="version too low"):
        generator_kwargs_from_tf(
            TFNetworkStub(version=3, static_kwargs={}, variables=[], components={})
        )


# ---------------------------------------------------------------------------
# generator conversion (legacy.py:109-204 -> models/generator_stock.py)


def _tiny_gen():
    return GeneratorStock(
        z_dim=64, c_dim=0, w_dim=64, img_resolution=32, img_channels=3,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=1024, channel_max=64),
    )


def _tiny_gen_variables():
    gen = _tiny_gen()
    v = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64)), None, noise_mode="const"
    )
    return gen, v


def _tf_gen_stub(v, static_kwargs):
    """Fabricate TF variables for our tiny tree by inverting the name map."""
    rng = np.random.default_rng(1)
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    tf_vars = {}
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        name, kind = _tf_gen_name_for(path[1:])
        shape = tuple(np.asarray(leaf).shape)
        if kind == "fcT":
            shape = shape[::-1]
        elif kind == "const":
            shape = (1, shape[2], shape[0], shape[1])
        elif kind == "noise":
            shape = (1, 1) + shape
        tf_vars[name] = rng.normal(0, 0.1, shape).astype(np.float32)
    w_dim = static_kwargs.get("dlatent_size", 64)
    tf_vars["dlatent_avg"] = rng.normal(0, 1, (w_dim,)).astype(np.float32)
    return (
        TFNetworkStub(
            version=4,
            static_kwargs=static_kwargs,
            variables=list(tf_vars.items()),
            components={},
        ),
        tf_vars,
    )


_TINY_GEN_KW = dict(
    latent_size=64, label_size=0, dlatent_size=64, resolution=32,
    num_channels=3, mapping_layers=2, fmap_base=512, fmap_max=64,
)


def test_gen_name_map_matches_reference_patterns():
    """Pin the generated TF names against the reference pattern table
    (legacy.py:170-202), including the noise-buffer indices
    noise{2*log2(r)-5 / -4}."""
    _, v = _tiny_gen_variables()
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    names = {}
    for keypath, _ in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        name, kind = _tf_gen_name_for(path[1:])
        names[name] = kind
    for expected in [
        "mapping/Dense0/weight", "mapping/Dense1/bias", "synthesis/4x4/Const/const",
        "synthesis/4x4/Conv/weight", "synthesis/4x4/Conv/mod_weight",
        "synthesis/4x4/Conv/noise_strength", "synthesis/noise0",
        "synthesis/8x8/Conv0_up/weight", "synthesis/8x8/Conv1/weight",
        "synthesis/noise1", "synthesis/noise2",
        "synthesis/16x16/Conv0_up/mod_bias", "synthesis/noise3", "synthesis/noise4",
        "synthesis/32x32/ToRGB/weight", "synthesis/32x32/ToRGB/mod_weight",
        "synthesis/8x8/ToRGB/bias", "synthesis/noise5", "synthesis/noise6",
    ]:
        assert expected in names, (expected, sorted(names))
    assert names["synthesis/8x8/Conv0_up/weight"] == "flip"
    assert names["synthesis/8x8/Conv1/weight"] == "plain"
    assert names["synthesis/4x4/Conv/mod_bias"] == "bias+1"
    assert names["synthesis/4x4/Conv/mod_weight"] == "fcT"


def test_convert_tf_generator_roundtrip():
    gen, v = _tiny_gen_variables()
    stub, tf_vars = _tf_gen_stub(v, _TINY_GEN_KW)

    kwargs = generator_kwargs_from_tf(stub)
    assert kwargs["z_dim"] == 64 and kwargs["c_dim"] == 0
    assert kwargs["synthesis_kwargs"]["channel_base"] == 1024
    assert kwargs["mapping_kwargs"]["num_layers"] == 2

    out, w_avg = convert_tf_generator(stub, v)
    np.testing.assert_array_equal(w_avg, tf_vars["dlatent_avg"])
    p = out["params"]["synthesis"]
    # TF convs are already HWIO: plain copy for same-res convs...
    np.testing.assert_array_equal(
        np.asarray(p["b8"]["conv1"]["weight"]), tf_vars["synthesis/8x8/Conv1/weight"]
    )
    # ...spatially flipped for up-convs (TF stores the conv-transpose kernel)
    np.testing.assert_array_equal(
        np.asarray(p["b8"]["conv0"]["weight"]),
        tf_vars["synthesis/8x8/Conv0_up/weight"][::-1, ::-1],
    )
    # modulation affine: weight transposed, bias + 1
    np.testing.assert_array_equal(
        np.asarray(p["b4"]["conv1"]["affine"]["weight"]),
        tf_vars["synthesis/4x4/Conv/mod_weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(p["b4"]["conv1"]["affine"]["bias"]),
        tf_vars["synthesis/4x4/Conv/mod_bias"] + 1.0,
    )
    # const CHW -> HWC, noise buffers [1,1,H,W] -> [H,W]
    np.testing.assert_array_equal(
        np.asarray(p["b4"]["const"]),
        tf_vars["synthesis/4x4/Const/const"][0].transpose(1, 2, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(out["buffers"]["synthesis"]["b16"]["conv0"]["noise_const"]),
        tf_vars["synthesis/noise3"][0, 0],
    )
    # the converted tree drives our stock generator (const noise = TF buffers)
    img, w_raw = gen.apply(
        out, jnp.asarray(np.random.default_rng(2).normal(0, 1, (2, 64)), jnp.float32),
        None, noise_mode="const",
    )
    assert img.shape == (2, 32, 32, 3) and bool(jnp.all(jnp.isfinite(img)))
    assert w_raw.shape == (2, 64)
    # truncation toward the pickle's dlatent_avg
    img_t, _ = gen.apply(
        out, jnp.zeros((1, 64)), None,
        w_avg=jnp.asarray(w_avg), truncation_psi=0.5, noise_mode="const",
    )
    assert bool(jnp.all(jnp.isfinite(img_t)))

    # missing tensors are reported by TF name
    incomplete = TFNetworkStub(
        version=4, static_kwargs=_TINY_GEN_KW,
        variables=[kv for kv in stub.variables if kv[0] != "synthesis/8x8/Conv1/weight"],
        components={},
    )
    with pytest.raises(KeyError, match="synthesis/8x8/Conv1/weight"):
        convert_tf_generator(incomplete, v)

    # unknown kwargs rejected like the reference (legacy.py:148-152)
    with pytest.raises(ValueError, match="Unknown TensorFlow kwarg"):
        generator_kwargs_from_tf(
            TFNetworkStub(version=4, static_kwargs=dict(bogus=1), variables=[],
                          components={})
        )


def test_generator_stock_from_tf_end_to_end():
    """Full path: fabricated pickle bytes -> stubs -> (gen, vars, w_avg)."""
    _, v = _tiny_gen_variables()
    stub, _ = _tf_gen_stub(v, _TINY_GEN_KW)
    data = _fake_tf_pickle([
        dict(stub), dict(stub), dict(stub),  # (G, D, Gs) — Gs is the one used
    ])
    stubs = load_tf_network_stubs(io.BytesIO(data))
    assert stubs is not None
    gen, variables, w_avg = generator_stock_from_tf(stubs[2])
    assert gen.img_resolution == 32 and w_avg.shape == (64,)
    img, _ = gen.apply(
        variables, jnp.zeros((1, 64)), None, noise_mode="const"
    )
    assert img.shape == (1, 32, 32, 3) and bool(jnp.all(jnp.isfinite(img)))

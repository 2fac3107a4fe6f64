"""Legacy TensorFlow StyleGAN2 pickle conversion (reference `legacy.py`).

The reference's `load_network_pkl` detects 3-tuples of `dnnlib.tflib.network.
Network` stubs (TF StyleGAN2 / StyleGAN2-ADA exports) and converts them to
torch modules by variable-name pattern matching (`legacy.py:20-28,64-110,
207-287`).  This module provides the TPU-native equivalent:

* `_LegacyUnpickler` maps ONLY `dnnlib.tflib.network.Network` to a plain
  data stub — no TF (or any) code object is ever executed, matching the
  checkpoint-safety stance of `io/checkpoints.py`;
* `collect_tf_params` flattens the stub's variable tree (`legacy.py:76-86`);
* `convert_tf_discriminator` fills OUR `nn.discriminator.Discriminator`
  variables from the TF names (`legacy.py:207-287`).  TF stores conv
  weights [kh, kw, in, out] — exactly our HWIO layout, so unlike the torch
  conversion no conv transpose is needed; dense weights transpose
  [in, out] -> [out, in].

* `convert_tf_generator` fills `models.generator_stock.GeneratorStock`
  variables from the TF names (`legacy.py:109-204`).  The reference's own
  generator conversion is vestigial — it builds `networks.Generator`, whose
  blocks were rewritten for PASTA-GAN (const input replaced by a
  pose_feature argument, an extra merge_conv per skip block,
  `networks.py:368-371,391-392`), so its pattern table no longer covers the
  module; ours lands on the true stock architecture the TF pickles contain,
  which is also what the transfer-learning resume presets
  (`train_wo_flow_fullbody.py:319-325`) ship.
"""

from __future__ import annotations

import math
import pickle
from typing import Dict, Tuple

import numpy as np


class TFNetworkStub(dict):
    """Stand-in for dnnlib.tflib.network.Network: a dict of the pickled
    attributes (version, static_kwargs, variables, components, ...)."""

    def __setstate__(self, state):
        self.update(state)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


# Globals a legacy TF StyleGAN2 pickle legitimately references: the Network
# class, numpy array reconstruction, and basic containers.  Anything else
# (torch tensor rebuilds, arbitrary callables) raises — this keeps the
# "no code execution" guarantee real, and makes the TF-format detection in
# io/torch_import.py abort early on torch pickles instead of deserializing
# them twice.
_SAFE_GLOBALS = {
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("collections", "OrderedDict"),
    ("builtins", "set"),
    ("builtins", "frozenset"),
    # our own stub (round-trips through re-pickled conversions/tests)
    ("pasta_gan_tpu.io.tf_legacy", "TFNetworkStub"),
}


class _LegacyUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "dnnlib.tflib.network" and name == "Network":
            return TFNetworkStub
        if (module, name) in _SAFE_GLOBALS:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"{module}.{name} is not allowed in a legacy TF pickle "
            "(only numpy arrays and plain containers are)"
        )


def load_tf_network_stubs(f):
    """Unpickle a legacy TF pickle; returns (G, D, Gs) stubs or None if the
    payload is not a legacy TF 3-tuple (reference `legacy.py:23-24`).
    Non-TF payloads referencing disallowed globals (e.g. torch pickles)
    also return None — the restricted unpickler aborts them early."""
    try:
        data = _LegacyUnpickler(f).load()
    except (pickle.UnpicklingError, AttributeError, ImportError):
        return None
    if (
        isinstance(data, tuple)
        and len(data) == 3
        and all(isinstance(net, TFNetworkStub) for net in data)
    ):
        return data
    return None


def collect_tf_params(tf_net: TFNetworkStub) -> Dict[str, np.ndarray]:
    """Flatten variables of a stub and its components (`legacy.py:76-86`)."""
    tf_params: Dict[str, np.ndarray] = {}

    def recurse(prefix, net):
        for name, value in net.variables:
            tf_params[prefix + name] = np.asarray(value)
        for name, comp in dict(net.get("components", {})).items():
            recurse(prefix + name + "/", comp)

    recurse("", tf_net)
    return tf_params


def discriminator_kwargs_from_tf(tf_D: TFNetworkStub) -> dict:
    """TF static_kwargs -> our Discriminator constructor kwargs
    (`legacy.py:211-247`)."""
    if tf_D.version < 4:
        raise ValueError("TensorFlow pickle version too low")
    kw = dict(tf_D.static_kwargs)
    mapped = dict(
        c_dim=kw.get("label_size", 0),
        img_resolution=kw.get("resolution", 1024),
        img_channels=kw.get("num_channels", 3),
        architecture=kw.get("architecture", "resnet"),
        channel_base=kw.get("fmap_base", 16384) * 2,
        channel_max=kw.get("fmap_max", 512),
        conv_clamp=kw.get("conv_clamp", None),
        cmap_dim=kw.get("mapping_fmaps", None),
        activation=kw.get("nonlinearity", "lrelu"),
        mbstd_group_size=kw.get("mbstd_group_size", None),
        mbstd_num_channels=kw.get("mbstd_num_features", 1),
    )
    known = {
        "label_size", "resolution", "num_channels", "architecture",
        "fmap_base", "fmap_max", "num_fp16_res", "conv_clamp",
        "mapping_fmaps", "nonlinearity", "resample_kernel", "freeze_layers",
        "mapping_layers", "mapping_lrmul", "mbstd_group_size",
        "mbstd_num_features", "structure",
    }
    unknown = set(kw) - known
    if unknown:
        raise ValueError(f"Unknown TensorFlow kwarg {sorted(unknown)[0]}")
    return mapped


def _tf_name_for(path: Tuple[str, ...], img_resolution: int):
    """Our Discriminator param path -> (TF variable name, transpose?).

    Mirrors the reference pattern table (`legacy.py:266-285`), inverted to
    walk our tree; conv weights keep TF's HWIO layout."""
    mod, leaf = path[:-1], path[-1]
    m0 = mod[0]
    if m0.startswith("b") and m0 != "b4":
        r = int(m0[1:])
        sub = mod[1]
        if sub == "fromrgb":
            return f"{r}x{r}/FromRGB/{leaf}", False
        if sub in ("conv0", "conv1"):
            i = int(sub[-1])
            return f"{r}x{r}/Conv{i}{['', '_down'][i]}/{leaf}", False
        if sub == "skip":
            return f"{r}x{r}/Skip/{leaf}", False
    if m0 == "b4":
        sub = mod[1]
        if sub == "fromrgb":
            return f"4x4/FromRGB/{leaf}", False
        if sub == "conv":
            return f"4x4/Conv/{leaf}", False
        if sub == "fc":
            return f"4x4/Dense0/{leaf}", leaf == "weight"
        if sub == "out":
            return f"Output/{leaf}", leaf == "weight"
    if m0 == "mapping":
        sub = mod[1]
        if sub == "embed":
            return f"LabelEmbed/{leaf}", leaf == "weight"
        if sub.startswith("fc"):
            return f"Mapping{sub[2:]}/{leaf}", leaf == "weight"
    raise KeyError(f"no TF mapping for our param path {path}")


def convert_tf_discriminator(tf_D: TFNetworkStub, variables) -> dict:
    """Fill OUR Discriminator `variables` from a TF stub.  Returns a new
    variables dict; raises on missing or shape-incompatible tensors."""
    import jax

    kwargs = discriminator_kwargs_from_tf(tf_D)
    tf_params = collect_tf_params(tf_D)
    # progressive-growing exports name the top FromRGB by lod (`legacy.py:256-261`)
    import re

    for name, value in list(tf_params.items()):
        match = re.fullmatch(r"FromRGB_lod(\d+)/(.*)", name)
        if match:
            r = kwargs["img_resolution"] // (2 ** int(match.group(1)))
            tf_params[f"{r}x{r}/FromRGB/{match.group(2)}"] = value

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    new_leaves = []
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        assert path[0] == "params", path
        tf_name, transpose = _tf_name_for(path[1:], kwargs["img_resolution"])
        if tf_name not in tf_params:
            raise KeyError(f"TF pickle is missing {tf_name} (for {path})")
        value = np.asarray(tf_params[tf_name], np.float32)
        if transpose:
            value = value.T
        if value.shape != leaf.shape:
            raise ValueError(
                f"{tf_name}: TF shape {value.shape} != ours {leaf.shape} at {path}"
            )
        new_leaves.append(value.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def generator_kwargs_from_tf(tf_G: TFNetworkStub) -> dict:
    """TF static_kwargs -> our GeneratorStock constructor kwargs
    (`legacy.py:116-155`).  Raises on unknown kwargs like the reference."""
    if tf_G.version < 4:
        raise ValueError("TensorFlow pickle version too low")
    kw = dict(tf_G.static_kwargs)

    def get(name, default=None, none=None):
        val = kw.get(name, default)
        return val if val is not None else none

    mapped = dict(
        z_dim=get("latent_size", 0),
        c_dim=get("label_size", 512),
        w_dim=get("dlatent_size", 512),
        img_resolution=get("resolution", 1024),
        img_channels=get("num_channels", 3),
        mapping_kwargs=dict(
            num_layers=get("mapping_layers", 8),
            embed_features=get("label_fmaps", None),
            layer_features=get("mapping_fmaps", None),
            activation=get("mapping_nonlinearity", "lrelu"),
            lr_multiplier=get("mapping_lrmul", 0.01),
            w_avg_beta=get("w_avg_beta", 0.995, none=1),
        ),
        synthesis_kwargs=dict(
            channel_base=get("fmap_base", 16384) * 2,
            channel_max=get("fmap_max", 512),
            num_fp16_res=get("num_fp16_res", 0),
            conv_clamp=get("conv_clamp", None),
            architecture=get("architecture", "skip"),
            resample_filter=tuple(get("resample_kernel", (1, 3, 3, 1))),
            use_noise=get("use_noise", True),
            activation=get("nonlinearity", "lrelu"),
        ),
    )
    known = {
        "latent_size", "label_size", "dlatent_size", "resolution",
        "num_channels", "mapping_layers", "label_fmaps", "mapping_fmaps",
        "mapping_nonlinearity", "mapping_lrmul", "w_avg_beta", "fmap_base",
        "fmap_max", "num_fp16_res", "conv_clamp", "architecture",
        "resample_kernel", "use_noise", "nonlinearity",
        # consumed-and-ignored, as in the reference (`legacy.py:148-152`)
        "truncation_psi", "truncation_cutoff", "style_mixing_prob", "structure",
    }
    unknown = set(kw) - known
    if unknown:
        raise ValueError(f"Unknown TensorFlow kwarg {sorted(unknown)[0]}")
    return mapped


def _tf_gen_name_for(path: Tuple[str, ...]):
    """Our GeneratorStock variable path -> (TF name, kind).

    kind: how the TF tensor maps onto our layout —
      "plain"   copy (TF convs are [kh,kw,in,out] == our HWIO);
      "flip"    spatial flip (up-convs: TF stores the conv-transpose kernel,
                `legacy.py:181,199`);
      "fcT"     dense transpose ([in,out] -> our eq-lr [out,in]);
      "bias+1"  modulation bias (TF init 0, ours 1, `legacy.py:180` etc.);
      "const"   [1,C,4,4] -> [4,4,C];
      "noise"   [1,1,H,W] -> [H,W].
    """
    mod, leaf = path[:-1], path[-1]
    comp = mod[0]
    if comp == "mapping":
        sub = mod[1]
        if sub == "embed":
            return f"mapping/LabelEmbed/{leaf}", "fcT" if leaf == "weight" else "plain"
        if sub.startswith("fc"):
            return (
                f"mapping/Dense{sub[2:]}/{leaf}",
                "fcT" if leaf == "weight" else "plain",
            )
    if comp == "synthesis":
        r = int(mod[1][1:])  # "b{r}"
        if leaf == "const":
            return f"synthesis/{r}x{r}/Const/const", "const"
        sub = mod[2]
        lod = int(math.log2(r))
        tf_layer = {
            "conv0": "Conv0_up",
            "conv1": "Conv" if r == 4 else "Conv1",
            "torgb": "ToRGB",
            "skip": "Skip",
        }[sub]
        if leaf == "noise_const":
            k = 0 if r == 4 else (2 * lod - 5 if sub == "conv0" else 2 * lod - 4)
            return f"synthesis/noise{k}", "noise"
        if len(mod) > 3 and mod[3] == "affine":
            tf_leaf = {"weight": "mod_weight", "bias": "mod_bias"}[leaf]
            kind = "fcT" if leaf == "weight" else "bias+1"
            return f"synthesis/{r}x{r}/{tf_layer}/{tf_leaf}", kind
        kind = "plain"
        if leaf == "weight" and sub in ("conv0", "skip"):
            kind = "flip"  # up-convs store the transposed-conv kernel
        return f"synthesis/{r}x{r}/{tf_layer}/{leaf}", kind
    raise KeyError(f"no TF mapping for our variable path {path}")


def convert_tf_generator(tf_G: TFNetworkStub, variables) -> Tuple[dict, np.ndarray]:
    """Fill OUR GeneratorStock `variables` (params + noise_const buffers) from
    a TF stub.  Returns (new_variables, w_avg); `w_avg` is the pickle's
    `dlatent_avg` — in this framework it is a train-state leaf, not a module
    buffer (see nn/mapping.py), so it travels separately.  Raises on missing
    or shape-incompatible tensors.  `variables` must have been init'd with
    noise_mode="const" so the noise buffers exist (see
    generator_stock_from_tf for the one-call path)."""
    import jax

    tf_params = collect_tf_params(tf_G)
    # progressive-growing exports name the top ToRGB by lod (`legacy.py:160-165`)
    import re

    img_resolution = generator_kwargs_from_tf(tf_G)["img_resolution"]
    for name, value in list(tf_params.items()):
        match = re.fullmatch(r"ToRGB_lod(\d+)/(.*)", name)
        if match:
            r = img_resolution // (2 ** int(match.group(1)))
            tf_params[f"synthesis/{r}x{r}/ToRGB/{match.group(2)}"] = value

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    new_leaves = []
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        assert path[0] in ("params", "buffers"), path
        tf_name, kind = _tf_gen_name_for(path[1:])
        if tf_name not in tf_params:
            raise KeyError(f"TF pickle is missing {tf_name} (for {path})")
        value = np.asarray(tf_params[tf_name], np.float32)
        if kind == "fcT":
            value = value.T
        elif kind == "flip":
            value = value[::-1, ::-1]
        elif kind == "bias+1":
            value = value + 1.0
        elif kind == "const":
            value = value[0].transpose(1, 2, 0)
        elif kind == "noise":
            value = value[0, 0]
        if value.shape != leaf.shape:
            raise ValueError(
                f"{tf_name}: TF shape {value.shape} != ours {leaf.shape} at {path}"
            )
        # NOT ascontiguousarray — it promotes 0-d scalars (noise_strength) to 1-d
        new_leaves.append(np.array(value, dtype=leaf.dtype))
    w_avg = np.asarray(tf_params["dlatent_avg"], np.float32)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), w_avg


def generator_stock_from_tf(tf_G: TFNetworkStub):
    """One-call conversion: TF stub -> (GeneratorStock, variables, w_avg)."""
    import jax
    import jax.numpy as jnp

    from ..models.generator_stock import GeneratorStock

    kwargs = generator_kwargs_from_tf(tf_G)
    # progressive-growing lod-suffixed ToRGBs imply 'orig' (`legacy.py:164-165`)
    if any(name.startswith("ToRGB_lod") for name in collect_tf_params(tf_G)):
        kwargs["synthesis_kwargs"]["architecture"] = "orig"
    gen = GeneratorStock(**kwargs)
    z = jnp.zeros((1, kwargs["z_dim"]), jnp.float32) if kwargs["z_dim"] else None
    c = jnp.zeros((1, kwargs["c_dim"]), jnp.float32) if kwargs["c_dim"] else None
    # shapes only — no need to run the init math just to overwrite every leaf
    variables = jax.eval_shape(
        lambda: gen.init(jax.random.PRNGKey(0), z, c, noise_mode="const")
    )
    new_vars, w_avg = convert_tf_generator(tf_G, variables)
    return gen, new_vars, w_avg

"""Reference-checkpoint converter: PyTorch state_dict -> flax params pytree.

Counterpart of `legacy.py` (`load_network_pkl`, `legacy.py:20-60`).  The
reference pickles entire source modules via `@persistent_class`
(`torch_utils/persistence.py:35-130`); we never execute stored source —
`state_dict_from_reference_pickle` extracts `named_params_and_buffers` as
plain arrays (SURVEY.md section 7 hard-part #2), and
`convert_generator_full` maps them onto our GeneratorFull parameter tree:

layout translations
  conv weight   OIHW  -> HWIO      (transpose 2,3,1,0)
  torch Linear  [out,in] -> flax Dense kernel [in,out]  (transpose)
  eq-lr FC      [out,in] -> ours [out,in]               (copy)
  const         [C,H,W] -> [H,W,C]

name translations (ours -> reference) are explicit in `_ref_key`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def state_dict_from_reference_pickle(path: str, key: str = "G_ema") -> Dict[str, np.ndarray]:
    """Extract {name: array} for one network (default G_ema) from a reference
    network-snapshot .pkl; returns {} if `key` is absent from the snapshot.

    Loads with torch's unpickler (required: tensors), then immediately
    flattens to numpy — the persistence-reconstructed module is only walked
    for named_parameters/buffers, never run.
    """
    import io
    import pickle

    import torch

    # legacy TF exports are a different format entirely (reference
    # legacy.py:23-28) — detect and route to io/tf_legacy
    with open(path, "rb") as f:
        from .tf_legacy import load_tf_network_stubs

        try:
            stubs = load_tf_network_stubs(f)
        except Exception:
            stubs = None
    if stubs is not None:
        raise ValueError(
            f"{path} is a legacy TensorFlow StyleGAN2 pickle; use "
            "io.tf_legacy.generator_stock_from_tf / convert_tf_discriminator"
        )

    with open(path, "rb") as f:
        data = pickle.load(f)  # needs the reference's persistence import hooks
    g = data.get(key) if isinstance(data, dict) else data
    if g is None:
        return {}
    out = {}
    for name, t in list(g.named_parameters()) + list(g.named_buffers()):
        out[name] = t.detach().cpu().numpy()
    return out


def _ref_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Map our param path -> (reference state_dict key, kind).

    kind in {conv, fc, dense, bias, scalar, const, noise}.
    """
    import re

    def generic(seg: str) -> str:
        """container_N -> container.N (Sequential children: model_3,
        spade_encoder_1, feat_enc_0, spade_affine_0, ...)."""
        m = re.match(
            r"(model|spade_encoder|feat_enc|spade_affine|mask_conv|merge_conv|shortcut)_(\d+)$",
            seg,
        )
        return f"{m.group(1)}.{m.group(2)}" if m else seg

    parts = list(path)
    leaf = parts[-1]
    mods = [generic(p) for p in parts[:-1]]

    def join(names):
        return ".".join(names)

    # ---------- top-level component translation
    comp = mods[0]
    rest = mods[1:]

    if comp.startswith("synthesis_") and comp != "synthesis_":  # V10/V11 flat block names
        ref = ["synthesis", comp[len("synthesis_"):]] + rest
    elif comp == "mapping":
        ref = ["mapping"] + rest
    elif comp == "const_encoding":
        name_map = {"stem": "model.0"}
        name_map.update({f"down{i}": f"model.{i + 1}" for i in range(6)})
        ref = ["const_encoding", name_map[rest[0]]] + rest[1:]
    elif comp == "style_encoding":
        if "." in rest[0]:  # V10-style flat Sequential names, already translated
            ref = ["style_encoding"] + rest
        elif rest[0] == "feat_enc":
            name_map = {"conv0": "feat_enc.0"}
            name_map.update({f"down{i}": f"feat_enc.{i + 1}" for i in range(3)})
            ref = ["style_encoding", name_map[rest[1]]] + rest[2:]
        elif rest[0] == "fc":
            ref = ["style_encoding", "fc"] + rest[1:]
        else:
            name_map = {"stem": "model.0"}
            for i in range(6):
                name_map[f"dense{i}"] = f"model.{2 * i + 1}"
            for i in range(3):
                name_map[f"down{i}"] = f"model.{2 * i + 2}"
            for i in range(3, 6):
                name_map[f"conv{i}"] = f"model.{2 * i + 2}"
            mapped = name_map[rest[0]]
            tail = rest[1:]
            if tail and tail[0] == "linear":
                mapped += ".linear"
                tail = tail[1:]
            ref = ["style_encoding", mapped] + tail
    elif comp == "synthesis":
        sub = rest[0]
        if sub == "spade_encoder":
            name_map = {f"layers_{i}": str(i) for i in range(3)}
            ref = ["synthesis", "spade_encoder", name_map[rest[1]]] + rest[2:]
        else:
            ref = ["synthesis"] + rest
    else:
        ref = mods

    # ---------- leaf translation
    if leaf == "kernel":  # flax Dense
        return join(ref) + ".weight", "dense"
    if leaf == "weight":
        return join(ref) + ".weight", "param"
    if leaf in ("bias", "noise_strength", "m_bias1"):
        return join(ref) + f".{leaf}", "param"
    if leaf == "m_weight1":
        return join(ref) + ".m_weight1", "param"
    if leaf == "const":
        return join(ref) + ".const", "const"
    if leaf == "noise_const":
        return join(ref) + ".noise_const", "param"
    if leaf == "gamma":  # attention gate
        return join(ref) + ".gamma", "param"
    return join(ref) + f".{leaf}", "param"


def convert_generator_full(state_dict: Dict[str, np.ndarray], variables) -> dict:
    """Fill our GeneratorFull `variables` (params [+ buffers]) from a reference
    state_dict.  Returns a new variables dict; raises on any missing or
    shape-incompatible tensor."""
    import jax
    import jax.numpy as jnp

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    new_leaves = []
    missing = []
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        collection, *mod_path = path
        ref_key, kind = _ref_key(tuple(mod_path))
        if ref_key not in state_dict:
            missing.append((".".join(path), ref_key))
            new_leaves.append(leaf)
            continue
        src = np.asarray(state_dict[ref_key], np.float32)
        tgt_shape = tuple(leaf.shape)
        if src.ndim == 4 and len(tgt_shape) == 4:  # conv OIHW -> HWIO
            src = src.transpose(2, 3, 1, 0)
        elif kind == "dense" and src.ndim == 2:
            # torch Linear [out,in] -> flax Dense kernel [in,out]; NOTE: kind,
            # not shape, decides — square matrices are ambiguous by shape.
            src = src.T
        elif src.ndim == 3 and len(tgt_shape) == 3:  # const CHW -> HWC
            src = src.transpose(1, 2, 0)
        if src.shape != tgt_shape:
            raise ValueError(
                f"shape mismatch for {'.'.join(path)} <- {ref_key}: {src.shape} vs {tgt_shape}"
            )
        new_leaves.append(jnp.asarray(src))
    if missing:
        details = "\n".join(f"  {ours} <- {ref}" for ours, ref in missing[:20])
        raise KeyError(f"{len(missing)} tensors not found in the state_dict:\n{details}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)

"""Transfer-learning resume from a network pickle.

Reference behavior (`training/training_loop_wo_flow_fullbody.py:280-285`):
`--resume <pickle>` loads a snapshot and copies tensors into the freshly
constructed G / D / G_ema by NAME with `require_all=False`
(`torch_utils/misc.py copy_params_and_buffers`) — anything whose name and
shape match transfers, everything else keeps its fresh init.  The resume
presets (`train_wo_flow_fullbody.py:319-325`) point at stock StyleGAN2-ADA
checkpoints (ffhq256, ...), i.e. legacy TF pickles converted on the fly by
`legacy.py`.

The TPU-native equivalent: convert the pickle into OUR variable trees
(io/tf_legacy.py for legacy TF exports, io/torch_import.py for reference
torch snapshots), then merge leaves into the train state wherever the
variable path and shape agree.  Name-matching is architecture-aware for
free because both trees use the same module names (mapping/fc{i},
synthesis/b{res}/conv0|conv1|torgb/...).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _flatten(tree) -> Dict[Tuple[str, ...], Any]:
    import jax

    out = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        out[path] = leaf
    return out


def copy_matching_leaves(dst_tree, src_tree) -> Tuple[Any, List[str], List[str]]:
    """require_all=False copy: every dst leaf whose path exists in src with
    the same shape takes src's value; others keep dst's.  Returns
    (merged, copied_paths, shape_mismatch_paths)."""
    import jax

    src = _flatten(src_tree)
    copied, mismatched = [], []

    def merge(keypath, leaf):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        if path not in src:
            return leaf
        s = src[path]
        if tuple(np.shape(s)) != tuple(np.shape(leaf)):
            mismatched.append(".".join(path))
            return leaf
        copied.append(".".join(path))
        return np.asarray(s, dtype=leaf.dtype)

    merged = jax.tree_util.tree_map_with_path(merge, dst_tree)
    return merged, copied, mismatched


def _tf_source_trees(path: str):
    """Legacy TF pickle -> (G_ema variables, D variables, w_avg) in OUR tree
    shapes, or None if the file is not a legacy TF export."""
    import jax
    import jax.numpy as jnp

    from .tf_legacy import (
        convert_tf_discriminator,
        discriminator_kwargs_from_tf,
        generator_stock_from_tf,
        load_tf_network_stubs,
    )

    with open(path, "rb") as f:
        stubs = load_tf_network_stubs(f)
    if stubs is None:
        return None
    _G, tf_D, tf_Gs = stubs
    _gen, g_vars, w_avg = generator_stock_from_tf(tf_Gs)

    from ..nn.discriminator import Discriminator

    d_kwargs = discriminator_kwargs_from_tf(tf_D)
    d_kwargs = {
        k: v
        for k, v in d_kwargs.items()
        if k
        in (
            "c_dim", "img_resolution", "img_channels", "architecture",
            "channel_base", "channel_max", "conv_clamp", "cmap_dim",
            "mbstd_group_size", "mbstd_num_channels",
        )
    }
    disc = Discriminator(**d_kwargs)
    d_template = jax.eval_shape(
        lambda: disc.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, d_kwargs["img_resolution"], d_kwargs["img_resolution"],
                       d_kwargs["img_channels"]), jnp.float32),
            jnp.zeros((1, d_kwargs["c_dim"]), jnp.float32)
            if d_kwargs["c_dim"]
            else None,
        )
    )
    d_vars = convert_tf_discriminator(tf_D, d_template)
    return g_vars, d_vars, w_avg


def transfer_from_network_pickle(state, path: str, verbose: bool = True):
    """Partial-copy a network pickle into a fresh TrainState
    (`training_loop...py:280-285`).  G_ema params land in BOTH g_params and
    g_ema_params (the reference resumes G from the snapshot's G and G_ema
    from G_ema; TF exports ship Gs == G_ema as the usable network).  Returns
    the updated state."""
    src = _tf_source_trees(path)
    if src is not None:
        g_src, d_src, w_avg = src
    else:
        # reference torch snapshot: extract each network's tensors and map
        # the name+shape matches onto our trees (partial by construction)
        from .torch_import import state_dict_from_reference_pickle

        # state.g_params / d_params are full variables dicts ({"params": ...,
        # ["buffers": ...]}), exactly the tree shapes the converters emit
        g_sd = state_dict_from_reference_pickle(path, key="G_ema")
        g_src = convert_reference_partial(g_sd, state.g_params)
        d_sd = state_dict_from_reference_pickle(path, key="D")
        d_src = convert_reference_partial(d_sd, state.d_params) if d_sd else None
        w_avg = g_sd.get("mapping.w_avg")

    new_g, g_copied, g_mismatch = copy_matching_leaves(state.g_params, g_src)
    new_ema, _, _ = copy_matching_leaves(state.g_ema_params, g_src)
    if d_src is not None:
        new_d, d_copied, d_mismatch = copy_matching_leaves(state.d_params, d_src)
    else:
        new_d, d_copied, d_mismatch = state.d_params, [], []

    updates = dict(g_params=new_g, g_ema_params=new_ema, d_params=new_d)
    if w_avg is not None and tuple(np.shape(w_avg)) == tuple(np.shape(state.w_avg)):
        import jax.numpy as jnp

        updates["w_avg"] = jnp.asarray(np.asarray(w_avg, np.float32))
    if verbose:
        print(
            f'Transferred from "{path}": G {len(g_copied)} leaves '
            f"({len(g_mismatch)} shape-skipped), D {len(d_copied)} leaves "
            f"({len(d_mismatch)} shape-skipped)"
        )
    return state.replace(**updates)


def convert_reference_partial(state_dict, variables) -> dict:
    """Reference torch state_dict -> nested dict holding ONLY the leaves of
    `variables` whose translated name exists in the state_dict with a
    compatible shape (layout rules of io/torch_import.py:convert_generator_full,
    minus the raise-on-missing: this is the require_all=False path)."""
    from .torch_import import _ref_key

    nested: dict = {}
    for path, leaf in _flatten(variables).items():
        try:
            ref_key, kind = _ref_key(tuple(path[1:]))
        except (KeyError, IndexError):
            continue
        if ref_key not in state_dict:
            continue
        src = np.asarray(state_dict[ref_key], np.float32)
        tgt_shape = tuple(np.shape(leaf))
        if src.ndim == 4 and len(tgt_shape) == 4:  # conv OIHW -> HWIO
            src = src.transpose(2, 3, 1, 0)
        elif kind == "dense" and src.ndim == 2:
            src = src.T
        elif src.ndim == 3 and len(tgt_shape) == 3:  # const CHW -> HWC
            src = src.transpose(1, 2, 0)
        if tuple(src.shape) != tgt_shape:
            continue
        node = nested
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = src
    return nested

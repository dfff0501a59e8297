"""Checkpoint save/load + PyTorch-reference checkpoint conversion.

Native format: a single `.npz` with '/'-flattened pytree keys (lists become
integer components) — one rolling `checkpoint.npz` per run, written at every
validation, mirroring the reference's single `checkpoint.pth.tar`
(vanilla_nerf_trainer.py:184-193, human_nerf_trainer.py:519-526). Contents:

- bkg stage:   {epoch, iteration, optim_state, coarse_model, fine_model}
- human stage: {epoch, iteration, optim_state, hybrid_model}

`convert_torch_state_dict` maps the reference's torch state dicts onto our
param pytrees: `nerf.pts_linears.{i}.weight` -> params['pts_linears'][i]['w']
(transposed — torch Linear stores [out, in], we store [in, out]), handling
the `module.` DataParallel prefix and the hybrid model's nested net names.
Tolerant loading follows utils.py:225-254 (`safe_load_weights`): exact ->
prefix-stripped -> shape-filtered partial.
"""

import os
import re

import numpy as np
import jax.numpy as jnp


def flatten_tree(tree, prefix=""):
    """Nested dict/list pytree -> {'a/b/0/w': array} flat dict."""
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
        return out
    for k, v in items:
        out.update(flatten_tree(v, f"{prefix}{k}/"))
    return out


def unflatten_tree(flat):
    """Inverse of flatten_tree. Integer path components become lists."""
    root = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path, tree):
    """Atomically write a pytree checkpoint."""
    flat = flatten_tree(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"  # .npz suffix so np.savez does not append one
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path):
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_tree(flat)


def restore_like(target, loaded):
    """Restore `loaded` (dict/list pytree from load_checkpoint) into the
    exact container structure of `target` (which may contain namedtuples,
    e.g. optax states). Relies on matching leaf order: jax flattens dicts in
    sorted-key order on both sides and our save format preserves list order
    and namedtuple field order (alphabetical == declaration order for optax
    Adam states)."""
    import jax

    leaves_t, treedef = jax.tree_util.tree_flatten(target)
    leaves_l = jax.tree_util.tree_leaves(loaded)
    assert len(leaves_t) == len(leaves_l), (len(leaves_t), len(leaves_l))
    for t, l in zip(leaves_t, leaves_l):
        assert jnp.shape(t) == np.shape(l), (jnp.shape(t), np.shape(l))
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves_l]
    )


# ---------------------------------------------------------------------------
# torch reference checkpoint conversion
# ---------------------------------------------------------------------------


def _strip_module(state_dict):
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def convert_torch_linear(params_out, torch_sd, torch_prefix, our_path):
    w = torch_sd.get(f"{torch_prefix}.weight")
    b = torch_sd.get(f"{torch_prefix}.bias")
    if w is None:
        return False
    node = params_out
    for p in our_path[:-1]:
        node = node[p]
    node[our_path[-1]] = {
        "w": jnp.asarray(np.asarray(w).T),
        "b": jnp.asarray(np.asarray(b)),
    }
    return True


def convert_joiner_state_dict(torch_sd, depth=8, use_viewdirs=True, prefix="nerf"):
    """Reference Joiner (Embedder+NeRF) state dict -> our param pytree."""
    torch_sd = _strip_module(torch_sd)
    params = {"pts_linears": [None] * depth}
    for i in range(depth):
        ok = convert_torch_linear(
            params, torch_sd, f"{prefix}.pts_linears.{i}", ("pts_linears", i)
        )
        assert ok, f"missing {prefix}.pts_linears.{i}"
    if use_viewdirs:
        params["views_linears"] = [None]
        convert_torch_linear(
            params, torch_sd, f"{prefix}.views_linears.0", ("views_linears", 0)
        )
        for name in ("feature_linear", "alpha_linear", "rgb_linear"):
            convert_torch_linear(params, torch_sd, f"{prefix}.{name}", (name,))
    else:
        convert_torch_linear(params, torch_sd, f"{prefix}.output_linear", ("output_linear",))
    return params


def convert_hybrid_state_dict(torch_sd, num_offset_nets=1, depth=8,
                              specular_can=True):
    """Reference `hybrid_model_state_dict` -> our HumanNeRF param pytree."""
    torch_sd = _strip_module(torch_sd)

    def sub(prefix):
        plen = len(prefix) + 1
        return {k[plen:]: v for k, v in torch_sd.items() if k.startswith(prefix + ".")}

    params = {
        "coarse_bkg_net": convert_joiner_state_dict(
            sub("coarse_bkg_net"), depth=depth, use_viewdirs=True
        ),
        "fine_bkg_net": convert_joiner_state_dict(
            sub("fine_bkg_net"), depth=depth, use_viewdirs=True
        ),
        "coarse_human_net": convert_joiner_state_dict(
            sub("coarse_human_net"), depth=depth, use_viewdirs=specular_can
        ),
        "offset_nets": [
            convert_joiner_state_dict(
                sub(f"offset_nets.{i}"), depth=depth, use_viewdirs=False
            )
            for i in range(num_offset_nets)
        ],
    }
    for name in ("poses", "betas", "alignments"):
        if name in torch_sd:
            params[name] = jnp.asarray(np.asarray(torch_sd[name]))
    return params


def safe_merge_params(target, loaded):
    """Shape-tolerant merge (parity with safe_load_weights fallbacks).

    Returns (merged, missing_keys): leaves of `target` replaced by same-path
    same-shape leaves of `loaded`.
    """
    missing = []

    def merge(t, l, path):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                if isinstance(l, dict) and k in l:
                    out[k] = merge(v, l[k], path + (k,))
                else:
                    missing.append("/".join(map(str, path + (k,))))
                    out[k] = v
            return out
        if isinstance(t, (list, tuple)):
            out = []
            for i, v in enumerate(t):
                if isinstance(l, (list, tuple)) and i < len(l):
                    out.append(merge(v, l[i], path + (i,)))
                else:
                    missing.append("/".join(map(str, path + (i,))))
                    out.append(v)
            return out
        arr = jnp.asarray(l) if l is not None else None
        if arr is not None and arr.shape == jnp.shape(t):
            return arr
        missing.append("/".join(map(str, path)))
        return t

    return merge(target, loaded, ()), missing

"""Pretrained-encoder initialization for the training drivers.

The reference constructs every model FROM pretrained weights —
ResNet-101 IMAGENET1K_V2 / the local VGGFace checkpoint
(`/root/reference/AlexCap/LSTMModel.py:18-27`), VGG16 IMAGENET1K_V1
(`/root/reference/DenseCap/densecap/net_utils.py:8-13`), ViT-B/16
(`/root/reference/AlexCap/VitbModel.py:156-166`) — and all of its
published quality numbers depend on that. The TPU-side hook is the
config field ``encoder_init``: one or more converted ``.npz`` files
(produced by ``convert_checkpoint.py import``) merged into a freshly
initialized train state, with the merge asserting an EXACT structural
match (same leaves, same shapes) over the target module subtree so a
wrong or partial checkpoint fails loudly instead of training silently
from garbage.

Spec syntax (the ``encoder_init`` config value):

    "r101_flax.npz"                      # default module for the family
    "features=vgg_feat.npz,classifier=vgg_cls.npz"   # explicit modules

Default module per family: ``features`` (CNN captioners, GT dense),
``encoder_vit`` (ViT-B), ``conv_trunk`` (RPN dense).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np


def flatten_tree(tree: Mapping, prefix: str = "",
                 sep: str = "/") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, key, sep))
        else:
            out[key] = v
    return out


def unflatten_tree(flat: Mapping[str, Any], sep: str = "/") -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_npz_variables(path: str) -> Dict:
    """A convert_checkpoint.py `.npz` → nested variables tree, e.g.
    {'params': {...}} or {'params': {...}, 'batch_stats': {...}}."""
    with np.load(path) as z:
        return unflatten_tree({k: z[k] for k in z.files})


def parse_spec(spec: str, default_module: str) -> List[Tuple[str, str]]:
    """'path' | 'mod=path[,mod2=path2...]' → [(module, path), ...]."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            mod, path = part.split("=", 1)
        else:
            mod, path = default_module, part
        out.append((mod.strip(), path.strip()))
    if not out:
        raise ValueError(f"empty encoder_init spec: {spec!r}")
    return out


def _check_exact_match(tgt: Mapping, src: Mapping, what: str) -> None:
    missing = sorted(set(tgt) - set(src))
    extra = sorted(set(src) - set(tgt))
    if missing or extra:
        raise ValueError(
            f"encoder_init {what}: checkpoint does not cover the module "
            f"exactly; missing from checkpoint: {missing[:8]}"
            f"{'...' if len(missing) > 8 else ''}; "
            f"unexpected in checkpoint: {extra[:8]}"
            f"{'...' if len(extra) > 8 else ''}")
    for k in tgt:
        ts, ss = tuple(np.shape(tgt[k])), tuple(np.shape(src[k]))
        if ts != ss:
            raise ValueError(
                f"encoder_init {what}: shape mismatch at {k}: "
                f"model {ts} vs checkpoint {ss}")


def _merged_subtree(tgt_sub: Mapping, src_sub: Mapping, what: str):
    """Replace tgt_sub leaves with checkpoint values, preserving each
    leaf's dtype and device/sharding placement."""
    import jax

    from jax.sharding import NamedSharding

    tgt, src = flatten_tree(tgt_sub), flatten_tree(src_sub)
    _check_exact_match(tgt, src, what)
    out = {}
    for k, leaf in tgt.items():
        val = np.asarray(src[k], dtype=np.asarray(leaf).dtype
                         if not hasattr(leaf, "dtype") else leaf.dtype)
        sharding = getattr(leaf, "sharding", None)
        # Preserve an explicit mesh placement; otherwise hand back host
        # arrays UNCOMMITTED so jit is free to place them (a committed
        # single-device leaf would conflict with mesh-sharded inputs).
        out[k] = (jax.device_put(val, sharding)
                  if isinstance(sharding, NamedSharding) else val)
    return unflatten_tree(out)


def merge_module(params: Mapping, batch_stats: Optional[Mapping],
                 module: str, variables: Mapping):
    """Merge a converted backbone `variables` tree into `params[module]`
    (and `batch_stats[module]` when the checkpoint carries BN stats).
    Returns (params, batch_stats) as new dicts."""
    if module not in params:
        raise KeyError(
            f"encoder_init: model has no module {module!r}; "
            f"top-level params: {sorted(params)}")
    new_params = dict(params)
    new_params[module] = _merged_subtree(
        params[module], variables["params"], f"params/{module}")

    new_stats = dict(batch_stats) if batch_stats else batch_stats
    has_ckpt_stats = "batch_stats" in variables
    has_model_stats = bool(batch_stats) and module in batch_stats \
        and batch_stats[module]
    if has_ckpt_stats != bool(has_model_stats):
        raise ValueError(
            f"encoder_init: batch_stats mismatch for {module!r}: "
            f"checkpoint has stats={has_ckpt_stats}, "
            f"model has stats={bool(has_model_stats)}")
    if has_ckpt_stats:
        new_stats[module] = _merged_subtree(
            batch_stats[module], variables["batch_stats"],
            f"batch_stats/{module}")
    return new_params, new_stats


def default_module_for(model_type: str) -> str:
    return {"vitb": "encoder_vit", "rpn": "conv_trunk"}.get(
        model_type, "features")


def apply_encoder_init(state, spec: str, default_module: str):
    """TrainState → TrainState with pretrained encoder modules merged
    per `spec`. Optimizer state is untouched (Adam moments are zero at
    init and shape-only)."""
    params, stats = state.params, state.batch_stats
    for module, path in parse_spec(spec, default_module):
        params, stats = merge_module(params, stats, module,
                                     load_npz_variables(path))
    return state._replace(params=params, batch_stats=stats)

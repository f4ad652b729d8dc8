"""Device meshes and shardings — the framework's scale-out layer.

The reference is single-device (`train_LSTM.py:20-23` pins `cuda:0`;
SURVEY §2.5). Here scale-out is expressed entirely through
`jax.sharding`: a Mesh over ('data', 'model'), NamedShardings for
batches (sharded on 'data') and params (replicated, or tensor-split on
'model' for the transformer FFN/attention blocks via `PARTITION_RULES`).
XLA GSPMD inserts the all-reduces over ICI; there is no hand-written
communication layer.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Sequence[int] = (-1,),
                axis_names: Sequence[str] = ("data",),
                devices=None) -> Mesh:
    """Mesh over all (or given) devices. A -1 dim absorbs the remainder,
    numpy-reshape style."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def mesh_for_batch(batch_size: int,
                   shape: Sequence[int] = (-1,),
                   axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Like `create_mesh` but caps the data axis at the largest device
    count that divides `batch_size`, so small-batch runs (tests, smoke)
    still jit with batch sharded on 'data'."""
    devices = list(jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return create_mesh(shape, axis_names, devices=devices[:n])


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch leading axis sharded over the data axis of the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules for the transformer/ViT families: column-split
# the FFN up-projection and attention head projections, row-split the
# down-projections. Matched against '/'-joined param paths.
PARTITION_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(ff1|mlp_0)/kernel$",             P(None, "model")),
    (r".*(ff1|mlp_0)/bias$",               P("model")),
    (r".*(ff2|mlp_3)/kernel$",             P("model", None)),
    (r".*attention/(values|keys|queries)/kernel$", P(None, "model")),
    (r".*attention/fc_out/kernel$",        P("model", None)),
    (r".*(word_embedding|lookup_table|embedding)/embedding$", P(None, "model")),
    (r".*(fc_out|linear|deep_output)/kernel$",     P(None, "model")),
    (r".*(fc_out|linear|deep_output)/bias$",       P("model")),
)


def _spec_for(path: str, rules=PARTITION_RULES) -> P:
    for pat, spec in rules:
        if re.match(pat, path):
            return spec
    return P()


def infer_param_shardings(params, mesh: Mesh, rules=PARTITION_RULES):
    """Param pytree → NamedSharding pytree. Params whose rule axis does
    not divide evenly fall back to replication (safe default)."""
    has_model = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1

    def assign(path, leaf):
        if not has_model:
            return NamedSharding(mesh, P())
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        spec = _spec_for("/".join(keys), rules)
        # check divisibility of each sharded dim
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= leaf.ndim or leaf.shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh, rules=PARTITION_RULES):
    """Device-put every param with its inferred sharding."""
    shardings = infer_param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)

"""Offline-run support shared by the differential tests and the
parity/evidence scripts (quality_parity.py, reference_decode_baseline.py).

- `load_reference_module`: import one file of the reference checkout
  (`/root/reference`) with the shims its module scopes need offline:
  a minimal easydict, an empty torchvision, and the reference root on
  sys.path so `from AlexCap.my_utils import ...` resolves as a
  namespace package.
- `force_cpu`: undo the TPU-tunnel sitecustomize's forced platform
  before backend init — CPU is the platform for torch-parity work and
  anything that pulls big arrays to host (the relay makes large
  device→host readbacks pathologically slow).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"


class EasyDict(dict):
    """The two easydict behaviors the reference configs rely on."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def load_reference_module(relpath: str, name: str,
                          ref_root: str = REF_ROOT):
    """Import `<ref_root>/<relpath>` as module `name`."""
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")
        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    # the reference root goes on sys.path only for the module exec
    # (`from AlexCap.my_utils import ...` resolves as a namespace
    # package) — left there it would shadow same-named top-level
    # modules of THIS repo (both trees have a root preprocess.py)
    added = ref_root not in sys.path
    if added:
        sys.path.insert(0, ref_root)
    try:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(ref_root, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        if added and ref_root in sys.path:
            sys.path.remove(ref_root)
    return mod


def force_cpu() -> None:
    """Pin jax to the CPU platform if the backend isn't up yet."""
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

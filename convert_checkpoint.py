#!/usr/bin/env python
"""Checkpoint converter CLI — torch state_dicts ↔ flax param trees.

Import: a torchvision backbone state_dict (.pth, or a .npz re-export
for torch-free hosts) → a .npz of the flax variables used by
`models.backbones.*`. Export: the reverse, producing a state_dict
loadable by the reference's torch models ("same checkpoints" —
BASELINE.json).

Usage:
  python convert_checkpoint.py import --arch resnet101 --src r101.pth --dst r101_flax.npz
  python convert_checkpoint.py export --arch vit_b_16 --src run_params.npz --dst vit_torch.pth
"""

from __future__ import annotations

import argparse

import numpy as np

from imagecaptioning_tpu.utils import torch_port as tp
from imagecaptioning_tpu.utils.pretrained import (flatten_tree as _flatten,
                                                  unflatten_tree as
                                                  _unflatten)

ARCHS = ("resnet50", "resnet101", "resnet152", "vgg16_features",
         "vgg16_classifier", "vit_b_16")


def do_import(arch: str, src: str, dst: str) -> None:
    sd = tp.load_state_dict(src)
    if arch.startswith("resnet"):
        variables = tp.convert_resnet(sd, depth=int(arch[6:]))
    elif arch == "vgg16_features":
        variables = tp.convert_vgg_features(sd)
    elif arch == "vgg16_classifier":
        variables = tp.convert_vgg_classifier(sd)
    elif arch == "vit_b_16":
        variables = tp.convert_vit(sd)
    else:
        raise SystemExit(f"unknown arch {arch}")
    np.savez(dst, **_flatten(variables))
    print(f"wrote {dst} ({len(_flatten(variables))} arrays)")


def do_export(arch: str, src: str, dst: str) -> None:
    with np.load(src) as z:
        variables = _unflatten({k: z[k] for k in z.files})
    if arch.startswith("resnet"):
        sd = tp.export_resnet(variables, depth=int(arch[6:]))
    elif arch == "vgg16_features":
        sd = tp.export_vgg_features(variables)
    elif arch == "vgg16_classifier":
        sd = tp.export_vgg_classifier(variables)
    elif arch == "vit_b_16":
        sd = tp.export_vit(variables)
    else:
        raise SystemExit(f"unknown arch {arch}")
    tp.save_state_dict(dst, sd)
    print(f"wrote {dst} ({len(sd)} tensors)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd in ("import", "export"):
        sp = sub.add_parser(cmd)
        sp.add_argument("--arch", choices=ARCHS, required=True)
        sp.add_argument("--src", required=True)
        sp.add_argument("--dst", required=True)
    a = p.parse_args(argv)
    (do_import if a.cmd == "import" else do_export)(a.arch, a.src, a.dst)


if __name__ == "__main__":
    main()

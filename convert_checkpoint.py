#!/usr/bin/env python
"""Checkpoint converter CLI — torch state_dicts ↔ flax param trees.

Import: a torchvision backbone state_dict (.pth, or a .npz re-export
for torch-free hosts) → a .npz of the flax variables used by
`models.backbones.*`. Export: the reverse, producing a state_dict
loadable by the reference's torch models ("same checkpoints" —
BASELINE.json).

Full trained models: `import-model` converts a reference training
checkpoint (`torch.save(model.state_dict(), ...)`, train_LSTM.py:122-125
— any of the four AlexCap families, either CNN encoder or the ViT) into
an orbax checkpoint directory that `infer.py --ckpt` and
`utils.checkpoint.restore_params` load directly. The family and
architecture dims are inferred from the state_dict and printed.

Usage:
  python convert_checkpoint.py import --arch resnet101 --src r101.pth --dst r101_flax.npz
  python convert_checkpoint.py export --arch vit_b_16 --src run_params.npz --dst vit_torch.pth
  python convert_checkpoint.py import-model --src best_model_LSTM_resnet_ft6_bs12_clip.pth --dst ckpt_lstm
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


def do_import_model(src: str, dst: str, family: str,
                    vit_heads: int) -> dict:
    from imagecaptioning_tpu.utils.checkpoint import save_checkpoint

    sd = tp.load_state_dict(src)
    variables, meta = tp.convert_reference_captioner(sd, family=family,
                                                     vit_heads=vit_heads)
    save_checkpoint(dst, {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]})
    import json
    print(json.dumps({"wrote": dst, **meta}))
    return meta


def _load_variables(src: str) -> dict:
    """Checkpoint dir (orbax) or .npz of flattened variables →
    {'params', 'batch_stats'}."""
    import os
    if os.path.isdir(src):
        from imagecaptioning_tpu.utils.checkpoint import restore_params
        params, batch_stats = restore_params(src)
        return {"params": params, "batch_stats": batch_stats}
    with np.load(src) as z:
        tree = _unflatten({k: z[k] for k in z.files})
    if "params" not in tree:          # bare param tree
        tree = {"params": tree}
    tree.setdefault("batch_stats", {})
    return tree


def do_export_model(src: str, dst: str, family: str) -> dict:
    sd, meta = tp.export_reference_captioner(_load_variables(src),
                                             family=family)
    tp.save_state_dict(dst, sd)
    import json
    print(json.dumps({"wrote": dst, "tensors": len(sd), **meta}))
    return meta


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd in ("import", "export"):
        sp = sub.add_parser(cmd)
        sp.add_argument("--arch", choices=ARCHS, required=True)
        sp.add_argument("--src", required=True)
        sp.add_argument("--dst", required=True)
    sp = sub.add_parser("import-model",
                        help="full reference model.state_dict() → orbax "
                             "checkpoint dir for infer.py")
    sp.add_argument("--src", required=True)
    sp.add_argument("--dst", required=True)
    sp.add_argument("--family", default="auto",
                    choices=["auto", "lstm", "attention", "transformer",
                             "vitb", "gt"])
    sp.add_argument("--vit-heads", type=int, default=12,
                    help="ViT encoder head count (not recoverable from "
                         "the fused in_proj shapes)")
    sp = sub.add_parser("export-model",
                        help="our trained captioner checkpoint → a "
                             "state_dict the reference's torch model "
                             "loads (.pth, or .npz for torch-free hosts)")
    sp.add_argument("--src", required=True,
                    help="orbax checkpoint dir (train driver / "
                         "import-model output) or flattened-variables "
                         ".npz")
    sp.add_argument("--dst", required=True)
    sp.add_argument("--family", default="auto",
                    choices=["auto", "lstm", "attention", "transformer",
                             "vitb", "gt"])
    a = p.parse_args(argv)
    if a.cmd == "import-model":
        do_import_model(a.src, a.dst, a.family, a.vit_heads)
    elif a.cmd == "export-model":
        do_export_model(a.src, a.dst, a.family)
    else:
        (do_import if a.cmd == "import" else do_export)(a.arch, a.src,
                                                        a.dst)


if __name__ == "__main__":
    main()

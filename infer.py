#!/usr/bin/env python
"""Batch captioning CLI — the serving-equivalent entry point.

The reference's closest equivalents are `forward_test` inside the
training scripts and the YOLO-proposal `ImageProcessor` inference path
(`DenseCap/densecap/DataLoader.py:170-186`); it has no standalone
serving entry. This CLI loads a trained checkpoint + dicts JSON and
captions a directory of images with the fused greedy/beam decoder:

  python infer.py --model-type lstm --ckpt runs/models/best_model_... \
      --dicts data/face2text-dicts.json --images photos/ [--beam 3]

Dense mode (`--model-type gt`) captions RPN- or grid-proposed regions.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_vocab(dicts_path: str):
    from imagecaptioning_tpu.data.tokenizer import Vocab
    with open(dicts_path) as f:
        return Vocab.from_dicts_json(json.load(f))


def _load_images(image_dir: str, hw=(218, 178)):
    from PIL import Image
    paths = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    imgs = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((hw[1], hw[0]))
        imgs.append(np.asarray(img, np.uint8))
    return paths, np.stack(imgs) if imgs else np.zeros((0, *hw, 3), np.uint8)


def caption_alexcap(args) -> dict:
    import jax.numpy as jnp

    from imagecaptioning_tpu.config import get_config
    from imagecaptioning_tpu.data import transforms
    from imagecaptioning_tpu.models import api
    from imagecaptioning_tpu.models.captioners import build_model
    from imagecaptioning_tpu.utils import checkpoint as ckptlib

    vocab = load_vocab(args.dicts)
    cfg = get_config(args.model_type)
    if args.set:
        from imagecaptioning_tpu.config import apply_overrides
        cfg = apply_overrides(cfg, dict(kv.split("=", 1)
                                        for kv in args.set))
    model = build_model(cfg, vocab.vocab_size, args.seq_length)

    paths, images_u8 = _load_images(args.images)
    if not paths:
        raise SystemExit(f"no images in {args.images}")
    x = transforms.resnet_v2_preprocess(jnp.asarray(images_u8))
    params, batch_stats = ckptlib.restore_params(args.ckpt)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    if args.beam > 1:
        res = api.make_beam_fn(model, args.seq_length + 1,
                               args.beam)(variables, x)
        toks = np.asarray(res.tokens[:, 0])
    else:
        toks, _ = api.make_greedy_fn(model, args.seq_length + 1)(variables, x)
        toks = np.asarray(toks)
    captions = vocab.decode_sequence(toks)
    return {os.path.basename(p): c for p, c in zip(paths, captions)}


def caption_dense(args) -> dict:
    """Dense mode: caption proposed regions of each image (the
    reference's inference-from-file path, `DataLoader.py:170-186`, with
    our pluggable proposers instead of the YOLO hub download). Images
    are padded onto a fixed 720x720 canvas and region slabs to
    `--max-regions`, so one compiled program serves every image."""
    import jax.numpy as jnp

    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    from imagecaptioning_tpu.data.proposals import ImageProcessor
    from imagecaptioning_tpu.models import api
    from imagecaptioning_tpu.train.dense_driver import build_gt_model
    from imagecaptioning_tpu.utils import checkpoint as ckptlib

    vocab = load_vocab(args.dicts)
    cfg = get_gt_config()
    if args.set:
        overrides = dict(kv.split("=", 1) for kv in args.set)
        for k, v in overrides.items():
            cur = getattr(cfg, k)
            if isinstance(cur, bool):
                v = v.lower() in ("1", "true", "yes", "on")
            elif isinstance(cur, (int, float)):
                v = type(cur)(v)
            cfg = cfg.replace(**{k: v})
    model = build_gt_model(cfg, vocab.vocab_size, args.seq_length)
    params, _ = ckptlib.restore_params(args.ckpt)
    proc = ImageProcessor()
    if args.beam > 1:
        beam = api.make_region_beam_fn(model, args.seq_length + 1,
                                       args.beam)
        decode = lambda v, x, b: beam(v, x, b).tokens[:, 0]
    else:
        decode = api.make_region_greedy_fn(model, args.seq_length + 1)

    canvas, rmax = 720, args.max_regions
    paths = sorted(
        os.path.join(args.images, f) for f in os.listdir(args.images)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not paths:
        raise SystemExit(f"no images in {args.images}")
    out = {}
    for path in paths:
        # (1, H, W, 3), (1, R, 4) resized-frame boxes, + resize scale
        x, boxes, scale = proc.preprocess_img(path, return_scale=True)
        h, w = x.shape[1:3]
        xp = np.zeros((1, canvas, canvas, 3), np.float32)
        xp[0, :h, :w] = x[0]
        b = boxes[0][:rmax]
        n_real = b.shape[0]
        bp = np.full((rmax, 4), 1.0, np.float32)  # degenerate pad boxes
        bp[:n_real] = b
        toks = decode({"params": params}, jnp.asarray(xp),
                      jnp.asarray(bp[None]))
        caps = vocab.decode_sequence(np.asarray(toks).reshape(rmax, -1))
        # Report boxes in the ORIGINAL image's pixel frame (the model
        # consumed resized-frame boxes; consumers should not need to
        # know about the shorter-edge-720 canvas). Keep the scale in
        # the record so the resized frame stays recoverable.
        inv = np.asarray([1.0 / scale["sx"], 1.0 / scale["sy"]] * 2,
                         np.float32)
        out[os.path.basename(path)] = {
            "resize": {"sx": scale["sx"], "sy": scale["sy"],
                       "raw_hw": list(scale["raw_hw"]),
                       "resized_hw": list(scale["resized_hw"])},
            "regions": [
                {"box_xcycwh": [float(v) for v in bp[i] * inv],
                 "caption": caps[i]}
                for i in range(n_real)],
        }
    return out


def main(argv=None):
    from imagecaptioning_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-type", default="lstm",
                   choices=["lstm", "lstm_attention", "transformer",
                            "vitb", "gt"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--dicts", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--seq-length", type=int, default=16)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--max-regions", type=int, default=32,
                   help="dense mode: region-slab budget per image")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="config overrides (must match the checkpoint)")
    p.add_argument("--out", default="")
    a = p.parse_args(argv)
    result = caption_dense(a) if a.model_type == "gt" else caption_alexcap(a)
    text = json.dumps(result, indent=2)
    if a.out:
        with open(a.out, "w") as f:
            f.write(text)
    print(text)
    return result


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-family XLA cost analysis → the MFU table in docs/SCALING.md.

For each family this lowers the SAME donated train step that bench.py
measures (identical model dims, batch size, preprocess-in-step, loss,
backward, optimizer update) and records XLA's flops estimate in
`runs/bench/flops.json`. MFU = flops/item × measured items/s ÷ peak
(v5e bf16 peak: 197 TFLOP/s; the measured items/s are the committed
`runs/bench/results.jsonl` lines).

Runs on the CPU backend — the HLO cost model counts the same math the
TPU executes; no accelerator needed. (Same methodology as the original
headline-LSTM 53% figure, docs/SCALING.md.)

Run: python mfu.py [--families lstm,attention,...] [--batch-size 128]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

REPO = os.path.dirname(os.path.abspath(__file__))
V5E_BF16_PEAK_TFLOPS = 197.0


def _cost(lowered):
    """flops from XLA cost analysis; prefers the compiled estimate."""
    try:
        c = lowered.compile().cost_analysis()
    except Exception:
        c = lowered.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c["flops"])


def captioner_step_flops(family: str, bs: int, vocab: int = 2048,
                         seq_length: int = 16) -> float:
    """flops of ONE bench_train step (preprocess + forward + backward +
    Adam update, frozen encoder) for an AlexCap family."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _family_table
    from imagecaptioning_tpu.data import transforms
    from imagecaptioning_tpu.train import optim, step as steplib

    fam = _family_table()[family]
    dtype = jnp.bfloat16
    model = fam["make"](vocab, seq_length, dtype)
    cfg = fam["cfg"]().replace(batch_size=bs)
    tx = optim.make_optimizer(cfg, total_steps=10_000,
                              finetune_start_step=1_000_000)
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng.randint(0, 256, size=(bs, 218, 178, 3),
                                        dtype=np.uint8))
    gt = jnp.asarray(rng.randint(1, vocab + 1, size=(bs, seq_length),
                                 dtype=np.int32))

    def preprocess(u8):
        return transforms.resnet_v2_preprocess(u8, dtype=dtype)

    state, _ = steplib.create_train_state(model, tx,
                                          preprocess(images_u8), gt)
    step_fn = steplib.make_train_step(model, tx, preprocess=preprocess)
    lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(state,
                                                          images_u8, gt)
    return _cost(lowered)


def gt_dense_step_flops(bs: int = 8, regions: int = 32,
                        image_size: int = 512, vocab: int = 2048,
                        seq_length: int = 16) -> float:
    """flops of ONE bench_dense GT training step (VGG16 → ROI pooling →
    caption head → backward → Adam)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _dense_inputs
    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    from imagecaptioning_tpu.data.vg_loader import normalize_images
    from imagecaptioning_tpu.train import dense_driver
    from imagecaptioning_tpu.train.step import TrainState

    cfg = get_gt_config().replace(batch_size=bs, max_regions=regions,
                                  use_lstm=True,
                                  compute_dtype="bfloat16")
    dtype = jnp.bfloat16
    model = dense_driver.build_gt_model(cfg, vocab_size=vocab,
                                        seq_length=seq_length)
    tx = dense_driver.make_dense_optimizer(cfg,
                                           finetune_start_step=10 ** 9)
    ns = argparse.Namespace(batch_size=bs, max_regions=regions,
                            image_size=image_size, vocab=vocab,
                            seq_length=seq_length)
    images, boxes, labels, mask = _dense_inputs(ns, jnp, np, dtype)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        normalize_images(images, dtype=dtype), boxes, labels, train=True)
    state = TrainState(jnp.array(0, jnp.int32), variables["params"],
                       tx.init(variables["params"]), {},
                       jax.random.PRNGKey(3))
    step_fn = dense_driver.make_gt_train_step(model, tx,
                                              use_curriculum=False,
                                              dtype=dtype)
    lowered = jax.jit(step_fn, donate_argnums=(0,)).lower(
        state, images, boxes, labels, mask, 1.0)
    return _cost(lowered)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families",
                    default="lstm,attention,transformer,vitb,gt")
    ap.add_argument("--batch-size", type=int, default=128,
                    help="captioner families (the bench default)")
    ap.add_argument("--out", default="runs/bench/flops.json")
    args = ap.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_platforms", "cpu")   # cost model only
    except RuntimeError:
        pass

    # merge into the existing table so regenerating one family (after a
    # default change) doesn't drop the others' entries
    out = {"peak_tflops_bf16_v5e": V5E_BF16_PEAK_TFLOPS,
           "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "families": {}}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                out["families"] = json.load(f).get("families", {})
        except (json.JSONDecodeError, OSError):
            pass
    for family in args.families.split(","):
        t0 = time.time()
        if family == "gt":
            flops = gt_dense_step_flops()
            items = 8 * 32          # regions/step at the bench defaults
            rec = {"metric": "gt_dense_train_regions_per_sec_img512",
                   "flops_per_step": flops, "items_per_step": items,
                   "unit": "regions"}
        else:
            flops = captioner_step_flops(family, args.batch_size)
            items = args.batch_size
            from bench import FAMILY_METRICS
            rec = {"metric": FAMILY_METRICS[family][0],
                   "flops_per_step": flops, "items_per_step": items,
                   "unit": "images"}
        rec["gflop_per_item"] = round(flops / items / 1e9, 3)
        out["families"][family] = rec
        print(f"{family}: {flops / 1e9:.1f} GFLOP/step, "
              f"{rec['gflop_per_item']} GFLOP/{rec['unit'][:-1]} "
              f"({time.time() - t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: LSTM + ResNet-101 training-step throughput.

Matches the reference's measured configuration — frozen-CNN phase of
`train_LSTM.py`, whose committed logs give a median 103.8 ms / batch-12
step ≈ 115 images/sec on its GPU (BASELINE.md). Here the whole
iteration (uint8→normalized preprocess, ResNet-101 forward, LSTM
teacher-forced decode, backward, Adam update) is one donated XLA
program in bf16 on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC = 115.0   # BASELINE.md: 103.8 ms @ bs12


def bench_decode(args):
    """Secondary metric: captions/sec under fused beam-search decode —
    BASELINE.json names it; the reference never measured its Python beam
    loops, so there is no vs_baseline (reported as null)."""
    from imagecaptioning_tpu.data import transforms
    from imagecaptioning_tpu.models import api

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    fam = _family_table()[args.family]
    model = fam["make"](args.vocab, args.seq_length, dtype)
    rng = np.random.RandomState(0)
    b = args.batch_size
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(b, 218, 178, 3), dtype=np.uint8))
    x = transforms.resnet_v2_preprocess(images_u8, dtype=dtype)
    gt = jnp.asarray(rng.randint(1, args.vocab + 1,
                                 size=(b, args.seq_length), dtype=np.int32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, gt,
                           train=False)
    beam = api.make_beam_fn(model, args.seq_length + 1, args.beam_size)

    # Chain every call through a carry scalar so the runtime cannot
    # overlap/elide identical dispatches, and synchronize with a real
    # host readback (block_until_ready does not reliably block through
    # remote-relay backends).
    @jax.jit
    def chained(variables, x, carry):
        res = beam(variables, x + carry * 0)
        return res, carry + res.scores[0, 0] * 0 + 1

    carry = jnp.float32(0)
    for _ in range(args.warmup):
        res, carry = chained(variables, x, carry)
    carry = jnp.float32(float(carry))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        res, carry = chained(variables, x, carry)
    float(carry)                      # host sync: forces all steps
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": fam["metric"].replace(
            "_train_images_per_sec",
            f"_beam{args.beam_size}_captions_per_sec"),
        "value": round(args.steps * b / dt, 2),
        "unit": "captions/sec",
        "vs_baseline": None,
    }))


def bench_dense(args):
    """GT dense-captioning training throughput in regions/sec: batched
    images × padded region slabs through VGG16 → ROI pooling → caption
    head → backward → Adam, one donated program. The reference's
    traingt.py path is locked to one image per step and never published
    a step time, so vs_baseline is null."""
    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    from imagecaptioning_tpu.train import dense_driver
    from imagecaptioning_tpu.train.step import TrainState

    b, r, s = args.batch_size, args.max_regions, args.image_size
    cfg = get_gt_config().replace(
        batch_size=b, max_regions=r, use_lstm=True,
        use_pallas_roi=args.pallas_roi,
        compute_dtype="float32" if args.fp32 else "bfloat16")
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = dense_driver.build_gt_model(cfg, vocab_size=args.vocab,
                                        seq_length=args.seq_length)
    tx = dense_driver.make_dense_optimizer(cfg, finetune_start_step=10**9)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, size=(b, s, s, 3),
                                     dtype=np.uint8))
    # random sane boxes in xcycwh, padded slab of r regions per image
    wh = rng.uniform(32, s // 2, size=(b, r, 2))
    cxy = rng.uniform(s * 0.25, s * 0.75, size=(b, r, 2))
    boxes = jnp.asarray(np.concatenate([cxy, wh], -1).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, args.vocab + 1,
                                     size=(b, r, args.seq_length),
                                     dtype=np.int32))
    mask = jnp.ones((b, r), jnp.float32)

    from imagecaptioning_tpu.data.vg_loader import normalize_images
    x0 = normalize_images(images, dtype=dtype)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        x0, boxes, labels, train=True)
    state = TrainState(jnp.array(0, jnp.int32), variables["params"],
                       tx.init(variables["params"]), {},
                       jax.random.PRNGKey(3))
    step_fn = dense_driver.make_gt_train_step(model, tx,
                                              use_curriculum=False,
                                              dtype=dtype)
    spc = max(args.steps_per_call, 1)

    @partial(jax.jit, donate_argnums=(0,))
    def train_many(state):
        def body(st, _):
            st, metrics = step_fn(st, images, boxes, labels, mask, 1.0)
            return st, metrics["captioning_loss"]
        state, losses = jax.lax.scan(body, state, None, length=spc)
        return state, losses[-1]

    for _ in range(max(args.warmup // spc, 1)):
        state, loss = train_many(state)
    float(loss)
    n_calls = max(args.steps // spc, 1)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, loss = train_many(state)
    float(loss)                       # host sync: forces all steps
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"gt_dense_train_regions_per_sec_img{s}",
        "value": round(n_calls * spc * b * r / dt, 2),
        "unit": "regions/sec",
        "vs_baseline": None,
    }))


def bench_input(args):
    """Host input pipeline: RAM-cached uint8 store -> C++ fastloader
    multi-threaded gather -> stacked batches, via the background
    prefetch thread (the path that feeds the jitted step in training).
    Measured host-side (no device transfer): through the remote TPU
    relay a device_put is tunnel-bound and unrepresentative of a real
    host-attached chip; the train metric already covers on-device
    preprocessing."""
    from imagecaptioning_tpu.data import synthetic
    from imagecaptioning_tpu.data.loader import (AlexDataLoader,
                                                 prefetch_batches)

    arrays, info = synthetic.make_face2text_arrays(
        num_images=args.input_images, seed=0)
    loader = AlexDataLoader(arrays=arrays, info=info)
    b = args.batch_size
    if len(loader.split_ix[0]) < b:
        raise SystemExit(
            f"--input-images {args.input_images} leaves a train split of "
            f"{len(loader.split_ix[0])} images < batch size {b}; "
            "raise --input-images or lower --batch-size")

    def epochs():
        while True:
            yield from loader.epoch_batches(0, b)

    it = prefetch_batches(epochs(), size=4, device_put=lambda x: x)
    for _ in range(args.warmup):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.steps):
        images, labels = next(it)
        n += images.shape[0]
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "host_input_pipeline_images_per_sec",
        "value": round(n / dt, 2),
        "unit": "images/sec",
        "vs_baseline": None,
    }))


# Per-family definitions: model factory, default batch, metric name, and
# the reference's measured img/s where one exists (BASELINE.md — the
# reference only timed the LSTM and ViT-B families).
def _family_table():
    from imagecaptioning_tpu.config import (
        get_lstm_attention_config, get_lstm_config, get_transformer_config,
        get_vitb_config)
    from imagecaptioning_tpu.models.captioners import (
        AttentionCaptioner, LSTMCaptioner, TransformerCaptioner,
        ViTCaptioner)
    return {
        "lstm": dict(
            make=lambda v, t, d: LSTMCaptioner(
                vocab_size=v, embedding_size=1024, rnn_size=768,
                compute_dtype=d, freeze_encoder=True),
            cfg=get_lstm_config, batch=128,
            metric="lstm_resnet101_train_images_per_sec", baseline=115.0),
        "attention": dict(
            make=lambda v, t, d: AttentionCaptioner(
                vocab_size=v, embedding_size=1024, rnn_size=768,
                dropout=0.5, compute_dtype=d, freeze_encoder=True),
            cfg=get_lstm_attention_config, batch=64,
            metric="attention_lstm_resnet101_train_images_per_sec",
            baseline=None),
        "transformer": dict(
            make=lambda v, t, d: TransformerCaptioner(
                vocab_size=v, max_length=t, embed_size=512, num_layers=6,
                heads=8, dropout=0.1, compute_dtype=d, freeze_encoder=True),
            cfg=get_transformer_config, batch=64,
            metric="transformer_resnet101_train_images_per_sec",
            baseline=None),
        "vitb": dict(
            make=lambda v, t, d: ViTCaptioner(
                vocab_size=v, max_length=t, dropout=0.1,
                compute_dtype=d, freeze_encoder=True),
            cfg=get_vitb_config, batch=128, decode_batch=64,
            metric="vitb16_train_images_per_sec", baseline=14.0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=None,
                    help="default: per-family (128 lstm, 64 others)")
    ap.add_argument("--family",
                    choices=["lstm", "attention", "transformer", "vitb"],
                    default="lstm")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--vocab", type=int, default=2048)
    ap.add_argument("--seq-length", type=int, default=16)
    ap.add_argument("--beam-size", type=int, default=3)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--metric",
                    choices=["train", "decode", "dense", "input"],
                    default="train")
    ap.add_argument("--input-images", type=int, default=2048,
                    help="input metric: synthetic store size")
    ap.add_argument("--max-regions", type=int, default=32)
    ap.add_argument("--pallas-roi", action="store_true",
                    help="dense metric: explicit Pallas ROI kernel "
                         "instead of the einsum form")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--steps-per-call", type=int, default=20,
                    help="train steps fused into one XLA program via "
                         "lax.scan — amortizes host dispatch, which "
                         "dominates through the remote TPU relay")
    args = ap.parse_args()
    if args.metric == "dense":
        if args.batch_size is None:
            args.batch_size = 8
        return bench_dense(args)
    if args.metric == "input":
        if args.batch_size is None:
            args.batch_size = 128
        return bench_input(args)
    fam = _family_table()[args.family]
    if args.batch_size is None:
        args.batch_size = (fam.get("decode_batch", fam["batch"])
                           if args.metric == "decode" else fam["batch"])
    if args.metric == "decode":
        return bench_decode(args)

    from imagecaptioning_tpu.data import transforms
    from imagecaptioning_tpu.train import optim, step as steplib

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    # frozen-encoder phase, exactly the reference's measured
    # configuration (train_LSTM.py:48-54, requires_grad_(False)):
    # gradients stop at the encoder output — no conv backward — and the
    # encoder group receives zero updates.
    model = fam["make"](args.vocab, args.seq_length, dtype)
    cfg = fam["cfg"]().replace(batch_size=args.batch_size)
    tx = optim.make_optimizer(cfg, total_steps=10_000,
                              finetune_start_step=1_000_000)

    rng = np.random.RandomState(0)
    b = args.batch_size
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(b, 218, 178, 3), dtype=np.uint8))
    gt = jnp.asarray(
        rng.randint(1, args.vocab + 1, size=(b, args.seq_length),
                    dtype=np.int32))

    def preprocess(u8):
        return transforms.resnet_v2_preprocess(u8, dtype=dtype)

    x0 = preprocess(images_u8)
    state, _ = steplib.create_train_state(model, tx, x0, gt)
    step_fn = steplib.make_train_step(model, tx, preprocess=preprocess)

    # Fuse --steps-per-call real optimizer steps into one XLA program
    # with lax.scan: host dispatch (expensive through the remote TPU
    # relay) amortizes across the scan, matching a production loop with
    # device-resident prefetched batches.
    spc = max(args.steps_per_call, 1)

    @partial(jax.jit, donate_argnums=(0,))
    def train_many(state, images, gt):
        def body(st, _):
            st, metrics = step_fn(st, images, gt)
            return st, metrics["loss"]
        state, losses = jax.lax.scan(body, state, None, length=spc)
        return state, losses[-1]

    # Calls chain through the donated TrainState, so reading the final
    # loss forces every step to have executed. Use a real host readback
    # (float) — block_until_ready does not reliably block through
    # remote-relay backends.
    for _ in range(max(args.warmup // spc, 1)):
        state, loss = train_many(state, images_u8, gt)
    float(loss)

    n_calls = max(args.steps // spc, 1)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, loss = train_many(state, images_u8, gt)
    float(loss)                       # host sync: forces all steps
    dt = time.perf_counter() - t0

    img_per_sec = n_calls * spc * b / dt
    baseline = fam["baseline"]
    print(json.dumps({
        "metric": fam["metric"],
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": (round(img_per_sec / baseline, 3)
                        if baseline else None),
    }))


if __name__ == "__main__":
    main()

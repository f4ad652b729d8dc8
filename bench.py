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

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMG_PER_SEC = 115.0   # BASELINE.md: 103.8 ms @ bs12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--vocab", type=int, default=2048)
    ap.add_argument("--seq-length", type=int, default=16)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    from imagecaptioning_tpu.config import get_lstm_config
    from imagecaptioning_tpu.data import transforms
    from imagecaptioning_tpu.models.captioners import LSTMCaptioner
    from imagecaptioning_tpu.train import optim, step as steplib

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = LSTMCaptioner(vocab_size=args.vocab, embedding_size=1024,
                          rnn_size=768, compute_dtype=dtype)
    cfg = get_lstm_config().replace(batch_size=args.batch_size)
    # frozen-CNN phase: encoder group gets zero updates, like the
    # reference's measured configuration (train_LSTM.py:48-54).
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
    train_step = jax.jit(steplib.make_train_step(model, tx,
                                                 preprocess=preprocess),
                         donate_argnums=(0,))

    for _ in range(args.warmup):
        state, metrics = train_step(state, images_u8, gt)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_step(state, images_u8, gt)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = args.steps * b / dt
    print(json.dumps({
        "metric": "lstm_resnet101_train_images_per_sec",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

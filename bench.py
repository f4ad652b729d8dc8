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
    from imagecaptioning_tpu.models.captioners import LSTMCaptioner

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = LSTMCaptioner(vocab_size=args.vocab, embedding_size=1024,
                          rnn_size=768, compute_dtype=dtype)
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
        "metric": f"lstm_resnet101_beam{args.beam_size}_captions_per_sec",
        "value": round(args.steps * b / dt, 2),
        "unit": "captions/sec",
        "vs_baseline": None,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--vocab", type=int, default=2048)
    ap.add_argument("--seq-length", type=int, default=16)
    ap.add_argument("--beam-size", type=int, default=3)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--metric", choices=["train", "decode"],
                    default="train")
    ap.add_argument("--steps-per-call", type=int, default=20,
                    help="train steps fused into one XLA program via "
                         "lax.scan — amortizes host dispatch, which "
                         "dominates through the remote TPU relay")
    args = ap.parse_args()
    if args.metric == "decode":
        return bench_decode(args)

    from imagecaptioning_tpu.config import get_lstm_config
    from imagecaptioning_tpu.data import transforms
    from imagecaptioning_tpu.models.captioners import LSTMCaptioner
    from imagecaptioning_tpu.train import optim, step as steplib

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    # frozen-CNN phase, exactly the reference's measured configuration
    # (train_LSTM.py:48-54, requires_grad_(False)): gradients stop at
    # the encoder output — no conv backward — and the encoder group
    # receives zero updates.
    model = LSTMCaptioner(vocab_size=args.vocab, embedding_size=1024,
                          rnn_size=768, compute_dtype=dtype,
                          freeze_encoder=True)
    cfg = get_lstm_config().replace(batch_size=args.batch_size)
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
    print(json.dumps({
        "metric": "lstm_resnet101_train_images_per_sec",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

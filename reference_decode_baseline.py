#!/usr/bin/env python
"""Measure the reference's own decode loops — the missing baseline.

BASELINE.md: decode throughput (captions/sec under beam search) has no
reference number; the reference never measured it. This script times
the reference's OWN decode paths (`/root/reference/AlexCap/
LanguageModule.py`): batched greedy `predict_caption` (`:130-150`) and
the per-image beam `caption` loop (`:152-198`), at the reference LSTM
config's dimensions (embedding 1024, rnn 768, 2048-d ResNet features,
49 positions, bs 12 — `AlexCap/LSTM_opts.py`).

Caveats, recorded in the output JSON:
- CPU (torch): the reference's committed hardware (RTX 2080 Ti) is not
  available here. Its beam loop is per-image serial Python with a topk
  and host-side list surgery every step, so per-step launch overhead —
  not device math — dominates on either backend.
- Encoder excluded: features are pre-computed, so the measured rate is
  an UPPER bound on the reference's end-to-end captions/sec. (Our
  bench's decode metric INCLUDES the ResNet/ViT forward.)
- Random weights: with an untrained head END rarely wins argmax, so
  decodes run the full seq_length — matching trained behavior, where
  captions approach max length anyway.

Writes runs/bench/reference_decode_baseline.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from imagecaptioning_tpu.utils.refload import load_reference_module

V, W, D, H, T, P, BS = 2500, 1024, 2048, 768, 16, 49, 12


def main():
    import torch
    torch.set_num_threads(os.cpu_count() or 1)   # best-case host math

    ref_mod = load_reference_module("AlexCap/LanguageModule.py",
                                    "refdec_language")
    torch.manual_seed(0)
    llm = ref_mod.LanguageModel(
        vocab_size=V, embedding_size=W, image_vector_dim=D, rnn_size=H,
        seq_length=T, num_layers=1, idx_to_token={}, dropout=0.0,
        device="cpu").eval()
    feats = torch.randn(BS, P, D)

    def timeit(fn, min_s=5.0, warmup=2):
        for _ in range(warmup):
            fn()
        n, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < min_s:
            fn()
            n += 1
        return n / (time.perf_counter() - t0)

    with torch.no_grad():
        greedy_batches = timeit(lambda: llm.predict_caption(feats))
        # caption() feeds raw features into the LSTM without
        # image_encoder (LanguageModule.py:160 vs :132) — a latent
        # reference bug: it crashes whenever image_vector_dim !=
        # embedding_size, i.e. for every committed config (ResNet 2048
        # / VGGFace 512 vs W=1024). The reference never hits it
        # (train_LSTM.py's final eval is greedy-only). Pre-encode so
        # the measured number is the beam loop itself.
        enc = llm.image_encoder(feats[:1])

        def beam_once():
            try:
                llm.caption(enc, 3)
            except ValueError as e:
                # untrained weights never argmax END, so no beam
                # completes within T+1 steps and the final max() over
                # completed beams raises — all T+1 steps of beam work
                # ran; only the winner selection is skipped. Any OTHER
                # ValueError must abort loudly, not be timed as a call.
                if "empty" not in str(e):
                    raise

        beam_imgs = timeit(beam_once, min_s=5.0)

    out = {
        "greedy_captions_per_sec": round(greedy_batches * BS, 2),
        # full-length decode (T+1 steps, no beam shrink — untrained
        # weights); per-step cost is constant, so a trained model
        # finishing at length L does ~L/(T+1) of this work
        "beam3_captions_per_sec": round(beam_imgs, 2),
        "beam3_ms_per_step": round(1000.0 / (beam_imgs * (T + 1)), 3),
        "config": {"vocab": V, "embedding": W, "feat_dim": D, "rnn": H,
                   "seq_length": T, "positions": P, "batch": BS},
        "platform": "cpu-torch",
        "torch_threads": torch.get_num_threads(),
        "caveats": ["encoder forward excluded (upper bound for the "
                    "reference; our decode bench includes it)",
                    "reference hardware (RTX 2080 Ti) unavailable; the "
                    "beam loop is per-image serial Python either way",
                    "beam throughput is per-image: caption() handles "
                    "one image (LanguageModule.py:152-198)",
                    "caption() was fed pre-encoded features: as "
                    "committed it skips image_encoder and crashes for "
                    "every real config (latent bug, see PARITY.md)"],
        "source": "/root/reference/AlexCap/LanguageModule.py:130-198",
    }
    os.makedirs("runs/bench", exist_ok=True)
    path = "runs/bench/reference_decode_baseline.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""The shared training driver — one loop for all four AlexCap families.

Reproduces the skeleton every reference driver shares
(`train_LSTM.py`, `train_LSTMwAttention.py`, `train_Transformer.py`,
`train_ViTB.py` — SURVEY §2.2): derive `max_iter = (save_checkpoint_every
// batch_size) * num_epochs` and loss-log stride `pad =
save_checkpoint_every // batch_size**2`; per-iter train step with
timing; per-"epoch" `eval_split` on val; keep the best checkpoint by
val METEOR; final test eval sweeping beam sizes 1–5
(`train_Transformer.py:166-178`); JSON loss/result histories in the
reference schema.

TPU-native: the step is one compiled, donated XLA program over a device
mesh; input batches prefetch via a host thread; preprocessing is fused
into the step; checkpoints carry full training state (orbax).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioning_tpu.config import CaptionConfig, name_model
from imagecaptioning_tpu.data import device_store, synthetic, transforms
from imagecaptioning_tpu.data.loader import AlexDataLoader, prefetch_batches
from imagecaptioning_tpu.eval.eval_split import eval_split
from imagecaptioning_tpu.models import api
from imagecaptioning_tpu.models.captioners import build_model
from imagecaptioning_tpu.parallel import mesh as meshlib
from imagecaptioning_tpu.train import optim, step as steplib
from imagecaptioning_tpu.utils import checkpoint as ckptlib
from imagecaptioning_tpu.utils.io import LossHistory, ResultsHistory
from imagecaptioning_tpu.utils.tb import TBWriter


def make_loader(cfg: CaptionConfig, synthetic_fallback: bool = True,
                synthetic_images: int = 64,
                synthetic_learnable: bool = False) -> AlexDataLoader:
    if os.path.exists(cfg.data_h5) and os.path.exists(cfg.data_json):
        return AlexDataLoader(data_h5=cfg.data_h5, data_json=cfg.data_json,
                              seed=cfg.seed)
    if not synthetic_fallback:
        raise FileNotFoundError(cfg.data_h5)
    make = (synthetic.make_learnable_face2text_arrays
            if synthetic_learnable else synthetic.make_face2text_arrays)
    arrays, info = make(num_images=synthetic_images, seed=cfg.seed)
    return AlexDataLoader(arrays=arrays, info=info, seed=cfg.seed)


def _batch_iterator(loader, cfg, batch_size, start_images: int = 0):
    """Endless train-split batches: sequential when cfg.iterate, else
    random sampling without replacement per draw — the reference's
    multinomial path (MyDataLoader.py:77-83). `start_images`
    fast-forwards the first sequential epoch to the resume cursor
    (meaningless under shuffling, where each epoch reorders anyway)."""
    while True:
        if cfg.iterate:
            yield from loader.epoch_batches(0, batch_size, shuffle=False,
                                            start=start_images)
        else:
            yield from loader.epoch_batches(0, batch_size, shuffle=True)
        start_images = 0


def _resident_mode(cfg: CaptionConfig, loader) -> bool:
    """Decide the input path. 'on'/'off' are forced; 'auto' stages the
    train split in HBM when the images are RAM-cached numpy (not a lazy
    h5 handle) and the split fits the device memory budget."""
    mode = getattr(cfg, "device_resident_data", "off")
    if mode == "off":
        return False
    if mode == "on":
        return True
    if not isinstance(loader.images, np.ndarray):
        return False      # lazy h5: staging would re-read the whole file
    n = len(loader.split_ix[0])
    if n == 0:
        return False
    per_image = int(np.prod(loader.images.shape[1:]))   # uint8 bytes
    nbytes = n * (per_image + loader.labels.shape[1] * 4)
    return device_store.fits(nbytes)


def train(cfg: CaptionConfig, *, max_iter_override: Optional[int] = None,
          eval_every_override: Optional[int] = None,
          synthetic_fallback: bool = True,
          synthetic_images: int = 64,
          synthetic_learnable: bool = False,
          verbose: bool = True) -> Dict:
    """Run training per config; returns summary dict with histories."""
    if cfg.debug_nans:
        from imagecaptioning_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging()
    loss_file, result_file, save_path = name_model(cfg)

    loader = make_loader(cfg, synthetic_fallback, synthetic_images,
                         synthetic_learnable)
    vocab_size = loader.getVocabSize()
    seq_length = loader.getSeqLength()
    bs = cfg.batch_size

    iters_per_epoch = max(cfg.save_checkpoint_every // bs, 1)
    max_iter = max_iter_override or iters_per_epoch * cfg.num_epochs
    eval_every = eval_every_override or iters_per_epoch
    pad = max(cfg.save_checkpoint_every // (bs * bs), 1)
    finetune_start = cfg.finetuning_after_nepoch * iters_per_epoch
    # Under gradient accumulation the loop counter ticks per MICRO-step
    # while everything inside the optimizer (schedules, gate_until)
    # ticks once per APPLIED update (optax.MultiSteps). Round the
    # finetune boundary UP to an accumulation-window edge so the
    # frozen-model switch (micro units) and the optimizer gate (applied
    # units) agree, and pass applied-unit horizons to the optimizer.
    accum = max(getattr(cfg, "grad_accum_steps", 1), 1)
    finetune_start = -(-finetune_start // accum) * accum

    model = build_model(cfg, vocab_size, seq_length)
    # Frozen-CNN phase as the reference runs it (requires_grad_(False),
    # train_LSTM.py:48-54): a second step function with gradients stopped
    # at the encoder output — no conv backward compiled — used until the
    # finetune boundary. Same params/forward; only the grad graph differs.
    frozen_model = (build_model(cfg, vocab_size, seq_length,
                                freeze_encoder=True)
                    if cfg.finetune_cnn and finetune_start > 0 else None)
    tx = optim.make_optimizer(cfg, -(-max_iter // accum),
                              finetune_start // accum)

    sample_imgs, sample_gt = next(loader.epoch_batches(0, bs))
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    preprocess = partial(transforms.resnet_v2_preprocess, dtype=dtype)
    x0 = preprocess(jnp.asarray(sample_imgs))
    state, _ = steplib.create_train_state(model, tx, x0,
                                          jnp.asarray(sample_gt), cfg.seed)
    if cfg.encoder_init:
        # The reference builds from pretrained torchvision weights
        # (LSTMModel.py:18-27, VitbModel.py:156-166); here a converted
        # .npz replaces the freshly-initialized encoder subtree.
        from imagecaptioning_tpu.utils import pretrained
        state = pretrained.apply_encoder_init(
            state, cfg.encoder_init,
            pretrained.default_module_for(cfg.model_type))
        if verbose:
            print(f"encoder initialized from {cfg.encoder_init}")

    device_mesh = meshlib.mesh_for_batch(bs, cfg.mesh_shape,
                                         cfg.mesh_axis_names)
    train_step = steplib.shard_train_step(
        steplib.make_train_step(model, tx, preprocess=preprocess),
        device_mesh)
    frozen_step = (steplib.shard_train_step(
        steplib.make_train_step(frozen_model, tx, preprocess=preprocess),
        device_mesh) if frozen_model is not None else None)
    eval_loss = jax.jit(steplib.make_eval_step(model))

    loss_hist = LossHistory(loss_file, resume=cfg.from_checkpoint)
    res_hist = ResultsHistory(result_file, resume=cfg.from_checkpoint)
    tb = TBWriter(cfg.tensorboard_dir)
    start_iter = 0
    resume_from = ckptlib.resume_path(save_path) if cfg.from_checkpoint \
        else None
    if resume_from:
        state, extra = ckptlib.restore_checkpoint(
            resume_from, state,
            extra_template={"iterators": loader.iterators})
        if extra and "iterators" in extra:   # loader cursor travels too
            loader.iterators = {int(k): int(v)
                                for k, v in extra["iterators"].items()}
        start_iter = int(state.step)
        if verbose:
            print(f"resumed from {resume_from} at iter {start_iter}")

    def eval_vars(state):
        v = {"params": state.params}
        if state.batch_stats:            # BN backbones need running stats
            v["batch_stats"] = state.batch_stats
        return v

    # wrap the cursor in BATCH units: each sequential epoch consumes
    # steps_per_epoch_data batches (ragged tail dropped)
    steps_per_epoch_data = max(len(loader.split_ix[0]) // bs, 1)
    start_images = ((start_iter % steps_per_epoch_data) * bs
                    if cfg.iterate else 0)
    data_sharding = meshlib.data_sharding(device_mesh)
    put = partial(jax.device_put, device=data_sharding)

    # Input path: device-resident HBM store (index batches only — the
    # TPU-native default) or the streaming host-gather + prefetch +
    # device_put pipeline. Both are driven by epoch_position_batches,
    # so batch order is identical either way.
    resident = _resident_mode(cfg, loader)
    if resident:
        store = device_store.stage_split(loader, 0, mesh=device_mesh)
        res_train = device_store.shard_resident_train_step(
            device_store.make_resident_train_step(
                steplib.make_train_step(model, tx, preprocess=preprocess)),
            device_mesh)
        res_frozen = (device_store.shard_resident_train_step(
            device_store.make_resident_train_step(
                steplib.make_train_step(frozen_model, tx,
                                        preprocess=preprocess)),
            device_mesh) if frozen_model is not None else None)
        feed = device_store.index_stream(loader, 0, bs, iterate=cfg.iterate,
                                         start_images=start_images)

        def run_step(state, item, frozen: bool):
            fn = res_frozen if (frozen and res_frozen is not None) \
                else res_train
            return fn(state, store, np.asarray(item, np.int32))
        if verbose:
            print(f"train split resident in device memory "
                  f"({store.nbytes / 2**20:.0f} MiB)")
    else:
        feed = prefetch_batches(
            _batch_iterator(loader, cfg, bs, start_images=start_images),
            size=2)

        def run_step(state, item, frozen: bool):
            images_u8, labels = item
            fn = frozen_step if (frozen and frozen_step is not None) \
                else train_step
            return fn(state, put(jnp.asarray(images_u8)),
                      put(jnp.asarray(labels)))

    it = start_iter
    last_loss = float("nan")
    # Exception-safe teardown: restore signal handlers and close TB
    # even when the loop raises.
    try:
        with ckptlib.SignalCheckpointer() as sig:
            for item in feed:
                if it >= max_iter:
                    break
                if sig.save_if_requested(
                        save_path + ".preempt", state,
                        extra={"iterators": dict(loader.iterators)}):
                    if verbose:
                        print(f"preemption checkpoint written at iter {it}")
                    break
                t0 = time.perf_counter()
                state, metrics = run_step(state, item, it < finetune_start)
                last_loss = float(metrics["loss"])   # sync = step boundary
                step_ms = (time.perf_counter() - t0) * 1000.0
                it += 1

                if it % pad == 0:
                    loss_hist.append(it, last_loss, step_ms)
                    loss_hist.flush()
                    tb.scalar("train/loss", last_loss, it)
                    tb.scalar("train/step_ms", step_ms, it)
                    if verbose:
                        print(f"iter {it}/{max_iter} loss {last_loss:.4f} "
                              f"({step_ms:.1f} ms)")

                if it % eval_every == 0 or it == max_iter:
                    results = eval_split(
                        model, eval_vars(state), loader, split=1,
                        batch_size=cfg.eval_val_batch_size,
                        preprocess=preprocess,
                        eval_loss_fn=lambda v, x, g: eval_loss(state, x, g))
                    is_best = res_hist.append(it, results)
                    res_hist.flush()
                    tb.scalars(results.get("ap_results", {}), it,
                               prefix="val/")
                    tb.flush()
                    if verbose:
                        print(f"eval@{it}: {results['ap_results']} "
                              f"best={is_best}")
                    if is_best:
                        ckptlib.save_checkpoint(
                            save_path, state,
                            extra={"iterators": dict(loader.iterators)})
    finally:
        tb.close()
    # Final test-split eval; beam sweep 1-5 like the reference drivers.
    final = {}
    if loader.split_ix[2]:
        final["greedy"] = eval_split(
            model, eval_vars(state), loader, split=2,
            batch_size=cfg.eval_val_batch_size, preprocess=preprocess,
            return_records=True)
        if cfg.use_beam:
            for k in range(1, 6):
                final[f"beam_{k}"] = eval_split(
                    model, eval_vars(state), loader, split=2,
                    batch_size=cfg.eval_val_batch_size,
                    preprocess=preprocess, use_beam=True, beam_size=k,
                    return_records=True)
    return {
        "iters": it,
        "max_iter": max_iter,
        "final_loss": last_loss,
        "best_val_score": res_hist.best_score,
        "best_iter": res_hist.best_iter,
        "final_test": final,
        "loss_file": loss_file,
        "result_file": result_file,
        "save_path": save_path,
        "state": state,
        "model": model,
        "loader": loader,
    }

"""Optimizers and LR schedules (optax), reproducing the reference's
training-loop semantics:

- Adam/AdamW with the reference's betas/eps/weight-decay per config
  (`AlexCap/LSTM_opts.py:26-31`, `train_Transformer.py:72-83`).
- Optional warmup→cosine schedule to `min_lr` (the `setup_scheduler`
  LambdaLR in every driver, `train_LSTM.py:57-75`).
- Global-norm gradient clipping at 1.0 when `clip_grad`
  (`train_LSTM.py:86-87`).
- Two param groups split at the encoder boundary: the CNN is frozen
  (zero updates) until `finetune_start_step`, then trains at the main
  lr — the reference's unfreeze-after-one-epoch switch
  (`train_LSTM.py:101-105`) expressed as a schedule so the whole run
  stays one compiled step function.
- The Transformer driver's quirk — encoder group at base lr=0 *with*
  weight_decay=lr (`train_Transformer.py:79-83`) — freezes the encoder
  for the ENTIRE run: LambdaLR scales the group's base lr, so it stays
  0 even after `requires_grad_(True)` at the finetune boundary, and
  torch AdamW's decay (`p *= 1 - lr*wd`) is killed by lr=0 too. The
  faithful reproduction is a hard zero encoder group for the whole run
  (while post-boundary encoder grads still feed the GLOBAL clip norm,
  exactly as torch's clip_grad_norm_ sees them).
- The pretrained ViT-B encoder is `requires_grad=False` for the whole
  run (`VitbModel.py:162-166`); torch optimizers skip grad-less params
  — no update, no decay — reproduced with a hard `set_to_zero` group.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_cosine(lr: float, min_lr: float, warmup_steps: int,
                  total_steps: int) -> Callable:
    """Linear warmup 0→lr then cosine decay lr→min_lr."""
    warmup_steps = max(warmup_steps, 1)
    decay_steps = max(total_steps - warmup_steps, 1)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.cosine_decay_schedule(lr, decay_steps, alpha=min_lr / lr)],
        boundaries=[warmup_steps])


def encoder_label_fn(params) -> dict:
    """Label the encoder subtree ('features' CNN trunk or 'encoder_vit'
    ViT-B) as 'encoder', rest 'head'."""
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "encoder" if top in ("features", "encoder_vit") else "head"
    return jax.tree_util.tree_map_with_path(label, params)


def gate_until(inner: optax.GradientTransformation,
               boundary: int) -> optax.GradientTransformation:
    """Make `inner` a complete no-op — zero updates, state untouched,
    no moment/bias-correction advance — for the first `boundary` update
    calls. This is torch's `requires_grad_(False)` phase, where the
    optimizer never *sees* the frozen params (train_LSTM.py:48-54): at
    the unfreeze (train_LSTM.py:101-105) Adam's moments and step count
    start from scratch. An lr=0 mask is NOT equivalent: it would keep
    advancing the bias-correction count and accumulating weight-decay
    into the moments during the frozen phase."""

    def init(params):
        return (jnp.zeros([], jnp.int32), inner.init(params))

    def update(updates, state, params=None):
        count, inner_state = state
        on = count >= boundary
        new_u, new_s = inner.update(updates, inner_state, params)
        out_u = jax.tree.map(
            lambda n: jnp.where(on, n, jnp.zeros_like(n)), new_u)
        out_s = jax.tree.map(lambda n, o: jnp.where(on, n, o),
                             new_s, inner_state)
        return out_u, (count + 1, out_s)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg, total_steps: int,
                   finetune_start_step: int = 0) -> optax.GradientTransformation:
    """Build the full update chain for a CaptionConfig."""
    if cfg.use_scheduler:
        warmup = max(2 * total_steps // max(cfg.num_epochs, 1), 1)
        schedule = warmup_cosine(cfg.learning_rate, cfg.min_lr, warmup,
                                 total_steps)
    else:
        schedule = cfg.learning_rate

    is_adamw = cfg.model_type in ("transformer", "vitb")

    def adam_parts(wd):
        """Moments + decay, WITHOUT the lr scaling (so the frozen-phase
        gate can wrap them while the lr schedule keeps global time)."""
        moments = optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2,
                                      eps=cfg.eps)
        if is_adamw:
            # torch AdamW: p -= lr*(m_hat/(sqrt(v_hat)+eps) + wd*p)
            return optax.chain(moments, optax.add_decayed_weights(wd))
        # torch `Adam(..., weight_decay=wd)` = additive L2 on the grad
        # BEFORE the Adam moments (train_LSTM.py:59), not AdamW.
        return optax.chain(optax.add_decayed_weights(wd), moments)

    def adam(lr_schedule, wd):
        return optax.chain(adam_parts(wd),
                           optax.scale_by_learning_rate(lr_schedule))

    head_tx = adam(schedule, cfg.weight_decay)

    if cfg.model_type == "vitb" and cfg.trained_encoder:
        # Pretrained ViT-B encoder is frozen for the WHOLE run
        # (VitbModel.py:162-166, requires_grad=False). torch optimizers
        # skip grad-less params entirely — no update and, crucially, no
        # AdamW decay — so the encoder group must be a hard zero, not
        # an lr=0 AdamW (which would still decay the frozen weights).
        enc_tx = optax.set_to_zero()
    elif cfg.model_type == "transformer":
        # The reference's encoder AdamW group has base lr=0 for the
        # whole run and LambdaLR scales that base
        # (train_Transformer.py:79-83) — so the unfreeze at the finetune
        # boundary (requires_grad_(True), :125-129) never produces an
        # encoder update, and lr=0 kills the AdamW decay as well. The
        # CNN is effectively frozen forever; reproduce with a hard zero.
        # (The driver still switches to the grad-carrying model at the
        # boundary so post-boundary encoder grads enter the GLOBAL clip
        # norm, exactly as torch's clip_grad_norm_ sees them.)
        enc_tx = optax.set_to_zero()
    elif cfg.finetune_cnn and finetune_start_step > 0:
        # Frozen-CNN phase: the encoder's moments/decay are fully gated
        # (see gate_until), while the lr schedule stays on GLOBAL time —
        # torch's scheduler ticks for all param groups, so at unfreeze
        # the encoder trains at the CURRENT scheduled lr, with fresh
        # Adam moments. (Gradients are already exactly zero here via the
        # driver's stop-gradient frozen_model, so the global-norm clip
        # sees head-only norms, like torch's clip over grad-None-skipped
        # params.)
        enc_tx = optax.chain(
            gate_until(adam_parts(cfg.weight_decay), finetune_start_step),
            optax.scale_by_learning_rate(schedule))
    elif cfg.finetune_cnn:
        enc_tx = adam(schedule, cfg.weight_decay)
    else:
        enc_tx = optax.set_to_zero()

    tx = optax.multi_transform({"encoder": enc_tx, "head": head_tx},
                               encoder_label_fn)
    if cfg.clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    if getattr(cfg, "grad_accum_steps", 1) > 1:
        # Accumulate k micro-batch grads, average, then run the whole
        # chain (clip sees the averaged grad — identical to one k×-sized
        # batch). Schedules count applied updates, not micro-steps.
        tx = optax.MultiSteps(
            tx, every_k_schedule=cfg.grad_accum_steps
        ).gradient_transformation()
    return tx

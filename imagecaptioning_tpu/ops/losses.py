"""Loss functions, behavior-compatible with the reference's criteria.

- `smoothed_cross_entropy`: torch `nn.CrossEntropyLoss(reduction='mean',
  ignore_index=0, label_smoothing=0.1)` over flattened (N*T, C) logits
  (reference `AlexCap/CustomLoss.py:7-14`). Parity is pinned by
  tests/test_losses.py against torch CPU.
- `temporal_cross_entropy`: DenseCap's masked gather CE
  (`DenseCap/densecap/LSTMLoss.py:4-26`).
- `sum_cross_entropy`: DenseCap's `CustomCrossEntropyLoss` — CE summed
  over non-NULL then divided by total element count
  (`LSTMLoss.py:28-40`).
- `doubly_stochastic_regularizer`: Show-Attend-Tell attention penalty
  `((1 - sum_t alpha)²).mean()` (`AlexCap/LSTMwAttentionModel.py:59-60`).
- `logistic_criterion`: numerically-stable objectness loss
  (`DenseCap/densecap/LogisticCriterion.py:17-30`).
- `box_regression_loss`: masked smooth-L1 on inverted box transforms
  (`DenseCap/densecap/BoxRegressionCriterion.py`).

All are pure functions computing in float32 regardless of input compute
dtype — loss reductions are tiny and precision-sensitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_cross_entropy(logits: jnp.ndarray,
                           targets: jnp.ndarray,
                           ignore_index: int = 0,
                           label_smoothing: float = 0.1) -> jnp.ndarray:
    """Label-smoothed CE, mean over non-ignored positions (torch parity).

    torch semantics: per-sample loss = (1-eps) * nll + eps * mean_c(-logp_c),
    averaged over samples whose target != ignore_index.
    """
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    logits2d = logits.reshape(-1, c)
    targets1d = targets.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits2d, axis=-1)
    nll = -jnp.take_along_axis(logp, targets1d[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    per = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    mask = (targets1d != ignore_index).astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)
    return (per * mask).sum() / denom


def temporal_cross_entropy(logits: jnp.ndarray,
                           targets: jnp.ndarray,
                           null_token: int = 0) -> jnp.ndarray:
    """Masked CE averaged over non-NULL timesteps (no smoothing) —
    DenseCap `TemporalCrossEntropyLoss` behavior."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    mask = (targets != null_token).astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def sum_cross_entropy(logits: jnp.ndarray,
                      targets: jnp.ndarray,
                      null_token: int = 0) -> jnp.ndarray:
    """CE summed over non-NULL positions divided by the number of
    non-NULL positions — DenseCap `CustomCrossEntropyLoss`
    (LSTMLoss.py:28-40: `size = target.nonzero().numel() / 2` is the
    non-zero count for a 2D target; differential-tested against the
    reference module)."""
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.reshape(-1, c), axis=-1)
    t1d = targets.reshape(-1).astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, t1d[:, None], axis=-1)[:, 0]
    mask = (t1d != null_token).astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def temporal_sum_cross_entropy(logits: jnp.ndarray,
                               targets: jnp.ndarray,
                               null_token: int = 0,
                               batch_average: bool = True,
                               time_average: bool = False) -> jnp.ndarray:
    """DenseCap's `TemporalCrossEntropyLoss` (LSTMLoss.py:4-26, unused
    in its live graph): masked NLL SUMMED, divided by N (batch_average)
    and/or T (time_average) — not by the non-null count."""
    logits = logits.astype(jnp.float32)
    n, t = targets.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    nll = jnp.where(targets != null_token, nll, 0.0)
    total = nll.sum()
    if batch_average:
        total = total / n
    if time_average:
        total = total / t
    return total


def log_softmax_nll(logits: jnp.ndarray,
                    targets: jnp.ndarray,
                    weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Plain LogSoftmax + NLL with optional per-class weights — the
    reference's `OurCrossEntropyCriterion` (declared but unused in its
    graph, `DenseCap/densecap/OurCrossEntropyCriterion.py:4-14`).

    torch `NLLLoss(weight=w)` semantics: weighted sum of per-sample NLL
    divided by the sum of the weights of the realized targets.
    """
    logits = logits.astype(jnp.float32)
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.reshape(-1, c), axis=-1)
    t1d = targets.reshape(-1).astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, t1d[:, None], axis=-1)[:, 0]
    if weights is None:
        return nll.mean()
    w = weights.astype(jnp.float32)[t1d]
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-12)


def doubly_stochastic_regularizer(alphas: jnp.ndarray) -> jnp.ndarray:
    """((1 - sum_t alpha_{t,p})^2).mean() over batch and positions —
    encourages total attention mass ~1 at every spatial position."""
    alphas = alphas.astype(jnp.float32)
    return jnp.mean((1.0 - alphas.sum(axis=1)) ** 2)


def logistic_criterion(scores: jnp.ndarray,
                       labels: jnp.ndarray) -> jnp.ndarray:
    """Stable logistic loss: mean(log(1 + exp(-y * s))) with y in {-1, +1}
    (labels given as {0,1}). Equivalent to sigmoid BCE."""
    scores = scores.astype(jnp.float32).reshape(-1)
    y = 2.0 * labels.astype(jnp.float32).reshape(-1) - 1.0
    return jnp.mean(jax.nn.softplus(-y * scores))


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def box_regression_loss(pred_trans: jnp.ndarray,
                        target_trans: jnp.ndarray,
                        weight: float = 1.0,
                        valid_mask: jnp.ndarray | None = None,
                        max_trans: float = 10.0) -> jnp.ndarray:
    """Weighted smooth-L1 between predicted and target box transforms,
    zeroing rows where any |target| > max_trans (the reference's 'DIRTY
    HACK' mask, BoxRegressionCriterion.py:18-25). The reference zeroes
    the masked rows and then takes `nn.SmoothL1Loss()` (reduction
    'mean' over ALL elements), so masked rows still count in the
    denominator (differential-tested); padding rows (valid_mask=False,
    our static-shape addition) do not."""
    pred_trans = pred_trans.astype(jnp.float32)
    target_trans = target_trans.astype(jnp.float32)
    sane = jnp.all(jnp.abs(target_trans) <= max_trans, axis=-1)
    if valid_mask is not None:
        sane = jnp.logical_and(sane, valid_mask)
        denom = jnp.maximum(valid_mask.sum(), 1)
    else:
        denom = pred_trans.shape[0]
    per_box = smooth_l1(pred_trans - target_trans).mean(axis=-1)
    return weight * (per_box * sane).sum() / denom

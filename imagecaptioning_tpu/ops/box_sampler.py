"""Fixed-shape positive/negative box sampling for RPN training.

Reference semantics (`DenseCap/densecap/BoxSampler.py`): IoU of
proposals × GT; positives = IoU > 0.7 ∪ argmax-proposal-per-GT;
negatives = max-IoU < 0.3; out-of-bounds proposals excluded; sample
≤`num_pos` positives and fill the rest of the 256-box batch with
negatives (with replacement iff short). Data-dependent counts don't
compile, so here sampling is a masked, padded top-k over random keys:
every output slot carries an index + validity mask, and short classes
pad by repeating (the reference's replacement sampling).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from imagecaptioning_tpu.ops.boxes import box_iou


class SampleResult(NamedTuple):
    pos_idx: jnp.ndarray       # (num_pos,) indices into proposals
    pos_mask: jnp.ndarray      # (num_pos,) bool — real positive?
    pos_target_idx: jnp.ndarray  # (num_pos,) matched GT index
    neg_idx: jnp.ndarray       # (num_neg,)
    neg_mask: jnp.ndarray      # (num_neg,)


def _masked_random_topk(rng, mask, k, count_replacement: bool):
    """Pick ≤k True positions uniformly at random; pad by cycling the
    valid picks (replacement) when fewer than k exist. Padding slots are
    marked valid only when `count_replacement` — the reference counts
    replacement-sampled *negatives* multiple times in its losses
    (`BoxSampler.py:61-69` fills the batch with replacement iff short)
    but never duplicates positives (≤num_pos sampled without
    replacement)."""
    n = mask.shape[0]
    keys = jax.random.uniform(rng, (n,))
    keys = jnp.where(mask, keys, -1.0)
    _, idx = jax.lax.top_k(keys, k)
    count = mask.sum()
    slot_ok = jnp.arange(k) < count
    # replacement fill: cycle through the valid picks
    safe = jnp.where(count > 0, count, 1)
    wrapped = idx[jnp.arange(k) % safe]
    idx = jnp.where(slot_ok, idx, wrapped)
    any_valid = count > 0
    ok = jnp.logical_and(jnp.ones(k, bool) if count_replacement else slot_ok,
                         any_valid)
    return idx, ok


def candidate_masks(proposals: jnp.ndarray, gt: jnp.ndarray,
                    gt_mask: jnp.ndarray,
                    high_thresh: float = 0.7, low_thresh: float = 0.3,
                    in_bounds: jnp.ndarray | None = None):
    """The deterministic stage of `BoxSampler.forward` (:20-53):
    (pos_mask, neg_mask, argmax_gt) over all proposals. Reference
    semantics, differential-tested:

    - pos = IoU > high ∧ in-bounds, neg = max-IoU < low ∧ in-bounds;
    - the argmax proposal PER GT is then forced positive (and cleared
      from neg) even when out of bounds — the reference applies
      `pos_mask[target_idx] = 1` AFTER its bounds zeroing (:42-44);
    - if no negatives qualify, EVERY proposal becomes a negative
      candidate — the reference's `neg.mul(-pos).add(1)` on an all-zero
      neg mask is identically 1, positives included (:52-53)."""
    iou = box_iou(proposals, gt)                       # (N, M)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    max_iou = iou.max(axis=1)
    argmax_gt = iou.argmax(axis=1)

    ok = jnp.ones(proposals.shape[0], bool) if in_bounds is None else in_bounds
    pos_mask = jnp.logical_and(max_iou > high_thresh, ok)
    neg_mask = jnp.logical_and(max_iou < low_thresh, ok)
    # argmax proposal per GT forced positive — over ALL proposals,
    # bounds notwithstanding. Scatter with max(): padded GT rows all
    # target index 0 with False and must not erase a real GT's True
    # (duplicate-index .set() order is unspecified).
    best_prop = jnp.where(gt_mask, jnp.argmax(iou, axis=0), 0)
    force = jnp.zeros(pos_mask.shape, jnp.int32).at[best_prop].max(
        gt_mask.astype(jnp.int32)) > 0
    pos_mask = jnp.logical_or(pos_mask, force)
    neg_mask = jnp.logical_and(neg_mask, jnp.logical_not(pos_mask))
    # no negatives at all → every proposal becomes a negative candidate
    # (the reference's 0*(-pos)+1 == 1 everywhere, positives included)
    neg_mask = jnp.where(neg_mask.sum() == 0,
                         jnp.ones_like(neg_mask), neg_mask)
    return pos_mask, neg_mask, argmax_gt


@partial(jax.jit, static_argnames=("num_pos", "num_neg"))
def sample_boxes(rng: jax.Array, proposals: jnp.ndarray, gt: jnp.ndarray,
                 gt_mask: jnp.ndarray,
                 num_pos: int = 128, num_neg: int = 128,
                 high_thresh: float = 0.7, low_thresh: float = 0.3,
                 in_bounds: jnp.ndarray | None = None) -> SampleResult:
    """proposals (N, 4), gt (M, 4) xcycwh with gt_mask marking real GT
    rows (padded GT slabs stay static). Returns fixed-shape samples."""
    pos_mask, neg_mask, argmax_gt = candidate_masks(
        proposals, gt, gt_mask, high_thresh, low_thresh, in_bounds)

    r1, r2 = jax.random.split(rng)
    pos_idx, pos_ok = _masked_random_topk(r1, pos_mask, num_pos,
                                          count_replacement=False)
    neg_idx, neg_ok = _masked_random_topk(r2, neg_mask, num_neg,
                                          count_replacement=True)
    return SampleResult(pos_idx, pos_ok, argmax_gt[pos_idx],
                        neg_idx, neg_ok)

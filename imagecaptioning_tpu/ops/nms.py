"""Fixed-budget non-maximum suppression under jit.

The reference calls `torchvision.ops.nms` with dynamic output size
(`DenseCap/densecap/LocalizationLayer.py:228-234`). TPU needs static
shapes, so this NMS returns exactly `max_out` indices plus a validity
mask: the standard O(N²) formulation — precompute the pairwise IoU
matrix (one MXU-friendly batched op), then greedily select with a
`lax.fori_loop` over the fixed output budget.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from imagecaptioning_tpu.ops.boxes import box_iou


@partial(jax.jit, static_argnames=("max_out",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
        max_out: int, valid: jnp.ndarray | None = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """boxes (N, 4) xcycwh, scores (N,) → (indices (max_out,),
    keep_mask (max_out,)). Invalid inputs (valid=False) never selected."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    neg = jnp.float32(-jnp.inf)
    s = scores.astype(jnp.float32)
    if valid is not None:
        s = jnp.where(valid, s, neg)

    def body(i, carry):
        live_scores, out_idx, out_ok = carry
        best = jnp.argmax(live_scores)
        ok = live_scores[best] > neg
        out_idx = out_idx.at[i].set(jnp.where(ok, best, 0))
        out_ok = out_ok.at[i].set(ok)
        # suppress the pick and everything overlapping it
        suppress = jnp.logical_or(iou[best] > iou_thresh,
                                  jnp.arange(n) == best)
        live_scores = jnp.where(jnp.logical_and(ok, suppress), neg,
                                live_scores)
        return live_scores, out_idx, out_ok

    out_idx = jnp.zeros(max_out, jnp.int32)
    out_ok = jnp.zeros(max_out, bool)
    _, out_idx, out_ok = jax.lax.fori_loop(0, max_out, body,
                                           (s, out_idx, out_ok))
    return out_idx, out_ok

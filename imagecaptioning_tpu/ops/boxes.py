"""Box geometry ops — pure jnp (reference `DenseCap/densecap/
box_utils.py`, `ApplyBoxTransform.py`, `InvertBoxTransform.py`,
`BoxIoU.py`, `MakeAnchors.py`).

All functions are shape-polymorphic pure functions over (..., 4)
arrays; coordinate conventions follow the reference: `xcycwh` is
(x_center, y_center, w, h) with 1-indexed pixel coords from the
preprocessor, `x1y1x2y2` corners, `xywh` top-left + size.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# --------------------------------------------------------- conversions

def xcycwh_to_x1y1x2y2(boxes: jnp.ndarray) -> jnp.ndarray:
    xc, yc, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [xc - (w - 1) / 2, yc - (h - 1) / 2,
         xc + (w - 1) / 2, yc + (h - 1) / 2], axis=-1)


def x1y1x2y2_to_xcycwh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1 + 1, y2 - y1 + 1], axis=-1)


def xcycwh_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    xc, yc, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([xc - (w - 1) / 2, yc - (h - 1) / 2, w, h],
                           axis=-1)


def xywh_to_xcycwh(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x + (w - 1) / 2, y + (h - 1) / 2, w, h], axis=-1)


# ----------------------------------------------------------------- IoU

def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xcycwh boxes: (N, 4) × (M, 4) → (N, M)."""
    a = xcycwh_to_x1y1x2y2(a)
    b = xcycwh_to_x1y1x2y2(b)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


# ------------------------------------------------------------ clipping

def clip_boxes(boxes: jnp.ndarray, h: int, w: int,
               fmt: str = "xcycwh"):
    """Clip to [1, W]×[1, H] (1-indexed like the reference) and return
    (clipped, valid_mask) where valid = positive area after clipping
    (reference clip_boxes, box_utils.py:132-159)."""
    if fmt == "xcycwh":
        corners = xcycwh_to_x1y1x2y2(boxes)
    else:
        corners = boxes
    x1 = jnp.clip(corners[..., 0], 1, w)
    y1 = jnp.clip(corners[..., 1], 1, h)
    x2 = jnp.clip(corners[..., 2], 1, w)
    y2 = jnp.clip(corners[..., 3], 1, h)
    clipped = jnp.stack([x1, y1, x2, y2], axis=-1)
    valid = jnp.logical_and(x2 > x1, y2 > y1)
    if fmt == "xcycwh":
        clipped = x1y1x2y2_to_xcycwh(clipped)
    return clipped, valid


# ------------------------------------------------- anchor box machinery

def make_anchors(anchor_wh: jnp.ndarray, x0: float, y0: float,
                 sx: float, sy: float, hf: int, wf: int) -> jnp.ndarray:
    """(k, 2) anchor sizes + conv field-center arithmetic → (k, Hf, Wf, 4)
    xcycwh anchor grid (reference MakeAnchors.py:14-30)."""
    xs = x0 + sx * jnp.arange(wf, dtype=jnp.float32)
    ys = y0 + sy * jnp.arange(hf, dtype=jnp.float32)
    xc = jnp.broadcast_to(xs[None, None, :], (anchor_wh.shape[0], hf, wf))
    yc = jnp.broadcast_to(ys[None, :, None], (anchor_wh.shape[0], hf, wf))
    w = jnp.broadcast_to(anchor_wh[:, 0, None, None],
                         (anchor_wh.shape[0], hf, wf))
    h = jnp.broadcast_to(anchor_wh[:, 1, None, None],
                         (anchor_wh.shape[0], hf, wf))
    return jnp.stack([xc, yc, w, h], axis=-1)


def apply_box_transform(anchors: jnp.ndarray,
                        trans: jnp.ndarray,
                        max_log_scale: Optional[float] = None) -> jnp.ndarray:
    """(tx, ty, tw, th) deltas → boxes: x = xa + tx·wa, w = wa·exp(tw)
    (reference ApplyBoxTransform.py:42-46).

    `max_log_scale` clips tw/th before the exp (Detectron-style
    scale clamp). The reference's forward is unclamped but its
    regression criterion already discards |t| > 10 as garbage
    (BoxRegressionCriterion.py:18-25, the "DIRTY HACK"); clamping the
    forward at the same threshold keeps the two consistent and stops
    exp overflow → NaN at aggressive learning rates. None = reference
    behavior."""
    xa, ya, wa, ha = jnp.split(anchors, 4, axis=-1)
    tx, ty, tw, th = jnp.split(trans, 4, axis=-1)
    if max_log_scale is not None:
        tw = jnp.clip(tw, -max_log_scale, max_log_scale)
        th = jnp.clip(th, -max_log_scale, max_log_scale)
    return jnp.concatenate(
        [xa + tx * wa, ya + ty * ha, wa * jnp.exp(tw), ha * jnp.exp(th)],
        axis=-1)


def make_boxes(trans_maps: jnp.ndarray, anchor_wh: jnp.ndarray,
               x0: float, y0: float, sx: float, sy: float):
    """Fused anchors+deltas → proposal boxes: the legacy `MakeBoxes`
    module (reference `DenseCap/densecap/MakeBoxes.py:26-66`, unused in
    the committed graph — the live path composes MakeAnchors +
    ApplyBoxTransform; this fused form is kept for inventory parity and
    is exactly their composition).

    trans_maps: (N, 4k, H, W) box-delta maps from the RPN head;
    anchor_wh: (k, 2) anchor sizes. Returns (boxes, raw_anchors), each
    (N, k*H*W, 4) xcycwh, matching the reference's output layout.
    """
    n, c4k, hf, wf = trans_maps.shape
    k = c4k // 4
    t = trans_maps.reshape(n, k, 4, hf, wf)
    anchors = make_anchors(anchor_wh, x0, y0, sx, sy, hf, wf)  # (k,H,W,4)
    anchors = jnp.broadcast_to(anchors[None], (n, k, hf, wf, 4))
    trans = jnp.moveaxis(t, 2, -1)                             # (N,k,H,W,4)
    boxes = apply_box_transform(anchors, trans)
    return (boxes.reshape(n, k * hf * wf, 4),
            anchors.reshape(n, k * hf * wf, 4))


def invert_box_transform(anchors: jnp.ndarray,
                         boxes: jnp.ndarray) -> jnp.ndarray:
    """Regression targets: the deltas mapping anchors onto target boxes
    (reference InvertBoxTransform.py:20-25)."""
    xa, ya, wa, ha = jnp.split(anchors, 4, axis=-1)
    xb, yb, wb, hb = jnp.split(boxes, 4, axis=-1)
    eps = 1e-8
    return jnp.concatenate(
        [(xb - xa) / jnp.maximum(wa, eps),
         (yb - ya) / jnp.maximum(ha, eps),
         jnp.log(jnp.maximum(wb, eps) / jnp.maximum(wa, eps)),
         jnp.log(jnp.maximum(hb, eps) / jnp.maximum(ha, eps))], axis=-1)


def field_centers(num_pools: int, kernel_stride_pairs=None):
    """Receptive-field center arithmetic for a VGG-ish trunk: each conv
    3x3 pad 1 keeps (x0, sx); each 2x2 maxpool does x0 += sx/2, sx *= 2
    (reference net_utils.compute_field_centers:58-82)."""
    x0 = y0 = 1.0
    sx = sy = 1.0
    for _ in range(num_pools):
        x0, y0 = x0 + sx / 2, y0 + sy / 2
        sx, sy = sx * 2, sy * 2
    return x0, y0, sx, sy


def merge_boxes_host(boxes, iou_thresh: float = 0.7):
    """Greedy IoU clustering used by the eval protocol (reference
    box_utils.merge_boxes:188-204). Host-side numpy: returns
    (merged_boxes, cluster_assignment)."""
    import numpy as np
    boxes = np.asarray(boxes, dtype=np.float64)
    n = boxes.shape[0]
    assignment = -np.ones(n, dtype=np.int64)
    centers = []
    iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(n):
        if assignment[i] >= 0:
            continue
        members = [j for j in range(n)
                   if assignment[j] < 0 and iou[i, j] >= iou_thresh]
        cid = len(centers)
        for j in members:
            assignment[j] = cid
        centers.append(boxes[members].mean(axis=0))
    return np.stack(centers), assignment

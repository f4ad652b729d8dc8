"""Bilinear ROI pooling — the DenseCap hot kernel, TPU-native.

The reference pools each region with BoxToAffine → `F.affine_grid` →
`F.grid_sample` (`DenseCap/densecap/BilinearRoiPooling.py:41-55`,
`BoxToAffine.py:40-43`), i.e. a per-pixel gather. Gathers are slow on
TPU; the TPU-native formulation is *separable interpolation as two
small matmuls*:

    out[b] = Ry[b] @ F @ Cx[b]^T        (per channel)

where Ry (out_h, H) and Cx (out_w, W) hold each output row/column's
two bilinear weights against the feature grid. That turns the whole op
into batched dense matmuls the MXU executes directly — and it is
trivially differentiable, so the backward pass is two more matmuls.

Semantics match torch `affine_grid/grid_sample(align_corners=False,
padding_mode='zeros')` with θ from the reference's BoxToAffine:
θ_t = (2c − 1 − S)/(S − 1), θ_s = s/S (boxes are xcycwh in 1-indexed
image coords; the feature grid is sampled in normalized coords).

Two implementations:
- `roi_align(...)`: the einsum form — XLA lowers it to MXU matmuls;
  used everywhere (CPU tests included).
- `roi_align_pallas(...)`: an explicit fused Pallas kernel (one grid
  step per box block; weights computed in-kernel in VMEM, two `pl.dot`s)
  for maximum control on TPU. Forward-only custom_vjp wraps the einsum
  backward.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _interp_weights(centers: jnp.ndarray, scales: jnp.ndarray,
                    out_size: int, in_size: int, image_size: float):
    """Per-box bilinear weight matrix (B, out_size, in_size).

    centers/scales: (B,) box center and size in image coords.
    For output index j, the affine grid (align_corners=False) gives the
    normalized coord u_j = θ_s * g_j + θ_t with g_j = (2j + 1)/out − 1,
    which grid_sample maps to feature pixel p_j = ((u_j + 1) * in − 1)/2.
    Weight row j holds (1 − frac) at floor(p_j), frac at floor(p_j) + 1,
    zero-padded outside [0, in).
    """
    theta_t = (2.0 * centers - 1.0 - image_size) / (image_size - 1.0)
    theta_s = scales / image_size
    j = (2.0 * jnp.arange(out_size, dtype=jnp.float32) + 1.0) / out_size - 1.0
    u = theta_s[:, None] * j[None, :] + theta_t[:, None]       # (B, out)
    p = ((u + 1.0) * in_size - 1.0) / 2.0
    p0 = jnp.floor(p)
    frac = p - p0
    idx = jnp.arange(in_size, dtype=jnp.float32)
    w_lo = jnp.where(idx[None, None, :] == p0[..., None], 1.0 - frac[..., None], 0.0)
    w_hi = jnp.where(idx[None, None, :] == p0[..., None] + 1.0, frac[..., None], 0.0)
    return w_lo + w_hi                                          # (B, out, in)


def roi_weights(boxes: jnp.ndarray, image_hw: Tuple[float, float],
                feat_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    """boxes (B, 4) xcycwh → (Ry (B, oh, Hf), Cx (B, ow, Wf))."""
    ih, iw = image_hw
    fh, fw = feat_hw
    oh, ow = out_hw
    xc, yc, w, h = [boxes[:, i] for i in range(4)]
    ry = _interp_weights(yc, h, oh, fh, float(ih))
    cx = _interp_weights(xc, w, ow, fw, float(iw))
    return ry, cx


@partial(jax.jit, static_argnames=("out_hw", "image_hw"))
def roi_align(features: jnp.ndarray, boxes: jnp.ndarray,
              image_hw: Tuple[float, float],
              out_hw: Tuple[int, int] = (7, 7)) -> jnp.ndarray:
    """features (Hf, Wf, C), boxes (B, 4) xcycwh in image coords →
    (B, oh, ow, C). Pure einsum — two MXU matmuls per box."""
    ry, cx = roi_weights(boxes, image_hw, features.shape[:2], out_hw)
    f = features.astype(jnp.float32)
    tmp = jnp.einsum("byh,hwc->bywc", ry, f,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("bxw,bywc->byxc", cx, tmp,
                      preferred_element_type=jnp.float32)


# ------------------------------------------------------- Pallas kernel

def _roi_core(ry, cx, f2, out_ref):
    """One box: out = Ry @ F_2d @ Cx^T reshaped. ry (oh, Hf),
    cx (ow, Wf), f2 (Hf, Wf*C) viewed as (Hf, Wf, C) row-major."""
    oh, ow = ry.shape[0], cx.shape[0]
    hf, wfc = f2.shape
    wf = cx.shape[1]
    c = wfc // wf
    # rows: (oh, Wf*C)
    rows = jax.lax.dot(ry, f2, preferred_element_type=jnp.float32)
    rows3 = rows.reshape(oh, wf, c)
    # cols: contract Wf with cx → (oh, ow, C)
    out = jax.lax.dot_general(
        cx, rows3,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (ow, oh, C)
    out_ref[0] = jnp.swapaxes(out, 0, 1).reshape(oh, ow * c)


def _roi_kernel(ry_ref, cx_ref, f_ref, out_ref):
    _roi_core(ry_ref[0], cx_ref[0], f_ref[:], out_ref)


def roi_align_pallas_fwd(features: jnp.ndarray, boxes: jnp.ndarray,
                         image_hw: Tuple[float, float],
                         out_hw: Tuple[int, int] = (7, 7),
                         interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hf, wf, c = features.shape
    oh, ow = out_hw
    b = boxes.shape[0]
    ry, cx = roi_weights(boxes, image_hw, (hf, wf), out_hw)
    f2 = features.astype(jnp.float32).reshape(hf, wf * c)

    return pl.pallas_call(
        _roi_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, oh, hf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow, wf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hf, wf * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow * c), jnp.float32),
        interpret=interpret,
    )(ry, cx, f2).reshape(b, oh, ow, c)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_align_pallas(features, boxes, image_hw, out_hw=(7, 7)):
    return roi_align_pallas_fwd(features, boxes, image_hw, out_hw)


def _fwd(features, boxes, image_hw, out_hw):
    out = roi_align_pallas_fwd(features, boxes, image_hw, out_hw)
    return out, (features, boxes)


def _bwd(image_hw, out_hw, res, g):
    features, boxes = res
    # Differentiate the einsum formulation (same math as the kernel) wrt
    # BOTH features and boxes: grid_sample is differentiable in the box
    # coordinates, and the reference's RPN trains end-to-end through the
    # bilinear sampler (DenseCap's core idea) — box grads must not be
    # dropped.
    _, vjp = jax.vjp(
        lambda f, b: roi_align(f, b, image_hw, out_hw), features, boxes)
    d_features, d_boxes = vjp(g.astype(jnp.float32))
    return d_features.astype(features.dtype), d_boxes.astype(boxes.dtype)


roi_align_pallas.defvjp(_fwd, _bwd)


def roi_align_batch(features: jnp.ndarray, boxes: jnp.ndarray,
                    image_hw: Tuple[float, float],
                    out_hw: Tuple[int, int] = (7, 7)) -> jnp.ndarray:
    """vmapped multi-image variant: features (N, Hf, Wf, C),
    boxes (N, B, 4) → (N, B, oh, ow, C)."""
    return jax.vmap(lambda f, bx: roi_align(f, bx, image_hw, out_hw))(
        features, boxes)


def roi_align_batch_pallas_fwd(features: jnp.ndarray, boxes: jnp.ndarray,
                               image_hw: Tuple[float, float],
                               out_hw: Tuple[int, int] = (7, 7),
                               interpret: bool = False) -> jnp.ndarray:
    """Multi-image Pallas forward: features (N, Hf, Wf, C), boxes
    (N, R, 4) → (N, R, oh, ow, C). One grid step per (image, box): the
    grid index maps each step's feature block to its image — no vmap
    batching rule needed, and each box's two `pl.dot`s hit the MXU with
    its image's map already resident in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hf, wf, c = features.shape
    r = boxes.shape[1]
    oh, ow = out_hw
    ry, cx = jax.vmap(
        lambda bx: roi_weights(bx, image_hw, (hf, wf), out_hw))(boxes)
    ry = ry.reshape(n * r, oh, hf)
    cx = cx.reshape(n * r, ow, wf)
    f2 = features.astype(jnp.float32).reshape(n, hf, wf * c)

    def kernel(ry_ref, cx_ref, f_ref, out_ref):
        _roi_core(ry_ref[0], cx_ref[0], f_ref[0], out_ref)

    out = pl.pallas_call(
        kernel,
        grid=(n * r,),
        in_specs=[
            pl.BlockSpec((1, oh, hf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow, wf), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hf, wf * c), lambda i: (i // r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * r, oh, ow * c), jnp.float32),
        interpret=interpret,
    )(ry, cx, f2)
    return out.reshape(n, r, oh, ow, c)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_align_batch_pallas(features, boxes, image_hw, out_hw=(7, 7)):
    """Differentiable batched Pallas ROI pooling (einsum backward)."""
    return roi_align_batch_pallas_fwd(features, boxes, image_hw, out_hw)


def _bfwd(features, boxes, image_hw, out_hw):
    return (roi_align_batch_pallas_fwd(features, boxes, image_hw, out_hw),
            (features, boxes))


def _bbwd(image_hw, out_hw, res, g):
    features, boxes = res
    # Same as _bwd: einsum-composition VJP wrt features AND boxes (the
    # RPN trains through the sampler's box coordinates).
    _, vjp = jax.vjp(
        lambda f, b: roi_align_batch(f, b, image_hw, out_hw),
        features, boxes)
    d_features, d_boxes = vjp(g.astype(jnp.float32))
    return d_features.astype(features.dtype), d_boxes.astype(boxes.dtype)


roi_align_batch_pallas.defvjp(_bfwd, _bbwd)

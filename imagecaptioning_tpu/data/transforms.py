"""Device-side image preprocessing, fused into the jitted step.

The reference applies torchvision's `ResNet101_Weights.IMAGENET1K_V2
.transforms()` on the host per batch (`AlexCap/MyDataLoader.py:38,86`):
bilinear resize of the short side to 232 (antialiased), center crop
224, scale to [0,1], ImageNet normalize. DenseCap/AlexGTModel use plain
ToTensor + ImageNet normalize (`DenseCap/densecap/DataLoader.py:57-58`).

TPU-first design: ship the *uint8* pixels to the device (4x less PCIe
traffic than fp32) and run resize/crop/normalize inside the jitted
train step so XLA fuses them with the first conv. `jax.image.resize`
with 'linear' matches torchvision's antialiased bilinear for
downscaling (kernel scaled by the resize factor).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_short_side(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Resize (B, H, W, C) so the shorter side == size, keeping aspect.
    Shapes are static, so the target dims are computed at trace time."""
    _, h, w, c = images.shape
    if h <= w:
        new_h, new_w = size, max(1, round(size * w / h))
    else:
        new_h, new_w = max(1, round(size * h / w)), size
    return jax.image.resize(images,
                            (images.shape[0], new_h, new_w, c),
                            method="linear", antialias=True)


def center_crop(images: jnp.ndarray, crop: int) -> jnp.ndarray:
    _, h, w, _ = images.shape
    top = (h - crop) // 2
    left = (w - crop) // 2
    return images[:, top:top + crop, left:left + crop, :]


def normalize(images: jnp.ndarray,
              mean: Tuple[float, ...] = IMAGENET_MEAN,
              std: Tuple[float, ...] = IMAGENET_STD) -> jnp.ndarray:
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


@partial(jax.jit, static_argnames=("resize_size", "crop_size", "dtype"))
def resnet_v2_preprocess(images_u8: jnp.ndarray,
                         resize_size: int = 232,
                         crop_size: int = 224,
                         dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B, H, W, 3) → normalized float (B, 224, 224, 3); the
    torchvision IMAGENET1K_V2 eval transform the reference applies to
    every split."""
    x = images_u8.astype(dtype) / 255.0
    x = resize_short_side(x, resize_size)
    x = center_crop(x, crop_size)
    return normalize(x)


@partial(jax.jit, static_argnames=("dtype",))
def imagenet_preprocess(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """ToTensor + ImageNet normalize (DenseCap path) — no resize."""
    x = images_u8.astype(dtype) / 255.0
    return normalize(x)

"""VGG16 convolutional trunk (torchvision layout, NHWC).

The reference uses two VGG16 slices:
- AlexCap VGGFace encoder: `features[:-1]` — all 13 convs, dropping only
  the final maxpool → (B, 512, 14, 14) for 224 input
  (`AlexCap/LSTMModel.py:18-22`).
- DenseCap trunk: `features[0:30]` split at index 10 for the
  fine-tune boundary (`DenseCap/densecap/DenseCapModel.py:82-91`),
  same 14x14 output at 224 (stride 16).

`VGGFeatures(include_final_pool=False)` is the former;
`num_stages` lets DenseCap build the split trunk.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

# (out_channels per conv) per stage; maxpool after each stage.
VGG16_STAGES: Sequence[Sequence[int]] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))


class VGGFeatures(nn.Module):
    """VGG16 conv trunk. Conv names `conv{stage}_{i}` map 1:1 onto
    torchvision `features.{idx}` indices via utils.torch_port."""

    include_final_pool: bool = False
    start_stage: int = 0
    end_stage: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # VGG has no normalization layers
        x = x.astype(self.dtype)
        for stage in range(self.start_stage, self.end_stage):
            for i, ch in enumerate(VGG16_STAGES[stage]):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype,
                            name=f"conv{stage + 1}_{i + 1}")(x)
                x = nn.relu(x)
            is_last = stage == len(VGG16_STAGES) - 1
            if not is_last or self.include_final_pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class VGGClassifierHead(nn.Module):
    """torchvision `vgg16.classifier[:-1]`: fc(25088→4096) → ReLU →
    dropout → fc(4096→4096) → ReLU — DenseCap's per-region recognition
    base (`DenseCapModel.py:101-103`). Input is the flattened 7x7x512
    ROI code; torchvision flattens CHW so the converter re-orders."""

    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        x = nn.Dense(4096, dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(4096, dtype=self.dtype, name="fc7")(x)
        x = nn.relu(x)
        return x

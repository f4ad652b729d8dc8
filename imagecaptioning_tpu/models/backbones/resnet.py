"""ResNet feature extractor (torchvision-compatible architecture).

The reference encoder is torchvision `resnet101(IMAGENET1K_V2)` with the
classifier head removed (`AlexCap/LSTMModel.py:23-27`), yielding a
(B, 2048, 7, 7) map for 224x224 input. Here the network is NHWC (TPU's
native conv layout), bottleneck blocks run in the configured compute
dtype (bf16 on TPU) with fp32 batch-norm statistics, and the whole
forward is one jit-able function.

Param tree mirrors torchvision naming (`conv1`, `bn1`, `layer1.0.conv1`,
...) so `utils.torch_port.convert_resnet` is a mechanical transpose.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    """1x1 reduce → 3x3 (stride) → 1x1 expand ×4, with projection shortcut
    on the first block of each stage."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        identity = x
        out = conv(self.planes, (1, 1), name="conv1")(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                   padding=((1, 1), (1, 1)), name="conv2")(out)
        out = bn(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, (1, 1), name="conv3")(out)
        out = bn(name="bn3")(out)
        if self.downsample:
            identity = conv(self.planes * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetFeatures(nn.Module):
    """ResNet-{50,101,152} trunk up to (and including) layer4 — the
    reference's `children()[:-2]` slice. Input NHWC in [0,1]-normalized
    space; output (B, H/32, W/32, 2048)."""

    stage_sizes: Sequence[int] = (3, 4, 23, 3)  # ResNet-101
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = 64
        for stage, blocks in enumerate(self.stage_sizes):
            for block in range(blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(
                    planes=planes,
                    stride=stride,
                    downsample=(block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}")(x, train=train)
            planes *= 2
        return x


def resnet101_features(dtype=jnp.float32) -> ResNetFeatures:
    return ResNetFeatures(stage_sizes=(3, 4, 23, 3), dtype=dtype)


def resnet50_features(dtype=jnp.float32) -> ResNetFeatures:
    return ResNetFeatures(stage_sizes=(3, 4, 6, 3), dtype=dtype)

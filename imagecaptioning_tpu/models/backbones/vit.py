"""ViT-B/16 encoder (torchvision-compatible, NHWC input).

The reference encoder is torchvision `vit_b_16`: 16x16 conv patchify →
prepend class token → learned position embeddings → 12 pre-LN
transformer blocks (GELU MLP, head_dim-scaled attention) → final LN
(`AlexCap/VitbModel.py:156-166,327-332`). The caption decoder
cross-attends to all 197 tokens including the class token.

Unlike ops.transformer (which reproduces the reference's from-scratch
post-norm math), this module uses standard pre-LN/head-dim scaling —
that IS torchvision ViT's math, required for porting its pretrained
weights.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ViTBlock(nn.Module):
    hidden_dim: int
    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            name="self_attention")(h, h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="ln_2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp_3")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class ViTEncoder(nn.Module):
    """Patchify + class token + pos-emb + blocks + final LN.
    Input (B, H, W, 3) normalized; output (B, 1 + (H/P)*(W/P), hidden)."""

    image_size: int = 224
    patch_size: int = 16
    num_layers: int = 12
    num_heads: int = 12
    hidden_dim: int = 768
    mlp_dim: int = 3072
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        p = self.patch_size
        x = x.astype(self.dtype)
        x = nn.Conv(self.hidden_dim, (p, p), strides=(p, p),
                    dtype=self.dtype, name="conv_proj")(x)
        x = x.reshape(b, -1, self.hidden_dim)          # (B, N, D)

        cls = self.param("class_token", nn.initializers.zeros,
                         (1, 1, self.hidden_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.hidden_dim)).astype(x.dtype), x],
            axis=1)

        seq_len = (self.image_size // p) ** 2 + 1
        pos = self.param("pos_embedding",
                         nn.initializers.normal(0.02),
                         (1, seq_len, self.hidden_dim))
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = ViTBlock(self.hidden_dim, self.num_heads, self.mlp_dim,
                         self.dropout, self.dtype,
                         name=f"encoder_layer_{i}")(
                x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-6, name="ln")(x)


def vit_b16(dtype=jnp.float32, dropout: float = 0.0) -> ViTEncoder:
    return ViTEncoder(dtype=dtype, dropout=dropout)

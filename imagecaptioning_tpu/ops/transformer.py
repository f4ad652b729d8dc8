"""Transformer encoder/decoder matching the reference family's math.

Re-implements the from-scratch transformer of
`AlexCap/TransformerModule.py` as flax modules with two deliberate
reference quirks preserved (they change the trained function, so parity
requires them):

- attention scores are scaled by 1/sqrt(embed_size), NOT
  1/sqrt(head_dim) (`TransformerModule.py:53`);
- masked positions are filled with -1e20 *before* scaling
  (`TransformerModule.py:47-48`);
- blocks are post-norm with dropout after each norm
  (`TransformerModule.py:70-92`), FFN is ReLU with 4x expansion;
- decoder embeddings are `emb * sqrt(E) + pos` (`TransformerModule.py:187`).

TPU-native upgrades over the reference:
- decode-time KV cache via flax's mutable 'cache' collection — the
  reference re-runs the full decoder over the growing prefix each step
  (`TransformerModule.py:376-388`); here a decode step is O(T) attention
  against cached keys/values with static shapes;
- q/k/v projections fused per block into single matmuls where possible;
  all matmuls run in the configured compute dtype (bf16 on TPU).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e20


def make_trg_mask(trg: jnp.ndarray, key_masking: bool = True) -> jnp.ndarray:
    """(N, 1, T, T) causal mask, optionally ANDed with the outer product
    of the non-NULL key mask (reference `make_trg_mask`,
    TransformerModule.py:240-250). 1 = attend, 0 = masked."""
    n, t = trg.shape
    causal = jnp.tril(jnp.ones((t, t), jnp.float32))
    mask = jnp.broadcast_to(causal, (n, 1, t, t))
    if key_masking:
        keep = (trg > 0).astype(jnp.float32)
        key_mask = keep[:, :, None] * keep[:, None, :]   # (N, T, T)
        mask = mask * key_mask[:, None, :, :]
    return mask


class MultiHeadAttention(nn.Module):
    """Reference-math MHA. v/k/q projections have no bias, fc_out does
    (TransformerModule.py:17-20). Set `decode=True` for cached
    autoregressive self-attention (one query step per call)."""

    embed_size: int
    heads: int
    # MFU counter-experiment knob (docs/SCALING.md "Per-family MFU"):
    # scores/softmax in fp32 (default, the parity-safe numerics) or in
    # the compute dtype throughout — tests whether the fp32 upcast of
    # the short 49/17-length attention tail is what holds the
    # transformer family under the 40% MFU bar.
    fp32_softmax: bool = True

    @nn.compact
    def __call__(self, values, keys, query, mask=None, *, decode: bool = False,
                 cross_decode: bool = False):
        h = self.heads
        d = self.embed_size // h
        assert d * h == self.embed_size

        dense = lambda name, bias: nn.Dense(self.embed_size, use_bias=bias,
                                            name=name)
        n = query.shape[0]
        q = dense("queries", False)(query).reshape(n, -1, h, d)

        if cross_decode:
            # Cached cross-attention: the encoder k/v projections are
            # constant over decode steps — computed once on the cache-init
            # trace, reused every step (the reference recomputes them per
            # step, TransformerModule.py:376-388; so did we before this).
            cached_k = self.variable(
                "cache", "cross_key",
                lambda: dense("keys", False)(keys).reshape(n, -1, h, d))
            cached_v = self.variable(
                "cache", "cross_value",
                lambda: dense("values", False)(values).reshape(n, -1, h, d))
            k, v = cached_k.value, cached_v.value
        else:
            v = dense("values", False)(values).reshape(n, -1, h, d)
            k = dense("keys", False)(keys).reshape(n, -1, h, d)

        if decode and not cross_decode:
            # Cached autoregressive step: append this step's k/v at
            # cache_index, attend over the valid prefix. The cache is
            # shaped at init time by tracing once with the full-length
            # token buffer (see models.decoding.init_cache).
            is_init = self.has_variable("cache", "cached_key")
            cached_k = self.variable("cache", "cached_key",
                                     jnp.zeros, k.shape, k.dtype)
            cached_v = self.variable("cache", "cached_value",
                                     jnp.zeros, v.shape, v.dtype)
            cache_index = self.variable("cache", "cache_index",
                                        lambda: jnp.array(0, jnp.int32))
            if is_init:
                idx = cache_index.value
                cached_k.value = jax.lax.dynamic_update_slice(
                    cached_k.value, k, (0, idx, 0, 0))
                cached_v.value = jax.lax.dynamic_update_slice(
                    cached_v.value, v, (0, idx, 0, 0))
                cache_index.value = idx + q.shape[1]
                k = cached_k.value
                v = cached_v.value
                t_cache = k.shape[1]
                pos = jnp.arange(t_cache)
                valid = (pos <= idx).astype(jnp.float32)
                mask = valid[None, None, None, :]

        score_t = jnp.float32 if self.fp32_softmax else q.dtype
        energy = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=score_t)
        if mask is not None:
            # -1e20 is exactly representable in bf16 too (same exponent
            # range as fp32), so the reference's fill survives both modes
            energy = jnp.where(mask == 0, NEG_INF, energy)
        attn = jax.nn.softmax(
            energy / np.asarray(np.sqrt(self.embed_size), score_t), axis=3)
        out = jnp.einsum("nhql,nlhd->nqhd", attn.astype(v.dtype), v,
                         preferred_element_type=score_t)
        out = out.reshape(n, -1, h * d).astype(query.dtype)
        out = nn.Dense(self.embed_size, name="fc_out")(out)
        return out, attn


class TransformerBlock(nn.Module):
    """Post-norm block: x = drop(norm1(attn + q)); out = drop(norm2(ffn(x) + x))."""

    embed_size: int
    heads: int
    dropout: float
    forward_expansion: int = 4
    fp32_softmax: bool = True

    @nn.compact
    def __call__(self, value, key, query, mask=None, *,
                 deterministic: bool = True, decode: bool = False,
                 cross_decode: bool = False):
        attn, alphas = MultiHeadAttention(self.embed_size, self.heads,
                                          fp32_softmax=self.fp32_softmax,
                                          name="attention")(
            value, key, query, mask, decode=decode,
            cross_decode=cross_decode)
        x = nn.LayerNorm(name="norm1")(attn + query)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        f = nn.Dense(self.forward_expansion * self.embed_size, name="ff1")(x)
        f = nn.relu(f)
        f = nn.Dense(self.embed_size, name="ff2")(f)
        out = nn.LayerNorm(name="norm2")(f + x)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, alphas


class Encoder(nn.Module):
    """Patch-grid encoder with learned absolute position embeddings over a
    fixed patch_length (TransformerModule.py:95-134)."""

    embed_size: int
    num_layers: int
    heads: int
    forward_expansion: int
    dropout: float
    patch_length: int
    fp32_softmax: bool = True

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        pos_emb = self.param(
            "position_embedding",
            nn.initializers.normal(1.0),
            (self.patch_length, self.embed_size))
        out = x + pos_emb[None, :x.shape[1]]
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        for i in range(self.num_layers):
            out, _ = TransformerBlock(
                self.embed_size, self.heads, self.dropout,
                self.forward_expansion, fp32_softmax=self.fp32_softmax,
                name=f"layer_{i}")(
                out, out, out, mask, deterministic=deterministic)
        return out


class DecoderBlock(nn.Module):
    """Masked self-attention + post-norm, then cross-attention
    TransformerBlock against encoder output (TransformerModule.py:140-155)."""

    embed_size: int
    heads: int
    forward_expansion: int
    dropout: float
    fp32_softmax: bool = True

    @nn.compact
    def __call__(self, x, enc_out, src_mask=None, trg_mask=None, *,
                 deterministic: bool = True, decode: bool = False):
        attn, _ = MultiHeadAttention(self.embed_size, self.heads,
                                     fp32_softmax=self.fp32_softmax,
                                     name="attention")(
            x, x, x, trg_mask, decode=decode)
        query = nn.LayerNorm(name="norm")(attn + x)
        query = nn.Dropout(self.dropout)(query, deterministic=deterministic)
        out, alphas = TransformerBlock(
            self.embed_size, self.heads, self.dropout,
            self.forward_expansion, fp32_softmax=self.fp32_softmax,
            name="transformer_block")(
            enc_out, enc_out, query, src_mask, deterministic=deterministic,
            cross_decode=decode)
        return out, alphas


class Decoder(nn.Module):
    """Token decoder: word_emb * sqrt(E) + pos_emb → DecoderBlocks → vocab
    logits. `return_alphas` surfaces the last block's cross-attention for
    visualization (the ViT variant's behavior, VitbModel.py:141-149)."""

    vocab_out: int              # V + 3
    embed_size: int
    num_layers: int
    heads: int
    forward_expansion: int
    dropout: float
    max_length: int
    fp32_softmax: bool = True
    # AlexCap scales word embeddings by sqrt(E) (`emb*self.regul`,
    # TransformerModule.py:187); the AlexGTModel transformer does NOT
    # (AlexTransformer.py:188) — differential-tested both ways.
    scale_embedding: bool = True

    @nn.compact
    def __call__(self, tokens, enc_out, src_mask=None, trg_mask=None, *,
                 deterministic: bool = True, decode: bool = False,
                 decode_position: Optional[jnp.ndarray] = None):
        word_emb = nn.Embed(self.vocab_out, self.embed_size,
                            name="word_embedding")
        pos_emb = self.param(
            "position_embedding",
            nn.initializers.normal(1.0),
            (self.max_length, self.embed_size))
        n, t = tokens.shape
        if decode and decode_position is not None:
            pos = pos_emb[decode_position][None, None, :]
        else:
            pos = pos_emb[None, :t]
        scale = np.sqrt(self.embed_size) if self.scale_embedding else 1.0
        x = word_emb(tokens) * scale + pos
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        alphas = None
        for i in range(self.num_layers):
            x, alphas = DecoderBlock(
                self.embed_size, self.heads, self.forward_expansion,
                self.dropout, fp32_softmax=self.fp32_softmax,
                name=f"layer_{i}")(
                x, enc_out, src_mask, trg_mask,
                deterministic=deterministic, decode=decode)
        logits = nn.Dense(self.vocab_out, name="fc_out")(x)
        return logits, alphas

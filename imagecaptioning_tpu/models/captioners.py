"""The four AlexCap model families as jit-able flax modules.

Reference contracts reproduced (shapes, token conventions, loss
composition — behavior, not code):

- `LSTMCaptioner`    ← AlexCap/LSTMModel.py + LanguageModule.py
- `AttentionCaptioner` ← AlexCap/LSTMwAttentionModel.py +
  AttentionLanguageModule.py (adds the doubly-stochastic attention
  regularizer to the CE loss, LSTMwAttentionModel.py:59-71)
- `TransformerCaptioner` ← AlexCap/TransformerModel.py +
  TransformerModule.py (encoder over the CNN patch grid)
- `ViTCaptioner`     ← AlexCap/VitbModel.py (ViT-B/16 encoder, 768-d
  decoder that also returns cross-attention alphas)

Encoders follow the reference's selection switch: ResNet-101 trunk
(fc_dim 2048, 7x7 grid) or VGG16/VGGFace trunk (fc_dim 512, 14x14
grid) chosen by `use_vggface` (LSTMModel.py:18-27).

Each model exposes:
  __call__(images, gt, train)        → TrainOutput(logits, targets_ready aux)
  encode(images, train)              → patch features
  init_decode(features)              → decode carry
  decode_step(carry, tokens, t)      → (carry, logits, alphas)
so `models.decoding.greedy_decode/beam_search` drive all four uniformly.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from imagecaptioning_tpu.models.backbones.resnet import ResNetFeatures
from imagecaptioning_tpu.models.backbones.vgg import VGGFeatures
from imagecaptioning_tpu.models.backbones.vit import ViTEncoder
from imagecaptioning_tpu.models.heads import AttentionHead, LanguageHead
from imagecaptioning_tpu.ops import losses, tokens
from imagecaptioning_tpu.ops.transformer import (Decoder, Encoder,
                                                 make_trg_mask)


class TrainOutput(NamedTuple):
    logits: jnp.ndarray                 # (B, T+1, V+3)
    alphas: Optional[jnp.ndarray]       # (B, T+1, P) or None


def _flatten_grid(feat: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, HW, C) patch sequence."""
    b, h, w, c = feat.shape
    return feat.reshape(b, h * w, c)


class _CNNEncoderMixin:
    """Shared ResNet/VGG encoder selection (LSTMModel.py:18-27).

    BatchNorm semantics: while the CNN trains (finetune phase,
    `freeze_encoder=False` and `train=True`), BN runs in torch train
    mode — batch statistics normalize the forward pass and the running
    stats update (threaded by the train step via `mutable=
    ['batch_stats']`). Frozen phase and eval use running statistics.
    The reference additionally leaves BN in train mode while the CNN is
    FROZEN, silently drifting the running stats (train_LSTM.py:48-54);
    that bug we deliberately do not reproduce (PARITY.md).

    `freeze_encoder=True` reproduces the reference's frozen-CNN phase
    exactly (`requires_grad_(False)`, train_LSTM.py:48): gradients stop
    at the encoder output, so XLA never builds the conv backward —
    the phase the reference's throughput numbers were measured in.
    """

    def _make_encoder(self):
        if self.use_vggface:
            return VGGFeatures(dtype=self.compute_dtype), 512
        return (ResNetFeatures(stage_sizes=self.backbone_stages,
                               dtype=self.compute_dtype), 2048)

    def _encoder_train(self, train: bool) -> bool:
        """True only in the finetune phase: batch-mode BN + stat updates."""
        return bool(train) and not getattr(self, "freeze_encoder", False)

    def _maybe_stop_gradient(self, feats):
        if getattr(self, "freeze_encoder", False):
            return jax.lax.stop_gradient(feats)
        return feats


class LSTMCaptioner(nn.Module, _CNNEncoderMixin):
    vocab_size: int
    embedding_size: int = 1024
    rnn_size: int = 768
    num_layers: int = 1
    dropout: float = 0.0
    use_vggface: bool = False
    backbone_stages: Tuple[int, ...] = (3, 4, 23, 3)
    compute_dtype: Any = jnp.float32
    freeze_encoder: bool = False
    # Full unroll of the T≤17 teacher-forced recurrence is the production
    # default here too (measured +5%, 6,606 vs 6,287 img/s on v5e — see
    # AttentionHead.scan_unroll for the +25% attention case and the
    # rationale). The shared LanguageHead keeps its rolled default for
    # the dense families' per-region decode.
    scan_unroll: Any = True

    def setup(self):
        self.features, self.fc_dim = self._make_encoder()
        self.llm = LanguageHead(
            vocab_size=self.vocab_size,
            embedding_size=self.embedding_size,
            rnn_size=self.rnn_size,
            num_layers=self.num_layers,
            dropout=self.dropout,
            scan_unroll=self.scan_unroll)

    def encode(self, images, train: bool = False):
        feats = _flatten_grid(
            self.features(images, train=self._encoder_train(train))
            .astype(jnp.float32))
        return self._maybe_stop_gradient(feats)

    def __call__(self, images, gt, train: bool = False) -> TrainOutput:
        feats = self.encode(images, train=train)
        start = self.vocab_size + 1
        dec_in = tokens.decoder_input(gt, start)
        logits = self.llm(feats, dec_in, deterministic=not train)
        return TrainOutput(logits, None)

    def init_decode(self, feats):
        return self.llm.init_state(feats)

    def decode_step(self, carry, toks, t):
        logits, carry = self.llm.step(toks, carry)
        return carry, logits, jnp.zeros((toks.shape[0], 1), jnp.float32)

    def loss(self, out: TrainOutput, gt) -> jnp.ndarray:
        target = tokens.decoder_target(gt, self.vocab_size + 2, scan_from=1)
        return losses.smoothed_cross_entropy(out.logits, target)


class AttentionCaptioner(nn.Module, _CNNEncoderMixin):
    vocab_size: int
    embedding_size: int = 1024
    rnn_size: int = 768
    dropout: float = 0.5
    use_vggface: bool = False
    att_reg_weight: float = 1.0
    backbone_stages: Tuple[int, ...] = (3, 4, 23, 3)
    compute_dtype: Any = jnp.float32
    freeze_encoder: bool = False
    scan_unroll: Any = True     # see AttentionHead.scan_unroll

    def setup(self):
        self.features, self.fc_dim = self._make_encoder()
        self.llm = AttentionHead(
            vocab_size=self.vocab_size,
            embedding_size=self.embedding_size,
            encoder_dim=self.fc_dim,
            rnn_size=self.rnn_size,
            dropout=self.dropout,
            scan_unroll=self.scan_unroll)

    def encode(self, images, train: bool = False):
        feats = _flatten_grid(
            self.features(images, train=self._encoder_train(train))
            .astype(jnp.float32))
        return self._maybe_stop_gradient(feats)

    def __call__(self, images, gt, train: bool = False) -> TrainOutput:
        feats = self.encode(images, train=train)
        dec_in = tokens.decoder_input(gt, self.vocab_size + 1)
        logits, alphas = self.llm(feats, dec_in, deterministic=not train)
        return TrainOutput(logits, alphas)

    def init_decode(self, feats):
        return (feats, self.llm.attention_keys(feats),
                self.llm.init_state(feats))

    def decode_step(self, carry, toks, t):
        feats, w_s, state = carry
        logits, alpha, state = self.llm.step(feats, toks, state, w_s=w_s)
        return (feats, w_s, state), logits, alpha

    def loss(self, out: TrainOutput, gt) -> jnp.ndarray:
        target = tokens.decoder_target(gt, self.vocab_size + 2, scan_from=1)
        ce = losses.smoothed_cross_entropy(out.logits, target)
        reg = losses.doubly_stochastic_regularizer(out.alphas)
        return ce + self.att_reg_weight * reg


class TransformerCaptioner(nn.Module, _CNNEncoderMixin):
    vocab_size: int
    max_length: int                     # seq_length T; decoder sees T+1
    embed_size: int = 512
    num_layers: int = 6
    heads: int = 8
    forward_expansion: int = 4
    dropout: float = 0.1
    use_vggface: bool = False
    backbone_stages: Tuple[int, ...] = (3, 4, 23, 3)
    compute_dtype: Any = jnp.float32
    freeze_encoder: bool = False
    # 0 = derive from use_vggface (224-input grids: 14 vggface / 7
    # resnet, TransformerModel.py:31); set explicitly for other image
    # sizes — the reference Encoder hard-requires grid == patch_size²
    # (TransformerModule.py:126-128)
    patch_size_override: int = 0
    fp32_softmax: bool = True   # see ops.transformer.MultiHeadAttention

    def setup(self):
        self.features, self.fc_dim = self._make_encoder()
        self.patch_size = self.patch_size_override or (
            14 if self.use_vggface else 7)
        self.fc = nn.Dense(self.embed_size)
        self.encoder = Encoder(
            embed_size=self.embed_size, num_layers=self.num_layers,
            heads=self.heads, forward_expansion=self.forward_expansion,
            dropout=self.dropout, patch_length=self.patch_size ** 2,
            fp32_softmax=self.fp32_softmax)
        self.decoder = Decoder(
            vocab_out=self.vocab_size + 3, embed_size=self.embed_size,
            num_layers=self.num_layers, heads=self.heads,
            forward_expansion=self.forward_expansion, dropout=self.dropout,
            max_length=self.max_length + 1,
            fp32_softmax=self.fp32_softmax)

    def encode(self, images, train: bool = False):
        grid = _flatten_grid(
            self.features(images, train=self._encoder_train(train))
            .astype(jnp.float32))
        grid = self._maybe_stop_gradient(grid)
        word_vec = nn.relu(self.fc(grid))
        return self.encoder(word_vec, None, deterministic=not train)

    def __call__(self, images, gt, train: bool = False) -> TrainOutput:
        enc = self.encode(images, train=train)
        dec_in = tokens.decoder_input(gt, self.vocab_size + 1)
        trg_mask = make_trg_mask(dec_in, key_masking=True)
        logits, alphas = self.decoder(dec_in, enc, None, trg_mask,
                                      deterministic=not train)
        return TrainOutput(logits, alphas)

    def init_decode(self, enc):
        """Decode carry is (encoder output,); the KV cache lives in the
        'cache' variable collection, threaded by the caller."""
        return enc

    def decode_step(self, carry, toks, t):
        enc = carry
        logits, alphas = self.decoder(toks, enc, None, None,
                                      decode=True, decode_position=t)
        a = alphas.mean(axis=1)[:, 0] if alphas is not None else \
            jnp.zeros((toks.shape[0], 1), jnp.float32)
        return enc, logits[:, 0], a

    def loss(self, out: TrainOutput, gt) -> jnp.ndarray:
        target = tokens.decoder_target(gt, self.vocab_size + 2, scan_from=0)
        return losses.smoothed_cross_entropy(out.logits, target)


class ViTCaptioner(nn.Module):
    vocab_size: int
    max_length: int
    embed_size: int = 768
    num_layers: int = 6
    heads: int = 8
    forward_expansion: int = 4
    dropout: float = 0.1
    image_size: int = 224
    vit_patch: int = 16
    vit_layers: int = 12
    vit_heads: int = 12
    vit_hidden: int = 768
    vit_mlp: int = 3072
    compute_dtype: Any = jnp.float32
    freeze_encoder: bool = False

    def setup(self):
        self.encoder_vit = ViTEncoder(
            image_size=self.image_size, patch_size=self.vit_patch,
            num_layers=self.vit_layers, num_heads=self.vit_heads,
            hidden_dim=self.vit_hidden, mlp_dim=self.vit_mlp,
            dtype=self.compute_dtype)
        self.decoder = Decoder(
            vocab_out=self.vocab_size + 3, embed_size=self.embed_size,
            num_layers=self.num_layers, heads=self.heads,
            forward_expansion=self.forward_expansion, dropout=self.dropout,
            max_length=self.max_length + 1)

    def encode(self, images, train: bool = False):
        # Encoder stays deterministic: the reference freezes it when
        # pretrained (VitbModel.py:162-166); 197 tokens incl. class token.
        feats = self.encoder_vit(images, deterministic=True) \
            .astype(jnp.float32)
        if self.freeze_encoder:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def __call__(self, images, gt, train: bool = False) -> TrainOutput:
        enc = self.encode(images, train=train)
        dec_in = tokens.decoder_input(gt, self.vocab_size + 1)
        trg_mask = make_trg_mask(dec_in, key_masking=True)
        logits, alphas = self.decoder(dec_in, enc, None, trg_mask,
                                      deterministic=not train)
        return TrainOutput(logits, alphas.mean(axis=1)
                           if alphas is not None else None)

    def init_decode(self, enc):
        return enc

    def decode_step(self, carry, toks, t):
        enc = carry
        logits, alphas = self.decoder(toks, enc, None, None,
                                      decode=True, decode_position=t)
        a = alphas.mean(axis=1)[:, 0]   # (B, enc_len) incl. class token
        return enc, logits[:, 0], a

    def loss(self, out: TrainOutput, gt) -> jnp.ndarray:
        target = tokens.decoder_target(gt, self.vocab_size + 2, scan_from=0)
        return losses.smoothed_cross_entropy(out.logits, target)


def build_model(cfg, vocab_size: int, seq_length: int,
                freeze_encoder: Optional[bool] = None):
    """Config → model instance (the reference's per-driver constructor
    switch, e.g. train_LSTM.py:41-47). `freeze_encoder` overrides the
    gradient-stop at the encoder boundary; the ViT default follows the
    reference (frozen iff pretrained, VitbModel.py:162-166)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    drop = cfg.drop_value if cfg.use_dropout else 0.0
    fe = bool(freeze_encoder)
    # cfg.backbone_stages=() keeps the family default trunk depth
    stages = ({"backbone_stages": tuple(cfg.backbone_stages)}
              if getattr(cfg, "backbone_stages", ()) else {})
    if cfg.model_type == "lstm":
        return LSTMCaptioner(
            vocab_size=vocab_size, embedding_size=cfg.embedding_size,
            rnn_size=cfg.lstm_size, num_layers=cfg.num_layers,
            dropout=drop, use_vggface=cfg.use_vggface, compute_dtype=dtype,
            freeze_encoder=fe, **stages)
    if cfg.model_type == "lstm_attention":
        return AttentionCaptioner(
            vocab_size=vocab_size, embedding_size=cfg.embedding_size,
            rnn_size=cfg.lstm_size, dropout=drop,
            use_vggface=cfg.use_vggface, compute_dtype=dtype,
            freeze_encoder=fe, **stages)
    if cfg.model_type == "transformer":
        return TransformerCaptioner(
            vocab_size=vocab_size, max_length=seq_length,
            embed_size=cfg.transformer_size, num_layers=cfg.num_layers,
            heads=cfg.num_heads, dropout=drop,
            use_vggface=cfg.use_vggface, compute_dtype=dtype,
            freeze_encoder=fe, **stages)
    if cfg.model_type == "vitb":
        if freeze_encoder is None:
            fe = bool(cfg.trained_encoder)
        # cfg.vit_dims=() keeps the real ViT-B/16 encoder
        vit = {}
        if getattr(cfg, "vit_dims", ()):
            s, p, L, H, hid, mlp = cfg.vit_dims
            vit = dict(image_size=s, vit_patch=p, vit_layers=L,
                       vit_heads=H, vit_hidden=hid, vit_mlp=mlp)
        return ViTCaptioner(
            vocab_size=vocab_size, max_length=seq_length,
            embed_size=cfg.embedding_size, num_layers=cfg.num_layers,
            heads=cfg.num_heads, dropout=drop, compute_dtype=dtype,
            freeze_encoder=fe, **vit)
    raise ValueError(f"unknown model_type {cfg.model_type}")

#!/usr/bin/env python
"""Miniature quality-parity run: the reference trained against us.

Trains the REFERENCE'S OWN torch modules and this framework's captioner
from IDENTICAL ported initialization, on the same synthetic
Face2Text-style dataset with the same batch schedule and the
reference's training-loop semantics, for all four AlexCap families:

- lstm: `AlexCap/LanguageModule.py` head + `AlexCap/CustomLoss.py` on a
  VGG16-features trunk in the AlexCapModel shape
  (`LSTMModel.py:53-73`); Adam, additive-L2 wd 1e-6, clip 1.0,
  frozen-CNN phase then unfreeze at the boundary
  (`train_LSTM.py:77-133`).
- attention: `AlexCap/AttentionLanguageModule.py` incl. the
  doubly-stochastic regularizer (`LSTMwAttentionModel.py:59-71`).
- transformer: `AlexCap/TransformerModule.py` with the REAL two-group
  AdamW — llm at (lr, wd=0.1), features at base lr=0 with
  weight_decay=lr, which never updates (`train_Transformer.py:72-83`).
- vitb: the reference's own `VitbModel.py` Decoder over a mini ViT
  encoder with torchvision vit_b_16's exact module naming, frozen at
  construction like the pretrained flagship (`VitbModel.py:162-166`),
  AdamW via the collect_params split (`train_ViTB.py:51-73`).

`--control` reruns the torch side from rel-1e-7-perturbed init — the
torch-vs-torch chaotic divergence envelope that calibrates how much of
the cross-framework loss drift is just fp32 sensitivity.

Each side is then evaluated with ITS OWN eval harness on its own greedy
decodes of the test split: the reference's
`AlexCap/eval/eval_resnet.py:108-123` `score_captions` (NLTK sentence
METEOR + method4-smoothed sentence BLEU) vs our `eval/scorer.py`
(whose protocol mirrors it). Both get the same offline NLTK
degradations (whitespace tokenize, wordnet-free METEOR).

Writes `<out>/quality_parity.json` — both full loss curves, per-step
agreement stats, both sides' METEOR/BLEU, the decoded captions — and a
loss-curve PNG. `tests/test_quality_parity.py` runs a shortened version
and asserts curve + metric agreement.

Run: python quality_parity.py [--steps 160] [--out runs/parity]
"""

from __future__ import annotations

import argparse
import copy
import json
import os

import numpy as np

from imagecaptioning_tpu.utils.refload import (force_cpu,
                                               load_reference_module)


# ------------------------------------------------------------------- data

def build_dataset(num_images: int = 32, seq_length: int = 10,
                  hw: int = 64, seed: int = 0):
    """Synthetic Face2Text-shaped data: one caption per image, reference
    split codes. Returns dict with float images, labels, split indices
    and the vocab."""
    from imagecaptioning_tpu.data.synthetic import make_face2text_arrays
    from imagecaptioning_tpu.data.tokenizer import Vocab

    arrays, dicts = make_face2text_arrays(
        num_images=num_images, captions_per_image=1,
        seq_length=seq_length, image_hw=(hw, hw), seed=seed)
    vocab = Vocab(dicts["token_to_idx"])
    images = arrays["images"].astype(np.float32) / 255.0   # (N,H,W,3)
    labels = arrays["labels"].astype(np.int64)             # (N,T)
    split = np.asarray(arrays["split"])
    return {"images": images, "labels": labels,
            "train_ix": np.where(split == 0)[0],
            "test_ix": np.where(split == 2)[0],
            "vocab": vocab, "idx_to_token": dicts["idx_to_token"],
            "seq_length": seq_length}


def batch_schedule(train_ix: np.ndarray, bs: int, steps: int):
    """Deterministic sequential 'iterate' batching, ragged tail dropped
    (the reference's iterate mode, MyDataLoader.py:71-77), shared
    verbatim by both sides."""
    per_epoch = max(len(train_ix) // bs, 1)
    return [train_ix[(i % per_epoch) * bs:(i % per_epoch) * bs + bs]
            for i in range(steps)]


# ------------------------------------------------------------ torch side

def _torch_attention_greedy(ref, feats, seq_length, vocab_size):
    """The reference's greedy branch trips a torch-version shape error
    on modern torch (`preds[:, t] = token` with token (B,1),
    AttentionLanguageModule.py:109); run the same loop with ref's own
    modules and only that assignment shimmed."""
    import torch

    b = feats.size(0)
    with torch.no_grad():
        h, c = ref.get_init_lstm_state(feats)
        emb = ref.embedding(torch.full((b, 1), vocab_size + 1,
                                       dtype=torch.long))
        out = torch.zeros(b, seq_length + 1, dtype=torch.long)
        for t in range(seq_length + 1):
            context, _ = ref.attention(feats, h)
            gate = torch.sigmoid(ref.f_beta(h))
            e = emb.squeeze(1) if emb.dim() == 3 else emb
            h, c = ref.lstm(torch.cat((e, gate * context), dim=1),
                            (h, c))
            token = ref.deep_output(h).argmax(1)
            out[:, t] = token
            if bool((token == vocab_size + 2).all()):
                break
            emb = ref.embedding(token)
    return out


def run_torch(data, batches, lr, wd, boundary, seq_length,
              family="lstm", init_sd=None, step_noise_rel=None,
              snapshot_at=()):
    """The reference's own modules + training-loop semantics
    (train_LSTM.py:77-133 / train_LSTMwAttention.py incl. the
    doubly-stochastic regularizer, LSTMwAttentionModel.py:59-71;
    train_Transformer.py:72-133 incl. the two-group AdamW;
    train_ViTB.py:51-120 with the collect_params split), CPU.
    `init_sd` overrides the initial state_dict (control reruns);
    `step_noise_rel` multiplies every param by (1 + rel·N(0,1)) after
    each optimizer step (per-step control reruns).
    Restores the process-wide torch.Tensor.cuda shim (attention family)
    on every exit path — in-process callers (tests) must not inherit a
    no-op .cuda()."""
    import torch

    orig_cuda = torch.Tensor.cuda
    try:
        if family == "vitb":
            return _run_torch_vitb(data, batches, lr, wd, seq_length,
                                   init_sd, step_noise_rel, snapshot_at)
        return _run_torch_inner(data, batches, lr, wd, boundary,
                                seq_length, family, init_sd,
                                step_noise_rel, snapshot_at)
    finally:
        torch.Tensor.cuda = orig_cuda


def _step_noise_fn(model, rel, seed=4321):
    """Per-step control: multiply every param by (1 + rel·N(0,1)) after
    each optimizer step — the magnitude/cadence at which fp32
    reassociation injects noise in a cross-framework port (each step's
    reductions are ordered differently, not just the init)."""
    import torch

    g = torch.Generator().manual_seed(seed)

    def apply():
        with torch.no_grad():
            for p in model.parameters():
                if p.is_floating_point():
                    p.mul_(1 + rel * torch.randn(p.shape, generator=g,
                                                 dtype=p.dtype))
    return apply


def _run_torch_inner(data, batches, lr, wd, boundary, seq_length,
                     family, init_sd=None, step_noise_rel=None,
                     snapshot_at=()):
    import torch
    import torch.nn as tnn

    from imagecaptioning_tpu.utils.torch_port import build_torch_vgg_trunk

    ref_loss = load_reference_module("AlexCap/CustomLoss.py",
                                     "qp_ref_loss")

    torch.manual_seed(0)
    vocab = data["vocab"]
    # the use_vggface encoder shape of LSTMModel.py:18-23
    trunk = build_torch_vgg_trunk()
    if family == "attention":
        ref_att = load_reference_module(
            "AlexCap/AttentionLanguageModule.py", "qp_ref_attention")
        # the reference hard-codes .cuda() on two buffers in its
        # teacher-forced path (AttentionLanguageModule.py:70-71);
        # pure data movement, no math (run_torch restores the shim)
        torch.Tensor.cuda = lambda self, *a, **k: self
        llm = ref_att.Decoder(
            vocab_size=vocab.vocab_size, embedding_size=64,
            image_vector_dim=512, rnn_size=64, seq_length=seq_length,
            idx_to_token=data["idx_to_token"], dropout=0.0,
            device="cpu")
        llm.use_beam = False
    elif family == "transformer":
        ref_tr = load_reference_module("AlexCap/TransformerModule.py",
                                       "qp_ref_transformer")
        # the VGG trunk downsamples 16×, so the patch grid is
        # (hw/16)²; the reference Encoder hard-requires grid ==
        # patch_size² (TransformerModule.py:126-128)
        patch = data["images"].shape[1] // 16
        llm = ref_tr.Transformer(
            src_vocab_size=vocab.vocab_size, fc_dim=512,
            token_dict=data["idx_to_token"], max_length=seq_length,
            patch_size=patch, embed_size=64, num_layers=2, heads=4,
            forward_expansion=4, dropout=0.0, device="cpu")
        llm.use_beam = False
    else:
        ref_lang = load_reference_module("AlexCap/LanguageModule.py",
                                         "qp_ref_language")
        llm = ref_lang.LanguageModel(
            vocab_size=vocab.vocab_size, embedding_size=64,
            image_vector_dim=512,
            rnn_size=64, seq_length=seq_length, num_layers=1,
            idx_to_token=data["idx_to_token"], dropout=0.0,
            device="cpu")

    class TorchCaptioner(tnn.Module):
        """AlexCapModel forward shape (LSTMModel.py:53-73)."""

        def __init__(self):
            super().__init__()
            self.features = trunk.features
            self.llm = llm

        def encode(self, images):
            f = self.features(images).permute(0, 2, 3, 1)
            return f.reshape(f.size(0), -1, f.size(-1))

        def forward(self, images, gt):
            return self.llm(self.encode(images), gt)

    model = TorchCaptioner().eval()      # dropout 0; VGG has no BN
    if init_sd is not None:              # control rerun: perturbed init
        model.load_state_dict(init_sd)
    sd_init = {k: v.detach().clone()
               for k, v in model.state_dict().items()}
    crit = ref_loss.CustomCrossEntropyLoss()
    if family == "transformer":
        # train_Transformer.py:72-83: AdamW, llm group at (lr, wd=0.1),
        # features group at BASE lr=0 with weight_decay=lr — which
        # never updates (LambdaLR scales the 0 base; lr=0 also kills
        # the AdamW decay). Reproduced verbatim.
        opt = torch.optim.AdamW(
            [{"params": model.llm.parameters(), "lr": lr,
              "weight_decay": wd},
             {"params": model.features.parameters(), "lr": 0.0,
              "weight_decay": lr}],
            betas=(0.9, 0.999), eps=1e-8)
    else:
        opt = torch.optim.Adam(model.parameters(), lr=lr,
                               weight_decay=wd)
    model.features.requires_grad_(False)   # frozen-CNN phase
    noise = (_step_noise_fn(model, step_noise_rel)
             if step_noise_rel else None)

    losses = []
    snapshots = {}
    for it, ix in enumerate(batches):
        if it in snapshot_at:
            # params ENTERING step `it` — losses[it] is computed from
            # exactly these (the trajectory-pinned defect probe ports
            # them to jax and re-evaluates the same step's loss)
            snapshots[it] = copy.deepcopy(model.state_dict())
        if it == boundary:
            model.features.requires_grad_(True)   # train_LSTM.py:101-105
        img = torch.from_numpy(
            data["images"][ix].transpose(0, 3, 1, 2).copy())
        gt = torch.from_numpy(data["labels"][ix])
        opt.zero_grad(set_to_none=True)
        target = model.llm.get_target(gt, make_target=True)
        if family == "attention":
            preds, alphas = model(img, gt)
            loss = crit(preds, target)
            # doubly-stochastic regularizer, LSTMwAttentionModel.py:67-70
            loss = loss + ((1 - alphas.sum(1)) ** 2).mean()
        else:
            loss = crit(model(img, gt), target)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if noise is not None:
            noise()
        losses.append(float(loss.detach()))

    # greedy decode of the test split + the reference's own scorer
    ti = data["test_ix"]
    with torch.no_grad():
        feats = model.encode(torch.from_numpy(
            data["images"][ti].transpose(0, 3, 1, 2).copy()))
        if family == "attention":
            toks = _torch_attention_greedy(model.llm, feats, seq_length,
                                           vocab.vocab_size)
        elif family == "transformer":
            # forward with an empty target = the reference's greedy
            # branch (TransformerModule.py:361-388)
            toks = model.llm(feats, feats.new())
        else:
            toks = model.llm.predict_caption(feats)
    preds = model.llm.decode_sequence(toks)
    refs = model.llm.decode_sequence(torch.from_numpy(data["labels"][ti]))

    meteor, bleu = _reference_score(preds, refs)
    return {"losses": losses, "predictions": preds, "references": refs,
            "meteor": meteor, "bleu": bleu,
            "state_dict_init": sd_init, "snapshots": snapshots}


def _reference_score(preds, refs):
    """The reference's own eval harness (eval_resnet.py:108-123) with
    the offline NLTK degradations our scorer also falls back to
    (whitespace tokenize, wordnet-free METEOR)."""
    ref_eval = load_reference_module("AlexCap/eval/eval_resnet.py",
                                     "qp_ref_eval")
    from imagecaptioning_tpu.eval.scorer import meteor_pair
    ref_eval.word_tokenize = lambda s: s.split()
    ref_eval.meteor = lambda r, c: meteor_pair(r, c)
    blob = ref_eval.score_captions(
        [{"candidate": p, "references": r} for p, r in zip(preds, refs)])
    return blob["average_score"], blob["average_bl_score"]


def _run_torch_vitb(data, batches, lr, wd, seq_length, init_sd=None,
                    step_noise_rel=None, snapshot_at=()):
    """The flagship ViT-B configuration (vitb_opts: pretrained encoder,
    frozen at construction — VitbModel.py:162-166): a mini ViT encoder
    with torchvision vit_b_16's EXACT module naming + the reference's
    OWN VitbModel.Decoder, trained with train_ViTB.py's AdamW
    collect_params split (:51-73). The encoder's shared random init
    stands in for the unavailable IMAGENET1K_V1 download on both sides
    (what matters is that both sides start from the SAME frozen
    encoder)."""
    import types

    import torch
    import torch.nn as tnn

    ref_loss = load_reference_module("AlexCap/CustomLoss.py",
                                     "qp_ref_loss_vitb")
    mod = load_reference_module("AlexCap/VitbModel.py", "qp_ref_vitb")

    torch.manual_seed(0)
    vocab = data["vocab"]
    H, L, HEADS, MLP, PATCH = 32, 2, 4, 64, 16
    hw = data["images"].shape[1]
    n_tokens = (hw // PATCH) ** 2 + 1

    class TorchViTBlock(tnn.Module):
        """torchvision EncoderBlock naming (ln_1/self_attention/ln_2/mlp)."""

        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(H, eps=1e-6)
            self.self_attention = tnn.MultiheadAttention(
                H, HEADS, batch_first=True)
            self.ln_2 = tnn.LayerNorm(H, eps=1e-6)
            self.mlp = tnn.Sequential(tnn.Linear(H, MLP), tnn.GELU(),
                                      tnn.Dropout(0.0), tnn.Linear(MLP, H))

        def forward(self, x):
            h = self.ln_1(x)
            h, _ = self.self_attention(h, h, h, need_weights=False)
            x = x + h
            return x + self.mlp(self.ln_2(x))

    class TorchViTEncoder(tnn.Module):
        """torchvision Encoder naming (pos_embedding/layers/ln)."""

        def __init__(self):
            super().__init__()
            from collections import OrderedDict
            self.pos_embedding = tnn.Parameter(
                torch.empty(1, n_tokens, H).normal_(std=0.02))
            self.layers = tnn.Sequential(OrderedDict(
                (f"encoder_layer_{i}", TorchViTBlock())
                for i in range(L)))
            self.ln = tnn.LayerNorm(H, eps=1e-6)

        def forward(self, x):
            return self.ln(self.layers(x + self.pos_embedding))

    class TorchViTCaptioner(tnn.Module):
        """VitTransformer's forward math (VitbModel.py:322-356) over
        the mini encoder + the reference's own Decoder."""

        def __init__(self):
            super().__init__()
            self.conv_proj = tnn.Conv2d(3, H, PATCH, PATCH)
            self.class_token = tnn.Parameter(torch.zeros(1, 1, H))
            self.encoder = TorchViTEncoder()
            self.decoder = mod.Decoder(
                trg_vocab_size=vocab.vocab_size + 3, embed_size=H,
                num_layers=L, heads=HEADS, forward_expansion=4,
                dropout=0.0, device="cpu", max_length=seq_length + 1)

        def encode(self, images):
            x = self.conv_proj(images)
            x = x.reshape(x.size(0), H, -1).permute(0, 2, 1)
            tok = self.class_token.expand(x.size(0), -1, -1)
            return self.encoder(torch.cat([tok, x], dim=1))

    model = TorchViTCaptioner().eval()
    if init_sd is not None:              # control rerun: perturbed init
        model.load_state_dict(init_sd)
    sd_init = {k: v.detach().clone()
               for k, v in model.state_dict().items()}

    # the reference's own unbound target/mask/decode helpers — they
    # touch only sos/eos/device/token_dict (VitbModel.py:198-265)
    shim = types.SimpleNamespace(sos=vocab.vocab_size + 1,
                                 eos=vocab.vocab_size + 2, device="cpu",
                                 token_dict=data["idx_to_token"])

    def get_target(gt, make_target=False):
        return mod.VitTransformer.get_target(shim, gt, make_target)

    def make_trg_mask(trg, key_masking=True):
        return mod.VitTransformer.make_trg_mask(shim, trg, key_masking)

    crit = ref_loss.CustomCrossEntropyLoss()
    # pretrained flagship: encoder frozen at construction (:162-166)
    model.conv_proj.requires_grad_(False)
    model.class_token.requires_grad_(False)
    model.encoder.requires_grad_(False)
    # train_ViTB.py:51-73 collect_params: nn.Embedding LEAVES → the
    # embeddings group, other leaf modules → params; both groups get
    # identical (lr, wd), so the split is cosmetic. NB collect_params
    # silently drops DIRECT parameters of composite modules
    # (class_token, pos_embedding, MHA in_proj) from the optimizer —
    # all frozen in this pretrained configuration, so no behavior
    # difference here; see PARITY.md for the from-scratch implication.
    embed_params, rest = [], []

    def collect(module):
        for child in module.children():
            if list(child.children()):
                collect(child)
            else:
                (embed_params if isinstance(child, tnn.Embedding)
                 else rest).extend(child.parameters())

    collect(model)
    opt = torch.optim.AdamW(
        [{"params": rest, "lr": lr, "weight_decay": wd},
         {"params": embed_params, "lr": lr, "weight_decay": wd}],
        betas=(0.9, 0.999), eps=1e-8)
    noise = (_step_noise_fn(model, step_noise_rel)
             if step_noise_rel else None)

    losses = []
    snapshots = {}
    for it, ix in enumerate(batches):
        if it in snapshot_at:
            snapshots[it] = copy.deepcopy(model.state_dict())
        img = torch.from_numpy(
            data["images"][ix].transpose(0, 3, 1, 2).copy())
        gt = torch.from_numpy(data["labels"][ix])
        opt.zero_grad(set_to_none=True)
        x = model.encode(img)
        dec_in = get_target(gt)
        out, _ = model.decoder(dec_in, x, None, make_trg_mask(dec_in))
        loss = crit(out, get_target(gt, True))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if noise is not None:
            noise()
        losses.append(float(loss.detach()))

    # greedy decode (the use_beam=False branch of forward_test,
    # VitbModel.py:368-380)
    ti = data["test_ix"]
    with torch.no_grad():
        x = model.encode(torch.from_numpy(
            data["images"][ti].transpose(0, 3, 1, 2).copy()))
        b = x.size(0)
        gen = torch.zeros(b, seq_length + 1, dtype=torch.long)
        trg = torch.full((b, 1), shim.sos, dtype=torch.long)
        for i in range(seq_length + 1):
            out, _ = model.decoder(trg, x, None,
                                   make_trg_mask(trg, False))
            nxt = out[:, -1, :].argmax(dim=1, keepdim=True)
            gen[:, i:i + 1] = nxt
            trg = torch.cat((trg, nxt), dim=1)
            if bool(torch.all(nxt == shim.eos)):
                break
    preds = mod.VitTransformer.decode_sequence(shim, gen)
    refs = mod.VitTransformer.decode_sequence(
        shim, torch.from_numpy(data["labels"][ti]))
    meteor, bleu = _reference_score(preds, refs)
    return {"losses": losses, "predictions": preds, "references": refs,
            "meteor": meteor, "bleu": bleu,
            "state_dict_init": sd_init, "snapshots": snapshots}


# -------------------------------------------------------------- jax side

def port_params(sd, family="lstm"):
    """torch state_dict → our captioner param tree (the converters are
    the round-trip-tested utils/torch_port maps)."""
    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.utils import torch_port as tp

    if family == "vitb":
        params = {
            "encoder_vit": tp.convert_vit(sd, num_layers=2, num_heads=4,
                                          hidden=32)["params"],
            "decoder": tp.convert_reference_vitb_decoder(sd, num_layers=2),
        }
    elif family == "transformer":
        llm_sd = {k[len("llm."):]: v for k, v in sd.items()
                  if k.startswith("llm.")}
        params = {
            "features": tp.convert_vgg_features(sd)["params"],
            **tp.convert_reference_transformer(llm_sd, num_layers=2),
        }
    else:
        head = (tp.convert_reference_attention_head(sd)
                if family == "attention"
                else tp.convert_reference_lstm_head(sd, prefix="llm."))
        params = {
            "features": tp.convert_vgg_features(sd)["params"],
            "llm": head,
        }
    return jax.tree.map(lambda v: jnp.array(np.asarray(v)), params)


def _family_models(data, seq_length, family):
    """Our captioner + its stop-gradient frozen variant at the parity
    dims (shared by run_jax and the trajectory-defect probe)."""
    from imagecaptioning_tpu.models.captioners import (AttentionCaptioner,
                                                       LSTMCaptioner,
                                                       TransformerCaptioner,
                                                       ViTCaptioner)

    vocab = data["vocab"]
    if family == "attention":
        kw = dict(vocab_size=vocab.vocab_size, embedding_size=64,
                  rnn_size=64, dropout=0.0, use_vggface=True,
                  att_reg_weight=1.0)
        return (AttentionCaptioner(**kw),
                AttentionCaptioner(**kw, freeze_encoder=True),
                "lstm_attention")
    if family == "transformer":
        kw = dict(vocab_size=vocab.vocab_size, max_length=seq_length,
                  embed_size=64, num_layers=2, heads=4, dropout=0.0,
                  use_vggface=True,
                  patch_size_override=data["images"].shape[1] // 16)
        return (TransformerCaptioner(**kw),
                TransformerCaptioner(**kw, freeze_encoder=True),
                "transformer")
    if family == "vitb":
        kw = dict(vocab_size=vocab.vocab_size, max_length=seq_length,
                  embed_size=32, num_layers=2, heads=4,
                  forward_expansion=4, dropout=0.0, image_size=32,
                  vit_patch=16, vit_layers=2, vit_heads=4,
                  vit_hidden=32, vit_mlp=64)
        # pretrained flagship semantics: encoder frozen the whole run
        model = ViTCaptioner(**kw, freeze_encoder=True)
        return model, model, "vitb"
    kw = dict(vocab_size=vocab.vocab_size, embedding_size=64,
              rnn_size=64, dropout=0.0, use_vggface=True)
    return (LSTMCaptioner(**kw),
            LSTMCaptioner(**kw, freeze_encoder=True),
            "lstm")


def run_jax(data, batches, lr, wd, boundary, seq_length, init_sd,
            steps, family="lstm"):
    """Our production pieces: LSTMCaptioner/AttentionCaptioner (+
    stop-gradient frozen variant), make_train_step, make_optimizer with
    the finetune boundary, make_greedy_fn, eval/scorer — the same
    components the real driver wires (train/driver.py:91-127)."""
    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.config import get_config
    from imagecaptioning_tpu.eval import scorer
    from imagecaptioning_tpu.models import api
    from imagecaptioning_tpu.models.captioners import (AttentionCaptioner,
                                                       LSTMCaptioner,
                                                       TransformerCaptioner,
                                                       ViTCaptioner)
    from imagecaptioning_tpu.train import optim, step as steplib

    vocab = data["vocab"]
    model, frozen_model, cfg_name = _family_models(data, seq_length,
                                                   family)

    cfg = get_config(cfg_name).replace(
        use_vggface=True, learning_rate=lr, weight_decay=wd,
        clip_grad=True, finetune_cnn=True, use_scheduler=False,
        compute_dtype="float32")
    if family == "vitb":
        cfg = cfg.replace(trained_encoder=True)
    tx = optim.make_optimizer(cfg, total_steps=steps,
                              finetune_start_step=boundary)

    x0 = jnp.asarray(data["images"][batches[0]])
    g0 = jnp.asarray(data["labels"][batches[0]].astype(np.int32))
    state, _ = steplib.create_train_state(model, tx, x0, g0)
    state = state._replace(params=port_params(init_sd, family))

    train_step = jax.jit(steplib.make_train_step(model, tx))
    frozen_step = (train_step if frozen_model is model
                   else jax.jit(steplib.make_train_step(frozen_model, tx)))

    losses = []
    for it, ix in enumerate(batches):
        step_fn = frozen_step if it < boundary else train_step
        state, m = step_fn(state, jnp.asarray(data["images"][ix]),
                           jnp.asarray(data["labels"][ix]
                                       .astype(np.int32)))
        losses.append(float(m["loss"]))

    ti = data["test_ix"]
    greedy = api.make_greedy_fn(model, max_steps=seq_length + 1)
    toks, _ = greedy({"params": state.params},
                     jnp.asarray(data["images"][ti]))
    preds = vocab.decode_sequence(np.asarray(toks))
    refs = vocab.decode_sequence(data["labels"][ti])
    res = scorer.score_captions(
        [{"candidate": p, "references": [r]}
         for p, r in zip(preds, refs)])
    return {"losses": losses, "predictions": preds, "references": refs,
            "meteor": res["meteor"], "bleu": res["bleu"]}


# ------------------------------------------------------------------ main

def _perturb_state_dict(sd, rel: float = 1e-7, seed: int = 1234):
    """Multiplicative N(0, rel) noise on float entries — the magnitude
    of fp32 round-off a cross-framework port introduces. Used for the
    torch-vs-torch control run."""
    import torch

    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, v in sd.items():
        if v.is_floating_point():
            out[k] = v * (1 + rel * torch.randn(v.shape, generator=g,
                                                dtype=v.dtype))
        else:
            out[k] = v.clone()
    return out


def _growth_rate(rel):
    """Fitted log10 slope of a divergence curve (a Lyapunov-rate proxy),
    over the steps where it sits above the fp32 noise floor."""
    rel = np.asarray(rel)
    steps = np.arange(len(rel))
    mask = rel > 1e-9
    if mask.sum() < 10:
        return None
    return float(np.polyfit(steps[mask], np.log10(rel[mask]), 1)[0])


def _trajectory_defect(data, batches, family, seq_length, snapshots,
                       torch_losses):
    """Trajectory-pinned one-step defect: port the torch params ENTERING
    probed steps into our model and recompute that exact step's training
    loss on the same batch. fp32-epsilon agreement at every probe —
    including both sides of the finetune boundary — proves the
    end-of-run drift is iterated feedback amplifying per-step rounding
    (chaos), not a biased step anywhere along the trajectory."""
    import jax
    import jax.numpy as jnp
    import optax

    from imagecaptioning_tpu.train import step as steplib

    model, _, _ = _family_models(data, seq_length, family)
    tx = optax.sgd(0.0)
    step = None
    out = {"steps": [], "torch_loss": [], "jax_loss": [],
           "rel_loss_diff": []}
    for k in sorted(snapshots):
        ix = batches[k]
        x = jnp.asarray(data["images"][ix])
        g = jnp.asarray(data["labels"][ix].astype(np.int32))
        state, _ = steplib.create_train_state(model, tx, x, g)
        state = state._replace(params=port_params(snapshots[k], family))
        if step is None:
            step = jax.jit(steplib.make_train_step(model, tx))
        _, m = step(state, x, g)
        lj, lt = float(m["loss"]), float(torch_losses[k])
        out["steps"].append(int(k))
        out["torch_loss"].append(lt)
        out["jax_loss"].append(lj)
        out["rel_loss_diff"].append(abs(lt - lj) / max(abs(lt), 1e-8))
    out["max_rel_loss_diff"] = max(out["rel_loss_diff"])
    return out


def run(steps: int = 160, bs: int = 8, lr: float = None,
        num_images: int = 32, seq_length: int = 10, hw: int = None,
        family: str = "lstm", control: bool = False):
    # CPU is the parity platform (torch is CPU; fp32 determinism)
    force_cpu()
    boundary = steps // 2
    is_adamw = family in ("transformer", "vitb")
    # per-family opts defaults: AdamW wd=0.1 (Transformer_opts.py:30,
    # vitb_opts.py:30) vs Adam additive-L2 wd=1e-6 (train_LSTM.py:59)
    wd = 0.1 if is_adamw else 1e-6
    if lr is None:
        lr = 3e-4 if is_adamw else 4e-4
    if hw is None:
        hw = 32 if family == "vitb" else 64   # mini-ViT patch grid 2×2
    data = build_dataset(num_images, seq_length, hw)
    batches = batch_schedule(data["train_ix"], bs, steps)

    probe = (tuple(sorted({0, steps // 4, max(boundary - 1, 0),
                           boundary, (3 * steps) // 4, steps - 1}))
             if control else ())
    torch_out = run_torch(data, batches, lr, wd, boundary, seq_length,
                          family, snapshot_at=probe)
    snapshots = torch_out.pop("snapshots", {})
    init_sd = torch_out.pop("state_dict_init")
    jax_out = run_jax(data, batches, lr, wd, boundary, seq_length,
                      init_sd, steps, family)

    lt = np.asarray(torch_out["losses"])
    lj = np.asarray(jax_out["losses"])
    rel = np.abs(lt - lj) / np.maximum(np.abs(lt), 1e-8)
    report = {
        "config": {"family": family, "steps": steps, "batch_size": bs,
                   "lr": lr,
                   "weight_decay": wd, "finetune_boundary": boundary,
                   "num_images": num_images, "seq_length": seq_length,
                   "image_hw": hw},
        "torch": {k: torch_out[k] for k in
                  ("losses", "predictions", "references", "meteor",
                   "bleu")},
        "jax": jax_out,
        "agreement": {
            "max_rel_loss_diff_first_50": float(rel[:50].max()),
            "max_rel_loss_diff_all": float(rel.max()),
            "mean_rel_loss_diff_all": float(rel.mean()),
            "final_loss_torch": float(lt[-1]),
            "final_loss_jax": float(lj[-1]),
            "loss_drop_torch": float(lt[-1] / lt[0]),
            "loss_drop_jax": float(lj[-1] / lj[0]),
            "meteor_abs_diff": abs(torch_out["meteor"]
                                   - jax_out["meteor"]),
            "bleu_abs_diff": abs(torch_out["bleu"] - jax_out["bleu"]),
        },
    }
    if control:
        # torch-vs-torch control: the SAME reference training run from
        # an init perturbed at fp32-port magnitude (rel 1e-7). Its
        # divergence envelope is what chaotic loss-trajectory growth
        # produces with NO cross-framework difference at all — the
        # yardstick for reading max_rel_loss_diff_all.
        ctl = run_torch(data, batches, lr, wd, boundary, seq_length,
                        family, init_sd=_perturb_state_dict(init_sd))
        lc = np.asarray(ctl["losses"])
        relc = np.abs(lt - lc) / np.maximum(np.abs(lt), 1e-8)
        report["control"] = {
            "description": "reference (torch) rerun from init perturbed "
                           "by rel 1e-7 noise, vs the unperturbed "
                           "reference run",
            "losses": ctl["losses"],
            "meteor": ctl["meteor"], "bleu": ctl["bleu"],
        }
        report["agreement"].update({
            "control_max_rel_diff_first_50": float(relc[:50].max()),
            "control_max_rel_diff_all": float(relc.max()),
            "control_mean_rel_diff_all": float(relc.mean()),
        })
        # per-step control: same init, params ×(1 + 1e-7·noise) after
        # every optimizer step — fp32 reassociation's actual cadence in
        # a cross-framework port (each step's reductions reorder, not
        # just the init). This is the envelope max_rel_loss_diff_all
        # should be read against.
        ctls = run_torch(data, batches, lr, wd, boundary, seq_length,
                         family, step_noise_rel=1e-7)
        lcs = np.asarray(ctls["losses"])
        relcs = np.abs(lt - lcs) / np.maximum(np.abs(lt), 1e-8)
        report["control_step"] = {
            "description": "reference (torch) rerun with params "
                           "multiplied by (1 + 1e-7 noise) after every "
                           "optimizer step, vs the unperturbed run",
            "losses": ctls["losses"],
            "meteor": ctls["meteor"], "bleu": ctls["bleu"],
        }
        report["agreement"].update({
            "control_step_max_rel_diff_first_50": float(relcs[:50].max()),
            "control_step_max_rel_diff_all": float(relcs.max()),
            "control_step_mean_rel_diff_all": float(relcs.mean()),
        })
        # trajectory-pinned defect probe + growth-rate fits: the drift
        # is explained iff (a) the per-step defect stays at fp32
        # epsilon along the WHOLE trajectory and (b) ours grows at the
        # same exponential rate as the torch-vs-torch controls.
        defect = _trajectory_defect(data, batches, family, seq_length,
                                    snapshots, lt)
        report["trajectory_defect"] = defect
        report["agreement"].update({
            "trajectory_defect_max_rel_loss_diff":
                defect["max_rel_loss_diff"],
            "lyapunov_log10_slope_ours": _growth_rate(rel),
            "lyapunov_log10_slope_control": _growth_rate(relc),
            "lyapunov_log10_slope_control_step": _growth_rate(relcs),
        })
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=160)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=None,
                    help="default: 4e-4 (Adam families) / "
                         "3e-4 (AdamW families)")
    ap.add_argument("--family", default="lstm",
                    choices=["lstm", "attention", "transformer", "vitb"])
    ap.add_argument("--control", action="store_true",
                    help="also rerun the torch side from rel-1e-7 "
                         "perturbed init: the torch-vs-torch chaotic "
                         "divergence envelope")
    ap.add_argument("--out", default="runs/parity")
    args = ap.parse_args(argv)

    report = run(steps=args.steps, bs=args.batch_size, lr=args.lr,
                 family=args.family, control=args.control)
    os.makedirs(args.out, exist_ok=True)
    suffix = "" if args.family == "lstm" else f"_{args.family}"
    path = os.path.join(args.out, f"quality_parity{suffix}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    a = report["agreement"]
    print(f"wrote {path}")
    print(f"loss rel-diff: first50 max {a['max_rel_loss_diff_first_50']:.2e}"
          f"  all max {a['max_rel_loss_diff_all']:.2e}"
          f"  mean {a['mean_rel_loss_diff_all']:.2e}")
    print(f"final loss: torch {a['final_loss_torch']:.4f}"
          f"  jax {a['final_loss_jax']:.4f}"
          f"  (drop {a['loss_drop_torch']:.3f}/{a['loss_drop_jax']:.3f})")
    print(f"METEOR: torch {report['torch']['meteor']:.4f}"
          f"  jax {report['jax']['meteor']:.4f}"
          f"  | BLEU: torch {report['torch']['bleu']:.4f}"
          f"  jax {report['jax']['bleu']:.4f}")
    if "control_max_rel_diff_all" in a:
        print(f"control (torch-vs-torch, perturbed init): "
              f"first50 max {a['control_max_rel_diff_first_50']:.2e}"
              f"  all max {a['control_max_rel_diff_all']:.2e}"
              f"  mean {a['control_mean_rel_diff_all']:.2e}")
    if "control_step_max_rel_diff_all" in a:
        print(f"control (torch-vs-torch, per-step noise): "
              f"first50 max {a['control_step_max_rel_diff_first_50']:.2e}"
              f"  all max {a['control_step_max_rel_diff_all']:.2e}"
              f"  mean {a['control_step_mean_rel_diff_all']:.2e}")
    if "trajectory_defect_max_rel_loss_diff" in a:
        d = report["trajectory_defect"]
        print(f"trajectory-pinned defect (torch params @ steps "
              f"{d['steps']} -> our step): max rel "
              f"{a['trajectory_defect_max_rel_loss_diff']:.2e}")
        print(f"lyapunov log10 slope/step: ours "
              f"{a['lyapunov_log10_slope_ours']}  control "
              f"{a['lyapunov_log10_slope_control']}  per-step control "
              f"{a['lyapunov_log10_slope_control_step']}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(report["torch"]["losses"], label="reference (torch)",
                lw=1.6)
        ax.plot(report["jax"]["losses"], label="this framework (jax)",
                lw=1.0, ls="--")
        ax.axvline(report["config"]["finetune_boundary"], color="gray",
                   lw=0.8, ls=":", label="finetune boundary")
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        ax.set_title("quality parity: identical init, identical batches")
        ax.legend()
        fig.tight_layout()
        png = os.path.join(args.out,
                           f"quality_parity{suffix}_curves.png")
        fig.savefig(png, dpi=120)
        print(f"wrote {png}")
    except Exception as e:                      # viz is best-effort
        print(f"curve PNG skipped: {e}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Miniature quality-parity run: the reference trained against us.

Trains the REFERENCE'S OWN torch modules — `AlexCap/LanguageModule.py`
LSTM head + `AlexCap/CustomLoss.py` on a VGG16-features trunk, wired in
the AlexCapModel shape (`/root/reference/AlexCap/LSTMModel.py:53-73`) —
and this framework's `LSTMCaptioner` from IDENTICAL ported
initialization, on the same synthetic Face2Text-style dataset with the
same batch schedule and the reference's training-loop semantics
(`/root/reference/train_LSTM.py:77-133`): Adam with additive-L2 weight
decay 1e-6, global-norm clip 1.0, frozen-CNN phase then unfreeze at the
finetune boundary.

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
              family="lstm"):
    """The reference's own modules + training-loop semantics
    (train_LSTM.py:77-133 / train_LSTMwAttention.py incl. the
    doubly-stochastic regularizer, LSTMwAttentionModel.py:59-71), CPU.
    Restores the process-wide torch.Tensor.cuda shim (attention family)
    on every exit path — in-process callers (tests) must not inherit a
    no-op .cuda()."""
    import torch

    orig_cuda = torch.Tensor.cuda
    try:
        return _run_torch_inner(data, batches, lr, wd, boundary,
                                seq_length, family)
    finally:
        torch.Tensor.cuda = orig_cuda


def _run_torch_inner(data, batches, lr, wd, boundary, seq_length,
                     family):
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
    sd_init = {k: v.detach().clone()
               for k, v in model.state_dict().items()}
    crit = ref_loss.CustomCrossEntropyLoss()
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    model.features.requires_grad_(False)   # frozen-CNN phase

    losses = []
    for it, ix in enumerate(batches):
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
        losses.append(float(loss.detach()))

    # greedy decode of the test split + the reference's own scorer
    ti = data["test_ix"]
    with torch.no_grad():
        feats = model.encode(torch.from_numpy(
            data["images"][ti].transpose(0, 3, 1, 2).copy()))
        if family == "attention":
            toks = _torch_attention_greedy(model.llm, feats, seq_length,
                                           vocab.vocab_size)
        else:
            toks = model.llm.predict_caption(feats)
    preds = model.llm.decode_sequence(toks)
    refs = model.llm.decode_sequence(torch.from_numpy(data["labels"][ti]))

    ref_eval = load_reference_module("AlexCap/eval/eval_resnet.py",
                                     "qp_ref_eval")
    # offline NLTK degradations, identical to what our scorer falls
    # back to (captions are whitespace-joined; no wordnet corpus)
    from imagecaptioning_tpu.eval.scorer import meteor_pair
    ref_eval.word_tokenize = lambda s: s.split()
    ref_eval.meteor = lambda r, c: meteor_pair(r, c)
    blob = ref_eval.score_captions(
        [{"candidate": p, "references": r} for p, r in zip(preds, refs)])
    return {"losses": losses, "predictions": preds, "references": refs,
            "meteor": blob["average_score"],
            "bleu": blob["average_bl_score"],
            "state_dict_init": sd_init}


# -------------------------------------------------------------- jax side

def _attention_head_map(sd, prefix="llm."):
    """Reference Show-Attend-Tell Decoder state_dict slice → our
    AttentionHead param tree (same map the differential tests pin)."""
    s = {k[len(prefix):]: np.asarray(v) for k, v in sd.items()
         if k.startswith(prefix)}
    lin = lambda p: {"kernel": s[f"{p}.weight"].T, "bias": s[f"{p}.bias"]}
    return {
        "init_h": lin("init_h"),
        "init_c": lin("init_c"),
        "embedding": {"embedding": s["embedding.weight"]},
        "att_W_kernel": s["attention.W.weight"].T,
        "att_W_bias": s["attention.W.bias"],
        "att_U_kernel": s["attention.U.weight"].T,
        "att_U_bias": s["attention.U.bias"],
        "att_v_kernel": s["attention.v.weight"].T,
        "att_v_bias": s["attention.v.bias"],
        "f_beta_kernel": s["f_beta.weight"].T,
        "f_beta_bias": s["f_beta.bias"],
        "deep_output_kernel": s["deep_output.weight"].T,
        "deep_output_bias": s["deep_output.bias"],
        "cell_w_ih": s["lstm.weight_ih"],
        "cell_w_hh": s["lstm.weight_hh"],
        "cell_b_ih": s["lstm.bias_ih"],
        "cell_b_hh": s["lstm.bias_hh"],
    }


def port_params(sd, family="lstm"):
    """torch state_dict → our captioner param tree (the converters are
    the round-trip-tested utils/torch_port maps)."""
    import jax
    import jax.numpy as jnp
    from imagecaptioning_tpu.utils import torch_port as tp

    head = (_attention_head_map(sd) if family == "attention"
            else tp.convert_reference_lstm_head(sd, prefix="llm."))
    params = {
        "features": tp.convert_vgg_features(sd)["params"],
        "llm": head,
    }
    return jax.tree.map(lambda v: jnp.array(np.asarray(v)), params)


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
                                                       LSTMCaptioner)
    from imagecaptioning_tpu.train import optim, step as steplib

    vocab = data["vocab"]
    if family == "attention":
        kw = dict(vocab_size=vocab.vocab_size, embedding_size=64,
                  rnn_size=64, dropout=0.0, use_vggface=True,
                  att_reg_weight=1.0)
        model = AttentionCaptioner(**kw)
        frozen_model = AttentionCaptioner(**kw, freeze_encoder=True)
        cfg_name = "lstm_attention"
    else:
        kw = dict(vocab_size=vocab.vocab_size, embedding_size=64,
                  rnn_size=64, dropout=0.0, use_vggface=True)
        model = LSTMCaptioner(**kw)
        frozen_model = LSTMCaptioner(**kw, freeze_encoder=True)
        cfg_name = "lstm"

    cfg = get_config(cfg_name).replace(
        use_vggface=True, learning_rate=lr, weight_decay=wd,
        clip_grad=True, finetune_cnn=True, use_scheduler=False,
        compute_dtype="float32")
    tx = optim.make_optimizer(cfg, total_steps=steps,
                              finetune_start_step=boundary)

    x0 = jnp.asarray(data["images"][batches[0]])
    g0 = jnp.asarray(data["labels"][batches[0]].astype(np.int32))
    state, _ = steplib.create_train_state(model, tx, x0, g0)
    state = state._replace(params=port_params(init_sd, family))

    train_step = jax.jit(steplib.make_train_step(model, tx))
    frozen_step = jax.jit(steplib.make_train_step(frozen_model, tx))

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

def run(steps: int = 160, bs: int = 8, lr: float = 4e-4,
        num_images: int = 32, seq_length: int = 10, hw: int = 64,
        family: str = "lstm"):
    # CPU is the parity platform (torch is CPU; fp32 determinism)
    force_cpu()
    boundary = steps // 2
    wd = 1e-6                      # train_LSTM.py:59
    data = build_dataset(num_images, seq_length, hw)
    batches = batch_schedule(data["train_ix"], bs, steps)

    torch_out = run_torch(data, batches, lr, wd, boundary, seq_length,
                          family)
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
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=160)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--family", default="lstm",
                    choices=["lstm", "attention"])
    ap.add_argument("--out", default="runs/parity")
    args = ap.parse_args(argv)

    report = run(steps=args.steps, bs=args.batch_size, lr=args.lr,
                 family=args.family)
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

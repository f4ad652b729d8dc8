"""Gradient-level differential vs the reference (VERDICT r1 item #3).

One teacher-forced train step — the reference's own torch modules
(imported from /root/reference) with weights ported into our models —
must produce: the same loss, the same per-parameter GRADIENTS, and the
same parameters after one optimizer step with the reference's exact
hyperparameters (clip_grad_norm 1.0 + Adam wd=1e-6 for the LSTM family,
`train_LSTM.py:59,86-87`; AdamW wd per config for the transformer
family, `train_Transformer.py:72-83`). Covers the LSTM head, the
transformer enc-dec, and the frozen/finetune encoder boundary (VGG
trunk with requires_grad=False vs our stop_gradient + zero-lr group).

The weight converters are linear transpose/reshape maps, so the same
converters port torch per-parameter gradient dicts for comparison.
"""

import os

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not present")


def _refdiff():
    import test_reference_differential as rd
    return rd


def _grad_sd(ref):
    return {n: p.grad.detach().clone() for n, p in ref.named_parameters()
            if p.grad is not None}


def _assert_tree_close(got_tree, want_tree, rtol, atol, ctx=""):
    from imagecaptioning_tpu.utils.pretrained import flatten_tree
    got, want = flatten_tree(got_tree), flatten_tree(want_tree)
    assert set(got) == set(want), (ctx, set(got) ^ set(want))
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
            rtol=rtol, atol=atol, err_msg=f"{ctx}:{k}")


class TestLSTMHeadGradientParity:
    """Reference LanguageModel + CustomLoss vs LanguageHead +
    smoothed_cross_entropy: loss, grads, and one clipped Adam step."""

    V, W, D, H, T, B, P = 20, 16, 32, 24, 7, 3, 5
    LR, WD = 1e-4, 1e-6

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.models.heads import LanguageHead
        from imagecaptioning_tpu.utils import torch_port as tp

        rd = _refdiff()
        torch.manual_seed(0)
        ref_mod = rd._load_reference_module("AlexCap/LanguageModule.py",
                                            "ref_language_module_grad")
        ref = ref_mod.LanguageModel(
            vocab_size=self.V, embedding_size=self.W,
            image_vector_dim=self.D, rnn_size=self.H,
            seq_length=self.T, num_layers=1,
            idx_to_token={}, dropout=0.0, device="cpu")
        ref.eval()
        loss_mod = rd._load_reference_module("AlexCap/CustomLoss.py",
                                             "ref_custom_loss")
        crit = loss_mod.CustomCrossEntropyLoss()

        port = tp.convert_reference_lstm_head

        head = LanguageHead(vocab_size=self.V, embedding_size=self.W,
                            rnn_size=self.H, num_layers=1, dropout=0.0)
        # jnp.asarray can zero-copy torch-backed buffers on CPU; torch's
        # in-place opt.step() would then mutate our "ported" params.
        params = jax.tree.map(lambda v: jnp.array(np.asarray(v)),
                              port(ref.state_dict()))
        return ref, crit, head, params, port

    def _inputs(self):
        rng = np.random.RandomState(7)
        img = rng.randn(self.B, self.P, self.D).astype(np.float32)
        gt = rng.randint(1, self.V + 1,
                         size=(self.B, self.T)).astype(np.int64)
        gt[0, 4:] = 0
        return img, gt

    def test_loss_grads_and_adam_step(self, pair):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.config import get_lstm_config
        from imagecaptioning_tpu.ops import losses, tokens
        from imagecaptioning_tpu.train import optim

        ref, crit, head, params, port = pair
        img, gt = self._inputs()

        # --- torch: forward, loss, backward, clip(1), Adam step
        for p in ref.parameters():
            p.grad = None
        out = ref(torch.from_numpy(img), torch.from_numpy(gt))
        target = ref.get_target(torch.from_numpy(gt), make_target=True)
        loss_t = crit(out, target)
        loss_t.backward()
        raw_grads = port(_grad_sd(ref))
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1)
        topt = torch.optim.Adam(ref.parameters(), lr=self.LR,
                                betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=self.WD)
        before = port({k: v.clone() for k, v in ref.state_dict().items()})
        topt.step()
        after = port(ref.state_dict())

        # --- ours: same loss fn, jax.grad, the real make_optimizer
        gt_j = jnp.asarray(gt.astype(np.int32))
        dec_in = tokens.decoder_input(gt_j, self.V + 1)
        target_j = tokens.decoder_target(gt_j, self.V + 2, scan_from=1)

        def loss_fn(p):
            logits = head.apply({"params": p}, jnp.asarray(img), dec_in,
                                deterministic=True)
            return losses.smoothed_cross_entropy(logits, target_j)

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-5)
        _assert_tree_close(grads, raw_grads, rtol=1e-4, atol=1e-5,
                           ctx="grads")

        cfg = get_lstm_config()
        assert cfg.learning_rate == self.LR and cfg.weight_decay == self.WD
        tx = optim.make_optimizer(cfg, total_steps=100,
                                  finetune_start_step=0)
        import optax
        updates, _ = tx.update(grads, tx.init(params), params)
        new_params = optax.apply_updates(params, updates)

        from imagecaptioning_tpu.utils.pretrained import flatten_tree
        want_delta = jax.tree.map(lambda a, b: np.asarray(a) -
                                  np.asarray(b), after, before)
        got_delta = jax.tree.map(lambda a, b: np.asarray(a) -
                                 np.asarray(b), new_params, params)
        _assert_tree_close(got_delta, want_delta, rtol=1e-3, atol=5e-6,
                           ctx="adam_step_delta")


class TestTransformerGradientParity:
    """Reference from-scratch Transformer vs ops/transformer: loss,
    grads, and one clipped AdamW step (the llm param group of
    `train_Transformer.py:72-78`)."""

    V, FC, E, L, HEADS, T, B, PATCH = 20, 32, 32, 2, 4, 7, 3, 3
    LR, WD = 3e-4, 0.1

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.utils import torch_port as tp

        rd = _refdiff()
        torch.manual_seed(1)
        ref_mod = rd._load_reference_module("AlexCap/TransformerModule.py",
                                            "ref_transformer_module_grad")
        ref = ref_mod.Transformer(
            src_vocab_size=self.V, fc_dim=self.FC, token_dict={},
            max_length=self.T, patch_size=self.PATCH,
            embed_size=self.E, num_layers=self.L, heads=self.HEADS,
            forward_expansion=4, dropout=0.0, device="cpu")
        ref.eval()
        loss_mod = rd._load_reference_module("AlexCap/CustomLoss.py",
                                             "ref_custom_loss2")
        crit = loss_mod.CustomCrossEntropyLoss()

        def port(sd):
            return tp.convert_reference_transformer(sd, num_layers=self.L)

        # jnp.asarray can zero-copy torch-backed buffers on CPU; torch's
        # in-place opt.step() would then mutate our "ported" params.
        params = jax.tree.map(lambda v: jnp.array(np.asarray(v)),
                              port(ref.state_dict()))
        return ref, crit, params, port

    def _modules(self):
        from imagecaptioning_tpu.ops.transformer import Decoder, Encoder
        enc = Encoder(embed_size=self.E, num_layers=self.L,
                      heads=self.HEADS, forward_expansion=4, dropout=0.0,
                      patch_length=self.PATCH ** 2)
        dec = Decoder(vocab_out=self.V + 3, embed_size=self.E,
                      num_layers=self.L, heads=self.HEADS,
                      forward_expansion=4, dropout=0.0,
                      max_length=self.T + 1)
        return enc, dec

    def test_loss_grads_and_adamw_step(self, pair):
        import torch

        import jax
        import jax.numpy as jnp
        import optax
        from imagecaptioning_tpu.ops import losses, tokens
        from imagecaptioning_tpu.ops.transformer import make_trg_mask

        ref, crit, params, port = pair
        rng = np.random.RandomState(11)
        grid = rng.randn(self.B, self.PATCH ** 2,
                         self.FC).astype(np.float32)
        gt = rng.randint(1, self.V + 1,
                         size=(self.B, self.T)).astype(np.int64)
        gt[0, 5:] = 0

        # --- torch (the reference's forward_train body,
        # TransformerModel.py:66-73: llm forward → get_target → crit)
        for p in ref.parameters():
            p.grad = None
        out = ref(torch.from_numpy(grid), torch.from_numpy(gt))
        target = ref.get_target(torch.from_numpy(gt), make_target=True)
        loss_t = crit(out, target)
        loss_t.backward()
        raw_grads = port(_grad_sd(ref))
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1)
        topt = torch.optim.AdamW(ref.parameters(), lr=self.LR,
                                 betas=(0.9, 0.999), eps=1e-8,
                                 weight_decay=self.WD)
        before = port({k: v.clone() for k, v in ref.state_dict().items()})
        topt.step()
        after = port(ref.state_dict())

        # --- ours
        enc_mod, dec_mod = self._modules()
        gt_j = jnp.asarray(gt.astype(np.int32))
        dec_in = tokens.decoder_input(gt_j, self.V + 1)
        target_j = tokens.decoder_target(gt_j, self.V + 2, scan_from=0)

        def loss_fn(p):
            word_vec = jnp.maximum(
                jnp.asarray(grid) @ p["fc"]["kernel"] + p["fc"]["bias"],
                0.0)
            enc = enc_mod.apply({"params": p["encoder"]}, word_vec, None,
                                deterministic=True)
            logits, _ = dec_mod.apply({"params": p["decoder"]}, dec_in,
                                      enc, None, make_trg_mask(dec_in),
                                      deterministic=True)
            return losses.smoothed_cross_entropy(logits, target_j)

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-5)
        _assert_tree_close(grads, raw_grads, rtol=2e-4, atol=2e-5,
                           ctx="grads")

        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(self.LR, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=self.WD))
        updates, _ = tx.update(grads, tx.init(params), params)
        new_params = optax.apply_updates(params, updates)
        want_delta = jax.tree.map(lambda a, b: np.asarray(a) -
                                  np.asarray(b), after, before)
        got_delta = jax.tree.map(lambda a, b: np.asarray(a) -
                                 np.asarray(b), new_params, params)
        _assert_tree_close(got_delta, want_delta, rtol=1e-3, atol=5e-6,
                           ctx="adamw_step_delta")


class TestFrozenEncoderBoundaryParity:
    """Full LSTMCaptioner with a VGG trunk vs the torch equivalent with
    `features.requires_grad_(False)` (train_LSTM.py:48): same loss, same
    head grads, encoder grads absent(torch)/zero(ours), and after one
    Adam step the encoder is bit-unchanged on both sides while the head
    moves identically."""

    V, W, H, T, B = 18, 16, 24, 6, 2
    LR, WD = 1e-4, 1e-6

    @pytest.fixture(scope="class")
    def pair(self):
        import torch
        import torch.nn as tnn

        import jax
        import jax.numpy as jnp
        from imagecaptioning_tpu.models.captioners import LSTMCaptioner
        from imagecaptioning_tpu.utils import torch_port as tp

        rd = _refdiff()
        torch.manual_seed(2)
        ref_mod = rd._load_reference_module("AlexCap/LanguageModule.py",
                                            "ref_language_module_frozen")

        trunk = tp.build_torch_vgg_trunk()
        llm = ref_mod.LanguageModel(
            vocab_size=self.V, embedding_size=self.W,
            image_vector_dim=512, rnn_size=self.H,
            seq_length=self.T, num_layers=1,
            idx_to_token={}, dropout=0.0, device="cpu")

        class TorchCaptioner(tnn.Module):
            """The reference AlexCapModel shape (LSTMModel.py:53-73):
            trunk → permute to HWC → flatten grid → LLM."""

            def __init__(self):
                super().__init__()
                self.features = trunk.features
                self.llm = llm

            def forward(self, images, gt):
                f = self.features(images).permute(0, 2, 3, 1)
                f = f.reshape(f.size(0), -1, f.size(-1))
                return self.llm(f, gt)

        ref = TorchCaptioner().eval()
        ref.features.requires_grad_(False)      # frozen-CNN phase

        sd = ref.state_dict()
        params = {
            "features": tp.convert_vgg_features(sd)["params"],
            "llm": tp.convert_reference_lstm_head(sd, prefix="llm."),
        }
        # copy: jnp.asarray can alias torch buffers (see above)
        params = jax.tree.map(lambda v: jnp.array(np.asarray(v)),
                              params)
        model = LSTMCaptioner(vocab_size=self.V, embedding_size=self.W,
                              rnn_size=self.H, num_layers=1, dropout=0.0,
                              use_vggface=True, freeze_encoder=True)
        return ref, model, params

    def test_frozen_boundary_step(self, pair):
        import torch

        import jax
        import jax.numpy as jnp
        import optax
        from imagecaptioning_tpu.config import get_lstm_config
        from imagecaptioning_tpu.train import optim
        from imagecaptioning_tpu.utils.pretrained import flatten_tree
        from imagecaptioning_tpu.utils import torch_port as tp

        rd = _refdiff()
        ref, model, params = pair
        loss_mod = rd._load_reference_module("AlexCap/CustomLoss.py",
                                             "ref_custom_loss3")
        crit = loss_mod.CustomCrossEntropyLoss()

        rng = np.random.RandomState(3)
        img = rng.rand(self.B, 32, 32, 3).astype(np.float32)
        gt = rng.randint(1, self.V + 1,
                         size=(self.B, self.T)).astype(np.int64)
        gt[1, 3:] = 0

        # --- torch
        for p in ref.parameters():
            p.grad = None
        img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
        out = ref(img_t, torch.from_numpy(gt))
        target = ref.llm.get_target(torch.from_numpy(gt), make_target=True)
        loss_t = crit(out, target)
        loss_t.backward()
        assert all(p.grad is None for p in ref.features.parameters())
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1)
        topt = torch.optim.Adam(ref.parameters(), lr=self.LR,
                                betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=self.WD)
        enc_before = {k: v.clone() for k, v in ref.state_dict().items()
                      if k.startswith("features.")}
        topt.step()
        enc_after = {k: v for k, v in ref.state_dict().items()
                     if k.startswith("features.")}
        for k in enc_before:          # frozen params untouched in torch
            assert torch.equal(enc_before[k], enc_after[k]), k

        # --- ours
        def loss_fn(p):
            out = model.apply({"params": p}, jnp.asarray(img),
                              jnp.asarray(gt.astype(np.int32)),
                              train=False)
            return model.loss(out, jnp.asarray(gt.astype(np.int32)))

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-4)
        # encoder grads exactly zero under stop_gradient
        for k, g in flatten_tree(grads["features"]).items():
            np.testing.assert_array_equal(np.asarray(g), 0.0, err_msg=k)
        # head grads match torch's (pre-clip)
        raw = _grad_sd(ref)
        want_llm = tp.convert_reference_lstm_head(raw, prefix="llm.")
        _assert_tree_close(grads["llm"], want_llm, rtol=2e-4, atol=2e-5,
                           ctx="head_grads")

        # one step with the real driver optimizer: frozen phase
        cfg = get_lstm_config().replace(use_vggface=True)
        tx = optim.make_optimizer(cfg, total_steps=100,
                                  finetune_start_step=50)
        updates, _ = tx.update(grads, tx.init(params), params)
        new_params = optax.apply_updates(params, updates)
        for k, v in flatten_tree(updates["features"]).items():
            np.testing.assert_array_equal(np.asarray(v), 0.0, err_msg=k)
        # head deltas match torch's
        want_after = tp.convert_reference_lstm_head(ref.state_dict(),
                                                    prefix="llm.")
        got = flatten_tree(new_params["llm"])
        want = flatten_tree(want_after)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)
